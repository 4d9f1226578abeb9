package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded tolerance join: `|left.lv - right.rv| <= tol` as an EQUI-join.
  *
  * A naive theta join with that predicate is a broadcast-nested-loop —
  * O(|L|·|R|) comparisons, which is exactly what dies at 100 TB. Banding
  * decomposes it: bucket both sides by floor(v / tol); a qualifying pair
  * can differ by at most one bucket, so replicating the right side into
  * its bucket ±1 and equi-joining on the bucket id finds every candidate
  * with a plain hash shuffle. The residual exact predicate filters the
  * few false candidates. Cost: O(|L| + 3|R|) shuffled rows + per-bucket
  * products — the same shape as any other equi-join, AQE-skew-handled.
  */
object BandJoin {

  def toleranceJoin(
      left: DataFrame,
      right: DataFrame,
      lv: String,
      rv: String,
      tol: Double): DataFrame = {
    require(tol > 0, "tolerance must be positive")
    val l = left.withColumn("__band", floor(col(lv) / tol).cast("long"))
    val r = right
      .withColumn("__shift", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__band", floor(col(rv) / tol).cast("long") + col("__shift"))
      .drop("__shift")
    l.join(r, Seq("__band"))
      .filter(abs(col(lv) - col(rv)) <= tol)
      .drop("__band")
  }
}
