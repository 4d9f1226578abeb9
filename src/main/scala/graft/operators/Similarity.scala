package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (SURVEY §2b L — similarity search).
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k via join + window. The
  *     corpus side is broadcast when it fits (dimension-table pattern);
  *     this is the baseline and the recall oracle.
  *   - [[lshTopK]]: random-hyperplane LSH — each vector gets a `nBits`
  *     signature; candidates share a signature band. The scale path: the
  *     only shuffle is the equality join on band keys, candidates per
  *     query are O(bucket size), never O(corpus). Hyperplanes are
  *     generated from a fixed seed, so results are deterministic.
  */
object Similarity {

  /** Exact top-k neighbors (cosineScaled for cross-engine determinism).
    * Excludes self-matches. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"))
    val scored = q.join(broadcast(c), col("qid") =!= col("nid"))
      .withColumn("cos", VectorFunctions.cosineScaled(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: nBits × dim, seeded. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextGaussian())
  }

  /** Sign-of-projection signature as an Int bucket key per band. */
  private val signatureUdf = {
    (planes: Array[Array[Double]]) =>
      udf { (v: Seq[Float]) =>
        if (v == null) 0L
        else {
          var sig = 0L
          var i = 0
          while (i < planes.length) {
            var dot = 0.0
            val p = planes(i)
            var j = 0
            while (j < math.min(p.length, v.length)) { dot += p(j) * v(j); j += 1 }
            if (dot > 0) sig |= (1L << i)
            i += 1
          }
          sig
        }
      }
  }

  /** LSH-bucketed approximate top-k: `bands` signature bands of
    * `bitsPerBand` bits; rank candidates by exact cosine within the
    * union of matching buckets. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      bands: Int = 8,
      bitsPerBand: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val nBits = bands * bitsPerBand
    val sigUdf = signatureUdf(hyperplanes(nBits, dim, seed))

    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(vecAs),
          sigUdf(col("embedding")).as("sig"))
        .select(col(idAs), col(vecAs),
          posexplode(expr(
            s"transform(sequence(0, ${bands - 1}), i -> shiftright(sig, i * $bitsPerBand) & ${(1 << bitsPerBand) - 1})"))
            .as(Seq("band", "bkey")))

    val q = banded(queries, "qid", "qv")
    val c = banded(corpus, "nid", "nv")
    val candidates = q.join(c, Seq("band", "bkey"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "qv", "nid", "nv").distinct()

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    candidates
      .withColumn("cos", VectorFunctions.cosineScaled(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cos"))
  }
}
