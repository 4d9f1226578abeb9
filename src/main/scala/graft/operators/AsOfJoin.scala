package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the latest right row
  * whose `rightTs <= leftTs` within the same key — SURVEY §2b group C
  * ("latest event ≤ t per key"; reference has no such operator, this is a
  * declared capability).
  *
  * Spark has no native as-of join, so this composes built-ins as a
  * union + running `last(_, ignoreNulls)` window:
  *
  *   - ONE hash shuffle on the key (both sides co-partitioned), then a
  *     per-partition sort — the same cost shape as a sort-merge join;
  *   - no pairwise blowup: the naive join-then-max alternative
  *     materializes |L_k|·|R_k| rows per key before aggregating, which
  *     dies on skewed keys at 100 TB; this stays O(|L_k|+|R_k|).
  *
  * Tie semantics: a right row at exactly `leftTs` is visible (<=), and
  * among right rows sharing a timestamp the one with the greatest
  * `payload` struct (field order = `payload` arg) wins — deterministic.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach (become nullable fields
    *                on the output; null = no right row at or before ts) */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val payloadType = right.select(struct(payload.map(col): _*)).schema.head.dataType

    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs))
      .withColumn("__p", lit(null).cast(payloadType))
      .withColumn("__src", lit(1))
    val r = right.select(
      col(rightKey).as("__k"),
      col(rightTs).as("__t"),
      struct(payload.map(col): _*).as("__p"),
      lit(0).as("__src"))

    // right rows sort before left rows at equal ts (src 0 < 1) so "<=" holds;
    // equal-ts right rows resolve by max payload struct (last after asc sort).
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t").asc, col("__src").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last("__p", ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(
        left.columns.map(col) ++
          payload.map(p => col(s"__asof.$p").as(p)): _*)
  }
}
