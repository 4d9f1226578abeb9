package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history (SURVEY §2b group M — the
  * incremental-materialization family, with m4 MERGE/upsert and m5
  * dynamic partition overwrite).
  *
  * The reference's refresh pipeline rewrites its whole materialization
  * on every change (`/root/reference/src/plan-processor.ts:29-71` — the
  * Redis hash is rebuilt from scratch); an SCD2 history is the
  * warehouse-native generalization that KEEPS every version: one row
  * per (entity, change), validity interval [effective_from,
  * effective_to), open-ended current row. Downstream as-of queries
  * (`c10`) then answer "what did this dimension look like at time t"
  * without replaying a log.
  *
  * Shape: ONE window over (key ordered by change time) — `lead` closes
  * each interval at the next change. A single shuffle on the entity
  * key; no self-join, no state. At 100 TB the window partitions by
  * entity key, so skew only arises from a single entity with millions
  * of versions (not a dimension-table shape); AQE handles moderate
  * imbalance and the key-salting pattern from c13 applies if one ever
  * does.
  *
  * Determinism: the ordering must be a TOTAL order per key or `lead`
  * is nondeterministic under retries — callers pass a tie-breaker
  * column (here the change id) alongside the timestamp.
  */
object Scd2 {

  /** Build the history: `changes` has one row per (entity, version).
    * Output adds `effective_from` (the change time), `effective_to`
    * (next change's time, null while current) and `is_current`. */
  def history(
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
