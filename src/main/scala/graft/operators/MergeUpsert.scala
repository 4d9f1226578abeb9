package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO / upsert: apply a changes table to a base snapshot —
  * matched keys take the change row, unmatched changes insert, the rest
  * of the base passes through. This is the incremental-refresh
  * generalization of the reference's full-overwrite materialization
  * (`plan-processor.ts:31-41` rewrites the whole Redis hash per
  * refresh; an upsert ships only the delta).
  *
  * Plan shape: ONE full-outer equi-join on the key (sort-merge at
  * scale, hash-partitioned both sides) + a row-local column coalesce —
  * no window, no per-key state. The change row wins WHOLESALE (all
  * columns), keyed on change-side key presence rather than per-column
  * coalesce, so a change row carrying a legitimate NULL field still
  * overwrites. Requires the key to be unique within `changes` (two
  * change rows for one key would be an ambiguous merge — the caller
  * dedupes first, e.g. keep-latest by version). A NULL-key change row
  * is dropped up front: under SQL join semantics it can never match a
  * base row, and letting it through the full-outer join would fabricate
  * an all-NULL output row. If the BASE has duplicate keys, every base
  * row with a matched key takes the change — the "update all matching
  * rows" reading of MERGE.
  */
object MergeUpsert {

  def upsert(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val joined = base.alias("b").join(
      changes.filter(col(key).isNotNull).alias("c"),
      col("b." + key) === col("c." + key), "full_outer")
    val merged = base.columns.map { name =>
      when(col("c." + key).isNotNull, col("c." + name))
        .otherwise(col("b." + name)).as(name)
    }
    joined.select(merged.toSeq: _*)
  }
}
