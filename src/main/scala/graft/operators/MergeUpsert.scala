package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * no window over the BASE, no per-key state. The change row wins
  * WHOLESALE (all columns), keyed on change-side key presence rather
  * than per-column coalesce, so a change row carrying a legitimate NULL
  * field still overwrites. A NULL-key change row is dropped up front:
  * under SQL join semantics it can never match a base row, and letting
  * it through the full-outer join would fabricate an all-NULL output
  * row. If the BASE has duplicate keys, every base row with a matched
  * key takes the change — the "update all matching rows" reading of
  * MERGE.
  *
  * The key must be UNIQUE within `changes` — two change rows for one
  * key is an ambiguous merge, and silently emitting both would be a
  * data corruption. The contract is ENFORCED, not just documented:
  *   - `versionCol = Some(v)`: keep-latest dedupe — per key, only the
  *     change row(s) with the greatest version survive (a CDC delta
  *     with several updates per key collapses to the newest);
  *   - then any key still duplicated (no version column, or tied on
  *     the max version — equally ambiguous) fails LOUDLY at execution
  *     time via `raise_error`, naming the offending key.
  * Both run on the DELTA only (one window shuffle on `changes`, which
  * is ≪ base in any incremental-refresh workload — the base-side plan
  * is untouched) and stay fully lazy/distributed: no driver-side
  * pre-count job, the check rides the merge job itself.
  */
object MergeUpsert {

  def upsert(
      base: DataFrame,
      changes: DataFrame,
      key: String,
      versionCol: Option[String] = None): DataFrame =
    merge(base, changes, key, versionCol, deleteWhen = None)

  /** Full MERGE with a delete clause — the base-table takedown analog
    * of the index tiers' tombstone deletes (l57/l58): `deleteWhen` is a
    * predicate over the CHANGE row (a CDC tombstone flag, a GDPR
    * opt-out marker), and
    *   - WHEN MATCHED AND deleteWhen  THEN DELETE — the base row drops;
    *   - WHEN MATCHED                 THEN UPDATE (change wins wholesale);
    *   - WHEN NOT MATCHED AND NOT deleteWhen THEN INSERT;
    *   - a delete-flagged change with no match does NOTHING (standard
    *     MERGE: an unmatched row only triggers the INSERT clause).
    * The flag is evaluated on `changes` BEFORE the join (pure function
    * of the change row — it cannot reference base columns), so it rides
    * the same single full-outer join as the upsert: no second join, no
    * extra shuffle, and the keep-latest/uniqueness contract applies to
    * delete rows exactly like updates (a versioned CDC delta whose
    * newest row for a key is the tombstone deletes; an older tombstone
    * superseded by a re-insert does not). */
  def merge(
      base: DataFrame,
      changes: DataFrame,
      key: String,
      versionCol: Option[String] = None,
      deleteWhen: Option[Column] = None): DataFrame = {
    val cleaned0 = changes.filter(col(key).isNotNull)
    // materialize the delete verdict as a change-row column so the
    // downstream plan is identical with and without a delete clause
    val cleaned = deleteWhen.fold(cleaned0.withColumn("__graft_del", lit(false)))(
      p => cleaned0.withColumn("__graft_del", coalesce(p, lit(false))))
    // keep-latest: rank() (not row_number) so max-version TIES survive
    // into the uniqueness check below instead of being resolved by an
    // arbitrary, partitioning-dependent pick
    val latest = versionCol.fold(cleaned) { v =>
      val w = Window.partitionBy(col(key)).orderBy(col(v).desc)
      cleaned.withColumn("__graft_rk", rank().over(w))
        .filter(col("__graft_rk") === 1).drop("__graft_rk")
    }
    // loud uniqueness contract: the count-over-key window shares the
    // keep-latest window's hash partitioning (one exchange for both),
    // and the raise_error predicate is evaluated per surviving row
    val checked = latest
      .withColumn("__graft_n", count(lit(1)).over(Window.partitionBy(col(key))))
      .filter(
        when(col("__graft_n") > 1,
          raise_error(concat(
            lit(s"MergeUpsert: duplicate change rows for key $key="),
            col(key).cast("string"),
            lit(versionCol.fold(" (no version column given)")(v =>
              s" tied on max $v — ambiguous merge")))))
          .otherwise(lit(true)))
      .drop("__graft_n")

    val joined = base.alias("b").join(
      checked.alias("c"),
      col("b." + key) === col("c." + key), "full_outer")
    val merged = base.columns.map { name =>
      when(col("c." + key).isNotNull, col("c." + name))
        .otherwise(col("b." + name)).as(name)
    }
    joined
      // the delete clause: any row whose change side is a tombstone
      // leaves the output — matched (the deletion) and unmatched (an
      // insert that must not fire) alike
      .filter(!(col("c." + key).isNotNull && col("c.__graft_del")))
      .select(merged.toSeq: _*)
  }
}
