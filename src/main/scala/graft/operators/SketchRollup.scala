package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE distinct-count sketches — the precomputed-
  * rollup pattern a 100 TB warehouse runs on: build one HLL sketch per
  * fine-grained cell (e.g. (event_type, day)) in a single pass over
  * the raw data, persist the sketch table (cells × ~KB), and answer
  * every coarser distinct-count rollup — per type, per day, global,
  * any subset — by merging sketches, never rescanning raw data.
  * `approx_count_distinct` (d8) answers one ad-hoc question per scan;
  * this materializes the reusable intermediate.
  *
  * Built entirely on Spark 4's native Apache DataSketches HLL
  * functions (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) — the sketches are standard DataSketches
  * binary images, so any DataSketches-speaking engine can consume the
  * persisted table.
  *
  * Why merging is sound: an HLL register is a stream-order-independent
  * MAX, so the register-wise union of per-cell sketches equals the
  * sketch of the concatenated stream (and in the small-cardinality
  * exact modes the union is set union) — rolling up from parts gives
  * the SAME estimate as sketching the whole, which SketchRollupSpec
  * pins, alongside the accuracy bound vs exact distinct counts and the
  * parquet persistence round-trip. */
object SketchRollup {

  /** One pass over the raw data: an HLL sketch of `metricCol` per
    * distinct `dims` cell (binary `sketch` column, ready to persist). */
  def buildSketchTable(
      raw: DataFrame,
      dims: Seq[String],
      metricCol: String): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension column")
    raw.groupBy(dims.map(col): _*)
      .agg(hll_sketch_agg(col(metricCol)).as("sketch"))
  }

  /** Fold a batch's sketch table into the maintained one at the same
    * grain — the STREAMING/incremental maintenance step (each ingest
    * batch sketches only ITSELF; the fold is a register-wise
    * `hll_union_agg` per cell, so the maintained table after any batch
    * schedule is identical to building over the union of all batches —
    * the order-independence law SketchRollupSpec pins). At 100 TB this
    * is "the sketch table is a streaming sink": per-batch work is
    * batch-sized, the raw history is never rescanned. */
  def merge(state: DataFrame, batch: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension column")
    state.unionByName(batch)
      .groupBy(dims.map(col): _*)
      .agg(hll_union_agg(col("sketch")).as("sketch"))
  }

  /** Merge a (possibly persisted) sketch table down to `keep` grain and
    * estimate: distinct counts at any coarser grain, no raw data.
    * `keep = Seq.empty` is the GLOBAL (grand-total) rollup — one row,
    * every sketch merged. */
  def rollup(sketches: DataFrame, keep: Seq[String]): DataFrame = {
    val est = hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct")
    if (keep.isEmpty) sketches.agg(est)
    else sketches.groupBy(keep.map(col): _*).agg(est)
  }
}
