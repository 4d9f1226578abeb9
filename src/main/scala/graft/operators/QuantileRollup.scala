package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE quantile sketches — [[SketchRollup]]'s analog
  * for percentiles: build one log-bucket histogram per fine-grained
  * cell in a single pass over the raw data, persist the bucket table
  * (cells × ≤~1.5k rows), and answer any coarser quantile rollup — per
  * type, per day, global — by summing bucket counts, never rescanning
  * raw data. `approx_percentile` (d11) answers one ad-hoc question per
  * scan; this materializes the reusable intermediate.
  *
  * Sketch = the DDSketch bucket scheme (Masson, Rim & Lee, "DDSketch: a
  * fast and fully-mergeable quantile sketch with relative-error
  * guarantees", VLDB 2019): a positive value x lands in bucket
  * ⌈ln x / ln γ⌉, so every value in bucket i lies in (γ^(i−1), γ^i]
  * and the bucket midpoint 2γ^i/(γ+1) is within α = (γ−1)/(γ+1)
  * RELATIVE error of any of them — a DETERMINISTIC worst-case
  * guarantee, not a probabilistic one (α ≈ 0.99% at the γ = 1.02
  * default). Zero and negative values get a sign column (the paper's
  * mirrored-store scheme). Chosen over KLL/REQ deliberately: those
  * compact with random coins, so fold order changes the structure;
  * a bucket histogram is a pure integer map, which buys
  *
  *   - merge-equals-whole EXACTLY (bucket counts add — the same
  *     order-independence law SketchRollupSpec pins for HLL registers,
  *     here with bit-exact equality, QuantileRollupSpec pins it);
  *   - bit-determinism end to end (bucket index is one ln + one
  *     divide of IEEE doubles — same expression, same answer), so the
  *     driver gate can hash the outputs;
  *   - plain-DataFrame implementation: the build is one codegen'd
  *     projection + a count groupBy (map-side combine), no UDAF, no
  *     interpreted per-row path (the measured 2-7× JIT-swing trap).
  *
  * The trade: bucket count grows with the value RANGE (log_γ spread —
  * ~1.5k buckets for a 10⁶ dynamic range at γ = 1.02) rather than being
  * fixed like KLL's k; for telemetry-shaped data that is a few KB per
  * cell, and a paper-faithful collapse (merge the smallest buckets past
  * a cap) can bound it if a deployment ever needs to.
  *
  * Quantile semantics: rank = max(1, ⌈q·n⌉) over the EXACT counts (the
  * lower discrete quantile), so the estimate's only error is the bucket
  * rounding of the VALUE at that rank — within α relative, guaranteed,
  * which is what l60's tolerance gate asserts against the exact
  * rank-value computed in the same plan. */
object QuantileRollup {

  /** Default relative-accuracy parameter: α = (γ−1)/(γ+1) ≈ 0.99%. */
  val DefaultGamma = 1.02

  private def bucketCols(metricCol: String, gamma: Double) = Seq(
    signum(col(metricCol)).cast("int").as("sgn"),
    when(col(metricCol) === 0.0, lit(0))
      .otherwise(ceil(log(abs(col(metricCol))) / math.log(gamma)).cast("int"))
      .as("bucket"))

  /** One pass over the raw data: a bucket histogram of `metricCol` per
    * distinct `dims` cell — rows `(dims…, sgn, bucket, cnt)`, ready to
    * persist. Null metrics are skipped (SQL aggregate convention). */
  def buildSketchTable(
      raw: DataFrame,
      dims: Seq[String],
      metricCol: String,
      gamma: Double = DefaultGamma): DataFrame = {
    require(gamma > 1.0, s"gamma must exceed 1, got $gamma")
    raw.filter(col(metricCol).isNotNull)
      .select(dims.map(col) ++ bucketCols(metricCol, gamma): _*)
      .groupBy((dims ++ Seq("sgn", "bucket")).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold a batch's bucket table into the maintained one at the same
    * grain — the streaming/incremental maintenance step: bucket counts
    * ADD, so the maintained table after any batch schedule is
    * BIT-IDENTICAL to building over the union of all batches (stronger
    * than the HLL tier's estimate-identical law). Per-batch work is
    * batch-sized; raw history is never rescanned. */
  def merge(state: DataFrame, batch: DataFrame, dims: Seq[String]): DataFrame =
    state.unionByName(batch)
      .groupBy((dims ++ Seq("sgn", "bucket")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Paper-faithful bucket-cap collapse (Masson et al. §2.3, the
    * collapsing store): per cell, keep at most `maxBuckets` buckets by
    * merging the LOWEST-value buckets into the lowest RETAINED one —
    * bounding per-cell memory under adversarial value ranges (the
    * log_γ-spread growth the uncapped histogram trades away). The
    * guarantee that survives, exactly as in the paper: any quantile
    * whose rank lands ABOVE the collapsed mass reads back bit-identical
    * to the uncollapsed sketch (collapse never touches retained
    * buckets), so high quantiles keep the full α bound; a rank inside
    * the collapsed mass answers the boundary bucket's estimate — only
    * ever rounding low values UP to the lowest retained bucket, a
    * one-sided, computable widening (QuantileRollupSpec pins both).
    * Total count is preserved, so ranks never shift. Collapsed tables
    * stay mergeable: bucket counts still just add ([[merge]]), though
    * merging two DIFFERENTLY-collapsed cells widens to the coarser
    * boundary — collapse once, at publish, after the fold. Cells
    * already under the cap pass through untouched. */
  def collapse(
      sketches: DataFrame,
      dims: Seq[String],
      maxBuckets: Int): DataFrame = {
    require(maxBuckets >= 2, s"maxBuckets must be at least 2, got $maxBuckets")
    // descending value order: rank 1 = highest bucket; rows ranked past
    // the cap are the lowest values — the collapse victims
    val w = Window.partitionBy(dims.map(col): _*)
      .orderBy(col("sgn").desc, (col("sgn") * col("bucket")).desc)
    val ranked = sketches.withColumn("__rn", row_number().over(w))
    // the merge target: the maxBuckets-th bucket from the top (absent
    // for cells under the cap — the left join leaves those untouched)
    val bound = ranked.filter(col("__rn") === maxBuckets)
      .select((dims.map(col) :+ col("sgn").as("__bsgn")
        :+ col("bucket").as("__bbucket")): _*)
    ranked.join(bound, dims, "left")
      .select((dims.map(col) ++ Seq(
        when(col("__rn") >= maxBuckets, col("__bsgn"))
          .otherwise(col("sgn")).as("sgn"),
        when(col("__rn") >= maxBuckets, col("__bbucket"))
          .otherwise(col("bucket")).as("bucket"),
        col("cnt"))): _*)
      .groupBy((dims ++ Seq("sgn", "bucket")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Merge a (possibly persisted) bucket table down to `keep` grain and
    * estimate the given quantiles: one row per (cell, q) with the
    * α-guaranteed estimate. No raw data touched — the whole job is
    * bucket-table sized (a sum groupBy + one window over ≤~1.5k rows
    * per cell). `keep = Seq.empty` is the global rollup. */
  def quantiles(
      sketches: DataFrame,
      keep: Seq[String],
      qs: Seq[Double],
      gamma: Double = DefaultGamma): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    // constant key for the global rollup: the windows need a partition
    val grouped = (if (keep.isEmpty)
      sketches.withColumn("__g", lit(0)) else sketches)
    val dims = if (keep.isEmpty) Seq("__g") else keep
    val buckets = grouped
      .groupBy((dims ++ Seq("sgn", "bucket")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    // negative buckets sort by descending magnitude, zero between, then
    // positives ascending: (sgn, sgn·bucket) is exactly that order
    val w = Window.partitionBy(dims.map(col): _*)
      .orderBy(col("sgn"), (col("sgn") * col("bucket")).asc)
    val wAll = Window.partitionBy(dims.map(col): _*)
    val cum = buckets
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wAll))
    val est = col("sgn") *
      lit(2.0) * pow(lit(gamma), col("bucket")) / lit(gamma + 1.0)
    cum
      .select((dims.map(col) ++ Seq(col("sgn"), col("bucket"), col("cnt"),
        col("cum"), col("total"), explode(array(qs.map(lit): _*)).as("q"))): _*)
      .withColumn("rank", greatest(lit(1L), ceil(col("q") * col("total")).cast("long")))
      // exactly one bucket satisfies cum−cnt < rank ≤ cum per (cell, q)
      .filter(col("cum") - col("cnt") < col("rank") && col("rank") <= col("cum"))
      .select((dims.map(col) :+ col("q") :+ est.as("est")): _*)
      .drop((if (keep.isEmpty) Seq("__g") else Nil): _*)
  }
}
