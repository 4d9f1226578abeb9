package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Counting form of a one-sided theta join, decomposed so the plan has no
  * nested-loop join (SURVEY §2b group C — theta joins at scale).
  *
  * `SELECT l.id, count(*) FROM left l JOIN right r ON r.v > l.v GROUP BY
  * l.id` is a BroadcastNestedLoopJoin over |L|·|R| pairs when written
  * literally. But the aggregate only needs, per left row, HOW MANY right
  * values exceed it — and that decomposes by value buckets:
  *
  *   count(r.v > l.v) = Σ_{buckets strictly above l's}  hist(bucket)
  *                    + count(r.v > l.v within l's own bucket)
  *
  * The bucket histogram is tiny (value_range / bucketWidth rows), so its
  * suffix sums broadcast; the within-bucket comparison is an EQUI-join on
  * the bucket id whose per-key fan-out is bounded by the bucket's
  * population. Every shuffle is hash-partitioned; result is provably
  * identical to the nested-loop form (the decomposition is exact, not
  * approximate). Skewed value histograms (many identical values) need a
  * narrower bucketWidth — the within-bucket join is the only quadratic
  * residue and it is quadratic only in the largest bucket's population.
  */
object InequalityJoin {

  /** Per-left-ID count of right values strictly greater than each left
    * row's value, summed over the id's rows. Returns (leftId, n_gt) for
    * ids with n_gt > 0 — exactly `left JOIN right ON r.v > l.v GROUP BY
    * l.id` inner-join semantics, including when leftId is NOT unique:
    * left rows are pre-aggregated to distinct (leftId, value) pairs
    * carrying a multiplicity, each pair's exceed-count is computed once
    * and multiplied back, and the per-pair products sum per leftId.
    * Grouping by (leftId, bucket) directly would merge same-id rows
    * sharing a bucket (adding the suffix count once instead of per row)
    * and split an id spanning buckets into multiple output rows — the
    * multiplicity factors that per-row accounting out exactly. The key
    * is INPUT-DERIVED (no monotonically_increasing_id), so a stage
    * retry that recomputes the left side under different partitioning
    * reproduces identical keys — and duplicate-heavy inputs do the
    * bucket join once per distinct value instead of once per row.
    *
    * The two histogram bounds are the only driver-side reads (2 scalars,
    * by design — the same documented pattern as the IVF centroid fetch). */
  def countGreater(
      left: DataFrame,
      leftId: String,
      leftVal: String,
      right: DataFrame,
      rightVal: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val rb = right.select(col(rightVal).as("__rv"),
      floor(col(rightVal) / bucketWidth).cast("long").as("__rb"))
    val hist = rb.groupBy(col("__rb")).agg(count(lit(1)).as("__cnt"))

    val bounds = hist.agg(min("__rb"), max("__rb")).head()
    if (bounds.isNullAt(0)) {
      // empty right side: no value exceeds anything — inner-join
      // semantics make the result empty
      return left.select(col(leftId), lit(0L).as("n_gt")).limit(0)
    }
    val Row(lo: Long, hi: Long) = bounds

    // complete bucket axis [lo-1, hi]: left buckets below the range clamp
    // to lo-1 (everything on the right is above ⇒ suffix = total) and
    // ones above clamp to hi (nothing above, and the within-bucket
    // predicate filters every co-bucketed right row) — so clamping never
    // changes a count. The axis is the tiny histogram, so the
    // unpartitioned suffix-sum window is deliberate, not a scale bug.
    val spark = left.sparkSession
    val axis = spark.range(lo - 1, hi + 1).select(col("id").as("__rb"))
    val w = Window.orderBy(col("__rb").desc).rowsBetween(Window.unboundedPreceding, -1)
    val suffix = axis.join(hist, Seq("__rb"), "left")
      .withColumn("__cnt", coalesce(col("__cnt"), lit(0L)))
      .withColumn("__gt_high", coalesce(sum(col("__cnt")).over(w), lit(0L)))
      .select(col("__rb"), col("__gt_high"))

    // distinct (leftId, value) pairs with multiplicity: the exceed
    // count depends only on the value, so identical rows share one
    // bucket lookup + within-bucket count and multiply back at the end
    val lhs = left.select(col(leftId), col(leftVal).as("__lv"))
      .groupBy(col(leftId), col("__lv"))
      .agg(count(lit(1)).as("__mult"))
      .withColumn("__rb",
        least(greatest(floor(col("__lv") / bucketWidth).cast("long"), lit(lo - 1)), lit(hi)))

    lhs.join(broadcast(suffix), Seq("__rb"))
      .join(rb, Seq("__rb"), "left")
      .groupBy(col(leftId), col("__lv"), col("__mult"), col("__gt_high"))
      .agg(sum(when(col("__rv") > col("__lv"), 1L).otherwise(0L)).as("__gt_same"))
      .groupBy(col(leftId))
      .agg(sum((col("__gt_high") + col("__gt_same")) * col("__mult")).as("n_gt"))
      .filter(col("n_gt") > 0)
  }
}
