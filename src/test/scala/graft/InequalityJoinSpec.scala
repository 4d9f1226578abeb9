package graft

import graft.operators.InequalityJoin
import org.apache.spark.sql.functions._

/** Laws for the histogram-prefix counting theta join (c8's engine):
  * exact equality with the nested-loop count on adversarial inputs —
  * negative values, left values outside the right range (both clamping
  * branches), ties on the strict inequality, and a bucket width that
  * doesn't divide the data range evenly. */
class InequalityJoinSpec extends SparkSpec {

  test("countGreater equals the nested-loop theta count on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // left range is 2× wider than right, so some left rows clamp below
    // the histogram (count = everything) and some above (count = 0/absent)
    val left = (1L to 200L).map(i => (i, rng.nextDouble() * 4000 - 2000)).toDF("id", "v")
    val right = (1L to 300L).map(i => (i, rng.nextDouble() * 2000 - 1000)).toDF("rid", "rv")
    val got = InequalityJoin.countGreater(left, "id", "v", right, "rv", bucketWidth = 37.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = left.crossJoin(right).filter($"rv" > $"v")
      .groupBy($"id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
    assert(want.nonEmpty)
  }

  test("countGreater sums per id when leftId is NOT unique (round-3 advisor)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 40 distinct ids × ~5 rows each — same-id rows land in the same
    // bucket AND in different buckets, the two failure modes of the old
    // (leftId, bucket) grouping: suffix counted once per group instead
    // of once per row, and multi-bucket ids split into multiple rows
    val left = (1L to 200L).map(i => (i % 40, rng.nextDouble() * 3000 - 1500)).toDF("id", "v")
    val right = (1L to 250L).map(i => (i, rng.nextDouble() * 2000 - 1000)).toDF("rid", "rv")
    val res = InequalityJoin.countGreater(left, "id", "v", right, "rv", bucketWidth = 50.0)
    val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res.count() == got.size, "one output row per left id")
    val want = left.crossJoin(right).filter($"rv" > $"v")
      .groupBy($"id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"sizes got=${got.size} want=${want.size}")
    assert(want.nonEmpty)
  }

  test("countGreater: empty right side yields an empty result") {
    import spark.implicits._
    val left = Seq((1L, 5.0)).toDF("id", "v")
    val right = Seq.empty[(Long, Double)].toDF("rid", "rv")
    assert(InequalityJoin.countGreater(left, "id", "v", right, "rv", 10.0).count() == 0)
  }

  test("countGreater: strict inequality — equal values never count") {
    import spark.implicits._
    val left = Seq((1L, 5.0), (2L, 10.0), (3L, -3.0)).toDF("id", "v")
    val right = Seq((1L, 5.0), (2L, 5.0), (3L, 10.0), (4L, -3.0)).toDF("rid", "rv")
    val got = InequalityJoin.countGreater(left, "id", "v", right, "rv", bucketWidth = 4.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // id 1 (5.0): only 10.0 is strictly greater; id 2 (10.0): none ->
    // absent (inner-join semantics); id 3 (-3.0): 5,5,10 qualify
    assert(got == Map(1L -> 1L, 3L -> 3L), s"got $got")
  }
}
