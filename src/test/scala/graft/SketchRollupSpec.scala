package graft

import graft.operators.SketchRollup
import org.apache.spark.sql.functions._

class SketchRollupSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")
    .withColumn("day", to_date(col("ts")))

  private def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("rollup from per-day parts equals sketching the whole (merge law)") {
    val fine = SketchRollup.buildSketchTable(events, Seq("event_type", "day"), "user_id")
    val merged = estimates(SketchRollup.rollup(fine, Seq("event_type")))
    val whole = estimates(SketchRollup.rollup(
      SketchRollup.buildSketchTable(events, Seq("event_type"), "user_id"),
      Seq("event_type")))
    // HLL registers are stream-order-independent maxima, so the union
    // of the per-day sketches carries the same registers as the
    // single-pass sketch — the estimates must agree exactly
    assert(merged === whole, s"merged=$merged whole=$whole")
  }

  test("estimates are within HLL accuracy of exact distinct counts") {
    val fine = SketchRollup.buildSketchTable(events, Seq("event_type", "day"), "user_id")
    val approx = estimates(SketchRollup.rollup(fine, Seq("event_type")))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      val e = approx(k)
      // default lgConfigK = 12 → relative error ~1.6%/sqrt-bound; 5%
      // here means a broken sketch, not bad luck
      assert(math.abs(e - n) <= math.max(1L, (0.05 * n).toLong),
        s"$k: approx $e vs exact $n")
    }
  }

  test("persisted sketch table answers the same rollup after a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_").toString
    try {
      val fine = SketchRollup.buildSketchTable(events, Seq("event_type", "day"), "user_id")
      fine.write.mode("overwrite").parquet(dir)
      val live = estimates(SketchRollup.rollup(fine, Seq("event_type")))
      val persisted = estimates(SketchRollup.rollup(spark.read.parquet(dir), Seq("event_type")))
      assert(persisted === live)
      // and a DIFFERENT grain from the same persisted table — the point
      // of materializing sketches instead of answers
      val perDay = SketchRollup.rollup(spark.read.parquet(dir), Seq("day"))
      assert(perDay.count() === events.select(col("day")).distinct().count())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
