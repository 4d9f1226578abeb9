package graft

import graft.operators.QuantileRollup
import org.apache.spark.sql.functions._

class QuantileRollupSpec extends SparkSpec {

  private lazy val events = Tables(spark, sf, "events")
    .withColumn("day", to_date(col("ts")))

  private def ests(df: org.apache.spark.sql.DataFrame): Map[(String, Double), Double] =
    df.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

  private val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0)

  test("rollup from per-day parts is BIT-identical to sketching the whole (merge law)") {
    val fine = QuantileRollup.buildSketchTable(events, Seq("event_type", "day"), "value")
    val wholeTable = QuantileRollup.buildSketchTable(events, Seq("event_type"), "value")
    // stronger than the HLL tier's estimate equality: bucket counts are
    // exact integers, so the per-day table merged down to per-type must
    // equal the directly-built per-type table row for row
    val mergedDown = fine.groupBy(col("event_type"), col("sgn"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    assert(mergedDown.collect().map(_.toSeq).toSet ==
      wholeTable.collect().map(_.toSeq).toSet)
    // and therefore every quantile estimate agrees exactly
    assert(ests(QuantileRollup.quantiles(fine, Seq("event_type"), qs)) ==
      ests(QuantileRollup.quantiles(wholeTable, Seq("event_type"), qs)))
  }

  test("every estimate is within the deterministic α relative bound of the exact rank-value") {
    val fine = QuantileRollup.buildSketchTable(events, Seq("event_type", "day"), "value")
    val approx = ests(QuantileRollup.quantiles(fine, Seq("event_type"), qs))
    // exact lower discrete quantile (rank = max(1, ceil(q·n))) per type
    val byType = events.select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sorted }
    val alpha = (QuantileRollup.DefaultGamma - 1.0) / (QuantileRollup.DefaultGamma + 1.0)
    for ((k, sortedVals) <- byType; q <- qs) {
      val exact = sortedVals(
        math.max(1L, math.ceil(q * sortedVals.length).toLong).toInt - 1)
      val e = approx((k, q))
      // α ≈ 0.99% is a WORST-CASE guarantee (DDSketch bucket geometry),
      // not a confidence bound — any excess is a bug, not bad luck
      assert(math.abs(e / exact - 1.0) <= alpha + 1e-9,
        s"$k q=$q: approx $e vs exact $exact (bound $alpha)")
    }
  }

  test("merge fold order never changes the table; zero and negative values bucket correctly") {
    import spark.implicits._
    val dims = Seq("event_type", "day")
    val batches = (0 to 2).map(i => events.filter(pmod($"event_id", lit(3)) === i))
    def fold(order: Seq[Int]) = order.tail.foldLeft(
      QuantileRollup.buildSketchTable(batches(order.head), dims, "value")) {
      (st, i) => QuantileRollup.merge(
        st, QuantileRollup.buildSketchTable(batches(i), dims, "value"), dims)
    }
    val whole = QuantileRollup.buildSketchTable(events, dims, "value")
      .collect().map(_.toSeq).toSet
    assert(fold(Seq(0, 1, 2)).collect().map(_.toSeq).toSet == whole)
    assert(fold(Seq(2, 0, 1)).collect().map(_.toSeq).toSet == whole)

    // sign handling: negatives sort before zero before positives, and
    // estimates carry the sign; exact zero estimates as exactly 0
    val mixed = Seq(("a", -100.0), ("a", -1.0), ("a", 0.0), ("a", 1.0), ("a", 100.0))
      .toDF("g", "v")
    val sk = QuantileRollup.buildSketchTable(mixed, Seq("g"), "v")
    val got = QuantileRollup.quantiles(sk, Seq("g"), Seq(0.2, 0.4, 0.6, 0.8, 1.0))
      .orderBy(col("q")).collect().map(r => r.getDouble(1) -> r.getDouble(2))
    assert(got.map(_._1).sameElements(Array(0.2, 0.4, 0.6, 0.8, 1.0)))
    val vals = got.map(_._2)
    assert(math.abs(vals(0) / -100.0 - 1.0) < 0.011 && vals(0) < 0)
    assert(math.abs(vals(1) / -1.0 - 1.0) < 0.011 && vals(1) < 0)
    assert(vals(2) == 0.0)
    assert(math.abs(vals(3) / 1.0 - 1.0) < 0.011)
    assert(math.abs(vals(4) / 100.0 - 1.0) < 0.011)
  }

  test("persisted bucket table answers the same rollups after a parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qsketch_").toString
    try {
      val fine = QuantileRollup.buildSketchTable(events, Seq("event_type", "day"), "value")
      fine.write.mode("overwrite").parquet(dir)
      val persisted = spark.read.parquet(dir)
      assert(ests(QuantileRollup.quantiles(persisted, Seq("event_type"), qs)) ==
        ests(QuantileRollup.quantiles(fine, Seq("event_type"), qs)))
      // a different grain from the same persisted table — the point of
      // materializing sketches instead of answers; global rollup too
      assert(QuantileRollup.quantiles(persisted, Seq("day"), Seq(0.5)).count() ==
        events.select(col("day")).distinct().count())
      val global = QuantileRollup.quantiles(persisted, Seq.empty, Seq(0.5))
        .collect()
      assert(global.length == 1)
      val exactMedian = {
        val v = events.select(col("value")).collect().map(_.getDouble(0)).sorted
        v(math.max(1L, math.ceil(0.5 * v.length).toLong).toInt - 1)
      }
      assert(math.abs(global(0).getDouble(1) / exactMedian - 1.0) < 0.011)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
