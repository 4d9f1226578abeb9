package graft.plans

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's mutable scalar counter (`plan-joined-count`,
  * `/root/reference/src/plan-server.ts:50-83`) as a 1-row snapshot table:
  * INCR/DECR/SET are read-modify-overwrite, GET defaults a missing table
  * to 0 (matching `plan-server.ts:80-82`).
  *
  * This is the batch form (§2a rows 10–11); the streaming form — a
  * running aggregate over a ±1 event stream — lives in
  * [[graft.streaming.StreamingOps.runningCounter]] and is the shape that
  * scales (the snapshot overwrite here is inherently serial, which is
  * exactly what the reference's Redis counter was).
  */
final class Counter(spark: SparkSession, path: String) {

  def get(): Long = {
    import spark.implicits._
    try spark.read.parquet(path).select(coalesce(first($"value"), lit(0L)))
      .as[Long].collect().headOption.getOrElse(0L)
    catch { case _: org.apache.spark.sql.AnalysisException => 0L } // absent → 0
  }

  def set(v: Long): Long = {
    import spark.implicits._
    Seq(v).toDF("value").coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    v
  }

  def incr(): Long = set(get() + 1)
  def decr(): Long = set(get() - 1)
}
