package graft

import org.apache.spark.sql.SparkSession

/** Session factory for library users — the tuned configuration every
  * graft pipeline assumes:
  *
  *   - shuffle partitions sized to the parallelism (NOT the 200 default,
  *     which fragments small-to-mid stages; at cluster scale pass the
  *     real core count);
  *   - AQE on: runtime coalescing, broadcast demotion/promotion, skew
  *     join splitting;
  *   - UTC session timezone (oracle parity and sane timestamp math);
  *   - legacy nanos-as-long parquet read (the `events` fixture carries
  *     TIMESTAMP(NANOS), which Spark 4 otherwise rejects — see Tables).
  */
object Engine {
  def session(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed Aggregators (top-k, sketches) run as ObjectHashAggregate,
      // which silently degrades to SORT-BASED aggregation after 128
      // distinct keys per partition by default — a per-query-key top-k
      // has thousands. Keep it hash-based; buffers here are k-row arrays
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false")
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
