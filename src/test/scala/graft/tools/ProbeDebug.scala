package graft.tools

import org.apache.spark.sql.functions._

/** Scratch harness for the point-probe pushdown cost breakdown —
  * times DedupIndex.query at sf0.1 shape with the pushdown off/on and
  * with parquet filter pushdown disabled, to attribute the measured
  * l42/l59 overhead to the row filter, the parquet-side evaluation, or
  * the key-collect. Not part of the driver surface. */
object ProbeDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("local[32]", "probe-debug", Some(32))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("probe_dbg").toString
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val probe = docs.filter(col("doc_id") % 2 =!= 0)
    graft.operators.DedupIndex.build(corpus, "doc_id", "text", dir)
    def timed(tag: String)(f: => Long): Unit = {
      // 3 runs, all timed
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[probe] $tag%-28s ${ts.map(_._1).min}%7.2f s (runs ${ts.map(t => f"${t._1}%.2f").mkString("/")}, rows ${ts.head._2})")
    }
    timed("query cap=0 (no push)") {
      graft.operators.DedupIndex.query(probe, "doc_id", "text", dir, keyPushdownCap = 0).count()
    }
    timed("query default (512 cap)") {
      graft.operators.DedupIndex.query(probe, "doc_id", "text", dir).count()
    }
    timed("query cap=65536 (chunked)") {
      graft.operators.DedupIndex.query(probe, "doc_id", "text", dir,
        keyPushdownCap = 65536).count()
    }
    // key-collect alone
    timed("distinct-key collect only") {
      graft.Checkpoints.rotate("probe_dbg",
        probe.repartition(32, col("doc_id"))
          .select(col("doc_id"),
            graft.operators.Dedup.minhashSignature(col("text"), 32, 3).as("s"))
          .select(posexplode(graft.operators.Dedup.lshBandKeys(col("s"), 8, 4))
            .as(Seq("band", "bkey"))))
        .select(col("bkey")).distinct().limit(65537).collect().length.toLong
    }
    spark.stop()
  }
}
