package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Throwaway diagnosis harness (not part of the library surface):
  * runs one declared query repeatedly in a single JVM and prints
  * per-run wall time plus the slowest stages of each run, to locate
  * run-to-run variance that the bench gauge can see but not explain. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("SPARK_GRAFT_Q", "l28_pretrain_neardup")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "6").toInt
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val initPart = sys.env.getOrElse("SPARK_GRAFT_INITPART", "512")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", initPart)
      .config("spark.sql.files.minPartitionNum", "32")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage wall time via listener, with task metrics to separate
    // compute from GC from scheduling delay
    case class StageRec(id: Int, name: String, ms: Long, tasks: Int,
                        runMs: Long, gcMs: Long, cpuMs: Long, deserMs: Long,
                        details: String)
    val stages = mutable.ArrayBuffer[StageRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {c <- si.completionTime; s <- si.submissionTime} yield c - s).getOrElse(-1L)
        val tm = si.taskMetrics
        stages.synchronized {
          val graftFrames = si.details.split('\n')
            .filter(l => l.contains("graft.") || l.contains("Dedup") || l.contains("Similarity") || l.contains("TextAnalysis"))
            .take(3).mkString(" <- ")
          stages += StageRec(si.stageId, si.name.takeWhile(_ != '\n').take(60), ms, si.numTasks,
            tm.executorRunTime, tm.jvmGCTime, tm.executorCpuTime / 1000000,
            tm.executorDeserializeTime, graftFrames)
        }
      }
    })

    val fn = graft.SparkEntry.queries(qname)
    // SPARK_GRAFT_EXPLAIN=1: print the executed plan's shuffle/scan
    // skeleton instead of timing — the .explain audit loop
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      println(s"==== $qname ====")
      p.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Broadcast") ||
          l.contains("Scan parquet") || l.contains("PartitionFilters") ||
          l.contains("PushedFilters"))
        .foreach(l => println(l.replaceAll("#\\d+[L]?", "").take(220)))
      spark.stop(); return
    }
    for (i <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val top = stages.synchronized(stages.sortBy(-_.ms).take(8).toList)
      println(f"[scratch] run $i: $dt%8.2f s rows=$n stages=${stages.size}")
      top.foreach { s =>
        println(f"[scratch]    stage ${s.id}%5d wall=${s.ms}%7d run=${s.runMs}%7d cpu=${s.cpuMs}%7d gc=${s.gcMs}%6d deser=${s.deserMs}%6d tasks=${s.tasks}%4d")
        if (s.details.nonEmpty) println(s"[scratch]      at ${s.details.take(300)}")
      }
    }
    spark.stop()
  }
}
