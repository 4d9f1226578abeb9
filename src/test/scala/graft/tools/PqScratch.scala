package graft.tools

import graft.{Engine, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Throwaway stage isolation for the PQ serve path at scale (same
  * spirit as [[Scratch]]): times candidates / screen / full serve
  * separately against the int8 indexed serve on the same batch. */
object PqScratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_EMBED_DIR", "/tmp/sf_embed100k")
    val spark = Engine.session("local[32]", "graft-pq-scratch",
      shufflePartitions = Some(32))
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val serveQ = emb.filter(pmod(xxhash64(col("vec_id")), lit(1000L)) === 7)
      .localCheckpoint()
    val pqDir = s"$dir/__graft_pq_index"
    val ivfDir = s"$dir/__graft_ivf_index"
    if (!graft.operators.AnnStore.exists(pqDir))
      Similarity.buildPqIndex(emb, pqDir, cellCap = Some(8192)).count()
    if (!graft.operators.AnnStore.exists(ivfDir))
      Similarity.buildIvfIndex(emb, ivfDir, cellCap = Some(8192)).count()

    def t(name: String)(body: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = body
        println(f"[pqscratch] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s ($r rows) [rep $i]")
      }
    }
    t("cand_count") {
      Similarity.pqCandidatesIndexed(serveQ, pqDir, 4).count()
    }
    t("cand_live") { // survivors a perfect screen would keep vs all
      Similarity.pqCandidatesIndexed(serveQ, pqDir, 4)
        .agg(sum(when(col("ub") - col("lb") > 0.2, 1).otherwise(0)).as("wide"),
          count(lit(1)).as("all")).collect()
        .map(r => r.getLong(1)).head
    }
    t("screen_surv") {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val screen = ColumnBridge.column(graft.functions.TopKScreenAgg(
        ColumnBridge.expression(col("nid")), ColumnBridge.expression(col("lb")),
        ColumnBridge.expression(col("ub")), 3).toAggregateExpression())
      Similarity.pqCandidatesIndexed(serveQ, pqDir, 4)
        .groupBy(col("qid")).agg(screen.as("c"))
        .select(col("qid"), explode(col("c")).as("nid")).count()
    }
    t("pq_full") {
      Similarity.pqTopKIndexed(serveQ, emb, pqDir, 3).count()
    }
    t("ivf_full") {
      Similarity.ivfTopKIndexed(serveQ, emb, ivfDir, 3).count()
    }
    println(s"[pqscratch] n=$n queries=${serveQ.count()}")
    spark.stop()
  }
}
