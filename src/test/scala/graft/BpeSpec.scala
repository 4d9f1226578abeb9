package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe training reproduces the hand-computed merge sequence") {
    // word freqs: aaaa×2, ab×1. Round 1: (a,a) = 3 adjacent per "aaaa"
    // (overlapping count) × 2 = 6 beats (a,b) = 1 → "aaaa" rewrites
    // GREEDILY to [aa, aa]. Round 2: (aa,aa) = 2 beats (a,b) = 1.
    // Round 3: only (a,b) = 1 remains.
    val docs = Seq((1L, "aaaa ab"), (2L, "aaaa")).toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(docs, "text", nMerges = 5, minPairCount = 1)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (0, "a", "a", 6L), (1, "aa", "aa", 2L), (2, "a", "b", 1L)))
  }

  test("ties break to the lexicographically least pair") {
    val docs = Seq((1L, "xz xy")).toDF("doc_id", "text")
    val m = Bpe.bpeTrain(docs, "text", nMerges = 1, minPairCount = 1).collect()
    assert(m.length === 1)
    assert((m(0).getString(1), m(0).getString(2)) === ("x", "y"))
  }

  test("minPairCount stops training; merge table is bounded by nMerges") {
    val docs = Seq((1L, "aaaa ab"), (2L, "aaaa")).toDF("doc_id", "text")
    val stopped = Bpe.bpeTrain(docs, "text", nMerges = 5, minPairCount = 2).collect()
    assert(stopped.length === 2) // the count-1 (a,b) merge never happens
    val capped = Bpe.bpeTrain(docs, "text", nMerges = 1, minPairCount = 1).collect()
    assert(capped.length === 1)
  }

  test("encoding a training word yields its final training symbols (consistency law)") {
    val docs = Tables(spark, sf, "documents").limit(120)
    val (mergesDf, vocabDf) = Bpe.bpeTrainFull(docs, "text", nMerges = 16, minPairCount = 2)
    // collect both promptly: vocab references rotated checkpoint blocks
    // that a later bpe.vocab rotation would evict (Checkpoints contract)
    val merges = mergesDf.orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val finalLen = vocabDf.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).length).toMap
    assert(merges.nonEmpty && finalLen.nonEmpty)
    val stats = Bpe.bpeEncodeStats(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { r =>
      val toks = Option(r.getString(1)).map(_.split(" ").filter(_.nonEmpty))
        .getOrElse(Array.empty[String])
      val expected = (toks.length.toLong, toks.map(w => finalLen(w).toLong).sum)
      assert(stats(r.getLong(0)) === expected, s"doc ${r.getLong(0)}")
    }
  }

  test("training is deterministic across runs") {
    val docs = Tables(spark, sf, "documents").limit(80)
    def run() = Bpe.bpeTrain(docs, "text", nMerges = 8, minPairCount = 2)
      .orderBy(col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(run() === run())
  }

  test("driver and distributed training branches are identical (sub-floor law)") {
    // default cap ≫ fixture vocab → driver loop; cap 0 forces the
    // distributed per-round jobs. Merges AND final vocab must agree
    // exactly — the same branch-equality pin the dedup closures carry.
    val docs = Tables(spark, sf, "documents").limit(150)
    def run(): (Seq[(Int, String, String, Long)], Set[(String, Seq[String], Long)]) = {
      val (m, v) = Bpe.bpeTrainFull(docs, "text", nMerges = 12, minPairCount = 2)
      (m.orderBy(col("rank")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq,
        v.collect().map(r =>
          (r.getString(0), r.getSeq[String](1).toSeq, r.getLong(2))).toSet)
    }
    val fast = run()
    spark.conf.set(Bpe.DriverTrainCapKey, "0")
    try {
      val dist = run()
      assert(fast._1 === dist._1)
      assert(fast._2 === dist._2)
      assert(fast._1.nonEmpty)
    } finally spark.conf.unset(Bpe.DriverTrainCapKey)
  }

  test("null and empty text: zero stats, row survives") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "ab ab"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"))
    val got = Bpe.bpeEncodeStats(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 0L, 0L), (2L, 0L, 0L), (3L, 2L, 2L)))
  }
}
