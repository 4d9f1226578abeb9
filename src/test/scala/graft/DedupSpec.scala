package graft

import graft.operators.{Dedup, LlmQueries}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private lazy val docs = Tables(spark, sf, "documents")

  /** exact jaccard ground truth (same formulation as l4, threshold 0.8). */
  private lazy val highJaccardPairs: Set[(Long, Long)] =
    Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("fixture has planted near-duplicates") {
    assert(highJaccardPairs.nonEmpty)
  }

  test("minhash LSH finds every high-jaccard pair (recall @ j>=0.8)") {
    val lsh = LlmQueries.l2MinhashLsh.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = highJaccardPairs -- lsh
    assert(missed.isEmpty, s"LSH missed: $missed")
  }

  test("minhash LSH pairs are genuinely similar (precision: exact j >= 0.2)") {
    val lsh = LlmQueries.l2MinhashLsh.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactAll = Dedup.ngramJaccard(docs, "doc_id", "text", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val falsePos = lsh -- exactAll
    assert(falsePos.size <= lsh.size / 5, s"too many false positives: $falsePos")
  }

  test("simhash: identical text -> identical hash; near-dup pairs found") {
    import spark.implicits._
    val t = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "x y z w q r t"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(t, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    // fixture near-dups overlap with simhash candidates
    val sh = LlmQueries.l3Simhash.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((highJaccardPairs & sh).nonEmpty)
  }

  test("exact dedup collapses doubled corpus to one row per text") {
    val out = LlmQueries.l1ExactDedup.run(spark, sf)
    assert(out.count() == docs.count())
    assert(out.filter(col("n_copies") =!= 2).count() == 0)
  }

  test("fingerprint: deterministic, distinct texts -> distinct fps here") {
    val fp1 = LlmQueries.l9Fingerprint.run(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val fp2 = LlmQueries.l9Fingerprint.run(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fp1.sameElements(fp2))
    assert(fp1.map(_._2).distinct.length == fp1.length) // 500 distinct texts
  }
}
