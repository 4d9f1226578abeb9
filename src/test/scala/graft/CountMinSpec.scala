package graft

import graft.functions.CountMin
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  private def trueCounts(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("count-min estimates are one-sided: estimate >= true count, always") {
    val rnd = new scala.util.Random(7)
    // heavy skew + collisions: tiny width so rows genuinely collide
    val xs = Seq.fill(5000)(rnd.nextLong() % 97)
    val cms = new CountMin(64, 4)
    xs.foreach(cms.add)
    trueCounts(xs).foreach { case (k, c) =>
      assert(cms.estimate(k) >= c, s"key $k: est ${cms.estimate(k)} < true $c")
    }
  }

  test("count-min is exact when the width dominates the key set") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(2000)(rnd.nextLong() % 50)
    val cms = new CountMin(1 << 16, 4)
    xs.foreach(cms.add)
    trueCounts(xs).foreach { case (k, c) =>
      // not guaranteed in general, but at 50 keys / 65536 counters the
      // per-row collision odds are ~0; a failure here means the hash
      // or indexing broke, not bad luck
      assert(cms.estimate(k) === c)
    }
  }

  test("merge equals a single build over the concatenation (cell-exact)") {
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(1000)(rnd.nextLong() % 200)
    val b = Seq.fill(1500)(rnd.nextLong() % 200)
    val ca = new CountMin(256, 3); a.foreach(ca.add)
    val cb = new CountMin(256, 3); b.foreach(cb.add)
    val whole = new CountMin(256, 3); (a ++ b).foreach(whole.add)
    assert(ca.merge(cb).cells.toSeq === whole.cells.toSeq)
  }

  test("frequentNgrams (sketch-prefiltered) is identical to the exact form") {
    val docs = Tables(spark, sf, "documents")
    val exact = TextAnalysis.frequentNgramsExact(docs, "text", n = 2, minCount = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sketched = TextAnalysis.frequentNgrams(docs, "text", n = 2, minCount = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should have frequent 2-grams at minCount=40")
    assert(sketched === exact)
  }

  test("identity survives a deliberately undersized sketch (no false negatives)") {
    // width 64 over ~27k occurrences: estimates are grossly inflated, so
    // the prefilter admits nearly everything — the exact recount must
    // still reproduce the exact answer, just with a wider shuffle
    val docs = Tables(spark, sf, "documents")
    val exact = TextAnalysis.frequentNgramsExact(docs, "text", n = 2, minCount = 40)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val tiny = TextAnalysis.frequentNgrams(docs, "text", n = 2, minCount = 40,
        width = 64, depth = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(tiny === exact)
  }

  test("short and null docs contribute no n-grams") {
    import spark.implicits._
    val docs = Seq((1L, "one"), (2L, null.asInstanceOf[String]), (3L, "a b a b a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.frequentNgramsExact(docs, "text", n = 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a b", 3L), ("b a", 2L)))
  }
}
