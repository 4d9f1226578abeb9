package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("epochMix: per-doc copies are floor(w) or ceil(w); idx dense from 0") {
    val docs = Tables(spark, sf, "documents")
    val out = TextAnalysis.epochMix(docs, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.5))
    val perDoc = out.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n"), min(col("copy_idx")).as("lo"),
        max(col("copy_idx")).as("hi"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (src, n) = (r.getString(1), r.getLong(2))
      val w = src match { case "src0" => 2.5; case "src1" => 0.5; case _ => 1.0 }
      assert(n == math.floor(w).toLong || n == math.ceil(w).toLong,
        s"doc ${r.getLong(0)} ($src): $n copies for w=$w")
      assert(r.getLong(3) === 0L && r.getLong(4) === n - 1, "copy_idx not dense")
    }
  }

  test("epochMix: realized per-source volume tracks w*n (hash slice, not prefix)") {
    val docs = Tables(spark, sf, "documents")
    val base = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = TextAnalysis.epochMix(docs, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 0.5))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def check(src: String, w: Double): Unit = base.get(src).foreach { n =>
      val got = out.getOrElse(src, 0L).toDouble
      // 4-sigma binomial bound on the fractional-epoch coin flips
      val tol = 4 * math.sqrt(n.toDouble) + 1
      assert(math.abs(got - w * n) <= tol, s"$src: $got vs ${w * n} ± $tol")
    }
    check("src0", 2.5); check("src1", 0.5)
    (base.keySet -- Set("src0", "src1")).foreach { s =>
      assert(out.getOrElse(s, 0L) === base(s), s"default-weight source $s changed")
    }
  }

  test("epochMix: deterministic across runs; zero weight drops a source") {
    val docs = Tables(spark, sf, "documents").limit(200)
    def run() = TextAnalysis.epochMix(docs, "doc_id", "source",
        Map("src0" -> 0.0, "src1" -> 1.75))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val a = run()
    assert(a === run())
    assert(!a.exists(_._2 == "src0"), "weight-0 source must vanish")
  }
}
