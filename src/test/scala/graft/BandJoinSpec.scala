package graft

import graft.operators.BandJoin
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class BandJoinSpec extends SparkSpec {

  test("banded tolerance join equals the nested-loop predicate join (fixture)") {
    import spark.implicits._
    val s = Tables(spark, sf, "supplier").select($"s_suppkey", $"s_acctbal")
    val c = Tables(spark, sf, "customer").select($"c_custkey", $"c_acctbal")
    val tol = 50.0
    val naive = s.join(c, abs($"s_acctbal" - $"c_acctbal") <= tol).count()
    val banded = BandJoin.toleranceJoin(s, c, "s_acctbal", "c_acctbal", tol).count()
    assert(naive == banded && banded > 0)
  }

  test("banded tolerance join law: equals BNLJ on arbitrary data, incl. negatives") {
    import spark.implicits._
    val gen = Gen.listOfN(25, Gen.chooseNum(-100.0, 100.0))
    val p = Prop.forAll(gen, gen, Gen.chooseNum(1.0, 30.0)) { (xs, ys, tol) =>
      val l = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "lv")
      val r = ys.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "rv")
      val naive = l.join(r, abs($"lv" - $"rv") <= tol)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val banded = BandJoin.toleranceJoin(l, r, "lv", "rv", tol)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      naive == banded
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }
}
