package graft

import org.apache.spark.sql.functions._

class CoreQueriesSpec extends SparkSpec {

  test("every declared query runs on sf0.001 and returns rows") {
    Q.all.foreach { q =>
      val n = q.run(spark, sf).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("every query name with an oracle has a non-empty SQL string") {
    Q.all.foreach { q =>
      q.oracle.foreach(sql => assert(sql.trim.nonEmpty, q.name))
    }
    // names are unique
    assert(Q.all.map(_.name).distinct.size == Q.all.size)
  }

  test("d1 pricing matches hand-computed aggregate on sf0.001") {
    import spark.implicits._
    val got = queries.AggQueries.d1Pricing.run(spark, sf)
    // count_order per group must sum to the filtered row count
    val total = got.agg(sum($"count_order")).as[Long].head()
    val expected = Tables(spark, sf, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
    // groups are the distinct flag/status pairs
    val pairs = Tables(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_linestatus").distinct().count()
    assert(got.count() == pairs)
  }

  test("b4 bitmask explode reconstructs the mask (64-bit semantics)") {
    import spark.implicits._
    // sum of exploded plan_ids per key == original mask (each bit once)
    val got = queries.CoreQueries.b4BitmaskExplode.run(spark, sf)
      .groupBy($"p_partkey").agg(sum($"plan_id").as("mask_back"))
    val src = Tables(spark, sf, "part")
      .select($"p_partkey", $"p_size".cast("long").as("mask"))
    val bad = got.join(src, "p_partkey")
      .filter($"mask_back" =!= $"mask").count()
    assert(bad == 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
