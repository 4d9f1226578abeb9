package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("backward as-of: <=, ties, missing -> null") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "e1"), // exact match at t=10
      (1L, 15L, "e2"), // between right rows -> t=10 wins
      (1L, 5L, "e3"),  // before any right row -> null
      (2L, 99L, "e4"), // key with no right rows -> null
      (3L, 20L, "e5")  // tie at t=20: max payload wins
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100L),
      (1L, 12L, 120L),
      (3L, 20L, 7L),
      (3L, 20L, 9L)
    ).toDF("k", "t", "v")

    val got = AsOfJoin.backward(left, right, "k", "k", "t", "t", Seq("v"))
      .select($"tag", $"v").collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got("e1") == 100L)
    assert(got("e2") == 120L)
    assert(got("e3") == -1L)
    assert(got("e4") == -1L)
    assert(got("e5") == 9L)
  }

  test("c10 asof query: every event appears exactly once") {
    val events = Tables(spark, sf, "events").count()
    val got = queries.JoinQueries.c10Asof.run(spark, sf)
    assert(got.count() == events)
    assert(got.select("event_id").distinct().count() == events)
  }
}
