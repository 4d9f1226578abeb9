package graft

/** The SQL surface: for queries whose oracle SQL is portable ANSI (no
  * DuckDB-only functions), run that exact SQL through spark.sql over the
  * registered fixture views and hash-compare against the DataFrame-API
  * result. Proves a reference user could bring their SQL verbatim. */
class SqlParitySpec extends SparkSpec {

  private val portable = Seq(
    "d1_q1_pricing", "d2_distinct", "d3_count_distinct", "d4_rollup",
    "d5_cube", "d6_grouping_sets",
    "c1_inner_join", "c2_left_join", "c3_right_join", "c4_full_outer_join",
    "c5_semi_join", "c6_anti_join", "c7_broadcast_join", "c8_theta_join",
    "f1_topk_global", "f2_topk_per_group", "f3_union_all", "f4_intersect",
    "f5_except", "b2_filter_predicates", "a4_partitioned_write",
    "a5_bucketed_join", "l1_exact_dedup")

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("portable oracle SQL runs verbatim through spark.sql and matches the DataFrame API") {
    Tables.registerAll(spark, sf)
    val oracle = SparkEntry.oracleSql
    portable.foreach { name =>
      val viaSql = canon(spark.sql(oracle(name)))
      val viaApi = canon(SparkEntry.queries(name)(spark, sf))
      assert(viaSql == viaApi, s"$name: spark.sql(oracle) != DataFrame API")
    }
  }
}
