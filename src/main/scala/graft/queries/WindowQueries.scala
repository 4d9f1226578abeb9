package graft.queries

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2b group E — window functions.
  *
  * Determinism rules baked in: ranking windows order by a unique composite
  * key (value, pk) — a window ordered by a non-unique key makes row_number
  * nondeterministic under shuffle, at any scale. rank/dense_rank use a
  * deliberately coarsened key so real ties exist. Frames are spelled out
  * explicitly (ROWS BETWEEN ...) so Spark and DuckDB agree.
  */
object WindowQueries {

  /** E: ranking — row_number / rank / dense_rank / ntile. */
  val e1Ranking = Q(
    "e1_ranking",
    (s, dir) => {
      import s.implicits._
      val wUnique = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      val wTies = Window.partitionBy($"c_nationkey")
        .orderBy(round($"c_acctbal", -2).desc)
      Tables(s, dir, "customer")
        .select(
          $"c_custkey", $"c_nationkey", $"c_acctbal",
          row_number().over(wUnique).as("rn"),
          ntile(4).over(wUnique).as("quartile"),
          rank().over(wTies).as("rk"),
          dense_rank().over(wTies).as("drk"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey, c_acctbal,
                   row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn,
                   ntile(4)     OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile,
                   rank()       OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, -2) DESC) AS rk,
                   dense_rank() OVER (PARTITION BY c_nationkey ORDER BY round(c_acctbal, -2) DESC) AS drk
            FROM customer ORDER BY c_custkey"""))

  /** E: analytic — lag / lead / first / last over explicit frames. */
  val e2Analytic = Q(
    "e2_analytic",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables(s, dir, "orders")
        .select(
          $"o_orderkey", $"o_custkey",
          coalesce(lag($"o_orderkey", 1).over(w), lit(-1L)).as("prev_ok"),
          coalesce(lead($"o_orderkey", 1).over(w), lit(-1L)).as("next_ok"),
          first($"o_orderkey")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("first_ok"),
          last($"o_orderkey")
            .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
            .as("last_ok"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
                   coalesce(lag(o_orderkey, 1)  OVER w, -1) AS prev_ok,
                   coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_ok,
                   first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_ok,
                   last_value(o_orderkey)  OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_ok
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_orderkey"""))

  /** E: frames — running sum + moving (4-row) sum, exact decimal inside
    * the frame so results don't drift with partitioning.
    *
    * lineitem has NO unique key in the fixtures ((orderkey, linenumber)
    * repeats at sf0.1), so the sort includes the summed measure and two
    * more columns: residual ties then carry equal l_quantity, making
    * every frame sum invariant under tie reordering. */
  val e3Frames = Q(
    "e3_frames",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_partkey", $"l_extendedprice")
      Tables(s, dir, "lineitem")
        .select(
          $"l_suppkey", $"l_orderkey", $"l_linenumber",
          sum(Canon.dec($"l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_qty"),
          sum(Canon.dec($"l_quantity"))
            .over(w.rowsBetween(-3, Window.currentRow))
            .cast("double").as("mov4_qty"))
        .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov4_qty
            FROM lineitem
            WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                                         l_quantity, l_partkey, l_extendedprice)
            ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** E: distribution ranks — percent_rank = (rank−1)/(n−1) and
    * cume_dist = rank/n are single divisions of small exact integers,
    * so both engines produce bit-identical doubles. Emitted RAW, no
    * round(): rank/n can land exactly on a .5 at any fixed decimal
    * (41/640 = 0.0640625) where Spark rounds half-up and DuckDB
    * half-even — rounding in-query is what BREAKS the match here. */
  val e4Distribution = Q(
    "e4_distribution",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
      Tables(s, dir, "customer")
        .select(
          $"c_custkey", $"c_nationkey",
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_nationkey,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist()    OVER w AS cume
            FROM customer
            WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
            ORDER BY c_custkey"""))

  def all: Seq[Q] = Seq(e1Ranking, e2Analytic, e3Frames, e4Distribution)
}
