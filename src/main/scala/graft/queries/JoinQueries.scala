package graft.queries

import graft.{Canon, Q, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** SURVEY §2b group C — joins.
  *
  * Scale notes: equi-joins are left to Catalyst (sort-merge or broadcast;
  * AQE re-plans at runtime and handles skew). Dimension sides small enough
  * to broadcast are hinted explicitly (c7). The counting theta join (c8)
  * is decomposed into histogram suffix-sums + a within-bucket equi-join
  * (operators/InequalityJoin.scala) — no nested-loop join in the plan.
  * The as-of join (c10) uses the union+window form precisely because the
  * join-then-aggregate form explodes on skewed keys. c13 is the explicit
  * salt-scatter form for hot-key skew (operators/SkewJoin.scala).
  */
object JoinQueries {

  /** C: inner equi-join + aggregate (orders ⋈ customer). */
  val c1Inner = Q(
    "c1_inner_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), Canon.dsumD($"o_totalprice").as("sum_price"))
        .orderBy($"c_mktsegment")
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** C: left outer join — customers keep a row even with zero orders. */
  val c2Left = Q(
    "c2_left_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"),
          round(coalesce(Canon.dsum($"o_totalprice"), lit(0)).cast("double"), 2)
            .as("sum_price"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
                   round(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE), 2) AS sum_price
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey"""))

  /** C: right outer join — every nation survives, supplier side optional. */
  val c3Right = Q(
    "c3_right_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "supplier")
        .join(Tables(s, dir, "nation"), $"s_nationkey" === $"n_nationkey", "right")
        .groupBy($"n_nationkey", $"n_name")
        .agg(count($"s_suppkey").as("n_supp"))
        .orderBy($"n_nationkey")
    },
    Some("""SELECT n_nationkey, n_name, count(s_suppkey) AS n_supp
            FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_nationkey, n_name ORDER BY n_nationkey"""))

  /** C: full outer join over two pre-aggregated sides. */
  val c4Full = Q(
    "c4_full_outer_join",
    (s, dir) => {
      import s.implicits._
      val cn = Tables(s, dir, "customer")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
      val sn = Tables(s, dir, "supplier")
        .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
      cn.join(sn, $"c_nationkey" === $"s_nationkey", "full")
        .select(
          coalesce($"c_nationkey", $"s_nationkey").as("nationkey"),
          coalesce($"n_cust", lit(0L)).as("n_cust"),
          coalesce($"n_supp", lit(0L)).as("n_supp"))
        .orderBy($"nationkey")
    },
    Some("""WITH cn AS (SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
                 sn AS (SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey)
            SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
                   coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
            FROM cn FULL JOIN sn ON c_nationkey = s_nationkey
            ORDER BY nationkey"""))

  /** C: left semi join (EXISTS). */
  val c5Semi = Q(
    "c5_semi_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .join(
          Tables(s, dir, "orders").filter($"o_totalprice" > 4000),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 4000)
            ORDER BY c_custkey"""))

  /** C: left anti join (NOT EXISTS) — customers with no 300k+ order
    * (every customer has some order in the fixtures, so the unfiltered
    * anti join would be empty). */
  val c6Anti = Q(
    "c6_anti_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "customer")
        .join(
          Tables(s, dir, "orders").filter($"o_totalprice" > 300000),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_nationkey")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
            ORDER BY c_custkey"""))

  /** C: explicit broadcast hash join on a dimension table — the 100 TB
    * fact side never shuffles. */
  val c7Broadcast = Q(
    "c7_broadcast_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          count(lit(1)).as("n_lines"),
          Canon.dsumD($"l_extendedprice").as("sum_price"))
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand, count(*) AS n_lines,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  /** C: theta (non-equi) counting join — per supplier, how many customers
    * have a strictly larger balance. Routed through the histogram-prefix
    * decomposition (InequalityJoin.countGreater): bucket suffix-sums are
    * broadcast, the only per-row join is a within-bucket EQUI-join, and
    * the plan contains no nested loop (ExplainSpec pins that). The oracle
    * is the naive `ON c_acctbal > s_acctbal` form — proving the
    * decomposition exact. */
  val c8Theta = Q(
    "c8_theta_join",
    (s, dir) => {
      import s.implicits._
      graft.operators.InequalityJoin.countGreater(
        Tables(s, dir, "supplier"), "s_suppkey", "s_acctbal",
        Tables(s, dir, "customer"), "c_acctbal", bucketWidth = 100.0)
        .select($"s_suppkey", $"n_gt".as("n_richer_cust"))
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey, count(*) AS n_richer_cust
            FROM supplier JOIN customer ON c_acctbal > s_acctbal
            GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** C: range join — equi key + BETWEEN band on timestamps. */
  val c9Range = Q(
    "c9_range_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .join(
          Tables(s, dir, "orders"),
          $"l_orderkey" === $"o_orderkey" &&
            $"l_shipdate".between($"o_orderdate", $"o_orderdate" + expr("INTERVAL 90 DAYS")))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_lines"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_lines
            FROM lineitem JOIN orders
              ON l_orderkey = o_orderkey
             AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** C: as-of join — latest order at or before each event, per user.
    * Oracle = correlated max subquery (DuckDB's ASOF JOIN leaves
    * same-timestamp ties unspecified; the date is unambiguous). */
  val c10Asof = Q(
    "c10_asof_join",
    (s, dir) => {
      import s.implicits._
      val events = Tables(s, dir, "events")
      val orders = Tables(s, dir, "orders")
      AsOfJoin.backward(
        events, orders,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        payload = Seq("o_orderdate"))
        .select(
          $"event_id",
          coalesce($"o_orderdate".cast("date"), lit("1900-01-01").cast("date"))
            .as("asof_date"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
                   coalesce(CAST((SELECT max(o_orderdate) FROM orders
                                  WHERE o_custkey = user_id AND o_orderdate <= ts) AS DATE),
                            DATE '1900-01-01') AS asof_date
            FROM events ORDER BY event_id"""))

  /** C: multi-join chain (region→nation→customer→orders) — Catalyst
    * broadcast-selects the small dims, AQE rebalances the fact side. */
  val c11MultiJoin = Q(
    "c11_multi_join",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "region")
        .join(Tables(s, dir, "nation"), $"r_regionkey" === $"n_regionkey")
        .join(Tables(s, dir, "customer"), $"n_nationkey" === $"c_nationkey")
        .join(Tables(s, dir, "orders"), $"c_custkey" === $"o_custkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_orders"), Canon.dsumD($"o_totalprice").as("sum_price"))
        .orderBy($"r_name")
    },
    Some("""SELECT r_name, count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
            FROM region
            JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            GROUP BY r_name ORDER BY r_name"""))

  /** C: banded tolerance join — the scalable (equi-join) decomposition
    * of the |a-b|<=w theta predicate; oracle is the naive predicate
    * form, proving the decomposition is exact. */
  val c12Band = Q(
    "c12_band_join",
    (s, dir) => {
      import s.implicits._
      graft.operators.BandJoin.toleranceJoin(
        Tables(s, dir, "supplier").select($"s_suppkey", $"s_acctbal"),
        Tables(s, dir, "customer").select($"c_custkey", $"c_acctbal"),
        "s_acctbal", "c_acctbal", tol = 50.0)
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_close"))
        .orderBy($"s_suppkey")
    },
    Some("""SELECT s_suppkey, count(*) AS n_close
            FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) <= 50.0
            GROUP BY s_suppkey ORDER BY s_suppkey"""))

  /** C: manual salt-scatter skew join — the big side scatters each key
    * across 8 salts, the small side replicates 8×, so one hot key spreads
    * over 8 shuffle partitions instead of one. Salting is result-
    * invariant (ExplainSpec proves count-equality with the plain join);
    * the oracle is the PLAIN join, so the whole query hash-matching is
    * the invariance proof at value level. */
  val c13Skew = Q(
    "c13_skew_join",
    (s, dir) => {
      import s.implicits._
      graft.operators.SkewJoin.saltedInnerJoin(
        Tables(s, dir, "orders"), Tables(s, dir, "customer"),
        "o_custkey", "c_custkey")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_orders"), Canon.dsumD($"o_totalprice").as("sum_price"))
        .orderBy($"c_nationkey")
    },
    Some("""SELECT c_nationkey, count(*) AS n_orders,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey"""))

  def all: Seq[Q] = Seq(
    c1Inner, c2Left, c3Right, c4Full, c5Semi, c6Anti,
    c7Broadcast, c8Theta, c9Range, c10Asof, c11MultiJoin, c12Band, c13Skew)
}
