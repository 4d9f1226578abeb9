package graft.queries

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2b group D — aggregation.
  *
  * All double measures go through exact decimal accumulation (Canon) so
  * partial+final hash aggregation over any number of partitions is
  * bit-reproducible — the property that makes these results stable from
  * local[32] to a 1000-executor shuffle.
  */
object AggQueries {

  /** D: the M1 flagship — TPC-H Q1-style pricing summary (SURVEY §7.2).
    * Exercises scan, pushed predicate, projection, partial+final hash
    * aggregate, expression eval, sort. */
  val d1Pricing = Q(
    "d1_q1_pricing",
    (s, dir) => {
      import s.implicits._
      val disc = Canon.dec($"l_discount")
      val price = Canon.dec($"l_extendedprice")
      val discPrice = (price * (lit(1) - disc)).cast("decimal(18,4)")
      val charge = (discPrice * (lit(1) + Canon.dec($"l_tax"))).cast("decimal(18,6)")
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          Canon.dsumD($"l_quantity").as("sum_qty"),
          Canon.dsumD($"l_extendedprice").as("sum_base_price"),
          round(sum(discPrice).cast("double"), 2).as("sum_disc_price"),
          round(sum(charge).cast("double"), 2).as("sum_charge"),
          Canon.davg($"l_quantity").as("avg_qty"),
          Canon.davg($"l_extendedprice").as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
                   round(CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** D: distinct over a projection. */
  val d2Distinct = Q(
    "d2_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
            ORDER BY l_returnflag, l_linestatus"""))

  /** D: count-distinct (expanded by RewriteDistinctAggregates). */
  val d3CountDistinct = Q(
    "d3_count_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_suppkey").as("n_supp"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
                   count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** D: rollup — subtotal rows surfaced via coalesce sentinel. */
  val d4Rollup = Q(
    "d4_rollup",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), Canon.dsumD($"o_totalprice").as("sum_price"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"sum_price")
        .orderBy($"status", $"priority")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY status, priority"""))

  /** D: cube. */
  val d5Cube = Q(
    "d5_cube",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), Canon.dsumD($"l_quantity").as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("ALL")).as("flag"),
          coalesce($"l_linestatus", lit("ALL")).as("status"),
          $"n", $"sum_qty")
        .orderBy($"flag", $"status")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
                   coalesce(l_linestatus, 'ALL') AS status,
                   count(*) AS n,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY flag, status"""))

  /** D: explicit GROUPING SETS through the SQL surface (spark.sql). */
  val d6GroupingSets = Q(
    "d6_grouping_sets",
    (s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                      coalesce(o_orderpriority, 'ALL') AS priority,
                      count(*) AS n
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY status, priority""")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                   coalesce(o_orderpriority, 'ALL') AS priority,
                   count(*) AS n
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            ORDER BY status, priority"""))

  /** D: collect_list nesting (§2a#6) — order pinned with sort_array, since
    * post-shuffle collect order is nondeterministic by design. Rendered as
    * CSV so DuckDB's string_agg can oracle it. */
  val d7CollectNested = Q(
    "d7_collect_nested",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_orderkey" < 3000)
        .groupBy($"l_orderkey")
        .agg(
          concat_ws(",", sort_array(collect_list($"l_linenumber"))).as("lines"),
          count(lit(1)).as("n"))
        .orderBy($"l_orderkey")
    },
    Some("""SELECT l_orderkey,
                   string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines,
                   count(*) AS n
            FROM lineitem WHERE l_orderkey < 3000
            GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** D: approx distinct (HLL sketch) — mergeable across partitions, the
    * 100 TB cardinality answer. Sketch estimates differ between engines
    * by design, so the DECLARED form is the tolerance invariant: the
    * HLL++ estimate (rsd 0.01) must land within 5% of the exact
    * distinct count computed in the same aggregation — and DuckDB
    * asserts the exact side directly. ExplainSpec still bounds the
    * error shape. */
  val d8ApproxDistinct = Q(
    "d8_approx_distinct",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_orderkey", 0.01).as("approx"),
          countDistinct($"l_orderkey").as("exact_orders"))
        .select($"l_returnflag", $"exact_orders",
          (abs($"approx".cast("double") / $"exact_orders" - 1.0) <= 0.05)
            .as("within_tol"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
                   CAST(1 AS BOOLEAN) AS within_tol
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** D: pivot — groupBy + pivot compiles to one hash aggregation with
    * conditional measures (NO extra shuffle per pivot value); pivot
    * values are pinned explicitly, both for determinism and because at
    * scale an unpinned pivot first runs a distinct-values job. The
    * oracle is the equivalent FILTERed aggregation. */
  val d9Pivot = Q(
    "d9_pivot",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select($"o_orderstatus",
          coalesce($"1-URGENT", lit(0L)).as("n_urgent"),
          coalesce($"2-HIGH", lit(0L)).as("n_high"),
          coalesce($"3-MEDIUM", lit(0L)).as("n_medium"),
          coalesce($"4-NOT SPECIFIED", lit(0L)).as("n_notspec"),
          coalesce($"5-LOW", lit(0L)).as("n_low"))
        .orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
                   count(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
                   count(*) FILTER (o_orderpriority = '2-HIGH') AS n_high,
                   count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_medium,
                   count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
                   count(*) FILTER (o_orderpriority = '5-LOW') AS n_low
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** D: exact percentiles with linear interpolation — Spark `percentile`
    * and DuckDB `quantile_cont` both use index q·(n−1) with linear
    * interpolation. Cross-engine exactness needs INTEGER inputs: the
    * dyadic fractions (.25/.5/.75) interpolate integers bit-identically,
    * while interpolating raw doubles differs by 1 ulp between the two
    * formulas and flips a round() at scale boundaries (measured at
    * sf0.001) — so the price median runs over exact integer cents.
    * (The sketch-based alternative is approx_percentile — mergeable at
    * scale but engine-specific, like d8's HLL.) */
  val d10Percentile = Q(
    "d10_percentile",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .withColumn("price_cents", round($"l_extendedprice" * 100).cast("bigint"))
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(price_cents, 0.5)").as("p50_price_cents"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   quantile_cont(l_quantity, 0.25) AS p25,
                   quantile_cont(l_quantity, 0.5) AS p50,
                   quantile_cont(l_quantity, 0.75) AS p75,
                   quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) AS p50_price_cents
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** D: approx percentile (KLL-style mergeable quantile sketch) — the
    * 100 TB quantile answer next to d10's exact form, the same pairing
    * as d8 (HLL) next to d3 (exact count-distinct). Sketch outputs
    * differ between engines by design, so the DECLARED form is the
    * rank-tolerance invariant: `approx_percentile(p, accuracy=10⁴)`
    * returns a data element whose rank is within n/10⁴ of the target,
    * which is far inside the exact interpolated percentiles at p±0.01 —
    * each approx quantile must land in its [p−0.01, p+0.01] exact
    * bracket, computed in the same aggregation. DuckDB asserts the
    * group sizes and the booleans. */
  val d11ApproxPercentile = Q(
    "d11_approx_percentile",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
            .as("ap"),
          expr("""percentile(l_extendedprice,
                  array(0.24, 0.26, 0.49, 0.51, 0.74, 0.76))""").as("ep"))
        .select($"l_returnflag", $"n",
          (element_at($"ap", 1).between(element_at($"ep", 1), element_at($"ep", 2)) &&
            element_at($"ap", 2).between(element_at($"ep", 3), element_at($"ep", 4)) &&
            element_at($"ap", 3).between(element_at($"ep", 5), element_at($"ep", 6)))
            .as("within_rank_tol"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n,
                   CAST(1 AS BOOLEAN) AS within_rank_tol
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** D: correlation + covariance per group — built from exact integer
    * co-moments (Σx, Σy, Σx², Σy², Σxy over decimal-cast integers), not
    * the native `corr`/`covar_pop` aggregates, whose streaming double
    * updates depend on partial-merge order and cannot hash-match across
    * engines or even across shuffles. The five sums are exact in any
    * aggregation tree; each statistic is then ONE double expression over
    * them (sqrt and divide are IEEE correctly-rounded in both engines),
    * emitted RAW — the comparator rounds both sides consistently, and
    * in-query rounding of exact-half quotients is the known Spark
    * half-up / DuckDB half-even trap. */
  val d12CorrCovar = Q(
    "d12_corr_covar",
    (s, dir) => {
      import s.implicits._
      val x = $"l_quantity".cast("decimal(38,0)")
      val y = round($"l_extendedprice" * 100).cast("decimal(38,0)")
      val m = Tables(s, dir, "lineitem")
        .select($"l_returnflag", x.as("x"), y.as("y"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
          sum($"x" * $"y").as("sxy"))
      val nD = $"n".cast("decimal(38,0)")
      val covNum = (nD * $"sxy" - $"sx" * $"sy").cast("double")
      val dx = (nD * $"sxx" - $"sx" * $"sx").cast("double")
      val dy = (nD * $"syy" - $"sy" * $"sy").cast("double")
      m.select($"l_returnflag", $"n",
        (covNum / sqrt(dx * dy)).as("corr_qty_cents"),
        (covNum / ($"n".cast("double") * $"n".cast("double"))).as("covar_pop_cents"))
        .orderBy($"l_returnflag")
    },
    Some("""WITH m AS (
              SELECT l_returnflag, count(*) AS n,
                     sum(CAST(l_quantity AS BIGINT)) AS sx,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
                     sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy,
                     sum(CAST(l_quantity AS BIGINT)
                         * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
              FROM lineitem GROUP BY l_returnflag)
            SELECT l_returnflag, n,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_cents,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_pop_cents
            FROM m ORDER BY l_returnflag"""))

  def all: Seq[Q] = Seq(
    d1Pricing, d2Distinct, d3CountDistinct, d4Rollup, d5Cube,
    d6GroupingSets, d7CollectNested, d8ApproxDistinct, d9Pivot, d10Percentile,
    d11ApproxPercentile, d12CorrCovar)
}
