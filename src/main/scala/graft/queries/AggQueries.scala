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

  def all: Seq[Q] = Seq(d1Pricing)
}
