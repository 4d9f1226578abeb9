package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Canonicalization helpers so query outputs hash-match the DuckDB oracle.
  *
  * Double-typed measures (`o_totalprice`, `l_extendedprice`, ...) are cast to
  * DECIMAL before SUM so the aggregation is exact and therefore independent of
  * partitioning / shuffle order — a float SUM over 32 partitions is not
  * reproducible, an exact decimal SUM is, at any cluster size. Final outputs
  * are cast back to DOUBLE and rounded so both engines emit identical bytes.
  */
object Canon {
  /** Exact decimal cast of a double measure with 2 fractional digits. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))

  /** Order-independent SUM of a double measure: exact decimal accumulation. */
  def dsum(c: Column, scale: Int = 2): Column = sum(dec(c, scale))

  /** Decimal sum rendered as a rounded double (identical in DuckDB via
    * `round(CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE), s)`). */
  def dsumD(c: Column, scale: Int = 2): Column =
    round(dsum(c, scale).cast("double"), scale)

  /** Deterministic average: exact decimal sum, one double division. */
  def davg(c: Column, scale: Int = 2, outScale: Int = 6): Column =
    round(dsum(c, scale).cast("double") / count(lit(1)), outScale)
}
