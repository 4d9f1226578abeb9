package graft.queries

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2b group H — user-defined scalar / aggregate / table functions.
  *
  * UDx discipline for scale: the UDF here is a cheap row-local closure
  * (no state, no driver round-trips); the UDAF is an `Aggregator` with an
  * exact-decimal buffer, so partial aggregation (map-side combine) stays
  * enabled and results are shuffle-order-independent. UDTF needs are met
  * by built-in generators (posexplode) — no custom Generator required.
  */
object UdxQueries {

  /** Exact sum-of-squares over decimals: reduce/merge are decimal adds,
    * so any partial-aggregation tree yields identical bits. */
  object SumSquares extends Aggregator[java.math.BigDecimal, java.math.BigDecimal, java.math.BigDecimal] {
    override def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    override def reduce(b: java.math.BigDecimal, a: java.math.BigDecimal): java.math.BigDecimal =
      if (a == null) b else b.add(a.multiply(a))
    override def merge(b1: java.math.BigDecimal, b2: java.math.BigDecimal): java.math.BigDecimal =
      b1.add(b2)
    override def finish(r: java.math.BigDecimal): java.math.BigDecimal = r
    override def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
  }

  /** H: scalar Scala UDF — token count (split keeps trailing empties to
    * match DuckDB's string_split). */
  val h1Udf = Q(
    "h1_udf_tokens",
    (s, dir) => {
      import s.implicits._
      val nTokens = udf((t: String) => if (t == null) 0 else t.split(" ", -1).length)
      Tables(s, dir, "documents")
        .select($"doc_id", nTokens($"text").as("n_tokens"), $"n_chars")
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens, n_chars
            FROM documents ORDER BY doc_id"""))

  /** H: UDAF via Aggregator — exact decimal sum of squares per group. */
  val h2Udaf = Q(
    "h2_udaf_sumsquares",
    (s, dir) => {
      import s.implicits._
      val ssq = udaf(SumSquares, Encoders.DECIMAL)
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(round(ssq(Canon.dec($"l_quantity")).cast("double"), 4).as("sum_sq_qty"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_sq_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** H: UDTF surface — posexplode (0-based position generator). */
  val h3Posexplode = Q(
    "h3_posexplode",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" < 50)
        .select($"doc_id", posexplode(split($"text", " ")))
        .withColumnRenamed("col", "token")
        .orderBy($"doc_id", $"pos")
    },
    Some("""SELECT doc_id,
                   CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
                   unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id < 50
            ORDER BY doc_id, pos"""))

  def all: Seq[Q] = Seq(h1Udf, h2Udaf, h3Posexplode)
}
