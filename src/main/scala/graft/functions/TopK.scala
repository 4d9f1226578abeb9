package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate. */
case class Scored(nid: Long, cos: Double)

/** k best neighbors by (cos desc, nid asc) as a typed Aggregator.
  *
  * Why an Aggregator and not `row_number() over (partition by qid)`:
  * the window form hash-exchanges EVERY scored row and sorts whole
  * partitions — at |Q|·|C| scale that is the dominant shuffle and the
  * first thing to spill (measured: the 64M-row rank window is what
  * pushed the brute-force baseline superquadratic at the 4× fixture).
  * A top-k Aggregator instead runs as partial+final hash aggregation:
  * every map task keeps a k-row buffer per query, so the shuffle
  * carries at most k rows per query per partition and nothing ever
  * sorts the full score table.
  *
  * Selecting k best under the TOTAL order (cos desc, nid asc) is
  * associative and commutative, so any partial-aggregation tree yields
  * the identical result — the property that keeps the DuckDB oracle
  * hash-stable under any partitioning. */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.nid < b.nid)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && better(b.last, a)) b
    else (b :+ a).sortWith(better).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortWith(better).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
