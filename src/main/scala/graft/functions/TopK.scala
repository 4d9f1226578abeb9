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
  * hash-stable under any partitioning.
  *
  * Exact-duplicate (nid, cos) rows are SKIPPED: a neighbor list holds a
  * neighbor once. This is what lets the LSH path feed band-join output
  * straight into the heap — a pair surfacing in s shared bands carries
  * the same deterministic score s times, and collapsing it here (buffer
  * is sorted, so equals are adjacent: one extra comparison) replaces a
  * full groupBy-dedup shuffle + rank-window shuffle over every scored
  * row. Inputs with unique (nid, cos) rows — brute force — are
  * unaffected. */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.cos > b.cos || (a.cos == b.cos && a.nid < b.nid)

  // Vector, not List: the buffer is probed by index in the binary
  // search and by .last on the reject path every row — List would make
  // both O(k) walks
  override def zero: Seq[Scored] = Vector.empty

  /** Binary-search position of `a` in the (cos desc, nid asc)-sorted
    * buffer — first index whose element is NOT better than `a`. */
  private def insertAt(b: Seq[Scored], a: Scored): Int = {
    var lo = 0
    var hi = b.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(b(mid), a)) lo = mid + 1 else hi = mid
    }
    lo
  }

  // buffer stays sorted at all times, so accept/reject is a cheap check
  // against the current k-th element and an accepted row costs one
  // binary search + one O(k) splice — not a full O(k log k) re-sort per
  // input row. The splice ops (take/:+/++/drop) on a Vector return a
  // Vector, so indexed access stays effectively O(1) across updates.
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.size >= k && better(b.last, a)) b
    else {
      val i = insertAt(b, a)
      // an equal element can only sit exactly at the insert position
      // (first not-better index) — one comparison dedups
      if (i < b.size && b(i) == a) b
      else {
        val withA = (b.take(i) :+ a) ++ b.drop(i)
        if (withA.size > k) withA.take(k) else withA
      }
    }

  /** Sorted-merge of two sorted buffers (the classic two-pointer walk),
    * truncated at k — O(k), no comparison sort. */
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    val i1 = b1.iterator.buffered
    val i2 = b2.iterator.buffered
    while (out.size < k && (i1.hasNext || i2.hasNext)) {
      if (!i2.hasNext) out += i1.next()
      else if (!i1.hasNext) out += i2.next()
      else if (i1.head == i2.head) { out += i1.next(); i2.next() }
      else if (better(i1.head, i2.head)) out += i1.next()
      else out += i2.next()
    }
    out.toSeq
  }

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
