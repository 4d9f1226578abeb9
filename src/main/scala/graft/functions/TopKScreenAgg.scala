package graft.functions

import java.nio.ByteBuffer
import java.util.Arrays

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Branch-and-bound screen buffer for approximate-score top-k: keeps
  * every candidate that could still be in the EXACT top-k given a
  * per-candidate score interval [lb, ub].
  *
  * Soundness invariant (the whole point — the downstream exact rescore
  * must see every true top-k member): a candidate is discarded only
  * when its ub is below the k-th largest lb seen among LIVE distinct
  * candidates. That bound is monotone under inserts and merges and is
  * always ≤ the final k-th largest lb over ALL distinct candidates
  * L_q, while any true top-k member n has ub(n) ≥ exact(n) ≥ L_q — so
  * it is never pruned, in any partial buffer, under any merge order.
  * At eval the live set is exactly {n : ub(n) ≥ L_q}: candidates whose
  * lb is among the top k are never prunable (ub ≥ lb ≥ every bound
  * used), so the k-th largest live lb IS L_q and the final filter is
  * exact. Output is the surviving nids, sorted for determinism.
  *
  * Duplicate candidates (the same nid arriving once per shared band)
  * carry identical [lb, ub]: a live duplicate is skipped by scan, and
  * a previously-pruned one re-fails the same ub < kthLb test (kthLb
  * only grows) — so the k-th-largest-lb computation always runs over
  * DISTINCT candidates, which the bound above requires (a single nid
  * occupying several top-k lb slots would inflate the bound and prune
  * unsoundly).
  */
final class ScreenBuf(val k: Int) {
  // deliberately tiny initial arrays: ObjectHashAggregate holds up to
  // fallbackThreshold (131k in Engine.session) LIVE buffers per task,
  // and a query's candidates scatter across many input partitions — at
  // 10⁶ queries the resident-buffer footprint, not any single buffer,
  // is the memory term (a 32-entry initial capacity measured as an
  // executor OOM at 10⁶ vectors in 8 GB; k+1-entry start fits)
  private val minCap = math.max(8, k + 1)
  var nids = new Array[Long](minCap)
  var lbs = new Array[Double](minCap)
  var ubs = new Array[Double](minCap)
  var n = 0
  var kthLb: Double = Double.NegativeInfinity
  private var trigger = minCap

  def insert(nid: Long, lb: Double, ub: Double): Unit = {
    if (ub < kthLb) return // provably outside the top-k
    var i = 0
    while (i < n) { if (nids(i) == nid) return; i += 1 } // live duplicate
    if (n == nids.length) grow()
    nids(n) = nid; lbs(n) = lb; ubs(n) = ub; n += 1
    if (n >= trigger) compact()
  }

  private def grow(): Unit = {
    nids = Arrays.copyOf(nids, nids.length * 2)
    lbs = Arrays.copyOf(lbs, lbs.length * 2)
    ubs = Arrays.copyOf(ubs, ubs.length * 2)
  }

  /** Raise kthLb to the k-th largest live lb and drop candidates whose
    * ub falls below it. Amortized: the next compaction triggers only
    * after the buffer doubles past the survivors. */
  def compact(): Unit = {
    if (n > k) {
      val sorted = Arrays.copyOf(lbs, n)
      Arrays.sort(sorted)
      val kth = sorted(n - k)
      if (kth > kthLb) kthLb = kth
      var w = 0
      var i = 0
      while (i < n) {
        if (ubs(i) >= kthLb) {
          nids(w) = nids(i); lbs(w) = lbs(i); ubs(w) = ubs(i); w += 1
        }
        i += 1
      }
      n = w
    }
    trigger = math.max(minCap, 2 * n)
    if (trigger > nids.length) { while (trigger > nids.length) grow() }
  }

  def mergeFrom(other: ScreenBuf): Unit = {
    if (other.kthLb > kthLb) {
      kthLb = other.kthLb
      // re-screen existing entries against the tighter bound
      var w = 0
      var i = 0
      while (i < n) {
        if (ubs(i) >= kthLb) {
          nids(w) = nids(i); lbs(w) = lbs(i); ubs(w) = ubs(i); w += 1
        }
        i += 1
      }
      n = w
    }
    var i = 0
    while (i < other.n) { insert(other.nids(i), other.lbs(i), other.ubs(i)); i += 1 }
    compact()
  }

  /** Final survivor set {n : ub(n) ≥ L_q}, sorted by nid. */
  def result(): Array[Long] = {
    compact()
    val out = Arrays.copyOf(nids, n)
    Arrays.sort(out)
    out
  }
}

/** Native screening aggregate: per group, the nids of every candidate
  * whose exact score COULD reach the top k, judged from a sound
  * per-candidate interval [lb, ub] (code-space cosine ± the
  * Cauchy–Schwarz residual margin — see Similarity.cosineNearDup's
  * derivation). The two-pass LSH/IVF read shapes feed every banded or
  * celled candidate through this screen, then re-attach exact vectors
  * for the survivor set only (≈ k + margin-crowd per query instead of
  * the full candidate volume), and the final exact top-k over the
  * survivors is row-identical to ranking every candidate exactly —
  * SimilaritySpec pins that law. Runs partial+final in
  * ObjectHashAggregate like [[TopKAgg]]; buffers are primitive arrays,
  * the common reject path (ub below the running bound) is one
  * comparison. */
case class TopKScreenAgg(
    nid: Expression,
    lb: Expression,
    ub: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ScreenBuf] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(nid, lb, ub)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): ScreenBuf = new ScreenBuf(k)

  override def update(buf: ScreenBuf, input: InternalRow): ScreenBuf = {
    val nv = nid.eval(input)
    val lv = lb.eval(input)
    val uv = ub.eval(input)
    if (nv != null && lv != null && uv != null)
      buf.insert(nv.asInstanceOf[Long], lv.asInstanceOf[Double], uv.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ScreenBuf, other: ScreenBuf): ScreenBuf = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: ScreenBuf): Any =
    UnsafeArrayData.fromPrimitiveArray(buf.result()): ArrayData

  override def serialize(buf: ScreenBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buf.n * 24)
    bb.putInt(buf.k).putDouble(buf.kthLb).putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.nids(i)); bb.putDouble(buf.lbs(i)); bb.putDouble(buf.ubs(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ScreenBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ScreenBuf(bb.getInt())
    buf.kthLb = bb.getDouble()
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getLong(), bb.getDouble(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScreenAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScreenAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKScreenAgg =
    copy(nid = newChildren(0), lb = newChildren(1), ub = newChildren(2))
}
