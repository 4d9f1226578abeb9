package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Primitive top-k buffer: (cos desc, nid asc)-sorted parallel arrays,
  * capped at k, exact-duplicate (nid, cos) rows skipped — the same
  * contract as [[TopKByScore]], without an object per row. */
final class TopKBuf(val k: Int) {
  val nids = new Array[Long](k)
  val coss = new Array[Double](k)
  var n = 0

  /** a strictly better than b under (cos desc, nid asc). */
  @inline private def better(ca: Double, na: Long, cb: Double, nb: Long): Boolean =
    ca > cb || (ca == cb && na < nb)

  def insert(nid: Long, cos: Double): Unit = {
    // reject fast path: full and worse than the current k-th
    if (n >= k && better(coss(n - 1), nids(n - 1), cos, nid)) return
    // binary search: first index NOT better than the candidate
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(coss(mid), nids(mid), cos, nid)) lo = mid + 1 else hi = mid
    }
    // an equal element can only sit exactly at the insert position
    if (lo < n && coss(lo) == cos && nids(lo) == nid) return
    val newN = math.min(n + 1, k)
    if (lo >= k) return // shifted off the end
    var i = newN - 1
    while (i > lo) { nids(i) = nids(i - 1); coss(i) = coss(i - 1); i -= 1 }
    nids(lo) = nid
    coss(lo) = cos
    n = newN
  }

  /** Sorted two-pointer merge of `other` into a fresh result. */
  def mergeWith(other: TopKBuf): TopKBuf = {
    val out = new TopKBuf(k)
    var i = 0
    var j = 0
    while (out.n < k && (i < n || j < other.n)) {
      if (j >= other.n) { out.append(nids(i), coss(i)); i += 1 }
      else if (i >= n) { out.append(other.nids(j), other.coss(j)); j += 1 }
      else if (nids(i) == other.nids(j) && coss(i) == other.coss(j)) {
        out.append(nids(i), coss(i)); i += 1; j += 1
      }
      else if (better(coss(i), nids(i), other.coss(j), other.nids(j))) {
        out.append(nids(i), coss(i)); i += 1
      }
      else { out.append(other.nids(j), other.coss(j)); j += 1 }
    }
    out
  }

  @inline private def append(nid: Long, cos: Double): Unit = {
    nids(n) = nid; coss(n) = cos; n += 1
  }
}

/** Native top-k-by-score aggregate: the k best (nid, cos) pairs per
  * group under (cos desc, nid asc), duplicates skipped — row-identical
  * to the [[TopKByScore]] typed Aggregator it replaces in the fused
  * similarity paths, and it runs in the same partial+final
  * ObjectHashAggregate shape (ExplainSpec's plan gates hold unchanged).
  *
  * Why native: the typed-Aggregator form deserializes every input row
  * to a `Scored` case object and splices immutable Vectors — at IVF's
  * 4×10⁹ candidate rows that per-row tax measured ~90 s of the 165 s
  * total at 10⁶ vectors (BENCH_LOCAL.md round-7 stage isolation). Here
  * `update` reads the two primitives straight off the `InternalRow`
  * and the buffer is two primitive arrays; the reject path (virtually
  * every row once buffers warm) is one InternalRow read + one
  * comparison, allocation-free.
  *
  * [[TopKByScore]] stays as the declared user-facing UDAF surface
  * (SURVEY §2b H) and as the h2-adjacent spec subject; this class is
  * the hot-path engine twin. PropertySpec pins row-identity between
  * the two on random inputs. */
case class TopKAgg(
    nid: Expression,
    cos: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0)

  override def children: Seq[Expression] = Seq(nid, cos)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("nid", LongType), StructField("cos", DoubleType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val nv = nid.eval(input)
    val cv = cos.eval(input)
    if (nv != null && cv != null)
      buf.insert(nv.asInstanceOf[Long], cv.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = buf.mergeWith(other)

  override def eval(buf: TopKBuf): Any = {
    val rows = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      rows(i) = new GenericInternalRow(Array[Any](buf.nids(i), buf.coss(i)))
      i += 1
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.nids(i)); bb.putDouble(buf.coss(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.nids(i) = bb.getLong(); buf.coss(i) = bb.getDouble(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(nid = newChildren(0), cos = newChildren(1))
}
