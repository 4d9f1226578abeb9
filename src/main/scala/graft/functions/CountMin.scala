package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Count-min sketch over 64-bit keys (Cormode & Muthukrishnan, J.
  * Algorithms 2005) — the frequency summary behind
  * [[graft.operators.TextAnalysis.frequentNgrams]]'s zero-shuffle
  * heavy-hitter pass.
  *
  * `depth` rows × `width` counters; add(x) increments one counter per
  * row (row d's index = splitmix64(x ^ seed(d)) & mask), estimate(x)
  * takes the row-wise MINIMUM. Collisions only ever INFLATE counters,
  * so the estimate is a one-sided overestimate:
  * `true_count <= estimate <= true_count + err` with
  * `P[err > 2N/width] <= (1/2)^depth` over the seed choice (N = total
  * adds). The one-sidedness is the load-bearing property here: a
  * "count >= t" prefilter on estimates has NO false negatives, so an
  * exact recount of the survivors reproduces the exact answer — the
  * sketch buys the shuffle reduction, never the correctness.
  *
  * Width is a power of two so the per-row index is a mask, not a
  * modulus (same reasoning as [[Bloom64]] — this probe sits inside a
  * whole-corpus scan). The per-row seeds are a fixed splitmix64 stream
  * (distinct stream origin from Bloom64's so the two sketches never
  * share hash functions); fixed forever, the sketch bits broadcast.
  *
  * Cell-wise addition is commutative and associative, so a distributed
  * build (per-partition sketches merged in any tree order) is
  * bit-deterministic — the same argument as Bloom64's bit-OR. */
final class CountMin(val width: Int, val depth: Int) extends Serializable {
  require(width >= 64 && (width & (width - 1)) == 0,
    s"width must be a power of two >= 64, got $width")
  require(depth >= 1 && depth <= CountMin.seeds.length,
    s"depth must be in [1, ${CountMin.seeds.length}], got $depth")

  /** Flat row-major cells: row d, column c at d*width + c. */
  val cells = new Array[Long](depth * width)
  private[this] val mask: Long = width - 1

  def add(x: Long): Unit = add(x, 1L)

  def add(x: Long, c: Long): Unit = {
    var d = 0
    while (d < depth) {
      cells(d * width + (Bloom64.mix(x ^ CountMin.seeds(d)) & mask).toInt) += c
      d += 1
    }
  }

  def estimate(x: Long): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = cells(d * width + (Bloom64.mix(x ^ CountMin.seeds(d)) & mask).toInt)
      if (v < est) est = v
      d += 1
    }
    est
  }

  /** In-place cell-wise merge; both sides must share (width, depth). */
  def merge(o: CountMin): CountMin = {
    require(o.width == width && o.depth == depth,
      s"incompatible CountMin shapes: ($width,$depth) vs (${o.width},${o.depth})")
    var i = 0
    while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
    this
  }
}

object CountMin {
  /** Per-row seeds: a splitmix64 stream rooted at a constant distinct
    * from [[Bloom64.seeds]]' origin. Fixed forever — sketch cells are
    * broadcast/persisted state keyed by these. */
  private[functions] val seeds: Array[Long] =
    Array.tabulate(16)(i => Bloom64.mix(0x2545f4914f6cdd1dL + i.toLong * Bloom64.Phi))
}

/** `BIGINT` → is the broadcast [[CountMin]] estimate of this key at
  * least `minCount`? The whole-stage-codegen prefilter for the exact
  * heavy-hitter recount (same motivation and shape as
  * [[BloomAnyContainExpr]]: one monomorphic static call per row over
  * an unboxed long, the sketch riding a `Broadcast` handle so the
  * serialized expression is bytes, not megabytes of counters). Because
  * the estimate only overestimates, `filter(CmsAtLeast(h, t))` keeps a
  * superset of the truly-frequent keys — the downstream exact count
  * removes the false positives, never re-admits a false negative. */
case class CmsAtLeastExpr(child: Expression, cms: Broadcast[CountMin],
    minCount: Long) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"CmsAtLeast expects bigint, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    cms.value.estimate(input.asInstanceOf[Long]) >= minCount

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsBc", cms, classOf[Broadcast[CountMin]].getName)
    val cls = classOf[CountMin].getName
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (($cls) $ref.value()).estimate($c) >= ${minCount}L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
