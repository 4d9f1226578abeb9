package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom filter over 64-bit keys with k independent 64-BIT hashes — the
  * replacement for `org.apache.spark.util.sketch.BloomFilter`, whose
  * Kirsch–Mitzenmacher probe stream is derived from two 32-BIT Murmur
  * halves and hits a measured false-positive FLOOR around 1e-4
  * regardless of the requested fpp (bench: 409 keys, fpp = 1e-6
  * requested → 9.5e-5 measured over 2×10⁶ probes; fpp = 1e-4 →
  * 2.7e-4). At decontamination scale — ~10³ shingle probes per
  * document — a 1e-4 floor over-drops ~10% of a clean corpus, so the
  * floor is the difference between a usable filter and a lossy one.
  *
  * Method is public knowledge end to end: Bloom (CACM 1970) sizing
  * m = −n·ln p / ln²2, k = m/n·ln 2; per-probe indices are k
  * INDEPENDENT 64-bit splitmix64 finalizer hashes (Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014) of
  * the key xor a per-slot seed — NOT Kirsch–Mitzenmacher double
  * hashing, deliberately: g_i = h1 + i·h2 makes the whole probe
  * sequence a function of (h1, h2) mod m, adding an ≈ n/m² chance that
  * a probe replays some stored key's entire sequence — measured
  * 1.25e-5 realized at a requested 1e-6 on a 409-key/11.8k-bit filter,
  * the small-filter regime where n/m² ≫ p. k full hashes cost a few
  * extra ns per probe and restore the textbook rate (PropertySpec
  * measures both the rate and the no-false-negative guarantee).
  *
  * The bit array ORs: `union` is commutative, associative and
  * idempotent, so a distributed build (per-partition filters reduced
  * in any tree order) is bit-deterministic.
  *
  * `numBits` is always a power of two so the per-probe index is a
  * MASK, not a 64-bit modulus — `floorMod` by a general modulus is a
  * hardware division (~20-40 cycles) paid k times per probe, and the
  * probe loop is the inner loop of a whole-corpus scan. Rounding m up
  * to 2^⌈log2 m⌉ costs ≤ 2× bits and only LOWERS the realized fpp
  * (same k, more bits ⇒ (1−e^(−kn/m'))^k < requested p). */
final class Bloom64(val words: Array[Long], val numBits: Long, val k: Int)
    extends Serializable {

  require((numBits & (numBits - 1)) == 0 && numBits >= 64,
    s"numBits must be a power of two >= 64, got $numBits")
  private[this] val mask: Long = numBits - 1

  @inline private def setBit(i: Long): Unit =
    words((i >>> 6).toInt) |= 1L << (i & 63)

  @inline private def getBit(i: Long): Boolean =
    (words((i >>> 6).toInt) & (1L << (i & 63))) != 0

  def put(x: Long): Unit = {
    var i = 0
    while (i < k) {
      setBit(Bloom64.mix(x ^ Bloom64.seeds(i)) & mask)
      i += 1
    }
  }

  def mightContain(x: Long): Boolean = {
    var i = 0
    while (i < k) {
      if (!getBit(Bloom64.mix(x ^ Bloom64.seeds(i)) & mask)) return false
      i += 1
    }
    true
  }

  /** Whole-array short-circuit probe over an unboxed catalyst array —
    * the eval body of [[BloomAnyContainExpr]]; lives here so both the
    * interpreted and the generated path run the identical loop. */
  def anyContain(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (mightContain(arr.getLong(i))) return true
      i += 1
    }
    false
  }

  /** Whole-array THRESHOLD probe — does at least `minFrac` of the
    * array hit the filter? The eval body of [[BloomFracContainExpr]].
    * Decision-equivalent to counting every hit and comparing
    * `hits >= n·minFrac` (the same double arithmetic the exact join
    * form uses on its aggregated counts), but with two-sided early
    * exit: return true the moment accumulated hits reach the
    * threshold (hits only grow), false the moment even all-remaining-
    * hits can't reach it (final hits ≤ hits + remaining). A clean doc
    * usually exits within its first few misses; a contaminated one
    * within its first `n·minFrac` probes — the full-count form
    * measured ~2× the any-hit probe's corpus-pass cost at 10⁶ docs,
    * and this restores most of that gap. */
  def fracContain(arr: ArrayData, minFrac: Double): Boolean = {
    val n = arr.numElements()
    val need = n * minFrac
    var hits = 0
    var i = 0
    while (i < n) {
      if (hits >= need) return true
      if (hits + (n - i) < need) return false
      if (mightContain(arr.getLong(i))) hits += 1
      i += 1
    }
    hits >= need
  }

  /** In-place bit-OR merge; both sides must share (numBits, k). */
  def union(o: Bloom64): Bloom64 = {
    require(o.numBits == numBits && o.k == k,
      s"incompatible Bloom64 shapes: ($numBits,$k) vs (${o.numBits},${o.k})")
    var i = 0
    while (i < words.length) { words(i) |= o.words(i); i += 1 }
    this
  }
}

object Bloom64 {
  /** splitmix64 golden-gamma constant. */
  private[functions] val Phi = 0x9e3779b97f4a7c15L

  /** Per-probe-slot seeds: a splitmix64 stream, fixed forever (the
    * filter's bits are part of persisted/broadcast state). 64 slots
    * bounds k — reached only below p ≈ 1e-19, far past double
    * precision's useful fpp range. */
  private[functions] val seeds: Array[Long] =
    Array.tabulate(64)(i => mix(0x5deece66dL + i.toLong * Phi))

  /** splitmix64 finalizer: full-avalanche 64-bit mix. */
  @inline def mix(x0: Long): Long = {
    var z = x0 + Phi
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Textbook sizing for `n` expected keys at false-positive rate `p`;
    * k comes from the textbook m, the stored array rounds m up to the
    * next power of two (mask-probe; realized fpp only drops). */
  def create(n: Long, p: Double): Bloom64 = {
    require(n >= 0 && p > 0 && p < 1, s"invalid Bloom sizing n=$n p=$p")
    val m = math.max(64L,
      math.ceil(-math.max(1L, n).toDouble * math.log(p) /
        (math.log(2) * math.log(2))).toLong)
    val k = math.min(seeds.length,
      math.max(1, math.round(m.toDouble / math.max(1L, n) * math.log(2)).toInt))
    val m2 = java.lang.Long.highestOneBit(m - 1) << 1 // next pow2 >= m
    new Bloom64(new Array[Long]((m2 >>> 6).toInt), m2, k)
  }
}

/** `ARRAY<BIGINT>` → does ANY element hit the broadcast [[Bloom64]]?
  * The whole-stage-codegen probe for Bloom-filter decontamination
  * ([[graft.operators.Dedup.decontaminateBloom]]): the boxed
  * `udf((sh: Seq[Long]) => ...)` form allocated a wrapper Seq plus one
  * boxed Long PER SHINGLE per row (~1.7 G allocations on a 10⁶-doc
  * corpus pass) and measured 2× SLOWER than the shuffle-heavy join
  * form it was meant to beat; this expression is one monomorphic
  * static call per row over the unboxed catalyst array — same pattern
  * (and same motivation) as Spark's own `BloomFilterMightContain`
  * runtime filter. The filter rides a `Broadcast` handle, so the
  * serialized expression is bytes, not the bit array; executors fetch
  * the blocks once per node. Null array yields null (the operator
  * coalesces that to "no hit" to keep join-form parity for null
  * texts). */
case class BloomAnyContainExpr(child: Expression, bf: Broadcast[Bloom64])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BloomAnyContain expects array<bigint>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    bf.value.anyContain(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBc", bf,
      classOf[Broadcast[Bloom64]].getName)
    val cls = classOf[Bloom64].getName
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (($cls) $bfRef.value()).anyContain($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ARRAY<BIGINT>` → does at least `minFrac` of the array hit the
  * broadcast [[Bloom64]]? The probe for threshold (fuzzy)
  * decontamination ([[graft.operators.Dedup.decontaminateBloomFuzzy]]),
  * where the drop decision needs the contaminated FRACTION of a
  * document's distinct shingles, not just any-hit. Same unboxed
  * whole-stage-codegen shape as [[BloomAnyContainExpr]] (one
  * monomorphic static call per row), with the two-sided early exit
  * documented on [[Bloom64.fracContain]]. False positives only INFLATE
  * the hit count, so the one-sided error guarantee (no contaminated
  * doc ever survives that the exact form would drop) carries over to
  * any threshold. Null array yields null. */
case class BloomFracContainExpr(child: Expression, bf: Broadcast[Bloom64],
    minFrac: Double) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BloomFracContain expects array<bigint>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any =
    bf.value.fracContain(input.asInstanceOf[ArrayData], minFrac)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBc", bf,
      classOf[Broadcast[Bloom64]].getName)
    val cls = classOf[Bloom64].getName
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = (($cls) $bfRef.value()).fracContain($c, $minFrac);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
