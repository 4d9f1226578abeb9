package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row word-shingle FINGERPRINTS: `ARRAY<STRING>` tokens →
  * `ARRAY<BIGINT>` of one 64-bit hash per n-token window — the native
  * replacement for the `transform(sequence(...), i → concat_ws(" ",
  * slice(tokens, i, n)))` + `xxhash64(shingle)` chain that fed every
  * shingle join (n-gram Jaccard, decontamination, repetition signals).
  *
  * Why this exists (round-9 stage isolation): Catalyst higher-order
  * functions are never whole-stage-codegen'd — each lambda body runs
  * through interpreted `Expression.eval`, so the old chain paid, per
  * window, a megamorphic eval tree (`ConcatWs` → `Slice` →
  * `StringSplit` materializing the joined shingle STRING) that thread
  * sampling caught dominating the shingle stages; being
  * interpreter-bound also made it brutally JIT-state-sensitive — the
  * same sf0.1 pipeline measured 12.7 s warm and 130–250 s on a cold or
  * deopt-thrashed JVM. This expression is one monomorphic JVM call per
  * ROW: tokens are FNV-1a-hashed once each (over UTF-8 bytes, no
  * string copies), windows combine those 8-byte hashes positionally,
  * and no shingle string ever exists.
  *
  * Downstream semantics are unchanged: every consumer keyed shingles
  * by `xxhash64(string)` already — equality joins and distinct-counts
  * on fingerprints, never the text — so swapping the hash function
  * changes bytes, not plans or results (collision odds ~|shingles|²/2⁶⁴,
  * the documented fingerprint trade; the DuckDB oracles hash-match on
  * the REAL string sets and would surface a collision at fixture
  * scale).
  *
  * `keepPartial` mirrors the two window conventions the HOF helpers
  * had: `true` = Jaccard convention (a doc shorter than n yields ONE
  * partial window — `sequence(1, greatest(size-(n-1), 1))`), `false` =
  * gram-counting convention (`when(size(toks) >= n, ...)`: no full
  * window, no grams). Null elements hash as the empty token; a null
  * array yields null (nullIntolerant).
  *
  * The child may also be a raw STRING: the expression then tokenizes
  * on the 0x20 byte itself (UTF-8 multi-byte sequences never contain
  * 0x20, so the byte scan is exact) and produces BIT-IDENTICAL output
  * to `shingleHash64(split(text, " "))` — including the empty tokens a
  * limit=-1 regex split yields for leading/trailing/consecutive
  * spaces — while skipping the regex engine AND the token-array
  * materialization entirely. Stage isolation at 10⁶ docs (ScaleBench
  * decon_scan/split/shingle) put the regex split at roughly half the
  * corpus-pass cost of every shingle consumer, which is what this
  * fused path removes. */
case class ShingleHash64Expr(child: Expression, n: Int, keepPartial: Boolean)
    extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ShingleHash64 expects array<string> or string, got $other")
    }
  }

  private def fused: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (fused)
      ShingleHash64Expr.hashWindowsText(input.asInstanceOf[UTF8String], n, keepPartial)
    else
      ShingleHash64Expr.hashWindows(input.asInstanceOf[ArrayData], n, keepPartial)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleHash64Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (fused) "hashWindowsText" else "hashWindows"
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $cls.$fn($c, $n, $keepPartial);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHash64Expr {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val WindowSeed = 0x9e3779b97f4a7c15L

  /** Called from generated code — must stay public and JVM-simple. */
  def hashWindows(tokens: ArrayData, n: Int, keepPartial: Boolean): UnsafeArrayData =
    combineWindows(tokenHashes(tokens), n, keepPartial)

  /** Fused STRING path (see class scaladoc) — called from generated
    * code. Bit-identical to `hashWindows(split(text, " "))`. */
  def hashWindowsText(text: UTF8String, n: Int, keepPartial: Boolean): UnsafeArrayData =
    combineWindows(tokenHashesText(text), n, keepPartial)

  /** Each token hashed once (FNV-1a over UTF-8 bytes) — O(chars), no
    * string copies. Null elements hash as the empty token. */
  def tokenHashes(tokens: ArrayData): Array[Long] = {
    val len = tokens.numElements()
    val th = new Array[Long](len)
    var t = 0
    while (t < len) {
      var h = FnvOffset
      if (!tokens.isNullAt(t)) {
        val bytes = tokens.getUTF8String(t).getBytes
        var i = 0
        while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
      }
      th(t) = h
      t += 1
    }
    th
  }

  /** Per-token FNV-1a hashes straight from the text's UTF-8 bytes,
    * tokenizing on 0x20 — token k's hash is identical to hashing
    * `split(text, " ")(k)`, with limit=-1 semantics (leading, trailing
    * and consecutive spaces all yield empty tokens; empty text yields
    * one empty token). Shared by the fused shingle / minhash / simhash
    * string paths. */
  def tokenHashesText(text: UTF8String): Array[Long] = {
    val bytes = text.getBytes
    var spaces = 0
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val th = new Array[Long](spaces + 1)
    var t = 0
    var h = FnvOffset
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0x20) { th(t) = h; t += 1; h = FnvOffset }
      else { h ^= (b & 0xffL); h *= FnvPrime }
      i += 1
    }
    th(t) = h
    th
  }

  /** Windows combine the 8-byte token hashes positionally —
    * O(n·windows) on top of the O(chars) token pass, not O(chars·n)
    * like the string-concat form. */
  private def combineWindows(th: Array[Long], n: Int, keepPartial: Boolean): UnsafeArrayData = {
    val len = th.length
    val nWin =
      if (len >= n) len - n + 1
      else if (keepPartial) 1
      else 0
    val out = new Array[Long](nWin)
    var p = 0
    while (p < nWin) {
      var h = WindowSeed
      var j = 0
      while (j < n && p + j < len) { h = (h ^ th(p + j)) * FnvPrime; j += 1 }
      out(p) = h
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
