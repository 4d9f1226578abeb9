package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Per-row MinHash SIGNATURE: `ARRAY<STRING>` tokens → `ARRAY<BIGINT>`
  * of k seed-mixed window-hash minima — the native twin of the former
  * `minhashSignatureFast` Scala UDF (same rolled-FNV shingle hashing as
  * [[ShingleHash64Expr]], same splitmix64 seed mixes), minus the per-row
  * `Seq[String]` boxing and CatalystTypeConverters round-trip a ScalaUDF
  * pays. Token hashes roll over UTF-8 BYTES (the UDF hashed UTF-16
  * chars): identical for ASCII, different-but-equally-uniform beyond —
  * minhash semantics depend only on hash uniformity, and the l2 specs
  * gate recall/precision against exact Jaccard, not concrete hash
  * values. */
case class MinHashSigExpr(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {

  require(k >= 1 && shingleN >= 1, s"need k >= 1 and shingleN >= 1, got $k/$shingleN")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashSig expects array<string> or string, got $other")
    }
  }

  // raw-STRING child: tokens come from the fused 0x20-byte scan
  // (ShingleHash64Expr.tokenHashesText) — bit-identical signatures to
  // the split(text, " ") form, minus the regex engine and the
  // token-array materialization
  private def fused: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (fused)
      MinHashSigExpr.signatureText(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, shingleN)
    else
      MinHashSigExpr.signature(input.asInstanceOf[ArrayData], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSigExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (fused) "signatureText" else "signature"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.$fn($c, $k, $shingleN);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Called from generated code — must stay public and JVM-simple. */
  def signature(tokens: ArrayData, k: Int, shingleN: Int): UnsafeArrayData =
    if (tokens.numElements() == 0)
      UnsafeArrayData.fromPrimitiveArray(Array.fill(k)(Long.MaxValue))
    else
      fromTokenHashes(ShingleHash64Expr.tokenHashes(tokens), k, shingleN)

  /** Fused STRING path — called from generated code. Bit-identical to
    * `signature(split(text, " "))` (a string always yields ≥ 1 token
    * under limit=-1 split semantics, so there is no empty-array case). */
  def signatureText(text: org.apache.spark.unsafe.types.UTF8String,
      k: Int, shingleN: Int): UnsafeArrayData =
    fromTokenHashes(ShingleHash64Expr.tokenHashesText(text), k, shingleN)

  private def fromTokenHashes(th: Array[Long], k: Int, shingleN: Int): UnsafeArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val len = th.length
    val nSh = math.max(len - shingleN + 1, 1)
    var p = 0
    while (p < nSh) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < shingleN && p + j < len) { h = (h ^ th(p + j)) * 0x100000001b3L; j += 1 }
      var seed = 0
      while (seed < k) {
        var z = h + 0x9e3779b97f4a7c15L * (seed + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^= z >>> 31
        if (z < sig(seed)) sig(seed) = z
        seed += 1
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }
}

/** Count of agreeing positions between two equal-length signatures —
  * the pair-time scorer behind estimated Jaccard. Replaces the
  * `zip_with` + `filter` HOF chain, which ran an interpreted lambda
  * per signature POSITION per candidate PAIR (candidates ≫ rows, so
  * this was the band join's hottest interpreted site). */
case class SigAgreeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) agree += 1; i += 1 }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** LSH band keys of a signature: one 64-bit hash per `bands` contiguous
  * `rowsPerBand`-slice, seeded by the band index — native twin of the
  * `transform(sequence, i → xxhash64(slice(sig, …), i))` HOF (slice
  * allocation + interpreted lambda per band per row). Key values are
  * internal join keys; any deterministic uniform mix works. */
case class BandKeysExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(bands >= 1 && rowsPerBand >= 1,
    s"need bands >= 1 and rowsPerBand >= 1, got $bands/$rowsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BandKeysExpr.keys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BandKeysExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.keys($c, $bands, $rowsPerBand);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BandKeysExpr {
  /** Called from generated code — must stay public and JVM-simple. */
  def keys(sig: ArrayData, bands: Int, rowsPerBand: Int): UnsafeArrayData = {
    val out = new Array[Long](bands)
    val len = sig.numElements()
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ (b * 0x9e3779b97f4a7c15L)
      var j = b * rowsPerBand
      val end = math.min(j + rowsPerBand, len)
      while (j < end) {
        h = (h ^ sig.getLong(j)) * 0x100000001b3L
        h ^= h >>> 29
        j += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
