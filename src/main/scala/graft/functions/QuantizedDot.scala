package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Per-VECTOR 1e-3 quantization: `ARRAY<FLOAT>` → `ARRAY<INT>` with
  * each element [[DotScaledExpr.q3]](x) — the factored-out half of the
  * quantized dot product.
  *
  * Why this exists (the 10⁶-vector stage isolation, BENCH_LOCAL.md
  * round 7): the fused similarity joins score with
  * [[DotScaledExpr]](va, vb), which re-quantizes BOTH vectors on every
  * pair — two floor-rounds per element per pair. At IVF's 4×10⁹
  * candidate pairs that re-quantization was ~290 s of the 297 s total
  * (join machinery alone: 41 s). Quantizing once per JOIN-INPUT row (n
  * + nprobe·n rows, not 4×10⁹) and scoring with the pure integer
  * [[DotQ3Expr]] removes it; integer math is associative and exact, so
  * scores are bit-identical.
  *
  * INT, not LONG, elements: same 4 bytes/element as the float arrays
  * they replace, so the wide band/cell join inputs shuffle the same
  * volume (an `array<long>` ride would have DOUBLED near-dup's n·B-row
  * shuffle payload). q3 values |x·1000| only exceed Int range for
  * |x| > 2.1×10⁶ — no real embedding; guarded with a LOUD throw, never
  * a silent wrap. */
case class Quantize3Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Quantize3Expr.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Quantize3Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.quantize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Quantize3Expr {
  /** Called from generated code — must stay public and JVM-simple. */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val q = DotScaledExpr.q3(v.getFloat(i))
      if (q > Int.MaxValue || q < Int.MinValue)
        throw new ArithmeticException(
          s"quantize3 overflow: element $i quantizes to $q (|x| > 2.1e6 — " +
            "not an embedding; use the long-path DotScaledExpr)")
      out(i) = q.toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Int8 scalar-quantization GEOMETRY view: `ARRAY<FLOAT>` →
  * `ARRAY<DOUBLE>` of ready-to-probe codes — two-pass max-abs then
  * `floor(x·127/m + 0.5)`, bit-identical to the built-ins form in
  * [[VectorFunctions.int8Codes]] (same IEEE double ops in the same
  * order). The native twin of the former Scala UDF on the l22 IVF
  * path: raw ArrayData in, primitive arrays throughout, no boxed Seq
  * per row. */
case class Int8GeomExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Int8GeomExpr.codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Int8GeomExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.codes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8GeomExpr {
  /** Called from generated code — must stay public and JVM-simple. */
  def codes(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble); if (x > m) m = x; i += 1
    }
    val out = new Array[Double](n)
    if (m != 0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(v.getFloat(i).toDouble * 127 / m + 0.5); i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Per-row int8 PACK for the code prefilter/screen tiers:
  * `ARRAY<FLOAT>` → STRUCT(codes BINARY, cdot LONG, m DOUBLE) — one
  * byte per element (`floor(x·127/m + 0.5)` with m = max|x|), the code
  * self-dot, and the SQ scale. One two-pass tight loop per ROW; the
  * 64 B blob then rides every banded/celled copy of the row instead of
  * the 256 B quantized vector, and it is the persisted-postings payload
  * of the int8 ANN index tier. Native twin of the former
  * `int8PackUdf` — same IEEE ops in the same order, no boxed
  * Seq[Float] per row (the one remaining Scala UDF on a 10⁶-scale hot
  * path after round 7; PropertySpec pins interpreted ≡ codegen ≡ the
  * reference loop). */
case class Int8PackExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("cdot", LongType, nullable = false),
    StructField("m", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Int8PackExpr.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Int8PackExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.pack($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Int8PackExpr {
  /** Called from generated code — must stay public and JVM-simple. */
  def pack(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble); if (x > m) m = x; i += 1
    }
    val codes = new Array[Byte](n)
    var cdot = 0L
    if (m != 0) {
      i = 0
      while (i < n) {
        val c = math.floor(v.getFloat(i).toDouble * 127 / m + 0.5).toLong
        codes(i) = c.toByte
        cdot += c * c
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](codes, cdot, m))
  }
}

/** Signed-byte dot product of two packed int8 code columns
  * (`BINARY`, one code per byte): sum_i a_i·b_i in Long — the
  * pair-time scorer of the near-dup CODE PREFILTER, where the banded
  * self-join rows carry 64-byte code blobs instead of 256-byte
  * quantized vectors (4× less band-shuffle payload) and candidate
  * pairs are screened in code space before an output-sized exact
  * rescore. Max |code| is 127 and dims are small, so the accumulator
  * never overflows. */
case class CodeDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += x(i).toLong * y(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Pure integer dot product of two pre-quantized `ARRAY<INT>` columns:
  * sum_i a_i * b_i accumulated in Long — the pair-time half of the
  * quantized dot. One widening multiply-add per element inside
  * whole-stage codegen; combined with [[Quantize3Expr]] on the join
  * inputs this produces the exact [[DotScaledExpr]] integer result at
  * ~10× less per-pair work. */
case class DotQ3Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
