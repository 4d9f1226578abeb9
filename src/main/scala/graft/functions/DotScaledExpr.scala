package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the quantized integer dot product of two
  * `ARRAY<FLOAT>` columns: sum_i round(a_i*1000) * round(b_i*1000), with
  * HALF_UP (away-from-zero) rounding — the same integer result as the
  * higher-order-function form in [[VectorFunctions.dotScaled]] and the
  * DuckDB oracle formula, and bit-reproducible everywhere.
  *
  * Why an Expression and not a UDF: `doGenCode` emits a primitive loop
  * directly into whole-stage codegen, so the pairwise-similarity hot path
  * (|Q|·|C| evaluations) runs with no Catalyst→Scala value conversion, no
  * boxing, and no iterator breaks in the generated stage.
  */
case class DotScaledExpr(left: Expression, right: Expression)
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
      acc += DotScaledExpr.q3(x.getFloat(i)) * DotScaledExpr.q3(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val cls = DotScaledExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $cls.q3($a.getFloat($i)) * $cls.q3($b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotScaledExpr {
  /** HALF_UP rounding of x*1000 — exact for |x*1000| < 2^52 (the +0.5 is
    * representable), matching Spark/DuckDB `round`. Called from generated
    * code — must stay public and JVM-simple. */
  def q3(x: Float): Long = {
    val d = x.toDouble * 1000
    (if (d >= 0) Math.floor(d + 0.5) else Math.ceil(d - 0.5)).toLong
  }
}
