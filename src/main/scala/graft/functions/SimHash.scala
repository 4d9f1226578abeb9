package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a token array: per-bit votes weighted by each
  * token's FNV-1a hash (over UTF-8 bytes), majority vote per bit —
  * native twin of the former `simhash64` Scala UDF, minus the per-row
  * `Seq[String]` boxing. Identical texts produce identical hashes under
  * ANY hash function, which is the property the simhash band join and
  * its specs rely on.
  *
  * The child may also be a raw STRING: tokens then come from the fused
  * 0x20-byte scan ([[ShingleHash64Expr.tokenHashesText]]) —
  * bit-identical hashes to the `split(text, " ")` form, minus the
  * regex engine and the token-array materialization. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(StringType, _) | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHash64 expects array<string> or string, got $other")
    }
  }

  private def fused: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (fused)
      SimHash64Expr.simhashText(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    else
      SimHash64Expr.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SimHash64Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val fn = if (fused) "simhashText" else "simhash"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.$fn($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Called from generated code — must stay public and JVM-simple. */
  def simhash(tokens: ArrayData): Long =
    fromTokenHashes(ShingleHash64Expr.tokenHashes(tokens))

  /** Fused STRING path — called from generated code. Bit-identical to
    * `simhash(split(text, " "))`. */
  def simhashText(text: org.apache.spark.unsafe.types.UTF8String): Long =
    fromTokenHashes(ShingleHash64Expr.tokenHashesText(text))

  private def fromTokenHashes(th: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < th.length) {
      val h = th(t)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }
}
