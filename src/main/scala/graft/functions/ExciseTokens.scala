package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `(text STRING, starts ARRAY<INT>)` → text with every token covered
  * by a k-wide window at any of `starts` removed, surviving tokens
  * re-joined with single spaces; NULL when no token survives — the
  * row-local rebuild stage of [[graft.operators.Dedup.windowDedup]].
  *
  * Why an expression and not a join: the first windowDedup shape
  * exploded every non-first window occurrence into its k covered
  * token positions (×k row blowup on the duplicate mass — 280M rows
  * at 10⁶ docs under 200× duplication), anti-joined the corpus token
  * explosion against them on `(id, tpos)`, and rebuilt documents with
  * a `collect_list` shuffle: three corpus-scale shuffles just to
  * delete spans whose membership is computable per document. This
  * expression makes excision row-local: the operator ships ONE
  * `collect_list(pos)` of bad window STARTS per doc (an array of
  * ints, not k-exploded positions) and the rebuild is a single fused
  * pass — tokenize on the 0x20 byte (same exactness argument as
  * [[ShingleHash64Expr]]'s string path: UTF-8 multi-byte sequences
  * never contain 0x20, and limit=-1 `split` semantics are preserved,
  * empty tokens included), sweep a two-pointer over the SORTED starts
  * (token `t` is covered iff some start `p` has `p <= t < p+k`;
  * monotone `t` means the pointer only advances), and copy surviving
  * token bytes with single-space joins. O(bytes + |starts|) per row,
  * zero per-token allocations, whole-stage-codegen'd.
  *
  * Contract: `starts` must be sorted ascending (the operator wraps
  * `collect_list` in `sort_array`). Null text or null starts → null
  * (nullIntolerant; the operator coalesces "no bad windows" to an
  * empty array, so null starts never reaches it there). NULL result
  * means "document fully excised" — distinct from the empty STRING a
  * surviving empty token produces (e.g. empty text's single empty
  * token surviving untouched), which is exactly the drop semantics
  * the join-form rebuild had (a doc with zero surviving tokens simply
  * had no rows to group). */
case class ExciseTokensExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 1, s"window width must be >= 1, got $k")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes() = {
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ExciseTokens expects (string, array<int>), got $other")
    }
  }

  override def nullSafeEval(text: Any, starts: Any): Any =
    ExciseTokensExpr.excise(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ExciseTokensExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      (t, s) => s"""
        ${ev.value} = $cls.excise($t, $s, $k);
        ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object ExciseTokensExpr {
  /** Called from generated code — must stay public and JVM-simple.
    * Returns null when zero tokens survive. */
  def excise(text: UTF8String, starts: ArrayData, k: Int): UTF8String = {
    val bytes = text.getBytes
    val ns = starts.numElements()
    // fast path: nothing to excise
    if (ns == 0) return text
    val out = new Array[Byte](bytes.length)
    var outLen = 0
    var kept = false
    var t = 0            // token index
    var tokStart = 0     // byte offset of current token
    var sp = 0           // pointer into sorted starts
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        // token t spans [tokStart, i)
        while (sp < ns && starts.getInt(sp) + k <= t) sp += 1
        val covered = sp < ns && starts.getInt(sp) <= t
        if (!covered) {
          if (kept) { out(outLen) = 0x20; outLen += 1 }
          var j = tokStart
          while (j < i) { out(outLen) = bytes(j); outLen += 1; j += 1 }
          kept = true
        }
        t += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (!kept) null
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, outLen))
  }
}
