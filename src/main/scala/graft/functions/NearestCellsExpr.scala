package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF coarse-quantizer centroids as ONE flat row-major primitive matrix
  * (`nlist × dim`) with precomputed L2 norms — the broadcast payload of
  * [[NearestCellsExpr]]. Flat layout matters twice: the executor-side
  * scan walks it sequentially (cache lines, no per-row pointer chase),
  * and the broadcast serializes as two primitive arrays instead of
  * nlist boxed objects. Rows shorter than `dim` are zero-padded, which
  * leaves dot products unchanged (zero terms). */
case class CentroidMatrix(flat: Array[Double], norms: Array[Double], dim: Int) {
  def nlist: Int = norms.length
}

object CentroidMatrix {
  def apply(centroids: Array[Array[Double]], norms: Array[Double]): CentroidMatrix = {
    val dim = if (centroids.isEmpty) 0 else centroids.map(_.length).max
    val flat = new Array[Double](centroids.length * dim)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, flat, i * dim, centroids(i).length)
      i += 1
    }
    new CentroidMatrix(flat, norms, dim)
  }
}

/** Native Catalyst expression for IVF cell assignment/probing: the `m`
  * nearest centroid indices of a vector column, ranked by dot(v,c)/|c|
  * (cosine up to the positive per-row factor 1/|v|, so the ordering is
  * identical and the row norm is never computed). Input may be
  * `ARRAY<FLOAT>` (the stored embeddings) or `ARRAY<DOUBLE>` (the int8
  * code view); output is `INT` for `m = 1` (corpus assignment) or
  * `ARRAY<INT>` for `m > 1` (query probes).
  *
  * Why an Expression and not the former Scala UDF (the round-6 verdict's
  * recorded perf lever): the UDF deserialized every vector to a boxed
  * `Seq[Double]` — after an `array<double>` CAST allocating yet another
  * copy — before a single flop ran, and at n rows × √n centroids × dim
  * madds the per-row conversion tax was most of the non-join IVF cost
  * at 10⁶ vectors. Here generated code hands the raw `ArrayData`
  * straight to [[nearest1]]/[[nearestM]] via `addReferenceObj` — no
  * conversion, no boxing, one primitive copy of the vector, then a
  * sequential flat-matrix scan. The centroid matrix rides a broadcast
  * HANDLE (ships once per executor, not per task closure).
  *
  * Tie-breaking and arithmetic order replicate the former UDF exactly
  * (first-max wins, dot accumulated in index order, zero-norm centroid
  * scores 0), so results are bit-identical — SimilaritySpec's
  * determinism and recall gates pin that. */
case class NearestCellsExpr(
    child: Expression,
    mat: Broadcast[CentroidMatrix],
    m: Int) extends UnaryExpression {

  require(m >= 1, s"m must be >= 1, got $m")

  override def dataType: DataType =
    if (m == 1) IntegerType else ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val floatInput: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"NearestCellsExpr expects array<float> or array<double>, got $t")
  }

  /** One primitive copy of the row vector — unifies the float/double
    * element reads outside the hot centroid loop. */
  private def toDense(v: ArrayData): Array[Double] = {
    val n = v.numElements()
    val a = new Array[Double](n)
    var i = 0
    if (floatInput) while (i < n) { a(i) = v.getFloat(i).toDouble; i += 1 }
    else while (i < n) { a(i) = v.getDouble(i); i += 1 }
    a
  }

  /** Nearest centroid index — the corpus-assignment fast path (no score
    * buffer, single pass, first-max tie-break). Called from generated
    * code; must stay public. */
  def nearest1(v: ArrayData): Int = {
    val c = mat.value
    val a = toDense(v)
    val len = math.min(c.dim, a.length)
    var best = -1
    var bestScore = 0.0
    var ci = 0
    while (ci < c.nlist) {
      val off = ci * c.dim
      var dot = 0.0
      var j = 0
      while (j < len) { dot += c.flat(off + j) * a(j); j += 1 }
      val s = if (c.norms(ci) == 0) 0.0 else dot / c.norms(ci)
      if (best < 0 || s > bestScore) { best = ci; bestScore = s }
      ci += 1
    }
    best
  }

  /** `m` nearest centroid indices, best first — the query-probe path.
    * Score buffer + m selection passes, replicating the former UDF's
    * exact pick order. Called from generated code; must stay public. */
  def nearestM(v: ArrayData): ArrayData = {
    val c = mat.value
    val a = toDense(v)
    val len = math.min(c.dim, a.length)
    val scores = new Array[Double](c.nlist)
    var ci = 0
    while (ci < c.nlist) {
      val off = ci * c.dim
      var dot = 0.0
      var j = 0
      while (j < len) { dot += c.flat(off + j) * a(j); j += 1 }
      scores(ci) = if (c.norms(ci) == 0) 0.0 else dot / c.norms(ci)
      ci += 1
    }
    val picked = new Array[Int](math.min(m, scores.length))
    val taken = new Array[Boolean](scores.length)
    var p = 0
    while (p < picked.length) {
      var best = -1
      var i = 0
      while (i < scores.length) {
        if (!taken(i) && (best < 0 || scores(i) > scores(best))) best = i
        i += 1
      }
      taken(best) = true
      picked(p) = best
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(picked)
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (m == 1) nearest1(v) else nearestM(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellsExpr", this, classOf[NearestCellsExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      if (m == 1) s"${ev.value} = $ref.nearest1($c);"
      else s"${ev.value} = $ref.nearestM($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
