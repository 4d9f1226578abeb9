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

  /** Int8 scalar-quantization codes of a float vector given its
    * per-vector max-abs (symmetric SQ — the storage-compression tier of
    * an ANN index: 4× smaller vectors, dequantize as code·m/127).
    * `floor(x·127/m + 0.5)` is round-half-up built from ops with
    * identical IEEE semantics in Spark and DuckDB, so the codes are
    * cross-engine exact; a zero vector (m = 0) codes to all zeros.
    * Pass the max-abs as a COLUMN computed once per row ([[maxAbs]]) —
    * inlining it here would re-reduce the array per element. */
  def int8Codes(v: Column, m: Column): Column =
    transform(v, x =>
      when(m === 0, lit(0L))
        .otherwise(floor(x.cast("double") * 127 / m + 0.5)))

  /** Per-vector max absolute value (double), the SQ scale factor. */
  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  /** [[dotScaled]] on the fast path: a native codegen Expression
    * ([[DotScaledExpr]]) — identical integer result, inlined into
    * whole-stage codegen (no boxing, no value conversion), ~100× faster
    * than the interpreted higher-order form in pairwise hot loops. */
  def dotScaledFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DotScaledExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Per-vector 1e-3 quantization to `array<int>` ([[Quantize3Expr]]) —
    * factor this onto the JOIN INPUTS, then score pairs with
    * [[dotQ3]]: the same integer result as [[dotScaledFast]] on the
    * float arrays, but the two floor-rounds per element move from
    * per-PAIR to per-ROW (the 10⁶-scale IVF stage isolation measured
    * per-pair re-quantization as ~290 of 297 s). Same 4 bytes/element
    * as the float arrays, so shuffle payloads are unchanged. */
  def quantize3(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Quantize3Expr(ColumnBridge.expression(v)))
  }

  /** Pure integer dot of two [[quantize3]]'d vectors ([[DotQ3Expr]]). */
  def dotQ3(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DotQ3Expr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Signed-byte dot of two packed int8 code blobs ([[CodeDotExpr]]). */
  def codeDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      CodeDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Int8 pack of a float vector to STRUCT(codes BINARY, cdot LONG,
    * m DOUBLE) ([[Int8PackExpr]]) — one pass per row; the blob is the
    * band/cell-join ride and the persisted-postings payload. */
  def int8Pack(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Int8PackExpr(ColumnBridge.expression(v)))
  }
}
