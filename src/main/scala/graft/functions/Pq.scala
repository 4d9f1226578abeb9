package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Product-quantization codebooks over the quantize3 integer grid
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", IEEE TPAMI 2011 — public method): the d-dim vector space is
  * split into `m` contiguous subspaces of `dsub` dims; each subspace
  * carries its own `ks`-entry codeword table, and a vector encodes as
  * `m` one-byte codeword indices. Postings shrink from d bytes (int8
  * SQ) to m bytes — at d = 64, m = 8 that is 8× less postings payload,
  * the storage/IO tier below the int8 screen.
  *
  * The codebooks quantize the SAME integer grid the engine's exact
  * cosine is defined on ([[Quantize3Expr]] vectors): the reconstruction
  * x̂ of a = q3(x) lives in the q3 inner-product space, so the
  * Cauchy–Schwarz screen bound |q̃·a − q̃·x̂| ≤ ‖q̃‖·‖a − x̂‖ is exact
  * in the space the survivor re-rank scores — no cross-representation
  * error term. ‖a − x̂‖ is computed per row at encode time and stored
  * with the posting (`rn`, inflated by 1e-9 relative + 1e-6 absolute to
  * absorb double-rounding in the ADC sums — ~1e-10 of a cosine unit on
  * the fixture scale, vs fp error ~1e-15).
  *
  * `flat` layout: codeword (sub, code) occupies
  * `[(sub·ks + code)·dsub, +dsub)`.
  */
case class PqCodebooks(flat: Array[Double], m: Int, ks: Int, dsub: Int)
    extends Serializable {
  require(ks >= 1 && ks <= 256, s"ks must fit one byte, got $ks")
  @inline def cw(sub: Int, code: Int, j: Int): Double =
    flat(((sub * ks) + code) * dsub + j)
}

object PqCodebooks {

  /** Deterministic driver-side Lloyd training, one independent k-means
    * per subspace over a hash-ordered sample of q3 vectors.
    *
    * DETERMINISM (the reason this is not `ml.KMeans`, same argument as
    * `Similarity.refineCentroids`): the sample arrives in a total order
    * (xxhash64(vec_id), vec_id), seeds are strided picks from that
    * order, assignment ties break first-min, means are summed in sample
    * order on ONE THREAD PER SUBSPACE — every run of the same corpus
    * yields bit-identical codebooks, which is what lets specs pin
    * build/serve parity and lets an appended index reuse persisted
    * codebooks. The m subspaces are arithmetically INDEPENDENT (each
    * reads its own sample columns, writes its own `flat` range, and
    * its Lloyd trajectory never observes another's), so running them
    * on parallel threads reorders nothing within any subspace — the
    * round-15 fix for this being ~1.5 s of single-thread DRIVER time
    * inside every PQ index build (iters·m·n·ks·dsub ≈ 1.6·10⁹ madds at
    * the defaults; guide §5 — the driver should do almost no data
    * work; the full fix would train distributed, but at a 16 K-row
    * bounded sample the parallel driver loop reaches the same wall
    * with zero new shuffle surface).
    *
    * `ks` self-caps at the sample size (a tiny corpus cannot support
    * 256 codewords per subspace); empty clusters keep their previous
    * codeword, mirroring refineCentroids' no-respawn rule. */
  def train(sample: Array[Array[Int]], m: Int, ks0: Int, iters: Int): PqCodebooks = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val d = sample(0).length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    val n = sample.length
    val ks = math.min(ks0, n)
    val flat = new Array[Double](m * ks * dsub)
    val stride = math.max(1, n / ks)
    // one independent k-means per subspace: seed from strided picks of
    // the hash-ordered sample, then `iters` Lloyd passes (assign
    // first-min, mean in sample order) — all state (assign/sums/cnts)
    // is subspace-local, and the subspace's flat range is disjoint
    def trainSub(sub: Int): Unit = {
      val base = sub * ks * dsub
      var c = 0
      while (c < ks) {
        val src = sample((c * stride) % n)
        var j = 0
        while (j < dsub) {
          flat(base + c * dsub + j) = src(sub * dsub + j).toDouble
          j += 1
        }
        c += 1
      }
      val assign = new Array[Int](n)
      val sums = new Array[Double](ks * dsub)
      val cnts = new Array[Int](ks)
      var it = 0
      while (it < iters) {
        var i = 0
        while (i < n) {
          val v = sample(i)
          var best = 0
          var bestD = Double.MaxValue
          c = 0
          while (c < ks) {
            var dist = 0.0
            var j = 0
            while (j < dsub) {
              val diff = v(sub * dsub + j).toDouble - flat(base + c * dsub + j)
              dist += diff * diff
              j += 1
            }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          assign(i) = best
          i += 1
        }
        java.util.Arrays.fill(sums, 0.0)
        java.util.Arrays.fill(cnts, 0)
        i = 0
        while (i < n) {
          val cc = assign(i)
          cnts(cc) += 1
          var j = 0
          while (j < dsub) {
            sums(cc * dsub + j) += sample(i)(sub * dsub + j).toDouble
            j += 1
          }
          i += 1
        }
        c = 0
        while (c < ks) {
          if (cnts(c) > 0) {
            var j = 0
            while (j < dsub) {
              flat(base + c * dsub + j) = sums(c * dsub + j) / cnts(c)
              j += 1
            }
          } // empty cluster: keep previous codeword
          c += 1
        }
        it += 1
      }
    }
    // parallel across subspaces only — bit-identical to the sequential
    // order (disjoint reads/writes per subspace, see scaladoc); the
    // commonPool join provides the happens-before edge that publishes
    // every subspace's flat range before construction below
    java.util.stream.IntStream.range(0, m).parallel().forEach(trainSub(_))
    PqCodebooks(flat, m, ks, dsub)
  }

  /** Encode one q3 vector: per subspace the first-min nearest codeword
    * index, plus the INFLATED total reconstruction residual norm
    * ‖a − x̂‖·(1 + 1e-9) + 1e-6 — the sound screen margin's numerator.
    * A vector shorter than m·dsub pads with zeros (never on the
    * fixture; keeps the encoder total). */
  def encode(cb: PqCodebooks, v: Array[Int]): (Array[Byte], Double) = {
    val codes = new Array[Byte](cb.m)
    var resid2 = 0.0
    var sub = 0
    while (sub < cb.m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb.ks) {
        var dist = 0.0
        var j = 0
        while (j < cb.dsub) {
          val idx = sub * cb.dsub + j
          val x = if (idx < v.length) v(idx).toDouble else 0.0
          val diff = x - cb.cw(sub, c, j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(sub) = best.toByte
      resid2 += bestD
      sub += 1
    }
    (codes, math.sqrt(resid2) * (1 + 1e-9) + 1e-6)
  }
}

/** Pair-time ADC (asymmetric distance computation) score: the query
  * side carries a precomputed lookup table `lut[sub·ks + code] =
  * q̃_sub · codeword(sub, code)` (one m·ks·dsub pass per QUERY row);
  * each candidate pair then costs `m` table lookups — at m = 8 that is
  * 8 adds per pair vs 64 madds for the full dot, ON TOP of the posting
  * payload shrinking to m bytes. `ks` is recovered as lutLen/m, so the
  * expression needs no config plumbing. Codegen twin of the
  * [[CodeDotExpr]] idiom: two raw buffers in, one double out, no
  * boxing. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val m = codes.length
    if (m == 0) 0.0
    else {
      val ks = lut.numElements() / m
      var acc = 0.0
      var s = 0
      while (s < m) { acc += lut.getDouble(s * ks + (codes(s) & 0xff)); s += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ks = ctx.freshName("ks")
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $b.length;
         |double $acc = 0.0;
         |if ($m > 0) {
         |  int $ks = $a.numElements() / $m;
         |  for (int $s = 0; $s < $m; $s++) {
         |    $acc += $a.getDouble($s * $ks + ($b[$s] & 0xff));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
