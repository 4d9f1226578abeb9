package graft.operators

import graft.functions.{TopKByScore, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (SURVEY §2b L — similarity search).
  *
  * Three tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k via join + window. The
  *     corpus side is broadcast when it fits (dimension-table pattern);
  *     this is the baseline and the recall oracle.
  *   - [[lshTopK]]: random-hyperplane LSH — candidates share a signature
  *     band; the only shuffle is the equality join on band keys.
  *   - [[ivfTopK]]: inverted-file coarse quantizer — candidates share a
  *     centroid cell.
  *
  * Scale parameterization (NOT fixture-tuned — derived from corpus size):
  *   - LSH band width defaults to ceil(log2(n)/2) bits, so buckets hold
  *     ~sqrt(n) vectors and candidates per query are O(bands * sqrt(n)).
  *   - IVF nlist defaults to ceil(sqrt(n)), so cells hold ~sqrt(n)
  *     vectors and candidates per query are O(nprobe * sqrt(n)).
  *   - Near-dup band width defaults to ceil(log2(n)) bits — the
  *     total-work optimum (see [[cosineNearDup]]).
  * SimilaritySpec asserts the candidate bounds on a doubled fixture, so
  * the sqrt scaling is pinned by test, not just by this comment.
  */
object Similarity {

  /** ceil(log2(n)), floored at 2. */
  private def log2ceil(n: Long): Int =
    math.ceil(math.log(math.max(n, 4L).toDouble) / math.log(2.0)).toInt

  /** (qid, nid, cos) → k best per qid via the heap Aggregator (see
    * TopKByScore). Output ranks are 1-based in (cos desc, nid asc)
    * order — row-identical to the window formulation, but the shuffle
    * carries k rows per query per partition instead of every scored
    * row. Used where the scored input is UNPRUNED (brute force:
    * |Q|·|C| rows — measured 34 s → 7 s at 8k×8k vectors, where the
    * rank window's full-table exchange spilled). The ANN paths keep the
    * rank window: their candidate stages already bound the input to
    * ~√n per query, and at that volume ObjectHashAggregate's
    * per-row typed-buffer overhead measures ~2× slower than the
    * window sort locally. */
  private def rankTopKAgg(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKByScore(k))
    scored.groupBy(col("qid"))
      .agg(topk(col("nid"), col("cos")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("p.nid").as("nid"), round(col("p.cos"), 6).as("cos"))
  }

  /** Window form of the same top-k — for candidate-pruned inputs. */
  private def rankTopKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** Exact top-k neighbors (scaled-integer cosine for cross-engine
    * determinism). Excludes self-matches.
    *
    * Norms are computed ONCE per vector before the pairwise join — the
    * pairwise hot loop does a single dot product instead of re-deriving
    * both norms per pair (3× less work, and the shape that matters when
    * the pair count is |Q|·|C|). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val dotF = VectorFunctions.dotScaledFast _
    val n = queries.sparkSession.sparkContext.defaultParallelism
    // spread the pairwise work: a single-file scan is one task, and an
    // EXPLICIT partition count is required — AQE's coalescer folds a
    // small-byte shuffle back to one task even when the per-row compute
    // downstream is the actual cost
    val q = queries.repartition(n, col("vec_id")).select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      dotF(col("embedding"), col("embedding")).as("qn"))
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nv"),
      dotF(col("embedding"), col("embedding")).as("nn"))
    val scored = q.join(broadcast(c), col("qid") =!= col("nid"))
      .withColumn("cos",
        when(col("qn") === 0 || col("nn") === 0, lit(0.0))
          .otherwise(dotF(col("qv"), col("nv")).cast("double") /
            sqrt((col("qn") * col("nn")).cast("double"))))
      // shed the vectors BEFORE the top-k aggregation: the partial
      // buffers hold (nid, cos) pairs only
      .select(col("qid"), col("nid"), col("cos"))
    rankTopKAgg(scored, k)
  }

  /** Deterministic random hyperplanes: nBits × dim, seeded. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextGaussian())
  }

  /** Per-row LSH band keys from seeded hyperplane projections: `bands`
    * keys of `bitsPerBand` sign bits each, as a long array (band widths
    * up to 63 bits — a single packed-long signature caps total bits at
    * 64, which breaks once band width scales with log n). One tight-loop
    * UDF call per row, all primitive arithmetic — the interpreted
    * higher-order form costs ~100× on single-task scans.
    *
    * The plane matrix arrives as a broadcast HANDLE, not a captured
    * array: closure bytes are re-shipped with every task of every
    * stage, and at B·b ≈ 2000 hyperplanes × 64 dims the captured form
    * measurably bloats task binaries (1.5 MiB "large task binary"
    * warnings at sf0.1); a broadcast variable ships once per executor
    * and the closure carries only the handle. */
  private def bandKeysUdf(
      planesBc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      bands: Int, bitsPerBand: Int) =
    udf { (v: Seq[Float]) =>
      val planes = planesBc.value
      val keys = new Array[Long](bands)
      if (v != null) {
        val a = v.toArray // one unboxing copy, then primitive access in the B·b·dim loop
        var b = 0
        while (b < bands) {
          var key = 0L
          var i = 0
          while (i < bitsPerBand) {
            val p = planes(b * bitsPerBand + i)
            var dot = 0.0
            var j = 0
            val len = math.min(p.length, a.length)
            while (j < len) { dot += p(j) * a(j); j += 1 }
            if (dot > 0) key |= (1L << i)
            i += 1
          }
          keys(b) = key
          b += 1
        }
      }
      keys
    }

  /** Exact quantized cosine between two attached vectors, as a column. */
  private def cosCol(va: org.apache.spark.sql.Column, vb: org.apache.spark.sql.Column,
      na: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(VectorFunctions.dotScaledFast(va, vb).cast("double") /
        sqrt((na * nb).cast("double")))

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer
    * alternative to LSH. `nlist` centroids are chosen deterministically
    * from the corpus (every stride-th vector — k-means would drift per
    * run; determinism matters more here than a few recall points), every
    * corpus vector is assigned to its nearest centroid cell, and each
    * query probes its `nprobe` nearest cells. The only join is an
    * equality join on cell id: candidates per query are O(corpus/nlist ×
    * nprobe), never O(corpus).
    *
    * nlist defaults to ceil(sqrt(n)) so cells hold ~sqrt(n) vectors and
    * the candidate count per query is ~nprobe·sqrt(n) — the balance
    * point between centroid-scan work (nlist per row) and cell-scan work
    * (n/nlist per probe); a FIXED nlist would grow cells linearly with
    * the corpus and quietly stop pruning. Centroids are tiny (nlist ×
    * dim floats) and ride along as a broadcast closure; AT MOST nlist
    * rows ever reach the driver — the stride filter is limit-capped, and
    * collects fewer when the corpus itself is smaller than nlist
    * (documented scalar-collect). */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Option[Int] = None,
      nprobe: Int = 4): DataFrame = {
    val scored = ivfCandidates(queries, corpus, nlist, nprobe)
      .withColumn("qn", VectorFunctions.dotScaledFast(col("qv"), col("qv")))
      .withColumn("nn", VectorFunctions.dotScaledFast(col("nv"), col("nv")))
      .withColumn("cos", cosCol(col("qv"), col("nv"), col("qn"), col("nn")))
      .select(col("qid"), col("nid"), col("cos"))
    rankTopKWindow(scored, k)
  }

  /** IVF candidate stage: (qid, qv, nid, nv) pairs sharing a probed
    * centroid cell, pair-distinct. Exposed so SimilaritySpec can assert
    * the per-query candidate bound (≤ c·nprobe·sqrt(n)) directly. */
  private[graft] def ivfCandidates(
      queries: DataFrame,
      corpus: DataFrame,
      nlistOpt: Option[Int] = None,
      nprobe: Int = 4): DataFrame = {
    val n = queries.sparkSession.sparkContext.defaultParallelism
    // deterministic coarse quantizer: every stride-th corpus vector by
    // id; AT MOST nlist rows reach the driver (count + limit-capped
    // collect — when total < nlist the whole corpus passes the stride
    // filter and the limit is what bounds the fetch)
    val total = corpus.count()
    val nlist = nlistOpt.getOrElse(math.max(16, math.ceil(math.sqrt(total.toDouble)).toInt))
    val stride = math.max(1L, total / nlist)
    val centroids: Array[(Int, Array[Float])] = corpus
      .filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id"))
      .limit(nlist)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
      .zipWithIndex
      .map { case (v, i) => (i, v) }

    // primitive top-m selection — the per-row hot loop scans nlist≈√n
    // centroids for EVERY corpus and query row, so a boxed sortBy here
    // (tuple per centroid + full sort for m ≤ 4) is measurable; m passes
    // over a primitive score array are not
    def cells(vec: Seq[Float], m: Int): Seq[Int] = {
      val v = vec.toArray
      val scores = new Array[Double](centroids.length)
      var ci = 0
      while (ci < centroids.length) {
        val c = centroids(ci)._2
        var dot = 0.0; var nc = 0.0; var nv = 0.0
        var i = 0
        val len = math.min(c.length, v.length)
        while (i < len) { dot += c(i) * v(i); nc += c(i) * c(i); nv += v(i) * v(i); i += 1 }
        scores(ci) = if (nc == 0 || nv == 0) 0.0 else dot / math.sqrt(nc * nv)
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
      picked.toSeq
    }

    val probeUdf = udf((v: Seq[Float]) => if (v == null) Seq(0) else cells(v, nprobe))
    val assignUdf = udf((v: Seq[Float]) => if (v == null) 0 else cells(v, 1).head)

    // ids only through the cell join + pair-distinct: the 64-float
    // vectors never ride the candidate-multiplicity shuffle (measured 2×
    // at sf0.1 vs the wide-row distinct) — re-attached by key after
    val q = queries.repartition(n, col("vec_id")).select(
      col("vec_id").as("qid"),
      explode(probeUdf(col("embedding"))).as("cell"))
    val c = corpus.select(
      col("vec_id").as("nid"),
      assignUdf(col("embedding")).as("cell"))
    q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
      .join(queries.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .join(corpus.select(col("vec_id").as("nid"), col("embedding").as("nv")), "nid")
      .select(col("qid"), col("qv"), col("nid"), col("nv"))
  }

  /** IVF top-k with the candidate tier running entirely over int8
    * scalar-quantization codes and an exact float re-rank — the
    * composition that makes the l21 storage tier real. At 100 TB the
    * point of SQ is that the ANN index (centroid assignments + code
    * vectors) is 4× smaller than the float corpus, so candidate
    * generation scans/shuffles codes and ONLY the ≈nprobe·√n candidate
    * rows per query ever touch the float embeddings.
    *
    * Cosine is scale-invariant, so the per-vector SQ scale m cancels
    * out of cell geometry entirely: cells are chosen from the raw codes
    * (cos(code·m/127, c) = cos(code, c)) and the scale column never
    * rides the candidate shuffle at all. Quantization only perturbs
    * WHICH cells are probed (SimilaritySpec bounds the recall cost vs
    * the float path and brute force); reported scores are exact float
    * cosine, bit-identical to [[ivfTopK]] on the same candidate set. */
  def ivfTopKInt8(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Option[Int] = None,
      nprobe: Int = 4): DataFrame = {
    val scored = ivfCandidatesInt8(queries, corpus, nlist, nprobe)
      .withColumn("qn", VectorFunctions.dotScaledFast(col("qv"), col("qv")))
      .withColumn("nn", VectorFunctions.dotScaledFast(col("nv"), col("nv")))
      .withColumn("cos", cosCol(col("qv"), col("nv"), col("qn"), col("nn")))
      .select(col("qid"), col("nid"), col("cos"))
    rankTopKWindow(scored, k)
  }

  /** Nearest-`m` centroid indices by cosine — the same primitive-array
    * selection loop as [[ivfCandidates]]'s inner `cells`, factored for
    * the int8 path (boxed sortBy is measurable at nlist≈√n per row). */
  private def nearestCells(centroids: Array[Array[Double]], v: Array[Double], m: Int): Seq[Int] = {
    val scores = new Array[Double](centroids.length)
    var ci = 0
    while (ci < centroids.length) {
      val c = centroids(ci)
      var dot = 0.0; var nc = 0.0; var nv = 0.0
      var i = 0
      val len = math.min(c.length, v.length)
      while (i < len) { dot += c(i) * v(i); nc += c(i) * c(i); nv += v(i) * v(i); i += 1 }
      scores(ci) = if (nc == 0 || nv == 0) 0.0 else dot / math.sqrt(nc * nv)
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
    picked.toSeq
  }

  /** Candidate stage of [[ivfTopKInt8]]: cell equi-join computed from
    * int8 codes only, float vectors re-attached by id AFTER the
    * pair-distinct. Exposed for SimilaritySpec's candidate bound. */
  private[graft] def ivfCandidatesInt8(
      queries: DataFrame,
      corpus: DataFrame,
      nlistOpt: Option[Int] = None,
      nprobe: Int = 4): DataFrame = {
    val sc = queries.sparkSession.sparkContext
    val n = sc.defaultParallelism
    // the quantized view the whole candidate tier runs on: codes only —
    // the scale factor is irrelevant to cell geometry (see docstring)
    def codesOf(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        VectorFunctions.int8Codes(col("embedding"),
          VectorFunctions.maxAbs(col("embedding"))).as("codes"))

    val total = corpus.count()
    val nlist = nlistOpt.getOrElse(math.max(16, math.ceil(math.sqrt(total.toDouble)).toInt))
    val stride = math.max(1L, total / nlist)
    // stride-picked centroids from the QUANTIZED corpus (≤ nlist driver
    // rows, limit-capped — same documented scalar collect as ivfCandidates)
    val centroids: Array[Array[Double]] = codesOf(corpus, "nid")
      .filter(pmod(col("nid"), lit(stride)) === 0)
      .orderBy(col("nid"))
      .limit(nlist)
      .select(col("codes"))
      .collect()
      .map(_.getSeq[Long](0).map(_.toDouble).toArray)
    val centroidsBc = sc.broadcast(centroids)

    val probeUdf = udf { (codes: Seq[Long]) =>
      if (codes == null) Seq(0)
      else nearestCells(centroidsBc.value, codes.map(_.toDouble).toArray, nprobe)
    }
    val assignUdf = udf { (codes: Seq[Long]) =>
      if (codes == null) 0
      else nearestCells(centroidsBc.value, codes.map(_.toDouble).toArray, 1).head
    }

    val q = codesOf(queries, "qid").repartition(n, col("qid"))
      .select(col("qid"), explode(probeUdf(col("codes"))).as("cell"))
    val c = codesOf(corpus, "nid")
      .select(col("nid"), assignUdf(col("codes")).as("cell"))
    q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
      .join(queries.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .join(corpus.select(col("vec_id").as("nid"), col("embedding").as("nv")), "nid")
      .select(col("qid"), col("qv"), col("nid"), col("nv"))
  }

  /** Bands needed so a pair at cosine >= `threshold` is missed with
    * probability <= `miss`: per-hyperplane agreement for angle θ is
    * 1 - θ/π (Goemans–Williamson), a b-bit band agrees with p^b, and
    * B independent bands miss with (1-p^b)^B <= miss. Solved for B. */
  def bandsForRecall(threshold: Double, bitsPerBand: Int, miss: Double): Int = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    math.ceil(math.log(miss) / math.log(1.0 - math.pow(p, bitsPerBand))).toInt
  }

  /** Hyperplane budget ceiling: B·b sign-bit projections per row is the
    * signature cost, and past ~16k the signature stage alone dominates. */
  private[graft] val MaxPlaneBits = 16384

  /** Band-width ceiling. Width b ≈ log2(n) is the total-work optimum,
    * but an UNCAPPED width makes the derived band count B =
    * bandsForRecall(τ, b, miss) grow as miss^... · n^ρ — at τ = 0.8 and
    * miss = 1e-7 that is ≈16·n^0.33, which crosses [[MaxPlaneBits]] at
    * n ≈ 2×10⁵ and made the operator REFUSE moderate corpora. Capping b
    * at 20 bits (bucket collision floor 2⁻²⁰ ≈ 1e-6 of the corpus per
    * band) keeps B flat past n = 10⁶: the trade is more candidates per
    * band at 10⁹+ rows — the standard LSH-forest regime, documented in
    * SCALE.md — instead of a hard failure. */
  private[graft] val MaxBitsPerBand = 20

  /** The (bitsPerBand, bands, totalBits) a [[cosineNearDup]] call would
    * derive for a corpus of `n` vectors — pure arithmetic, exposed so
    * SimilaritySpec can pin the n = 10⁶ / 10⁹ parameterizations under
    * [[MaxPlaneBits]] without materializing such corpora. */
  private[graft] def nearDupPlan(threshold: Double, n: Long, miss: Double): (Int, Int, Int) = {
    val b = math.min(MaxBitsPerBand, math.max(4, log2ceil(n)))
    val bands = bandsForRecall(threshold, b, miss)
    (b, bands, b * bands)
  }

  /** Embedding-cosine near-duplicate pairs on LSH-banded candidates — the
    * scale form of "all pairs with cosine >= threshold".
    *
    * Plan shape (this is the point, vs. the naive `id_a < id_b` theta
    * join, which is a BroadcastNestedLoopJoin over n²/2 pairs with the
    * whole corpus broadcast; ExplainSpec pins the executed l6 plan to
    * contain no nested-loop or cartesian join):
    *   1. per-vector seeded hyperplane signatures, split into `bands`
    *      band keys — row-local, one pass;
    *   2. candidates = equi-join on (band, key) carrying ONLY ids — a
    *      plain hash shuffle of narrow rows, then pair-distinct;
    *   3. vectors re-attached by two equi-joins on id, exact quantized
    *      cosine filter (scores identical to brute force — banding only
    *      affects which pairs are EXAMINED, never a reported score).
    *
    * Parameters and the candidate-volume math (also in SCALE.md):
    * a pair at cosine c agrees per hyperplane with p(c) = 1 - acos(c)/π,
    * so B bands of b bits retain it with 1-(1-p^b)^B. Total work =
    * signatures O(n·B·b) + candidates O(B·n²/2^b); the sum is minimized
    * at b ≈ log2(n), which `bitsPerBand = None` selects — giving
    * O(n^(1+ρ)) candidates with ρ = log2(1/p(τ)). At τ = 0.8 (real
    * near-dup regime) ρ ≈ 0.33: genuinely subquadratic, and background
    * (cosine≈0) retention is B/2^b — e.g. 14% at n = 1000. At τ = 0.4,
    * p = 0.63 ⇒ ρ ≈ 0.66 and B = bandsForRecall grows as 16·n^0.66:
    * formally subquadratic but the band count is impractical at scale —
    * low-threshold FULL-recall cosine join is intrinsically near-
    * quadratic, which is why the declared l6 query runs at τ = 0.8 and
    * τ = 0.4 is a SimilaritySpec stress case with fixed narrow bands.
    *
    * Recall: miss probability (1-p^b)^B <= `miss` at the threshold
    * itself (bandsForRecall), and exact duplicates (cosine 1.0) have
    * identical signatures in every band — zero miss risk, not even
    * probabilistic.
    *
    * `miss` is the per-pair miss budget and the SCALE lever: production
    * dedup tolerates ~1e-2 (the default — a 99%-recall sweep still
    * removes 99% of the duplicate mass, and B ≈ 4.6·n^0.33 bands at
    * τ = 0.8 stays under [[MaxPlaneBits]] through n = 10⁹ with the
    * [[MaxBitsPerBand]] cap). The fixture-scale l6 oracle query passes
    * miss = 1e-7 explicitly — at 3k vectors the stricter budget is
    * cheap and makes the all-pairs DuckDB hash-match a non-event. */
  def cosineNearDup(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      miss: Double = 1e-2,
      bitsPerBand: Option[Int] = None,
      bandsOverride: Option[Int] = None,
      dim: Int = 64,
      seed: Long = 42L,
      corpusSize: Option[Long] = None): DataFrame = {
    val cand = cosineNearDupCandidates(emb, idCol, embCol, threshold,
      miss, bitsPerBand, bandsOverride, dim, seed, corpusSize)
    val vecs = emb.select(col(idCol).as("id"), col(embCol).as("v"),
      VectorFunctions.dotScaledFast(col(embCol), col(embCol)).as("nrm"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cos", cosCol(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Candidate stage of [[cosineNearDup]]: distinct (id_a < id_b) pairs
    * sharing at least one band key. Exposed so SimilaritySpec can assert
    * the pruning ratio (candidates ≪ n²/2 at τ=0.8) directly. */
  private[graft] def cosineNearDupCandidates(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      miss: Double = 1e-2,
      bitsPerBandOpt: Option[Int] = None,
      bandsOverride: Option[Int] = None,
      dim: Int = 64,
      seed: Long = 42L,
      corpusSize: Option[Long] = None): DataFrame = {
    val n0 = corpusSize.getOrElse(emb.count())
    val bitsPerBand = bitsPerBandOpt.getOrElse(math.min(MaxBitsPerBand, math.max(4, log2ceil(n0))))
    val bands = bandsOverride.getOrElse(bandsForRecall(threshold, bitsPerBand, miss))
    val nBits = bands * bitsPerBand
    require(nBits <= MaxPlaneBits,
      s"too many hyperplanes ($nBits = $bands bands × $bitsPerBand bits) — " +
        "this threshold/miss combination is not banding-friendly; raise the " +
        "threshold or relax the miss budget (the default 1e-2 stays under " +
        s"$MaxPlaneBits bits through n = 1e9 at τ ≥ 0.8)")
    val sc = emb.sparkSession.sparkContext
    val planesBc = sc.broadcast(hyperplanes(nBits, dim, seed))
    val n = sc.defaultParallelism
    val keysUdf = bandKeysUdf(planesBc, bands, bitsPerBand)

    val banded = emb
      .repartition(n, col(idCol))
      .select(col(idCol).as("id"),
        posexplode(keysUdf(col(embCol))).as(Seq("band", "bkey")))
    // ids only through the band join: the shuffle is narrow rows, the
    // vectors never fan out with the candidate multiplicity
    banded.as("x").repartition(n, col("band"), col("bkey"))
      .join(banded.as("y"), Seq("band", "bkey"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** LSH candidate stage: (qid, qv, nid, nv) pairs sharing at least one
    * band key, pair-distinct. Band width defaults to ceil(log2(n)/2)
    * bits ⇒ ~sqrt(n) vectors per bucket ⇒ ~bands·sqrt(n) candidates per
    * query; a FIXED band width (the round-2 defect) makes buckets — and
    * thus per-query work — grow linearly with the corpus. The band COUNT
    * scales too: per-band agreement for a true neighbor is p^b, so wider
    * bands (growing with log n) shrink it, and a fixed band count would
    * let recall decay silently as the corpus grows (the round-3 advisor
    * finding). Default bands = bandsForRecall(0.9, b, 0.05): a neighbor
    * at cosine ≥ 0.9 survives banding with ≥ 95% probability at ANY
    * corpus size — the recall target is the invariant, the band count is
    * derived (8 at fixture scale, 13 at n = 10⁶, 30 at n = 10⁹; work
    * per query stays ~bands·sqrt(n)). Exposed so SimilaritySpec can
    * assert the candidate bound on a doubled fixture. */
  private[graft] def lshCandidates(
      queries: DataFrame,
      corpus: DataFrame,
      bands: Option[Int] = None,
      bitsPerBand: Option[Int] = None,
      dim: Int = 64,
      seed: Long = 42L,
      corpusSize: Option[Long] = None): DataFrame = {
    val n0 = corpusSize.getOrElse(corpus.count())
    val b = bitsPerBand.getOrElse(math.max(4, (log2ceil(n0) + 1) / 2))
    val nBands = bands.getOrElse(math.max(8, bandsForRecall(0.9, b, 0.05)))
    val planesBc = queries.sparkSession.sparkContext
      .broadcast(hyperplanes(nBands * b, dim, seed))
    val keysUdf = bandKeysUdf(planesBc, nBands, b)

    def banded(df: DataFrame, idAs: String): DataFrame =
      df.select(col("vec_id").as(idAs),
        posexplode(keysUdf(col("embedding"))).as(Seq("band", "bkey")))

    // ids only through the band join + pair-distinct (same shape as the
    // near-dup path): vectors re-attached by key AFTER the candidate
    // multiplicity is collapsed
    val n = queries.sparkSession.sparkContext.defaultParallelism
    val q = banded(queries.repartition(n, col("vec_id")), "qid")
    val c = banded(corpus, "nid")
    q.repartition(n, col("band"), col("bkey"))
      .join(c, Seq("band", "bkey"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
      .join(queries.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .join(corpus.select(col("vec_id").as("nid"), col("embedding").as("nv")), "nid")
      .select(col("qid"), col("qv"), col("nid"), col("nv"))
  }

  /** LSH-bucketed approximate top-k: rank candidates by exact cosine
    * within the union of matching buckets (see [[lshCandidates]] for
    * both scaling laws: band WIDTH ~ log2(n)/2 keeps buckets ~sqrt(n),
    * band COUNT = bandsForRecall(0.9, width, 0.05) keeps recall at
    * cosine ≥ 0.9 from decaying as the corpus grows). Seeded
    * hyperplanes → deterministic. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      bands: Option[Int] = None,
      bitsPerBand: Option[Int] = None,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val scored = lshCandidates(queries, corpus, bands, bitsPerBand, dim, seed)
      .withColumn("qn", VectorFunctions.dotScaledFast(col("qv"), col("qv")))
      .withColumn("nn", VectorFunctions.dotScaledFast(col("nv"), col("nv")))
      .withColumn("cos", cosCol(col("qv"), col("nv"), col("qn"), col("nn")))
      .select(col("qid"), col("nid"), col("cos"))
    rankTopKWindow(scored, k)
  }
}
