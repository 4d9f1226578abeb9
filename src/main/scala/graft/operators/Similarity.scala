package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (SURVEY §2b L — similarity search).
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k via join + window. The
  *     corpus side is broadcast when it fits (dimension-table pattern);
  *     this is the baseline and the recall oracle.
  *   - [[lshTopK]]: random-hyperplane LSH — each vector gets a `nBits`
  *     signature; candidates share a signature band. The scale path: the
  *     only shuffle is the equality join on band keys, candidates per
  *     query are O(bucket size), never O(corpus). Hyperplanes are
  *     generated from a fixed seed, so results are deterministic.
  */
object Similarity {

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
      // shed the vectors BEFORE the window shuffle: 30× fewer bytes moved
      .select(col("qid"), col("nid"), col("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: nBits × dim, seeded. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextGaussian())
  }

  /** Sign-of-projection signature as an Int bucket key per band. */
  private val signatureUdf = {
    (planes: Array[Array[Double]]) =>
      udf { (v: Seq[Float]) =>
        if (v == null) 0L
        else {
          var sig = 0L
          var i = 0
          while (i < planes.length) {
            var dot = 0.0
            val p = planes(i)
            var j = 0
            while (j < math.min(p.length, v.length)) { dot += p(j) * v(j); j += 1 }
            if (dot > 0) sig |= (1L << i)
            i += 1
          }
          sig
        }
      }
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer
    * alternative to LSH. `nlist` centroids are chosen deterministically
    * from the corpus (every stride-th vector — k-means would drift per
    * run; determinism matters more here than a few recall points), every
    * corpus vector is assigned to its nearest centroid cell, and each
    * query probes its `nprobe` nearest cells. The only join is an
    * equality join on cell id: candidates per query are O(corpus/nlist ×
    * nprobe), never O(corpus). Centroids are tiny (nlist × dim floats)
    * and ride along as a broadcast closure — the classic small-dimension
    * pattern. */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val n = queries.sparkSession.sparkContext.defaultParallelism
    // deterministic coarse quantizer: every stride-th corpus vector by id;
    // ONLY nlist rows ever reach the driver (count + filtered collect)
    val total = corpus.count()
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

    def cells(vec: Seq[Float], m: Int): Seq[Int] =
      centroids.map { case (cid, c) =>
        var dot = 0.0; var nc = 0.0; var nv = 0.0
        var i = 0
        val len = math.min(c.length, vec.length)
        while (i < len) { dot += c(i) * vec(i); nc += c(i) * c(i); nv += vec(i) * vec(i); i += 1 }
        val cos = if (nc == 0 || nv == 0) 0.0 else dot / math.sqrt(nc * nv)
        (cid, cos)
      }.sortBy { case (cid, cos) => (-cos, cid) }.take(m).map(_._1).toSeq

    val probeUdf = udf((v: Seq[Float]) => if (v == null) Seq(0) else cells(v, nprobe))
    val assignUdf = udf((v: Seq[Float]) => if (v == null) 0 else cells(v, 1).head)

    val q = queries.repartition(n, col("vec_id")).select(
      col("vec_id").as("qid"), col("embedding").as("qv"),
      explode(probeUdf(col("embedding"))).as("cell"))
    val c = corpus.select(
      col("vec_id").as("nid"), col("embedding").as("nv"),
      assignUdf(col("embedding")).as("cell"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    q.join(c, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("nid"), col("nv")).distinct()
      .withColumn("qn", VectorFunctions.dotScaledFast(col("qv"), col("qv")))
      .withColumn("nn", VectorFunctions.dotScaledFast(col("nv"), col("nv")))
      .withColumn("cos",
        when(col("qn") === 0 || col("nn") === 0, lit(0.0))
          .otherwise(VectorFunctions.dotScaledFast(col("qv"), col("nv")).cast("double") /
            sqrt((col("qn") * col("nn")).cast("double"))))
      .select(col("qid"), col("nid"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cos"))
  }

  /** Bands needed so a pair at cosine >= `threshold` is missed with
    * probability <= `miss`: per-hyperplane agreement for angle θ is
    * 1 - θ/π (Goemans–Williamson), a b-bit band agrees with p^b, and
    * B independent bands miss with (1-p^b)^B <= miss. Solved for B. */
  def bandsForRecall(threshold: Double, bitsPerBand: Int, miss: Double): Int = {
    val p = 1.0 - math.acos(threshold) / math.Pi
    math.ceil(math.log(miss) / math.log(1.0 - math.pow(p, bitsPerBand))).toInt
  }

  /** Embedding-cosine near-duplicate pairs on LSH-banded candidates — the
    * scale form of "all pairs with cosine >= threshold".
    *
    * Plan shape (this is the point, vs. the naive `id_a < id_b` theta
    * join, which is a BroadcastNestedLoopJoin over n²/2 pairs with the
    * whole corpus broadcast):
    *   1. per-vector seeded hyperplane signatures, split into `bands`
    *      band keys — row-local, one pass;
    *   2. candidates = equi-join on (band, key) carrying ONLY ids — a
    *      plain hash shuffle of narrow rows, then pair-distinct;
    *   3. vectors re-attached by two equi-joins on id, exact quantized
    *      cosine filter (scores identical to brute force — banding only
    *      affects which pairs are EXAMINED, never a reported score).
    *
    * Recall: a qualifying pair is missed with prob (1-p^b)^B where
    * p = 1-θ/π; defaults come from [[bandsForRecall]](threshold, b, 1e-7)
    * so even 10⁴ borderline pairs survive w.h.p., and the seeded planes
    * make any given run deterministic. Caveat, measured on the isotropic
    * unit-vector fixtures: at threshold 0.4 the qualifying angle (66°) is
    * so close to the background that full-recall banding keeps ~94% of
    * pairs as candidates — the win there is the no-broadcast no-NLJ plan
    * shape alone; at realistic near-dup thresholds (>= 0.8) the same code
    * prunes aggressively (SimilaritySpec pins both properties). */
  def cosineNearDup(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      bitsPerBand: Int = 4,
      bandsOverride: Option[Int] = None,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val bands = bandsOverride.getOrElse(bandsForRecall(threshold, bitsPerBand, 1e-7))
    val nBits = bands * bitsPerBand
    require(nBits <= 1024, s"too many hyperplanes ($nBits) — raise bitsPerBand")
    val planes = hyperplanes(nBits, dim, seed)
    val n = emb.sparkSession.sparkContext.defaultParallelism

    // 64-bit band keys straight from the projection signs (long-array UDF:
    // one JVM call per row, primitive loops — the interpreted higher-order
    // form costs ~100x on single-task scans)
    val bandKeysUdf = udf { (v: Seq[Float]) =>
      val keys = new Array[Long](bands)
      if (v != null) {
        var b = 0
        while (b < bands) {
          var key = 0L
          var i = 0
          while (i < bitsPerBand) {
            val p = planes(b * bitsPerBand + i)
            var dot = 0.0
            var j = 0
            val len = math.min(p.length, v.length)
            while (j < len) { dot += p(j) * v(j); j += 1 }
            if (dot > 0) key |= (1L << i)
            i += 1
          }
          keys(b) = key
          b += 1
        }
      }
      keys
    }

    val banded = emb
      .repartition(n, col(idCol))
      .select(col(idCol).as("id"),
        posexplode(bandKeysUdf(col(embCol))).as(Seq("band", "bkey")))
    // ids only through the band join: the shuffle is narrow rows, the
    // vectors never fan out with the candidate multiplicity
    val cand = banded.as("x").repartition(n, col("band"), col("bkey"))
      .join(banded.as("y"), Seq("band", "bkey"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    val vecs = emb.select(col(idCol).as("id"), col(embCol).as("v"),
      VectorFunctions.dotScaledFast(col(embCol), col(embCol)).as("nrm"))
    cand
      .join(vecs.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cos",
        when(col("na") === 0 || col("nb") === 0, lit(0.0))
          .otherwise(VectorFunctions.dotScaledFast(col("va"), col("vb")).cast("double") /
            sqrt((col("na") * col("nb")).cast("double"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** LSH-bucketed approximate top-k: `bands` signature bands of
    * `bitsPerBand` bits; rank candidates by exact cosine within the
    * union of matching buckets. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      bands: Int = 8,
      bitsPerBand: Int = 4,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val nBits = bands * bitsPerBand
    val sigUdf = signatureUdf(hyperplanes(nBits, dim, seed))

    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(vecAs),
          sigUdf(col("embedding")).as("sig"))
        .select(col(idAs), col(vecAs),
          posexplode(expr(
            s"transform(sequence(0, ${bands - 1}), i -> shiftright(sig, i * $bitsPerBand) & ${(1 << bitsPerBand) - 1})"))
            .as(Seq("band", "bkey")))

    val n = queries.sparkSession.sparkContext.defaultParallelism
    val q = banded(queries, "qid", "qv")
    val c = banded(corpus, "nid", "nv")
    val candidates = q.repartition(n, col("band"), col("bkey"))
      .join(c, Seq("band", "bkey"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "qv", "nid", "nv").distinct()
      .withColumn("qn", VectorFunctions.dotScaledFast(col("qv"), col("qv")))
      .withColumn("nn", VectorFunctions.dotScaledFast(col("nv"), col("nv")))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    candidates
      .withColumn("cos",
        when(col("qn") === 0 || col("nn") === 0, lit(0.0))
          .otherwise(VectorFunctions.dotScaledFast(col("qv"), col("nv")).cast("double") /
            sqrt((col("qn") * col("nn")).cast("double"))))
      .select(col("qid"), col("nid"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), round(col("cos"), 6).as("cos"))
  }
}
