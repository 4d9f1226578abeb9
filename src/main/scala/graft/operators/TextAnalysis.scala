package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline (SURVEY §2b L): quality
  * scoring, language ID, token counting, fingerprinting, tf-idf.
  * Everything except the fingerprint UDF is built-ins (codegen'd); all of
  * it is row-local or single-shuffle aggregation — no driver loops.
  */
object TextAnalysis {

  /** Per-document quality stats: lengths, token counts, punctuation and
    * non-alpha ratios, stopword ratio. Ratios are single divisions of
    * exact integers — engine-exact. */
  def qualityStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    val stop = array(Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with").map(lit): _*)
    docs.withColumns(Map(
      "n_chars_m" -> length(t),
      "n_tokens" -> size(toks),
      "n_punct" -> (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))),
      "n_nonalpha" -> (length(t) - length(regexp_replace(t, "[^a-zA-Z ]", ""))),
      "n_stop" -> size(filter(toks, x => array_contains(stop, x))),
      "avg_tok_len" -> round(
        (length(t) - size(toks) + 1).cast("double") / size(toks), 6),
      "stop_ratio" -> round(
        size(filter(toks, x => array_contains(stop, x))).cast("double") / size(toks), 6)))
  }

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu", "den", "mit", "von"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "est", "en", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "为"))

  /** Heuristic language ID: stopword-hit score per language, argmax with
    * a fixed preference order on ties ('und' = undetermined when no
    * stopword hits at all). Deterministic integer scores, so the DuckDB
    * CASE-cascade oracle reproduces it exactly. Implemented as one
    * tight-loop UDF: the per-token × per-language scoring is row-local,
    * and the interpreted higher-order form cost ~100× more in the hot
    * path (it turned a 5k-doc scan into minutes on one core). */
  val langId: Column => Column = {
    val profiles = langStopwords.map { case (lang, words) => (lang, words.toSet) }
    val f = udf { (text: String) =>
      if (text == null) "und"
      else {
        val toks = text.toLowerCase.split(" ", -1)
        val scores = profiles.map { case (lang, stop) =>
          var n = 0
          var i = 0
          while (i < toks.length) { if (stop.contains(toks(i))) n += 1; i += 1 }
          (lang, n)
        }
        val best = scores.map(_._2).max
        scores.collectFirst { case (lang, s) if s > 0 && s == best => lang }
          .getOrElse("und")
      }
    }
    (c: Column) => f(c)
  }

  /** Rolling 64-bit FNV-1a document fingerprint — the exact-content
    * identity for dedup ledgers; row-local UDF, wrapping arithmetic is
    * well-defined on Long. */
  val fingerprint = udf { (text: String) =>
    if (text == null) 0L
    else {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < text.length) {
        h ^= text.charAt(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
  }

  /** Winnowing fingerprints (the Schleimer–Wilkerson–Aiken scheme):
    * FNV k-gram hashes over characters, the rightmost minimum of each
    * sliding window of `w` selected, deduplicated and sorted.
    *
    * The property that makes this the position-robust document
    * fingerprint (vs the whole-content hash above): any substring of
    * length >= w + k - 1 shared by two documents contributes at least
    * one SHARED selected hash, no matter where it sits in either
    * document — so fingerprint overlap detects partial/embedded
    * duplication, not just exact identity. Density is ~2/(w+1) of all
    * k-grams, a fixed compression knob. Row-local UDF, one pass,
    * O(n·w) worst case; deterministic (fixed FNV constants), so
    * DedupSpec pins the guarantee and the driver records a rows-only
    * check (wrapping 64-bit multiplies are not SQL-expressible). */
  def winnow(k: Int = 5, w: Int = 4) = udf { (text: String) =>
    if (text == null || text.length < k) Seq.empty[Long]
    else {
      val n = text.length - k + 1
      val hs = new Array[Long](n)
      var i = 0
      while (i < n) {
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < k) { h ^= text.charAt(i + j).toLong; h *= 0x100000001b3L; j += 1 }
        hs(i) = h
        i += 1
      }
      val out = scala.collection.mutable.SortedSet[Long]()
      var s = 0
      val windows = math.max(n - w + 1, 1)
      val width = math.min(w, n)
      while (s < windows) {
        // rightmost minimum of hs[s, s+width)
        var m = s
        var t = s + 1
        while (t < s + width) { if (hs(t) <= hs(m)) m = t; t += 1 }
        out += hs(m)
        s += 1
      }
      out.toSeq
    }
  }

  /** Fixed-size overlapping token chunks — the RAG/pretraining windowing
    * pass (chunkSize-token windows every stride tokens; stride <
    * chunkSize gives the overlap that keeps context at boundaries).
    *
    * Entirely row-local: the chunk index axis comes from `sequence`
    * over the document's own token count and windows are `slice`s of
    * the one tokens array — no shuffle, no UDF, whole-stage codegen.
    * A document with n tokens yields floor((n-1)/stride)+1 chunks; the
    * final chunks are shorter where the window runs off the end (the
    * same clamping rule as DuckDB's list slicing, which oracles this). */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkSize > 0 && stride > 0)
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .select(col(idCol),
        explode(transform(
          sequence(lit(0), floor((size(col("__toks")) - 1) / lit(stride)).cast("int")),
          i => struct(
            i.cast("long").as("chunk_idx"),
            concat_ws(" ", slice(col("__toks"), i * stride + 1, lit(chunkSize))).as("chunk"),
            size(slice(col("__toks"), i * stride + 1, lit(chunkSize))).cast("long").as("n_tok"))))
          .as("c"))
      .select(col(idCol), col("c.chunk_idx"), col("c.n_tok"), col("c.chunk"))
  }

  /** Per-document repetition signals — the Gopher-style quality filter
    * that catches boilerplate and degenerate generations (a page that
    * repeats one phrase has high duplicate-n-gram fractions and one
    * dominant n-gram):
    *   - `dup_2gram_frac`  = 1 − distinct/total 2-grams,
    *   - `top_2gram_share` = occurrences of the most frequent 2-gram /
    *     total 2-grams,
    *   - `dup_3gram_frac`  = 1 − distinct/total 3-grams.
    *
    * Two execution shapes on purpose: the 3-gram fraction is entirely
    * ROW-LOCAL (native [[graft.functions.ShingleHash64Expr]]
    * fingerprints + `array_distinct` over longs, zero shuffles; the
    * shape to prefer when only a distinct-count is needed), while the
    * 2-gram stats need per-gram
    * occurrence counts, so they run explode → two-level hash aggregate —
    * ONE shuffle whose map side combines per-doc gram counts (never
    * wider than the tokenized corpus, the same scale envelope as
    * tf-idf). All counts are exact integers with single divisions —
    * engine-exact against the DuckDB oracle.
    *
    * Documents with fewer than 2 (resp. 3) tokens have no such grams;
    * their fractions are defined as 0. */
  /** Corpus-trained bigram language-model score per document — the
    * model-based quality signal of the CCNet family (Wenzek et al.,
    * LREC 2020 score with a Kneser–Ney LM; here the LM is the corpus's
    * own MLE bigram model, so the operator is closed over its input
    * and fully deterministic): `avg over the doc's bigrams of
    * ln(C(w1,w2) / C(w1·))` where the counts come from the whole
    * corpus. Repetitive boilerplate scores high (its bigrams dominate
    * the corpus), rare/garbled text scores low — the ranking signal
    * perplexity filtering sorts on. Docs with < 2 tokens have no
    * bigrams and are absent from the output.
    *
    * Scale shape: bigrams come from `arrays_zip(slice, slice)` —
    * ordinary codegen'd expressions, NOT higher-order lambdas (the
    * round-9 interpreted-HOF trap). The corpus-scale bigram stream
    * crosses the wire ONCE: the first aggregation collapses it to
    * per-doc distinct-bigram counts `(id, bigram) → c` with map-side
    * combine, and every later stage — the two model count tables, the
    * model self-join, the scored probe join — runs at distinct-bigram
    * or vocabulary cardinality. All three consumers of that first
    * aggregate hang off the SAME exchange subtree, so Spark's
    * ReuseExchange executes the explode + shuffle map side once. The
    * per-doc average over occurrences is recovered exactly as the
    * count-weighted average over distinct bigrams (Σc·lp / Σc). A
    * stopword bigram is a hot key on the probe side — AQE's skew-join
    * split is the guard, the model side arrives pre-combined. Exact
    * integer counts, one double division and one `ln` per distinct
    * bigram — engine-exact at the oracle's 6dp canonicalization. */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.sparkSession.sparkContext.defaultParallelism
    val t = split(col(textCol), " ")
    // count/join keys are 64-bit fingerprints, not token strings —
    // fixed 8-byte keys beat variable strings for realistic
    // vocabularies (measured NEUTRAL on this fixture's 2-5-char
    // synthetic tokens on the pre-collapse shape, 42.2 vs 41.5 s at
    // 10⁶ — the win scales with token length). Same fingerprint trade
    // as every shingle path:
    // ~vocab²/2⁶⁴ collision odds, and the DuckDB oracle compares the
    // REAL string model so a collision would surface as a hash
    // mismatch at fixture scale.
    val bi = docs.repartition(n, col(idCol))
      .select(col(idCol),
        explode(arrays_zip(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1)))
          .as("bg"))
      .select(col(idCol),
        xxhash64(col("bg")("0")).as("h1"),
        xxhash64(col("bg")("0"), col("bg")("1")).as("h12"))
    // collapse the occurrence stream to per-doc distinct-bigram counts
    // BEFORE anything else touches it: this is the only corpus-scale
    // shuffle, and its exchange subtree is shared by all three
    // downstream consumers (ReuseExchange ⇒ one explode, one map side).
    // h1 rides along (it is a function of h12 — same w1) so the model
    // tables never re-touch the corpus.
    val bic = bi.groupBy(col(idCol), col("h12"), col("h1"))
      .agg(count(lit(1)).as("c"))
    val c2 = bic.groupBy(col("h12"), col("h1")).agg(sum(col("c")).as("c2"))
    val c1 = bic.groupBy(col("h1")).agg(sum(col("c")).as("c1"))
    val model = c2.join(c1, Seq("h1"))
      .select(col("h12"), log(col("c2") / col("c1")).as("lp"))
    // avg over occurrences ≡ count-weighted avg over distinct bigrams
    bic.join(model, Seq("h12"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_bigrams"),
        (sum(col("c") * col("lp")) / sum(col("c"))).as("avg_logprob"))
  }

  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    // grams are consumed ONLY through equality (distinct counts /
    // occurrence counts), so they ride as native 64-bit fingerprints
    // ([[Dedup.shingleHash64]], keepPartial = false ≡ the old
    // `when(size >= n)` guard) — the string-building
    // transform/concat_ws/slice chain ran interpreted per window and
    // dominated this operator's stages under thread sampling
    def grams(n: Int) = Dedup.shingleHash64(toks, n, keepPartial = false)

    // spread first: callers hand this survivors-of-a-join frames that
    // AQE has often coalesced to ONE partition, and this operator's
    // result is usually a broadcast-subquery build — without the spread
    // the whole gram explode runs on a single thread
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col(idCol))

    // row-local tier: distinct fraction needs no occurrence counts
    val local = spread.select(
      col(idCol).as("id"),
      size(grams(3)).cast("long").as("n_3grams"),
      size(array_distinct(grams(3))).cast("long").as("d3"))

    // counting tier: per-gram occurrences, then per-doc rollup
    val counts = spread
      .select(col(idCol).as("id"), explode(grams(2)).as("g"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(
        sum(col("c")).as("n_2grams"),
        count(lit(1)).as("d2"),
        max(col("c")).as("top2"))

    local.join(counts, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_2grams"), lit(0L)).as("n_2grams"),
        when(coalesce(col("n_2grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(lit(1.0) - col("d2").cast("double") / col("n_2grams"), 6))
          .as("dup_2gram_frac"),
        when(coalesce(col("n_2grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("top2").cast("double") / col("n_2grams"), 6))
          .as("top_2gram_share"),
        col("n_3grams"),
        when(col("n_3grams") === 0, lit(0.0))
          .otherwise(round(lit(1.0) - col("d3").cast("double") / col("n_3grams"), 6))
          .as("dup_3gram_frac"))
  }

  /** Per-document top term by tf-idf (ln(N/df)); ties broken by term. */
  def tfidfTopTerm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
    val tf = toks.groupBy("id", "tok").agg(count(lit(1)).as("tf"))
    val df = toks.select("id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("tok"))
    tf.join(df, "tok")
      .withColumn("score", col("tf") * log(lit(n.toDouble) / col("df")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("tok").as("top_term"), round(col("score"), 6).as("score"))
  }

  /** The corpus n-gram occurrence stream: one row per token window,
    * carrying the display string (`gram`) and a 64-bit key (`h`). The
    * key is the native [[graft.functions.ShingleHash64Expr]] window
    * fingerprint RE-DERIVED from the gram string itself (an n-token
    * string has exactly one keepPartial window, and tokens cannot
    * contain the separator, so the gram round-trips to the same token
    * sequence — the fingerprint is BIT-IDENTICAL to the one the sketch
    * pass hashes out of the full document, empty tokens included).
    * Deriving h post-explode keeps the zip binary-stable: zipping the
    * fingerprint array as a third element measured 31–66 s CPU swings
    * on the 10⁶-doc probe stage where this two-array shape holds ~25 s.
    * Entirely row-local codegen: the window axis is `arrays_zip` over n
    * shifted `slice`s of the one tokens array — ordinary expressions,
    * NOT higher-order lambdas (the round-9 interpreted-HOF trap). Docs
    * with fewer than n tokens yield no rows (`greatest(len-n+1, 0)`-
    * length slices zip to empty); null text yields a null zip, which
    * `explode` drops. */
  private def ngramStream(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val t = split(col(textCol), " ")
    val win = greatest(size(t) - (n - 1), lit(0))
    val z = arrays_zip((0 until n).map(i => slice(t, lit(i + 1), win)): _*)
    val parts = (0 until n).map(i => col("g")(i.toString))
    docs
      .select(explode(z).as("g"))
      .select(concat_ws(" ", parts: _*).as("gram"))
      .withColumn("h",
        element_at(Dedup.shingleHash64(col("gram"), n, keepPartial = true), 1))
  }

  /** Exact corpus-wide frequent n-grams: every n-gram with at least
    * `minCount` occurrences, with its exact count. One hash-agg shuffle
    * whose map side combines per-partition gram counts — correct at any
    * scale, but the shuffle carries every DISTINCT n-gram in the corpus
    * (billions of rows at 100 TB). [[frequentNgrams]] is the
    * result-identical scale form; this is its oracle/fallback. */
  def frequentNgramsExact(
      docs: DataFrame, textCol: String, n: Int = 2, minCount: Long = 40): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    ngramStream(docs, textCol, n)
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Corpus-wide frequent n-grams via a COUNT-MIN prefilter — the
    * heavy-hitter statistics pass (top boilerplate phrases, template
    * detection, stop-phrase lists) shaped for a corpus whose distinct
    * n-gram set is too wide to shuffle.
    *
    * Two corpus passes, ZERO corpus-scale shuffle:
    *   1. build a [[graft.functions.CountMin]] sketch of the n-gram key
    *      stream by `treeAggregate` — per-partition sketches merged
    *      cell-wise on the driver tree (deterministic in any order),
    *      `depth×width×8` bytes each (2 MB at the defaults);
    *   2. re-scan, keep only occurrences whose sketch estimate reaches
    *      `minCount` (native codegen probe,
    *      [[graft.functions.CmsAtLeastExpr]]), and exact-count just
    *      those. The count-min estimate is a one-sided OVERestimate, so
    *      the prefilter admits every truly-frequent gram (no false
    *      negatives — the guarantee the law spec pins); sketch
    *      collisions admit some infrequent grams, and the exact
    *      `cnt >= minCount` recount removes them. Result is therefore
    *      IDENTICAL to [[frequentNgramsExact]] — the shuffle after the
    *      prefilter carries only near-frequent grams (map-side combined
    *      to per-partition distinct survivors) instead of the whole
    *      distinct-gram set.
    *
    * Width trades sketch size against prefilter selectivity
    * (error ≈ 2·N_occurrences/width per row, halved per extra row) —
    * at 100 TB widen the sketch (256 MB covers ~10¹¹ occurrences at
    * minCount ≥ 4·10³), it broadcasts once and prunes a billions-row
    * shuffle. */
  def frequentNgrams(
      docs: DataFrame,
      textCol: String,
      n: Int = 2,
      minCount: Long = 40,
      width: Int = 1 << 16,
      depth: Int = 4): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = docs.sparkSession
    val g = ngramStream(docs, textCol, n)
    // The sketch pass runs the FUSED-string fingerprint path (no regex
    // split, no token array, no gram struct — the same native shape
    // whose stability the decon/shingle tiers are built on) and folds
    // each partition with a tight primitive loop over InternalRows.
    // Both a TypedImperativeAggregate build and an `.rdd`
    // treeAggregate were measured first at 10⁶ docs and rejected: each
    // put an interpreted, allocating step on the 43M-occurrence update
    // path and carried the known JIT-fragility (21→57 s CPU swings of
    // the identical stage across same-JVM reps; BENCH_LOCAL round-10).
    val keys = docs.select(explode(
      Dedup.shingleHash64(col(textCol), n, keepPartial = false)).as("h"))
    val sketches = keys.queryExecution.toRdd.mapPartitions { it =>
      val c = new graft.functions.CountMin(width, depth)
      while (it.hasNext) c.add(it.next().getLong(0))
      Iterator.single(c)
    }
    val cms = if (sketches.getNumPartitions == 0)
      new graft.functions.CountMin(width, depth)
    else sketches.treeReduce((a, b) => a.merge(b))
    val bc = spark.sparkContext.broadcast(cms)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val hot = ColumnBridge.column(graft.functions.CmsAtLeastExpr(
      ColumnBridge.expression(col("h")), bc, minCount))
    g.filter(hot)
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Greedy contiguous SEQUENCE PACKING into fixed token-budget training
    * windows — the pretraining step that turns a shuffled document
    * stream into dense context-window batches. Documents are dealt into
    * `nshards` independent streams (id modulo — placement only needs
    * balance), shuffled within each stream by a cross-engine hash key
    * (md5 of the id, so DuckDB oracles the full assignment), and packed
    * by running token count: window = floor(tokens_before / budget).
    * A document straddling a budget boundary stays in the window where
    * it started (the pack-then-truncate-at-the-consumer convention), so
    * windows can run over by at most one document's tail.
    *
    * Scale shape: there is NO global sort — each shard's running sum is
    * an independent window partition, so parallelism = nshards (set it
    * to cores × a few at cluster scale; the fixture default keeps the
    * oracle's window count readable). Token counts are whitespace
    * counts, matching every other token-budget operator here. */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      budget: Int = 256,
      nshards: Int = 8): DataFrame = {
    require(budget > 0 && nshards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"),
        pmod(col(idCol), lit(nshards)).cast("int").as("shard"),
        md5(concat(lit("pack#"), col(idCol).cast("string"))).as("__k"))
      .withColumn("win_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / budget)
          .cast("long"))
      .select(col(idCol), col("shard"), col("win_id"), col("n_tokens"))
  }

  /** Temperature-weighted MIXTURE SAMPLING — per-domain quotas
    * proportional to n^(1/2) (the multilingual/multi-domain "temperature"
    * rebalance that upsamples small domains relative to raw frequency):
    * quota(source) = floor(sqrt(n_source)) · `scale`, and the kept rows
    * are the first `quota` documents of each source in deterministic
    * hash order. floor∘sqrt over an integer-valued double is a single
    * correctly-rounded IEEE op in both engines, so the quotas — and
    * therefore the exact survivor set — cross-engine match.
    *
    * Scale shape — the distributed exact-rank pattern: a plain
    * `row_number() OVER (PARTITION BY source ORDER BY hash)` puts an
    * entire domain in ONE task, which is exactly the skew a 100 TB
    * corpus (few, huge domains) breaks on. Instead the hash key's first
    * byte buckets every source into 256 slices that PRESERVE hash
    * order, per-(source, bucket) counts (a tiny two-column aggregate)
    * turn into per-bucket rank offsets via a window over ≤ 256·|sources|
    * rows, and the per-row rank is offset + row_number within the
    * (source, bucket) slice — 256-way parallel per domain, same exact
    * global hash-order rank. The oracle states the semantics directly
    * with the single-window form; this is a physical-plan divergence
    * only, pinned equal by the hash gate. */
  /** EPOCH-WEIGHTED dataset repetition — the other half of mixture
    * construction: where [[temperatureSample]] decides how much of each
    * source to KEEP, this materializes fractional repetition ("Wikipedia
    * for 2.5 epochs, CommonCrawl for 0.8") as explicit copies. Every doc
    * of a source with weight w emits `floor(w)` copies plus one more iff
    * its deterministic hash-fraction < frac(w) — so per-doc copies are
    * always floor(w) or ceil(w), expected copies = w·n exactly, and the
    * choice of WHICH docs get the extra epoch is a fixed pseudorandom
    * slice, not a biased prefix. Entirely row-local (one `sequence`
    * explode, no shuffle); md5-derived uniforms make the whole expansion
    * cross-engine exact, so the query is fully DuckDB-oracled. */
  def epochMix(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      weights: Map[String, Double],
      default: Double = 1.0): DataFrame = {
    require(default >= 0 && weights.values.forall(_ >= 0), "weights must be >= 0")
    val w = weights.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(col(srcCol) === k, lit(v)).otherwise(acc)
    }
    // uniform [0,1): first 32 md5 bits / 2^32 — both engines parse the
    // same 8 hex chars of the same digest, so the coin flip is exact
    val h01 = conv(substring(
        md5(concat(lit("epoch#"), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    docs
      .select(col(idCol), col(srcCol))
      .withColumn("__n",
        (floor(w) + when(h01 < w - floor(w), 1).otherwise(0)).cast("int"))
      .filter(col("__n") > 0)
      .select(col(idCol), col(srcCol),
        explode(sequence(lit(0L), (col("__n") - 1).cast("long"))).as("copy_idx"))
  }

  def temperatureSample(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      scale: Int = 10): DataFrame = {
    require(scale > 0)
    val keyed = docs.select(col(idCol), col(srcCol),
      md5(concat(lit("mix#"), col(idCol).cast("string"))).as("__k"))
      .withColumn("__b", conv(substring(col("__k"), 1, 2), 16, 10).cast("int"))
    // per-(source, bucket) counts: ≤ 256·|sources| rows — the frame the
    // offsets AND the quotas both derive from, one narrow aggregate
    val counts = keyed.groupBy(col(srcCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col(srcCol))
    val meta = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__quota",
        (floor(sqrt(sum(col("__c")).over(wTot).cast("double"))) * scale).cast("long"))
      .select(col(srcCol), col("__b"), col("__off"), col("__quota"))
    val wRk = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol), col("__b")).orderBy(col("__k"), col(idCol))
    keyed
      .join(broadcast(meta), Seq(srcCol, "__b"))
      .withColumn("__rk", col("__off") + row_number().over(wRk))
      .filter(col("__rk") <= col("__quota"))
      .select(col(idCol), col(srcCol))
  }
}
