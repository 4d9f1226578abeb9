package graft.operators

import graft.sources.Multimodal
import graft.{Checkpoints, Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §2b group L — the LLM training-data pipeline operators, as
  * declared queries. Oracle-checkable ones (integer/exact-ratio math)
  * carry DuckDB SQL; the hash-seeded ones (minhash LSH, simhash, LSH
  * ANN) are rows-only here and exactness-checked in DedupSpec /
  * SimilaritySpec against brute-force oracles.
  */
object LlmQueries {

  /** L: exact dedup by hash aggregation — corpus doubled, so every text
    * has exactly 2 copies and dedup provably collapses them. */
  val l1ExactDedup = Q(
    "l1_exact_dedup",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.exact(docs.unionAll(docs), "text", "doc_id")
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
            FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents) t
            GROUP BY text ORDER BY doc_id"""))

  /** L: MinHash + LSH near-dup detection, declared in its VERIFIED form
    * ([[Dedup.minhashLshVerified]] — band collisions propose, exact
    * n-gram Jaccard disposes): the exact scores make the output
    * DuckDB-oracle-able with the same all-pairs SQL as l4, so the
    * oracle gates the banding stage's RECALL at the value level (a
    * pair the bands never collide is a missing row). The est-only form
    * stays the bench shape and DedupSpec keeps its recall bounds. */
  val l2MinhashLsh = Q(
    "l2_minhash_lsh",
    (s, dir) => Dedup.minhashLshVerified(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2)
            SELECT id_a, id_b, round(ni * 1.0 / (na.n + nb.n - ni), 6) AS jaccard
            FROM inter
            JOIN sizes na ON id_a = na.doc_id
            JOIN sizes nb ON id_b = nb.doc_id
            WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5
            ORDER BY id_a, id_b"""),
    bench = Some((s, dir) =>
      Dedup.minhashLsh(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("id_a"), col("id_b"))))

  /** L: SimHash fingerprints + near-dup pairs by Hamming distance. */
  val l3Simhash = Q(
    "l3_simhash",
    (s, dir) => Dedup.simhashPairs(Tables(s, dir, "documents"), "doc_id", "text",
      maxHamming = 12)
      .orderBy(col("id_a"), col("id_b")),
    None)

  /** L: exact 3-gram Jaccard over shingle-join candidates — integer
    * set sizes, one division: engine-exact, fully oracle-checked. */
  val l4NgramJaccard = Q(
    "l4_ngram_jaccard",
    (s, dir) => Dedup.ngramJaccard(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2)
            SELECT id_a, id_b, round(ni * 1.0 / (na.n + nb.n - ni), 6) AS jaccard
            FROM inter
            JOIN sizes na ON id_a = na.doc_id
            JOIN sizes nb ON id_b = nb.doc_id
            WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5
            ORDER BY id_a, id_b"""))

  /** L: exact cosine top-3 neighbors per vector — integer-quantized
    * dot/norms so the DuckDB oracle is bit-identical. */
  val l5CosineTopk = Q(
    "l5_cosine_topk",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb, 3).orderBy(col("qid"), col("rank"))
    },
    Some("""WITH scored AS (
              SELECT e1.vec_id AS qid, e2.vec_id AS nid,
                     (list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                           * CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) * 1.0)
                     / sqrt((list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                             * CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000) AS BIGINT)))
                        * list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                             * CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000) AS BIGINT)))) * 1.0)
                     AS cos
              FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id != e2.vec_id),
            ranked AS (
              SELECT qid, nid, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
              FROM scored)
            SELECT qid, rank, nid, round(cos, 6) AS cos
            FROM ranked WHERE rank <= 3 ORDER BY qid, rank"""))

  /** L: embedding-cosine near-duplicate pairs (threshold on exact
    * quantized cosine — the "same content, different encode" detector).
    *
    * Declared at τ = 0.8, the regime where LSH banding genuinely prunes
    * (SCALE.md has the retention math); the fixture's organic pair
    * distribution tops out near 0.5, so the corpus is DOUBLED with
    * offset ids — every vector gains one exact duplicate at cosine 1.0,
    * which is precisely the near-dup population this operator exists to
    * catch. Identical vectors have identical band signatures, so recall
    * on the planted pairs is exactly 1 (not probabilistic) and the
    * all-pairs DuckDB oracle hash-matches deterministically. Plan shape:
    * narrow id-pair equi-join on band keys, vectors re-attached by key,
    * NO corpus broadcast and NO nested-loop join (ExplainSpec pins
    * that). The low-threshold (τ=0.4) form stays a SimilaritySpec
    * stress case — see Similarity.cosineNearDup's docstring for why
    * full-recall banding below ~0.5 is intrinsically near-quadratic. */
  val l6CosineNearDup = Q(
    "l6_cosine_neardup",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val doubled = emb.select(col("vec_id"), col("embedding")).unionAll(
        emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      // miss = 1e-7 here (not the production 1e-2 default): at fixture
      // scale the stricter budget is ~200 extra hyperplanes, and it pins
      // the all-pairs DuckDB oracle hash-match far below any flake risk
      Similarity.cosineNearDup(doubled, "vec_id", "embedding", threshold = 0.8,
          miss = 1e-7)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH all_emb AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000, embedding FROM embeddings),
            scored AS (
              SELECT e1.vec_id AS id_a, e2.vec_id AS id_b,
                     (list_sum(list_transform(generate_series(1, 64),
                        i -> CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                           * CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000) AS BIGINT))) * 1.0)
                     / sqrt((list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                             * CAST(round(CAST(e1.embedding[i] AS DOUBLE) * 1000) AS BIGINT)))
                        * list_sum(list_transform(generate_series(1, 64),
                          i -> CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                             * CAST(round(CAST(e2.embedding[i] AS DOUBLE) * 1000) AS BIGINT)))) * 1.0)
                     AS cos
              FROM all_emb e1 JOIN all_emb e2 ON e1.vec_id < e2.vec_id)
            SELECT id_a, id_b, round(cos, 6) AS cos
            FROM scored WHERE cos >= 0.8
            ORDER BY id_a, id_b"""))

  /** L: per-document quality stats — integer counts + exact ratios. */
  val l7TextQuality = Q(
    "l7_text_quality",
    (s, dir) => TextAnalysis.qualityStats(Tables(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_chars_m"), col("n_tokens"), col("n_punct"),
        col("n_nonalpha"), col("n_stop"), col("avg_tok_len"), col("stop_ratio"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
                   length(text) AS n_chars_m,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                   length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
                   length(text) - length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS n_nonalpha,
                   CAST(len(list_filter(string_split(text, ' '),
                        x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) AS INT) AS n_stop,
                   round((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                         / len(string_split(text, ' ')), 6) AS avg_tok_len,
                   round(len(list_filter(string_split(text, ' '),
                        x -> list_contains(['the','a','of','and','to','in','is','on','for','with'], x))) * 1.0
                         / len(string_split(text, ' ')), 6) AS stop_ratio
            FROM documents ORDER BY doc_id"""))

  /** L: language ID heuristic — stopword-hit scores are integer counts
    * and the argmax tie order is pinned (en,es,de,fr,zh), so the whole
    * heuristic is reproducible in SQL and oracle-checked. */
  val l8LangId = Q(
    "l8_langid",
    (s, dir) => Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"), col("lang"))
      .orderBy(col("doc_id")),
    Some("""WITH scores AS (
              SELECT doc_id, lang,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) AS s_en,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains(['el','la','de','que','y','en','un','los','se','por'], x))) AS s_es,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains(['der','die','und','das','ist','ein','zu','den','mit','von'], x))) AS s_de,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains(['le','la','de','et','un','les','des','est','en','que'], x))) AS s_fr,
                     len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains(['的','是','在','了','和','有','我','不','这','为'], x))) AS s_zh
              FROM documents)
            SELECT doc_id,
                   CASE WHEN s_en > 0 AND s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                        WHEN s_es > 0 AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
                        WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                        WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
                        WHEN s_zh > 0 THEN 'zh'
                        ELSE 'und' END AS lang_pred,
                   lang
            FROM scores ORDER BY doc_id"""))

  /** L: FNV-1a content fingerprint (spec-checked determinism). */
  val l9Fingerprint = Q(
    "l9_fingerprint",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id")),
    None)

  /** L: tf-idf top term per document (ln is libm-rounded identically on
    * identical doubles; ties break on term). */
  val l10Tfidf = Q(
    "l10_tfidf_topterm",
    (s, dir) => TextAnalysis.tfidfTopTerm(Tables(s, dir, "documents"), "doc_id", "text")
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
                 tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
                 df AS (SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) t GROUP BY tok),
                 n AS (SELECT count(*) AS n FROM documents),
                 scored AS (SELECT doc_id, tok, tf * ln(n.n * 1.0 / df) AS score
                            FROM tf JOIN df USING (tok), n),
                 ranked AS (SELECT doc_id, tok, score,
                                   row_number() OVER (PARTITION BY doc_id
                                                      ORDER BY score DESC, tok) AS rn
                            FROM scored)
            SELECT doc_id, tok AS top_term, round(score, 6) AS score
            FROM ranked WHERE rn = 1 ORDER BY doc_id"""))

  /** L: multimodal binary payload plumbing — pack → decode-stub →
    * metadata; md5 proves byte-exact binary round-trip in both engines. */
  val l11Multimodal = Q(
    "l11_multimodal",
    (s, dir) => {
      val packed = Multimodal.pack(Tables(s, dir, "documents"), "text")
      Multimodal.decodeStub(packed)
        .select(col("doc_id"), col("media.n_bytes").as("n_bytes"),
          md5(col("media.content")).as("content_md5"),
          col("width"), col("height"), col("byte_sum"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
                   octet_length(CAST(text AS BLOB)) AS n_bytes,
                   md5(text) AS content_md5,
                   16 + octet_length(CAST(text AS BLOB)) % 64 AS width,
                   16 + (octet_length(CAST(text AS BLOB)) // 64) % 64 AS height,
                   CAST(list_sum(list_transform(generate_series(1, CAST(octet_length(CAST(text AS BLOB)) AS INT)),
                        i -> ascii(substring(text, i, 1)))) AS BIGINT) AS byte_sum
            FROM documents ORDER BY doc_id"""))

  /** L: regex ("BPE-ish") tokenization stats — class-based patterns that
    * mean the same thing in Java regex and RE2, so DuckDB oracles it. */
  val l12TokenRegex = Q(
    "l12_token_regex",
    (s, dir) => Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("n_alpha"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_num"),
        size(expr("regexp_extract_all(text, '[^a-z0-9 ]+', 0)")).as("n_other"),
        size(expr("regexp_extract_all(text, '[a-z]{8,}', 0)")).as("n_long_words"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha,
                   CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_num,
                   CAST(len(regexp_extract_all(text, '[^a-z0-9 ]+')) AS INT) AS n_other,
                   CAST(len(regexp_extract_all(text, '[a-z]{8,}')) AS INT) AS n_long_words
            FROM documents ORDER BY doc_id"""))

  /** Id offset for the planted-duplicate recall gates: the corpus is
    * DOUBLED with offset ids (every vector gains one exact copy), the
    * ANN path under test runs queries = originals against the doubled
    * corpus, and the gate asserts each query's planted partner
    * (`qid + PlantOffset`, cosine exactly 1.0) lands in its top-k.
    * DETERMINISTIC, not probabilistic: an identical vector has an
    * identical band signature / cell assignment, so it is always a
    * candidate, and the fixture has no organic duplicate vectors
    * (verified per SF), so the partner is the unique non-self cosine-1
    * neighbor — rank 1 under the exact re-rank every ANN path shares.
    * A miss can only mean the candidate stage lost a sure candidate or
    * the re-rank mis-scored it: exactly the failures an ANN gate must
    * catch. Far above any fixture vec_id, so planted ids never collide. */
  private val PlantOffset = 100000000L

  /** The planted-recall invariant query: `(qid, found)` for every
    * original vector, `found` ⇔ the planted partner is in the query's
    * top-k under `topk(queries, doubledCorpus)`. Left join from the
    * corpus base so a query the ANN path DROPPED entirely reads
    * `found = false` (red), never disappears. DuckDB oracle:
    * `SELECT vec_id AS qid, true AS found FROM embeddings`. */
  private def plantedRecall(
      s: org.apache.spark.sql.SparkSession, dir: String,
      topk: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val corpus = emb.unionByName(
      emb.select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding")))
    val hit = topk(emb, corpus)
      .filter(col("nid") === col("qid") + PlantOffset)
      .select(col("qid")).distinct().withColumn("found", lit(true))
    emb.select(col("vec_id").as("qid"))
      .join(hit, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("found"), lit(false)).as("found"))
      .orderBy(col("qid"))
  }

  private val PlantedRecallOracle =
    "SELECT vec_id AS qid, CAST(1 AS BOOLEAN) AS found FROM embeddings ORDER BY vec_id"

  /** L: LSH ANN top-3 — the similarity-search SCALE path, declared. The
    * plan is band-bucket equi-join candidates + exact cosine re-rank:
    * O(bucket) work per query, no corpus broadcast, no nested-loop join
    * (ExplainSpec pins the plan; SimilaritySpec pins recall vs l5's
    * brute-force oracle). Seeded hyperplanes aren't SQL-expressible, so
    * the DECLARED form is the [[plantedRecall]] invariant — identical
    * band signatures make the planted partner a sure candidate, so the
    * gate is deterministic and DuckDB-checkable; the benchmark times the
    * bare self-join top-k a deployment runs. */
  val l13LshTopk = Q(
    "l13_lsh_topk",
    (s, dir) => plantedRecall(s, dir, (q, c) => Similarity.lshTopK(q, c, 3)),
    Some(PlantedRecallOracle),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb, 3).orderBy(col("qid"), col("rank"))
    }))

  /** L: IVF ANN top-3 — coarse-quantizer scale path (stride centroids,
    * cell equi-join, exact re-rank). Declared as the [[plantedRecall]]
    * invariant: an identical vector gets an identical cell assignment,
    * so the partner sits in the query's first probed cell — a
    * deterministic gate on the candidate join + re-rank. Bench times
    * the bare self-join form. */
  val l14IvfTopk = Q(
    "l14_ivf_topk",
    (s, dir) => plantedRecall(s, dir, (q, c) => Similarity.ivfTopK(q, c, 3)),
    Some(PlantedRecallOracle),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb, 3).orderBy(col("qid"), col("rank"))
    }))

  /** L: video-frame sampling plumbing over binary payloads — every
    * stride-th byte window, oracled in DuckDB via substring windows. */
  val l15FrameSample = Q(
    "l15_frame_sample",
    (s, dir) => {
      val packed = Multimodal.pack(
        Tables(s, dir, "documents").filter(col("doc_id") < 200), "text")
      Multimodal.frameSample(packed, frameBytes = 32, stride = 64)
        .select(col("doc_id"), col("frame_idx"),
          md5(col("frame_bytes")).as("frame_md5"),
          octet_length(col("frame_bytes")).as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH frames AS (
              SELECT doc_id, i AS frame_idx,
                     substring(text, i * 64 + 1, 32) AS frame
              FROM documents,
                   LATERAL unnest(generate_series(0,
                     greatest(octet_length(CAST(text AS BLOB)) // 64 - 1, 0))) t(i)
              WHERE doc_id < 200)
            SELECT doc_id, frame_idx, md5(frame) AS frame_md5,
                   octet_length(CAST(frame AS BLOB)) AS frame_len
            FROM frames ORDER BY doc_id, frame_idx"""))

  /** L: winnowing fingerprints — the position-robust document
    * fingerprint (MOSS scheme): shared substrings of length >= w+k-1
    * guarantee shared fingerprints (DedupSpec pins the law). Wrapping
    * 64-bit hash arithmetic isn't SQL-expressible → rows-only check;
    * the aggregate projection keeps the output compact and
    * order-invariant. */
  val l16Winnow = Q(
    "l16_winnow",
    (s, dir) => Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.winnow()(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        aggregate(col("fps"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("fp_xor"))
      .orderBy(col("doc_id")),
    None)

  /** L: benchmark decontamination — drop corpus docs sharing any 8-gram
    * with the held-out "benchmark" slice (doc_id % 50 == 0, ~2% of the
    * corpus). One shingle-key equi-join + one anti-join; nothing
    * pairwise (see Dedup.decontaminate). Oracle reproduces the n-gram
    * overlap in SQL, so the survivor set is hash-checked exactly. */
  val l17Decontaminate = Q(
    "l17_decontaminate",
    (s, dir) => {
      val all = Tables(s, dir, "documents")
      val bench = all.filter(col("doc_id") % 50 === 0)
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      Dedup.decontaminate(corpus, bench, "doc_id", "text", shingleN = 8)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 7, 1)),
                                 i -> array_to_string(t[i:i+7], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 bench AS (SELECT DISTINCT s FROM sets WHERE doc_id % 50 = 0),
                 bad AS (SELECT DISTINCT doc_id FROM sets
                         WHERE doc_id % 50 != 0 AND s IN (SELECT s FROM bench))
            SELECT doc_id FROM documents
            WHERE doc_id % 50 != 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
            ORDER BY doc_id"""))

  /** L: overlapping token chunking (64-token windows, stride 48) — the
    * RAG/pretraining windowing pass, entirely row-local (see
    * TextAnalysis.chunk). md5 of each chunk proves byte-exact window
    * boundaries against DuckDB's list slicing. */
  val l18Chunk = Q(
    "l18_chunk",
    (s, dir) => TextAnalysis.chunk(
      Tables(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text")
      .select(col("doc_id"), col("chunk_idx"), col("n_tok"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents WHERE doc_id < 200),
                 chunks AS (
                   SELECT doc_id, i AS chunk_idx,
                          array_to_string(t[i*48+1 : i*48+64], ' ') AS chunk,
                          len(t[i*48+1 : i*48+64]) AS n_tok
                   FROM toks,
                        LATERAL unnest(generate_series(0, (len(t)-1)//48)) u(i))
            SELECT doc_id, chunk_idx, n_tok, md5(chunk) AS chunk_md5
            FROM chunks ORDER BY doc_id, chunk_idx"""))

  /** L: deterministic train/val/test assignment by content hash — the
    * split that stays stable under re-partitioning, re-ordering, and
    * incremental corpus growth (hash the CONTENT, never the row
    * position). First md5 nibble: 0-b train (12/16), c-d val, e-f test.
    * md5 is byte-identical in both engines, so the full assignment is
    * hash-checked row by row. */
  val l19HashSplit = Q(
    "l19_hash_split",
    (s, dir) => {
      val nibble = substring(md5(col("text")), 1, 1)
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          when(nibble <= "b", "train")
            .when(nibble <= "d", "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
                   CASE WHEN substr(md5(text), 1, 1) <= 'b' THEN 'train'
                        WHEN substr(md5(text), 1, 1) <= 'd' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id"""))

  /** L: redaction — the text-TRANSFORM pass (every other text query
    * only measures): digit runs masked with '#', md5 proving the
    * rewritten bytes match across engines (Java regex and RE2 agree on
    * these class-based patterns, as in l12). */
  val l20Redact = Q(
    "l20_redact",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"),
        md5(regexp_replace(col("text"), "[0-9]+", "#")).as("redacted_md5"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).as("n_digits"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
                   md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS redacted_md5,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
            FROM documents ORDER BY doc_id"""))

  /** L: int8 scalar quantization of embeddings — the storage-compression
    * tier under an ANN index (4× smaller vectors; dequantize as
    * code·m/127). Codes are round-half-up from ops with identical IEEE
    * semantics in both engines, so the per-vector code statistics are
    * hash-checked exactly; SimilaritySpec bounds the dequantized-cosine
    * error against the exact cosine. */
  val l21Quantize = Q(
    "l21_quantize",
    (s, dir) => {
      import graft.functions.VectorFunctions._
      Tables(s, dir, "embeddings")
        .withColumn("m", maxAbs(col("embedding")))
        .withColumn("codes", int8Codes(col("embedding"), col("m")))
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          array_min(col("codes")).as("code_min"),
          array_max(col("codes")).as("code_max"),
          aggregate(col("codes"), lit(0L), (acc, x) => acc + x).as("code_sum"),
          aggregate(col("codes"), lit(0L), (acc, x) => acc + abs(x)).as("code_l1"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH q AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
              FROM embeddings),
            c AS (
              SELECT vec_id, len(embedding) AS n_dims,
                     list_transform(embedding, x -> CASE WHEN m = 0 THEN CAST(0 AS BIGINT)
                       ELSE CAST(floor(CAST(x AS DOUBLE) * 127 / m + 0.5) AS BIGINT) END) AS codes
              FROM q)
            SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims,
                   list_min(codes) AS code_min, list_max(codes) AS code_max,
                   CAST(list_sum(codes) AS BIGINT) AS code_sum,
                   CAST(list_sum(list_transform(codes, x -> abs(x))) AS BIGINT) AS code_l1
            FROM c ORDER BY vec_id"""))

  /** L: IVF ANN with the candidate tier running over int8 SQ codes and
    * an exact float re-rank — the end-to-end composition of l14 and
    * l21. The candidate stage (centroid pick, cell assignment, probe,
    * cell equi-join) touches ONLY the 4×-compressed codes; floats are
    * re-attached per candidate for the exact re-rank, so reported
    * scores are exact cosine. Deterministic (stride centroids,
    * round-half-up codes) but not SQL-expressible, so the DECLARED form
    * is the [[plantedRecall]] invariant — identical vectors get
    * identical int8 codes, hence identical cells, a deterministic
    * DuckDB-checkable gate; recall bounds vs brute force stay in
    * SimilaritySpec and bench times the bare self-join form. */
  val l22IvfInt8 = Q(
    "l22_ivf_int8_topk",
    (s, dir) => plantedRecall(s, dir, (q, c) => Similarity.ivfTopKInt8(q, c, 3)),
    Some(PlantedRecallOracle),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopKInt8(emb, emb, 3).orderBy(col("qid"), col("rank"))
    }))

  /** L: repetition signals — the Gopher-style boilerplate/degeneration
    * filter (duplicate-2-gram fraction, top-2-gram share, duplicate-
    * 3-gram fraction per document). Exact integer counts with single
    * divisions; the DuckDB oracle reproduces the gram construction with
    * list slicing, so every ratio hash-matches. See
    * TextAnalysis.repetitionSignals for the two execution shapes
    * (row-local distinct-fraction vs explode+hash-agg occurrence
    * counts). */
  val l23Repetition = Q(
    "l23_repetition",
    (s, dir) => TextAnalysis.repetitionSignals(
      Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 g2 AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+1], ' '))) AS g
                        FROM toks WHERE len(t) >= 2),
                 cnt AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
                 agg2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
                                 count(*) AS d2, max(c) AS top2
                          FROM cnt GROUP BY doc_id),
                 loc3 AS (SELECT doc_id,
                                 CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n3,
                                 CASE WHEN len(t) >= 3 THEN len(list_distinct(
                                   list_transform(generate_series(1, len(t) - 2),
                                     i -> array_to_string(t[i:i+2], ' ')))) ELSE 0 END AS d3
                          FROM toks)
            SELECT l.doc_id,
                   COALESCE(a.n2, 0) AS n_2grams,
                   CASE WHEN COALESCE(a.n2, 0) = 0 THEN 0.0
                        ELSE round(1.0 - CAST(a.d2 AS DOUBLE) / a.n2, 6) END AS dup_2gram_frac,
                   CASE WHEN COALESCE(a.n2, 0) = 0 THEN 0.0
                        ELSE round(CAST(a.top2 AS DOUBLE) / a.n2, 6) END AS top_2gram_share,
                   l.n3 AS n_3grams,
                   CASE WHEN l.n3 = 0 THEN 0.0
                        ELSE round(1.0 - CAST(l.d3 AS DOUBLE) / l.n3, 6) END AS dup_3gram_frac
            FROM loc3 l LEFT JOIN agg2 a ON l.doc_id = a.doc_id
            ORDER BY l.doc_id"""))

  /** L: deterministic domain-weighted sampling — mix sources at
    * per-source rates (here 4/16, 8/16, 12/16, 16/16 cycling by source
    * number) by gating on the first md5 nibble of the CONTENT. Like the
    * l19 split, the decision is a pure function of the text: stable
    * under repartitioning, reordering and incremental corpus growth,
    * and identical copies of a document get the same fate everywhere.
    * The nibble threshold is compared as a hex CHARACTER ('4'/'8'/'c',
    * or 'g' = keep-all) — single-char comparisons order identically in
    * both engines, so no hex-to-int conversion is needed. Row-local
    * filter: zero shuffles at any scale; a real deployment would
    * broadcast-join a rates dimension instead of deriving the rate from
    * the source name, which changes nothing about the shape. A source
    * name with NO digits is pinned to keep-all (coalesce to rate slot
    * 3) in both engines: without it Spark's ''::int → null silently
    * drops the row while DuckDB's CAST('' AS INT) raises — a latent
    * engine divergence even though the fixture sources all carry
    * digits. */
  val l24DomainSample = Q(
    "l24_domain_sample",
    (s, dir) => {
      val srcNum = coalesce(
        regexp_extract(col("source"), "([0-9]+)", 1).cast("int"), lit(3))
      val thresh = element_at(
        array(lit("4"), lit("8"), lit("c"), lit("g")), srcNum % 4 + 1)
      Tables(s, dir, "documents")
        .filter(substring(md5(col("text")), 1, 1) < thresh)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source FROM documents
            WHERE substr(md5(text), 1, 1) <
                  CASE COALESCE(TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INT), 3) % 4
                       WHEN 0 THEN '4' WHEN 1 THEN '8' WHEN 2 THEN 'c'
                       ELSE 'g' END
            ORDER BY doc_id"""))

  /** L: SemDedup embedding-cluster dedup over the doubled corpus (every
    * original gains an exact copy at id offset 10⁶). At τ = 0.8 the
    * survivors are EXACTLY the originals: exact copies always share
    * their twin's cell and are dropped by the keep-lowest-id rule, and
    * the fixture's max original-pair cosine is ≤ 0.60 at every sf
    * (verified against numpy ground truth), so no original can be
    * dropped — which is what the oracle pins, end-to-end, including the
    * keep-lowest-id choice. The general mechanism (cluster scoping,
    * boundary-miss semantics, work envelope n·√n) is law-tested in
    * SimilaritySpec. */
  val l25SemDedup = Q(
    "l25_semdedup",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val doubled = emb.unionAll(emb
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      Similarity.semDedup(doubled, "vec_id", "embedding", threshold = 0.8)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    },
    Some("SELECT vec_id FROM embeddings ORDER BY vec_id"))

  /** L: dedup groups — connected components over the l4 n-gram-Jaccard
    * pairs. Near-dup is not transitive, so pair output alone cannot
    * drive deletion; the component (with min-id survivor) is the
    * correct dedup unit. The DuckDB oracle reproduces the same pair
    * construction and closes it with a recursive CTE, so the full
    * (id, comp) partition hash-matches. The closure is star contraction
    * ([[Dedup.connectedComponentsStars]], the production default behind
    * `connectedComponents`): O(log n) alternations on ANY graph shape,
    * so long near-dup chains converge inside the default budget instead
    * of requiring a raised maxIter (the operator still throws loudly if
    * a degenerate input exhausts it). */
  val l26DedupGroups = Q(
    "l26_dedup_groups",
    (s, dir) => Dedup.connectedComponents(
      Dedup.ngramJaccard(Tables(s, dir, "documents"), "doc_id", "text"),
      "id_a", "id_b")
      .orderBy(col("id")),
    Some("""WITH RECURSIVE
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2),
                 pairs AS (SELECT id_a, id_b FROM inter
                           JOIN sizes na ON id_a = na.doc_id
                           JOIN sizes nb ON id_b = nb.doc_id
                           WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5),
                 edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                           UNION
                           SELECT id_b AS u, id_a AS v FROM pairs),
                 reach AS (SELECT u AS id, u AS comp FROM edges
                           UNION
                           SELECT e.v AS id, r.comp
                           FROM reach r JOIN edges e ON e.u = r.id)
            SELECT id, min(comp) AS comp FROM reach GROUP BY id
            ORDER BY id"""))

  /** L: the composed pretraining-data pipeline — the END-TO-END flow a
    * real corpus runs through, chained from the declared operators and
    * hash-checked as ONE query: exact dedup (keep min-id representative)
    * → quality gates (length + token floor) → repetition gate (l23's
    * dup-2-gram fraction) → benchmark decontamination (l17's 8-gram
    * anti-join) → content-hash split (l19) → per-(split, source) doc and
    * token counts. Composition is the point: every stage is row-local or
    * equi-join/hash-agg shaped, so the chain inherits the 100 TB
    * properties of its parts — nothing pairwise, nothing
    * order-dependent, split assignment stable under growth. The oracle
    * replays the identical chain in SQL, so the final aggregate
    * hash-matches only if every intermediate stage agreed. */
  val l27Pipeline = Q(
    "l27_pretrain_pipeline",
    (s, dir) => {
      val all = Tables(s, dir, "documents")
      val bench = all.filter(col("doc_id") % 50 === 0)
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      // materialized once — four downstream branches re-run the
      // whole-text groupBy otherwise (same rationale as l28)
      val reps = Checkpoints.rotate("l27.reps",
        Dedup.exact(corpus, "text", "doc_id")
          .join(corpus.select(col("doc_id"), col("source")), "doc_id"))
      val gated = reps
        .filter(length(col("text")) >= 100 && size(split(col("text"), " ")) >= 20)
        .join(TextAnalysis.repetitionSignals(reps, "doc_id", "text")
          .select(col("doc_id"), col("dup_2gram_frac")), "doc_id")
        .filter(col("dup_2gram_frac") <= 0.3)
      val clean = Dedup.decontaminate(gated, bench, "doc_id", "text", shingleN = 8)
      val nibble = substring(md5(col("text")), 1, 1)
      clean
        .withColumn("split",
          when(nibble <= "b", "train").when(nibble <= "d", "val").otherwise("test"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
        .orderBy(col("split"), col("source"))
    },
    Some("""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 50 != 0),
                 reps AS (SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text),
                 reps_src AS (SELECT r.doc_id, r.text, c.source
                              FROM reps r JOIN corpus c ON r.doc_id = c.doc_id),
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps_src),
                 g2 AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+1], ' '))) AS g
                        FROM toks WHERE len(t) >= 2),
                 cnt AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
                 agg2 AS (SELECT doc_id, sum(c) AS n2, count(*) AS d2
                          FROM cnt GROUP BY doc_id),
                 gated AS (SELECT rs.doc_id, rs.text, rs.source, tk.t
                           FROM reps_src rs
                           JOIN toks tk ON rs.doc_id = tk.doc_id
                           JOIN agg2 a ON rs.doc_id = a.doc_id
                           WHERE length(rs.text) >= 100 AND len(tk.t) >= 20
                             AND round(1.0 - CAST(a.d2 AS DOUBLE) / a.n2, 6) <= 0.3),
                 sh8 AS (SELECT g.doc_id,
                                unnest(list_transform(
                                  generate_series(1, greatest(len(g.t) - 7, 1)),
                                  i -> array_to_string(g.t[i:i+7], ' '))) AS s
                         FROM gated g),
                 bt AS (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents WHERE doc_id % 50 = 0),
                 bench8 AS (SELECT DISTINCT
                                   unnest(list_transform(
                                     generate_series(1, greatest(len(t) - 7, 1)),
                                     i -> array_to_string(t[i:i+7], ' '))) AS s
                            FROM bt),
                 bad AS (SELECT DISTINCT doc_id FROM sh8
                         WHERE s IN (SELECT s FROM bench8)),
                 clean AS (SELECT * FROM gated
                           WHERE doc_id NOT IN (SELECT doc_id FROM bad))
            SELECT CASE WHEN substr(md5(text), 1, 1) <= 'b' THEN 'train'
                        WHEN substr(md5(text), 1, 1) <= 'd' THEN 'val'
                        ELSE 'test' END AS split,
                   source,
                   count(*) AS n_docs,
                   CAST(sum(len(t)) AS BIGINT) AS n_tokens
            FROM clean
            GROUP BY 1, 2 ORDER BY split, source"""))

  /** L: the pretraining pipeline with the NEAR-DUP stage composed in —
    * l27 extended with the collapse the l26 tier exists for. A real
    * pretraining flow dedups by transitive component, not just content
    * hash: after exact dedup, the l4 3-gram-Jaccard pairs are closed
    * into components ([[Dedup.connectedComponents]]) and only the
    * min-id survivor of each component proceeds to the quality gates /
    * decontamination / split. Near-dup is not transitive, so pair
    * output alone cannot drive deletion — the component stage is
    * in-plan, between exact dedup and the gates, exactly where the
    * round-6 verdict placed it. The oracle replays the whole chain
    * including the recursive-CTE closure, so the final aggregate
    * hash-matches only if every stage — including which SURVIVOR each
    * component kept — agreed. */
  /** The l28 chain over an arbitrary documents relation — shared by l28
    * (direct fixture table) and l65 (the same corpus resolved through a
    * PINNED catalog name). `ckKey` keys the materialized exact-dedup
    * checkpoint so distinct call sites never rotate each other's
    * still-live generation. */
  private def pretrainNearDupPipeline(all: DataFrame, ckKey: String): DataFrame = {
    val bench = all.filter(col("doc_id") % 50 === 0)
    val corpus = all.filter(col("doc_id") % 50 =!= 0)
    // materialize the exact-dedup output ONCE: six downstream branches
    // (pair stage, anti-join, quality gates, repetition signals,
    // decontamination, final agg) would each re-run the whole-text
    // groupBy otherwise — measured as most of the query's cost
    val reps = Checkpoints.rotate(ckKey,
      Dedup.exact(corpus, "text", "doc_id")
        .join(corpus.select(col("doc_id"), col("source")), "doc_id"))
    // component collapse: drop every doc whose component label is a
    // smaller id (the survivor is the component min — deterministic).
    // reps is exact-deduped by construction, so the pair stage skips
    // its internal canonicalization tier (preDeduped)
    val dropped = Dedup.connectedComponents(
        Dedup.ngramJaccard(reps, "doc_id", "text", preDeduped = true),
        "id_a", "id_b")
      .filter(col("comp") =!= col("id"))
      .select(col("id").as("doc_id"))
    val survivors = reps.join(dropped, Seq("doc_id"), "left_anti")
    val gated = survivors
      .filter(length(col("text")) >= 100 && size(split(col("text"), " ")) >= 20)
      .join(TextAnalysis.repetitionSignals(survivors, "doc_id", "text")
        .select(col("doc_id"), col("dup_2gram_frac")), "doc_id")
      .filter(col("dup_2gram_frac") <= 0.3)
    val clean = Dedup.decontaminate(gated, bench, "doc_id", "text", shingleN = 8)
    val nibble = substring(md5(col("text")), 1, 1)
    clean
      .withColumn("split",
        when(nibble <= "b", "train").when(nibble <= "d", "val").otherwise("test"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"))
      .orderBy(col("split"), col("source"))
  }

  /** The DuckDB replay of [[pretrainNearDupPipeline]], shared by l28 and
    * l65 (which appends constant invariant columns to the final
    * aggregate — the pinned-rerun and live-mutation booleans its Spark
    * side computes in-plan). */
  private def pretrainNearDupOracleSql(extraCols: String): String =
    s"""WITH RECURSIVE
                 corpus AS (SELECT * FROM documents WHERE doc_id % 50 != 0),
                 reps AS (SELECT min(doc_id) AS doc_id, text FROM corpus GROUP BY text),
                 reps_src AS (SELECT r.doc_id, r.text, c.source
                              FROM reps r JOIN corpus c ON r.doc_id = c.doc_id),
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM reps_src),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2),
                 prs AS (SELECT id_a, id_b FROM inter
                         JOIN sizes na ON id_a = na.doc_id
                         JOIN sizes nb ON id_b = nb.doc_id
                         WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5),
                 edges AS (SELECT id_a AS u, id_b AS v FROM prs
                           UNION
                           SELECT id_b AS u, id_a AS v FROM prs),
                 reach AS (SELECT u AS id, u AS comp FROM edges
                           UNION
                           SELECT e.v AS id, r.comp
                           FROM reach r JOIN edges e ON e.u = r.id),
                 comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
                 surv AS (SELECT rs.doc_id, rs.text, rs.source FROM reps_src rs
                          LEFT JOIN comps c ON rs.doc_id = c.id
                          WHERE c.id IS NULL OR c.comp = rs.doc_id),
                 stoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
                 g2 AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+1], ' '))) AS g
                        FROM stoks WHERE len(t) >= 2),
                 cnt AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
                 agg2 AS (SELECT doc_id, sum(c) AS n2, count(*) AS d2
                          FROM cnt GROUP BY doc_id),
                 gated AS (SELECT sv.doc_id, sv.text, sv.source, tk.t
                           FROM surv sv
                           JOIN stoks tk ON sv.doc_id = tk.doc_id
                           JOIN agg2 a ON sv.doc_id = a.doc_id
                           WHERE length(sv.text) >= 100 AND len(tk.t) >= 20
                             AND round(1.0 - CAST(a.d2 AS DOUBLE) / a.n2, 6) <= 0.3),
                 sh8 AS (SELECT g.doc_id,
                                unnest(list_transform(
                                  generate_series(1, greatest(len(g.t) - 7, 1)),
                                  i -> array_to_string(g.t[i:i+7], ' '))) AS s
                         FROM gated g),
                 bt AS (SELECT doc_id, string_split(text, ' ') AS t
                        FROM documents WHERE doc_id % 50 = 0),
                 bench8 AS (SELECT DISTINCT
                                   unnest(list_transform(
                                     generate_series(1, greatest(len(t) - 7, 1)),
                                     i -> array_to_string(t[i:i+7], ' '))) AS s
                            FROM bt),
                 bad AS (SELECT DISTINCT doc_id FROM sh8
                         WHERE s IN (SELECT s FROM bench8)),
                 clean AS (SELECT * FROM gated
                           WHERE doc_id NOT IN (SELECT doc_id FROM bad))
            SELECT CASE WHEN substr(md5(text), 1, 1) <= 'b' THEN 'train'
                        WHEN substr(md5(text), 1, 1) <= 'd' THEN 'val'
                        ELSE 'test' END AS split,
                   source,
                   count(*) AS n_docs,
                   CAST(sum(len(t)) AS BIGINT) AS n_tokens$extraCols
            FROM clean
            GROUP BY 1, 2 ORDER BY split, source"""

  val l28PipelineNearDup = Q(
    "l28_pretrain_neardup",
    (s, dir) =>
      pretrainNearDupPipeline(Tables(s, dir, "documents"), "l28.reps"),
    Some(pretrainNearDupOracleSql("")))

  /** One session-fixed root for every persisted-index artifact the
    * declared queries create, deleted recursively on JVM exit — repeated
    * verify/bench invocations REUSE paths under it instead of leaking a
    * fresh /tmp directory per run (the round-7 advisory). */
  private lazy val annIndexRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_ann_index")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(p.toFile)))
    p
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  /** The l29 index for `dir`'s embeddings table: built ONCE per session
    * (first caller pays the ingest; l30/l31 and every later invocation
    * read the materialized tier — the amortization the index exists
    * for). */
  private val annIndexBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def annIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    annIndexBuilt.computeIfAbsent(dir, _ => {
      val out = annIndexRoot.resolve("idx_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildIvfIndex(
        Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        out, cellCap = Some(256)).count()
      out
    })

  /** Per-query read-path PARITY gate: `(qid, parity)` over `base` ids,
    * `parity` ⇔ sides `a` and `b` (both `(qid, rank, nid, cos)` top-k
    * frames) are ROW-IDENTICAL for that query. A rank present on one
    * side only, or differing in nid or score, coalesces to false (Spark
    * `bool_and` would silently IGNORE the null comparison); a qid with
    * rows on NEITHER side is vacuously equal (coalesce(true) after the
    * base left join). DuckDB oracle: `SELECT vec_id AS qid, true`. */
  private def topKParity(base: DataFrame, a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("qid"), col("rank"),
      col("nid").as("a_nid"), col("cos").as("a_cos"))
    val r = b.select(col("qid"), col("rank"),
      col("nid").as("b_nid"), col("cos").as("b_cos"))
    val per = l.join(r, Seq("qid", "rank"), "full_outer")
      .groupBy(col("qid"))
      .agg(bool_and(coalesce(
        col("a_nid") === col("b_nid") && col("a_cos") === col("b_cos"),
        lit(false))).as("parity"))
    base.select(col("vec_id").as("qid"))
      .join(per, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("parity"), lit(true)).as("parity"))
      .orderBy(col("qid"))
  }

  /** L: the persisted ANN index tier, build side — centroids (with
    * per-cell posting counts and hot-cell shard widths) + INT8 postings
    * (1 B/elem codes + scale/norm scalars, ~4× smaller than the float
    * corpus) partitioned by cell, materialized once at ingest (at
    * 100 TB the index IS the product; per-run recompute is the honest
    * bench cost, never the deployment shape). Stride-centroid argmax
    * assignment is not reasonably SQL-expressible, so the DECLARED form
    * is the build-INTEGRITY invariant, one row: Σ n_vectors over the
    * centroid table and the posting count must both equal the corpus
    * size (which DuckDB asserts directly from the source table), and no
    * posting may reference a cell absent from the centroid table. The
    * bookkeeping reads stay index-shaped: totals come from the nlist-row
    * centroid table + a metadata-only posting count. Read-path parity
    * and the single-scan plan gate stay in SimilaritySpec; bench times
    * the raw histogram read. */
  val l29AnnIndexBuild = Q(
    "l29_ann_index_build",
    (s, dir) => {
      val idx = annIndex(s, dir)
      val cents = Similarity.indexCentroids(s, idx)
      val posts = Similarity.indexPostings(s, idx)
      val a = cents.agg(
        coalesce(sum(col("n_vectors")), lit(0L)).cast("long").as("n_vectors_total"))
      val b = posts.agg(count(lit(1)).as("n_postings"))
      val orph = posts.select(col("cell"))
        .join(cents.select(col("cell")), Seq("cell"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      a.crossJoin(b).crossJoin(orph)
        .select(col("n_vectors_total"), col("n_postings"),
          (col("n_vectors_total") === col("n_postings") &&
            col("n_orphans") === 0).as("integrity_ok"))
    },
    Some("""SELECT count(*) AS n_vectors_total, count(*) AS n_postings,
                   CAST(1 AS BOOLEAN) AS integrity_ok FROM embeddings"""),
    bench = Some((s, dir) => Similarity.indexCentroids(s, annIndex(s, dir))
      .filter(col("n_vectors") > 0)
      .select(col("cell"), col("n_vectors")).orderBy(col("cell"))))

  /** L: ANN top-k answered FROM the persisted int8 index — the read
    * path that amortizes l29's build. The postings scan is the corpus
    * side AS-IS (no centroid derivation, no assignment, no per-vector
    * recompute — SimilaritySpec gates the executed plan); candidates
    * screen in code space with the sound Cauchy–Schwarz margin and only
    * survivors re-attach exact vectors. Output is row-identical to l22
    * at the same nlist — compression and screening choose candidates,
    * never scores — and the DECLARED form gates exactly that:
    * [[topKParity]] of the indexed read path against the direct
    * [[Similarity.ivfTopKInt8]] path, per query, DuckDB-checkable.
    * Bench times the bare indexed read path. */
  val l30AnnIndexQuery = Q(
    "l30_ann_index_query",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      topKParity(emb,
        Similarity.ivfTopKInt8(emb, emb, 3),
        Similarity.ivfTopKIndexed(emb, emb, annIndex(s, dir), 3))
    },
    Some("""SELECT vec_id AS qid, CAST(1 AS BOOLEAN) AS parity
            FROM embeddings ORDER BY vec_id"""),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.ivfTopKIndexed(emb, emb, annIndex(s, dir), 3)
        .orderBy(col("qid"), col("rank"))
    }))

  /** L: the asymmetric SERVING shape — |Q| ≪ |C| (every 20th vector as
    * the query batch) against the l29 index. This is the regime the
    * persisted tier exists for: the corpus cost is a partition-pruned
    * postings scan + an output-sized exact re-rank, not a per-run
    * re-index, and the probe fanout touches nprobe cells per query. The
    * self-join ANN queries (l13/l14/l22) cover the corpus×corpus
    * regime; this covers retrieval. Row-identical to [[Similarity
    * .ivfTopKInt8]] restricted to the same query batch — and the
    * DECLARED form gates exactly that via [[topKParity]], per query,
    * DuckDB-checkable. Bench times the bare serve path. */
  val l31AnnServe = Q(
    "l31_ann_serve",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val batch = emb.filter(col("vec_id") % 20 === 0)
      topKParity(batch,
        Similarity.ivfTopKInt8(batch, emb, 3),
        Similarity.ivfTopKIndexed(batch, emb, annIndex(s, dir), 3))
    },
    Some("""SELECT vec_id AS qid, CAST(1 AS BOOLEAN) AS parity
            FROM embeddings WHERE vec_id % 20 = 0 ORDER BY vec_id"""),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.ivfTopKIndexed(
        emb.filter(col("vec_id") % 20 === 0), emb, annIndex(s, dir), 3)
        .orderBy(col("qid"), col("rank"))
    }))

  /** L: incremental index maintenance — build the index on the base
    * corpus (vec_id % 10 ≠ 0), APPEND the held-out batch (centroids
    * fixed, only touched cell partitions gain files), and declare the
    * post-append integrity invariant (bench returns the refreshed
    * per-cell histogram). The read path after the append is
    * row-identical to a fresh rebuild over the full corpus at the same
    * centroids (SimilaritySpec pins the parity) — the m4/m5 upsert
    * machinery applied to the ANN tier, so a growing corpus never
    * re-ingests. Rebuilt from scratch each invocation (fixed dir,
    * overwrite) so the append happens exactly once per run. */
  val l32AnnIndexAppend = Q(
    "l32_ann_index_append",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val out = annIndexRoot.resolve(
        "append_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 10 =!= 0), out, cellCap = Some(256)).count()
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 10 === 0), out).count()
      // the DECLARED output is the post-append INTEGRITY invariant (the
      // l29 form): after build-base + append, the refreshed centroid
      // bookkeeping and the posting files must both cover the FULL
      // corpus exactly once — DuckDB asserts both totals equal the
      // source-table count, so a lost or double-appended batch is red.
      // Append ≡ rebuild read parity stays in SimilaritySpec.
      val cents = Similarity.indexCentroids(s, out)
      val posts = Similarity.indexPostings(s, out)
      val a = cents.agg(
        coalesce(sum(col("n_vectors")), lit(0L)).cast("long").as("n_vectors_total"))
      val b = posts.agg(count(lit(1)).as("n_postings"))
      val orph = posts.select(col("cell"))
        .join(cents.select(col("cell")), Seq("cell"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      a.crossJoin(b).crossJoin(orph)
        .select(col("n_vectors_total"), col("n_postings"),
          (col("n_vectors_total") === col("n_postings") &&
            col("n_orphans") === 0).as("integrity_ok"))
    },
    Some("""SELECT count(*) AS n_vectors_total, count(*) AS n_postings,
                   CAST(1 AS BOOLEAN) AS integrity_ok FROM embeddings"""),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val out = annIndexRoot.resolve(
        "append_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildIvfIndex(
        emb.filter(col("vec_id") % 10 =!= 0), out, cellCap = Some(256)).count()
      Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 10 === 0), out).count()
      Similarity.indexCentroids(s, out)
        .filter(col("n_vectors") > 0)
        .select(col("cell"), col("n_vectors")).orderBy(col("cell"))
    }))

  /** L: the index INGEST cost, unamortized — a fresh [[Similarity
    * .buildIvfIndex]] into a new directory on every invocation (no
    * session cache; a rotating counter keeps the paths distinct, all
    * under the JVM-exit-cleaned root). l29 measures the tier a
    * deployment READS (built once, amortized); this row measures what
    * a growing 100 TB deployment PAYS daily — the write path — which
    * the r9 verdict flagged as invisible because l29's cache let the
    * first l30 run absorb it silently. The fresh build produces the
    * same deterministic per-cell histogram as l29 (same corpus, same
    * centroids, same cellCap) — the declared invariant output asserts
    * exactly that, cell for cell, plus the DuckDB-checked total. */
  private val freshIndexCounter = new java.util.concurrent.atomic.AtomicLong(0)
  val l33AnnIndexFresh = Q(
    "l33_ann_index_fresh",
    (s, dir) => {
      val out = annIndexRoot.resolve(
        "fresh_" + Integer.toHexString(dir.hashCode) + "_" +
          freshIndexCounter.getAndIncrement()).toString
      Similarity.buildIvfIndex(
        Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        out, cellCap = Some(256)).count()
      // DECLARED output: one row — total posted vectors (DuckDB asserts
      // = corpus count) and HISTOGRAM PARITY of the fresh build against
      // the session-cached l29 index (same corpus, same deterministic
      // centroids ⇒ cell-for-cell identical posting counts). The fresh
      // build cost is still paid every invocation — that is what this
      // row measures; the parity read adds only two nlist-row scans.
      val fresh = Similarity.indexCentroids(s, out)
        .select(col("cell"), col("n_vectors").as("f_n"))
      val cached = Similarity.indexCentroids(s, annIndex(s, dir))
        .select(col("cell"), col("n_vectors").as("c_n"))
      fresh.join(cached, Seq("cell"), "full_outer")
        .agg(
          coalesce(sum(col("f_n")), lit(0L)).cast("long").as("n_vectors_total"),
          bool_and(coalesce(col("f_n") === col("c_n"), lit(false)))
            .as("histogram_parity"))
    },
    Some("""SELECT count(*) AS n_vectors_total,
                   CAST(1 AS BOOLEAN) AS histogram_parity FROM embeddings"""),
    bench = Some((s, dir) => {
      val out = annIndexRoot.resolve(
        "fresh_" + Integer.toHexString(dir.hashCode) + "_" +
          freshIndexCounter.getAndIncrement()).toString
      Similarity.buildIvfIndex(
        Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        out, cellCap = Some(256)).count()
      Similarity.indexCentroids(s, out)
        .filter(col("n_vectors") > 0)
        .select(col("cell"), col("n_vectors")).orderBy(col("cell"))
    }))

  /** L: seeded sparse JL dimensionality reduction of the embedding
    * column (Achlioptas 2003 "Database-friendly random projections") —
    * 64 → 16 dims, row-local, no shuffle; the pre-ANN compression step.
    * No SQL oracle (counter-based splitmix64 matrix derivation needs
    * 64-bit wrapping arithmetic DuckDB lacks), but the Python
    * cross-oracle in tools/check_oracle.py reproduces the projection
    * BIT-EXACTLY (integer-derived matrix + identical IEEE op order),
    * so this query is cross-engine-checked, not rows-only.
    *
    * Declared output is the SCALAR form — `(vec_id, pos, value)` via
    * posexplode — not the raw array column: the driver's harness
    * canonicalizes results through pandas sort/factorize, which cannot
    * hash an ndarray cell (the one red row in CORRECTNESS_r10 was this
    * query's array output crashing that canonicalization, not the
    * operator). The values stay raw doubles, so the Python cross-check
    * remains bit-exact. */
  val l34JlProject = Q(
    "l34_jl_project",
    (s, dir) => Similarity.jlProject(
      Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", outDim = 16)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("pos", "value")))
      .orderBy(col("vec_id"), col("pos")),
    None,
    // bench times the production shape — the raw array projection (what
    // a pipeline consumes); the posexplode exists only for the driver
    // harness's scalar canonicalization
    bench = Some((s, dir) => Similarity.jlProject(
      Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", outDim = 16)
      .orderBy(col("vec_id"))))

  /** The l35 PQ index for `dir`'s embeddings table, session-cached like
    * [[annIndex]] and sharing its centroid table (`centroidsFrom`) so
    * the two tiers probe identical cells — which is also what lets
    * SimilaritySpec pin serve parity between them. */
  private val pqIndexBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def pqIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    pqIndexBuilt.computeIfAbsent(dir, _ => {
      val out = annIndexRoot.resolve("pq_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildPqIndex(
        Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        out, cellCap = Some(256), centroidsFrom = Some(annIndex(s, dir))).count()
      out
    })

  /** L: ANN serving from the PRODUCT-QUANTIZED index tier — the same
    * |Q| ≪ |C| retrieval shape as l31, answered from m-byte PQ postings
    * (~8× less postings IO than the int8 tier at d = 64, m = 8) with
    * per-query ADC lookup tables and the sound residual-interval screen
    * ([[Similarity.pqTopKIndexed]]). Row-identical to l31 at the shared
    * centroid table — compression chooses candidates, never scores —
    * and the DECLARED form gates exactly that: [[topKParity]] of the PQ
    * serve path against the int8 index serve path on the same batch,
    * per query, DuckDB-checkable (ADC soundness stays spec-checked).
    * Bench times the bare PQ serve path. */
  val l35PqServe = Q(
    "l35_pq_serve",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val batch = emb.filter(col("vec_id") % 20 === 0)
      topKParity(batch,
        Similarity.ivfTopKIndexed(batch, emb, annIndex(s, dir), 3),
        Similarity.pqTopKIndexed(batch, emb, pqIndex(s, dir), 3))
    },
    Some("""SELECT vec_id AS qid, CAST(1 AS BOOLEAN) AS parity
            FROM embeddings WHERE vec_id % 20 = 0 ORDER BY vec_id"""),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      Similarity.pqTopKIndexed(
        emb.filter(col("vec_id") % 20 === 0), emb, pqIndex(s, dir), 3)
        .orderBy(col("qid"), col("rank"))
    }))

  /** L: greedy sequence packing into fixed token-budget training
    * windows — per-shard hash-shuffled streams, running-token-count
    * window assignment, no global sort ([[TextAnalysis.packSequences]]).
    * Fully oracle-checked: the shard deal, the md5 shuffle order and
    * the running sum are all cross-engine-exact, so DuckDB pins every
    * document's (shard, window) assignment. */
  val l36PackSequences = Q(
    "l36_pack_sequences",
    (s, dir) => TextAnalysis.packSequences(
      Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id,
                              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                              CAST(doc_id % 8 AS INT) AS shard,
                              md5('pack#' || CAST(doc_id AS VARCHAR)) AS k
                       FROM documents)
            SELECT doc_id, shard,
                   CAST(floor(COALESCE(SUM(n_tokens) OVER (
                          PARTITION BY shard ORDER BY k, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        / 256) AS BIGINT) AS win_id,
                   n_tokens
            FROM t ORDER BY doc_id"""))

  /** L: temperature-weighted mixture sampling — per-source quotas
    * proportional to sqrt(n) (upsampling small domains relative to raw
    * frequency), survivors = the first quota docs of each source in
    * deterministic md5 order ([[TextAnalysis.temperatureSample]]). The
    * oracle states the single-window rank; the engine computes the SAME
    * exact rank 256-way parallel per domain (hash-prefix bucket offsets
    * + within-bucket row_number — the distributed exact-rank pattern a
    * few-huge-domains corpus needs), so the survivor sets hash-match. */
  val l37TemperatureSample = Q(
    "l37_temperature_sample",
    (s, dir) => TextAnalysis.temperatureSample(
      Tables(s, dir, "documents"), "doc_id", "source")
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, source,
                              md5('mix#' || CAST(doc_id AS VARCHAR)) AS k
                       FROM documents),
                 r AS (SELECT doc_id, source,
                              row_number() OVER (PARTITION BY source
                                                 ORDER BY k, doc_id) AS rk,
                              count(*) OVER (PARTITION BY source) AS n
                       FROM t)
            SELECT doc_id, source FROM r
            WHERE rk <= CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) * 10
            ORDER BY doc_id"""))

  /** L: Bloom-filter decontamination — l17's semantics from a broadcast
    * filter instead of a shingle equi-join: the bench shingle set
    * becomes one ~KB-to-MB Bloom filter and the corpus pass is
    * row-local with ZERO corpus-side shuffle ([[Dedup
    * .decontaminateBloom]] — the shape that turns decontamination of a
    * 100 TB corpus from a re-sort into a scan). One-sided error: every
    * truly contaminated doc is always dropped; at the declared 1e-6 fpp
    * the expected false-positive drops on the fixture round to zero, so
    * the output matches l17's survivor set — but the filter's hash
    * functions are engine-internal, so no SQL oracle; DedupSpec pins
    * the subset law and the excess bound, and the driver records the
    * rows-only check. */
  val l38BloomDecontaminate = Q(
    "l38_bloom_decontaminate",
    (s, dir) => {
      val all = Tables(s, dir, "documents")
      val bench = all.filter(col("doc_id") % 50 === 0)
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
        shingleN = 8, fpp = 1e-6)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    None)

  /** L: paragraph-level exact dedup with document reconstruction
    * ([[Dedup.paragraphDedup]] — the CCNet/RefinedWeb boilerplate pass):
    * each distinct paragraph survives only at its first global
    * `(doc_id, pos)` occurrence and documents are rebuilt from their
    * survivors in order. The fixture corpus has no natural paragraph
    * breaks, so the query splits on the literal ` a ` token (74 repeated
    * segments at sf0.01) — the OPERATOR takes any literal separator.
    * Deterministic string math end to end ⇒ fully DuckDB-oracled,
    * including the reconstruction concat. */
  val l39ParagraphDedup = Q(
    "l39_paragraph_dedup",
    (s, dir) => Dedup.paragraphDedup(
        Tables(s, dir, "documents"), "doc_id", "text", sep = " a ")
      .orderBy(col("doc_id")),
    Some("""WITH paras AS (
              SELECT doc_id, unnest(string_split(text, ' a ')) AS para,
                     unnest(range(len(string_split(text, ' a ')))) AS pos
              FROM documents
            ), k AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
              FROM paras
            )
            SELECT doc_id, string_agg(para, ' a ' ORDER BY pos) AS text_dedup
            FROM k WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id"""))

  /** L: threshold (fuzzy) decontamination ([[Dedup.decontaminateFuzzy]]
    * — the GPT-3/PaLM-style policy): a corpus doc drops only when ≥
    * `minFrac` of its distinct 8-gram shingles appear in the benchmark
    * set, so a stray shared idiom no longer deletes a clean document
    * the way l17's any-hit rule does. Same bench split as l17; exact
    * integer×double threshold arithmetic on aggregated counts ⇒ fully
    * DuckDB-oracled. The zero-shuffle Bloom-count form
    * ([[Dedup.decontaminateBloomFuzzy]]) is pinned to this one by
    * DedupSpec's subset/parity laws. */
  val l40FuzzyDecon = Q(
    "l40_fuzzy_decon",
    (s, dir) => {
      val all = Tables(s, dir, "documents")
      val bench = all.filter(col("doc_id") % 50 === 0)
      val corpus = all.filter(col("doc_id") % 50 =!= 0)
      Dedup.decontaminateFuzzy(corpus, bench, "doc_id", "text",
          shingleN = 8, minFrac = 0.5)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 7, 1)),
                                 i -> array_to_string(t[i:i+7], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 bench AS (SELECT DISTINCT s FROM sets WHERE doc_id % 50 = 0),
                 frac AS (SELECT doc_id, count(*) AS tot,
                                 count(CASE WHEN s IN (SELECT s FROM bench) THEN 1 END) AS hits
                          FROM sets WHERE doc_id % 50 != 0 GROUP BY doc_id),
                 bad AS (SELECT doc_id FROM frac WHERE hits >= tot * 0.5)
            SELECT doc_id FROM documents
            WHERE doc_id % 50 != 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
            ORDER BY doc_id"""))

  /** L: window-level exact substring dedup with reconstruction
    * ([[Dedup.windowDedup]] — the Lee et al. ACL'22 ExactSubstr pass):
    * every duplicated 8-token window keeps its first global `(doc_id,
    * pos)` occurrence and is excised everywhere else; documents are
    * rebuilt from surviving tokens. Deterministic string math end to
    * end (the oracle fingerprints windows by their literal text) ⇒
    * fully DuckDB-oracled including the reconstruction concat. */
  val l41WindowDedup = Q(
    "l41_window_dedup",
    (s, dir) => Dedup.windowDedup(
        Tables(s, dir, "documents"), "doc_id", "text", k = 8)
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 toks AS (SELECT doc_id, unnest(toks) AS tok,
                                 unnest(range(len(toks))) AS tpos FROM t),
                 wins AS (SELECT doc_id, len(toks) AS nt,
                                 unnest(range(greatest(len(toks) - 7, 1))) AS pos,
                                 unnest(list_transform(
                                   generate_series(1, greatest(len(toks) - 7, 1)),
                                   i -> array_to_string(toks[i:i+7], ' '))) AS w
                          FROM t),
                 occ AS (SELECT doc_id, nt, pos,
                                row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
                         FROM wins),
                 bad AS (SELECT doc_id, unnest(range(pos, least(pos + 8, nt))) AS tpos
                         FROM occ WHERE rn >= 2),
                 kept AS (SELECT tk.doc_id, tk.tpos, tk.tok
                          FROM toks tk LEFT JOIN bad b
                            ON tk.doc_id = b.doc_id AND tk.tpos = b.tpos
                          WHERE b.tpos IS NULL)
            SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS text_dedup
            FROM kept GROUP BY doc_id ORDER BY doc_id"""))

  /** Cached text-dedup band indexes (same lifecycle as [[annIndex]]):
    * `dedupIndex` = fresh build over the even-id corpus; `dedupIndexAppended`
    * = build over doc_id%4==0 then APPEND doc_id%4==2 — the same corpus
    * reached incrementally, so l43 ≡ l42 row-identical is the append
    * law, checked at the VALUE level by the cross-oracle. */
  private val dedupIndexBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def dedupIndex(s: org.apache.spark.sql.SparkSession, dir: String): String =
    dedupIndexBuilt.computeIfAbsent("b:" + dir, _ => {
      val out = annIndexRoot.resolve("dix_" + Integer.toHexString(dir.hashCode)).toString
      DedupIndex.build(
        Tables(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        "doc_id", "text", out)
      out
    })
  private def dedupIndexAppended(s: org.apache.spark.sql.SparkSession, dir: String): String =
    dedupIndexBuilt.computeIfAbsent("a:" + dir, _ => {
      val out = annIndexRoot.resolve("dixa_" + Integer.toHexString(dir.hashCode)).toString
      val docs = Tables(s, dir, "documents")
      DedupIndex.build(docs.filter(col("doc_id") % 4 === 0), "doc_id", "text", out)
      DedupIndex.append(docs.filter(col("doc_id") % 4 === 2), "doc_id", "text", out)
      out
    })
  /** Full-corpus band index — the l55 substrate: dedup-groups runs over
    * an indexed corpus pay the pair stage from `bands/`, not a re-band. */
  private def dedupIndexFull(s: org.apache.spark.sql.SparkSession, dir: String): String =
    dedupIndexBuilt.computeIfAbsent("f:" + dir, _ => {
      val out = annIndexRoot.resolve("dixf_" + Integer.toHexString(dir.hashCode)).toString
      DedupIndex.build(Tables(s, dir, "documents"), "doc_id", "text", out)
      out
    })

  /** L: incremental near-dup dedup from the PERSISTED band index
    * ([[DedupIndex]] — the text tier's l30/l31 analog): the even-id
    * half of `documents` is the indexed corpus, the odd-id half is the
    * ingest batch; survivors are batch docs with no indexed
    * near-duplicate (shared LSH band + signature agreement ≥ 0.5 —
    * exactly l2's pair rule restricted to probe×index). Only the batch
    * is re-banded; the corpus side is a partition-pruned scan of the
    * probe's own band prefixes. Deterministic end to end → value-checked
    * by the Python cross-oracle (tools/check_oracle.py). */
  val l42DedupIndexQuery = Q(
    "l42_dedup_index_query",
    (s, dir) => DedupIndex.query(
        Tables(s, dir, "documents").filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", dedupIndex(s, dir))
      .select(col("doc_id"))
      .orderBy(col("doc_id")),
    None)

  /** L: the same ingest query against an INCREMENTALLY BUILT index
    * (build doc_id%4==0, then append doc_id%4==2 — together the same
    * even-id corpus as l42's fresh build). Band rows are row-local per
    * doc, so append ≡ rebuild with no global refresh; the cross-oracle
    * checks l43 against the same expected survivor set as l42, making
    * the append law a VALUE check, not just a spec assertion. */
  val l43DedupIndexAppend = Q(
    "l43_dedup_index_append",
    (s, dir) => DedupIndex.query(
        Tables(s, dir, "documents").filter(col("doc_id") % 2 =!= 0),
        "doc_id", "text", dedupIndexAppended(s, dir))
      .select(col("doc_id"))
      .orderBy(col("doc_id")),
    None)

  /** L: the JL → ANN COMPOSITION, gated — project 64 → 16 dims
    * ([[Similarity.jlProject]], the l34 operator) and run LSH top-k IN
    * THE PROJECTED SPACE ([[Similarity.lshTopK]] at dim = 16): the
    * "compress, then index" pipeline every scale deployment runs (4×
    * less band-key arithmetic and 4× smaller codes per vector). The
    * invariant is [[plantedRecall]]'s, THROUGH the composition:
    * identical vectors project to identical 16-d vectors (the map is a
    * pure function), so each query's planted partner still shares
    * every band signature after projection and must land in its top-3
    * at cosine exactly 1.0 — compression changed the geometry of
    * everything EXCEPT the exact-duplicate relation the gate pins.
    * DuckDB-checkable like l13. */
  val l56JlAnnRecall = Q(
    "l56_jl_ann_recall",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = emb.unionByName(
        emb.select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding")))
      val proj = Similarity.jlProject(corpus, "vec_id", "embedding", outDim = 16)
        .select(col("vec_id"), col("proj").cast("array<float>").as("embedding"))
      val queries = proj.filter(col("vec_id") < PlantOffset)
      val hit = Similarity.lshTopK(queries, proj, 3, dim = 16)
        .filter(col("nid") === col("qid") + PlantOffset)
        .select(col("qid")).distinct().withColumn("found", lit(true))
      emb.select(col("vec_id").as("qid"))
        .join(hit, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("found"), lit(false)).as("found"))
        .orderBy(col("qid"))
    },
    Some(PlantedRecallOracle),
    // bench times the bare composition a pipeline runs: project the
    // corpus once, self-join ANN in the 16-d space
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val proj = Similarity.jlProject(emb, "vec_id", "embedding", outDim = 16)
        .select(col("vec_id"), col("proj").cast("array<float>").as("embedding"))
      Similarity.lshTopK(proj, proj, 3, dim = 16)
        .orderBy(col("qid"), col("rank"))
    }))

  /** L: dedup GROUPS answered from the persisted band index — l26's
    * transitive-closure semantics with the pair stage amortized through
    * [[DedupIndex.selfPairs]] (the corpus is never re-shingled or
    * re-banded; the signature rides the band row, so the pair stage is
    * one self-join of `bands/` plus the agreement filter, then the same
    * star-contraction closure). This is the repeat-run shape a 100 TB
    * deployment actually pays: the index is built once at ingest
    * (session-cached here, like l29's), every subsequent dedup-groups
    * run costs pairs-from-index + closure. Pair rule = l2's
    * (band collision + est agreement ≥ 0.5), whose pair set the oracle
    * gate pins equal to the exact-Jaccard set at every fixture SF — so
    * this query shares l26's recursive-CTE oracle and hash-matches it. */
  val l55DedupGroupsIndexed = Q(
    "l55_dedup_groups_indexed",
    (s, dir) => Dedup.connectedComponents(
      DedupIndex.selfPairs(s, dedupIndexFull(s, dir)), "id_a", "id_b")
      .orderBy(col("id")),
    Some("""WITH RECURSIVE
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2),
                 pairs AS (SELECT id_a, id_b FROM inter
                           JOIN sizes na ON id_a = na.doc_id
                           JOIN sizes nb ON id_b = nb.doc_id
                           WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5),
                 edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                           UNION
                           SELECT id_b AS u, id_a AS v FROM pairs),
                 reach AS (SELECT u AS id, u AS comp FROM edges
                           UNION
                           SELECT e.v AS id, r.comp
                           FROM reach r JOIN edges e ON e.u = r.id)
            SELECT id, min(comp) AS comp FROM reach GROUP BY id
            ORDER BY id"""))

  /** Full-corpus band index with a DELETE applied — the l57 substrate:
    * build over all documents, then tombstone the doc_id % 5 == 2
    * slice ([[DedupIndex.delete]] — one id-list write + a manifest
    * swap, no band data rewritten). Session-cached like the other index
    * dirs; separate from [[dedupIndexFull]] so l55's index is never
    * mutated. */
  private def dedupIndexDeleted(s: org.apache.spark.sql.SparkSession, dir: String): String =
    dedupIndexBuilt.computeIfAbsent("d:" + dir, _ => {
      val out = annIndexRoot.resolve("dixd_" + Integer.toHexString(dir.hashCode)).toString
      val docs = Tables(s, dir, "documents")
      DedupIndex.build(docs, "doc_id", "text", out)
      DedupIndex.delete(
        docs.filter(col("doc_id") % 5 === 2).select(col("doc_id")), "doc_id", out)
      out
    })

  /** L: dedup groups from the index AFTER A DELETE — the takedown
    * maintenance shape ([[DedupIndex.delete]]): the doc_id % 5 == 2
    * slice is tombstoned (an O(|ids|) id-list write + one atomic
    * manifest swap; no band data rewritten) and every read path drops
    * tombstoned docs with a broadcast anti-join. The parity LAW — post-
    * delete results ≡ a fresh build without the deleted docs — holds by
    * construction because band rows are row-local per doc, and
    * DedupIndexSpec pins it on query and selfPairs; this DECLARED form
    * gates it at the VALUE level: the pair set and closure must match
    * l26's recursive-CTE oracle computed over `documents` MINUS the
    * deleted slice. Same est≡exact coincidence as l55 (deleting docs
    * induces the subgraph under both pair rules, so fixture equality at
    * the full corpus implies it on the survivor set). */
  val l57DedupIndexDelete = Q(
    "l57_dedup_groups_deleted",
    (s, dir) => Dedup.connectedComponents(
      DedupIndex.selfPairs(s, dedupIndexDeleted(s, dir)), "id_a", "id_b")
      .orderBy(col("id")),
    Some("""WITH RECURSIVE
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents WHERE doc_id % 5 != 2),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2),
                 pairs AS (SELECT id_a, id_b FROM inter
                           JOIN sizes na ON id_a = na.doc_id
                           JOIN sizes nb ON id_b = nb.doc_id
                           WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5),
                 edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                           UNION
                           SELECT id_b AS u, id_a AS v FROM pairs),
                 reach AS (SELECT u AS id, u AS comp FROM edges
                           UNION
                           SELECT e.v AS id, r.comp
                           FROM reach r JOIN edges e ON e.u = r.id)
            SELECT id, min(comp) AS comp FROM reach GROUP BY id
            ORDER BY id"""))

  /** Incremental-maintenance fixture for l59, session-cached: build the
    * band index over the BASE corpus (doc_id % 10 ≠ 7), persist its
    * closure labels (the state a deployment carries between runs), then
    * APPEND the held-out batch. Returns (index dir, labels dir). */
  private def dedupIndexIncr(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val key = "n:" + dir
    dedupIndexBuilt.computeIfAbsent(key, _ => {
      val out = annIndexRoot.resolve("dixn_" + Integer.toHexString(dir.hashCode)).toString
      val lab = annIndexRoot.resolve("dixnl_" + Integer.toHexString(dir.hashCode)).toString
      val docs = Tables(s, dir, "documents")
      DedupIndex.build(docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", out)
      Dedup.connectedComponents(DedupIndex.selfPairs(s, out), "id_a", "id_b")
        .write.mode("overwrite").parquet(lab)
      DedupIndex.append(docs.filter(col("doc_id") % 10 === 7), "doc_id", "text", out)
      s"$out|$lab"
    }).split('|') match { case Array(a, b) => (a, b) }
  }

  /** L: INCREMENTAL dedup-groups maintenance — the O(batch) repeat-run
    * shape l55 still lacked: after an append, re-close only (persisted
    * labels) + (delta edges incident to the batch) instead of re-running
    * the corpus×corpus pair join and full closure. Delta pairs come
    * from [[DedupIndex.pairsWithNew]] (the batch RE-BANDED row-locally,
    * broadcast against a partition-pruned corpus scan — l42's probe
    * shape, emitting pairs; one index scan total) and the merge is [[Dedup.incrementalComponents]]
    * (contract old components to their min-id reps, close the
    * touched-comps + batch graph, propagate through ONE broadcast
    * relabel join). The DECLARED output must hash-match l26's
    * full-corpus recursive-CTE oracle — the value-level statement of
    * "incremental ≡ full closure over the union". */
  val l59DedupGroupsIncremental = Q(
    "l59_dedup_groups_incremental",
    (s, dir) => {
      val (idx, lab) = dedupIndexIncr(s, dir)
      val batch = Tables(s, dir, "documents")
        .filter(col("doc_id") % 10 === 7)
      Dedup.incrementalComponents(
        s.read.parquet(lab),
        DedupIndex.pairsWithNew(s, idx, batch, "doc_id", "text"))
        .orderBy(col("id"))
    },
    Some("""WITH RECURSIVE
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2),
                 pairs AS (SELECT id_a, id_b FROM inter
                           JOIN sizes na ON id_a = na.doc_id
                           JOIN sizes nb ON id_b = nb.doc_id
                           WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5),
                 edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                           UNION
                           SELECT id_b AS u, id_a AS v FROM pairs),
                 reach AS (SELECT u AS id, u AS comp FROM edges
                           UNION
                           SELECT e.v AS id, r.comp
                           FROM reach r JOIN edges e ON e.u = r.id)
            SELECT id, min(comp) AS comp FROM reach GROUP BY id
            ORDER BY id"""))

  /** Snapshot-read fixture for l63, session-cached: build the band
    * index over the EVEN half, remember that version, then mutate it
    * twice (append the odd half, tombstone the %4 slice) — the state a
    * deployment is in when a training run asks to re-read the exact
    * corpus snapshot it consumed last week. Returns (dir, version). */
  private def dedupIndexSnap(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, Long) = {
    dedupIndexBuilt.computeIfAbsent("s:" + dir, _ => {
      val out = annIndexRoot.resolve("dixs_" + Integer.toHexString(dir.hashCode)).toString
      val docs = Tables(s, dir, "documents")
      DedupIndex.build(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", out)
      val v1 = DedupIndex.readManifest(out).version
      DedupIndex.append(docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", out)
      DedupIndex.delete(docs.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id")), "doc_id", out)
      s"$out|$v1"
    }).split('|') match { case Array(a, b) => (a, b.toLong) }
  }

  /** L: SNAPSHOT READ (time travel) as a driver-gated value check — the
    * reproducibility hook a training run needs: after an append AND a
    * delete, [[DedupIndex.readBandsAt]] at the pre-mutation version
    * must return exactly the pre-mutation corpus's band rows (every
    * publish writes an immutable `MANIFEST.v<N>`; data directories are
    * immutable and shared across versions). The declared form projects
    * the snapshot's per-doc band-row counts — a deterministic function
    * of WHICH docs the snapshot contains (8 band rows per non-null-text
    * doc, the posexplode arity), so DuckDB can assert the doc set
    * value-exactly: the even half only, neither the appended odds nor
    * the tombstoned %4 slice's absence may leak in. Promotes the
    * spec-pinned snapshot law (DedupIndexSpec, StateTableSpec) to the
    * driver's hash gate. */
  val l63SnapshotRead = Q(
    "l63_snapshot_read",
    (s, dir) => {
      val (idx, v1) = dedupIndexSnap(s, dir)
      DedupIndex.readBandsAt(s, idx, v1)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bands"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(8 AS BIGINT) AS n_bands FROM documents
            WHERE doc_id % 2 = 0 AND text IS NOT NULL ORDER BY doc_id"""))

  /** L: snapshot read THROUGH THE CATALOG — l63's time-travel gate
    * addressed by NAME instead of a raw path + hand-carried version:
    * the mutated index registers twice in a [[Catalog]] (a live name
    * and a PINNED `@v1` name carrying the pre-mutation version), and
    * the query reads `Catalog.dedupIndexBands` by the pinned name.
    * Must return exactly what l63's direct `readBandsAt` returns —
    * same oracle — proving name → (path, version) resolution, pin
    * semantics, and the registry's own StateTable commit end to end
    * under the driver's hash gate ("reproduce last month's training
    * corpus" as a one-line lookup). */
  val l64CatalogSnapshotRead = Q(
    "l64_catalog_snapshot_read",
    (s, dir) => {
      val (idx, v1) = dedupIndexSnap(s, dir)
      val cat = dedupIndexBuilt.computeIfAbsent("cat:" + dir, _ => {
        val c = annIndexRoot.resolve(
          "cat_" + Integer.toHexString(dir.hashCode)).toString
        // ONE commit for the deployment pair (live re-point + pinned
        // snapshot name): a reader never sees the half-published state
        // the former two-register sequence allowed
        Catalog.registerAll(s, c, Seq(
          ("docs-index", "dedup-index", idx, None),
          ("docs-index@v1", "dedup-index", idx, Some(v1))))
        c
      })
      Catalog.dedupIndexBands(s, cat, "docs-index@v1")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_bands"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, CAST(8 AS BIGINT) AS n_bands FROM documents
            WHERE doc_id % 2 = 0 AND text IS NOT NULL ORDER BY doc_id"""))

  private val l65Runs = new java.util.concurrent.atomic.AtomicInteger(0)

  /** L: CATALOG-RESOLVED REPRODUCIBLE PIPELINE — "rerun last week's job
    * byte-identical", end to end through the catalog (the round-14
    * verdict's ask #5; l64 proved the read side, this proves the whole
    * composed flow). The corpus is published into a [[StateTable]] and
    * registered under a live name AND a pinned `@v1` name in ONE
    * [[Catalog.registerAll]] commit (the atomic deployment pair). The
    * l28 pretraining pipeline runs with its corpus input resolved by
    * the PINNED name; the result is materialized; then the LIVE corpus
    * is mutated (a junk tranche published as v2 — rows that WOULD
    * change every pipeline stage if they leaked in); the pipeline
    * re-runs through a FRESH resolve of the same pinned name. Declared
    * output: the second run's aggregate plus `rerun_identical` (an
    * in-plan both-ways exceptAll of the two runs — bit-exact, so a pin
    * that silently resolved the live state cannot hide) and
    * `live_mutated` (the live name really does see the mutation — the
    * control that makes the identity non-vacuous). The oracle replays
    * the pipeline over the fixture table: hash-equality holds only if
    * the pinned resolve returned exactly the v1 corpus both times. */
  val l65CatalogPinnedPipeline = Q(
    "l65_catalog_pinned_pipeline",
    (s, dir) => {
      val n = l65Runs.incrementAndGet()
      val all = Tables(s, dir, "documents")
      // fresh store+catalog per invocation (the s14 ingestRoot
      // discipline: publishes accumulate; a re-run must not fold onto a
      // previous invocation's mutated live state)
      val store = annIndexRoot.resolve(s"l65corp_$n").toString
      val cat = annIndexRoot.resolve(s"l65cat_$n").toString
      val v1 = StateTable.publish(all, store)
      Catalog.registerAll(s, cat, Seq(
        ("pretrain-corpus", "state-table", store, None),
        ("pretrain-corpus@v1", "state-table", store, Some(v1))))
      // run 1, resolved through the PIN and materialized BEFORE the
      // live mutation (localCheckpoint — the "last week" run completed)
      val r1 = pretrainNearDupPipeline(
        Catalog.stateTable(s, cat, "pretrain-corpus@v1"), "l65.reps")
        .localCheckpoint()
      // mutate the LIVE corpus: a junk tranche that would alter exact
      // dedup (duplicate texts), the near-dup components, the quality
      // gates, and the split counts if a resolve leaked to live
      val junk = all.select((col("doc_id") + 10000000L).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      StateTable.publish(
        StateTable.read(s, store).unionByName(junk), store)
      // run 2: a FRESH pinned resolve, after the mutation (checkpointed
      // — three consumers below: two exceptAll sides and the output)
      val pinned2 = Catalog.stateTable(s, cat, "pretrain-corpus@v1")
      val r2 = pretrainNearDupPipeline(pinned2, "l65.reps").localCheckpoint()
      val identical = r2.exceptAll(r1).isEmpty && r1.exceptAll(r2).isEmpty
      val liveMutated = Catalog.stateTable(s, cat, "pretrain-corpus")
        .count() > pinned2.count()
      r2.withColumn("rerun_identical", lit(identical))
        .withColumn("live_mutated", lit(liveMutated))
        .orderBy(col("split"), col("source"))
    },
    Some(pretrainNearDupOracleSql(""",
                   CAST(1 AS BOOLEAN) AS rerun_identical,
                   CAST(1 AS BOOLEAN) AS live_mutated""")),
    // Bench times the PRODUCTION shape — one catalog-resolved pinned
    // pipeline pass over a session-cached store (the rerun comparison is
    // the gate's invariant harness, not the operator)
    bench = Some((s, dir) => {
      val cat = dedupIndexBuilt.computeIfAbsent("l65b:" + dir, _ => {
        val all = Tables(s, dir, "documents")
        val store = annIndexRoot.resolve(
          "l65bs_" + Integer.toHexString(dir.hashCode)).toString
        val c = annIndexRoot.resolve(
          "l65bc_" + Integer.toHexString(dir.hashCode)).toString
        val v1 = StateTable.publish(all, store)
        Catalog.registerAll(s, c, Seq(
          ("pretrain-corpus@v1", "state-table", store, Some(v1))))
        c
      })
      pretrainNearDupPipeline(
        Catalog.stateTable(s, cat, "pretrain-corpus@v1"), "l65.reps")
    }))

  /** L: SQL SURFACE over the persisted tiers, driver-gated — the l63
    * snapshot read expressed as PLAIN SQL through the
    * [[graft.sql.GraftSqlExtensions]] table functions ("a user types
    * SQL at it", the round-14 verdict's stretch ask): the band table of
    * the mutated index, read AT the pre-mutation version via
    * `graft_dedup_bands('dir', v)` and aggregated entirely in SQL. Must
    * hash-match l63's oracle exactly — proving the TVF expands to the
    * same logical plan (same snapshot, same pruning) as the Scala API,
    * with the version pin riding as a function argument. */
  val l66SqlSurface = Q(
    "l66_sql_surface",
    (s, dir) => {
      val (idx, v1) = dedupIndexSnap(s, dir)
      s.sql(
        s"""SELECT doc_id, count(*) AS n_bands
            FROM graft_dedup_bands('$idx', $v1)
            GROUP BY doc_id ORDER BY doc_id""")
    },
    Some("""SELECT doc_id, CAST(8 AS BIGINT) AS n_bands FROM documents
            WHERE doc_id % 2 = 0 AND text IS NOT NULL ORDER BY doc_id"""))

  /** Post-delete ANN index pair for l58, session-cached: `_1` = the
    * full-corpus int8 index with the vec_id % 10 == 7 slice DELETED
    * ([[Similarity.deleteFromIvfIndex]] — touched cell partitions
    * rewritten, centroids/widths fixed); `_2` = the reference index
    * built FRESH over the surviving corpus at the deleted index's own
    * centroids (`centroidsFrom`) — the rebuild the deletion law is
    * stated against. */
  private val annIndexDeletedBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def annIndexDeleted(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) =
    annIndexDeletedBuilt.computeIfAbsent(dir, _ => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val delIdx = annIndexRoot.resolve(
        "del_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildIvfIndex(emb, delIdx, cellCap = Some(256)).count()
      Similarity.deleteFromIvfIndex(
        emb.filter(col("vec_id") % 10 === 7).select(col("vec_id")), delIdx).count()
      val refIdx = annIndexRoot.resolve(
        "delref_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % 10 =!= 7), refIdx,
        cellCap = Some(256), centroidsFrom = Some(delIdx)).count()
      (delIdx, refIdx)
    })

  /** L: ANN index DELETION, gated by the deletion law — build the int8
    * index over the full corpus, delete the vec_id % 10 == 7 slice
    * ([[Similarity.deleteFromIvfIndex]]: only touched cell partitions
    * rewritten via broadcast anti-join + dynamic partition overwrite,
    * centroid bookkeeping refreshed, emptied cells dropped), then serve
    * a query batch from it. The DECLARED form is [[topKParity]] of the
    * post-delete serve path against the same serve from a FRESH index
    * built over the surviving corpus at the same centroids — l43's
    * append law in reverse, per query, DuckDB-checkable. Bench times
    * what a takedown actually costs: a fresh build + the delete pass
    * (the l32/l33 ingest-row convention). */
  val l58AnnIndexDelete = Q(
    "l58_ann_index_delete",
    (s, dir) => {
      val (delIdx, refIdx) = annIndexDeleted(s, dir)
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val remaining = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = remaining.filter(col("vec_id") % 20 === 0)
      topKParity(batch,
        Similarity.ivfTopKIndexed(batch, remaining, delIdx, 3),
        Similarity.ivfTopKIndexed(batch, remaining, refIdx, 3))
    },
    Some("""SELECT vec_id AS qid, CAST(1 AS BOOLEAN) AS parity
            FROM embeddings WHERE vec_id % 10 != 7 AND vec_id % 20 = 0
            ORDER BY vec_id"""),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val out = annIndexRoot.resolve(
        "bdel_" + Integer.toHexString(dir.hashCode) + "_" +
          freshIndexCounter.getAndIncrement()).toString
      Similarity.buildIvfIndex(emb, out, cellCap = Some(256)).count()
      Similarity.deleteFromIvfIndex(
        emb.filter(col("vec_id") % 10 === 7).select(col("vec_id")), out).count()
      Similarity.indexCentroids(s, out)
        .filter(col("n_vectors") > 0)
        .select(col("cell"), col("n_vectors")).orderBy(col("cell"))
    }))

  /** L: near-dup group collapse with a QUALITY keeper
    * ([[Dedup.collapseKeepBest]] — RefinedWeb's "keep the best copy"
    * policy vs l26/l28's min-id convention): every near-dup component
    * keeps its longest member (token count, ties to the smaller id),
    * singletons keep themselves. Extends l26's recursive-CTE oracle
    * with a windowed argmax — deterministic integer math end to end,
    * fully hash-checked. */
  val l44QualityKeeper = Q(
    "l44_quality_keeper",
    (s, dir) => Dedup.collapseKeepBest(
        Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("comp")),
    Some("""WITH RECURSIVE
                 toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 2, 1)),
                                 i -> array_to_string(t[i:i+2], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
                 inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS ni
                           FROM sets x JOIN sets y ON x.s = y.s AND x.doc_id < y.doc_id
                           GROUP BY 1, 2),
                 pairs AS (SELECT id_a, id_b FROM inter
                           JOIN sizes na ON id_a = na.doc_id
                           JOIN sizes nb ON id_b = nb.doc_id
                           WHERE ni * 1.0 / (na.n + nb.n - ni) >= 0.5),
                 edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                           UNION
                           SELECT id_b AS u, id_a AS v FROM pairs),
                 reach AS (SELECT u AS id, u AS comp FROM edges
                           UNION
                           SELECT e.v AS id, r.comp
                           FROM reach r JOIN edges e ON e.u = r.id),
                 comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
                 allc AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp,
                                 len(string_split(d.text, ' ')) AS q
                          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
                 rk AS (SELECT comp, doc_id,
                               row_number() OVER (PARTITION BY comp ORDER BY q DESC, doc_id) AS rn,
                               count(*) OVER (PARTITION BY comp) AS n_members
                        FROM allc)
            SELECT comp, doc_id AS keeper_id, n_members FROM rk WHERE rn = 1
            ORDER BY comp"""))

  /** L: corpus-trained bigram LM score per doc
    * ([[TextAnalysis.bigramLogProb]] — the CCNet-style model-based
    * quality signal, closed over its own corpus so fully
    * deterministic). Exact integer counts + one division + one ln per
    * distinct bigram ⇒ DuckDB-oracled at 6dp canonicalization. */
  val l45BigramLogProb = Q(
    "l45_lm_logprob",
    (s, dir) => TextAnalysis.bigramLogProb(
        Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
                 bi AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS w1,
                               unnest(tk[2:len(tk)]) AS w2 FROM t),
                 c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
                 c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
                 sc AS (SELECT doc_id, ln(c2.c2 * 1.0 / c1.c1) AS lp
                        FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1))
            SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS avg_logprob
            FROM sc GROUP BY doc_id ORDER BY doc_id"""))

  /** L: deterministic spherical k-means cluster assignment
    * ([[Similarity.clusterAssign]] — stride seeds + 2 exact-integer
    * Lloyd passes + the production first-max cell argmax): the
    * topic-bucketing primitive for metadata-free mixture balancing,
    * and SemDedup's clustering stage as its own operator. Deterministic
    * end to end → the seed pick, both Lloyd iterations and the final
    * assignment are re-derived bit-exactly by the Python cross-oracle. */
  val l46ClusterAssign = Q(
    "l46_cluster_assign",
    (s, dir) => Similarity.clusterAssign(
        Tables(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 16, refineIters = 2)
      .orderBy(col("vec_id")),
    None)

  /** L: distributed BPE tokenizer training ([[Bpe.bpeTrain]] — the
    * vocabulary-learning pass; corpus collapses once to the
    * distinct-word frequency table, then nMerges pair-count/rewrite
    * rounds over it). Deterministic end to end (exact integer counts,
    * total-order tie-break), so the whole merge table is re-derived
    * exactly by the Python cross-oracle. */
  val l47BpeTrain = Q(
    "l47_bpe_merges",
    (s, dir) => Bpe.bpeTrain(Tables(s, dir, "documents"), "text")
      .orderBy(col("rank")),
    None)

  /** L: BPE encoding statistics ([[Bpe.bpeEncodeSelf]] — train on the
    * corpus, then apply the broadcast merge list row-locally to every
    * document). Piece counts are a pure function of (text, merges) and
    * training is deterministic, so the Python cross-oracle re-derives
    * every row. */
  /** Bench-only trained-model cache: the l48 BENCH row times ENCODE
    * against a model trained once per fixture dir (min-of-3 runs reuse
    * it), so the row is finally legible as encode throughput — the 24
    * training rounds that used to dominate it ~10× are l47's own bench
    * row. The DECLARED l48 form still trains+encodes end-to-end (the
    * cross-oracle re-derives the full composition). */
  private val bpeMergesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]()

  val l48BpeEncode = Q(
    "l48_bpe_encode",
    (s, dir) => Bpe.bpeEncodeSelf(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    None,
    bench = Some((s, dir) => {
      val merges = bpeMergesCache.computeIfAbsent(dir, _ =>
        Bpe.bpeTrain(Tables(s, dir, "documents"), "text")
          .orderBy(col("rank")).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq)
      Bpe.bpeEncodeStats(Tables(s, dir, "documents"), "doc_id", "text", merges)
        .orderBy(col("doc_id"))
    }))

  /** L: frequent n-grams via the count-min prefilter
    * ([[TextAnalysis.frequentNgrams]]). The sketch estimate only
    * OVERestimates, so the prefilter admits every truly-frequent gram
    * and the exact recount removes the collisions — the result is
    * bit-identical to the exact form, which is why a SKETCH-routed
    * query can carry a plain SQL oracle. */
  val l49FrequentNgrams = Q(
    "l49_frequent_ngrams",
    (s, dir) => TextAnalysis.frequentNgrams(
        Tables(s, dir, "documents"), "text", n = 2, minCount = 40)
      .orderBy(col("cnt").desc, col("gram")),
    Some("""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
                 g AS (SELECT unnest(tk[1:len(tk)-1]) AS w1,
                              unnest(tk[2:len(tk)]) AS w2 FROM t),
                 c AS (SELECT w1 || ' ' || w2 AS gram, count(*) AS cnt
                       FROM g GROUP BY 1)
            SELECT gram, cnt FROM c WHERE cnt >= 40
            ORDER BY cnt DESC, gram"""))

  /** L: content-defined chunking ([[Cdc.chunkTable]] — Gear-hash
    * boundaries, FastCDC-style). Row-local, deterministic (fixed gear
    * table, integer arithmetic) — every offset/length/fingerprint is
    * re-derived exactly by the Python cross-oracle. */
  val l50CdcChunks = Q(
    "l50_cdc_chunks",
    (s, dir) => Cdc.chunkTable(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"), col("chunk_idx")),
    None)

  /** L: the chunk-level dedup ledger ([[Cdc.chunkDedupStats]] — per
    * doc, the byte volume covered by chunks shared with another doc:
    * what a CDC chunk store would save). Exact integer counts + one
    * division; cross-checked by the Python chunker end to end. */
  val l51CdcDedupStats = Q(
    "l51_cdc_dedup",
    (s, dir) => Cdc.chunkDedupStats(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    None)

  /** L: epoch-weighted dataset repetition
    * ([[TextAnalysis.epochMix]] — fractional pretraining epochs
    * materialized as explicit copies: floor(w) each plus a
    * deterministic-hash slice getting the extra epoch). Row-local;
    * md5-derived coin flips are cross-engine exact, so every copy row
    * is DuckDB-oracled. */
  val l52EpochMix = Q(
    "l52_epoch_mix",
    (s, dir) => TextAnalysis.epochMix(
        Tables(s, dir, "documents"), "doc_id", "source",
        weights = Map("src0" -> 2.5, "src1" -> 0.5))
      .orderBy(col("doc_id"), col("copy_idx")),
    Some("""WITH t AS (SELECT doc_id, source,
                   CASE source WHEN 'src0' THEN 2.5
                               WHEN 'src1' THEN 0.5 ELSE 1.0 END AS w,
                   (('0x' || substr(md5('epoch#' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)::DOUBLE
                     / 4294967296.0 AS h
                 FROM documents),
                 n AS (SELECT doc_id, source,
                   CAST(floor(w) + (CASE WHEN h < w - floor(w) THEN 1 ELSE 0 END) AS INT) AS n
                 FROM t)
            SELECT doc_id, source, unnest(generate_series(0, n - 1)) AS copy_idx
            FROM n WHERE n > 0 ORDER BY doc_id, copy_idx"""))

  /** L: benchmark contamination audit ([[Dedup.contaminationReport]] —
    * the reverse of l17: per BENCH doc, its corpus exposure). The
    * fingerprint join reproduces the string-shingle oracle exactly
    * barring 2⁻⁶⁴ collisions (same trade as l17, documented there). */
  val l53ContaminationAudit = Q(
    "l53_contamination_audit",
    (s, dir) => {
      val all = Tables(s, dir, "documents")
      Dedup.contaminationReport(
        all.filter(col("doc_id") % 50 =!= 0), all.filter(col("doc_id") % 50 === 0),
        "doc_id", "text", shingleN = 8)
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
                 sh AS (SELECT doc_id,
                               unnest(list_transform(
                                 generate_series(1, greatest(len(t) - 7, 1)),
                                 i -> array_to_string(t[i:i+7], ' '))) AS s
                        FROM toks),
                 sets AS (SELECT DISTINCT doc_id, s FROM sh),
                 b AS (SELECT doc_id AS bid, s FROM sets WHERE doc_id % 50 = 0),
                 c AS (SELECT doc_id AS cid, s FROM sets WHERE doc_id % 50 != 0),
                 j AS (SELECT bid, count(DISTINCT s) AS ns, count(DISTINCT cid) AS nd
                       FROM (SELECT b.bid, c.cid, b.s FROM b JOIN c USING (s))
                       GROUP BY bid),
                 sz AS (SELECT bid, count(*) AS n FROM b GROUP BY bid)
            SELECT d.doc_id,
                   coalesce(sz.n, 0) AS n_shingles,
                   coalesce(j.ns, 0) AS n_hit_shingles,
                   coalesce(j.nd, 0) AS n_corpus_docs,
                   CASE WHEN coalesce(sz.n, 0) = 0 THEN 0.0
                        ELSE round(coalesce(j.ns, 0) * 1.0 / sz.n, 6) END AS hit_frac
            FROM documents d
            LEFT JOIN sz ON sz.bid = d.doc_id
            LEFT JOIN j ON j.bid = d.doc_id
            WHERE d.doc_id % 50 = 0
            ORDER BY d.doc_id"""))

  /** L/D: persisted mergeable HLL sketch rollup
    * ([[SketchRollup]] — per-(event_type, day) DataSketches HLL
    * sketches built once, persisted, merged to per-type distinct-user
    * estimates without rescanning raw data). Sketch binaries are
    * engine-internal, so the DECLARED form is the tolerance invariant:
    * the merged per-type estimate must land within 5% of the exact
    * per-type distinct count computed in the same plan (HLL lgK = 12 ⇒
    * ~1.6% relative standard error; at the fixture's cardinalities the
    * sketch runs in its small-cardinality exact modes, so the bound is
    * loose) — and DuckDB asserts the exact side directly. SketchRollup
    * Spec still pins merge-equals-whole and the parquet round-trip. */
  val l54SketchRollup = Q(
    "l54_sketch_rollup",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
      val sketches = SketchRollup.buildSketchTable(ev, Seq("event_type", "day"), "user_id")
      val est = SketchRollup.rollup(sketches, Seq("event_type"))
      val exact = Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_distinct").cast("double") / col("exact_users") - 1.0)
            <= 0.05).as("within_tol"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
                   CAST(1 AS BOOLEAN) AS within_tol
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** L/D: persisted mergeable QUANTILE rollup ([[QuantileRollup]] —
    * l54's pattern for percentiles: per-(event_type, day) DDSketch-
    * style log-bucket histograms built in one pass, merged to per-type
    * p50/p95 without rescanning raw data). Unlike the HLL tier the
    * error bound is DETERMINISTIC — every value in bucket i lies within
    * α = (γ−1)/(γ+1) ≈ 0.99% relative of the bucket midpoint — so the
    * DECLARED tolerance invariant (estimate within 1.05% of the exact
    * rank-value computed in the same plan) is guaranteed, not
    * probabilistic; DuckDB asserts the exact side directly with the
    * same rank convention (rank = max(1, ⌈q·n⌉), the lower discrete
    * quantile). QuantileRollupSpec pins the bit-exact merge-equals-
    * whole law and the parquet round-trip; bench times the bare
    * build + rollup shape. */
  val l60QuantileRollup = Q(
    "l60_quantile_rollup",
    (s, dir) => {
      val ev = Tables(s, dir, "events").withColumn("day", to_date(col("ts")))
      val sketches = QuantileRollup.buildSketchTable(
        ev, Seq("event_type", "day"), "value")
      val est = QuantileRollup.quantiles(sketches, Seq("event_type"), Seq(0.5, 0.95))
        .groupBy(col("event_type"))
        .agg(max(when(col("q") === 0.5, col("est"))).as("p50_est"),
          max(when(col("q") === 0.95, col("est"))).as("p95_est"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val wAll = Window.partitionBy(col("event_type"))
      def rank(q: Double) =
        greatest(lit(1L), ceil(lit(q) * col("n")).cast("long"))
      val exact = Tables(s, dir, "events")
        .select(col("event_type"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy(col("event_type"))
        .agg(
          max(when(col("rn") === rank(0.5), col("value"))).as("exact_p50"),
          max(when(col("rn") === rank(0.95), col("value"))).as("exact_p95"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("exact_p50"), col("exact_p95"),
          (abs(col("p50_est") / col("exact_p50") - 1.0) <= 0.0105).as("p50_within_tol"),
          (abs(col("p95_est") / col("exact_p95") - 1.0) <= 0.0105).as("p95_within_tol"))
        .orderBy(col("event_type"))
    },
    Some("""WITH r AS (SELECT event_type, value,
                              row_number() OVER (PARTITION BY event_type
                                                 ORDER BY value) AS rn,
                              count(*) OVER (PARTITION BY event_type) AS n
                       FROM events)
            SELECT event_type,
                   max(CASE WHEN rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
                            THEN value END) AS exact_p50,
                   max(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
                            THEN value END) AS exact_p95,
                   CAST(1 AS BOOLEAN) AS p50_within_tol,
                   CAST(1 AS BOOLEAN) AS p95_within_tol
            FROM r GROUP BY event_type ORDER BY event_type"""),
    bench = Some((s, dir) => {
      val ev = Tables(s, dir, "events").withColumn("day", to_date(col("ts")))
      QuantileRollup.quantiles(
        QuantileRollup.buildSketchTable(ev, Seq("event_type", "day"), "value"),
        Seq("event_type"), Seq(0.5, 0.95))
        .orderBy(col("event_type"), col("q"))
    }))

  /** The composed retrieval tier for l61, session-cached: JL-project
    * the doubled corpus 64 → 16 dims ONCE and persist the projection
    * (`_1`), then build the PQ index over the projected table (`_2`) —
    * project → persist → index, the ingest flow a retrieval deployment
    * actually runs. */
  private def jlPqIndex(
      s: org.apache.spark.sql.SparkSession, dir: String): (String, String) = {
    val key = "jlpq:" + dir
    dedupIndexBuilt.computeIfAbsent(key, _ => {
      val hex = Integer.toHexString(dir.hashCode)
      val projDir = annIndexRoot.resolve("jlproj_" + hex).toString
      val idxDir = annIndexRoot.resolve("jlpq_" + hex).toString
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val corpus = emb.unionByName(
        emb.select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding")))
      Similarity.jlProject(corpus, "vec_id", "embedding", outDim = 16)
        .select(col("vec_id"), col("proj").cast("array<float>").as("embedding"))
        .write.mode("overwrite").parquet(projDir)
      Similarity.buildPqIndex(s.read.parquet(projDir), idxDir,
        cellCap = Some(256)).count()
      s"$projDir|$idxDir"
    }).split('|') match { case Array(a, b) => (a, b) }
  }

  /** L: the FULL retrieval pipeline composed end to end — JL projection
    * (l34) → persisted PQ index build over the projected corpus (l29 +
    * l35's tiers) → serve from it — declared as ONE query, because
    * composition is where deployments break: each stage is individually
    * gated, but only this row proves the projection's output schema,
    * the index's cell geometry and the ADC serve path agree at 16 dims
    * (m = 8 subquantizers × 2 dims). The invariant is [[plantedRecall]]
    * THROUGH the whole pipeline: identical vectors project identically
    * (pure map), assign to the same cell, and the sound ADC screen +
    * exact re-rank must put each query's planted partner (cos exactly
    * 1.0 in the projected space) in its top-3 — DuckDB-checkable like
    * l56. Bench times the bare asymmetric composed serve (|Q| ≪ |C|
    * from the persisted projection + PQ index — the repeat-run shape;
    * ingest cost is l33's row and the projection is l34's). */
  val l61JlPqPipeline = Q(
    "l61_jl_pq_pipeline",
    (s, dir) => {
      val (projDir, idxDir) = jlPqIndex(s, dir)
      val proj = s.read.parquet(projDir)
      val queries = proj.filter(col("vec_id") < PlantOffset)
      val hit = Similarity.pqTopKIndexed(queries, proj, idxDir, 3)
        .filter(col("nid") === col("qid") + PlantOffset)
        .select(col("qid")).distinct().withColumn("found", lit(true))
      Tables(s, dir, "embeddings").select(col("vec_id").as("qid"))
        .join(hit, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("found"), lit(false)).as("found"))
        .orderBy(col("qid"))
    },
    Some(PlantedRecallOracle),
    bench = Some((s, dir) => {
      val (projDir, idxDir) = jlPqIndex(s, dir)
      val proj = s.read.parquet(projDir)
      Similarity.pqTopKIndexed(
        proj.filter(col("vec_id") < PlantOffset && col("vec_id") % 20 === 0),
        proj, idxDir, 3)
        .orderBy(col("qid"), col("rank"))
    }))

  /** L: PQ index APPEND — [[l32AnnIndexAppend]] for the PQ tier:
    * build the base index (trains codebooks once), append the held-out
    * batch encoded with the PERSISTED codebooks (training never
    * re-runs, so all postings share one code space), and declare the
    * post-append INTEGRITY invariant — refreshed centroid totals and
    * the live posting count must both equal the full corpus, with no
    * orphan cells; DuckDB asserts the totals from the source table, so
    * a lost or double-appended batch is red. Append ≡ fixed-centroid+
    * codebook rebuild read parity stays in SimilaritySpec; bench times
    * what an ingest cycle pays (base build + append pass). */
  val l62PqIndexAppend = Q(
    "l62_pq_index_append",
    (s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val out = annIndexRoot.resolve(
        "pqappend_" + Integer.toHexString(dir.hashCode)).toString
      Similarity.buildPqIndex(
        emb.filter(col("vec_id") % 10 =!= 0), out, cellCap = Some(256)).count()
      Similarity.appendToPqIndex(emb.filter(col("vec_id") % 10 === 0), out).count()
      val cents = Similarity.indexCentroids(s, out)
      val posts = Similarity.indexPostings(s, out)
      val a = cents.agg(
        coalesce(sum(col("n_vectors")), lit(0L)).cast("long").as("n_vectors_total"))
      val b = posts.agg(count(lit(1)).as("n_postings"))
      val orph = posts.select(col("cell"))
        .join(cents.select(col("cell")), Seq("cell"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      a.crossJoin(b).crossJoin(orph)
        .select(col("n_vectors_total"), col("n_postings"),
          (col("n_vectors_total") === col("n_postings") &&
            col("n_orphans") === 0).as("integrity_ok"))
    },
    Some("""SELECT count(*) AS n_vectors_total, count(*) AS n_postings,
                   CAST(1 AS BOOLEAN) AS integrity_ok FROM embeddings"""),
    bench = Some((s, dir) => {
      val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val out = annIndexRoot.resolve(
        "pqappend_" + Integer.toHexString(dir.hashCode) + "_" +
          freshIndexCounter.getAndIncrement()).toString
      Similarity.buildPqIndex(
        emb.filter(col("vec_id") % 10 =!= 0), out, cellCap = Some(256)).count()
      Similarity.appendToPqIndex(emb.filter(col("vec_id") % 10 === 0), out).count()
      Similarity.indexCentroids(s, out)
        .filter(col("n_vectors") > 0)
        .select(col("cell"), col("n_vectors")).orderBy(col("cell"))
    }))

  def all: Seq[Q] = Seq(
    l1ExactDedup, l2MinhashLsh, l3Simhash, l4NgramJaccard, l5CosineTopk,
    l6CosineNearDup, l7TextQuality, l8LangId, l9Fingerprint, l10Tfidf,
    l11Multimodal, l12TokenRegex, l13LshTopk, l14IvfTopk, l15FrameSample,
    l16Winnow, l17Decontaminate, l18Chunk, l19HashSplit, l20Redact,
    l21Quantize, l22IvfInt8, l23Repetition, l24DomainSample, l25SemDedup,
    l26DedupGroups, l27Pipeline, l28PipelineNearDup, l29AnnIndexBuild,
    l30AnnIndexQuery, l31AnnServe, l32AnnIndexAppend, l33AnnIndexFresh,
    l34JlProject, l35PqServe, l36PackSequences, l37TemperatureSample,
    l38BloomDecontaminate, l39ParagraphDedup, l40FuzzyDecon, l41WindowDedup,
    l42DedupIndexQuery, l43DedupIndexAppend, l44QualityKeeper, l45BigramLogProb,
    l46ClusterAssign, l47BpeTrain, l48BpeEncode, l49FrequentNgrams,
    l50CdcChunks, l51CdcDedupStats, l52EpochMix, l53ContaminationAudit,
    l54SketchRollup, l55DedupGroupsIndexed, l56JlAnnRecall,
    l57DedupIndexDelete, l58AnnIndexDelete, l59DedupGroupsIncremental,
    l60QuantileRollup, l61JlPqPipeline, l62PqIndexAppend, l63SnapshotRead,
    l64CatalogSnapshotRead, l65CatalogPinnedPipeline, l66SqlSurface)
}
