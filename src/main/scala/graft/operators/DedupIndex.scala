package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted MinHash/LSH dedup index for the TEXT tier — the analog of
  * the ANN index tier (l29–l32) for near-duplicate detection: at 100 TB
  * the corpus's band table IS the product, and each day's ingest batch
  * probes it instead of re-banding the whole corpus. The batch
  * near-dup queries (l2/l26/l28) cover the corpus×corpus regime; this
  * covers the INCREMENTAL regime — |batch| ≪ |corpus|, the shape a
  * growing deployment pays daily.
  *
  * Layout under `dir`:
  *   - `bands/` — one row per (doc, band): `(band INT, bkey LONG,
  *     doc_id LONG, sig ARRAY<LONG>)`, PARTITIONED BY `bprefix =
  *     pmod(bkey, 256)`. The signature rides the band row (the l6
  *     lesson: carry the comparison payload on the band shuffle —
  *     joining a separate signature table would re-shuffle the corpus
  *     per query); the prefix directories give the serving path
  *     partition PRUNING — a small probe batch touches only the
  *     prefixes its own band keys name, not the whole table.
  *   - `meta/` — one row `(k, bands, shingle_n)`, so the index is
  *     self-describing and query/append cannot silently mix
  *     parameterizations.
  *
  * Determinism: signatures are seeded splitmix64 minima over FNV
  * shingle hashes ([[graft.functions.MinHashSigExpr]]) and band keys
  * are FNV folds ([[graft.functions.BandKeysExpr]]) — the whole
  * index, and therefore the query's survivor set, is bit-deterministic
  * and cross-checked by an independent Python reimplementation
  * (tools/check_oracle.py, l42/l43).
  *
  * Drop rule (query): an incoming doc is a near-duplicate iff some
  * INDEXED doc with a different id shares ≥ 1 band key AND the
  * signature agreement fraction ≥ `threshold` — exactly
  * [[Dedup.minhashLsh]]'s pair rule restricted to (probe × index)
  * pairs. The self-id guard makes re-querying an already-appended
  * batch meaningful (a doc never suppresses itself). */
object DedupIndex {

  /** Build the band table from scratch (overwrite). */
  def build(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shingleN: Int = 3,
      k: Int = 32,
      bands: Int = 8): Unit = {
    require(k % bands == 0, s"signature length k=$k must be a multiple of bands=$bands")
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((k, bands, shingleN)).toDF("k", "bands", "shingle_n")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    writeBands(docs, idCol, textCol, dir, shingleN, k, bands, overwrite = true)
  }

  /** Append a new batch's band rows to an existing index (reads the
    * parameterization from `meta/` — a batch can never be banded with
    * different constants than the corpus it joins). Post-append the
    * index is row-identical to a fresh build over the union, because
    * band rows are row-local per doc — no global state to refresh
    * (DedupIndexSpec pins the equivalence). */
  def append(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String): Unit = {
    val (k, bands, shingleN) = meta(docs, dir)
    writeBands(docs, idCol, textCol, dir, shingleN, k, bands, overwrite = false)
  }

  /** Survivors of `incoming` against the indexed corpus: drops every
    * doc with an indexed near-duplicate (shared band + agreement ≥
    * `threshold`). The corpus side is a partition-pruned scan of the
    * probe's own band prefixes; only the batch is ever re-banded. */
  def query(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      threshold: Double = 0.5): DataFrame =
    surviveAgainst(incoming, idCol, textCol, dir, threshold)._2

  /** The probe/survive core shared by [[query]] and [[ingestFold]]:
    * returns BOTH the checkpointed probe band rows (`__qid, __qsig,
    * band, bkey, bprefix`) and the survivor frame, so the fold can
    * reuse the probe rows for its append instead of recomputing every
    * survivor's signature a second time. */
  private def surviveAgainst(
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      threshold: Double): (DataFrame, DataFrame) = {
    val spark = incoming.sparkSession
    val (k, bands, shingleN) = meta(incoming, dir)
    val n = spark.sparkContext.defaultParallelism
    // materialize the probe's band rows once: the prefix-pruning list
    // below executes the frame, and without this the signature pass
    // would run again for the join (the l31/l35 probe-side lesson)
    val probe = graft.Checkpoints.rotate("dedup_index_probe",
      incoming.repartition(n, col(idCol))
        .select(col(idCol).as("__qid"),
          Dedup.minhashSignature(col(textCol), k, shingleN).as("__qsig"))
        .select(col("__qid"), col("__qsig"),
          posexplode(Dedup.lshBandKeys(col("__qsig"), bands, k / bands))
            .as(Seq("band", "bkey")))
        .withColumn("bprefix", pmod(col("bkey"), lit(256L)).cast("int")))
    // ≤ 256 distinct values by construction — driver-bounded
    val prefixes = probe.select(col("bprefix")).distinct()
      .collect().map(r => Integer.valueOf(r.getInt(0))).toSeq
    val index = spark.read.parquet(s"$dir/bands")
      .where(col("bprefix").isin(prefixes: _*))
    val hit = probe.join(index, Seq("bprefix", "band", "bkey"))
      .where(col("doc_id") =!= col("__qid"))
      .where(Dedup.estJaccard(col("__qsig"), col("sig"), k) >= threshold)
      .select(col("__qid").as(idCol)).distinct()
    (probe, incoming.join(hit, Seq(idCol), "left_anti"))
  }

  /** Fold time-ordered ingest batches through the persisted index —
    * the loop a growing deployment runs daily, composed from the three
    * primitives above: batch 0 seeds the index; every later batch is
    * QUERIED against the survivors of all earlier batches (docs with an
    * indexed near-duplicate drop) and its own survivors are APPENDED.
    * Returns `(idCol, ingest_batch)` — every kept doc tagged with the
    * batch that brought it in.
    *
    * Semantics pinned by the spec + Python cross-oracle:
    *   - only SURVIVORS are appended, so a doc whose only near-match
    *     was itself dropped earlier still survives (the index holds one
    *     representative per cluster — RefinedWeb's ingest discipline);
    *   - within-batch duplicates are BOTH kept: the index covers the
    *     cross-ingest regime, intra-batch dedup is the batch operators'
    *     job (l2/l26) — run them on the batch first if both are wanted;
    *   - null-text docs always survive and contribute no band rows.
    *
    * Each batch's survivor frame is checkpointed BEFORE its append:
    * `query` is lazy and re-reads `bands/` on every execution, so an
    * unmaterialized survivor plan re-executed after later appends would
    * see a bigger index than existed when its batch arrived. Scale
    * shape: per batch this is l42's probe (batch-sized re-band +
    * partition-pruned scan) + l43's append (row-local) — the corpus is
    * never re-banded, and the append REUSES the probe's checkpointed
    * band rows (a semi-join on survivor ids) instead of computing every
    * survivor's signature a second time: band rows are a deterministic
    * row-local function of the text, so the reused rows are identical
    * to what a fresh `append` would write (the spec pins the fold
    * against `query`+`append` composed the naive way). */
  def ingestFold(
      batches: Seq[DataFrame],
      idCol: String,
      textCol: String,
      dir: String,
      shingleN: Int = 3,
      k: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    require(batches.nonEmpty, "ingestFold needs at least one batch")
    batches.zipWithIndex.map { case (b, i) =>
      val kept =
        if (i == 0) { build(b, idCol, textCol, dir, shingleN, k, bands); b }
        else {
          val (probe, surv) = surviveAgainst(b, idCol, textCol, dir, threshold)
          val s = graft.Checkpoints.rotate(s"dix_ingest_b$i", surv)
          writeBandRows(
            probe.join(s.select(col(idCol).as("__qid")), Seq("__qid"),
                "left_semi")
              .select(col("__qid").as("doc_id"), col("__qsig").as("sig"),
                col("band"), col("bkey"), col("bprefix")),
            dir, overwrite = false)
          s
        }
      kept.select(col(idCol), lit(i).as("ingest_batch"))
    }.reduce(_ unionByName _)
  }

  /** Near-duplicate candidate pairs of the INDEXED corpus with itself —
    * the pair stage of a dedup-groups run answered FROM the persisted
    * band table, zero text scans: the signature rides every band row,
    * so the whole stage is one self-equi-join of `bands/` on
    * (band, bkey) plus the signature-agreement filter. This is what
    * amortizes the batch closure's dominant cost (at 10⁶ docs, pair
    * construction was ~118 s of l26's 126 s — all re-shingling and
    * re-banding work the index already paid at ingest): a repeat dedup
    * run over an indexed corpus pays only this join + the component
    * closure.
    *
    * Pair rule = [[Dedup.minhashLsh]]'s exactly (shared band +
    * estimated agreement ≥ threshold), so on a corpus whose band table
    * was built with the default parameterization the output pair set is
    * identical to `minhashLsh(corpus)` — and the est-rule/exact-rule
    * sets coincide on well-separated corpora (the l2-vs-l4 equality the
    * oracle gate pins at every fixture SF).
    *
    * 100 TB shape: both join sides are partition-aligned scans of the
    * same table; the shuffle keys on (band, bkey) — band-bucket sized,
    * the same skew surface as the banded self-join inside minhashLsh
    * (a boilerplate mass shares band keys; cap upstream by exact-dedup
    * first, the l27/l28 ordering). Pair-level dropDuplicates before
    * the signature compare, as in minhashLsh. */
  def selfPairs(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      threshold: Double = 0.5): DataFrame = {
    val k = spark.read.parquet(s"$dir/meta").collect()(0).getAs[Int]("k")
    val bandsT = spark.read.parquet(s"$dir/bands")
    val a = bandsT.select(col("band"), col("bkey"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = bandsT.select(col("band"), col("bkey"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    // CPU-dense wave sizing ([[Similarity.denseShuffleSides]]): both
    // sides shuffle every band row with its k-long signature payload
    // (~8k+64 B); the row count is a metadata-only parquet count.
    // Below one 64 MB wave the sides come back untouched.
    val (aj, bj) = Similarity.denseShuffleSides(a, b, Seq("band", "bkey"),
      2L * bandsT.count(), 8 * k + 64)
    aj.join(bj, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(Dedup.estJaccard(col("sig_a"), col("sig_b"), k) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Rewrite the band table into one file per prefix directory — the
    * maintenance pass an APPEND-grown index needs: every [[append]] (or
    * [[ingestFold]] batch) adds at least one file to each touched
    * prefix, so a daily-ingest deployment accumulates
    * days × writers small files and the probe's partition-pruned scan
    * pays an open/footer cost per file instead of per prefix. Compact
    * reads `bands/`, rewrites it 1-file-per-prefix into a sibling
    * directory, then swaps directories with two renames (read and write
    * never touch the same path, so the read plan's file listing stays
    * valid throughout). The swap is atomic per rename on a local/HDFS
    * filesystem; an object-store deployment would swap a manifest
    * pointer instead (Iceberg/Delta-style) — the rewrite itself is the
    * portable part. Row content is untouched: a post-compaction query
    * is row-identical (spec-pinned), only the file layout changes. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val tmp = s"$dir/bands_compacting"
    spark.read.parquet(s"$dir/bands")
      // one writer per prefix directory ⇒ exactly one file per prefix
      .repartition(col("bprefix"))
      .write.mode("overwrite").partitionBy("bprefix").parquet(tmp)
    val old = new java.io.File(s"$dir/bands_old")
    def fail(msg: String) = throw new IllegalStateException(msg)
    if (!new java.io.File(s"$dir/bands").renameTo(old))
      fail(s"compact: cannot move $dir/bands aside")
    if (!new java.io.File(tmp).renameTo(new java.io.File(s"$dir/bands"))) {
      old.renameTo(new java.io.File(s"$dir/bands")): Unit // roll back
      fail(s"compact: cannot move $tmp into place")
    }
    def rec(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rec)
      f.delete(): Unit
    }
    rec(old)
  }

  private def meta(df: DataFrame, dir: String): (Int, Int, Int) = {
    val m = df.sparkSession.read.parquet(s"$dir/meta").collect()(0)
    (m.getAs[Int]("k"), m.getAs[Int]("bands"), m.getAs[Int]("shingle_n"))
  }

  private def writeBands(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shingleN: Int,
      k: Int,
      bands: Int,
      overwrite: Boolean): Unit = {
    val n = docs.sparkSession.sparkContext.defaultParallelism
    writeBandRows(
      docs
        // explicit-count repartition: signature compute must spread over
        // the cores even when the input is one parquet row group
        .repartition(n, col(idCol))
        .select(col(idCol).as("doc_id"),
          Dedup.minhashSignature(col(textCol), k, shingleN).as("sig"))
        .select(col("doc_id"), col("sig"),
          posexplode(Dedup.lshBandKeys(col("sig"), bands, k / bands))
            .as(Seq("band", "bkey")))
        .withColumn("bprefix", pmod(col("bkey"), lit(256L)).cast("int")),
      dir, overwrite)
  }

  /** Sink for prepared band rows `(doc_id, sig, band, bkey, bprefix)` —
    * shared by the signature-computing [[writeBands]] and
    * [[ingestFold]]'s probe-row reuse path. */
  private def writeBandRows(
      rows: DataFrame, dir: String, overwrite: Boolean): Unit = {
    rows
      // one writer per prefix directory: without this every task writes
      // into every partition dir — 256·tasks small files per build
      .repartition(col("bprefix"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("bprefix").parquet(s"$dir/bands")
  }
}
