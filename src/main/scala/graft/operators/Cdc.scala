package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the storage-dedup primitive that
  * splits a byte stream at positions chosen by a rolling hash of the
  * content itself (Gear hashing; Xia et al., "FastCDC", USENIX ATC
  * 2016), so that an insertion or deletion only moves the boundaries
  * inside its own neighborhood: unlike fixed windows, every chunk
  * after the edit re-aligns and its hash keeps matching. That makes
  * per-chunk fingerprints the right ledger for deduplicating documents
  * that are near-copies with local edits (changelogs, wiki revisions,
  * boilerplate with injected dates) — the regime where whole-document
  * hashing (l9) sees nothing and shingle overlap (l4) pays a pairwise
  * comparison.
  *
  * Semantics (pinned so tools/check_oracle.py re-derives every byte):
  * over the UTF-8 bytes of the text, roll `h = (h << 1) + gear(byte)`
  * (gear = 256 fixed splitmix64 constants); after at least `minSize`
  * bytes, a boundary falls where `(h & mask) == 0` with
  * `mask = 2^avgBits − 1`; a chunk never exceeds `maxSize` bytes (a
  * forced cut, h resets). The final chunk is whatever remains (may be
  * shorter than minSize). Each chunk reports its byte offset, byte
  * length, and FNV-1a fingerprint over its bytes. Expected chunk size
  * ≈ minSize + 2^avgBits.
  *
  * Scale shape: entirely ROW-LOCAL — one tight byte loop per document
  * inside a UDF, no shuffle, no state; the downstream ledger join
  * (`chunk_fp` equi-join or hash-agg) is the only exchange, exactly
  * like the shingle tiers. Deterministic end to end (fixed gear table,
  * integer arithmetic), so the whole chunk table is cross-checked
  * value-exactly by the independent Python reimplementation. */
object Cdc {

  /** 256 gear constants: a splitmix64 stream rooted at a constant
    * distinct from the Bloom64/CountMin seed origins. Fixed forever —
    * chunk boundaries and fingerprints are persisted-ledger state. */
  private[graft] val gear: Array[Long] =
    Array.tabulate(256)(i =>
      graft.functions.Bloom64.mix(0x9e6c63d0a2849b1fL + i.toLong * 0x9e3779b97f4a7c15L))

  /** Chunk [off, off+len) byte spans of `bytes`; returns parallel
    * (offsets, lengths, fnv fingerprints). */
  private[graft] def chunkSpans(
      bytes: Array[Byte],
      minSize: Int,
      avgBits: Int,
      maxSize: Int): (Array[Int], Array[Int], Array[Long]) = {
    val mask = (1L << avgBits) - 1
    val offs = new scala.collection.mutable.ArrayBuffer[Int]
    val lens = new scala.collection.mutable.ArrayBuffer[Int]
    val fps = new scala.collection.mutable.ArrayBuffer[Long]
    var start = 0
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= minSize && (h & mask) == 0L) || len >= maxSize) {
        offs += start; lens += len
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < bytes.length) { // empty text yields no chunks
      offs += start; lens += bytes.length - start
    }
    // FNV-1a over each chunk's bytes
    var c = 0
    while (c < offs.length) {
      var fp = 0xcbf29ce484222325L
      var j = offs(c)
      val end = offs(c) + lens(c)
      while (j < end) { fp = (fp ^ (bytes(j) & 0xffL)) * 0x100000001b3L; j += 1 }
      fps += fp
      c += 1
    }
    (offs.toArray, lens.toArray, fps.toArray)
  }

  /** One row per chunk: (id, chunk_idx, chunk_off, chunk_len,
    * chunk_fp). Null text yields no rows. Offsets/lengths are BYTE
    * positions in the UTF-8 encoding (the chunker's native axis —
    * boundaries may split a multi-byte sequence; the fingerprint is
    * over bytes, so dedup semantics are unaffected). */
  def chunkTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 32,
      avgBits: Int = 6,
      maxSize: Int = 256): DataFrame = {
    require(minSize >= 1 && maxSize >= minSize,
      s"need 1 <= minSize <= maxSize, got ($minSize, $maxSize)")
    require(avgBits >= 1 && avgBits <= 48, s"avgBits out of range: $avgBits")
    val chunks = udf { (text: String) =>
      if (text == null) Array.empty[(Int, Int, Long)]
      else {
        val (o, l, f) = chunkSpans(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          minSize, avgBits, maxSize)
        Array.tabulate(o.length)(i => (o(i), l(i), f(i)))
      }
    }
    docs
      .select(col(idCol), posexplode(chunks(col(textCol))).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c")("_1").cast("long").as("chunk_off"),
        col("c")("_2").cast("long").as("chunk_len"),
        col("c")("_3").as("chunk_fp"))
  }

  /** The cross-document chunk-level dedup ledger: per document, how
    * much of its byte volume is covered by chunks that also appear in
    * some OTHER document (the CDC dedup ratio — what a chunk store
    * would save). One hash-agg over the chunk table (map-side combine)
    * + one broadcast-able join back; `shared_bytes / total_bytes` is a
    * single exact-integer division. */
  def chunkDedupStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minSize: Int = 32,
      avgBits: Int = 6,
      maxSize: Int = 256): DataFrame = {
    val ch = chunkTable(docs, idCol, textCol, minSize, avgBits, maxSize)
    // a chunk is "shared" when its fingerprint appears in >= 2 distinct
    // docs; count distinct docs per fp, then roll up per doc
    val owners = ch.groupBy(col("chunk_fp"))
      .agg(countDistinct(col(idCol)).as("n_owner_docs"))
    ch.join(owners, "chunk_fp")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("total_bytes"),
        sum(when(col("n_owner_docs") >= 2, col("chunk_len")).otherwise(0L))
          .as("shared_bytes"))
      .withColumn("shared_frac",
        when(col("total_bytes") === 0, lit(0.0))
          .otherwise(round(col("shared_bytes").cast("double") / col("total_bytes"), 6)))
  }
}
