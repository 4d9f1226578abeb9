package graft

import graft.operators.{Dedup, DedupIndex, LlmQueries}
import org.apache.spark.sql.functions._

class DedupIndexSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")

  test("index query equals the batch pair rule restricted to probe × index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dix_spec").toString
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val incoming = docs.filter($"doc_id" % 2 =!= 0)
    DedupIndex.build(corpus, "doc_id", "text", dir)
    val got = DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    // reference semantics: the full-corpus minhashLsh pair set (same
    // constants), restricted to (odd, even) pairs — an odd doc with any
    // even partner at est_jaccard >= 0.5 must drop, everything else
    // must survive
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .collect { case (i, e) if i % 2 != 0 && e % 2 == 0 => i }.toSet
    val all = incoming.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "fixture must exercise the drop rule")
    assert(got == all -- dropped,
      s"extra=${(got -- (all -- dropped)).take(5)} missing=${((all -- dropped) -- got).take(5)}")
    // deterministic (seeded signatures, pure probes)
    val again = DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("append ≡ fresh rebuild; self-guard; prefix pruning reaches the scan") {
    import spark.implicits._
    // l43 (build %4==0 then append %4==2) must be row-identical to l42
    // (fresh build over %2==0): band rows are row-local per doc, no
    // global state to refresh
    val fresh = LlmQueries.l42DedupIndexQuery.run(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val appended = LlmQueries.l43DedupIndexAppend.run(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(fresh == appended, "appended index diverged from fresh rebuild")
    // self-guard: querying the indexed corpus against its own index
    // never drops a doc for matching ITSELF — docs without a distinct
    // near-dup partner all survive
    val dir = java.nio.file.Files.createTempDirectory("dix_self").toString
    val corpus = docs.filter($"doc_id" % 2 === 0)
    DedupIndex.build(corpus, "doc_id", "text", dir)
    val survivors = DedupIndex.query(corpus, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val evenPairs = Dedup.minhashLsh(corpus, "doc_id", "text")
      .collect().flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val evenAll = corpus.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == evenAll -- evenPairs,
      "self-query must drop exactly the docs with a DISTINCT near-dup partner")
    // the serving claim: the probe's band prefixes reach the index scan
    // as partition filters (directory pruning, not a full-table scan)
    val tiny = docs.filter($"doc_id" % 2 =!= 0).limit(3)
    val plan = DedupIndex.query(tiny, "doc_id", "text", dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bprefix"),
      s"expected bprefix partition filters in the index scan:\n${plan.take(1500)}")
  }

  test("query broadcasts a batch-sized probe; shuffle branch is result-identical") {
    import spark.implicits._
    // the round-15 10⁷ root cause: without the probe-side broadcast the
    // planner sort-merges, shuffling the ENTIRE index scan for a
    // 500-doc probe (26 GB spill at 10⁷ — AQE's BHJ conversion lands
    // after the big side's shuffle write). Pin (a) the default plan
    // broadcasts the probe, (b) forcing the over-cap branch through the
    // session conf yields the identical survivor set.
    val dir = java.nio.file.Files.createTempDirectory("dix_bcast").toString
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val incoming = docs.filter($"doc_id" % 2 =!= 0)
    DedupIndex.build(corpus, "doc_id", "text", dir)
    val q = DedupIndex.query(incoming, "doc_id", "text", dir)
    assert(q.queryExecution.executedPlan.toString.contains("Broadcast"),
      "batch-sized probe must be the broadcast side of the index join")
    val broadcast = q.select($"doc_id").collect().map(_.getLong(0)).toSet
    spark.conf.set(DedupIndex.BroadcastProbeCapKey, "-1")
    try {
      val shuffled = DedupIndex.query(incoming, "doc_id", "text", dir)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(shuffled == broadcast,
        "shuffle-branch survivors diverged from the broadcast branch")
    } finally spark.conf.unset(DedupIndex.BroadcastProbeCapKey)
  }

  test("ingestFold ≡ naive query+append composition; probe-row reuse writes identical bands") {
    import spark.implicits._
    val batches = (0 to 3).map(i => docs.filter(pmod($"doc_id", lit(4)) === i))
    // the fold (probe-row-reuse append path)
    val foldDir = java.nio.file.Files.createTempDirectory("dix_fold").toString
    val fold = DedupIndex.ingestFold(batches, "doc_id", "text", foldDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the same schedule composed naively from the public primitives,
    // with appends that RECOMPUTE survivor signatures from text
    val naiveDir = java.nio.file.Files.createTempDirectory("dix_naive").toString
    var expected = Map.empty[Long, Int]
    batches.zipWithIndex.foreach { case (b, i) =>
      val kept =
        if (i == 0) { DedupIndex.build(b, "doc_id", "text", naiveDir); b }
        else {
          val s = DedupIndex.query(b, "doc_id", "text", naiveDir)
            .localCheckpoint()
          DedupIndex.append(s, "doc_id", "text", naiveDir)
          s
        }
      expected ++= kept.select($"doc_id").collect().map(_.getLong(0) -> i)
    }
    assert(fold.nonEmpty && fold.size < docs.count(),
      "fixture must exercise both keep and drop")
    assert(fold == expected, {
      val extra = fold.toSet -- expected.toSet
      val missing = expected.toSet -- fold.toSet
      s"fold diverged: extra=${extra.take(5)} missing=${missing.take(5)}"
    })
    // and the reused band rows persisted by the fold are row-identical
    // to the recomputed ones (same sig, band, bkey, bprefix per doc)
    val canon = (d: String) => DedupIndex.readBands(spark, d)
      .select($"doc_id", $"sig", $"band", $"bkey", $"bprefix")
      .collect().map(_.toSeq).toSet
    assert(canon(foldDir) == canon(naiveDir),
      "probe-row-reuse append wrote different band rows than the recompute path")
  }

  test("compact: append-grown index collapses to one segment with one file per prefix, rows and query identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dix_compact").toString
    DedupIndex.build(docs.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    DedupIndex.append(docs.filter($"doc_id" % 4 === 2), "doc_id", "text", dir)
    DedupIndex.append(docs.filter($"doc_id" % 4 === 1), "doc_id", "text", dir)
    def parquetFiles(prefixDir: java.io.File): Int =
      prefixDir.listFiles().count(f => f.getName.endsWith(".parquet"))
    def prefixDirs: Seq[java.io.File] =
      DedupIndex.readManifest(dir).segments
        .flatMap(s => Option(new java.io.File(s"$dir/$s").listFiles()).toSeq.flatten)
        .filter(f => f.isDirectory && f.getName.startsWith("bprefix="))
    assert(DedupIndex.readManifest(dir).segments.size == 3,
      "three writes must be three live segments pre-compaction")
    val incoming = docs.filter($"doc_id" % 4 === 3)
    val before = DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val rowsBefore = DedupIndex.readBands(spark, dir)
      .collect().map(_.toSeq).toSet

    DedupIndex.compact(spark, dir)

    val m = DedupIndex.readManifest(dir)
    assert(m.segments.size == 1 && m.tombstones.isEmpty,
      s"compaction must publish exactly one segment, got $m")
    assert(prefixDirs.nonEmpty && prefixDirs.forall(parquetFiles(_) == 1),
      "every prefix directory must hold exactly one file post-compaction")
    val rowsAfter = DedupIndex.readBands(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(rowsAfter == rowsBefore, "compaction must not change row content")
    val after = DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(after == before, "query results must be identical post-compaction")
    // vacuum reclaims the pre-compaction segment directories (now
    // unreferenced) and leaves the live generation + meta intact
    DedupIndex.vacuum(dir)
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(left == Set("MANIFEST", s"MANIFEST.v${m.version}", m.meta) ++ m.segments,
      s"vacuum left unexpected entries: $left")
    assert(DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet == before)
  }

  test("delete: every read path ≡ fresh build without the deleted docs; compact materializes") {
    import spark.implicits._
    // the parity law behind l57: build full, delete a slice, and the
    // index must answer query/selfPairs EXACTLY as a fresh index built
    // over corpus-minus-deleted would
    val dir = java.nio.file.Files.createTempDirectory("dix_del").toString
    DedupIndex.build(docs, "doc_id", "text", dir)
    val deleted = docs.filter($"doc_id" % 5 === 2).select($"doc_id")
    DedupIndex.delete(deleted, "doc_id", dir)
    val refDir = java.nio.file.Files.createTempDirectory("dix_del_ref").toString
    DedupIndex.build(docs.filter($"doc_id" % 5 =!= 2), "doc_id", "text", refDir)

    val pairsGot = DedupIndex.selfPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairsRef = DedupIndex.selfPairs(spark, refDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsGot == pairsRef,
      s"extra=${(pairsGot -- pairsRef).take(5)} missing=${(pairsRef -- pairsGot).take(5)}")
    assert(pairsGot.nonEmpty, "fixture must keep some pairs post-delete")
    // the delete must actually remove pair coverage (some pair involved
    // a deleted doc), or the fixture proves nothing
    val pairsFull = Dedup.minhashLsh(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairsFull != pairsGot, "deleted slice must have carried pairs")

    val probe = docs.filter($"doc_id" % 5 === 4)
    val qGot = DedupIndex.query(probe, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val qRef = DedupIndex.query(probe, "doc_id", "text", refDir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(qGot == qRef, "query through tombstones diverged from rebuild")
    // re-delete is idempotent
    DedupIndex.delete(deleted, "doc_id", dir)
    assert(DedupIndex.selfPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsGot)
    // compact materializes the tombstones: band rows shrink to the
    // surviving docs and the tombstone list empties, same answers
    DedupIndex.compact(spark, dir)
    val m = DedupIndex.readManifest(dir)
    assert(m.tombstones.isEmpty && m.segments.size == 1)
    val delIds = deleted.collect().map(_.getLong(0)).toSet
    val liveIds = DedupIndex.readBands(spark, dir)
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(liveIds.intersect(delIds).isEmpty,
      "compaction must physically drop tombstoned docs")
    assert(DedupIndex.selfPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == pairsGot)
  }

  test("manifest swap: a reader that resolved before a compact keeps its generation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dix_gen").toString
    DedupIndex.build(docs.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    DedupIndex.append(docs.filter($"doc_id" % 4 === 2), "doc_id", "text", dir)
    // resolve NOW: the returned frame is pinned to this manifest
    val pinned = DedupIndex.readBands(spark, dir)
    val expect = pinned.count()
    // a concurrent writer compacts AND appends a new batch
    DedupIndex.compact(spark, dir)
    DedupIndex.append(docs.filter($"doc_id" % 4 === 1), "doc_id", "text", dir)
    // the pinned reader still sees exactly the generation it opened
    // (its old segment directories were swapped out of the manifest but
    // never touched — vacuum is deliberately separate)
    assert(pinned.count() == expect,
      "reader resolved pre-compact must keep seeing its own generation")
    // a fresh resolve sees the post-append state: one compacted segment
    // + one appended segment, covering %4∈{0,1,2}
    val now = DedupIndex.readManifest(dir)
    assert(now.segments.size == 2, s"got $now")
    val ids = DedupIndex.readBands(spark, dir)
      .select($"doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 4 != 3) && ids.exists(_ % 4 == 1))
  }

  test("selfPairs from the index equals minhashLsh's pair set (the l55 pair stage)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dix_selfpairs").toString
    DedupIndex.build(docs, "doc_id", "text", dir)
    val fromIndex = DedupIndex.selfPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same constants, same pair rule (shared band + est agreement >=
    // 0.5), so the index self-join must reproduce the batch operator's
    // pair set exactly — the equality that lets l55 share l26's oracle
    val batch = Dedup.minhashLsh(docs, "doc_id", "text")
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromIndex.nonEmpty, "fixture must produce near-dup pairs")
    assert(fromIndex == batch,
      s"extra=${(fromIndex -- batch).take(5)} missing=${(batch -- fromIndex).take(5)}")
  }

  test("band segments carry bkey bloom filters: footer offsets present, filter readable, members hit") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("dix_bloom").toString
    DedupIndex.build(docs.filter($"doc_id" % 3 === 0), "doc_id", "text", dir)
    val seg = DedupIndex.readManifest(dir).segments.head
    val pfile = new java.io.File(s"$dir/$seg").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bprefix="))
      .head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pfile.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val bkeyChunks = blocks.flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == "bkey")
      assert(bkeyChunks.nonEmpty &&
        bkeyChunks.forall(_.getBloomFilterOffset >= 0),
        "every bkey column chunk must carry a bloom filter offset")
      // the filter is readable and reports an INDEXED key as a member
      // (the property pushed-Eq row-group filtering relies on)
      val aKey = spark.read.parquet(pfile.getAbsolutePath)
        .select($"bkey").head().getLong(0)
      val bf = reader.readBloomFilter(bkeyChunks.head)
      assert(bf != null && bf.findHash(bf.hash(aKey)),
        "bloom filter must contain a key the chunk actually holds")
    } finally reader.close()
  }

  test("selfPairs edge inputs: exact twins pair, null-text and disjoint docs contribute nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dix_selfpairs_edge").toString
    val tiny = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),        // exact twin of 1 — must pair
      (3L, null.asInstanceOf[String]), // null text — no band rows at build
      (4L, "z y x w v u t s"))         // disjoint shingles — no shared band
      .toDF("doc_id", "text")
    DedupIndex.build(tiny, "doc_id", "text", dir)
    val pairs = DedupIndex.selfPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // id ordering canonical (id_a < id_b), no self-pairs by construction
    assert(pairs.forall { case (a, b) => a < b })
  }
}
