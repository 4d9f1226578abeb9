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
    val canon = (d: String) => spark.read.parquet(s"$d/bands")
      .select($"doc_id", $"sig", $"band", $"bkey", $"bprefix")
      .collect().map(_.toSeq).toSet
    assert(canon(foldDir) == canon(naiveDir),
      "probe-row-reuse append wrote different band rows than the recompute path")
  }

  test("compact: append-grown index collapses to one file per prefix, rows and query identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dix_compact").toString
    DedupIndex.build(docs.filter($"doc_id" % 4 === 0), "doc_id", "text", dir)
    DedupIndex.append(docs.filter($"doc_id" % 4 === 2), "doc_id", "text", dir)
    DedupIndex.append(docs.filter($"doc_id" % 4 === 1), "doc_id", "text", dir)
    def parquetFiles(prefixDir: java.io.File): Int =
      prefixDir.listFiles().count(f => f.getName.endsWith(".parquet"))
    def prefixDirs: Seq[java.io.File] = new java.io.File(s"$dir/bands")
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("bprefix="))
      .toSeq
    assert(prefixDirs.exists(parquetFiles(_) > 1),
      "fixture must exercise fragmentation (3 writes should fragment some prefix)")
    val incoming = docs.filter($"doc_id" % 4 === 3)
    val before = DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val rowsBefore = spark.read.parquet(s"$dir/bands")
      .collect().map(_.toSeq).toSet

    DedupIndex.compact(spark, dir)

    assert(prefixDirs.nonEmpty && prefixDirs.forall(parquetFiles(_) == 1),
      "every prefix directory must hold exactly one file post-compaction")
    assert(!new java.io.File(s"$dir/bands_old").exists())
    assert(!new java.io.File(s"$dir/bands_compacting").exists())
    val rowsAfter = spark.read.parquet(s"$dir/bands")
      .collect().map(_.toSeq).toSet
    assert(rowsAfter == rowsBefore, "compaction must not change row content")
    val after = DedupIndex.query(incoming, "doc_id", "text", dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(after == before, "query results must be identical post-compaction")
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
