package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed MAINTAINED TABLE — the commit primitive for the
  * incremental tiers' state (the s12 HLL sketch table, the s13 quantile
  * bucket table, any read-merge-publish fold): each publish writes the
  * new state into a FRESH generation directory and swaps one pointer
  * file, so
  *
  *   - a reader mid-publish sees the old generation or the new one,
  *     never a half-written overwrite (the plain `mode("overwrite")`
  *     read-merge-overwrite loop deletes files under concurrent
  *     readers);
  *   - the EXACTLY-ONCE stamp rides the same swap: `publish` records
  *     the micro-batch id in the manifest, so "state updated" and
  *     "batch committed" are one atomic event — a redelivered batch is
  *     skipped by reading the stamp back ([[lastBatchId]]), replacing
  *     the separate marker-file dance (write state, then mark) whose
  *     window between the two writes is exactly where a crash breaks
  *     exactly-once for non-idempotent folds (count sums; HLL maxima
  *     only tolerate it by accident of idempotence);
  *   - snapshot reads and retention come for free, the same
  *     `MANIFEST.v<N>` + retention-vacuum scheme as [[DedupIndex]] and
  *     [[AnnStore]].
  *
  * This is the [[DedupIndex]]/[[AnnStore]] commit discipline with a
  * whole-table generation instead of segment lists — right for state
  * that each fold REWRITES (merged sketch tables are cell-grained and
  * small); the index tiers keep their segmented form because their data
  * is append-mostly and corpus-sized. Single-writer contract as
  * everywhere: the swap is atomic for readers; concurrent writers need
  * an external lock (object-store: conditional PUT of the pointer). */
object StateTable {

  final case class Manifest(version: Long, gen: String, batchId: Option[Long])

  private def pointer(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, "MANIFEST")

  def exists(dir: String): Boolean =
    java.nio.file.Files.exists(pointer(dir))

  private def parse(lines: Array[String]): Manifest =
    Manifest(lines(0).trim.toLong, lines(1).trim,
      Option(lines(2).trim).filter(s => s.nonEmpty && s != "-").map(_.toLong))

  def readManifest(dir: String): Manifest =
    parse(java.nio.file.Files.readAllLines(pointer(dir))
      .toArray(Array.empty[String]))

  /** Snapshot manifest of a past publish (retention permitting). */
  def readManifestAt(dir: String, version: Long): Manifest =
    parse(java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(dir, s"MANIFEST.v$version"))
      .toArray(Array.empty[String]))

  /** The batch id stamped by the latest publish — the exactly-once
    * check: a foreachBatch sink skips a redelivered batch iff
    * `lastBatchId(dir).exists(_ >= bid)` (batch ids are monotone). */
  def lastBatchId(dir: String): Option[Long] =
    if (!exists(dir)) None else readManifest(dir).batchId

  /** The current state. One pointer resolve — the DataFrame keeps
    * seeing its generation even if a publish lands mid-query. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/${readManifest(dir).gen}")

  /** A past state, exactly as committed. */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame =
    spark.read.parquet(s"$dir/${readManifestAt(dir, version).gen}")

  /** Commit a new state: materialize `state` into a fresh generation
    * directory, then swap the pointer (with the optional micro-batch
    * stamp) in one atomic rename. Reading the CURRENT state while
    * computing `state` is safe — the write targets a different
    * directory, so no localCheckpoint fence is needed. Returns the new
    * version. */
  def publish(state: DataFrame, dir: String, batchId: Option[Long] = None): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val v = if (exists(dir)) readManifest(dir).version + 1 else 1L
    val gen = s"gen_$v"
    state.write.mode("overwrite").parquet(s"$dir/$gen")
    val lines = java.util.Arrays.asList(
      v.toString, gen, batchId.map(_.toString).getOrElse("-"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"MANIFEST.v$v"), lines)
    val tmp = java.nio.file.Paths.get(
      dir, s"MANIFEST.tmp.${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp, lines)
    java.nio.file.Files.move(tmp, pointer(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    v
  }

  /** Drop generations and snapshot manifests outside the retention
    * window (same contract as the index tiers' vacuum: run when old
    * readers are drained). */
  def vacuum(dir: String, retainVersions: Int = 0): Unit = {
    val cur = readManifest(dir)
    val retained = (cur.version - retainVersions).max(1L) to cur.version
    val live = retained.flatMap { v =>
      val gens = if (v == cur.version) Seq(cur.gen)
      else try Seq(readManifestAt(dir, v).gen)
      catch { case _: java.io.IOException => Nil }
      gens :+ s"MANIFEST.v$v"
    }.toSet + "MANIFEST"
    def rec(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rec)
      f.delete(): Unit
    }
    val kids = new java.io.File(dir).listFiles()
    if (kids != null)
      kids.filterNot(f => live.contains(f.getName)).foreach(rec)
  }
}
