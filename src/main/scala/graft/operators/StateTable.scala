package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed MAINTAINED TABLE — the commit primitive for the
  * incremental tiers' state (the s12 HLL sketch table, the s13 quantile
  * bucket table, any read-merge-publish fold): each publish writes the
  * new state into a FRESH generation directory and swaps one pointer
  * file (via [[ManifestCommit]] — the shared Hadoop-FileSystem commit
  * module, so the store runs against `file://`/`hdfs://` URIs, not just
  * local paths), so
  *
  *   - a reader mid-publish sees the old generation or the new one,
  *     never a half-written overwrite (the plain `mode("overwrite")`
  *     read-merge-overwrite loop deletes files under concurrent
  *     readers);
  *   - the EXACTLY-ONCE stamp rides the same swap: `publish` records
  *     the micro-batch id in the manifest, so "state updated" and
  *     "batch committed" are one atomic event — a redelivered batch is
  *     skipped by reading the stamp back ([[lastBatchId]]). The stamp
  *     means "highest ingest batch APPLIED", not "was the last
  *     mutation a batch": an unstamped publish (a manual fix-up, a
  *     compaction) CARRIES the stamp forward, because the batches it
  *     folded in are still applied — clearing it would let a
  *     redelivered batch through the `exists(_ >= bid)` guard and
  *     double-apply a non-idempotent fold (count sums corrupt; HLL
  *     maxima only tolerate it by accident of idempotence);
  *   - snapshot reads and retention come for free, the same
  *     `MANIFEST.v<N>` + retention-vacuum scheme as [[DedupIndex]] and
  *     [[AnnStore]].
  *
  * This is the [[DedupIndex]]/[[AnnStore]] commit discipline with a
  * whole-table generation instead of segment lists — right for state
  * that each fold REWRITES (merged sketch tables are cell-grained and
  * small); the index tiers keep their segmented form because their data
  * is append-mostly and corpus-sized. Because a publish REPLACES the
  * state wholesale, a lost commit race cannot be list-merged: publish
  * claims exactly one version and throws
  * [[ManifestCommit.CommitConflict]] when another writer got there
  * first — the caller re-reads and re-folds (`expectedVersion` makes
  * the read-state→publish window explicit for callers that want to pin
  * it). The streaming sinks are single-writer per checkpoint, so the
  * conflict path never fires there. */
object StateTable {

  final case class Manifest(version: Long, gen: String, batchId: Option[Long])

  /** Layout version tag, line 1 of every manifest (line 0 stays the
    * commit version — the protocol-wide convention [[ManifestCommit]]
    * readers depend on). A future layout change bumps the tag, so old
    * stores fail LOUDLY at parse instead of being misread silently.
    * Stores written before tagging shipped (no tag line; fields one
    * position earlier) are still readable: a generation name can never
    * collide with the `graft-state-table/` prefix, so the legacy layout
    * is unambiguous — a DIFFERENT tag under the prefix (a future
    * layout) is the only loud-fail case. */
  private[graft] val FormatTag = "graft-state-table/1"
  private val TagPrefix = "graft-state-table/"

  private def parse(lines: Array[String]): Manifest = {
    def opt(s: String): Option[Long] =
      Option(s.trim).filter(x => x.nonEmpty && x != "-").map(_.toLong)
    val tag = if (lines.length > 1) lines(1).trim else ""
    if (tag == FormatTag)
      Manifest(lines(0).trim.toLong, lines(2).trim,
        if (lines.length > 3) opt(lines(3)) else None)
    else if (tag.startsWith(TagPrefix))
      throw new IllegalArgumentException(
        s"unrecognized state-table manifest format '$tag' — this reader " +
          s"understands $FormatTag (layout change?)")
    else // pre-tag legacy layout: version, gen, batchId
      Manifest(lines(0).trim.toLong, lines(1).trim,
        if (lines.length > 2) opt(lines(2)) else None)
  }

  private def serialize(m: Manifest): Seq[String] = Seq(
    m.version.toString, FormatTag, m.gen,
    m.batchId.map(_.toString).getOrElse("-"))

  def exists(dir: String): Boolean = ManifestCommit.exists(dir)

  def readManifest(dir: String): Manifest =
    parse(ManifestCommit.readPointer(dir))

  /** Snapshot manifest of a past publish (retention permitting). */
  def readManifestAt(dir: String, version: Long): Manifest =
    parse(ManifestCommit.readVersioned(dir, version))

  /** The highest batch id any committed publish has applied — the
    * exactly-once check: a foreachBatch sink skips a redelivered batch
    * iff `lastBatchId(dir).exists(_ >= bid)` (batch ids are monotone).
    * Survives unstamped publishes in between (see the object doc). */
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
    * directory, then claim the next version and swap the pointer in one
    * atomic rename. Reading the CURRENT state while computing `state`
    * is safe — the write targets a different directory, so no
    * localCheckpoint fence is needed. Returns the new version.
    *
    * `expectedVersion`: optimistic-concurrency pin — when set, the
    * publish throws [[ManifestCommit.CommitConflict]] unless the store
    * is still at that version, closing the read→fold→publish window
    * against a concurrent writer (whole-state rewrites cannot be
    * merged; the caller must re-read and re-fold). Unset, the publish
    * still claims its version atomically — a concurrent publish makes
    * one of the two writers throw rather than silently dropping the
    * other's state. */
  def publish(
      state: DataFrame,
      dir: String,
      batchId: Option[Long] = None,
      expectedVersion: Option[Long] = None): Long = {
    val cur = if (exists(dir)) Some(readManifest(dir)) else None
    val curV = cur.map(_.version).getOrElse(0L)
    expectedVersion.foreach { ev =>
      if (curV != ev)
        throw new ManifestCommit.CommitConflict(
          s"state table at $dir is at version $curV, expected $ev — " +
            "re-read and re-fold")
    }
    val v = curV + 1
    val gen = ManifestCommit.uniqueName("gen", v)
    state.write.mode("overwrite").parquet(s"$dir/$gen")
    // stamp = highest batch applied; carried through unstamped publishes
    val stamp = (cur.flatMap(_.batchId).toSeq ++ batchId.toSeq)
      .reduceOption(_ max _)
    ManifestCommit.commit(dir, v, serialize(Manifest(v, gen, stamp)))
    v
  }

  /** Drop generations and snapshot manifests outside the retention
    * window. Unreferenced directories younger than `minAgeMs` survive —
    * they may be a concurrent publish's generation, written ahead of
    * its commit (the [[ManifestCommit.vacuum]] in-flight age guard). */
  def vacuum(
      dir: String,
      retainVersions: Int = 0,
      minAgeMs: Long = ManifestCommit.DefaultVacuumMinAgeMs): Unit =
    ManifestCommit.vacuum(dir, lines => Seq(parse(lines).gen),
      Set.empty, retainVersions, minAgeMs)
}
