package graft.operators

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** THE manifest-commit primitive shared by every persisted tier
  * ([[DedupIndex]], [[AnnStore]], [[StateTable]]) — one implementation
  * of the pointer-swap commit protocol, on the Hadoop [[FileSystem]] /
  * [[FileContext]] API so the SAME code runs against `file://`,
  * `hdfs://`, or any other registered scheme (the former per-store
  * `java.nio` copies could only open local paths — on the tier whose
  * entire rationale is the object store).
  *
  * Protocol (Delta/Iceberg-shaped, two files per commit):
  *
  *   1. The writer prepares its DATA in fresh, uniquely-named
  *      directories ([[uniqueName]] — a random suffix so two concurrent
  *      writers can never collide on a data path, whatever versions
  *      they end up committing as).
  *   2. `MANIFEST.v<N>` — the immutable versioned manifest — is CLAIMED
  *      by writing the full manifest to a temp name and renaming it
  *      onto the versioned name with overwrite FORBIDDEN
  *      ([[Options.Rename.NONE]]). Exactly one writer can own a
  *      version: the rename is atomic on HDFS (namenode) and local FS
  *      (one rename syscall; the existence pre-check in
  *      `AbstractFileSystem.renameInternal` closes the window to a
  *      best-effort on concurrent local writers — same caveat Delta
  *      documents); on S3A the put-if-absent needs the store's
  *      conditional PUT (single-writer there, documented). Because the
  *      claim renames a COMPLETE file, a version that exists is always
  *      fully readable — the loser of a race reads `MANIFEST.v<N>` to
  *      learn the winner's state and retries at N+1 with a merged
  *      manifest ([[commitLoop]]).
  *   3. The `MANIFEST` pointer — the current-state cache — is swapped
  *      by a rename WITH overwrite ([[Options.Rename.OVERWRITE]]).
  *      The versioned log is the source of truth; the pointer swap is
  *      skipped when it already names a newer version, so a stalled
  *      early writer cannot regress a later commit (the remaining
  *      read-then-rename window only ever shows a reader a slightly
  *      stale — still fully committed — version).
  *
  * Write path detail: manifests are written through a PRIVATE
  * FileSystem instance with checksums disabled — on the local scheme
  * the default `ChecksumFileSystem` would strew `.crc` sidecars through
  * the store directory (object stores and HDFS have no such sidecar);
  * the instance is private ([[FileSystem.newInstance]]) so the setting
  * never leaks into Spark's own cached FileSystem.
  *
  * [[vacuum]] distinguishes three kinds of non-live entry:
  *   - manifests/directories REFERENCED by some on-disk manifest
  *     version outside the retention window — published garbage,
  *     reclaimed immediately;
  *   - directories referenced by NO manifest at all — either an
  *     in-flight writer's not-yet-committed data or a crashed writer's
  *     orphan: reclaimed only past [[DefaultVacuumMinAgeMs]] (the age
  *     guard; a vacuum racing a live append must not eat the segment
  *     the append is about to commit);
  *   - hidden (dot-prefixed) entries — never touched.
  */
object ManifestCommit {

  /** A publish lost the version-claim race (or an expected-version
    * check failed): the caller's base state is stale. Recoverable —
    * re-read the current state and retry (what [[commitLoop]] does
    * automatically for mergeable mutations); whole-state rewrites
    * (compact, StateTable folds) must recompute instead. */
  final class CommitConflict(msg: String) extends RuntimeException(msg)

  /** Age below which an UNREFERENCED directory survives [[vacuum]]:
    * it may be an in-flight writer's data, written ahead of its commit.
    * One hour covers any realistic single-commit write; a crashed
    * writer's orphans fall to the next vacuum after aging out. */
  val DefaultVacuumMinAgeMs: Long = 60L * 60 * 1000

  /** The Hadoop configuration in force: the active Spark session's, so
    * a store addressed under a non-default scheme or customized FS
    * config commits through exactly the filesystems the data plane
    * (spark.read/write) uses. */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  // private per-scheme instances (never Spark's cached ones — we
  // disable write checksums, see the scaladoc)
  private val fsCache = scala.collection.concurrent.TrieMap.empty[String, FileSystem]

  private[operators] def fsFor(dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val conf = hadoopConf
    val uri = p.toUri
    val key = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
    val f = fsCache.getOrElseUpdate(key, {
      val inst = FileSystem.newInstance(p.getFileSystem(conf).getUri, conf)
      inst.setWriteChecksum(false)
      inst.setVerifyChecksum(false)
      inst
    })
    (f, f.makeQualified(p))
  }

  private def fcFor(p: Path): FileContext =
    FileContext.getFileContext(p.toUri, hadoopConf)

  private def pointer(base: Path): Path = new Path(base, "MANIFEST")

  /** Does the store at `dir` have a committed state? One pointer stat,
    * falling back to the versioned log (the pointer is a cache; a
    * racing swap may leave it momentarily absent on schemes whose
    * overwrite-rename is not one atomic operation). */
  def exists(dir: String): Boolean = {
    val (f, base) = fsFor(dir)
    f.exists(pointer(base)) || latestVersionOnDisk(f, base).isDefined
  }

  private def latestVersionOnDisk(f: FileSystem, base: Path): Option[Long] =
    try {
      val vPat = "MANIFEST\\.v(\\d+)".r
      f.listStatus(base).iterator.flatMap(e =>
        e.getPath.getName match {
          case vPat(n) => Some(n.toLong)
          case _ => None
        }).reduceOption(_ max _)
    } catch { case _: java.io.IOException => None }

  private def readLines(f: FileSystem, p: Path): Array[String] = {
    val in = f.open(p)
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
    finally in.close()
  }

  private def writeLines(f: FileSystem, p: Path, lines: Seq[String]): Unit = {
    val out = f.create(p, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Current manifest lines (the pointer). One small driver-side read —
    * the 100 TB analog is one GET of the pointer object. The pointer is
    * a CACHE over the versioned log: if it is momentarily absent (a
    * racing swap on a scheme whose overwrite-rename decomposes into
    * delete+rename) the read self-heals from the highest `MANIFEST.v<N>`
    * on disk — the committed truth. */
  def readPointer(dir: String): Array[String] = {
    val (f, base) = fsFor(dir)
    try readLines(f, pointer(base))
    catch {
      case e: java.io.FileNotFoundException =>
        latestVersionOnDisk(f, base) match {
          case Some(v) => readLines(f, new Path(base, s"MANIFEST.v$v"))
          case None => throw e
        }
    }
  }

  /** The immutable manifest of a PAST version (snapshot read / time
    * travel). Throws FileNotFoundException if never published or
    * vacuumed away. */
  def readVersioned(dir: String, version: Long): Array[String] = {
    val (f, base) = fsFor(dir)
    readLines(f, new Path(base, s"MANIFEST.v$version"))
  }

  /** Committed version of the pointer, 0 when the store is empty. */
  def currentVersion(dir: String): Long =
    if (exists(dir)) readPointer(dir)(0).trim.toLong else 0L

  /** A fresh data-directory name for a commit targeting version `v`:
    * version-stamped for the human reading a listing, random-suffixed
    * so concurrent writers (who may both be preparing "version v+1")
    * can never collide on a data path. The manifest references names,
    * not conventions — the suffix is free. */
  def uniqueName(prefix: String, v: Long): String =
    s"${prefix}_${v}_${UUID.randomUUID().toString.take(8)}"

  /** Try to commit `lines` as version `v`: claim `MANIFEST.v<v>` by
    * temp-write + no-overwrite rename, then swap the pointer. Returns
    * false iff the version was already claimed by another writer (the
    * caller's base is stale — re-read and retry). */
  def tryCommit(dir: String, v: Long, lines: Seq[String]): Boolean = {
    val (f, base) = fsFor(dir)
    f.mkdirs(base)
    val versioned = new Path(base, s"MANIFEST.v$v")
    if (f.exists(versioned)) return false
    val tmp = new Path(base, s"MANIFEST.tmp.${UUID.randomUUID()}")
    writeLines(f, tmp, lines)
    val claimed =
      try { fcFor(base).rename(tmp, versioned); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          f.delete(tmp, false); false
      }
    if (claimed) {
      // pointer swap — skipped when a LATER commit already swapped (the
      // versioned log is truth; the pointer must never regress). The
      // swap itself retries under concurrent swappers: FileSystem
      // .rename first (one atomic overwriting rename(2) on POSIX-backed
      // schemes — no delete+rename gap a reader could fall into), the
      // FileContext OVERWRITE form as the fallback for schemes whose
      // FileSystem.rename refuses an existing destination (HDFS — its
      // AbstractFileSystem implements atomic overwrite-rename). The
      // local FileContext form is delete-then-rename underneath, which
      // a RACING swap turns into FileAlreadyExists (observed in the
      // 8-writer catalog spec) — caught here and resolved by
      // re-reading the pointer: if a newer version's swap won, ours is
      // obsolete anyway.
      var done = false
      var tries = 0
      while (!done && tries < 50) {
        tries += 1
        // the RAW pointer file, deliberately NOT readPointer: its
        // versioned-log fallback would resolve our own just-claimed
        // manifest and conclude the swap already happened — leaving
        // the pointer never written at all
        val cur = try readLines(f, pointer(base))(0).trim.toLong
        catch { case _: java.io.IOException => 0L }
        if (cur >= v) done = true
        else {
          val ptmp = new Path(base, s"MANIFEST.tmp.${UUID.randomUUID()}")
          writeLines(f, ptmp, lines)
          done =
            try {
              if (f.rename(ptmp, pointer(base))) true
              else {
                fcFor(base).rename(ptmp, pointer(base), Options.Rename.OVERWRITE)
                true
              }
            } catch {
              case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
                f.delete(ptmp, false); false // racing swap — re-check version
              case _: java.io.FileNotFoundException =>
                f.delete(ptmp, false); false // racing delete+rename gap
            }
        }
      }
    }
    claimed
  }

  /** Single-shot commit at exactly version `v`; throws
    * [[CommitConflict]] if another writer claimed it first. The right
    * primitive for whole-state mutations (compact, build, StateTable
    * publishes), where a lost race means the state the mutation was
    * computed FROM is gone and a list-merge would be wrong — the caller
    * must recompute. The data directories already written stay
    * unreferenced and age out via [[vacuum]]. */
  def commit(dir: String, v: Long, lines: Seq[String]): Unit =
    if (!tryCommit(dir, v, lines))
      throw new CommitConflict(
        s"version $v at $dir was committed by another writer — " +
          "re-read the current state and recompute")

  /** Optimistic-concurrency commit for MERGEABLE mutations (append a
    * segment, add a tombstone — deltas that commute with any concurrent
    * commit): `make(v, baseLines)` builds the manifest for version `v`
    * from the base state (None when the store is empty); on a lost
    * claim the loop reads the winner's committed `MANIFEST.v<N>` —
    * complete by construction, the claim renames whole files — and
    * retries against it. This is the conditional-PUT loop the
    * single-writer contract previously delegated to "an external lock";
    * two interleaved appends now both land, in either order. */
  def commitLoop(dir: String)(
      make: (Long, Option[Array[String]]) => Seq[String]): Long = {
    var base: (Long, Option[Array[String]]) =
      if (exists(dir)) {
        val l = readPointer(dir); (l(0).trim.toLong, Some(l))
      } else (0L, None)
    var guard = 0
    while (guard < 10000) {
      val v = base._1 + 1
      if (tryCommit(dir, v, make(v, base._2))) return v
      // lost the claim: the winner's versioned manifest is the new base
      base = (v, Some(readVersioned(dir, v)))
      guard += 1
    }
    sys.error(s"commit loop at $dir failed to converge after $guard rounds")
  }

  /** Reclaim entries outside the retention window. `refsOf` maps a
    * store's manifest lines to the data-directory names it references;
    * `keepAlways` names store-level entries outside the manifest
    * scheme (e.g. DedupIndex's `meta`). Retention keeps
    * `retainVersions` versions BEFORE the current one readable. See the
    * object scaladoc for the three-way classification (published
    * garbage / in-flight age guard / hidden). */
  def vacuum(
      dir: String,
      refsOf: Array[String] => Seq[String],
      keepAlways: Set[String],
      retainVersions: Int,
      minAgeMs: Long): Unit = {
    val (f, base) = fsFor(dir)
    val cur = readPointer(dir)
    val curV = cur(0).trim.toLong
    val entries = f.listStatus(base)
    val vPat = "MANIFEST\\.v(\\d+)".r
    val onDisk: Map[Long, Array[String]] = entries.iterator.flatMap { e =>
      e.getPath.getName match {
        case vPat(n) =>
          try Some(n.toLong -> readLines(f, e.getPath))
          catch { case _: java.io.IOException => None }
        case _ => None
      }
    }.toMap
    val retained = (curV - retainVersions).max(1L) to curV
    val retainedManifests =
      retained.flatMap(v => if (v == curV) Some(cur) else onDisk.get(v))
    val live = retainedManifests.flatMap(refsOf).toSet ++
      retained.map(v => s"MANIFEST.v$v") ++ keepAlways + "MANIFEST"
    // referenced by ANY manifest still on disk → was published → its
    // age is irrelevant, only liveness matters
    val published = onDisk.values.flatMap(refsOf).toSet ++ refsOf(cur)
    val now = System.currentTimeMillis()
    entries.foreach { e =>
      val name = e.getPath.getName
      val drop =
        if (live.contains(name) || name.startsWith(".")) false
        else if (name.startsWith("MANIFEST.v") || published.contains(name)) true
        // everything else — MANIFEST.tmp.* included: a tmp file younger
        // than the guard may be mid-rename in a live commit — waits out
        // the in-flight age guard
        else now - e.getModificationTime > minAgeMs
      if (drop) f.delete(e.getPath, true): Unit
    }
  }
}
