package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.operators.{AnnStore, Catalog, DedupIndex, StateTable}

/** SQL surface for the persisted tiers — the last gap between the
  * engine and "a user types SQL at it" (f8 proves `spark.sql` over the
  * relational operators; the index/state stores were API-only). A set
  * of TABLE-VALUED FUNCTIONS injected through the public
  * [[SparkSessionExtensions]] seam (`spark.sql.extensions` — the same
  * registration path Delta/Iceberg use), so a plain SQL session can
  * read every store, live or AT A PINNED VERSION (the `VERSION AS OF`
  * story as a function argument — Spark only routes the literal
  * `VERSION AS OF` syntax to DataSourceV2 catalogs, so the snapshot
  * version rides as a trailing argument instead):
  *
  *   - `graft_dedup_bands('dir'[, version])` — the dedup index's band
  *     table ([[DedupIndex.readBands]] / `readBandsAt`);
  *   - `graft_ann_postings('dir'[, version])` — the ANN index's live
  *     posting view, tombstones dropped ([[AnnStore.postings]]);
  *   - `graft_ann_centroids('dir'[, version])` — its centroid table;
  *   - `graft_state('dir'[, version])` — a [[StateTable]] generation;
  *   - `graft_catalog('catalogDir')` — the name registry itself;
  *   - `graft_table('catalogDir', 'name')` — a CATALOG-RESOLVED read:
  *     kind-dispatched to the right reader, honoring the entry's
  *     snapshot pin (`SELECT * FROM graft_table('/cat', 'docs@v1')`).
  *
  * Each function resolves its manifest ONCE at plan time (driver-side
  * metadata read) and expands to the SAME logical plan the Scala API
  * builds — identical pruning, pushdown and tombstone anti-join; SQL
  * adds zero execution surface. Arguments must be literals (they
  * parameterize plan RESOLUTION, not row evaluation); a non-literal
  * fails analysis loudly. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  import GraftSqlExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "graft_dedup_bands", "(dir[, version]) - dedup-index band table") {
      case Seq(dir) => DedupIndex.readBands(session, str(dir, "dir")).queryExecution.logical
      case Seq(dir, v) =>
        DedupIndex.readBandsAt(session, str(dir, "dir"), long(v, "version"))
          .queryExecution.logical
    }
    inject(ext, "graft_ann_postings", "(dir[, version]) - ANN index posting view") {
      case Seq(dir) =>
        AnnStore.postings(session, str(dir, "dir")).queryExecution.logical
      case Seq(dir, v) =>
        val d = str(dir, "dir")
        AnnStore.postings(session, d, AnnStore.readAt(d, long(v, "version")))
          .queryExecution.logical
    }
    inject(ext, "graft_ann_centroids", "(dir[, version]) - ANN index centroid table") {
      case Seq(dir) =>
        AnnStore.centroids(session, str(dir, "dir")).queryExecution.logical
      case Seq(dir, v) =>
        val d = str(dir, "dir")
        AnnStore.centroids(session, d, AnnStore.readAt(d, long(v, "version")))
          .queryExecution.logical
    }
    inject(ext, "graft_state", "(dir[, version]) - state-table generation") {
      case Seq(dir) => StateTable.read(session, str(dir, "dir")).queryExecution.logical
      case Seq(dir, v) =>
        StateTable.readAt(session, str(dir, "dir"), long(v, "version"))
          .queryExecution.logical
    }
    inject(ext, "graft_catalog", "(catalogDir) - the name registry rows") {
      case Seq(dir) => Catalog.list(session, str(dir, "catalogDir"))
        .queryExecution.logical
    }
    inject(ext, "graft_table", "(catalogDir, name) - catalog-resolved, pin-aware read") {
      case Seq(dir, name) =>
        val (cat, n) = (str(dir, "catalogDir"), str(name, "name"))
        val (kind, _, _) = Catalog.resolve(session, cat, n)
        (kind match {
          case "dedup-index" => Catalog.dedupIndexBands(session, cat, n)
          case "ann-index" => Catalog.annPostings(session, cat, n)
          case "state-table" => Catalog.stateTable(session, cat, n)
          case other => fail(s"graft_table: unsupported catalog kind '$other' " +
            s"for entry '$n' (expected dedup-index | ann-index | state-table)")
        }).queryExecution.logical
    }
  }
}

object GraftSqlExtensions {
  /** The session whose SQL is being analyzed — table functions expand at
    * resolution time, on the driver, inside an active session. */
  private def session: SparkSession = SparkSession.active

  private def fail(msg: String): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "INTERNAL_ERROR", messageParameters = Map("message" -> msg))

  private def lit(e: Expression, what: String): Any = {
    if (!e.foldable)
      fail(s"graft table functions take literal arguments; '$what' is not " +
        s"foldable: ${e.sql}")
    e.eval()
  }

  private def str(e: Expression, what: String): String = lit(e, what) match {
    case null => fail(s"argument '$what' must be a non-null string")
    case s => s.toString
  }

  private def long(e: Expression, what: String): Long = lit(e, what) match {
    case i: Int => i.toLong
    case l: Long => l
    case other => fail(s"argument '$what' must be an integer version, got $other")
  }

  private def inject(ext: SparkSessionExtensions, name: String, usage: String)(
      build: PartialFunction[Seq[Expression], LogicalPlan]): Unit =
    ext.injectTableFunction((FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftSqlExtensions].getName, name),
      (args: Seq[Expression]) =>
        build.applyOrElse(args, (got: Seq[Expression]) =>
          fail(s"$name$usage cannot take ${got.length} argument(s)"))))
}
