package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped METADATA cache for immutable index generations — the
  * manifest-table answer to repeated directory listings (optimization
  * guide §6: "table formats with manifest metadata avoid directory
  * listing altogether").
  *
  * Every persisted-tier read ([[DedupIndex.readBands]],
  * [[AnnStore.postings]]/[[AnnStore.centroids]]) used to call
  * `spark.read.parquet` afresh, and each call re-ran partition
  * discovery over the generation's directories — a 256-task "Listing
  * leaf files" job (~0.5 s at local scale, a paginated LIST per
  * segment on an object store) per read of a table whose file set is
  * IMMUTABLE by the commit protocol's own contract: segments,
  * tombstones, meta and centroid generations are written once under
  * UUID-suffixed names and never modified (mutations commit fresh
  * directories plus a manifest swap). So the resolved relation — the
  * file index inside the analyzed DataFrame — can be reused for as
  * long as the generation is referenced, which is exactly keyed by the
  * manifest content that names it.
  *
  * What this caches is FILE METADATA and plan resolution only: every
  * query still scans the parquet bytes itself (no result or data
  * caching — re-running a query re-reads the files). Keys embed the
  * session (plans are session-bound), the store dir, and the full
  * generation list (version + UUID'd directory names), so a rebuild
  * into the same path, a concurrent append, or a compact all miss the
  * stale entry and resolve fresh. Bounded LRU; evicted entries simply
  * re-list on next use. Vacuumed generations age out of the manifest
  * first, so a cached frame can only outlive its files if a caller
  * holds it across its own retention window — the same loud
  * FileNotFoundException contract as an uncached snapshot read.
  */
private[graft] object GenerationCache {
  private val MaxEntries = 128

  private final class Lru[V] extends java.util.LinkedHashMap[String, V](32, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, V]): Boolean =
      size() > MaxEntries
  }

  private val frames = new Lru[DataFrame]
  private val scalars = new Lru[AnyRef]

  private def sessionKey(spark: SparkSession): String =
    System.identityHashCode(spark).toHexString

  /** The resolved DataFrame for an immutable generation set. `key` must
    * name every directory the frame reads (UUID-suffixed generation
    * names make it collision-safe across rebuilds). */
  def frame(spark: SparkSession, key: String)(make: => DataFrame): DataFrame = {
    val k = sessionKey(spark) + "|" + key
    frames.synchronized { Option(frames.get(k)) } match {
      case Some(df) => df
      case None =>
        val df = make
        frames.synchronized { frames.put(k, df) }
        df
    }
  }

  /** A small driver-side value derived from an immutable generation set
    * (a row count for wave sizing, a collected parameter row). Same
    * immutability argument as [[frame]]; never query results. */
  def scalar[T <: AnyRef](spark: SparkSession, key: String)(make: => T): T = {
    val k = sessionKey(spark) + "|" + key
    scalars.synchronized { Option(scalars.get(k)) } match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val v = make
        scalars.synchronized { scalars.put(k, v) }
        v
    }
  }
}
