package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2b group S).
  *
  * Each transform takes a (possibly streaming) DataFrame and returns the
  * aggregated streaming plan; callers pick source (`readStream` /
  * MemoryStream) and sink. State stays in the streaming state store —
  * partitioned by group key, so it scales horizontally; watermarks bound
  * state size (late data beyond the watermark is dropped, matching the
  * declared semantics, and state for closed windows is evicted).
  */
object StreamingOps {

  /** Tumbling window counts with a watermark (append mode: a window is
    * emitted once finalized by the watermark, then its state is freed). */
  def tumblingCounts(events: DataFrame, window_ : String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Sliding window counts. */
  def slidingCounts(events: DataFrame, window_ : String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))

  /** Session windows per user (30-min gap by default). */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"))

  /** Per-window key counts for the TRENDING / windowed-heavy-hitter
    * pattern (s11): extract the JSON `props.k` key, count per
    * (tumbling window, key) under a watermark. Only the COUNT runs in
    * the stream (append mode — a window's counts emit once finalized,
    * state evicted); the top-k RANK over a still-open window is not
    * append-safe, so ranking happens downstream on finalized windows
    * (foreachBatch, or the s11 batch replay that oracles the whole
    * pipeline). State is one counter per (window, key) — bounded by
    * the watermark horizon × key cardinality, the same envelope as
    * [[tumblingCounts]]. */
  def trendingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      // missing/unparseable keys stay NULL — one group, like any SQL
      // groupBy. The -1 sentinel lives only in the oracle-facing s11
      // replay (engines order null groups differently at rank
      // boundaries); folding it into the OPERATOR would merge a genuine
      // key -1 with the missing-key group (r11 ADVICE)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("k"), col("n"))

  /** Stream dedup within the watermark horizon (bounded state). */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner interval join: pair each left event with right
    * events of the same key arriving within `horizon` AFTER it. Both
    * sides carry watermarks and the join condition time-bounds the match
    * window, so each side's state store holds at most watermark+horizon
    * of data — the canonical bounded-state stream join (click ⋈
    * purchase-within-5-minutes). Columns are prefixed to keep the
    * output schema unambiguous. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      horizon: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark).select(
      col(key).as("l_key"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark).select(
      col(key).as("r_key"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"))
  }

  /** Streaming near-duplicate candidates: the batch MinHash+LSH
    * machinery (graft.operators.Dedup) composed with a watermarked
    * stream-stream self-join. Each arriving document is banded into LSH
    * bucket keys (row-local — the same seeded signature as the batch
    * path), and candidates are pairs sharing a band key within the time
    * horizon. State per side is bounded by watermark + horizon, and
    * within it by the LSH bucket population — the streaming image of
    * "dedup new documents against the recent corpus". Emits
    * (id_a, id_b, band) candidate pairs; exact re-scoring joins the
    * full texts back by id, exactly as the batch path re-attaches
    * vectors. */
  def streamNearDupCandidates(
      docs: DataFrame,
      horizon: String = "10 minutes",
      watermark: String = "10 minutes",
      k: Int = 32,
      bands: Int = 8): DataFrame = {
    import graft.operators.Dedup
    // integer division would silently drop the trailing k % bands
    // signature rows from every band split, weakening banding with no
    // signal — reject the misconfiguration instead
    require(k % bands == 0, s"signature length k=$k must be a multiple of bands=$bands")
    val rowsPerBand = k / bands
    def banded(idAs: String, tsAs: String) = docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").as(idAs), col("ts").as(tsAs),
        Dedup.minhashSignature(col("text"), k).as("sig"))
      .select(col(idAs), col(tsAs),
        posexplode(Dedup.lshBandKeys(col("sig"), bands, rowsPerBand))
          .as(Seq("band", "bkey")))
    banded("id_a", "ts_a").join(banded("id_b", "ts_b"),
      Seq("band", "bkey")).where(
        col("id_a") < col("id_b") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizon"))
      .select(col("id_a"), col("id_b"), col("band"))
  }

  /** Stream-static enrichment: join each arriving event against a
    * static (batch) dimension table. The dim side is broadcast, so the
    * stream NEVER shuffles for the join and no state store is involved —
    * Spark re-plans the static side per micro-batch, which is also what
    * picks up a refreshed dimension snapshot between batches. Inner
    * join: events with no dim row are dropped (enrichment-or-discard;
    * use a left join at the call site for enrichment-or-null). The join
    * condition resolves each key against its OWN side, so `key` and
    * `dimKey` may share a name; non-key columns present on both sides
    * still appear twice in the output (standard join behavior — project
    * or rename at the call site). */
  def enrich(events: DataFrame, dim: DataFrame, key: String, dimKey: String): DataFrame = {
    val d = org.apache.spark.sql.functions.broadcast(dim)
    events.join(d, events(key) === d(dimKey))
  }

  /** The §2a#10 counter at scale: a ±1 delta stream folded into one
    * running value per counter key via mapGroupsWithState — exactly-once
    * state updates, emitted in update mode. */
  def runningCounter(deltas: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import deltas.sparkSession.implicits._
    deltas
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (String, Long)](GroupStateTimeout.NoTimeout) {
        (key: String, values: Iterator[(String, Long)], state: GroupState[Long]) =>
          val cur = state.getOption.getOrElse(0L) + values.map(_._2).sum
          state.update(cur)
          (key, cur)
      }
  }
}
