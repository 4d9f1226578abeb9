package graft.streaming

import graft.{Canon, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2b group S — event-time windowing, exercised in BATCH mode:
  * `window()` / `session_window()` are the same Catalyst expressions the
  * streaming path evaluates, so their bucketing/merging semantics are
  * oracle-checkable here; streaming-only behavior (watermarks, late-data
  * drop, incremental state) is covered by StreamingSpec via MemoryStream.
  */
object WindowBatchQueries {

  /** S: tumbling 1-hour window counts — epoch-aligned buckets. */
  val s1Tumbling = Q(
    "s1_tumbling_window",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), Canon.dsumD($"value").as("sum_value"))
        .select(
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n", $"sum_value")
        .orderBy($"window_start", $"event_type")
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** S: sliding window (1 hour every 15 min) — each event lands in 4
    * overlapping windows. */
  val s2Sliding = Q(
    "s2_sliding_window",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"n")
        .orderBy($"window_start")
    },
    Some("""SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts) - to_minutes(15 * k), '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(*) AS n
            FROM events, unnest([0, 1, 2, 3]) AS u(k)
            GROUP BY 1 ORDER BY window_start"""))

  /** S: session windows (30-min gap) per user — merge semantics checked
    * against a gaps-and-islands oracle. */
  val s3Session = Q(
    "s3_session_window",
    (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"), Canon.dsumD($"value").as("sum_value"))
        .select(
          $"user_id",
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
          $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH ordered AS (
              SELECT user_id, ts, value,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events),
            flagged AS (
              SELECT user_id, ts, value,
                     CASE WHEN prev_ts IS NULL
                               OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
              FROM ordered),
            sessions AS (
              SELECT user_id, ts, value,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged)
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
            FROM sessions
            GROUP BY user_id, sid
            ORDER BY user_id, session_start"""))

  def all: Seq[Q] = Seq(s1Tumbling, s2Sliding, s3Session)
}
