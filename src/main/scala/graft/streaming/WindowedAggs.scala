package graft.streaming

import graft.data.Tables
import graft.ops.QueryDef
import graft.ops.Exact._
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations (SURVEY §2.B T2–T4), declared in batch
  * form here so they are oracle-checkable; StreamingSuite replays the same
  * tables through a streaming source and asserts stream == batch.
  *
  * Provenance: es_interval step-window checks (reference:
  * maggy/core/experiment_driver/optimization_driver.py:456-459).
  */
object WindowedAggs {
  val entries: Seq[QueryDef] = Seq(
    // T2: tumbling 1-hour window (Spark `window` is epoch-aligned, so a
    // 1-hour tumble == date_trunc('hour')).
    QueryDef("st_tumbling_window",
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(22,8))) AS DOUBLE), 2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
        .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))
    },

    // T3: sliding window (1 hour, slide 30 min) — each event lands in two
    // windows; oracle enumerates both epoch-aligned starts exactly (µs math).
    QueryDef("st_sliding_window",
      """WITH e AS (
        |  SELECT unnest([
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)
        |  ]) AS window_start, value FROM events)
        |SELECT window_start, count(*) AS n,
        |       round(CAST(sum(CAST(value AS DECIMAL(22,8))) AS DOUBLE), 2) AS total
        |FROM e GROUP BY 1""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
        .select(col("window.start").as("window_start"), col("n"), col("total"))
    },

    // T4: session window (30-minute gap) per user. Oracle = classic
    // gaps-and-islands; session end = last event + gap (Spark semantics).
    QueryDef("st_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   > INTERVAL 30 MINUTE OR
        |                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events,
        |       round(CAST(sum(CAST(value AS DECIMAL(22,8))) AS DOUBLE), 2) AS total
        |FROM sessions GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total"))
        .select(
          col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("total"))
    },

    // T5 (dedup shape): drop replayed duplicates by (user_id, event_id) —
    // at-least-once heartbeat dedup (reference: maggy/trial.py:98-102).
    QueryDef("st_dedup_late",
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT DISTINCT user_id, event_id FROM events) GROUP BY user_id""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .select("user_id", "event_id").distinct()
        .groupBy("user_id").agg(count(lit(1)).as("n"))
    }
  )
}
