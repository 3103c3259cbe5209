package graft.queries

import org.apache.spark.sql.functions._

/** Time-window TVFs — SURVEY.md §2.5: TUMBLE, HOP (sliding), SESSION.
  * Batch semantics here (same assignment logic the streaming MVs use —
  * Spark's `window()`/`session_window()` are shared between batch and
  * streaming plans, so these queries pin the MV window semantics too).
  * reference: src/expr/impl/src/scalar/tumble.rs,
  * src/batch/executors/src/executor/hop_window.rs:31,
  * src/expr/core/src/window_function/session.rs
  */
object TimeWindows extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // TUMBLE: fixed 1-hour windows, count + exact sum per (window, type).
    q("q_tumble",
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         |  CAST(COUNT(*) AS BIGINT) AS n, ${dsumSql("value", 6)} AS sum_v
         |FROM events GROUP BY ws, event_type
         |ORDER BY ws, event_type""".stripMargin) { s =>
      s.table("events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 6).as("sum_v"))
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_v"))
        .orderBy("ws", "event_type")
    },

    // HOP: 1-hour windows sliding every 30 minutes (each row lands in 2).
    q("q_hop",
      """SELECT ws, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |         - k * (INTERVAL '30 minutes') AS ws
        |  FROM events, (SELECT unnest([0, 1]) AS k)
        |) GROUP BY ws ORDER BY ws""".stripMargin) { s =>
      s.table("events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("ws"), col("n"))
        .orderBy("ws")
    },

    // SESSION windows with a 2-hour max gap, per user. Spark
    // session_window vs the standard gaps-and-islands SQL rewrite.
    q("q_session",
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '2 hours'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), numbered AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM numbered GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { s =>
      s.table("events")
        .groupBy(session_window(col("ts"), "2 hours").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
        .orderBy("user_id", "session_start")
    }
  )
}
