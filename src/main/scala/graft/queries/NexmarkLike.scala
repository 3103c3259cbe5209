package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Nexmark-shaped batch analytics over the events stream-table — the
  * reference's flagship streaming workload run here through the batch
  * engine (reference: ci/scripts/sql/nexmark/q5.sql, q6-group-top10.sql,
  * q7.sql, q9.sql; e2e_test/streaming/nexmark/). The streaming MV forms
  * of the same shapes live in NexmarkMvSpec; these batch twins give the
  * shapes a DuckDB hash oracle.
  *
  * events stands in for the bid stream: user_id=bidder, value=price,
  * ts=dateTime, event_type=channel.
  */
object NexmarkLike extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // q9 shape: winning bid — the single top-priced row per (day window,
    // channel). Tie-free argmax: (value DESC, event_id) is unique.
    // Plan: one shuffle on the partition key, WindowGroupLimit keeps the
    // per-group top-1 from materializing full sorted partitions.
    q("q_nex_winning_bid",
      """SELECT ws, event_type, price, bidder FROM (
        |  SELECT time_bucket(INTERVAL '1 day', ts) AS ws, event_type,
        |         value AS price, user_id AS bidder,
        |         row_number() OVER (
        |           PARTITION BY time_bucket(INTERVAL '1 day', ts), event_type
        |           ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY ws, event_type""".stripMargin) { s =>
      val rk = Window.partitionBy(col("ws"), col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      s.table("events")
        .withColumn("ws", window(col("ts"), "1 day").getField("start"))
        .withColumn("rk", row_number().over(rk))
        .where(col("rk") === 1)
        .select(col("ws"), col("event_type"), col("value").as("price"),
          col("user_id").as("bidder"))
        .orderBy("ws", "event_type")
    },

    // q5 shape: hot items — top-3 most active bidders per hourly window.
    // Standard decomposition: grouped counts (partial-agg + one shuffle),
    // then rank within window (second shuffle on the window key alone —
    // inherent to the shape).
    q("q_nex_hot_items",
      """SELECT ws, user_id, n FROM (
        |  SELECT ws, user_id, n,
        |         row_number() OVER (PARTITION BY ws ORDER BY n DESC, user_id) AS rk
        |  FROM (SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, user_id,
        |               CAST(count(*) AS BIGINT) AS n
        |        FROM events GROUP BY ws, user_id))
        |WHERE rk <= 3 ORDER BY ws, rk""".stripMargin) { s =>
      val counts = s.table("events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
      val rk = Window.partitionBy(col("ws"))
        .orderBy(col("n").desc, col("user_id"))
      counts.withColumn("rk", row_number().over(rk))
        .where(col("rk") <= 3)
        .select(col("ws"), col("user_id"), col("n"))
        .orderBy(col("ws"), col("rk"))
    },

    // q15 shape: per-day stats — FILTERed tier counts + exact
    // count(DISTINCT …) in one grouped aggregate. Plan: Spark's distinct
    // rewrite expands to a two-phase aggregate (partial counts map-side);
    // one shuffle on the day key.
    // reference: ci/scripts/sql/nexmark/q15.sql
    q("q_nex_day_stats",
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |       CAST(count(*) AS BIGINT) AS total_bids,
        |       CAST(count(*) FILTER (WHERE value < 500) AS BIGINT) AS rank1_bids,
        |       CAST(count(*) FILTER (WHERE value >= 500) AS BIGINT) AS rank2_bids,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS total_bidders,
        |       CAST(count(DISTINCT user_id) FILTER (WHERE value >= 500) AS BIGINT)
        |         AS hi_bidders
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { s =>
      // Manual two-phase distinct (guide §2.3 "aggregate before you
      // shuffle"): Spark plans the two DISTINCT aggregates as a 3-way
      // Expand (every event row tripled before the partial aggregate).
      // Grouping by (day, user) first computes the same counts off 1×
      // the rows; the second phase counts users per day. count(CASE…)
      // with no ELSE skips nulls exactly like FILTER.
      val perUser = s.table("events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        .agg(count(lit(1)).as("__n"),
          count(when(col("value") < 500, 1)).as("__n_lo"),
          count(when(col("value") >= 500, 1)).as("__n_hi"))
      perUser.groupBy("day")
        .agg(sum(col("__n")).as("total_bids"),
          sum(col("__n_lo")).as("rank1_bids"),
          sum(col("__n_hi")).as("rank2_bids"),
          count(when(col("user_id").isNotNull, 1)).as("total_bidders"),
          count(when(col("user_id").isNotNull && col("__n_hi") > 0, 1))
            .as("hi_bidders"))
        .orderBy("day")
    },

    // q16 shape: per-(channel, day) stats — the workload's widest
    // aggregate: FILTER counts, plain and FILTERed DISTINCT counts, and
    // a max over a projected minute, all in ONE grouped aggregate (the
    // streaming twin is NexmarkChainSpec m_q16).
    // reference: ci/scripts/sql/nexmark/q16.sql
    q("q_nex_channel_stats",
      """SELECT event_type AS channel, strftime(ts, '%Y-%m-%d') AS day,
        |       max(strftime(ts, '%H:%M')) AS max_minute,
        |       CAST(count(*) AS BIGINT) AS total_bids,
        |       CAST(count(*) FILTER (WHERE value < 500) AS BIGINT) AS rank1_bids,
        |       CAST(count(*) FILTER (WHERE value >= 500) AS BIGINT) AS rank2_bids,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS total_bidders,
        |       CAST(count(DISTINCT user_id) FILTER (WHERE value < 500) AS BIGINT)
        |         AS rank1_bidders
        |FROM events GROUP BY 1, 2 ORDER BY channel, day""".stripMargin) { s =>
      // Manual two-phase distinct + NUMERIC minute max. The r9 plan was
      // a 3-way Expand (rows tripled for the two DISTINCTs) feeding four
      // SortAggregates — max over the 'HH:mm' STRING forces the
      // sort-based aggregate (string buffers are immutable). Grouping by
      // (channel, day, user) first reads 1× the rows, and max over
      // minute-of-day as an INT keeps every phase a HashAggregate;
      // 'HH:mm' is zero-padded so its lexicographic max IS the numeric
      // max, re-rendered identically by format_string at the end.
      val perUser = s.table("events")
        .groupBy(col("event_type").as("channel"),
          date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
        .agg(max(hour(col("ts")) * 60 + minute(col("ts"))).as("__mm"),
          count(lit(1)).as("__n"),
          count(when(col("value") < 500, 1)).as("__n_lo"),
          count(when(col("value") >= 500, 1)).as("__n_hi"))
      perUser.groupBy("channel", "day")
        .agg(max(col("__mm")).as("__mmax"),
          sum(col("__n")).as("total_bids"),
          sum(col("__n_lo")).as("rank1_bids"),
          sum(col("__n_hi")).as("rank2_bids"),
          count(when(col("user_id").isNotNull, 1)).as("total_bidders"),
          count(when(col("user_id").isNotNull && col("__n_lo") > 0, 1))
            .as("rank1_bidders"))
        .select(col("channel"), col("day"),
          format_string("%02d:%02d", expr("__mmax div 60"),
            col("__mmax") % lit(60)).as("max_minute"),
          col("total_bids"), col("rank1_bids"), col("rank2_bids"),
          col("total_bidders"), col("rank1_bidders"))
        .orderBy("channel", "day")
    },

    // q18 shape: latest event per (bidder, auction-analog) — streaming
    // dedup's batch twin. WindowGroupLimit keeps per-group top-1 from
    // materializing full sorted partitions.
    // reference: ci/scripts/sql/nexmark/q18.sql
    q("q_nex_latest_event",
      """SELECT user_id, event_type, value, ts FROM (
        |  SELECT user_id, event_type, value, ts,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin) { s =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts").desc, col("event_id").desc)
      s.table("events")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("user_id"), col("event_type"), col("value"), col("ts"))
        .orderBy("user_id", "event_type")
    },

    // q101 shape: every customer LEFT JOINed to their current highest
    // event value — outer join whose right side is a grouped max. Plan:
    // the aggregate shrinks events to one row per user BEFORE the join;
    // AQE broadcasts the small side at this SF, shuffles at 100 TB.
    // reference: ci/scripts/sql/nexmark/q101.sql
    q("q_nex_highest_left",
      """SELECT c_custkey, c_name, max_v
        |FROM customer LEFT JOIN (
        |  SELECT user_id, max(value) AS max_v FROM events GROUP BY user_id
        |) b ON c_custkey = b.user_id
        |ORDER BY c_custkey""".stripMargin) { s =>
      val maxes = s.table("events").groupBy("user_id")
        .agg(max("value").as("max_v"))
      s.table("customer")
        .join(maxes, col("c_custkey") === col("user_id"), "left")
        .select(col("c_custkey"), col("c_name"), col("max_v"))
        .orderBy("c_custkey")
    },

    // q102 shape: users with at-least-average activity — grouped count
    // gated by a scalar subquery (one extra 1-row aggregate, broadcast
    // into the filter).
    // reference: ci/scripts/sql/nexmark/q102.sql
    q("q_nex_active_users",
      """SELECT user_id, n FROM (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id)
        |WHERE n >= (SELECT count(*) / count(DISTINCT user_id) FROM events)
        |ORDER BY user_id""".stripMargin) { s =>
      val counts = s.table("events").groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val avgRow = s.table("events")
        .agg((count(lit(1)).cast(DoubleType) /
          countDistinct(col("user_id"))).as("thr"))
      counts.join(broadcast(avgRow))
        .where(col("n") >= col("thr"))
        .select(col("user_id"), col("n"))
        .orderBy("user_id")
    },

    // q105 shape: most-active users joined to their customer row, top-N
    // by count — agg → join → TakeOrdered (no full sort at scale).
    // reference: ci/scripts/sql/nexmark/q105.sql
    q("q_nex_top_active",
      """SELECT c_custkey, c_name, n
        |FROM customer JOIN (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id
        |) b ON c_custkey = b.user_id
        |ORDER BY n DESC, c_custkey LIMIT 100""".stripMargin) { s =>
      val counts = s.table("events").groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      s.table("customer")
        .join(counts, col("c_custkey") === col("user_id"))
        .select(col("c_custkey"), col("c_name"), col("n"))
        .orderBy(col("n").desc, col("c_custkey"))
        .limit(100)
    },

    // q6 shape: per-bidder stats over their 10 most recent events — a
    // ROWS frame over event time, then the latest row per bidder. The
    // division-free (sum, count) pair avoids decimal-division rounding
    // divergence; avg = sum/count is derivable. One shuffle on user_id
    // serves both window specs.
    q("q_nex_last10_avg",
      """SELECT user_id, sum_v10, n10 FROM (
        |  SELECT user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w10 AS DOUBLE) AS sum_v10,
        |    CAST(count(*) OVER w10 AS BIGINT) AS n10,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events
        |  WINDOW w10 AS (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |) WHERE rk = 1 ORDER BY user_id""".stripMargin) { s =>
      val w10 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
      val latest = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      s.table("events")
        .select(col("user_id"),
          sum(col("value").cast(DecimalType(18, 2))).over(w10)
            .cast(DoubleType).as("sum_v10"),
          count(lit(1)).over(w10).as("n10"),
          row_number().over(latest).as("rk"))
        .where(col("rk") === 1)
        .select(col("user_id"), col("sum_v10"), col("n10"))
        .orderBy("user_id")
    }
  )
}
