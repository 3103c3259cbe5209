package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OVER-window surface — SURVEY.md §2.5/§2.6.
  * row_number/rank/dense_rank/lag/lead/ntile/percent_rank/cume_dist,
  * aggregate window functions with ROWS and RANGE frames, first/last/nth
  * value, group top-n (plain and WITH TIES — the reference's
  * StreamGroupTopN / BatchGroupTopN shape).
  *
  * Moving-frame double sums go through DECIMAL: DuckDB evaluates bounded
  * frames with a segment tree, Spark recomputes per frame — only exact
  * decimal addition is immune to the different association orders.
  */
object Windows extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Ranking trio over partitions.
    // reference: src/batch/executors/src/executor/sort_over_window.rs:34
    q("q_window_rank",
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  CAST(RANK()       OVER w AS BIGINT) AS rnk,
        |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin) { s =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.table("orders").where(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast(LongType).as("rn"),
          rank().over(w).cast(LongType).as("rnk"),
          dense_rank().over(w).cast(LongType).as("drnk"))
        .orderBy("o_custkey", "rn")
    },

    // lag/lead with defaults.
    // reference: src/expr/core/src/window_function/kind.rs:27-38
    q("q_window_lag_lead",
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_orderkey)      OVER w AS prev_key,
        |  LEAD(o_orderkey)     OVER w AS next_key,
        |  LAG(o_orderkey, 2, CAST(-1 AS BIGINT)) OVER w AS prev2_key
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { s =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      s.table("orders").where(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_key"),
          lead("o_orderkey", 1).over(w).as("next_key"),
          lag(col("o_orderkey"), 2, -1L).over(w).as("prev2_key"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ROWS frame: moving sum/avg over 3-row window + running cumulative.
    q("q_window_rows_frame",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM orders WHERE o_custkey < 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { s =>
      val base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val mov = base.rowsBetween(-2, Window.currentRow)
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dec = col("o_totalprice").cast(DecimalType(18, 2))
      s.table("orders").where(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(dec).over(mov).cast(DoubleType).as("mov_sum"),
          sum(dec).over(run).cast(DoubleType).as("run_sum"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // RANGE frame with a typed numeric offset.
    // reference: src/expr/core/src/window_function/call.rs:94-131 (range.rs)
    q("q_window_range_frame",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
        |    RANGE BETWEEN 50000.0 PRECEDING AND 50000.0 FOLLOWING) AS BIGINT) AS n_near
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { s =>
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
        .rangeBetween(-50000L, 50000L)
      s.table("orders").where(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_near"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // RANGE frame over event time with an INTERVAL bound — the sliding
    // time-window OVER form (reference over_window range frames on
    // timestamp order keys). Expressed in SQL on both engines; count
    // avoids float-sum order sensitivity.
    q("q_window_ts_range",
      """SELECT event_id,
        |  CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_last_hour
        |FROM events WHERE user_id < 20
        |ORDER BY event_id""".stripMargin) { s =>
      s.sql(
        """SELECT event_id,
          |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |    AS n_last_hour
          |FROM events WHERE user_id < 20
          |ORDER BY event_id""".stripMargin)
    },

    // ntile / percent_rank / cume_dist.
    q("q_window_distribution",
      """SELECT o_orderkey,
        |  CAST(NTILE(4) OVER w AS INT) AS quartile,
        |  PERCENT_RANK() OVER w AS prank,
        |  CUME_DIST() OVER w AS cdist
        |FROM orders WHERE o_custkey < 20
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { s =>
      val w = Window.orderBy("o_totalprice", "o_orderkey")
      s.table("orders").where(col("o_custkey") < 20)
        .select(col("o_orderkey"),
          ntile(4).over(w).cast(IntegerType).as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"))
        .orderBy("o_orderkey")
    },

    // first/last/nth value over an explicit frame.
    q("q_window_first_last",
      """SELECT o_custkey, o_orderkey,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_key,
        |  LAST_VALUE(o_orderkey)  OVER w AS last_key,
        |  NTH_VALUE(o_orderkey,2) OVER w AS second_key
        |FROM orders WHERE o_custkey < 30
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { s =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      s.table("orders").where(col("o_custkey") < 30)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_key"),
          last(col("o_orderkey")).over(w).as("last_key"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Group top-N (BatchGroupTopN / StreamGroupTopN batch shape): top 3
    // orders per status. InferWindowGroupLimit turns this into a partial
    // top-k before the shuffle — no full per-group sort at scale.
    // reference: src/batch/executors/src/executor/group_top_n.rs:43
    q("q_group_topn",
      """SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin) { s =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      s.table("orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "o_orderkey")
    },

    // Top-N WITH TIES (rank-based).
    // reference: src/batch/executors/src/executor/top_n.rs:37 (with_ties)
    q("q_group_topn_ties",
      """SELECT l_returnflag, l_orderkey, l_quantity FROM (
        |  SELECT l_returnflag, l_orderkey, l_quantity,
        |    RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS rnk
        |  FROM lineitem WHERE l_orderkey < 3000) WHERE rnk <= 2
        |ORDER BY l_returnflag, l_orderkey, l_quantity""".stripMargin) { s =>
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)
      s.table("lineitem").where(col("l_orderkey") < 3000)
        .withColumn("rnk", rank().over(w))
        .where(col("rnk") <= 2)
        .select("l_returnflag", "l_orderkey", "l_quantity")
        .orderBy("l_returnflag", "l_orderkey", "l_quantity")
    },

    // DISTINCT ON (PG): first row per key by explicit order — the
    // reference implements this with StreamGroupTopN (n=1).
    q("q_distinct_on",
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin) { s =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      s.table("orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    }
  )
}
