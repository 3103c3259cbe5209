package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ordered-set and approximate aggregates — SURVEY.md §2.4 tail:
  * percentile_cont/percentile_disc/median, mode, first/last_value aggs
  * (arg-min/max), approx_count_distinct and approx_percentile (no cross-
  * engine oracle for the sketches — their accuracy is spec-tested against
  * exact counterparts in ApproxAggSpec instead).
  */
object OrderedAggs extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // jsonb_agg: ordered JSON-array collection per group.
    // reference: src/expr/impl/src/aggregate/jsonb_agg.rs
    q("q_jsonb_agg",
      """SELECT l_linestatus,
        |  to_json(list_sort(list(l_orderkey % 10))) AS j
        |FROM lineitem WHERE l_orderkey < 50
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { s =>
      s.table("lineitem").where(col("l_orderkey") < 50)
        .groupBy("l_linestatus")
        .agg(to_json(sort_array(collect_list(col("l_orderkey") % 10))).as("j"))
        .orderBy("l_linestatus")
    },

    // corr / covar / linear-regression aggregates.
    // reference: src/expr/impl/src/aggregate/general.rs (covar/corr),
    // proto/expr.proto regr_* variants
    q("q_stat_agg2",
      """SELECT
        |  round(corr(s_acctbal, s_suppkey), 6) AS c,
        |  round(covar_pop(s_acctbal, s_suppkey), 6) AS cp,
        |  round(covar_samp(s_acctbal, s_suppkey), 6) AS cs,
        |  round(regr_slope(s_acctbal, s_suppkey), 6) AS rs,
        |  round(regr_intercept(s_acctbal, s_suppkey), 6) AS ri,
        |  round(regr_r2(s_acctbal, s_suppkey), 6) AS r2
        |FROM supplier""".stripMargin) { s =>
      s.table("supplier").agg(
        round(corr(col("s_acctbal"), col("s_suppkey")), 6).as("c"),
        round(covar_pop(col("s_acctbal"), col("s_suppkey")), 6).as("cp"),
        round(covar_samp(col("s_acctbal"), col("s_suppkey")), 6).as("cs"),
        round(regr_slope(col("s_acctbal"), col("s_suppkey")), 6).as("rs"),
        round(regr_intercept(col("s_acctbal"), col("s_suppkey")), 6).as("ri"),
        round(regr_r2(col("s_acctbal"), col("s_suppkey")), 6).as("r2"))
    },

    // percentile_cont (linear interpolation) + percentile_disc + median.
    // reference: src/expr/impl/src/aggregate/percentile_cont.rs
    q("q_percentile",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  CAST(quantile_disc(l_quantity, 0.5) AS DOUBLE) AS p50d,
        |  round(median(l_quantity), 6) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { s =>
      s.table("lineitem").groupBy("l_returnflag")
        .agg(
          round(percentile_approx(col("l_quantity"), lit(0.5), lit(1000000)), 6).as("p50x"),
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)")
            .cast(DoubleType).as("p50d"),
          round(expr("median(l_quantity)"), 6).as("med"))
        .drop("p50x")
        .orderBy("l_returnflag")
    },

    // mode expressed relationally (deterministic tie-break by value) —
    // the portable formulation of the reference's `mode` ordered-set agg.
    // reference: src/expr/impl/src/aggregate/mode.rs
    q("q_mode",
      """SELECT o_orderstatus, o_orderpriority AS mode_prio FROM (
        |  SELECT o_orderstatus, o_orderpriority,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority
        |) WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin) { s =>
      val counted = s.table("orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("cnt").desc, col("o_orderpriority"))
      counted.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_prio"))
        .orderBy("o_orderstatus")
    },

    // first/last value per group by explicit order (arg-min/arg-max).
    // reference: src/expr/impl/src/aggregate/general.rs (first_value)
    q("q_first_last_agg",
      """SELECT o_custkey,
        |  arg_min(o_orderkey, CAST(extract(epoch FROM o_orderdate) AS BIGINT)
        |          * 100000 + o_orderkey) AS first_order,
        |  arg_max(o_orderkey, CAST(extract(epoch FROM o_orderdate) AS BIGINT)
        |          * 100000 + o_orderkey) AS last_order
        |FROM orders WHERE o_custkey < 100
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { s =>
      // order-date ties are possible within a customer → fold the unique
      // orderkey into the sort key so first/last are total-order picks.
      val sortKey = unix_timestamp(col("o_orderdate")) * 100000 + col("o_orderkey")
      s.table("orders").where(col("o_custkey") < 100)
        .groupBy("o_custkey")
        .agg(min_by(col("o_orderkey"), sortKey).as("first_order"),
          max_by(col("o_orderkey"), sortKey).as("last_order"))
        .orderBy("o_custkey")
    },

    // bit_and / bit_or / bit_xor aggregates.
    q("q_bit_agg",
      """SELECT o_orderstatus,
        |  bit_and(o_orderkey % 256) AS ba,
        |  bit_or(o_orderkey % 256)  AS bo,
        |  bit_xor(o_orderkey % 256) AS bx
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { s =>
      s.table("orders").groupBy("o_orderstatus")
        .agg(bit_and(col("o_orderkey") % 256).as("ba"),
          bit_or(col("o_orderkey") % 256).as("bo"),
          bit_xor(col("o_orderkey") % 256).as("bx"))
        .orderBy("o_orderstatus")
    },

    // count_if / any / every (conditional aggregate family).
    q("q_count_if",
      """SELECT l_returnflag,
        |  CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_disc,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { s =>
      s.table("lineitem").groupBy("l_returnflag")
        .agg(count_if(col("l_discount") > 0.05).as("n_disc"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }
  )
}
