package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation surface — SURVEY.md §2.4.
  * Hash/sort agg, simple (global) agg, distinct agg, grouping sets /
  * rollup / cube, stat aggs, ordered-set aggs, collecting aggs.
  * Money/qty sums go through DECIMAL (see package doc) so partial
  * aggregation order can never change the result — this is what makes the
  * same query bit-stable on a 1000-executor shuffle.
  */
object Aggregates extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // TPC-H Q1 over the pruned schema — the flagship grouped agg.
    // reference: src/batch/executors/src/executor/hash_agg.rs:187
    q("q1_agg",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumMoneySql(drevSql("l_extendedprice", "l_discount"))} AS sum_disc_price,
         |  ${dsumMoneySql(s"${drevSql("l_extendedprice", "l_discount")} * ${drate1pSql("l_tax")}")} AS sum_charge,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  ${davgSql("l_extendedprice")} AS avg_price,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { s =>
      s.table("lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumMoney(drev(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          dsumMoney(drev(col("l_extendedprice"), col("l_discount")) * drate1p(col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Global (no-key) aggregate — 1 row out.
    // reference: src/stream/src/executor/simple_agg.rs:43
    q("q_simple_agg",
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
         |  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders""".stripMargin) { s =>
      s.table("orders").agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).cast(DoubleType).as("min_price"),
        max(col("o_totalprice")).cast(DoubleType).as("max_price"),
        dsum(col("o_totalprice")).as("sum_price"))
    },

    // Distinct aggregate (rewritten to expand/dedup internally by Catalyst —
    // same shape as the reference's distinct_agg_rule).
    // reference: src/frontend/src/optimizer/rule/distinct_agg_rule.rs
    q("q_distinct_agg",
      """SELECT o_orderstatus,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { s =>
      s.table("orders")
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },

    // ROLLUP + grouping() flag.
    // reference: src/frontend/src/optimizer/rule/grouping_sets_to_expand_rule.rs
    q("q_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, g""".stripMargin) { s =>
      s.table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          grouping(col("l_linestatus")).cast(IntegerType).as("g"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first, col("g"))
    },

    // CUBE.
    q("q_cube",
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { s =>
      s.table("lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Statistical aggregates (var/stddev pop+samp), computed from exact
    // decimal moments so merge order can never perturb the bits (the
    // builtin Welford-merge result depends on partition merge order).
    // reference: src/expr/impl/src/aggregate/general.rs (variance family)
    q("q_stat_agg",
      """SELECT c_nationkey,
        |  (sq - sm * sm / n) / n       AS vpop,
        |  (sq - sm * sm / n) / (n - 1) AS vsamp,
        |  SQRT((sq - sm * sm / n) / n)       AS spop,
        |  SQRT((sq - sm * sm / n) / (n - 1)) AS ssamp
        |FROM (
        |  SELECT c_nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sm,
        |    CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,4))) AS DOUBLE) AS sq,
        |    CAST(COUNT(c_acctbal) AS DOUBLE) AS n
        |  FROM customer GROUP BY c_nationkey
        |) ORDER BY c_nationkey""".stripMargin) { s =>
      s.table("customer")
        .groupBy("c_nationkey")
        .agg(
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast(DoubleType).as("sm"),
          sum((col("c_acctbal") * col("c_acctbal")).cast(DecimalType(28, 4)))
            .cast(DoubleType).as("sq"),
          count(col("c_acctbal")).cast(DoubleType).as("n"))
        .select(col("c_nationkey"),
          ((col("sq") - col("sm") * col("sm") / col("n")) / col("n")).as("vpop"),
          ((col("sq") - col("sm") * col("sm") / col("n")) / (col("n") - 1)).as("vsamp"),
          sqrt((col("sq") - col("sm") * col("sm") / col("n")) / col("n")).as("spop"),
          sqrt((col("sq") - col("sm") * col("sm") / col("n")) / (col("n") - 1)).as("ssamp"))
        .orderBy("c_nationkey")
    },

    // bool_and / bool_or.
    q("q_bool_agg",
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 1000)  AS all_big,
        |  bool_or(o_totalprice > 400000) AS any_huge
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { s =>
      s.table("orders")
        .groupBy("o_orderstatus")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_big"),
          bool_or(col("o_totalprice") > 400000).as("any_huge"))
        .orderBy("o_orderstatus")
    },

    // string_agg with ORDER BY (ordered collecting agg).
    // reference: src/expr/impl/src/aggregate/string_agg.rs
    q("q_string_agg",
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { s =>
      s.table("nation")
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("names"))
        .orderBy("n_regionkey")
    },

    // array_agg with ORDER BY (output serialized — the driver compare
    // cannot hash array cells; the collecting agg itself is still the
    // operator under test).
    // reference: src/expr/impl/src/aggregate/array_agg.rs
    q("q_array_agg",
      """SELECT n_regionkey,
        |  array_to_string(array_agg(n_name ORDER BY n_name), '|') AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { s =>
      s.table("nation")
        .groupBy("n_regionkey")
        .agg(array_join(array_sort(collect_list(col("n_name"))), "|").as("names"))
        .orderBy("n_regionkey")
    },

    // FILTER clause → conditional aggregation.
    // reference: proto/expr.proto:473-476 (agg filter)
    q("q_agg_filter",
      s"""SELECT l_returnflag,
         |  CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_big,
         |  ${dsumSql("l_extendedprice")} AS sum_all
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { s =>
      s.table("lineitem")
        .groupBy("l_returnflag")
        .agg(count(when(col("l_quantity") > 25, 1)).as("n_big"),
          dsum(col("l_extendedprice")).as("sum_all"))
        .orderBy("l_returnflag")
    },

    // arg-max per group via max_by. Sort key folds the unique orderkey
    // into exact price-cents so double ties can never make the pick
    // engine-dependent.
    q("q_minmax_by",
      """SELECT o_custkey,
        |  max_by(o_orderkey,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) * 1000000
        |         + o_orderkey) AS best_order,
        |  CAST(MAX(o_totalprice) AS DOUBLE) AS best_price
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) > 2
        |ORDER BY o_custkey""".stripMargin) { s =>
      val sortKey = round(col("o_totalprice") * 100, 0).cast(LongType) * 1000000 +
        col("o_orderkey")
      s.table("orders")
        .groupBy("o_custkey")
        .agg(max_by(col("o_orderkey"), sortKey).as("best_order"),
          max(col("o_totalprice")).cast(DoubleType).as("best_price"),
          count(lit(1)).as("cnt"))
        .where(col("cnt") > 2)
        .drop("cnt")
        .orderBy("o_custkey")
    }
  )
}
