package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-shaped analytics adapted to the pruned driver schema — the
  * heavier join/agg pipelines the bench gate measures (SURVEY.md §6:
  * reference runs TPC-H 22 both batch and as MVs). Plans to watch: star
  * joins broadcast the BOUNDED dimensions (region/nation/part) by hint;
  * SF-proportional sides (customer, supplier — GBs at sf100) carry NO
  * hint so AQE picks broadcast at small SF and shuffle at large instead
  * of OOMing on a forced build side. The lineitem scan carries every
  * pushable predicate, aggregates are decimal-exact two-phase.
  */
object TpchLike extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Q3: shipping-priority — segment filter, 3-way join, top-10 revenue.
    q("q3_shipping_priority",
      s"""SELECT l_orderkey, revenue, o_orderdate FROM (
         |  SELECT l.l_orderkey,
         |    ${dsumSql(drevSql("l.l_extendedprice", "l.l_discount"), 6)} AS revenue,
         |    o.o_orderdate
         |  FROM customer c
         |  JOIN orders o ON c.c_custkey = o.o_custkey
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  WHERE c.c_mktsegment = 'BUILDING'
         |    AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |    AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |  GROUP BY l.l_orderkey, o.o_orderdate
         |) ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { s =>
      val c = s.table("customer").where(col("c_mktsegment") === "BUILDING")
      val o = s.table("orders")
        .where(col("o_orderdate") < lit("1998-03-15 00:00:00").cast(TimestampType))
      val l = s.table("lineitem")
        .where(col("l_shipdate") > lit("1998-03-15 00:00:00").cast(TimestampType))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(l("l_orderkey"), o("o_orderdate"))
        .agg(dsum(drev(l("l_extendedprice"), l("l_discount")), 6).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q5: local-supplier volume — 6-way star join, region filter.
    q("q5_local_supplier",
      s"""SELECT n.n_name,
         |  ${dsumSql(drevSql("l.l_extendedprice", "l.l_discount"), 6)} AS revenue
         |FROM region r
         |JOIN nation n ON n.n_regionkey = r.r_regionkey
         |JOIN customer c ON c.c_nationkey = n.n_nationkey
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |  AND s.s_nationkey = n.n_nationkey
         |WHERE r.r_name = 'ASIA'
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { s =>
      val r = s.table("region").where(col("r_name") === "ASIA")
      val n = s.table("nation")
      val c = s.table("customer")
      val o = s.table("orders")
      val l = s.table("lineitem")
      val sup = s.table("supplier")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .join(sup,
          sup("s_suppkey") === l("l_suppkey") &&
            sup("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name"))
        .agg(dsum(drev(l("l_extendedprice"), l("l_discount")), 6).as("revenue"))
        .orderBy("n_name")
    },

    // Q6: forecast-revenue — pure pushdown scan + global agg.
    q("q6_forecast_revenue",
      s"""SELECT ${dsumSql(s"${dmoneySql("l_extendedprice")} * CAST(l_discount AS DECIMAL(4,2))", 6)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin) { s =>
      s.table("lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType)
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType)
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(dsum(dmoney(col("l_extendedprice")) *
          col("l_discount").cast(DecimalType(4, 2)), 6).as("revenue"))
    },

    // Q10: returned-item reporting — top 20 customers by lost revenue.
    q("q10_returned_items",
      s"""SELECT c_custkey, c_name, revenue, n_name FROM (
         |  SELECT c.c_custkey, c.c_name, n.n_name,
         |    ${dsumSql(drevSql("l.l_extendedprice", "l.l_discount"), 6)} AS revenue
         |  FROM customer c
         |  JOIN orders o ON o.o_custkey = c.c_custkey
         |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  JOIN nation n ON n.n_nationkey = c.c_nationkey
         |  WHERE l.l_returnflag = 'R'
         |    AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
         |    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  GROUP BY c.c_custkey, c.c_name, n.n_name
         |) ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { s =>
      val c = s.table("customer")
      val o = s.table("orders")
        .where(col("o_orderdate") >= lit("1996-10-01 00:00:00").cast(TimestampType)
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      val l = s.table("lineitem").where(col("l_returnflag") === "R")
      val n = s.table("nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
        .agg(dsum(drev(l("l_extendedprice"), l("l_discount")), 6).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q14: promotion effect — conditional aggregation over a part join.
    q("q14_promo_effect",
      s"""SELECT
         |  100.0 * ${dsumSql(
             s"CASE WHEN p.p_type = 'ECONOMY' THEN ${drevSql("l.l_extendedprice", "l.l_discount")} ELSE CAST(0 AS DECIMAL(18,4)) END", 6)}
         |    / ${dsumSql(drevSql("l.l_extendedprice", "l.l_discount"), 6)} AS promo_revenue
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { s =>
      val l = s.table("lineitem")
        .where(col("l_shipdate") >= lit("1996-03-01 00:00:00").cast(TimestampType)
          && col("l_shipdate") < lit("1996-04-01 00:00:00").cast(TimestampType))
      val p = s.table("part")
      val rev = drev(l("l_extendedprice"), l("l_discount"))
      l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
        .agg((lit(100.0) *
          dsum(when(p("p_type") === "ECONOMY", rev)
            .otherwise(lit(0).cast(DecimalType(18, 4))), 6) /
          dsum(rev, 6)).as("promo_revenue"))
    },

    // Q7-like: volume between two nations (customer nation × supplier
    // nation), yearly breakdown.
    q("q7_nation_volume",
      s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |  CAST(extract(year FROM l.l_shipdate) AS INT) AS yr,
         |  ${dsumSql(drevSql("l.l_extendedprice", "l.l_discount"), 6)} AS volume
         |FROM lineitem l
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
         |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
         |WHERE cn.n_nationkey < 2 AND sn.n_nationkey < 2
         |  AND cn.n_nationkey <> sn.n_nationkey
         |GROUP BY cn.n_name, sn.n_name, yr
         |ORDER BY cust_nation, supp_nation, yr""".stripMargin) { s =>
      val l = s.table("lineitem")
      val o = s.table("orders")
      val c = s.table("customer")
      val sup = s.table("supplier")
      val cn = s.table("nation").where(col("n_nationkey") < 2)
        .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
      val sn = s.table("nation").where(col("n_nationkey") < 2)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(sup, sup("s_suppkey") === l("l_suppkey"))
        .join(broadcast(cn), col("cnk") === c("c_nationkey"))
        .join(broadcast(sn), col("snk") === sup("s_nationkey"))
        .where(col("cnk") =!= col("snk"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(l("l_shipdate")).as("yr"))
        .agg(dsum(drev(l("l_extendedprice"), l("l_discount")), 6).as("volume"))
        .orderBy("cust_nation", "supp_nation", "yr")
    },

    // Q12-like: order-priority severity per linestatus (two-way
    // conditional counting over a join).
    q("q12_priority_counts",
      """SELECT l.l_linestatus,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l.l_linestatus ORDER BY l.l_linestatus""".stripMargin) { s =>
      val l = s.table("lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast(TimestampType)
          && col("l_shipdate") < lit("1997-01-01 00:00:00").cast(TimestampType))
      val o = s.table("orders")
      val isHigh = o("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, o("o_orderkey") === l("l_orderkey"))
        .groupBy(l("l_linestatus"))
        .agg(sum(when(isHigh, 1).otherwise(0)).as("high_line_count"),
          sum(when(!isHigh, 1).otherwise(0)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // Q19-like: OR-ed multi-branch predicate (brand × size × quantity
    // bands) — disjunctive pushdown exercise.
    q("q19_disjunctive",
      s"""SELECT ${dsumSql(drevSql("l.l_extendedprice", "l.l_discount"), 6)} AS revenue
         |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 1 AND 11)
         |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
         |       AND l.l_quantity BETWEEN 10 AND 20)
         |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
         |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin) { s =>
      val l = s.table("lineitem")
      val p = s.table("part")
      val cond =
        (p("p_brand") === "Brand#1" && p("p_size").between(1, 15) &&
          l("l_quantity").between(1, 11)) ||
        (p("p_brand") === "Brand#2" && p("p_size").between(1, 25) &&
          l("l_quantity").between(10, 20)) ||
        (p("p_brand") === "Brand#3" && p("p_size").between(1, 35) &&
          l("l_quantity").between(20, 30))
      l.join(broadcast(p), p("p_partkey") === l("l_partkey"))
        .where(cond)
        .agg(dsum(drev(l("l_extendedprice"), l("l_discount")), 6).as("revenue"))
    },

    // Q2-like: cheapest-supplier-per-nation (min-by over a join, the
    // min_max_on_index shape without indexes).
    q("q2_min_supplier",
      """SELECT n.n_name, s.s_suppkey, s.s_acctbal FROM (
        |  SELECT s_nationkey, s_suppkey, s_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY s_nationkey
        |      ORDER BY s_acctbal, s_suppkey) AS rn
        |  FROM supplier) s
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE s.rn = 1 ORDER BY n.n_name""".stripMargin) { s =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
      val sup = s.table("supplier")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      val n = s.table("nation")
      sup.join(broadcast(n), n("n_nationkey") === sup("s_nationkey"))
        .select(n("n_name"), sup("s_suppkey"), sup("s_acctbal"))
        .orderBy("n_name")
    },

    // Q18: large-volume customers — semi-join against a grouped HAVING.
    q("q18_large_volume",
      s"""SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
         |  ${dsumSql("l.l_quantity")} AS total_qty
         |FROM customer c
         |JOIN orders o ON o.o_custkey = c.c_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem
         |  GROUP BY l_orderkey
         |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 210)
         |GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
         |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin) { s =>
      // renamed projection up front — `big` self-joins against lineitem
      val big = s.table("lineitem")
        .select(col("l_orderkey").as("bk"), col("l_quantity").as("bq"))
        .groupBy("bk")
        .agg(sum(col("bq").cast(DecimalType(18, 2))).as("q"))
        .where(col("q") > 210)
        .select(col("bk").as("big_orderkey"))
      // qualified aliases: `big` shares scan attribute ids with `li`
      val c = s.table("customer").alias("c18")
      val o = s.table("orders").alias("o18")
      val l = s.table("lineitem").alias("li18")
      o.join(big, col("o18.o_orderkey") === col("big_orderkey"), "left_semi")
        .join(l, col("li18.l_orderkey") === col("o18.o_orderkey"))
        .join(c, col("o18.o_custkey") === col("c18.c_custkey"))
        .groupBy(col("c18.c_custkey"), col("c18.c_name"),
          col("o18.o_orderkey"), col("o18.o_totalprice"))
        .agg(dsum(col("li18.l_quantity")).as("total_qty"))
        .orderBy(col("o18.o_totalprice").desc, col("o18.o_orderkey"))
        .limit(20)
    }
  )
}
