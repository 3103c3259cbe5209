package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.IterativeFixpoint
import graft.streaming.Changelog

/** Remaining SURVEY.md §2 surface: recursive CTE (driver fixpoint loop),
  * table changelog derivation, approximate sketch aggregates (rows-only
  * checks — sketch values are engine-specific; accuracy is asserted in
  * ApproxAggSpec against exact counterparts).
  */
object Advanced extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Recursive CTE: transitive closure over a deterministic cyclic edge
    // set derived from nation. DuckDB runs the real WITH RECURSIVE; the
    // engine runs IterativeFixpoint.transitiveClosure.
    // reference: src/frontend/src/optimizer/plan_node/logical_recursive_union.rs
    q("q_recursive_cte",
      """WITH RECURSIVE
        |edges AS (
        |  SELECT n_nationkey AS src, (n_nationkey + 5) % 25 AS dst
        |  FROM nation WHERE n_nationkey < 25
        |),
        |paths(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT p.src, e.dst FROM paths p JOIN edges e ON p.dst = e.src
        |)
        |SELECT src, dst FROM paths ORDER BY src, dst""".stripMargin) { s =>
      val edges = s.table("nation").where(col("n_nationkey") < 25)
        .select(col("n_nationkey").as("src"),
          ((col("n_nationkey") + 5) % 25).as("dst"))
      IterativeFixpoint.transitiveClosure(edges).orderBy("src", "dst")
    },

    // Changelog derivation between two table snapshots (CREATE MV ... AS
    // CHANGELOG analog). Oracle replicates the diff semantics with a full
    // outer join. reference: src/stream/src/executor/changelog.rs:26
    q("q_changelog_diff",
      """WITH before AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey < 3000
        |), after AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 4000
        |)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, _op FROM (
        |  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice, 2 AS _op
        |  FROM before b LEFT JOIN after a ON a.o_orderkey = b.o_orderkey
        |  WHERE a.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT a.o_orderkey, a.o_orderstatus, a.o_totalprice, 1 AS _op
        |  FROM after a LEFT JOIN before b ON b.o_orderkey = a.o_orderkey
        |  WHERE b.o_orderkey IS NULL
        |  UNION ALL
        |  SELECT a.o_orderkey, a.o_orderstatus, a.o_totalprice, 4 AS _op
        |  FROM before b JOIN after a ON a.o_orderkey = b.o_orderkey
        |  WHERE b.o_totalprice IS DISTINCT FROM a.o_totalprice
        |     OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
        |) ORDER BY o_orderkey, _op""".stripMargin) { s =>
      val before = s.table("orders").where(col("o_orderkey") < 3000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val after = s.table("orders")
        .where(col("o_orderkey") >= 1000 && col("o_orderkey") < 4000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
      Changelog.diff(before, after, Seq("o_orderkey"))
        .drop(Changelog.SeqCol)
        .orderBy("o_orderkey", Changelog.OpCol)
    },

    // Approximate sketches: engine-specific values → rows-only checks.
    // reference: src/expr/impl/src/aggregate/approx_count_distinct/mod.rs:34
    qNoOracle("q_approx_count_distinct") { (s, dir) =>
      s.table("orders").groupBy("o_orderstatus")
        .agg(approx_count_distinct(col("o_custkey")).as("approx_cust"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // Retraction-capable HLL over a changelog-shaped input (rows-only:
    // sketch values are engine-specific; accuracy in RetractableHllSpec).
    // reference: src/expr/impl/src/aggregate/approx_count_distinct/mod.rs
    qNoOracle("q_retractable_hll") { (s, dir) =>
      val orders = s.table("orders")
      // synthetic changelog: all orders inserted, the F-status ones then
      // retracted → live distinct customers of non-F orders
      val changelog = orders.select(col("o_orderstatus"), col("o_custkey"),
          lit(1).as("op"))
        .union(orders.where(col("o_orderstatus") === "F")
          .select(col("o_orderstatus"), col("o_custkey"), lit(-1).as("op")))
      changelog.groupBy("o_orderstatus")
        .agg(graft.functions.RetractableHll
          .approxCountDistinctRetractable(col("o_custkey"), col("op"))
          .as("live_approx_cust"))
        .orderBy("o_orderstatus")
    },

    // Retraction-capable approx percentile over a changelog-shaped input
    // (rows-only: bucket-midpoint values are engine-specific; accuracy in
    // RetractablePercentileSpec).
    // reference: src/stream/src/executor/approx_percentile/
    qNoOracle("q_retractable_percentile") { (s, dir) =>
      val li = s.table("lineitem")
      // synthetic changelog: every lineitem inserted, returned ('R') rows
      // then retracted → live p50 price of non-returned items
      val changelog = li.select(col("l_linestatus"), col("l_extendedprice"),
          lit(1).as("op"))
        .union(li.where(col("l_returnflag") === "R")
          .select(col("l_linestatus"), col("l_extendedprice"),
            lit(-1).as("op")))
      changelog.groupBy("l_linestatus")
        .agg(graft.functions.RetractablePercentile
          .approxPercentileRetractable(col("l_extendedprice"), col("op"), 0.5)
          .as("live_p50_price"))
        .orderBy("l_linestatus")
    },

    // reference: src/stream/src/executor/approx_percentile/
    // Scalar columns only — the driver harness cannot hash an array cell,
    // so the multi-quantile form is split into p25/p75.
    qNoOracle("q_approx_percentile") { (s, dir) =>
      s.table("lineitem").groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
          percentile_approx(col("l_extendedprice"), lit(0.25), lit(10000)).as("p25"),
          percentile_approx(col("l_extendedprice"), lit(0.75), lit(10000)).as("p75"))
        .orderBy("l_returnflag")
    }
  )
}
