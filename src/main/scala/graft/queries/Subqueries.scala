package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subquery surface — SURVEY.md §4.1 (subquery decorrelation suite) and
  * §2.3 (StreamDynamicFilter). Catalyst performs the same Apply→join
  * unnesting the reference implements in 17 transpose rules; these queries
  * pin the semantics.
  */
object Subqueries extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Uncorrelated scalar subquery (the batch shape of DynamicFilter:
    // `x > (SELECT max ...)`).
    // reference: src/stream/src/executor/dynamic_filter.rs:39
    q("q_sub_scalar",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 0.97 * (SELECT max(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { s =>
      val mx = s.table("orders").agg(max(col("o_totalprice")).as("mx"))
      s.table("orders")
        .join(broadcast(mx))
        .where(col("o_totalprice") > lit(0.97) * col("mx"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // IN subquery (semi join after rewrite).
    q("q_sub_in",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |  AND c_acctbal > 9900
        |ORDER BY c_custkey""".stripMargin) { s =>
      s.sql(
        """SELECT c_custkey, c_name FROM customer
          |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
          |  AND c_acctbal > 9900
          |ORDER BY c_custkey""".stripMargin)
    },

    // Correlated EXISTS with an extra local predicate.
    q("q_sub_exists",
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE s_acctbal > 9000 AND EXISTS (
        |  SELECT 1 FROM nation n
        |  WHERE n.n_nationkey = s.s_nationkey AND n.n_regionkey < 2)
        |ORDER BY s_suppkey""".stripMargin) { s =>
      s.sql(
        """SELECT s_suppkey, s_name FROM supplier s
          |WHERE s_acctbal > 9000 AND EXISTS (
          |  SELECT 1 FROM nation n
          |  WHERE n.n_nationkey = s.s_nationkey AND n.n_regionkey < 2)
          |ORDER BY s_suppkey""".stripMargin)
    },

    // Correlated scalar subquery in the SELECT list (MaxOneRow guard).
    // reference: src/batch/executors/src/executor/max_one_row.rs:23
    q("q_sub_scalar_corr",
      """SELECT n_nationkey, n_name,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
        |   WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000) AS n_rich
        |FROM nation n ORDER BY n_nationkey""".stripMargin) { s =>
      s.sql(
        """SELECT n_nationkey, n_name,
          |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
          |   WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 5000) AS n_rich
          |FROM nation n ORDER BY n_nationkey""".stripMargin)
    },

    // Correlated ANY/comparison subquery: above-average-per-group filter
    // (TPC-H Q17 shape). Exact decimal avg keeps the boundary stable.
    q("q_sub_above_avg",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem l1
        |WHERE l_orderkey < 2000 AND l_quantity > (
        |  SELECT 1.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |                / COUNT(*))
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { s =>
      // Decorrelated by hand WITH a semi-join pre-filter (guide §3.2):
      // Spark's own decorrelation aggregates ALL of lineitem by
      // l_partkey before joining the tiny l_orderkey<2000 probe side —
      // at 100 TB that is a full-fact-table aggregate consulted for a
      // few hundred groups. Restricting the aggregate's input to the
      // probe's partkeys first is result-identical: only those groups
      // are ever consulted, every probe partkey has a group (its own
      // rows are in l2), and l_partkey is non-null — so inner join ≡
      // the decorrelated outer join + null-rejecting comparison.
      val l1 = s.table("lineitem").where(col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_partkey")
      val keys = l1.select("l_partkey").distinct()
      val thr = s.table("lineitem")
        .select("l_partkey", "l_quantity")
        .join(broadcast(keys), Seq("l_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg((lit(1.5) * (sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast(DoubleType) / count(lit(1)))).as("__thr"))
      l1.join(thr, "l_partkey")
        .where(col("l_quantity") > col("__thr"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // NOT IN with non-null domain (anti join with null check).
    q("q_sub_not_in",
      """SELECT r_regionkey, r_name FROM region
        |WHERE r_regionkey NOT IN (
        |  SELECT n_regionkey FROM nation WHERE n_nationkey < 3)
        |ORDER BY r_regionkey""".stripMargin) { s =>
      s.sql(
        """SELECT r_regionkey, r_name FROM region
          |WHERE r_regionkey NOT IN (
          |  SELECT n_regionkey FROM nation WHERE n_nationkey < 3)
          |ORDER BY r_regionkey""".stripMargin)
    }
  )
}
