package graft.queries

import org.apache.spark.sql.functions._

/** Set operations — SURVEY.md §2.7. Union (all/distinct), Intersect
  * (distinct/all), Except (distinct/all). The reference rewrites distinct
  * set ops to dedup/semi/anti joins (union_to_distinct_rule,
  * intersect_to_semi_join_rule, except_to_anti_join_rule); Catalyst does
  * the identical rewrites natively.
  */
object SetOps extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    q("q_union_all",
      """SELECT k, src FROM (
        |  SELECT c_custkey AS k, 'cust' AS src FROM customer WHERE c_acctbal > 9950
        |  UNION ALL
        |  SELECT s_suppkey AS k, 'supp' AS src FROM supplier WHERE s_acctbal > 9900
        |) ORDER BY k, src""".stripMargin) { s =>
      val a = s.table("customer").where(col("c_acctbal") > 9950)
        .select(col("c_custkey").as("k"), lit("cust").as("src"))
      val b = s.table("supplier").where(col("s_acctbal") > 9900)
        .select(col("s_suppkey").as("k"), lit("supp").as("src"))
      a.union(b).orderBy("k", "src")
    },

    q("q_union_distinct",
      """SELECT n_regionkey FROM nation
        |UNION
        |SELECT r_regionkey FROM region
        |ORDER BY n_regionkey""".stripMargin) { s =>
      s.table("nation").select(col("n_regionkey"))
        .union(s.table("region").select(col("r_regionkey")))
        .distinct()
        .orderBy("n_regionkey")
    },

    // Nations that have both customers with high balances and suppliers
    // with high balances.
    q("q_intersect",
      """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        |INTERSECT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
        |ORDER BY k""".stripMargin) { s =>
      s.table("customer").where(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("k"))
        .intersect(s.table("supplier").where(col("s_acctbal") > 9000)
          .select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    q("q_except",
      """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9800
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
        |ORDER BY k""".stripMargin) { s =>
      s.table("customer").where(col("c_acctbal") > 9800)
        .select(col("c_nationkey").as("k"))
        .except(s.table("supplier").where(col("s_acctbal") > 9000)
          .select(col("s_nationkey").as("k")))
        .orderBy("k")
    },

    // Multiset variants.
    q("q_intersect_all",
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin) { s =>
      s.table("orders").where(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("k"))
        .intersectAll(s.table("orders").where(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    q("q_except_all",
      """SELECT o_custkey AS k FROM orders WHERE o_totalprice > 350000
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 350000
        |ORDER BY k""".stripMargin) { s =>
      s.table("orders").where(col("o_totalprice") > 350000)
        .select(col("o_custkey").as("k"))
        .exceptAll(s.table("orders")
          .where(col("o_orderstatus") === "F" && col("o_totalprice") > 350000)
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }
  )
}
