package graft.queries

import org.apache.spark.sql.functions._

/** Core relational backbone — SURVEY.md §2.1/§2.2/§2.6:
  * scan (BatchRowSeqScan), Project, Filter, Values, Sort, Limit/Offset,
  * TopN. All are native Spark operators; the point of each query is that the
  * produced physical plan is the scalable one (filter+projection pushed into
  * the parquet scan, sort via range partitioning, limit via TakeOrdered).
  */
object CoreBatch extends QueryPack {

  val queries: Seq[GraftQuery] = Seq(
    // Scan + projection pushdown: reads 3 of 11 lineitem columns.
    // reference: src/batch/executors/src/executor/row_seq_scan.rs:45
    q("q_scan_project",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { s =>
      s.table("lineitem")
        .where(col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Compound predicate filter (pushed to parquet: PushedFilters in plan).
    // reference: src/batch/executors/src/executor/filter.rs:28
    q("q_filter",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_totalprice > 100000.0 AND o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin) { s =>
      s.table("orders")
        .where(col("o_totalprice") > 100000.0 && col("o_orderstatus") =!= "F")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Literal rows. reference: src/batch/executors/src/executor/values.rs:31
    q("q_values",
      """SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, NULL))
        |AS t(id, tag) ORDER BY id""".stripMargin) { s =>
      import s.implicits._
      Seq((1, Some("a")), (2, Some("b")), (3, None: Option[String]))
        .toDF("id", "tag").orderBy("id")
    },

    // Full sort, mixed direction, unique tiebreak.
    // reference: src/batch/executors/src/executor/order_by.rs:51
    q("q_sort",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_acctbal DESC, c_custkey""".stripMargin) { s =>
      s.table("customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    },

    // Limit + offset over a total order.
    // reference: src/batch/executors/src/executor/limit.rs:30
    q("q_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin) { s =>
      s.table("orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10).limit(20)
    },

    // TopN: planned as TakeOrderedAndProject — no full sort at scale.
    // reference: src/batch/executors/src/executor/top_n.rs:37
    q("q_topn",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin) { s =>
      s.table("orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(15)
    }
  )
}
