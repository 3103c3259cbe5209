package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Scale mechanics: salted joins/aggs match their plain counterparts, and
  * bucketed tables join without a shuffle (co-located join — the
  * reference's NoShuffle/arrangement-sharing analog).
  */
class ScaleOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of rows share one key — the classic skew shape
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val right = Seq((1L, "hot"), (5L, "cold"), (950L, "warm")).toDF("k", "tag")
    val plain = left.join(right, Seq("k")).select("k", "v", "tag")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(left, right, Seq("k"), n = 8)
      .select("k", "v", "tag").collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 901) // 900 hot + 1 warm; k=5 unmatched
  }

  test("saltedSum equals plain sum") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Salting.saltedSum(df, Seq("k"), "v", n = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    Tables.register(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.table("orders").write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    spark.table("lineitem").write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("Engine DDL veneer: CREATE MATERIALIZED VIEW ... AS SELECT") {
    val e = new Engine(spark, tmpDir("engineddl"))
    e.attachTables("/root/testdata/sf0.001")
    val out = e.execute(
      """CREATE MATERIALIZED VIEW nation_by_region (PRIMARY KEY (n_regionkey)) AS
        |SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey""".stripMargin)
    assert(out.count() == 5)
    assert(e.table("nation_by_region").count() == 5)
    // plain SQL falls through
    assert(e.execute("SELECT 1 AS x").head().getInt(0) == 1)
  }

  test("Engine facade: sql + batch MV refresh + table resolution") {
    val e = new Engine(spark, tmpDir("engine"))
    e.attachTables("/root/testdata/sf0.001")
    val n = e.sql("SELECT count(*) AS n FROM region").head().getLong(0)
    assert(n == 5)
    e.refreshMaterializedView("region_counts", Seq("r_regionkey"),
      e.sql("""SELECT r_regionkey, count(*) AS n FROM region
              |GROUP BY r_regionkey""".stripMargin))
    val mv = e.table("region_counts").orderBy("r_regionkey")
      .as[(Int, Long)].collect()
    assert(mv.length == 5 && mv.forall(_._2 == 1L))
  }
}
