package graft

import org.apache.spark.sql.functions._

import graft.functions.RetractableHll

class RetractableHllSpec extends SparkSpecBase {
  import spark.implicits._

  test("insert-only estimate within 5% of exact") {
    val df = (1 to 20000).map(i => (i % 7000).toLong).toDF("v")
      .withColumn("op", lit(1))
    val est = df.agg(RetractableHll
      .approxCountDistinctRetractable(col("v"), col("op")).as("e"))
      .head().getLong(0)
    assert(math.abs(est - 7000.0) / 7000.0 < 0.05, s"est=$est")
  }

  test("deletes retract: estimate tracks the live multiset") {
    // insert 0..9999 once each, then delete 0..7999 → 2000 live
    val ins = (0 until 10000).map(i => (i.toLong, 1))
    val del = (0 until 8000).map(i => (i.toLong, -1))
    val df = (ins ++ del).toDF("v", "op")
    val est = df.agg(RetractableHll
      .approxCountDistinctRetractable(col("v"), col("op")).as("e"))
      .head().getLong(0)
    assert(math.abs(est - 2000.0) / 2000.0 < 0.08, s"est=$est")
  }

  test("duplicate inserts need matching deletes (multiset semantics)") {
    // value 1 inserted twice, deleted once → still live
    val df = Seq((1L, 1), (1L, 1), (1L, -1), (2L, 1)).toDF("v", "op")
    val est = df.agg(RetractableHll
      .approxCountDistinctRetractable(col("v"), col("op")).as("e"))
      .head().getLong(0)
    assert(est == 2L, s"est=$est")
  }

  test("grouped usage over the orders fixture matches exact within bound") {
    Tables.register(spark, "/root/testdata/sf0.01")
    val rows = spark.table("orders")
      .groupBy("o_orderstatus")
      .agg(RetractableHll.approxCountDistinctRetractable(
          col("o_custkey"), lit(1)).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e < 0.08, s"approx=$a exact=$e")
    }
  }

  test("NULL values are ignored, matching count(distinct)") {
    val df = Seq(Some(1L), None, Some(2L), None, Some(1L))
      .toDF("v").withColumn("op", lit(1))
    val est = df.agg(RetractableHll
      .approxCountDistinctRetractable(col("v"), col("op")).as("e"))
      .head().getLong(0)
    assert(est == 2L, s"est=$est (NULLs must not register)")
  }
}
