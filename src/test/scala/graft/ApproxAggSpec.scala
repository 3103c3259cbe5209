package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the approximate sketches (no cross-engine oracle —
  * sketch layouts are engine-specific, so the gate is error vs exact).
  * reference: src/expr/impl/src/aggregate/approx_count_distinct (2%-ish
  * HLL), src/stream/src/executor/approx_percentile (relative error bound).
  */
class ApproxAggSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    Tables.register(spark, dir)
    val rows = spark.table("orders")
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx"))
      .head()
    val (exact, approx) = (rows.getLong(0), rows.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx within 1% relative error of exact percentile") {
    Tables.register(spark, dir)
    val rows = spark.table("lineitem")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("exact"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
      .head()
    val (exact, approx) = (rows.getDouble(0), rows.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx=$approx exact=$exact")
  }
}
