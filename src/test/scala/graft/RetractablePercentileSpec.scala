package graft

import org.apache.spark.sql.functions._

import graft.functions.RetractablePercentile

class RetractablePercentileSpec extends SparkSpecBase {
  import spark.implicits._

  private def approx(df: org.apache.spark.sql.DataFrame, q: Double,
      e: Double = 0.01): Option[Double] = {
    val r = df.agg(RetractablePercentile
      .approxPercentileRetractable(col("v"), col("op"), q, e).as("p"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def relErr(approx: Double, exact: Double): Double =
    if (exact == 0.0) math.abs(approx) else math.abs(approx - exact) / math.abs(exact)

  test("insert-only p50/p90/p99 within the declared relative error") {
    val vals = (1 to 20000).map(_.toDouble)
    val df = vals.toDF("v").withColumn("op", lit(1))
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val exact = vals.sorted.apply(math.floor((vals.size - 1) * q).toInt)
      val got = approx(df, q).get
      assert(relErr(got, exact) < 0.011, s"q=$q got=$got exact=$exact")
    }
  }

  test("deletes retract: percentile tracks the live multiset") {
    // insert 1..10000, delete the top 5000 → p90 of the live set ≈ 4500
    val ins = (1 to 10000).map(i => (i.toDouble, 1))
    val del = (5001 to 10000).map(i => (i.toDouble, -1))
    val df = (ins ++ del).toDF("v", "op").repartition(8) // deletes land in
    // different partial buffers than their inserts — merge must cancel
    val got = approx(df, 0.9).get
    val exact = 4500.0
    assert(relErr(got, exact) < 0.011, s"got=$got exact=$exact")
  }

  test("negative values and zeros follow the reference bucket walk") {
    val vals = Seq(-100.0, -10.0, -1.0, 0.0, 0.0, 1.0, 10.0, 100.0)
    val df = vals.map((_, 1)).toDF("v", "op")
    // p50 over 8 values → quantile_count=3 → 4th in ascending order = 0.0
    assert(approx(df, 0.5).contains(0.0))
    // p0 → most-negative bucket; midpoint of the |v|=100 bucket, negated
    val p0 = approx(df, 0.0).get
    assert(p0 < -99.0 && p0 > -101.0, s"p0=$p0")
    // p1.0 → most-positive bucket
    val p1 = approx(df, 1.0).get
    assert(p1 > 99.0 && p1 < 101.0, s"p1=$p1")
  }

  test("fully-retracted group yields NULL, not a stale value") {
    val df = Seq((5.0, 1), (5.0, -1)).toDF("v", "op")
    assert(approx(df, 0.5).isEmpty)
  }

  test("NULL values are ignored, matching percentile_cont") {
    val df = Seq(Some(1.0), None, Some(2.0), Some(3.0), None)
      .toDF("v").withColumn("op", lit(1))
    val got = approx(df, 0.5).get
    assert(relErr(got, 2.0) < 0.011, s"got=$got")
  }

  test("grouped usage over lineitem matches exact percentile within bound") {
    Tables.register(spark, "/root/testdata/sf0.01")
    val rows = spark.table("lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      .groupBy("g")
      .agg(RetractablePercentile.approxPercentileRetractable(
          col("v"), lit(1), 0.5, 0.01).as("approx"),
        expr("percentile(v, 0.5)").as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      // histogram vs interpolating exact percentile: allow 2× the bucket
      // error plus interpolation slack
      assert(relErr(a, e) < 0.03, s"g=${r.get(0)} approx=$a exact=$e")
    }
  }
}
