package graft

import org.apache.spark.sql.functions._

import graft.streaming.MvCatalog

/** TPC-H Q1 maintained incrementally as a materialized view over a
  * lineitem file stream — the reference's flagship MV workload
  * (e2e_test/tpch/ runs all 22 queries as MVs). The streaming aggregation
  * carries sum/count state; avg is derived at read time (sum/count), the
  * standard MV decomposition of non-distributive aggregates.
  */
class TpchMvSpec extends SparkSpecBase {
  import spark.implicits._

  test("TPC-H Q1 as an incrementally-maintained MV over streamed lineitem") {
    val sfDir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dir = tmpDir("q1mv")
    // stage the fixture as multiple files so the stream sees >1 micro-batch
    raw.repartition(4).write.parquet(s"$dir/in")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("q1", Seq("l_returnflag", "l_linestatus"), nBuckets = 4)

    val dec = (c: String) => col(c).cast("decimal(18,2)")
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))
    val q = mv.start(stream, cat.checkpointDir("q1"))
    q.processAllAvailable()
    q.stop()

    val got = mv.read()
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "count_order", "avg_qty")
      .collect().map(_.toSeq).toSeq

    val want = raw
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "count_order", "avg_qty")
      .collect().map(_.toSeq).toSeq

    assert(got == want && got.nonEmpty)
  }

  test("TPC-H Q12 as a streaming MV: lineitem stream joins static orders") {
    val sfDir = "/root/testdata/sf0.001"
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = tmpDir("q12mv")
    l.repartition(4).write.parquet(s"$dir/in")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("q12", Seq("l_linestatus"), nBuckets = 4)

    def xform(li: org.apache.spark.sql.DataFrame) = {
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!isHigh, 1L).otherwise(0L)).as("low_line_count"))
    }
    val stream = spark.readStream.schema(l.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = mv.start(xform(stream), cat.checkpointDir("q12"))
    q.processAllAvailable()
    q.stop()

    val got = mv.read().orderBy("l_linestatus").collect().toSeq
    val want = xform(l).orderBy("l_linestatus").collect().toSeq
    assert(got == want && got.nonEmpty)
  }
}
