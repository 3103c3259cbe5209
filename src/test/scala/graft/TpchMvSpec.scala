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

  test("TPC-H Q3 as a streaming MV: join MV stores all groups, top-10 at read") {
    // The reference decomposes Q3 into a join+agg MV maintained
    // incrementally plus a TopN operator on top; here the MV holds every
    // (orderkey, orderdate) revenue group and the top-10 is the read
    // query — same state, same maintenance cost.
    val sfDir = "/root/testdata/sf0.001"
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val dir = tmpDir("q3mv")
    l.repartition(4).write.parquet(s"$dir/in")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("q3", Seq("l_orderkey", "o_orderdate"), nBuckets = 4)

    def xform(li: org.apache.spark.sql.DataFrame) =
      li.where(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .join(o.where(col("o_orderdate") < lit("1998-03-15").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(c.where(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))

    val stream = spark.readStream.schema(l.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = mv.start(xform(stream), cat.checkpointDir("q3"))
    q.processAllAvailable()
    q.stop()

    val top = (df: org.apache.spark.sql.DataFrame) =>
      df.orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
        .collect().toSeq
    assert(top(mv.read()) == top(xform(l)) && mv.read().count() > 10)
  }

  test("TPC-H Q6 as a streaming MV: global simple-agg state") {
    val sfDir = "/root/testdata/sf0.001"
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dir = tmpDir("q6mv")
    l.repartition(4).write.parquet(s"$dir/in")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("q6", Seq("k"), nBuckets = 1)

    def xform(li: org.apache.spark.sql.DataFrame) =
      li.where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .groupBy(lit(1).as("k"))
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,6)")).cast("double").as("revenue"))

    val stream = spark.readStream.schema(l.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = mv.start(xform(stream), cat.checkpointDir("q6"))
    q.processAllAvailable()
    q.stop()

    assert(mv.read().select("revenue").collect().toSeq ==
      xform(l).select("revenue").collect().toSeq)
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

  test("TPC-H Q4 as a streaming MV: EXISTS decomposed into a dedup MV + read-time semi-join") {
    // The reference plans EXISTS subqueries in streaming MVs as a
    // dedup/agg state on the inner side joined to the outer
    // (apply-to-join unnesting). Same decomposition here: MV = distinct
    // orderkeys with a returned lineitem (PK merge IS the dedup state),
    // read query = orders semi-join MV, grouped by priority.
    val sfDir = "/root/testdata/sf0.001"
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = tmpDir("q4mv")
    l.repartition(4).write.parquet(s"$dir/in")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("q4_returned", Seq("l_orderkey"), nBuckets = 4)

    val stream = spark.readStream.schema(l.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
      .where(col("l_returnflag") === "R")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_returned"))
    val q = mv.start(stream, cat.checkpointDir("q4_returned"))
    q.processAllAvailable()
    q.stop()

    def readQuery(returned: org.apache.spark.sql.DataFrame) =
      o.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(returned.select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")

    val want = readQuery(
      l.where(col("l_returnflag") === "R").select("l_orderkey").distinct())
      .collect().toSeq
    val got = readQuery(mv.read()).collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("TPC-H Q15 as a streaming MV: per-supplier revenue state + scalar-max read") {
    val sfDir = "/root/testdata/sf0.001"
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
    val dir = tmpDir("q15mv")
    l.repartition(4).write.parquet(s"$dir/in")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("q15_rev", Seq("supplier_no"), nBuckets = 4)

    def revenue(li: org.apache.spark.sql.DataFrame) =
      li.where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("total_rev"))

    val stream = spark.readStream.schema(l.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val q = mv.start(revenue(stream), cat.checkpointDir("q15_rev"))
    q.processAllAvailable()
    q.stop()

    // read query: the top supplier (scalar max over the MV, joined to dim)
    def top(rev: org.apache.spark.sql.DataFrame) = {
      val mx = rev.agg(max("total_rev")).head().getDouble(0)
      rev.where(col("total_rev") === mx)
        .join(sup, col("supplier_no") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey").collect().toSeq
    }
    val got = top(mv.read())
    val want = top(revenue(l))
    assert(got == want && got.nonEmpty)
  }
}
