package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.MvCatalog

/** Nexmark-shaped streaming MVs over the events stream — the reference's
  * flagship streaming benchmark corpus (e2e_test/streaming/nexmark/
  * q*.slt.part; the events table stands in for the bid stream:
  * user_id=bidder, value=price, event_type=channel, ts=dateTime).
  * Each query runs as an incrementally-maintained MV over a multi-batch
  * file stream, then is checked against the batch recompute of the same
  * data — the micro-batch cut points must be invisible in the result.
  */
class NexmarkMvSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def stagedStream(tag: String): (DataFrame, DataFrame, String) = {
    val raw = Tables.df(spark, sfDir, "events")
    val dir = tmpDir(tag)
    raw.repartition(4).write.parquet(s"$dir/in")
    val staged = spark.read.parquet(s"$dir/in")
    val stream = spark.readStream.schema(staged.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    (staged, stream, dir)
  }

  private def runMv(dir: String, name: String, pk: Seq[String],
      transformed: DataFrame, outputMode: String = "update"): DataFrame = {
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define(name, pk, nBuckets = 4)
    val q = mv.start(transformed, cat.checkpointDir(name), outputMode = outputMode)
    q.processAllAvailable()
    q.stop()
    mv.read()
  }

  test("nexmark q1/q2 shape: currency-convert + filter projection MV") {
    val (staged, stream, dir) = stagedStream("nexq1")
    def xform(df: DataFrame) = df
      .where(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"),
        (col("value") * 0.908).as("eur"), col("ts"))
    val got = runMv(dir, "q1", Seq("event_id"), xform(stream))
    val want = xform(staged)
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.agg(sum("eur").cast("decimal(18,4)")).head() ==
      want.agg(sum("eur").cast("decimal(18,4)")).head())
  }

  test("nexmark q4 shape: max price per type joined to per-type average") {
    val (staged, stream, dir) = stagedStream("nexq4")
    def xform(df: DataFrame) = df
      .groupBy("event_type")
      .agg(max("value").as("max_price"),
        sum(col("value").cast("decimal(18,4)")).as("sum_price"),
        count(lit(1)).as("n"))
    val got = runMv(dir, "q4", Seq("event_type"), xform(stream))
      .withColumn("avg_price", (col("sum_price") / col("n")).cast("decimal(18,4)"))
      .select("event_type", "max_price", "avg_price")
      .orderBy("event_type")
    val want = xform(staged)
      .withColumn("avg_price", (col("sum_price") / col("n")).cast("decimal(18,4)"))
      .select("event_type", "max_price", "avg_price")
      .orderBy("event_type")
    assert(got.collect().toSeq == want.collect().toSeq && got.count() > 0)
  }

  test("nexmark q5 shape: hot items — top bidders per tumbling window") {
    val (staged, stream, dir) = stagedStream("nexq5")
    // windowed counts as the MV (append-safe grouped state); the top-k
    // rank is derived at read time, the standard MV decomposition
    def counts(df: DataFrame) = df
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("user_id"), col("n"))
    val got = runMv(dir, "q5", Seq("w_start", "user_id"), counts(stream))
    val rank = Window.partitionBy("w_start")
      .orderBy(col("n").desc, col("user_id"))
    def topk(df: DataFrame) = df
      .withColumn("rk", row_number().over(rank)).where(col("rk") <= 3)
      .orderBy("w_start", "rk")
      .select("w_start", "user_id", "n")
    val want = topk(counts(staged))
    assert(topk(got).collect().toSeq == want.collect().toSeq && want.count() > 0)
  }

  test("nexmark q7 shape: highest bid per window (argmax via max_by)") {
    val (staged, stream, dir) = stagedStream("nexq7")
    def xform(df: DataFrame) = df
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(max("value").as("price"),
        max_by(col("user_id"), struct(col("value"), col("event_id"))).as("bidder"))
      .select(col("w.start").as("w_start"), col("price"), col("bidder"))
    val got = runMv(dir, "q7", Seq("w_start"), xform(stream)).orderBy("w_start")
    val want = xform(staged).orderBy("w_start")
    assert(got.collect().toSeq == want.collect().toSeq && want.count() > 0)
  }

  test("nexmark q8 shape: users active in both of two event types (stream join)") {
    val (staged, stream, dir) = stagedStream("nexq8")
    // two derived streams of one source, inner-joined on user with a
    // time bound — stream-stream join state pruned by watermark; the MV
    // holds the finalized join PAIRS (append mode), the per-user count
    // derives at read time (standard MV decomposition)
    def pairs(df: DataFrame, withWm: Boolean) = {
      // watermark wider than the fixture's ts span: files arrive in
      // arbitrary ts order, and this test checks join completeness (the
      // late-drop semantics are StreamingSemanticsSpec's subject)
      val base = if (withWm) df.withWatermark("ts", "90 days") else df
      val clicks = base.where(col("event_type") === "click")
        .select(col("event_id").as("ce"), col("user_id").as("cu"),
          col("ts").as("cts"))
      val buys = base.where(col("event_type") === "purchase")
        .select(col("event_id").as("be"), col("user_id").as("bu"),
          col("ts").as("bts"))
      clicks.join(buys,
        col("cu") === col("bu") &&
          col("bts").between(col("cts"), col("cts") + expr("INTERVAL 1 HOUR")))
        .select(col("ce"), col("be"), col("cu").as("user_id"))
    }
    def counts(df: DataFrame) = df.groupBy("user_id")
      .agg(count(lit(1)).as("pairs")).orderBy("user_id")
    val got = runMv(dir, "q8", Seq("ce", "be"),
      pairs(stream, withWm = true), outputMode = "append")
    val want = counts(pairs(staged, withWm = false))
    assert(counts(got).collect().toSeq == want.collect().toSeq)
    assert(got.count() > 0)
  }
}
