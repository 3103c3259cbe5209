package graft

import org.apache.spark.sql.functions._

import graft.streaming.MvCatalog

/** End-to-end: the real events fixture (parquet TIMESTAMP(NANOS)) streamed
  * through the nanos→micros conversion into a windowed MV, checked against
  * the batch recompute — the full StreamSource→window-agg→Materialize
  * pipeline on driver data.
  */
class EventsStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("events file-stream → tumbling MV equals batch recompute") {
    val sfDir = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$sfDir/events.parquet") // raw on-disk ts
    val dir = tmpDir("evmv")
    val srcDir = s"$dir/in"
    // file-stream sources need a directory; stage the fixture file into one
    raw.write.parquet(srcDir)
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("hourly", Seq("ws", "event_type"), nBuckets = 8)

    val stream = Tables.normalizeEventsTs(spark.readStream
      .schema(raw.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir))
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sv"))

    val q = mv.start(stream, cat.checkpointDir("hourly"))
    q.processAllAvailable()
    q.stop()

    val batch = Tables.df(spark, sfDir, "events")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sv"))

    val got = mv.read().orderBy("ws", "event_type")
      .collect().map(_.toSeq).toSeq
    val want = batch.orderBy("ws", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(got == want && got.nonEmpty)
  }
}
