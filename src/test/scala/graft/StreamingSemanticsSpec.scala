package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native Structured Streaming coverage of the reference's streaming
  * semantics (SURVEY.md §2.11): watermarked tumbling aggregation with
  * append mode (EMIT ON WINDOW CLOSE), streaming dedup, stream-stream
  * join — each checked against its batch recompute.
  */
class StreamingSemanticsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("watermark + tumbling window in append mode emits closed windows only") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = ms.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()

    ms.addData((ts(10), 1.0), (ts(20), 2.0), (ts(70), 3.0))
    q.processAllAvailable()
    // watermark after batch1 = 70-10=60 → window [0,60) closed
    ms.addData((ts(200), 4.0)) // advances watermark past window [60,120)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tumble_out").as[(Timestamp, Long)].collect()
      .map { case (w, n) => w.getTime / 1000 -> n }.toMap
    assert(out == Map(0L -> 2L, 60L -> 1L))
  }

  test("late rows beyond the watermark are dropped (WatermarkFilter analog)") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val agg = ms.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    ms.addData((ts(100), 1.0))
    q.processAllAvailable() // watermark → 95
    ms.addData((ts(10), 9.0)) // far late → dropped
    ms.addData((ts(200), 2.0)) // closes [90,120)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("late_out").as[(Timestamp, Long)].collect()
      .map { case (w, n) => w.getTime / 1000 -> n }.toMap
    assert(out.get(90L).contains(1L))
    assert(!out.contains(0L)) // late row produced no window
  }

  test("streaming dropDuplicates keeps first occurrence per key") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("id", "v")
      .dropDuplicates(Seq("id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    ms.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    ms.addData((1L, "a2"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("stream-stream inner join with watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Long, Timestamp)]
    val r = MemoryStream[(Long, Timestamp)]
    val lf = l.toDF().toDF("k", "lts").withWatermark("lts", "10 seconds")
    val rf = r.toDF().toDF("k2", "rts").withWatermark("rts", "10 seconds")
    val joined = lf.join(rf,
      col("k") === col("k2") &&
        col("rts").between(col("lts") - expr("INTERVAL 30 SECONDS"),
          col("lts") + expr("INTERVAL 30 SECONDS")))
      .select("k", "lts", "rts")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    l.addData((1L, ts(100)), (2L, ts(100)))
    r.addData((1L, ts(110)), (3L, ts(100)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssj_out").as[(Long, Timestamp, Timestamp)]
      .collect().map(_._1).toSeq
    assert(out == Seq(1L))
  }

  test("temporal (stream-static) join: dim re-resolved per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dimDir = tmpDir("dim")
    Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val ms = MemoryStream[(Long, Double)]
    val joined = ms.toDF().toDF("k", "v").join(dim, Seq("k"))
    val q = joined.writeStream.format("memory").queryName("tj_out")
      .outputMode("append").start()
    ms.addData((1L, 10.0), (3L, 30.0)) // 3 has no dim row → dropped
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tj_out").select("k", "tier")
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "gold")))
  }

  test("stream-stream LEFT OUTER join emits null-padded rows after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[(Long, Timestamp)]
    val r = MemoryStream[(Long, Timestamp)]
    val lf = l.toDF().toDF("k", "lts").withWatermark("lts", "5 seconds")
    val rf = r.toDF().toDF("k2", "rts").withWatermark("rts", "5 seconds")
    val joined = lf.join(rf,
      col("k") === col("k2") &&
        col("rts").between(col("lts") - expr("INTERVAL 10 SECONDS"),
          col("lts") + expr("INTERVAL 10 SECONDS")),
      "left_outer")
      .select(col("k"), col("rts"))
    val q = joined.writeStream.format("memory").queryName("ssoj_out")
      .outputMode("append").start()
    l.addData((1L, ts(100)), (2L, ts(100)))
    r.addData((1L, ts(105)))
    q.processAllAvailable()
    // advance both watermarks far enough to expire the unmatched left row
    l.addData((9L, ts(500)))
    r.addData((9L, ts(500)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ssoj_out").as[(Long, Option[Timestamp])].collect()
      .map { case (k, rts) => k -> rts.isDefined }.toMap
    assert(out(1L))       // matched
    assert(!out(2L))      // expired unmatched → null-padded
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val q = ms.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark(Seq("id"))
      .writeStream.format("memory").queryName("dwm_out")
      .outputMode("append").start()
    ms.addData((1L, ts(100)), (1L, ts(101)))
    q.processAllAvailable()
    ms.addData((2L, ts(300))) // watermark advances far past id=1's window
    q.processAllAvailable()
    ms.addData((1L, ts(301))) // same key, but outside the dedup window → kept
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dwm_out").as[(Long, Timestamp)].collect().map(_._1)
    assert(ids.count(_ == 1L) == 2) // first occurrence + re-admitted late one
    assert(ids.count(_ == 2L) == 1)
  }

  test("session_window streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Timestamp)]
    val agg = ms.toDF().toDF("u", "ts")
      .withWatermark("ts", "5 seconds")
      .groupBy(col("u"), session_window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("u"), col("w.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    ms.addData(("a", ts(10)), ("a", ts(15)), ("a", ts(40)))
    q.processAllAvailable()
    ms.addData(("a", ts(120))) // advance watermark → close sessions
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out").as[(String, Timestamp, Long)].collect()
      .map { case (u, w, n) => (u, w.getTime / 1000, n) }.toSet
    assert(out.contains(("a", 10L, 2L)))
    assert(out.contains(("a", 40L, 1L)))
  }
}
