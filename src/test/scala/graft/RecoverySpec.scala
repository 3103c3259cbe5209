package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.MvCatalog

/** Fault-tolerance: a stopped MV job resumed from its checkpoint continues
  * exactly-once (the reference's barrier/epoch recovery — SURVEY.md §2.11;
  * its madsim recovery tests are the analog corpus).
  */
class RecoverySpec extends SparkSpecBase {
  import spark.implicits._

  test("MV job resumes from checkpoint after stop; merge stays exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("recover")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("counts", Seq("k"), nBuckets = 4)

    val ms = MemoryStream[(String, Double)]
    def agg = ms.toDF().toDF("k", "v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))

    // run 1: two batches, then stop (simulated failure/downtime)
    val q1 = mv.start(agg, cat.checkpointDir("counts"))
    ms.addData(("a", 1.0), ("b", 2.0))
    q1.processAllAvailable()
    ms.addData(("a", 3.0))
    q1.processAllAvailable()
    q1.stop()

    // run 2: same checkpoint — must pick up where run 1 committed
    val q2 = mv.start(agg, cat.checkpointDir("counts"))
    ms.addData(("b", 5.0), ("c", 7.0))
    q2.processAllAvailable()
    q2.stop()

    val out = mv.read().orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 2L, 4.0), ("b", 2L, 7.0), ("c", 1L, 7.0)))
  }

  test("recovery sanitizes a torn offsets temp file (crash-fuzz find)") {
    // A kill -9 can land between a metadata-log temp write and its
    // rename, leaving offsets/ holding ONLY `.0.<uuid>.tmp` — Spark 4
    // then refuses the restart (STATE_STORE_CHECKPOINT_LOCATION_NOT_
    // EMPTY: no committed batch ⇒ "new" query, but the dir is not
    // empty). Fabricate that exact state and prove recovery resumes.
    import java.nio.file.{Files, Paths}
    val wh = tmpDir("tornckpt")
    val e1 = new Engine(spark.newSession(), wh)
    e1.execute("SET streaming_parallelism = 2")
    e1.execute("CREATE TABLE tc_t (k BIGINT PRIMARY KEY, v BIGINT)")
    e1.execute("CREATE MATERIALIZED VIEW tc_mv (PRIMARY KEY (k)) AS " +
      "SELECT k, v * 2 AS v2 FROM tc_t")
    e1.execute("INSERT INTO tc_t VALUES (1, 10), (2, 20)")
    e1.execute("FLUSH")
    e1.streamingJob("tc_mv").foreach(_.stop())
    // tear the checkpoint the way the halt does: no committed batch
    // files, just a dangling temp + its CRC
    val off = Paths.get(wh, "tc_mv", "checkpoint", "offsets")
    Files.list(off).forEach(p => Files.delete(p))
    val com = Paths.get(wh, "tc_mv", "checkpoint", "commits")
    if (Files.exists(com)) Files.list(com).forEach(p => Files.delete(p))
    Files.write(off.resolve(".0.deadbeef-1234.tmp"), "v1".getBytes)
    Files.write(off.resolve("..0.deadbeef-1234.tmp.crc"), Array[Byte](1))

    val e2 = new Engine(spark.newSession(), wh)
    // the resumed maintenance job must start (sanitized checkpoint) and
    // keep maintaining exactly-once
    e2.execute("INSERT INTO tc_t VALUES (3, 30)")
    e2.execute("FLUSH")
    assert(e2.execute("SELECT k, v2 FROM tc_mv ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 20L), (2L, 40L), (3L, 60L)))
    e2.streamingJob("tc_mv").foreach(_.stop())
  }

  test("nexmark-style pipeline: windowed hot-items MV with per-window top-k") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("nexmark")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("hot", Seq("ws", "item"), nBuckets = 4)

    def ts(s: Long) = new Timestamp(s * 1000)
    val ms = MemoryStream[(Long, Timestamp)] // (auction item, bid time)
    val agg = ms.toDF().toDF("item", "bts")
      .withWatermark("bts", "10 seconds")
      .groupBy(window(col("bts"), "1 minute").as("w"), col("item"))
      .agg(count(lit(1)).as("bids"))
      .select(col("w.start").as("ws"), col("item"), col("bids"))
    val q = mv.start(agg, cat.checkpointDir("hot"))
    ms.addData((1L, ts(10)), (1L, ts(20)), (2L, ts(30)), (1L, ts(70)), (2L, ts(80)))
    q.processAllAvailable()
    ms.addData((3L, ts(200))) // advance watermark, close earlier windows
    q.processAllAvailable()
    q.stop()

    // per-window top-1 hot item over the MV table (GroupTopN on MV — the
    // nexmark q5 shape: MV-on-MV expressed as a batch query over the MV)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("ws").orderBy(col("bids").desc, col("item"))
    val hot = mv.read()
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("ws"), col("item"), col("bids"))
      .as[(Timestamp, Long, Long)].collect()
      .map { case (wst, item, bids) => (wst.getTime / 1000, item, bids) }.toSet
    assert(hot.contains((0L, 1L, 2L)))   // window [0,60): item 1 with 2 bids
    assert(hot.contains((60L, 1L, 1L)))  // window [60,120): tie → item 1
  }
}
