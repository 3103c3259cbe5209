package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps._

class StatefulOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("retractableTopK: deletes retract, top-k tracks batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ScoredChange]
    val q = StatefulOps.retractableTopK(ms.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()

    ms.addData(
      ScoredChange("g", 1, 10.0, 1), ScoredChange("g", 2, 20.0, 1),
      ScoredChange("g", 3, 30.0, 1))
    q.processAllAvailable()
    val after1 = spark.table("topk_out").as[TopKUpdate].collect().last
    assert(after1.ids == Seq(3L, 2L))

    // retract the current max → next two float up
    ms.addData(ScoredChange("g", 3, 30.0, -1))
    q.processAllAvailable()
    val after2 = spark.table("topk_out").as[TopKUpdate].collect().last
    assert(after2.ids == Seq(2L, 1L))
    q.stop()
  }

  test("asofJoin: probe matches latest right version at-or-before ts") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[AsofIn]
    val q = StatefulOps.asofJoin(ms.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()

    // batch 1: two right versions, then probes
    ms.addData(
      AsofIn("k", "R", 100L, 0, 1.0), AsofIn("k", "R", 200L, 0, 2.0))
    q.processAllAvailable()
    ms.addData(
      AsofIn("k", "L", 150L, 10, 0), // matches version ts=100
      AsofIn("k", "L", 250L, 11, 0), // matches version ts=200
      AsofIn("k", "L", 50L, 12, 0))  // before all versions → no match
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_out").as[AsofOut].collect()
      .map(o => o.leftId -> (o.rightTs, o.payload)).toMap
    assert(out == Map(10L -> (100L, 1.0), 11L -> (200L, 2.0)))
  }

  test("eowcSort: rows released in event-time order as watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(TimedRow, Long)]
    val q = StatefulOps.eowcSort(ms.toDS())
      .writeStream.format("memory").queryName("eowc_out")
      .outputMode("append").start()

    // batch 1: out-of-order rows, watermark 20 → only ts<=20 emitted sorted
    ms.addData(
      (TimedRow("k", 30L, 3.0), 20L),
      (TimedRow("k", 10L, 1.0), 20L),
      (TimedRow("k", 20L, 2.0), 20L))
    q.processAllAvailable()
    val emitted1 = spark.table("eowc_out").as[TimedRow].collect().toSeq
    assert(emitted1.map(_.ts) == Seq(10L, 20L))

    // batch 2: watermark 40 → buffered ts=30 plus new ts=35 in order
    ms.addData((TimedRow("k", 35L, 3.5), 40L))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("eowc_out").as[TimedRow].collect().toSeq
    assert(all.map(_.ts) == Seq(10L, 20L, 30L, 35L))
  }
}
