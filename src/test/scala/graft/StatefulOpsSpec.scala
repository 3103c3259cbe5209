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
    assert(after1.live == 3)

    // retract the current max → next two float up
    ms.addData(ScoredChange("g", 3, 30.0, -1))
    q.processAllAvailable()
    val after2 = spark.table("topk_out").as[TopKUpdate].collect().last
    assert(after2.ids == Seq(2L, 1L))
    assert(after2.live == 2)
    q.stop()
  }

  test("retractableTopKCleaned: watermark expires old items from state") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(TimedScoredChange, Long)]
    val q = StatefulOps.retractableTopKCleaned(ms.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_clean_out")
      .outputMode("update").start()

    // three items at ts 10/20/30, watermark 0 → all live
    ms.addData(
      (TimedScoredChange("g", 1, 10.0, 1, 10L), 0L),
      (TimedScoredChange("g", 2, 20.0, 1, 20L), 0L),
      (TimedScoredChange("g", 3, 30.0, 1, 30L), 0L))
    q.processAllAvailable()
    val after1 = spark.table("topk_clean_out").as[TopKUpdate].collect().last
    assert(after1.ids == Seq(3L, 2L) && after1.live == 3)

    // watermark 25 → items at ts 10 and 20 expire; only id=3 (+ new id=4)
    ms.addData((TimedScoredChange("g", 4, 5.0, 1, 40L), 25L))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.table("topk_clean_out").as[TopKUpdate].collect().last
    assert(after2.ids == Seq(3L, 4L))
    assert(after2.live == 2) // state bounded: expired items dropped
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
    assert(out == Map(10L -> (Some(100L), Some(1.0)), 11L -> (Some(200L), Some(2.0))))
  }

  test("asofJoin inequality variants: Lt strict, Ge/Gt forward probes") {
    implicit val sqlCtx = spark.sqlContext
    def run(ineq: AsofIneq, name: String): Map[Long, Option[Long]] = {
      val ms = MemoryStream[(AsofIn, Long)]
      val q = StatefulOps.asofJoin(ms.toDS(), ineq, leftOuter = false)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      ms.addData(
        (AsofIn("k", "R", 100L, 0, 1.0), 0L),
        (AsofIn("k", "R", 200L, 0, 2.0), 0L))
      q.processAllAvailable()
      ms.addData(
        (AsofIn("k", "L", 100L, 10, 0), 0L),  // at a version boundary
        (AsofIn("k", "L", 150L, 11, 0), 0L),  // between versions
        (AsofIn("k", "L", 250L, 12, 0), 0L))  // after all versions
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[AsofOut].collect()
        .map(o => o.leftId -> o.rightTs).toMap
    }
    // Le: boundary matches itself; Lt: boundary takes the previous (none)
    assert(run(AsofLe, "asof_le") ==
      Map(10L -> Some(100L), 11L -> Some(100L), 12L -> Some(200L)))
    assert(run(AsofLt, "asof_lt") ==
      Map(11L -> Some(100L), 12L -> Some(200L)))
    // Ge: earliest version at-or-after; Gt: strictly after
    assert(run(AsofGe, "asof_ge") ==
      Map(10L -> Some(100L), 11L -> Some(200L)))
    assert(run(AsofGt, "asof_gt") ==
      Map(10L -> Some(200L), 11L -> Some(200L)))
  }

  test("asofJoin left outer: unmatched probes emit null-padded rows") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(AsofIn, Long)]
    val q = StatefulOps.asofJoin(ms.toDS(), AsofLe, leftOuter = true)
      .writeStream.format("memory").queryName("asof_outer")
      .outputMode("append").start()
    ms.addData((AsofIn("k", "R", 100L, 0, 1.0), 0L))
    q.processAllAvailable()
    ms.addData(
      (AsofIn("k", "L", 50L, 10, 0), 0L),   // before all versions → padded
      (AsofIn("k", "L", 150L, 11, 0), 0L))  // matched
    q.processAllAvailable()
    q.stop()
    val out = spark.table("asof_outer").as[AsofOut].collect()
      .map(o => o.leftId -> (o.rightTs, o.payload)).toMap
    assert(out == Map(10L -> (None, None), 11L -> (Some(100L), Some(1.0))))
  }

  test("asofJoin: watermark passage bounds right-side state") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(AsofIn, Long)]
    val q = StatefulOps.asofJoin(ms.toDS(), AsofLe, leftOuter = false)
      .writeStream.format("memory").queryName("asof_wm")
      .outputMode("append").start()

    // five right versions, then a probe with watermark still at 0 —
    // all five retained
    ms.addData((1 to 5).map(i => (AsofIn("k", "R", i * 100L, 0, i.toDouble), 0L)): _*)
    q.processAllAvailable()
    ms.addData((AsofIn("k", "L", 999L, 10, 0), 0L))
    q.processAllAvailable()
    assert(spark.table("asof_wm").as[AsofOut].collect().last.stateSize == 5)

    // watermark 450 → versions 100..400 are unreachable except the
    // latest below wm (400); state shrinks to {400, 500}
    ms.addData((AsofIn("k", "L", 999L, 11, 0), 450L))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("asof_wm").as[AsofOut].collect().last
    assert(last.rightTs == Some(500L)) // semantics unchanged by pruning
    assert(last.stateSize == 2)        // state bounded after watermark
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

  test("eowcOverWindow: finalized running aggregates, emitted exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(TimedRow, Long)]
    val q = StatefulOps.eowcOverWindow(ms.toDS())
      .writeStream.format("memory").queryName("eowcw_out")
      .outputMode("append").start()

    // batch 1: out-of-order arrivals, watermark 20 → ts 10,20 finalize
    // with running sum/rank in event-time order; ts 30 stays pending
    ms.addData(
      (TimedRow("k", 30L, 3.0), 20L),
      (TimedRow("k", 10L, 1.0), 20L),
      (TimedRow("k", 20L, 2.0), 20L))
    q.processAllAvailable()
    val got1 = spark.table("eowcw_out").as[OverOut].collect().toSeq
    assert(got1 == Seq(
      OverOut("k", 10L, 1.0, 1.0, 1L),
      OverOut("k", 20L, 2.0, 3.0, 2L)))

    // batch 2: watermark 40 → pending ts=30 finalizes CONTINUING the
    // accumulators (sum 6.0, rank 3) — emitted rows were never re-read;
    // a late row below the frontier (ts=15) is dropped, not re-emitted
    ms.addData(
      (TimedRow("k", 15L, 9.9), 40L),
      (TimedRow("k", 35L, 3.5), 40L))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("eowcw_out").as[OverOut].collect().toSeq
    assert(all == got1 ++ Seq(
      OverOut("k", 30L, 3.0, 6.0, 3L),
      OverOut("k", 35L, 3.5, 9.5, 4L)))
  }
}
