package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, MaterializedView, MvCatalog}

class MaterializedViewSpec extends SparkSpecBase {
  import spark.implicits._

  test("merge: upsert semantics across batches, bucket-pruned rewrite") {
    val dir = tmpDir("mv")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 8)
    mv.merge(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    mv.merge(Seq((2L, 21.0), (3L, 30.0)).toDF("id", "v"))
    val out = mv.read().orderBy("id").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0), (2L, 21.0), (3L, 30.0)))
  }

  test("merge: delete via changelog ops") {
    val dir = tmpDir("mv")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 4)
    mv.merge(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val delta = Seq((1L, "a", Changelog.Delete, 1L), (3L, "c", Changelog.Insert, 2L))
      .toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    mv.merge(delta)
    val out = mv.read().orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "b"), (3L, "c")))
  }

  test("streaming MV: incremental grouped count equals batch recompute") {
    val dir = tmpDir("mvs")
    val cat = new MvCatalog(spark, dir)
    val mv = cat.define("by_type", Seq("event_type"), nBuckets = 4)

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    ms.addData(("click", 1.0), ("view", 2.0), ("click", 3.0))
    val agg = ms.toDF().toDF("event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    val q = mv.start(agg, cat.checkpointDir("by_type"))
    q.processAllAvailable()

    ms.addData(("click", 5.0), ("buy", 7.0))
    q.processAllAvailable()
    q.stop()

    val out = mv.read().orderBy("event_type")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("buy", 1L, 7.0), ("click", 3L, 9.0), ("view", 1L, 2.0)))
  }

  test("MV-on-MV via changelog subscription: downstream tracks upstream incrementally") {
    val dir = tmpDir("mvchain2")
    val cat = new MvCatalog(spark, dir)
    val up = cat.define("up2", Seq("k"), nBuckets = 4)

    // upstream batch 1 (also seeds its changelog channel)
    up.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"))

    // downstream MV subscribes to the upstream CHANGELOG stream and
    // applies a transform; ops flow through so deletes propagate
    val down = cat.define("down2", Seq("k"), nBuckets = 4)
    val stream = up.changelogStream()
      .withColumn("n2", col("n") * 10)
      .drop("n")
    val q = down.start(stream, cat.checkpointDir("down2"))
    q.processAllAvailable()

    // upstream batch 2: update + delete, downstream must follow
    up.merge(Seq(("a", 5L, Changelog.UpdateInsert, 1L), ("b", 2L, Changelog.Delete, 2L))
      .toDF("k", "n", Changelog.OpCol, Changelog.SeqCol))
    q.processAllAvailable()
    q.stop()

    val got = down.read().orderBy("k").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 50L)))
  }

  test("merge is idempotent per epoch: a retried batch never double-publishes") {
    val dir = tmpDir("mvidem")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 4)
    val delta = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    mv.merge(delta, batchId = 7L)
    mv.merge(delta, batchId = 7L) // foreachBatch retry after a failure
    // storage unchanged (PK upsert) AND the changelog holds the delta ONCE
    assert(mv.read().count() == 2)
    assert(mv.readChangelog().count() == 2)
  }

  test("expireChangelog: consumed epochs compact away, downstream unaffected") {
    val dir = tmpDir("mvexp")
    val cat = new MvCatalog(spark, dir)
    val up = cat.define("upx", Seq("k"), nBuckets = 4)
    up.merge(Seq(("a", 1L)).toDF("k", "n"), batchId = 0L)

    val down = cat.define("downx", Seq("k"), nBuckets = 4)
    val q = down.start(up.changelogStream().withColumn("n2", col("n") * 10).drop("n"),
      cat.checkpointDir("downx"))
    q.processAllAvailable()

    // subscriber has committed past epoch 0 → expire it, keep streaming
    up.expireChangelog(upToBatchId = 0L)
    up.merge(Seq(("b", 2L)).toDF("k", "n"), batchId = 1L)
    q.processAllAvailable()
    q.stop()

    assert(up.readChangelog().count() == 1) // only epoch 1 survives
    val got = down.read().orderBy("k").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 10L), ("b", 20L)))
  }

  test("IncrementalAgg: grouped max falls back when the max row is deleted") {
    val dir = tmpDir("mvagg")
    val cat = new MvCatalog(spark, dir)
    // base = materialized input, bucketed on the GROUP column so the
    // touched-group recompute reads only that group's buckets
    val base = cat.define("rows", Seq("grp", "id"), nBuckets = 4,
      bucketKeys = Seq("grp"))
    val aggMv = cat.define("grp_minmax", Seq("grp"), nBuckets = 4)
    val inc = new graft.streaming.IncrementalAgg(base, aggMv, Seq("grp"),
      df => df.groupBy("grp").agg(max(col("v")).as("mx"), min(col("v")).as("mn")))

    inc.applyDelta(Seq(("g1", 1L, 10.0), ("g1", 2L, 30.0), ("g1", 3L, 20.0),
      ("g2", 4L, 5.0)).toDF("grp", "id", "v"))
    assert(inc.read().orderBy("grp").as[(String, Double, Double)].collect().toSeq ==
      Seq(("g1", 30.0, 10.0), ("g2", 5.0, 5.0)))

    // delete the current max of g1 → falls back to 20.0 (materialized
    // input re-derivation; a delta-only incremental max cannot do this)
    inc.applyDelta(Seq(("g1", 2L, 30.0, Changelog.Delete))
      .toDF("grp", "id", "v", Changelog.OpCol))
    assert(inc.read().orderBy("grp").as[(String, Double, Double)].collect().toSeq ==
      Seq(("g1", 20.0, 10.0), ("g2", 5.0, 5.0)))

    // delete g2's last row → the group disappears from the aggregate MV
    inc.applyDelta(Seq(("g2", 4L, 5.0, Changelog.Delete))
      .toDF("grp", "id", "v", Changelog.OpCol))
    assert(inc.read().orderBy("grp").as[(String, Double, Double)].collect().toSeq ==
      Seq(("g1", 20.0, 10.0)))
  }

  test("changelog fan-out: two independent subscribers stay consistent") {
    val dir = tmpDir("mvfan")
    val cat = new MvCatalog(spark, dir)
    val up = cat.define("fan_up", Seq("k"), nBuckets = 4)
    up.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), batchId = 0L)

    val d1 = cat.define("fan_d1", Seq("k"), nBuckets = 4)
    val d2 = cat.define("fan_d2", Seq("k"), nBuckets = 4)
    val q1 = d1.start(up.changelogStream().withColumn("x10", col("n") * 10).drop("n"),
      cat.checkpointDir("fan_d1"))
    val q2 = d2.start(up.changelogStream().withColumn("neg", -col("n")).drop("n"),
      cat.checkpointDir("fan_d2"))
    q1.processAllAvailable(); q2.processAllAvailable()

    up.merge(Seq(("b", 2L, Changelog.Delete)).toDF("k", "n", Changelog.OpCol),
      batchId = 1L)
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    assert(d1.read().orderBy("k").as[(String, Long)].collect().toSeq ==
      Seq(("a", 10L)))
    assert(d2.read().orderBy("k").as[(String, Long)].collect().toSeq ==
      Seq(("a", -1L)))
  }

  test("subscribeWithBackfill: late subscriber seeds from storage after retention") {
    val dir = tmpDir("mvbackfill")
    val cat = new MvCatalog(spark, dir)
    val up = cat.define("bf_up", Seq("k"), nBuckets = 4)
    up.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"), batchId = 0L)
    up.merge(Seq(("a", 10L)).toDF("k", "n"), batchId = 1L)
    // epoch 0 is gone from the log: only storage holds full history now
    up.expireChangelog(upToBatchId = 0L)

    val down = cat.define("bf_down", Seq("k"), nBuckets = 4)
    val q = up.subscribeWithBackfill(down, cat.checkpointDir("bf_down"),
      df => df.withColumn("n2", col("n") * 10).drop("n"))
    q.processAllAvailable()
    // seeded state covers BOTH epochs (b only ever existed in epoch 0)
    assert(down.read().orderBy("k").as[(String, Long)].collect().toSeq ==
      Seq(("a", 100L), ("b", 20L)))

    // post-subscription epochs flow through the tail, incl. deletes
    up.merge(Seq(("b", 2L, Changelog.Delete))
      .toDF("k", "n", Changelog.OpCol), batchId = 2L)
    up.merge(Seq(("c", 3L)).toDF("k", "n"), batchId = 3L)
    q.processAllAvailable()
    q.stop()
    assert(down.read().orderBy("k").as[(String, Long)].collect().toSeq ==
      Seq(("a", 100L), ("c", 30L)))
  }

  test("MV-on-MV: downstream reads upstream target") {
    val dir = tmpDir("mvchain")
    val cat = new MvCatalog(spark, dir)
    val up = cat.define("up", Seq("k"))
    up.merge(Seq(("a", 1L), ("b", 2L)).toDF("k", "n"))
    // downstream: batch transform over the upstream MV table
    val down = cat.define("down", Seq("k"))
    down.merge(up.read().withColumn("n2", col("n") * 2))
    val out = down.read().orderBy("k").select("k", "n2").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 2L), ("b", 4L)))
  }
}
