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
