package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, IncrementalOver, MaterializedView}

class IncrementalOverSpec extends SparkSpecBase {
  import spark.implicits._

  private def windowFn(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user").orderBy("ts")
    df.withColumn("run_sum",
        sum(col("v").cast("decimal(18,2)")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("rn", row_number().over(w))
  }

  test("incremental OVER matches batch recompute across inserts and deletes") {
    val dir = tmpDir("iow")
    // bucketed on the window-partition column: applyDelta's touched-set
    // reads prune to the delta's buckets (the O(delta) layout)
    val base = new MaterializedView(spark, "base", Seq("id"), s"$dir/base", 4,
      bucketKeys = Seq("user"))
    val result = new MaterializedView(spark, "res", Seq("id"), s"$dir/res", 4,
      bucketKeys = Seq("user"))
    val iow = new IncrementalOver(base, result, Seq("user"), windowFn, Seq("id"))

    // batch 1: two users
    iow.applyDelta(Seq(
      (1L, "a", 10L, 1.0), (2L, "a", 20L, 2.0), (3L, "b", 10L, 5.0))
      .toDF("id", "user", "ts", "v"))
    // batch 2: touch only user a (insert mid-stream → downstream rows shift)
    iow.applyDelta(Seq((4L, "a", 15L, 0.5)).toDF("id", "user", "ts", "v"))
    // batch 3: delete a row of user a via changelog
    iow.applyDelta(Seq((2L, "a", 20L, 2.0, Changelog.Delete, 0L))
      .toDF("id", "user", "ts", "v", Changelog.OpCol, Changelog.SeqCol))

    val expected = windowFn(base.read())
      .orderBy("id").collect().map(_.toSeq).toSeq
    val actual = iow.read()
      .select("id", "user", "ts", "v", "run_sum", "rn")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(actual == expected)
    // sanity: user a now = ids 1,4 with shifted running sums
    val aRows = iow.read().where(col("user") === "a")
      .orderBy("ts").select("id", "run_sum", "rn")
      .as[(Long, Double, Int)].collect().toSeq
    assert(aRows == Seq((1L, 1.0, 1), (4L, 1.5, 2)))
  }

  test("untouched partitions are not recomputed (results preserved verbatim)") {
    val dir = tmpDir("iow2")
    // bucketed on the window-partition column: applyDelta's touched-set
    // reads prune to the delta's buckets (the O(delta) layout)
    val base = new MaterializedView(spark, "base", Seq("id"), s"$dir/base", 4,
      bucketKeys = Seq("user"))
    val result = new MaterializedView(spark, "res", Seq("id"), s"$dir/res", 4,
      bucketKeys = Seq("user"))
    val iow = new IncrementalOver(base, result, Seq("user"), windowFn, Seq("id"))
    iow.applyDelta(Seq((1L, "x", 1L, 1.0), (2L, "y", 1L, 2.0))
      .toDF("id", "user", "ts", "v"))
    iow.applyDelta(Seq((3L, "x", 2L, 3.0)).toDF("id", "user", "ts", "v"))
    val yRow = iow.read().where(col("user") === "y")
      .select("id", "run_sum", "rn").as[(Long, Double, Int)].collect().toSeq
    assert(yRow == Seq((2L, 2.0, 1)))
  }

  // ---- frame-granular path (the frame_finder analog) ----

  private def rangeFrameFn(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user").orderBy("ts").rangeBetween(-10, 0)
    df.withColumn("win_sum",
      sum(col("v").cast("decimal(18,2)")).over(w).cast("double"))
  }

  test("frame reach is inferred from the plan; unbounded/rank falls back") {
    val dir = tmpDir("iow3")
    val base = new MaterializedView(spark, "b3", Seq("id"), s"$dir/b", 4)
    val result = new MaterializedView(spark, "r3", Seq("id"), s"$dir/r", 4)
    val schema = Seq((1L, "a", 1L, 1.0)).toDF("id", "user", "ts", "v").schema

    val bounded = new IncrementalOver(base, result, Seq("user"), rangeFrameFn, Seq("id"))
    val fr = bounded.frameReachOf(schema)
    assert(fr.isDefined && fr.get.orderCol == "ts" &&
      fr.get.lookback == 10L && fr.get.lookahead == 0L)

    // running sum + row_number: ROWS frames / rank shift globally → no bound
    val unbounded = new IncrementalOver(base, result, Seq("user"), windowFn, Seq("id"))
    assert(unbounded.frameReachOf(schema).isEmpty)
  }

  test("frame-granular recompute reads a frame-reach band, not the hot partition") {
    val dir = tmpDir("iow4")
    val base = new MaterializedView(spark, "b4", Seq("id"), s"$dir/b", 4,
      bucketKeys = Seq("user"))
    val result = new MaterializedView(spark, "r4", Seq("id"), s"$dir/r", 4,
      bucketKeys = Seq("user"))
    val iow = new IncrementalOver(base, result, Seq("user"), rangeFrameFn, Seq("id"))

    // skewed fixture: one hot partition with 10k rows, one small
    val hot = (1 to 10000).map(i => (i.toLong, "h", i.toLong, 1.0))
    val small = Seq((20001L, "s", 1L, 2.0), (20002L, "s", 5L, 3.0))
    iow.applyDelta((hot ++ small).toDF("id", "user", "ts", "v"))

    // single-row delta into the hot partition
    val delta = Seq((30001L, "h", 5000L, 9.0)).toDF("id", "user", "ts", "v")
    iow.applyDelta(delta)

    // the recompute INPUT is bounded by frame reach (L=10, A=0 → a
    // ≤21-key band around the delta), nowhere near the 10k-row partition
    val fr = iow.frameReachOf(delta.schema).get
    val (input, _) = iow.frameInput(delta, fr)
    val n = input.count()
    assert(n <= 25, s"frame input read $n rows; expected ≤ 25 (reach-bounded)")

    // and the spliced result matches a full batch recompute
    val expected = rangeFrameFn(base.read())
      .orderBy("id").collect().map(_.toSeq).toSeq
    val actual = iow.read().select("id", "user", "ts", "v", "win_sum")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(actual == expected)

    // delete from the hot partition via changelog: neighbors within reach
    // get new sums, the rest of the partition is untouched verbatim
    iow.applyDelta(Seq((4999L, "h", 4999L, 1.0, Changelog.Delete, 0L))
      .toDF("id", "user", "ts", "v", Changelog.OpCol, Changelog.SeqCol))
    val expected2 = rangeFrameFn(base.read())
      .orderBy("id").collect().map(_.toSeq).toSeq
    val actual2 = iow.read().select("id", "user", "ts", "v", "win_sum")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(actual2 == expected2)
  }

  // ORDER BY ts DESC with an ASYMMETRIC frame: PRECEDING now reaches
  // toward LARGER keys, so the key-space lookback/lookahead swap.
  private def descFrameFn(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user").orderBy(col("ts").desc)
      .rangeBetween(-10, 2)
    df.withColumn("win_sum",
      sum(col("v").cast("decimal(18,2)")).over(w).cast("double"))
  }

  test("DESC order: frame reach swaps lookback/lookahead in key space") {
    val dir = tmpDir("iow5")
    val base = new MaterializedView(spark, "b5", Seq("id"), s"$dir/b", 4,
      bucketKeys = Seq("user"))
    val result = new MaterializedView(spark, "r5", Seq("id"), s"$dir/r", 4,
      bucketKeys = Seq("user"))
    val iow = new IncrementalOver(base, result, Seq("user"), descFrameFn, Seq("id"))

    // 10 PRECEDING toward larger keys, 2 FOLLOWING toward smaller keys
    val schema = Seq((1L, "a", 1L, 1.0)).toDF("id", "user", "ts", "v").schema
    val fr = iow.frameReachOf(schema).get
    assert(fr.lookback == 2L && fr.lookahead == 10L,
      s"DESC reach not swapped: $fr")

    // contiguous keys → any stale band is visible as a wrong sum
    val rows = (1 to 200).map(i => (i.toLong, "h", i.toLong, 1.0))
    iow.applyDelta(rows.toDF("id", "user", "ts", "v"))
    iow.applyDelta(Seq((901L, "h", 100L, 7.0)).toDF("id", "user", "ts", "v"))
    val expected = descFrameFn(base.read())
      .orderBy("id").collect().map(_.toSeq).toSeq
    val actual = iow.read().select("id", "user", "ts", "v", "win_sum")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(actual == expected)
  }

  test("NULL order keys: delta and base null rows stay consistent") {
    val dir = tmpDir("iow6")
    val base = new MaterializedView(spark, "b6", Seq("id"), s"$dir/b", 4,
      bucketKeys = Seq("user"))
    val result = new MaterializedView(spark, "r6", Seq("id"), s"$dir/r", 4,
      bucketKeys = Seq("user"))
    val iow = new IncrementalOver(base, result, Seq("user"), rangeFrameFn, Seq("id"))

    def check(): Unit = {
      val expected = rangeFrameFn(base.read())
        .orderBy("id").collect().map(_.toSeq).toSeq
      val actual = iow.read().select("id", "user", "ts", "v", "win_sum")
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(actual == expected)
    }

    // base with a NULL-key row from the start
    iow.applyDelta(Seq((1L, "a", Some(5L), 1.0), (2L, "a", None, 2.0),
      (3L, "a", Some(9L), 3.0)).toDF("id", "user", "ts", "v"))
    check()
    // non-NULL delta into a partition holding NULL base rows
    iow.applyDelta(Seq((4L, "a", Some(7L), 4.0)).toDF("id", "user", "ts", "v"))
    check()
    // NULL-key delta (would previously vanish from the band arithmetic)
    iow.applyDelta(Seq((5L, "a", Option.empty[Long], 8.0))
      .toDF("id", "user", "ts", "v"))
    check()
    // delete the NULL-key row via changelog
    iow.applyDelta(Seq((2L, "a", Option.empty[Long], 2.0, Changelog.Delete, 0L))
      .toDF("id", "user", "ts", "v", Changelog.OpCol, Changelog.SeqCol))
    check()
  }
}
