package graft

import graft.streaming.Changelog
import org.apache.spark.sql.functions._

class ChangelogSpec extends SparkSpecBase {
  import spark.implicits._

  test("applyToSnapshot: insert, update, delete") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val changes = Seq(
      (2L, "b2", 21.0, Changelog.UpdateInsert, 1L), // update 2
      (3L, "c", 30.0, Changelog.Delete, 2L),        // delete 3
      (4L, "d", 40.0, Changelog.Insert, 3L)         // insert 4
    ).toDF("id", "name", "v", Changelog.OpCol, Changelog.SeqCol)
    val out = Changelog.applyToSnapshot(snap, changes, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((1L, "a", 10.0), (2L, "b2", 21.0), (4L, "d", 40.0)))
  }

  test("applyToSnapshot: last change per key wins by seq") {
    val snap = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq(
      (1L, "x", Changelog.UpdateInsert, 1L),
      (1L, "y", Changelog.UpdateInsert, 5L),
      (1L, "z", Changelog.UpdateInsert, 3L)
    ).toDF("id", "v", Changelog.OpCol, Changelog.SeqCol)
    val out = Changelog.applyToSnapshot(snap, changes, Seq("id"))
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "y")))
  }

  test("diff emits insert/delete/update ops") {
    val before = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val after = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    val d = Changelog.diff(before, after, Seq("id"))
      .select("id", "v", Changelog.OpCol)
      .as[(Long, String, Int)].collect().toSet
    assert(d == Set(
      (1L, "a", Changelog.Delete),
      (3L, "c", Changelog.Insert),
      (2L, "b2", Changelog.UpdateInsert)))
  }

  test("diff then apply reproduces the after-state") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v")
    val delta = Changelog.diff(before, after, Seq("id"))
    val rebuilt = Changelog.applyToSnapshot(before, delta, Seq("id"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(rebuilt == Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }
}
