package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Proves the correctness/bench harnesses report failure LOUDLY: a thrown
  * query must leave a red marker the driver can key on (empty dir +
  * `_error.txt`, an entry in errors.json) and must be excluded from bench
  * timings — never silently vanish (the round-4 q_fn_time failure mode).
  */
class VerifyHarnessSpec extends SparkSpecBase {

  private val boom: (SparkSession, String) => DataFrame =
    (_, _) => throw new RuntimeException("deliberate harness-test failure")

  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(3).toDF("id")

  test("Verify.runOne on a throwing query: empty dir + _error.txt, no parquet") {
    val out = tmpDir("vfy")
    val err = Verify.runOne(spark, out, "q_broken", boom, "/nowhere")
    assert(err.exists(_.contains("deliberate harness-test failure")))
    val dir = Paths.get(out, "q_broken")
    assert(Files.exists(dir.resolve("_error.txt")))
    val listing = Files.list(dir).toArray.map(_.toString)
    assert(listing.length == 1, s"marker must be alone: ${listing.toSeq}")
    // a reader globbing <name>/*.parquet must find nothing to read
    assert(!listing.exists(_.endsWith(".parquet")))
  }

  test("Verify.runOne failure after a prior good dump leaves no stale parquet") {
    val out = tmpDir("vfy2")
    assert(Verify.runOne(spark, out, "q", ok, "/nowhere").isEmpty)
    assert(Files.list(Paths.get(out, "q")).toArray
      .exists(_.toString.endsWith(".parquet")))
    // same name now fails: the old green parquet must NOT survive to be
    // read as this round's result
    assert(Verify.runOne(spark, out, "q", boom, "/nowhere").isDefined)
    val listing = Files.list(Paths.get(out, "q")).toArray.map(_.toString)
    assert(!listing.exists(_.endsWith(".parquet")) &&
      listing.exists(_.endsWith("_error.txt")))
  }

  test("errors.json is always written and json-parseable") {
    val out = tmpDir("vfy3")
    Verify.writeErrors(out, Nil)
    assert(Files.readString(Paths.get(out, "errors.json")) == "{}")
    Verify.writeErrors(out, Seq("q_bad" -> "line1\nline2 \"quoted\"\tmsg"))
    val txt = Files.readString(Paths.get(out, "errors.json"))
    assert(txt.contains("\"q_bad\"") && txt.contains("\\n") &&
      txt.contains("\\\"quoted\\\"") && txt.contains("\\t"))
  }

  test("Bench.measure: failure is Left, success times every repeat") {
    assert(Bench.measure(spark, "/nowhere", 2, boom)
      .left.exists(_.contains("deliberate")))
    val r = Bench.measure(spark, "/nowhere", 3, ok)
    assert(r.exists(ts => ts.length == 3 && ts.forall(_ >= 0)))
  }
}
