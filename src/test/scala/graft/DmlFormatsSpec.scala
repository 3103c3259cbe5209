package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Dml
import graft.sources.Formats
import graft.streaming.{Changelog, MaterializedView}

class DmlFormatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("DML insert/update/delete through the MV path") {
    val dir = tmpDir("dml")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 4)
    Dml.insertInto(mv, Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v"))
    Dml.updateWhere(mv, col("id") === 2, Map("v" -> lit(99.0)))
    Dml.deleteWhere(mv, col("v") < 15.0)
    val out = mv.read().orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq((2L, "b", 99.0), (3L, "c", 30.0)))
  }

  test("withRowId generates unique ids") {
    val df = Dml.withRowId(Seq("a", "b", "c").toDF("v"))
    val ids = df.select("_row_id").as[Long].collect()
    assert(ids.distinct.length == 3)
  }

  test("CSV decode") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val rows = Seq("1,alpha,1.5", "2,beta,2.5").toDF("line")
    val out = Formats.decodeCsv(rows, "line", schema)
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("Debezium decode → changelog → MV apply") {
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val payloads = Seq(
      """{"before": null, "after": {"id": 1, "v": "a"}, "op": "c"}""",
      """{"before": null, "after": {"id": 2, "v": "b"}, "op": "c"}""",
      """{"before": {"id": 1, "v": "a"}, "after": {"id": 1, "v": "a2"}, "op": "u"}""",
      """{"before": {"id": 2, "v": "b"}, "after": null, "op": "d"}"""
    ).toDF("value")
    val changelog = Formats.decodeDebezium(payloads, "value", rowSchema)
      .withColumn(Changelog.SeqCol, monotonically_increasing_id())
    val dir = tmpDir("dbz")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 2)
    mv.merge(changelog)
    val out = mv.read().orderBy("id").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a2")))
  }

  test("Maxwell decode → changelog → MV apply") {
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val payloads = Seq(
      """{"type": "insert", "data": {"id": 1, "v": "a"}}""",
      """{"type": "insert", "data": {"id": 2, "v": "b"}}""",
      """{"type": "update", "data": {"id": 1, "v": "a2"}, "old": {"v": "a"}}""",
      """{"type": "delete", "data": {"id": 2, "v": "b"}}""",
      """{"type": "bootstrap-start", "data": null}""" // non-row events drop
    ).toDF("value")
    val changelog = Formats.decodeMaxwell(payloads, "value", rowSchema)
      .withColumn(Changelog.SeqCol, monotonically_increasing_id())
    val dir = tmpDir("maxwell")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 2)
    mv.merge(changelog)
    assert(mv.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2")))
  }

  test("Canal decode: one payload carries a batch of rows in order") {
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val payloads = Seq(
      """{"type": "INSERT", "data": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}""",
      """{"type": "DELETE", "data": [{"id": 2, "v": "b"}]}"""
    ).toDF("value")
    val changelog = Formats.decodeCanal(payloads, "value", rowSchema)
    assert(changelog.count() == 3)
    val dir = tmpDir("canal")
    val mv = new MaterializedView(spark, "t", Seq("id"), s"$dir/data", nBuckets = 2)
    // apply per-payload order: insert batch first, then the delete
    mv.merge(changelog.where(col(Changelog.OpCol) === Changelog.Insert))
    mv.merge(changelog.where(col(Changelog.OpCol) === Changelog.Delete))
    assert(mv.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a")))
  }

  test("Debezium encode emits c/u/d envelopes") {
    val changelog = Seq(
      (1L, "a", Changelog.Insert), (2L, "b", Changelog.UpdateInsert),
      (3L, "c", Changelog.Delete))
      .toDF("id", "v", Changelog.OpCol)
    val encoded = Formats.encodeDebezium(changelog)
      .as[String].collect()
    assert(encoded.exists(s => s.contains(""""op":"c"""") && s.contains(""""after":{"id":1""")))
    assert(encoded.exists(s => s.contains(""""op":"u"""")))
    assert(encoded.exists(s => s.contains(""""op":"d"""") && s.contains(""""before":{"id":3""")))
  }

  test("upsert encode: delete becomes a null-value tombstone") {
    val changelog = Seq((1L, "a", Changelog.Insert), (2L, "b", Changelog.Delete))
      .toDF("id", "v", Changelog.OpCol)
    val rows = Formats.encodeUpsert(changelog, Seq("id"))
      .as[(String, Option[String])].collect().toMap
    assert(rows("""{"id":1}""").isDefined)
    assert(rows("""{"id":2}""").isEmpty)
  }

  test("file-stream source: existing files are the backfill snapshot") {
    val schema = Tables.df(spark, "/root/testdata/sf0.001", "events").schema
    // stream the raw parquet dir (nanos already converted by Tables? no —
    // raw file; use raw long schema instead via explicit read)
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val dir = tmpDir("fsrc")
    raw.write.parquet(s"$dir/in")
    val stream = Formats.fileStream(spark, s"$dir/in", raw.schema, maxFilesPerTrigger = 100)
    val q = stream.groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("fsrc_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("fsrc_out").as[(String, Long)].collect().toMap
    val batch = raw.groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("malformed payloads dead-letter instead of poisoning the stream") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val payloads = Seq(
      """{"id": 1, "v": 1.5}""",
      """not json at all""",
      """{"id": 2, "v": 2.5}""",
      """{"id": 3 "v": broken""").toDF("value")
    val (good, dead) = Formats.decodeJsonWithDeadLetter(payloads, "value", schema)
    assert(good.orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
    assert(dead.as[String].collect().toSet ==
      Set("not json at all", """{"id": 3 "v": broken"""))
  }

  test("malformed CSV rows dead-letter the same way") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val payloads = Seq("1,1.5", "two,oops", "2,2.5").toDF("value")
    val (good, dead) = Formats.decodeCsvWithDeadLetter(payloads, "value", schema)
    assert(good.orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
    assert(dead.as[String].collect().toSeq == Seq("two,oops"))
  }
}
