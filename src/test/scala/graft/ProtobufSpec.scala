package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Protobuf
import graft.sources.Protobuf.Field

/** Wire-format conformance + round-trip for the protobuf codec. Golden
  * bytes are hand-assembled from the public encoding spec so decode is
  * proven against the wire format itself, not just our own encoder.
  */
class ProtobufSpec extends SparkSpecBase {
  import spark.implicits._

  private val fields = Seq(
    Field(1, "id", LongType, nullable = false),
    Field(2, "name", StringType),
    Field(3, "score", DoubleType),
    Field(4, "active", BooleanType, nullable = false))

  test("decodes hand-assembled golden wire bytes") {
    // message { id=150 (field 1, varint); name="abc" (field 2, LEN);
    //           score=1.5 (field 3, fixed64); active=true (field 4) }
    // 0x08 0x96 0x01 : tag(1,varint)=0x08, varint 150 = 0x96 0x01
    // 0x12 0x03 'a' 'b' 'c' : tag(2,len)=0x12, len 3
    // 0x19 + little-endian bits of 1.5 : tag(3,fixed64)=0x19
    // 0x20 0x01 : tag(4,varint)=0x20, 1
    val oneFive = java.lang.Double.doubleToLongBits(1.5)
    val golden = Array[Byte](0x08, 0x96.toByte, 0x01,
        0x12, 0x03, 'a', 'b', 'c',
        0x19) ++
      (0 until 8).map(k => ((oneFive >>> (8 * k)) & 0xFF).toByte) ++
      Array[Byte](0x20, 0x01)
    val df = Seq(Tuple1(golden)).toDF("payload")
    val row = Protobuf.decodeProtobuf(df, "payload", fields).head()
    assert(row.getLong(0) == 150L && row.getString(1) == "abc" &&
      row.getDouble(2) == 1.5 && row.getBoolean(3))
  }

  test("skips unknown field numbers (forward compatibility)") {
    // field 9 (unknown, varint 7) before known field 1 = 42
    val bytes = Array[Byte](0x48, 0x07, 0x08, 0x2A)
    val df = Seq(Tuple1(bytes)).toDF("payload")
    val row = Protobuf.decodeProtobuf(df, "payload", fields).head()
    assert(row.getLong(0) == 42L && row.isNullAt(1))
  }

  test("round-trips rows including negatives, zeros, and nulls") {
    val src = Seq(
      (150L, Some("abc"), Some(1.5), true),
      (-7L, None, Some(-2.25), false),
      (0L, Some(""), None, false))
      .toDF("id", "name", "score", "active")
    val decoded = Protobuf.decodeProtobuf(
      Protobuf.encodeProtobuf(src, fields), "value", fields)
    // proto3 presence: 0 / "" / null all encode as ABSENT, so they decode
    // to null for nullable fields and the default for non-nullable ones
    val got = decoded.orderBy(col("id")).collect().toSeq.map(_.toSeq)
    assert(got == Seq(
      Seq(-7L, null, -2.25, false),
      Seq(0L, null, null, false),
      Seq(150L, "abc", 1.5, true)))
  }

  test("decodes through a streaming pipeline") {
    val dir = tmpDir("protostream")
    val src = Seq((1L, Some("a"), Some(0.5), true), (2L, Some("b"), Some(1.5), false))
      .toDF("id", "name", "score", "active")
    Protobuf.encodeProtobuf(src, fields).write.parquet(s"$dir/in")
    val stream = graft.sources.Formats.fileStream(spark, s"$dir/in",
      StructType(Seq(StructField("value", BinaryType))))
    val q = Protobuf.decodeProtobuf(stream, "value", fields)
      .writeStream.format("memory").queryName("proto_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("proto_out").orderBy("id")
      .select("id", "name").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }
}
