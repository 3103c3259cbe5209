package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ENCODE PROTOBUF — the reference's protobuf parser/encoder
  * (reference: src/connector/src/parser/protobuf/parser.rs,
  * src/connector/src/sink/encoder/proto.rs) for FLAT messages of scalar
  * fields, the payload shape row sources carry.
  *
  * No protobuf runtime ships in this container (only shaded internal
  * copies), so this speaks the public wire format directly
  * (https://protobuf.dev/programming-guides/encoding/): varint(0) for
  * int32/int64/bool/sint*, fixed64(1) for double, length-delimited(2)
  * for string/bytes, fixed32(5) for float. Unknown field numbers are
  * skipped by wire type — the standard forward-compat contract. Missing
  * fields decode as proto3 defaults for non-nullable Spark fields and
  * NULL for nullable ones.
  *
  * The descriptor is declared as a [[Field]] list (number → name/type),
  * the information a `.proto` message body carries for flat rows.
  */
object Protobuf {

  final case class Field(number: Int, name: String, dataType: DataType,
      nullable: Boolean = true)

  def schemaOf(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, f.nullable)))

  // ------------------------------------------------------------- decode

  /** FORMAT PLAIN ENCODE PROTOBUF: binary payload column → row columns. */
  def decodeProtobuf(df: DataFrame, payloadCol: String, fields: Seq[Field]): DataFrame = {
    val out = schemaOf(fields)
    val fieldList = fields.toIndexedSeq
    df.select(col(payloadCol).cast(BinaryType))
      .mapPartitions { it =>
        it.map { r =>
          val values = parseMessage(r.getAs[Array[Byte]](0), fieldList)
          Row.fromSeq(values)
        }
      }(Encoders.row(out))
  }

  private def parseMessage(bytes: Array[Byte], fields: IndexedSeq[Field]): IndexedSeq[Any] = {
    val byNumber = fields.iterator.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
    val values = new Array[Any](fields.length)
    var i = 0
    while (i < bytes.length) {
      val (tag, i1) = readVarint(bytes, i)
      val number = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      byNumber.get(number) match {
        case Some(idx) =>
          val f = fields(idx)
          wire match {
            case 0 =>
              val (v, i2) = readVarint(bytes, i1)
              values(idx) = f.dataType match {
                case BooleanType => v != 0L
                case IntegerType => v.toInt
                case LongType => v
                case other => throw new IllegalArgumentException(
                  s"field ${f.name}: varint wire type for $other")
              }
              i = i2
            case 1 =>
              values(idx) = java.lang.Double.longBitsToDouble(readFixed64(bytes, i1))
              i = i1 + 8
            case 2 =>
              val (len, i2) = readVarint(bytes, i1)
              val end = i2 + len.toInt
              values(idx) = f.dataType match {
                case StringType =>
                  new String(bytes, i2, len.toInt, StandardCharsets.UTF_8)
                case BinaryType => java.util.Arrays.copyOfRange(bytes, i2, end)
                case other => throw new IllegalArgumentException(
                  s"field ${f.name}: length-delimited wire type for $other")
              }
              i = end
            case 5 =>
              values(idx) = java.lang.Float.intBitsToFloat(readFixed32(bytes, i1))
              i = i1 + 4
            case w => throw new IllegalArgumentException(s"wire type $w")
          }
        case None => i = skipField(bytes, i1, wire) // unknown field
      }
      if (i < 0) throw new IllegalArgumentException("truncated message")
    }
    // proto3 defaults for absent non-nullable fields
    fields.indices.foreach { idx =>
      if (values(idx) == null && !fields(idx).nullable)
        values(idx) = proto3Default(fields(idx).dataType)
    }
    values.toIndexedSeq
  }

  private def proto3Default(dt: DataType): Any = dt match {
    case BooleanType => false
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0f
    case DoubleType => 0d
    case StringType => ""
    case BinaryType => Array.emptyByteArray
    case other => throw new IllegalArgumentException(s"$other")
  }

  private def readVarint(b: Array[Byte], start: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = start
    while (i < b.length) {
      val x = b(i)
      v |= (x & 0x7FL) << shift
      i += 1
      if ((x & 0x80) == 0) return (v, i)
      shift += 7
    }
    throw new IllegalArgumentException("truncated varint")
  }

  private def readFixed64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xFFL); k -= 1 }
    v
  }

  private def readFixed32(b: Array[Byte], i: Int): Int = {
    var v = 0
    var k = 3
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xFF); k -= 1 }
    v
  }

  private def skipField(b: Array[Byte], i: Int, wire: Int): Int = wire match {
    case 0 => readVarint(b, i)._2
    case 1 => i + 8
    case 2 => val (len, i2) = readVarint(b, i); i2 + len.toInt
    case 5 => i + 4
    case _ => -1
  }

  // ------------------------------------------------------------- encode

  /** Sink side: rows → one binary protobuf payload column (`value`).
    * proto3 presence: default-valued fields are omitted from the wire;
    * NULLs are omitted likewise (flat scalar fields have no explicit
    * presence here).
    */
  def encodeProtobuf(df: DataFrame, fields: Seq[Field]): DataFrame = {
    val rowSchema = df.schema
    val fieldList = fields.toIndexedSeq
    val positions = fieldList.map(f => rowSchema.fieldIndex(f.name))
    val out = StructType(Seq(StructField("value", BinaryType, nullable = false)))
    df.mapPartitions { it =>
      val bos = new ByteArrayOutputStream()
      it.map { r =>
        bos.reset()
        fieldList.indices.foreach { k =>
          val f = fieldList(k)
          val pos = positions(k)
          if (!r.isNullAt(pos)) writeField(bos, f, r.get(pos))
        }
        Row(bos.toByteArray)
      }
    }(Encoders.row(out))
  }

  private def writeField(o: ByteArrayOutputStream, f: Field, v: Any): Unit = {
    def tag(wire: Int) = writeVarint(o, (f.number.toLong << 3) | wire)
    (f.dataType, v) match {
      case (BooleanType, b: Boolean) =>
        if (b) { tag(0); writeVarint(o, 1L) }
      case (IntegerType, x: Int) =>
        // canonical int32: negatives sign-extend to 64 bits (10-byte varint)
        if (x != 0) { tag(0); writeVarint(o, x.toLong) }
      case (LongType, x: Long) =>
        if (x != 0L) { tag(0); writeVarint(o, x) }
      case (DoubleType, d: Double) =>
        if (d != 0d) { tag(1); writeFixed64(o, java.lang.Double.doubleToLongBits(d)) }
      case (FloatType, fl: Float) =>
        if (fl != 0f) { tag(5); writeFixed32(o, java.lang.Float.floatToIntBits(fl)) }
      case (StringType, s: String) =>
        if (s.nonEmpty) {
          val b = s.getBytes(StandardCharsets.UTF_8)
          tag(2); writeVarint(o, b.length.toLong); o.write(b, 0, b.length)
        }
      case (BinaryType, b: Array[Byte]) =>
        if (b.nonEmpty) { tag(2); writeVarint(o, b.length.toLong); o.write(b, 0, b.length) }
      case (dt, x) => throw new IllegalArgumentException(
        s"field ${f.name}: cannot encode $x as $dt")
    }
  }

  private def writeVarint(o: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      o.write(((v & 0x7F) | 0x80).toInt)
      v = v >>> 7
    }
    o.write((v & 0x7F).toInt)
  }

  private def writeFixed64(o: ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 8) { o.write(((v >>> (8 * k)) & 0xFF).toInt); k += 1 }
  }

  private def writeFixed32(o: ByteArrayOutputStream, v: Int): Unit = {
    var k = 0
    while (k < 4) { o.write(((v >>> (8 * k)) & 0xFF).toInt); k += 1 }
  }
}
