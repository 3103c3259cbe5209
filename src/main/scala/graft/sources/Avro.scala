package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ENCODE AVRO — the reference's Avro parser/encoder pair
  * (reference: src/connector/src/parser/avro/parser.rs,
  * src/connector/src/sink/encoder/avro.rs), covering plain binary Avro
  * payloads of flat records (scalars + nullable unions + timestamp-micros,
  * the payload shapes the reference's AccessBuilder accepts for row
  * sources).
  *
  * Spark altitude note: this container carries no spark-avro module, so
  * the codec drives Avro core directly inside `mapPartitions` — one
  * reader/decoder pair per partition, streamed, no driver involvement.
  * The decode is a per-partition tight loop over binary blobs (the same
  * execution shape spark-avro's AvroDataToCatalyst lowers to).
  */
object Avro {

  /** Spark StructType → Avro record schema. Nullable fields become
    * `["null", T]` unions with null default — the canonical Avro
    * rendering the reference's schema resolution expects.
    */
  def avroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      val base = baseSchema(f.dataType)
      val sch =
        if (f.nullable) Schema.createUnion(
          java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def baseSchema(dt: DataType): Schema = dt match {
    case StringType => Schema.create(Schema.Type.STRING)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case other => throw new IllegalArgumentException(
      s"ENCODE AVRO: unsupported field type $other (flat records only)")
  }

  /** FORMAT PLAIN ENCODE AVRO: decode a binary Avro payload column into
    * the row columns. Output carries exactly `rowSchema`'s columns.
    */
  def decodeAvro(df: DataFrame, payloadCol: String, rowSchema: StructType): DataFrame = {
    val schemaJson = avroSchema(rowSchema).toString
    val fields = rowSchema.fields
    df.select(col(payloadCol).cast(BinaryType))
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        val reader = new GenericDatumReader[GenericRecord](schema)
        var decoder: BinaryDecoder = null
        var record: GenericRecord = null
        it.map { r =>
          decoder = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](0), decoder)
          record = reader.read(record, decoder)
          Row.fromSeq(fields.toIndexedSeq.map(f =>
            fromAvro(record.get(f.name), f.dataType)))
        }
      }(Encoders.row(rowSchema))
  }

  /** Sink side: rows → one binary Avro payload column (`value`). */
  def encodeAvro(df: DataFrame): DataFrame = {
    val rowSchema = df.schema
    val schemaJson = avroSchema(rowSchema).toString
    val out = StructType(Seq(StructField("value", BinaryType, nullable = false)))
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new ByteArrayOutputStream()
      var encoder: BinaryEncoder = null
      it.map { r =>
        bos.reset()
        encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
        val rec = new GenericData.Record(schema)
        rowSchema.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(if (r.isNullAt(i)) null else r.get(i), f.dataType))
        }
        writer.write(rec, encoder)
        encoder.flush()
        Row(bos.toByteArray)
      }
    }(Encoders.row(out))
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (b: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case (l: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        Math.floorMod(l.longValue(), 1000000L) * 1000L))
    case (x, _) => x
  }

  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (t: java.sql.Timestamp, TimestampType) =>
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case (x, _) => x
  }
}
