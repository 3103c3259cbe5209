package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka ingestion — the reference's primary streaming source
  * (reference: src/connector/src/source/kafka/, enumerator/client.rs:
  * partition discovery; source/reader.rs: per-split consumption).
  *
  * The Spark rendering is the built-in `kafka` data source: one source
  * per topic subscription, partitions map 1:1 to Kafka partitions (the
  * reference's SourceExecutor-per-split layout falls out of Spark's
  * KafkaSourceRDD automatically), offsets checkpoint with the query.
  * Payloads decode through the SAME [[Formats]] codecs as every other
  * transport — the reference's parser matrix is transport-independent
  * (src/connector/src/parser/base.rs:337-363), and so is ours:
  * [[wireSchema]] is the only contract between transport and codec, so
  * pipelines are specced by substituting any DataFrame of that shape
  * (e.g. a file stream) where no broker exists.
  */
object Kafka {

  /** The Kafka source wire schema (what `format("kafka").load()` yields). */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = true),
    StructField("partition", IntegerType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("timestamp", TimestampType, nullable = true),
    StructField("timestampType", IntegerType, nullable = true)))

  /** `CREATE SOURCE … WITH (connector='kafka', …)`: subscribe to a topic.
    * Options mirror the reference's WITH clause (properties.bootstrap.server,
    * topic, scan.startup.mode; reference:
    * src/connector/src/source/kafka/mod.rs KafkaProperties).
    */
  def source(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    maxOffsetsPerTrigger.fold(r)(n =>
      r.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** FORMAT PLAIN ENCODE JSON over the wire value. Wire metadata columns
    * survive as `_kafka_topic`/`_kafka_partition`/`_kafka_offset`/
    * `_kafka_timestamp` (the reference's INCLUDE clause,
    * src/frontend/src/handler/create_source.rs additional columns).
    */
  def decodeValueJson(wire: DataFrame, rowSchema: StructType,
      includeMeta: Boolean = false): DataFrame = {
    val meta = metaCols(wire, includeMeta)
    Formats.decodeJson(
      wire.select(meta :+ col("value").cast(StringType).as("__payload"): _*),
      "__payload", rowSchema)
  }

  /** FORMAT DEBEZIUM ENCODE JSON over the wire value → changelog rows.
    * The Kafka offset becomes the changelog sequence: per-partition total
    * order, so several changes to one PK in a batch resolve correctly.
    */
  def decodeValueDebezium(wire: DataFrame, rowSchema: StructType): DataFrame =
    Formats.decodeDebezium(
      wire.select(col("value").cast(StringType).as("__payload"), col("offset")),
      "__payload", rowSchema, seqFrom = Some(col("offset")))

  /** FORMAT UPSERT ENCODE JSON: a null value is a delete tombstone for
    * the key (reference: src/connector/src/parser/upsert_parser.rs) —
    * the key payload carries the PK columns.
    */
  def decodeValueUpsert(wire: DataFrame, keySchema: StructType,
      rowSchema: StructType): DataFrame = {
    import graft.streaming.Changelog
    val key = from_json(col("key").cast(StringType), keySchema)
    val row = from_json(col("value").cast(StringType), rowSchema)
    val isDelete = col("value").isNull
    // deletes carry only the key image: surviving columns null out
    val merged = coalesce(row,
      from_json(to_json(key), rowSchema))
    wire.select(
        merged.as("__row"),
        when(isDelete, Changelog.Delete)
          .otherwise(Changelog.UpdateInsert).as(Changelog.OpCol),
        col("offset"))
      .select(col("__row.*"), col(Changelog.OpCol),
        coalesce(col("offset"), lit(0L)).as(Changelog.SeqCol))
  }

  /** Changelog → Kafka sink wire rows (key/value for `format("kafka")`
    * writeStream): Debezium-JSON envelope on the value, PK JSON on the
    * key so compacted topics key correctly.
    */
  def encodeDebeziumSink(changelog: DataFrame, pk: Seq[String]): DataFrame =
    changelog.select(
      to_json(struct(pk.map(col): _*)).cast(BinaryType).as("key"),
      Formats.debeziumValue(changelog).cast(BinaryType).as("value"))

  private def metaCols(wire: DataFrame, include: Boolean) =
    if (!include) Seq.empty
    else Seq(col("topic").as("_kafka_topic"),
      col("partition").as("_kafka_partition"),
      col("offset").as("_kafka_offset"),
      col("timestamp").as("_kafka_timestamp"))
}
