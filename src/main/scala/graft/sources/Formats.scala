package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Changelog

/** Source/sink format codecs — SURVEY.md §2.1 (FORMAT Plain/Upsert/
  * Debezium × ENCODE Json/Csv; reference: src/connector/src/source/base.rs
  * :337-363 and src/connector/src/parser/). Everything is a DataFrame →
  * DataFrame transform over a raw string column, so the same codec runs in
  * batch and in a `readStream` pipeline unchanged.
  */
object Formats {

  /** FORMAT PLAIN ENCODE JSON: decode a JSON payload column. */
  def decodeJson(df: DataFrame, payloadCol: String, schema: StructType): DataFrame =
    df.withColumn("__d", from_json(col(payloadCol), schema))
      .select(col("*"), col("__d.*")).drop("__d", payloadCol)

  /** Decode with dead-lettering: unparsable payloads route to a side
    * channel instead of nulling out silently — the reference parser's
    * error tolerance (malformed rows are skipped and counted, not
    * poisoned into the stream; reference: src/connector/src/parser/
    * mod.rs parse error accounting). PERMISSIVE mode half-parses broken
    * records (fields it reached, nulls for the rest) — the corrupt-record
    * column marks them exactly, so the split is one parse + a codegen'd
    * predicate.
    */
  def decodeJsonWithDeadLetter(
      df: DataFrame, payloadCol: String, schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "__corrupt"
    require(!schema.fieldNames.contains(corrupt))
    val parsed = df.withColumn("__d",
      from_json(col(payloadCol), schema.add(corrupt, StringType),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt)))
    val bad = col("__d").isNull || col(s"__d.$corrupt").isNotNull
    val good = parsed.where(!bad)
      .select(col("*"), col("__d.*")).drop("__d", payloadCol, corrupt)
    val dead = parsed.where(bad).select(col(payloadCol).as("payload"))
    (good, dead)
  }

  /** FORMAT PLAIN ENCODE CSV. */
  def decodeCsv(df: DataFrame, payloadCol: String, schema: StructType,
      options: Map[String, String] = Map.empty): DataFrame =
    df.withColumn("__d", from_csv(col(payloadCol), schema, options))
      .select(col("*"), col("__d.*")).drop("__d", payloadCol)

  /** CSV twin of [[decodeJsonWithDeadLetter]] — same corrupt-record
    * split, same single-parse cost.
    */
  def decodeCsvWithDeadLetter(
      df: DataFrame, payloadCol: String, schema: StructType,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) = {
    val corrupt = "__corrupt"
    require(!schema.fieldNames.contains(corrupt))
    val parsed = df.withColumn("__d",
      from_csv(col(payloadCol), schema.add(corrupt, StringType),
        options ++ Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corrupt)))
    val bad = col("__d").isNull || col(s"__d.$corrupt").isNotNull
    val good = parsed.where(!bad)
      .select(col("*"), col("__d.*")).drop("__d", payloadCol, corrupt)
    val dead = parsed.where(bad).select(col(payloadCol).as("payload"))
    (good, dead)
  }

  /** Debezium envelope schema over a row schema. */
  private def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row, nullable = true),
    StructField("after", row, nullable = true),
    StructField("op", StringType, nullable = true)))

  /** FORMAT DEBEZIUM ENCODE JSON → changelog DataFrame: op c/r→Insert,
    * u→UpdateInsert (after image), d→Delete (before image).
    * reference: src/connector/src/parser/debezium/
    */
  def decodeDebezium(df: DataFrame, payloadCol: String, rowSchema: StructType,
      seqFrom: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val env = df.withColumn("__e", from_json(col(payloadCol), envelopeSchema(rowSchema)))
    val opCol = when(col("__e.op").isin("c", "r"), Changelog.Insert)
      .when(col("__e.op") === "u", Changelog.UpdateInsert)
      .when(col("__e.op") === "d", Changelog.Delete)
    val image = when(col("__e.op") === "d", col("__e.before")).otherwise(col("__e.after"))
    // seqFrom: the transport's native order (e.g. the Kafka offset) —
    // multi-change-per-PK batches resolve by it. Without one, NO `_seq`
    // is emitted and the MV merge assigns a partition ordinal (file line
    // order) per batch: a constant placeholder here would make a
    // delete+reinsert of one PK in one batch TIE in the merge window and
    // resolve nondeterministically.
    val base = env.select(image.as("__row"), opCol.as(Changelog.OpCol),
        seqFrom.getOrElse(lit(0L)).cast("long").as(Changelog.SeqCol))
      .where(col(Changelog.OpCol).isNotNull)
      .select(col("__row.*"), col(Changelog.OpCol), col(Changelog.SeqCol))
    if (seqFrom.isEmpty) base.drop(Changelog.SeqCol) else base
  }

  /** FORMAT MAXWELL ENCODE JSON → changelog: `{"type": "insert|update|
    * delete", "data": {row}, "old": {changed-cols}}` — data always
    * carries the full current image (the deleted row for deletes).
    * reference: src/connector/src/parser/maxwell/simd_json_parser.rs
    */
  def decodeMaxwell(df: DataFrame, payloadCol: String, rowSchema: StructType,
      seqFrom: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val env = StructType(Seq(
      StructField("type", StringType), StructField("data", rowSchema)))
    val e = df.withColumn("__e", from_json(col(payloadCol), env))
    val opCol = when(col("__e.type") === "insert", Changelog.Insert)
      .when(col("__e.type") === "update", Changelog.UpdateInsert)
      .when(col("__e.type") === "delete", Changelog.Delete)
    val base = e.select(col("__e.data").as("__row"), opCol.as(Changelog.OpCol),
        seqFrom.getOrElse(lit(0L)).cast("long").as(Changelog.SeqCol))
      .where(col(Changelog.OpCol).isNotNull)
      .select(col("__row.*"), col(Changelog.OpCol), col(Changelog.SeqCol))
    if (seqFrom.isEmpty) base.drop(Changelog.SeqCol) else base
  }

  /** FORMAT CANAL ENCODE JSON → changelog: one payload carries a BATCH
    * of rows (`"data": [{row}, …]`, `"type": "INSERT|UPDATE|DELETE"`);
    * rows explode in array order so intra-payload sequence is preserved.
    * reference: src/connector/src/parser/canal/simd_json_parser.rs
    */
  def decodeCanal(df: DataFrame, payloadCol: String, rowSchema: StructType): DataFrame = {
    val env = StructType(Seq(
      StructField("type", StringType),
      StructField("data", ArrayType(rowSchema))))
    val e = df.withColumn("__e", from_json(col(payloadCol), env))
    val opCol = when(col("__e.type") === "INSERT", Changelog.Insert)
      .when(col("__e.type") === "UPDATE", Changelog.UpdateInsert)
      .when(col("__e.type") === "DELETE", Changelog.Delete)
    e.select(posexplode(col("__e.data")).as(Seq("__pos", "__row")),
        opCol.as(Changelog.OpCol))
      .where(col(Changelog.OpCol).isNotNull && col("__row").isNotNull)
      .select(col("__row.*"), col(Changelog.OpCol),
        col("__pos").cast("long").as(Changelog.SeqCol))
  }

  /** The Debezium-JSON envelope for one changelog row, as a Column —
    * reusable by any transport's sink encoding (file, Kafka).
    */
  private[graft] def debeziumValue(changelog: DataFrame): org.apache.spark.sql.Column = {
    val dataCols = changelog.columns
      .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol).contains)
    val row = struct(dataCols.map(col): _*)
    val rowType = StructType(dataCols.map(c => changelog.schema(c)))
    val isDelete = col(Changelog.OpCol) === Changelog.Delete
    to_json(struct(
      when(isDelete, row).otherwise(lit(null).cast(rowType)).as("before"),
      when(isDelete, lit(null).cast(rowType)).otherwise(row).as("after"),
      when(isDelete, "d")
        .when(col(Changelog.OpCol) === Changelog.UpdateInsert, "u")
        .otherwise("c").as("op")))
  }

  /** Changelog DataFrame → Debezium-JSON sink payloads (SinkFormat
    * Debezium; reference: src/connector/src/sink/catalog/mod.rs:132-154).
    */
  def encodeDebezium(changelog: DataFrame): DataFrame =
    changelog.select(debeziumValue(changelog).as("value"))

  /** Upsert-JSON sink: null value = delete tombstone (SinkFormat Upsert). */
  def encodeUpsert(changelog: DataFrame, pk: Seq[String]): DataFrame = {
    val dataCols = changelog.columns
      .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol).contains)
    changelog.select(
      to_json(struct(pk.map(col): _*)).as("key"),
      when(col(Changelog.OpCol) === Changelog.Delete, lit(null).cast(StringType))
        .otherwise(to_json(struct(dataCols.map(col): _*))).as("value"))
  }

  /** File-stream source over a parquet directory — covers StreamSource +
    * SourceBackfill (existing files are the backfill snapshot, new files
    * are the tail; reference: src/stream/src/executor/source/).
    */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
}
