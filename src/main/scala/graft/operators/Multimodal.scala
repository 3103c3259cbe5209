package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata structs, processed batch-wise with
  * `mapPartitions` (the Scala analog of arrow-batched UDFs: one iterator
  * pass per partition, no per-row task overhead).
  *
  * The actual codec step is STUBBED (`decodeStub`) because no image/audio
  * libraries ship in this environment — the stub derives deterministic
  * fake features from the bytes so the pipeline shape (schema, batching,
  * partitioning, downstream joins) is real and testable end-to-end. At
  * deploy time only `decodeStub`'s body changes (e.g. to a JNI codec).
  */
object Multimodal {

  /** Canonical schema for a multimodal asset row. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("format", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)
  ))

  /** STUB codec: deterministic 8-dim "feature" from the content bytes.
    * Replace with a real decoder (image resize → CNN embed, audio
    * spectrogram, …) when codecs are available; everything around it —
    * batch iteration, schema, partitioning — stays identical.
    */
  private[operators] def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(8)(i => ((md(i) & 0xff) / 255.0f))
  }

  /** Batch feature extraction: one pass per partition, rows streamed —
    * constant memory per task regardless of partition size.
    */
  def decodeFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val out = assets.select("asset_id", "modality", "content").rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = Option(r.getAs[Array[Byte]]("content"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
            bytes.length.toLong, decodeStub(bytes))
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Frame sampling stub for video: emits `n` (asset_id, frame_idx,
    * frame_feature) rows per asset — the explode shape a real frame
    * sampler produces, with deterministic fake frames.
    */
  def sampleFrames(assets: DataFrame, n: Int): DataFrame =
    decodeFeatures(assets)
      .where(col("modality") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"),
        col("feature"))
      .withColumn("frame_feature",
        transform(col("feature"), x => x * (col("frame_idx") + 1).cast(FloatType)))
      .drop("feature")

  /** Demo asset table derived from the documents fixture (bytes = utf8
    * text), so the multimodal path is exercisable without binary fixtures.
    */
  def demoAssets(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.df(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("modality"),
        col("text").cast(BinaryType).as("content"),
        struct(
          lit(64).as("width"), lit(64).as("height"),
          lit(16000).as("sample_rate"),
          (col("n_chars") * 10).as("duration_ms"),
          lit("stub").as("format")).as("meta"))
  }
}
