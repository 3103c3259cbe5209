package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata structs, processed batch-wise with
  * `mapPartitions` (the Scala analog of arrow-batched UDFs: one iterator
  * pass per partition, no per-row task overhead).
  *
  * The codec step is REAL for two pure-JVM formats (no external
  * libraries needed): PPM P6 images (netpbm: text header + raw RGB
  * triplets) and WAV PCM16 audio (RIFF chunk walk + little-endian
  * samples). Bytes with an unrecognized magic fall back to a
  * deterministic digest feature, so arbitrary binary columns still flow
  * through the same batched pipeline. A production deployment swaps in
  * heavier codecs (JPEG, FLAC, video frames) behind the same
  * `decode` dispatch; the Spark-side plumbing — schema, partitioning,
  * mapPartitions batch shape — is identical.
  *
  * Reference analog: multimodal/bytea source columns
  * (src/common/src/types/mod.rs DataType::Bytea) processed by UDFs.
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

  // ---------------------------------------------------------------------
  // PPM (P6) codec — http://netpbm.sourceforge.net/doc/ppm.html
  // ---------------------------------------------------------------------

  /** Decoded image summary: exact integer channel sums so downstream
    * comparisons are float-free.
    */
  final case class ImageInfo(width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Encode a P6 PPM: `P6\n<w> <h>\n<maxval>\n` + w*h RGB triplets. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != ${width}x${height}x3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse a P6 PPM. Handles arbitrary whitespace and `#` comments in
    * the header (the format allows both), validates maxval and payload
    * length, and folds the raster in one pass.
    */
  def decodePpm(bytes: Array[Byte]): ImageInfo = {
    var pos = 0
    def skipWsAndComments(): Unit = {
      var more = true
      while (more && pos < bytes.length) {
        val c = bytes(pos)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else more = false
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, s"ppm: expected integer at offset $pos")
      v
    }
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "ppm: bad magic")
    pos = 2
    val w = readInt(); val h = readInt(); val maxval = readInt()
    require(maxval == 255, s"ppm: unsupported maxval $maxval (only 8-bit)")
    require(pos < bytes.length, "ppm: truncated header")
    pos += 1 // single whitespace byte after maxval per spec
    val need = w * h * 3
    require(bytes.length - pos >= need, s"ppm: raster truncated (${bytes.length - pos} < $need)")
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < need) {
      r += bytes(pos + i) & 0xff
      g += bytes(pos + i + 1) & 0xff
      b += bytes(pos + i + 2) & 0xff
      i += 3
    }
    ImageInfo(w, h, r, g, b)
  }

  // ---------------------------------------------------------------------
  // WAV (RIFF / PCM16 mono) codec — the canonical RIFF layout:
  // "RIFF" <size> "WAVE" then chunks; "fmt " carries rate/channels/bits,
  // "data" carries little-endian samples.
  // ---------------------------------------------------------------------

  /** Decoded audio summary: exact signed sample sum + peak magnitude. */
  final case class AudioInfo(sampleRate: Int, channels: Int, nSamples: Long, sumAmp: Long, peak: Int)

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a WAV file by walking RIFF chunks (skipping unknown ones —
    * real files carry LIST/INFO chunks), then folding the PCM16 data.
    */
  def decodeWav(bytes: Array[Byte]): AudioInfo = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 12 && fourcc() == "RIFF", "wav: bad RIFF magic")
    bb.getInt // riff size (unchecked: trailing metadata is legal)
    require(fourcc() == "WAVE", "wav: not a WAVE form")
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (bb.remaining >= 8 && (rate < 0 || dataOff < 0)) {
      val id = fourcc(); val size = bb.getInt
      id match {
        case "fmt " =>
          val fmtStart = bb.position()
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"wav: unsupported format $audioFormat (only PCM)")
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort
          require(bits == 16, s"wav: unsupported depth $bits (only PCM16)")
          bb.position(fmtStart + size + (size & 1)) // chunks are word-aligned
        case "data" =>
          dataOff = bb.position(); dataLen = size
          bb.position(bb.position() + size + (size & 1))
        case _ => // skip unknown chunk (LIST, fact, …)
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(rate > 0 && dataOff >= 0, "wav: missing fmt or data chunk")
    require(dataOff + dataLen <= bytes.length, "wav: data chunk truncated")
    val n = dataLen / 2
    var sum = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val s = ((bytes(dataOff + 2 * i) & 0xff) | (bytes(dataOff + 2 * i + 1) << 8)).toShort.toInt
      sum += s
      val m = math.abs(s)
      if (m > peak) peak = m
      i += 1
    }
    AudioInfo(rate, channels, n, sum, peak)
  }

  // ---------------------------------------------------------------------
  // Generic feature path (any binary column)
  // ---------------------------------------------------------------------

  /** Schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)
  ))

  /** Dispatch on magic bytes: real codecs for PPM/WAV, digest fallback
    * for unrecognized OR corrupt content (a 100 TB lake always carries
    * some truncated assets; the generic path degrades to a fingerprint
    * instead of failing the task — the strict per-format decoders stay
    * strict for callers that want errors).
    */
  private[graft] def decodeFeature(bytes: Array[Byte]): Array[Float] = {
    def digest: Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      Array.tabulate(8)(i => ((md(i) & 0xff) / 255.0f))
    }
    try {
      if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
        val img = decodePpm(bytes)
        val n = (img.width * img.height).toFloat
        Array(img.width.toFloat, img.height.toFloat,
          img.sumR / n, img.sumG / n, img.sumB / n, 0f, 0f, 0f)
      } else if (bytes.length >= 4 && bytes(0) == 'R' && bytes(1) == 'I' &&
                 bytes(2) == 'F' && bytes(3) == 'F') {
        val a = decodeWav(bytes)
        Array(a.sampleRate.toFloat, a.nSamples.toFloat,
          if (a.nSamples == 0) 0f else a.sumAmp.toFloat / a.nSamples,
          a.peak.toFloat, 0f, 0f, 0f, 0f)
      } else digest
    } catch {
      // any parse failure (require → IllegalArgument, truncated buffers →
      // BufferUnderflow/IndexOutOfBounds) degrades to the fingerprint
      case scala.util.control.NonFatal(_) => digest
    }
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
            bytes.length.toLong, decodeFeature(bytes))
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
    * text → digest path), so the generic pipeline is exercisable without
    * binary fixtures.
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

  // ---------------------------------------------------------------------
  // Deterministic binary fixtures + oracle-checkable decode
  // ---------------------------------------------------------------------

  /** Schema of [[decodeBinaryAssets]]: modality-specific columns, null
    * when not applicable. All sums are exact integers so a SQL oracle
    * can reproduce them from the generating formula.
    */
  val binaryFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("sum_amp", LongType, nullable = true),
    StructField("peak", IntegerType, nullable = true)
  ))

  /** Deterministic asset bytes for id `a`: even ids encode a real PPM
    * whose pixels follow a closed-form formula of (a, pixel index), odd
    * ids a real WAV whose samples follow a formula of (a, sample index).
    * The same formulas are expressible in ANSI SQL (generate_series), so
    * the decode output is oracle-checkable end to end.
    */
  private[graft] def syntheticAsset(a: Long): (String, Array[Byte]) = {
    if (a % 2 == 0) {
      val w = (8 + a % 9).toInt; val h = (8 + a % 7).toInt
      val pix = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        pix(3 * i) = ((a * 31 + 3L * i) % 256).toByte
        pix(3 * i + 1) = ((a * 17 + 5L * i) % 256).toByte
        pix(3 * i + 2) = ((a * 7 + 11L * i) % 256).toByte
        i += 1
      }
      ("image", encodePpm(w, h, pix))
    } else {
      val n = (40 + a % 50).toInt
      val rate = (8000 + (a % 4) * 4000).toInt
      val samples = Array.tabulate(n)(i => (((a * 131 + 37L * i) % 2001) - 1000).toShort)
      ("audio", encodeWav(rate, samples))
    }
  }

  /** End-to-end binary pipeline over the documents ids: synthesize real
    * PPM/WAV bytes, parse them back with the real codecs, emit exact
    * features. Encode and decode run in the same partition pass — the
    * bytes never leave the executor, mirroring a decode-heavy 100 TB
    * pipeline where only small features survive the scan.
    */
  def decodeBinaryAssets(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col("asset_id").cast(LongType)).rdd.mapPartitions { rows =>
      rows.map { r =>
        val a = r.getLong(0)
        val (modality, bytes) = syntheticAsset(a)
        if (modality == "image") {
          val img = decodePpm(bytes)
          Row(a, modality, img.width, img.height, img.sumR, img.sumG, img.sumB,
            null, null, null, null)
        } else {
          val au = decodeWav(bytes)
          Row(a, modality, null, null, null, null, null,
            au.sampleRate, au.nSamples, au.sumAmp, au.peak)
        }
      }
    }
    spark.createDataFrame(out, binaryFeatureSchema)
  }
}
