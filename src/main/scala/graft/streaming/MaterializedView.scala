package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incrementally-maintained materialized view: a Structured Streaming query
  * whose micro-batch deltas are merged by primary key into a bucketed
  * parquet table.
  *
  * Reference shape: CREATE MATERIALIZED VIEW → stream job →
  * MaterializeExecutor upsert (src/frontend/src/handler/create_mv.rs:87,
  * src/stream/src/executor/mview/materialize.rs:45). Spark shape:
  * readStream → transform → foreachBatch(merge) with a checkpoint dir
  * (micro-batch boundary = the reference's barrier/epoch).
  *
  * Scale design: the table is hash-bucketed on the PK
  * (`__bucket = pmod(hash(pk), nBuckets)`) and written with dynamic
  * partition overwrite — a merge rewrites ONLY the buckets containing
  * changed keys, so merge cost is O(delta × table/nBuckets), not O(table).
  * At 100 TB this maps 1:1 onto Delta/Iceberg MERGE with the same bucket
  * layout; nothing above this class changes.
  */
final class MaterializedView(
    spark: SparkSession,
    val name: String,
    pk: Seq[String],
    targetDir: String,
    nBuckets: Int = 32) {

  private val bucketCol = "__bucket"

  private def bucketOf(df: DataFrame) =
    pmod(hash(pk.map(col): _*), lit(nBuckets))

  private val changelogDir = s"$targetDir.changelog"

  /** Append-only changelog feed of this MV — the MV-on-MV channel
    * (reference: docs/dev/src/design/mv-on-mv.md — downstream MVs
    * subscribe to the upstream's changelog, NOT its storage: the storage
    * is rewritten in place, which no file-tailing source can consume).
    * Each merge appends its delta (with ops) here; downstream MVs
    * `readStream` it.
    */
  def changelogStream(): DataFrame = {
    val schema = spark.read.parquet(changelogDir).schema
    spark.readStream.schema(schema).parquet(changelogDir)
  }

  /** Batch view of the accumulated changelog. */
  def readChangelog(): DataFrame = spark.read.parquet(changelogDir)

  /** Current MV contents. */
  def read(): DataFrame = {
    if (!Files.exists(Paths.get(targetDir))) spark.emptyDataFrame
    else
      try spark.read.parquet(targetDir).drop(bucketCol)
      catch {
        // fully-deleted MV: directory exists but holds no parquet files
        case _: org.apache.spark.sql.AnalysisException => spark.emptyDataFrame
      }
  }

  private def readBuckets(): Option[DataFrame] =
    if (Files.exists(Paths.get(targetDir))) Some(spark.read.parquet(targetDir))
    else None

  /** Merge one delta (latest row per PK wins over stored rows). Rows in
    * `delta` with a Changelog op column are applied with delete support;
    * plain DataFrames are treated as upserts.
    *
    * The merged buckets are staged to a scratch dir first (Spark reads
    * source files lazily during the write job — reading and dynamically
    * overwriting the same path in one job is unsound), then swapped in
    * with dynamic partition overwrite; buckets whose content became empty
    * (all rows deleted) are removed explicitly since an empty partition
    * never appears in the writer's output.
    */
  def merge(delta: DataFrame, batchId: Long = -1L): Unit = {
    val hasOps = delta.columns.contains(Changelog.OpCol)
    val norm0 =
      if (hasOps) delta
      else Changelog.ofInserts(delta)
    val norm = norm0.withColumn(bucketCol, bucketOf(norm0)).cache()
    try {
      // publish the delta on the append-only changelog channel first —
      // downstream MVs consume this, never the rewritten storage
      norm.drop(bucketCol).write.mode("append").parquet(changelogDir)
      val affected = norm.select(bucketCol).distinct()
        .collect().map(_.getInt(0)).toSeq
      if (affected.nonEmpty) {
        val existingOpt = readBuckets().map(_.where(col(bucketCol).isin(affected: _*)))
        val dataCols = norm.columns.toSeq
          .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol, bucketCol).contains)
        val snapshot = existingOpt
          .map(_.select(dataCols.map(col) :+ col(bucketCol): _*))
          .getOrElse(norm.where(lit(false)).select(dataCols.map(col) :+ col(bucketCol): _*))
        val merged = Changelog.applyToSnapshot(
          snapshot.drop(bucketCol),
          norm.drop(bucketCol),
          pk)
        val staging = s"$targetDir.staging"
        merged
          .withColumn(bucketCol, bucketOf(merged))
          .repartition(col(bucketCol))
          .write.mode("overwrite")
          .partitionBy(bucketCol)
          .parquet(staging)
        // Explicit schema: a delta that deletes a bucket's last rows
        // stages zero files, where inference would fail.
        val stagedSchema = org.apache.spark.sql.types.StructType(
          merged.schema.fields :+ org.apache.spark.sql.types.StructField(
            bucketCol, org.apache.spark.sql.types.IntegerType))
        val staged = spark.read.schema(stagedSchema).parquet(staging)
        staged.write.mode("overwrite").partitionBy(bucketCol).parquet(targetDir)
        val nonEmpty = staged.select(bucketCol).distinct()
          .collect().map(_.getInt(0)).toSet
        (affected.toSet -- nonEmpty).foreach { b =>
          deleteRecursively(Paths.get(targetDir, s"$bucketCol=$b"))
        }
        deleteRecursively(Paths.get(staging))
      }
    } finally norm.unpersist()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  /** Start the MV maintenance job over a streaming source. */
  def start(
      transformed: DataFrame,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    transformed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, id: Long) => merge(batch, id))
      .start()
}

/** Catalog of MVs — the meta-node analog (reference: src/meta/ catalog).
  * MV-on-MV is expressed by pointing a downstream MV's source at an
  * upstream MV's target directory (file-stream over its parquet).
  */
final class MvCatalog(spark: SparkSession, baseDir: String) {
  private val views = scala.collection.mutable.Map[String, MaterializedView]()

  def define(name: String, pk: Seq[String], nBuckets: Int = 32): MaterializedView = {
    val mv = new MaterializedView(spark, name, pk, s"$baseDir/$name/data", nBuckets)
    views(name) = mv
    mv
  }

  def get(name: String): Option[MaterializedView] = views.get(name)
  def checkpointDir(name: String): String = s"$baseDir/$name/checkpoint"
  def list: Seq[String] = views.keys.toSeq.sorted
}
