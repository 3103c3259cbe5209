package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Catalog of the driver-provided test tables (TESTDATA.md / FIXTURES.md §1).
  *
  * The reference's catalog lives in its meta node; here a table is simply a
  * parquet directory registered as a temp view (SURVEY.md §1.1). At 100 TB
  * these would be partitioned/bucketed catalog tables — the query code below
  * only ever goes through `df`/`view`, so swapping the storage layer touches
  * this file alone.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def df(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    // unless spark.sql.legacy.parquet.nanosAsLong is set. Sessions built
    // via GraftSession carry the conf; for foreign sessions (e.g. the
    // driver's smoke-test session) set it on the fly — it is a plain SQL
    // conf, safe to flip at runtime.
    if (name == "events" &&
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeEventsTs(raw) else raw
  }

  /** Normalize `events.ts` to session-zone TimestampType for EVERY on-disk
    * representation the driver has shipped: parquet TIMESTAMP(NANOS) read
    * as nano-long, parquet timestamp[us] without the UTC flag read as
    * TIMESTAMP_NTZ, or an already-correct TIMESTAMP. The session is pinned
    * UTC (GraftSession), so the NTZ cast is instant-preserving. Works on
    * batch and streaming DataFrames alike — every reader of events must go
    * through here rather than hand-rolling a conversion.
    */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      // nano-long → true microsecond timestamp (integer div — no double
      // rounding at 1e18).
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Register every table as a temp view for `spark.sql` queries.
    * Memoized per (session, dir): schema/footer reads happen once, not
    * once per query — registration itself reads no data.
    */
  def register(spark: SparkSession, dir: String): Unit =
    if (registered.add((spark, dir)))
      all.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}
