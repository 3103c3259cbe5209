package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // nano-long → true microsecond timestamp (integer div — no double
    // rounding at 1e18).
    if (name == "events" && raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
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
