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
    val raw = spark.read.parquet(path(dir, name))
    // events.ts is parquet TIMESTAMP(NANOS): surfaced as nano-long via
    // spark.sql.legacy.parquet.nanosAsLong, converted here to a true
    // microsecond timestamp (integer div — no double rounding at 1e18).
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
