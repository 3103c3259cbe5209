package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC federation — the reference's external-database pushdown scan
  * (reference: src/batch/executors/src/executor/postgres_query.rs:109,
  * mysql_query.rs — a `postgres_query(...)`/`mysql_query(...)` TVF runs
  * an arbitrary query on the external DB and streams rows back).
  *
  * Spark rendering: the built-in JDBC data source. Two access shapes,
  * matching the reference's two uses:
  *  - [[table]]: scan an external table with Catalyst filter/projection
  *    pushdown into the remote SQL (the scan's PushedFilters), and an
  *    optional partitioned parallel read — one executor task per stride
  *    of the partition column, the distributed analog of the reference's
  *    single-connection chunked cursor.
  *  - [[query]]: run verbatim SQL remotely (the TVF form) — the remote
  *    engine computes, Spark receives the result rows.
  *
  * At 100 TB the federation side is always the small side: results join
  * against parquet facts, so the JDBC relation is broadcast-eligible and
  * never shuffles the fact table.
  */
object Jdbc {

  /** Scan an external table; `partitionBy` enables the parallel
    * range-partitioned read (column must be numeric/date).
    */
  def table(spark: SparkSession, url: String, tableName: String,
      partitionBy: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", tableName)
    partitionBy.fold(r) { case (col, lo, hi, n) =>
      r.option("partitionColumn", col)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** Run SQL on the external database, returning its result set — the
    * `postgres_query('…')` TVF form.
    */
  def query(spark: SparkSession, url: String, sql: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .load()
}
