package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{MaterializedView, MvCatalog}

/** User-facing facade — the session surface a reference user lands on
  * after switching (reference: frontend `SessionImpl.run_statement`,
  * src/frontend/src/session.rs:1168): SQL over registered tables, plus
  * CREATE-MATERIALIZED-VIEW as a first-class operation.
  */
final class Engine(val spark: SparkSession, warehouseDir: String) {

  val mvs = new MvCatalog(spark, warehouseDir)

  GraftSession.init(spark)

  /** Register the driver test tables (or any parquet dir laid out the
    * same way) into the session catalog.
    */
  def attachTables(dir: String): Unit = Tables.register(spark, dir)

  /** Ad-hoc batch SQL — parse/bind/plan/optimize/execute are Catalyst. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** CREATE MATERIALIZED VIEW over a streaming DataFrame: starts the
    * maintenance job (micro-batch merge by PK) and registers the MV so
    * [[table]] and downstream MVs can read it.
    */
  def createMaterializedView(
      name: String, pk: Seq[String], transformed: DataFrame,
      nBuckets: Int = 32): StreamingQuery = {
    val mv = mvs.define(name, pk, nBuckets)
    mv.start(transformed, mvs.checkpointDir(name))
  }

  /** Batch-refresh MV (CREATE MATERIALIZED VIEW over a batch query):
    * materializes once; re-call to refresh incrementally by PK.
    */
  def refreshMaterializedView(
      name: String, pk: Seq[String], result: DataFrame,
      nBuckets: Int = 32): MaterializedView = {
    val mv = mvs.get(name).getOrElse(mvs.define(name, pk, nBuckets))
    mv.merge(result)
    mv
  }

  /** Read a table or registered MV. */
  def table(name: String): DataFrame =
    mvs.get(name).map(_.read()).getOrElse(spark.table(name))

  private val CreateMv =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s*(?:\(\s*PRIMARY\s+KEY\s*\(([^)]*)\)\s*\))?\s+AS\s+(.*)""".r

  /** Minimal DDL veneer: `CREATE MATERIALIZED VIEW name [(PRIMARY KEY
    * (c1, c2))] AS SELECT ...` materializes the query (batch refresh; call
    * again to refresh) and registers the MV for [[table]]. Any other
    * statement falls through to Spark SQL. PK defaults to the first
    * output column.
    */
  def execute(statement: String): DataFrame = statement match {
    case CreateMv(name, pkList, query) =>
      val result = spark.sql(query)
      val pk = Option(pkList).map(_.split(",").map(_.trim).toSeq)
        .getOrElse(Seq(result.columns.head))
      refreshMaterializedView(name, pk, result).read()
    case other => spark.sql(other)
  }
}
