package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is demonstrated by a named query in a
  * [[graft.queries.QueryPack]]; this object just flattens the packs.
  */
object SparkEntry {

  /** All query packs, in SURVEY §2 order. */
  def packs: Seq[QueryPack] = Seq(
    CoreBatch,
    Joins,
    Aggregates,
    TpchLike,
    TpchLike2,
    Windows,
    SetOps,
    Functions,
    Functions2,
    Functions3,
    Functions4,
    PgSyntax,
    TableFunctions,
    Subqueries,
    TimeWindows,
    NexmarkLike,
    OrderedAggs,
    Advanced,
    Shims,
    Gaps,
    LlmText,
    LlmDedup,
    LlmSimilarity,
    LlmPipeline
  )

  private lazy val allQueries: Seq[GraftQuery] = packs.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q1_agg").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(gq => gq.name -> gq.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(gq => gq.oracle.map(gq.name -> _)).toMap
}
