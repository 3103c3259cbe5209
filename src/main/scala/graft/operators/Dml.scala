package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.streaming.{Changelog, MaterializedView}

/** DML over MV-backed tables — the reference routes batch
  * INSERT/DELETE/UPDATE through the DML channel into the table's stream
  * job (reference: src/batch/executors/src/executor/{insert,delete,
  * update}.rs, src/stream/src/executor/dml.rs). Here each statement
  * becomes a changelog delta merged through the same MaterializedView
  * path the streaming jobs use — one code path, one consistency story.
  */
object Dml {

  /** INSERT: append rows (upsert semantics on the MV's PK). */
  def insertInto(mv: MaterializedView, rows: DataFrame): Unit =
    mv.merge(rows)

  /** Serial/row-id generation for tables without a natural PK
    * (reference: src/stream/src/executor/row_id_gen.rs:25). Monotonic ids
    * are unique across partitions (partition id in the high bits).
    */
  def withRowId(df: DataFrame, idCol: String = "_row_id"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())

  /** DELETE WHERE: derive Delete ops for matching rows, merge. */
  def deleteWhere(mv: MaterializedView, cond: Column): Unit = {
    val doomed = mv.read().where(cond)
    mv.merge(doomed
      .withColumn(Changelog.OpCol, lit(Changelog.Delete))
      .withColumn(Changelog.SeqCol, monotonically_increasing_id()))
  }

  /** UPDATE ... SET assignments WHERE cond: UpdateInsert ops, merge. */
  def updateWhere(mv: MaterializedView, cond: Column, set: Map[String, Column]): Unit = {
    val base = mv.read().where(cond)
    val updated = set.foldLeft(base) { case (df, (c, e)) => df.withColumn(c, e) }
    mv.merge(updated
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
      .withColumn(Changelog.SeqCol, monotonically_increasing_id()))
  }
}
