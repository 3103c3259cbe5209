package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog-as-DataFrame conventions.
  *
  * The reference models every stream as a chunk of rows tagged with an op
  * (Insert / Delete / UpdateDelete / UpdateInsert —
  * reference: src/common/src/array/stream_chunk.rs:45-50). Here a changelog
  * is an ordinary DataFrame with an `_op: int` column plus a monotonically
  * increasing `_seq: long` that orders changes to the same key (the analog
  * of chunk order within an epoch).
  */
object Changelog {

  val OpCol = "_op"
  val SeqCol = "_seq"

  // numbering matches the reference wire enum (proto/data.proto:130-136:
  // INSERT=1, DELETE=2, UPDATE_INSERT=3, UPDATE_DELETE=4) so the
  // user-visible codes — subscription `_op`, changelog-view
  // `changelog_op` — are drop-in compatible
  val Insert = 1
  val Delete = 2
  val UpdateInsert = 3
  val UpdateDelete = 4

  /** Does this op add a row to the result multiset? */
  def isAdd(op: Column): Column = op === Insert || op === UpdateInsert

  /** Tag a plain DataFrame as an insert-only changelog. The sequence is
    * a real per-row ordinal (partition-ordered), so a delta carrying
    * several rows for one PK resolves to the LAST row deterministically
    * rather than by arbitrary tie-break.
    */
  def ofInserts(df: DataFrame): DataFrame =
    df.withColumn(OpCol, lit(Insert)).withColumn(SeqCol, monotonically_increasing_id())

  /** Apply a keyed changelog to a snapshot: for each PK, the last change
    * wins — an add keeps its row, a delete removes the key. This is the
    * MaterializeExecutor's upsert-with-conflict-handling
    * (reference: src/stream/src/executor/mview/materialize.rs:45) as a
    * single windowed aggregation: one shuffle on the PK.
    */
  def applyToSnapshot(snapshot: DataFrame, changes: DataFrame, pk: Seq[String]): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    // prio 0 = changelog (wins), 1 = snapshot; within changelog, highest _seq wins.
    val tagged = changes.select(
      dataCols.map(col) :+ col(OpCol) :+ lit(0).as("__prio") :+ col(SeqCol): _*)
    val base = snapshot.select(
      dataCols.map(col) :+ lit(Insert).as(OpCol) :+ lit(1).as("__prio") :+ lit(-1L).as(SeqCol): _*)
    val w = Window.partitionBy(pk.map(col): _*)
      .orderBy(col("__prio").asc, col(SeqCol).desc)
    tagged.union(base)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && isAdd(col(OpCol)))
      .select(dataCols.map(col): _*)
  }

  /** Derive a changelog between two snapshots of a PK'd table (the shape
    * `CREATE MV ... AS CHANGELOG FROM t` exposes —
    * reference: src/stream/src/executor/changelog.rs:26).
    */
  def diff(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame = {
    val cols = after.columns.toSeq
    val b = before.select(cols.map(col): _*).withColumn("__side", lit("b"))
    val a = after.select(cols.map(col): _*).withColumn("__side", lit("a"))
    // full outer join on pk + value comparison
    val joined = b.as("b").join(a.as("a"),
      pk.map(k => col(s"b.$k") === col(s"a.$k")).reduce(_ && _), "full")
    val valueCols = cols.filterNot(pk.contains)
    val changed = valueCols.map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val deletes = joined.where(col(s"a.${pk.head}").isNull)
      .select(cols.map(c => col(s"b.$c").as(c)): _*).withColumn(OpCol, lit(Delete))
    val inserts = joined.where(col(s"b.${pk.head}").isNull)
      .select(cols.map(c => col(s"a.$c").as(c)): _*).withColumn(OpCol, lit(Insert))
    val updates = joined
      .where(col(s"b.${pk.head}").isNotNull && col(s"a.${pk.head}").isNotNull && changed)
      .select(cols.map(c => col(s"a.$c").as(c)): _*).withColumn(OpCol, lit(UpdateInsert))
    deletes.union(inserts).union(updates).withColumn(SeqCol, lit(0L))
  }
}
