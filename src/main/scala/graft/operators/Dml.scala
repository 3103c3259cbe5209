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

  /** Merge a DML delta under a fresh changelog EPOCH, so subscription
    * cursors and chained consumers see table writes the same way they
    * see streaming-MV epochs (reference: table DML flows through the
    * same barrier/epoch pipeline as any stream,
    * src/stream/src/executor/dml.rs — a subscription on a TABLE
    * delivers its DML). Epoch allocation is serialized per table on the
    * MV monitor: tables are DML-only (never source-fed), so the only
    * competing allocators are concurrent DML statements.
    */
  private def mergeEpoch(mv: MaterializedView, delta: DataFrame): Unit =
    mv.synchronized {
      mv.merge(delta, mv.nextEpoch)
    }

  /** INSERT: append rows (upsert semantics on the MV's PK). */
  def insertInto(mv: MaterializedView, rows: DataFrame): Unit =
    mergeEpoch(mv, rows)

  /** Serial/row-id generation for tables without a natural PK
    * (reference: src/stream/src/executor/row_id_gen.rs:25). Monotonic ids
    * are unique across partitions (partition id in the high bits).
    */
  def withRowId(df: DataFrame, idCol: String = "_row_id"): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())

  /** DELETE WHERE: derive Delete ops for matching rows, merge. */
  def deleteWhere(mv: MaterializedView, cond: Column): Unit = {
    val doomed = mv.read().where(cond)
    mergeEpoch(mv, doomed
      .withColumn(Changelog.OpCol, lit(Changelog.Delete))
      .withColumn(Changelog.SeqCol, monotonically_increasing_id()))
  }

  /** UPDATE ... SET assignments WHERE cond: a full before/after image
    * pair per matched row — UpdateDelete then UpdateInsert (reference:
    * src/common/src/array/stream_chunk.rs:45-50). The U- image is what
    * lets downstream chained consumers retract the OLD row: without it
    * a group-key- or PK-changing update leaves the old group/row
    * behind. Storage-side the pair resolves per PK by `_seq` (U+ wins
    * over U-), so a PK-preserving update stores the new image and a
    * PK-changing one deletes the old key and inserts the new.
    * Assignments cast to the column's STORED type — `SET bal = 25.0`
    * parses as decimal(3,1) and would otherwise fork the parquet schema
    * of the store/changelog away from a DOUBLE column.
    */
  def updateWhere(mv: MaterializedView, cond: Column, set: Map[String, Column],
      post: Seq[(String, Column)] = Seq.empty): Unit = {
    val base = mv.read().where(cond)
    val types = base.schema.map(f => f.name -> f.dataType).toMap
    val assigned = set.foldLeft(base) { case (df, (c, e)) =>
      df.withColumn(c, types.get(c).map(e.cast).getOrElse(e))
    }
    // ordered post-pass (generated columns): recomputes from the
    // assigned row, so it must apply AFTER every SET column
    val updated = post.foldLeft(assigned) { case (df, (c, e)) =>
      df.withColumn(c, types.get(c).map(e.cast).getOrElse(e))
    }
    val before = base
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
      .withColumn(Changelog.SeqCol, lit(0L))
    val after = updated
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
      .withColumn(Changelog.SeqCol, lit(1L))
    mergeEpoch(mv, before.unionByName(after))
  }
}
