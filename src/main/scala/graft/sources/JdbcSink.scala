package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.streaming.Changelog

/** JDBC sink — the reference's external-database sink (reference:
  * src/connector/src/sink/jdbc.rs via the connector node: upsert or
  * append-only delivery of an MV's changelog into an existing remote
  * table). Delivery is at-least-once with idempotent per-PK writes
  * (delete-then-insert), the same guarantee the reference documents for
  * retriable JDBC sinks.
  *
  * Scale shape: each epoch reduces to ONE final image per PK (window by
  * PK, last `_seq` wins) and applies partition-parallel over executor
  * JDBC connections — no driver-side collect; the remote database's
  * write throughput is the only serial resource.
  */
object JdbcSink {

  /** Apply one changelog epoch to `table` at `url`. `upsert = false`
    * (append-only) delivers only Insert images, never deletes. */
  def applyEpoch(batch: DataFrame, pk: Seq[String], url: String,
      table: String, upsert: Boolean): Unit = {
    if (batch.isEmpty) return
    val dataCols = batch.columns.toSeq
      .filterNot(Seq(Changelog.OpCol, Changelog.SeqCol).contains)
    require(pk.nonEmpty && pk.forall(dataCols.contains),
      s"jdbc sink: PK ${pk.mkString(",")} not in (${dataCols.mkString(",")})")
    // one surviving change per PK: the batch's final image. A micro-batch
    // may span several published epochs and `_seq` only orders WITHIN an
    // epoch — recover the epoch from the changelog file name so the
    // window ranks (epoch, seq) and a later epoch's delete beats an
    // earlier epoch's insert.
    val epoch = regexp_extract(input_file_name(), "batch-(\\d+)", 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pk.map(col): _*)
      .orderBy(col("__epoch").desc_nulls_last,
        col(Changelog.SeqCol).desc_nulls_last)
    val finals = batch
      .withColumn("__epoch",
        when(epoch === "", lit(null)).otherwise(epoch).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "__epoch")
    val rows =
      if (upsert) finals
      else finals.where(Changelog.isAdd(col(Changelog.OpCol)))
    val opIdx = rows.columns.indexOf(Changelog.OpCol)
    val pkIdxs = pk.map(rows.columns.indexOf(_))
    val dataIdxs = dataCols.map(rows.columns.indexOf(_))
    val delSql = s"DELETE FROM $table WHERE " +
      pk.map(c => s"$c = ?").mkString(" AND ")
    val insSql = s"INSERT INTO $table (${dataCols.mkString(", ")}) " +
      s"VALUES (${dataCols.map(_ => "?").mkString(", ")})"
    val addOps = Set(Changelog.Insert, Changelog.UpdateInsert)
    rows.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(delSql)
          val ins = conn.prepareStatement(insSql)
          it.foreach { r =>
            if (upsert) { // idempotent upsert: clear the PK first
              pkIdxs.zipWithIndex.foreach { case (src, i) =>
                del.setObject(i + 1, r.get(src)) }
              del.addBatch()
            }
            if (addOps.contains(r.getInt(opIdx))) {
              dataIdxs.zipWithIndex.foreach { case (src, i) =>
                ins.setObject(i + 1, r.get(src)) }
              ins.addBatch()
            }
          }
          // deletes before inserts: each PK occurs once, so its clearing
          // delete always precedes its re-insert
          del.executeBatch()
          ins.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
