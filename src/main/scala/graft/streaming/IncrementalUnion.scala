package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained UNION ALL of two streaming MVs — the
  * reference's union executor under MV-on-MV chaining (reference:
  * src/stream/src/executor/union.rs merges its inputs' streams
  * barrier-aligned; UNION ALL is linear, so the delta rule is just
  * Δ(A ∪all B) = ΔA ∪all ΔB).
  *
  * Both upstream changelogs feed ONE maintenance stream (side-tagged,
  * reusing [[IncrementalJoin.taggedUnion]]) — one epoch sequence, so
  * further MVs chain off the union. Each epoch runs the DEFINING QUERY
  * with one side's delta bound and the other side bound to an empty
  * slice: linearity means Q(ΔA, ∅) is exactly the rows A's branch
  * contributes, including the branch's own projections/filters.
  * Additions re-emit as upserts; a deleted upstream row's before-image
  * is pushed through the same query to find the downstream row it
  * produced (a row the branch's WHERE never admitted projects to
  * nothing — the delete is a no-op, as it must be).
  *
  * PK contract: the downstream MV's declared PRIMARY KEY must be unique
  * ACROSS both branches (the same upsert-by-PK contract every MV
  * carries; colliding side rows last-write-win exactly as colliding
  * inserts do). Branches whose SELECT lists disambiguate provenance
  * (e.g. a literal side tag in the PK) make the union lossless.
  */
final class IncrementalUnion(
    leftMv: MaterializedView,
    rightMv: MaterializedView,
    downMv: MaterializedView,
    leftPk: Seq[String],
    rightPk: Seq[String],
    // (leftRows, rightRows) => the defining UNION ALL query over them
    recompute: (DataFrame, DataFrame) => DataFrame) {

  import IncrementalJoin.{LPrefix, RPrefix, SideCol}

  /** Latest surviving add per upstream PK (an epoch may carry several
    * changes to one upstream row; only the final image lands).
    */
  private def latestAdds(delta: DataFrame, sidePk: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sidePk.map(col): _*)
      .orderBy(col(Changelog.SeqCol).desc)
    delta.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && Changelog.isAdd(col(Changelog.OpCol)))
      .drop("__rn", Changelog.OpCol, Changelog.SeqCol)
  }

  /** Full before-images of removed rows — the union branch maps them to
    * the downstream rows to retract.
    */
  private def removedRows(delta: DataFrame, sidePk: Seq[String]): DataFrame =
    delta.where(!Changelog.isAdd(col(Changelog.OpCol)))
      .drop(Changelog.OpCol, Changelog.SeqCol)
      .dropDuplicates(sidePk)

  /** Apply one epoch of the side-tagged union stream. */
  def applyDelta(batch0: DataFrame, batchId: Long): Unit = {
    val batch =
      if (batch0.sparkSession eq downMv.spark) batch0
      else downMv.spark.createDataFrame(batch0.rdd, batch0.schema)
    def side(prefix: String, tag: String): DataFrame = {
      val cols = batch.columns.filter(_.startsWith(prefix))
      batch.where(col(SideCol) === tag)
        .select(cols.map(c => col(c).as(c.stripPrefix(prefix))).toSeq: _*)
    }
    val l = side(LPrefix, "L")
    val r = side(RPrefix, "R")
    val emptyL = l.drop(Changelog.OpCol, Changelog.SeqCol).where(lit(false))
    val emptyR = r.drop(Changelog.OpCol, Changelog.SeqCol).where(lit(false))
    def shaped(df: DataFrame, op: Int, seq: Long): DataFrame = df
      .withColumn(Changelog.OpCol, lit(op))
      .withColumn(Changelog.SeqCol, lit(seq))
    val out = shaped(recompute(latestAdds(l, leftPk), emptyR),
        Changelog.UpdateInsert, 1L)
      .unionByName(shaped(recompute(emptyL, latestAdds(r, rightPk)),
        Changelog.UpdateInsert, 1L))
      .unionByName(shaped(recompute(removedRows(l, leftPk), emptyR),
        Changelog.Delete, 0L))
      .unionByName(shaped(recompute(emptyL, removedRows(r, rightPk)),
        Changelog.Delete, 0L))
    downMv.merge(out, batchId)
  }
}
