package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained grouped aggregate with full retraction
  * support — including the aggregates that are NOT incrementally
  * computable from deltas alone (min/max/percentile under deletes need
  * the group's surviving input rows to fall back to).
  *
  * This is the reference's "materialized input" aggregation state
  * (reference: docs/dev/src/design/aggregation.md:16-40: min/max keep
  * their input rows in a state table and re-derive on retraction)
  * rendered at Spark altitude:
  *   1. the delta merges into the BASE table MV (the materialized input),
  *   2. the grouped aggregate is recomputed over ONLY the touched
  *      groups — a bucket-pruned read when the base MV is bucketed on
  *      the group columns ([[MaterializedView.readTouched]]),
  *   3. groups whose last row disappeared become Delete ops,
  *   4. the result merges into the aggregate MV.
  * Cost per batch: O(touched groups × rows-per-group), never O(table).
  */
final class IncrementalAgg(
    baseMv: MaterializedView,
    aggMv: MaterializedView,
    groupCols: Seq[String],
    aggFn: DataFrame => DataFrame) {

  /** Apply one changelog/upsert delta to the base table and bring the
    * aggregate MV up to date (deleting groups that emptied out).
    */
  def applyDelta(delta: DataFrame): Unit = {
    baseMv.merge(delta)
    val touched = delta.select(groupCols.map(col): _*).distinct()
    val scopedBase = baseMv.readTouched(touched)
    if (scopedBase.columns.isEmpty) return
    val survivors = scopedBase.join(broadcast(touched), groupCols, "left_semi")
    val recomputed = aggFn(survivors)
    // touched groups with no surviving rows → delete from the agg MV
    val gone0 = touched.join(recomputed, groupCols, "left_anti")
    val gone = recomputed.columns.foldLeft(gone0) { (df, c) =>
      if (groupCols.contains(c)) df
      else df.withColumn(c, lit(null).cast(recomputed.schema(c).dataType))
    }.select(recomputed.columns.map(col): _*)
      .withColumn(Changelog.OpCol, lit(Changelog.Delete))
    val upserts = recomputed
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
    aggMv.merge(upserts.unionByName(gone))
  }

  def read(): DataFrame = aggMv.read()
}
