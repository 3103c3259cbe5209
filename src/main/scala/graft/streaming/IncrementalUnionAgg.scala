package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained GROUPED AGGREGATE (or DISTINCT) over the
  * UNION ALL of two streaming upstreams — one MV, e.g.
  * `SELECT k, sum(x) FROM (A UNION ALL B) GROUP BY k` or its special
  * case `A UNION B` (UNION DISTINCT ≡ GROUP BY every output column).
  *
  * The reference plans this as union → hash-agg executors in one
  * fragment (src/stream/src/executor/union.rs feeding hash_agg.rs);
  * here the same shape is a two-input variant of [[IncrementalAgg]]'s
  * touched-group recompute:
  *   1. both upstream changelogs feed ONE side-tagged maintenance
  *      stream ([[IncrementalJoin.taggedUnion]] — one epoch sequence,
  *      so further MVs chain off this one);
  *   2. a delta's touched groups are derived by replaying the defining
  *      query (HAVING stripped) over the tiny delta slice with the
  *      other side empty — linearity of UNION ALL means a side row's
  *      group membership depends on that row alone, and retract-images
  *      name exactly the groups they leave;
  *   3. the aggregate is recomputed over BOTH upstream storages and
  *      restricted to the touched groups; groups that emptied out
  *      retract with their true before-image (U-/U+ pairs, so chains
  *      stack on top).
  *
  * Scale note: like [[IncrementalAgg]]'s generate mode, the touched
  * restriction applies AFTER the aggregate (group membership is born in
  * the branch projections), so each epoch re-aggregates the upstream
  * stores — O(inputs) scan with a tiny post-agg result, not O(inputs²).
  * Bucket-pruning the scan would need branch-level column lineage; the
  * post-agg restriction is the same boundary the reference's
  * full-recompute fallback has for non-decomposable shapes.
  */
final class IncrementalUnionAgg(
    leftMv: MaterializedView,
    rightMv: MaterializedView,
    downMv: MaterializedView,
    groupCols: Seq[String],
    // (leftRows, rightRows) => the FULL defining query over them
    fn2: (DataFrame, DataFrame) => DataFrame,
    // same replay with filters ABOVE the aggregate stripped (HAVING):
    // groups whose delta-local aggregate fails the predicate still need
    // recompute — their full-base aggregate may cross either way
    keysOf2: (DataFrame, DataFrame) => DataFrame) {

  import IncrementalJoin.{LPrefix, RPrefix, SideCol}

  /** Null-safe semi-join on the group columns (see IncrementalAgg). */
  private def semiOnGroups(left: DataFrame, keys: DataFrame): DataFrame = {
    val k = broadcast(keys).as("__k")
    val l = left.as("__l")
    l.join(k, groupCols.map(c => l(c) <=> k(c)).reduce(_ && _), "left_semi")
  }

  def applyDelta(batch0: DataFrame, batchId: Long): Unit = {
    val batch =
      if (batch0.sparkSession eq downMv.spark) batch0
      else downMv.spark.createDataFrame(batch0.rdd, batch0.schema)
    def side(prefix: String, tag: String): DataFrame = {
      val cols = batch.columns.filter(_.startsWith(prefix))
      batch.where(col(SideCol) === tag)
        .select(cols.map(c => col(c).as(c.stripPrefix(prefix))).toSeq: _*)
    }
    // ALL delta images (adds and removes) name touched groups: an add
    // touches the group it enters, a before-image the group it leaves
    val l = side(LPrefix, "L").drop(Changelog.OpCol, Changelog.SeqCol)
    val r = side(RPrefix, "R").drop(Changelog.OpCol, Changelog.SeqCol)
    val touched = keysOf2(l, r.where(lit(false)))
      .select(groupCols.map(col): _*)
      .unionByName(keysOf2(l.where(lit(false)), r)
        .select(groupCols.map(col): _*))
      .distinct()
    // recompute under BOTH read locks: either upstream's own job may be
    // rewriting the buckets this recompute reads
    leftMv.withReadLock { rightMv.withReadLock {
      val recomputed =
        semiOnGroups(fn2(leftMv.read(), rightMv.read()), touched)
      val oldRows = downMv.readTouched(touched)
      val retractions =
        (if (oldRows.columns.isEmpty) recomputed.where(lit(false))
         else semiOnGroups(oldRows, touched)
           .select(recomputed.columns.map(col): _*))
        .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
        .withColumn(Changelog.SeqCol, lit(0L))
      val upserts = recomputed
        .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
        .withColumn(Changelog.SeqCol, lit(1L))
      downMv.merge(upserts.unionByName(retractions), batchId)
    } }
  }
}
