package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming global TopN: maintain `SELECT … FROM up ORDER BY … LIMIT k`
  * continuously (reference: src/stream/src/executor/top_n/
  * top_n_plain.rs:79 — the TopN executor keeps ALL input rows in a
  * sorted state table plus a top-n cache; retractions refill the cache
  * by range-scanning the state just past the old boundary).
  *
  * Spark rendering: the input rows are a [[MaterializedView]] (the
  * state table analog — parquet with per-row-group column stats), the
  * current top-k IS the result MV (≤ k rows, driver-collectable by
  * construction). Per epoch:
  *
  *   1. FAST PATH — if the delta has no row that could touch the top
  *      (no delete/update of a current top-k PK, no insert ordering at
  *      or above the current k-th row's first sort key, and the top is
  *      full), publish an empty epoch: O(delta) work, state untouched.
  *   2. PRUNED RECOMPUTE — otherwise re-derive the top-k from the
  *      region `first-key ⪰ old k-th value` (non-strict, ties ride
  *      along; NULLs included when they sort first). The region read
  *      prunes on parquet row-group stats of the first sort column —
  *      the analog of the reference's bounded range refill. If the
  *      region no longer holds k rows (deletes ate into it), fall back
  *      to a full `TakeOrdered` over the state — O(n) scan, k-heap,
  *      never a sort-the-world.
  *   3. Publish retraction-complete U-/U+ (old top rows as
  *      UpdateDelete seq 0, new top as UpdateInsert seq 1) so further
  *      MVs chain off the result.
  *
  * Epoch replay re-applies the committed delta verbatim (same guard as
  * [[DynamicFilter]]); the top-k is re-derived from durable state, so
  * no sidecar is needed.
  */
final class IncrementalTopN(
    baseMv: MaterializedView,
    resultMv: MaterializedView,
    k: Int,
    // (output column, ascending, nullsFirst) per ORDER BY key
    ordering: Seq[(String, Boolean, Boolean)],
    pk: Seq[String],
    // LIMIT k OFFSET o: maintain the top (o + k), emit rows o+1 … o+k
    // (the reference TopN executor's offset mode). The visible result
    // holds only the k emitted rows, so the boundary fast path is
    // unavailable — every epoch re-derives via TakeOrdered(o + k).
    offset: Int = 0) {

  require(k > 0, "LIMIT must be positive")
  require(offset >= 0, "OFFSET must be non-negative")
  require(ordering.nonEmpty, "top-n requires an ORDER BY")

  private val spark = resultMv.spark

  private def sortCols = ordering.map { case (c, asc, nf) =>
    (asc, nf) match {
      case (true, true) => col(c).asc_nulls_first
      case (true, false) => col(c).asc_nulls_last
      case (false, true) => col(c).desc_nulls_first
      case (false, false) => col(c).desc_nulls_last
    }
  }

  private val (firstCol, firstAsc, firstNullsFirst) = ordering.head

  def applyDelta(delta0: DataFrame, batchId: Long = -1L): Unit = {
    // re-bind to the engine session (foreachBatch hands a clone)
    val delta =
      if (delta0.sparkSession eq spark) delta0
      else spark.createDataFrame(delta0.rdd, delta0.schema)
    baseMv.merge(delta)
    if (batchId >= 0) {
      val epochDir = Paths.get(resultMv.changelogLocation, s"batch-$batchId")
      if (Files.exists(epochDir)) {
        resultMv.merge(spark.read.parquet(epochDir.toString), batchId)
        return
      }
    }
    val hasOps = delta.columns.contains(Changelog.OpCol)
    val d = if (hasOps) delta else Changelog.ofInserts(delta)
    val rowSchema = d.drop(Changelog.OpCol, Changelog.SeqCol).schema

    baseMv.withReadLock {
      val oldTop: Array[Row] = {
        val r = resultMv.read()
        if (r.columns.isEmpty) Array.empty[Row]
        else r.select(rowSchema.fieldNames.map(col).toSeq: _*).collect()
      }
      val oldDf = spark.createDataFrame(
        java.util.Arrays.asList(oldTop: _*), rowSchema)
      // the old k-th boundary on the FIRST sort key: the worst in-top
      // value (max under asc, min under desc); None = top not full or a
      // NULL boundary — both disable pruning, never correctness
      val boundary: Option[Any] =
        if (offset > 0 || oldTop.length < k) None
        else {
          val agg = oldDf.agg(
            (if (firstAsc) max(col(firstCol)) else min(col(firstCol)))
              .as("b"),
            count(when(col(firstCol).isNull, 1)).as("nulls")).collect().head
          if (agg.get(1).asInstanceOf[Long] > 0 || agg.isNullAt(0)) None
          else Some(agg.get(0))
        }
      def regionOf(t: Any) = {
        val cmp = if (firstAsc) col(firstCol) <= lit(t) else col(firstCol) >= lit(t)
        if (firstNullsFirst) cmp || col(firstCol).isNull else cmp
      }
      // ---- fast path: can this delta touch the top at all?
      val addTouch = boundary match {
        case Some(t) => regionOf(t)
        case None => lit(true) // top not full: every add can enter
      }
      // "delta hits a current top-k PK" test: literal OR-fold for small
      // tops (one job), broadcast semi-join past 64 rows — a LIMIT 10000
      // top made the fold a 10k-term predicate (codegen/analysis blowup,
      // r9 review #3)
      def deltaTouches: Boolean =
        if (oldTop.length <= 64) {
          val pkOfTop: Column = oldTop.map(r =>
              pk.map(p => col(p) <=> lit(r.getAs[Any](p))).reduce(_ && _))
            .foldLeft(lit(false))(_ || _)
          !d.where((Changelog.isAdd(col(Changelog.OpCol)) && addTouch) ||
            pkOfTop).isEmpty
        } else {
          val topPks = broadcast(oldDf.select(pk.map(col): _*))
          !d.where(Changelog.isAdd(col(Changelog.OpCol)) && addTouch).isEmpty ||
            !d.join(topPks, pk.map(p => d(p) <=> topPks(p)).reduce(_ && _),
              "left_semi").isEmpty
        }
      val untouched =
        (if (offset > 0) d.isEmpty
         else oldTop.length == k && !deltaTouches)
      if (untouched) {
        // publish the (empty) epoch: downstream frontiers + replay guard
        resultMv.merge(d.limit(0), batchId)
      } else {
        val base = baseMv.read()
        val full = if (base.columns.isEmpty) oldDf.limit(0) else base
        val pruned = boundary match {
          case Some(t) => full.where(regionOf(t))
          case None => full
        }
        var newTop = pruned.orderBy(sortCols: _*).limit(offset + k).collect()
        if (newTop.length < offset + k && boundary.isDefined)
          // the boundary region emptied below the cut (deletes): refill
          newTop = full.orderBy(sortCols: _*).limit(offset + k).collect()
        newTop = newTop.drop(offset)
        // publish only the DIFF (r9 review #4: full old-top U- + full
        // new-top U+ was k rows of downstream churn per touching epoch).
        // Both sides are driver-local (≤ offset+k rows): a PK-keyed map
        // finds dropped rows (U-), entering rows (U+), and value changes
        // (U-/U+ pair); unchanged rows publish nothing. Merge semantics
        // are unchanged — the pairs are the minimal subset of the old
        // full republication.
        val rowPk = (r: Row) => pk.map(p => r.getAs[Any](p)).toIndexedSeq
        val oldByPk = oldTop.map(r => rowPk(r) -> r).toMap
        val newByPk = newTop.map(r => rowPk(r) -> r).toMap
        val retract = oldTop.filter(r => !newByPk.get(rowPk(r)).contains(r))
        val insert = newTop.filter(r => !oldByPk.get(rowPk(r)).contains(r))
        val out = spark.createDataFrame(
            java.util.Arrays.asList(insert: _*), rowSchema)
          .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
          .withColumn(Changelog.SeqCol, lit(1L))
          .unionByName(spark.createDataFrame(
              java.util.Arrays.asList(retract: _*), rowSchema)
            .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
            .withColumn(Changelog.SeqCol, lit(0L)))
        resultMv.merge(out, batchId)
      }
    }
  }

  def read(): DataFrame = resultMv.read()
}
