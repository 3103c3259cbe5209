package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}

/** Incrementally-maintained OVER-window results — the StreamOverWindow
  * analog (reference: src/stream/src/executor/over_window/general.rs:48
  * with frame_finder.rs computing, per delta, the exact frame ranges
  * whose outputs can change).
  *
  * Two recompute granularities, chosen automatically:
  *
  *  - FRAME-GRANULAR (the frame_finder analog): when every window
  *    expression in `windowFn` uses a bounded RANGE frame over one
  *    integral order column, the reach is derived from the ANALYZED plan
  *    — lookback `L` = max |lower bound|, lookahead `A` = max upper
  *    bound. A delta with keys in [kmin, kmax] can only change outputs
  *    whose frames contain a changed key, i.e. keys in
  *    [kmin − A, kmax + L]; recomputing those needs input keys
  *    [kmin − A − L, kmax + L + A]. Each batch reads only that key band
  *    of the touched partitions — O(delta + frame reach), not
  *    O(partition) — so one hot partition no longer makes every delta
  *    pay its full size.
  *  - PARTITION-GRANULAR fallback: anything the analysis cannot bound
  *    (rank/row_number — a mid-stream insert shifts every downstream row
  *    number; ROWS frames — row adjacency is unbounded in key space;
  *    unbounded/running frames) recomputes whole touched partitions,
  *    which is always correct.
  *
  * Both paths: merge delta into the base MV, recompute the affected
  * slice, diff old vs new into a changelog, merge into the result MV.
  * Reads are bucket-pruned when the MVs are bucketed on the partition
  * columns.
  */
final class IncrementalOver(
    baseMv: MaterializedView,
    resultMv: MaterializedView,
    partitionCols: Seq[String],
    windowFn: DataFrame => DataFrame,
    pk: Seq[String]) {

  /** Frame reach in order-key units (derived, not user-supplied). */
  private[graft] final case class FrameReach(
      orderCol: String, lookback: Long, lookahead: Long)

  // None = not yet inferred; Some(None) = inferred, fallback path
  private var inferredReach: Option[Option[FrameReach]] = None

  /** Frame-bound analysis over `windowFn`'s plan (frame_finder.rs:
    * the reference walks each window call's frame spec the same way).
    * Returns None unless EVERY window expression is a bounded RANGE
    * frame over the same single integral order column.
    */
  private[graft] def frameReachOf(schema: StructType): Option[FrameReach] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical
    val spark = baseMv.spark
    val probe = windowFn(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
    def offsetOf(e: Expression): Option[Long] = e match {
      case CurrentRow => Some(0L)
      case Literal(v: Byte, _) => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case UnaryMinus(inner, _) => offsetOf(inner).map(-_)
      case _ => None // unbounded / interval / non-literal
    }
    val windows = probe.queryExecution.analyzed
      .collect { case w: logical.Window => w }
      .flatMap(_.windowExpressions)
      .flatMap(_.collect { case we: WindowExpression => we })
    if (windows.isEmpty) return None
    val reaches = windows.map { we =>
      we.windowSpec.frameSpecification match {
        case SpecifiedWindowFrame(RangeFrame, lower, upper) =>
          for {
            lo <- offsetOf(lower)
            hi <- offsetOf(upper)
            order = we.windowSpec.orderSpec
            if order.size == 1
            name <- order.head.child match {
              case a: AttributeReference
                  if Seq(ByteType, ShortType, IntegerType, LongType)
                    .contains(a.dataType) => Some(a.name)
              case _ => None
            }
          } yield {
            // FrameReach is in KEY space. For ASC, PRECEDING reaches
            // toward smaller keys; for DESC it reaches toward LARGER
            // keys, so lookback/lookahead swap (the reference's
            // frame_finder keys reach off the order type the same way).
            val back = math.max(-lo, 0L)
            val ahead = math.max(hi, 0L)
            if (order.head.direction == Descending) (name, ahead, back)
            else (name, back, ahead)
          }
        case _ => None // ROWS frame or unspecified
      }
    }
    if (reaches.exists(_.isEmpty)) None
    else {
      val rs = reaches.flatten
      if (rs.map(_._1).distinct.size != 1) None
      else Some(FrameReach(rs.head._1, rs.map(_._2).max, rs.map(_._3).max))
    }
  }

  /** Apply one changelog/upsert delta to the base table and bring the
    * window-result MV up to date.
    */
  def applyDelta(delta: DataFrame): Unit = {
    baseMv.merge(delta)
    val dataDelta = delta.drop(Changelog.OpCol, Changelog.SeqCol)
    if (inferredReach.isEmpty)
      inferredReach = Some(frameReachOf(dataDelta.schema))
    inferredReach.get match {
      case Some(fr) =>
        // NULL order keys escape the min/max band arithmetic entirely
        // (NULL lo/hi, NULL band predicates) — a batch carrying any
        // routes through the always-correct partition-granular path.
        if (!dataDelta.where(col(fr.orderCol).isNull).isEmpty)
          applyPartitionGranular(dataDelta)
        else applyFrameGranular(dataDelta, fr)
      case None => applyPartitionGranular(dataDelta)
    }
  }

  private def applyPartitionGranular(dataDelta: DataFrame): Unit = {
    val parts = dataDelta.select(partitionCols.map(col): _*).distinct()
    // bucket-pruned when the MVs are bucketed on the partition columns
    // (define them with bucketKeys = partitionCols) — then each batch
    // reads O(touched buckets), not O(table)
    val base = baseMv.readTouched(parts)
    if (base.columns.isEmpty) return
    val affectedBase = base.join(broadcast(parts), partitionCols, "left_semi")
    val recomputed = windowFn(affectedBase)
    val current = resultMv.readTouched(parts)
    val oldAffected =
      if (current.columns.isEmpty) recomputed.where(lit(false))
      else current.join(broadcast(parts), partitionCols, "left_semi")
    val changelog = Changelog.diff(oldAffected, recomputed, pk)
    resultMv.merge(changelog)
  }

  /** The input band (per touched partition) the frame-granular path
    * recomputes from — exposed so tests can assert its size is bounded
    * by frame reach, not partition size.
    */
  private[graft] def frameInput(dataDelta: DataFrame, fr: FrameReach)
      : (DataFrame, DataFrame) = {
    val k = col(fr.orderCol)
    val ranges = dataDelta.groupBy(partitionCols.map(col): _*)
      .agg(min(k).cast(LongType).as("__lo"), max(k).cast(LongType).as("__hi"))
    val parts = ranges.select(partitionCols.map(col): _*)
    val base = baseMv.readTouched(parts)
    if (base.columns.isEmpty)
      return (base, ranges)
    val input = base.join(broadcast(ranges), partitionCols)
      .where(k >= col("__lo") - fr.lookahead - fr.lookback &&
        k <= col("__hi") + fr.lookback + fr.lookahead)
      .drop("__lo", "__hi")
    (input, ranges)
  }

  private def applyFrameGranular(dataDelta: DataFrame, fr: FrameReach): Unit = {
    val k = col(fr.orderCol)
    val (input, ranges) = frameInput(dataDelta, fr)
    if (input.columns.isEmpty) return
    // outputs are only valid where the row's whole frame fit in the input
    def affectedOnly(df: DataFrame): DataFrame =
      df.join(broadcast(ranges), partitionCols)
        .where(k >= col("__lo") - fr.lookahead && k <= col("__hi") + fr.lookback)
        .drop("__lo", "__hi")
    val recomputed = affectedOnly(windowFn(input))
    val current = resultMv.readTouched(ranges.select(partitionCols.map(col): _*))
    val oldAffected =
      if (current.columns.isEmpty) recomputed.where(lit(false))
      else affectedOnly(current)
    val changelog = Changelog.diff(oldAffected, recomputed, pk)
    resultMv.merge(changelog)
  }

  def read(): DataFrame = resultMv.read()
}
