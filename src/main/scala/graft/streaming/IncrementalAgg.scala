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
    aggFn: DataFrame => DataFrame,
    // false when `baseMv` is maintained by its OWN job (SQL-level
    // aggregate MV-on-MV: the upstream MV merges its deltas itself and
    // this instance only tails its changelog) — then applyDelta must
    // not merge the delta a second time
    ownsBase: Boolean = true,
    // Group-key derivation for aggregates whose group columns do NOT
    // exist on the input rows (agg over a GENERATE/explode — the
    // reference's StreamProjectSet feeding StreamHashAgg): replays the
    // defining query over the tiny delta slice and projects the group
    // keys. Retract-images explode to exactly the group keys they
    // leave, insert-images to the keys they enter.
    keysOf: Option[DataFrame => DataFrame] = None,
    // true only when the upstream changelog's epochs are MULTISET-exact
    // (every image a true before/after row: DML, source logs, per-row
    // and agg chains). Join/union/dynfilter/TopN/OVER chains publish
    // PK-resolution deltas (several images per PK, phantom/arbitrary
    // retract images) that only a PK-keyed merge resolves — the
    // value-state ±fold consumes deltas as multisets and must never see
    // such a feed (r11; caught by StreamingChainFuzzSpec two-input
    // topologies). The touched-group recompute is correct on any feed.
    exactFeed: Boolean = false) {

  /** Null-safe semi-join on the group columns: a delta touching the
    * NULL group must select the base's NULL-group rows (plain equi-join
    * semantics would silently skip them).
    */
  private def semiOnGroups(left: DataFrame, keys: DataFrame): DataFrame = {
    val k = broadcast(keys).as("__k")
    val l = left.as("__l")
    l.join(k, groupCols.map(c => l(c) <=> k(c)).reduce(_ && _), "left_semi")
  }

  // ---- O(Δ) value state for delta-computable GLOBAL aggregates ----
  // (see ValueStateAgg — r10: a chained `SELECT count(*), sum(v)` epoch
  // folds the delta into exact accumulators instead of re-scanning the
  // whole base state). Crash contract mirrors DynamicFilter's
  // threshold: the folded state commits as an `_aggstate` sidecar
  // INSIDE the atomically-renamed epoch dir (authoritative), with a
  // side FILE cache that survives changelog retention; the recompute
  // fallback deletes the cache BEFORE publishing so no stale state can
  // be resurrected.

  private val statePath =
    java.nio.file.Paths.get(s"${aggMv.targetDir}.aggstate")
  private var memState: Option[(Seq[ValueStateAgg.Slot], Array[Any])] = None
  private var memGrouped
      : Option[(Seq[ValueStateAgg.Slot], Map[Seq[Any], Array[Any]])] = None
  // group-count cap tripped: stop re-bootstrapping an O(state) pass
  // every epoch for a state that will never fit the sidecar budget
  @volatile private var groupedDisabled = false

  private def invalidateValueState(): Unit = {
    memState = None
    memGrouped = None
    java.nio.file.Files.deleteIfExists(statePath)
  }

  /** Side-file cache write, stamped with the epoch it reflects (ADVICE
    * r10: an unstamped cache could go one epoch stale across a crash
    * window and be resurrected after retention pruned the epochs).
    */
  private def sideWrite(batchId: Long, body: String): Unit = {
    java.nio.file.Files.createDirectories(statePath.getParent)
    java.nio.file.Files.write(statePath,
      (s"e:$batchId\n" + body).getBytes("UTF-8"))
  }

  /** Side-file cache body — only when its stamp equals the MV's latest
    * published epoch (which [[MaterializedView.expireChangelog]] never
    * regresses: epoch dirs survive retention).
    */
  private def sideRead(): Option[String] = {
    import java.nio.file.Files
    if (!Files.exists(statePath)) return None
    val txt = new String(Files.readAllBytes(statePath), "UTF-8")
    val cut = txt.indexOf('\n')
    if (cut < 0 || !txt.startsWith("e:")) return None
    txt.substring(2, cut).toLongOption
      .filter(_ == aggMv.latestChangelogBatchId)
      .map(_ => txt.substring(cut + 1))
  }

  /** The newest published epoch's `_aggstate` sidecar: None = no epoch
    * dirs at all; Some(None) = newest epoch was recompute-published
    * (carries no sidecar → any older state is stale).
    */
  private def newestEpochSidecar(): Option[Option[String]] = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(aggMv.changelogLocation)
    val newest =
      if (!Files.exists(dir)) None
      else graft.FsList.list(dir).iterator
        .flatMap(p => p.getFileName.toString.stripPrefix("batch-")
          .toLongOption.map(_ -> p))
        .toSeq.sortBy(-_._1).headOption.map(_._2)
    newest.map { p =>
      val sc = p.resolve("_aggstate")
      if (Files.exists(sc))
        Some(new String(Files.readAllBytes(sc), "UTF-8"))
      else None
    }
  }

  /** Committed state: decided SOLELY by the newest published epoch when
    * any epoch dirs exist (a recompute-published epoch carries no
    * sidecar and must yield None — older sidecars are stale); the
    * stamped side file only answers when retention/compaction removed
    * every epoch AND its stamp matches the latest published epoch.
    */
  private def committedState(spec: Seq[ValueStateAgg.Slot]): Option[Array[Any]] =
    newestEpochSidecar()
      .map(_.flatMap(ValueStateAgg.parse))
      .getOrElse(sideRead().flatMap(ValueStateAgg.parse))
      .filter(_.length == ValueStateAgg.cells(spec))

  private def committedGroupedState(spec: Seq[ValueStateAgg.Slot])
      : Option[Map[Seq[Any], Array[Any]]] =
    newestEpochSidecar()
      .map(_.flatMap(ValueStateAgg.parseGrouped(_, spec)))
      .getOrElse(sideRead().flatMap(ValueStateAgg.parseGrouped(_, spec)))

  /** Try the O(Δ) path; true = epoch fully handled (published or a
    * committed replay). False falls through to the materialized-input
    * recompute, which is always correct.
    */
  private def valueStateApply(delta: DataFrame, batchId: Long): Boolean = {
    import java.nio.file.{Files, Paths}
    // chained MVs with a multiset-exact upstream feed only (see
    // exactFeed): a source-owned base can receive plain PK-overwriting
    // upserts, and join/union-fed chains PK-resolution deltas — neither
    // of which a ±fold can account
    if (ownsBase || batchId < 0 || !exactFeed) return false
    if (!delta.columns.contains(Changelog.OpCol)) return false
    val baseFrame = baseMv.read()
    if (baseFrame.columns.isEmpty) return false
    val shaped = aggFn(baseFrame.where(lit(false)))
    val aplan = shaped.queryExecution.analyzed
    // subqueries / nondeterminism make the slice fold non-linear
    // (ADVICE r10 high) — recompute path only
    if (!ValueStateAgg.planEligible(aplan)) return false
    val agg = ValueStateAgg.globalAggOf(aplan).getOrElse(return false)
    val spec = ValueStateAgg.slotsOf(agg).getOrElse(return false)
    // replay of a committed epoch: its sidecar state is authoritative;
    // an epoch committed by the recompute fallback has none — drop state
    val epochDir = Paths.get(aggMv.changelogLocation, s"batch-$batchId")
    if (Files.exists(epochDir)) {
      val sc = epochDir.resolve("_aggstate")
      if (Files.exists(sc))
        ValueStateAgg.parse(new String(Files.readAllBytes(sc), "UTF-8"))
          .foreach(st => memState = Some(spec -> st))
      else invalidateValueState()
      return true
    }
    def dropOps(d: DataFrame) = d.drop(Changelog.OpCol, Changelog.SeqCol)
    val state = memState.filter(_._1 == spec).map(_._2)
      .orElse(committedState(spec)) match {
      case Some(st) =>
        val ins = ValueStateAgg.stateOf(
          aggFn(dropOps(delta.where(Changelog.isAdd(col(Changelog.OpCol))))),
          spec).getOrElse(return false)
        val del = ValueStateAgg.stateOf(
          aggFn(dropOps(delta.where(!Changelog.isAdd(col(Changelog.OpCol))))),
          spec).getOrElse(return false)
        ValueStateAgg.fold(st, ins, del)
      case None =>
        // bootstrap: ONE O(state) pass over the post-merge base (the
        // upstream already merged this epoch's delta), then O(Δ) forever
        ValueStateAgg.stateOf(aggFn(baseMv.read()), spec).getOrElse(return false)
    }
    val recomputed = ValueStateAgg.outputOf(shaped, spec, state)
      .getOrElse(return false)
    val old = aggMv.read()
    val retractions =
      (if (old.columns.isEmpty) recomputed.where(lit(false))
       else old.select(recomputed.columns.map(col): _*))
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
      .withColumn(Changelog.SeqCol, lit(0L))
    val upserts = recomputed
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
      .withColumn(Changelog.SeqCol, lit(1L))
    aggMv.merge(upserts.unionByName(retractions), batchId,
      sidecar = Map("_aggstate" -> ValueStateAgg.render(state)))
    memState = Some(spec -> state)
    sideWrite(batchId, ValueStateAgg.render(state))
    true
  }

  /** The grouped O(Δ) path (r11, VERDICT r10 #1): per-group accumulator
    * state folded from the epoch's insert/delete slices; a steady epoch
    * touching g groups reads O(Δ) delta records + O(g) old aggregate
    * rows — never the touched groups' base row sets. Same eligibility
    * contract as the global path (chained retraction-complete feed,
    * exact slots only, no subqueries/nondeterminism) plus: grouping
    * expressions must be plain attributes named exactly the group
    * columns (session windows — whose gap-merge is not per-group
    * linear — group on a derived attr and are excluded by that), key
    * types must render exactly, and the total group count must fit the
    * sidecar budget (`spark.graft.valueState.maxGroups`; past it the
    * path disables itself and the bucket-pruned touched-group recompute
    * — already O(touched × rows-per-group) — carries the MV).
    * Crash contract identical to the global path: state commits as the
    * `_aggstate` sidecar inside the atomically-renamed epoch dir;
    * the recompute fallback invalidates BEFORE publishing.
    */
  private def groupedValueStateApply(delta: DataFrame, batchId: Long): Boolean = {
    import java.nio.file.{Files, Paths}
    if (ownsBase || batchId < 0 || !exactFeed || groupedDisabled) return false
    if (!delta.columns.contains(Changelog.OpCol)) return false
    val baseFrame = baseMv.read()
    if (baseFrame.columns.isEmpty) return false
    val shaped = aggFn(baseFrame.where(lit(false)))
    val aplan = shaped.queryExecution.analyzed
    if (!ValueStateAgg.planEligible(aplan)) return false
    val agg = ValueStateAgg.groupedAggOf(aplan, groupCols).getOrElse(return false)
    val spec = ValueStateAgg.slotsOf(agg).getOrElse(return false)
    // replay of a committed epoch: its sidecar state is authoritative;
    // an epoch committed by the recompute fallback has none — drop state
    val epochDir = Paths.get(aggMv.changelogLocation, s"batch-$batchId")
    if (Files.exists(epochDir)) {
      val sc = epochDir.resolve("_aggstate")
      if (Files.exists(sc))
        ValueStateAgg.parseGrouped(
          new String(Files.readAllBytes(sc), "UTF-8"), spec)
          .foreach(st => memGrouped = Some(spec -> st))
      else invalidateValueState()
      return true
    }
    val maxGroups = scala.util.Try(aggMv.spark.conf
      .get("spark.graft.valueState.maxGroups", "32768").toInt).getOrElse(32768)
    def dropOps(d: DataFrame) = d.drop(Changelog.OpCol, Changelog.SeqCol)
    val ins = ValueStateAgg.groupedStateOf(
      aggFn(dropOps(delta.where(Changelog.isAdd(col(Changelog.OpCol))))),
      spec, groupCols).getOrElse(return false)
    val del = ValueStateAgg.groupedStateOf(
      aggFn(dropOps(delta.where(!Changelog.isAdd(col(Changelog.OpCol))))),
      spec, groupCols).getOrElse(return false)
    val touched = (ins.keySet ++ del.keySet).toSeq
    val state = memGrouped.filter(_._1 == spec).map(_._2)
      .orElse(committedGroupedState(spec)) match {
      case Some(st) =>
        ValueStateAgg.foldGrouped(st, ins, del, spec).getOrElse(return false)
      case None =>
        // bootstrap: ONE O(state) pass over the post-merge base (the
        // upstream already merged this epoch's delta), then O(Δ+g)
        ValueStateAgg.groupedStateOf(aggFn(baseMv.read()), spec, groupCols)
          .getOrElse(return false)
    }
    if (state.size > maxGroups) { groupedDisabled = true; return false }
    val live = touched.flatMap(k => state.get(k).map(k -> _))
    val recomputed = ValueStateAgg
      .groupedOutputOf(shaped, spec, groupCols, live).getOrElse(return false)
    val touchedDf = ValueStateAgg.keysFrame(shaped, groupCols, touched)
      .getOrElse(return false)
    val oldRows = aggMv.readTouched(touchedDf)
    val retractions =
      (if (oldRows.columns.isEmpty) recomputed.where(lit(false))
       else semiOnGroups(oldRows, touchedDf)
         .select(recomputed.columns.map(col): _*))
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
      .withColumn(Changelog.SeqCol, lit(0L))
    val upserts = recomputed
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
      .withColumn(Changelog.SeqCol, lit(1L))
    val rendered = ValueStateAgg.renderGrouped(state)
    aggMv.merge(upserts.unionByName(retractions), batchId,
      sidecar = Map("_aggstate" -> rendered))
    memGrouped = Some(spec -> state)
    sideWrite(batchId, rendered)
    true
  }

  /** Apply one changelog/upsert delta to the base table and bring the
    * aggregate MV up to date (deleting groups that emptied out).
    * `batchId >= 0` publishes the aggregate delta as that changelog
    * epoch, so further MVs can chain off `aggMv` in turn.
    *
    * The published delta is RETRACTION-COMPLETE (the reference's
    * U-/U+ pairing, src/common/src/array/stream_chunk.rs:45-50): every
    * touched group's OLD aggregate row goes out as UpdateDelete (full
    * before-image, seq 0) and its recomputed row as UpdateInsert
    * (seq 1) — a group present in both settles to the new row, a group
    * with only the retraction is deleted with its true old values. A
    * downstream chained aggregate grouping on any column (not just this
    * MV's PK) can therefore locate every group the change affects.
    */
  def applyDelta(delta0: DataFrame, batchId: Long = -1L): Unit = {
    // re-bind to the ENGINE session: foreachBatch hands a DataFrame on
    // the stream's cloned session, and the keysOf replay registers temp
    // views the engine session's sql() must resolve — a stream-session
    // registration would be invisible there, silently resolving a STALE
    // prior view (wrong touched groups + a pinned pre-rewrite file list)
    val delta =
      if (delta0.sparkSession eq baseMv.spark) delta0
      else baseMv.spark.createDataFrame(delta0.rdd, delta0.schema)
    if (ownsBase) baseMv.merge(delta)
    // hold the base's read lock across plan AND execution: with a
    // borrowed base, its own maintenance job rewrites the bucket files
    // this recompute reads — the lock pins a consistent file set
    baseMv.withReadLock {
    // GLOBAL aggregate (no GROUP BY): ONE group, always touched — the
    // reference's simple_agg with materialized-input state (reference:
    // src/stream/src/executor/simple_agg.rs:43 — min/max/percentile
    // keep their input rows in a state table and re-derive per
    // barrier). The base rows ARE that state; every epoch recomputes
    // the single output row over them and republishes a
    // retraction-complete U-/U+ pair (two rows on the wire, O(state)
    // read — the same asymptotics as the reference's retraction path).
    if (groupCols.isEmpty) {
      // O(Δ) value-state fold when every aggregate is delta-computable
      // exactly (count / integral-or-decimal sum / integral avg — see
      // ValueStateAgg); min/max/percentile/sketch and float sums keep
      // the materialized-input recompute below
      if (valueStateApply(delta, batchId)) return
      val base = baseMv.read()
      if (base.columns.isEmpty) return
      // no stale value state may survive an epoch this path publishes
      // (deleted BEFORE the merge so a crash window replays consistently)
      invalidateValueState()
      val recomputed = aggFn(base)
      val old = aggMv.read()
      val retractions =
        (if (old.columns.isEmpty) recomputed.where(lit(false))
         else old.select(recomputed.columns.map(col): _*))
        .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
        .withColumn(Changelog.SeqCol, lit(0L))
      val upserts = recomputed
        .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
        .withColumn(Changelog.SeqCol, lit(1L))
      aggMv.merge(upserts.unionByName(retractions), batchId)
      return
    }
    // O(Δ+g) grouped value-state fold when every aggregate is
    // delta-computable exactly (see groupedValueStateApply)
    if (groupedValueStateApply(delta, batchId)) return
    // no stale folded state may survive an epoch the recompute path
    // publishes (deleted BEFORE the merge, same as the global branch)
    invalidateValueState()
    // direct mode: group columns are plain input columns, so delta rows
    // carry their group keys and the base semi-join prunes BEFORE the
    // aggregate. Generate mode (group keys born inside the query's
    // explode): keys come from replaying the query on the delta, and
    // the touched-group restriction applies AFTER the aggregate — a
    // base row's group membership is only known post-explode.
    val direct = groupCols.forall(delta.columns.contains)
    val touched =
      if (direct) delta.select(groupCols.map(col): _*).distinct()
      else keysOf.getOrElse(throw new IllegalStateException(
          s"group columns ${groupCols.mkString(",")} are not delta columns " +
            "and no keysOf derivation was provided"))
        .apply(delta).select(groupCols.map(col): _*).distinct()
    val scopedBase = baseMv.readTouched(touched)
    if (scopedBase.columns.isEmpty) return
    val recomputed =
      if (direct) aggFn(semiOnGroups(scopedBase, touched))
      else semiOnGroups(aggFn(scopedBase), touched)
    val oldRows = aggMv.readTouched(touched)
    val retractions =
      (if (oldRows.columns.isEmpty) recomputed.where(lit(false)) // empty agg MV
       else semiOnGroups(oldRows, touched)
         .select(recomputed.columns.map(col): _*))
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateDelete))
      .withColumn(Changelog.SeqCol, lit(0L))
    val upserts = recomputed
      .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
      .withColumn(Changelog.SeqCol, lit(1L))
    aggMv.merge(upserts.unionByName(retractions), batchId)
    }
  }

  def read(): DataFrame = aggMv.read()
}
