package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators the built-in engine can't express:
  * retraction-correct top-k, streaming as-of join (all four inequalities,
  * inner + left-outer), and watermark-ordered emission (EOWC sort). Each
  * is a `flatMapGroupsWithState` keyed by the partition key — state lives
  * in Spark's state store (the Hummock analog, SURVEY.md §2.11), scales
  * with distinct keys, and is checkpointed at every micro-batch
  * (barrier/epoch analog).
  *
  * Watermarks are threaded as an explicit per-row column (as in
  * [[StatefulOps.eowcSort]]) so state cleanup is deterministic and
  * testable; in a deployed pipeline the column is
  * `current_watermark()`-derived. State below the watermark is pruned
  * every batch — the reference cleans join state the same way
  * (reference: src/stream/src/executor/hash_join.rs
  * `clean_left_state_conjunction_idx`, proto/stream_plan.proto:421-427).
  */
object StatefulOps {

  // ---------------------------------------------------------------- top-k

  /** One change to a scored collection. op: +1 insert, -1 delete. */
  case class ScoredChange(key: String, id: Long, score: Double, op: Int)

  /** Current top-k emission for a key after a batch; `live` is the
    * retained state size (items alive after retraction/cleaning) — the
    * operator's state-table metric.
    */
  case class TopKUpdate(key: String, ids: Seq[Long], scores: Seq[Double], live: Int)

  /** State: the live per-key multiset — the minimal retraction-correct
    * state (every live item may become top-k after enough deletes). The
    * reference keeps the same shape (a sorted state table with a cache —
    * src/stream/src/executor/top_n/top_n_plain.rs:79).
    */
  case class TopKState(items: Map[Long, Double])

  /** Retraction-correct streaming top-k per key: inserts and deletes both
    * supported; emits the post-batch top-k for every touched key.
    * Ordering: score desc, id asc (deterministic). State is bounded by
    * the LIVE item count (deletes shrink it); for time-scoped inputs use
    * [[retractableTopKCleaned]] which also expires by watermark.
    */
  def retractableTopK(
      changes: Dataset[ScoredChange], k: Int): Dataset[TopKUpdate] = {
    implicit val updEnc = Encoders.product[TopKUpdate]
    implicit val stEnc = Encoders.product[TopKState]
    implicit val strEnc = Encoders.STRING
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[ScoredChange], state: GroupState[TopKState]) => {
          var items = state.getOption.map(_.items).getOrElse(Map.empty[Long, Double])
          rows.foreach { c =>
            if (c.op >= 0) items += (c.id -> c.score)
            else items -= c.id
          }
          if (items.isEmpty) state.remove() else state.update(TopKState(items))
          val top = items.toSeq
            .sortBy { case (id, score) => (-score, id) }
            .take(k)
          Iterator.single(TopKUpdate(key, top.map(_._1), top.map(_._2), items.size))
        })
  }

  /** A scored change with an event timestamp, for watermark-cleaned
    * group top-k.
    */
  case class TimedScoredChange(key: String, id: Long, score: Double, op: Int, ts: Long)

  case class TimedTopKState(items: Map[Long, (Double, Long)])

  /** Watermark-cleaned streaming group top-k: like [[retractableTopK]]
    * but every item carries an event time and items older than the
    * threaded watermark are expired from state each batch — the
    * reference's StreamGroupTopN with `clean_by_watermark`
    * (reference: src/stream/src/executor/top_n/group_top_n.rs). Input
    * rows are (change, watermark); state for a key is cleaned when the
    * key is next touched (the state-store scan the reference does on
    * watermark barriers maps to per-key lazy cleanup here), and removed
    * entirely when no live item remains.
    */
  def retractableTopKCleaned(
      changes: Dataset[(TimedScoredChange, Long)], k: Int): Dataset[TopKUpdate] = {
    implicit val updEnc = Encoders.product[TopKUpdate]
    implicit val stEnc = Encoders.product[TimedTopKState]
    implicit val strEnc = Encoders.STRING
    changes.groupByKey(_._1.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[(TimedScoredChange, Long)],
            state: GroupState[TimedTopKState]) => {
          val batch = rows.toSeq
          val wm = if (batch.isEmpty) Long.MinValue else batch.map(_._2).max
          var items = state.getOption.map(_.items)
            .getOrElse(Map.empty[Long, (Double, Long)])
          batch.foreach { case (c, _) =>
            if (c.op >= 0) items += (c.id -> (c.score, c.ts))
            else items -= c.id
          }
          items = items.filter { case (_, (_, ts)) => ts >= wm }
          if (items.isEmpty) state.remove() else state.update(TimedTopKState(items))
          val top = items.toSeq
            .sortBy { case (id, (score, _)) => (-score, id) }
            .take(k)
          Iterator.single(TopKUpdate(key, top.map(_._1), top.map(_._2._1), items.size))
        })
  }

  // ------------------------------------------------------------ as-of join

  /** As-of inequality: which right version a left row at time t matches.
    * Le: latest right ≤ t; Lt: latest right < t; Ge: earliest right ≥ t;
    * Gt: earliest right > t
    * (reference: proto/plan_common.proto:156-161 AsOfJoinInequalityType).
    */
  sealed trait AsofIneq
  case object AsofLe extends AsofIneq
  case object AsofLt extends AsofIneq
  case object AsofGe extends AsofIneq
  case object AsofGt extends AsofIneq

  /** Tagged row for the streaming as-of join: side L carries probe rows,
    * side R carries build rows (versioned payloads).
    */
  case class AsofIn(key: String, side: String, ts: Long, id: Long, payload: Double)

  /** Match output; rightTs/payload are None for unmatched left-outer
    * rows. `stateSize` reports the retained right-version count after
    * watermark pruning (the state-table metric the spec asserts on).
    */
  case class AsofOut(key: String, leftId: Long, leftTs: Long,
      rightTs: Option[Long], payload: Option[Double], stateSize: Int)

  case class AsofState(right: Seq[(Long, Double)]) // (ts, payload), sorted asc

  /** Rightmost index i with f(v(i)) true (v partitioned true-then-false),
    * or -1; classic binary search over the sorted version vector.
    */
  private def lastWhere(v: IndexedSeq[(Long, Double)], f: Long => Boolean): Int = {
    var lo = 0; var hi = v.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (f(v(mid)._1)) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  /** Leftmost index i with f(v(i)) true (v partitioned false-then-true),
    * or -1.
    */
  private def firstWhere(v: IndexedSeq[(Long, Double)], f: Long => Boolean): Int = {
    var lo = 0; var hi = v.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (f(v(mid)._1)) { ans = mid; hi = mid - 1 } else lo = mid + 1
    }
    ans
  }

  /** Streaming AS-OF join, all four inequalities, inner or left-outer
    * (reference: src/stream/src/executor/asof_join.rs:110). Input rows
    * are (row, watermark). Right-side versions are kept per key in sorted
    * state and probed by binary search; every batch, versions the
    * watermark proves unreachable are evicted:
    *  - backward probes (Le/Lt): any future left has ts ≥ wm and matches
    *    the latest right ≤ its ts, so of the rights below wm only the
    *    LATEST can ever win → keep it, drop the rest;
    *  - forward probes (Ge/Gt): a future left matches the earliest right
    *    ≥ its ts ≥ wm, so ALL rights below wm are evictable.
    * An emptied key removes its state entirely (idle-key eviction).
    */
  def asofJoin(input: Dataset[(AsofIn, Long)], ineq: AsofIneq,
      leftOuter: Boolean): Dataset[AsofOut] = {
    implicit val outEnc = Encoders.product[AsofOut]
    implicit val stEnc = Encoders.product[AsofState]
    implicit val strEnc = Encoders.STRING
    input.groupByKey(_._1.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[(AsofIn, Long)], state: GroupState[AsofState]) => {
          val batch = rows.toSeq
          val wm = if (batch.isEmpty) Long.MinValue else batch.map(_._2).max
          var right: IndexedSeq[(Long, Double)] =
            state.getOption.map(_.right.toIndexedSeq).getOrElse(IndexedSeq.empty)
          val newRight = batch.map(_._1).filter(_.side == "R").map(r => (r.ts, r.payload))
          if (newRight.nonEmpty)
            right = (right ++ newRight).sortBy(_._1)
          // watermark eviction (see scaladoc)
          val pruned: IndexedSeq[(Long, Double)] = ineq match {
            case AsofLe | AsofLt =>
              val keepFrom = math.max(0, lastWhere(right, _ < wm))
              right.drop(keepFrom)
            case AsofGe | AsofGt =>
              right.dropWhile(_._1 < wm)
          }
          if (pruned.isEmpty) state.remove() else state.update(AsofState(pruned))
          val out = batch.map(_._1).filter(_.side == "L").flatMap { l =>
            val idx = ineq match {
              case AsofLe => lastWhere(pruned, _ <= l.ts)
              case AsofLt => lastWhere(pruned, _ < l.ts)
              case AsofGe => firstWhere(pruned, _ >= l.ts)
              case AsofGt => firstWhere(pruned, _ > l.ts)
            }
            if (idx >= 0) {
              val (rts, payload) = pruned(idx)
              Some(AsofOut(key, l.id, l.ts, Some(rts), Some(payload), pruned.size))
            } else if (leftOuter) {
              Some(AsofOut(key, l.id, l.ts, None, None, pruned.size))
            } else None
          }
          out.iterator
        })
  }

  /** AsofInner with ≤ and no watermark pruning — the minimal form. */
  def asofJoin(input: Dataset[AsofIn]): Dataset[AsofOut] = {
    implicit val tupEnc =
      Encoders.tuple(Encoders.product[AsofIn], Encoders.scalaLong)
    asofJoin(input.map(r => (r, Long.MinValue)), AsofLe, leftOuter = false)
  }

  // ------------------------------------------------- EOWC sort (watermark)

  case class TimedRow(key: String, ts: Long, value: Double)
  case class SortState(buffer: Seq[TimedRow], emitted: Long)

  /** EMIT-ON-WINDOW-CLOSE sort: buffer rows per key and release them in
    * event-time order once the (externally supplied per-batch) watermark
    * passes them — the reference's StreamSort
    * (src/stream/src/executor/sort.rs:20). The watermark is threaded as a
    * column so the operator itself stays deterministic and testable.
    */
  def eowcSort(input: Dataset[(TimedRow, Long)]): Dataset[TimedRow] = {
    implicit val rowEnc = Encoders.product[TimedRow]
    implicit val stEnc = Encoders.product[SortState]
    implicit val strEnc = Encoders.STRING
    input.groupByKey(_._1.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[(TimedRow, Long)], state: GroupState[SortState]) => {
          val batch = rows.toSeq
          val wm = if (batch.isEmpty) Long.MinValue else batch.map(_._2).max
          val st = state.getOption.getOrElse(SortState(Seq.empty, Long.MinValue))
          // strict: ts == frontier was already finalized — a late tie
          // re-admitted here would emit out of order, breaking finality
          val all = st.buffer ++ batch.map(_._1).filter(_.ts > st.emitted)
          val (ready, pending) = all.sortBy(r => (r.ts, r.value)).partition(_.ts <= wm)
          state.update(SortState(pending, math.max(st.emitted, wm)))
          ready.iterator
        })
  }

  // ----------------------------------------------------- EOWC over-window

  /** One finalized over-window row: running sum and row_number over the
    * key's event-time order (frame UNBOUNDED PRECEDING → CURRENT ROW).
    */
  case class OverOut(key: String, ts: Long, value: Double,
      runSum: Double, rowNum: Long)

  /** Accumulators survive across batches so emitted rows are never
    * re-read: the state is O(pending rows), not O(history).
    */
  case class OverState(buffer: Seq[TimedRow], emitted: Long,
      accSum: Double, accCount: Long)

  /** EMIT-ON-WINDOW-CLOSE over-window — the reference's
    * StreamEowcOverWindow (src/stream/src/executor/over_window/eowc.rs:
    * rows finalize in event-time order once the watermark passes, so
    * accumulative frames need each row emitted exactly once with its
    * final value; no retractions ever). Buffers pending rows per key,
    * and on watermark passage emits them in event-time order carrying
    * running sum / row_number continued from the accumulators of all
    * previously emitted rows.
    */
  def eowcOverWindow(input: Dataset[(TimedRow, Long)]): Dataset[OverOut] = {
    implicit val outEnc = Encoders.product[OverOut]
    implicit val stEnc = Encoders.product[OverState]
    implicit val strEnc = Encoders.STRING
    input.groupByKey(_._1.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[(TimedRow, Long)], state: GroupState[OverState]) => {
          val batch = rows.toSeq
          val wm = if (batch.isEmpty) Long.MinValue else batch.map(_._2).max
          val st = state.getOption.getOrElse(
            OverState(Seq.empty, Long.MinValue, 0d, 0L))
          // rows at-or-below the emission frontier arrived late: dropped
          // (the EOWC contract — emitted window results are final)
          val all = st.buffer ++ batch.map(_._1).filter(_.ts > st.emitted)
          val (ready, pending) = all.sortBy(r => (r.ts, r.value)).partition(_.ts <= wm)
          var sum = st.accSum
          var n = st.accCount
          val out = ready.map { r =>
            sum += r.value; n += 1
            OverOut(key, r.ts, r.value, sum, n)
          }
          state.update(OverState(pending, math.max(st.emitted, wm), sum, n))
          out.iterator
        })
  }
}
