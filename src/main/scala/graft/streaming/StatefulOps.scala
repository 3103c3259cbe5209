package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators the built-in engine can't express:
  * retraction-correct top-k, streaming as-of join, and watermark-ordered
  * emission (EOWC sort). Each is a `flatMapGroupsWithState` keyed by the
  * partition key — state lives in Spark's state store (the Hummock analog,
  * SURVEY.md §2.11), scales with distinct keys, and is checkpointed at
  * every micro-batch (barrier/epoch analog).
  */
object StatefulOps {

  // ---------------------------------------------------------------- top-k

  /** One change to a scored collection. op: +1 insert, -1 delete. */
  case class ScoredChange(key: String, id: Long, score: Double, op: Int)

  /** Current top-k emission for a key after a batch. */
  case class TopKUpdate(key: String, ids: Seq[Long], scores: Seq[Double])

  /** State: the full per-key multiset, bounded in practice by retention.
    * The reference keeps the same state shape (a sorted state table with a
    * cache — src/stream/src/executor/top_n/top_n_plain.rs:79); a bounded
    * cache + state-table re-scan variant is a drop-in refinement.
    */
  case class TopKState(items: Map[Long, Double])

  /** Retraction-correct streaming top-k per key: inserts and deletes both
    * supported; emits the post-batch top-k for every touched key.
    * Ordering: score desc, id asc (deterministic).
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
          state.update(TopKState(items))
          val top = items.toSeq
            .sortBy { case (id, score) => (-score, id) }
            .take(k)
          Iterator.single(TopKUpdate(key, top.map(_._1), top.map(_._2)))
        })
  }

  // ------------------------------------------------------------ as-of join

  /** Tagged row for the streaming as-of join: side L carries probe rows,
    * side R carries build rows (versioned payloads).
    */
  case class AsofIn(key: String, side: String, ts: Long, id: Long, payload: Double)

  case class AsofOut(key: String, leftId: Long, leftTs: Long,
      rightTs: Long, payload: Double)

  case class AsofState(right: Seq[(Long, Double)]) // (ts, payload), sorted asc

  /** Streaming AS-OF join (AsofInner, inequality ≤): each left row joins
    * the latest right row with right.ts <= left.ts
    * (reference: src/stream/src/executor/asof_join.rs:110). Right-side
    * versions are kept per key in sorted state; left rows probe with a
    * binary search. Late left rows (older than every right row) drop out,
    * matching AsofInner semantics.
    */
  def asofJoin(input: Dataset[AsofIn]): Dataset[AsofOut] = {
    implicit val outEnc = Encoders.product[AsofOut]
    implicit val stEnc = Encoders.product[AsofState]
    implicit val strEnc = Encoders.STRING
    input.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[AsofIn], state: GroupState[AsofState]) => {
          val all = rows.toSeq
          var right = state.getOption.map(_.right).getOrElse(Seq.empty)
          val newRight = all.filter(_.side == "R").map(r => (r.ts, r.payload))
          if (newRight.nonEmpty)
            right = (right ++ newRight).sortBy(_._1)
          state.update(AsofState(right))
          val out = all.filter(_.side == "L").flatMap { l =>
            val candidates = right.takeWhile(_._1 <= l.ts)
            candidates.lastOption.map { case (rts, payload) =>
              AsofOut(key, l.id, l.ts, rts, payload)
            }
          }
          out.iterator
        })
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
          val all = st.buffer ++ batch.map(_._1).filter(_.ts >= st.emitted)
          val (ready, pending) = all.sortBy(r => (r.ts, r.value)).partition(_.ts <= wm)
          state.update(SortState(pending, math.max(st.emitted, wm)))
          ready.iterator
        })
  }
}
