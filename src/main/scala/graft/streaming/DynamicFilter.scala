package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming dynamic filter: maintain `SELECT * FROM l WHERE l.v ⊙
  * (SELECT max(b) FROM r)` continuously — the scalar RHS moves over time,
  * and rows of the materialized left input flip in/out of the result as
  * it does (reference: src/stream/src/executor/dynamic_filter.rs:39 —
  * left rows are state; on an RHS move the executor range-scans exactly
  * the band between the old and new threshold and emits
  * inserts/retractions for it).
  *
  * Spark rendering: the left input is a [[MaterializedView]] (parquet,
  * column stats per file); the band re-scan is a `WHERE v BETWEEN old
  * AND new` read, which parquet row-group stats prune to O(band) — the
  * same asymptotics as the reference's range scan, without a custom
  * state store.
  *
  * Threshold durability: in epoch mode (`batchId >= 0`) the threshold is
  * committed as a `_threshold` sidecar INSIDE the result MV's atomically-
  * renamed epoch dir — delta and threshold publish in one atomic unit, so
  * a crash can never apply a batch under a threshold that doesn't match
  * the committed result. A replay of an already-committed epoch re-applies
  * the COMMITTED delta verbatim (the RHS scalar may have moved again
  * between crash and replay; recomputing under the new value would tear
  * the epoch). Non-epoch (ad-hoc) use falls back to a side file.
  *
  * Comparator follows the reference's proto (Gt/Ge/Lt/Le,
  * proto/expr.proto ExprNode comparison ops over a dynamic RHS).
  */
final class DynamicFilter(
    lhsMv: MaterializedView,
    resultMv: MaterializedView,
    valueCol: String,
    op: String = ">") {

  require(Seq(">", ">=", "<", "<=").contains(op), s"unsupported comparator $op")

  private val spark = resultMv.spark
  private val thresholdPath = Paths.get(s"${resultMv.targetDir}.threshold")

  private def qualifies(v: org.apache.spark.sql.Column, t: Double) = op match {
    case ">" => v > t
    case ">=" => v >= t
    case "<" => v < t
    case "<=" => v <= t
  }

  /** Threshold committed with the newest epoch that carried one — the
    * authoritative value in epoch mode (it moved atomically with its
    * delta). Epochs whose RHS produced no value write no sidecar and are
    * skipped: the threshold they ran under is the previous one.
    */
  private def committedThreshold: Option[Double] = {
    val dir = Paths.get(resultMv.changelogLocation)
    if (!Files.exists(dir)) None
    else {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .flatMap { p =>
          p.getFileName.toString.stripPrefix("batch-").toLongOption
            .map(id => (id, p.resolve("_threshold")))
        }
        .filter { case (_, f) => Files.exists(f) }
        .toSeq.sortBy(-_._1).headOption
        .map { case (_, f) => new String(Files.readAllBytes(f)).trim.toDouble }
    }
  }

  /** The committed threshold, or None before the RHS produced one. */
  def currentThreshold: Option[Double] =
    committedThreshold.orElse {
      if (!Files.exists(thresholdPath)) None
      else Some(new String(Files.readAllBytes(thresholdPath)).trim.toDouble)
    }

  /** Apply one left-side delta plus the RHS scalar's current value.
    * Emits to the result MV: delta rows under the NEW threshold, plus
    * inserts/retractions for stored rows inside the (old, new] band the
    * threshold swept over.
    *
    * With `batchId >= 0` the emission is epoch-committed: threshold and
    * delta publish atomically, and replaying a committed epoch re-applies
    * its committed delta instead of recomputing (see class doc).
    */
  def applyDelta(lhsDelta: DataFrame, newThreshold: Option[Double],
      batchId: Long = -1L): Unit = {
    val old = currentThreshold
    lhsMv.merge(lhsDelta)

    // Replay of an epoch whose result already committed: the left merge
    // above is PK-idempotent; re-apply the committed delta to storage
    // (in case the crash hit between rename and storage rewrite) and
    // leave the committed threshold untouched.
    if (batchId >= 0) {
      val epochDir = Paths.get(resultMv.changelogLocation, s"batch-$batchId")
      if (Files.exists(epochDir)) {
        val committed = spark.read.parquet(epochDir.toString)
        resultMv.merge(committed, batchId)
        return
      }
    }

    // 1. delta rows, filtered by the epoch's effective threshold — the
    //    new RHS value, or the standing committed one when this epoch's
    //    RHS produced nothing (no threshold ever → nothing qualifies: a
    //    null scalar comparison is never true)
    val deltaOut = newThreshold.orElse(old) match {
      case Some(t) =>
        val hasOps = lhsDelta.columns.contains(Changelog.OpCol)
        val d = if (hasOps) lhsDelta else Changelog.ofInserts(lhsDelta)
        // deletes always propagate (the row may be in the result);
        // adds only if they qualify now
        d.where(!Changelog.isAdd(col(Changelog.OpCol)) ||
          qualifies(col(valueCol), t))
      case None => lhsDelta.limit(0)
    }

    // 2. stored rows in the swept band flip membership. For > / >=:
    //    threshold rising disqualifies (lo, hi]; falling requalifies.
    //    For < / <=: mirrored. The band read prunes on parquet stats.
    val bandOut = (old, newThreshold) match {
      case (Some(o), Some(n)) if o != n =>
        val (lo, hi) = (math.min(o, n), math.max(o, n))
        val stored = lhsMv.read()
          .where(col(valueCol) > lo && col(valueCol) <= hi ||
            col(valueCol) === lo) // lo endpoint matters for >= / <
        val nowIn = qualifies(col(valueCol), n)
        val wasIn = qualifies(col(valueCol), o)
        Some(stored
          .withColumn(Changelog.OpCol,
            when(nowIn && !wasIn, Changelog.Insert)
              .when(wasIn && !nowIn, Changelog.Delete))
          .where(col(Changelog.OpCol).isNotNull)
          .withColumn(Changelog.SeqCol, lit(Long.MaxValue)))
      case (None, Some(n)) =>
        // first threshold: the whole qualifying prefix of stored state
        // enters the result (minus the delta just merged — it is already
        // in deltaOut, and the band rows carry MaxValue seq to win ties)
        Some(lhsMv.read().where(qualifies(col(valueCol), n))
          .withColumn(Changelog.OpCol, lit(Changelog.Insert))
          .withColumn(Changelog.SeqCol, lit(Long.MaxValue)))
      case _ => None
    }

    val hasOps = deltaOut.columns.contains(Changelog.OpCol)
    val deltaNorm = if (hasOps) deltaOut else Changelog.ofInserts(deltaOut)
    val out = bandOut.fold(deltaNorm)(b => deltaNorm.unionByName(b))
    if (batchId >= 0) {
      // threshold rides inside the atomically-renamed epoch dir
      resultMv.merge(out, batchId,
        sidecar = newThreshold.map(t => "_threshold" -> t.toString).toMap)
      // ALSO cache it in the side file AFTER the commit: changelog
      // retention (expireChangelog) may later delete the sidecar-bearing
      // epoch dirs, and currentThreshold must survive that. The sidecar
      // stays authoritative while it exists (committedThreshold is
      // consulted first), so crash-replay semantics are unchanged.
      newThreshold.foreach { t =>
        Files.createDirectories(thresholdPath.getParent)
        Files.write(thresholdPath, t.toString.getBytes)
      }
    } else {
      resultMv.merge(out)
      newThreshold.foreach { t =>
        Files.createDirectories(thresholdPath.getParent)
        Files.write(thresholdPath, t.toString.getBytes)
      }
    }
  }

  def read(): DataFrame = resultMv.read()
}
