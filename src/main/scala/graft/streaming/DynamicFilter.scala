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
      graft.FsList.list(dir).iterator
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

/** Streaming dynamic-SET filter: maintain `SELECT … FROM l WHERE l.k
  * [NOT] IN (SELECT key FROM r …)` continuously — the IN/NOT-IN sibling
  * of [[DynamicFilter]] (reference: the planner turns these into
  * streaming semi/anti joins against the subquery's arrangement;
  * src/stream/src/executor/hash_join.rs LeftSemi/LeftAnti). Here the
  * subquery's key set is state (`keysMv`, PK = the key column) and each
  * right-side epoch re-evaluates it; the per-epoch ENTERING/LEAVING key
  * diff drives exactly the left rows whose membership flips — never a
  * full re-join. Membership flips derive from the POST-merge base state
  * (the base's current key IS the membership truth), so an epoch that
  * carries BOTH a left-side key move and a right-side set move resolves
  * each row once, correctly — a pre-epoch result snapshot would emit a
  * stale high-seq delete that outranks the delta's own re-insert. When
  * the base store is bucketed by the membership key, a set-move repair
  * reads only the entering/leaving keys' buckets
  * ([[MaterializedView.readTouched]]) — O(Δkeys), never O(left store).
  *
  * SQL null semantics are honored: a NULL inside the subquery's key set
  * makes NOT IN never true (x NOT IN (…, NULL)); a NULL left key never
  * qualifies under IN, and under NOT IN qualifies exactly when the
  * effective key set is EMPTY (x NOT IN (∅) is TRUE even for NULL x —
  * the vacuous universal). Empty↔non-empty transitions retract /
  * re-qualify the stored NULL-key rows like any other membership flip.
  *
  * Durability: the key-set delta and the null-presence flag commit as
  * sidecars INSIDE the result MV's atomically-renamed epoch dir
  * (`_keys_delta/`, `_dynset_hasnull`), so result and membership state
  * publish in one atomic unit; a committed-epoch replay re-applies all
  * three, healing a crash that landed between the result commit and the
  * key-set merge. The side file is only a read cache of the last
  * committed flag.
  */
final class DynamicSetFilter(
    lhsMv: MaterializedView,
    keysMv: MaterializedView,
    resultMv: MaterializedView,
    attrCol: String,
    negated: Boolean) {

  private val spark = resultMv.spark
  private val hasNullPath = Paths.get(s"${resultMv.targetDir}.dynset_hasnull")

  private def hasNullFlag: Boolean =
    Files.exists(hasNullPath) &&
      new String(Files.readAllBytes(hasNullPath)).trim == "1"

  private def setHasNull(b: Boolean): Unit = {
    Files.createDirectories(hasNullPath.getParent)
    Files.write(hasNullPath, (if (b) "1" else "0").getBytes)
  }

  private def orEmpty(df: DataFrame, shape: DataFrame): DataFrame =
    if (df.columns.nonEmpty) df else shape.where(lit(false))

  /** One epoch: the left delta (changelog ops over the projected row
    * shape) plus, when the right side published this epoch, the freshly
    * evaluated key set (single column named `attrCol`, may contain a
    * NULL row). None = right side untouched, the standing set applies.
    */
  def applyDelta(lhsDelta: DataFrame, newKeys0: Option[DataFrame],
      batchId: Long = -1L): Unit = {
    lhsMv.merge(lhsDelta)
    if (batchId >= 0) {
      val epochDir = Paths.get(resultMv.changelogLocation, s"batch-$batchId")
      if (Files.exists(epochDir)) {
        // committed replay: re-apply the result verbatim, PLUS the
        // key-set delta and null flag committed in the same atomic
        // rename — a crash between the result commit and the keysMv
        // merge heals here with the exact commit-time set (keysMv's own
        // epoch guard makes the re-merge idempotent)
        resultMv.merge(spark.read.parquet(epochDir.toString), batchId)
        val kd = epochDir.resolve("_keys_delta")
        if (Files.exists(kd)) {
          keysMv.merge(spark.read.parquet(kd.toString), batchId)
          val hn = epochDir.resolve("_dynset_hasnull")
          if (Files.exists(hn))
            setHasNull(new String(Files.readAllBytes(hn)).trim == "1")
        }
        return
      }
    }
    val kAttr = col(attrCol)
    val hadNull = hasNullFlag
    // The base store is bucketed by hash(attrCol) and Spark's hash() is
    // TYPE-sensitive: a type-coerced subquery key (e.g. a BIGINT
    // count() against an INT left column — the analyzer casts the left
    // side, and the chain classifier strips that Cast) would hash into
    // the wrong buckets and a set-move repair would silently miss
    // stored rows. Narrow every key frame handed to readTouched to the
    // LEFT column's type; a key that does not survive the round-trip
    // (out of range / truncating) can match no stored row under SQL
    // coercion — both sides widen to the common type — so dropping it
    // is exact, and the semi-join after readTouched re-checks equality
    // so a wrapped cast can never create a false flip. (advice r9)
    val lhsType = lhsDelta.schema(attrCol).dataType
    def toBaseType(keys: DataFrame): DataFrame = {
      val kt = keys.schema.head.dataType
      if (kt == lhsType) keys
      else {
        // try_cast, not cast: ANSI mode throws on narrowing overflow,
        // and an out-of-range key is exactly the "matches nothing" case
        val narrowed = kAttr.try_cast(lhsType)
        keys.where(kAttr.isNull || (narrowed.cast(kt) <=> kAttr))
          .select(narrowed.as(attrCol))
      }
    }
    val newKeys = newKeys0.map(_.select(kAttr).localCheckpoint())
    val newHasNull = newKeys.map(k => !k.where(kAttr.isNull).isEmpty)
      .getOrElse(hadNull)
    val cleanNew = newKeys.map(_.where(kAttr.isNotNull).distinct())
    val kShape = cleanNew.getOrElse(lhsDelta.select(kAttr))
    val kStore = orEmpty(keysMv.read(), kShape).select(kAttr)
    val testKeys = cleanNew.getOrElse(kStore)
    // the NOT IN ∅ rule needs emptiness of the effective set (no keys,
    // no null) — two tiny jobs over the key set, negated mode only
    lazy val oldEmpty = !hadNull && kStore.isEmpty
    lazy val newEmpty =
      !newHasNull && cleanNew.map(_.isEmpty).getOrElse(kStore.isEmpty)

    // 1. delta rows: deletes always propagate; adds re-test membership
    //    under the epoch's effective set. NULL-key adds qualify only
    //    under NOT IN with an empty effective set.
    val hasOps = lhsDelta.columns.contains(Changelog.OpCol)
    val d = if (hasOps) lhsDelta else Changelog.ofInserts(lhsDelta)
    val dels = d.where(!Changelog.isAdd(col(Changelog.OpCol)))
    val adds0 = d.where(Changelog.isAdd(col(Changelog.OpCol)) && kAttr.isNotNull)
    val adds =
      if (!negated) adds0.join(testKeys, Seq(attrCol), "left_semi")
      else {
        val nn =
          if (newHasNull) adds0.where(lit(false))
          else adds0.join(testKeys, Seq(attrCol), "left_anti")
        val nulls = d.where(Changelog.isAdd(col(Changelog.OpCol)) && kAttr.isNull)
        if (newEmpty) nn.unionByName(nulls) else nn
      }

    // 2. set moved: entering/leaving keys flip exactly the stored rows
    //    that reference them. Both flip directions derive from the
    //    POST-merge base (see class doc) and read only the flipped
    //    keys' buckets; the poisoning / emptiness transitions that are
    //    inherently whole-state (retract-all, re-qualify-all) read full.
    val rowShape = d.drop(Changelog.OpCol, Changelog.SeqCol)
    def storedOf(keys: DataFrame): DataFrame = {
      val bk = toBaseType(keys)
      orEmpty(lhsMv.readTouched(bk), rowShape)
        .where(kAttr.isNotNull).join(bk, Seq(attrCol), "left_semi")
    }
    def flagged(df: DataFrame, op: Int) = df
      .withColumn(Changelog.OpCol, lit(op))
      .withColumn(Changelog.SeqCol, lit(Long.MaxValue))
    val keysAndDiff: Option[(DataFrame, DataFrame, Seq[DataFrame])] =
      cleanNew.map { nk =>
      val entering = nk.except(kStore).localCheckpoint()
      val leaving = kStore.except(nk).localCheckpoint()
      lazy val storedAll = orEmpty(lhsMv.read(), rowShape).where(kAttr.isNotNull)
      // all NULL-key base rows live in one bucket: hash(null) prunes
      lazy val storedNulls = {
        val nullKey = spark.range(1)
          .select(lit(null).cast(lhsType).as(attrCol))
        orEmpty(lhsMv.readTouched(nullKey), rowShape).where(kAttr.isNull)
      }
      val none = rowShape.where(lit(false))
      val (ins, del) =
        if (!negated) (storedOf(entering), storedOf(leaving))
        else (hadNull, newHasNull) match {
          case (false, true) => // set gained a NULL: NOT IN is never true;
            // retract everything that qualified under the old set
            (none, storedAll.join(kStore, Seq(attrCol), "left_anti")
              .unionByName(if (oldEmpty) storedNulls else none))
          case (true, false) => // NULL gone: everything outside the set
            // returns (incl. NULL keys when the new set is empty)
            (storedAll.join(nk, Seq(attrCol), "left_anti")
              .unionByName(if (newEmpty) storedNulls else none), none)
          case (_, true) => // still poisoned: nothing qualifies or is stored
            (none, none)
          case (false, false) =>
            val insN = if (newEmpty && !oldEmpty) storedNulls else none
            val delN = if (oldEmpty && !newEmpty) storedNulls else none
            (storedOf(leaving).unionByName(insN),
              storedOf(entering).unionByName(delN))
        }
      val diff =
        flagged(ins, Changelog.Insert).unionByName(flagged(del, Changelog.Delete))
      val keysDelta = flagged(entering, Changelog.Insert)
        .unionByName(flagged(leaving, Changelog.Delete))
      (keysDelta, diff, Seq(entering, leaving))
    }

    val out = keysAndDiff.fold(adds.unionByName(dels))(kd =>
      adds.unionByName(dels).unionByName(kd._2))
    // the key-set delta and null flag ride INSIDE the result epoch dir:
    // result + membership state publish in one atomic rename
    resultMv.merge(out, batchId,
      sidecar =
        if (batchId >= 0 && keysAndDiff.isDefined)
          Map("_dynset_hasnull" -> (if (newHasNull) "1" else "0"))
        else Map.empty,
      sidecarDf =
        if (batchId >= 0) keysAndDiff.map(kd => Map("_keys_delta" -> kd._1))
          .getOrElse(Map.empty)
        else Map.empty)
    keysAndDiff.foreach { case (keysDelta, _, _) =>
      if (batchId >= 0) {
        // merge the COMMITTED bytes — identical on replay, no lineage
        // into the keys store it is about to rewrite
        val kd = Paths.get(resultMv.changelogLocation, s"batch-$batchId")
          .resolve("_keys_delta")
        keysMv.merge(spark.read.parquet(kd.toString), batchId)
      } else keysMv.merge(keysDelta)
      setHasNull(newHasNull)
    }
    (newKeys.toSeq ++ keysAndDiff.toSeq.flatMap(_._3))
      .foreach(_.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ =>
      })
  }

  def read(): DataFrame = resultMv.read()
}
