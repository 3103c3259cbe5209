package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incrementally-maintained inner equi-join of two streaming MVs — the
  * reference's delta join (reference: src/stream/src/executor/join/,
  * docs/dev/src/design/delta-join.md): Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB.
  *
  * Both upstream changelogs feed ONE maintenance stream (side-tagged,
  * side-prefixed columns, unioned) — the reference's barrier-aligned
  * two-input executor. A single stream means a single epoch sequence on
  * the downstream changelog, so further MVs can chain off the join, and
  * a single writer, so epochs never race each other into the same
  * stage directory.
  *
  * Additions join each side's delta against the OTHER side's current
  * storage (under both read locks — one bucketed join per epoch,
  * O(delta × matched buckets), never O(A×B)); a pair born from both
  * deltas in one epoch is produced by both terms and merges
  * idempotently (PK last-write-wins). Retractions do NOT join against
  * the other side: a concurrent delete of both halves of a pair would
  * find no partner and orphan the row forever. They look up the
  * DOWNSTREAM MV's own storage by the deleting side's PK — the
  * downstream rows witness exactly which pairs existed (the role the
  * reference's arrangement state plays). The downstream PK must be
  * leftPK ∪ rightPK so every joined row is addressable from either
  * side.
  */
final class IncrementalJoin(
    leftMv: MaterializedView,
    rightMv: MaterializedView,
    downMv: MaterializedView,
    leftPk: Seq[String],
    rightPk: Seq[String],
    // (leftRows, rightRows) => the defining query over those slices
    recompute: (DataFrame, DataFrame) => DataFrame,
    // "inner" | "left" | "right" | "full". A preserved side's unmatched
    // rows live downstream null-extended (null other-side PK); deltas
    // on the opposite side additionally repair the preserved rows whose
    // match-set changed (gaining a first match retracts the
    // null-extension; losing the last one restores it). FULL OUTER
    // preserves both sides — both repairs run.
    joinType: String = "inner") {

  private val preserveL = joinType == "left" || joinType == "full"
  private val preserveR = joinType == "right" || joinType == "full"

  import IncrementalJoin.{LPrefix, RPrefix, SideCol}

  private def nullSafeSemi(left: DataFrame, keys: DataFrame,
      on: Seq[String]): DataFrame = {
    val k = broadcast(keys).as("__k")
    val l = left.as("__l")
    l.join(k, on.map(c => l(c) <=> k(c)).reduce(_ && _), "left_semi")
  }

  /** Latest surviving add per side-PK (an epoch may carry several
    * changes to one upstream row; only the final image joins).
    */
  private def latestAdds(delta: DataFrame, sidePk: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sidePk.map(col): _*)
      .orderBy(col(Changelog.SeqCol).desc)
    delta.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && Changelog.isAdd(col(Changelog.OpCol)))
      .drop("__rn", Changelog.OpCol, Changelog.SeqCol)
  }

  private def removedKeys(delta: DataFrame, sidePk: Seq[String]): DataFrame =
    delta.where(!Changelog.isAdd(col(Changelog.OpCol)))
      .select(sidePk.map(col): _*).distinct()

  /** Apply one epoch of the SIDE-TAGGED union stream (rows from either
    * or both upstream changelogs).
    */
  def applyDelta(batch0: DataFrame, batchId: Long): Unit = {
    // re-bind to the ENGINE session: foreachBatch hands a DataFrame on
    // the stream's cloned session, and the recompute registers temp
    // views the engine session's sql() must resolve
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
    val addsL = latestAdds(l, leftPk)
    val addsR = latestAdds(r, rightPk)
    val remL = removedKeys(l, leftPk)
    val remR = removedKeys(r, rightPk)
    // a fully-emptied MV store reads as a ZERO-COLUMN frame — substitute
    // a schema-correct empty slice (derived from this batch) so the
    // recompute still resolves; an inner join against it is just empty
    def storeOr(mv: MaterializedView, shape: DataFrame): DataFrame = {
      val d = mv.read()
      if (d.columns.nonEmpty) d else shape.where(lit(false))
    }
    leftMv.withReadLock { rightMv.withReadLock {
      val rStore = storeOr(rightMv, addsR)
      val lStore = storeOr(leftMv, addsL)
      def notNull(pk: Seq[String]) = pk.map(col(_).isNotNull).reduce(_ && _)
      // ΔA⟗B and A⟗ΔB through the ORIGINAL query. When the OTHER side
      // is preserved, running the query with its full storage and only
      // this side's delta fabricates null-extensions for every
      // unmatched preserved row — keep only the rows this delta
      // actually owns (the repair pass owns null-extension maintenance)
      val rawL = recompute(addsL, rStore)
      val rawR = recompute(lStore, addsR)
      val addedL = if (preserveR) rawL.where(notNull(leftPk)) else rawL
      val addedR = if (preserveL) rawR.where(notNull(rightPk)) else rawR
      val added = addedL.unionByName(addedR)
        .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
        .withColumn(Changelog.SeqCol, lit(1L))
      // pin the retraction rows eagerly under the downstream's read
      // lock, then release it BEFORE merge (a read→write upgrade on the
      // same lock would deadlock); kept split per side so the outer
      // repair can harvest which preserved keys lost matches
      val (goneL, goneR) = downMv.withReadLock {
        // per-side lookups: left keys bucket-prune (the MV is bucketed
        // by leftPK); right keys lack the bucket columns and correctly
        // fall back to a full downstream read inside readTouched
        val storedL = downMv.readTouched(remL)
        val storedR = downMv.readTouched(remR)
        def shaped(df: DataFrame) = df
          .withColumn(Changelog.OpCol, lit(Changelog.Delete))
          .withColumn(Changelog.SeqCol, lit(0L))
          .localCheckpoint()
        if (storedL.columns.isEmpty) {
          val none = shaped(
            added.where(lit(false)).drop(Changelog.OpCol, Changelog.SeqCol))
          (none, none)
        } else (shaped(nullSafeSemi(storedL, remL, leftPk)),
          shaped(nullSafeSemi(storedR, remR, rightPk)))
      }
      // outer repair: preserved-side keys whose match-set changed (the
      // other side added or removed partners) get their truth
      // regenerated — the null-extension row is retracted
      // unconditionally (no-op when absent) and the query re-run over
      // just those preserved rows re-emits pairs or the null-extension.
      // For FULL OUTER both repairs run; the re-run output is filtered
      // to rows the repaired side owns (a full-outer re-run fabricates
      // other-side null-extensions for storage it didn't scan).
      def repairSide(leftIsPreserved: Boolean): DataFrame = {
        val (pk, mv, otherAdds, otherGone) =
          if (leftIsPreserved) (leftPk, leftMv, addedR, goneR)
          else (rightPk, rightMv, addedL, goneL)
        val affected = otherAdds.select(pk.map(col): _*)
          .unionByName(otherGone.select(pk.map(col): _*))
          .where(notNull(pk)).distinct()
        if (affected.isEmpty) added.where(lit(false))
        else {
          val rows = nullSafeSemi(mv.readTouched(affected), affected, pk)
          val nullDel = recompute(
              if (leftIsPreserved) rows else lStore.where(lit(false)),
              if (leftIsPreserved) rStore.where(lit(false)) else rows)
            .where(notNull(pk))
            .withColumn(Changelog.OpCol, lit(Changelog.Delete))
            .withColumn(Changelog.SeqCol, lit(0L))
          recompute(
              if (leftIsPreserved) rows else lStore,
              if (leftIsPreserved) rStore else rows)
            .where(notNull(pk))
            .withColumn(Changelog.OpCol, lit(Changelog.UpdateInsert))
            .withColumn(Changelog.SeqCol, lit(2L))
            .unionByName(nullDel)
        }
      }
      val none = added.where(lit(false))
      val repair = (if (preserveL) repairSide(true) else none)
        .unionByName(if (preserveR) repairSide(false) else none)
      downMv.merge(
        added.unionByName(goneL).unionByName(goneR).unionByName(repair),
        batchId)
    } }
  }
}

object IncrementalJoin {
  val SideCol = "__join_side"
  val LPrefix = "__jl__"
  val RPrefix = "__jr__"

  /** The side-tagged union of the two upstream changelog tails — ONE
    * stream, one epoch sequence, no cross-side column collisions.
    */
  def taggedUnion(leftTail: DataFrame, rightTail: DataFrame): DataFrame = {
    def prefixed(df: DataFrame, p: String, tag: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, p + c))
        .withColumn(SideCol, lit(tag))
    prefixed(leftTail, LPrefix, "L")
      .unionByName(prefixed(rightTail, RPrefix, "R"),
        allowMissingColumns = true)
  }
}
