package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** O(Δ) VALUE-STATE evaluation for delta-computable GLOBAL aggregates —
  * the reference's value-state aggregation
  * (reference: docs/dev/src/design/aggregation.md:16-40 distinguishes
  * value state — sum/count folded per barrier — from materialized-input
  * state — min/max re-derived from stored rows). Round 9 ran EVERY
  * chained global aggregate through the materialized-input path, an
  * O(state) base re-scan per epoch even for `SELECT count(*), sum(v)`;
  * this module folds retraction-complete deltas into a handful of exact
  * accumulators instead, making such epochs O(Δ).
  *
  * EXACTNESS CONTRACT: the chain's output must stay byte-equal to a
  * batch recompute (the engine's chain tests diff against exactly
  * that), so only aggregates whose fold is EXACT and order-free
  * qualify:
  *   - count(*) / count(e) [FILTER] — long arithmetic;
  *   - sum(e) over integral types (long wraparound is commutative, so
  *     fold == recompute even at overflow) and DECIMAL (exact add;
  *     a fold that exceeds the sum type's precision aborts to the
  *     materialized-input recompute);
  *   - avg(e) over integral types (exact long sum ÷ count — equal to
  *     Spark's double-accumulated average while the running sum stays
  *     inside 2⁵³, i.e. everywhere the batch result is itself exact).
  * sum/avg over FLOATING-POINT inputs stay on the materialized-input
  * path: an incremental ±fold drifts from the batch fold (catastrophic
  * cancellation under retraction), and the engine's contract is exact
  * equality, not the reference's tolerated drift. DISTINCT aggregates
  * and anything else (min/max/percentile/sketches) are input-dependent
  * and keep the recompute path.
  *
  * Mechanics: the defining query is re-planned over the epoch's insert
  * and delete slices separately (the same retarget-at-a-view trick the
  * recompute path uses), the single global Aggregate's functions are
  * rewritten to their linear state forms (FILTER and null handling
  * folded into an If), and state' = state + Δins − Δdel. The output row
  * is the ORIGINAL plan with each AggregateExpression substituted by
  * its value literal over OneRowRelation — HAVING filters and output
  * projections above the aggregate evaluate unchanged.
  */
object ValueStateAgg {

  /** One accumulator slot per AggregateExpression, in preorder. */
  sealed trait Slot { def width: Int }
  /** count(*) / count(e…) [FILTER]: one long. */
  case object CountSlot extends Slot { val width = 1 }
  /** sum(integral): (sum long — wraparound matches Spark's non-ANSI
    * long sum, nonnull long).
    */
  case object SumLongSlot extends Slot { val width = 2 }
  /** sum(decimal): (exact BigDecimal, nonnull long); `out` is Sum's
    * result type (precision+10) for the literal.
    */
  final case class SumDecimalSlot(out: DecimalType) extends Slot { val width = 2 }
  /** avg(integral): (exact long sum, Σ|v| as exact decimal, nonnull
    * long) → double. Spark's Average over integral accumulates the sum
    * in DOUBLE; the exact-long fold equals that double accumulation
    * only while every partial sum any execution order can produce is
    * exactly representable — guaranteed iff Σ|v| < 2⁵³ (all partial
    * sums are integers bounded by it). Σ|v| is tracked as a decimal
    * (never wraps) and [[outputOf]] aborts to the materialized-input
    * recompute — which reproduces Spark's own drift — once it reaches
    * 2⁵³ (ADVICE r10).
    */
  case object AvgLongSlot extends Slot { val width = 3 }

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  def classify(ae: AggregateExpression): Option[Slot] = {
    if (ae.isDistinct) return None
    ae.aggregateFunction match {
      case _: Count => Some(CountSlot)
      case s: Sum if integral(s.child.dataType) => Some(SumLongSlot)
      case s: Sum => s.dataType match {
        case d: DecimalType if s.child.dataType.isInstanceOf[DecimalType] =>
          Some(SumDecimalSlot(d))
        case _ => None
      }
      case a: Average if integral(a.child.dataType) &&
          a.dataType == DoubleType => Some(AvgLongSlot)
      case _ => None
    }
  }

  /** The single groupless Aggregate of `plan`, or None. */
  def globalAggOf(plan: LogicalPlan): Option[Aggregate] =
    plan.collect { case a: Aggregate => a } match {
      case Seq(a) if a.groupingExpressions.isEmpty => Some(a)
      case _ => None
    }

  /** The single grouped Aggregate of `plan` whose grouping expressions
    * are plain attributes named exactly `groupCols` (set-equal), or
    * None. Plain attrs only: a derived grouping (expressions, session
    * windows — whose gap-merge is NOT per-group linear) must stay on
    * the materialized-input recompute.
    */
  def groupedAggOf(plan: LogicalPlan, groupCols: Seq[String]): Option[Aggregate] =
    plan.collect { case a: Aggregate => a } match {
      case Seq(a) if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(_.isInstanceOf[AttributeReference]) &&
          a.groupingExpressions.map(_.asInstanceOf[AttributeReference].name)
            .toSet == groupCols.toSet &&
          a.groupingExpressions.length == groupCols.length =>
        Some(a)
      case _ => None
    }

  /** Slice-linearity gate (ADVICE r10 high): a plan containing any
    * SubqueryExpression (the subquery re-evaluates per slice — e.g. a
    * self-referencing threshold makes the ±fold non-linear) or any
    * nondeterministic expression must never take the value-state path.
    */
  def planEligible(plan: LogicalPlan): Boolean =
    !plan.exists(_.expressions.exists(e =>
      !e.deterministic || e.exists(_.isInstanceOf[SubqueryExpression])))

  /** AggregateExpressions of `agg` in deterministic preorder. */
  def aggCalls(agg: Aggregate): Seq[AggregateExpression] =
    agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })

  /** Classify every call; None if any is not value-state-able. */
  def slotsOf(agg: Aggregate): Option[Seq[Slot]] = {
    val calls = aggCalls(agg)
    val slots = calls.flatMap(classify)
    if (slots.length == calls.length && calls.nonEmpty) Some(slots) else None
  }

  /** Linear state expressions for one call: null handling and FILTER
    * folded into an If so an empty/non-matching slice contributes 0.
    */
  private def stateExprs(ae: AggregateExpression, slot: Slot): Seq[Expression] = {
    def cond(extra: Seq[Expression]): Expression =
      (ae.filter.toSeq ++ extra).reduceOption(And).getOrElse(Literal(true))
    def sumIf(c: Expression, v: Expression): Expression =
      AggregateExpression(Sum(If(c, v, Literal.default(v.dataType))),
        Complete, isDistinct = false)
    def one(c: Expression): Expression = sumIf(c, Literal(1L))
    slot match {
      case CountSlot =>
        val kids = ae.aggregateFunction.asInstanceOf[Count].children
        Seq(one(cond(kids.filterNot(_.foldable).map(IsNotNull))))
      case SumLongSlot =>
        val e = ae.aggregateFunction.asInstanceOf[Sum].child
        val c = cond(Seq(IsNotNull(e)))
        Seq(sumIf(c, Cast(e, LongType)), one(c))
      case SumDecimalSlot(_) =>
        val e = ae.aggregateFunction.asInstanceOf[Sum].child
        val c = cond(Seq(IsNotNull(e)))
        Seq(sumIf(c, e), one(c))
      case AvgLongSlot =>
        val e = ae.aggregateFunction.asInstanceOf[Average].child
        val c = cond(Seq(IsNotNull(e)))
        // Σ|v| in decimal: exact (never wraps, unlike a long |v| fold —
        // |Long.MinValue| alone exceeds 2⁵³), drives the 2⁵³ exactness
        // guard in outputOf
        Seq(sumIf(c, Cast(e, LongType)),
          sumIf(c, Abs(Cast(e, DecimalType(38, 0)))), one(c))
    }
  }

  /** Evaluate the state aggregation of `plan`'s global Aggregate over
    * its own child (i.e. over whatever slice the plan was replanned
    * against). Returns the accumulator vector, or None when the plan is
    * not value-state-able or the per-epoch shape drifted from `spec`.
    */
  def stateOf(df: DataFrame, spec: Seq[Slot]): Option[Array[Any]] = {
    val plan = df.queryExecution.analyzed
    val agg = globalAggOf(plan).getOrElse(return None)
    val calls = aggCalls(agg)
    val slots = slotsOf(agg).getOrElse(return None)
    if (slots != spec) return None
    val exprs = calls.zip(slots).flatMap { case (ae, s) => stateExprs(ae, s) }
    val named = exprs.zipWithIndex.map { case (e, i) => Alias(e, s"__vs$i")() }
    val row = org.apache.spark.sql.GraftPlans
      .ofRows(df.sparkSession, Aggregate(Nil, named, agg.child))
      .collect().head
    parseRow(row, slots)
  }

  /** None = a decimal slice sum overflowed its 38-digit precision (sum
    * NULL while the nonnull count is positive — Spark's non-ANSI
    * overflow signal, ADVICE r10 medium): folding it as 0 would corrupt
    * the accumulator permanently, so the epoch aborts to the
    * materialized-input recompute instead.
    */
  private def parseRow(row: org.apache.spark.sql.Row, slots: Seq[Slot]): Option[Array[Any]] = {
    val out = Array.newBuilder[Any]
    var i = 0
    def long(): Long = { val v = if (row.isNullAt(i)) 0L else row.getLong(i); i += 1; v }
    def dec(): Option[java.math.BigDecimal] = {
      val v = if (row.isNullAt(i)) None else Some(row.getDecimal(i))
      i += 1
      v
    }
    slots.foreach {
      case CountSlot => out += long()
      case SumLongSlot => out += long(); out += long()
      case AvgLongSlot =>
        val s = long()
        val sumAbs = dec()
        val nn = long()
        if (sumAbs.isEmpty && nn > 0L) return None // Σ|v| overflow
        out += s; out += sumAbs.getOrElse(java.math.BigDecimal.ZERO); out += nn
      case SumDecimalSlot(_) =>
        val v = dec()
        val nn = long()
        if (v.isEmpty && nn > 0L) return None // slice sum overflow
        out += v.getOrElse(java.math.BigDecimal.ZERO); out += nn
    }
    Some(out.result())
  }

  /** 2⁵³ — the integer range where double accumulation of longs is
    * provably exact (see [[AvgLongSlot]]).
    */
  private val AvgExactBound = java.math.BigDecimal.valueOf(1L << 53)

  /** state + ins − del, element-wise; exact (long wraparound / decimal). */
  def fold(state: Array[Any], ins: Array[Any], del: Array[Any]): Array[Any] =
    state.indices.map { i =>
      (state(i), ins(i), del(i)) match {
        case (s: java.math.BigDecimal, a: java.math.BigDecimal, d: java.math.BigDecimal) =>
          s.add(a).subtract(d)
        case (s, a, d) =>
          s.asInstanceOf[Long] + a.asInstanceOf[Long] - d.asInstanceOf[Long]
      }
    }.toArray

  /** The output DataFrame: the ORIGINAL plan with its global Aggregate
    * replaced by a literal projection of the folded state over one row —
    * HAVING filters / output projections above it evaluate unchanged.
    * None when a decimal sum outgrew its result precision (abort to the
    * materialized-input recompute).
    */
  def outputOf(df: DataFrame, spec: Seq[Slot],
      state: Array[Any]): Option[DataFrame] = {
    val plan = df.queryExecution.analyzed
    val agg = globalAggOf(plan).getOrElse(return None)
    if (slotsOf(agg) != Some(spec)) return None
    // literal per call, consumed in the same preorder as aggCalls
    var cell = 0
    def takeLong(): Long = { val v = state(cell).asInstanceOf[Long]; cell += 1; v }
    val lits: Seq[Literal] =
      try spec.map {
        case CountSlot => Literal(takeLong(), LongType)
        case SumLongSlot =>
          val (s, nn) = (takeLong(), takeLong())
          if (nn == 0L) Literal(null, LongType) else Literal(s, LongType)
        case SumDecimalSlot(out) =>
          val bd = state(cell).asInstanceOf[java.math.BigDecimal]; cell += 1
          val nn = takeLong()
          if (nn == 0L) Literal(null, out)
          else {
            val d = org.apache.spark.sql.types.Decimal(BigDecimal(bd))
            if (!d.changePrecision(out.precision, out.scale)) return None
            Literal(d, out)
          }
        case AvgLongSlot =>
          val s = takeLong()
          val sumAbs = state(cell).asInstanceOf[java.math.BigDecimal]; cell += 1
          val nn = takeLong()
          // Spark's Average(integral) accumulates the sum in DOUBLE;
          // exact-long ÷ count equals it only while Σ|v| < 2⁵³ (every
          // partial sum any order produces is then an exactly
          // representable integer). Past that, abort to the recompute,
          // which reproduces Spark's own accumulation (ADVICE r10).
          if (sumAbs.compareTo(AvgExactBound) >= 0) return None
          if (nn == 0L) Literal(null, DoubleType)
          else Literal(s.toDouble / nn.toDouble, DoubleType)
      } catch { case _: ClassCastException => return None }
    val it = lits.iterator
    val subbed = agg.aggregateExpressions.map(_.transformDown {
      case _: AggregateExpression => it.next()
    }.asInstanceOf[NamedExpression])
    if (it.hasNext) return None
    val replaced = plan.transform {
      case a: Aggregate if a.fastEquals(agg) =>
        Project(subbed, OneRowRelation())
    }
    Some(org.apache.spark.sql.GraftPlans.ofRows(df.sparkSession, replaced))
  }

  /** Durable rendering: one line per accumulator cell, type-tagged. */
  def render(state: Array[Any]): String =
    "v1\n" + state.map {
      case l: Long => s"L:$l"
      case d: java.math.BigDecimal => s"D:${d.toPlainString}"
    }.mkString("\n")

  def parse(s: String): Option[Array[Any]] = {
    val lines = s.split("\n").toSeq
    if (lines.headOption != Some("v1")) return None
    val cells = lines.tail.map { l =>
      if (l.startsWith("L:")) l.stripPrefix("L:").toLong: Any
      else if (l.startsWith("D:")) new java.math.BigDecimal(l.stripPrefix("D:")): Any
      else return None
    }
    Some(cells.toArray)
  }

  /** Expected cell count of a spec (consistency check on recovery). */
  def cells(spec: Seq[Slot]): Int = spec.map(_.width).sum

  // ------------------------------------------------ grouped value state
  // (r11, VERDICT r10 #1): the same exact ±fold, per group. State is a
  // group-key → accumulator-cells map (plus one input-row count per
  // group, which drives group deletion), committed through the same
  // `_aggstate` epoch sidecar as the global path. A steady epoch reads
  // O(Δ) delta records + O(g) old aggregate rows — never the touched
  // groups' base row sets (the r10 touched-group recompute re-read
  // every touched group's full input).

  /** Group-key types with an exact text round-trip for the sidecar
    * rendering — anything else keeps the recompute path. Internal
    * representations: Boolean/Byte/Short/Int/Long primitives, Int days
    * (date), Long micros (timestamp), UTF8String, Decimal.
    */
  def keyRenderable(t: DataType): Boolean = t match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private def keyMatches(dt: DataType, v: Any): Boolean = v match {
    case null => true
    case _: java.lang.Boolean => dt == BooleanType
    case _: java.lang.Byte => dt == ByteType
    case _: java.lang.Short => dt == ShortType
    case _: java.lang.Integer => dt == IntegerType || dt == DateType
    case _: java.lang.Long =>
      dt == LongType || dt == TimestampType || dt == TimestampNTZType
    case _: UTF8String => dt == StringType
    case _: Decimal => dt.isInstanceOf[DecimalType]
    case _ => false
  }

  /** Normalize parsed key values to the attribute's exact internal form
    * (decimal precision/scale); None when a value cannot fit.
    */
  private def normalizeKey(groups: Seq[AttributeReference],
      key: Seq[Any]): Option[Seq[Any]] = {
    if (key.length != groups.length ||
        !groups.zip(key).forall { case (g, v) => keyMatches(g.dataType, v) })
      return None
    Some(groups.zip(key).map {
      case (g, d: Decimal) =>
        val dt = g.dataType.asInstanceOf[DecimalType]
        val c = d.clone()
        if (!c.changePrecision(dt.precision, dt.scale)) return None
        c
      case (_, v) => v
    })
  }

  /** The per-group state aggregation of `plan`'s grouped Aggregate over
    * its own child: group key (internal values, grouping order) →
    * slot cells :+ input-row count. None when the plan is not
    * value-state-able, the shape drifted from `spec`, or a slice sum
    * overflowed (see [[parseRow]]).
    */
  def groupedStateOf(df: DataFrame, spec: Seq[Slot], groupCols: Seq[String])
      : Option[Map[Seq[Any], Array[Any]]] = {
    val plan = df.queryExecution.analyzed
    val agg = groupedAggOf(plan, groupCols).getOrElse(return None)
    val calls = aggCalls(agg)
    val slots = slotsOf(agg).getOrElse(return None)
    if (slots != spec) return None
    val groups = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    if (!groups.forall(g => keyRenderable(g.dataType))) return None
    val exprs = calls.zip(slots).flatMap { case (ae, s) => stateExprs(ae, s) } :+
      AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false)
    val cellTypes = exprs.map(_.dataType)
    val named = exprs.zipWithIndex.map { case (e, i) => Alias(e, s"__vs$i")() }
    val out = org.apache.spark.sql.GraftPlans.ofRows(df.sparkSession,
      Aggregate(groups, (groups: Seq[NamedExpression]) ++ named, agg.child))
    val rows = out.queryExecution.executedPlan.executeCollect()
    val builder = Map.newBuilder[Seq[Any], Array[Any]]
    rows.foreach { row =>
      val key = groups.indices.map { j =>
        if (row.isNullAt(j)) null else row.get(j, groups(j).dataType)
      }
      val cells = parseInternalCells(row, groups.length, slots, cellTypes)
        .getOrElse(return None)
      builder += key -> cells
    }
    Some(builder.result())
  }

  /** [[parseRow]] for internal rows at `offset`, plus the trailing
    * input-row count cell. Same abort contract.
    */
  private def parseInternalCells(row: InternalRow, offset: Int,
      slots: Seq[Slot], cellTypes: Seq[DataType]): Option[Array[Any]] = {
    val out = Array.newBuilder[Any]
    var i = offset
    def longAt(): Long =
      { val v = if (row.isNullAt(i)) 0L else row.getLong(i); i += 1; v }
    def decAt(): Option[java.math.BigDecimal] = {
      val dt = cellTypes(i - offset).asInstanceOf[DecimalType]
      val v =
        if (row.isNullAt(i)) None
        else Some(row.getDecimal(i, dt.precision, dt.scale).toJavaBigDecimal)
      i += 1
      v
    }
    slots.foreach {
      case CountSlot => out += longAt()
      case SumLongSlot => out += longAt(); out += longAt()
      case AvgLongSlot =>
        val s = longAt()
        val sumAbs = decAt()
        val nn = longAt()
        if (sumAbs.isEmpty && nn > 0L) return None // Σ|v| overflow
        out += s; out += sumAbs.getOrElse(java.math.BigDecimal.ZERO); out += nn
      case SumDecimalSlot(_) =>
        val v = decAt()
        val nn = longAt()
        if (v.isEmpty && nn > 0L) return None // slice sum overflow
        out += v.getOrElse(java.math.BigDecimal.ZERO); out += nn
    }
    out += longAt() // input-row count
    Some(out.result())
  }

  /** Zero accumulator (slot cells :+ row count) — the identity of
    * [[fold]].
    */
  def zeroCells(spec: Seq[Slot]): Array[Any] =
    (spec.flatMap {
      case CountSlot => Seq(0L)
      case SumLongSlot => Seq(0L, 0L)
      case AvgLongSlot => Seq(0L, java.math.BigDecimal.ZERO, 0L)
      case SumDecimalSlot(_) => Seq(java.math.BigDecimal.ZERO, 0L)
    } :+ 0L).toArray

  /** state + ins − del per group; a group whose input-row count reaches
    * zero is dropped (deleted group). None when any count goes negative
    * — a retraction-incomplete feed this path must not trust.
    */
  def foldGrouped(state: Map[Seq[Any], Array[Any]],
      ins: Map[Seq[Any], Array[Any]], del: Map[Seq[Any], Array[Any]],
      spec: Seq[Slot]): Option[Map[Seq[Any], Array[Any]]] = {
    val zero = zeroCells(spec)
    var out = state
    (ins.keySet ++ del.keySet).foreach { k =>
      val cells = fold(out.getOrElse(k, zeroCells(spec)),
        ins.getOrElse(k, zero), del.getOrElse(k, zero))
      val rowCount = cells.last.asInstanceOf[Long]
      if (rowCount < 0L) return None
      out = if (rowCount == 0L) out - k else out.updated(k, cells)
    }
    Some(out)
  }

  /** Output rows for the `live` touched groups: the ORIGINAL plan with
    * its grouped Aggregate replaced by a Project over a LocalRelation
    * of (group keys, rendered aggregate values) — HAVING filters and
    * projections above evaluate unchanged, restricted to exactly the
    * touched groups. None aborts to the recompute (decimal overflow /
    * avg past the exact range / shape drift).
    */
  def groupedOutputOf(df: DataFrame, spec: Seq[Slot], groupCols: Seq[String],
      live: Seq[(Seq[Any], Array[Any])]): Option[DataFrame] = {
    val plan = df.queryExecution.analyzed
    val agg = groupedAggOf(plan, groupCols).getOrElse(return None)
    if (slotsOf(agg) != Some(spec)) return None
    val calls = aggCalls(agg)
    val groups = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val outAttrs = calls.zipWithIndex.map { case (ae, i) =>
      AttributeReference(s"__vso$i", ae.dataType,
        nullable = ae.resultAttribute.nullable)()
    }
    val rows: Seq[InternalRow] = live.map { case (key0, cells) =>
      val key = normalizeKey(groups, key0).getOrElse(return None)
      var cell = 0
      def takeLong(): Long =
        { val v = cells(cell).asInstanceOf[Long]; cell += 1; v }
      val outs: Seq[Any] =
        try spec.map {
          case CountSlot => takeLong(): Any
          case SumLongSlot =>
            val (s, nn) = (takeLong(), takeLong())
            if (nn == 0L) null else s
          case SumDecimalSlot(out) =>
            val bd = cells(cell).asInstanceOf[java.math.BigDecimal]; cell += 1
            val nn = takeLong()
            if (nn == 0L) null
            else {
              val d = Decimal(BigDecimal(bd))
              if (!d.changePrecision(out.precision, out.scale)) return None
              d
            }
          case AvgLongSlot =>
            val s = takeLong()
            val sumAbs = cells(cell).asInstanceOf[java.math.BigDecimal]; cell += 1
            val nn = takeLong()
            if (sumAbs.compareTo(AvgExactBound) >= 0) return None
            if (nn == 0L) null else s.toDouble / nn.toDouble
        } catch { case _: ClassCastException => return None }
      new GenericInternalRow((key ++ outs).toArray)
    }
    val it = outAttrs.iterator
    val subbed = agg.aggregateExpressions.map(_.transformDown {
      case _: AggregateExpression => it.next()
    }.asInstanceOf[NamedExpression])
    if (it.hasNext) return None
    val local = LocalRelation(groups ++ outAttrs, rows)
    val replaced = plan.transform {
      case a: Aggregate if a.fastEquals(agg) => Project(subbed, local)
    }
    Some(org.apache.spark.sql.GraftPlans.ofRows(df.sparkSession, replaced))
  }

  /** A one-column-per-group-key frame of `keys` (fresh exprIds — safe to
    * combine with [[groupedOutputOf]]'s plan in one query), for the
    * touched-group pruned reads.
    */
  def keysFrame(df: DataFrame, groupCols: Seq[String],
      keys: Seq[Seq[Any]]): Option[DataFrame] = {
    val agg = groupedAggOf(df.queryExecution.analyzed, groupCols)
      .getOrElse(return None)
    val groups = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val rows: Seq[InternalRow] = keys.map { k0 =>
      val k = normalizeKey(groups, k0).getOrElse(return None)
      new GenericInternalRow(k.toArray)
    }
    Some(org.apache.spark.sql.GraftPlans.ofRows(df.sparkSession,
      LocalRelation(groups.map(_.newInstance()), rows)))
  }

  // ------------------------------ grouped state rendering (sidecar, g1)

  private def renderKeyToken(v: Any): String = v match {
    case null => "N"
    case b: java.lang.Boolean => if (b) "B:1" else "B:0"
    case b: java.lang.Byte => s"Y:$b"
    case s: java.lang.Short => s"H:$s"
    case i: java.lang.Integer => s"I:$i"
    case l: java.lang.Long => s"L:$l"
    case u: UTF8String =>
      "S:" + java.util.Base64.getEncoder.encodeToString(u.getBytes)
    case d: Decimal => s"D:${d.toJavaBigDecimal.toPlainString}"
    case other =>
      throw new IllegalStateException(s"unrenderable group key $other")
  }

  private def parseKeyToken(t: String): Option[Any] =
    if (t == "N") Some(null)
    else if (t.startsWith("B:")) Some(t == "B:1")
    else if (t.startsWith("Y:")) t.stripPrefix("Y:").toByteOption
    else if (t.startsWith("H:")) t.stripPrefix("H:").toShortOption
    else if (t.startsWith("I:")) t.stripPrefix("I:").toIntOption
    else if (t.startsWith("L:")) t.stripPrefix("L:").toLongOption
    else if (t.startsWith("S:"))
      scala.util.Try(UTF8String.fromBytes(
        java.util.Base64.getDecoder.decode(t.stripPrefix("S:")))).toOption
    else if (t.startsWith("D:"))
      scala.util.Try(Decimal(
        new java.math.BigDecimal(t.stripPrefix("D:")))).toOption
    else None

  private def renderCellToken(v: Any): String = v match {
    case l: java.lang.Long => s"L:$l"
    case d: java.math.BigDecimal => s"D:${d.toPlainString}"
    case other =>
      throw new IllegalStateException(s"unrenderable state cell $other")
  }

  private def parseCellToken(t: String): Option[Any] =
    if (t.startsWith("L:")) t.stripPrefix("L:").toLongOption
    else if (t.startsWith("D:"))
      scala.util.Try(
        new java.math.BigDecimal(t.stripPrefix("D:")): Any).toOption
    else None

  /** Durable rendering of grouped state: header `g1`, one line per
    * group — tab-separated key tokens, `|`, tab-separated cell tokens
    * (base64 for strings: tab/`|`-free). Lines sorted for determinism.
    */
  def renderGrouped(state: Map[Seq[Any], Array[Any]]): String =
    "g1\n" + state.toSeq.map { case (k, cells) =>
      k.map(renderKeyToken).mkString("\t") + "|" +
        cells.map(renderCellToken).mkString("\t")
    }.sorted.mkString("\n")

  def parseGrouped(s: String, spec: Seq[Slot])
      : Option[Map[Seq[Any], Array[Any]]] = {
    val lines = s.split("\n", -1).toSeq
    if (lines.headOption != Some("g1")) return None
    val want = cells(spec) + 1
    val builder = Map.newBuilder[Seq[Any], Array[Any]]
    lines.tail.filter(_.nonEmpty).foreach { line =>
      val cut = line.indexOf('|')
      if (cut < 0) return None
      val key = line.substring(0, cut).split("\t", -1).toSeq
        .map(t => parseKeyToken(t).getOrElse(return None))
      val cs = line.substring(cut + 1).split("\t", -1).toSeq
        .map(t => parseCellToken(t).getOrElse(return None))
      if (cs.length != want) return None
      builder += key -> cs.toArray
    }
    Some(builder.result())
  }
}
