package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.types._

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
  /** avg(integral): (exact long sum, nonnull long) → double. */
  case object AvgLongSlot extends Slot { val width = 2 }

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
        Seq(sumIf(c, Cast(e, LongType)), one(c))
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
    Some(parseRow(row, slots))
  }

  private def parseRow(row: org.apache.spark.sql.Row, slots: Seq[Slot]): Array[Any] = {
    val out = Array.newBuilder[Any]
    var i = 0
    def long(): Long = { val v = if (row.isNullAt(i)) 0L else row.getLong(i); i += 1; v }
    slots.foreach {
      case CountSlot => out += long()
      case SumLongSlot | AvgLongSlot => out += long(); out += long()
      case SumDecimalSlot(_) =>
        val v = if (row.isNullAt(i)) java.math.BigDecimal.ZERO
          else row.getDecimal(i)
        i += 1
        out += v; out += long()
    }
    out.result()
  }

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
          val (s, nn) = (takeLong(), takeLong())
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
}
