package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the higher-order-function dot-product pattern
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  * into the codegen'd [[DotProduct]] expression, and (round 10) the
  * squared-distance pattern
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0, +)
  * into [[L2DistanceSq]] — the extension-point analog of the reference's
  * expression rewrite rules (src/frontend/src/optimizer/rule/, e.g.
  * expression simplification). HOFs are CodegenFallback (per-element
  * boxed, interpreted lambdas); the native loops run inside whole-stage
  * codegen — guide §4 "eliminate non-codegen expressions in the hot path".
  *
  * The two formulations differ observably at the edges: the HOF form
  * returns NULL for unequal-length arrays (zip_with null-pads and the
  * null poisons the fold) and for null elements, while the native forms
  * truncate to the shorter length and skip null elements. So the
  * rewrite fires only when it cannot change results:
  *  - both sides are the SAME expression (the `dot(a, a)` norm pattern —
  *    lengths trivially equal) with provably non-null elements, or
  *  - the session opted in via `spark.graft.rewriteHofDot=true`
  *    (explicit opt-in; since round 11 no longer the session default —
  *    VectorFunctions emits the native expressions directly, so only a
  *    user's hand-written HOF SQL is governed by this flag), accepting
  *    graft's truncate-and-skip-null vector semantics.
  * Everything else keeps the exact HOF semantics; callers wanting the
  * native loop unconditionally use `graft_dot` directly.
  *
  * A `transform(v, x -> cast(x as double))` promotion wrapper (the
  * VectorFunctions.toDoubleVec stage) is stripped off native operands:
  * the native loop promotes float→double per element itself (exact), so
  * materializing the promoted copy per row is pure overhead.
  *
  * Matching is deliberately strict: multiply over exactly the two zip
  * lambda variables (or their squared difference), fold with Add from a
  * 0.0 seed, identity finish.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  /** Session opt-in: apply the rewrite to every matching HOF pattern. */
  val ConfKey = "spark.graft.rewriteHofDot"

  private def isVars(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(v1) && e2.semanticEquals(v2)) ||
      (e1.semanticEquals(v2) && e2.semanticEquals(v1))

  /** (x−y)·(x−y) over the two zip variables (either subtraction order —
    * the square makes them IEEE-identical).
    */
  private def isSquaredDiff(m1: Expression, m2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    m1.semanticEquals(m2) && (m1 match {
      case Subtract(a, b, _) => isVars(a, b, v1, v2)
      case _ => false
    })

  /** Equal expression on both sides (lengths equal by construction) and
    * element type provably non-null — the cases where HOF and native
    * results are bit-identical.
    */
  private def provablySafe(l: Expression, r: Expression): Boolean =
    l.semanticEquals(r) && (l.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    })

  /** Strip a pure float/double→double promotion transform: the native
    * loops read float arrays directly with the same per-element
    * promotion. Only exact casts qualify.
    */
  private def stripCastTransform(e: Expression): Expression = e match {
    case ArrayTransform(base,
          LambdaFunction(Cast(v: NamedLambdaVariable, DoubleType, _, _),
            Seq(lv: NamedLambdaVariable), _))
        if v.exprId == lv.exprId && (base.dataType match {
          case ArrayType(FloatType | DoubleType, _) => true
          case _ => false
        }) => base
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val optIn =
      try conf.getConfString(ConfKey, "false").toBoolean
      catch { case _: IllegalArgumentException => false }
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(a1, a2, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(finishBody, Seq(f: NamedLambdaVariable), _))
          if isVars(a1, a2, acc, v) && finishBody.semanticEquals(f) &&
            (isVars(m1, m2, x, y) || isSquaredDiff(m1, m2, x, y)) &&
            (optIn || provablySafe(left, right)) =>
        if (isVars(m1, m2, x, y))
          DotProduct(stripCastTransform(left), stripCastTransform(right))
        else
          L2DistanceSq(stripCastTransform(left), stripCastTransform(right))
    }
  }
}
