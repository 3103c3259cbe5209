package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrites the higher-order-function dot-product pattern
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  * into the codegen'd [[DotProduct]] expression — the extension-point
  * analog of the reference's expression rewrite rules
  * (src/frontend/src/optimizer/rule/, e.g. expression simplification).
  *
  * The two formulations differ observably at the edges: the HOF form
  * returns NULL for unequal-length arrays (zip_with null-pads and the
  * null poisons the fold) and for null elements, while DotProduct
  * truncates to the shorter length and skips null elements. So the
  * rewrite fires only when it cannot change results:
  *  - both sides are the SAME expression (the `dot(a, a)` norm pattern —
  *    lengths trivially equal) with provably non-null elements, or
  *  - the session opted in via `spark.graft.rewriteHofDot=true`,
  *    accepting graft's truncate-and-skip-null vector semantics.
  * Everything else keeps the exact HOF semantics; callers wanting the
  * native loop unconditionally use `graft_dot` directly.
  *
  * Matching is deliberately strict: multiply over exactly the two zip
  * lambda variables, fold with Add from a 0.0 seed, identity finish.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  /** Session opt-in: apply the rewrite to every matching HOF pattern. */
  val ConfKey = "spark.graft.rewriteHofDot"

  private def isVars(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(v1) && e2.semanticEquals(v2)) ||
      (e1.semanticEquals(v2) && e2.semanticEquals(v1))

  /** Equal expression on both sides (lengths equal by construction) and
    * element type provably non-null — the cases where HOF and native
    * results are bit-identical.
    */
  private def provablySafe(l: Expression, r: Expression): Boolean =
    l.semanticEquals(r) && (l.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    })

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
          if isVars(m1, m2, x, y) && isVars(a1, a2, acc, v) &&
            finishBody.semanticEquals(f) &&
            (optIn || provablySafe(left, right)) =>
        DotProduct(left, right)
    }
  }
}
