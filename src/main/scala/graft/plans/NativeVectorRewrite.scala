package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrites the higher-order-function dot-product pattern
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  * into the codegen'd [[DotProduct]] expression. Users (or generated SQL)
  * writing the idiomatic HOF formulation get the native loop for free —
  * the extension-point analog of the reference's expression rewrite rules
  * (src/frontend/src/optimizer/rule/, e.g. expression simplification).
  *
  * Matching is deliberately strict: multiply over exactly the two zip
  * lambda variables, fold with Add from a 0.0 seed, identity finish.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private def isVars(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(v1) && e2.semanticEquals(v2)) ||
      (e1.semanticEquals(v2) && e2.semanticEquals(v1))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(a1, a2, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(finishBody, Seq(f: NamedLambdaVariable), _))
          if isVars(m1, m2, x, y) && isVars(a1, a2, acc, v) &&
            finishBody.semanticEquals(f) =>
        DotProduct(left, right)
    }
}
