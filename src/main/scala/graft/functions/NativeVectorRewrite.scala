package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: recognize the declarative higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * and rewrite it to the native [[DotProduct]] loop. Users keep writing
  * plain `functions.aggregate`/`zip_with` math; plans silently get the
  * codegen'd implementation (HOF lambdas evaluate interpreted per
  * element — ~50µs/pair inside LSH joins).
  *
  * Semantics-preserving bit-for-bit: the native loop is the same left
  * fold (0.0 + t₁ ≡ t₁ exactly), and [[DotProduct]] mirrors the HOF
  * form's null contract — NULL on null array, length mismatch, or null
  * element — so the rewrite is safe on ragged/nullable arrays, not just
  * the well-formed fixed-dim case. Only the exact shape is rewritten —
  * any other seed, lambda body, or ordering is left untouched.
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`.
  */
object NativeVectorRewrite extends Rule[LogicalPlan] {

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(x2, y2), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), Seq(acc2, v2), _),
            finish)
          if x.exprId == x2.asInstanceOf[NamedLambdaVariable].exprId &&
            y.exprId == y2.asInstanceOf[NamedLambdaVariable].exprId &&
            acc.exprId == acc2.asInstanceOf[NamedLambdaVariable].exprId &&
            v.exprId == v2.asInstanceOf[NamedLambdaVariable].exprId &&
            isIdentity(finish) =>
        Some((a, b))
      case _ => None
    }

    private def isIdentity(l: Expression): Boolean = l match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) if (a.dataType match {
            case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
            case _ => false
          }) =>
        DotProduct(a, b)
    }
}
