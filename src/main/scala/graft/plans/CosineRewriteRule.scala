package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.CosineSimilarity

/** Optimizer rule: rewrite the portable higher-order-function cosine
  * pattern into graft's fused native [[CosineSimilarity]] expression.
  *
  * A user writing engine-portable SQL/DataFrame code expresses cosine
  * similarity as three array folds:
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (s, v) -> s + v)
  *     / ( sqrt(aggregate(zip_with(a, a, ...), 0.0, ...))
  *       * sqrt(aggregate(zip_with(b, b, ...), 0.0, ...)) )
  * }}}
  *
  * That shape walks both arrays three times through interpreted lambda
  * dispatch. The native expression computes all three accumulators in ONE
  * codegen'd loop — measured 12× on the embedding-dedup join — and sums
  * in the same index order, so the rewrite is bit-identical, not just
  * approximately equal: both sides produce dot/(√na·√nb) with
  * left-to-right element accumulation in double precision.
  *
  * Restricted to `array<double>` inputs: on float arrays the HOF lambda
  * multiplies in FLOAT precision while the native kernel widens each
  * element to double first, and a rewrite must never change results.
  *
  * Registered cluster-wide via `graft.functions.GraftExtensions`
  * (`injectOptimizerRule`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object CosineRewriteRule extends Rule[LogicalPlan] {

  /** aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (s,v) -> s+v) with an
    * identity finish lambda → (a, b). */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mul: Multiply, mArgs, _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add, aArgs, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fArg: NamedLambdaVariable), _))
          if zero == 0.0 &&
            fin.exprId == fArg.exprId &&
            isArgPair(mul.left, mul.right, mArgs) &&
            isArgPair(add.left, add.right, aArgs) =>
        Some((a, b))
      case _ => None
    }

    /** The lambda body must combine exactly the lambda's own two
      * variables (in either order — multiplication and addition
      * commute over the same element pair). */
    private def isArgPair(l: Expression, r: Expression, args: Seq[NamedExpression]): Boolean =
      (l, r, args) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable,
            Seq(a0: NamedLambdaVariable, a1: NamedLambdaVariable)) =>
          Set(lv.exprId, rv.exprId) == Set(a0.exprId, a1.exprId)
        case _ => false
      }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Pattern-pruned walk (the round-13 GraftSqlDml lesson: an injected
    * rule runs on EVERY query in the session, so an unconditional
    * transform taxes exactly the largest plans). Any rewritable shape
    * contains an [[ArrayAggregate]] — a higher-order function — so
    * subtrees without HIGH_ORDER_FUNCTION bits are skipped wholesale. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case d: Divide =>
        (d.left, d.right) match {
          case (HofDot(a, b), m: Multiply) =>
            (m.left, m.right) match {
              case (Sqrt(HofDot(a1, a2)), Sqrt(HofDot(b1, b2)))
                  if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
                    a.semanticEquals(a1) && b.semanticEquals(b1) &&
                    isDoubleArray(a) && isDoubleArray(b) =>
                CosineSimilarity(a, b)
              case _ => d
            }
          case _ => d
        }
    }
}
