package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Engine-side optimizer rule (SURVEY §7.3 path (c) demonstration):
  * `size(filter(arr, λ)) > 0`  -> `exists(arr, λ)` and
  * `size(filter(arr, λ)) = 0`  -> `NOT exists(arr, λ)`.
  *
  * The left form materializes the filtered array and counts it; `exists`
  * short-circuits on the first match — on long inner lists (the jagged
  * data this engine targets) that's an asymptotic win, and it is exactly
  * the kind of nested-expression rewrite Catalyst doesn't do itself.
  *
  * ArrayExists is built with followThreeValuedLogic=false so the rewrite
  * is semantics-preserving when the predicate returns null (filter treats
  * null as drop; 3VL exists would return null instead of false).
  */
object SizeFilterToExists extends Rule[LogicalPlan] {

  private def exists(arr: Expression, f: Expression): Expression =
    ArrayExists(arr, f, followThreeValuedLogic = false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayFilter(arr, f), _), Literal(0, IntegerType)) =>
        exists(arr, f)
      case LessThan(Literal(0, IntegerType), Size(ArrayFilter(arr, f), _)) =>
        exists(arr, f)
      case EqualTo(Size(ArrayFilter(arr, f), _), Literal(0, IntegerType)) =>
        Not(exists(arr, f))
      case EqualTo(Literal(0, IntegerType), Size(ArrayFilter(arr, f), _)) =>
        Not(exists(arr, f))
    }
}
