package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule (SURVEY §7.3 tier: custom Rule[LogicalPlan]
  * via SparkSessionExtensions): rewrite
  *
  *   size(filter(arr, λ)) > 0    =>  exists(arr, λ)
  *   size(filter(arr, λ)) = 0    =>  NOT exists(arr, λ)
  *
  * `filter` materializes the whole filtered array and `size` counts
  * it; `exists` short-circuits on the first hit and allocates nothing.
  * On wide text rows (token arrays of ~100 elements scanned per
  * document at 100 TB) that's the difference between O(len) allocation
  * per row and an early-exit scan. Semantics are identical for the
  * non-null three-valued-logic case these queries produce (filter
  * preserves order and nullness; size of a non-null array is its
  * length).
  */
object ExistsRewriteRule extends Rule[LogicalPlan] {
  private def isZero(l: Literal): Boolean =
    l.dataType == IntegerType && l.value == 0

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThan(Size(ArrayFilter(arr, f), _), z: Literal) if isZero(z) =>
        ArrayExists(arr, f)
      case LessThan(z: Literal, Size(ArrayFilter(arr, f), _)) if isZero(z) =>
        ArrayExists(arr, f)
      case EqualTo(Size(ArrayFilter(arr, f), _), z: Literal) if isZero(z) =>
        Not(ArrayExists(arr, f))
      case EqualTo(z: Literal, Size(ArrayFilter(arr, f), _)) if isZero(z) =>
        Not(ArrayExists(arr, f))
    }
}
