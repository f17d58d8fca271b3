package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join (SURVEY §7.3 tier c: custom LogicalPlan +
  * SparkStrategy + SparkPlan): for every left row, the single most
  * recent right row with `rightTs <= leftTs` within the same key —
  * and, when `toleranceUs >= 0`, only if that row is no older than
  * the tolerance (pandas merge_asof semantics: a staler match yields
  * NULL values, the left row is kept).
  *
  * Built from RESOLVED children (graft.operators.AsOfJoin.asOfNative
  * constructs it post-analysis), so the analyzer passes it through and
  * the optimizer treats it generically (column pruning adds Projects
  * under it via `references`). AsOfJoinStrategy plans it into
  * AsOfJoinExec. */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    toleranceUs: Long = -1L) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      leftKeys ++ rightKeys ++ Seq(leftTs, rightTs) ++ rightValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
