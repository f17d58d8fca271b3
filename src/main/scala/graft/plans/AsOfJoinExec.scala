package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Physical sort-merge as-of join.
  *
  * Both children are hash-clustered on their keys and sorted by
  * (keys, ts); each partition then runs a single forward merge:
  * the right iterator is consumed at most once, keeping one "value in
  * force" row per current key — O(|L|+|R|) per partition, one copied
  * right row of state, no buffering of either side. This is the plan
  * the reference's temporal join executes on Flink (keyed state +
  * ordered event feed), expressed as a Spark operator.
  *
  * vs. the union+window formulation (operators/AsOfJoin.asOf): same
  * result, but the window variant unions both sides into one sort and
  * materializes a running last-value column; this operator skips the
  * union and the extra column, and never rewrites left rows at all.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightValues: Seq[Attribute],
    toleranceUs: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val rValsB = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val rValProj = UnsafeProjection.create(rValsB, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // value attrs become nullable in the output (left-outer semantics)
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rValsB.map(_.withNullability(true)))
      val nullVals = InternalRow.fromSeq(rValsB.map(_ => null))
      val joiner = new org.apache.spark.sql.catalyst.expressions.JoinedRow

      // buffered right head (copied: iterator rows are reused)
      var rKey: InternalRow = null
      var rTsVal: Long = 0L
      var rVal: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rKey = rKeyProj(r).copy()
          rTsVal = rTsProj(r).getLong(0)
          rVal = rValProj(r).copy()
        } else { rKey = null; rVal = null }
      advanceRight()

      var curKey: InternalRow = null   // key of the in-force value
      var curVal: InternalRow = null   // value in force for curKey
      var curTs: Long = 0L             // its event time (tolerance check)
      val tolB = toleranceUs

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTsVal = lTsProj(l).getLong(0)
        // key changed since last left row -> reset the in-force value
        if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
          curKey = lKey.copy(); curVal = null
        }
        // drop right rows for keys already passed
        while (rKey != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
        // absorb right rows for this key up to the left timestamp
        while (rKey != null && keyOrd.compare(rKey, lKey) == 0 &&
               rTsVal <= lTsVal) {
          curVal = rVal
          curTs = rTsVal
          advanceRight()
        }
        // tolerance: an in-force value staler than the window yields
        // the left-outer NULLs (it can only age further for later
        // left rows of this key, but a NEWER right row may still
        // arrive, so the state itself is kept)
        val inTol = curVal != null &&
          (tolB < 0L || lTsVal - curTs <= tolB)
        outProj(joiner(l, if (inTol) curVal else nullVals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinPlan into AsOfJoinExec (injected via
  * SparkSessionExtensions.injectPlannerStrategy). */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKeys, p.rightKeys, p.leftTs, p.rightTs, p.rightValues,
        p.toleranceUs) :: Nil
    case _ => Nil
  }
}
