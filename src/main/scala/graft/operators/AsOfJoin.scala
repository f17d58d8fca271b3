package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time as-of join: for each left row, attach the most recent
  * right row with `right.ts <= left.ts` within the same key — the
  * batch equivalent of the reference's temporal-table join
  * (`FOR SYSTEM_TIME AS OF o.rowtime`, TableSQLFunc.scala:1462-1530;
  * temporal table function join TableSQLFunc.scala:1223-1341).
  *
  * Scale design: a naive range join (`l.key = r.key AND r.ts <= l.ts`
  * + max) explodes quadratically per key. Instead we union-tag both
  * sides and take ONE shuffle on the key plus a per-partition sort:
  *
  *   union(right[side=0], left[side=1])
  *     → window PARTITION BY key ORDER BY (ts, side, seq)
  *     → last(value) IGNORE NULLS over rows unbounded..current
  *     → keep side=1 rows
  *
  * Right rows sort before left rows at equal ts, so the match is
  * inclusive (`right.ts <= left.ts`), matching DuckDB's ASOF JOIN.
  * Cost is O(n log n) per key group — the classic sort-merge as-of —
  * and the plan is a single Exchange + Sort + Window, which survives
  * a 100× scale-up (state is one running value per key, not a buffer).
  */
object AsOfJoin {

  /** @param leftTs/rightTs event-time columns (same type)
    * @param valueCols right-side columns to attach (null when no match,
    *                  i.e. left-outer as-of semantics)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           valueCols: Seq[String], tieBreak: Column): DataFrame = {
    val leftCols = left.columns.toSeq
    val ts = "__asof_ts"
    val side = "__asof_side"
    val l = left.withColumn(ts, col(leftTs)).withColumn(side, lit(1))
      .select((keys ++ Seq(ts, side)).map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.withColumn(ts, col(rightTs)).withColumn(side, lit(0))
      .select((keys ++ Seq(ts, side)).map(col) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side), tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c + "__asof", last(col(c), ignoreNulls = true).over(w))
    }
    attached.filter(col(side) === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(c + "__asof").as(c)): _*)
  }

  /** Same semantics via the custom physical operator
    * (graft.plans.AsOfJoinPlan/Exec, planned by AsOfJoinStrategy from
    * SparkSessionExtensions): a direct per-partition forward merge —
    * no union, no window column, O(|L|+|R|) per partition with one
    * row of state. Requires a session built with GraftExtensions. */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 valueCols: Seq[String],
                 toleranceMs: Long = -1L): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side so its attribute ids are fresh: when both
    // inputs derive from the same scan they share exprIds, and the
    // analyzer's DeduplicateRelations would re-id the child WITHOUT
    // being able to remap this custom node's key/ts fields.
    val rPlan = right.select(right.columns.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output}"))
    org.apache.spark.sql.GraftBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, leftTs), attr(rPlan, rightTs),
        valueCols.map(attr(rPlan, _)),
        if (toleranceMs < 0) -1L else toleranceMs * 1000L))
  }
}
