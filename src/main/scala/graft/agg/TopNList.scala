package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Table-aggregate emitting the top-N values per group as a list —
  * the reference's Top2 TableAggregateFunction generalized
  * (TabApiTest.scala Top2 emitValue; SURVEY §7.3 "top-N-list").
  *
  * The buffer keeps only N elements, so partial aggregation is
  * map-side bounded: each partition contributes at most N values to
  * the shuffle regardless of group size — the property that makes a
  * per-key top-N safe at 100 TB (contrast with collect_list + slice,
  * whose buffer is O(group)). */
case class TopAcc(xs: Seq[Double])

class TopNList(n: Int) extends Aggregator[java.lang.Double, TopAcc, Seq[Double]] {
  // boxed IN: a primitive input schema reads NULL cells as 0.0 — a
  // phantom 0.0 entry in the top-N; nullable input lets reduce skip
  def zero: TopAcc = TopAcc(Vector.empty)
  def reduce(b: TopAcc, a: java.lang.Double): TopAcc =
    if (a == null) b // SQL aggregates skip NULL inputs
    else TopAcc((a.doubleValue +: b.xs).sortBy(-_).take(n))
  def merge(a: TopAcc, b: TopAcc): TopAcc =
    TopAcc((a.xs ++ b.xs).sortBy(-_).take(n))
  def finish(r: TopAcc): Seq[Double] = r.xs
  def bufferEncoder: Encoder[TopAcc] = Encoders.product[TopAcc]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
        scala.reflect.classTag[Seq[Double]],
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveDoubleEncoder,
        containsNull = false, lenientSerialization = false))
}

object Top3List extends TopNList(3)
