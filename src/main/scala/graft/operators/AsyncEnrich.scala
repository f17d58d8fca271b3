package graft.operators

import java.sql.Timestamp
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.util.Try
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import graft.streaming.KeyedEvent

case class EnrichedEvent(key: Long, ts: Timestamp, kind: String,
                         value: Double, dim: String)

/** Async-I/O dimension enrichment (DataStreamFunc.scala:1808-1919;
  * flink-prometheus DimAsyncFunction.java:18-70): per-partition
  * pipeline of in-flight async lookups with
  *
  *   - bounded capacity (at most `capacity` requests in flight),
  *   - per-lookup timeout (timed-out rows get the `fallback` value —
  *     the reference's timeout side-channel, surfaced as a value),
  *   - ordered mode (emit in input order, like Flink's
  *     orderedWait) or unordered (emit as completions arrive).
  *
  * Implemented as `mapPartitions` keeping a sliding buffer of
  * Futures: the input iterator is consumed lazily, so memory is
  * O(capacity) regardless of partition size, and every partition
  * drives its own pipeline — the operator scales with partitions,
  * exactly like the async operator it ports. The lookup itself is
  * any `Long => Future[String]` (an HTTP/DB client in production;
  * tests inject a latency-simulating stub).
  */
object AsyncEnrich {
  implicit val enc: Encoder[EnrichedEvent] = Encoders.product[EnrichedEvent]

  def enrich(ds: Dataset[KeyedEvent], capacity: Int, timeoutMs: Long,
             ordered: Boolean, fallback: String)(
             lookup: Long => Future[String]): Dataset[EnrichedEvent] = {
    ds.mapPartitions { rows =>
      val inflight = scala.collection.mutable.Queue.empty[(KeyedEvent, Future[String])]
      def awaitOne(pair: (KeyedEvent, Future[String])): EnrichedEvent = {
        val (e, f) = pair
        val dim = Try(Await.result(f, Duration(timeoutMs, "ms"))).getOrElse(fallback)
        EnrichedEvent(e.key, e.ts, e.kind, e.value, dim)
      }
      new Iterator[EnrichedEvent] {
        override def hasNext: Boolean = rows.hasNext || inflight.nonEmpty
        override def next(): EnrichedEvent = {
          // fill the pipeline up to capacity
          while (rows.hasNext && inflight.size < capacity) {
            val e = rows.next()
            inflight.enqueue((e, lookup(e.key)))
          }
          if (ordered) awaitOne(inflight.dequeue())
          else {
            // unordered: take the first already-completed, else head
            val idx = inflight.indexWhere(_._2.isCompleted)
            val pick =
              if (idx < 0) inflight.dequeue()
              else {
                val p = inflight(idx)
                inflight.remove(idx)
                p
              }
            awaitOne(pick)
          }
        }
      }
    }
  }
}
