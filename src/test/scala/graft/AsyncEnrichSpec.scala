package graft

import java.util.concurrent.Executors
import scala.concurrent.{ExecutionContext, Future}
import graft.operators.AsyncEnrich
import graft.streaming.KeyedEvent

/** Async dimension enrichment: ordered mode preserves input order,
  * capacity pipelines lookups, timeouts fall back. */
class AsyncEnrichSpec extends SparkSpec {

  test("ordered async enrich preserves order; slow lookups time out to fallback") {
    val s = spark
    import s.implicits._
    val events = (1L to 20L).map(i => KeyedEvent(i, ts(i * 1000), "e", i.toDouble))
    val ds = s.createDataset(events).repartition(2)
    val out = AsyncEnrich.enrich(ds, capacity = 4, timeoutMs = 2000,
        ordered = true, fallback = "TIMEOUT") { key =>
      // executor-side async "service": key 13 is pathologically slow
      implicit val ec: ExecutionContext = AsyncEnrichSpec.pool
      Future {
        if (key == 13L) Thread.sleep(10000) else Thread.sleep(5)
        s"dim-$key"
      }
    }.collect()
    assert(out.length == 20)
    val byKey = out.map(e => e.key -> e.dim).toMap
    assert(byKey(7L) == "dim-7")
    assert(byKey(13L) == "TIMEOUT") // timed out, fallback surfaced
  }

  test("ordered mode emits rows in input order within a partition") {
    val s = spark
    import s.implicits._
    val events = (1L to 30L).map(i => KeyedEvent(i, ts(i * 1000), "e", i.toDouble))
    val out = AsyncEnrich.enrich(
        s.createDataset(events).coalesce(1), // single partition: order observable
        capacity = 4, timeoutMs = 5000, ordered = true, fallback = "X") { key =>
      implicit val ec: ExecutionContext = AsyncEnrichSpec.pool
      // reversed latency: later keys complete FIRST — ordered must still
      // emit 1..30 in input order
      Future { Thread.sleep((30 - key) * 2); s"dim-$key" }
    }.collect()
    assert(out.map(_.key).toSeq == (1L to 30L).toSeq)
  }

  test("unordered async enrich returns every row exactly once") {
    val s = spark
    import s.implicits._
    val events = (1L to 50L).map(i => KeyedEvent(i, ts(i * 1000), "e", i.toDouble))
    val out = AsyncEnrich.enrich(s.createDataset(events), capacity = 8,
        timeoutMs = 5000, ordered = false, fallback = "X") { key =>
      implicit val ec: ExecutionContext = AsyncEnrichSpec.pool
      Future { Thread.sleep((key % 7) * 3); s"dim-$key" }
    }.collect()
    assert(out.length == 50)
    assert(out.map(_.key).toSet == (1L to 50L).toSet)
    assert(out.forall(e => e.dim == s"dim-${e.key}"))
  }
}

object AsyncEnrichSpec {
  /** Shared executor-side pool for the fake async service (static so
    * it serializes as a reference, like a real async client would be
    * opened per executor). */
  lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutor(Executors.newFixedThreadPool(8))
}
