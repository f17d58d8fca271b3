package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.Row
import graft.SparkEntry
import graft.core.Sessions

/** Concurrent-execution determinism gate: every catalog query must
  * produce the SAME result (as an unordered multiset of rows) when all
  * 250 queries run simultaneously on a shared SparkSession as when
  * they run one at a time.
  *
  * Why this matters at 100 TB: a production analytics engine is a
  * multi-tenant SERVICE — many queries share one long-lived session
  * (notebooks, dashboards, schedulers), not a private JVM each. The
  * bug surface is shared mutable state: catalog races
  * (`createOrReplaceTempView` under a fixed name while another query's
  * analysis resolves it), per-session plan caches (core.Tables),
  * parser/extension singletons (MrSqlParser), ThreadLocals sized for
  * one thread, and result merge orders that only LOOK deterministic
  * because nothing else was running. Every sweep so far ran queries
  * serially, so none of it was exercised.
  *
  * Method: one serial reference pass (collect + normalize every
  * query), then the full catalog submitted at once to a fixed pool of
  * `threads` workers sharing the session, compared per query with
  * PartInvariance's exact/tol machinery (exact = bitwise row
  * multisets; tol = 1e-9 relative, IEEE reassociation only — shuffle
  * block arrival order is scheduling-dependent under load, which is
  * the same float-merge freedom PART_INVARIANCE already adjudicates).
  * Anything else — wrong rows, crossed views, an exception — fails
  * the gate.
  *
  *   sbt "runMain graft.tools.ConcExec [sfDir] [outJson] [threads]"
  *     (defaults /root/testdata/sf0.001, CONC_EXEC.json, 8)
  */
object ConcExec {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "CONC_EXEC.json"
    val threads = if (args.length > 2) args(2).toInt else 8
    val spark = Sessions.build("graft-concexec")
    graft.Bench.warmJvm(spark)

    val names = SparkEntry.queries.keys.toSeq.sorted

    // Serial reference pass: the same collect the concurrent workers
    // will do, so the comparison isolates CONCURRENCY, not plan shape.
    val serial: Map[String, Either[String, Seq[Row]]] = names.map { name =>
      name -> (try Right(SparkEntry.queries(name)(spark, sfDir).collect().toSeq)
               catch { case e: Throwable => Left(errMsg(e)) })
    }.toMap

    // Concurrent pass: the WHOLE catalog in flight at once on a shared
    // session. Submission order is the sorted name order (determinism
    // of the submission itself); interleaving is the scheduler's.
    val pool = Executors.newFixedThreadPool(threads)
    // which queries actually ENTERED a worker: on a deadlock, futures
    // still queued behind the stuck ones never ran at all — labeling
    // them TIMEOUT too would bury the actually-hung query (ADVICE r13)
    val started = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val futures = names.map { name =>
      name -> pool.submit(new Callable[Either[String, Seq[Row]]] {
        override def call(): Either[String, Seq[Row]] = {
          started.add(name)
          try Right(SparkEntry.queries(name)(spark, sfDir).collect().toSeq)
          catch { case e: Throwable => Left(errMsg(e)) }
        }
      })
    }
    pool.shutdown()
    // a query that DEADLOCKS under concurrency is exactly the bug
    // class this gate hunts — it must fail the gate, not hang it:
    // bound the drain, then bound each get() (0 is fine once the pool
    // drained; it only bites for the stuck stragglers).
    val drained = pool.awaitTermination(1, TimeUnit.HOURS)
    // fut.cancel(true) below only interrupts the worker THREAD; the
    // Spark jobs it already submitted keep burning executors — kill
    // them at the scheduler so the post-mortem JVM is quiet
    if (!drained) spark.sparkContext.cancelAllJobs()
    val results = futures.map { case (name, fut) =>
      val conc: Either[String, Seq[Row]] =
        try fut.get(if (drained) 60 else 0, TimeUnit.SECONDS)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            fut.cancel(true)
            Left(if (started.contains(name))
              "TIMEOUT: still running when the pool deadline passed"
            else
              "TIMEOUT: never started (queued behind the stuck queries)")
          case e: java.util.concurrent.ExecutionException =>
            Left(errMsg(e.getCause))
        }
      val status = (serial(name), conc) match {
        case (Right(a), Right(b)) => PartInvariance.compare(a, b)
        case (Left(e), _) => s"error(serial): $e"
        case (_, Left(e)) => s"error(concurrent): $e"
      }
      if (status != "exact" && status != "tol")
        System.err.println(s"[concexec] $name: $status")
      name -> status
    }
    val failed = results.count { case (_, st) => st != "exact" && st != "tol" }
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"concurrent-execution-determinism","sf_dir":"${esc(sfDir)}","threads":$threads,"n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    val nExact = results.count(_._2 == "exact")
    val nTol = results.count(_._2 == "tol")
    println(s"[concexec] $nExact exact + $nTol tol / ${results.size} under $threads-way concurrency -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  private def errMsg(e: Throwable): String =
    (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
      .replaceAll("\\s+", " ").take(160)
}
