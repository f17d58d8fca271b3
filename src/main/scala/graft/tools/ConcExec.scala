package graft.tools

import java.util.concurrent.{Callable, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import graft.core.Sessions

/** Concurrent-execution gate, TWO modes in one capped JVM (r13
  * verdict #3):
  *
  *   - `determinism` — all 250 queries at once on 8 threads at
  *     sf0.001. Races don't need data volume; this hunts shared
  *     mutable state (catalog/temp-view races, per-session plan
  *     caches, parser singletons, ThreadLocals sized for one thread).
  *   - `contention` — all 250 queries on 4 threads at sf0.1, the
  *     BENCH scale factor. This exercises what the small mode cannot:
  *     shuffle/memory pressure from concurrent real workloads inside
  *     one bounded JVM — the actual multi-tenant production shape.
  *
  * Both modes compare every query's result (unordered multiset of
  * rows) against a serial reference pass with PartInvariance's
  * exact/tol machinery (exact = bitwise row multisets; tol = 1e-9
  * relative, IEEE reassociation only — shuffle block arrival order is
  * scheduling-dependent under load, the same float-merge freedom
  * PART_INVARIANCE already adjudicates). Anything else — wrong rows,
  * crossed views, an exception, a deadlock — fails the gate.
  *
  * Memory discipline: like MemExec, the tool REFUSES to run in a
  * roomy heap, so the artifact can only ever attest concurrent AND
  * bounded together. The serial pass spills each query's normalized
  * result to disk (Java serialization of the canonical value trees),
  * so the heap holds at most 2 x `threads` result sets at any moment
  * (each worker holds its concurrent result PLUS the deserialized
  * serial reference while comparing) — never the whole catalog's.
  *
  *   SPARK_DRIVER_MEM=4g SPARK_GRAFT_CPUS=8 \
  *     sbt "runMain graft.tools.ConcExec [outJson] [capMb] [smallDir] [benchDir]"
  *       (defaults CONC_EXEC.json, 4500, /root/testdata/sf0.001,
  *        /root/testdata/sf0.1)
  */
object ConcExec {

  /** One (sfDir, threads) mode: serial reference pass spilled to
    * disk, then the full catalog in flight at once, each result
    * compared as its future completes. Returns name -> status. */
  private def runMode(spark: SparkSession, mode: String, sfDir: String,
                      threads: Int): Seq[(String, String)] = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val spill = java.nio.file.Files.createTempDirectory(s"graft-conc-$mode")
    try runModeSpilled(spark, mode, sfDir, threads, names, spill)
    finally {
      // bench-scale serial results are not small — clean up even when
      // a pass throws (refresh_gates reruns this every round)
      names.foreach(n => java.nio.file.Files.deleteIfExists(spill.resolve(n)))
      java.nio.file.Files.deleteIfExists(spill)
    }
  }

  private def runModeSpilled(spark: SparkSession, mode: String, sfDir: String,
                             threads: Int, names: Seq[String],
                             spill: java.nio.file.Path): Seq[(String, String)] = {

    def normalized(name: String): Vector[Any] =
      SparkEntry.queries(name)(spark, sfDir).collect().toVector
        .map(PartInvariance.normalize)

    // Serial reference pass: the same collect the concurrent workers
    // will do, so the comparison isolates CONCURRENCY, not plan shape.
    // One result set in memory at a time; spilled before the next.
    val serialErr = scala.collection.mutable.Map.empty[String, String]
    names.foreach { name =>
      try {
        val n = normalized(name)
        val oos = new java.io.ObjectOutputStream(new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(spill.resolve(name))))
        try oos.writeObject(n) finally oos.close()
      } catch { case e: Throwable => serialErr(name) = errMsg(e) }
    }
    def loadSerial(name: String): Vector[Any] = {
      val ois = new java.io.ObjectInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(spill.resolve(name))))
      try ois.readObject().asInstanceOf[Vector[Any]] finally ois.close()
    }

    // Concurrent pass. Submission order is the sorted name order
    // (determinism of the submission itself); interleaving is the
    // scheduler's. The COMPARISON runs inside the worker too, so both
    // result sets are garbage the moment the status string exists.
    val pool = Executors.newFixedThreadPool(threads)
    // which queries actually ENTERED a worker: on a deadlock, futures
    // still queued behind the stuck ones never ran at all — labeling
    // them TIMEOUT too would bury the actually-hung query (ADVICE r13)
    val started = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val futures = names.map { name =>
      name -> pool.submit(new Callable[String] {
        override def call(): String = {
          started.add(name)
          val conc: Either[String, Vector[Any]] =
            try Right(normalized(name))
            catch { case e: Throwable => Left(errMsg(e)) }
          (serialErr.get(name), conc) match {
            case (Some(e), _)     => s"error(serial): $e"
            case (_, Left(e))     => s"error(concurrent): $e"
            case (None, Right(c)) =>
              PartInvariance.compareNormalized(loadSerial(name), c)
          }
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
      val status =
        try fut.get(if (drained) 60 else 0, TimeUnit.SECONDS)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            fut.cancel(true)
            if (started.contains(name))
              "TIMEOUT: still running when the pool deadline passed"
            else
              "TIMEOUT: never started (queued behind the stuck queries)"
          case e: java.util.concurrent.ExecutionException =>
            s"error(harness): ${errMsg(e.getCause)}"
        }
      if (status != "exact" && status != "tol")
        System.err.println(s"[concexec] $mode/$name: $status")
      name -> status
    }
    results
  }

  def main(args: Array[String]): Unit = {
    val outJson = if (args.length > 0) args(0) else "CONC_EXEC.json"
    val capMb = if (args.length > 1) args(1).toInt else 4500
    val smallDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val benchDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    if (heapMb > capMb) {
      System.err.println(
        s"[concexec] REFUSING: max heap ${heapMb} MB exceeds the ${capMb} MB cap — " +
          "run with SPARK_DRIVER_MEM=4g so the artifact attests a capped JVM")
      sys.exit(2)
    }
    val spark = Sessions.build("graft-concexec")
    graft.Bench.warmJvm(spark)

    val modes = Seq(
      ("determinism", smallDir, 8),
      ("contention", benchDir, 4))
    def esc(s: String) = SweepJson.esc(s)
    var totalFailed = 0
    val modeJson = modes.map { case (mode, dir, threads) =>
      val results = runMode(spark, mode, dir, threads)
      val failed = results.count { case (_, st) => st != "exact" && st != "tol" }
      totalFailed += failed
      val nExact = results.count(_._2 == "exact")
      val nTol = results.count(_._2 == "tol")
      println(s"[concexec] $mode: $nExact exact + $nTol tol / ${results.size} " +
        s"under $threads-way concurrency at $dir")
      val entries = results
        .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
      s""""$mode":{"sf_dir":"${esc(dir)}","threads":$threads,"n_queries":${results.size},"n_failed":$failed,"queries":$entries}"""
    }.mkString(",")
    val json =
      s"""{"action":"concurrent-execution-determinism","heap_mb":$heapMb,"cpus":${Sessions.cpus},"n_failed":$totalFailed,"modes":{$modeJson},${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[concexec] both modes -> $outJson (failed: $totalFailed)")
    spark.stop()
    if (totalFailed > 0) sys.exit(1)
  }

  private def errMsg(e: Throwable): String =
    (e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage))
      .replaceAll("\\s+", " ").take(160)
}
