package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry for the driver-provided TPC-H-ish parquet tables
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings.
  *
  * The `events.ts` column's PHYSICAL type has varied across testdata
  * generations: int64 TIMESTAMP(NANOS) (which Spark's vectorized
  * reader surfaces as LongType under `nanosAsLong`, rejecting it
  * outright otherwise) vs plain timestamp[us] (surfaced as
  * TIMESTAMP_NTZ under `inferTimestampNTZ`). A real engine reads what
  * the file says, so `read` branches on the ACTUAL loaded schema:
  *   - LongType  -> ns->us floor-division shim (matches DuckDB's
  *     read-time truncation; floor vs toward-zero only differs
  *     pre-1970, guarded for anyway)
  *   - TIMESTAMP_NTZ -> cast to session-tz TIMESTAMP. Session tz is
  *     UTC (Sessions.build), so the microsecond values are identical
  *     to the naive file values — and identical to what the nanos
  *     shim produced — keeping every downstream consumer on one type.
  *   - TIMESTAMP -> pass through.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor.
    * (customer/part/supplier grow with SF, so they are NOT here —
    * at 100 TB those joins must shuffle or rely on AQE.)
    */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Analyzed-DataFrame cache. `spark.read.parquet` does driver-side
    * file listing + footer schema inference on EVERY call; a real
    * deployment fronts that with a catalog (metastore) whose schemas
    * are resolved once. Keyed by the SparkSession OBJECT (reference
    * equality — SparkSession doesn't override equals), not its
    * identityHashCode: hash codes can collide across sessions, which
    * would silently share plans between them. A listener evicts the
    * session's entries when its context ends, so a long-lived service
    * that cycles sessions doesn't pin every analyzed plan forever.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]

  private def sessionCache(spark: SparkSession) =
    cache.computeIfAbsent(spark, s => {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            evict(s)
        })
      new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
    })

  /** Drop all cached plans + registration state for `spark`. Called by
    * the application-end listener; callable directly by embedders that
    * cycle `newSession()`s off one long-lived context. */
  private[graft] def evict(spark: SparkSession): Unit = {
    cache.remove(spark)
    registered.remove(spark)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionCache(spark).computeIfAbsent(
      (dir, name), _ => read(spark, dir, name))

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // Defensive: keep sessions built outside Sessions.build working.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/events.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // int64 TIMESTAMP(NANOS) file. Floor division in pure integer
          // arithmetic: `/` would go through DOUBLE (precision loss at
          // ~1.7e18 ns) and `div` truncates toward zero (wrong
          // pre-1970). pmod keeps it exact and floor-like.
          df.withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // timestamp[us] file read as NTZ: re-type to session-tz
          // TIMESTAMP (UTC session => identical micros, see scaladoc).
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql queries).
    * Views are lazy logical plans — registering all ten costs nothing
    * until a query actually scans one.
    */
  /** Last dir whose views were registered, per session: views are
    * global names, so a dir switch must re-point them (and a repeat
    * call with the same dir can skip the 10 catalog writes).
    */
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]

  def registerAll(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      // record the dir only AFTER all ten views registered: a failed
      // load mustn't make later calls skip registration, and two
      // concurrent calls mustn't interleave views from different dirs
      if (registered.get(spark) != dir) {
        // Per-table fault isolation: one unreadable table must not
        // poison SQL queries on the other nine (a broken `events`
        // once took out lineitem-only queries through this loop).
        // Failures log + skip; the dir is recorded only on a clean
        // sweep so later calls retry the broken table.
        var allOk = true
        all.foreach { n =>
          try load(spark, dir, n).createOrReplaceTempView(n)
          catch { case e: Throwable =>
            allOk = false
            System.err.println(
              s"[graft] registerAll: table '$n' from $dir failed: ${e.getMessage}")
          }
        }
        if (allOk) registered.put(spark, dir)
      }
    }
}
