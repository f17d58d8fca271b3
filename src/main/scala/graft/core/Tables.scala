package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry for the driver-provided TPC-H-ish parquet tables
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings.
  *
  * The `events` table stores TIMESTAMP(NANOS) parquet, which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Sessions.build
  * sets `spark.sql.legacy.parquet.nanosAsLong` once; here we truncate
  * ns -> us with floor division, which matches DuckDB's read-time
  * truncation exactly (both engines see identical microsecond values;
  * floor vs toward-zero only differs pre-1970, guarded for anyway).
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
      spark.read.parquet(s"$dir/events.parquet")
        // Floor division in pure integer arithmetic: `/` would go through
        // DOUBLE (precision loss at ~1.7e18 ns) and `div` truncates toward
        // zero (wrong pre-1970). pmod keeps it exact and floor-like.
        .withColumn("ts", expr("timestamp_micros((ts - pmod(ts, 1000)) div 1000)"))
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
        all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
        registered.put(spark, dir)
      }
    }
}
