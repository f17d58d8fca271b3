package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central registry for the driver-provided TPC-H-ish parquet tables
  * (TESTDATA.md): region nation customer supplier part orders lineitem
  * events documents embeddings.
  *
  * The `events` table stores TIMESTAMP(NANOS) parquet, which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong` and truncate ns -> us with
  * integer division, which matches DuckDB's read-time truncation
  * exactly (both engines see identical microsecond values).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor.
    * (customer/part/supplier grow with SF, so they are NOT here —
    * at 100 TB those joins must shuffle or rely on AQE.)
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
