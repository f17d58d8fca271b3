package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryGroup
import graft.core.Tables

/** Shared helpers for query groups. */
trait GroupBase extends QueryGroup {
  /** Load a driver table (and make sure the session carries the
    * engine's extensions, in case the caller built its own session). */
  protected def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    org.apache.spark.sql.GraftBridge.ensurePrepared(spark)
    Tables.load(spark, dir, name)
  }

  /** Register all driver tables as temp views and run a SQL query —
    * for operators best expressed as SQL (grouping sets, range frames).
    * Views are lazy; only scanned tables are read.
    */
  protected def sql(spark: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(q)
  }
}
