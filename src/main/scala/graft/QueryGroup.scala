package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A themed bundle of named queries plus their DuckDB oracle SQL.
  * SparkEntry folds all groups; the driver's correctness gate runs
  * each query at sf0.01 and hash-compares against the oracle.
  *
  * Invariants every entry must satisfy:
  *   - identical output column NAMES in Spark and oracle SQL,
  *   - a fully deterministic total ORDER BY on both sides
  *     (oracle side: explicit NULLS FIRST — DuckDB defaults to
  *     NULLS LAST, Spark ASC to NULLS FIRST),
  *   - numerics via graft.core.Exact / ExactSql (no raw double sums;
  *     element-wise double arithmetic is fine — single IEEE ops are
  *     bit-identical across engines).
  */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** Oracle SQL per query name; omit entries that aren't SQL-expressible
    * (the driver then records a weaker rows-only check). */
  def oracleSql: Map[String, String]
}
