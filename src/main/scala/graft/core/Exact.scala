package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric aggregation.
  *
  * Summing doubles is order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's — a plain `sum(double)`
  * would hash-mismatch the driver's DuckDB oracle. Strategy:
  *   - element-wise arithmetic in DOUBLE (single IEEE ops are
  *     bit-deterministic across engines),
  *   - aggregate in DECIMAL (exact, order-independent),
  *   - cast the final result back to DOUBLE (same decimal -> same
  *     double bits in both engines).
  *
  * The SQL-side mirror of each helper lives in the oracle strings
  * (see ExactSql).
  */
object Exact {
  val Dec = "decimal(30,8)"

  /** Order-independent exact sum, surfaced as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** avg = exact-sum / count, with a single final double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Order-independent exact DISTINCT sum, surfaced as double. */
  def dsum_distinct(c: Column): Column =
    sum_distinct(c.cast(Dec)).cast("double")
}

/** SQL snippets mirroring Exact for the DuckDB oracle strings. */
object ExactSql {
  def dsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,8))) AS DOUBLE)"
  def davg(e: String): String =
    s"(${dsum(e)} / COUNT($e))"
  def dsumDistinct(e: String): String =
    s"CAST(SUM(DISTINCT CAST(($e) AS DECIMAL(30,8))) AS DOUBLE)"
}
