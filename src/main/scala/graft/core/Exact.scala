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

  /** Order-independent exact sum, kept as DECIMAL(38,8).
    *
    * NOT cast to double: DuckDB converts DECIMAL→DOUBLE by an
    * int128→double conversion followed by a divide-by-10^scale — two
    * roundings. Once the unscaled value exceeds 2^53 (sums ≳ 10^10
    * at scale 8) that double-rounds 1 ulp away from the correctly
    * rounded value the JVM produces, so large sums would mismatch at
    * the 16th digit. Comparing the exact decimals sidesteps the
    * problem entirely (observed at sf0.1; sf0.01 was too small). */
  def dsum(c: Column): Column = sum(c.cast(Dec))

  /** avg = exact-sum / count, one final double division. Safe in
    * double: averages stay small, so the decimal→double cast of the
    * sum is exact (unscaled < 2^53). */
  def davg(c: Column): Column = dsum(c).cast("double") / count(c)

  /** Order-independent exact DISTINCT sum (DECIMAL out, see dsum). */
  def dsum_distinct(c: Column): Column = sum_distinct(c.cast(Dec))
}

/** SQL snippets mirroring Exact for the DuckDB oracle strings. */
object ExactSql {
  def dsum(e: String): String =
    s"SUM(CAST(($e) AS DECIMAL(30,8)))"
  def davg(e: String): String =
    s"(CAST(${dsum(e)} AS DOUBLE) / COUNT($e))"
  def dsumDistinct(e: String): String =
    s"SUM(DISTINCT CAST(($e) AS DECIMAL(30,8)))"
}
