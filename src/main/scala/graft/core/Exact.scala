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
  val Dec = "decimal(30,4)"

  /** Order-independent exact sum, returned as DOUBLE.
    *
    * Scale 4 (not 8) so the final decimal→double cast is a single
    * correctly-rounded operation in both engines: with unscaled
    * value < 2^53 (sums up to ~9·10^11 at scale 4) the int128 is
    * exactly representable, and dividing by 10^4 is one IEEE op.
    * At scale 8, sums beyond ~10^10 (seen at sf0.1) double-round in
    * DuckDB's int128→double→÷10^scale path and drift 1 ulp.
    *
    * Cast back to DOUBLE rather than leaving DECIMAL: a DECIMAL
    * output column survives to the result schema, and downstream
    * readers disagree on its rendering (arrow keeps decimal128,
    * DuckDB's pandas bridge coerces to float64) — value-equal but
    * representation-different, which breaks representation-level
    * hashing. A DOUBLE is bit-identical everywhere. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Overflow-proof negation of an int64 id, for lowest-id-wins
    * tie-breaks inside max_by/min struct orderings.
    *
    * `negate(longCol)` is a thrown ARITHMETIC_OVERFLOW under ANSI
    * when the id is Long.MinValue — and sentinel-polluted ids
    * (MIN/MAX used as "unknown" markers upstream) are a routine
    * production state at 100 TB (NumExec sweep, round 10). Negating
    * in DECIMAL(20,0) cannot overflow; ordering is identical, and
    * the struct field never reaches the output schema. */
  def negId(c: Column): Column = negate(c.cast("decimal(20,0)"))

  /** The value when it is a finite float, NULL otherwise (NaN, ±Inf,
    * or NULL in → NULL out).
    *
    * Non-finite floats are a routine production state at scale (an
    * upstream 0/0 in a permissive engine, a failed normalization),
    * and under ANSI mode any cast of one to an integral type — a
    * histogram bucket, a cents-exact BIGINT, an epoch — is a thrown
    * ARITHMETIC_OVERFLOW/CAST_INVALID_INPUT. Routing integral casts
    * through this guard gives them the engine's null convention:
    * undefined reads NULL (drops from equi-joins and aggregates),
    * never throws. */
  def finiteOrNull(c: Column): Column =
    when(!c.isNaN && abs(c) < Double.PositiveInfinity, c)

  /** avg = exact-sum / count, one final double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Order-independent exact DISTINCT sum (DOUBLE out, see dsum). */
  def dsum_distinct(c: Column): Column =
    sum_distinct(c.cast(Dec)).cast("double")

  /** 2^53 — scaling a FLOAT32 value by it yields an exactly-integral
    * double whenever the float's ulp ≥ 2^-53 (true for any float with
    * magnitude ≥ ~6e-9; below that floor() quantizes deterministically
    * and identically in both engines). */
  val F53 = 9007199254740992.0

  /** Order-independent exact sum of FLOAT32 values (DOUBLE out).
    *
    * dsum's fixed-scale decimal cast can't hold a float exactly (a
    * float near 1e-6 needs 40+ fractional decimal digits), so instead
    * scale by 2^53: the multiply is a power-of-two shift (exact), the
    * result is integral, floor+cast to long is exact, and the long sum
    * in DECIMAL(38,0) is exact and order-independent with map-side
    * partials and O(1) state per group. The final decimal→double cast
    * and ÷2^53 are each single correctly-rounded/exact IEEE ops in
    * both engines, so results are bit-identical to DuckDB's mirror. */
  def fsum(c: Column): Column =
    sum(floor(c.cast("double") * lit(F53)).cast("decimal(38,0)"))
      .cast("double") / lit(F53)

  /** Floor-quantize to 1e-6: floor(x·1e6)/1e6 — three single IEEE ops
    * on identical input bits, so (unlike round-half-up, whose Spark
    * BigDecimal path and DuckDB multiply-round-divide path can differ
    * by 1 ulp) both engines quantize to identical bits by
    * construction. The quantizer of choice when a transcendental
    * (ln/exp) output feeds FURTHER arithmetic: it pins the value to a
    * grid where a last-ulp divergence only survives if the true value
    * straddles a grid line. */
  def q6(c: Column): Column =
    floor(c * lit(1000000.0)) / lit(1000000.0)
}

/** SQL snippets mirroring Exact for the DuckDB oracle strings. */
object ExactSql {
  def dsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(30,4))) AS DOUBLE)"
  def davg(e: String): String =
    s"(${dsum(e)} / COUNT($e))"
  def dsumDistinct(e: String): String =
    s"CAST(SUM(DISTINCT CAST(($e) AS DECIMAL(30,4))) AS DOUBLE)"
  /** The int128→double hop goes through VARCHAR: DuckDB's direct
    * HUGEINT→DOUBLE cast double-rounds NEGATIVE values beyond 2^53
    * (measured ~0.4% of magnitudes in [2^53, 2^62] off by 1 ulp —
    * the upper·2^64 + lower two-double composition), while its
    * string→double parse is correctly rounded, matching Spark's
    * BigDecimal.doubleValue on the Scala side. Positive sums convert
    * exactly either way; without the hop, emb_pca's negative
    * direction components drift 1 ulp on unlucky data. */
  def fsum(e: String): String =
    s"""(CAST(CAST(SUM(CAST(floor(CAST(($e) AS DOUBLE) * 9007199254740992.0)
         AS BIGINT)) AS VARCHAR) AS DOUBLE) / 9007199254740992.0)"""
  /** Mirror of Exact.q6. */
  def q6(e: String): String =
    s"(floor(($e) * CAST(1000000.0 AS DOUBLE)) / CAST(1000000.0 AS DOUBLE))"
}
