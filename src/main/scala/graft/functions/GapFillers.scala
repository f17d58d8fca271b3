package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The four scalar functions the reference exercises that Spark lacks
  * as built-ins (SURVEY §2.9), each composed from codegen'd built-ins
  * rather than UDFs:
  *
  *   - split_index(s, sep, i)   (SqlFuncTest.scala:269 split_index)
  *   - between_symmetric        (SqlFuncTest.scala:52-116)
  *   - overlaps                 (SqlFuncTest.scala:296-505 OVERLAPS)
  *   - rand_integer(seed-free)  -> deterministic hash bucket variant
  */
object GapFillers {

  /** Flink `split_index(s, sep, i)` — 0-based index, null when out of
    * range (element_at is 1-based; get() returns null out-of-range). */
  def splitIndex(s: Column, sep: String, i: Int): Column =
    get(split(s, java.util.regex.Pattern.quote(sep)), lit(i))

  /** SQL `x BETWEEN SYMMETRIC a AND b` — bounds normalized. */
  def betweenSymmetric(x: Column, a: Column, b: Column): Column =
    x >= least(a, b) && x <= greatest(a, b)

  /** SQL `(s1, e1) OVERLAPS (s2, e2)` — half-open interval overlap,
    * matching the SQL-standard semantics the reference exercises. */
  def overlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 < e2 && s2 < e1

  /** Flink `rand_integer(n)` made deterministic: a uniform-ish hash
    * bucket of a key column — the reproducible analogue used anywhere
    * the reference relies on rand for spreading. */
  def hashBucket(key: Column, n: Int): Column = pmod(xxhash64(key), lit(n))
}
