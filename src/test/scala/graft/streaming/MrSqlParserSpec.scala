package graft.streaming

import graft.SparkSpec

/** The injected parser (SparkSessionExtensions.injectParser) must
  * plan MATCH_RECOGNIZE statements through the NFA and leave every
  * other statement to Spark's parser. */
class MrSqlParserSpec extends SparkSpec {

  test("ordinary SQL still parses through the delegate") {
    assert(spark.sql("SELECT 1 AS x").head.getInt(0) == 1)
    assert(spark.sql("SELECT split('a b', ' ')[0] AS t").head.getString(0) == "a")
  }

  test("MATCH_RECOGNIZE statement plans to the NFA and detects") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts(1000L), "a", 1.0), (1L, ts(2000L), "b", 2.0),
      (2L, ts(1000L), "a", 5.0), (2L, ts(2000L), "x", 0.0),
      (2L, ts(3000L), "b", 7.0)) // x breaks strict contiguity for key 2
      .toDF("user_id", "ts", "event_type", "value")
      .createOrReplaceTempView("mr_src")
    val out = spark.sql(
      """FROM mr_src MATCH_RECOGNIZE (
           PARTITION BY user_id ORDER BY ts
           PATTERN (A B) WITHIN 1 HOUR
           DEFINE A AS kind = 'a', B AS kind = 'b'
         )""").collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L)       // key 2 chain broken
    assert(out.head.getDouble(3) == 3.0)    // sum_v = 1 + 2
    assert(out.head.getInt(4) == 2)
  }

  test("MEASURES clause: FIRST/LAST/MIN/MAX/AVG/COUNT over the match") {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts(1000L), "a", 5.0), (1L, ts(2000L), "a", 1.0),
      (1L, ts(3000L), "b", 9.0))
      .toDF("user_id", "ts", "event_type", "value")
      .createOrReplaceTempView("mr_meas")
    val out = spark.sql(
      """FROM mr_meas MATCH_RECOGNIZE (
           PARTITION BY user_id ORDER BY ts
           MEASURES FIRST(value) AS f, LAST(value) AS l, MIN(value) AS mn,
                    MAX(value) AS mx, AVG(value) AS av, COUNT(*) AS n
           PATTERN (A{2} B)
           DEFINE A AS kind = 'a', B AS kind = 'b'
         )""").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 9.0) // FIRST, LAST
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 9.0) // MIN, MAX
    assert(r.getDouble(7) == 5.0 && r.getInt(8) == 3)      // AVG, COUNT
  }

  test("MEASURES out-of-range navigation and empty-symbol aggregates are " +
    "NULL, not ANSI runtime errors") {
    // Spark 4 defaults to ANSI mode: bare element_at would THROW on
    // LAST(A.value, 5) when A matched fewer rows, and AVG over an
    // optional symbol with zero rows would divide by zero — both must
    // be SQL NULL per the MEASURES contract
    val s = spark
    import s.implicits._
    Seq((1L, ts(1000L), "a", 5.0), (1L, ts(2000L), "b", 9.0))
      .toDF("user_id", "ts", "event_type", "value")
      .createOrReplaceTempView("mr_null")
    val out = spark.sql(
      """FROM mr_null MATCH_RECOGNIZE (
           PARTITION BY user_id ORDER BY ts
           MEASURES LAST(A.value, 5) AS far, AVG(C.value) AS avc,
                    SUM(C.value) AS smc, COUNT(C.*) AS nc
           PATTERN (A C? B)
           DEFINE A AS kind = 'a', C AS kind = 'c', B AS kind = 'b'
         )""").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.isNullAt(r.fieldIndex("far")), s"LAST offset 5 must be NULL: $r")
    assert(r.isNullAt(r.fieldIndex("avc")), s"AVG over zero C rows must be NULL: $r")
    assert(r.isNullAt(r.fieldIndex("smc")), s"SUM over zero C rows must be NULL: $r")
    assert(r.getInt(r.fieldIndex("nc")) == 0)
  }

  test("malformed MATCH_RECOGNIZE falls through to the delegate and errors") {
    intercept[Exception] {
      spark.sql("SELECT MATCH_RECOGNIZE FROM") // not our grammar, not Spark's
    }
  }
}
