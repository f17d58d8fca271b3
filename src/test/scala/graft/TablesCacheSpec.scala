package graft

import graft.core.Tables

/** Tables analyzed-plan cache: per-session identity keying + eviction
  * (a long-lived service cycling sessions must not pin plans forever,
  * and two sessions must never share each other's cache entries). */
class TablesCacheSpec extends SparkSpec {

  test("sibling sessions get distinct cached DataFrames (object keying)") {
    val s2 = spark.newSession()
    val a = Tables.load(spark, TestSpark.sf0001, "nation")
    val b = Tables.load(s2, TestSpark.sf0001, "nation")
    assert(a.sparkSession eq spark)
    assert(b.sparkSession eq s2)
    assert(!(a eq b), "sessions must not share analyzed plans")
    // repeat loads hit the cache (same object back)
    assert(Tables.load(spark, TestSpark.sf0001, "nation") eq a)
    assert(Tables.load(s2, TestSpark.sf0001, "nation") eq b)
    Tables.evict(s2)
  }

  test("evict drops a session's plans and registration state") {
    val s2 = spark.newSession()
    val a = Tables.load(s2, TestSpark.sf0001, "region")
    Tables.registerAll(s2, TestSpark.sf0001)
    assert(s2.catalog.tableExists("region"))
    Tables.evict(s2)
    // a fresh load re-reads (new analyzed plan, not the evicted one)
    val b = Tables.load(s2, TestSpark.sf0001, "region")
    assert(!(a eq b), "evicted entry must not be served again")
    // registerAll after evict re-registers rather than skipping
    Tables.registerAll(s2, TestSpark.sf0001)
    assert(s2.catalog.tableExists("nation"))
    Tables.evict(s2)
  }

  test("registerAll re-points views when the data dir changes") {
    val s2 = spark.newSession()
    Tables.registerAll(s2, TestSpark.sf0001)
    val n1 = s2.sql("SELECT count(*) c FROM nation").head().getLong(0)
    Tables.registerAll(s2, "/root/testdata/sf0.01")
    val n2 = s2.sql("SELECT count(*) c FROM customer").head().getLong(0)
    assert(n1 == 25)
    assert(n2 > 0)
    Tables.evict(s2)
  }
}
