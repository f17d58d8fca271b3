package graft

import org.apache.spark.sql.functions._
import graft.sources.{Readers, Writers}

/** Real JDBC end-to-end against the embedded Derby that ships with
  * Spark (jdbc:derby:memory — same JVM as the local[*] executors, so
  * executor-side connections in foreachPartition genuinely work).
  * Mirrors the reference's MysqlSource/MysqlSink round-trip
  * (MysqlSource.scala:10-53, TableSQLFunc.scala:290-316) without
  * needing an external database.
  */
class JdbcSpec extends SparkSpec {
  // unique in-memory db per suite instance: a retried/parallel run
  // must never see tables left by an earlier instance (the historical
  // "flakes once under parallel suites, green isolated" signature)
  private val url =
    s"jdbc:derby:memory:graftjdbc${System.nanoTime()};create=true"

  test("JDBC round-trip: Spark write, partitioned parallel read") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"name_$i")).toDF("id", "name")
    df.write.mode("append").format("jdbc")
      .option("url", url).option("dbtable", "people").save()
    // partitioned read: 4 concurrent range scans on the id column
    val back = Readers.jdbc(spark, url, "people", Some(("id", 0L, 100L, 4)))
    assert(back.rdd.getNumPartitions == 4, "partitioned read not split")
    assert(back.count() == 100)
    assert(back.agg(sum("id")).first().getLong(0) == 4950)
    // predicate pushdown reaches the database: the filtered scan
    // reads only matching rows (JDBCRelation prunes via WHERE)
    assert(back.filter(col("id") < 10).count() == 10)
  }

  test("JDBC MERGE upsert: latest row wins per key, new keys insert") {
    import spark.implicits._
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE kv (k BIGINT PRIMARY KEY, v VARCHAR(64))")
      conn.createStatement().execute(
        "INSERT INTO kv VALUES (1, 'old1'), (2, 'old2')")
    } finally conn.close()
    // upsert: key 2 updates, keys 3/4 insert, key 1 untouched
    val batch = Seq((2L, "new2"), (3L, "new3"), (4L, "new4")).toDF("k", "v")
    Writers.upsertJdbc(batch, url, "kv", Seq("k"))
    val back = Readers.jdbc(spark, url, "kv")
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(back.toSeq == Seq(1L -> "old1", 2L -> "new2", 3L -> "new3", 4L -> "new4"))
  }
}
