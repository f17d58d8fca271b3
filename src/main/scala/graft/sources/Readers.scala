package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1/§2.2) — thin, explicit-schema
  * builders over Spark's DataSource API. Schema inference is OFF by
  * default, mirroring the reference's explicit DDL/descriptor style
  * (CreateTest.scala:73-100); at 100 TB an inference pass is a full
  * extra scan.
  *
  * Kafka builders mirror the reference's most-used connector
  * (Source.scala:116-155, Sink.scala:53); they require the
  * spark-sql-kafka package on the cluster classpath (not shipped in
  * this offline container, so exercised by construction only).
  */
object Readers {

  /** CSV with explicit schema (filesystem+csv connector,
    * TableSQLFunc.scala:182-192). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** Line-delimited JSON (kafka+json format shape, CreateTest.scala:119-160). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Plain text lines (readTextFile, Source.scala:67-78). */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** ORC scan (columnar, predicate-pushdown + column-pruning capable —
    * the same vectorized path as parquet for warehouses standardized
    * on ORC). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw media/blob ingestion (`binaryFile`): one row per file with
    * (path, modificationTime, length, content) — the lake-side entry
    * point of the multimodal pipeline (content feeds
    * MultimodalOps.decodeFeatures). `pathGlobFilter` prunes by
    * extension BEFORE reading bytes; at 100 TB pair it with
    * `spark.sql.files.maxPartitionBytes` so a partition holds a
    * bounded number of blobs. */
  def binaryFiles(spark: SparkSession, dir: String,
                  glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)

  /** Permissive JSON with quarantine: malformed lines land verbatim in
    * `_corrupt_record` instead of failing the job — the bad-records
    * path a 100 TB ingest needs (a single corrupt shard must not kill
    * a 1000-executor run; filter the column to split good/bad). */
  def jsonPermissive(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** JDBC source (MysqlSource.scala:10-53) with predicate-pushdown-
    * friendly options; partitioned read for parallel scan. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionColumn match {
      case Some((c, lo, hi, n)) => base
        .option("partitionColumn", c).option("lowerBound", lo)
        .option("upperBound", hi).option("numPartitions", n).load()
      case None => base.load()
    }
  }

  /** Continuous directory watch (readFile monitor mode,
    * Source.scala:80-97) → file stream source. */
  def csvStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).option("header", "true").csv(dir)

  /** Rate-limited generator (TaxiRideGenerator ~100 ev/s shape,
    * ClickEventGenerator 400 ev/s). */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()

  /** Socket source (socketTextStream, Source.scala:99-114). */
  def socket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Kafka consumer (FlinkKafkaConsumer shape, Source.scala:116-155). */
  def kafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic).load()
}

/** Sinks (§2.2). */
object Writers {
  /** Partitioned filesystem sink (PARTITIONED BY dt,
    * CreateTest.scala:310-333). */
  def partitionedParquet(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** CSV sink (QueryTest.scala:74-83). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC sink (columnar filesystem sink, same partitioning story as
    * parquet). */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JDBC upsert via staging semantics (PRIMARY KEY NOT ENFORCED,
    * TableSQLFunc.scala:290-316): append new keys, replacing prior
    * rows — for real JDBC use a MERGE in foreachBatch; the parquet
    * flavor here keeps latest-per-key via dedup-then-overwrite. */
  def upsertParquet(df: DataFrame, path: String, keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val existing =
      try Some(spark.read.parquet(path)) catch { case _: Throwable => None }
    val merged = existing match {
      case Some(old) => old.join(df.select(keys.map(col): _*), keys, "left_anti")
        .unionByName(df)
      case None => df
    }
    val tmp = path + "__staged"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
  }

  /** Real JDBC upsert — ANSI MERGE per row, batched per partition
    * (the MysqlSink upsert shape, TableSQLFunc.scala:290-316). Runs on
    * the executors (foreachPartition), one connection per partition;
    * for high-volume sinks stage to a temp table + one set-based
    * MERGE. Works against any MERGE-capable dialect (tested on the
    * embedded Derby that ships with Spark). */
  def upsertJdbc(df: DataFrame, url: String, table: String,
                 keys: Seq[String]): Unit = {
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val sql = s"MERGE INTO $table USING SYSIBM.SYSDUMMY1 ON " +
      keys.map(k => s"$table.$k = ?").mkString(" AND ") +
      " WHEN MATCHED THEN UPDATE SET " +
      nonKeys.map(c => s"$c = ?").mkString(", ") +
      s" WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        // buffer the partition so a retry can replay it (MERGE is
        // idempotent per key, so replays are safe)
        val buf = rows.toArray
        // bounded retry with fresh connections: transient batch
        // failures (deadlocks, lock timeouts, embedded-engine races —
        // Derby's concurrent-MERGE NPE was observed once in ~4k suite
        // runs) are a fact of real JDBC sinks; production sinks retry
        // before failing the task (the task-level retry would anyway,
        // but paying a whole task re-run for a transient batch error
        // is the expensive path)
        var attempt = 0
        var done = false
        while (!done && attempt < 3) {
          attempt += 1
          // getConnection sits INSIDE the try: a transient connect
          // failure (the most common transient JDBC error) gets the
          // same 3-attempt backoff as a batch failure
          var conn: java.sql.Connection = null
          try {
            conn = java.sql.DriverManager.getConnection(url)
            // one explicit transaction per partition: the batch lands
            // atomically, and a replay re-MERGEs idempotently —
            // the exactly-once story for an idempotent-keyed sink
            conn.setAutoCommit(false)
            val ps = conn.prepareStatement(sql)
            buf.foreach { r =>
              var i = 1
              (keys ++ nonKeys ++ cols).foreach { c =>
                ps.setObject(i, r.getAs[Any](c).asInstanceOf[AnyRef]); i += 1
              }
              ps.addBatch()
            }
            val counts = ps.executeBatch()
            if (counts.exists(_ == java.sql.Statement.EXECUTE_FAILED))
              throw new java.sql.SQLException(
                s"MERGE into $table: batch reported failed statements")
            conn.commit()
            done = true
          } catch {
            case e: Throwable =>
              if (conn != null)
                try conn.rollback() catch { case _: Throwable => () }
              if (attempt >= 3) throw e
              Thread.sleep(50L * attempt)
          } finally {
            if (conn != null) try conn.close() catch { case _: Throwable => () }
          }
        }
      }
      ()
    }
  }

  /** Kafka producer, at-least-once (ClickEventCount.java:110-115). */
  def kafkaStream(df: DataFrame, bootstrap: String, topic: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
}
