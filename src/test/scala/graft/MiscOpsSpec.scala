package graft

import org.apache.spark.sql.functions._

/** Coverage for the §2.3/§2.5/§2.11 primitives that are API surface
  * rather than query shapes: typed Dataset ops, accumulators,
  * observe() metrics, physical repartitioning, broadcast variables. */
class MiscOpsSpec extends SparkSpec {
  private val d = TestSpark.sf0001

  test("typed map / flatMap / filter / reduceGroups (DataStream map surface)") {
    val s = spark
    import s.implicits._
    val ds = graft.core.Tables.load(spark, d, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)]
    val mapped = ds.map { case (k, n) => (k * 2, n.toLowerCase) }
    assert(mapped.filter(_._1 >= 0).count() == 25)
    val flat = ds.flatMap { case (k, n) => n.split(" ").map((k, _)) }
    assert(flat.count() >= 25)
    val reduced = ds.map(_._1).groupByKey(_ % 5)
      .reduceGroups(_ + _).collect().toMap
    assert(reduced.values.sum == (0L until 25L).sum)
  }

  test("accumulator counts rows engine-side (PageViewByAccumulatorApp)") {
    val acc = spark.sparkContext.longAccumulator("rows_seen")
    graft.core.Tables.load(spark, d, "orders").foreach(_ => acc.add(1))
    assert(acc.value == 1500L)
  }

  test("observe() exposes per-action metrics (metrics/observe surface)") {
    val observed = graft.core.Tables.load(spark, d, "lineitem")
      .observe("stats", count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(30,8)")).cast("double").as("q"))
    // collect() executes THIS plan (count() would wrap a new one whose
    // metrics land on a different QueryExecution)
    observed.collect()
    val row = observed.queryExecution.observedMetrics("stats")
    assert(row.getAs[Long]("n") == 6000L)
    assert(row.getAs[Double]("q") > 0)
  }

  test("repartition / repartitionByRange / coalesce shape the physical layout") {
    val df = graft.core.Tables.load(spark, d, "orders")
    assert(df.repartition(8).rdd.getNumPartitions == 8)
    assert(df.repartition(4, col("o_orderstatus")).rdd.getNumPartitions == 4)
    val ranged = df.repartitionByRange(4, col("o_orderkey"))
    assert(ranged.rdd.getNumPartitions == 4)
    // range partitions are key-ordered: max(part i) <= min(part i+1)
    val bounds = ranged.select("o_orderkey").rdd
      .mapPartitionsWithIndex { (i, it) =>
        val ks = it.map(_.getLong(0)).toSeq
        if (ks.isEmpty) Iterator.empty
        else Iterator((i, ks.min, ks.max))
      }.collect().sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, _, max1), (_, min2, _)) => assert(max1 <= min2)
      case _ => ()
    }
    assert(df.coalesce(1).rdd.getNumPartitions == 1)
  }

  test("broadcast variable joins a dim in a map (broadcast set / dist cache)") {
    val nations = graft.core.Tables.load(spark, d, "nation")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val bc = spark.sparkContext.broadcast(nations)
    val s = spark
    import s.implicits._
    val named = graft.core.Tables.load(spark, d, "customer")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("int"))
      .as[(Long, Int)]
      .map { case (c, nk) => (c, bc.value.getOrElse(nk, "?")) }
    assert(named.filter(_._2 != "?").count() == 150)
  }

  test("custom RDD Partitioner (physical repartitioning, custom flavor)") {
    import org.apache.spark.Partitioner
    // route even keys to partition 0, odd to partition 1 — the custom
    // partitionCustom surface the reference exercises
    // (DataStreamFunc.scala:624-871 partitionCustom)
    class ParityPartitioner extends Partitioner {
      override def numPartitions: Int = 2
      override def getPartition(key: Any): Int =
        (key.asInstanceOf[Long] % 2).toInt
    }
    val rdd = graft.core.Tables.load(spark, d, "orders")
      .select("o_orderkey").rdd.map(r => (r.getLong(0), 1))
      .partitionBy(new ParityPartitioner)
    val perPart = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.map(_._1).toSeq))
    }.collect().toMap
    assert(perPart(0).forall(_ % 2 == 0))
    assert(perPart(1).forall(_ % 2 == 1))
    assert(perPart.values.map(_.size).sum == 1500)
  }

  test("lateral view / posexplode with ordinality (UDTF lateral join)") {
    graft.core.Tables.registerAll(spark, d)
    val rows = spark.sql(
      """SELECT p_partkey, pos, tok FROM part
         LATERAL VIEW posexplode(split(p_name, ' ')) t AS pos, tok
         WHERE p_partkey < 3 ORDER BY p_partkey, pos""").collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(1) >= 0))
  }
}
