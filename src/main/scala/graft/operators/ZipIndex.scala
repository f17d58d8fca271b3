package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global row index / rank — the scale-safe replacement
  * for `row_number() OVER (ORDER BY ...)` with no PARTITION BY, which
  * moves the ENTIRE input to one task's WindowExec sort (the
  * single-partition cliff PlanAudit's GLOBALWIN check flags).
  *
  * Reference semantics: DataSetFunc.scala:989-1013 zipWithIndex —
  * deterministic dense 0-based ids in a total order. The classic
  * two-pass shape:
  *
  *   1. `repartitionByRange(order) + sortWithinPartitions(order)` —
  *      a sampled range exchange; every partition holds ~N/P rows
  *      regardless of data values, and partition i's keys all precede
  *      partition i+1's.
  *   2. One cheap counting job: rows per range partition (P numbers,
  *      P = shuffle parallelism — driver-side by design, this is
  *      metadata, not data).
  *   3. Prefix-sum the counts into per-partition start offsets,
  *      broadcast the P-entry map, and stream each partition once with
  *      a local counter (`mapPartitions` — order within a partition is
  *      exactly the sortWithinPartitions order).
  *
  * No step touches more than one partition's rows on one task, so the
  * plan survives 100×: the only global object is the P-long offset
  * array. The counting job and the indexing job both recompute the
  * range exchange; Spark's range sampler is seeded per partition
  * (deterministic for a deterministic source), so both jobs see the
  * same boundaries — the same contract RDD.zipWithIndex relies on.
  *
  * The `order` columns must form a UNIQUE key or the assigned index is
  * nondeterministic within ties (same caveat as row_number).
  *
  * EAGERNESS CAVEAT: the counting pass runs at CONSTRUCTION time — the
  * offsets must exist before the indexed plan can be built, so even a
  * plan-only consumer (PlanAudit/PlanDump/explain) pays pass 1 over
  * the (column-pruned) input. That is the inherent price of any
  * two-pass index; the pass-2 job reuses pass 1's shuffle output, and
  * the P-entry offset broadcast is reclaimed by Spark's ContextCleaner
  * once the returned frame becomes unreachable.
  */
object ZipIndex {

  /** Attach 0-based dense `idxCol` following the total order given by
    * `order`. Returns (indexed frame, total row count) — the count is
    * free (sum of the per-partition counts) so callers needing N
    * (ntile arithmetic) don't pay a second pass or a 1-row crossJoin. */
  def withIndex(df: DataFrame, idxCol: String, order: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)

    // BOTH passes must see the SAME range boundaries. Two separate
    // DataFrame jobs each re-plan the exchange (fresh RDD ids seed the
    // range sampler differently), so the counting pass and the
    // indexing pass could disagree on which partition a row lands in —
    // observed as duplicate/overflowing ranks. The RDD.zipWithIndex
    // discipline instead: derive ONE RDD object and run both jobs over
    // it — the shuffle executes once (pass 1) and pass 2 reuses its
    // map output, so boundaries are identical by construction and the
    // source is scanned exactly once.
    val rdd = ranged.rdd

    // Pass 1: rows per range partition — P numbers to the driver
    // (partition METADATA, the collect zipWithIndex has always had).
    // Counted with a Long accumulator, NOT Iterator.size: size returns
    // Int and silently wraps past 2^31 rows per partition — exactly the
    // 1e12-row regime this operator exists for (N/P can exceed
    // Int.MaxValue at scale with default parallelism).
    val counts: Array[(Int, Long)] = rdd
      .mapPartitionsWithIndex({ (pid, it) =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1L }
        Iterator((pid, n))
      }, preservesPartitioning = true)
      .collect()
    val total = counts.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.sortBy(_._1).map { case (pid, n) =>
        val o = pid -> acc; acc += n; o
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)

    // Pass 2: stream each sorted partition once with a local counter.
    val outSchema = df.schema.add(idxCol, LongType, nullable = false)
    val indexed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var i = bc.value.getOrElse(pid, 0L)
      it.map { r => val out = Row.fromSeq(r.toSeq :+ i); i += 1; out }
    }
    (spark.createDataFrame(indexed, outSchema), total)
  }

  /** `ntile(buckets) OVER (ORDER BY order)` without the global window:
    * rank from [[withIndex]], bucket by ntile's closed-form split
    * (first N mod b buckets take ceil(N/b) rows, the rest floor(N/b))
    * evaluated as literal arithmetic — N is known from pass 1.
    *
    * The splits use SQL `DIV` (Catalyst IntegralDivide), not `/`:
    * Column `/` promotes Longs to DOUBLE division whose truncation is
    * only coincidentally right below ~2^51 — DIV keeps the bucket
    * arithmetic exact integer math at any rank. */
  def ntileBy(df: DataFrame, buckets: Int, tileCol: String, order: Column*): DataFrame = {
    val (indexed, n) = withIndex(df, "__rk", order: _*)
    val base = n / buckets      // floor bucket size
    val rem = n % buckets       // buckets 1..rem hold base+1 rows
    val cut = rem * (base + 1)  // rows covered by the big buckets
    val r = col("__rk") + lit(1L) // 1-based rank
    val tile =
      if (base == 0L) r // fewer rows than buckets: bucket = rank
      else when(r <= cut, expr(s"(__rk + 1 + ${base}L) DIV ${base + 1}L"))
        .otherwise(lit(rem) + expr(s"(__rk + 1 - ${cut}L + ${base - 1}L) DIV ${base}L"))
    indexed.withColumn(tileCol, tile.cast("int")).drop("__rk")
  }
}
