package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Exact

/** §2.6 OVER windows: running/sliding frames, range-by-time frames,
  * rank/row_number top-N, row_number()=1 dedup, lag/lead, first/last,
  * sum(DISTINCT) over a window.
  *
  * Reference surface: QueryTest.scala:854-939, 1181-1248;
  * TabApiTest.scala:314-357, 455-464; TableOverWindow.scala:44-380.
  *
  * Determinism: running double sums are frame-order-dependent AND
  * engines may re-associate (DuckDB uses a segment tree for sliding
  * frames) — so every windowed sum goes through DECIMAL (exact,
  * associative) and back to double. Window ORDER BY always carries a
  * unique tiebreak column.
  *
  * Scale: each query is one shuffle on the partition key + one sort —
  * the same plan shape at any SF; no global sort except final output
  * ordering (which the driver compare requires).
  */
object OverWindowQueries extends GroupBase {

  private val Dec = "decimal(30,8)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // running sum, ROWS UNBOUNDED PRECEDING (QueryTest.scala:854-939)
    "over_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(Dec)).over(w).cast("double").as("run_sum"))
        .orderBy("user_id", "event_id")
    }),

    // sliding frame: 2 PRECEDING..CURRENT (TableOverWindow.scala:44-380)
    "over_sliding" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(Dec)).over(w).cast("double").as("win_sum"),
          count(lit(1)).over(w).as("win_n"))
        .orderBy("user_id", "event_id")
    }),

    // rank / dense_rank / row_number top-N (QueryTest.scala:1181-1208)
    "over_rank_topn" -> ((s, d) => {
      val byValue = Window.partitionBy("event_type").orderBy(col("value").desc)
      val unique = Window.partitionBy("event_type")
        .orderBy(col("value").desc, col("event_id"))
      t(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"),
          rank().over(byValue).as("rnk"),
          dense_rank().over(byValue).as("drnk"),
          row_number().over(unique).as("rn"))
        .filter(col("rn") <= 5)
        .orderBy("event_type", "rn")
    }),

    // dedup via row_number()=1 (QueryTest.scala:1219-1248): latest
    // event per (user, type)
    "over_dedup" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type")
    }),

    // RANGE BETWEEN INTERVAL ... PRECEDING (time-range frame;
    // TableOverWindow RANGE variants) — SQL frontend, count-only
    // (counts are exact; the range frame is the operator under test)
    "over_range_time" -> ((s, d) =>
      sql(s, d,
        """SELECT event_id, user_id,
                  count(*) OVER (PARTITION BY user_id ORDER BY ts
                                 RANGE BETWEEN INTERVAL 15 MINUTES PRECEDING
                                 AND CURRENT ROW) AS n_15m
           FROM events ORDER BY user_id, event_id""")),

    // lag / lead / delta (over-window scalar nav functions)
    "over_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_v"),
          lead(col("value"), 1).over(w).as("next_v"),
          (col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0))).as("delta"))
        .orderBy("user_id", "event_id")
    }),

    // first_value / last_value over the whole partition
    // relative-rank battery: percent_rank / cume_dist over a total
    // per-partition order (orderkey tiebreak -> no ties -> both are
    // exact rationals, deterministic cross-engine). One partitioned
    // sort, streams like every other OVER window.
    "over_pct_cume" -> ((s, d) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    }),

    "over_first_last" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(w).as("last_v"))
        .orderBy("user_id", "event_id")
    }),

    // sum(DISTINCT) over a running window (QueryTest.scala:875-896;
    // TabApiTest.scala:455-464): Spark windows reject DISTINCT, so the
    // engine rewrites it as collect_set + fold — exact for integral
    // types, order-independent by construction.
    "over_sum_distinct" -> ((s, d) => {
      val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("event_type"), col("event_id"),
          // DECIMAL(38,0) fold + try_cast: a MaxValue sentinel id in
          // the distinct set overflows the BIGINT running sum under
          // ANSI (NumExec sweep, round 10); exact on clean data
          aggregate(collect_set(col("user_id")).over(w),
            lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"),
            (acc, x) => acc + x.cast("decimal(38,0)"))
            .try_cast("long").as("sum_dist_users"))
        .orderBy("event_type", "event_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "over_running_sum" ->
      """SELECT event_id, user_id,
                CAST(sum(CAST(value AS DECIMAL(30,8)))
                     OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) AS run_sum
         FROM events ORDER BY user_id, event_id""",
    "over_sliding" ->
      """SELECT event_id, user_id,
                CAST(sum(CAST(value AS DECIMAL(30,8)))
                     OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS win_sum,
                count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS win_n
         FROM events ORDER BY user_id, event_id""",
    "over_rank_topn" ->
      """SELECT event_type, event_id, value, CAST(rnk AS INT) AS rnk,
                CAST(drnk AS INT) AS drnk, CAST(rn AS INT) AS rn FROM (
           SELECT event_type, event_id, value,
                  rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS rnk,
                  dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS drnk,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY value DESC, event_id) AS rn
           FROM events) x
         WHERE rn <= 5 ORDER BY event_type, rn""",
    "over_dedup" ->
      """SELECT user_id, event_type, event_id FROM (
           SELECT user_id, event_type, event_id,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                              event_id DESC) AS rn
           FROM events) x
         WHERE rn = 1 ORDER BY user_id, event_type""",
    "over_range_time" ->
      """SELECT event_id, user_id,
                count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                               RANGE BETWEEN INTERVAL 15 MINUTES PRECEDING
                               AND CURRENT ROW) AS n_15m
         FROM events ORDER BY user_id, event_id""",
    "over_lag_lead" ->
      """SELECT event_id, user_id, value,
                lag(value, 1) OVER w AS prev_v,
                lead(value, 1) OVER w AS next_v,
                value - COALESCE(lag(value, 1) OVER w, 0.0) AS delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY user_id, event_id""",
    "over_pct_cume" ->
      """SELECT o_orderkey, o_orderstatus,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderkey""",
    "over_first_last" ->
      """SELECT event_id, user_id,
                first_value(value) OVER w AS first_v,
                last_value(value) OVER w AS last_v
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY user_id, event_id""",
    "over_sum_distinct" ->
      """SELECT event_type, event_id,
                CAST(list_sum(list_distinct(array_agg(user_id)
                  OVER (PARTITION BY event_type ORDER BY CAST(ts AS TIMESTAMP), event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS BIGINT) AS sum_dist_users
         FROM events ORDER BY event_type, event_id""",
  )
}
