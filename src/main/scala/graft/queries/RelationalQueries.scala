package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact

/** §2.3 projection/filter/row transforms, §2.7 sort/limit, §2.8 set ops.
  *
  * Reference surface: Transform.scala:21-116 (map/filter/flatMap),
  * QueryTest.scala:128-344 (set ops, distinct, sort/limit),
  * DataSetFunc.scala:595-658, 989-1013 (sortPartition/first/zipWithIndex).
  *
  * All are single-pass DataFrame ops: filters/projections reach the
  * parquet scan (PushedFilters), set ops hash-shuffle once on the full
  * row — at 100 TB each stays a one-shuffle plan.
  */
object RelationalQueries extends GroupBase {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // filter + project + computed column (Transform.scala:21-116;
    // computed columns CreateTest.scala:171-196)
    "rel_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01") &&
                col("l_shipdate") <  lit("1999-01-01") &&
                col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("l_orderkey", "l_linenumber")),

    // CASE WHEN buckets + group count (QueryTest.scala computed-col idiom)
    "rel_case_when" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 10000, "small")
            .when(col("o_totalprice") < 100000, "mid")
            .otherwise("large"))
        .groupBy("bucket", "o_orderstatus").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket", "o_orderstatus")),

    // SELECT DISTINCT (QueryTest.scala:317-344)
    "rel_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    // ORDER BY + LIMIT + OFFSET (QueryTest.scala:296-315; TabApiTest.scala:978-1000)
    "rel_sort_limit_offset" -> ((s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(5).limit(10)),

    // UNION ALL (QueryTest.scala:128-154)
    "rel_union_all" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderstatus")
        .unionAll(o.filter(col("o_orderstatus") === "O" && col("o_totalprice") > 400000)
          .select("o_orderkey", "o_orderstatus"))
        .orderBy("o_orderkey", "o_orderstatus")
    }),

    // UNION with dedup (QueryTest.scala:128-154)
    "rel_union_distinct" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 300000).select("o_custkey")
        .union(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .distinct().orderBy("o_custkey")
    }),

    // EXCEPT (QueryTest.scala:166-212)
    "rel_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct())
        .orderBy("nk")),

    // INTERSECT (QueryTest.scala:166-212)
    "rel_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct())
        .orderBy("nk")),

    // INTERSECT ALL — multiset (TabApiTest.scala:860-975)
    "rel_intersect_all" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(year(col("l_shipdate")) < 1998).select("l_returnflag", "l_linestatus")
        .intersectAll(li.filter(year(col("l_shipdate")) >= 1998)
          .select("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // EXCEPT ALL — multiset (TabApiTest.scala:860-975). Sides chosen
    // so the result is NON-empty at every SF: the original `ln <= 2
    // minus ln > 2` was deterministically empty (line numbers are
    // ~uniform over 1..7, so each flag's left count < right count and
    // the max(0, nL - nR) clamp zeroed every value — a green row that
    // never exercised multiset subtraction, the pat_fraud vacuity
    // class found by the round-12 sweep-cell audit). `ln <= 2` vs
    // `ln = 3` makes the subtraction real on every value: nL ≈ 2·nR
    // per flag, so ~1/7 of the table survives as nL − nR copies
    // (899 rows at sf0.001, 8684 at sf0.01).
    "rel_except_all" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.filter(col("l_linenumber") <= 2).select("l_returnflag")
        .exceptAll(li.filter(col("l_linenumber") === 3).select("l_returnflag"))
        .orderBy("l_returnflag")
    }),

    // fromElements/fromCollection (Source.scala:21-64) — inline rows
    // joined against a table; the tiny side broadcasts by size.
    "rel_inline_values" -> ((s, d) => {
      import s.implicits._
      val tags = Seq((0, "west"), (1, "east"), (2, "north"))
        .toDF("rk", "tag")
      t(s, d, "region")
        .join(tags, col("r_regionkey") === col("rk"))
        .select("r_name", "tag").orderBy("r_name")
    }),

    // zipWithIndex (DataSetFunc.scala:989-1013): deterministic dense ids.
    // monotonically_increasing_id is partition-dependent and an
    // unpartitioned row_number window is a single-task sort of the
    // whole table, so the distributed form is ZipIndex's two-pass
    // range-partitioned index (per-partition counts -> broadcast
    // prefix offsets). The trailing limit plans as
    // TakeOrderedAndProject: per-partition top-100 heaps, no global
    // sort.
    "rel_zip_index" -> ((s, d) => {
      val (indexed, _) = graft.operators.ZipIndex.withIndex(
        t(s, d, "orders").select("o_orderkey"), "idx", col("o_orderkey"))
      indexed.withColumn("idx", col("idx").cast("int"))
        .orderBy("o_orderkey").limit(100)
    }),

    // PIVOT: long → wide with an EXPLICIT value list (never the
    // inferred-values form — that adds a driver-side distinct pass
    // over the corpus before planning)
    "rel_pivot" -> ((s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // UNPIVOT/melt: wide → long (ids=user_id, values=per-type counts)
    "rel_unpivot" -> ((s, d) => {
      val wide = t(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view"))
        .agg(count(lit(1))).na.fill(0L)
      wide.unpivot(Array(col("user_id")),
          Array(col("click"), col("view")), "etype", "cnt")
        .orderBy("user_id", "etype")
    }),

    // CDC changelog materialization (debezium-json connector shape,
    // TableSQLFunc.scala:1122-1138): events become an op stream
    // (signup=create, error=delete tombstone, rest=update); the
    // materialized table is latest-op-per-key with deleted keys
    // tombstoned out. One window shuffle on the key at any scale.
    "rel_cdc_materialize" -> ((s, d) => {
      val changelog = t(s, d, "events").select(
        col("user_id"), col("event_id"), col("ts"), col("value"),
        when(col("event_type") === "signup", "c")
          .when(col("event_type") === "error", "d")
          .otherwise("u").as("op"))
      graft.streaming.Cdc.materialize(changelog, "user_id", Seq("ts", "event_id"))
        .select(col("user_id"), col("op"),
          col("event_id").as("last_event"), col("value").as("last_value"))
        .orderBy("user_id")
    }),

    // Retract-stream materialization (toRetractStream,
    // TableSQLFunc.scala:846-855; RowKind op column QueryTest.scala:
    // 393-425): the full +I/-U/+U changelog a per-user running
    // count+sum aggregate would emit while consuming events in
    // (ts, event_id) order — the batch-verifiable twin of
    // streaming/Changelog.attach (whose delta-diff ChangelogSpec
    // asserts live; -D needs observed deletion, so it stays
    // spec-covered). First event per key emits +I; every later one
    // emits -U of the previous aggregate then +U of the new. The sum
    // rides floor(value*100) BIGINTs so accumulation is exact and
    // order-stable on both engines (raw double running sums are not).
    // One window shuffle on user_id — the keyed-history shape.
    "rel_retract_log" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val base = t(s, d, "events").filter(col("user_id") < 5)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(Exact.finiteOrNull(col("value")) * 100).cast("long").as("v"))
        .withColumn("seq", row_number().over(w).cast("long"))
        .withColumn("acc", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("pacc", lag(col("acc"), 1).over(w))
      val ins = base.filter(col("seq") === 1)
        .select(col("user_id"), col("seq"), lit("+I").as("op"),
          lit(1L).as("cnt"), col("acc"))
      val ret = base.filter(col("seq") > 1)
        .select(col("user_id"), col("seq"), lit("-U").as("op"),
          (col("seq") - 1).as("cnt"), col("pacc").as("acc"))
      val upd = base.filter(col("seq") > 1)
        .select(col("user_id"), col("seq"), lit("+U").as("op"),
          col("seq").as("cnt"), col("acc"))
      ins.unionByName(ret).unionByName(upd)
        .orderBy("user_id", "seq", "op")
    }),

    // SCD type-2 dimension build (the warehouse twin of the CDC
    // latest-wins materialization in rel_cdc_materialize): each
    // 'click' event is an attribute change for its user; the output
    // is one validity interval per change — valid_from = the change's
    // event time, valid_to = the NEXT change's time (NULL while
    // current), plus version number and is_current flag. One window
    // shuffle partitioned by user_id: per-key history is bounded by a
    // user's own activity, so the window buffers human-scale rows no
    // matter the corpus size — the same keyed-history argument as
    // rel_retract_log. The value rides floor(value*100) BIGINTs so
    // the attribute compares exactly across engines.
    "rel_scd2" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events").filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(Exact.finiteOrNull(col("value")) * 100).cast("long").as("v"))
        .select(col("user_id"), col("v"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"),
          row_number().over(w).cast("long").as("version"),
          lead(col("ts"), 1).over(w).isNull.as("is_current"))
        .orderBy("user_id", "version")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "rel_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",
    "rel_case_when" ->
      """SELECT CASE WHEN o_totalprice < 10000 THEN 'small'
                     WHEN o_totalprice < 100000 THEN 'mid'
                     ELSE 'large' END AS bucket,
                o_orderstatus, count(*) AS cnt
         FROM orders GROUP BY 1, 2 ORDER BY bucket, o_orderstatus""",
    "rel_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "rel_sort_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10 OFFSET 5""",
    "rel_union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_orderkey, o_orderstatus FROM orders
         WHERE o_orderstatus = 'O' AND o_totalprice > 400000
         ORDER BY o_orderkey, o_orderstatus""",
    "rel_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 300000
         UNION
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
         ORDER BY o_custkey""",
    "rel_except" ->
      """SELECT DISTINCT c_nationkey AS nk FROM customer
         EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "rel_intersect" ->
      """SELECT DISTINCT c_nationkey AS nk FROM customer
         INTERSECT SELECT DISTINCT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "rel_intersect_all" ->
      """SELECT l_returnflag, l_linestatus FROM lineitem WHERE year(l_shipdate) < 1998
         INTERSECT ALL
         SELECT l_returnflag, l_linestatus FROM lineitem WHERE year(l_shipdate) >= 1998
         ORDER BY l_returnflag, l_linestatus""",
    "rel_except_all" ->
      """SELECT l_returnflag FROM lineitem WHERE l_linenumber <= 2
         EXCEPT ALL
         SELECT l_returnflag FROM lineitem WHERE l_linenumber = 3
         ORDER BY l_returnflag""",
    "rel_inline_values" ->
      """SELECT r_name, tag FROM region
         JOIN (VALUES (0, 'west'), (1, 'east'), (2, 'north')) v(rk, tag)
           ON r_regionkey = rk
         ORDER BY r_name""",
    "rel_zip_index" ->
      """SELECT o_orderkey, CAST((row_number() OVER (ORDER BY o_orderkey)) - 1 AS INT) AS idx
         FROM orders ORDER BY o_orderkey LIMIT 100""",
    "rel_pivot" ->
      """SELECT user_id,
                count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
                count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                count(CASE WHEN event_type = 'error' THEN 1 END) AS error
         FROM events GROUP BY user_id ORDER BY user_id""",
    "rel_unpivot" ->
      """WITH wide AS (
           SELECT user_id,
                  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
           FROM events GROUP BY user_id)
         SELECT user_id, etype, cnt FROM (
           SELECT user_id, 'click' AS etype, click AS cnt FROM wide
           UNION ALL
           SELECT user_id, 'view' AS etype, view AS cnt FROM wide)
         ORDER BY user_id, etype""",
    "rel_cdc_materialize" ->
      """SELECT user_id, op, event_id AS last_event, value AS last_value
         FROM (SELECT user_id, event_id, value,
                      CASE WHEN event_type = 'signup' THEN 'c'
                           WHEN event_type = 'error' THEN 'd'
                           ELSE 'u' END AS op,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
               FROM events) x
         WHERE rn = 1 AND op <> 'd' ORDER BY user_id""",
    "rel_retract_log" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(ts AS TIMESTAMP) AS tts,
                           CAST(floor(value * 100) AS BIGINT) AS v
                    FROM events WHERE user_id < 5),
          i AS (SELECT user_id,
                       CAST(row_number() OVER (PARTITION BY user_id
                              ORDER BY tts, event_id) AS BIGINT) AS seq,
                       CAST(sum(v) OVER (PARTITION BY user_id
                              ORDER BY tts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS BIGINT) AS acc
                FROM e),
          b AS (SELECT user_id, seq, acc,
                       lag(acc) OVER (PARTITION BY user_id ORDER BY seq) AS pacc
                FROM i)
          SELECT user_id, seq, '+I' AS op, CAST(1 AS BIGINT) AS cnt, acc
          FROM b WHERE seq = 1
          UNION ALL
          SELECT user_id, seq, '-U' AS op, seq - 1 AS cnt, pacc AS acc
          FROM b WHERE seq > 1
          UNION ALL
          SELECT user_id, seq, '+U' AS op, seq AS cnt, acc
          FROM b WHERE seq > 1
          ORDER BY user_id, seq, op""",
    "rel_scd2" ->
      """WITH e AS (SELECT user_id, event_id,
                           CAST(ts AS TIMESTAMP) AS tts,
                           CAST(floor(value * 100) AS BIGINT) AS v
                    FROM events WHERE event_type = 'click')
         SELECT user_id, v, tts AS valid_from,
                lead(tts) OVER w AS valid_to,
                CAST(row_number() OVER w AS BIGINT) AS version,
                (lead(tts) OVER w IS NULL) AS is_current
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tts, event_id)
         ORDER BY user_id, version""",
  )
}
