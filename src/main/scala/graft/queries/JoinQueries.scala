package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Exact
import graft.core.ExactSql
import graft.operators.AsOfJoin

/** §2.4 joins: equi (all types), semi/anti, cross, hints, cogroup,
  * interval join, window join, as-of/temporal join.
  *
  * Reference surface: QueryTest.scala:216-247, 587-700, 1040-1091;
  * DataSetFunc.scala:334-517; DataStreamFunc.scala:360-505, 1514-1685;
  * TableSQLFunc.scala:1223-1341, 1462-1530.
  *
  * Scale notes (100 TB):
  *   - region/nation are the only broadcast sides (Tables.broadcastable);
  *     fact-fact joins shuffle on their keys and rely on AQE for skew.
  *   - interval/window joins always carry an EQUI key (user_id / window
  *     bucket) so Catalyst picks SortMerge/ShuffledHash, never a
  *     nested-loop range join.
  *   - the as-of join is the one-shuffle sort-merge design (AsOfJoin).
  */
object JoinQueries extends GroupBase {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // inner equi-join chain + broadcast dims (QueryTest.scala:587-700)
    "join_inner_chain" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("cnt"))
        .orderBy("r_name")),

    // left outer join + agg over possibly-empty side (DataSetFunc.scala:394-445)
    "join_left" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(Exact.dsum(col("o_totalprice")),
               lit(0.0)).as("spend"))
        .orderBy("c_custkey")),

    // right outer join (same result shape, right-join plan)
    "join_right" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             coalesce(Exact.dsum(col("o_totalprice")),
               lit(0.0)).as("spend"))
        .orderBy("c_custkey")),

    // full outer join (DataSetFunc.scala:394-445)
    "join_full" -> ((s, d) => {
      val cn = t(s, d, "customer").filter(col("c_nationkey") < 15)
        .select(col("c_nationkey").as("cn")).distinct()
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("sn")).distinct()
      cn.join(sn, col("cn") === col("sn"), "full")
        .orderBy(col("cn").asc_nulls_first, col("sn").asc_nulls_first)
    }),

    // cross join (DataSetFunc.scala:477-517)
    "join_cross" -> ((s, d) =>
      t(s, d, "region")
        .crossJoin(t(s, d, "orders").select("o_orderstatus").distinct())
        .select("r_name", "o_orderstatus").orderBy("r_name", "o_orderstatus")),

    // semi join via EXISTS semantics (QueryTest.scala:216-247)
    "join_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // anti join via NOT EXISTS semantics (QueryTest.scala:216-247)
    // big-spender complement: customers with no order above 300k.
    // (Every sf0.01 customer has SOME order, so the bare no-orders
    // variant was vacuously green on 0 rows — this predicate keeps
    // genuine anti-join survivors at every SF.)
    "join_anti" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")),

    // physical join-strategy hints (DataSetFunc.scala:334-384):
    // SHUFFLE_HASH for the fact-fact pair, broadcast for the dim.
    "join_hints" -> ((s, d) =>
      t(s, d, "lineitem").hint("SHUFFLE_HASH")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
             Exact.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")),

    // explicit salted skew join (operators/Skew): the fact side gets
    // an nSalts-way salt, the dim side replicates across salts, so one
    // hot supplier key spreads over 8 reducers instead of melting a
    // single one. AQE's runtime skew split covers sort-merge joins;
    // explicit salting is the tool when skew is known a priori. The
    // salt is internal — the result (and the oracle) is the plain
    // equi-join, which is exactly the point: same answer, flatter
    // reducers.
    "join_skew" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"), col("l_extendedprice"))
      val supp = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      graft.operators.Skew.saltedJoin(li, supp, "s_suppkey", 8)
        .groupBy(col("s_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("nation")
    }),

    // cogroup as relational full-outer of two grouped aggregates
    // (DataSetFunc.scala:456-465; DataStreamFunc.scala:360-505)
    "join_cogroup" -> ((s, d) => {
      val c = t(s, d, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val p = t(s, d, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, Seq("nk"), "full")
        .select(col("nk"), coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    }),

    // interval join (DataStreamFunc.scala:1640-1685; QueryTest.scala:1040-1091):
    // signup -> purchase pairs within 1h, equi key user_id keeps the
    // plan a shuffled equi-join with a range residual.
    "join_interval" -> ((s, d) => {
      val e = t(s, d, "events")
      val a = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("a_ts"))
      val b = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("b_ts"))
      a.join(b, Seq("user_id"))
        .filter(col("b_ts") > col("a_ts") &&
                col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    }),

    // tumbling window join (DataStreamFunc.scala:1514-1637): same
    // 1h bucket + same user, click joined to view counts.
    "join_window" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("user_id"))
        .agg(count(lit(1)).as("n_click"))
      val views = e.filter(col("event_type") === "view")
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("user_id"))
        .agg(count(lit(1)).as("n_view"))
      clicks.join(views, Seq("ws", "user_id"))
        .orderBy("ws", "user_id")
    }),

    // as-of / temporal join (TableSQLFunc.scala:1462-1530): each
    // purchase event enriched with the user's most recent prior click
    // value; one-shuffle sort-merge design (AsOfJoin).
    "join_asof" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_value"), col("event_id").asc_nulls_first)
        .select("event_id", "user_id", "click_value")
        .orderBy("event_id")
    }),

    // same as-of semantics through the custom physical operator
    // (AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec): verified
    // against the identical DuckDB ASOF JOIN oracle
    "join_asof_native" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      AsOfJoin.asOfNative(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_value"))
        .select("event_id", "user_id", "click_value")
        .orderBy("event_id")
    }),

    // As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`, the
    // knob every feature-store point-in-time join exposes): the most
    // recent click still counts only if it happened within the last
    // 10 minutes — a staler in-force value yields the left-outer
    // NULLs instead of silently attributing a purchase to an ancient
    // click. Same custom AsOfJoinExec single-pass merge (the
    // tolerance is one comparison on the in-force row, no extra state
    // or buffering); DuckDB mirrors by nulling the ASOF match past
    // the window.
    "join_asof_tol" -> ((s, d) => {
      val e = t(s, d, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"))
      AsOfJoin.asOfNative(purchases, clicks, Seq("user_id"), "ts", "ts",
          Seq("click_value"), toleranceMs = 10 * 60 * 1000L)
        .select("event_id", "user_id", "click_value")
        .orderBy("event_id")
    }),

    // SymSpell-style fuzzy self-join (edit distance <= 1) over customer
    // names — the entity-resolution join the reference's exact equi
    // joins can't express. Each name emits its deletion neighborhood
    // (itself + every single-character deletion) as blocking keys; two
    // names within one edit always share a variant, so candidates are
    // a HASH join on O(N·L) short strings — never the O(N²) cross join
    // a naive fuzzy join needs — and the real `levenshtein` (codegen'd
    // built-in) verifies only the blocked pairs. A variant is shared by
    // at most ~|alphabet| names, so there are no hot blocking keys at
    // 100 TB; the ck<=300 filter just bounds the demo output.
    //
    // PREFIX-bounded deletes (SymSpell's prefix optimization, lossless
    // for d=1): variants are generated on the first FUZZY_P chars only.
    // Any pair at edit distance 1 still shares a variant — an edit at
    // position i < P leaves both prefixes one shared delete apart, an
    // edit at i >= P leaves the prefixes equal — while a pathological
    // 100 KB "name" (a routine state in dirty data; TextExec sweep,
    // round 10) emits P bounded variants instead of L variants of
    // length L = O(L²) bytes, which OOMed the candidate build. The
    // banded levenshtein(_, _, 1) verifier is O(L) per pair, not
    // O(L²), for the same reason.
    "join_fuzzy" -> ((s, d) => {
      val P = 24 // >= real name lengths, so clean data is unaffected
      val names = t(s, d, "customer")
        .filter(col("c_custkey") <= 300)
        .select(col("c_custkey").as("ck"), col("c_name").as("nm"))
      val pfx = col("nm").substr(lit(1), lit(P))
      val variants = names.select(col("ck"), col("nm"), explode(
        array_union(array(pfx),
          transform(sequence(lit(1), length(pfx)), i =>
            concat(pfx.substr(lit(1), i - 1),
              pfx.substr(i + 1, length(pfx)))))).as("v"))
      // The verify predicates live IN the join condition, cheapest
      // first, because conjunct order is evaluation order in the
      // join residual: `<` kills the (x, x) bucket self-matches and
      // the length band kills cross-length pairs BEFORE levenshtein
      // runs. Order matters operationally: a bucket of k identical
      // long strings produces k² residual evaluations, and Spark's
      // thresholded levenshtein is O(L²) for non-ASCII input — with
      // 56 KB dirty names that was hours of DP on pairs the cheap
      // predicates reject in O(L) (TextExec sweep hang, round 10; a
      // separate .filter() after the join let Catalyst push
      // levenshtein in FRONT of the `<`).
      variants.as("a").join(variants.as("b"),
          col("a.v") === col("b.v") &&
          col("a.nm") < col("b.nm") &&
          abs(length(col("a.nm")) - length(col("b.nm"))) <= 1 &&
          // thresholded levenshtein returns -1 when the bound is blown
          levenshtein(col("a.nm"), col("b.nm"), 1) >= 0)
        .select(col("a.ck").as("ck1"), col("b.ck").as("ck2"),
          col("a.nm").as("nm1"), col("b.nm").as("nm2"))
        .distinct()
        .orderBy("ck1", "ck2")
    }),

    // numeric-band range join (the value-proximity sibling of
    // join_interval's time band, DataStreamFunc.scala:1640-1685):
    // near-price order pairs (|Δprice| <= 25), per-order neighbor
    // count + closest gap — the duplicate-charge / price-collision
    // audit shape. A naive plan is the O(N²) cross join with a range
    // residual; this is the BINNED range join (the strategy range-join
    // hints install in warehouse engines): bucket width == the band,
    // probe side explodes to its 3 covering buckets, build side keeps
    // one — so candidates meet in an EQUI hash join on the bucket id
    // and the exact predicate verifies only the ~3/N-th of pairs that
    // share a bucket. Each qualifying pair meets exactly once (the
    // build bucket is a function of the row, probe buckets are
    // distinct), so no post-join dedup. Scale: shuffle keys are
    // bucket ids (dense integers, ~uniform under any non-degenerate
    // price distribution), candidate fan-out is bounded by band
    // density, never N².
    "join_range" -> ((s, d) => {
      val W = 25.0
      val o = t(s, d, "orders")
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      // finiteOrNull: a NaN/Inf price can never satisfy |ap-p| <= W,
      // and its ANSI cast to a bucket would throw — a null bucket
      // drops the row from the equi-join instead.
      val build = o.withColumn("bkt",
        floor(Exact.finiteOrNull(col("p")) / W).cast("long"))
      val probe = build.select(col("k").as("ak"), col("p").as("ap"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
      probe.join(build, Seq("bkt"))
        .filter(col("ak") < col("k") && abs(col("ap") - col("p")) <= W)
        .groupBy(col("ak").as("o_orderkey"))
        .agg(count(lit(1)).as("n_near"),
          min(abs(col("ap") - col("p"))).as("min_gap"))
        .orderBy("o_orderkey")
    }),
  )

  private val rev = "l_extendedprice * (1.0 - l_discount)"

  def oracleSql: Map[String, String] = Map(
    "join_inner_chain" ->
      s"""SELECT r_name, ${ExactSql.dsum(rev)} AS revenue, count(*) AS cnt
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name ORDER BY r_name""",
    "join_left" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
          COALESCE(${ExactSql.dsum("o_totalprice")}, CAST(0 AS DOUBLE)) AS spend
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey ORDER BY c_custkey""",
    "join_right" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
          COALESCE(${ExactSql.dsum("o_totalprice")}, CAST(0 AS DOUBLE)) AS spend
          FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
          GROUP BY c_custkey ORDER BY c_custkey""",
    "join_full" ->
      """SELECT cn, sn FROM
           (SELECT DISTINCT c_nationkey AS cn FROM customer WHERE c_nationkey < 15) c
         FULL OUTER JOIN
           (SELECT DISTINCT s_nationkey AS sn FROM supplier) s
         ON cn = sn ORDER BY cn ASC NULLS FIRST, sn ASC NULLS FIRST""",
    "join_cross" ->
      """SELECT r_name, o_orderstatus
         FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) o
         ORDER BY r_name, o_orderstatus""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         ORDER BY c_custkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "join_hints" ->
      s"""SELECT p_brand, count(*) AS cnt, ${ExactSql.dsum("l_quantity")} AS sum_qty
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY p_brand ORDER BY p_brand""",
    "join_skew" ->
      s"""SELECT s_nationkey AS nation, count(*) AS n_items,
                 ${ExactSql.dsum("l_extendedprice")} AS revenue
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1 ORDER BY 1""",
    "join_cogroup" ->
      """SELECT COALESCE(c.nk, s.nk) AS nk,
                COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
         FULL OUTER JOIN
              (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
         ON c.nk = s.nk ORDER BY nk""",
    "join_interval" ->
      """SELECT a.user_id, count(*) AS n_pairs
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS a_ts FROM events
               WHERE event_type = 'signup') a
         JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS b_ts FROM events
               WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id
          AND b_ts > a_ts AND b_ts <= a_ts + INTERVAL 1 HOUR
         GROUP BY a.user_id ORDER BY a.user_id""",
    "join_window" ->
      """SELECT c.ws, c.user_id, n_click, n_view
         FROM (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, user_id,
                      count(*) AS n_click
               FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
         JOIN (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws, user_id,
                      count(*) AS n_view
               FROM events WHERE event_type = 'view' GROUP BY 1, 2) v
           ON c.ws = v.ws AND c.user_id = v.user_id
         ORDER BY c.ws, c.user_id""",
    "join_asof_native" ->
      """SELECT event_id, p.user_id, c.value AS click_value
         FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
               WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
               WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY event_id""",
    "join_asof_tol" ->
      """SELECT event_id, p.user_id,
                CASE WHEN c.ts IS NOT NULL
                      AND p.ts - c.ts <= INTERVAL 10 MINUTES
                     THEN c.value END AS click_value
         FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
               WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
               WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY event_id""",
    "join_asof" ->
      """SELECT event_id, p.user_id, c.value AS click_value
         FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
               WHERE event_type = 'purchase') p
         ASOF LEFT JOIN
              (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
               WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY event_id""",
    "join_fuzzy" ->
      """WITH names AS (SELECT c_custkey AS ck, c_name AS nm FROM customer
                        WHERE c_custkey <= 300),
         v AS (SELECT ck, nm, unnest(list_distinct(list_append(
                 list_transform(range(1, length(nm) + 1),
                   i -> substr(nm, 1, CAST(i - 1 AS INT)) ||
                        substr(nm, CAST(i + 1 AS INT), length(nm))), nm))) AS var
               FROM names),
         cand AS (SELECT DISTINCT a.ck AS ck1, b.ck AS ck2,
                         a.nm AS nm1, b.nm AS nm2
                  FROM v a JOIN v b ON a.var = b.var AND a.nm < b.nm)
         SELECT ck1, ck2, nm1, nm2 FROM cand
         WHERE levenshtein(nm1, nm2) <= 1 ORDER BY ck1, ck2""",
    "join_range" ->
      """SELECT a.o_orderkey AS o_orderkey, count(*) AS n_near,
                min(abs(a.o_totalprice - b.o_totalprice)) AS min_gap
         FROM orders a JOIN orders b
           ON b.o_totalprice >= a.o_totalprice - CAST(25.0 AS DOUBLE)
          AND b.o_totalprice <= a.o_totalprice + CAST(25.0 AS DOUBLE)
          AND a.o_orderkey < b.o_orderkey
         GROUP BY 1 ORDER BY 1""",
  )
}
