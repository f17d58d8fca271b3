package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{KeyedEvent, MrParser, SeqPattern}

/** §2.10/§2.11 pattern detection, batch-relational form of the
  * reference's concrete CEP scenarios. The generic NFA operator for
  * streaming lives in graft.streaming (flatMapGroupsWithState); these
  * queries express the same *detections* declaratively so Catalyst
  * plans them (and the DuckDB oracle can verify them).
  *
  * Reference scenarios:
  *   - login-fail: N fails within T (FailMatchByCep.scala;
  *     CEPDemo.scala times(n)+within)
  *   - order timeout: A not followed by B within T
  *     (TimeoutMatchByCep.scala, OrderPaymentCheckByCEPApp.scala:36-50)
  *   - fraud: small-then-large within T (FraudDetector.scala:17-60)
  *   - two-stream match (TxMatchDetection.scala:9-47)
  *
  * Scale: all four are equi-keyed self-joins or time-range window
  * frames — one shuffle on user_id; the range predicate is a residual
  * filter on a sort-merge join, never a nested loop.
  */
object PatternQueries extends GroupBase {

  /** lead()-replay oracle for the S E{2} P strict sequence — shared by
    * the programmatic (pat_mr) and SQL-parser (pat_mr_sql) forms. */
  private val MrOracle =
    """WITH f AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
         FROM events WHERE event_type IN ('signup', 'error', 'purchase')),
       l AS (
         SELECT user_id, ts, event_type, value AS v0,
                lead(event_type, 1) OVER w AS k1, lead(value, 1) OVER w AS v1,
                lead(event_type, 2) OVER w AS k2, lead(value, 2) OVER w AS v2,
                lead(event_type, 3) OVER w AS k3, lead(value, 3) OVER w AS v3,
                lead(ts, 3) OVER w AS t3
         FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, value))
       SELECT user_id, ts AS m_start, t3 AS m_end,
              ((((CAST(0.0 AS DOUBLE) + v0) + v1) + v2) + v3) AS sum_v,
              CAST(4 AS INT) AS n
       FROM l
       WHERE event_type = 'signup' AND k1 = 'error' AND k2 = 'error'
         AND k3 = 'purchase' AND t3 <= ts + INTERVAL 3 DAY
       ORDER BY user_id, m_start"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A followed by B within 1h (CEP followedBy + within):
    // signups that converted to a purchase
    "pat_seq_within" -> ((s, d) =>
      sql(s, d,
        """SELECT a.user_id, count(*) AS n_converted
           FROM (SELECT user_id, ts, event_id FROM events
                 WHERE event_type = 'signup') a
           WHERE EXISTS (
             SELECT 1 FROM events b
             WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
           GROUP BY a.user_id ORDER BY a.user_id""")),

    // N fails within T (login-fail, times(3)): error events whose
    // trailing-6h error count reaches 3. The original 30m horizon
    // never fired at sf0.01 (max trailing count 2) — a detector whose
    // green row never detected anything is a blind spot, so the
    // window is widened until genuine matches exist at test scale.
    "pat_nfails" -> ((s, d) =>
      sql(s, d,
        """SELECT user_id, event_id, n_err FROM (
             SELECT user_id, event_id,
                    count(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 6 HOURS PRECEDING
                                   AND CURRENT ROW) AS n_err
             FROM events WHERE event_type = 'error') x
           WHERE n_err >= 3 ORDER BY user_id, event_id""")),

    // A NOT followed by B within T (order timeout): signups with no
    // purchase within 1h
    "pat_timeout" -> ((s, d) =>
      sql(s, d,
        """SELECT a.user_id, a.event_id FROM (
             SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'signup') a
           WHERE NOT EXISTS (
             SELECT 1 FROM events b
             WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
               AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR)
           ORDER BY a.user_id, a.event_id""")),

    // small-probe-then-large purchase (FraudDetector.scala:17-60):
    // consecutive-event variant via lag(). Thresholds calibrated to
    // the generator's value distribution (p90 ≈ 107, max ≈ 371) so
    // real matches exist at sf0.01 — the original 10/400-within-1m
    // combination was unsatisfiable in this data and the detector
    // passed vacuously on 0 rows.
    "pat_fraud" -> ((s, d) =>
      sql(s, d,
        """SELECT user_id, event_id, prev_v, value FROM (
             SELECT user_id, event_id, value, ts,
                    lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             FROM events WHERE event_type = 'purchase') x
           WHERE prev_v < 150.0 AND value > 250.0
             AND ts <= prev_ts + INTERVAL 1 DAY
           ORDER BY user_id, event_id""")),

    // MATCH_RECOGNIZE via the text frontend (MrParser → SeqPattern
    // NFA run as a batch flatMapGroupsWithState): strict-contiguous
    // signup → error{2} → purchase per user within 3 days, all
    // matches (NO SKIP). The oracle replays the same strict sequence
    // with lead() over the identically-ordered per-user row stream.
    // Scale: one shuffle on user_id; per-key NFA state is bounded by
    // the WITHIN horizon, as in the streaming flavor.
    "pat_mr" -> ((s, d) => {
      import s.implicits._
      val pat = MrParser.parse(
        "PATTERN (S E{2} P) WITHIN 3 DAYS AFTER MATCH NO SKIP " +
        "DEFINE S AS kind = 'signup', E AS kind = 'error', P AS kind = 'purchase'")
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("signup", "error", "purchase"))
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, pat.steps, pat.withinMs,
          strict = true, pat.skip, pat.greedy)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          col("endTs").as("m_end"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"),
          size(col("values")).as("n"))
        .orderBy("user_id", "m_start")
    }),

    // the same detection through the injected SQL parser surface
    // (SparkSessionExtensions.injectParser → MrSqlParser): proves the
    // text → NFA → plan path end-to-end against the same oracle.
    // NOTE the filter happens via kind conditions inside the NFA over
    // the UNFILTERED table, so strict contiguity must be relative to
    // the three participating kinds — the parser form therefore runs
    // on a pre-filtered temp view.
    "pat_mr_sql" -> ((s, d) => {
      graft.core.Tables.registerAll(s, d)
      org.apache.spark.sql.GraftBridge.ensurePrepared(s)
      s.sql("SELECT * FROM events WHERE event_type IN ('signup','error','purchase')")
        .createOrReplaceTempView("events_sep")
      s.sql(
        """FROM events_sep MATCH_RECOGNIZE (
             PARTITION BY user_id ORDER BY ts
             KIND event_type MEASURE value
             PATTERN (S E{2} P) WITHIN 3 DAYS AFTER MATCH NO SKIP
             DEFINE S AS kind = 'signup', E AS kind = 'error',
                    P AS kind = 'purchase'
           )""")
        .orderBy("user_id", "m_start")
    }),

    // negative-guard pattern (CEP notFollowedBy): signups whose NEXT
    // error within a day arrives with no purchase in between — the
    // guard kills the partial the moment a purchase shows up. The
    // oracle replays it with a first-error scalar subquery + NOT
    // EXISTS over the guarded gap.
    "pat_mr_notfollow" -> ((s, d) => {
      import s.implicits._
      val pat = MrParser.parse(
        "PATTERN (A !B C) WITHIN 1 DAY AFTER MATCH NO SKIP DEFINE " +
        "A AS kind = 'signup', B AS kind = 'purchase', C AS kind = 'error'")
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("signup", "error", "purchase"))
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, pat.steps, pat.withinMs,
          strict = false, pat.skip, pat.greedy)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          col("endTs").as("m_end"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"))
        .orderBy("user_id", "m_start")
    }),

    // MATCH_RECOGNIZE navigation (TableSQLFunc.scala:1622-1712)
    // through the SQL surface: FIRST/LAST(SYM.value, n) offsets in
    // BOTH the DEFINE condition (B must exceed the SECOND A row —
    // FIRST(A.value, 1)) and multi-variable MEASURES. Strict A{3} B
    // over each user's purchases, NO SKIP; fixed length keeps the
    // oracle lead()-expressible.
    "pat_mr_nav" -> ((s, d) => {
      graft.core.Tables.registerAll(s, d)
      org.apache.spark.sql.GraftBridge.ensurePrepared(s)
      s.sql("SELECT * FROM events WHERE event_type = 'purchase'")
        .createOrReplaceTempView("events_p")
      s.sql(
        """FROM events_p MATCH_RECOGNIZE (
             PARTITION BY user_id ORDER BY ts
             KIND event_type MEASURE value
             MEASURES FIRST(A.value) AS a_first, LAST(A.value, 1) AS a_mid,
                      LAST(B.value) AS b_val, COUNT(A.*) AS n_a
             PATTERN (A{3} B) WITHIN 7 DAYS AFTER MATCH NO SKIP
             DEFINE A AS kind = 'purchase',
                    B AS B.value > FIRST(A.value, 1)
           )""")
        .orderBy("user_id", "m_start")
    }),

    // CEP followedByAny (CEPDemo.scala:685-714): non-deterministic
    // relaxed contiguity — every signup pairs with EVERY purchase
    // inside the hour, not just the first (followedBy keeps one).
    // Step.any keeps the un-advanced partial alive after each hit.
    "pat_followany" -> ((s, d) => {
      import s.implicits._
      val steps = Seq(
        SeqPattern.Step("A", Set("signup")),
        SeqPattern.Step("B", Set("purchase")).any)
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, steps, withinMs = 3600L * 1000,
          strict = false, SeqPattern.NoSkip, greedy = true)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          col("endTs").as("m_end"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"))
        .orderBy("user_id", "m_start", "m_end", "sum_v")
    }),

    // CEP .where(c1).or(c2) condition disjunct (CEPDemo or-condition)
    // under STRICT contiguity over the full per-user stream: an error
    // OR any >=450 event immediately followed by a purchase.
    "pat_or_cond" -> ((s, d) => {
      import s.implicits._
      val steps = Seq(
        SeqPattern.Step("A", Set("error")).or(e => e.value >= 450.0),
        SeqPattern.Step("B", Set("purchase")))
      val ev = t(s, d, "events")
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, steps, withinMs = 86400L * 1000,
          strict = true, SeqPattern.NoSkip, greedy = true)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          col("endTs").as("m_end"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"))
        .orderBy("user_id", "m_start", "m_end", "sum_v")
    }),

    // CEP pattern group (CEPDemo.scala:715-755): sub-pattern
    // (error → purchase) repeated twice, strict-contiguous relative to
    // the participating kinds — the bounded flattening of
    // Pattern.begin(sub).times(2).
    "pat_group_times" -> ((s, d) => {
      import s.implicits._
      val sub = Seq(
        SeqPattern.Step("E", Set("error")),
        SeqPattern.Step("P", Set("purchase")))
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("error", "purchase"))
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, SeqPattern.group(sub, 2),
          withinMs = 7L * 86400 * 1000, strict = true,
          SeqPattern.NoSkip, greedy = true)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          col("endTs").as("m_end"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"),
          size(col("values")).as("n"))
        .orderBy("user_id", "m_start")
    }),

    // CEP oneOrMore().until(stop) (CEPDemo allowCombinations family):
    // signup, then one-or-more views, with the view loop STOPPED by
    // the first purchase — which the final step consumes. The loop
    // partial dies when the stop fires, so no later purchase can
    // complete a stale prefix: the match is exactly (signup, all views
    // before the first purchase, that purchase).
    "pat_until" -> ((s, d) => {
      import s.implicits._
      val steps =
        Seq(SeqPattern.Step("S", Set("signup"))) ++
        SeqPattern.Step("V", Set("view"))
          .until(_.kind == "purchase").upTo(16) ++
        Seq(SeqPattern.Step("P", Set("purchase")))
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("signup", "view", "purchase"))
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, steps, withinMs = 86400L * 1000,
          strict = false, SeqPattern.NoSkip, greedy = true)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          col("endTs").as("m_end"), size(col("values")).as("n"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"))
        .orderBy("user_id", "m_start", "m_end")
    }),

    // MATCH_RECOGNIZE with PREV() row-relative conditions: the classic
    // V-shape (price dips then recovers) over each user's purchase
    // amounts, strict-contiguous, all matches. DOWN/UP compare against
    // the previous MATCHED row — the iterative-condition class the
    // declarative pat_* queries can't express without the NFA.
    "pat_mr_updown" -> ((s, d) => {
      import s.implicits._
      val pat = MrParser.parse(
        "PATTERN (STRT DOWN UP) WITHIN 7 DAYS AFTER MATCH NO SKIP DEFINE " +
        "DOWN AS value < PREV(value), UP AS value > PREV(value)")
      val ev = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"),
          col("event_type").as("kind"), col("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, pat.steps, pat.withinMs,
          strict = true, pat.skip, pat.greedy)
        .toDF()
        .select(col("key").as("user_id"), col("startTs").as("m_start"),
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"))
        .orderBy("user_id", "m_start")
    }),

    // MATCH_RECOGNIZE reluctant zero-or-more through the SQL surface
    // (TableSQLFunc.scala:1936-1999 `*?` / `{1,}?`): for every signup,
    // the SHORTEST run of arbitrary rows (B undefined = wildcard)
    // until the FIRST row with value > 200 — greedy B* would extend to
    // the last qualifying row; the reluctant marker stops the
    // quantifier at the first, and completing fixes that start's
    // match (same-start longer branches die). `*` expands to
    // MaxRepeat=8 bounded optional repetitions, mirrored EXACTLY in
    // the oracle via the row-position gap n_b <= 8.
    "pat_mr_reluctant" -> ((s, d) => {
      graft.core.Tables.registerAll(s, d)
      org.apache.spark.sql.GraftBridge.ensurePrepared(s)
      s.sql(
        """FROM events MATCH_RECOGNIZE (
             PARTITION BY user_id ORDER BY ts
             KIND event_type MEASURE value
             MEASURES LAST(C.value) AS c_val, COUNT(B.*) AS n_b
             PATTERN (A B*? C) WITHIN 1 DAY AFTER MATCH NO SKIP
             DEFINE A AS kind = 'signup', C AS value > 200
           )""")
        .orderBy("user_id", "m_start")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "pat_seq_within" ->
      """SELECT a.user_id, count(*) AS n_converted
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
               WHERE event_type = 'signup') a
         WHERE EXISTS (
           SELECT 1 FROM events b
           WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
             AND CAST(b.ts AS TIMESTAMP) > a.ts
             AND CAST(b.ts AS TIMESTAMP) <= a.ts + INTERVAL 1 HOUR)
         GROUP BY a.user_id ORDER BY a.user_id""",
    "pat_nfails" ->
      """SELECT user_id, event_id, n_err FROM (
           SELECT user_id, event_id,
                  count(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                                 RANGE BETWEEN INTERVAL 6 HOURS PRECEDING
                                 AND CURRENT ROW) AS n_err
           FROM events WHERE event_type = 'error') x
         WHERE n_err >= 3 ORDER BY user_id, event_id""",
    "pat_timeout" ->
      """SELECT a.user_id, a.event_id FROM (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
           WHERE event_type = 'signup') a
         WHERE NOT EXISTS (
           SELECT 1 FROM events b
           WHERE b.event_type = 'purchase' AND b.user_id = a.user_id
             AND CAST(b.ts AS TIMESTAMP) > a.ts
             AND CAST(b.ts AS TIMESTAMP) <= a.ts + INTERVAL 1 HOUR)
         ORDER BY a.user_id, a.event_id""",
    "pat_fraud" ->
      """SELECT user_id, event_id, prev_v, value FROM (
           SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
                  lag(value) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_v,
                  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_ts
           FROM events WHERE event_type = 'purchase') x
         WHERE prev_v < 150.0 AND value > 250.0
           AND ts <= prev_ts + INTERVAL 1 DAY
         ORDER BY user_id, event_id""",
    "pat_mr_nav" ->
      """WITH f AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events WHERE event_type = 'purchase'),
         l AS (SELECT user_id, ts, value AS v0,
                      lead(value, 1) OVER w AS v1, lead(value, 2) OVER w AS v2,
                      lead(value, 3) OVER w AS v3, lead(ts, 3) OVER w AS t3
               FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, value))
         SELECT user_id, ts AS m_start, t3 AS m_end,
                v0 AS a_first, v1 AS a_mid, v3 AS b_val, CAST(3 AS INT) AS n_a
         FROM l WHERE v3 > v1 AND t3 <= ts + INTERVAL 7 DAY
         ORDER BY user_id, m_start""",
    "pat_mr_reluctant" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                           value,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), value) AS pos
                    FROM events),
         a AS (SELECT user_id, ts, pos FROM e WHERE event_type = 'signup'),
         c AS (SELECT user_id, ts, value, pos FROM e WHERE value > 200),
         firstc AS (
           SELECT a.user_id, a.ts AS m_start, c.ts AS m_end,
                  c.value AS c_val, c.pos - a.pos - 1 AS n_b,
                  row_number() OVER (PARTITION BY a.user_id, a.pos
                                     ORDER BY c.pos) AS rn
           FROM a JOIN c ON c.user_id = a.user_id AND c.pos > a.pos)
         SELECT user_id, m_start, m_end, c_val, CAST(n_b AS INT) AS n_b
         FROM firstc
         WHERE rn = 1 AND n_b <= 8 AND m_end <= m_start + INTERVAL 1 DAY
         ORDER BY user_id, m_start""",
    "pat_followany" ->
      """SELECT a.user_id, a.ts AS m_start, b.ts AS m_end,
                ((CAST(0.0 AS DOUBLE) + a.value) + b.value) AS sum_v
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'signup') a
         JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
               FROM events WHERE event_type = 'purchase') b
           ON b.user_id = a.user_id
         WHERE (b.ts > a.ts OR (b.ts = a.ts AND b.value > a.value))
           AND b.ts <= a.ts + INTERVAL 1 HOUR
         ORDER BY a.user_id, m_start, m_end, sum_v""",
    "pat_or_cond" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_type, value FROM events),
         l AS (SELECT user_id, ts, event_type AS k0, value AS v0,
                      lead(event_type) OVER w AS k1,
                      lead(value) OVER w AS v1, lead(ts) OVER w AS t1
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, value))
         SELECT user_id, ts AS m_start, t1 AS m_end,
                ((CAST(0.0 AS DOUBLE) + v0) + v1) AS sum_v
         FROM l
         WHERE (k0 = 'error' OR v0 >= CAST(450.0 AS DOUBLE))
           AND k1 = 'purchase' AND t1 <= ts + INTERVAL 1 DAY
         ORDER BY user_id, m_start, m_end, sum_v""",
    "pat_group_times" ->
      """WITH f AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_type, value
                    FROM events WHERE event_type IN ('error', 'purchase')),
         l AS (SELECT user_id, ts, event_type AS k0, value AS v0,
                      lead(event_type, 1) OVER w AS k1, lead(value, 1) OVER w AS v1,
                      lead(event_type, 2) OVER w AS k2, lead(value, 2) OVER w AS v2,
                      lead(event_type, 3) OVER w AS k3, lead(value, 3) OVER w AS v3,
                      lead(ts, 3) OVER w AS t3
               FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, value))
         SELECT user_id, ts AS m_start, t3 AS m_end,
                ((((CAST(0.0 AS DOUBLE) + v0) + v1) + v2) + v3) AS sum_v,
                CAST(4 AS INT) AS n
         FROM l
         WHERE k0 = 'error' AND k1 = 'purchase' AND k2 = 'error'
           AND k3 = 'purchase' AND t3 <= ts + INTERVAL 7 DAY
         ORDER BY user_id, m_start""",
    "pat_until" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                           event_type, value
                    FROM events
                    WHERE event_type IN ('signup', 'view', 'purchase')),
         s AS (SELECT user_id, ts, value FROM e WHERE event_type = 'signup'),
         fp AS (SELECT s.user_id, s.ts AS sts, s.value AS sv,
                  (SELECT p.ts FROM e p
                   WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
                     AND (p.ts > s.ts OR (p.ts = s.ts AND p.value > s.value))
                     AND p.ts <= s.ts + INTERVAL 1 DAY
                   ORDER BY p.ts, p.value LIMIT 1) AS pts,
                  (SELECT p.value FROM e p
                   WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
                     AND (p.ts > s.ts OR (p.ts = s.ts AND p.value > s.value))
                     AND p.ts <= s.ts + INTERVAL 1 DAY
                   ORDER BY p.ts, p.value LIMIT 1) AS pv
                FROM s),
         sel AS (SELECT f.user_id, f.sts, f.sv, f.pts, f.pv,
                   (SELECT coalesce(list(v.value ORDER BY v.ts, v.value), [])
                    FROM e v
                    WHERE v.event_type = 'view' AND v.user_id = f.user_id
                      AND (v.ts > f.sts OR (v.ts = f.sts AND v.value > f.sv))
                      AND (v.ts < f.pts OR (v.ts = f.pts AND v.value < f.pv)))
                     AS vs
                 FROM fp f WHERE f.pts IS NOT NULL)
         SELECT user_id, sts AS m_start, pts AS m_end,
                CAST(len(vs) + 2 AS INT) AS n,
                list_reduce(
                  list_prepend(CAST(0.0 AS DOUBLE) + sv, list_append(vs, pv)),
                  (a, x) -> a + x) AS sum_v
         FROM sel WHERE len(vs) >= 1
         ORDER BY user_id, m_start, m_end""",
    "pat_mr" -> MrOracle,
    // identical detection through the injected SQL parser
    "pat_mr_sql" -> MrOracle,
    "pat_mr_notfollow" ->
      """WITH s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                    FROM events WHERE event_type = 'signup'),
         fe AS (SELECT s.user_id, s.ts AS m_start, s.value AS v0,
                  (SELECT min(CAST(b.ts AS TIMESTAMP)) FROM events b
                   WHERE b.event_type = 'error' AND b.user_id = s.user_id
                     AND CAST(b.ts AS TIMESTAMP) > s.ts
                     AND CAST(b.ts AS TIMESTAMP) <= s.ts + INTERVAL 1 DAY)
                    AS m_end
                FROM s)
         SELECT f.user_id AS user_id, f.m_start, f.m_end,
                ((CAST(0.0 AS DOUBLE) + f.v0) + e.value) AS sum_v
         FROM fe f JOIN events e
           ON e.user_id = f.user_id AND e.event_type = 'error'
          AND CAST(e.ts AS TIMESTAMP) = f.m_end
         WHERE f.m_end IS NOT NULL
           AND NOT EXISTS (
             SELECT 1 FROM events p
             WHERE p.event_type = 'purchase' AND p.user_id = f.user_id
               AND CAST(p.ts AS TIMESTAMP) > f.m_start
               AND CAST(p.ts AS TIMESTAMP) < f.m_end)
         ORDER BY f.user_id, f.m_start""",
    "pat_mr_updown" ->
      """WITH f AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
           FROM events WHERE event_type = 'purchase'),
         l AS (
           SELECT user_id, ts, value AS v0,
                  lead(value, 1) OVER w AS v1, lead(value, 2) OVER w AS v2,
                  lead(ts, 2) OVER w AS t2
           FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, value))
         SELECT user_id, ts AS m_start,
                (((CAST(0.0 AS DOUBLE) + v0) + v1) + v2) AS sum_v
         FROM l
         WHERE v1 < v0 AND v2 > v1 AND t2 <= ts + INTERVAL 7 DAY
         ORDER BY user_id, m_start""",
  )
}
