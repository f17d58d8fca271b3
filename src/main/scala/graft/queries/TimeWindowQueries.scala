package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact, ExactSql}

/** §2.5 event-time windowed aggregation, batch flavor: TUMBLE / HOP /
  * SESSION windows, offset windows, non-keyed (windowAll) aggs, and the
  * per-window top-N ("hot items") pipeline.
  *
  * Reference surface: SpendReportJob.scala:95-102 (flagship),
  * TableSQLFunc.scala:951-963 (TUMBLE/HOP/SESSION SQL),
  * TableDemo.scala:650-893 (all three window kinds in both API styles),
  * TumbleOffsetApp.scala:41 (offset), HotItems.scala:176-201 +
  * TopNHotItems.scala:15-52 (windowed top-N).
  *
  * The streaming flavors of these (withWatermark + window over
  * readStream) share the same window expressions; see
  * graft.streaming.* and the ScalaTest streaming suites.
  *
  * Scale: window bucketing is an element-wise projection (no shuffle);
  * each agg is one hash-shuffle on (bucket, key). session windows use
  * Spark's native session_window, which plans to a single
  * partial-merge aggregate, not a self-join.
  */
object TimeWindowQueries extends GroupBase {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // FLAGSHIP — SpendReport: hourly spend per user
    // (SpendReportJob.scala:95-102)
    "tw_spendreport" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("w_start"), col("user_id"))
        .agg(Exact.dsum(col("value")).as("spend"))
        .orderBy("w_start", "user_id")),

    // TUMBLE with start+end columns (TableSQLFunc.scala:951-963):
    // uses Spark's native window() bucketing
    "tw_tumble" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("cnt"), col("sum_v"))
        .orderBy("w_start", "event_type")),

    // CASCADING window rollup — minute partials re-aggregated to hour
    // finals (the Flink window-TVF cascade / streaming-warehouse
    // materialized-rollup idiom): the raw table is scanned and
    // shuffled ONCE at minute grain; the hour level aggregates the
    // ~60× smaller partial table, never the raw events. The partials
    // keep their sums in DECIMAL across the two levels (re-summing
    // doubles would be order-dependent and break cross-engine
    // equality); only the final hour sum casts back to double.
    // `n_minutes` exposes the partial count the rollup consumed.
    "tw_rollup" -> ((s, d) => {
      val m = t(s, d, "events")
        .groupBy(date_trunc("minute", col("ts")).as("w_min"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(Exact.Dec)).as("sumd"))
      m.groupBy(date_trunc("hour", col("w_min")).as("w_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n_minutes"), sum(col("cnt")).as("cnt"),
          sum(col("sumd")).cast("double").as("sum_v"))
        .orderBy("w_start", "event_type")
    }),

    // HOP / sliding window, 1h size, 15m slide (TableDemo.scala:650-893)
    "tw_hop" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))
        .orderBy("w_start", "event_type")),

    // SESSION window, 30m gap, per user (TableDemo.scala session;
    // session_window is Spark's native gap-session operator)
    "tw_session" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("user_id"),
          col("cnt"), col("sum_v"))
        .orderBy("user_id", "s_start")),

    // DYNAMIC-gap session windows (EventTimeSessionWindows
    // .withDynamicGap, tutorial Window.scala:157-166): the gap is a
    // per-ROW expression — purchases keep a session alive longer than
    // ambient events. Spark's session_window takes the gap as a
    // Column, so this is the same one-shuffle sessionization as
    // tw_session; the oracle mirrors the merge rule exactly (an event
    // joins while ts < running max end, session end = max member end).
    "tw_session_dynamic" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"),
          when(col("event_type") === "purchase", "40 minutes")
            .otherwise("15 minutes")), col("user_id"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("user_id"),
          col("cnt"), col("sum_v"))
        .orderBy("user_id", "s_start")),

    // tumbling window with a 30m offset (TumbleOffsetApp.scala:41)
    "tw_tumble_offset" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w_start"), col("cnt"))
        .orderBy("w_start")),

    // windowAll — global per-window agg, no key (Window.scala:258-290;
    // HourlyTipsSolution.scala:37-38 second stage)
    "tw_windowall" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("w_start"))
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"),
             countDistinct(col("user_id")).as("uv"))
        .orderBy("w_start")),

    // per-window top-3 hot item types (HotItems + TopNHotItems
    // semantics: window count then rank within window)
    "tw_topn_hot" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("w_start"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("w_start")
        .orderBy(col("cnt").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("w_start", "rn")
    }),

    // CUMULATE window TVF (early-firing cumulative windows): within
    // each 4h max-window, emit expanding [start, start+k·1h) windows.
    // An event lands in every expanded window whose end is past it —
    // a ≤4-row explode projection (no shuffle), then one hash agg.
    "tw_cumulate" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("w_start", window(col("ts"), "4 hours").getField("start"))
        .withColumn("w_end", explode(sequence(
          date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR"),
          col("w_start") + expr("INTERVAL 4 HOURS"),
          expr("INTERVAL 1 HOUR"))))
      ev.groupBy("w_start", "w_end")
        .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
        .orderBy("w_start", "w_end")
    }),

    // daily min/max/count (floor/ceil-to-unit family over time)
    "tw_daily" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), min(col("value")).as("min_v"),
             max(col("value")).as("max_v"))
        .orderBy("day")),

    // gap-fill + carry-forward: densify the hourly series per
    // event_type over the global span — missing buckets appear with
    // n=0 and the last observed count carried forward (the
    // time-series interpolation op windowed SQL demos build from
    // temporal spines). Scale shape: the spine is #series × #buckets
    // rows built from a 1-row broadcast range (never a scan), the
    // left join is keyed by (series, bucket), and the carry-forward
    // window parallelizes across series.
    "tw_gapfill" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hb"))
      val counts = ev.groupBy("event_type", "hb")
        .agg(count(lit(1)).as("c"))
      val range = counts.agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(range))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 HOUR"))).as("hb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("hb")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.join(counts, Seq("event_type", "hb"), "left")
        .select(col("event_type"), col("hb"),
          coalesce(col("c"), lit(0L)).as("n"),
          last(col("c"), ignoreNulls = true).over(w).as("carried"))
        .orderBy("event_type", "hb")
    }),

    // HOUR-OF-DAY SEASONALITY profile — the decomposition signal next
    // to tw_anomaly's EWMA trend: per (event_type, hour-of-day), the
    // mean hourly count and the seasonal index (hod mean / overall
    // hourly mean), flagged when the hour runs ±50% off the type's
    // norm. A monitoring deployment divides tw_anomaly's residuals by
    // this profile before alerting, so daily rhythm doesn't read as
    // anomaly. All ratios are divisions of exact integer aggregates
    // (single IEEE ops, no rounding needed); shape is two bounded
    // hash-aggs over the (type, hour) table plus a 24×types join.
    "tw_seasonal" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("ws"))
        .agg(count(lit(1)).as("c"))
        .withColumn("hod", hour(col("ws")))
      val prof = hourly.groupBy("event_type", "hod")
        .agg(count(lit(1)).as("n_buckets"), sum(col("c")).as("sc"))
      val tot = hourly.groupBy(col("event_type").as("et"))
        .agg(sum(col("c")).as("st"), count(lit(1)).as("nt"))
      val meanC = col("sc").cast("double") / col("n_buckets").cast("double")
      val idx = meanC / (col("st").cast("double") / col("nt").cast("double"))
      prof.join(broadcast(tot), col("event_type") === col("et"))
        .select(col("event_type"), col("hod"), col("n_buckets"),
          meanC.as("mean_c"), idx.as("seasonal_idx"),
          (idx > 1.5 || idx < 0.5).as("off_rhythm"))
        .orderBy("event_type", "hod")
    }),

    // EWMA FORECAST + ANOMALY FLAG over the hourly count series — the
    // monitoring readout a streaming-analytics deployment hangs off
    // every windowed aggregate: forecast_t = exponentially-weighted
    // mean of the 8 trailing buckets (α = 0.5 ⇒ weights 2^-k, all
    // exactly representable doubles), residual z-score against the
    // trailing sample stddev (+1 smoothing so an all-constant history
    // can't divide by zero), anomaly at |z| > 3 on the ROUNDED z (the
    // agg_ab discipline). The 8 lags are explicit columns so both
    // engines evaluate the weighted sum and the variance in the SAME
    // left-associated order — no engine-internal window-agg summation
    // order in play. Scale: one (type, hour) hash-agg collapses the
    // corpus, then the lag window runs per event_type over a
    // TIME-bounded series (8.8k rows/key/year) — WindowExec state is
    // the 8-row frame, partitions parallelize across keys.
    "tw_anomaly" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("ws"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("ws")
      val lagged = hourly.select(
        col("event_type") +: col("ws") +: col("c") +:
          (1 to 8).map(k =>
            lag(col("c"), k).over(w).cast("double").as(s"x$k")): _*)
        .filter(col("x8").isNotNull)
      val wsum = lit(0.99609375) // Σ 2^-k, k=1..8 — exact
      val f = (1 to 8).map(k => col(s"x$k") * lit(math.pow(0.5, k)))
        .reduce(_ + _) / wsum
      val m8 = (1 to 8).map(k => col(s"x$k")).reduce(_ + _) / lit(8.0)
      val staged = lagged.withColumn("f", f).withColumn("m8", m8)
      val varE = (1 to 8).map(k =>
        (col(s"x$k") - col("m8")) * (col(s"x$k") - col("m8")))
        .reduce(_ + _) / lit(7.0)
      staged.withColumn("sd", sqrt(varE))
        .withColumn("z",
          round((col("c").cast("double") - col("f")) /
            (col("sd") + lit(1.0)), 6))
        .select(col("event_type"), col("ws"), col("c"),
          round(col("f"), 6).as("forecast"), col("z"),
          (abs(col("z")) > lit(3.0)).as("anomaly"))
        .orderBy("event_type", "ws")
    }),

    // TIME-SERIES SIMILARITY between event types — Pearson
    // correlation of the hourly count series over the dense hour
    // spine (which streams move together is the seasonality/
    // causality screen run before any cross-stream model; the
    // streaming version of this screen is the EDBT'19 "time series
    // similarity search for streaming data" problem). 100 TB shape:
    // the corpus collapses to the (type, hour) count table — ONE
    // hash-agg with map-side partials; the spine join, the pair
    // self-join on the hour key, and the 5-number sufficient
    // statistics all run on the types x hours grid (span-bounded,
    // SF-INDEPENDENT — more events change the counts, not the grid).
    // Exactness: counts are integers, so n, Σx, Σx², Σxy stay in
    // BIGINT — numerator and both variance terms are exact integer
    // arithmetic (span x count² magnitudes; flip to DECIMAL(38,0)
    // past ~2e9 events/hour — the text_ks lesson) — and r pays ONE
    // sqrt + ONE division, rounded to 6.
    "tw_tsim" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hb"))
      val counts = ev.groupBy("event_type", "hb").agg(count(lit(1)).as("c"))
      val range = counts.agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(range))
        .select(col("event_type"), explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 HOUR"))).as("hb"))
      val dense = grid.join(counts, Seq("event_type", "hb"), "left")
        .select(col("event_type"), col("hb"),
          coalesce(col("c"), lit(0L)).as("x"))
      val dec = "decimal(38,0)"
      val st = dense.as("a").join(dense.as("b"),
          col("a.hb") === col("b.hb") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
        .agg(count(lit(1)).as("n"),
          // DECIMAL(38,0) sums: at 100 TB (~3e8 events/hour) Σx²
          // crosses 2^63 within one span — the sum, not just the
          // Pearson products, is an overflow site
          sum(col("a.x").cast(dec)).as("sx"),
          sum(col("b.x").cast(dec)).as("sy"),
          sum((col("a.x") * col("a.x")).cast(dec)).as("sxx"),
          sum((col("b.x") * col("b.x")).cast(dec)).as("syy"),
          sum((col("a.x") * col("b.x")).cast(dec)).as("sxy"))
      // Pearson terms: n lifts to the sums' decimal type, each term to
      // double, only doubles multiply under the sqrt — hourly counts
      // grow with the corpus, so the BIGINT term product crosses 2^63
      // near sf1 (the graph_assortativity overflow class, round 9);
      // the oracle mirrors with HUGEINT so the IEEE sequences align
      st.select(col("ta"), col("tb"), col("n"),
          // NULLIF: r is undefined when either hourly series is
          // CONSTANT over the span (zero variance — plausible in real
          // data at any scale, e.g. a heartbeat event type emitting a
          // fixed per-hour count); ANSI throws on the double division,
          // so the degenerate pair must read NULL (EdgeExec sweep, r10)
          round((col("n").cast(dec) * col("sxy") -
              col("sx") * col("sy")).cast("double") /
            nullif(sqrt((col("n").cast(dec) * col("sxx") -
                col("sx") * col("sx")).cast("double") *
              (col("n").cast(dec) * col("syy") -
                col("sy") * col("sy")).cast("double")), lit(0.0)),
            6).as("r"))
        .orderBy(col("r").desc, col("ta"), col("tb"))
    }),

    // MOTIF discovery in one series — the matrix-profile primitive
    // (STAMP/STOMP family): the closest pair of non-overlapping
    // day-long windows of the hourly purchase-count series under
    // z-normalized squared Euclidean distance (a repeated daily
    // pattern = operational seasonality; the same scan with max
    // instead of min is the discord/anomaly). 100 TB shape: the
    // corpus collapses to the span-sized hourly series (ONE hash-agg;
    // the series length is set by the TIME SPAN, not the row count),
    // the 720-element array is a bounded collect (tw_gapfill's spine
    // discipline), and the window pair join is span²-bounded and
    // SF-independent — a deliberate bounded self-join, never
    // corpus-scale. Exactness: window sums are integer; mean/sigma
    // pay exact IEEE division/sqrt on identical bits; the distance
    // fold is ordered left-to-right (list_reduce mirror) and rounds
    // to 6 at the edge. Constant (sigma = 0) windows are excluded —
    // z-normalization is undefined there, identically in both
    // engines.
    "tw_motif" -> ((s, d) => {
      val W = 24
      val ev = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(date_trunc("hour", col("ts")).as("hb"))
      val counts = ev.groupBy("hb").agg(count(lit(1)).as("c"))
      val range = counts.agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      val spine = range.select(explode(sequence(col("mn"), col("mx"),
        expr("INTERVAL 1 HOUR"))).as("hb"))
      val series = spine.join(counts, Seq("hb"), "left")
        .select(col("hb"), coalesce(col("c"), lit(0L)).as("x"))
        .groupBy().agg(transform(
          array_sort(collect_list(struct(col("hb"), col("x")))),
          e => e.getField("x")).as("s"))
      val wins = series
        // guard: a series shorter than one window (incl. the empty
        // input's 1-row empty array from the global agg) would make
        // sequence(0, negative) count DOWN and slice() reject start=0
        // — no window fits, so there is no motif (EdgeExec empty-input
        // sweep, round 10)
        .filter(size(col("s")) >= W)
        .select(explode(sequence(lit(0), size(col("s")) - W)).as("st"),
          col("s"))
        .select(col("st"), slice(col("s"), col("st") + 1, lit(W)).as("w"))
        .withColumn("sw", aggregate(col("w"), lit(0L), (a, v) => a + v))
        .withColumn("sww", aggregate(col("w"), lit(0L), (a, v) => a + v * v))
        .withColumn("mu", col("sw").cast("double") / lit(W.toDouble))
        .withColumn("sg", sqrt(col("sww").cast("double") / lit(W.toDouble) -
          col("mu") * col("mu")))
        .filter(col("sg") > 0.0)
        // z-normalize ONCE per window (697 rows), so each of the
        // span²/2 pairs pays only the codegen vec_d2 kernel —
        // bit-identical to the inline (za − zb)² HOF fold it replaced
        // (same per-element (x−μ)/σ bits, same left-to-right
        // accumulation; the oracle's list_reduce needed no change)
        // but a primitive loop instead of 24 interpreted lambdas.
        .select(col("st"),
          transform(col("w"), x =>
            (x.cast("double") - col("mu")) / col("sg")).as("zw"))
      wins.as("a").join(wins.as("b"), col("b.st") >= col("a.st") + W)
        .select(col("a.st").cast("long").as("st_a"),
          col("b.st").cast("long").as("st_b"),
          round(graft.functions.VectorFunctions.vd2(
            col("a.zw"), col("b.zw")), 6).as("d2"))
        .orderBy(col("d2"), col("st_a"), col("st_b")).limit(5)
    }),

    // AUTOCORRELATION function of the hourly event series, lags
    // 1..48 — the principled periodicity detector behind tw_seasonal's
    // hour-of-day profile (a daily cycle shows as the r peak at
    // lag 24; the lag-1 value is the burstiness/memory readout).
    // r_k = c_k / c_0 with c_k = (1/n)·Σ_{t<=n-k}(x_t−μ)(x_{t+k}−μ),
    // expanded to integer sufficient statistics:
    //   Σ x_t·x_{t+k} − μ·(Σ_head x + Σ_tail x) + (n−k)·μ²
    // so the only non-integer inputs are μ and c_0 (exact IEEE ops on
    // identical bits). 100 TB shape: corpus → one (hour) hash-agg;
    // the lag self-join runs on the span-bounded dense series × 48
    // lags (SF-independent); output is 48 rows. Rounds to 6.
    "tw_acf" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(date_trunc("hour", col("ts")).as("hb"))
      val counts = ev.groupBy("hb").agg(count(lit(1)).as("c"))
      val range = counts.agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      val spine = range.select(explode(sequence(col("mn"), col("mx"),
        expr("INTERVAL 1 HOUR"))).as("hb"))
      val dense = spine.join(counts, Seq("hb"), "left")
        .select(col("hb"), coalesce(col("c"), lit(0L)).as("x"))
      // DECIMAL(38,0) Σx/Σx²: hourly counts scale with the corpus, so
      // the BIGINT square-sum crosses 2^63 within a span at ~100 TB
      // (the tw_tsim/graph_assortativity overflow class, round 9)
      val glob = dense.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      val lagged = dense.as("a")
        .crossJoin(broadcast(
          spine.sparkSession.range(1, 49).select(col("id").as("k"))))
        .withColumn("hb2",
          col("a.hb") + expr("make_interval(0, 0, 0, 0, CAST(k AS INT), 0, 0)"))
        .join(dense.as("b"), col("b.hb") === col("hb2"))
        .groupBy("k")
        .agg(count(lit(1)).as("m"),
          sum((col("a.x") * col("b.x")).cast("decimal(38,0)")).as("sxy"),
          sum(col("a.x").cast("decimal(38,0)")).as("sh"),
          sum(col("b.x").cast("decimal(38,0)")).as("st"))
      val mu = col("sx").cast("double") / col("n").cast("double")
      val c0 = col("sxx").cast("double") / col("n").cast("double") - mu * mu
      lagged.crossJoin(broadcast(glob))
        .select(col("k").as("lag"),
          // NULLIF: autocorrelation is undefined for a CONSTANT series
          // (c0 = 0 — the tw_tsim degenerate class); NULL, not an ANSI
          // DIVIDE_BY_ZERO crash (EdgeExec sweep, round 10)
          round(((col("sxy").cast("double") -
            mu * (col("sh") + col("st")).cast("double") +
            col("m").cast("double") * mu * mu) /
            col("n").cast("double")) / nullif(c0, lit(0.0)), 6).as("r"))
        .orderBy("lag")
    }),

    // DAU / WAU STICKINESS — the product-engagement staple next to
    // agg_retention's cohort grid: per day, the distinct active users
    // (DAU), the distinct users active in the trailing 7 days (WAU),
    // and stickiness = DAU/WAU (how much of the weekly audience shows
    // up daily). Exact rolling distinct WITHOUT a rolling-distinct
    // aggregate: each (user, day) activity row contributes to the 7
    // window-end days it falls into (a bounded x7 explode), and WAU
    // is then a plain distinct count per window end — corpus-scale
    // work is one dedup and two hash-aggs, no window over users.
    // Days without a full 7-day history are emitted with their
    // partial window (flagged by days_observed < 7).
    "tw_stickiness" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val dau = act.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val span = act.agg(min(col("day")).as("mn"))
      val wau = act
        .select(col("user_id"), explode(sequence(col("day"),
          col("day") + expr("INTERVAL 6 DAYS"),
          expr("INTERVAL 1 DAY"))).as("wend"))
        .distinct()
        .groupBy(col("wend").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day")).crossJoin(broadcast(span))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"),
          least(datediff(col("day").cast("date"), col("mn").cast("date"))
            + 1, lit(7)).cast("int").as("days_observed"))
        .orderBy("day")
    }),

    // SEASONAL-NAIVE FORECAST BASELINE + MASE — the evaluation floor
    // every forecasting pipeline must report (Hyndman & Koehler 2006):
    // predict hour t by the same hour yesterday (lag 24) and score
    // the last 7 days against the lag-1 naive. MASE = MAE_snaive /
    // MAE_naive1 over the same eval hours: < 1 means daily
    // seasonality is real signal, >= 1 means the fancy baseline adds
    // nothing. Shape: corpus → span-bounded dense hourly series (the
    // spine discipline); both forecasts are hour-keyed self-joins on
    // the grid; integer absolute errors until the final divisions,
    // rounded to 6.
    "tw_mase" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(date_trunc("hour", col("ts")).as("hb"))
      val counts = ev.groupBy("hb").agg(count(lit(1)).as("c"))
      val range = counts.agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      val spine = range.select(explode(sequence(col("mn"), col("mx"),
        expr("INTERVAL 1 HOUR"))).as("hb"))
      val dense = spine.join(counts, Seq("hb"), "left")
        .select(col("hb"), coalesce(col("c"), lit(0L)).as("x"))
      val evalSet = dense.as("t")
        .join(dense.as("s24"), col("s24.hb") ===
          col("t.hb") - expr("INTERVAL 24 HOURS"))
        .join(dense.as("s1"), col("s1.hb") ===
          col("t.hb") - expr("INTERVAL 1 HOUR"))
        .crossJoin(broadcast(range))
        .filter(col("t.hb") > col("mx") - expr("INTERVAL 168 HOURS"))
        .select(abs(col("t.x") - col("s24.x")).as("e24"),
          abs(col("t.x") - col("s1.x")).as("e1"))
      evalSet.agg(count(lit(1)).as("n_eval"),
          sum(col("e24")).as("se24"), sum(col("e1")).as("se1"))
        .select(col("n_eval"),
          round(col("se24").cast("double") /
            col("n_eval").cast("double"), 6).as("mae_snaive"),
          round(col("se1").cast("double") /
            col("n_eval").cast("double"), 6).as("mae_naive1"),
          round(col("se24").cast("double") /
            col("se1").cast("double"), 6).as("mase"))
    }),

    // CUSUM change-point scan on the hourly event series — the
    // level-shift detector (Page 1954; the monitoring twin of
    // tw_anomaly's point-outlier EWMA): s_t = Σ_{i<=t}(x_i − μ) peaks
    // in magnitude AT the change point when the series shifts mean.
    // Computed as (integer prefix sum) − t·μ — the prefix sum is an
    // integer rows-unbounded window over the SPAN-BOUNDED dense
    // series (text_zipf's bounded-global-window class, never
    // corpus-scale), μ the only double. Output: the top-5 |s_t| hours
    // — the candidate change points a monitoring pipeline would
    // alert on. Rounds to 6.
    "tw_cpd" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("event_type") === "error")
        .select(date_trunc("hour", col("ts")).as("hb"))
      val counts = ev.groupBy("hb").agg(count(lit(1)).as("c"))
      val range = counts.agg(min(col("hb")).as("mn"), max(col("hb")).as("mx"))
      val spine = range.select(explode(sequence(col("mn"), col("mx"),
        expr("INTERVAL 1 HOUR"))).as("hb"))
      val dense = spine.join(counts, Seq("hb"), "left")
        .select(col("hb"), coalesce(col("c"), lit(0L)).as("x"))
      val glob = dense.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("hb")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val mu = col("sx").cast("double") / col("n").cast("double")
      dense
        .withColumn("ps", sum(col("x")).over(w))
        .withColumn("t", count(lit(1)).over(w))
        .crossJoin(broadcast(glob))
        .select(col("hb"), col("x"),
          round(col("ps").cast("double") -
            col("t").cast("double") * mu, 6).as("cusum"))
        .orderBy(abs(col("cusum")).desc, col("hb")).limit(5)
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "tw_seasonal" ->
      s"""WITH hourly AS (SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
                 count(*) AS c
               FROM events GROUP BY 1, 2),
          h2 AS (SELECT event_type, CAST(hour(ws) AS INT) AS hod, c
                 FROM hourly),
          prof AS (SELECT event_type, hod, count(*) AS n_buckets,
                          sum(c) AS sc
                   FROM h2 GROUP BY 1, 2),
          tot AS (SELECT event_type, sum(c) AS st, count(*) AS nt
                  FROM h2 GROUP BY 1)
          SELECT p.event_type, p.hod, p.n_buckets,
                 CAST(sc AS DOUBLE) / CAST(n_buckets AS DOUBLE) AS mean_c,
                 (CAST(sc AS DOUBLE) / CAST(n_buckets AS DOUBLE))
                   / (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))
                   AS seasonal_idx,
                 ((CAST(sc AS DOUBLE) / CAST(n_buckets AS DOUBLE))
                   / (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))
                   > CAST(1.5 AS DOUBLE)
                  OR (CAST(sc AS DOUBLE) / CAST(n_buckets AS DOUBLE))
                   / (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))
                   < CAST(0.5 AS DOUBLE)) AS off_rhythm
          FROM prof p JOIN tot t ON p.event_type = t.event_type
          ORDER BY p.event_type, p.hod""",
    "tw_anomaly" -> {
      val lags = (1 to 8).map(k =>
        s"""CAST(lag(c, $k) OVER (PARTITION BY event_type ORDER BY ws)
            AS DOUBLE) AS x$k""").mkString(",\n            ")
      val fterms = (1 to 8)
        .map(k => s"x$k * CAST(${math.pow(0.5, k)} AS DOUBLE)")
        .mkString(" + ")
      val msum = (1 to 8).map(k => s"x$k").mkString(" + ")
      val vterms = (1 to 8).map(k => s"(x$k - m8) * (x$k - m8)")
        .mkString(" + ")
      s"""WITH hourly AS (SELECT event_type,
                 date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
                 count(*) AS c
               FROM events GROUP BY 1, 2),
          lagged AS (SELECT event_type, ws, c,
            $lags FROM hourly),
          ok AS (SELECT * FROM lagged WHERE x8 IS NOT NULL),
          ff AS (SELECT *, ($fterms) / CAST(0.99609375 AS DOUBLE) AS f,
                        ($msum) / CAST(8.0 AS DOUBLE) AS m8 FROM ok),
          sdd AS (SELECT *, sqrt(($vterms) / CAST(7.0 AS DOUBLE)) AS sd
                  FROM ff),
          zz AS (SELECT event_type, ws, c, round(f, 6) AS forecast,
                        round((CAST(c AS DOUBLE) - f)
                          / (sd + CAST(1.0 AS DOUBLE)), 6) AS z
                 FROM sdd)
          SELECT event_type, ws, c, forecast, z,
                 abs(z) > CAST(3.0 AS DOUBLE) AS anomaly
          FROM zz ORDER BY event_type, ws"""
    },
    "tw_spendreport" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start, user_id,
          ${ExactSql.dsum("value")} AS spend
          FROM events GROUP BY 1, 2 ORDER BY w_start, user_id""",
    "tw_tumble" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
          date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS w_end,
          event_type, count(*) AS cnt, ${ExactSql.dsum("value")} AS sum_v
          FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""",
    "tw_rollup" ->
      """WITH m AS (SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS w_min,
                          event_type, count(*) AS cnt,
                          SUM(CAST(value AS DECIMAL(30,4))) AS sumd
                   FROM events GROUP BY 1, 2)
         SELECT date_trunc('hour', w_min) AS w_start, event_type,
                count(*) AS n_minutes, CAST(SUM(cnt) AS BIGINT) AS cnt,
                CAST(SUM(sumd) AS DOUBLE) AS sum_v
         FROM m GROUP BY 1, 2 ORDER BY w_start, event_type""",
    "tw_hop" ->
      """SELECT ws AS w_start, event_type, count(*) AS cnt FROM (
           SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
                    - k.k * INTERVAL '15 minutes' AS ws,
                  CAST(ts AS TIMESTAMP) AS tss, event_type
           FROM events, (SELECT unnest(range(4)) AS k) k) x
         WHERE tss < ws + INTERVAL 1 HOUR
         GROUP BY ws, event_type ORDER BY w_start, event_type""",
    "tw_session" ->
      s"""WITH g AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   CASE WHEN lag(CAST(ts AS TIMESTAMP))
                          OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
                          OR CAST(ts AS TIMESTAMP)
                             - lag(CAST(ts AS TIMESTAMP))
                               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                             >= INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS new_s
            FROM events),
          sess AS (
            SELECT user_id, ts, value,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM g)
          SELECT min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTES AS s_end,
                 user_id, count(*) AS cnt, ${ExactSql.dsum("value")} AS sum_v
          FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""",
    "tw_session_dynamic" ->
      s"""WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
                   CASE WHEN event_type = 'purchase' THEN INTERVAL 40 MINUTES
                        ELSE INTERVAL 15 MINUTES END AS gap
            FROM events),
          g AS (
            SELECT user_id, ts, value, gap,
                   max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS prev_end
            FROM e),
          f AS (
            SELECT user_id, ts, value, gap,
                   CASE WHEN prev_end IS NULL OR ts >= prev_end
                        THEN 1 ELSE 0 END AS new_s
            FROM g),
          sess AS (
            SELECT user_id, ts, value, gap,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
          SELECT min(ts) AS s_start, max(ts + gap) AS s_end, user_id,
                 count(*) AS cnt, ${ExactSql.dsum("value")} AS sum_v
          FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""",
    "tw_tumble_offset" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP),
                            INTERVAL '30 minutes') AS w_start, count(*) AS cnt
         FROM events GROUP BY 1 ORDER BY w_start""",
    "tw_windowall" ->
      s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
          count(*) AS cnt, ${ExactSql.dsum("value")} AS sum_v,
          count(DISTINCT user_id) AS uv
          FROM events GROUP BY 1 ORDER BY w_start""",
    "tw_topn_hot" ->
      """SELECT w_start, event_type, cnt, CAST(rn AS INT) AS rn FROM (
           SELECT w_start, event_type, cnt,
                  row_number() OVER (PARTITION BY w_start
                                     ORDER BY cnt DESC, event_type) AS rn
           FROM (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start,
                        event_type, count(*) AS cnt
                 FROM events GROUP BY 1, 2) c) x
         WHERE rn <= 3 ORDER BY w_start, rn""",
    "tw_cumulate" ->
      s"""SELECT w_start, w_end, count(*) AS cnt, ${ExactSql.dsum("value")} AS sum_v
          FROM (
            SELECT time_bucket(INTERVAL '4 hours', CAST(ts AS TIMESTAMP)) AS w_start,
                   unnest(generate_series(
                     date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR,
                     time_bucket(INTERVAL '4 hours', CAST(ts AS TIMESTAMP))
                       + INTERVAL 4 HOURS,
                     INTERVAL 1 HOUR)) AS w_end,
                   value
            FROM events) x
          GROUP BY w_start, w_end ORDER BY w_start, w_end""",
    "tw_daily" ->
      """SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day, count(*) AS cnt,
                min(value) AS min_v, max(value) AS max_v
         FROM events GROUP BY 1 ORDER BY day""",
    "tw_gapfill" ->
      """WITH b AS (SELECT event_type,
                           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
          r AS (SELECT min(hb) AS mn, max(hb) AS mx FROM b),
          grid AS (SELECT event_type, hb
                   FROM (SELECT DISTINCT event_type FROM events)
                   CROSS JOIN (SELECT unnest(generate_series(mn, mx,
                                 INTERVAL 1 HOUR)) AS hb FROM r))
          SELECT g.event_type, g.hb, coalesce(c, 0) AS n,
                 last_value(c IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.hb
                   ROWS UNBOUNDED PRECEDING) AS carried
          FROM grid g LEFT JOIN b ON g.event_type = b.event_type
                                  AND g.hb = b.hb
          ORDER BY g.event_type, g.hb""",
    "tw_tsim" ->
      """WITH b AS (SELECT event_type,
                           date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb,
                           count(*) AS c
                    FROM events GROUP BY 1, 2),
          r AS (SELECT min(hb) AS mn, max(hb) AS mx FROM b),
          grid AS (SELECT event_type, hb
                   FROM (SELECT DISTINCT event_type FROM events)
                   CROSS JOIN (SELECT unnest(generate_series(mn, mx,
                                 INTERVAL 1 HOUR)) AS hb FROM r)),
          dense AS (SELECT g.event_type, g.hb,
                           CAST(coalesce(c, 0) AS BIGINT) AS x
                    FROM grid g LEFT JOIN b ON g.event_type = b.event_type
                                            AND g.hb = b.hb),
          -- sums stay HUGEINT (no BIGINT down-cast): the engine's
          -- DECIMAL(38,0) sums removed the 2^63 sum cliff, and the
          -- oracle must not keep it (round 9)
          st AS (SELECT a.event_type AS ta, b.event_type AS tb,
                        count(*) AS n,
                        sum(a.x) AS sx,
                        sum(b.x) AS sy,
                        sum(a.x * a.x) AS sxx,
                        sum(b.x * b.x) AS syy,
                        sum(a.x * b.x) AS sxy
                 FROM dense a JOIN dense b
                   ON a.hb = b.hb AND a.event_type < b.event_type
                 GROUP BY 1, 2)
          SELECT ta, tb, n,
                 round(CAST(CAST(n AS HUGEINT) * sxy
                            - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
                   sqrt(CAST(CAST(n AS HUGEINT) * sxx
                             - CAST(sx AS HUGEINT) * sx AS DOUBLE) *
                        CAST(CAST(n AS HUGEINT) * syy
                             - CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6) AS r
          FROM st ORDER BY r DESC, ta, tb""",
    "tw_motif" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb
                    FROM events WHERE event_type = 'purchase'),
          b AS (SELECT hb, count(*) AS c FROM e GROUP BY 1),
          r AS (SELECT min(hb) AS mn, max(hb) AS mx FROM b),
          spine AS (SELECT unnest(generate_series(mn, mx,
                      INTERVAL 1 HOUR)) AS hb FROM r),
          dense AS (SELECT s.hb, CAST(coalesce(c, 0) AS BIGINT) AS x
                    FROM spine s LEFT JOIN b USING (hb)),
          ser AS (SELECT list(x ORDER BY hb) AS s FROM dense),
          wins0 AS (SELECT CAST(st AS BIGINT) AS st,
                           list_slice(s, st + 1, st + 24) AS w
                    FROM ser, LATERAL (SELECT unnest(range(0,
                      len(s) - 24 + 1)) AS st) g),
          wins AS (SELECT st, w,
                          CAST(list_sum(w) AS DOUBLE) / 24.0 AS mu,
                          sqrt(CAST(list_sum(list_transform(w, v -> v * v))
                               AS DOUBLE) / 24.0 -
                            (CAST(list_sum(w) AS DOUBLE) / 24.0) *
                            (CAST(list_sum(w) AS DOUBLE) / 24.0)) AS sg
                   FROM wins0),
          good AS (SELECT * FROM wins WHERE sg > 0.0)
          SELECT a.st AS st_a, b.st AS st_b,
                 round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list_zip(a.w, b.w), p ->
                     ((CAST(p[1] AS DOUBLE) - a.mu) / a.sg -
                      (CAST(p[2] AS DOUBLE) - b.mu) / b.sg) *
                     ((CAST(p[1] AS DOUBLE) - a.mu) / a.sg -
                      (CAST(p[2] AS DOUBLE) - b.mu) / b.sg))),
                   (acc, v) -> acc + v), 6) AS d2
          FROM good a JOIN good b ON b.st >= a.st + 24
          ORDER BY d2, st_a, st_b LIMIT 5""",
    "tw_acf" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb
                    FROM events WHERE event_type = 'purchase'),
          b AS (SELECT hb, count(*) AS c FROM e GROUP BY 1),
          r AS (SELECT min(hb) AS mn, max(hb) AS mx FROM b),
          spine AS (SELECT unnest(generate_series(mn, mx,
                      INTERVAL 1 HOUR)) AS hb FROM r),
          dense AS (SELECT s.hb, CAST(coalesce(c, 0) AS BIGINT) AS x
                    FROM spine s LEFT JOIN b USING (hb)),
          -- sums stay HUGEINT (DuckDB's native sum(BIGINT) result):
          -- a BIGINT down-cast would re-introduce the 2^63 cliff the
          -- engine's DECIMAL(38,0) sums removed (round 9)
          gstat AS (SELECT count(*) AS n, sum(x) AS sx,
                           sum(x * x) AS sxx
                    FROM dense),
          lg AS (SELECT CAST(k AS BIGINT) AS lag, count(*) AS m,
                        sum(a.x * bb.x) AS sxy,
                        sum(a.x) AS sh,
                        sum(bb.x) AS st
                 FROM dense a
                 CROSS JOIN (SELECT unnest(range(1, 49)) AS k) ks
                 JOIN dense bb
                   ON bb.hb = a.hb + to_hours(CAST(k AS BIGINT))
                 GROUP BY 1)
          SELECT lag,
                 round(((CAST(sxy AS DOUBLE)
                         - (CAST(sx AS DOUBLE) / n) * CAST(sh + st AS DOUBLE)
                         + CAST(m AS DOUBLE) * (CAST(sx AS DOUBLE) / n)
                           * (CAST(sx AS DOUBLE) / n)) / n)
                       / (CAST(sxx AS DOUBLE) / n
                          - (CAST(sx AS DOUBLE) / n)
                            * (CAST(sx AS DOUBLE) / n)), 6) AS r
          FROM lg CROSS JOIN gstat ORDER BY lag""",
    "tw_stickiness" ->
      """WITH act AS (SELECT DISTINCT user_id,
                             CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                               AS TIMESTAMP) AS day
                      FROM events),
          dau AS (SELECT day, count(DISTINCT user_id) AS dau
                  FROM act GROUP BY 1),
          span AS (SELECT min(day) AS mn FROM act),
          w AS (SELECT DISTINCT user_id, CAST(wend AS TIMESTAMP) AS wend
                FROM act,
                  LATERAL (SELECT unnest(generate_series(day,
                    day + INTERVAL 6 DAYS, INTERVAL 1 DAY)) AS wend) g),
          wau AS (SELECT wend AS day, count(DISTINCT user_id) AS wau
                  FROM w GROUP BY 1)
          SELECT d.day, dau, wau,
                 round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness,
                 CAST(least(date_diff('day', CAST(mn AS DATE),
                   CAST(d.day AS DATE)) + 1, 7) AS INT) AS days_observed
          FROM dau d JOIN wau USING (day) CROSS JOIN span
          ORDER BY day""",
    "tw_mase" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb
                    FROM events WHERE event_type = 'purchase'),
          b AS (SELECT hb, count(*) AS c FROM e GROUP BY 1),
          r AS (SELECT min(hb) AS mn, max(hb) AS mx FROM b),
          spine AS (SELECT unnest(generate_series(mn, mx,
                      INTERVAL 1 HOUR)) AS hb FROM r),
          dense AS (SELECT s.hb, CAST(coalesce(c, 0) AS BIGINT) AS x
                    FROM spine s LEFT JOIN b USING (hb)),
          ev AS (SELECT abs(t.x - s24.x) AS e24, abs(t.x - s1.x) AS e1
                 FROM dense t
                 JOIN dense s24 ON s24.hb = t.hb - INTERVAL 24 HOURS
                 JOIN dense s1 ON s1.hb = t.hb - INTERVAL 1 HOUR
                 CROSS JOIN r
                 WHERE t.hb > mx - INTERVAL 168 HOURS)
          SELECT count(*) AS n_eval,
                 round(CAST(sum(e24) AS DOUBLE) / count(*), 6) AS mae_snaive,
                 round(CAST(sum(e1) AS DOUBLE) / count(*), 6) AS mae_naive1,
                 round(CAST(sum(e24) AS DOUBLE) / CAST(sum(e1) AS DOUBLE), 6)
                   AS mase
          FROM ev""",
    "tw_cpd" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hb
                    FROM events WHERE event_type = 'error'),
          b AS (SELECT hb, count(*) AS c FROM e GROUP BY 1),
          r AS (SELECT min(hb) AS mn, max(hb) AS mx FROM b),
          spine AS (SELECT unnest(generate_series(mn, mx,
                      INTERVAL 1 HOUR)) AS hb FROM r),
          dense AS (SELECT s.hb, CAST(coalesce(c, 0) AS BIGINT) AS x
                    FROM spine s LEFT JOIN b USING (hb)),
          gstat AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx
                    FROM dense),
          cs AS (SELECT hb, x,
                        CAST(sum(x) OVER (ORDER BY hb
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ps,
                        CAST(count(*) OVER (ORDER BY hb
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS t
                 FROM dense)
          SELECT hb, x,
                 round(CAST(ps AS DOUBLE)
                   - CAST(t AS DOUBLE) * (CAST(sx AS DOUBLE) / n), 6) AS cusum
          FROM cs CROSS JOIN gstat
          ORDER BY abs(CAST(ps AS DOUBLE)
            - CAST(t AS DOUBLE) * (CAST(sx AS DOUBLE) / n)) DESC, hb
          LIMIT 5""",
  )
}
