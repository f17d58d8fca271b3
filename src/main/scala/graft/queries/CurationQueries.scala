package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.core.{Exact, ExactSql}

/** Round-4 curation/retrieval surface over `documents`: PII redaction,
  * BM25 relevance scoring, token-budget selection, and deterministic
  * weighted source interleaving — the remaining "what a 100 TB
  * training-data pipeline needs" ops beyond dedup/quality/mixture.
  *
  * Scale notes per op:
  *   - text_pii: pure per-row regex projection — embarrassingly
  *     parallel, no shuffle, codegen'd (no UDF).
  *   - text_bm25: classic two-stage retrieval shape — per-(doc,term)
  *     tf agg shuffles only matched postings (terms are filtered
  *     BEFORE the shuffle); df + corpus stats are tiny and broadcast.
  *   - pipe_budget: per-partition-key (lang) running sum — each lang's
  *     prefix scan parallelizes across the cluster; no global sort.
  *   - pipe_interleave: the per-source rank is partition-parallel; only
  *     the final tiny selected prefix is globally ordered.
  */
object CurationQueries extends GroupBase {

  /** Conservative PII shapes that survive RE2 (DuckDB) and Java regex
    * with identical semantics: email-ish and long digit runs. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IdRe = "[0-9]{6,}"

  private val Bm25Terms = Seq("the", "data")
  // BM25 constants as EXPLICIT double literals (k1=1.2, b=0.75,
  // k1+1=2.2, 1-b=0.25): the oracle parses the same literal text, so
  // both engines hold bit-identical constants (computing 1.2+1 in
  // Scala could round differently than parsing "2.2").
  private val K1 = lit(1.2)
  private val K1p1 = lit(2.2)
  private val Bdl = lit(0.75)
  private val OneMinusB = lit(0.25)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PII scrub: count + redact emails and id-like digit runs.
    // regexp_replace is global in Spark; the oracle passes 'g'.
    "text_pii" -> ((s, d) => {
      val red = regexp_replace(
        regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
        lit(IdRe), lit("<ID>"))
      t(s, d, "documents").select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("text"), lit(IdRe), lit(0))).as("n_idnum"),
        md5(red).as("red_md5"),
        length(red).as("red_len"))
        .orderBy("doc_id")
    }),

    // BM25 term contributions for a fixed query-term set. Postings are
    // filtered to the query terms BEFORE the (doc,term) aggregation, so
    // the shuffle carries only matches; df and the corpus length stats
    // are single-row/tiny broadcasts.
    "text_bm25" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
      val stats = docs.agg(
        count(lit(1)).as("nd"),
        sum(size(col("tk"))).as("sumdl"))
      val toks = docs
        .select(col("doc_id"), size(col("tk")).as("dl"),
          explode(col("tk")).as("tok"))
        .filter(col("tok").isin(Bm25Terms: _*))
      val tf = toks.groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      // idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)); expression
      // shape mirrored token-for-token in the oracle so every IEEE op
      // matches (ln rounded — transcendental last-ulp differs).
      val avgdl = col("sumdl").cast("double") / col("nd")
      val idf = log((col("nd") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)) + lit(1.0))
      val w = (idf * (col("tf") * K1p1) /
        (col("tf") + K1 * (OneMinusB + (Bdl * col("dl")) / avgdl)))
      tf.join(broadcast(df), "tok").crossJoin(broadcast(stats))
        .select(col("doc_id"), col("tok"), round(w, 6).as("bm25"))
        .orderBy("doc_id", "tok")
    }),

    // Token-budget selection: per language, take docs in quality order
    // (type-token ratio) until a token budget fills. The running sum is
    // per-lang (partition-parallel prefix scan), not a global sort.
    // The rk <= BUDGET+1 prefilter bounds the cumsum window by the
    // BUDGET, not the corpus: without it, lang is low-cardinality and
    // one window task sorts every doc of a language. It is lossless
    // because each admissible doc costs >= 1 token, so a row passing
    // cum <= BUDGET has at most BUDGET positive-token rows before it
    // (rank <= BUDGET+1 keeps the first boundary row so the cum of
    // later rows is computed over the same prefix). The prefilter is
    // MIRRORED in the oracle SQL, so both engines compute the same
    // selection by construction; the only divergence from the
    // unfiltered ideal is the degenerate corpus where zero-token docs
    // (null quality, DESC NULLS LAST on both engines — they sort
    // last) outnumber the budget slack, where budget selection is
    // meaningless anyway. With the filter, Spark plans the rank as a
    // WindowGroupLimit: each map task keeps a (BUDGET+1)-row heap per
    // lang before the shuffle.
    "pipe_budget" -> ((s, d) => {
      val BUDGET = 4000
      val tk = col("tk")
      // NULLIF: zero tokens -> NULL quality (sorts last under DESC,
      // never selected into the budget), not an ANSI DIVIDE_BY_ZERO
      // crash (TextExec adversarial-text sweep, round 10)
      val q = (size(array_distinct(tk)).cast("decimal(18,8)") /
        nullif(size(tk), lit(0)).cast("decimal(18,8)")).cast("double")
      val ord = Window.partitionBy("lang").orderBy(col("q").desc, col("doc_id"))
      val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(col("doc_id"), col("lang"), size(tk).as("n_tok"), q.as("q"))
        .withColumn("rk", row_number().over(ord))
        .filter(col("rk") <= BUDGET + 1)
        .withColumn("cum", sum(col("n_tok")).over(w))
        .filter(col("cum") <= BUDGET)
        .select("doc_id", "lang", "n_tok", "cum")
        .orderBy("lang", "doc_id")
    }),

    // Deterministic weighted interleave: doc k of a source with weight
    // w lands at position k/w, so sources appear in a w-proportional
    // round-robin — the reproducible "mixture order" a trainer reads.
    // Ranks are per-source (parallel); only the selected prefix (400
    // rows after the position sort) is globally ordered.
    // The rn <= 400 prefilter is lossless: pos is strictly increasing
    // in rn within a source, so the selected 400 are a per-source
    // PREFIX of the rank order — a row with rn > 400 would need 400+
    // earlier rows of its OWN source selected first. The filter turns
    // the full per-source numbering (source is low-cardinality — all
    // rows of one source on one window task) into a WindowGroupLimit:
    // each map task keeps a 400-row heap per source before the
    // shuffle, so the post-shuffle sort is budget-bounded, not
    // corpus-bounded.
    "pipe_interleave" -> ((s, d) => {
      val wsrc = Window.partitionBy("source").orderBy("doc_id")
      val weight = when(col("source") === "src0", lit(4.0))
        .when(col("source") === "src1", lit(2.0)).otherwise(lit(1.0))
      val sel = t(s, d, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(wsrc))
        .filter(col("rn") <= 400)
        .withColumn("pos", col("rn").cast("double") / weight)
        .orderBy("pos", "source", "doc_id")
        .limit(400)
      sel.withColumn("ord",
          row_number().over(Window.orderBy("pos", "source", "doc_id")))
        .select(col("ord"), col("doc_id"), col("source"), col("pos"))
        .orderBy("ord")
    }),

    // JOINT curation gate — the decision join a production pipeline
    // runs last: text-side signals (exact-dup keeper, Gopher quality)
    // joined with the embedding-side SemDeDup verdict on
    // doc_id = vec_id, one row per document with the per-stage
    // verdicts and the final AND. Missing joins default conservatively
    // (no tokens -> quality fail; no embedding -> semantic pass:
    // at 100 TB only a sampled slice is embedded). Each component is
    // the already-audited catalog query — this adds three hash joins
    // on doc_id over their outputs, nothing else.
    // Quality-classifier TRAINING — the fastText-style gate fitting
    // that `pipe_classify` (fixed weights) presupposes: 3 unrolled
    // full-batch logistic-regression GD rounds on cheap per-doc
    // features (chars, tokens, type-token ratio) against the lang=en
    // label. Each round is ONE corpus scan producing a 4-number
    // gradient (Exact.fsum partials — order-independent, map-side
    // combined); the weight vector is a 1-row broadcast, so at 100 TB
    // the cost is rounds × corpus scans and nothing shuffles but the
    // gradient partials. Cross-engine determinism: features are exact
    // (int casts / decimal ratio); the sigmoid is the one
    // transcendental, so p is floor-quantized to 1e-6 before the
    // gradient (a 1-ulp exp() divergence only matters if p straddles
    // a quantization boundary); weights re-quantize every round so
    // both engines iterate from identical bits. Round 1's p = 0.5
    // exactly (w=0), making round 1 fully exact.
    "pipe_classify_train" -> ((s, d) => {
      // localCheckpoint, NOT .cache(): a cache is keyed on the
      // canonicalized plan in the session CacheManager, so a second
      // invocation of this query (bench warm run, then timed run)
      // silently reads the first run's materialized features instead
      // of scanning the corpus — a timed-region integrity hole. A
      // localCheckpoint is a fresh RDD per invocation (the
      // dd_tfidf_cos / pipe_ccnet convention) and still gives the 4 GD
      // consumers their multi-read barrier.
      val f = trainFeatures(t(s, d, "documents")).localCheckpoint()
      val w0 = s.range(1).select(
        lit(0.0).as("w0"), lit(0.0).as("w1"),
        lit(0.0).as("w2"), lit(0.0).as("w3"))
      val w3 = gdStep(f, gdStep(f, gdStep(f, w0)))
      scoreSigmoid(f, w3)
        .select(col("doc_id"), col("y").cast("int").as("y"),
          col("w0"), col("w1"), col("w2"), col("w3"),
          col("p"), (col("p") >= lit(0.5)).as("pred"))
        .orderBy("doc_id")
    }),

    "pipe_gate" -> ((s, d) => {
      val ex = DedupQueries.queries("dd_exact")(s, d)
        .select(col("doc_id"), col("kept").as("exact_kept"))
      val gq = TextQueries.queries("text_gopher")(s, d)
        .select(col("doc_id"), col("keep").as("gopher_keep"))
      val se = EmbeddingQueries.queries("emb_semdedup")(s, d)
        .select(col("vec_id").as("doc_id"), col("kept").as("sem_kept"))
      t(s, d, "documents").select(col("doc_id"))
        .join(ex, Seq("doc_id"), "left")
        .join(gq, Seq("doc_id"), "left")
        .join(se, Seq("doc_id"), "left")
        .select(col("doc_id"), col("exact_kept"),
          coalesce(col("gopher_keep"), lit(false)).as("gopher_keep"),
          coalesce(col("sem_kept"), lit(true)).as("sem_kept"),
          (col("exact_kept") && coalesce(col("gopher_keep"), lit(false)) &&
            coalesce(col("sem_kept"), lit(true))).as("keep"))
        .orderBy("doc_id")
    }),
  )

  // ---- pipe_classify_train helpers -------------------------------

  private def q6(c: Column): Column = Exact.q6(c)

  /** Per-doc training features: exact ints/ratios only; zero-token
    * docs dropped (their TTR is undefined — and a doc with no tokens
    * has nothing to classify). */
  private def trainFeatures(docs: DataFrame): DataFrame = {
    val tk = col("tk")
    docs.withColumn("tk", TextOps.tokens(col("text")))
      .filter(size(tk) > 0)
      .select(col("doc_id"),
        when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"),
        (col("n_chars").cast("double") / lit(1000.0)).as("x1"),
        (size(tk).cast("double") / lit(100.0)).as("x2"),
        (size(array_distinct(tk)).cast("decimal(18,8)") /
          size(tk).cast("decimal(18,8)")).cast("double").as("x3"))
  }

  /** p = sigmoid(w·x), floor-quantized. The weight row broadcasts. */
  private def scoreSigmoid(f: DataFrame, w: DataFrame): DataFrame =
    f.crossJoin(broadcast(w)).withColumn("p",
      q6(lit(1.0) / (lit(1.0) + exp(-(col("w0") + col("w1") * col("x1") +
        col("w2") * col("x2") + col("w3") * col("x3"))))))

  /** One full-batch GD round: w ← q6(w − lr·(Σ(p−y)·x_j)/n).
    * Gradient sums via Exact.fsum (order-independent bounded-state
    * partials); lr = 0.5 as an explicit literal mirrored in the
    * oracle. */
  private def gdStep(f: DataFrame, w: DataFrame): DataFrame = {
    val e = col("p") - col("y")
    val g = scoreSigmoid(f, w).agg(
      Exact.fsum(e).as("g0"), Exact.fsum(e * col("x1")).as("g1"),
      Exact.fsum(e * col("x2")).as("g2"), Exact.fsum(e * col("x3")).as("g3"),
      count(lit(1)).cast("double").as("n"))
    g.crossJoin(broadcast(w)).select(
      q6(col("w0") - lit(0.5) * (col("g0") / col("n"))).as("w0"),
      q6(col("w1") - lit(0.5) * (col("g1") / col("n"))).as("w1"),
      q6(col("w2") - lit(0.5) * (col("g2") / col("n"))).as("w2"),
      q6(col("w3") - lit(0.5) * (col("g3") / col("n"))).as("w3"))
  }

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  // ---- pipe_classify_train oracle builders -----------------------
  private def q6Sql(e: String): String = ExactSql.q6(e)
  private val pExprSql: String =
    q6Sql("CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(w0 + w1*x1 + w2*x2 + w3*x3)))")
  /** One GD round as two CTEs: p{r} scores under w{r-1}, w{r} updates. */
  private def gdRoundSql(r: Int): String = {
    val prev = if (r == 1) "winit" else s"w${r - 1}"
    s"""p$r AS (SELECT f.*, w.w0, w.w1, w.w2, w.w3, $pExprSql AS p
                FROM f CROSS JOIN $prev w),
        g$r AS (SELECT ${ExactSql.fsum("p - y")} AS g0,
                       ${ExactSql.fsum("(p - y) * x1")} AS g1,
                       ${ExactSql.fsum("(p - y) * x2")} AS g2,
                       ${ExactSql.fsum("(p - y) * x3")} AS g3,
                       CAST(count(*) AS DOUBLE) AS n,
                       max(w0) AS ow0, max(w1) AS ow1,
                       max(w2) AS ow2, max(w3) AS ow3
                FROM p$r),
        w$r AS (SELECT ${q6Sql("ow0 - CAST(0.5 AS DOUBLE) * (g0 / n)")} AS w0,
                       ${q6Sql("ow1 - CAST(0.5 AS DOUBLE) * (g1 / n)")} AS w1,
                       ${q6Sql("ow2 - CAST(0.5 AS DOUBLE) * (g2 / n)")} AS w2,
                       ${q6Sql("ow3 - CAST(0.5 AS DOUBLE) * (g3 / n)")} AS w3
                FROM g$r)"""
  }

  def oracleSql: Map[String, String] = Map(
    "pipe_classify_train" ->
      s"""WITH f AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
                        ELSE CAST(0.0 AS DOUBLE) END AS y,
                   CAST(n_chars AS DOUBLE) / CAST(1000.0 AS DOUBLE) AS x1,
                   CAST(len($toksSql) AS DOUBLE) / CAST(100.0 AS DOUBLE) AS x2,
                   CAST(CAST(len(list_distinct($toksSql)) AS DECIMAL(18,8))
                        / CAST(len($toksSql) AS DECIMAL(18,8)) AS DOUBLE) AS x3
            FROM documents WHERE len($toksSql) > 0),
          winit AS (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                           CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3),
          ${gdRoundSql(1)},
          ${gdRoundSql(2)},
          ${gdRoundSql(3)}
          SELECT doc_id, CAST(y AS INT) AS y, w0, w1, w2, w3, p,
                 p >= CAST(0.5 AS DOUBLE) AS pred
          FROM (SELECT f.doc_id, f.y, w.w0, w.w1, w.w2, w.w3, $pExprSql AS p
                FROM f CROSS JOIN w3 w) z
          ORDER BY doc_id""",
    "text_pii" ->
      s"""SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_email,
            CAST(len(regexp_extract_all(text, '$IdRe')) AS INT) AS n_idnum,
            md5(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
                               '$IdRe', '<ID>', 'g')) AS red_md5,
            CAST(length(regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
                                       '$IdRe', '<ID>', 'g')) AS INT) AS red_len
          FROM documents ORDER BY doc_id""",
    "text_bm25" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS tk FROM documents),
          stats AS (SELECT count(*) AS nd,
                           CAST(sum(len(tk)) AS BIGINT) AS sumdl FROM d),
          toks AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS tok FROM d),
          tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM toks
                 WHERE tok IN ('the', 'data') GROUP BY 1, 2, 3),
          dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
          SELECT doc_id, tok,
                 round(ln((nd - df + CAST(0.5 AS DOUBLE))
                            / (df + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
                       * (tf * CAST(2.2 AS DOUBLE))
                       / (tf + CAST(1.2 AS DOUBLE)
                            * (CAST(0.25 AS DOUBLE)
                               + (CAST(0.75 AS DOUBLE) * dl)
                                   / (CAST(sumdl AS DOUBLE) / nd))), 6) AS bm25
          FROM tf JOIN dfr USING (tok) CROSS JOIN stats
          ORDER BY doc_id, tok""",
    "pipe_budget" ->
      s"""WITH d AS (SELECT doc_id, lang,
                            CAST(len($toksSql) AS INT) AS n_tok,
                            CAST(CAST(len(list_distinct($toksSql)) AS DECIMAL(18,8))
                                 / CAST(NULLIF(len($toksSql), 0) AS DECIMAL(18,8)) AS DOUBLE) AS q
                     FROM documents),
          r AS (SELECT doc_id, lang, n_tok, q,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY q DESC, doc_id) AS rk
                FROM d),
          c AS (SELECT doc_id, lang, n_tok, q,
                       CAST(sum(n_tok) OVER (PARTITION BY lang
                                             ORDER BY q DESC, doc_id
                                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
                         AS cum
                FROM r WHERE rk <= 4001)
          SELECT doc_id, lang, n_tok, cum FROM c WHERE cum <= 4000
          ORDER BY lang, doc_id""",
    "pipe_interleave" ->
      """WITH r AS (SELECT doc_id, source,
                           row_number() OVER (PARTITION BY source
                                              ORDER BY doc_id) AS rn
                    FROM documents),
          p AS (SELECT doc_id, source,
                       CAST(rn AS DOUBLE)
                         / CAST(CASE source WHEN 'src0' THEN 4
                                            WHEN 'src1' THEN 2
                                            ELSE 1 END AS DOUBLE) AS pos
                FROM r),
          sel AS (SELECT * FROM p ORDER BY pos, source, doc_id LIMIT 400)
          SELECT CAST(row_number() OVER (ORDER BY pos, source, doc_id) AS INT)
                   AS ord,
                 doc_id, source, pos
          FROM sel ORDER BY ord""",
    // composed from the component queries' own oracle strings, so the
    // gate's oracle stays in lock-step with theirs
    "pipe_gate" ->
      s"""WITH ex AS (${DedupQueries.oracleSql("dd_exact")}),
          gq AS (${TextQueries.oracleSql("text_gopher")}),
          se AS (${EmbeddingQueries.oracleSql("emb_semdedup")})
          SELECT d.doc_id, ex.kept AS exact_kept,
                 coalesce(gq.keep, false) AS gopher_keep,
                 coalesce(se.kept, true) AS sem_kept,
                 (ex.kept AND coalesce(gq.keep, false)
                   AND coalesce(se.kept, true)) AS keep
          FROM documents d
          LEFT JOIN ex ON d.doc_id = ex.doc_id
          LEFT JOIN gq ON d.doc_id = gq.doc_id
          LEFT JOIN se ON d.doc_id = se.vec_id
          ORDER BY d.doc_id""",
  )
}
