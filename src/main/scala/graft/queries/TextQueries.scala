package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Text-analysis operators over `documents` — the training-data
  * pipeline surface (driver north star): token stats, quality scoring,
  * language-ID heuristic, token frequencies, content fingerprinting.
  *
  * Every op is element-wise or one hash-aggregate — at 100 TB each is
  * an embarrassingly-parallel scan (no driver-side collection, no
  * UDFs; array higher-order functions are codegen-friendly).
  */
object TextQueries extends GroupBase {

  private val stopwords = Seq("the", "a", "and", "of")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-doc token/char stats (token counting, SURVEY north-star)
    "text_stats" -> ((s, d) => {
      val toks = col("tk") // materialized once; see TextOps.shingles doc
      t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(
          col("doc_id"),
          size(toks).as("n_tok"),
          length(col("text")).as("n_char"),
          size(array_distinct(toks)).as("n_uniq"),
          aggregate(transform(toks, t => length(t)), lit(0),
            (acc, x) => acc + x).as("tok_chars"))
        .orderBy("doc_id")
    }),

    // quality scoring: stopword ratio, type-token ratio, length score
    // (length/punct/stopword heuristics per the driver spec)
    "text_quality" -> ((s, d) => {
      val toks = col("tk")
      val nTok = size(toks)
      val nStop = size(filter(toks, t => t.isInCollection(stopwords)))
      val ttr = size(array_distinct(toks)).cast("decimal(18,8)") /
        nTok.cast("decimal(18,8)")
      t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(
        col("doc_id"),
        nStop.as("n_stop"),
        (nStop.cast("decimal(18,8)") / nTok.cast("decimal(18,8)"))
          .cast("double").as("stop_ratio"),
        ttr.cast("double").as("ttr"),
        (nTok >= 20 && nTok <= 90).as("len_ok"))
        .orderBy("doc_id")
    }),

    // language-ID heuristic (n-gram/marker-based): deterministic
    // marker-token vote, compared against the labeled lang column
    "text_langid" -> ((s, d) => {
      val toks = col("tk")
      val guess = when(size(filter(toks, t => t.isInCollection(stopwords))) > 0, "en")
        .otherwise("unk")
      t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(
          col("doc_id"), col("lang"), guess.as("guess"),
          (col("lang") === guess).as("agree"))
        .orderBy("doc_id")
    }),

    // corpus token frequencies, top 20 (flatMap/explode + agg;
    // Transform.scala:67-90 flatMap → word count idiom)
    "text_token_freq" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(explode(col("tk")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(20)),

    // TF-IDF: per-doc top term by tf-idf weight — the two-stage
    // (per-doc tf × corpus idf) aggregation shape of a 100 TB feature
    // pipeline; idf side is tiny (vocab) and broadcasts
    "text_tfidf" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("tk", TextOps.tokens(col("text")))
      val toks = docs.select(col("doc_id"), size(col("tk")).as("dlen"),
        explode(col("tk")).as("tok"))
      val nDocs = docs.select(countDistinct(col("doc_id")).as("n"))
      val df = toks.select("doc_id", "tok").distinct()
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val tf = toks.groupBy("doc_id", "dlen", "tok").agg(count(lit(1)).as("tf"))
      val scored = tf.join(broadcast(df), "tok").crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("tok"),
          round((col("tf").cast("double") / col("dlen")) *
            log(col("n").cast("double") / col("df")), 8).as("w"))
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy("doc_id")
        .orderBy(col("w").desc, col("tok"))
      scored.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select("doc_id", "tok", "w")
        .orderBy("doc_id")
    }),

    // content fingerprinting: md5 + stable 32-bit hash
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        md5(col("text")).as("fp_md5"),
        TextOps.hash32(col("text")).as("fp32"))
        .orderBy("doc_id")),
  )

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"
  private val stopSql = "['the', 'a', 'and', 'of']"

  def oracleSql: Map[String, String] = Map(
    "text_stats" ->
      s"""SELECT doc_id,
          len($toksSql) AS n_tok,
          length(text) AS n_char,
          len(list_distinct($toksSql)) AS n_uniq,
          CAST(list_sum(list_transform($toksSql, t -> length(t))) AS INT) AS tok_chars
          FROM documents ORDER BY doc_id""",
    "text_quality" ->
      s"""SELECT doc_id,
          len(list_filter($toksSql, t -> list_contains($stopSql, t))) AS n_stop,
          CAST(CAST(len(list_filter($toksSql, t -> list_contains($stopSql, t)))
                    AS DECIMAL(18,8))
               / CAST(len($toksSql) AS DECIMAL(18,8)) AS DOUBLE) AS stop_ratio,
          CAST(CAST(len(list_distinct($toksSql)) AS DECIMAL(18,8))
               / CAST(len($toksSql) AS DECIMAL(18,8)) AS DOUBLE) AS ttr,
          (len($toksSql) >= 20 AND len($toksSql) <= 90) AS len_ok
          FROM documents ORDER BY doc_id""",
    "text_langid" ->
      s"""SELECT doc_id, lang,
          CASE WHEN len(list_filter($toksSql, t -> list_contains($stopSql, t))) > 0
               THEN 'en' ELSE 'unk' END AS guess,
          (lang = CASE WHEN len(list_filter($toksSql, t -> list_contains($stopSql, t))) > 0
                       THEN 'en' ELSE 'unk' END) AS agree
          FROM documents ORDER BY doc_id""",
    "text_tfidf" ->
      s"""WITH docs AS (SELECT doc_id, $toksSql AS tk FROM documents),
          toks AS (SELECT doc_id, len(tk) AS dlen, unnest(tk) AS tok FROM docs),
          nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
          dfr AS (SELECT tok, count(*) AS df
                  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1),
          tfr AS (SELECT doc_id, dlen, tok, count(*) AS tf
                  FROM toks GROUP BY 1, 2, 3),
          scored AS (
            SELECT doc_id, tok,
                   round((CAST(tf AS DOUBLE) / dlen)
                         * ln(CAST(n AS DOUBLE) / df), 8) AS w
            FROM tfr JOIN dfr USING (tok) CROSS JOIN nd)
          SELECT doc_id, tok, w FROM (
            SELECT doc_id, tok, w,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY w DESC, tok) AS rn
            FROM scored) x
          WHERE rn = 1 ORDER BY doc_id""",
    "text_token_freq" ->
      s"""SELECT tok, count(*) AS cnt
          FROM (SELECT unnest($toksSql) AS tok FROM documents)
          GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""",
    "text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp_md5, ${TextOps.hash32Sql("text")} AS fp32
          FROM documents ORDER BY doc_id""",
  )
}
