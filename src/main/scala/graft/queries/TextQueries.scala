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
    "text_token_freq" ->
      s"""SELECT tok, count(*) AS cnt
          FROM (SELECT unnest($toksSql) AS tok FROM documents)
          GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""",
    "text_fingerprint" ->
      s"""SELECT doc_id, md5(text) AS fp_md5, ${TextOps.hash32Sql("text")} AS fp32
          FROM documents ORDER BY doc_id""",
  )
}
