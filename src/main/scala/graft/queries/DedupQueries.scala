package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deduplication operators over `documents` — exact, n-gram Jaccard,
  * MinHash-LSH, SimHash. The 100 TB-critical property of every variant:
  * candidate generation is BLOCKED (hash bucket / band / rare shingle),
  * never all-pairs. All hash functions route through TextOps.hash32 so
  * the DuckDB oracle verifies the full signature pipeline bit-for-bit.
  */
object DedupQueries extends GroupBase {

  // MinHash parameters: K hashes in B bands of R rows (K = B*R).
  // Universal-hash constants (a*h + b) mod P; P prime > 2^31.
  private val P = 2147483647L
  private val K = 16
  private val B = 4
  private val R = 4
  private val A = Array(463, 5147, 9173, 12841, 17903, 21379, 26717, 31247,
    35023, 39361, 44281, 48673, 53479, 57349, 61981, 65761)
  private val Bc = Array(715, 3617, 8101, 11159, 15823, 19853, 24223, 28837,
    33029, 37591, 42187, 46649, 51421, 55579, 60101, 64171)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup by content hash: kept = first doc_id per md5 group
    // (hash-groupBy; one shuffle on the hash at any scale)
    "dd_exact" -> ((s, d) => {
      val w = Window.partitionBy(md5(col("text")))
      t(s, d, "documents")
        .withColumn("kept", col("doc_id") === min(col("doc_id")).over(w))
        .select("doc_id", "kept")
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup pairs, candidate-blocked by shared
    // 3-gram shingle with a doc-frequency cap (rare-shingle blocking:
    // a shingle appearing in >1000 docs generates no candidates —
    // the safety valve that keeps 100 TB from going quadratic)
    "dd_jaccard" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sh = docs
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(col("doc_id"), explode(TextOps.shingles(col("tk"), 3)).as("sh"))
        .distinct()
      val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 1000)
      val shr = sh.join(rare, "sh")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = shr.as("a").join(shr.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
        .select(col("da"), col("db"),
          (col("inter").cast("double") /
            (col("sa.n") + col("sb.n") - col("inter"))).as("jac"))
        .filter(col("jac") >= 0.2)
        .orderBy("da", "db")
    }),

    // MinHash signatures + LSH banding: emit candidate pairs sharing
    // any band, with the fraction of equal minhash components.
    // Exactly one shuffle per stage: shingle-hash agg, band bucket
    // join, pair agg. No all-pairs anywhere.
    "dd_minhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sh = docs
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(col("doc_id"), explode(TextOps.shingles(col("tk"), 3)).as("sh"))
        .distinct()
        .withColumn("h", TextOps.hash32(col("sh")))
      val minCols = (0 until K).map(k =>
        min(pmod(col("h") * A(k) + Bc(k), lit(P))).as(s"m$k"))
      val minhashes = sh.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      val bands = (0 until B).map { b =>
        minhashes.select(col("doc_id"), lit(b).as("band"),
          concat_ws("_", (0 until R).map(r => col(s"m${b * R + r}")): _*).as("bkey"))
      }.reduce(_ unionAll _)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db")).distinct()
      val eq = (0 until K).map(k =>
        when(col("ma.m" + k) === col("mb.m" + k), 1).otherwise(0)).reduce(_ + _)
      cand.join(minhashes.as("ma"), col("da") === col("ma.doc_id"))
        .join(minhashes.as("mb"), col("db") === col("mb.doc_id"))
        .select(col("da"), col("db"), eq.as("n_eq"),
          (eq.cast("double") / K).as("est"))
        .orderBy("da", "db")
    }),

    // SimHash-16 near-dup: signature from token-hash bit votes,
    // candidates blocked on either byte half, emit hamming<=3 pairs
    "dd_simhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tok = docs
        .withColumn("tk", TextOps.tokens(col("text")))
        .select(col("doc_id"), explode(array_distinct(col("tk"))).as("tok"))
        .withColumn("h", TextOps.hash32(col("tok")))
      val votes = (0 until 16).map(j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"v$j"))
      val sig = tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        .select(col("doc_id"),
          (0 until 16).map(j =>
            when(col(s"v$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _).as("sim"))
      val keyed = sig
        .withColumn("b0", col("sim").bitwiseAND(255))
        .withColumn("b1", shiftright(col("sim"), 8).bitwiseAND(255))
      // hamming filter BEFORE the distinct: the byte-block buckets are
      // skewed (similar corpora collapse onto few signatures), so the
      // candidate set is orders of magnitude larger than the survivors —
      // dedup the small filtered set, not the explosion
      def block(b: String) = keyed.as("x").join(keyed.as("y"),
        col(s"x.$b") === col(s"y.$b") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"),
          bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
        .filter(col("hamming") <= 3)
      block("b0").union(block("b1")).distinct()
        .orderBy("da", "db")
    }),
  )

  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"
  // DuckDB-side 3-gram shingles (1-based list indexing)
  private val shinglesSql =
    s"""SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
        FROM (SELECT doc_id, $toksSql AS tk FROM documents) t,
             range(1, 300) r(i)
        WHERE i + 2 <= len(tk)"""

  def oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT doc_id,
                doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS kept
         FROM documents ORDER BY doc_id""",
    "dd_jaccard" ->
      s"""WITH sh AS ($shinglesSql),
          rare AS (SELECT sh FROM (SELECT sh, count(*) df FROM sh GROUP BY 1)
                   WHERE df <= 1000),
          shr AS (SELECT doc_id, x.sh FROM sh x JOIN rare USING (sh)),
          sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
          pairs AS (SELECT a.doc_id da, b.doc_id db, count(*) inter
                    FROM shr a JOIN shr b ON a.sh = b.sh AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
          SELECT da, db,
                 CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jac
          FROM pairs JOIN sizes sa ON da = sa.doc_id
                     JOIN sizes sb ON db = sb.doc_id
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
          ORDER BY da, db""",
    "dd_minhash" -> {
      val h = TextOps.hash32Sql("sh")
      val mins = (0 until K).map(k =>
        s"min((($h) * ${A(k)} + ${Bc(k)}) % $P) AS m$k").mkString(", ")
      val bandRows = (0 until B).map(b =>
        s"SELECT doc_id, $b AS band, concat_ws('_', " +
          (0 until R).map(r => s"m${b * R + r}").mkString(", ") +
          ") AS bkey FROM mh").mkString(" UNION ALL ")
      val eqExpr = (0 until K).map(k =>
        s"CASE WHEN ma.m$k = mb.m$k THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sh AS ($shinglesSql),
          mh AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
          bands AS ($bandRows),
          cand AS (SELECT DISTINCT x.doc_id da, y.doc_id db
                   FROM bands x JOIN bands y
                     ON x.band = y.band AND x.bkey = y.bkey
                    AND x.doc_id < y.doc_id)
          SELECT da, db, ($eqExpr) AS n_eq,
                 CAST(($eqExpr) AS DOUBLE) / $K AS est
          FROM cand JOIN mh ma ON da = ma.doc_id JOIN mh mb ON db = mb.doc_id
          ORDER BY da, db"""
    },
    "dd_simhash" -> {
      val h = TextOps.hash32Sql("tok")
      val votes = (0 until 16).map(j =>
        s"sum(CASE WHEN (($h) >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v$j")
        .mkString(", ")
      val simExpr = (0 until 16).map(j =>
        s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(list_distinct($toksSql)) AS tok
                       FROM documents),
          v AS (SELECT doc_id, $votes FROM tok GROUP BY doc_id),
          sig AS (SELECT doc_id, CAST($simExpr AS BIGINT) AS sim FROM v),
          keyed AS (SELECT doc_id, sim, sim & 255 AS b0, (sim >> 8) & 255 AS b1
                    FROM sig),
          cand AS (
            SELECT x.doc_id da, y.doc_id db,
                   bit_count(xor(x.sim, y.sim)) AS hamming
            FROM keyed x JOIN keyed y ON x.b0 = y.b0 AND x.doc_id < y.doc_id
            WHERE bit_count(xor(x.sim, y.sim)) <= 3
            UNION
            SELECT x.doc_id da, y.doc_id db,
                   bit_count(xor(x.sim, y.sim)) AS hamming
            FROM keyed x JOIN keyed y ON x.b1 = y.b1 AND x.doc_id < y.doc_id
            WHERE bit_count(xor(x.sim, y.sim)) <= 3)
          SELECT da, db, hamming FROM cand
          ORDER BY da, db"""
    },
  )
}
