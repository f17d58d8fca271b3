package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Multimodal-column operators (driver north star): media as opaque
  * BINARY payloads + typed metadata, with decode/feature-extraction/
  * frame-sampling implemented as partition-parallel column pipelines.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (hash-derived dimensions — see
  * `fakeDecode` + graft.streaming.MultimodalOps for the mapPartitions
  * plumbing); everything around it — binary schema, metadata struct,
  * per-frame explosion, partitioning — is real and oracle-verified.
  * Payloads are synthesized from `documents.text` (the only blob-able
  * corpus in the testdata) via cast to binary.
  */
object MultimodalQueries extends GroupBase {

  /** STUB DECODE: deterministic pseudo-dimensions from the stable
    * 32-bit content hash. A real deployment swaps this one expression
    * for a codec UDF / mapInPandas batch — the surrounding plan is
    * unchanged. */
  private def fakeWidth(h: org.apache.spark.sql.Column) =
    (lit(64) + pmod(h, lit(1216))).as("width")
  private def fakeHeight(h: org.apache.spark.sql.Column) =
    // floor(h/1216) in double then % — same IEEE steps as the oracle
    (lit(64) + pmod(floor(h / 1216).cast("long"), lit(656))).as("height")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // manifest scan: binary payload + typed metadata columns
    "mm_manifest" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mtype"),
          length(col("payload")).as("nbytes"),
          md5(col("payload")).as("checksum"),
          lower(hex(col("payload"))).substr(1, 8).as("magic"),
          // head only: Spark base64 is MIME-wrapped (\r\n every 76
          // chars), DuckDB's is unwrapped — the first line is common
          base64(col("payload")).substr(1, 60).as("b64head"))
        .orderBy("doc_id")),

    // decode + feature extraction (STUBBED decode, real pipeline)
    "mm_features" -> ((s, d) => {
      val h = TextOps.hash32(col("text"))
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"), fakeWidth(h), fakeHeight(h),
          length(col("payload")).as("nbytes"))
        .withColumn("aspect",
          col("width").cast("double") / col("height"))
        .withColumn("is_landscape", col("width") > col("height"))
        .orderBy("doc_id")
    }),

    // frame sampling: every 6th frame of a pseudo-video whose frame
    // count derives from payload size — sequence+explode is the
    // partition-parallel shape a real frame sampler uses
    "mm_frame_sample" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("n_frames", (length(col("payload")) % 240 + 1).cast("int"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(6))).as("frame_no"))
        .orderBy("doc_id", "frame_no")),

    // WebDataset-style shard layout: media blobs packed into
    // byte-budgeted shards per modality — the manifest a training
    // loader reads to stream tar shards. Assignment is by START
    // offset (shard = floor(cum_before / BUDGET)), so a blob never
    // splits and each shard overshoots by at most one blob — the
    // standard tar-packing rule. The running byte sum is per-modality
    // (partition-parallel prefix scan, same discipline as pipe_pack's
    // per-lang cumsum: each modality's window task handles only its
    // own rows); integer arithmetic throughout, exact cross-engine.
    // Output is the per-shard manifest: item count, payload bytes,
    // doc_id span.
    "mm_webdataset" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("mtype").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mtype"),
          length(col("payload")).cast("long").as("nbytes"))
        .withColumn("shard",
          // cum-bytes « 2^53, so the double floor-division is exact;
          // BUDGET as a double literal keeps the op single-step on
          // both engines (Spark long/long `/` would go double anyway)
          floor(coalesce(sum(col("nbytes")).over(w), lit(0L)).cast("double")
            / lit(4096.0)).cast("long"))
        .groupBy("mtype", "shard")
        .agg(count(lit(1)).as("n_items"), sum(col("nbytes")).as("total_bytes"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("mtype", "shard")
    }),

    // media dedup readout: per-modality duplicate detection by content
    // checksum — the storage/curation audit a crawl pipeline runs
    // before re-encoding anything (exact byte-dup images/audio are the
    // single cheapest win at 100 TB: dedup BEFORE decode). Two
    // hash-aggs, both map-side-combining: (mtype, checksum) groups
    // carry the keeper (min doc_id) and the per-blob byte size, then
    // the modality rollup reports item/distinct counts and the bytes
    // a keep-one-copy policy reclaims. No window, no pair join — the
    // dd_exact discipline applied to blobs.
    "mm_dedup" -> ((s, d) => {
      val m = t(s, d, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("mtype"),
          length(col("payload")).cast("long").as("nbytes"),
          md5(col("payload")).as("checksum"))
      m.groupBy("mtype", "checksum")
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"),
          max(col("nbytes")).as("nb"))
        .groupBy("mtype")
        .agg(sum(col("cnt")).as("n_items"),
          count(lit(1)).as("n_distinct"),
          sum(col("cnt") - 1).as("n_dup_items"),
          sum((col("cnt") - 1) * col("nb")).as("reclaimable_bytes"))
        .orderBy("mtype")
    }),

    // PERCEPTUAL-hash media near-dup — the fuzzy complement of
    // mm_dedup's exact checksum (a re-encoded / padded blob changes
    // its md5 but not its content statistics). Block-mean hash (the
    // aHash family): the payload byte stream splits into 64 equal
    // blocks, bit j = "block j's mean byte exceeds the global mean",
    // packed into one BIGINT code; near-dup = Hamming <= 12 on
    // candidates sharing any of the 4 16-bit sub-codes (emb_binary's
    // banding — LSH recall, not exhaustive: a pair differing in all
    // four bands is missed, the dd_minhash tradeoff). A deployment
    // points the SAME plan at decoded grayscale via the MultimodalOps
    // mapPartitions hook; payload bytes are the container's stand-in.
    // 100 TB shape: one byte-explode into a (doc, block) hash-agg
    // (map-side combine), integer-only bit math (block_sum·64 >
    // total — no division), band join with bounded buckets, codes
    // carried on band rows so candidates never re-join the code
    // table. Everything integer -> bit-exact cross-engine.
    "mm_phash" -> ((s, d) => {
      // code construction runs in the codegen block_mean_code kernel:
      // one static call per row (zero shuffles) where the relational
      // formulation paid a corpus x payload-bytes explode plus two
      // corpus-scale hash-aggs — measured 1.5 s -> ~0.3 s at sf0.1.
      // The ORACLE keeps the relational per-character formulation, so
      // the two engines cross-check algorithm against algorithm
      // (text_winnow's convention). The kernel hashes BYTES (the
      // honest unit for binary media) while the oracle sums per
      // CHARACTER, so both sides ENFORCE the ASCII precondition —
      // octet_length = char_length — instead of assuming it: a
      // non-ASCII payload is excluded from both pools rather than
      // silently diverging in the filter and the code.
      val codes = t(s, d, "documents")
        .filter(octet_length(col("text")) === length(col("text")) &&
          octet_length(col("text")) >= 64)
        .select(col("doc_id"),
          call_function("block_mean_code", col("text")).as("code"))
      val bands = codes
        .select(col("doc_id"), col("code"),
          explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("bkey",
          expr("shiftright(code, CAST(k * 16 AS INT))")
            .bitwiseAND(lit(65535L)))
      bands.as("a").join(bands.as("b").hint("shuffle_hash"),
          col("a.k") === col("b.k") && col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          expr("CAST(bit_count(a.code ^ b.code) AS INT)").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 12)
        .orderBy("da", "db")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "mm_manifest" ->
      """SELECT doc_id,
                ['image', 'audio', 'video'][CAST((doc_id % 3 + 3) % 3 + 1 AS INT)] AS mtype,
                CAST(octet_length(encode(text)) AS INT) AS nbytes,
                md5(text) AS checksum,
                lower(substring(to_hex(encode(text)), 1, 8)) AS magic,
                substring(to_base64(encode(text)), 1, 60) AS b64head
         FROM documents ORDER BY doc_id""",
    "mm_features" -> {
      val h = TextOps.hash32Sql("text")
      s"""SELECT doc_id,
                 64 + ($h) % 1216 AS width,
                 64 + CAST(floor(($h) / 1216) AS BIGINT) % 656 AS height,
                 CAST(octet_length(encode(text)) AS INT) AS nbytes,
                 CAST(64 + ($h) % 1216 AS DOUBLE)
                   / (64 + CAST(floor(($h) / 1216) AS BIGINT) % 656) AS aspect,
                 (64 + ($h) % 1216) > (64 + CAST(floor(($h) / 1216) AS BIGINT) % 656)
                   AS is_landscape
          FROM documents ORDER BY doc_id"""
    },
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
                CAST(frame_no AS INT) AS frame_no FROM (
           SELECT doc_id, octet_length(encode(text)) % 240 + 1 AS n_frames
           FROM documents) d,
           LATERAL (SELECT unnest(range(0, n_frames, 6)) AS frame_no) f
         ORDER BY doc_id, frame_no""",
    "mm_webdataset" ->
      """WITH m AS (
           SELECT doc_id,
                  ['image', 'audio', 'video'][CAST((doc_id % 3 + 3) % 3 + 1 AS INT)] AS mtype,
                  CAST(octet_length(encode(text)) AS BIGINT) AS nbytes
           FROM documents),
         sh AS (
           SELECT doc_id, mtype, nbytes,
                  CAST(floor(CAST(coalesce(sum(nbytes) OVER (
                         PARTITION BY mtype ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS DOUBLE) / CAST(4096.0 AS DOUBLE)) AS BIGINT) AS shard
           FROM m)
         SELECT mtype, shard, count(*) AS n_items,
                CAST(sum(nbytes) AS BIGINT) AS total_bytes,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM sh GROUP BY 1, 2 ORDER BY mtype, shard""",
    "mm_dedup" ->
      """WITH m AS (
           SELECT doc_id,
                  ['image', 'audio', 'video'][CAST((doc_id % 3 + 3) % 3 + 1 AS INT)] AS mtype,
                  CAST(octet_length(encode(text)) AS BIGINT) AS nbytes,
                  md5(text) AS checksum
           FROM documents),
         g AS (SELECT mtype, checksum, count(*) AS cnt,
                      min(doc_id) AS keeper, max(nbytes) AS nb
               FROM m GROUP BY 1, 2)
         SELECT mtype,
                CAST(sum(cnt) AS BIGINT) AS n_items,
                count(*) AS n_distinct,
                CAST(sum(cnt - 1) AS BIGINT) AS n_dup_items,
                CAST(sum((cnt - 1) * nb) AS BIGINT) AS reclaimable_bytes
         FROM g GROUP BY 1 ORDER BY mtype""",
    "mm_phash" ->
      """WITH base AS (SELECT doc_id, text, length(text) // 64 AS b
                       FROM documents
                       -- ASCII enforced (octet = char), mirroring the
                       -- engine's byte/char-agnostic eligibility gate
                       WHERE octet_length(encode(text)) = length(text)
                         AND length(text) // 64 >= 1),
         blocks AS (
           SELECT doc_id, CAST((i - 1) // b AS INT) AS blk,
                  sum(ascii(substr(text, CAST(i AS INT), 1))) AS bs
           FROM base, LATERAL (SELECT unnest(range(1,
                  CAST(b * 64 AS INT) + 1)) AS i) r
           GROUP BY doc_id, (i - 1) // b),
         tot AS (SELECT doc_id, sum(bs) AS ts FROM blocks GROUP BY 1),
         codes AS (
           SELECT c.doc_id,
                  bit_or(CASE WHEN bs * 64 > ts THEN
                    (CASE WHEN blk = 63
                          THEN CAST(-9223372036854775808 AS BIGINT)
                          ELSE (CAST(1 AS BIGINT) << blk) END)
                    ELSE 0 END) AS code
           FROM blocks c JOIN tot USING (doc_id) GROUP BY 1),
         bands AS (SELECT doc_id, code, k,
                          (code >> CAST(k * 16 AS INT)) & 65535 AS bkey
                   FROM codes, (SELECT unnest(range(0, 4)) AS k) ks)
         SELECT da, db, hamming FROM (
           SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
                  CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
           FROM bands a JOIN bands b
             ON a.k = b.k AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         WHERE hamming <= 12 ORDER BY da, db""",
  )
}
