package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Shared MinHash parameters — referenced by BOTH the codegen kernels
  * here and the DuckDB oracle SQL in queries.DedupQueries, so the two
  * engines provably use identical constants. (a*h + b) mod P with
  * P = 2^31 - 1 (prime); a,b < 2^17 keep h*a < 2^49 — no overflow. */
object MinHashParams {
  val P = 2147483647L
  val K = 16
  val A: Array[Long] = Array(463, 5147, 9173, 12841, 17903, 21379, 26717,
    31247, 35023, 39361, 44281, 48673, 53479, 57349, 61981, 65761)
  val B: Array[Long] = Array(715, 3617, 8101, 11159, 15823, 19853, 24223,
    28837, 33029, 37591, 42187, 46649, 51421, 55579, 60101, 64171)
}

/** Single-pass signature kernels for the near-dup pipeline.
  *
  * The composable formulation (tokens → shingle HOF → md5 hash HOF →
  * K min-reductions) is semantically right but physically slow: every
  * stage is an interpreted lambda with per-element boxing and
  * intermediate array allocation — measured ~0.7 ms/doc at sf0.1,
  * dominating the whole dedup pipeline. These kernels do one tight
  * loop per document (ThreadLocal MessageDigest, one StringBuilder,
  * primitive min/vote arrays) and return the finished signature.
  *
  * Cross-engine contract (unchanged from the HOF version, so the
  * DuckDB oracles still verify bit-for-bit): shingle = n
  * space-joined tokens; h = first 8 hex chars of md5(shingle) as an
  * unsigned 32-bit value; minhash_k = min over shingles of
  * (h*A(k)+B(k)) mod P; simhash bit j = sign of the sum over DISTINCT
  * h of ±1 per bit j. MinHash needs no distinct pass — min over a
  * multiset equals min over its support.
  */
object HashKernels {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes as unsigned 32-bit — identical to
    * conv(substr(md5(s),1,8),16,10) (Spark) and
    * CAST('0x'||substr(md5(s),1,8) AS BIGINT) (DuckDB). */
  def h32(s: String): Long = {
    val d = md.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** 64-bit block-mean code of a payload's byte stream (mm_phash's
    * aHash kernel): the first 64·(len/64) bytes split into 64 equal
    * blocks; bit j = block j's byte sum · 64 > total byte sum (the
    * division-free mean compare). Returns 0 when len < 64 (callers
    * filter those rows out first). Byte-based — identical to the
    * per-character relational formulation for ASCII payloads, which
    * is also the honest unit for BINARY media blobs. Integer-only →
    * bit-exact vs the oracle's relational mirror. */
  def blockMeanCode(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    val b = bytes.length / 64
    if (b < 1) return 0L
    val sums = new Array[Long](64)
    var total = 0L
    var i = 0
    val used = b * 64
    while (i < used) {
      val v = (bytes(i) & 0xff).toLong
      sums(i / b) += v
      total += v
      i += 1
    }
    var code = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) * 64 > total) code |= (1L << j)
      j += 1
    }
    code
  }

  private def eachShingleHash(toks: ArrayData, n: Int)(f: Long => Unit): Unit = {
    val len = toks.numElements()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= len) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      f(h32(sb.toString))
      i += 1
    }
  }

  /** K MinHash components over the document's word n-gram shingles;
    * null (caller filters) when the doc has no shingle. */
  def minhash(toks: ArrayData, n: Int): ArrayData = {
    import MinHashParams._
    if (toks.numElements() < n) return null
    val mins = Array.fill(K)(Long.MaxValue)
    eachShingleHash(toks, n) { h =>
      var k = 0
      while (k < K) {
        val v = (h * A(k) + B(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** All shingle hashes in one pass — for pipelines that join/count
    * on the (doc, shingle) relation: BIGINT keys shuffle ~4× fewer
    * bytes than the shingle strings they stand for. Null when the doc
    * has no shingle. */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return null
    val out = new Array[Long](len - n + 1)
    var i = 0
    eachShingleHash(toks, n) { h => out(i) = h; i += 1 }
    new GenericArrayData(out)
  }

  /** Word n-gram shingle strings in one pass (the HOF formulation
    * slices + re-concats per element through interpreted lambdas);
    * null when the doc has no shingle. */
  def shingleStrings(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return null
    val out = new Array[AnyRef](len - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + n <= len) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Highest occurrence count of any single token — one hashmap pass
    * per row, replacing an explode + (doc, tok) hash-agg + re-agg
    * (two shuffles over one row per TOKEN) with a pure projection.
    * Exactly the `max(count per token)` the Gopher top-token-fraction
    * signal needs. 0 for an empty array. */
  def topTokenCount(toks: ArrayData): Int = {
    val len = toks.numElements()
    if (len == 0) return 0
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](len * 2)
    var best = 0
    var i = 0
    while (i < len) {
      val c = counts.merge(toks.getUTF8String(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
      if (c.intValue() > best) best = c.intValue()
      i += 1
    }
    best
  }

  /** 32-bit SimHash over DISTINCT shingle hashes, packed as a long. */
  def simhash(toks: ArrayData, n: Int): java.lang.Long = {
    if (toks.numElements() < n) return null
    val seen = new java.util.HashSet[java.lang.Long]()
    eachShingleHash(toks, n)(h => { seen.add(h); () })
    val votes = new Array[Int](32)
    val it = seen.iterator()
    while (it.hasNext) {
      val h = it.next().longValue()
      var j = 0
      while (j < 32) {
        votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  /** Winnowing fingerprint picks (Schleimer et al. 2003) over a
    * shingle-hash array in one pass: for every w-window the RIGHTMOST
    * minimal hash, consecutive duplicates collapsed. A position can
    * only be picked by the contiguous window range [pos-w+1, pos]
    * (once a later position ties-or-beats it, it stays preferred until
    * the earlier one leaves the window), so collapsing equal
    * consecutive picks equals a global distinct — the HOF formulation
    * (per-window aggregate fold + array_distinct) computes exactly
    * this at ~w structs allocated per position. Empty array (not
    * null) when there are fewer than w hashes: no window exists. */
  def winnow(hs: ArrayData, w: Int): ArrayData = {
    val len = hs.numElements()
    if (len < w) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    var lastH = -1L
    var lastP = -1
    var i = 0
    while (i + w <= len) {
      var mh = Long.MaxValue
      var mp = -1
      var j = 0
      while (j < w) {
        val h = hs.getLong(i + j)
        if (h <= mh) { mh = h; mp = i + j }
        j += 1
      }
      if (mp != lastP || mh != lastH) {
        out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](mh, mp))
        lastH = mh
        lastP = mp
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Content-defined-chunking chunk hashes in one pass — dd_cdc's
    * kernel. Contract identical to the HOF formulation the DuckDB
    * oracle mirrors: boundary at position i in [w, n] when
    * h32(space-joined toks[i-w..i-1]) % mod == 0; cut points are
    * 0 :: boundaries :: n; each chunk's hash is h32 of its
    * space-joined token span, with the empty trailing span a boundary
    * at exactly n would create dropped. The interpreted per-position
    * HOF version paid a slice copy + array_join + boxed md5 chain per
    * position (and needed tk/cuts Generate barriers against
    * lambda-capture re-derivation); this is one tight loop with a
    * reused StringBuilder and no captured arrays. */
  def cdcChunks(toks: ArrayData, w: Int, mod: Int): ArrayData = {
    val n = toks.numElements()
    val sb = new java.lang.StringBuilder(64)
    def spanHash(start: Int, len: Int): Long = {
      sb.setLength(0)
      var j = start
      val end = start + len
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        j += 1
      }
      h32(sb.toString)
    }
    val cuts = new scala.collection.mutable.ArrayBuffer[Int](8)
    cuts += 0
    if (n >= w) {
      var i = w
      while (i <= n) {
        if (spanHash(i - w, w) % mod == 0) cuts += i
        i += 1
      }
    }
    cuts += n
    val out = new scala.collection.mutable.ArrayBuffer[Any](cuts.length - 1)
    var j = 0
    while (j < cuts.length - 1) {
      if (cuts(j + 1) > cuts(j)) out += spanHash(cuts(j), cuts(j + 1) - cuts(j))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val SpanEvery = 20  // span start fires when h % 20 == 0 (~5%)
  private val SpanLook = 3    // max lookback: span length <= 4 covers [j, j+3]

  /** T5 span-corruption stats + masked/targets rendering in one pass —
    * pipe_spancorrupt's kernel. Contract identical to the HOF
    * formulation the DuckDB oracle mirrors: the draw at position j is
    * h = h32("docId:j"); a span starts where h % 20 == 0 and runs
    * 2 + h % 3 tokens; position i is corrupted when any span starting
    * in [i-3, i] still covers it; n_spans counts corrupted-run starts.
    * Returns STRUCT<n_corr, n_spans, masked, targets>. The HOF
    * version's nested exists-over-sl lambda forced sl and fl behind
    * Generate barriers (captured-array re-derivation is O(len²)–
    * O(len³) per row); here the whole doc is one native pass. */
  def spanCorrupt(docId: org.apache.spark.unsafe.types.UTF8String,
                  toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val idPrefix = docId.toString + ":"
    val sl = new Array[Long](n)
    var j = 0
    while (j < n) {
      val h = h32(idPrefix + j)
      sl(j) = if (h % SpanEvery == 0) 2 + h % 3 else 0L
      j += 1
    }
    var nCorr = 0L
    var nSpans = 0L
    val masked = new java.lang.StringBuilder(32)
    val targets = new java.lang.StringBuilder(32)
    var prevCorrupted = false
    var i = 0
    while (i < n) {
      var corrupted = false
      var k = if (i - SpanLook > 0) i - SpanLook else 0
      while (!corrupted && k <= i) {
        if (sl(k) > 0 && (i - k) < sl(k)) corrupted = true
        k += 1
      }
      val tok = toks.getUTF8String(i).toString
      if (i > 0) masked.append(' ')
      if (corrupted) {
        nCorr += 1
        if (!prevCorrupted) nSpans += 1
        masked.append('_')
        if (targets.length > 0) targets.append(' ')
        targets.append(tok)
      } else masked.append(tok)
      prevCorrupted = corrupted
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nCorr, nSpans,
      org.apache.spark.unsafe.types.UTF8String.fromString(masked.toString),
      org.apache.spark.unsafe.types.UTF8String.fromString(targets.toString)))
  }
}

private[functions] trait ShingleKernelExpr extends UnaryExpression {
  def n: Int
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens and n >= 1")
  }
}

/** `shingle_minhash(tokens, n)` → ARRAY<BIGINT>[K] — see HashKernels. */
case class ShingleMinHash(child: Expression, n: Int) extends ShingleKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_minhash"

  override def nullSafeEval(toks: Any): Any =
    HashKernels.minhash(toks.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.HashKernels.minhash($a, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
    code
  }

  override protected def withNewChildInternal(c: Expression): ShingleMinHash =
    copy(child = c)
}

/** `shingle_hashes(tokens, n)` → ARRAY<BIGINT> of h32(shingle). */
case class ShingleHashes(child: Expression, n: Int) extends ShingleKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(toks: Any): Any =
    HashKernels.shingleHashes(toks.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.HashKernels.shingleHashes($a, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** `winnow_fingerprints(hashes, w)` → ARRAY<STRUCT<h:BIGINT,pos:INT>>
  * — the deduplicated winnowing picks over a shingle-hash array. */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> hashes and w >= 1")
  }

  override def nullSafeEval(hs: Any): Any =
    HashKernels.winnow(hs.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.HashKernels.winnow($a, $w);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** `shingle_strings(tokens, n)` → ARRAY<STRING> word n-grams. */
case class ShingleStrings(child: Expression, n: Int) extends ShingleKernelExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_strings"

  override def nullSafeEval(toks: Any): Any =
    HashKernels.shingleStrings(toks.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.HashKernels.shingleStrings($a, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): ShingleStrings =
    copy(child = c)
}

/** `shingle_simhash(tokens, n)` → BIGINT packed 32-bit signature. */
case class ShingleSimHash(child: Expression, n: Int) extends ShingleKernelExpr {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_simhash"

  override def nullSafeEval(toks: Any): Any = {
    val r = HashKernels.simhash(toks.asInstanceOf[ArrayData], n)
    if (r == null) null else r.longValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("sim")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Long $tmp = graft.functions.HashKernels.simhash($a, $n);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): ShingleSimHash =
    copy(child = c)
}

/** `cdc_chunks(tokens, w, mod)` → ARRAY<BIGINT> content-defined
  * chunk hashes (see HashKernels.cdcChunks). */
case class CdcChunks(child: Expression, w: Int, mod: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if w >= 1 && mod >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens, w >= 1 and mod >= 1")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(toks: Any): Any =
    HashKernels.cdcChunks(toks.asInstanceOf[ArrayData], w, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.cdcChunks($a, $w, $mod);")

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

/** `span_corrupt(doc_id_string, tokens)` →
  * STRUCT<n_corr:BIGINT, n_spans:BIGINT, masked:STRING, targets:STRING>
  * (see HashKernels.spanCorrupt). */
case class SpanCorruptStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (STRING doc id, ARRAY<STRING> tokens)")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_corr", LongType, nullable = false),
    StructField("n_spans", LongType, nullable = false),
    StructField("masked", StringType, nullable = false),
    StructField("targets", StringType, nullable = false)))
  override def prettyName: String = "span_corrupt"

  override def nullSafeEval(id: Any, toks: Any): Any =
    HashKernels.spanCorrupt(
      id.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashKernels.spanCorrupt($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorruptStats =
    copy(left = newLeft, right = newRight)
}

/** `token_topcount(tokens)` → INT max per-token occurrence count —
  * turns the repetition signal's explode + two-level hash-agg into a
  * per-row kernel (see HashKernels.topTokenCount). */
/** Codegen'd 64-bit block-mean payload code (see
  * HashKernels.blockMeanCode) — one static call per row replaces
  * mm_phash's byte explode + two corpus-scale hash-aggs. */
case class BlockMeanCode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING payload")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "block_mean_code"

  override def nullSafeEval(s: Any): Any =
    HashKernels.blockMeanCode(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.blockMeanCode($a);")

  override protected def withNewChildInternal(c: Expression): BlockMeanCode =
    copy(child = c)
}

case class TokenTopCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> tokens")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "token_topcount"

  override def nullSafeEval(toks: Any): Any =
    HashKernels.topTokenCount(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashKernels.topTokenCount($a);")

  override protected def withNewChildInternal(c: Expression): TokenTopCount =
    copy(child = c)
}
