package graft.functions

import org.apache.spark.sql.{Column, SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the
  * innermost loop of similarity search (SURVEY §7.3 custom-Expression
  * tier: used where composing built-ins is semantically right but
  * physically slow).
  *
  * The composable alternative (`aggregate(zip_with(a,b,*),0,+)`) is a
  * pair of HIGHER-ORDER functions: interpreted lambda dispatch per
  * element, two intermediate arrays, and a broken whole-stage-codegen
  * span. This expression generates a tight primitive loop inside
  * codegen — no allocation, no virtual calls. Semantics match the fold
  * exactly (left-to-right double accumulation, per-element
  * float→double promotion), so results are bit-identical to the HOF
  * formulation and the DuckDB oracle.
  *
  * Registered via SparkSessionExtensions (graft.functions
  * .GraftExtensions, applied in core.Sessions.build) — the public
  * extension point, no private Spark APIs.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared-L2 distance between two float/double vectors —
  * the assign/score loop of k-means, IVF, and PQ. Accepts ARRAY<FLOAT>
  * or ARRAY<DOUBLE> on either side; every element promotes to double
  * before the subtract, and the accumulation is the same left-to-right
  * fold as `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)),0,+)`, so
  * results are bit-identical to the HOF formulation and the DuckDB
  * `list_reduce` oracle. */
case class VecSquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_d2"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val (fa, fb) = (isFloat(left), isFloat(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val dv = ctx.freshName("d")
      def get(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dv = ${get(a, isFloat(left))} - ${get(b, isFloat(right))};
         |  $s += $dv * $dv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sparse dot product of two SORTED (term, weight) postings
  * arrays — the candidate-verify kernel of tf-idf cosine near-dup
  * (dd_tfidf_cos). A two-pointer merge over the sorted term keys
  * touches each posting once (O(|a|+|b|), binary UTF8 compares), so a
  * pair verify costs doc-length work with NO per-pair join explosion:
  * the postings-join formulation it replaces shuffled
  * |candidates| x |postings-per-doc| contribution rows into a
  * pair-keyed hash-agg — measured 2.3x slower at sf0.1 (and the HOF
  * map-lookup fold alternative was 35% slower still, Spark MapData
  * lookups being linear scans).
  *
  * Exactness: each product floors onto the 2^-20 grid and accumulates
  * in ONE long (exact integer addition, order-independent): with
  * |w| <= W per weight, each term contributes < W^2 * 2^20, so ~2^42
  * terms fit before overflow at W = 1 — and the tf-idf weights here
  * (< 2^10) leave room for 2^23 shared terms per pair, far past any
  * real document. The multiply-by-2^20 is an exact exponent shift, the
  * final divide is one exact IEEE op, so the value is bit-identical to
  * DuckDB summing the same floored products in SQL — with NO
  * Kahan/BigDecimal machinery in the hot loop. */
case class SparseDotQ20(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{StringType, StructType}

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot_q20"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(st: StructType, _) =>
      st.fields.length == 2 &&
        st.fields(0).dataType == StringType &&
        st.fields(1).dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<STRUCT<STRING, DOUBLE>> " +
        s"arguments sorted by the string key, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private val Grid = 1048576.0 // 2^20

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c == 0) {
        acc += math.floor(ra.getDouble(1) * rb.getDouble(1) * Grid).toLong
        i += 1; j += 1
      } else if (c < 0) i += 1 else j += 1
    }
    acc.toDouble / Grid
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val acc = ctx.freshName("acc"); val c = ctx.freshName("c")
      val ra = ctx.freshName("ra"); val rb = ctx.freshName("rb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; long $acc = 0L;
         |while ($i < $na && $j < $nb) {
         |  InternalRow $ra = $a.getStruct($i, 2);
         |  InternalRow $rb = $b.getStruct($j, 2);
         |  int $c = $ra.getUTF8String(0).compareTo($rb.getUTF8String(0));
         |  if ($c == 0) {
         |    $acc += (long) java.lang.Math.floor(
         |      $ra.getDouble(1) * $rb.getDouble(1) * ${Grid}D);
         |    $i++; $j++;
         |  } else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = ((double) $acc) / ${Grid}D;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SparseDotQ20 =
    copy(left = newLeft, right = newRight)
}

/** Engine extensions: custom function registration (injectFunction is
  * the public SparkSessionExtensions surface). */
class GraftExtensions extends SparkSessionExtensionsProvider {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (args: Seq[Expression]) => FloatDotProduct(args(0), args(1))))
    def litInt(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    ext.injectFunction((
      new FunctionIdentifier("vec_d2"),
      new ExpressionInfo(classOf[VecSquaredDistance].getName, "vec_d2"),
      (args: Seq[Expression]) => VecSquaredDistance(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, "shingle_minhash"),
      (args: Seq[Expression]) => ShingleMinHash(args(0), litInt(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashes(args(0), litInt(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_strings"),
      new ExpressionInfo(classOf[ShingleStrings].getName, "shingle_strings"),
      (args: Seq[Expression]) => ShingleStrings(args(0), litInt(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("shingle_simhash"),
      new ExpressionInfo(classOf[ShingleSimHash].getName, "shingle_simhash"),
      (args: Seq[Expression]) => ShingleSimHash(args(0), litInt(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("token_topcount"),
      new ExpressionInfo(classOf[TokenTopCount].getName, "token_topcount"),
      (args: Seq[Expression]) => TokenTopCount(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => WinnowFingerprints(args(0), litInt(args(1)))))
    ext.injectFunction((
      new FunctionIdentifier("sparse_dot_q20"),
      new ExpressionInfo(classOf[SparseDotQ20].getName, "sparse_dot_q20"),
      (args: Seq[Expression]) => SparseDotQ20(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("block_mean_code"),
      new ExpressionInfo(classOf[BlockMeanCode].getName, "block_mean_code"),
      (args: Seq[Expression]) => BlockMeanCode(args(0))))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (args: Seq[Expression]) =>
        CdcChunks(args(0), litInt(args(1)), litInt(args(2)))))
    ext.injectFunction((
      new FunctionIdentifier("span_corrupt"),
      new ExpressionInfo(classOf[SpanCorruptStats].getName, "span_corrupt"),
      (args: Seq[Expression]) => SpanCorruptStats(args(0), args(1))))
    ext.injectOptimizerRule(_ => graft.plans.ExistsRewriteRule)
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
    ext.injectParser((session, delegate) =>
      new graft.streaming.MrSqlParser(session, delegate))
  }
}

object VectorFunctions {
  /** Codegen'd dot product of two ARRAY<FLOAT> columns, as double. */
  def fdot(a: Column, b: Column): Column = call_function("float_dot", a, b)

  /** Codegen'd squared-L2 distance (float/double arrays, as double). */
  def vd2(a: Column, b: Column): Column = call_function("vec_d2", a, b)

  /** L2 norm via the same kernel. */
  def fnorm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(fdot(a, a))
  }

  /** Codegen'd K-component MinHash signature of word n-gram shingles. */
  def shingleMinhash(toks: Column, n: Int): Column =
    call_function("shingle_minhash", toks, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd packed 32-bit SimHash of word n-gram shingles. */
  def shingleSimhash(toks: Column, n: Int): Column =
    call_function("shingle_simhash", toks, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd word n-gram shingle strings (single pass). */
  def shingleStrings(toks: Column, n: Int): Column =
    call_function("shingle_strings", toks, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd h32 hashes of all word n-gram shingles (single pass). */
  def shingleHashes(toks: Column, n: Int): Column =
    call_function("shingle_hashes", toks, org.apache.spark.sql.functions.lit(n))

  /** Codegen'd max per-token occurrence count (single hashmap pass). */
  def tokenTopCount(toks: Column): Column =
    call_function("token_topcount", toks)

  /** Codegen'd merge-join dot of two SORTED (term, weight) postings
    * arrays, accumulated exactly on the 2^-20 grid. */
  def sparseDot(a: Column, b: Column): Column =
    call_function("sparse_dot_q20", a, b)

  /** Codegen'd winnowing fingerprint picks over a shingle-hash array. */
  def winnowFingerprints(hashes: Column, w: Int): Column =
    call_function("winnow_fingerprints", hashes,
      org.apache.spark.sql.functions.lit(w))

  /** Codegen'd content-defined-chunking chunk hashes (single pass). */
  def cdcChunks(toks: Column, w: Int, mod: Int): Column =
    call_function("cdc_chunks", toks,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(mod))

  /** Codegen'd T5 span-corruption struct (single pass):
    * n_corr, n_spans, masked, targets. */
  def spanCorrupt(docId: Column, toks: Column): Column =
    call_function("span_corrupt", docId, toks)
}
