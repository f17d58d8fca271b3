package graft

import org.scalacheck.{Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.agg.{MaxMin, MaxMinAcc}

/** Property tests for the pure algebraic pieces — the laws the
  * distributed plans rely on (partial aggregation = monoid merge;
  * NFA expansion; as-of tie rule). */
class PropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("MaxMin merge is associative and commutative (partial-agg law)") {
    def acc(xs: Seq[Double]): MaxMinAcc =
      xs.foldLeft(MaxMin.zero)((b, a) => MaxMin.reduce(b, a))
    // bitwise equality: the min sentinel is NaN (the SQL-largest
    // double), and primitive NaN == NaN is false — the algebraic law
    // is about VALUES, so compare bit patterns
    def bitEq(a: MaxMinAcc, b: MaxMinAcc): Boolean =
      java.lang.Double.doubleToLongBits(a.mx) == java.lang.Double.doubleToLongBits(b.mx) &&
        java.lang.Double.doubleToLongBits(a.mn) == java.lang.Double.doubleToLongBits(b.mn) &&
        a.n == b.n
    checkProp(forAll { (xs: List[Double], ys: List[Double]) =>
      bitEq(MaxMin.merge(acc(xs), acc(ys)), MaxMin.merge(acc(ys), acc(xs)))
    })
    checkProp(forAll { (xs: List[Double], ys: List[Double], zs: List[Double]) =>
      bitEq(MaxMin.merge(MaxMin.merge(acc(xs), acc(ys)), acc(zs)),
        MaxMin.merge(acc(xs), MaxMin.merge(acc(ys), acc(zs))))
    })
    checkProp(forAll { (xs: List[Double]) =>
      xs.isEmpty || {
        val a = acc(xs)
        // 2.13's default Ordering[Double] is the same NaN-greatest
        // total ordering; compare bitwise in case the generator ever
        // emits NaN
        java.lang.Double.doubleToLongBits(a.mx) ==
          java.lang.Double.doubleToLongBits(xs.max) &&
          java.lang.Double.doubleToLongBits(a.mn) ==
            java.lang.Double.doubleToLongBits(xs.min) &&
          a.n == xs.length
      }
    })
    // NaN semantics pin (SQL total ordering, NaN greatest): a NaN
    // input must not poison min, must win max, and a NaN-only group
    // reads NaN for both — exactly Spark's built-in min/max
    val mixed = MaxMin.reduce(MaxMin.reduce(MaxMin.zero, 1.5), Double.NaN)
    assert(mixed.mn == 1.5 && mixed.mx.isNaN && mixed.n == 2)
    val only = MaxMin.reduce(MaxMin.zero, Double.NaN)
    assert(only.mn.isNaN && only.mx.isNaN && only.n == 1)
    // Signed-zero pin: Spark's SQLOrderingUtil treats -0.0 == 0.0, so
    // a group mixing both zeros must read ONE canonical zero (+0.0)
    // for both extrema in either feed order — unified on TIE inside
    // gt/lt (not at the door), which keeps the bit-wise commutativity
    // checked above AND lets an all-(-0.0) group keep -0.0 exactly
    // like the built-in incumbent-wins Max/Min do (ADVICE r12)
    for (pair <- Seq(Seq(-0.0, 0.0), Seq(0.0, -0.0))) {
      val z = acc2(pair)
      assert(java.lang.Double.doubleToLongBits(z.mx) ==
        java.lang.Double.doubleToLongBits(0.0), s"max of $pair kept -0.0")
      assert(java.lang.Double.doubleToLongBits(z.mn) ==
        java.lang.Double.doubleToLongBits(0.0), s"min of $pair kept -0.0")
    }
    val allNeg = acc2(Seq(-0.0, -0.0, -0.0))
    assert(java.lang.Double.doubleToLongBits(allNeg.mx) ==
      java.lang.Double.doubleToLongBits(-0.0), "all-(-0.0) max must stay -0.0")
    assert(java.lang.Double.doubleToLongBits(allNeg.mn) ==
      java.lang.Double.doubleToLongBits(-0.0), "all-(-0.0) min must stay -0.0")
    // and merging an all-(-0.0) partial with a +0.0 partial unifies
    val m = MaxMin.merge(allNeg, acc2(Seq(0.0)))
    assert(java.lang.Double.doubleToLongBits(m.mx) ==
      java.lang.Double.doubleToLongBits(0.0) &&
      java.lang.Double.doubleToLongBits(m.mn) ==
        java.lang.Double.doubleToLongBits(0.0), "mixed-zero merge must read +0.0")
  }

  private def acc2(xs: Seq[Double]): MaxMinAcc =
    xs.foldLeft(MaxMin.zero)((b, a) => MaxMin.reduce(b, a))

  test("SeqPattern.expand preserves step count under quantifiers") {
    checkProp(forAll { (reps: List[Int]) =>
      val steps = reps.map(r => graft.streaming.SeqPattern
        .Step("s", Set("A")).times((r % 4).abs + 1))
      graft.streaming.SeqPattern.expand(steps).length ==
        steps.map(_.repeat).sum
    })
  }

  test("AsOfJoin tie rule: dim at exactly t is visible (inclusive as-of)") {
    // pure check of the ordering key used by the operator: at equal ts
    // the right side (side=0) sorts before the left (side=1)
    val pairs = Seq((5L, 0), (5L, 1), (3L, 1), (3L, 0))
    val sorted = pairs.sortBy(p => (p._1, p._2))
    assert(sorted == Seq((3L, 0), (3L, 1), (5L, 0), (5L, 1)))
  }

  test("KahanSum merge is order-insensitive to ~ulp (partial-agg law)") {
    import graft.agg.KahanSum
    def acc(xs: Seq[Double]) =
      xs.foldLeft(KahanSum.zero)((b, a) => KahanSum.reduce(b, a))
    checkProp(forAll { (xs: List[Double], ys: List[Double]) =>
      val clean = (_: List[Double]).filter(d => d.isFinite && math.abs(d) < 1e15)
      val (a, b) = (clean(xs), clean(ys))
      val m1 = KahanSum.finish(KahanSum.merge(acc(a), acc(b)))
      val m2 = KahanSum.finish(KahanSum.merge(acc(b), acc(a)))
      val scale = math.max(1.0, (a ++ b).map(math.abs).maxOption.getOrElse(1.0))
      math.abs(m1 - m2) <= math.ulp(scale) * 8
    })
  }

  test("kernel h32 matches hex-prefix parse of md5 (oracle contract)") {
    import graft.functions.HashKernels
    checkProp(forAll { (s: String) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      HashKernels.h32(s) == java.lang.Long.parseLong(hex, 16)
    })
  }

  test("minhash kernel: mins are universal-hash images of some shingle") {
    import graft.functions.{HashKernels, MinHashParams}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    checkProp(forAll { (raw: List[String]) =>
      val toks = raw.take(20).map(t =>
        UTF8String.fromString(t.replace(' ', '_')))
      val arr = new GenericArrayData(toks.toArray[AnyRef])
      val out = HashKernels.minhash(arr, 3)
      if (toks.length < 3) out == null
      else {
        val shingles = toks.sliding(3).map(_.mkString(" ")).toList
        val hs = shingles.map(s => HashKernels.h32(s))
        (0 until MinHashParams.K).forall { k =>
          val expect = hs.map(h =>
            (h * MinHashParams.A(k) + MinHashParams.B(k)) % MinHashParams.P).min
          out.getLong(k) == expect
        }
      }
    })
  }

  test("MrParser: expansion length follows quantifiers for any symbol set") {
    import graft.streaming.{MrParser, SeqPattern}
    checkProp(forAll { (ns: List[Int]) =>
      val qs = ns.take(6).map(n => (n % 3).abs + 1)
      qs.isEmpty || {
        val pat = qs.zipWithIndex
          .map { case (q, i) => s"S$i{$q}" }.mkString(" ")
        val p = MrParser.parse(s"PATTERN ($pat) DEFINE S0 AS TRUE")
        SeqPattern.expand(p.steps).length == qs.sum
      }
    })
  }
}
