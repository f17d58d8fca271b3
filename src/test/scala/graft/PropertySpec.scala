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
    checkProp(forAll { (xs: List[Double], ys: List[Double]) =>
      MaxMin.merge(acc(xs), acc(ys)) == MaxMin.merge(acc(ys), acc(xs))
    })
    checkProp(forAll { (xs: List[Double], ys: List[Double], zs: List[Double]) =>
      MaxMin.merge(MaxMin.merge(acc(xs), acc(ys)), acc(zs)) ==
        MaxMin.merge(acc(xs), MaxMin.merge(acc(ys), acc(zs)))
    })
    checkProp(forAll { (xs: List[Double]) =>
      xs.isEmpty || {
        val a = acc(xs)
        a.mx == xs.max && a.mn == xs.min && a.n == xs.length
      }
    })
  }

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
}
