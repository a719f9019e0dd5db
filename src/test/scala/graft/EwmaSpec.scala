package graft

import graft.indicators.Series
import org.scalatest.funsuite.AnyFunSuite

class EwmaSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)
  private def randSeries(n: Int): Array[Double] =
    Array.fill(n)(rng.nextDouble() * 2e6 - 1e6)
  private val cases: Seq[(Array[Double], Double)] =
    for (n <- Seq(1, 2, 7, 63, 250); a <- Seq(0.001, 1.0 / 14.0, 1.0 / 3.0, 0.9, 1.0))
      yield (randSeries(n), a)

  test("ewma matches closed form y_n = (1-a)^n x_0 + a * sum (1-a)^(n-i) x_i") {
    for ((xs, a) <- cases) {
      val got = Series.ewma(xs, a).last
      val n = xs.length - 1
      val closed = math.pow(1 - a, n) * xs(0) +
        (1 to n).map(i => a * math.pow(1 - a, n - i) * xs(i)).sum
      val tol = 1e-8 * math.max(1.0, math.abs(closed))
      assert(math.abs(got - closed) <= tol, s"got=$got closed=$closed a=$a n=$n")
    }
  }

  test("ewma is bounded by the series extrema") {
    for ((xs, a) <- cases) {
      val y = Series.ewma(xs, a)
      assert(y.last >= xs.min - 1e-9 && y.last <= xs.max + 1e-9)
    }
  }

  test("ewma with alpha=1 is the series itself") {
    val xs = randSeries(100)
    assert(Series.ewma(xs, 1.0).sameElements(xs))
  }

  test("ewmaLast equals ewma().last") {
    for ((xs, a) <- cases)
      assert(Series.ewmaLast(xs, a) == Series.ewma(xs, a).last)
  }

  test("trueRanges: first bar is h-l, gap bars use prev close, all nonnegative") {
    val bars = Array(
      Series.Bar("S", 0L, 10, 12, 9, 11, 1, 1, 1),
      Series.Bar("S", 60L, 11, 15, 10, 14, 1, 1, 1),
      Series.Bar("S", 120L, 14, 14.5, 8, 9, 1, 1, 1),
      Series.Bar("S", 180L, 9, 9.5, 9.2, 9.4, 1, 1, 1)) // inside bar, gap to pc=9
    val tr = Series.trueRanges(bars)
    assert(tr(0) == 3.0)               // h-l
    assert(tr(1) == 5.0)               // max(5, |15-11|, |10-11|)
    assert(tr(2) == 6.5)               // max(6.5, |14.5-14|, |8-14|)
    assert(math.abs(tr(3) - 0.5) < 1e-12) // max(0.3, |9.5-9|, |9.2-9|)
    assert(tr.forall(_ >= 0))
  }

  test("median interpolates even-length arrays, picks middle for odd") {
    assert(Series.median(Array(1.0, 3.0)) == 2.0)
    assert(Series.median(Array(5.0, 1.0, 3.0)) == 3.0)
    assert(Series.median(Array(4.0, 1.0, 2.0, 3.0)) == 2.5)
  }

  test("r6 drops non-finite values and rounds HALF_UP") {
    assert(Series.r6(Double.NaN).isEmpty)
    assert(Series.r6(Double.PositiveInfinity).isEmpty)
    assert(Series.r6(1.2345675).contains(1.234568))
    assert(Series.r6(-1.2345675).contains(-1.234568))
  }
}
