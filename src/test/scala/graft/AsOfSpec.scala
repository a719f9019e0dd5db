package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the generic as-of / range join operators on hand-built
  * frames (the oracle gate covers the registered queries; this pins the
  * operator edge cases: no-prior-row nulls, equal-timestamp inclusivity,
  * carry-forward across gaps, bucket-boundary exactness).
  */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("joinAsOf: inclusive match, carry-forward, and null before first right row") {
    val s = spark
    import s.implicits._
    val left = Seq(("A", 5L), ("A", 10L), ("A", 20L), ("A", 25L), ("B", 10L))
      .toDF("k", "t")
    val right = Seq(("A", 8L, 100.0), ("A", 20L, 200.0))
      .toDF("k", "rt", "v")
    val got = operators.AsOf
      .joinAsOf(left, right, Seq("k"), "t", "rt", Seq("v", "rt"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(got == Set(
      ("A", 5L, None, None),            // before any right row
      ("A", 10L, Some(100.0), Some(8L)),
      ("A", 20L, Some(200.0), Some(20L)), // equal ts: right visible (<=)
      ("A", 25L, Some(200.0), Some(20L)), // carry-forward
      ("B", 10L, None, None)))            // key with no right rows at all
  }

  test("joinAsOfInterp: exact-on-grid, midpoint interpolation, flat hold, pre-first null") {
    val s = spark
    import s.implicits._
    val left = Seq(("A", 5L), ("A", 10L), ("A", 15L), ("A", 30L))
      .toDF("k", "t")
    val right = Seq(("A", 10L, 100.0), ("A", 20L, 300.0))
      .toDF("k", "rt", "v")
    val got = operators.AsOf
      .joinAsOfInterp(left, right, Seq("k"), "t", "rt", "v")
      .collect().map(r => (r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got(5L).isEmpty, "before first right row must be NULL")
    assert(got(10L).contains(100.0), "metric on the bar time is exact (weight 0)")
    assert(got(15L).contains(200.0), "midpoint interpolates linearly")
    assert(got(30L).contains(300.0), "past last right row holds flat")
  }

  test("pointsInRange: half-open (lo, hi] boundaries are exact across buckets") {
    val s = spark
    import s.implicits._
    val intervals = Seq(("A", 0L, 10L, 20L)).toDF("k", "id", "lo", "hi")
    val points = Seq(("A", 10L), ("A", 11L), ("A", 20L), ("A", 21L), ("B", 15L))
      .toDF("k", "p")
    val got = operators.RangeJoin
      .pointsInRange(intervals, points, Seq("k"), "lo", "hi", "p", 7L)
      .select("p").collect().map(_.getLong(0)).toSet
    // lo exclusive, hi inclusive; bucket width 7 deliberately unaligned
    assert(got == Set(11L, 20L))
  }
}
