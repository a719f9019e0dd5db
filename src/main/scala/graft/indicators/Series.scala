package graft.indicators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Per-symbol ordered series access for the EWMA / stateful indicator
  * families (SURVEY.md §2.3: pandas `ewm(..., adjust=False)` and the
  * path-dependent latches have no closed-form SQL window equivalent — the
  * idiomatic Spark form is a per-group sorted fold).
  *
  * Scale contract: `groupByKey(symbol).mapGroups` shuffles once on the
  * symbol key — the same partitioning every other per-symbol operator uses —
  * and folds each group in one pass. Group state is bounded: the reference
  * caps per-series history at 500 bars (db/cache.py:33); [[Bars.cap]]
  * enforces a generous superset so a hot symbol cannot OOM an executor at
  * 100 TB. No driver-side collection anywhere.
  */
object Series {
  /** One candle bar; arrays-of-bars are the indicator input. */
  final case class Bar(symbol: String, bucket_ts: Long, open: Double,
    high: Double, low: Double, close: Double, volume: Double,
    quote_volume: Double, taker_buy_volume: Double)

  object Bars {
    /** Max bars retained per series (reference working cap is 500). */
    val cap = 100000
  }

  /** Run `fn` over each symbol's time-ascending bar array, producing one
    * typed output row per symbol (the reference's output contract: one row
    * per (symbol, interval), indicators/base.py:64-75).
    */
  def mapSeries[T: org.apache.spark.sql.Encoder](spark: SparkSession,
    dir: String)(fn: (String, Array[Bar]) => Option[T]): DataFrame =
    mapSeriesCapped(spark, dir, Bars.cap)(fn)

  /** [[mapSeries]] with an explicit cap — exposed so tests can exercise the
    * bounded-state path with a small cap and an over-cap group.
    */
  private[graft] def mapSeriesCapped[T: org.apache.spark.sql.Encoder](
    spark: SparkSession, dir: String, cap: Int)(
    fn: (String, Array[Bar]) => Option[T]): DataFrame = {
    import spark.implicits._
    Tables.candles(spark, dir)
      .select(col("symbol"), col("bucket_ts"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("quote_volume"),
        col("taker_buy_volume"))
      .as[Bar]
      .groupByKey(_.symbol)
      .flatMapGroups { (sym, it) =>
        fn(sym, latestBars(it, cap)).iterator
      }
      .toDF()
  }

  /** Fold an UNORDERED bar iterator into the time-ascending array of its
    * `cap` most-recent bars, never holding more than `cap` bars: a bounded
    * min-heap on bucket_ts replaces round-2's `it.toArray.takeRight(cap)`,
    * which materialized the whole group before capping — the "bounded group
    * state" claim is now enforced at O(cap) memory, O(n·log cap) time, so a
    * symbol with years of over-cap history cannot OOM an executor.
    */
  private[graft] def latestBars(it: Iterator[Bar], cap: Int): Array[Bar] = {
    val byTs = Ordering.by((b: Bar) => b.bucket_ts)
    // Fast path: plain append while the group is under cap — the
    // overwhelmingly common case, where per-bar heap maintenance paid
    // comparator + sift cost on EVERY bar for nothing (the round-3 ~2×
    // mapSeries regression). The bounded min-heap only takes over at the
    // moment a group actually crosses cap, preserving the O(cap) memory
    // bound that keeps a years-deep symbol from OOMing an executor.
    val buf = new scala.collection.mutable.ArrayBuffer[Bar](1024)
    var heap: java.util.PriorityQueue[Bar] = null
    while (it.hasNext) {
      val b = it.next()
      if (heap != null) {
        if (b.bucket_ts > heap.peek().bucket_ts) { heap.poll(); heap.add(b); () }
      } else if (buf.length < cap) buf += b
      else {
        heap = new java.util.PriorityQueue[Bar](cap + 1, byTs)
        buf.foreach(heap.add)
        buf.clear()
        if (b.bucket_ts > heap.peek().bucket_ts) { heap.poll(); heap.add(b); () }
      }
    }
    val bars = if (heap != null) heap.toArray(new Array[Bar](heap.size))
      else buf.toArray
    java.util.Arrays.sort(bars, byTs)
    bars
  }

  /** Exact pandas `ewm(alpha, adjust=False).mean()`: y₀=x₀,
    * yᵢ=α·xᵢ+(1−α)·yᵢ₋₁. The fold writes `alpha * x + beta * y` so the
    * DuckDB oracle (`list_reduce(xs, (a,x) -> α*x + (1.0-α)*a)`) performs
    * the identical IEEE sequence — results are bit-equal, not just close.
    */
  def ewma(xs: Array[Double], alpha: Double): Array[Double] = {
    val beta = 1.0 - alpha
    val out = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) {
      out(i) = if (i == 0) xs(0) else alpha * xs(i) + beta * out(i - 1)
      i += 1
    }
    out
  }

  def ewmaLast(xs: Array[Double], alpha: Double): Double = {
    val beta = 1.0 - alpha
    var y = 0.0
    var i = 0
    while (i < xs.length) {
      y = if (i == 0) xs(0) else alpha * xs(i) + beta * y
      i += 1
    }
    y
  }

  /** True-range series: first bar h−l, then max(h−l, |h−pc|, |l−pc|). */
  def trueRanges(bars: Array[Bar]): Array[Double] = {
    val out = new Array[Double](bars.length)
    var i = 0
    while (i < bars.length) {
      val b = bars(i)
      out(i) =
        if (i == 0) b.high - b.low
        else {
          val pc = bars(i - 1).close
          math.max(b.high - b.low, math.max(math.abs(b.high - pc), math.abs(b.low - pc)))
        }
      i += 1
    }
    out
  }

  /** DuckDB-`round(x, 6)`-equivalent rounding; non-finite → None → SQL NULL.
    *
    * DuckDB rounds the SCALED double half-away-from-zero
    * (`round(x·10⁶)/10⁶`), which differs from decimal-exact HALF_UP exactly
    * on terminating-decimal boundaries (e.g. 2.675 → 2.68 because
    * 2.675·100 == 267.5 in binary). Mirroring the scaled-double sequence
    * keeps boundary values (VPVR bucket centers, price mids) hash-equal.
    */
  def r6(x: Double): Option[Double] =
    if (x.isNaN || x.isInfinite) None else Some(rp(x, 1e6))

  private[indicators] def rp(x: Double, pow: Double): Double = {
    val t = x * pow
    (if (t >= 0.0) math.floor(t + 0.5) else math.ceil(t - 0.5)) / pow
  }

  def r6v(x: Double): Double = r6(x).getOrElse(Double.NaN)

  /** Sequential mean (bit-parity with `list_reduce(list_prepend(0.0, l), +)/n`). */
  def mean(xs: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < xs.length) { s += xs(i); i += 1 }
    s / xs.length
  }

  /** Exact interpolated median over a copy (DuckDB `median` on doubles). */
  def median(xs: Array[Double]): Double = {
    val a = xs.clone(); java.util.Arrays.sort(a)
    val n = a.length
    if (n % 2 == 1) a(n / 2) else (a(n / 2 - 1) + a(n / 2)) / 2.0
  }
}
