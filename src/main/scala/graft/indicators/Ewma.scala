package graft.indicators

import graft.Oracle
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import Series._

/** Indicator pack B — the EWMA family (SURVEY.md §2.4: I2, I3, I4, I8, I15,
  * I22, I24, I27, I30). pandas `ewm(..., adjust=False)` recurrences have no
  * closed-form SQL window equivalent; the Spark-native form is a per-symbol
  * O(n) fold ([[Series.mapSeries]]) emitting one row per symbol — exactly
  * the reference's output contract (indicators/base.py:64-75).
  *
  * Every query still carries a DuckDB oracle: the recurrence is replayed
  * with `list_reduce` prefix folds (O(n²), fine at oracle scale) using the
  * identical `α·x + (1−α)·y` op sequence, so values are bit-equal.
  */
object Ewma {
  private type Q = (SparkSession, String) => DataFrame

  // Shared smoothing constants — SQL oracle writes the same expressions.
  private val A12 = 2.0 / 13.0   // EMA12
  private val A26 = 2.0 / 27.0   // EMA26
  private val A9 = 2.0 / 10.0    // EMA9 (DEA)
  private val W14 = 1.0 / 14.0   // Wilder 14
  private val A3 = 1.0 / 3.0     // KDJ

  final case class MacdOut(symbol: String, bucket_ts: Long,
    dif: Option[Double], dea: Option[Double], hist: Option[Double], signal: String)
  private implicit val encMacdOut: Encoder[MacdOut] = Encoders.product[MacdOut]

  /** I4 — MACD (incremental/macd.py:6-50): DIF=EMA12−EMA26, DEA=EMA(DIF,9),
    * hist=2(DIF−DEA), cross/zero-axis signal from the last two bars.
    */
  private val macd: Q = (s, dir) => mapSeries[MacdOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val cl = bars.map(_.close)
      val e12 = ewma(cl, A12); val e26 = ewma(cl, A26)
      val difs = Array.tabulate(n)(i => e12(i) - e26(i))
      val deas = ewma(difs, A9)
      val (dif, dea) = (difs(n - 1), deas(n - 1))
      val (difP, deaP) = (difs(n - 2), deas(n - 2))
      val signal =
        if (dif > dea && difP <= deaP) { if (dif > 0) "golden_cross_above" else "golden_cross" }
        else if (dif < dea && difP >= deaP) { if (dif < 0) "death_cross_below" else "death_cross" }
        else if (dif > dea) "bullish" else if (dif < dea) "bearish" else "flat"
      Some(MacdOut(sym, bars(n - 1).bucket_ts, r6(dif), r6(dea),
        r6(2.0 * (dif - dea)), signal))
    }
  }

  final case class RsiOut(symbol: String, bucket_ts: Long,
    rsi7: Option[Double], rsi14: Option[Double], rsi21: Option[Double])
  private implicit val encRsiOut: Encoder[RsiOut] = Encoders.product[RsiOut]

  private def wilderRsi(cl: Array[Double], k: Int): Double = {
    val n = cl.length
    val gains = new Array[Double](n - 1); val losses = new Array[Double](n - 1)
    var i = 1
    while (i < n) {
      val d = cl(i) - cl(i - 1)
      gains(i - 1) = math.max(d, 0.0); losses(i - 1) = math.max(-d, 0.0)
      i += 1
    }
    val ag = ewmaLast(gains, 1.0 / k); val al = ewmaLast(losses, 1.0 / k)
    if (al == 0.0) { if (ag == 0.0) 50.0 else 100.0 }
    else 100.0 - 100.0 / (1.0 + ag / al)
  }

  /** I22 — Wilder RSI at 7/14/21 on close (batch/tv_rsi.py:14-60). */
  private val rsi: Q = (s, dir) => mapSeries[RsiOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val cl = bars.map(_.close)
      Some(RsiOut(sym, bars(n - 1).bucket_ts,
        r6(wilderRsi(cl, 7)), r6(wilderRsi(cl, 14)), r6(wilderRsi(cl, 21))))
    }
  }

  final case class AtrOut(symbol: String, bucket_ts: Long, atr: Option[Double],
    atr_pct: Option[Double], upper: Option[Double], mid: Option[Double],
    lower: Option[Double], heat: String)
  private implicit val encAtrOut: Encoder[AtrOut] = Encoders.product[AtrOut]

  /** I2 — ATR(14, Wilder) + MA20±2·ATR bands + heat vs 30-bar ATR median
    * (incremental/atr.py:7-49).
    */
  private val atr: Q = (s, dir) => mapSeries[AtrOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val trs = trueRanges(bars)
      val atrs = ewma(trs, W14)
      val a = atrs(n - 1)
      val close = bars(n - 1).close
      val ma20 = mean(bars.slice(n - 20, n).map(_.close))
      val med = median(atrs.slice(n - 30, n))
      val ratio = if (med == 0.0) 1.0 else a / med
      val heat =
        if (ratio > 1.5) "hot" else if (ratio > 1.1) "warm"
        else if (ratio > 0.7) "normal" else "cold"
      Some(AtrOut(sym, bars(n - 1).bucket_ts, r6(a),
        r6(if (close == 0.0) Double.NaN else a / close * 100.0),
        r6(ma20 + 2.0 * a), r6(ma20), r6(ma20 - 2.0 * a), heat))
    }
  }

  final case class KdjOut(symbol: String, bucket_ts: Long, k: Option[Double],
    d: Option[Double], j: Option[Double], signal: String)
  private implicit val encKdjOut: Encoder[KdjOut] = Encoders.product[KdjOut]

  /** I3 — KDJ(9,3,3) (incremental/kdj.py:6-50): RSV on 9-bar extrema, two
    * EWMA(1/3) smooths, cross/extreme signal.
    */
  private val kdj: Q = (s, dir) => mapSeries[KdjOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val rsvs = Array.tabulate(n) { i =>
        val from = math.max(0, i - 8)
        var hh = Double.MinValue; var ll = Double.MaxValue
        var t = from
        while (t <= i) { hh = math.max(hh, bars(t).high); ll = math.min(ll, bars(t).low); t += 1 }
        if (hh == ll) 50.0 else (bars(i).close - ll) / (hh - ll) * 100.0
      }
      val ks = ewma(rsvs, A3)
      val ds = ewma(ks, A3)
      val (k, d) = (ks(n - 1), ds(n - 1))
      val (kP, dP) = (ks(n - 2), ds(n - 2))
      val j = 3.0 * k - 2.0 * d
      val signal =
        if (k > d && kP <= dP) "golden_cross"
        else if (k < d && kP >= dP) "death_cross"
        else if (j > 100.0) "j_overbought" else if (j < 0.0) "j_oversold"
        else "hold"
      Some(KdjOut(sym, bars(n - 1).bucket_ts, r6(k), r6(d), r6(j), signal))
    }
  }

  final case class EmaGcOut(symbol: String, bucket_ts: Long,
    ema7: Option[Double], ema25: Option[Double], ema99: Option[Double],
    trend: String, bandwidth_score: Option[Double])
  private implicit val encEmaGcOut: Encoder[EmaGcOut] = Encoders.product[EmaGcOut]

  /** I8 — EMA 7/25/99 arrangement + bandwidth score
    * (incremental/ema_gc.py:34-59).
    */
  private val emaGc: Q = (s, dir) => mapSeries[EmaGcOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val cl = bars.map(_.close)
      val e7 = ewmaLast(cl, 2.0 / 8.0)
      val e25 = ewmaLast(cl, 2.0 / 26.0)
      val e99 = ewmaLast(cl, 2.0 / 100.0)
      val trend =
        if (e7 > e25 && e25 > e99) "bull_arrangement"
        else if (e7 < e25 && e25 < e99) "bear_arrangement"
        else "mixed"
      val close = cl(n - 1)
      val bw = if (close == 0.0) Double.NaN
        else 100.0 * (1.0 - math.exp(-math.abs(e7 - e99) / close))
      Some(EmaGcOut(sym, bars(n - 1).bucket_ts, r6(e7), r6(e25), r6(e99),
        trend, r6(bw)))
    }
  }

  final case class AdxOut(symbol: String, bucket_ts: Long, adx: Option[Double],
    di_plus: Option[Double], di_minus: Option[Double])
  private implicit val encAdxOut: Encoder[AdxOut] = Encoders.product[AdxOut]

  /** I30 — ADX(14) with ±DI (lean_indicators.py:88-133): ±DM split, Wilder
    * RMA of DM/TR series, DX series, RMA of DX.
    */
  private val adx: Q = (s, dir) => mapSeries[AdxOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val m = n - 1
      val dmp = new Array[Double](m); val dmn = new Array[Double](m)
      val trs = new Array[Double](m)
      var i = 1
      while (i < n) {
        val up = bars(i).high - bars(i - 1).high
        val dn = bars(i - 1).low - bars(i).low
        dmp(i - 1) = if (up > dn && up > 0.0) up else 0.0
        dmn(i - 1) = if (dn > up && dn > 0.0) dn else 0.0
        val pc = bars(i - 1).close
        trs(i - 1) = math.max(bars(i).high - bars(i).low,
          math.max(math.abs(bars(i).high - pc), math.abs(bars(i).low - pc)))
        i += 1
      }
      val sp = ewma(dmp, W14); val sn = ewma(dmn, W14); val st = ewma(trs, W14)
      val dxs = Array.tabulate(m) { t =>
        val dip = if (st(t) == 0.0) 0.0 else 100.0 * sp(t) / st(t)
        val din = if (st(t) == 0.0) 0.0 else 100.0 * sn(t) / st(t)
        if (dip + din == 0.0) 0.0 else 100.0 * math.abs(dip - din) / (dip + din)
      }
      val adxV = ewmaLast(dxs, W14)
      val dip = if (st(m - 1) == 0.0) 0.0 else 100.0 * sp(m - 1) / st(m - 1)
      val din = if (st(m - 1) == 0.0) 0.0 else 100.0 * sn(m - 1) / st(m - 1)
      Some(AdxOut(sym, bars(n - 1).bucket_ts, r6(adxV), r6(dip), r6(din)))
    }
  }

  final case class RibbonOut(symbol: String, bucket_ts: Long,
    bull_count: Int, bull_ratio: Option[Double], signal: String)
  private implicit val encRibbonOut: Encoder[RibbonOut] = Encoders.product[RibbonOut]

  private val ribbonSpans: Seq[Int] = (1 to 18).map(_ * 5)

  /** I27 — Madrid ribbon: 18 EMAs (5..90), bullish ratio + signal ladder
    * (batch/tv_volume_signal.py:9-59).
    */
  private val ribbon: Q = (s, dir) => mapSeries[RibbonOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val cl = bars.map(_.close)
      val close = cl(n - 1)
      val bulls = ribbonSpans.count(k => close > ewmaLast(cl, 2.0 / (k + 1.0)))
      val ratio = bulls / 18.0
      val signal =
        if (ratio >= 0.8) "strong_bull" else if (ratio >= 0.6) "bull"
        else if (ratio > 0.4) "neutral" else if (ratio > 0.2) "bear"
        else "strong_bear"
      Some(RibbonOut(sym, bars(n - 1).bucket_ts, bulls, r6(ratio), signal))
    }
  }

  final case class HarmonicOut(symbol: String, bucket_ts: Long,
    harmonic: Option[Double])
  private implicit val encHarmonicOut: Encoder[HarmonicOut] = Encoders.product[HarmonicOut]

  /** I15 — harmonic: mean of Wilder RSI(k), k=2..33, on typical price
    * (batch/harmonic.py:9-45).
    */
  private val harmonic: Q = (s, dir) => mapSeries[HarmonicOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val tp = bars.map(b => (b.high + b.low + b.close) / 3.0)
      var acc = 0.0
      var k = 2
      while (k <= 33) { acc += wilderRsi(tp, k); k += 1 }
      Some(HarmonicOut(sym, bars(n - 1).bucket_ts, r6(acc / 32.0)))
    }
  }

  final case class FibOut(symbol: String, bucket_ts: Long,
    vwma: Option[Double], sigma: Option[Double], upper: Option[Double],
    lower: Option[Double], zone: String)
  private implicit val encFibOut: Encoder[FibOut] = Encoders.product[FibOut]

  /** I24 — fib sniper: VWMA(30) ± 3σ channel, zone by fib ratios of the
    * normalized deviation (batch/tv_fib_sniper.py:12-101).
    */
  private val fib: Q = (s, dir) => mapSeries[FibOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val last30 = bars.slice(n - 30, n)
      var pv = 0.0; var v = 0.0
      last30.foreach { b => pv += b.close * b.volume; v += b.volume }
      val vwma = if (v == 0.0) Double.NaN else pv / v
      val cm = mean(last30.map(_.close))
      var ss = 0.0
      last30.foreach { b => ss += (b.close - cm) * (b.close - cm) }
      val sigma = math.sqrt(ss / 30.0)
      val close = bars(n - 1).close
      val z = if (sigma == 0.0) 0.0 else (close - vwma) / (3.0 * sigma)
      val az = math.abs(z)
      val band =
        if (az <= 0.236) "inner" else if (az <= 0.5) "mid"
        else if (az <= 0.786) "outer" else "extreme"
      val zone = (if (z >= 0.0) "above_" else "below_") + band
      Some(FibOut(sym, bars(n - 1).bucket_ts, r6(vwma), r6(sigma),
        r6(vwma + 3.0 * sigma), r6(vwma - 3.0 * sigma), zone))
    }
  }

  final case class KeltnerOut(symbol: String, bucket_ts: Long,
    mid: Option[Double], upper: Option[Double], lower: Option[Double],
    position: Option[Double])
  private implicit val encKeltnerOut: Encoder[KeltnerOut] = Encoders.product[KeltnerOut]

  /** I33 — Keltner channel (lean_indicators.py:217-246): EMA20(close) ±
    * 2·ATR(10, Wilder), close position within the band.
    */
  private val keltner: Q = (s, dir) => mapSeries[KeltnerOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < 35) None
    else {
      val mid = ewmaLast(bars.map(_.close), 2.0 / 21.0)
      val a = ewmaLast(trueRanges(bars), 1.0 / 10.0)
      val (up, lo) = (mid + 2.0 * a, mid - 2.0 * a)
      val pos = if (up == lo) Double.NaN else (bars(n - 1).close - lo) / (up - lo)
      Some(KeltnerOut(sym, bars(n - 1).bucket_ts, r6(mid), r6(up), r6(lo), r6(pos)))
    }
  }

  val queries: Map[String, Q] = Map(
    "i04_macd" -> macd,
    "i22_rsi" -> rsi,
    "i02_atr" -> atr,
    "i03_kdj" -> kdj,
    "i08_ema_gc" -> emaGc,
    "i30_adx" -> adx,
    "i27_ema_ribbon" -> ribbon,
    "i15_harmonic" -> harmonic,
    "i24_fib_sniper" -> fib,
    "i33_keltner" -> keltner)

  // ---------------------------------------------------------------- oracle

  /** Per-symbol ordered series CTE appended to the candles CTE. */
  private val SERIES =
    """series AS (
      |  SELECT symbol, max(bucket_ts) AS bucket_ts,
      |         list(high ORDER BY bucket_ts) AS hi,
      |         list(low ORDER BY bucket_ts) AS lo,
      |         list(close ORDER BY bucket_ts) AS cl,
      |         list(volume ORDER BY bucket_ts) AS vol,
      |         count(*) AS n
      |  FROM candles GROUP BY symbol)""".stripMargin

  private def withSeries(sql: String): String =
    Oracle.withCandles(s", $SERIES\n$sql")

  // ONE spelling of the EWMA fold repo-wide (graft.Oracle) — the string
  // IS the bit-exactness contract with Series.ewma, so no pack keeps a
  // private copy that could drift (r10 review finding)
  private def red(l: String, alpha: String): String = Oracle.red(l, alpha)
  private def redSeries(l: String, alpha: String): String =
    Oracle.redSeries(l, alpha)

  private val TRS =
    """list_transform(generate_series(1, n), i ->
      |  CASE WHEN i = 1 THEN hi[1] - lo[1]
      |       ELSE greatest(hi[i] - lo[i], abs(hi[i] - cl[i-1]), abs(lo[i] - cl[i-1])) END)""".stripMargin

  private def gains(l: String) =
    s"list_transform(generate_series(2, len($l)), i -> greatest(($l)[i] - ($l)[i-1], 0.0))"
  private def losses(l: String) =
    s"list_transform(generate_series(2, len($l)), i -> greatest(($l)[i-1] - ($l)[i], 0.0))"

  private def rsiSql(l: String, k: Int): String =
    s"""CASE WHEN ${red(losses(l), s"1.0/$k")} = 0.0
       |     THEN CASE WHEN ${red(gains(l), s"1.0/$k")} = 0.0 THEN 50.0 ELSE 100.0 END
       |     ELSE 100.0 - 100.0 / (1.0 + ${red(gains(l), s"1.0/$k")} / ${red(losses(l), s"1.0/$k")})
       |END""".stripMargin

  private def seqMean(l: String): String =
    s"list_reduce(list_prepend(0.0, $l), (acc, x) -> acc + x) / len($l)"

  val oracle: Map[String, String] = Map(
    "i04_macd" -> withSeries(
      s"""SELECT symbol, bucket_ts, round(dif, 6) AS dif, round(dea, 6) AS dea,
         |  round(2.0 * (dif - dea), 6) AS hist,
         |  CASE WHEN dif > dea AND dif_p <= dea_p THEN
         |         CASE WHEN dif > 0 THEN 'golden_cross_above' ELSE 'golden_cross' END
         |       WHEN dif < dea AND dif_p >= dea_p THEN
         |         CASE WHEN dif < 0 THEN 'death_cross_below' ELSE 'death_cross' END
         |       WHEN dif > dea THEN 'bullish' WHEN dif < dea THEN 'bearish'
         |       ELSE 'flat' END AS signal
         |FROM (
         |  SELECT symbol, bucket_ts,
         |         difs[len(difs)] AS dif, deas[len(deas)] AS dea,
         |         difs[len(difs)-1] AS dif_p, deas[len(deas)-1] AS dea_p
         |  FROM (
         |    SELECT symbol, bucket_ts, difs, ${redSeries("difs", "2.0/10.0")} AS deas
         |    FROM (
         |      SELECT symbol, bucket_ts,
         |             list_transform(generate_series(1, n), i ->
         |               ${red("cl[1:i]", "2.0/13.0")} - ${red("cl[1:i]", "2.0/27.0")}) AS difs
         |      FROM series WHERE n >= 35)))""".stripMargin),
    "i22_rsi" -> withSeries(
      s"""SELECT symbol, bucket_ts,
         |  round(${rsiSql("cl", 7)}, 6) AS rsi7,
         |  round(${rsiSql("cl", 14)}, 6) AS rsi14,
         |  round(${rsiSql("cl", 21)}, 6) AS rsi21
         |FROM series WHERE n >= 35""".stripMargin),
    "i02_atr" -> withSeries(
      s"""SELECT symbol, bucket_ts, round(atr, 6) AS atr,
         |  round(CASE WHEN cl[n] = 0.0 THEN NULL ELSE atr / cl[n] * 100.0 END, 6) AS atr_pct,
         |  round(ma20 + 2.0 * atr, 6) AS upper, round(ma20, 6) AS mid,
         |  round(ma20 - 2.0 * atr, 6) AS lower,
         |  CASE WHEN ratio > 1.5 THEN 'hot' WHEN ratio > 1.1 THEN 'warm'
         |       WHEN ratio > 0.7 THEN 'normal' ELSE 'cold' END AS heat
         |FROM (
         |  SELECT symbol, bucket_ts, n, cl, atr, ma20,
         |         CASE WHEN med = 0.0 THEN 1.0 ELSE atr / med END AS ratio
         |  FROM (
         |    SELECT symbol, bucket_ts, n, cl,
         |           atrs[len(atrs)] AS atr,
         |           ${seqMean("cl[n-19:n]")} AS ma20,
         |           list_aggregate(atrs[len(atrs)-29:len(atrs)], 'median') AS med
         |    FROM (
         |      SELECT symbol, bucket_ts, n, cl, ${redSeries("trs", "1.0/14.0")} AS atrs
         |      FROM (SELECT symbol, bucket_ts, n, cl, $TRS AS trs
         |            FROM series WHERE n >= 35))))""".stripMargin),
    "i03_kdj" -> withSeries(
      s"""SELECT symbol, bucket_ts, round(k, 6) AS k, round(d, 6) AS d,
         |  round(3.0 * k - 2.0 * d, 6) AS j,
         |  CASE WHEN k > d AND k_p <= d_p THEN 'golden_cross'
         |       WHEN k < d AND k_p >= d_p THEN 'death_cross'
         |       WHEN 3.0 * k - 2.0 * d > 100.0 THEN 'j_overbought'
         |       WHEN 3.0 * k - 2.0 * d < 0.0 THEN 'j_oversold'
         |       ELSE 'hold' END AS signal
         |FROM (
         |  SELECT symbol, bucket_ts,
         |         ks[len(ks)] AS k, ds[len(ds)] AS d,
         |         ks[len(ks)-1] AS k_p, ds[len(ds)-1] AS d_p
         |  FROM (
         |    SELECT symbol, bucket_ts, ks, ${redSeries("ks", "1.0/3.0")} AS ds
         |    FROM (
         |      SELECT symbol, bucket_ts, ${redSeries("rsvs", "1.0/3.0")} AS ks
         |      FROM (
         |        SELECT symbol, bucket_ts,
         |               list_transform(generate_series(1, n), i ->
         |                 CASE WHEN list_aggregate(hi[greatest(1, i-8):i], 'max') =
         |                           list_aggregate(lo[greatest(1, i-8):i], 'min') THEN 50.0
         |                      ELSE (cl[i] - list_aggregate(lo[greatest(1, i-8):i], 'min')) /
         |                           (list_aggregate(hi[greatest(1, i-8):i], 'max') -
         |                            list_aggregate(lo[greatest(1, i-8):i], 'min')) * 100.0
         |                 END) AS rsvs
         |        FROM series WHERE n >= 35))))""".stripMargin),
    "i08_ema_gc" -> withSeries(
      s"""SELECT symbol, bucket_ts,
         |  round(e7, 6) AS ema7, round(e25, 6) AS ema25, round(e99, 6) AS ema99,
         |  CASE WHEN e7 > e25 AND e25 > e99 THEN 'bull_arrangement'
         |       WHEN e7 < e25 AND e25 < e99 THEN 'bear_arrangement'
         |       ELSE 'mixed' END AS trend,
         |  round(CASE WHEN cl[n] = 0.0 THEN NULL
         |        ELSE 100.0 * (1.0 - exp(-abs(e7 - e99) / cl[n])) END, 6) AS bandwidth_score
         |FROM (
         |  SELECT symbol, bucket_ts, n, cl,
         |         ${red("cl", "2.0/8.0")} AS e7,
         |         ${red("cl", "2.0/26.0")} AS e25,
         |         ${red("cl", "2.0/100.0")} AS e99
         |  FROM series WHERE n >= 35)""".stripMargin),
    "i30_adx" -> withSeries(
      s"""SELECT symbol, bucket_ts, round(${red("dxs", "1.0/14.0")}, 6) AS adx,
         |  round(CASE WHEN st[len(st)] = 0.0 THEN 0.0
         |        ELSE 100.0 * sp[len(sp)] / st[len(st)] END, 6) AS di_plus,
         |  round(CASE WHEN st[len(st)] = 0.0 THEN 0.0
         |        ELSE 100.0 * sn[len(sn)] / st[len(st)] END, 6) AS di_minus
         |FROM (
         |  SELECT symbol, bucket_ts, sp, sn, st,
         |         list_transform(generate_series(1, len(st)), i ->
         |           CASE WHEN st[i] = 0.0 THEN 0.0
         |                WHEN (100.0 * sp[i] / st[i]) + (100.0 * sn[i] / st[i]) = 0.0 THEN 0.0
         |                ELSE 100.0 * abs((100.0 * sp[i] / st[i]) - (100.0 * sn[i] / st[i])) /
         |                     ((100.0 * sp[i] / st[i]) + (100.0 * sn[i] / st[i])) END) AS dxs
         |  FROM (
         |    SELECT symbol, bucket_ts,
         |           ${redSeries("dmp", "1.0/14.0")} AS sp,
         |           ${redSeries("dmn", "1.0/14.0")} AS sn,
         |           ${redSeries("trs2", "1.0/14.0")} AS st
         |    FROM (
         |      SELECT symbol, bucket_ts,
         |             list_transform(generate_series(2, n), i ->
         |               CASE WHEN hi[i] - hi[i-1] > lo[i-1] - lo[i] AND hi[i] - hi[i-1] > 0.0
         |                    THEN hi[i] - hi[i-1] ELSE 0.0 END) AS dmp,
         |             list_transform(generate_series(2, n), i ->
         |               CASE WHEN lo[i-1] - lo[i] > hi[i] - hi[i-1] AND lo[i-1] - lo[i] > 0.0
         |                    THEN lo[i-1] - lo[i] ELSE 0.0 END) AS dmn,
         |             list_transform(generate_series(2, n), i ->
         |               greatest(hi[i] - lo[i], abs(hi[i] - cl[i-1]), abs(lo[i] - cl[i-1]))) AS trs2
         |      FROM series WHERE n >= 35)))""".stripMargin),
    "i27_ema_ribbon" -> withSeries({
      val terms = ribbonSpans
        .map(k => s"CASE WHEN cl[n] > ${red("cl", s"2.0/${k + 1}.0")} THEN 1 ELSE 0 END")
        .mkString(" +\n         ")
      s"""SELECT symbol, bucket_ts, bull_count,
         |  round(bull_count / 18.0, 6) AS bull_ratio,
         |  CASE WHEN bull_count / 18.0 >= 0.8 THEN 'strong_bull'
         |       WHEN bull_count / 18.0 >= 0.6 THEN 'bull'
         |       WHEN bull_count / 18.0 > 0.4 THEN 'neutral'
         |       WHEN bull_count / 18.0 > 0.2 THEN 'bear'
         |       ELSE 'strong_bear' END AS signal
         |FROM (
         |  SELECT symbol, bucket_ts, CAST($terms AS INT) AS bull_count
         |  FROM series WHERE n >= 35)""".stripMargin
    }),
    "i15_harmonic" -> withSeries({
      val terms = (2 to 33).map(k => rsiSql("tp", k)).mkString("(", " +\n", ") / 32.0")
      s"""SELECT symbol, bucket_ts, round($terms, 6) AS harmonic
         |FROM (
         |  SELECT symbol, bucket_ts,
         |         list_transform(generate_series(1, n), i ->
         |           (hi[i] + lo[i] + cl[i]) / 3.0) AS tp
         |  FROM series WHERE n >= 35)""".stripMargin
    }),
    "i24_fib_sniper" -> withSeries(
      s"""SELECT symbol, bucket_ts, round(vwma, 6) AS vwma, round(sigma, 6) AS sigma,
         |  round(vwma + 3.0 * sigma, 6) AS upper,
         |  round(vwma - 3.0 * sigma, 6) AS lower,
         |  (CASE WHEN z >= 0.0 THEN 'above_' ELSE 'below_' END) ||
         |  (CASE WHEN abs(z) <= 0.236 THEN 'inner' WHEN abs(z) <= 0.5 THEN 'mid'
         |        WHEN abs(z) <= 0.786 THEN 'outer' ELSE 'extreme' END) AS zone
         |FROM (
         |  SELECT symbol, bucket_ts, vwma, sigma,
         |         CASE WHEN sigma = 0.0 THEN 0.0 ELSE (cl[n] - vwma) / (3.0 * sigma) END AS z
         |  FROM (
         |    SELECT symbol, bucket_ts, n, cl, vwma,
         |           sqrt(list_reduce(list_prepend(0.0,
         |             list_transform(cl[n-29:n], x -> (x - cm) * (x - cm))),
         |             (acc, x) -> acc + x) / 30.0) AS sigma
         |    FROM (
         |      SELECT symbol, bucket_ts, n, cl,
         |             CASE WHEN list_reduce(list_prepend(0.0, vol[n-29:n]), (acc, x) -> acc + x) = 0.0
         |                  THEN NULL
         |                  ELSE list_reduce(list_prepend(0.0,
         |                         list_transform(generate_series(n-29, n), i -> cl[i] * vol[i])),
         |                         (acc, x) -> acc + x) /
         |                       list_reduce(list_prepend(0.0, vol[n-29:n]), (acc, x) -> acc + x)
         |             END AS vwma,
         |             ${seqMean("cl[n-29:n]")} AS cm
         |      FROM series WHERE n >= 35)))""".stripMargin),
    "i33_keltner" -> withSeries(
      s"""SELECT symbol, bucket_ts, round(mid, 6) AS mid,
         |  round(mid + 2.0 * a, 6) AS upper, round(mid - 2.0 * a, 6) AS lower,
         |  round(CASE WHEN a = 0.0 THEN NULL
         |        ELSE (cl_last - (mid - 2.0 * a)) / (4.0 * a) END, 6) AS position
         |FROM (
         |  SELECT symbol, bucket_ts, cl[n] AS cl_last,
         |         ${red("cl", "2.0/21.0")} AS mid,
         |         ${red("trs", "1.0/10.0")} AS a
         |  FROM (SELECT symbol, bucket_ts, n, cl, $TRS AS trs
         |        FROM series WHERE n >= 35))""".stripMargin))
}
