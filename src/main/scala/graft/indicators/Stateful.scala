package graft.indicators

import graft.Oracle
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import Series._

/** Indicator pack B — the path-dependent family (SURVEY.md §2.4: I16, I17,
  * I25, I26, I28, I29). These recurrences (band ratchets, trend latches,
  * Heikin-Ashi open recursion, SMA-seeded SMMA) are not window-expressible;
  * the Spark-native form is the same per-symbol O(n) fold as the EWMA pack
  * ([[Series.mapSeries]] — one shuffle on the symbol key, bounded group
  * state).
  *
  * Reference lookbacks (ZLEMA 70 / highest 210 / SMMA 200) exceed the
  * driver-testdata series length (~50–90 bars per symbol), so the periods
  * here are scaled down (LEN=20, WIN=60, SMMA=20) with the recurrence
  * structure kept exactly; at production scale they are plain parameters.
  *
  * Every query carries a DuckDB oracle. Latches/ratchets are replayed with
  * `list_reduce` over struct elements (state carried through the fold, the
  * accumulator type equals the element type), so the oracle performs the
  * identical IEEE op sequence.
  */
object Stateful {
  private type Q = (SparkSession, String) => DataFrame

  private val MIN = 35 // same sufficiency guard as the EWMA pack

  // ------------------------------------------------------------- I29
  final case class SupertrendOut(symbol: String, bucket_ts: Long,
    supertrend: Option[Double], direction: String,
    final_upper: Option[Double], final_lower: Option[Double])
  private implicit val encSupertrend: Encoder[SupertrendOut] =
    Encoders.product[SupertrendOut]

  /** I29 — classic SuperTrend(10, 3.0) with band ratchet + direction
    * (batch/lean_indicators.py:29-86): Wilder ATR(10), basic bands
    * hl2 ± 3·ATR, final bands ratchet against prev close, direction flips
    * when close escapes the active band.
    */
  private val supertrend: Q = (s, dir) => mapSeries[SupertrendOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val atr = ewma(trueRanges(bars), 1.0 / 10.0)
      var fu = (bars(0).high + bars(0).low) / 2.0 + 3.0 * atr(0)
      var fl = (bars(0).high + bars(0).low) / 2.0 - 3.0 * atr(0)
      var st = 0.0
      var d = 1
      var i = 1
      while (i < n) {
        val hl2 = (bars(i).high + bars(i).low) / 2.0
        val bu = hl2 + 3.0 * atr(i)
        val bl = hl2 - 3.0 * atr(i)
        val pc = bars(i - 1).close
        val pfu = fu; val pfl = fl; val pst = st
        fu = if (pc > pfu) bu else math.min(bu, pfu)
        fl = if (pc < pfl) bl else math.max(bl, pfl)
        d = if (pst == pfu) { if (bars(i).close > fu) -1 else 1 }
            else { if (bars(i).close < fl) 1 else -1 }
        st = if (d == 1) fu else fl
        i += 1
      }
      Some(SupertrendOut(sym, bars(n - 1).bucket_ts, r6(st),
        if (d == 1) "short" else "long", r6(fu), r6(fl)))
    }
  }

  // ------------------------------------------------------------- I17 / I28
  private val LEN = 20            // scaled from the reference's 70
  private val LAG = (LEN - 1) / 2 // floor((len-1)/2), batch/super_trend.py:14
  private val WIN = 60            // scaled from len*3 = 210
  private val MULT = 1.2

  /** ZLEMA basis + volatility band shared by I17/I28
    * (batch/super_trend.py:17-44, batch/tv_zero_lag.py:11-31):
    * basis = EWMA(2c_i − c_{i−lag}, span=len) defined from bar `lag`;
    * band = trailing-max(WilderATR(len), win) · mult (min_periods=1 form).
    * Returns (basis, band) arrays aligned to bars; basis is NaN before lag.
    */
  private def zeroLagBands(bars: Array[Bar]): (Array[Double], Array[Double]) = {
    val n = bars.length
    val alpha = 2.0 / (LEN + 1.0)
    val basis = Array.fill(n)(Double.NaN)
    var y = 0.0
    var i = LAG
    while (i < n) {
      val src = 2.0 * bars(i).close - bars(i - LAG).close
      y = if (i == LAG) src else alpha * src + (1.0 - alpha) * y
      basis(i) = y
      i += 1
    }
    val atr = ewma(trueRanges(bars), 1.0 / LEN)
    val band = Array.tabulate(n) { i =>
      var m = Double.MinValue
      var t = math.max(0, i - WIN + 1)
      while (t <= i) { m = math.max(m, atr(t)); t += 1 }
      m * MULT
    }
    (basis, band)
  }

  final case class ZlTrendOut(symbol: String, bucket_ts: Long, signal: String,
    direction: String, zlema: Option[Double], band: Option[Double],
    upper: Option[Double], lower: Option[Double], trend: Int,
    trend_duration: Int, volume_bias: Option[Double])
  private implicit val encZlTrend: Encoder[ZlTrendOut] = Encoders.product[ZlTrendOut]

  /** I17 — zero-lag SuperTrend with cross-latched trend, duration since the
    * last flip, and a 20-bar up/down volume bias
    * (batch/super_trend.py:46-107): trend flips to +1 only on an upward
    * cross of basis+band (prev ≤ upper, curr > upper), to −1 on a downward
    * cross of basis−band, else carries.
    */
  private val superTrendZl: Q = (s, dir) => mapSeries[ZlTrendOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val (basis, band) = zeroLagBands(bars)
      var trend = 0
      var flipIdx = -1
      var i = 1
      while (i < n) {
        if (!basis(i).isNaN) {
          val up = basis(i) + band(i)
          val lo = basis(i) - band(i)
          val prevTrend = trend
          if (bars(i - 1).close <= up && bars(i).close > up) trend = 1
          else if (bars(i - 1).close >= lo && bars(i).close < lo) trend = -1
          if (trend != prevTrend) flipIdx = i
        }
        i += 1
      }
      val dur = if (flipIdx < 0) n else n - flipIdx
      var upV = 0.0; var dnV = 0.0
      var t = math.max(0, n - 20)
      while (t < n) {
        if (bars(t).close > bars(t).open) upV += bars(t).volume
        else if (bars(t).close < bars(t).open) dnV += bars(t).volume
        t += 1
      }
      val avg = (upV + dnV) / 2.0
      val bias = if (avg == 0.0) Double.NaN else (upV - dnV) / avg
      val b = basis(n - 1); val v = band(n - 1)
      Some(ZlTrendOut(sym, bars(n - 1).bucket_ts,
        if (trend > 0) "long" else if (trend < 0) "short" else "hold",
        if (trend > 0) "bull" else if (trend < 0) "bear" else "range",
        r6(b), r6(v), r6(b + v), r6(b - v), trend, dur, r6(bias)))
    }
  }

  final case class ZeroLagOut(symbol: String, bucket_ts: Long, signal: String,
    direction: String, zlema: Option[Double], band: Option[Double],
    deviation_pct: Option[Double], trend: Int)
  private implicit val encZeroLag: Encoder[ZeroLagOut] = Encoders.product[ZeroLagOut]

  /** I28 — zero-lag trend with threshold latch (batch/tv_zero_lag.py:34-91):
    * trend ← +1 when close > basis+band, −1 when close < basis−band, else
    * carries; buy/sell signal on the latch flipping at the last bar.
    */
  private val zeroLag: Q = (s, dir) => mapSeries[ZeroLagOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val (basis, band) = zeroLagBands(bars)
      var trend = 0
      var prevTrend = 0
      var i = 0
      while (i < n) {
        if (i == n - 1) prevTrend = trend
        if (!basis(i).isNaN) {
          val c = bars(i).close
          if (c > basis(i) + band(i)) trend = 1
          else if (c < basis(i) - band(i)) trend = -1
        }
        i += 1
      }
      val signal =
        if (trend > 0 && prevTrend <= 0) "buy"
        else if (trend < 0 && prevTrend >= 0) "sell"
        else "hold"
      val b = basis(n - 1); val v = band(n - 1)
      val dev = if (v == 0.0) Double.NaN else math.abs(bars(n - 1).close - b) / v * 100.0
      Some(ZeroLagOut(sym, bars(n - 1).bucket_ts, signal,
        if (trend > 0) "bull" else if (trend < 0) "bear" else "range",
        r6(b), r6(v), r6(dev), trend))
    }
  }

  // ------------------------------------------------------------- I25
  final case class HaOut(symbol: String, bucket_ts: Long, signal: String,
    direction: String, color: String, strength: Option[Double],
    body: Option[Double], wick: Option[Double],
    ha_open: Option[Double], ha_close: Option[Double])
  private implicit val encHa: Encoder[HaOut] = Encoders.product[HaOut]

  /** I25 — double-smoothed Heikin-Ashi (batch/tv_long_short.py:10-87):
    * EMA10 pre-smooth of o/h/l/c, HA transform with the `ha_open` recursion
    * o_i = (o_{i−1}+hc_{i−1})/2 seeded at (o₀+c₀)/2, EMA10 post-smooth,
    * color-flip signal and body/slope strength.
    */
  private val haLongShort: Q = (s, dir) => mapSeries[HaOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val a10 = 2.0 / 11.0
      val os = ewma(bars.map(_.open), a10)
      val hs = ewma(bars.map(_.high), a10)
      val ls = ewma(bars.map(_.low), a10)
      val cs = ewma(bars.map(_.close), a10)
      val haC = Array.tabulate(n)(i => (os(i) + hs(i) + ls(i) + cs(i)) / 4.0)
      val haO = new Array[Double](n)
      haO(0) = (os(0) + cs(0)) / 2.0
      var i = 1
      while (i < n) { haO(i) = (haO(i - 1) + haC(i - 1)) / 2.0; i += 1 }
      val haH = Array.tabulate(n)(i => math.max(hs(i), math.max(haO(i), haC(i))))
      val haL = Array.tabulate(n)(i => math.min(ls(i), math.min(haO(i), haC(i))))
      val o2 = ewma(haO, a10); val h2 = ewma(haH, a10)
      val l2 = ewma(haL, a10); val c2 = ewma(haC, a10)
      val greenNow = o2(n - 1) <= c2(n - 1)
      val greenPrev = o2(n - 2) <= c2(n - 2)
      val bodyNow = math.abs(o2(n - 1) - c2(n - 1))
      val bodyPrev = math.abs(o2(n - 2) - c2(n - 2))
      val slope = if (n > 5) c2(n - 1) - c2(n - 5) else c2(n - 1) - c2(n - 2)
      val slopeStrength = math.max(0.0, math.min(1.0, (slope + 200.0) / 400.0))
      val raw = if (bodyPrev > 0.0) bodyNow / bodyPrev * 100.0 else 0.0
      val strength = math.min(raw + slopeStrength * 40.0, 200.0)
      val (signal, direction) =
        if (greenNow && !greenPrev) ("buy", "bull")
        else if (!greenNow && greenPrev) ("sell", "bear")
        else ("hold", if (greenNow) "bull" else "bear")
      Some(HaOut(sym, bars(n - 1).bucket_ts, signal, direction,
        if (greenNow) "green" else "red", r6(strength), r6(bodyNow),
        r6(h2(n - 1) - l2(n - 1)), r6(o2(n - 1)), r6(c2(n - 1))))
    }
  }

  // ------------------------------------------------------------- I26
  private val SMMA_N = 20 // scaled from the reference's 200

  final case class CloudOut(symbol: String, bucket_ts: Long, signal: String,
    direction: String, pattern: String, strength: Option[Double],
    smma: Option[Double], ema2: Option[Double])
  private implicit val encCloud: Encoder[CloudOut] = Encoders.product[CloudOut]

  /** I26 — trend cloud (batch/tv_trend_cloud.py:7-92): SMA-seeded SMMA(n)
    * vs EMA2 trend, 3-line-strike and engulfing reversal patterns, drift
    * strength capped at 5 when no pattern fires.
    */
  private val trendCloud: Q = (s, dir) => mapSeries[CloudOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val cl = bars.map(_.close)
      var smma = 0.0
      var i = 0
      while (i < SMMA_N) { smma += cl(i); i += 1 }
      smma /= SMMA_N
      while (i < n) { smma = (smma * (SMMA_N - 1) + cl(i)) / SMMA_N; i += 1 }
      val ema2 = ewmaLast(cl, 2.0 / 3.0)
      def o(k: Int) = bars(n - k).open
      def c(k: Int) = bars(n - k).close
      val strike3 =
        if (c(4) < o(4) && c(3) < o(3) && c(2) < o(2) && c(1) > o(2)) "BUY"
        else if (c(4) > o(4) && c(3) > o(3) && c(2) > o(2) && c(1) < o(2)) "SELL"
        else "HOLD"
      val engulf =
        if (o(1) <= c(2) && o(1) < o(2) && c(1) > o(2)) "BUY"
        else if (o(1) >= c(2) && o(1) > o(2) && c(1) < o(2)) "SELL"
        else "HOLD"
      val trendUp = ema2 > smma
      val trendDown = ema2 < smma
      val body = math.abs(c(1) - o(1))
      var avgBody = 0.0
      var t = math.max(0, n - 15)
      while (t < n) { avgBody += math.abs(bars(t).close - bars(t).open); t += 1 }
      avgBody /= math.min(15, n)
      val (signal, direction, strength) =
        if ((strike3 == "BUY" || engulf == "BUY") && trendUp)
          ("buy", "bull", if (avgBody == 0.0) 0.0 else body / avgBody * 100.0)
        else if ((strike3 == "SELL" || engulf == "SELL") && trendDown)
          ("sell", "bear", if (avgBody == 0.0) 0.0 else body / avgBody * 100.0)
        else if (trendUp)
          ("hold", "bull", math.min((cl(n - 1) - smma) / smma * 100.0, 5.0))
        else if (trendDown)
          ("hold", "bear", math.min((smma - cl(n - 1)) / smma * 100.0, 5.0))
        else ("hold", "range", 0.0)
      val pattern =
        if (strike3 != "HOLD") "three_line_strike"
        else if (engulf != "HOLD") "engulfing" else "none"
      Some(CloudOut(sym, bars(n - 1).bucket_ts, signal, direction, pattern,
        r6(strength), r6(smma), r6(ema2)))
    }
  }

  // ------------------------------------------------------------- I16
  final case class ScalpOut(symbol: String, bucket_ts: Long, signal: String,
    rsi: Option[Double], ema9: Option[Double], ema21: Option[Double],
    price: Option[Double])
  private implicit val encScalp: Encoder[ScalpOut] = Encoders.product[ScalpOut]

  /** I16 — scalping regime (batch/scalping.py:8-44): Wilder RSI(14) +
    * EMA9/EMA21 rule ladder.
    */
  private val scalping: Q = (s, dir) => mapSeries[ScalpOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val cl = bars.map(_.close)
      val rsi = {
        // scalping RSI leaves rs undefined (NaN) when avg loss is 0 — the
        // reference's `loss.replace(0, nan)` — unlike the shared wilderRsi.
        val gains = new Array[Double](n - 1); val losses = new Array[Double](n - 1)
        var i = 1
        while (i < n) {
          val d = cl(i) - cl(i - 1)
          gains(i - 1) = math.max(d, 0.0); losses(i - 1) = math.max(-d, 0.0)
          i += 1
        }
        val ag = ewmaLast(gains, 1.0 / 14.0); val al = ewmaLast(losses, 1.0 / 14.0)
        if (al == 0.0) Double.NaN else 100.0 - 100.0 / (1.0 + ag / al)
      }
      val e9 = ewmaLast(cl, 2.0 / 10.0)
      val e21 = ewmaLast(cl, 2.0 / 22.0)
      val p = cl(n - 1)
      val signal =
        if (rsi < 30.0 && p > e9 && e9 > e21) "oversold_bounce"
        else if (rsi > 70.0 && p < e9 && e9 < e21) "overbought_pullback"
        else if (e9 > e21 && rsi > 50.0) "long"
        else if (e9 < e21 && rsi < 50.0) "short"
        else "hold"
      Some(ScalpOut(sym, bars(n - 1).bucket_ts, signal, r6(rsi), r6(e9),
        r6(e21), r6(p)))
    }
  }

  val queries: Map[String, Q] = Map(
    "i29_supertrend" -> supertrend,
    "i17_super_trend_zl" -> superTrendZl,
    "i28_zero_lag" -> zeroLag,
    "i25_ha_long_short" -> haLongShort,
    "i26_trend_cloud" -> trendCloud,
    "i16_scalping" -> scalping)

  // ---------------------------------------------------------------- oracle

  private val SERIES =
    """series AS (
      |  SELECT symbol, max(bucket_ts) AS bucket_ts,
      |         list(open ORDER BY bucket_ts) AS op,
      |         list(high ORDER BY bucket_ts) AS hi,
      |         list(low ORDER BY bucket_ts) AS lo,
      |         list(close ORDER BY bucket_ts) AS cl,
      |         list(volume ORDER BY bucket_ts) AS vol,
      |         count(*) AS n
      |  FROM candles GROUP BY symbol)""".stripMargin

  private def withSeries(sql: String): String =
    Oracle.withCandles(s", $SERIES\n$sql")

  /** Like [[withSeries]] but under `WITH RECURSIVE`: the deterministic SQL
    * form for path-dependent state. (DuckDB 1.0 `list_reduce` over STRUCT
    * elements gives vectorization-dependent results — observed flipping
    * between runs — so latches/ratchets are replayed bar-by-bar with a
    * recursive CTE instead; scalar-typed folds are unaffected.)
    */
  private def withSeriesRec(sql: String): String =
    s"WITH RECURSIVE ${Oracle.CANDLES},\n$SERIES\n$sql"

  // ONE repo-wide spelling of the EWMA fold (graft.Oracle.red) — a local
  // copy could silently drift from the Series.ewma bit-exactness contract
  private def red(l: String, alpha: String): String = Oracle.red(l, alpha)

  private def redSeries(l: String, alpha: String): String =
    Oracle.redSeries(l, alpha)

  private val TRS =
    """list_transform(generate_series(1, n), i ->
      |  CASE WHEN i = 1 THEN hi[1] - lo[1]
      |       ELSE greatest(hi[i] - lo[i], abs(hi[i] - cl[i-1]), abs(lo[i] - cl[i-1])) END)""".stripMargin

  /** ZLEMA basis series (NaN→NULL before LAG) + trailing-max ATR band, the
    * SQL twin of [[zeroLagBands]]: basis list indexed from bar LAG+1.
    */
  private val ZL_BANDS =
    s"""bands AS (
       |  SELECT symbol, bucket_ts, n, cl, op, vol,
       |         ${redSeries(
             s"list_transform(generate_series($LAG + 1, n), i -> 2.0 * cl[i] - cl[i - $LAG])",
             s"2.0/(${LEN} + 1.0)")} AS basis_tail,
       |         list_transform(generate_series(1, n), i ->
       |           list_aggregate(atrs[greatest(1, i - ${WIN - 1}):i], 'max') * $MULT) AS band
       |  FROM (
       |    SELECT symbol, bucket_ts, n, cl, op, vol,
       |           ${redSeries("trs", s"1.0/$LEN.0")} AS atrs
       |    FROM (SELECT symbol, bucket_ts, n, cl, op, vol, $TRS AS trs
       |          FROM series WHERE n >= $MIN)))""".stripMargin

  val oracle: Map[String, String] = Map(
    "i29_supertrend" -> withSeriesRec(
      s""", pre AS (
         |  SELECT symbol, bucket_ts, n, hi, lo, cl,
         |         ${redSeries("trs", "1.0/10.0")} AS atrs
         |  FROM (SELECT symbol, bucket_ts, n, hi, lo, cl, $TRS AS trs
         |        FROM series WHERE n >= $MIN)),
         |rec AS (
         |  SELECT symbol, bucket_ts, n, hi, lo, cl, atrs, 1 AS i,
         |         (hi[1] + lo[1]) / 2.0 + 3.0 * atrs[1] AS fu,
         |         (hi[1] + lo[1]) / 2.0 - 3.0 * atrs[1] AS fl,
         |         0.0::DOUBLE AS st, 1 AS d
         |  FROM pre
         |  UNION ALL
         |  SELECT symbol, bucket_ts, n, hi, lo, cl, atrs, i + 1,
         |         x.fu2, x.fl2,
         |         CASE WHEN y.d2 = 1 THEN x.fu2 ELSE x.fl2 END, y.d2
         |  FROM rec,
         |    LATERAL (SELECT
         |      CASE WHEN cl[i] > fu THEN (hi[i+1] + lo[i+1]) / 2.0 + 3.0 * atrs[i+1]
         |           ELSE least((hi[i+1] + lo[i+1]) / 2.0 + 3.0 * atrs[i+1], fu) END AS fu2,
         |      CASE WHEN cl[i] < fl THEN (hi[i+1] + lo[i+1]) / 2.0 - 3.0 * atrs[i+1]
         |           ELSE greatest((hi[i+1] + lo[i+1]) / 2.0 - 3.0 * atrs[i+1], fl) END AS fl2) x,
         |    LATERAL (SELECT
         |      CASE WHEN st = fu THEN (CASE WHEN cl[i+1] > x.fu2 THEN -1 ELSE 1 END)
         |           ELSE (CASE WHEN cl[i+1] < x.fl2 THEN 1 ELSE -1 END) END AS d2) y
         |  WHERE i < n)
         |SELECT symbol, bucket_ts, round(st, 6) AS supertrend,
         |       CASE WHEN d = 1 THEN 'short' ELSE 'long' END AS direction,
         |       round(fu, 6) AS final_upper, round(fl, 6) AS final_lower
         |FROM rec WHERE i = n""".stripMargin),
    "i17_super_trend_zl" -> withSeriesRec(
      s""", $ZL_BANDS,
         |rec AS (
         |  SELECT symbol, bucket_ts, n, cl, op, vol, basis_tail, band,
         |         $LAG + 1 AS i, x.tr0 AS tr,
         |         CASE WHEN x.tr0 != 0 THEN $LAG + 1 ELSE -1 END AS flip
         |  FROM bands,
         |    LATERAL (SELECT
         |      CASE WHEN cl[$LAG] <= basis_tail[1] + band[$LAG + 1]
         |                AND cl[$LAG + 1] > basis_tail[1] + band[$LAG + 1] THEN 1
         |           WHEN cl[$LAG] >= basis_tail[1] - band[$LAG + 1]
         |                AND cl[$LAG + 1] < basis_tail[1] - band[$LAG + 1] THEN -1
         |           ELSE 0 END AS tr0) x
         |  UNION ALL
         |  SELECT symbol, bucket_ts, n, cl, op, vol, basis_tail, band,
         |         i + 1, x.tr2,
         |         CASE WHEN x.tr2 != tr THEN i + 1 ELSE flip END
         |  FROM rec,
         |    LATERAL (SELECT
         |      CASE WHEN cl[i] <= basis_tail[i + 1 - $LAG] + band[i + 1]
         |                AND cl[i + 1] > basis_tail[i + 1 - $LAG] + band[i + 1] THEN 1
         |           WHEN cl[i] >= basis_tail[i + 1 - $LAG] - band[i + 1]
         |                AND cl[i + 1] < basis_tail[i + 1 - $LAG] - band[i + 1] THEN -1
         |           ELSE tr END AS tr2) x
         |  WHERE i < n)
         |SELECT symbol, bucket_ts,
         |  CASE WHEN tr > 0 THEN 'long' WHEN tr < 0 THEN 'short' ELSE 'hold' END AS signal,
         |  CASE WHEN tr > 0 THEN 'bull' WHEN tr < 0 THEN 'bear' ELSE 'range' END AS direction,
         |  round(basis_tail[n - $LAG], 6) AS zlema,
         |  round(band[n], 6) AS band,
         |  round(basis_tail[n - $LAG] + band[n], 6) AS upper,
         |  round(basis_tail[n - $LAG] - band[n], 6) AS lower,
         |  tr AS trend,
         |  CAST(CASE WHEN flip < 0 THEN n ELSE n - flip + 1 END AS INT) AS trend_duration,
         |  round(CASE WHEN (upv + dnv) = 0.0 THEN NULL
         |        ELSE (upv - dnv) / ((upv + dnv) / 2.0) END, 6) AS volume_bias
         |FROM (
         |  SELECT *,
         |    list_reduce(list_prepend(0.0, list_transform(generate_series(greatest(1, n - 19), n),
         |      i -> CASE WHEN cl[i] > op[i] THEN vol[i] ELSE 0.0 END)), (a, x) -> a + x) AS upv,
         |    list_reduce(list_prepend(0.0, list_transform(generate_series(greatest(1, n - 19), n),
         |      i -> CASE WHEN cl[i] < op[i] THEN vol[i] ELSE 0.0 END)), (a, x) -> a + x) AS dnv
         |  FROM rec WHERE i = n)""".stripMargin),
    "i28_zero_lag" -> withSeriesRec(
      s""", $ZL_BANDS,
         |rec AS (
         |  SELECT symbol, bucket_ts, n, cl, basis_tail, band, $LAG + 1 AS i,
         |         CASE WHEN cl[$LAG + 1] > basis_tail[1] + band[$LAG + 1] THEN 1
         |              WHEN cl[$LAG + 1] < basis_tail[1] - band[$LAG + 1] THEN -1
         |              ELSE 0 END AS tr,
         |         0 AS ptr
         |  FROM bands
         |  UNION ALL
         |  SELECT symbol, bucket_ts, n, cl, basis_tail, band, i + 1,
         |         CASE WHEN cl[i + 1] > basis_tail[i + 1 - $LAG] + band[i + 1] THEN 1
         |              WHEN cl[i + 1] < basis_tail[i + 1 - $LAG] - band[i + 1] THEN -1
         |              ELSE tr END,
         |         tr
         |  FROM rec WHERE i < n)
         |SELECT symbol, bucket_ts,
         |  CASE WHEN tr > 0 AND ptr <= 0 THEN 'buy'
         |       WHEN tr < 0 AND ptr >= 0 THEN 'sell'
         |       ELSE 'hold' END AS signal,
         |  CASE WHEN tr > 0 THEN 'bull' WHEN tr < 0 THEN 'bear' ELSE 'range' END AS direction,
         |  round(basis_tail[n - $LAG], 6) AS zlema,
         |  round(band[n], 6) AS band,
         |  round(CASE WHEN band[n] = 0.0 THEN NULL
         |        ELSE abs(cl[n] - basis_tail[n - $LAG]) / band[n] * 100.0 END, 6) AS deviation_pct,
         |  tr AS trend
         |FROM rec WHERE i = n""".stripMargin),
    "i25_ha_long_short" -> withSeriesRec(
      s""", sm AS (
         |  SELECT symbol, bucket_ts, n,
         |         ${redSeries("op", "2.0/11.0")} AS os,
         |         ${redSeries("hi", "2.0/11.0")} AS hs,
         |         ${redSeries("lo", "2.0/11.0")} AS ls,
         |         ${redSeries("cl", "2.0/11.0")} AS cs
         |  FROM series WHERE n >= $MIN),
         |hacs AS (
         |  SELECT *, list_transform(generate_series(1, n), i ->
         |    (os[i] + hs[i] + ls[i] + cs[i]) / 4.0) AS hac
         |  FROM sm),
         |rec AS (
         |  SELECT symbol, n, hac, 1 AS i, (os[1] + cs[1]) / 2.0 AS o
         |  FROM hacs
         |  UNION ALL
         |  SELECT symbol, n, hac, i + 1, (o + hac[i]) / 2.0
         |  FROM rec WHERE i < n),
         |ha AS (
         |  SELECT h.symbol, h.bucket_ts, h.n, h.hs, h.ls, h.hac, r.hao
         |  FROM hacs h
         |  JOIN (SELECT symbol, list(o ORDER BY i) AS hao FROM rec GROUP BY symbol) r
         |    ON h.symbol = r.symbol),
         |post AS (
         |  SELECT symbol, bucket_ts, n,
         |         ${redSeries("hao", "2.0/11.0")} AS o2,
         |         ${redSeries(
             "list_transform(generate_series(1, n), i -> greatest(hs[i], hao[i], hac[i]))",
             "2.0/11.0")} AS h2,
         |         ${redSeries(
             "list_transform(generate_series(1, n), i -> least(ls[i], hao[i], hac[i]))",
             "2.0/11.0")} AS l2,
         |         ${redSeries("hac", "2.0/11.0")} AS c2
         |  FROM ha)
         |SELECT symbol, bucket_ts,
         |  CASE WHEN gn AND NOT gp THEN 'buy'
         |       WHEN NOT gn AND gp THEN 'sell' ELSE 'hold' END AS signal,
         |  CASE WHEN gn AND NOT gp THEN 'bull'
         |       WHEN NOT gn AND gp THEN 'bear'
         |       WHEN gn THEN 'bull' ELSE 'bear' END AS direction,
         |  CASE WHEN gn THEN 'green' ELSE 'red' END AS color,
         |  round(least(CASE WHEN body_p > 0.0 THEN body_n / body_p * 100.0 ELSE 0.0 END +
         |        greatest(0.0, least(1.0, (slope + 200.0) / 400.0)) * 40.0, 200.0), 6) AS strength,
         |  round(body_n, 6) AS body,
         |  round(h2[n] - l2[n], 6) AS wick,
         |  round(o2[n], 6) AS ha_open, round(c2[n], 6) AS ha_close
         |FROM (
         |  SELECT symbol, bucket_ts, n, o2, h2, l2, c2,
         |         o2[n] <= c2[n] AS gn, o2[n-1] <= c2[n-1] AS gp,
         |         abs(o2[n] - c2[n]) AS body_n, abs(o2[n-1] - c2[n-1]) AS body_p,
         |         CASE WHEN n > 5 THEN c2[n] - c2[n-4] ELSE c2[n] - c2[n-1] END AS slope
         |  FROM post)""".stripMargin),
    "i26_trend_cloud" -> withSeries(
      s"""SELECT symbol, bucket_ts,
         |  CASE WHEN (s3 = 'BUY' OR eng = 'BUY') AND up THEN 'buy'
         |       WHEN (s3 = 'SELL' OR eng = 'SELL') AND dn THEN 'sell'
         |       ELSE 'hold' END AS signal,
         |  CASE WHEN (s3 = 'BUY' OR eng = 'BUY') AND up THEN 'bull'
         |       WHEN (s3 = 'SELL' OR eng = 'SELL') AND dn THEN 'bear'
         |       WHEN up THEN 'bull' WHEN dn THEN 'bear' ELSE 'range' END AS direction,
         |  CASE WHEN s3 != 'HOLD' THEN 'three_line_strike'
         |       WHEN eng != 'HOLD' THEN 'engulfing' ELSE 'none' END AS pattern,
         |  round(CASE
         |    WHEN (s3 = 'BUY' OR eng = 'BUY') AND up THEN
         |      CASE WHEN avg_body = 0.0 THEN 0.0 ELSE body / avg_body * 100.0 END
         |    WHEN (s3 = 'SELL' OR eng = 'SELL') AND dn THEN
         |      CASE WHEN avg_body = 0.0 THEN 0.0 ELSE body / avg_body * 100.0 END
         |    WHEN up THEN least((cl_n - smma) / smma * 100.0, 5.0)
         |    WHEN dn THEN least((smma - cl_n) / smma * 100.0, 5.0)
         |    ELSE 0.0 END, 6) AS strength,
         |  round(smma, 6) AS smma, round(ema2, 6) AS ema2
         |FROM (
         |  SELECT symbol, bucket_ts,
         |    list_reduce(list_prepend(
         |        list_reduce(list_prepend(0.0, cl[1:$SMMA_N]), (a, x) -> a + x) / $SMMA_N.0,
         |        cl[$SMMA_N + 1:n]),
         |      (acc, x) -> (acc * ($SMMA_N.0 - 1.0) + x) / $SMMA_N.0) AS smma,
         |    ${red("cl", "2.0/3.0")} AS ema2,
         |    cl[n] AS cl_n,
         |    CASE WHEN cl[n-3] < op[n-3] AND cl[n-2] < op[n-2] AND cl[n-1] < op[n-1]
         |              AND cl[n] > op[n-1] THEN 'BUY'
         |         WHEN cl[n-3] > op[n-3] AND cl[n-2] > op[n-2] AND cl[n-1] > op[n-1]
         |              AND cl[n] < op[n-1] THEN 'SELL'
         |         ELSE 'HOLD' END AS s3,
         |    CASE WHEN op[n] <= cl[n-1] AND op[n] < op[n-1] AND cl[n] > op[n-1] THEN 'BUY'
         |         WHEN op[n] >= cl[n-1] AND op[n] > op[n-1] AND cl[n] < op[n-1] THEN 'SELL'
         |         ELSE 'HOLD' END AS eng,
         |    abs(cl[n] - op[n]) AS body,
         |    list_reduce(list_prepend(0.0, list_transform(generate_series(greatest(1, n - 14), n),
         |      i -> abs(cl[i] - op[i]))), (a, x) -> a + x) / least(15, n) AS avg_body
         |  FROM series WHERE n >= $MIN) t,
         |  LATERAL (SELECT t.ema2 > t.smma AS up, t.ema2 < t.smma AS dn) flags""".stripMargin),
    "i16_scalping" -> withSeries(
      s"""SELECT symbol, bucket_ts,
         |  CASE WHEN rsi < 30.0 AND p > e9 AND e9 > e21 THEN 'oversold_bounce'
         |       WHEN rsi > 70.0 AND p < e9 AND e9 < e21 THEN 'overbought_pullback'
         |       WHEN e9 > e21 AND rsi > 50.0 THEN 'long'
         |       WHEN e9 < e21 AND rsi < 50.0 THEN 'short'
         |       ELSE 'hold' END AS signal,
         |  round(rsi, 6) AS rsi, round(e9, 6) AS ema9, round(e21, 6) AS ema21,
         |  round(p, 6) AS price
         |FROM (
         |  SELECT symbol, bucket_ts, cl[n] AS p,
         |    CASE WHEN ${red(
             "list_transform(generate_series(2, n), i -> greatest(cl[i-1] - cl[i], 0.0))",
             "1.0/14.0")} = 0.0 THEN NULL
         |         ELSE 100.0 - 100.0 / (1.0 +
         |           ${red(
             "list_transform(generate_series(2, n), i -> greatest(cl[i] - cl[i-1], 0.0))",
             "1.0/14.0")} /
         |           ${red(
             "list_transform(generate_series(2, n), i -> greatest(cl[i-1] - cl[i], 0.0))",
             "1.0/14.0")}) END AS rsi,
         |    ${red("cl", "2.0/10.0")} AS e9,
         |    ${red("cl", "2.0/22.0")} AS e21
         |  FROM series WHERE n >= $MIN)""".stripMargin))
}
