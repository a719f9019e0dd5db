package graft.indicators

import graft.Oracle
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import Series._

/** Market-structure operators (SURVEY.md §2.4: I18 liquidity, I21 VPVR,
  * I23 smart-money structure, I19 trend lines).
  *
  * All four consume a per-symbol ordered bar array ([[Series.mapSeries]],
  * one shuffle) and emit one row per symbol. The per-group work is O(n)
  * except VPVR's 48-bucket value-area expansion and the trend-line pair
  * validation, both bounded small loops — exactly the "driver-side loop over
  * ≤48 rows" class SURVEY.md §2.3 allows inside a group.
  *
  * Windows are scaled to the driver-testdata series length (~50–90 bars):
  * Kyle 180→40, Amihud 100→30, volatility 60→20 (I18); zone lookback stays
  * 100 (it self-clamps); pivot prd 20→5 (I19).
  */
object Market {
  private type Q = (SparkSession, String) => DataFrame

  private val MIN = 35

  // ------------------------------------------------------------- I18
  private val KYLE = 40
  private val AMIHUD = 30
  private val VOL = 20

  final case class LiqOut(symbol: String, bucket_ts: Long,
    score: Option[Double], level: String, amihud_score: Option[Double],
    kyle_score: Option[Double], vol_score: Option[Double],
    volume_score: Option[Double], amihud_raw: Option[Double],
    kyle_raw: Option[Double], turnover: Option[Double], price: Option[Double])
  private implicit val encLiq: Encoder[LiqOut] = Encoders.product[LiqOut]

  private def level(score: Double): String =
    if (score >= 80) "excellent" else if (score >= 65) "good"
    else if (score >= 50) "fair" else if (score >= 30) "tight" else "danger"

  /** I18 — liquidity composite (batch/liquidity.py:13-154): Amihud
    * illiquidity z-score (first-30-bar baseline, sigmoid score), Kyle λ
    * regression of price change on signed order flow (2·takerBuy − volume),
    * log-return volatility component, volume-vs-MA component; weighted
    * 0.35/0.30/0.20/0.15.
    */
  private val liquidity: Q = (s, dir) => mapSeries[LiqOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val cl = bars.map(_.close)
      // Zero-price/zero-volume bars (present at sf0.1+) are degenerate
      // observations: every ratio over them is EXPLICITLY excluded or
      // zero-filled, identically in both engines — JVM IEEE (x/0 → ±Inf,
      // log(0) → -Inf) and DuckDB (x/0.0 → NULL, ln(0) → error) disagree
      // at these edges, which was the r2-r7 accepted i18/i23 sf0.1 flip.
      // Amihud: baseline from the FIRST `AMIHUD` bars (reference iterates
      // df.iloc[1..window-1]), current from the last bar.
      val ils = (1 until math.min(AMIHUD, n)).flatMap { i =>
        val volUsd = bars(i).volume * cl(i)
        if (volUsd > 0.0 && cl(i - 1) != 0.0)
          Some(math.abs(math.log(cl(i) / cl(i - 1))) / volUsd)
        else None
      }.toArray
      val curDenom = bars(n - 1).volume * cl(n - 1)
      val curIl =
        if (curDenom == 0.0 || cl(n - 2) == 0.0) Double.NaN
        else math.abs(math.log(cl(n - 1) / cl(n - 2))) / curDenom
      val (amihudRaw, amihudScore) =
        if (ils.isEmpty || curIl.isNaN) (Double.NaN, 0.0)
        else {
          val m = mean(ils)
          var ss = 0.0; ils.foreach(x => ss += (x - m) * (x - m))
          val sd = math.sqrt(ss / ils.length)
          val z = if (sd == 0.0) 0.0 else (curIl - m) / sd
          (curIl, 100.0 / (1.0 + math.exp(z)))
        }
      // Kyle λ over the trailing window; the first pct-change is undefined
      // when the window covers the whole series.
      val w = math.min(KYLE, n)
      val pairs = ((n - w) until n).flatMap { i =>
        if (i == 0) None
        else Some((2.0 * bars(i).taker_buy_volume - bars(i).volume,
          if (cl(i - 1) == 0.0) 0.0 else cl(i) / cl(i - 1) - 1.0))
      }.toArray
      val (kyleRaw, kyleScore) =
        if (pairs.length < math.max(5.0, w * 0.6)) (Double.NaN, 0.0)
        else {
          val xm = mean(pairs.map(_._1)); val ym = mean(pairs.map(_._2))
          var sxy = 0.0; var sxx = 0.0
          pairs.foreach { case (x, y) => sxy += (x - xm) * (y - ym); sxx += (x - xm) * (x - xm) }
          if (sxx == 0.0) (Double.NaN, 0.0)
          else {
            val lambda = sxy / sxx
            val z = math.abs(lambda) / 0.001
            (lambda, 100.0 / (1.0 + math.exp(z)))
          }
        }
      // volatility component: sample std of the last VOL log returns
      // (zero-price endpoints → 0.0 return, window length stays fixed)
      val rets = (n - VOL until n).map(i =>
        if (cl(i - 1) == 0.0 || cl(i) == 0.0) 0.0
        else math.log(cl(i) / cl(i - 1))).toArray
      val rm = mean(rets)
      var rss = 0.0; rets.foreach(x => rss += (x - rm) * (x - rm))
      val sigma = math.sqrt(rss / (VOL - 1))
      val volScore = math.max(0.0, math.min(100.0, 100.0 * math.exp(-sigma / 0.01)))
      // volume component vs MA(VOL)
      val avgVol = mean(bars.slice(n - VOL, n).map(_.volume))
      val volumeScore =
        if (avgVol == 0.0) 0.0
        else math.max(0.0, math.min(100.0, 100.0 * (1.0 - math.exp(-bars(n - 1).volume / avgVol))))
      val score = 0.35 * amihudScore + 0.30 * kyleScore + 0.20 * volScore + 0.15 * volumeScore
      Some(LiqOut(sym, bars(n - 1).bucket_ts, r6(score), level(score),
        r6(amihudScore), r6(kyleScore), r6(volScore), r6(volumeScore),
        r6(if (amihudRaw.isNaN) 0.0 else amihudRaw),
        r6(if (kyleRaw.isNaN) 0.0 else kyleRaw),
        r6(bars(n - 1).quote_volume), r6(cl(n - 1))))
    }
  }

  // ------------------------------------------------------------- I21
  private val BINS = 48
  private val VA_TARGET = 0.7
  private val HVN_K = 0.7
  private val LVN_K = 0.25

  final case class VpvrOut(symbol: String, bucket_ts: Long,
    poc_price: Option[Double], poc_volume: Option[Double],
    va_low: Option[Double], va_high: Option[Double],
    va_coverage_pct: Option[Double], hvn_nodes: String, lvn_nodes: String,
    va_position: String)
  private implicit val encVpvr: Encoder[VpvrOut] = Encoders.product[VpvrOut]

  /** I21 — 48-bin volume profile (batch/vpvr.py:49-119): PoC, greedy 70%
    * value-area expansion (larger neighbor first, ties to the left), HVN ≥
    * 0.7·PoC and 0 < LVN ≤ 0.25·PoC node center-price lists, close-vs-VA
    * position.
    */
  private val vpvr: Q = (s, dir) => mapSeries[VpvrOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val lo = bars.map(_.low).min
      val hi = bars.map(_.high).max
      if (hi <= lo) None
      else {
        val vols = new Array[Double](BINS)
        var total = 0.0
        bars.foreach { b =>
          if (b.volume > 0.0) {
            val tp = (b.high + b.low + b.close) / 3.0
            val idx = math.min(math.max(((tp - lo) / (hi - lo) * BINS).toInt, 0), BINS - 1)
            vols(idx) += b.volume
            total += b.volume
          }
        }
        if (total <= 0.0) None
        else {
          var poc = 0
          var i = 1
          while (i < BINS) { if (vols(i) > vols(poc)) poc = i; i += 1 }
          val width = (hi - lo) / BINS
          def lower(b: Int) = lo + b * width
          def center(b: Int) = (lower(b) + lower(b + 1)) / 2.0
          var left = poc; var right = poc
          var cov = vols(poc) / total
          var go = true
          while (go && cov < VA_TARGET && (left > 0 || right < BINS - 1)) {
            val lv = if (left > 0) vols(left - 1) else -1.0
            val rv = if (right < BINS - 1) vols(right + 1) else -1.0
            if (lv >= rv && left > 0) { left -= 1; cov += lv / total }
            else if (right < BINS - 1) { right += 1; cov += rv / total }
            else go = false
          }
          val vaLow = lower(left); val vaHigh = lower(right + 1)
          val hvnT = vols(poc) * HVN_K
          val lvnT = vols(poc) * LVN_K
          def fmt(p: Double): String = rp(p, 1e2).toString
          val hvn = (0 until BINS).filter(b => vols(b) >= hvnT).map(b => fmt(center(b))).mkString(",")
          val lvn = (0 until BINS).filter(b => vols(b) > 0.0 && vols(b) <= lvnT).map(b => fmt(center(b))).mkString(",")
          val last = bars(n - 1).close
          val pos =
            if (last > vaHigh) "above_va" else if (last < vaLow) "below_va" else "in_va"
          Some(VpvrOut(sym, bars(n - 1).bucket_ts, r6(center(poc)), r6(vols(poc)),
            r6(vaLow), r6(vaHigh), r6(cov * 100.0), hvn, lvn, pos))
        }
      }
    }
  }

  // ------------------------------------------------------------- I23
  private val PIVOT = 5

  final case class BigMoneyOut(symbol: String, bucket_ts: Long, signal: String,
    direction: String, score: Option[Double], event: String, bias: String,
    order_block: String, ob_upper: Option[Double], ob_lower: Option[Double],
    gap_type: String, zone: String, swing_high: Option[Double],
    swing_low: Option[Double])
  private implicit val encBm: Encoder[BigMoneyOut] = Encoders.product[BigMoneyOut]

  /** Adjusted EWMA (pandas `ewm(span).mean()` default adjust=True) over the
    * series tail after dropping `skip` leading entries: weighted mean with
    * weights (1−α)^k, computed as two parallel folds so the oracle replays
    * the identical op sequence.
    */
  private def adjEwmaLast(xs: Array[Double], skip: Int, alpha: Double): Double = {
    var num = 0.0; var den = 0.0
    var i = skip
    while (i < xs.length) {
      num = xs(i) + (1.0 - alpha) * num
      den = 1.0 + (1.0 - alpha) * den
      i += 1
    }
    num / den
  }

  /** I23 — smart-money structure (batch/tv_big_money.py:31-191): swing
    * pivots (±5), EMA34 bias, breakout/reversal event score, order block
    * (last opposing candle in 8), fair-value gap (3-candle, offsets 2..5),
    * premium/discount zone over 100 bars, composite signal.
    */
  private val bigMoney: Q = (s, dir) => mapSeries[BigMoneyOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      val cl = bars.map(_.close)
      var swingHigh: Option[Double] = None
      var swingLow: Option[Double] = None
      var idx = PIVOT
      while (idx < n - PIVOT) {
        var hMax = Double.MinValue; var lMin = Double.MaxValue
        var t = idx - PIVOT
        while (t <= idx + PIVOT) {
          hMax = math.max(hMax, bars(t).high); lMin = math.min(lMin, bars(t).low)
          t += 1
        }
        if (bars(idx).high >= hMax) swingHigh = Some(bars(idx).high)
        if (bars(idx).low <= lMin) swingLow = Some(bars(idx).low)
        idx += 1
      }
      val ema34 = ewmaLast(cl, 2.0 / 35.0)
      val bull = cl(n - 1) >= ema34
      val close = cl(n - 1)
      var event = "range"
      var score = 0.0
      swingHigh.foreach { sh => if (close > sh) { event = "breakout_up"; score += 3.5 } }
      swingLow.foreach { sl => if (close < sl) { event = "breakout_down"; score -= 3.5 } }
      if (bull && swingLow.exists(close < _)) { event = "reversal_down"; score -= 4.5 }
      else if (!bull && swingHigh.exists(close > _)) { event = "reversal_up"; score += 4.5 }
      // anchored distance strength: adjusted EWMA of |pct change| * close
      // (zero-price denominator → 0.0, matching the oracle — see the i18
      // zero-bar comment)
      val absRet = Array.tabulate(n)(i =>
        if (i == 0 || cl(i - 1) == 0.0) 0.0
        else math.abs(cl(i) / cl(i - 1) - 1.0))
      val atr = adjEwmaLast(absRet, 1, 2.0 / 15.0) * close
      val anchor = if (bull) swingLow else swingHigh
      anchor.foreach { a =>
        val dist = if (bull) close - a else a - close
        val strength =
          if (atr == 0.0) 0.5
          else math.max(0.0, math.min(1.0, (dist - (-atr * 2.0)) / (atr * 2.0 - (-atr * 2.0))))
        score += strength * 0.2
      }
      // order block over the last 8 bars
      var obType = "none"; var obU = 0.0; var obL = 0.0
      var i = n - 1
      val lim = math.max(0, n - 8)
      var found = false
      while (i >= lim && !found) {
        val b = bars(i)
        if (bull && b.close < b.open) {
          obType = "bull_ob"; obU = math.max(b.open, b.close); obL = math.min(b.low, b.open)
          found = true
        } else if (!bull && b.close > b.open) {
          obType = "bear_ob"; obU = math.max(b.open, b.high); obL = math.min(b.open, b.close)
          found = true
        }
        i -= 1
      }
      // fair-value gap: first hit scanning offsets 2..5 from the end
      var gap = "none"
      var off = 2
      while (off <= 5 && gap == "none") {
        val k = n - off
        if (k - 2 >= 0) {
          if (bars(k - 1).low > bars(k - 2).high && bars(k).low > bars(k - 2).high) gap = "bull_gap"
          else if (bars(k - 1).high < bars(k - 2).low && bars(k).high < bars(k - 2).low) gap = "bear_gap"
        }
        off += 1
      }
      // premium/discount zone over the trailing 100 bars
      val zStart = math.max(0, n - 100)
      var zh = Double.MinValue; var zl = Double.MaxValue
      var zi = zStart
      while (zi < n) { zh = math.max(zh, bars(zi).high); zl = math.min(zl, bars(zi).low); zi += 1 }
      val mid = (zh + zl) / 2.0
      val zone =
        if (close >= zh) "extreme_premium" else if (close >= mid) "premium"
        else if (close <= zl) "extreme_discount" else if (close <= mid) "discount"
        else "equilibrium"
      score += (obType match {
        case "bull_ob" => 1.5
        case "bear_ob" => -1.5
        case _ => 0.0
      })
      score += (gap match {
        case "bull_gap" => 1.2
        case "bear_gap" => -1.2
        case _ => 0.0
      })
      if (bull && zone == "discount") score += 1.0
      if (!bull && zone == "premium") score -= 1.0
      val signal = if (score >= 5.0) "buy" else if (score <= -5.0) "sell" else "hold"
      Some(BigMoneyOut(sym, bars(n - 1).bucket_ts, signal,
        if (score >= 0.0) "bull" else "bear", r6(score), event,
        if (bull) "bull" else "bear", obType, r6(obU), r6(obL), gap, zone,
        swingHigh.flatMap(r6), swingLow.flatMap(r6)))
    }
  }

  // ------------------------------------------------------------- I19
  final case class TrendLineOut(symbol: String, bucket_ts: Long,
    direction: String, support_valid: Boolean, resistance_valid: Boolean,
    support_level: Option[Double], resistance_level: Option[Double],
    distance_pct: Option[Double])
  private implicit val encTl: Encoder[TrendLineOut] = Encoders.product[TrendLineOut]

  /** I19 — trend lines from swing pivots (batch/trend_line.py:8-175,
    * simplified to the last candidate pair): support line through the last
    * two ascending pivot lows, valid when every close since the later pivot
    * stays on/above its projection; resistance mirrored over descending
    * pivot highs. Direction: resistance ⇒ short, else support ⇒ long, else
    * range (the reference's precedence, `_pick_direction_and_distance`);
    * distance% = close vs the active line's projection at the last bar.
    */
  private val trendLine: Q = (s, dir) => mapSeries[TrendLineOut](s, dir) { (sym, bars) =>
    val n = bars.length
    if (n < MIN) None
    else {
      // centered pivots, prd=5
      val hiP = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      val loP = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      var idx = PIVOT
      while (idx < n - PIVOT) {
        var hMax = Double.MinValue; var lMin = Double.MaxValue
        var t = idx - PIVOT
        while (t <= idx + PIVOT) {
          hMax = math.max(hMax, bars(t).high); lMin = math.min(lMin, bars(t).low)
          t += 1
        }
        if (bars(idx).high >= hMax) hiP += ((idx, bars(idx).high))
        if (bars(idx).low <= lMin) loP += ((idx, bars(idx).low))
        idx += 1
      }
      // line through the last two pivots, validated from the later pivot on
      def line(ps: Seq[(Int, Double)], support: Boolean): Option[Double] = {
        if (ps.length < 2) return None
        val (i1, v1) = ps(ps.length - 2)
        val (i2, v2) = ps.last
        val ascending = if (support) v2 > v1 else v2 < v1
        if (!ascending) return None
        val slope = (v2 - v1) / (i2 - i1)
        var k = i2
        while (k < n) {
          val proj = v2 + slope * (k - i2)
          if (support && bars(k).close < proj) return None
          if (!support && bars(k).close > proj) return None
          k += 1
        }
        Some(v2 + slope * (n - 1 - i2))
      }
      val sup = line(loP.toSeq, support = true)
      val res = line(hiP.toSeq, support = false)
      val close = bars(n - 1).close
      val (direction, distPct) = res match {
        case Some(r) => ("short", if (r == 0.0) None else Some((close - r) / r * 100.0))
        case None => sup match {
          case Some(l) => ("long", if (l == 0.0) None else Some((close - l) / l * 100.0))
          case None => ("range", None)
        }
      }
      Some(TrendLineOut(sym, bars(n - 1).bucket_ts, direction,
        sup.isDefined, res.isDefined, sup.flatMap(r6), res.flatMap(r6),
        distPct.flatMap(r6)))
    }
  }

  val queries: Map[String, Q] = Map(
    "i18_liquidity" -> liquidity,
    "i21_vpvr" -> vpvr,
    "i23_big_money" -> bigMoney,
    "i19_trend_line" -> trendLine)

  // ---------------------------------------------------------------- oracle

  private val SERIES =
    """series AS (
      |  SELECT symbol, max(bucket_ts) AS bucket_ts,
      |         list(open ORDER BY bucket_ts) AS op,
      |         list(high ORDER BY bucket_ts) AS hi,
      |         list(low ORDER BY bucket_ts) AS lo,
      |         list(close ORDER BY bucket_ts) AS cl,
      |         list(volume ORDER BY bucket_ts) AS vol,
      |         list(quote_volume ORDER BY bucket_ts) AS qv,
      |         list(taker_buy_volume ORDER BY bucket_ts) AS tbv,
      |         count(*) AS n
      |  FROM candles GROUP BY symbol)""".stripMargin

  private def withSeries(sql: String): String =
    Oracle.withCandles(s", $SERIES\n$sql")

  private def withSeriesRec(sql: String): String =
    s"WITH RECURSIVE ${Oracle.CANDLES},\n$SERIES\n$sql"

  private def seqSum(l: String): String =
    s"list_reduce(list_prepend(0.0, $l), (acc, x) -> acc + x)"
  private def seqMean(l: String): String = s"${seqSum(l)} / len($l)"

  private val LEVEL =
    """CASE WHEN score >= 80 THEN 'excellent' WHEN score >= 65 THEN 'good'
      |     WHEN score >= 50 THEN 'fair' WHEN score >= 30 THEN 'tight'
      |     ELSE 'danger' END""".stripMargin

  val oracle: Map[String, String] = Map(
    "i18_liquidity" -> withSeries(
      s""", comp AS (
         |  SELECT symbol, bucket_ts, n, cl, vol, qv,
    -- zero-price/zero-volume bars are excluded or zero-filled EXACTLY as
    -- in the Scala kernel (see the i18 builder comment): DuckDB x/0.0 is
    -- NULL and ln(0) errors, so every ratio guards its denominator
         |    CASE WHEN len(ils) = 0 OR vol[n] * cl[n] = 0.0 OR cl[n-1] = 0.0 THEN 0.0
         |         ELSE 100.0 / (1.0 + exp(
         |           CASE WHEN il_sd = 0.0 THEN 0.0
         |                ELSE (abs(ln(cl[n] / cl[n-1])) / (vol[n] * cl[n]) - il_m) / il_sd END))
         |    END AS amihud_score,
         |    CASE WHEN len(ils) = 0 OR vol[n] * cl[n] = 0.0 OR cl[n-1] = 0.0 THEN 0.0
         |         ELSE abs(ln(cl[n] / cl[n-1])) / (vol[n] * cl[n]) END AS amihud_raw,
         |    CASE WHEN kyle_sxx = 0.0 OR kyle_m < greatest(5.0, least($KYLE, n) * 0.6) THEN 0.0
         |         ELSE 100.0 / (1.0 + exp(abs(kyle_sxy / kyle_sxx) / 0.001)) END AS kyle_score,
         |    CASE WHEN kyle_sxx = 0.0 OR kyle_m < greatest(5.0, least($KYLE, n) * 0.6) THEN 0.0
         |         ELSE kyle_sxy / kyle_sxx END AS kyle_raw,
         |    greatest(0.0, least(100.0, 100.0 * exp(-sqrt(rss / ($VOL - 1)) / 0.01))) AS vol_score,
         |    CASE WHEN av = 0.0 THEN 0.0
         |         ELSE greatest(0.0, least(100.0, 100.0 * (1.0 - exp(-vol[n] / av)))) END AS volume_score
         |  FROM (
         |    SELECT *,
         |      CASE WHEN len(ils) = 0 THEN 0.0 ELSE ${seqMean("ils")} END AS il_m,
         |      CASE WHEN len(ils) = 0 THEN 0.0
         |           ELSE sqrt(${seqSum(s"list_transform(ils, x -> (x - ${seqSum("ils")} / len(ils)) * (x - ${seqSum("ils")} / len(ils)))")} / len(ils)) END AS il_sd,
         |      len(kx) AS kyle_m,
         |      ${seqSum(s"list_transform(generate_series(1, len(kx)), i -> (kx[i] - ${seqSum("kx")} / len(kx)) * (ky[i] - ${seqSum("ky")} / len(ky)))")} AS kyle_sxy,
         |      ${seqSum(s"list_transform(kx, x -> (x - ${seqSum("kx")} / len(kx)) * (x - ${seqSum("kx")} / len(kx)))")} AS kyle_sxx,
         |      ${seqSum(s"list_transform(rets, x -> (x - ${seqMean("rets")}) * (x - ${seqMean("rets")}))")} AS rss,
         |      ${seqMean(s"vol[n - ${VOL - 1}:n]")} AS av
         |    FROM (
         |      SELECT symbol, bucket_ts, n, cl, vol, qv,
         |        list_filter(
         |          list_transform(generate_series(2, least($AMIHUD, n)), i ->
         |            CASE WHEN vol[i] * cl[i] > 0.0 AND cl[i-1] != 0.0
         |                 THEN abs(ln(cl[i] / cl[i-1])) / (vol[i] * cl[i]) END),
         |          x -> x IS NOT NULL) AS ils,
         |        list_transform(generate_series(greatest(2, n - least($KYLE, n) + 1), n), i ->
         |          2.0 * tbv[i] - vol[i]) AS kx,
         |        list_transform(generate_series(greatest(2, n - least($KYLE, n) + 1), n), i ->
         |          CASE WHEN cl[i-1] = 0.0 THEN 0.0 ELSE cl[i] / cl[i-1] - 1.0 END) AS ky,
         |        list_transform(generate_series(n - $VOL + 1, n), i ->
         |          CASE WHEN cl[i-1] = 0.0 OR cl[i] = 0.0 THEN 0.0
         |               ELSE ln(cl[i] / cl[i-1]) END) AS rets
         |      FROM series WHERE n >= $MIN)))
         |SELECT symbol, bucket_ts, round(score, 6) AS score, $LEVEL AS level,
         |  round(amihud_score, 6) AS amihud_score, round(kyle_score, 6) AS kyle_score,
         |  round(vol_score, 6) AS vol_score, round(volume_score, 6) AS volume_score,
         |  round(amihud_raw, 6) AS amihud_raw, round(kyle_raw, 6) AS kyle_raw,
         |  round(qv[n], 6) AS turnover, round(cl[n], 6) AS price
         |FROM (
         |  SELECT *, 0.35 * amihud_score + 0.30 * kyle_score +
         |            0.20 * vol_score + 0.15 * volume_score AS score
         |  FROM comp)""".stripMargin),
    "i21_vpvr" -> withSeriesRec(
      s""", hist AS (
         |  SELECT symbol, bucket_ts, n, cl, plo, phi,
         |    list_transform(generate_series(0, ${BINS - 1}), b ->
         |      ${seqSum(s"""list_transform(generate_series(1, n), i ->
         |        CASE WHEN vol[i] > 0.0 AND
         |          least(greatest(CAST(floor(((hi[i] + lo[i] + cl[i]) / 3.0 - plo) / (phi - plo) * $BINS) AS INT), 0), ${BINS - 1}) = b
         |        THEN vol[i] ELSE 0.0 END)""")}) AS vols,
         |    ${seqSum(s"list_transform(vol, v -> CASE WHEN v > 0.0 THEN v ELSE 0.0 END)")} AS total
         |  FROM (
         |    SELECT symbol, bucket_ts, n, cl, vol, hi, lo,
         |           list_aggregate(lo, 'min') AS plo, list_aggregate(hi, 'max') AS phi
         |    FROM series WHERE n >= $MIN) sub
         |  WHERE phi > plo),
         |pocs AS (
         |  SELECT *, list_position(vols, list_aggregate(vols, 'max')) - 1 AS poc,
         |         (phi - plo) / $BINS AS w
         |  FROM hist WHERE total > 0.0),
         |va AS (
         |  SELECT symbol, poc AS l, poc AS r, vols[poc + 1] / total AS cov,
         |         vols, total, 0 AS done
         |  FROM pocs
         |  UNION ALL
         |  SELECT symbol,
         |    CASE WHEN lv >= rv AND l > 0 THEN l - 1 ELSE l END,
         |    CASE WHEN lv >= rv AND l > 0 THEN r
         |         WHEN r < ${BINS - 1} THEN r + 1 ELSE r END,
         |    CASE WHEN lv >= rv AND l > 0 THEN cov + lv / total
         |         WHEN r < ${BINS - 1} THEN cov + rv / total ELSE cov END,
         |    vols, total,
         |    CASE WHEN NOT (lv >= rv AND l > 0) AND NOT (r < ${BINS - 1}) THEN 1 ELSE 0 END
         |  FROM (
         |    SELECT *,
         |      CASE WHEN l > 0 THEN vols[l] ELSE -1.0 END AS lv,
         |      CASE WHEN r < ${BINS - 1} THEN vols[r + 2] ELSE -1.0 END AS rv
         |    FROM va) x
         |  WHERE done = 0 AND cov < $VA_TARGET AND (l > 0 OR r < ${BINS - 1})),
         |vafinal AS (
         |  SELECT symbol, max_by(l, r - l) AS l, max_by(r, r - l) AS r,
         |         max_by(cov, r - l) AS cov
         |  FROM va GROUP BY symbol)
         |SELECT p.symbol, p.bucket_ts,
         |  round(((p.plo + p.poc * p.w) + (p.plo + (p.poc + 1) * p.w)) / 2.0, 6) AS poc_price,
         |  round(p.vols[p.poc + 1], 6) AS poc_volume,
         |  round(p.plo + f.l * p.w, 6) AS va_low,
         |  round(p.plo + (f.r + 1) * p.w, 6) AS va_high,
         |  round(f.cov * 100.0, 6) AS va_coverage_pct,
         |  array_to_string(list_transform(
         |    list_filter(generate_series(0, ${BINS - 1}), b -> p.vols[b + 1] >= p.vols[p.poc + 1] * $HVN_K),
         |    b -> CAST(round(((p.plo + b * p.w) + (p.plo + (b + 1) * p.w)) / 2.0, 2) AS VARCHAR)), ',') AS hvn_nodes,
         |  array_to_string(list_transform(
         |    list_filter(generate_series(0, ${BINS - 1}), b -> p.vols[b + 1] > 0.0 AND p.vols[b + 1] <= p.vols[p.poc + 1] * $LVN_K),
         |    b -> CAST(round(((p.plo + b * p.w) + (p.plo + (b + 1) * p.w)) / 2.0, 2) AS VARCHAR)), ',') AS lvn_nodes,
         |  CASE WHEN p.cl[p.n] > p.plo + (f.r + 1) * p.w THEN 'above_va'
         |       WHEN p.cl[p.n] < p.plo + f.l * p.w THEN 'below_va'
         |       ELSE 'in_va' END AS va_position
         |FROM pocs p JOIN vafinal f ON p.symbol = f.symbol""".stripMargin),
    "i23_big_money" -> withSeries(
      s""", pv AS (
         |  SELECT symbol, bucket_ts, n, op, hi, lo, cl,
         |    list_filter(list_transform(generate_series($PIVOT + 1, n - $PIVOT), i ->
         |      CASE WHEN hi[i] >= list_aggregate(hi[i - $PIVOT:i + $PIVOT], 'max')
         |           THEN hi[i] END), x -> x IS NOT NULL) AS shs,
         |    list_filter(list_transform(generate_series($PIVOT + 1, n - $PIVOT), i ->
         |      CASE WHEN lo[i] <= list_aggregate(lo[i - $PIVOT:i + $PIVOT], 'min')
         |           THEN lo[i] END), x -> x IS NOT NULL) AS sls
         |  FROM series WHERE n >= $MIN),
         |st AS (
         |  SELECT *,
         |    CASE WHEN len(shs) > 0 THEN shs[-1] END AS sh,
         |    CASE WHEN len(sls) > 0 THEN sls[-1] END AS sl,
         |    cl[n] >= ${graft.indicators.Market.redForOracle("cl", "2.0/35.0")} AS bull,
         |    ${graft.indicators.Market.adjEwmaSql(
           s"""list_transform(generate_series(2, n), i ->
              CASE WHEN cl[i-1] = 0.0 THEN 0.0
                   ELSE abs(cl[i] / cl[i-1] - 1.0) END)""",
           "2.0/15.0")} * cl[n] AS atr
         |  FROM pv),
         |sc AS (
         |  SELECT *,
         |    CASE WHEN bull AND sl IS NOT NULL AND cl[n] < sl THEN 'reversal_down'
         |         WHEN NOT bull AND sh IS NOT NULL AND cl[n] > sh THEN 'reversal_up'
         |         WHEN sl IS NOT NULL AND cl[n] < sl THEN 'breakout_down'
         |         WHEN sh IS NOT NULL AND cl[n] > sh THEN 'breakout_up'
         |         ELSE 'range' END AS event,
         |    (CASE WHEN sh IS NOT NULL AND cl[n] > sh THEN 3.5 ELSE 0.0 END) +
         |    (CASE WHEN sl IS NOT NULL AND cl[n] < sl THEN -3.5 ELSE 0.0 END) +
         |    (CASE WHEN bull AND sl IS NOT NULL AND cl[n] < sl THEN -4.5
         |          WHEN NOT bull AND sh IS NOT NULL AND cl[n] > sh THEN 4.5
         |          ELSE 0.0 END) +
         |    (CASE WHEN (CASE WHEN bull THEN sl ELSE sh END) IS NOT NULL THEN
         |       (CASE WHEN atr = 0.0 THEN 0.5
         |             ELSE greatest(0.0, least(1.0,
         |               ((CASE WHEN bull THEN cl[n] - sl ELSE sh - cl[n] END) - (-atr * 2.0))
         |               / (atr * 2.0 - (-atr * 2.0)))) END) * 0.2
         |     ELSE 0.0 END) AS score0,
         |    ob.typ AS ob_type, ob.u AS ob_u, ob.l AS ob_l,
         |    CASE
         |      WHEN n - 3 >= 1 AND lo[n-2] > hi[n-3] AND lo[n-1] > hi[n-3] THEN 'bull_gap'
         |      WHEN n - 3 >= 1 AND hi[n-2] < lo[n-3] AND hi[n-1] < lo[n-3] THEN 'bear_gap'
         |      WHEN n - 4 >= 1 AND lo[n-3] > hi[n-4] AND lo[n-2] > hi[n-4] THEN 'bull_gap'
         |      WHEN n - 4 >= 1 AND hi[n-3] < lo[n-4] AND hi[n-2] < lo[n-4] THEN 'bear_gap'
         |      WHEN n - 5 >= 1 AND lo[n-4] > hi[n-5] AND lo[n-3] > hi[n-5] THEN 'bull_gap'
         |      WHEN n - 5 >= 1 AND hi[n-4] < lo[n-5] AND hi[n-3] < lo[n-5] THEN 'bear_gap'
         |      WHEN n - 6 >= 1 AND lo[n-5] > hi[n-6] AND lo[n-4] > hi[n-6] THEN 'bull_gap'
         |      WHEN n - 6 >= 1 AND hi[n-5] < lo[n-6] AND hi[n-4] < lo[n-6] THEN 'bear_gap'
         |      ELSE 'none' END AS gap,
         |    CASE WHEN cl[n] >= zh THEN 'extreme_premium'
         |         WHEN cl[n] >= (zh + zl) / 2.0 THEN 'premium'
         |         WHEN cl[n] <= zl THEN 'extreme_discount'
         |         WHEN cl[n] <= (zh + zl) / 2.0 THEN 'discount'
         |         ELSE 'equilibrium' END AS zone
         |  FROM (
         |    SELECT *,
         |      list_aggregate(hi[greatest(1, n - 99):n], 'max') AS zh,
         |      list_aggregate(lo[greatest(1, n - 99):n], 'min') AS zl,
         |      CASE WHEN bull AND len(bear_is) > 0 THEN
         |        {typ: 'bull_ob', u: greatest(op[bear_is[-1]], cl[bear_is[-1]]),
         |         l: least(lo[bear_is[-1]], op[bear_is[-1]])}
         |      WHEN NOT bull AND len(bull_is) > 0 THEN
         |        {typ: 'bear_ob', u: greatest(op[bull_is[-1]], hi[bull_is[-1]]),
         |         l: least(op[bull_is[-1]], cl[bull_is[-1]])}
         |      ELSE {typ: 'none', u: 0.0, l: 0.0} END AS ob
         |    FROM (
         |      SELECT *,
         |        list_filter(generate_series(greatest(1, n - 7), n), i -> cl[i] < op[i]) AS bear_is,
         |        list_filter(generate_series(greatest(1, n - 7), n), i -> cl[i] > op[i]) AS bull_is
         |      FROM st) inner0) inner1)
         |SELECT symbol, bucket_ts,
         |  CASE WHEN score >= 5.0 THEN 'buy' WHEN score <= -5.0 THEN 'sell'
         |       ELSE 'hold' END AS signal,
         |  CASE WHEN score >= 0.0 THEN 'bull' ELSE 'bear' END AS direction,
         |  round(score, 6) AS score, event,
         |  CASE WHEN bull THEN 'bull' ELSE 'bear' END AS bias,
         |  ob_type AS order_block, round(ob_u, 6) AS ob_upper,
         |  round(ob_l, 6) AS ob_lower, gap AS gap_type, zone,
         |  round(sh, 6) AS swing_high, round(sl, 6) AS swing_low
         |FROM (
         |  SELECT *,
         |    score0 +
         |    (CASE WHEN ob_type = 'bull_ob' THEN 1.5
         |          WHEN ob_type = 'bear_ob' THEN -1.5 ELSE 0.0 END) +
         |    (CASE WHEN gap = 'bull_gap' THEN 1.2
         |          WHEN gap = 'bear_gap' THEN -1.2 ELSE 0.0 END) +
         |    (CASE WHEN bull AND zone = 'discount' THEN 1.0 ELSE 0.0 END) +
         |    (CASE WHEN NOT bull AND zone = 'premium' THEN -1.0 ELSE 0.0 END) AS score
         |  FROM sc)""".stripMargin),
    "i19_trend_line" -> withSeries(
      s""", pv AS (
         |  SELECT symbol, bucket_ts, n, cl,
         |    list_filter(list_transform(generate_series($PIVOT + 1, n - $PIVOT), i ->
         |      CASE WHEN hi[i] >= list_aggregate(hi[i - $PIVOT:i + $PIVOT], 'max')
         |           THEN {i: i, v: hi[i]} END), x -> x IS NOT NULL) AS hp,
         |    list_filter(list_transform(generate_series($PIVOT + 1, n - $PIVOT), i ->
         |      CASE WHEN lo[i] <= list_aggregate(lo[i - $PIVOT:i + $PIVOT], 'min')
         |           THEN {i: i, v: lo[i]} END), x -> x IS NOT NULL) AS lp
         |  FROM series WHERE n >= $MIN),
         |lines AS (
         |  SELECT symbol, bucket_ts, n, cl,
         |    CASE WHEN len(lp) >= 2 AND lp[-1].v > lp[-2].v AND
         |      len(list_filter(generate_series(lp[-1].i, n), k ->
         |        cl[k] < lp[-1].v + (lp[-1].v - lp[-2].v) / (lp[-1].i - lp[-2].i) * (k - lp[-1].i))) = 0
         |    THEN lp[-1].v + (lp[-1].v - lp[-2].v) / (lp[-1].i - lp[-2].i) * (n - lp[-1].i)
         |    END AS sup,
         |    CASE WHEN len(hp) >= 2 AND hp[-1].v < hp[-2].v AND
         |      len(list_filter(generate_series(hp[-1].i, n), k ->
         |        cl[k] > hp[-1].v + (hp[-1].v - hp[-2].v) / (hp[-1].i - hp[-2].i) * (k - hp[-1].i))) = 0
         |    THEN hp[-1].v + (hp[-1].v - hp[-2].v) / (hp[-1].i - hp[-2].i) * (n - hp[-1].i)
         |    END AS res
         |  FROM pv)
         |SELECT symbol, bucket_ts,
         |  CASE WHEN res IS NOT NULL THEN 'short'
         |       WHEN sup IS NOT NULL THEN 'long' ELSE 'range' END AS direction,
         |  sup IS NOT NULL AS support_valid,
         |  res IS NOT NULL AS resistance_valid,
         |  round(sup, 6) AS support_level, round(res, 6) AS resistance_level,
         |  round(CASE WHEN res IS NOT NULL THEN
         |          CASE WHEN res != 0.0 THEN (cl[n] - res) / res * 100.0 END
         |        WHEN sup IS NOT NULL THEN
         |          CASE WHEN sup != 0.0 THEN (cl[n] - sup) / sup * 100.0 END
         |        END, 6) AS distance_pct
         |FROM lines""".stripMargin))

  /** Scalar EWMA fold — delegates to the repo-wide single spelling
    * ([[graft.Oracle.red]]; the string is the bit-exactness contract
    * with `Series.ewma`, so no private copies — r10 review finding).
    */
  def redForOracle(l: String, alpha: String): String =
    graft.Oracle.red(l, alpha)

  /** Adjusted-EWMA last value (pandas `ewm(span).mean()` default): two
    * parallel scalar folds num/den, same op order as [[adjEwmaLast]].
    */
  def adjEwmaSql(l: String, alpha: String): String =
    s"""(list_reduce(list_prepend(0.0, $l), (acc, x) -> x + (1.0 - ($alpha)) * acc) /
       | list_reduce(list_prepend(0.0, list_transform($l, x -> CAST(1.0 AS DOUBLE))),
       |   (acc, x) -> x + (1.0 - ($alpha)) * acc))""".stripMargin
}
