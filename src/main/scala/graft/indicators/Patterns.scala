package graft.indicators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Indicator pack — candlestick / cloud patterns (SURVEY.md §2.4: I20,
  * I33-Ichimoku). The reference's K-pattern scanner delegates to TA-Lib's
  * CDL battery (batch/k_pattern.py:54-241); the patterns its downstream
  * actually asserts (engulfing, three-line strike — tv_trend_cloud.py:16-41)
  * plus the classic single/multi-bar set are pure lag comparisons, so here
  * they are closed-form window expressions: one per-symbol sort serves all
  * thirteen pattern flags, whole-stage-codegen end to end, per-bar output.
  */
object Patterns {
  private type Q = (SparkSession, String) => DataFrame
  import Windows._

  private def candles(s: SparkSession, dir: String) = Tables.candles(s, dir)

  /** I20 — candlestick patterns (batch/k_pattern.py:9-31 CDL map; engulfing
    * + three-line strike semantics per tv_trend_cloud.py:16-41). Emits one
    * row per bar where ≥1 pattern fires: comma-joined pattern names and a
    * net bull−bear strength. Runs on the 1d roll-up — the fixture's 1m
    * bars hold ~1 event each (open=high=low=close, no body or shadow to
    * pattern-match); daily bars have real OHLC shape. The expressions are
    * interval-agnostic, exactly like the reference's per-interval scans.
    */
  private val kPattern: Q = (s, dir) => {
    val df = graft.operators.Rollup.rollup(candles(s, dir), 86400L)
      .withColumn("po", lag1(col("open"))).withColumn("pc", lag1(col("close")))
      .withColumn("o2", lagN(col("open"), 2)).withColumn("c2", lagN(col("close"), 2))
      .withColumn("o3", lagN(col("open"), 3)).withColumn("c3", lagN(col("close"), 3))
      .filter(col("o3").isNotNull)
    val body = abs(col("close") - col("open"))
    val rng = col("high") - col("low")
    val upSh = col("high") - greatest(col("open"), col("close"))
    val loSh = least(col("open"), col("close")) - col("low")
    val bodyP = abs(col("pc") - col("po"))
    val body2 = abs(col("c2") - col("o2"))
    val bull = col("close") > col("open")
    val bear = col("close") < col("open")
    val bullP = col("pc") > col("po"); val bearP = col("pc") < col("po")
    val bull2 = col("c2") > col("o2"); val bear2 = col("c2") < col("o2")
    val bull3 = col("c3") > col("o3"); val bear3 = col("c3") < col("o3")

    val flags: Seq[(String, Column, Int)] = Seq(
      ("doji", rng > 0 && body <= lit(0.1) * rng, 0),
      ("hammer", body > 0 && loSh >= lit(2.0) * body && upSh <= body, 1),
      ("shooting_star", body > 0 && upSh >= lit(2.0) * body && loSh <= body, -1),
      ("bull_engulf", bearP && bull && col("open") <= col("pc") && col("close") >= col("po"), 1),
      ("bear_engulf", bullP && bear && col("open") >= col("pc") && col("close") <= col("po"), -1),
      ("bull_harami", bearP && bull && col("open") >= col("pc") && col("close") <= col("po"), 1),
      ("bear_harami", bullP && bear && col("open") <= col("pc") && col("close") >= col("po"), -1),
      ("three_white", bull && bullP && bull2 && col("close") > col("pc") && col("pc") > col("c2"), 1),
      ("three_black", bear && bearP && bear2 && col("close") < col("pc") && col("pc") < col("c2"), -1),
      ("morning_star", bear2 && bodyP <= lit(0.3) * body2 && bull &&
        col("close") >= (col("o2") + col("c2")) / 2, 1),
      ("evening_star", bull2 && bodyP <= lit(0.3) * body2 && bear &&
        col("close") <= (col("o2") + col("c2")) / 2, -1),
      ("bull_strike", bear3 && bear2 && bearP && col("pc") < col("c2") &&
        col("c2") < col("c3") && bull && col("close") > col("o3"), 1),
      ("bear_strike", bull3 && bull2 && bullP && col("pc") > col("c2") &&
        col("c2") > col("c3") && bear && col("close") < col("o3"), -1))

    val nFlags = flags.map { case (_, cond, _) => cond.cast("int") }.reduce(_ + _)
    val strength = flags.map { case (_, cond, w) => when(cond, w).otherwise(0) }.reduce(_ + _)
    val names = concat_ws(",",
      flags.map { case (nm, cond, _) => when(cond, nm) }: _*)
    df.withColumn("n_patterns", nFlags)
      .filter(col("n_patterns") > 0)
      .select(col("symbol"), col("bucket_ts"),
        names.as("patterns"), col("n_patterns"), strength.as("strength"))
  }

  /** I33 — Ichimoku cloud (lean_indicators.py:249-281), parameterized; the
    * reference's (9, 26, 52, 26) needs 78 bars — deeper than the ~67-bar
    * fixture symbols — so the registered query runs the same expressions at
    * (9, 13, 26, 13).
    */
  private def ichimoku(t: Int, k: Int, sb: Int, disp: Int): Q = (s, dir) =>
    candles(s, dir)
      .withColumn("tenkan", (rollingMax(col("high"), t) + rollingMin(col("low"), t)) / 2)
      .withColumn("kijun", (rollingMax(col("high"), k) + rollingMin(col("low"), k)) / 2)
      .withColumn("senkou_a", lagN((col("tenkan") + col("kijun")) / 2, disp))
      .withColumn("senkou_b",
        lagN((rollingMax(col("high"), sb) + rollingMin(col("low"), sb)) / 2, disp))
      .withColumn("nbars", barsIn(sb + disp))
      .filter(col("nbars") === (sb + disp))
      .select(col("symbol"), col("bucket_ts"),
        round(col("tenkan"), 6).as("tenkan"), round(col("kijun"), 6).as("kijun"),
        round(col("senkou_a"), 6).as("senkou_a"),
        round(col("senkou_b"), 6).as("senkou_b"),
        when(col("close") > greatest(col("senkou_a"), col("senkou_b")), "above_cloud")
          .when(col("close") < least(col("senkou_a"), col("senkou_b")), "below_cloud")
          .otherwise("in_cloud").as("signal"))

  val queries: Map[String, Q] = Map(
    "i20_k_pattern" -> kPattern,
    "i33_ichimoku" -> ichimoku(9, 13, 26, 13))

  private val W = "PARTITION BY symbol ORDER BY bucket_ts"
  private def f(n: Int) = s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"

  private val FLAG_SQL: Seq[(String, String, Int)] = {
    val body = "abs(close - open)"; val rng = "(high - low)"
    val upSh = "(high - greatest(open, close))"
    val loSh = "(least(open, close) - low)"
    val bodyP = "abs(pc - po)"; val body2 = "abs(c2 - o2)"
    Seq(
      ("doji", s"$rng > 0 AND $body <= 0.1 * $rng", 0),
      ("hammer", s"$body > 0 AND $loSh >= 2.0 * $body AND $upSh <= $body", 1),
      ("shooting_star", s"$body > 0 AND $upSh >= 2.0 * $body AND $loSh <= $body", -1),
      ("bull_engulf", "pc < po AND close > open AND open <= pc AND close >= po", 1),
      ("bear_engulf", "pc > po AND close < open AND open >= pc AND close <= po", -1),
      ("bull_harami", "pc < po AND close > open AND open >= pc AND close <= po", 1),
      ("bear_harami", "pc > po AND close < open AND open <= pc AND close >= po", -1),
      ("three_white", "close > open AND pc > po AND c2 > o2 AND close > pc AND pc > c2", 1),
      ("three_black", "close < open AND pc < po AND c2 < o2 AND close < pc AND pc < c2", -1),
      ("morning_star", s"c2 < o2 AND $bodyP <= 0.3 * $body2 AND close > open AND close >= (o2 + c2) / 2", 1),
      ("evening_star", s"c2 > o2 AND $bodyP <= 0.3 * $body2 AND close < open AND close <= (o2 + c2) / 2", -1),
      ("bull_strike", "c3 < o3 AND c2 < o2 AND pc < po AND pc < c2 AND c2 < c3 AND close > open AND close > o3", 1),
      ("bear_strike", "c3 > o3 AND c2 > o2 AND pc > po AND pc > c2 AND c2 > c3 AND close < open AND close < o3", -1))
  }

  val oracle: Map[String, String] = Map(
    "i20_k_pattern" -> Oracle.withCandles(
      s""", daily AS (
         |  SELECT symbol, dts AS bucket_ts, open, high, low, close FROM (
         |    SELECT symbol, bucket_ts // 86400 * 86400 AS dts,
         |           min_by(open, bucket_ts) AS open, max(high) AS high,
         |           min(low) AS low, max_by(close, bucket_ts) AS close
         |    FROM candles GROUP BY 1, 2))
         |SELECT symbol, bucket_ts,
         |  concat_ws(',', ${FLAG_SQL.map { case (nm, c, _) =>
             s"CASE WHEN $c THEN '$nm' END" }.mkString(",\n    ")}) AS patterns,
         |  ${FLAG_SQL.map { case (_, c, _) =>
             s"CAST($c AS INT)" }.mkString(" + ")} AS n_patterns,
         |  ${FLAG_SQL.map { case (_, c, w) =>
             s"CASE WHEN $c THEN $w ELSE 0 END" }.mkString(" + ")} AS strength
         |FROM (
         |  SELECT symbol, bucket_ts, open, high, low, close,
         |         lag(open) OVER ($W) AS po, lag(close) OVER ($W) AS pc,
         |         lag(open, 2) OVER ($W) AS o2, lag(close, 2) OVER ($W) AS c2,
         |         lag(open, 3) OVER ($W) AS o3, lag(close, 3) OVER ($W) AS c3
         |  FROM daily)
         |WHERE o3 IS NOT NULL
         |  AND ${FLAG_SQL.map { case (_, c, _) =>
             s"CAST($c AS INT)" }.mkString(" + ")} > 0""".stripMargin),
    "i33_ichimoku" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(tenkan, 6) AS tenkan,
         |  round(kijun, 6) AS kijun, round(senkou_a, 6) AS senkou_a,
         |  round(senkou_b, 6) AS senkou_b,
         |  CASE WHEN close > greatest(senkou_a, senkou_b) THEN 'above_cloud'
         |       WHEN close < least(senkou_a, senkou_b) THEN 'below_cloud'
         |       ELSE 'in_cloud' END AS signal
         |FROM (
         |  SELECT symbol, bucket_ts, close, tenkan, kijun,
         |         lag((tenkan + kijun) / 2, 13) OVER ($W) AS senkou_a,
         |         lag(sb_mid, 13) OVER ($W) AS senkou_b,
         |         count(*) OVER ($W ${f(39)}) AS nbars
         |  FROM (
         |    SELECT symbol, bucket_ts, close,
         |           (max(high) OVER ($W ${f(9)}) + min(low) OVER ($W ${f(9)})) / 2 AS tenkan,
         |           (max(high) OVER ($W ${f(13)}) + min(low) OVER ($W ${f(13)})) / 2 AS kijun,
         |           (max(high) OVER ($W ${f(26)}) + min(low) OVER ($W ${f(26)})) / 2 AS sb_mid
         |    FROM candles))
         |WHERE nbars = 39""".stripMargin))
}
