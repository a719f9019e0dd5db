package graft.indicators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Indicator pack A — the rolling-window family (SURVEY.md §2.4: I1, I5,
  * I6, I10-I14, I31-I33 plus the pivot/streak primitives of §2.3). All are
  * closed-form window expressions: one shuffle+sort per symbol serves every
  * column, outputs are per-bar (gated on a full window, the pandas
  * `rolling(n)` NaN contract) and every query has a DuckDB oracle.
  */
object Rolling {
  private type Q = (SparkSession, String) => DataFrame
  import Windows._

  private def candles(s: SparkSession, dir: String) = Tables.candles(s, dir)

  /** I10 — Bollinger bands (batch/bollinger.py:9-47): MA20 ± 2σ, bandwidth,
    * %b, 10-bar mid slope.
    *
    * Rounding: every output uses the shared `floor(x·10⁶ + 0.5)/10⁶` IEEE
    * sequence instead of `round` — mid_slope = (mid − mid10)/10 lands on
    * exact decimal halves (prices live on a coarse grid), where Spark's
    * decimal HALF_UP and DuckDB's scaled-double rounding disagree (the
    * i32_williams_r class; this was the accepted i10 sf0.1 flip).
    */
  private val bollinger: Q = (s, dir) => {
    def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    candles(s, dir)
      .withColumn("frame", collect_list(col("close")).over(lastN(20)))
      .withColumn("mid", meanOf(col("frame")))
      .withColumn("sd", stdOf(col("frame"), col("mid"), 1))
      .withColumn("nbars", barsIn(20))
      .withColumn("mid10", lagN(col("mid"), 10))
      .filter(col("nbars") === 20 && col("mid10").isNotNull)
      .select(col("symbol"), col("bucket_ts"),
        q6(col("mid")).as("mid"),
        q6(col("mid") + lit(2.0) * col("sd")).as("upper"),
        q6(col("mid") - lit(2.0) * col("sd")).as("lower"),
        q6(lit(4.0) * col("sd") / nullif(col("mid"), lit(0.0))).as("bandwidth"),
        q6((col("close") - (col("mid") - lit(2.0) * col("sd"))) /
          nullif(lit(4.0) * col("sd"), lit(0.0))).as("pct_b"),
        q6((col("mid") - col("mid10")) / 10).as("mid_slope"))
  }

  /** I32 — Williams %R(14) (lean_indicators.py:168-192).
    *
    * Rounding: %R = −100·(hh−close)/(hh−ll) lands on exact decimal halves
    * whenever the quotient is dyadic (k/2ⁿ), and Spark's `round` (decimal
    * HALF_UP) disagrees with DuckDB's scaled-double rounding exactly there.
    * Both engines therefore emit the identical IEEE sequence
    * `floor(x·10⁶ + 0.5)/10⁶` — parity by construction.
    */
  private val williamsR: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("hh", rollingMax(col("high"), 14))
      .withColumn("ll", rollingMin(col("low"), 14))
      .withColumn("nbars", barsIn(14))
      .filter(col("nbars") === 14)
      .select(col("symbol"), col("bucket_ts"),
        (floor((lit(-100.0) * (col("hh") - col("close")) /
          nullif(col("hh") - col("ll"), lit(0.0))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("williams_r"))

  /** I33 — Donchian channel(20) (lean_indicators.py:195-214). */
  private val donchian: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("up", rollingMax(col("high"), 20))
      .withColumn("lo", rollingMin(col("low"), 20))
      .withColumn("nbars", barsIn(20))
      .filter(col("nbars") === 20)
      .select(col("symbol"), col("bucket_ts"),
        round(col("up"), 6).as("upper"), round(col("lo"), 6).as("lower"),
        round((col("up") + col("lo")) / 2, 6).as("mid"),
        round((col("close") - col("lo")) /
          nullif(col("up") - col("lo"), lit(0.0)), 6).as("position"))

  /** I31 — CCI(20) (lean_indicators.py:136-165): (tp−SMA)/(0.015·MAD); the
    * MAD folds the collected frame with a higher-order function.
    */
  private val cci: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("tp", (col("high") + col("low") + col("close")) / 3)
      .withColumn("frame", collect_list(col("tp")).over(lastN(20)))
      .withColumn("ma", meanOf(col("frame")))
      .withColumn("nbars", barsIn(20))
      .filter(col("nbars") === 20)
      .withColumn("mad", madOf(col("frame"), col("ma")))
      .select(col("symbol"), col("bucket_ts"),
        round((col("tp") - col("ma")) /
          nullif(lit(0.015) * col("mad"), lit(0.0)), 6).as("cci"))

  /** I13 — rolling VWAP + σ bands (batch/vwap.py:10-53; 30-bar window at
    * testdata depth, 300 at reference depth — same expression).
    */
  private val vwap: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("tp", (col("high") + col("low") + col("close")) / 3)
      .withColumn("vwap",
        rollingSum(col("tp") * col("volume"), 30) /
          nullif(rollingSum(col("volume"), 30), lit(0.0)))
      .withColumn("frame", collect_list(col("close")).over(lastN(30)))
      .withColumn("cm", meanOf(col("frame")))
      .withColumn("sd", stdOf(col("frame"), col("cm"), 0))
      .withColumn("nbars", barsIn(30))
      .filter(col("nbars") === 30)
      .select(col("symbol"), col("bucket_ts"),
        round(col("vwap"), 6).as("vwap"),
        round(col("vwap") + col("sd"), 6).as("upper"),
        round(col("vwap") - col("sd"), 6).as("lower"),
        round((col("close") - col("vwap")) /
          nullif(col("vwap"), lit(0.0)) * 100, 6).as("deviation_pct"))

  /** I12 — volume ratio vs MA20 + bucket label (batch/volume_ratio.py:8-37). */
  private val volumeRatio: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("vma", rollingAvg(col("volume"), 20))
      .withColumn("nbars", barsIn(20))
      .filter(col("nbars") === 20)
      .withColumn("ratio", col("volume") / nullif(col("vma"), lit(0.0)))
      .select(col("symbol"), col("bucket_ts"),
        round(col("ratio"), 6).as("ratio"),
        when(col("ratio") >= 3.0, "surge")
          .when(col("ratio") >= 2.0, "strong")
          .when(col("ratio") >= 1.5, "mild")
          .when(col("ratio") >= 0.8, "normal")
          .otherwise("shrink").as("label"))

  /** I5 — OBV + 30-bar change (incremental/obv.py:8-22): signed cumulative
    * volume. The cumulative frame is a streaming window — no O(n²).
    */
  private val obv: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("dir",
        coalesce(signum(col("close") - lag1(col("close"))), lit(0.0)))
      .withColumn("obv", cumsum(col("dir") * col("volume")))
      .withColumn("obv30", lagN(col("obv"), 30))
      .select(col("symbol"), col("bucket_ts"),
        round(col("obv"), 6).as("obv"),
        round((col("obv") - col("obv30")) /
          nullif(abs(col("obv30")), lit(0.0)) * 100, 6).as("change_30"))

  /** I6 — cumulative volume delta (incremental/cvd.py:7-24):
    * delta = buy − sell = 2·taker_buy − volume.
    */
  private val cvd: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("cvd", cumsum(lit(2.0) * col("taker_buy_volume") - col("volume")))
      .withColumn("prev", lagN(col("cvd"), 30))
      .select(col("symbol"), col("bucket_ts"),
        round(col("cvd"), 6).as("cvd"),
        round(col("cvd") - col("prev"), 6).as("change_30"))

  /** I11 — MFI(14) (batch/mfi.py:8-26): conditional rolling money-flow sums. */
  private val mfi: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("tp", (col("high") + col("low") + col("close")) / 3)
      .withColumn("dtp", col("tp") - lag1(col("tp")))
      .withColumn("pos",
        rollingSum(when(col("dtp") > 0, col("tp") * col("volume")).otherwise(lit(0.0)), 14))
      .withColumn("neg",
        rollingSum(when(col("dtp") < 0, col("tp") * col("volume")).otherwise(lit(0.0)), 14))
      .withColumn("rn", row_number().over(bySymbol))
      .filter(col("rn") >= 15)
      .select(col("symbol"), col("bucket_ts"),
        round(lit(100.0) * col("pos") /
          nullif(col("pos") + col("neg"), lit(0.0)), 6).as("mfi"))

  /** I14 — 20-bar support/resistance distances
    * (batch/support_resistance.py:7-33).
    */
  private val supportResistance: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("res", rollingMax(col("high"), 20))
      .withColumn("sup", rollingMin(col("low"), 20))
      .withColumn("nbars", barsIn(20))
      .filter(col("nbars") === 20)
      .select(col("symbol"), col("bucket_ts"),
        round(col("res"), 6).as("resistance"), round(col("sup"), 6).as("support"),
        round((col("res") - col("close")) / nullif(col("close"), lit(0.0)) * 100, 6)
          .as("dist_resistance_pct"),
        round((col("close") - col("sup")) / nullif(col("close"), lit(0.0)) * 100, 6)
          .as("dist_support_pct"))

  /** I1 — last-bar base-data snapshot (incremental/base_data.py:26-91):
    * latest bar per symbol with derived amplitude/change/taker fields; the
    * previous close arrives via lag before the latest-per-key filter.
    */
  private val baseData: Q = (s, dir) => {
    val wDesc = Window.partitionBy("symbol").orderBy(col("bucket_ts").desc)
    candles(s, dir)
      .withColumn("prev_close", lag1(col("close")))
      .withColumn("rnd", row_number().over(wDesc))
      .filter(col("rnd") === 1)
      .select(col("symbol"), col("bucket_ts"),
        round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
        round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
        round(col("volume"), 6).as("volume"),
        round(col("quote_volume"), 6).as("quote_volume"),
        col("trade_count"),
        round((col("high") - col("low")) / nullif(col("close"), lit(0.0)) * 100, 6)
          .as("amplitude_pct"),
        round((col("close") - col("prev_close")) /
          nullif(col("prev_close"), lit(0.0)) * 100, 6).as("change_pct"),
        round(col("taker_buy_volume"), 6).as("taker_buy"),
        round(col("volume") - col("taker_buy_volume"), 6).as("taker_sell"),
        round(lit(2.0) * col("taker_buy_volume") - col("volume"), 6).as("net_flow"),
        round(col("quote_volume") /
          nullif(col("trade_count").cast("double"), lit(0.0)), 6).as("avg_per_trade"))
  }

  /** Pivot-point summary (§2.3 centered-window extrema; trend_line.py /
    * tv_rsi.py swing detection): counts and latest pivot levels per symbol.
    */
  private val pivots: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("win_hi", max(col("high")).over(centered(5)))
      .withColumn("win_lo", min(col("low")).over(centered(5)))
      .withColumn("nbars", count(lit(1)).over(centered(5)))
      .filter(col("nbars") === 11)
      .withColumn("is_ph", (col("high") === col("win_hi")).cast("int"))
      .withColumn("is_pl", (col("low") === col("win_lo")).cast("int"))
      .groupBy(col("symbol"))
      .agg(
        sum(col("is_ph")).as("n_pivot_high"),
        sum(col("is_pl")).as("n_pivot_low"),
        round(max_by(when(col("is_ph") === 1, col("high")),
          when(col("is_ph") === 1, col("bucket_ts"))), 6).as("last_pivot_high"),
        round(max_by(when(col("is_pl") === 1, col("low")),
          when(col("is_pl") === 1, col("bucket_ts"))), 6).as("last_pivot_low"))

  /** Tail streak (§2.3; futures_aggregate.py OI/taker streaks): length and
    * direction of the trailing same-sign close-to-close run, via
    * sign-change group ids — no per-row loop.
    */
  private val tailStreak: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("s", signum(col("close") - lag1(col("close"))))
      .withColumn("chg",
        when(lag1(col("s")).isNull || col("s") =!= lag1(col("s")), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("chg")).over(cumulative))
      .groupBy(col("symbol"))
      .agg(
        max_by(col("s"), col("bucket_ts")).as("direction"),
        max_by(col("grp"), col("bucket_ts")).as("last_grp"),
        count(lit(1)).as("bars"))
      .join(
        candles(s, dir)
          .withColumn("s", signum(col("close") - lag1(col("close"))))
          .withColumn("chg",
            when(lag1(col("s")).isNull || col("s") =!= lag1(col("s")), 1)
              .otherwise(0))
          .withColumn("grp", sum(col("chg")).over(cumulative))
          .groupBy(col("symbol"), col("grp")).agg(count(lit(1)).as("run_len")),
        Seq("symbol"))
      .filter(col("grp") === col("last_grp"))
      .select(col("symbol"), col("direction"), col("run_len").as("streak"))

  val queries: Map[String, Q] = Map(
    "i10_bollinger" -> bollinger,
    "i32_williams_r" -> williamsR,
    "i33_donchian" -> donchian,
    "i31_cci" -> cci,
    "i13_vwap" -> vwap,
    "i12_volume_ratio" -> volumeRatio,
    "i05_obv" -> obv,
    "i06_cvd" -> cvd,
    "i11_mfi" -> mfi,
    "i14_support_resistance" -> supportResistance,
    "i01_base_data" -> baseData,
    "i19_pivot_points" -> pivots,
    "i34_tail_streak" -> tailStreak)

  private val W = "PARTITION BY symbol ORDER BY bucket_ts"
  private def f(n: Int) = s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"

  val oracle: Map[String, String] = Map(
    "i10_bollinger" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts,
         |  floor(mid * 1e6 + 0.5) / 1e6 AS mid,
         |  floor((mid + 2.0 * sd) * 1e6 + 0.5) / 1e6 AS upper,
         |  floor((mid - 2.0 * sd) * 1e6 + 0.5) / 1e6 AS lower,
         |  floor((4.0 * sd / nullif(mid, 0.0)) * 1e6 + 0.5) / 1e6 AS bandwidth,
         |  floor(((close - (mid - 2.0 * sd)) / nullif(4.0 * sd, 0.0)) * 1e6 + 0.5) / 1e6 AS pct_b,
         |  floor(((mid - mid10) / 10) * 1e6 + 0.5) / 1e6 AS mid_slope
         |FROM (
         |  SELECT symbol, bucket_ts, close, mid, nbars,
         |         sqrt(list_reduce(list_prepend(0.0, list_transform(frame, x -> (x - mid) * (x - mid))),
         |                          (a, x) -> a + x) / (len(frame) - 1)) AS sd,
         |         lag(mid, 10) OVER ($W) AS mid10
         |  FROM (
         |    SELECT symbol, bucket_ts, close, frame, nbars,
         |           list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame) AS mid
         |    FROM (
         |      SELECT symbol, bucket_ts, close,
         |             list(close) OVER ($W ${f(20)}) AS frame,
         |             count(*) OVER ($W ${f(20)}) AS nbars
         |      FROM candles)))
         |WHERE nbars = 20 AND mid10 IS NOT NULL""".stripMargin),
    "i32_williams_r" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts,
         |  floor((-100.0 * (hh - close) / nullif(hh - ll, 0.0)) * 1000000.0 + 0.5) / 1000000.0 AS williams_r
         |FROM (
         |  SELECT symbol, bucket_ts, close,
         |         max(high) OVER ($W ${f(14)}) AS hh,
         |         min(low) OVER ($W ${f(14)}) AS ll,
         |         count(*) OVER ($W ${f(14)}) AS nbars
         |  FROM candles)
         |WHERE nbars = 14""".stripMargin),
    "i33_donchian" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(up, 6) AS upper, round(lo, 6) AS lower,
         |  round((up + lo) / 2, 6) AS mid,
         |  round((close - lo) / nullif(up - lo, 0.0), 6) AS position
         |FROM (
         |  SELECT symbol, bucket_ts, close,
         |         max(high) OVER ($W ${f(20)}) AS up,
         |         min(low) OVER ($W ${f(20)}) AS lo,
         |         count(*) OVER ($W ${f(20)}) AS nbars
         |  FROM candles)
         |WHERE nbars = 20""".stripMargin),
    "i31_cci" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts,
         |  round((tp - ma) / nullif(0.015 * mad, 0.0), 6) AS cci
         |FROM (
         |  SELECT symbol, bucket_ts, tp, ma, nbars,
         |         list_reduce(list_prepend(0.0, list_transform(frame, x -> abs(x - ma))),
         |                     (a, x) -> a + x) / len(frame) AS mad
         |  FROM (
         |    SELECT symbol, bucket_ts, tp, frame, nbars,
         |           list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame) AS ma
         |    FROM (
         |      SELECT symbol, bucket_ts, tp,
         |             list(tp) OVER ($W ${f(20)}) AS frame,
         |             count(*) OVER ($W ${f(20)}) AS nbars
         |      FROM (SELECT symbol, bucket_ts, (high + low + close) / 3 AS tp
         |            FROM candles))))
         |WHERE nbars = 20""".stripMargin),
    "i13_vwap" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(vwap, 6) AS vwap,
         |  round(vwap + sd, 6) AS upper, round(vwap - sd, 6) AS lower,
         |  round((close - vwap) / nullif(vwap, 0.0) * 100, 6) AS deviation_pct
         |FROM (
         |  SELECT symbol, bucket_ts, close, vwap, nbars,
         |         sqrt(list_reduce(list_prepend(0.0, list_transform(frame, x -> (x - cm) * (x - cm))),
         |                          (a, x) -> a + x) / len(frame)) AS sd
         |  FROM (
         |    SELECT symbol, bucket_ts, close, vwap, nbars, frame,
         |           list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame) AS cm
         |    FROM (
         |      SELECT symbol, bucket_ts, close,
         |             sum(tp * volume) OVER ($W ${f(30)}) /
         |               nullif(sum(volume) OVER ($W ${f(30)}), 0.0) AS vwap,
         |             list(close) OVER ($W ${f(30)}) AS frame,
         |             count(*) OVER ($W ${f(30)}) AS nbars
         |      FROM (SELECT symbol, bucket_ts, close, volume,
         |              (high + low + close) / 3 AS tp FROM candles))))
         |WHERE nbars = 30""".stripMargin),
    "i12_volume_ratio" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(ratio, 6) AS ratio,
         |  CASE WHEN ratio >= 3.0 THEN 'surge' WHEN ratio >= 2.0 THEN 'strong'
         |       WHEN ratio >= 1.5 THEN 'mild' WHEN ratio >= 0.8 THEN 'normal'
         |       ELSE 'shrink' END AS label
         |FROM (
         |  SELECT symbol, bucket_ts,
         |         volume / nullif(avg(volume) OVER ($W ${f(20)}), 0.0) AS ratio,
         |         count(*) OVER ($W ${f(20)}) AS nbars
         |  FROM candles)
         |WHERE nbars = 20""".stripMargin),
    "i05_obv" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(obv, 6) AS obv,
         |  round((obv - obv30) / nullif(abs(obv30), 0.0) * 100, 6) AS change_30
         |FROM (
         |  SELECT symbol, bucket_ts, obv, lag(obv, 30) OVER ($W) AS obv30
         |  FROM (
         |    SELECT symbol, bucket_ts,
         |           sum(dir * volume) OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obv
         |    FROM (
         |      SELECT symbol, bucket_ts, volume,
         |             coalesce(CAST(sign(close - lag(close) OVER ($W)) AS DOUBLE), 0.0) AS dir
         |      FROM candles)))""".stripMargin),
    "i06_cvd" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(cvd, 6) AS cvd,
         |  round(cvd - prev, 6) AS change_30
         |FROM (
         |  SELECT symbol, bucket_ts, cvd, lag(cvd, 30) OVER ($W) AS prev
         |  FROM (
         |    SELECT symbol, bucket_ts,
         |           sum(2.0 * taker_buy_volume - volume)
         |             OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cvd
         |    FROM candles))""".stripMargin),
    "i11_mfi" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts,
         |  round(100.0 * pos / nullif(pos + neg, 0.0), 6) AS mfi
         |FROM (
         |  SELECT symbol, bucket_ts,
         |         sum(CASE WHEN dtp > 0 THEN mf ELSE 0.0 END) OVER ($W ${f(14)}) AS pos,
         |         sum(CASE WHEN dtp < 0 THEN mf ELSE 0.0 END) OVER ($W ${f(14)}) AS neg,
         |         row_number() OVER ($W) AS rn
         |  FROM (
         |    SELECT symbol, bucket_ts, tp * volume AS mf,
         |           tp - lag(tp) OVER ($W) AS dtp
         |    FROM (SELECT symbol, bucket_ts, volume,
         |            (high + low + close) / 3 AS tp FROM candles)))
         |WHERE rn >= 15""".stripMargin),
    "i14_support_resistance" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(res, 6) AS resistance, round(sup, 6) AS support,
         |  round((res - close) / nullif(close, 0.0) * 100, 6) AS dist_resistance_pct,
         |  round((close - sup) / nullif(close, 0.0) * 100, 6) AS dist_support_pct
         |FROM (
         |  SELECT symbol, bucket_ts, close,
         |         max(high) OVER ($W ${f(20)}) AS res,
         |         min(low) OVER ($W ${f(20)}) AS sup,
         |         count(*) OVER ($W ${f(20)}) AS nbars
         |  FROM candles)
         |WHERE nbars = 20""".stripMargin),
    "i01_base_data" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(open, 6) AS open, round(high, 6) AS high,
         |  round(low, 6) AS low, round(close, 6) AS close,
         |  round(volume, 6) AS volume, round(quote_volume, 6) AS quote_volume,
         |  trade_count,
         |  round((high - low) / nullif(close, 0.0) * 100, 6) AS amplitude_pct,
         |  round((close - prev_close) / nullif(prev_close, 0.0) * 100, 6) AS change_pct,
         |  round(taker_buy_volume, 6) AS taker_buy,
         |  round(volume - taker_buy_volume, 6) AS taker_sell,
         |  round(2.0 * taker_buy_volume - volume, 6) AS net_flow,
         |  round(quote_volume / nullif(CAST(trade_count AS DOUBLE), 0.0), 6) AS avg_per_trade
         |FROM (
         |  SELECT *, lag(close) OVER ($W) AS prev_close,
         |         row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts DESC) AS rnd
         |  FROM candles)
         |WHERE rnd = 1""".stripMargin),
    "i19_pivot_points" -> Oracle.withCandles(
      s"""SELECT symbol,
         |  CAST(sum(is_ph) AS BIGINT) AS n_pivot_high,
         |  CAST(sum(is_pl) AS BIGINT) AS n_pivot_low,
         |  round(max_by(CASE WHEN is_ph = 1 THEN high END,
         |               CASE WHEN is_ph = 1 THEN bucket_ts END), 6) AS last_pivot_high,
         |  round(max_by(CASE WHEN is_pl = 1 THEN low END,
         |               CASE WHEN is_pl = 1 THEN bucket_ts END), 6) AS last_pivot_low
         |FROM (
         |  SELECT symbol, bucket_ts, high, low,
         |         CAST(high = max(high) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS INT) AS is_ph,
         |         CAST(low = min(low) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS INT) AS is_pl,
         |         count(*) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS nbars
         |  FROM candles)
         |WHERE nbars = 11
         |GROUP BY symbol""".stripMargin),
    "i34_tail_streak" -> Oracle.withCandles(
      s""", signed AS (
         |  SELECT symbol, bucket_ts,
         |         CAST(sign(close - lag(close) OVER ($W)) AS DOUBLE) AS s
         |  FROM candles),
         |grouped AS (
         |  SELECT symbol, bucket_ts, s,
         |         sum(CASE WHEN prev_s IS NULL OR s != prev_s THEN 1 ELSE 0 END)
         |           OVER ($W ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM (SELECT *, lag(s) OVER ($W) AS prev_s FROM signed)),
         |lastg AS (
         |  SELECT symbol, max_by(s, bucket_ts) AS direction,
         |         max_by(grp, bucket_ts) AS last_grp
         |  FROM grouped GROUP BY symbol),
         |runs AS (
         |  SELECT symbol, grp, count(*) AS run_len FROM grouped GROUP BY 1, 2)
         |SELECT l.symbol, l.direction, r.run_len AS streak
         |FROM lastg l JOIN runs r ON l.symbol = r.symbol AND l.last_grp = r.grp""".stripMargin))
}
