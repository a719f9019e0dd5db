package graft.signals

import graft.Tables
import graft.functions.EwmaWindow.ewma
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-bar mart SERIES — the batch replay of the reference's indicator
  * mart tables (trading-service scanners, indicators/base.py:64-75).
  *
  * The reference engine polls each mart's latest snapshot row per symbol
  * and compares it with the previously seen one
  * (signal-service/src/engines/sqlite_engine.py:218-244). The batch twin
  * materializes the WHOLE snapshot history — one row per (symbol, bar) as
  * if the scanner had run at every bar — so the rule corpus
  * ([[RuleCorpus]]) evaluates each rule over consecutive pairs in ONE
  * symbol-partitioned window pass per table.
  *
  * Field names are ASCII inside the engine (shared-dialect SQL — see
  * [[RuleCorpus]]); [[MartDef.fields]] carries the reference's Chinese
  * column name for each, and [[RuleCorpus.martTable]] republishes any
  * series under the verbatim reference contract via
  * [[graft.operators.Mart.asMartRow]].
  *
  * Every series carries `turnover` (the bar's quote turnover, the 成交额
  * scanners like incremental/kdj.py:48 and batch/bollinger.py:46 write).
  * Scanners that omit the column are given it anyway: the engine's
  * min-volume gate (sqlite_engine.py:232-245) reads 成交额 from the
  * current row and treats a missing column as 0, which under the default
  * min_volume=100000 silences every rule on those tables — a reference
  * quirk that would make most of the corpus dead code. The rebuild gates
  * every table on the shared candle fact's turnover instead (the gate's
  * evident intent); the quirk is documented here rather than reproduced.
  *
  * Numeric fields are quantized to the 6-dp grid (`floor(x·1e6+0.5)/1e6`)
  * in BOTH engines before any rule or derived state reads them, so
  * threshold comparisons flip together across the oracle boundary
  * (the repo-wide dyadic-rounding practice). Warm-up: each table gates on
  * its reference scanner's min-data where stated, else the engine-wide
  * 35-bar guard the indicator packs use.
  *
  * 100 TB shape: every builder is symbol-partitioned window math (one
  * exchange+sort per table serves all fields and the rule corpus's lag
  * pass reuses the same ordering); the per-symbol state never leaves the
  * executor. Rule count multiplies per-row expression work, not shuffles.
  */
object MartSeries {

  /** One mart table: ascii key, reference table name, (ascii → Chinese)
    * field map (excluding symbol/bucket_ts/turnover), the Spark builder
    * (emits `symbol, bucket_ts, turnover, <ascii fields>`), and the
    * DuckDB CTE body (named `m_<key>`, same columns). `needsSeries` pulls
    * the shared per-symbol list CTEs into the oracle prelude (EWMA-chain
    * tables); `needsMetrics` pulls the metrics fact.
    */
  final case class MartDef(
    key: String,
    table: String,
    fields: Seq[(String, String)],
    buildFrom: (SparkSession, String, DataFrame) => DataFrame,
    sqlCte: String,
    needsSeries: Boolean = false,
    needsMetrics: Boolean = false,
    needsRecursive: Boolean = false) {
    /** Build over the native 1m candle fact. The `cframe` indirection is
      * the timeframe dimension: pass any interval's roll-up
      * ([[graft.operators.Rollup.rollup]]) and the series replays the
      * scanner at that cadence — the engine's per-timeframe polls
      * (sqlite_engine.py:224-231).
      */
    def build(s: SparkSession, dir: String): DataFrame =
      buildFrom(s, dir, Tables.candles(s, dir))
  }

  // ------------------------------------------------------------ helpers

  private[signals] val bySym = Window.partitionBy("symbol").orderBy("bucket_ts")
  private[signals] val run =
    bySym.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  private def lastN(n: Int) = bySym.rowsBetween(-(n - 1), 0)

  /** 6-dp grid quantize — identical IEEE sequence in both engines. */
  private[signals] def q6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  private[signals] def q6s(e: String): String =
    s"floor(($e) * 1e6 + 0.5) / 1e6"


  // DuckDB prefix-fold helpers (the Ewma-pack oracle idiom:
  // indicators/Ewma.scala — list_reduce folds in graft.Series.ewma's op
  // order, per-index series via generate_series).
  // ONE repo-wide spelling of the EWMA fold (graft.Oracle.red) — a local
  // copy could silently drift from the Series.ewma bit-exactness contract
  private[signals] def red(l: String, alpha: String): String =
    graft.Oracle.red(l, alpha)
  private[signals] def redSeries(l: String, alpha: String): String =
    graft.Oracle.redSeries(l, alpha)
  /** Skip-null EWMA series (pandas ewm skip-NaN; [[graft.functions.Ewma]]
    * carries state through nulls): fold the null-filtered prefix.
    */
  private[signals] def redSeriesSkipNull(l: String, alpha: String): String =
    s"""list_transform(generate_series(1, len($l)),
       |      i -> CASE WHEN len(list_filter(($l)[1:i], x -> x IS NOT NULL)) = 0 THEN NULL
       |                ELSE ${red(s"list_filter(($l)[1:i], x -> x IS NOT NULL)", alpha)} END)""".stripMargin

  /** Shared oracle prelude for EWMA-chain tables: per-symbol ordered lists
    * of every candle column. Kept to ONE row per symbol so O(n²) prefix
    * folds happen once per symbol, not once per bar.
    */
  private[signals] val SeriesCte: String =
    """series AS (
      |  SELECT symbol,
      |         list(bucket_ts ORDER BY bucket_ts) AS ts,
      |         list(open ORDER BY bucket_ts) AS op,
      |         list(high ORDER BY bucket_ts) AS hi,
      |         list(low ORDER BY bucket_ts) AS lo,
      |         list(close ORDER BY bucket_ts) AS cl,
      |         list(volume ORDER BY bucket_ts) AS vol,
      |         list(quote_volume ORDER BY bucket_ts) AS qv,
      |         list(taker_buy_volume ORDER BY bucket_ts) AS tb,
      |         CAST(count(*) AS INT) AS n
      |  FROM candles GROUP BY symbol)""".stripMargin

  private val W = "PARTITION BY symbol ORDER BY bucket_ts"
  private def fr(n: Int) = s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"

  // ======================================================== volume pack

  /** MACD柱状扫描器 (incremental/macd.py:6-48): DIF = EMA12−EMA26,
    * DEA = EMA(DIF, 9), hist = 2(DIF−DEA); warm-up 35 bars (macd.py:36).
    */
  private val macd = MartDef(
    key = "macd", table = "MACD柱状扫描器",
    fields = Seq("dif" -> "DIF", "dea" -> "DEA", "hist" -> "MACD柱状图"),
    buildFrom = (s, dir, cframe) => {
      val c = cframe
        .withColumn("dif",
          ewma(s, col("close"), 2.0 / 13.0).over(run) -
            ewma(s, col("close"), 2.0 / 27.0).over(run))
        .withColumn("rn", row_number().over(bySym))
      c.withColumn("dea", ewma(s, col("dif"), 2.0 / 10.0).over(run))
        .filter(col("rn") >= 35)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("dif")).as("dif"), q6(col("dea")).as("dea"),
          q6(lit(2.0) * (col("dif") - col("dea"))).as("hist"))
    },
    sqlCte =
      s"""m_macd AS (
         |  SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |    ${q6s("difs[i]")} AS dif, ${q6s("deas[i]")} AS dea,
         |    ${q6s("2.0 * (difs[i] - deas[i])")} AS hist
         |  FROM (
         |    SELECT symbol, ts, qv, n, difs, ${redSeries("difs", "2.0/10.0")} AS deas
         |    FROM (
         |      SELECT symbol, ts, qv, n,
         |        list_transform(generate_series(1, n), k ->
         |          ${red("cl[1:k]", "2.0/13.0")} - ${red("cl[1:k]", "2.0/27.0")}) AS difs
         |      FROM series)) s,
         |    LATERAL (SELECT unnest(generate_series(35, n)) AS i) u)""".stripMargin,
    needsSeries = true)

  /** OBV能量潮扫描器 (incremental/obv.py:8-22): signed cumulative volume;
    * 变化率 = (OBV − OBV₍₂₉ bars back₎) / max(|base|, 1e-9) — the scanner's
    * `iloc[-min(30, n-1)]` base is lag 29 past its 32-bar warm-up.
    */
  private val obv = MartDef(
    key = "obv", table = "OBV能量潮扫描器",
    fields = Seq("obv" -> "OBV值", "rate" -> "OBV变化率"),
    buildFrom = (s, dir, cframe) =>
      // one projection per dependency level (r14, guide §7.3)
      cframe
        .withColumn("d",
          coalesce(signum(col("close") - lag("close", 1).over(bySym)), lit(0.0)))
        .withColumn("obv", sum(col("d") * col("volume")).over(run))
        .select(col("*"),
          lag("obv", 29).over(bySym).as("base"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 32)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("obv")).as("obv"),
          q6((col("obv") - col("base")) /
            greatest(abs(col("base")), lit(1e-9))).as("rate")),
    sqlCte =
      s"""m_obv AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("obv")} AS obv,
         |    ${q6s("(obv - base) / greatest(abs(base), 1e-9)")} AS rate
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, obv,
         |           lag(obv, 29) OVER ($W) AS base,
         |           row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume,
         |             sum(d * volume) OVER ($W ROWS UNBOUNDED PRECEDING) AS obv
         |      FROM (
         |        SELECT symbol, bucket_ts, quote_volume, volume,
         |               coalesce(sign(close - lag(close) OVER ($W)), 0.0) AS d
         |        FROM candles)))
         |  WHERE rn >= 32)""".stripMargin)

  /** CVD信号排行榜 (incremental/cvd.py:7-24): cumulative 2·taker_buy −
    * volume; 变化率 vs bar-2 base below 361 bars, lag-359 beyond
    * (`iloc[-min(360, n-1)]`), denominator |base| + 1e-9.
    */
  private val cvd = MartDef(
    key = "cvd", table = "CVD信号排行榜",
    fields = Seq("cvd" -> "CVD值", "rate" -> "变化率"),
    buildFrom = (s, dir, cframe) =>
      // one projection per dependency level (r14, guide §7.3)
      cframe
        .select(col("*"),
          sum(lit(2.0) * col("taker_buy_volume") - col("volume")).over(run)
            .as("cvd"),
          row_number().over(bySym).as("rn"))
        .withColumn("bar2",
          max(when(col("rn") === 2, col("cvd"))).over(
            Window.partitionBy("symbol")))
        .withColumn("base",
          when(col("rn") <= 361, col("bar2"))
            .otherwise(lag("cvd", 359).over(bySym)))
        .filter(col("rn") >= 2)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("cvd")).as("cvd"),
          q6((col("cvd") - col("base")) /
            (abs(col("base")) + lit(1e-9))).as("rate")),
    sqlCte =
      s"""m_cvd AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("cvd")} AS cvd,
         |    ${q6s("(cvd - CASE WHEN rn <= 361 THEN bar2 ELSE lag359 END) / " +
                    "(abs(CASE WHEN rn <= 361 THEN bar2 ELSE lag359 END) + 1e-9)")} AS rate
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, cvd, rn,
         |           max(CASE WHEN rn = 2 THEN cvd END)
         |             OVER (PARTITION BY symbol) AS bar2,
         |           lag(cvd, 359) OVER ($W) AS lag359
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume,
         |             sum(2.0 * taker_buy_volume - volume)
         |               OVER ($W ROWS UNBOUNDED PRECEDING) AS cvd,
         |             row_number() OVER ($W) AS rn
         |      FROM candles))
         |  WHERE rn >= 2)""".stripMargin)

  /** 成交量比率扫描器 (batch/volume_ratio.py:8-37): volume / MA20(volume),
    * 4-dp as the scanner rounds; warm-up min_data 25.
    */
  private val volratio = MartDef(
    key = "volratio", table = "成交量比率扫描器",
    fields = Seq("vr" -> "量比"),
    buildFrom = (s, dir, cframe) =>
      cframe
        .withColumn("vma", avg(col("volume")).over(lastN(20)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 25)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          (floor(col("volume") / nullif(col("vma"), lit(0.0)) * 1e4 + 0.5) / 1e4)
            .as("vr")),
    sqlCte =
      s"""m_volratio AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    floor(volume / nullif(vma, 0.0) * 1e4 + 0.5) / 1e4 AS vr
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, volume,
         |           avg(volume) OVER ($W ${fr(20)}) AS vma,
         |           row_number() OVER ($W) AS rn
         |    FROM candles)
         |  WHERE rn >= 25)""".stripMargin)

  /** 主动买卖比扫描器 (incremental/buy_sell_ratio.py:7-31): taker-buy
    * volume share of the bar (0..1 — NOT buy/sell); zero-volume bars are
    * skipped like the scanner's early return, so the rule lag steps over
    * them exactly as the poll baseline would.
    */
  private val taker = MartDef(
    key = "taker", table = "主动买卖比扫描器",
    fields = Seq("bsr" -> "主动买卖比"),
    buildFrom = (s, dir, cframe) =>
      cframe
        .filter(col("volume") > 0.0)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("taker_buy_volume") / col("volume")).as("bsr")),
    sqlCte =
      s"""m_taker AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("taker_buy_volume / volume")} AS bsr
         |  FROM candles WHERE volume > 0.0)""".stripMargin)

  // ================================================== misc / base pack

  /** 基础数据同步器 (incremental/base_data.py:26-91): row-local derived
    * bar fields. 振幅/变化率 are the scanner's FRACTIONS ((h−l)/l,
    * (c−o)/o — not ×100); 主动买卖比 is the 0..1 taker-buy share;
    * 资金流向 = taker quote − max(quote − taker quote, 0) with the
    * taker quote derived as tb·close (base_data.py:50-66 derive path).
    */
  private val base = MartDef(
    key = "base", table = "基础数据同步器",
    fields = Seq("amp" -> "振幅", "chg" -> "变化率",
      "bsr" -> "主动买卖比", "flow" -> "资金流向"),
    buildFrom = (s, dir, cframe) =>
      cframe
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(when(col("low") =!= 0.0,
            (col("high") - col("low")) / col("low")).otherwise(0.0)).as("amp"),
          q6(when(col("open") =!= 0.0,
            (col("close") - col("open")) / col("open")).otherwise(0.0)).as("chg"),
          q6(when(col("volume") =!= 0.0,
            col("taker_buy_volume") / col("volume")).otherwise(0.0)).as("bsr"),
          q6(col("taker_buy_volume") * col("close") -
            greatest(col("quote_volume") -
              col("taker_buy_volume") * col("close"), lit(0.0))).as("flow")),
    sqlCte =
      s"""m_base AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("CASE WHEN low != 0.0 THEN (high - low) / low ELSE 0.0 END")} AS amp,
         |    ${q6s("CASE WHEN open != 0.0 THEN (close - open) / open ELSE 0.0 END")} AS chg,
         |    ${q6s("CASE WHEN volume != 0.0 THEN taker_buy_volume / volume ELSE 0.0 END")} AS bsr,
         |    ${q6s("taker_buy_volume * close - greatest(quote_volume - taker_buy_volume * close, 0.0)")} AS flow
         |  FROM candles)""".stripMargin)

  /** 流动性扫描器 (batch/liquidity.py:96-150) — the per-bar restatement
    * keeps the two WINDOW components (volatility exp-score over 60-bar
    * log-return std, volume exp-score vs 60-bar mean) renormalized to
    * their weight share; the Amihud/Kyle z-scored regression components
    * are full-history-global in the reference and are omitted from the
    * per-bar series (documented simplification). Level vocabulary is the
    * scanner's 优秀/良好/一般/紧张/危险 (liquidity.py:41) — the corpus's
    * liquidity rules expect 差/较差 and are faithfully dead, so these
    * values gate nothing; they exist for the mart contract.
    */
  private val liquidity = MartDef(
    key = "liq", table = "流动性扫描器",
    fields = Seq("liq_score" -> "流动性得分", "liq_level" -> "流动性等级"),
    buildFrom = (s, dir, cframe) => {
      // guard non-positive arguments explicitly: Spark log(<=0) is NULL
      // but DuckDB ln(0) ERRORS — and zero closes exist at sf0.1 (the
      // round-3 zero-divisor lesson)
      val pc = lag("close", 1).over(bySym)
      val lr = when(col("close") > 0.0 && pc > 0.0, log(col("close") / pc))
      // collect_list skips the first-bar null return, so the frame can be
      // EMPTY/short before the warm-up filter prunes the row — guard the
      // fold denominators (the window computes for every row regardless
      // of the later rn filter).
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe
        .withColumn("lr", lr)
        .select(col("*"),
          collect_list(col("lr")).over(lastN(60)).as("frame"),
          avg(col("volume")).over(lastN(60)).as("av"),
          row_number().over(bySym).as("rn"))
        .withColumn("m",
          when(size(col("frame")) === 0, 0.0)
            .otherwise(graft.indicators.Windows.meanOf(col("frame"))))
        .withColumn("sd",
          when(size(col("frame")) < 2, lit(null).cast("double"))
            .otherwise(graft.indicators.Windows.stdOf(col("frame"), col("m"), 1)))
        .filter(col("rn") >= 60)
      val vc = least(greatest(lit(100.0) * exp(-col("sd") / lit(0.01)), lit(0.0)), lit(100.0))
      val uc = least(greatest(lit(100.0) *
        (lit(1.0) - exp(-col("volume") / nullif(col("av"), lit(0.0)))), lit(0.0)), lit(100.0))
      val score = q6((lit(0.20) * vc + lit(0.15) * uc) / lit(0.35))
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        score.as("liq_score"),
        when(score >= 80.0, "优秀").when(score >= 65.0, "良好")
          .when(score >= 50.0, "一般").when(score >= 30.0, "紧张")
          .otherwise("危险").as("liq_level"))
    },
    sqlCte = {
      val vc = "least(greatest(100.0 * exp(-sd / 0.01), 0.0), 100.0)"
      val uc = "least(greatest(100.0 * (1.0 - exp(-volume / nullif(av, 0.0))), 0.0), 100.0)"
      val score = q6s(s"(0.20 * $vc + 0.15 * $uc) / 0.35")
      s"""m_liq AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    $score AS liq_score,
         |    CASE WHEN $score >= 80.0 THEN '优秀' WHEN $score >= 65.0 THEN '良好'
         |         WHEN $score >= 50.0 THEN '一般' WHEN $score >= 30.0 THEN '紧张'
         |         ELSE '危险' END AS liq_level
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, volume,
         |      sqrt(list_reduce(list_prepend(0.0, list_transform(frame, x -> (x - m) * (x - m))),
         |             (a, x) -> a + x) / (len(frame) - 1)) AS sd,
         |      avg(volume) OVER ($W ${fr(60)}) AS av,
         |      row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume, volume, frame,
         |        CASE WHEN len(frame) = 0 THEN 0.0
         |             ELSE list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame)
         |        END AS m
         |      FROM (
         |        SELECT symbol, bucket_ts, quote_volume, volume,
         |          list_filter(list(lr) OVER ($W ${fr(60)}), x -> x IS NOT NULL) AS frame
         |        FROM (
         |          SELECT symbol, bucket_ts, quote_volume, volume,
         |            CASE WHEN close > 0.0 AND lag(close) OVER ($W) > 0.0
         |                 THEN ln(close / (lag(close) OVER ($W))) END AS lr
         |          FROM candles))))
         |  WHERE rn >= 60)""".stripMargin
    })

  /** 剥头皮信号扫描器 (batch/scalping.py:9-44): Wilder-RSI(14) over
    * zero-seeded gain/loss EWMAs (pandas `where` turns the first NaN
    * delta into 0 — scalping.py:17-19), EMA9/EMA21, five-state signal.
    * State derives from the quantized rsi/ema values so both engines
    * flip together.
    */
  private val scalping = MartDef(
    key = "scalp", table = "剥头皮信号扫描器",
    fields = Seq("scalp_sig" -> "剥头皮信号", "rsi" -> "RSI"),
    buildFrom = (s, dir, cframe) => {
      val d = col("close") - lag("close", 1).over(bySym)
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe.select(col("*"),
        when(d > 0.0, d).otherwise(0.0).as("g"),
        when(d < 0.0, -d).otherwise(0.0).as("l"))
      val c2 = c.select(col("*"),
          ewma(s, col("g"), 1.0 / 14.0).over(run).as("ag"),
          ewma(s, col("l"), 1.0 / 14.0).over(run).as("al"),
          ewma(s, col("close"), 2.0 / 10.0).over(run).as("e9"),
          ewma(s, col("close"), 2.0 / 22.0).over(run).as("e21"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 20)
      val rsi = q6(when(col("al") === 0.0, lit(null).cast("double"))
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("ag") / col("al"))))
      val p = q6(col("close")); val e9 = q6(col("e9")); val e21 = q6(col("e21"))
      c2.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(rsi < 30.0 && p > e9 && e9 > e21, "超卖反弹")
          .when(rsi > 70.0 && p < e9 && e9 < e21, "超买回落")
          .when(e9 > e21 && rsi > 50.0, "多头")
          .when(e9 < e21 && rsi < 50.0, "空头")
          .otherwise("观望").as("scalp_sig"),
        rsi.as("rsi"))
    },
    sqlCte = {
      val rsi = q6s("CASE WHEN als[i] = 0.0 THEN NULL " +
        "ELSE 100.0 - 100.0 / (1.0 + ags[i] / als[i]) END")
      val (p, e9, e21) = (q6s("cl[i]"), q6s("e9s[i]"), q6s("e21s[i]"))
      s"""m_scalp AS (
         |  SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |    CASE WHEN $rsi < 30.0 AND $p > $e9 AND $e9 > $e21 THEN '超卖反弹'
         |         WHEN $rsi > 70.0 AND $p < $e9 AND $e9 < $e21 THEN '超买回落'
         |         WHEN $e9 > $e21 AND $rsi > 50.0 THEN '多头'
         |         WHEN $e9 < $e21 AND $rsi < 50.0 THEN '空头'
         |         ELSE '观望' END AS scalp_sig,
         |    $rsi AS rsi
         |  FROM (
         |    SELECT symbol, ts, cl, qv, n,
         |      ${redSeries("gs", "1.0/14.0")} AS ags,
         |      ${redSeries("ls", "1.0/14.0")} AS als,
         |      ${redSeries("cl", "2.0/10.0")} AS e9s,
         |      ${redSeries("cl", "2.0/22.0")} AS e21s
         |    FROM (
         |      SELECT symbol, ts, cl, qv, n,
         |        list_transform(generate_series(1, n), k ->
         |          CASE WHEN k = 1 THEN 0.0 ELSE greatest(cl[k] - cl[k-1], 0.0) END) AS gs,
         |        list_transform(generate_series(1, n), k ->
         |          CASE WHEN k = 1 THEN 0.0 ELSE greatest(cl[k-1] - cl[k], 0.0) END) AS ls
         |      FROM series)) s,
         |    LATERAL (SELECT unnest(generate_series(20, n)) AS i) u)""".stripMargin
    },
    needsSeries = true)

  // ================================================== volatility pack

  /** 布林带扫描器 (batch/bollinger.py:12-47, safe_calc.safe_bollinger):
    * SMA20 ± 2·sample-std; 带宽 = (u−l)/m·100 (4 dp), 百分比b =
    * (close−l)/(u−l) (4 dp, 0 when the band is flat).
    */
  private val boll = MartDef(
    key = "boll", table = "布林带扫描器",
    fields = Seq("price" -> "价格", "bup" -> "上轨价格", "blo" -> "下轨价格",
      "bw" -> "带宽", "pctb" -> "百分比b"),
    buildFrom = (s, dir, cframe) => {
      import graft.indicators.Windows.{meanOf, stdOf}
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe
        .select(col("*"),
          collect_list(col("close")).over(lastN(20)).as("frame"),
          row_number().over(bySym).as("rn"))
        .withColumn("m", meanOf(col("frame")))
        .withColumn("sd", stdOf(col("frame"), col("m"), 1))
        .filter(col("rn") >= 20)
      val u = col("m") + lit(2.0) * col("sd"); val l = col("m") - lit(2.0) * col("sd")
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        q6(col("close")).as("price"), q6(u).as("bup"), q6(l).as("blo"),
        (floor((u - l) / nullif(col("m"), lit(0.0)) * 100 * 1e4 + 0.5) / 1e4).as("bw"),
        (floor(when(u === l, 0.0).otherwise((col("close") - l) / (u - l)) * 1e4 + 0.5) / 1e4)
          .as("pctb"))
    },
    sqlCte =
      s"""m_boll AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("close")} AS price, ${q6s("m + 2.0 * sd")} AS bup,
         |    ${q6s("m - 2.0 * sd")} AS blo,
         |    floor(((m + 2.0 * sd) - (m - 2.0 * sd)) / nullif(m, 0.0) * 100 * 1e4 + 0.5) / 1e4 AS bw,
         |    floor(CASE WHEN (m + 2.0 * sd) = (m - 2.0 * sd) THEN 0.0
         |               ELSE (close - (m - 2.0 * sd)) / ((m + 2.0 * sd) - (m - 2.0 * sd))
         |          END * 1e4 + 0.5) / 1e4 AS pctb
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, close, m,
         |      sqrt(list_reduce(list_prepend(0.0, list_transform(frame, x -> (x - m) * (x - m))),
         |             (a, x) -> a + x) / (len(frame) - 1)) AS sd,
         |      row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume, close, frame,
         |        list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame) AS m
         |      FROM (
         |        SELECT symbol, bucket_ts, quote_volume, close,
         |          list(close) OVER ($W ${fr(20)}) AS frame
         |        FROM candles)))
         |  WHERE rn >= 20)""".stripMargin)

  /** ATR波幅扫描器 (incremental/atr.py:7-49): Wilder ATR(14),
    * ATR百分比 = atr/close·100 (4 dp), 波动分类 vs the trailing-30 ATR
    * median — 升温 > med·1.1, 降温 < med·0.9, else 稳定 (atr.py:38;
    * the corpus's 低/高波动 rules never match this vocabulary — dead in
    * the reference too). Warm-up 60 bars (atr.py:23).
    */
  private val atr = MartDef(
    key = "atr", table = "ATR波幅扫描器",
    fields = Seq("cls" -> "波动分类", "atrp" -> "ATR百分比"),
    buildFrom = (s, dir, cframe) => {
      import graft.indicators.Windows.trueRange
      val c = cframe
        .withColumn("tr", trueRange(col("high"), col("low"), col("close")))
      // one projection per dependency level (r14, guide §7.3)
      val c2 = c.withColumn("atr", ewma(s, col("tr"), 1.0 / 14.0).over(run))
        .select(col("*"),
          sort_array(collect_list(col("atr")).over(lastN(30))).as("af"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 60)
      val med = (element_at(col("af"), 15) + element_at(col("af"), 16)) / 2.0
      val a = q6(col("atr")); val m = q6(med)
      c2.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(a > m * 1.1, "升温").when(a < m * 0.9, "降温")
          .otherwise("稳定").as("cls"),
        (floor(col("atr") / nullif(col("close"), lit(0.0)) * 100 * 1e4 + 0.5) / 1e4)
          .as("atrp"))
    },
    sqlCte = {
      val a = q6s("atrs[i]")
      val m = q6s("list_aggregate(atrs[greatest(1, i - 29):i], 'median')")
      s"""m_atr AS (
         |  SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |    CASE WHEN $a > $m * 1.1 THEN '升温'
         |         WHEN $a < $m * 0.9 THEN '降温' ELSE '稳定' END AS cls,
         |    floor(atrs[i] / nullif(cl[i], 0.0) * 100 * 1e4 + 0.5) / 1e4 AS atrp
         |  FROM (
         |    SELECT symbol, ts, cl, qv, n, ${redSeries("trs", "1.0/14.0")} AS atrs
         |    FROM (
         |      SELECT symbol, ts, cl, qv, n,
         |        list_transform(generate_series(1, n), k ->
         |          CASE WHEN k = 1 THEN hi[1] - lo[1]
         |               ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k-1]),
         |                             abs(lo[k] - cl[k-1])) END) AS trs
         |      FROM series)) s,
         |    LATERAL (SELECT unnest(generate_series(60, n)) AS i) u)""".stripMargin
    },
    needsSeries = true)

  /** Donchian.py (lean_indicators.py:188-203): 20-bar high/low channel.
    * 当前价格 is added to the series (the scanner omits it, which—with
    * the rules reading it—made the Donchian rules dead; see the
    * [[MartSeries]] missing-column policy).
    */
  private val donchian = MartDef(
    key = "donch", table = "Donchian",
    fields = Seq("price" -> "当前价格", "dup" -> "上轨", "dlo" -> "下轨"),
    buildFrom = (s, dir, cframe) =>
      cframe
        .withColumn("u", max(col("high")).over(lastN(20)))
        .withColumn("l", min(col("low")).over(lastN(20)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 20)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("close")).as("price"), q6(col("u")).as("dup"),
          q6(col("l")).as("dlo")),
    sqlCte =
      s"""m_donch AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("close")} AS price, ${q6s("u")} AS dup, ${q6s("l")} AS dlo
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, close,
         |      max(high) OVER ($W ${fr(20)}) AS u,
         |      min(low) OVER ($W ${fr(20)}) AS l,
         |      row_number() OVER ($W) AS rn
         |    FROM candles)
         |  WHERE rn >= 20)""".stripMargin)

  /** Keltner.py (lean_indicators.py:206-228): EMA20(close) ± 2·Wilder
    * ATR(10); 当前价格 added per the Donchian note.
    */
  private val keltner = MartDef(
    key = "kelt", table = "Keltner",
    fields = Seq("price" -> "当前价格", "kup" -> "上轨", "klo" -> "下轨"),
    buildFrom = (s, dir, cframe) => {
      import graft.indicators.Windows.trueRange
      val c = cframe
        .withColumn("tr", trueRange(col("high"), col("low"), col("close")))
      // one projection (r14, guide §7.3)
      c.select(col("*"),
          ewma(s, col("close"), 2.0 / 21.0).over(run).as("mid"),
          ewma(s, col("tr"), 1.0 / 10.0).over(run).as("a"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 20)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("close")).as("price"),
          q6(col("mid") + lit(2.0) * col("a")).as("kup"),
          q6(col("mid") - lit(2.0) * col("a")).as("klo"))
    },
    sqlCte =
      s"""m_kelt AS (
         |  SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |    ${q6s("cl[i]")} AS price,
         |    ${q6s("mids[i] + 2.0 * atrs[i]")} AS kup,
         |    ${q6s("mids[i] - 2.0 * atrs[i]")} AS klo
         |  FROM (
         |    SELECT symbol, ts, cl, qv, n,
         |      ${redSeries("cl", "2.0/21.0")} AS mids,
         |      ${redSeries("trs", "1.0/10.0")} AS atrs
         |    FROM (
         |      SELECT symbol, ts, cl, qv, n,
         |        list_transform(generate_series(1, n), k ->
         |          CASE WHEN k = 1 THEN hi[1] - lo[1]
         |               ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k-1]),
         |                             abs(lo[k] - cl[k-1])) END) AS trs
         |      FROM series)) s,
         |    LATERAL (SELECT unnest(generate_series(20, n)) AS i) u)""".stripMargin,
    needsSeries = true)

  /** 全量支撑阻力扫描器 (batch/support_resistance.py:7-33): 20-bar
    * low/high levels, distances as % of price (4 dp).
    */
  private val sr = MartDef(
    key = "sr", table = "全量支撑阻力扫描器",
    fields = Seq("sup" -> "支撑位", "res" -> "阻力位",
      "ds" -> "距支撑百分比", "dr" -> "距阻力百分比"),
    buildFrom = (s, dir, cframe) =>
      cframe
        .withColumn("sup0", min(col("low")).over(lastN(20)))
        .withColumn("res0", max(col("high")).over(lastN(20)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 20)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("sup0")).as("sup"), q6(col("res0")).as("res"),
          (floor(when(col("close") =!= 0.0,
            (col("close") - col("sup0")) / col("close") * 100).otherwise(0.0)
            * 1e4 + 0.5) / 1e4).as("ds"),
          (floor(when(col("close") =!= 0.0,
            (col("res0") - col("close")) / col("close") * 100).otherwise(0.0)
            * 1e4 + 0.5) / 1e4).as("dr")),
    sqlCte =
      s"""m_sr AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("sup0")} AS sup, ${q6s("res0")} AS res,
         |    floor(CASE WHEN close != 0.0 THEN (close - sup0) / close * 100 ELSE 0.0 END
         |          * 1e4 + 0.5) / 1e4 AS ds,
         |    floor(CASE WHEN close != 0.0 THEN (res0 - close) / close * 100 ELSE 0.0 END
         |          * 1e4 + 0.5) / 1e4 AS dr
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, close,
         |      min(low) OVER ($W ${fr(20)}) AS sup0,
         |      max(high) OVER ($W ${fr(20)}) AS res0,
         |      row_number() OVER ($W) AS rn
         |    FROM candles)
         |  WHERE rn >= 20)""".stripMargin)

  /** VWAP离线信号扫描 (batch/vwap.py:10-53): trailing-300-bar typical-
    * price VWAP (zero volumes floored at 1e-9), 偏离百分比 =
    * (close−vwap)/vwap·100 (4 dp); vwap falls back to close when
    * zero/undefined (vwap.py:27-29).
    */
  private val vwap = MartDef(
    key = "vwap", table = "VWAP离线信号扫描",
    fields = Seq("devp" -> "偏离百分比"),
    buildFrom = (s, dir, cframe) => {
      val vp = when(col("volume") === 0.0, 1e-9).otherwise(col("volume"))
      val tp = (col("high") + col("low") + col("close")) / 3
      val c = cframe
        .withColumn("vv", vp)
        .withColumn("vwap0",
          sum(tp * col("vv")).over(lastN(300)) /
            nullif(sum(col("vv")).over(lastN(300)), lit(0.0)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 10)
      val vw = when(col("vwap0").isNull || col("vwap0") === 0.0, col("close"))
        .otherwise(col("vwap0"))
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        (floor(when(vw === 0.0, 0.0)
          .otherwise((col("close") - vw) / vw * 100) * 1e4 + 0.5) / 1e4).as("devp"))
    },
    sqlCte =
      s"""m_vwap AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    floor(CASE WHEN vw = 0.0 THEN 0.0
         |               ELSE (close - vw) / vw * 100 END * 1e4 + 0.5) / 1e4 AS devp
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, close,
         |      CASE WHEN vwap0 IS NULL OR vwap0 = 0.0 THEN close ELSE vwap0 END AS vw, rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume, close,
         |        sum(tp * vv) OVER ($W ${fr(300)}) /
         |          nullif(sum(vv) OVER ($W ${fr(300)}), 0.0) AS vwap0,
         |        row_number() OVER ($W) AS rn
         |      FROM (
         |        SELECT symbol, bucket_ts, quote_volume, close,
         |          (high + low + close) / 3 AS tp,
         |          CASE WHEN volume = 0.0 THEN 1e-9 ELSE volume END AS vv
         |        FROM candles)))
         |  WHERE rn >= 10)""".stripMargin)

  // ==================================================== momentum pack

  /** CCI.py (lean_indicators.py:133-149): (tp − SMA20) / (0.015·MAD +
    * 1e-10) — the scanner's epsilon denominator, never zero.
    */
  private val cci = MartDef(
    key = "cci", table = "CCI",
    fields = Seq("cci" -> "CCI"),
    buildFrom = (s, dir, cframe) => {
      import graft.indicators.Windows.{madOf, meanOf}
      // one projection per dependency level (r14, guide §7.3)
      cframe
        .withColumn("tp", (col("high") + col("low") + col("close")) / 3)
        .select(col("*"),
          collect_list(col("tp")).over(lastN(20)).as("frame"),
          row_number().over(bySym).as("rn"))
        .withColumn("ma", meanOf(col("frame")))
        .withColumn("mad", madOf(col("frame"), col("ma")))
        .filter(col("rn") >= 20)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6((col("tp") - col("ma")) /
            (lit(0.015) * col("mad") + lit(1e-10))).as("cci"))
    },
    sqlCte =
      s"""m_cci AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("(tp - ma) / (0.015 * mad + 1e-10)")} AS cci
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, tp, ma,
         |      list_reduce(list_prepend(0.0, list_transform(frame, x -> abs(x - ma))),
         |        (a, x) -> a + x) / len(frame) AS mad,
         |      row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume, tp, frame,
         |        list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame) AS ma
         |      FROM (
         |        SELECT symbol, bucket_ts, quote_volume,
         |          (high + low + close) / 3 AS tp,
         |          list((high + low + close) / 3) OVER ($W ${fr(20)}) AS frame
         |        FROM candles)))
         |  WHERE rn >= 20)""".stripMargin)

  /** WilliamsR.py (lean_indicators.py:162-176): −100·(hh−close)/(hh−ll
    * + 1e-10) over 14 bars.
    */
  private val wr = MartDef(
    key = "wr", table = "WilliamsR",
    fields = Seq("wr" -> "WilliamsR"),
    buildFrom = (s, dir, cframe) =>
      cframe
        .withColumn("hh", max(col("high")).over(lastN(14)))
        .withColumn("ll", min(col("low")).over(lastN(14)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 14)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(lit(-100.0) * (col("hh") - col("close")) /
            (col("hh") - col("ll") + lit(1e-10))).as("wr")),
    sqlCte =
      s"""m_wr AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("-100.0 * (hh - close) / (hh - ll + 1e-10)")} AS wr
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, close,
         |      max(high) OVER ($W ${fr(14)}) AS hh,
         |      min(low) OVER ($W ${fr(14)}) AS ll,
         |      row_number() OVER ($W) AS rn
         |    FROM candles)
         |  WHERE rn >= 14)""".stripMargin)

  /** MFI资金流量扫描器 (batch/mfi.py:8-26): 14-bar signed money-flow
    * ratio, 2-dp like the mart; the flat-flow NULL (neg sum 0) is kept as
    * a NULL row like the scanner's insufficient write.
    */
  private val mfi = MartDef(
    key = "mfi", table = "MFI资金流量扫描器",
    fields = Seq("mfi" -> "MFI值"),
    buildFrom = (s, dir, cframe) => {
      val tp = (col("high") + col("low") + col("close")) / 3
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe
        .withColumn("tp", tp)
        .select(col("*"),
          (col("tp") * col("volume")).as("mf"),
          signum(col("tp") - lag("tp", 1).over(bySym)).as("d"))
        .select(col("*"),
          sum(when(col("d") > 0, col("mf")).otherwise(0.0)).over(lastN(14))
            .as("pos"),
          sum(when(col("d") < 0, col("mf")).otherwise(0.0)).over(lastN(14))
            .as("neg"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 15)
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        (floor((lit(100.0) - lit(100.0) /
          (lit(1.0) + col("pos") / nullif(col("neg"), lit(0.0)))) * 100 + 0.5) / 100)
          .as("mfi"))
    },
    sqlCte =
      s"""m_mfi AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    floor((100.0 - 100.0 / (1.0 + pos / nullif(neg, 0.0))) * 100 + 0.5) / 100 AS mfi
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume,
         |      sum(CASE WHEN d > 0 THEN mf ELSE 0.0 END) OVER ($W ${fr(14)}) AS pos,
         |      sum(CASE WHEN d < 0 THEN mf ELSE 0.0 END) OVER ($W ${fr(14)}) AS neg,
         |      row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume, tp * volume AS mf,
         |        sign(tp - lag(tp) OVER ($W)) AS d, bucket_ts AS bt2
         |      FROM (SELECT symbol, bucket_ts, quote_volume, volume,
         |              (high + low + close) / 3 AS tp FROM candles)))
         |  WHERE rn >= 15)""".stripMargin)

  /** ADX.py (lean_indicators.py:89-117): zero-seeded TR/±DM Wilder
    * smooths, DI → DX → Wilder ADX; warm-up 28 (= 2·period).
    */
  private val adx = MartDef(
    key = "adx", table = "ADX",
    fields = Seq("adx" -> "ADX"),
    buildFrom = (s, dir, cframe) => {
      val ph = lag("high", 1).over(bySym); val plo = lag("low", 1).over(bySym)
      val pc = lag("close", 1).over(bySym)
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe.select(col("*"),
        when(ph.isNull, 0.0).otherwise(
          greatest(col("high") - col("low"), abs(col("high") - pc),
            abs(col("low") - pc))).as("tr0"),
        (col("high") - ph).as("up"),
        (plo - col("low")).as("dn"))
        .select(col("*"),
          when(ph.isNull, 0.0)
            .otherwise(when(col("up") > col("dn") && col("up") > 0, col("up"))
              .otherwise(0.0)).as("pdm"),
          when(ph.isNull, 0.0)
            .otherwise(when(col("dn") > col("up") && col("dn") > 0, col("dn"))
              .otherwise(0.0)).as("mdm"))
      val c2 = c.select(col("*"),
        ewma(s, col("tr0"), 1.0 / 14.0).over(run).as("st"),
        ewma(s, col("pdm"), 1.0 / 14.0).over(run).as("sp"),
        ewma(s, col("mdm"), 1.0 / 14.0).over(run).as("sm"))
      val pdi = when(col("st") > 0, lit(100.0) * col("sp") / col("st")).otherwise(0.0)
      val mdi = when(col("st") > 0, lit(100.0) * col("sm") / col("st")).otherwise(0.0)
      val c3 = c2.withColumn("dx",
        when(pdi + mdi > 0, lit(100.0) * abs(pdi - mdi) / (pdi + mdi)).otherwise(0.0))
      c3.select(col("*"),
          ewma(s, col("dx"), 1.0 / 14.0).over(run).as("adx"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 28)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"), q6(col("adx")).as("adx"))
    },
    sqlCte = {
      val pdi = "CASE WHEN sts[i] > 0 THEN 100.0 * sps[i] / sts[i] ELSE 0.0 END"
      val mdi = "CASE WHEN sts[i] > 0 THEN 100.0 * sms[i] / sts[i] ELSE 0.0 END"
      s"""m_adx AS (
         |  SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |    ${q6s("adxs[i]")} AS adx
         |  FROM (
         |    SELECT symbol, ts, qv, n, ${redSeries("dxs", "1.0/14.0")} AS adxs
         |    FROM (
         |      SELECT symbol, ts, qv, n,
         |        list_transform(generate_series(1, n), i ->
         |          CASE WHEN ($pdi) + ($mdi) > 0
         |               THEN 100.0 * abs(($pdi) - ($mdi)) / (($pdi) + ($mdi))
         |               ELSE 0.0 END) AS dxs
         |      FROM (
         |        SELECT symbol, ts, qv, n,
         |          ${redSeries("trs0", "1.0/14.0")} AS sts,
         |          ${redSeries("pdms", "1.0/14.0")} AS sps,
         |          ${redSeries("mdms", "1.0/14.0")} AS sms
         |        FROM (
         |          SELECT symbol, ts, qv, n,
         |            list_transform(generate_series(1, n), k ->
         |              CASE WHEN k = 1 THEN 0.0
         |                   ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k-1]),
         |                                 abs(lo[k] - cl[k-1])) END) AS trs0,
         |            list_transform(generate_series(1, n), k ->
         |              CASE WHEN k = 1 THEN 0.0
         |                   WHEN hi[k] - hi[k-1] > lo[k-1] - lo[k]
         |                        AND hi[k] - hi[k-1] > 0 THEN hi[k] - hi[k-1]
         |                   ELSE 0.0 END) AS pdms,
         |            list_transform(generate_series(1, n), k ->
         |              CASE WHEN k = 1 THEN 0.0
         |                   WHEN lo[k-1] - lo[k] > hi[k] - hi[k-1]
         |                        AND lo[k-1] - lo[k] > 0 THEN lo[k-1] - lo[k]
         |                   ELSE 0.0 END) AS mdms
         |          FROM series)))) s,
         |    LATERAL (SELECT unnest(generate_series(28, n)) AS i) u)""".stripMargin
    },
    needsSeries = true)

  /** 谐波信号扫描器 (batch/harmonic.py:7-44): mean of typical-price
    * Wilder-style RSI over periods 2..33 (zero-seeded gain/loss EWMAs,
    * zero-loss periods skipped), 2-dp.
    */
  private val harmonic = MartDef(
    key = "harm", table = "谐波信号扫描器",
    fields = Seq("harm" -> "谐波值"),
    buildFrom = (s, dir, cframe) => {
      val tp = (col("high") + col("low") + col("close")) / 3
      val c0 = cframe.withColumn("tp", tp)
        .withColumn("dtp", col("tp") - lag("tp", 1).over(bySym))
        .withColumn("g", when(col("dtp") > 0, col("dtp")).otherwise(0.0))
        .withColumn("l", when(col("dtp") < 0, -col("dtp")).otherwise(0.0))
      // one projection for the 64 EWMA columns (r14, guide §7.3): the
      // foldLeft-withColumn spelling was 64 analyzer passes per build
      val c1 = c0.select(col("*") +: (2 to 33).flatMap(k => Seq(
        ewma(s, col("g"), 1.0 / k).over(run).as(s"ag$k"),
        ewma(s, col("l"), 1.0 / k).over(run).as(s"al$k"))): _*)
      val rsis = array((2 to 33).map { k =>
        when(col(s"al$k") =!= 0.0,
          lit(100.0) - lit(100.0) / (lit(1.0) + col(s"ag$k") / col(s"al$k")))
      }: _*)
      // skip-null mean as a tight-loop kernel (the filter+aggregate HOF
      // spelling paid 96 interpreted lambda dispatches per row;
      // ArrayFolds.meanNonNull is the same ascending fold + one division,
      // KernelSpec-pinned against the HOF twin)
      val harm = when(col("vs.n") > 0,
        floor(col("vs.m") * 100 + 0.5) / 100)
      c1.withColumn("vs", graft.functions.CodegenBarrierCol.barrier(
          graft.functions.ArrayFoldCols.meanNonNull(rsis)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 35)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"), harm.as("harm"))
    },
    sqlCte = {
      val cases = (2 to 33).map { k =>
        s"CASE WHEN al${k}s[i] != 0.0 THEN 100.0 - 100.0 / (1.0 + ag${k}s[i] / al${k}s[i]) END"
      }.mkString("[", ",\n           ", "]")
      val folds = (2 to 33).map { k =>
        s"${redSeries("gs", s"1.0/$k.0")} AS ag${k}s, ${redSeries("ls", s"1.0/$k.0")} AS al${k}s"
      }.mkString(",\n        ")
      s"""m_harm AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN len(valid) > 0
         |         THEN floor(list_reduce(list_prepend(0.0, valid), (a, x) -> a + x)
         |              / len(valid) * 100 + 0.5) / 100 END AS harm
         |  FROM (
         |    SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |      list_filter($cases, x -> x IS NOT NULL) AS valid
         |    FROM (
         |      SELECT symbol, ts, qv, n,
         |        $folds
         |      FROM (
         |        SELECT symbol, ts, qv, n,
         |          list_transform(generate_series(1, n), k ->
         |            CASE WHEN k = 1 THEN 0.0
         |                 ELSE greatest((hi[k]+lo[k]+cl[k])/3 - (hi[k-1]+lo[k-1]+cl[k-1])/3, 0.0) END) AS gs,
         |          list_transform(generate_series(1, n), k ->
         |            CASE WHEN k = 1 THEN 0.0
         |                 ELSE greatest((hi[k-1]+lo[k-1]+cl[k-1])/3 - (hi[k]+lo[k]+cl[k])/3, 0.0) END) AS ls
         |        FROM series)) s,
         |      LATERAL (SELECT unnest(generate_series(35, n)) AS i) u))""".stripMargin
    },
    needsSeries = true)

  /** KDJ随机指标扫描器 (incremental/kdj.py:6-50): RSV over 9-bar extrema
    * (NULL on a flat window — the scanner's inf-poisoning replaced by a
    * skip, documented), K/D via skip-null EWMA(1/3), J = 3K−2D; values
    * 3-dp like the mart, 信号概述 derived from the quantized series.
    * Warm-up 40 (kdj.py:35).
    */
  private val kdj = MartDef(
    key = "kdj", table = "KDJ随机指标扫描器",
    fields = Seq("k" -> "K值", "d" -> "D值", "j" -> "J值", "kdj_sig" -> "信号概述"),
    buildFrom = (s, dir, cframe) => {
      val h9 = max(col("high")).over(lastN(9)); val l9 = min(col("low")).over(lastN(9))
      // one projection per dependency level (r14, guide §7.3): nb inlines
      // into rsv (same window spec — one physical pass)
      val c = cframe.select(col("*"),
        when(count(lit(1)).over(lastN(9)) === 9,
          (col("close") - l9) / nullif(h9 - l9, lit(0.0)) * 100).as("rsv"))
      val c2 = c.withColumn("kk", ewma(s, col("rsv"), 1.0 / 3.0).over(run))
      val c3 = c2.withColumn("dd", ewma(s, col("kk"), 1.0 / 3.0).over(run))
      val q3 = (x: Column) => floor(x * 1e3 + 0.5) / 1e3
      val k3 = q3(col("kk")); val d3 = q3(col("dd"))
      val j3 = q3(lit(3.0) * col("kk") - lit(2.0) * col("dd"))
      val kp = lag(k3, 1).over(bySym); val dp = lag(d3, 1).over(bySym)
      c3.select(col("*"), row_number().over(bySym).as("rn"),
          k3.as("k3"), d3.as("d3"), j3.as("j3"), kp.as("kp"), dp.as("dp"))
        .filter(col("rn") >= 40)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          col("k3").as("k"), col("d3").as("d"), col("j3").as("j"),
          when(col("kp").isNull || col("dp").isNull, "数据不足")
            .when(col("kp") <= col("dp") && col("k3") > col("d3"), "金叉")
            .when(col("kp") >= col("dp") && col("k3") < col("d3"), "死叉")
            .when(col("j3") > 100.0, "J>100 极值")
            .when(col("j3") < 0.0, "J<0 极值")
            .otherwise("延续").as("kdj_sig"))
    },
    sqlCte = {
      val q3 = (e: String) => s"floor(($e) * 1e3 + 0.5) / 1e3"
      s"""m_kdj AS (
         |  SELECT symbol, bucket_ts, turnover, k, d, j,
         |    CASE WHEN kp IS NULL OR dp IS NULL THEN '数据不足'
         |         WHEN kp <= dp AND k > d THEN '金叉'
         |         WHEN kp >= dp AND k < d THEN '死叉'
         |         WHEN j > 100.0 THEN 'J>100 极值'
         |         WHEN j < 0.0 THEN 'J<0 极值'
         |         ELSE '延续' END AS kdj_sig
         |  FROM (
         |    SELECT symbol, bucket_ts, turnover, k, d, j,
         |      lag(k) OVER ($W) AS kp, lag(d) OVER ($W) AS dp,
         |      row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |        ${q3("ks[i]")} AS k, ${q3("ds[i]")} AS d,
         |        ${q3("3.0 * ks[i] - 2.0 * ds[i]")} AS j
         |      FROM (
         |        SELECT symbol, ts, qv, n, ks, ${redSeriesSkipNull("ks", "1.0/3.0")} AS ds
         |        FROM (
         |          SELECT symbol, ts, qv, n, ${redSeriesSkipNull("rsvs", "1.0/3.0")} AS ks
         |          FROM (
         |            SELECT symbol, ts, qv, n,
         |              list_transform(generate_series(1, n), k ->
         |                CASE WHEN k >= 9 THEN
         |                  (cl[k] - list_aggregate(lo[k-8:k], 'min')) /
         |                    nullif(list_aggregate(hi[k-8:k], 'max') - list_aggregate(lo[k-8:k], 'min'), 0.0) * 100
         |                END) AS rsvs
         |            FROM series))) s,
         |        LATERAL (SELECT unnest(generate_series(1, n)) AS i) u))
         |  WHERE rn >= 40)""".stripMargin
    },
    needsSeries = true)

  /** 智能RSI扫描器 (batch/tv_rsi.py): Wilder RSI 7/14/21 (the engine's
    * i22 kernel — safe_rsi's adjust=True weighting decays to the same
    * recursion; documented simplification), 2-dp; 位置 from the static
    * 70/30 bands with the 2-of-3 vote (the dynamic ATR-normalized
    * thresholds are full-history min-max scaled — non-causal per bar);
    * 背离 replays detect_divergence's ±5 pivot compare over the trailing
    * 50 bars causally (pivots confirmed 5 bars late, so the window is
    * j ∈ [t−44, t−6]), on RSI14.
    */
  private val rsi = MartDef(
    key = "rsi", table = "智能RSI扫描器",
    fields = Seq("rsi7" -> "RSI7", "rsi14" -> "RSI14", "rsi21" -> "RSI21",
      "rsi_avg" -> "RSI均值", "pos" -> "位置", "dvg" -> "背离"),
    buildFrom = (s, dir, cframe) => {
      val d = col("close") - lag("close", 1).over(bySym)
      val c0 = cframe
        .withColumn("g", when(d > 0.0, d).otherwise(when(d.isNull, d).otherwise(0.0)))
        .withColumn("l", when(d < 0.0, -d).otherwise(when(d.isNull, d).otherwise(0.0)))
      // one projection for the six EWMA columns (r14, guide §7.3)
      val c1 = c0.select(col("*") +: Seq(7, 14, 21).flatMap(k => Seq(
        ewma(s, col("g"), 1.0 / k).over(run).as(s"ag$k"),
        ewma(s, col("l"), 1.0 / k).over(run).as(s"al$k"))): _*)
      def rq(k: Int): Column = floor(
        when(col(s"al$k") === 0.0, when(col(s"ag$k") === 0.0, 50.0).otherwise(100.0))
          .otherwise(lit(100.0) - lit(100.0) /
            (lit(1.0) + col(s"ag$k") / col(s"al$k"))) * 100 + 0.5) / 100
      // one projection per dependency level (r14, guide §7.3): the cnt11
      // gate inlines into ph/pl (same window spec — one physical pass)
      val w11 = bySym.rowsBetween(-5, 5)
      val c2 = c1.select(col("*"),
        rq(7).as("r7"), rq(14).as("r14"), rq(21).as("r21"),
        (count(lit(1)).over(w11) === 11 &&
          col("high") === max(col("high")).over(w11)).as("ph"),
        (count(lit(1)).over(w11) === 11 &&
          col("low") === min(col("low")).over(w11)).as("pl"))
      val c3 = c2.select(col("*"),
          collect_list(
            when(col("ph"), struct(col("high").as("v"), col("r14").as("r"))))
            .over(bySym.rowsBetween(-44, -6)).as("phs"),
          collect_list(
            when(col("pl"), struct(col("low").as("v"), col("r14").as("r"))))
            .over(bySym.rowsBetween(-44, -6)).as("pls"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 15)
      val nOb = Seq("r7", "r14", "r21")
        .map(c => when(col(c) > 70.0, 1).otherwise(0)).reduce(_ + _)
      val nOs = Seq("r7", "r14", "r21")
        .map(c => when(col(c) < 30.0, 1).otherwise(0)).reduce(_ + _)
      val both2 = size(col("phs")) >= 2 && size(col("pls")) >= 2
      val hL = element_at(col("phs"), -1); val hP = element_at(col("phs"), -2)
      val lL = element_at(col("pls"), -1); val lP = element_at(col("pls"), -2)
      val top = both2 && hL("v") > hP("v") && hL("r") < hP("r")
      val bot = both2 && lL("v") < lP("v") && lL("r") > lP("r")
      c3.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        col("r7").as("rsi7"), col("r14").as("rsi14"), col("r21").as("rsi21"),
        (floor((col("r7") + col("r14") + col("r21")) / 3 * 100 + 0.5) / 100)
          .as("rsi_avg"),
        when(nOs >= 2, "超卖区").when(nOb >= 2, "超买区")
          .otherwise("中性区").as("pos"),
        when(col("rn") < 50, "数据不足")
          .when(top, "顶背离")
          .when(bot, "底背离")
          .otherwise("无背离").as("dvg"))
    },
    sqlCte = {
      def rq(k: Int) =
        s"""floor(CASE WHEN al${k}s[i] = 0.0
           |           THEN CASE WHEN ag${k}s[i] = 0.0 THEN 50.0 ELSE 100.0 END
           |           ELSE 100.0 - 100.0 / (1.0 + ag${k}s[i] / al${k}s[i])
           |      END * 100 + 0.5) / 100""".stripMargin
      val folds = Seq(7, 14, 21).map { k =>
        s"${redSeriesSkipNull("gs", s"1.0/$k.0")} AS ag${k}s, ${redSeriesSkipNull("ls", s"1.0/$k.0")} AS al${k}s"
      }.mkString(",\n        ")
      s"""m_rsi AS (
         |  SELECT symbol, bucket_ts, turnover, rsi7, rsi14, rsi21,
         |    floor((rsi7 + rsi14 + rsi21) / 3 * 100 + 0.5) / 100 AS rsi_avg,
         |    CASE WHEN (CASE WHEN rsi7 < 30.0 THEN 1 ELSE 0 END +
         |               CASE WHEN rsi14 < 30.0 THEN 1 ELSE 0 END +
         |               CASE WHEN rsi21 < 30.0 THEN 1 ELSE 0 END) >= 2 THEN '超卖区'
         |         WHEN (CASE WHEN rsi7 > 70.0 THEN 1 ELSE 0 END +
         |               CASE WHEN rsi14 > 70.0 THEN 1 ELSE 0 END +
         |               CASE WHEN rsi21 > 70.0 THEN 1 ELSE 0 END) >= 2 THEN '超买区'
         |         ELSE '中性区' END AS pos,
         |    CASE WHEN rn < 50 THEN '数据不足'
         |         WHEN len(phs) >= 2 AND len(pls) >= 2
         |              AND phs[-1].v > phs[-2].v AND phs[-1].r < phs[-2].r THEN '顶背离'
         |         WHEN len(phs) >= 2 AND len(pls) >= 2
         |              AND pls[-1].v < pls[-2].v AND pls[-1].r > pls[-2].r THEN '底背离'
         |         ELSE '无背离' END AS dvg
         |  FROM (
         |    SELECT symbol, bucket_ts, turnover, rsi7, rsi14, rsi21, rn,
         |      list_filter(list(CASE WHEN ph THEN struct_pack(v := high, r := rsi14) END)
         |        OVER ($W ROWS BETWEEN 44 PRECEDING AND 6 PRECEDING),
         |        x -> x IS NOT NULL) AS phs,
         |      list_filter(list(CASE WHEN pl THEN struct_pack(v := low, r := rsi14) END)
         |        OVER ($W ROWS BETWEEN 44 PRECEDING AND 6 PRECEDING),
         |        x -> x IS NOT NULL) AS pls
         |    FROM (
         |      SELECT symbol, bucket_ts, turnover, high, low, rsi7, rsi14, rsi21, rn,
         |        count(*) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) = 11
         |          AND high = max(high) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS ph,
         |        count(*) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) = 11
         |          AND low = min(low) OVER ($W ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS pl
         |      FROM (
         |        SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |          hi[i] AS high, lo[i] AS low, i AS rn,
         |          ${rq(7)} AS rsi7, ${rq(14)} AS rsi14, ${rq(21)} AS rsi21
         |        FROM (
         |          SELECT symbol, ts, qv, hi, lo, n,
         |            $folds
         |          FROM (
         |            SELECT symbol, ts, qv, hi, lo, n,
         |              list_transform(generate_series(1, n), k ->
         |                CASE WHEN k = 1 THEN NULL
         |                     ELSE greatest(cl[k] - cl[k-1], 0.0) END) AS gs,
         |              list_transform(generate_series(1, n), k ->
         |                CASE WHEN k = 1 THEN NULL
         |                     ELSE greatest(cl[k-1] - cl[k], 0.0) END) AS ls
         |            FROM series)) s,
         |          LATERAL (SELECT unnest(generate_series(1, n)) AS i) u)))
         |  WHERE rn >= 15)""".stripMargin
    },
    needsSeries = true)

  // ======================================================= trend pack

  /** Per-bar per-symbol fold runner (the [[graft.indicators.Series
    * .mapSeries]] shape emitting EVERY bar instead of the last): one
    * shuffle on the symbol key, bounded group state, O(series) per
    * symbol — the Spark form for true recurrences (ratchets, line
    * validity scans) that window functions cannot express.
    */
  private def mapSeriesAll(s: SparkSession, frame: DataFrame)(
      fn: Array[graft.indicators.Series.Bar] => Iterator[MartRow]): DataFrame = {
    import graft.indicators.Series
    import s.implicits._
    frame
      .select(col("symbol"), col("bucket_ts"), col("open"), col("high"),
        col("low"), col("close"), col("volume"), col("quote_volume"),
        col("taker_buy_volume"))
      .as[Series.Bar]
      .groupByKey(_.symbol)
      .flatMapGroups { (_, it) => fn(Series.latestBars(it, Series.Bars.cap)) }
      .toDF()
  }
  /** Generic fold output row: string state + two numeric fields. */
  final case class MartRow(symbol: String, bucket_ts: Long, turnover: Double,
    s1: String, d1: Option[Double])
  private implicit val encMartRow: org.apache.spark.sql.Encoder[MartRow] =
    org.apache.spark.sql.Encoders.product[MartRow]

  private def q6d(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** SuperTrend.py (lean_indicators.py:30-85): Wilder ATR(10), hl2 ±
    * 3·ATR bands with the close-vs-previous-final-band ratchet and the
    * supertrend-equality direction rule — a true double recursion, run
    * as a per-symbol fold; the oracle replays it with a struct
    * `list_reduce` over every prefix (the Stateful-pack idiom). 方向
    * vocabulary 空/多 (direction 1 = 空, lean_indicators.py:75).
    */
  private val strend = MartDef(
    key = "strend", table = "SuperTrend",
    fields = Seq("sdir" -> "方向"),
    buildFrom = (s, dir, cframe) => mapSeriesAll(s, cframe) { bars =>
      import graft.indicators.Series.{ewma => sewma, trueRanges}
      val n = bars.length
      if (n < 10) Iterator.empty
      else {
        val atr = sewma(trueRanges(bars), 1.0 / 10.0)
        var fu = (bars(0).high + bars(0).low) / 2.0 + 3.0 * atr(0)
        var fl = (bars(0).high + bars(0).low) / 2.0 - 3.0 * atr(0)
        var st = 0.0
        var d = 1
        val out = Array.newBuilder[MartRow]
        var i = 0
        while (i < n) {
          if (i > 0) {
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
          }
          if (i >= 9)
            out += MartRow(bars(i).symbol, bars(i).bucket_ts,
              q6d(bars(i).quote_volume), if (d == 1) "空" else "多", None)
          i += 1
        }
        out.result().iterator
      }
    }.select(col("symbol"), col("bucket_ts"), col("turnover"),
      col("s1").as("sdir")),
    sqlCte =
      // DuckDB 1.0's list_reduce mis-evaluates complex struct lambdas
      // (a full fold disagrees with incrementally applying the same
      // lambda), so the ratchet is replayed with the Stateful-pack
      // WITH RECURSIVE idiom instead: O(n) per symbol, state threaded
      // through (fu, fl, st, d) exactly like the Scala loop.
      s"""strend_pre AS (
         |  SELECT symbol, ts, qv, hi, lo, cl, n,
         |    ${redSeries("trs", "1.0/10.0")} AS atrs
         |  FROM (
         |    SELECT symbol, ts, qv, hi, lo, cl, n,
         |      list_transform(generate_series(1, n), k ->
         |        CASE WHEN k = 1 THEN hi[1] - lo[1]
         |             ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k-1]),
         |                           abs(lo[k] - cl[k-1])) END) AS trs
         |    FROM series WHERE n >= 10)),
         |strend_rec AS (
         |  SELECT symbol, 1 AS i, n, ts, qv, hi, lo, cl, atrs,
         |    (hi[1] + lo[1]) / 2.0 + 3.0 * atrs[1] AS fu,
         |    (hi[1] + lo[1]) / 2.0 - 3.0 * atrs[1] AS fl,
         |    CAST(0.0 AS DOUBLE) AS st, 1 AS d
         |  FROM strend_pre
         |  UNION ALL
         |  SELECT r.symbol, r.i + 1, r.n, r.ts, r.qv, r.hi, r.lo, r.cl, r.atrs,
         |    v.fu2, v.fl2, CASE WHEN v.d2 = 1 THEN v.fu2 ELSE v.fl2 END, v.d2
         |  FROM strend_rec r,
         |    LATERAL (SELECT
         |        (r.hi[r.i + 1] + r.lo[r.i + 1]) / 2.0 + 3.0 * r.atrs[r.i + 1] AS bu,
         |        (r.hi[r.i + 1] + r.lo[r.i + 1]) / 2.0 - 3.0 * r.atrs[r.i + 1] AS bl) b,
         |    LATERAL (SELECT
         |        CASE WHEN r.cl[r.i] > r.fu THEN b.bu ELSE least(b.bu, r.fu) END AS fu2,
         |        CASE WHEN r.cl[r.i] < r.fl THEN b.bl ELSE greatest(b.bl, r.fl) END AS fl2) f,
         |    LATERAL (SELECT
         |        CASE WHEN r.st = r.fu
         |             THEN (CASE WHEN r.cl[r.i + 1] > f.fu2 THEN -1 ELSE 1 END)
         |             ELSE (CASE WHEN r.cl[r.i + 1] < f.fl2 THEN 1 ELSE -1 END)
         |        END AS d2, f.fu2 AS fu2, f.fl2 AS fl2) v
         |  WHERE r.i < r.n),
         |m_strend AS (
         |  SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |    CASE WHEN d = 1 THEN '空' ELSE '多' END AS sdir
         |  FROM strend_rec WHERE i >= 10)""".stripMargin,
    needsSeries = true,
    needsRecursive = true)

  /** 趋势线榜单 (batch/trend_line.py, carried at the engine's i19
    * simplification — line through the LAST TWO confirmed ±5 pivots,
    * valid while every close since the later pivot stays on its side of
    * the projection; resistance ⇒ 空, else support ⇒ 多, else 震荡, the
    * reference's `_pick_direction_and_distance` precedence). Per-bar
    * fold; pivots confirm 5 bars late.
    */
  private val tline = MartDef(
    key = "tline", table = "趋势线榜单",
    fields = Seq("tldir" -> "趋势方向", "tldist" -> "距离趋势线%"),
    buildFrom = (s, dir, cframe) => mapSeriesAll(s, cframe) { bars =>
      val n = bars.length
      if (n < 35) Iterator.empty
      else {
        // centered ±5 pivots, confirmed at j+5
        val isPh = Array.tabulate(n) { j =>
          j >= 5 && j < n - 5 && {
            var m = Double.MinValue
            var t = j - 5; while (t <= j + 5) { m = math.max(m, bars(t).high); t += 1 }
            bars(j).high >= m
          }
        }
        val isPl = Array.tabulate(n) { j =>
          j >= 5 && j < n - 5 && {
            var m = Double.MaxValue
            var t = j - 5; while (t <= j + 5) { m = math.min(m, bars(t).low); t += 1 }
            bars(j).low <= m
          }
        }
        val out = Array.newBuilder[MartRow]
        var t = 34
        while (t < n) {
          def lastTwo(flags: Array[Boolean], value: Int => Double): Option[((Int, Double), (Int, Double))] = {
            var j = t - 5; var last = -1; var prev = -1
            while (j >= 0 && prev < 0) {
              if (flags(j)) { if (last < 0) last = j else prev = j }
              j -= 1
            }
            if (prev < 0) None else Some(((prev, value(prev)), (last, value(last))))
          }
          def line(ps: Option[((Int, Double), (Int, Double))], support: Boolean): Option[Double] =
            ps.flatMap { case ((i1, v1), (i2, v2)) =>
              val ok = if (support) v2 > v1 else v2 < v1
              if (!ok) None
              else {
                val slope = (v2 - v1) / (i2 - i1)
                var k = i2
                var valid = true
                while (k <= t && valid) {
                  val proj = v2 + slope * (k - i2)
                  if (support && bars(k).close < proj) valid = false
                  if (!support && bars(k).close > proj) valid = false
                  k += 1
                }
                if (valid) Some(v2 + slope * (t - i2)) else None
              }
            }
          val sup = line(lastTwo(isPl, j => bars(j).low), support = true)
          val res = line(lastTwo(isPh, j => bars(j).high), support = false)
          val close = bars(t).close
          val (d0, dist) = res match {
            case Some(r) => ("空", if (r == 0.0) 0.0 else (close - r) / r * 100.0)
            case None => sup match {
              case Some(l) => ("多", if (l == 0.0) 0.0 else (close - l) / l * 100.0)
              case None => ("震荡", 0.0)
            }
          }
          out += MartRow(bars(t).symbol, bars(t).bucket_ts,
            q6d(bars(t).quote_volume), d0,
            Some(math.floor(dist * 1e4 + 0.5) / 1e4))
          t += 1
        }
        out.result().iterator
      }
    }.select(col("symbol"), col("bucket_ts"), col("turnover"),
      col("s1").as("tldir"), col("d1").as("tldist")),
    sqlCte = {
      // 0-based Scala pivot index j maps to 1-based list index j+1; the
      // fold is replayed with list HOFs over the shared series lists.
      val phl =
        """list_transform(generate_series(1, n), j ->
          |  CASE WHEN j > 5 AND j <= n - 5
          |            AND hi[j] >= list_aggregate(hi[j-5:j+5], 'max')
          |       THEN struct_pack(p := j, v := hi[j]) END)""".stripMargin
      val pll =
        """list_transform(generate_series(1, n), j ->
          |  CASE WHEN j > 5 AND j <= n - 5
          |            AND lo[j] <= list_aggregate(lo[j-5:j+5], 'min')
          |       THEN struct_pack(p := j, v := lo[j]) END)""".stripMargin
      def lineExpr(lst: String, support: Boolean): String = {
        val cmpPair = if (support) "(($l)[-1]).v > (($l)[-2]).v" else "(($l)[-1]).v < (($l)[-2]).v"
        val breach = if (support) "cl[k] < proj" else "cl[k] > proj"
        s"""CASE WHEN len($lst) >= 2 AND ${cmpPair.replace("$l", lst)}
           |     THEN (SELECT CASE WHEN len(list_filter(generate_series((($lst)[-1]).p, i), k ->
           |            ${breach.replace("proj", s"(($lst)[-1]).v + ((($lst)[-1]).v - (($lst)[-2]).v) / ((($lst)[-1]).p - (($lst)[-2]).p) * (k - (($lst)[-1]).p)")})) = 0
           |          THEN (($lst)[-1]).v + ((($lst)[-1]).v - (($lst)[-2]).v) / ((($lst)[-1]).p - (($lst)[-2]).p) * (i - (($lst)[-1]).p) END)
           |     END""".stripMargin
      }
      s"""m_tline AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN res IS NOT NULL THEN '空'
         |         WHEN sup IS NOT NULL THEN '多' ELSE '震荡' END AS tldir,
         |    floor(CASE WHEN res IS NOT NULL
         |               THEN CASE WHEN res = 0.0 THEN 0.0 ELSE (c - res) / res * 100.0 END
         |               WHEN sup IS NOT NULL
         |               THEN CASE WHEN sup = 0.0 THEN 0.0 ELSE (c - sup) / sup * 100.0 END
         |               ELSE 0.0 END * 1e4 + 0.5) / 1e4 AS tldist
         |  FROM (
         |    SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |      cl[i] AS c,
         |      ${lineExpr("phv", support = false)} AS res,
         |      ${lineExpr("plv", support = true)} AS sup
         |    FROM (
         |      SELECT symbol, ts, qv, cl, n,
         |        list_filter($phl, x -> x IS NOT NULL) AS ph0,
         |        list_filter($pll, x -> x IS NOT NULL) AS pl0
         |      FROM series WHERE n >= 35) s,
         |      LATERAL (SELECT unnest(generate_series(35, n)) AS i) u,
         |      LATERAL (SELECT list_filter(ph0, x -> x.p <= i - 5) AS phv,
         |                      list_filter(pl0, x -> x.p <= i - 5) AS plv) v))""".stripMargin
    },
    needsSeries = true)

  /** Shared ZLEMA basis + trailing-max ATR band (batch/super_trend.py:
    * 17-45 at the Stateful pack's fixture scaling LEN=20/LAG=9/WIN=60/
    * MULT=1.2): basis = skip-null EWMA(2/21) over 2·close − close[−9],
    * band = max(Wilder ATR(20)) over the last 60 bars × 1.2.
    */
  private def zlCols(s: SparkSession, df: DataFrame): DataFrame = {
    import graft.indicators.Windows.trueRange
    val src = lit(2.0) * col("close") - lag("close", 9).over(bySym)
    df.withColumn("tr", trueRange(col("high"), col("low"), col("close")))
      .withColumn("src", src)
      .withColumn("basis", ewma(s, col("src"), 2.0 / 21.0).over(run))
      .withColumn("atr", ewma(s, col("tr"), 1.0 / 20.0).over(run))
      .withColumn("band", max(col("atr")).over(lastN(60)) * lit(1.2))
  }
  private val ZlSql: String =
    s"""SELECT symbol, ts, qv, cl, n,
       |  ${redSeriesSkipNull(
          "list_transform(generate_series(1, n), i -> CASE WHEN i > 9 THEN 2.0 * cl[i] - cl[i-9] END)",
          "2.0/21.0")} AS basiss,
       |  list_transform(generate_series(1, n), i ->
       |    list_aggregate(atrs[greatest(1, i - 59):i], 'max') * 1.2) AS bands
       |FROM (
       |  SELECT symbol, ts, qv, cl, n, ${redSeries("trs", "1.0/20.0")} AS atrs
       |  FROM (
       |    SELECT symbol, ts, qv, cl, n,
       |      list_transform(generate_series(1, n), k ->
       |        CASE WHEN k = 1 THEN hi[1] - lo[1]
       |             ELSE greatest(hi[k] - lo[k], abs(hi[k] - cl[k-1]),
       |                           abs(lo[k] - cl[k-1])) END) AS trs
       |    FROM series))""".stripMargin

  /** 超级精准趋势扫描器 (batch/super_trend.py:63-101): trend latches +1
    * on an upward CROSS of basis+band (prev close ≤ upper, close >
    * upper), −1 on a downward cross of basis−band, else carries — the
    * latch is `last(event) IGNORE NULLS` over the running frame, no
    * recursion. 趋势方向 多/空 (0 → 空); 趋势强度 = (close −
    * trend_band)/band (4 dp, NULL when falsy — super_trend.py:105).
    */
  private val precise = MartDef(
    key = "precise", table = "超级精准趋势扫描器",
    fields = Seq("tdir" -> "趋势方向", "tstr" -> "趋势强度"),
    buildFrom = (s, dir, cframe) => {
      // one projection per dependency level (r14, guide §7.3)
      val c = zlCols(s, cframe)
        .select(col("*"),
          (col("basis") + col("band")).as("up"),
          (col("basis") - col("band")).as("dn"),
          lag("close", 1).over(bySym).as("pc"))
        .withColumn("ev",
          when(col("basis").isNotNull && col("pc").isNotNull &&
            col("pc") <= col("up") && col("close") > col("up"), 1)
          .when(col("basis").isNotNull && col("pc").isNotNull &&
            col("pc") >= col("dn") && col("close") < col("dn"), -1))
        .select(col("*"),
          coalesce(last(col("ev"), ignoreNulls = true).over(run), lit(0))
            .as("trend"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 35)
      val tb = when(col("trend") === 1, col("dn")).otherwise(col("up"))
      val gap = when(col("band") =!= 0.0 && col("basis").isNotNull,
        (col("close") - tb) / col("band"))
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(col("trend") === 1, "多").otherwise("空").as("tdir"),
        nullif(floor(gap * 1e4 + 0.5) / 1e4, lit(0.0)).as("tstr"))
    },
    sqlCte =
      s"""m_precise AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN trend = 1 THEN '多' ELSE '空' END AS tdir,
         |    nullif(floor(CASE WHEN band != 0.0 AND basis IS NOT NULL
         |      THEN (c - (CASE WHEN trend = 1 THEN basis - band ELSE basis + band END)) / band
         |      END * 1e4 + 0.5) / 1e4, 0.0) AS tstr
         |  FROM (
         |    SELECT symbol, bucket_ts, turnover, c, basis, band, rn,
         |      coalesce(last_value(ev IGNORE NULLS) OVER ($W
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS trend
         |    FROM (
         |      SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |        cl[i] AS c, basiss[i] AS basis, bands[i] AS band, i AS rn,
         |        CASE WHEN basiss[i] IS NOT NULL AND i > 1
         |                  AND cl[i-1] <= basiss[i] + bands[i]
         |                  AND cl[i] > basiss[i] + bands[i] THEN 1
         |             WHEN basiss[i] IS NOT NULL AND i > 1
         |                  AND cl[i-1] >= basiss[i] - bands[i]
         |                  AND cl[i] < basiss[i] - bands[i] THEN -1
         |        END AS ev
         |      FROM ($ZlSql) z,
         |        LATERAL (SELECT unnest(generate_series(1, n)) AS i) u))
         |  WHERE rn >= 35)""".stripMargin,
    needsSeries = true)

  /** 零延迟趋势扫描器 (batch/tv_zero_lag.py:33-92, same fixture scaling;
    * the i28 partial-window band): trend +1 while close ABOVE basis+band,
    * −1 below basis−band, else carries — the band-hold latch. 方向
    * 多头/空头/震荡 (the corpus's 多/空 from-values never match — dead in
    * the reference too).
    */
  private val zl = MartDef(
    key = "zl", table = "零延迟趋势扫描器",
    fields = Seq("zdir" -> "方向"),
    buildFrom = (s, dir, cframe) => {
      val c = zlCols(s, cframe)
        .withColumn("ev",
          when(col("basis").isNotNull && col("close") > col("basis") + col("band"), 1)
          .when(col("basis").isNotNull && col("close") < col("basis") - col("band"), -1))
        .withColumn("trend", coalesce(
          last(col("ev"), ignoreNulls = true).over(run), lit(0)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 35)
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(col("trend") > 0, "多头").when(col("trend") < 0, "空头")
          .otherwise("震荡").as("zdir"))
    },
    sqlCte =
      s"""m_zl AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN trend > 0 THEN '多头' WHEN trend < 0 THEN '空头'
         |         ELSE '震荡' END AS zdir
         |  FROM (
         |    SELECT symbol, bucket_ts, turnover, rn,
         |      coalesce(last_value(ev IGNORE NULLS) OVER ($W
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS trend
         |    FROM (
         |      SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover, i AS rn,
         |        CASE WHEN basiss[i] IS NOT NULL AND cl[i] > basiss[i] + bands[i] THEN 1
         |             WHEN basiss[i] IS NOT NULL AND cl[i] < basiss[i] - bands[i] THEN -1
         |        END AS ev
         |      FROM ($ZlSql) z,
         |        LATERAL (SELECT unnest(generate_series(1, n)) AS i) u))
         |  WHERE rn >= 35)""".stripMargin,
    needsSeries = true)

  /** Ichimoku.py (lean_indicators.py:249-271): 9/26/52 donchian mids
    * with the scanner's partial windows, BUY/SELL/NEUTRAL signal (the
    * corpus's 买入/卖出 from-values never match — dead in the reference
    * too), 强度 3-dp.
    */
  private val ichi = MartDef(
    key = "ichi", table = "Ichimoku",
    fields = Seq("isig" -> "信号", "istr" -> "强度"),
    buildFrom = (s, dir, cframe) => {
      def mid(k: Int) = (max(col("high")).over(lastN(k)) +
        min(col("low")).over(lastN(k))) / 2
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe
        .select(col("*"), mid(9).as("tk"), mid(26).as("kj"),
          mid(52).as("sb0"), row_number().over(bySym).as("rn"))
        .select(col("*"), ((col("tk") + col("kj")) / 2).as("sa"),
          when(col("rn") >= 52, col("sb0")).otherwise(0.0).as("sb"))
        .filter(col("rn") >= 26)
      val top = greatest(col("sa"), col("sb")); val bot = least(col("sa"), col("sb"))
      val sig = when(col("close") > top && col("tk") > col("kj"), "BUY")
        .when(col("close") < bot && col("tk") < col("kj"), "SELL")
        .otherwise("NEUTRAL")
      val str0 = when(col("close") > top,
          least(lit(1.0), (col("close") - top) / (top - bot + lit(1e-10))))
        .when(col("close") < bot,
          least(lit(1.0), (bot - col("close")) / (top - bot + lit(1e-10))))
        .otherwise(0.5)
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"), sig.as("isig"),
        (floor(str0 * 1e3 + 0.5) / 1e3).as("istr"))
    },
    sqlCte = {
      val top = "greatest((tk + kj) / 2, sb)"
      val bot = "least((tk + kj) / 2, sb)"
      s"""m_ichi AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN close > $top AND tk > kj THEN 'BUY'
         |         WHEN close < $bot AND tk < kj THEN 'SELL'
         |         ELSE 'NEUTRAL' END AS isig,
         |    floor(CASE WHEN close > $top
         |               THEN least(1.0, (close - $top) / ($top - $bot + 1e-10))
         |               WHEN close < $bot
         |               THEN least(1.0, ($bot - close) / ($top - $bot + 1e-10))
         |               ELSE 0.5 END * 1e3 + 0.5) / 1e3 AS istr
         |  FROM (
         |    SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover, close,
         |      (max(high) OVER ($W ${fr(9)}) + min(low) OVER ($W ${fr(9)})) / 2 AS tk,
         |      (max(high) OVER ($W ${fr(26)}) + min(low) OVER ($W ${fr(26)})) / 2 AS kj,
         |      CASE WHEN row_number() OVER ($W) >= 52
         |           THEN (max(high) OVER ($W ${fr(52)}) + min(low) OVER ($W ${fr(52)})) / 2
         |           ELSE 0.0 END AS sb,
         |      row_number() OVER ($W) AS rn
         |    FROM candles)
         |  WHERE rn >= 26)""".stripMargin
    })

  /** 趋势云反转扫描器 (batch/tv_trend_cloud.py, SMMA 200→20 fixture
    * scaling like the Stateful pack): 方向 from EMA2 vs SMA-seeded
    * SMMA20 (多头/空头/震荡 — corpus from-values dead), 形态 from
    * 3-line-strike / engulfing lag patterns.
    */
  private val cloud = MartDef(
    key = "cloud", table = "趋势云反转扫描器",
    fields = Seq("cdir" -> "方向", "shape" -> "形态"),
    buildFrom = (s, dir, cframe) => {
      // one projection per dependency level (r14, guide §7.3)
      val c0 = cframe
        .select(col("*"),
          row_number().over(bySym).as("rn"),
          avg(col("close")).over(lastN(20)).as("sma20"))
        .withColumn("sin",
          when(col("rn") === 20, col("sma20"))
            .when(col("rn") > 20, col("close")))
      val c = c0.select(col("*"),
        ewma(s, col("sin"), 1.0 / 20.0).over(run).as("smma"),
        ewma(s, col("close"), 2.0 / 3.0).over(run).as("ema2"))
      def lg(cn: String, k: Int) = lag(cn, k).over(bySym)
      val tls = when(
          lg("close", 3) < lg("open", 3) && lg("close", 2) < lg("open", 2) &&
          lg("close", 1) < lg("open", 1) && col("close") > lg("open", 1), "BUY")
        .when(
          lg("close", 3) > lg("open", 3) && lg("close", 2) > lg("open", 2) &&
          lg("close", 1) > lg("open", 1) && col("close") < lg("open", 1), "SELL")
        .otherwise("HOLD")
      val eng = when(col("open") <= lg("close", 1) && col("open") < lg("open", 1) &&
          col("close") > lg("open", 1), "BUY")
        .when(col("open") >= lg("close", 1) && col("open") > lg("open", 1) &&
          col("close") < lg("open", 1), "SELL")
        .otherwise("HOLD")
      c.select(col("*"), tls.as("tls"), eng.as("eng"))
        .filter(col("rn") >= 20)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          when(col("ema2") > col("smma"), "多头")
            .when(col("ema2") < col("smma"), "空头")
            .otherwise("震荡").as("cdir"),
          when(col("tls") =!= "HOLD", "三线打击")
            .when(col("eng") =!= "HOLD", "吞没形态")
            .otherwise("无").as("shape"))
    },
    sqlCte =
      s"""m_cloud AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN ema2 > smma THEN '多头' WHEN ema2 < smma THEN '空头'
         |         ELSE '震荡' END AS cdir,
         |    CASE WHEN tls != 'HOLD' THEN '三线打击'
         |         WHEN eng != 'HOLD' THEN '吞没形态' ELSE '无' END AS shape
         |  FROM (
         |    SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |      smmas[i] AS smma, ema2s[i] AS ema2, i AS rn,
         |      CASE WHEN i > 3 AND cl[i-3] < op[i-3] AND cl[i-2] < op[i-2]
         |                AND cl[i-1] < op[i-1] AND cl[i] > op[i-1] THEN 'BUY'
         |           WHEN i > 3 AND cl[i-3] > op[i-3] AND cl[i-2] > op[i-2]
         |                AND cl[i-1] > op[i-1] AND cl[i] < op[i-1] THEN 'SELL'
         |           ELSE 'HOLD' END AS tls,
         |      CASE WHEN i > 1 AND op[i] <= cl[i-1] AND op[i] < op[i-1]
         |                AND cl[i] > op[i-1] THEN 'BUY'
         |           WHEN i > 1 AND op[i] >= cl[i-1] AND op[i] > op[i-1]
         |                AND cl[i] < op[i-1] THEN 'SELL'
         |           ELSE 'HOLD' END AS eng
         |    FROM (
         |      SELECT symbol, ts, qv, cl, op, n,
         |        ${redSeriesSkipNull(
                  "list_transform(generate_series(1, n), i -> " +
                  "CASE WHEN i = 20 THEN list_reduce(list_prepend(0.0, cl[1:20]), (a, x) -> a + x) / 20 " +
                  "WHEN i > 20 THEN cl[i] END)", "1.0/20.0")} AS smmas,
         |        ${redSeries("cl", "2.0/3.0")} AS ema2s
         |      FROM series) s,
         |      LATERAL (SELECT unnest(generate_series(20, n)) AS i) u))""".stripMargin,
    needsSeries = true)

  /** 多空信号扫描器 (batch/tv_long_short.py:10-68): smoothed Heikin-Ashi
    * — EMA10 of OHLC, the ha_open recursion as a seeded α=0.5 EWMA over
    * the lagged ha_close, EMA10 re-smooth; 方向 = 多头 iff o2 ≤ c2
    * (green), which subsumes the scanner's flip branches. 强度 2-dp.
    */
  private val ha = MartDef(
    key = "ha", table = "多空信号扫描器",
    fields = Seq("hdir" -> "方向", "hstr" -> "强度"),
    buildFrom = (s, dir, cframe) => {
      val a1 = 2.0 / 11.0
      // one projection per dependency level (r14, guide §7.3)
      val c0 = cframe.select(col("*"),
        ewma(s, col("open"), a1).over(run).as("os"),
        ewma(s, col("high"), a1).over(run).as("hs"),
        ewma(s, col("low"), a1).over(run).as("ls"),
        ewma(s, col("close"), a1).over(run).as("cs"),
        row_number().over(bySym).as("rn"))
      val c1 = c0.withColumn("hc", (col("os") + col("hs") + col("ls") + col("cs")) / 4)
      val c2 = c1.withColumn("z",
          when(col("rn") === 1, (col("os") + col("cs")) / 2)
            .otherwise(lag("hc", 1).over(bySym)))
      val c3 = c2.withColumn("hao", ewma(s, col("z"), 0.5).over(run))
      val c5 = c3.select(col("*"),
        ewma(s, col("hao"), a1).over(run).as("o2"),
        ewma(s, col("hc"), a1).over(run).as("c2"))
      val body = abs(col("o2") - col("c2"))
      val bodyPrev = abs(lag("o2", 1).over(bySym) - lag("c2", 1).over(bySym))
      val slope = col("c2") - lag("c2", 4).over(bySym)
      val slopeStr = greatest(lit(0.0), least(lit(1.0), (slope + 200) / 400))
      val hstr = least(
        when(bodyPrev > 0, body / bodyPrev * 100).otherwise(0.0) + slopeStr * 40,
        lit(200.0))
      c5.filter(col("rn") >= 20)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          when(col("o2") <= col("c2"), "多头").otherwise("空头").as("hdir"),
          (floor(hstr * 100 + 0.5) / 100).as("hstr"))
    },
    sqlCte =
      s"""m_ha AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN o2 <= c2 THEN '多头' ELSE '空头' END AS hdir,
         |    floor(least(CASE WHEN bp > 0 THEN abs(o2 - c2) / bp * 100 ELSE 0.0 END
         |      + greatest(0.0, least(1.0, (sl + 200) / 400)) * 40, 200.0)
         |      * 100 + 0.5) / 100 AS hstr
         |  FROM (
         |    SELECT symbol, bucket_ts, turnover, o2, c2,
         |      abs(lag(o2) OVER ($W) - lag(c2) OVER ($W)) AS bp,
         |      c2 - lag(c2, 4) OVER ($W) AS sl, rn
         |    FROM (
         |      SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |        o2s[i] AS o2, c2s[i] AS c2, i AS rn
         |      FROM (
         |        SELECT symbol, ts, qv, n,
         |          ${redSeries("haos", "2.0/11.0")} AS o2s,
         |          ${redSeries("hcs", "2.0/11.0")} AS c2s
         |        FROM (
         |          SELECT symbol, ts, qv, n, hcs, ${redSeries("zs", "0.5")} AS haos
         |          FROM (
         |            SELECT symbol, ts, qv, n, hcs,
         |              list_transform(generate_series(1, n), i ->
         |                CASE WHEN i = 1 THEN (oss[1] + css[1]) / 2
         |                     ELSE hcs[i-1] END) AS zs
         |            FROM (
         |              SELECT symbol, ts, qv, n, oss, css,
         |                list_transform(generate_series(1, n), i ->
         |                  (oss[i] + hss[i] + lss[i] + css[i]) / 4) AS hcs
         |              FROM (
         |                SELECT symbol, ts, qv, n,
         |                  ${redSeries("op", "2.0/11.0")} AS oss,
         |                  ${redSeries("hi", "2.0/11.0")} AS hss,
         |                  ${redSeries("lo", "2.0/11.0")} AS lss,
         |                  ${redSeries("cl", "2.0/11.0")} AS css
         |                FROM series))))) s,
         |        LATERAL (SELECT unnest(generate_series(20, n)) AS i) u))
         |  WHERE rn >= 20)""".stripMargin,
    needsSeries = true)

  /** 量能信号扫描器 (batch/tv_volume_signal.py:9-38, MA periods scaled
    * ÷5 like the other fixture scalings): 18 EMAs vs the longest one;
    * 方向 多头/空头 from ratio votes (corpus from-values dead);
    * 多头比例/空头比例 2-dp.
    */
  private val volsig = MartDef(
    key = "volsig", table = "量能信号扫描器",
    fields = Seq("vdir" -> "方向", "vbull" -> "多头比例", "vbear" -> "空头比例"),
    buildFrom = (s, dir, cframe) => {
      val periods = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20)
      // two projections instead of 36 analyzer passes (r14, guide §7.3):
      // the ma* level is independent of itself, the md* level reads ma*
      val c0 = cframe.select(col("*") +: periods.map(k =>
        ewma(s, col("close"), 2.0 / (k + 1.0)).over(run).as(s"ma$k")): _*)
      val c1 = c0.select(col("*") +: periods.map(k =>
        (col(s"ma$k") - lag(s"ma$k", 1).over(bySym)).as(s"md$k")): _*)
      val ref = col("ma20")
      val nBull = periods.map(k =>
        when(col(s"ma$k") > ref && col(s"md$k") > 0, 1).otherwise(0)).reduce(_ + _)
      val nBear = periods.map(k =>
        when(col(s"ma$k") < ref && col(s"md$k") < 0, 1).otherwise(0)).reduce(_ + _)
      val c2 = c1.withColumn("rn", row_number().over(bySym))
        .withColumn("nbull", nBull).withColumn("nbear", nBear)
        .filter(col("rn") >= 20)
      val bullR = col("nbull").cast("double") / 18.0
      val bearR = col("nbear").cast("double") / 18.0
      c2.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(bullR >= 0.7, "多头").when(bearR >= 0.7, "空头")
          .when(col("close") > ref, "多头").otherwise("空头").as("vdir"),
        (floor(bullR * 100 + 0.5) / 100).as("vbull"),
        (floor(bearR * 100 + 0.5) / 100).as("vbear"))
    },
    sqlCte = {
      val periods = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20)
      val folds = periods.map(k =>
        s"${redSeries("cl", s"2.0/${k + 1}.0")} AS ma${k}s").mkString(",\n        ")
      val bullCases = periods.map(k =>
        s"CASE WHEN ma${k}s[i] > ma20s[i] AND i > 1 AND ma${k}s[i] - ma${k}s[i-1] > 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      val bearCases = periods.map(k =>
        s"CASE WHEN ma${k}s[i] < ma20s[i] AND i > 1 AND ma${k}s[i] - ma${k}s[i-1] < 0 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""m_volsig AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN nbull / 18.0 >= 0.7 THEN '多头'
         |         WHEN nbear / 18.0 >= 0.7 THEN '空头'
         |         WHEN c > ref THEN '多头' ELSE '空头' END AS vdir,
         |    floor(nbull / 18.0 * 100 + 0.5) / 100 AS vbull,
         |    floor(nbear / 18.0 * 100 + 0.5) / 100 AS vbear
         |  FROM (
         |    SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |      cl[i] AS c, ma20s[i] AS ref, i AS rn,
         |      CAST($bullCases AS DOUBLE) AS nbull,
         |      CAST($bearCases AS DOUBLE) AS nbear
         |    FROM (
         |      SELECT symbol, ts, qv, cl, n,
         |        $folds
         |      FROM series) s,
         |      LATERAL (SELECT unnest(generate_series(20, n)) AS i) u))""".stripMargin
    },
    needsSeries = true)

  /** G，C点扫描器 (incremental/ema_gc.py:10-59): EMA 7/25/99 alignment
    * vocabulary (多头排列/偏多/空头排列/偏空/震荡 — corpus from-values
    * dead) + exponential bandwidth score (2 dp). Reference warm-up 100
    * scaled to the engine-wide 35.
    */
  private val gc = MartDef(
    key = "gc", table = "G，C点扫描器",
    fields = Seq("gdir" -> "趋势方向", "gscore" -> "带宽评分"),
    buildFrom = (s, dir, cframe) => {
      // one projection (r14, guide §7.3)
      val c = cframe.select(col("*"),
          ewma(s, col("close"), 2.0 / 8.0).over(run).as("e7"),
          ewma(s, col("close"), 2.0 / 26.0).over(run).as("e25"),
          ewma(s, col("close"), 2.0 / 100.0).over(run).as("e99"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 35)
      val p = col("close")
      val gdir = when(col("e7") > col("e25") && col("e25") > col("e99"),
          when(p >= col("e7"), "多头排列").otherwise("偏多"))
        .when(col("e7") < col("e25") && col("e25") < col("e99"),
          when(p <= col("e7"), "空头排列").otherwise("偏空"))
        .when(p > col("e99"), "偏多")
        .when(p < col("e99"), "偏空")
        .otherwise("震荡")
      val bw = (greatest(col("e7"), col("e25"), col("e99")) -
        least(col("e7"), col("e25"), col("e99"))) / abs(p)
      val score = when(p === 0.0, 0.0).otherwise(
        least(greatest(lit(100.0) * (lit(1.0) - exp(-bw / lit(0.03))), lit(0.0)),
          lit(100.0)))
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"), gdir.as("gdir"),
        (floor(score * 100 + 0.5) / 100).as("gscore"))
    },
    sqlCte = {
      val bw = "(greatest(e7, e25, e99) - least(e7, e25, e99)) / abs(c)"
      s"""m_gc AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN e7 > e25 AND e25 > e99 THEN
         |           CASE WHEN c >= e7 THEN '多头排列' ELSE '偏多' END
         |         WHEN e7 < e25 AND e25 < e99 THEN
         |           CASE WHEN c <= e7 THEN '空头排列' ELSE '偏空' END
         |         WHEN c > e99 THEN '偏多'
         |         WHEN c < e99 THEN '偏空'
         |         ELSE '震荡' END AS gdir,
         |    floor(CASE WHEN c = 0.0 THEN 0.0
         |               ELSE least(greatest(100.0 * (1.0 - exp(-($bw) / 0.03)), 0.0), 100.0)
         |          END * 100 + 0.5) / 100 AS gscore
         |  FROM (
         |    SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |      cl[i] AS c, e7s[i] AS e7, e25s[i] AS e25, e99s[i] AS e99, i AS rn
         |    FROM (
         |      SELECT symbol, ts, qv, cl, n,
         |        ${redSeries("cl", "2.0/8.0")} AS e7s,
         |        ${redSeries("cl", "2.0/26.0")} AS e25s,
         |        ${redSeries("cl", "2.0/100.0")} AS e99s
         |      FROM series) s,
         |      LATERAL (SELECT unnest(generate_series(35, n)) AS i) u))""".stripMargin
    },
    needsSeries = true)

  // ===================================================== futures pack

  /** 期货情绪聚合表 (batch/futures_aggregate.py:128-259) per bar over the
    * 5m metrics fact: 大户多空比 = sum_toptrader_long_short_ratio,
    * 全体多空比 = count_long_short_ratio, 主动成交多空比 =
    * sum_taker_long_short_vol_ratio (the reference's SELECT-order mapping,
    * futures_aggregate.py:102-121); truthy-filtered trailing windows feed
    * the Z-scores (population std), the signed OI tail streak
    * (`_尾部连续根数`: zeros extend a run, only an opposite nonzero sign
    * breaks it), the risk score (sum of present Z components) and the
    * flip signal (emitted as the STRING str(int) the engine would
    * compare — the corpus's 多翻/空翻 from-values never match, dead in
    * the reference too). `turnover` is the bucket's open-interest value
    * (the futures fact's own notional — the metrics fact carries no
    * quote turnover for the engine's gate to read).
    */
  private val fut = MartDef(
    key = "fut", table = "期货情绪聚合表",
    fields = Seq("tlsr" -> "大户多空比", "tlsvr" -> "主动成交多空比",
      "bias" -> "情绪差值", "oi_z" -> "持仓Z分数", "risk" -> "风险分",
      "streak" -> "OI连续根数", "flip" -> "情绪翻转信号"),
    buildFrom = (s, dir, cframe) => {
      val wSym = Window.partitionBy("symbol").orderBy("bucket_ts")
      // the reference pulls a TRAILING 240-bar history per evaluation
      // (futures_aggregate.py:135 `get_metrics_history(symbol, 240, ...)`)
      // — bounding the per-row stats window is both the faithful shape
      // and what keeps the replay linear in history depth (an unbounded
      // prefix made the per-symbol cost quadratic: 161 s on the 10-year
      // uni10 corpus, invisible at the fixtures' ≤240 bars)
      val wHist = wSym.rowsBetween(-239, 0)
      def truthy(c: Column) = c.isNotNull && c =!= 0.0
      def fmean(arr: Column) =
        graft.functions.ArrayFoldCols.seqSum(arr) / size(arr).cast("double")
      def pstd(arr: Column, m: Column) = sqrt(
        graft.functions.ArrayFoldCols.sumSqDev(arr, m) /
          size(arr).cast("double"))
      // each dependency level is ONE projection (r14, guide §7.3 driver
      // time): the 19-withColumn chain ran the analyzer once per call
      val c0 = Tables.metrics5m(s, dir)
        .withColumnRenamed("create_time", "bucket_ts")
        .select(col("*"),
          col("sum_open_interest_value").as("oiv"),
          col("sum_toptrader_long_short_ratio").as("tlsr0"),
          col("count_long_short_ratio").as("lsr0"),
          col("sum_taker_long_short_vol_ratio").as("tlsvr0"),
          lag("sum_open_interest_value", 1).over(wSym).as("p_oiv"),
          lag("sum_toptrader_long_short_ratio", 1).over(wSym).as("p_tlsr"),
          collect_list(
            when(col("sum_open_interest_value") =!= 0.0,
              col("sum_open_interest_value"))).over(wHist).as("oivs"),
          collect_list(
            when(col("sum_toptrader_long_short_ratio") =!= 0.0,
              col("sum_toptrader_long_short_ratio"))).over(wHist).as("tops"),
          collect_list(
            when(col("sum_taker_long_short_vol_ratio") =!= 0.0,
              col("sum_taker_long_short_vol_ratio"))).over(wHist).as("takers"))
      // Per-row derived-series stats via the tight-loop kernels
      // ([[graft.functions.ArrayFolds]] pctStats / absDev1Stats /
      // tailStreakSigned — fold orders bit-matching the oracle's
      // list_transform + list_reduce spellings). The interpreted
      // transform+fold spelling paid per-ELEMENT lambda dispatch on every
      // row's window — 50+ s at 134-bar depth; the kernels walk each
      // window array once per row in plain JVM loops. CodegenBarrier
      // wraps every multi-use stat so CollapseProject cannot re-inline
      // an alias into each of its consumers.
      val stage = graft.functions.CodegenBarrierCol.barrier _
      val kern = graft.functions.ArrayFoldCols
      val c1 = c0.select(col("*"),
        stage(when(size(col("oivs")) > 0, fmean(col("oivs")))).as("m_oiv"),
        stage(kern.pctStats(col("oivs"))).as("ps"),
        stage(kern.absDev1Stats(col("tops"))).as("ts"),
        stage(kern.absDev1Stats(col("takers"))).as("ks"),
        stage(kern.tailStreakSigned(col("oivs"))).as("streak0"))
      val c2 = c1.select(col("*"),
        stage(when(size(col("oivs")) >= 2, pstd(col("oivs"), col("m_oiv"))))
          .as("sd_oiv"),
        when(truthy(col("oiv")) && truthy(col("p_oiv")),
          nullif(col("oiv") - col("p_oiv"), lit(0.0)) / col("p_oiv"))
          .as("ocp"))
      val topDev = when(truthy(col("tlsr0")), abs(col("tlsr0") - 1))
      val takerDev = when(truthy(col("tlsvr0")), abs(col("tlsvr0") - 1))
      def zCol(v: Column, st: String): Column =
        when(col(s"$st.n") >= 2,
          when(col(s"$st.sd") === 0.0, 0.0)
            .otherwise((v - col(s"$st.m")) / col(s"$st.sd")))
      val c4 = c2.select(col("*"),
        when(col("ocp").isNotNull, zCol(col("ocp"), "ps")).as("z_delta"),
        when(truthy(topDev), zCol(topDev, "ts")).as("z_top"),
        when(truthy(takerDev), zCol(takerDev, "ks")).as("z_taker"))
      val risk = when(col("z_delta").isNotNull || col("z_top").isNotNull ||
          col("z_taker").isNotNull,
        coalesce(col("z_delta"), lit(0.0)) + coalesce(col("z_top"), lit(0.0)) +
          coalesce(col("z_taker"), lit(0.0)))
      val oiZ = when(truthy(col("oiv")) && size(col("oivs")) >= 2,
        when(col("sd_oiv") === 0.0, 0.0)
          .otherwise((col("oiv") - col("m_oiv")) / col("sd_oiv")))
      c4.select(col("symbol"), col("bucket_ts"),
        q6(col("oiv")).as("turnover"),
        q6(col("tlsr0")).as("tlsr"), q6(col("tlsvr0")).as("tlsvr"),
        q6(when(truthy(col("tlsr0")) && truthy(col("lsr0")),
          col("tlsr0") - col("lsr0"))).as("bias"),
        q6(oiZ).as("oi_z"), q6(risk).as("risk"),
        col("streak0").as("streak"),
        when(truthy(col("p_tlsr")) && truthy(col("tlsr0")),
          when(col("p_tlsr") < 1 && col("tlsr0") > 1, "1")
            .when(col("p_tlsr") > 1 && col("tlsr0") < 1, "-1")
            .otherwise("0")).otherwise("0").as("flip"))
    },
    sqlCte = {
      def fmean(a: String) =
        s"list_reduce(list_prepend(0.0, $a), (x, y) -> x + y) / len($a)"
      def pstd(a: String, m: String) =
        s"sqrt(list_reduce(list_prepend(0.0, list_transform($a, x -> (x - $m) * (x - $m))), (x, y) -> x + y) / len($a))"
      def z(v: String, a: String, m: String, sd: String) =
        s"CASE WHEN len($a) >= 2 THEN CASE WHEN $sd = 0.0 THEN 0.0 ELSE (($v) - $m) / $sd END END"
      s"""fser AS (
         |  SELECT symbol,
         |    list(create_time ORDER BY create_time) AS ct,
         |    list(sum_open_interest_value ORDER BY create_time) AS oivr,
         |    list(sum_toptrader_long_short_ratio ORDER BY create_time) AS tlsrr,
         |    list(count_long_short_ratio ORDER BY create_time) AS lsrr,
         |    list(sum_taker_long_short_vol_ratio ORDER BY create_time) AS tlsvrr,
         |    CAST(count(*) AS INT) AS n
         |  FROM metrics GROUP BY symbol),
         |fbars AS (
         |  SELECT symbol, ct[i] AS bucket_ts,
         |    oivr[i] AS oiv, tlsrr[i] AS tlsr0, lsrr[i] AS lsr0, tlsvrr[i] AS tlsvr0,
         |    CASE WHEN i > 1 THEN oivr[i-1] END AS p_oiv,
         |    CASE WHEN i > 1 THEN tlsrr[i-1] END AS p_tlsr,
    -- trailing 240-bar history (futures_aggregate.py:135), mirroring the
    -- Spark builder's bounded frame
         |    list_filter(oivr[greatest(1, i - 239):i], x -> x != 0.0) AS oivs,
         |    list_filter(tlsrr[greatest(1, i - 239):i], x -> x != 0.0) AS tops,
         |    list_filter(tlsvrr[greatest(1, i - 239):i], x -> x != 0.0) AS takers
         |  FROM fser, LATERAL (SELECT unnest(generate_series(1, n)) AS i) u),
         |fstat AS (
         |  SELECT symbol, bucket_ts, oiv, tlsr0, lsr0, tlsvr0, p_oiv, p_tlsr,
         |    oivs, tops, takers,
         |    CASE WHEN len(oivs) > 0 THEN ${fmean("oivs")} END AS m_oiv,
         |    CASE WHEN len(oivs) >= 2 THEN
         |      list_transform(generate_series(2, len(oivs)),
         |        j -> (oivs[j] - oivs[j-1]) / oivs[j-1])
         |      ELSE [] END AS dps,
         |    list_transform(tops, v -> abs(v - 1)) AS tds,
         |    list_transform(takers, v -> abs(v - 1)) AS kds,
         |    CASE WHEN len(oivs) >= 2 THEN
         |      list_transform(generate_series(2, len(oivs)),
         |        j -> CASE WHEN oivs[j] = oivs[j-1] THEN 0
         |                  WHEN oivs[j] > oivs[j-1] THEN 1 ELSE -1 END)
         |      ELSE CAST([] AS INT[]) END AS dl,
         |    CASE WHEN oiv IS NOT NULL AND oiv != 0.0
         |              AND p_oiv IS NOT NULL AND p_oiv != 0.0
         |         THEN nullif(oiv - p_oiv, 0.0) / p_oiv END AS ocp
         |  FROM fbars),
         |fstat2 AS (
         |  SELECT *, list_reverse(dl) AS rev,
         |    CASE WHEN len(oivs) >= 2 THEN ${pstd("oivs", "m_oiv")} END AS sd_oiv,
         |    CASE WHEN tlsr0 IS NOT NULL AND tlsr0 != 0.0 THEN abs(tlsr0 - 1) END AS top_dev,
         |    CASE WHEN tlsvr0 IS NOT NULL AND tlsvr0 != 0.0 THEN abs(tlsvr0 - 1) END AS taker_dev
         |  FROM fstat),
         |fstat2b AS (
         |  SELECT *,
         |    CASE WHEN len(dps) > 0 THEN ${fmean("dps")} END AS m_dps,
         |    CASE WHEN len(tds) > 0 THEN ${fmean("tds")} END AS m_tds,
         |    CASE WHEN len(kds) > 0 THEN ${fmean("kds")} END AS m_kds
         |  FROM fstat2),
         |fstat2c AS (
         |  SELECT *,
         |    CASE WHEN len(dps) >= 2 THEN ${pstd("dps", "m_dps")} END AS sd_dps,
         |    CASE WHEN len(tds) >= 2 THEN ${pstd("tds", "m_tds")} END AS sd_tds,
         |    CASE WHEN len(kds) >= 2 THEN ${pstd("kds", "m_kds")} END AS sd_kds
         |  FROM fstat2b),
         |fstat3 AS (
         |  SELECT *,
         |    (list_filter(rev, x -> x != 0))[1] AS s0,
         |    CASE WHEN ocp IS NOT NULL
         |         THEN ${z("ocp", "dps", "m_dps", "sd_dps")} END AS z_delta,
         |    CASE WHEN top_dev IS NOT NULL AND top_dev != 0.0
         |         THEN ${z("top_dev", "tds", "m_tds", "sd_tds")} END AS z_top,
         |    CASE WHEN taker_dev IS NOT NULL AND taker_dev != 0.0
         |         THEN ${z("taker_dev", "kds", "m_kds", "sd_kds")} END AS z_taker
         |  FROM fstat2c),
         |fstat4 AS (
         |  SELECT *,
         |    CASE WHEN s0 IS NULL THEN 0
         |         ELSE coalesce(
         |           list_aggregate(list_filter(
         |             list_transform(generate_series(1, len(rev)),
         |               j -> CASE WHEN rev[j] != 0 AND rev[j] != s0 THEN j END),
         |             x -> x IS NOT NULL), 'min') - 1,
         |           len(rev)) END AS mag
         |  FROM fstat3),
         |m_fut AS (
         |  SELECT symbol, bucket_ts, ${q6s("oiv")} AS turnover,
         |    ${q6s("tlsr0")} AS tlsr, ${q6s("tlsvr0")} AS tlsvr,
         |    ${q6s("CASE WHEN tlsr0 IS NOT NULL AND tlsr0 != 0.0 AND lsr0 IS NOT NULL AND lsr0 != 0.0 THEN tlsr0 - lsr0 END")} AS bias,
         |    ${q6s("CASE WHEN oiv IS NOT NULL AND oiv != 0.0 AND len(oivs) >= 2 " +
                "THEN CASE WHEN sd_oiv = 0.0 THEN 0.0 ELSE (oiv - m_oiv) / sd_oiv END END")} AS oi_z,
         |    ${q6s("CASE WHEN z_delta IS NOT NULL OR z_top IS NOT NULL OR z_taker IS NOT NULL " +
                "THEN coalesce(z_delta, 0.0) + coalesce(z_top, 0.0) + coalesce(z_taker, 0.0) END")} AS risk,
         |    CASE WHEN len(dl) = 0 THEN NULL
         |         WHEN s0 IS NULL THEN 0
         |         WHEN s0 > 0 THEN mag ELSE -mag END AS streak,
         |    CASE WHEN p_tlsr IS NOT NULL AND p_tlsr != 0.0
         |              AND tlsr0 IS NOT NULL AND tlsr0 != 0.0
         |         THEN CASE WHEN p_tlsr < 1 AND tlsr0 > 1 THEN '1'
         |                   WHEN p_tlsr > 1 AND tlsr0 < 1 THEN '-1'
         |                   ELSE '0' END
         |         ELSE '0' END AS flip
         |  FROM fstat4)""".stripMargin
    },
    needsMetrics = true)

  // ===================================================== pattern pack

  /** K线形态扫描器 (batch/k_pattern.py) per DAILY bar: the engine's full
    * i20 candle-rule battery ([[graft.indicators.KRules]] — shared-dialect
    * SQL reused VERBATIM in both engines) plus the i20b chart shapes
    * (head-and-shoulders / double top-bottom over trailing confirmed ±2
    * pivots, visibility bounded at the scanner's 50-bar lookback —
    * k_pattern.py:206) evaluated causally per bar. 形态类型 joins the Chinese names
    * the corpus's CONTAINS rules substring-match (头肩/双/锤子/吞没/十字
    * live; 三角/楔形 have no detector in the engine's i20b shape set —
    * that one rule stays empty here). Channel shapes gate no rule and are
    * omitted from the per-bar series.
    */
  private val kpat = MartDef(
    key = "kpat", table = "K线形态扫描器",
    fields = Seq("ptype" -> "形态类型", "pstr" -> "强度"),
    buildFrom = (s, dir, cframe) => {
      import graft.indicators.{KRules, Windows}
      import Windows.{bySymbol, lag1, lagN, meanOf}
      // one projection per dependency level (r14, guide §7.3): the lag
      // columns and abf are independent, ab reads abf
      val daily = graft.operators.Rollup.rollup(cframe, 86400L)
        .select(col("*"),
          lag1(col("open")).as("po"), lag1(col("close")).as("pc"),
          lag1(col("high")).as("ph"), lag1(col("low")).as("pl"),
          lagN(col("open"), 2).as("o2"), lagN(col("close"), 2).as("c2"),
          lagN(col("high"), 2).as("h2"), lagN(col("low"), 2).as("l2"),
          lagN(col("open"), 3).as("o3"), lagN(col("close"), 3).as("c3"),
          lagN(col("high"), 3).as("h3"), lagN(col("low"), 3).as("l3"),
          lagN(col("open"), 4).as("o4"), lagN(col("close"), 4).as("c4"),
          lagN(col("high"), 4).as("h4"), lagN(col("low"), 4).as("l4"),
          collect_list(abs(col("close") - col("open")))
            .over(bySymbol.rowsBetween(-10, -1)).as("abf"))
        .withColumn("ab", when(size(col("abf")) > 0, meanOf(col("abf"))))
      // trailing confirmed ±2 pivots for the chart shapes
      val wc = bySymbol.rowsBetween(-2, 2)
      val piv = daily
        .select(col("*"),
          (count(lit(1)).over(wc) === 5 &&
            col("high") === max(col("high")).over(wc)).as("isph"),
          (count(lit(1)).over(wc) === 5 &&
            col("low") === min(col("low")).over(wc)).as("ispl"))
        // The scanner's poll sees only the trailing 50 bars
        // (k_pattern.py:206 lookback=50), so each bar's visible pivots
        // are bounded at that frame — the faithful shape, and it caps
        // per-row pivot-list work at O(50) regardless of history depth
        // (the unbounded spelling grew with the partition). Pivot
        // CONFIRMATION (isph/ispl) stays global ±2 — only visibility is
        // windowed. Accepted edge (r8 ADVICE): a pivot at the far LEFT
        // of the 50-bar frame whose ±2 confirming neighbors precede the
        // frame is visible here though the reference's own 50-bar poll
        // could not have confirmed it. Both this engine and the DuckDB
        // oracle confirm globally, so they agree with each other; the
        // divergence would only surface against the live reference, on
        // shapes anchored ≥48 bars back — beyond every rule's pattern
        // depth (the shape rules read the LAST 2-3 pivots, which sit
        // well inside the frame on any bar that fires).
        .select(col("*"),
          collect_list(when(col("isph"),
            struct(col("bucket_ts").as("ts"), col("high").as("v"))))
            .over(bySymbol.rowsBetween(-49, -2)).as("hs"),
          collect_list(when(col("ispl"),
            struct(col("bucket_ts").as("ts"), col("low").as("v"))))
            .over(bySymbol.rowsBetween(-49, -2)).as("ls"))
      def lastV(a: String, i: Int) = try_element_at(col(a), lit(-i)).getField("v")
      def lastT(a: String, i: Int) = try_element_at(col(a), lit(-i)).getField("ts")
      val (h1, h2v, h3v) = (lastV("hs", 1), lastV("hs", 2), lastV("hs", 3))
      val (l1, l2v, l3v) = (lastV("ls", 1), lastV("ls", 2), lastV("ls", 3))
      val neckLow = array_min(transform(filter(col("ls"),
        x => x("ts") > lastT("hs", 2) && x("ts") < lastT("hs", 1)), x => x("v")))
      val neckHigh = array_max(transform(filter(col("hs"),
        x => x("ts") > lastT("ls", 2) && x("ts") < lastT("ls", 1)), x => x("v")))
      val shapes: Seq[(String, Column, Double)] = Seq(
        ("头肩顶", size(col("hs")) >= 3 && h2v > h3v && h2v > h1 &&
          abs(h3v - h1) <= lit(0.02) * h2v, 1.5),
        ("头肩底", size(col("ls")) >= 3 && l2v < l3v && l2v < l1 &&
          abs(l3v - l1) <= lit(0.02) * l2v, 1.5),
        ("双顶", size(col("hs")) >= 2 && abs(h1 - h2v) <= lit(0.015) * greatest(h1, h2v) &&
          neckLow.isNotNull && neckLow <= lit(0.98) * least(h1, h2v), 1.2),
        ("双底", size(col("ls")) >= 2 && abs(l1 - l2v) <= lit(0.015) * greatest(l1, l2v) &&
          neckHigh.isNotNull && neckHigh >= lit(1.02) * greatest(l1, l2v), 1.2))
      val vocab = piv
        .filter(col("o3").isNotNull)
        .withColumns(KRules.VOCAB1.map { case (n, c) => n -> expr(c) }.toMap)
        .withColumns(KRules.VOCAB2.map { case (n, c) => n -> expr(c) }.toMap)
      val names = concat_ws(",",
        (KRules.RULES.map { case (nm, c, _) => when(expr(c), nm) } ++
          shapes.map { case (nm, c, _) => when(coalesce(c, lit(false)), nm) }): _*)
      val strength = (KRules.RULES.map { case (_, c, w) =>
          when(expr(c), w).otherwise(0.0) } ++
        shapes.map { case (_, c, w) =>
          when(coalesce(c, lit(false)), w).otherwise(0.0) }).reduce(_ + _)
      vocab.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        names.as("ptype"), q6(strength).as("pstr"))
    },
    sqlCte = {
      import graft.indicators.KRules
      val shapes: Seq[(String, String, Double)] = Seq(
        ("头肩顶", "len(hs) >= 3 AND (hs[-2]).v > (hs[-3]).v AND (hs[-2]).v > (hs[-1]).v " +
          "AND abs((hs[-3]).v - (hs[-1]).v) <= 0.02 * (hs[-2]).v", 1.5),
        ("头肩底", "len(ls) >= 3 AND (ls[-2]).v < (ls[-3]).v AND (ls[-2]).v < (ls[-1]).v " +
          "AND abs((ls[-3]).v - (ls[-1]).v) <= 0.02 * (ls[-2]).v", 1.5),
        ("双顶", "len(hs) >= 2 AND abs((hs[-1]).v - (hs[-2]).v) <= 0.015 * greatest((hs[-1]).v, (hs[-2]).v) " +
          "AND neck_low IS NOT NULL AND neck_low <= 0.98 * least((hs[-1]).v, (hs[-2]).v)", 1.2),
        ("双底", "len(ls) >= 2 AND abs((ls[-1]).v - (ls[-2]).v) <= 0.015 * greatest((ls[-1]).v, (ls[-2]).v) " +
          "AND neck_high IS NOT NULL AND neck_high >= 1.02 * greatest((ls[-1]).v, (ls[-2]).v)", 1.2))
      def fl(c: String) = s"coalesce($c, FALSE)"
      val names = (KRules.RULES.map { case (nm, c, _) =>
          s"CASE WHEN $c THEN '$nm' END" } ++
        shapes.map { case (nm, c, _) => s"CASE WHEN ${fl(c)} THEN '$nm' END" })
        .mkString(",\n      ")
      val strength = (KRules.RULES.map { case (_, c, w) =>
          s"CASE WHEN $c THEN $w ELSE 0.0 END" } ++
        shapes.map { case (_, c, w) => s"CASE WHEN ${fl(c)} THEN $w ELSE 0.0 END" })
        .mkString(" + ")
      s"""kdaily AS (
         |  SELECT symbol, dts AS bucket_ts, open, high, low, close, qv FROM (
         |    SELECT symbol, bucket_ts // 86400 * 86400 AS dts,
         |           min_by(open, bucket_ts) AS open, max(high) AS high,
         |           min(low) AS low, max_by(close, bucket_ts) AS close,
         |           sum(quote_volume) AS qv
         |    FROM candles GROUP BY 1, 2)),
         |kpiv AS (
         |  SELECT *,
         |    count(*) OVER wc5 = 5 AND high = max(high) OVER wc5 AS isph,
         |    count(*) OVER wc5 = 5 AND low = min(low) OVER wc5 AS ispl
         |  FROM kdaily
         |  WINDOW wc5 AS (PARTITION BY symbol ORDER BY bucket_ts
         |                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
         |kpiv2 AS (
         |  SELECT symbol, bucket_ts, open, high, low, close, qv,
         |    list_filter(list(CASE WHEN isph THEN struct_pack(ts := bucket_ts, v := high) END)
         |      OVER wtrail, x -> x IS NOT NULL) AS hs,
         |    list_filter(list(CASE WHEN ispl THEN struct_pack(ts := bucket_ts, v := low) END)
         |      OVER wtrail, x -> x IS NOT NULL) AS ls
         |  FROM kpiv
         |  WINDOW wtrail AS (PARTITION BY symbol ORDER BY bucket_ts
         |                    ROWS BETWEEN 49 PRECEDING AND 2 PRECEDING)),
         |kpiv3 AS (
         |  SELECT *,
         |    list_aggregate(list_transform(list_filter(ls,
         |      x -> len(hs) >= 2 AND x.ts > (hs[-2]).ts AND x.ts < (hs[-1]).ts),
         |      x -> x.v), 'min') AS neck_low,
         |    list_aggregate(list_transform(list_filter(hs,
         |      x -> len(ls) >= 2 AND x.ts > (ls[-2]).ts AND x.ts < (ls[-1]).ts),
         |      x -> x.v), 'max') AS neck_high
         |  FROM kpiv2),
         |m_kpat AS (
         |  SELECT symbol, bucket_ts, ${q6s("qv")} AS turnover,
         |    concat_ws(',',
         |      $names) AS ptype,
         |    ${q6s(strength)} AS pstr
         |  FROM (
         |    SELECT *, ${KRules.VOCAB2.map { case (n, c) => s"$c AS $n" }.mkString(",\n      ")}
         |    FROM (
         |    SELECT *, ${KRules.VOCAB1.map { case (n, c) => s"$c AS $n" }.mkString(",\n      ")}
         |    FROM (
         |    SELECT symbol, bucket_ts, open, high, low, close, qv, hs, ls,
         |           neck_low, neck_high,
         |           lag(open) OVER wk AS po, lag(close) OVER wk AS pc,
         |           lag(high) OVER wk AS ph, lag(low) OVER wk AS pl,
         |           lag(open, 2) OVER wk AS o2, lag(close, 2) OVER wk AS c2,
         |           lag(high, 2) OVER wk AS h2, lag(low, 2) OVER wk AS l2,
         |           lag(open, 3) OVER wk AS o3, lag(close, 3) OVER wk AS c3,
         |           lag(high, 3) OVER wk AS h3, lag(low, 3) OVER wk AS l3,
         |           lag(open, 4) OVER wk AS o4, lag(close, 4) OVER wk AS c4,
         |           lag(high, 4) OVER wk AS h4, lag(low, 4) OVER wk AS l4,
         |           CASE WHEN len(abf) > 0
         |                THEN list_reduce(list_prepend(0.0, abf), (a, x) -> a + x) / len(abf)
         |           END AS ab
         |    FROM (
         |      SELECT *, list(abs(close - open))
         |          OVER (PARTITION BY symbol ORDER BY bucket_ts
         |                ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS abf
         |      FROM kpiv3)
         |    WINDOW wk AS (PARTITION BY symbol ORDER BY bucket_ts))))
         |  WHERE o3 IS NOT NULL)""".stripMargin
    })

  /** 大资金操盘扫描器 (batch/tv_big_money.py:54-83 structure core) per
    * bar: last confirmed ±5 pivot levels, EMA34 bias (多头/空头 —
    * tv_big_money.py:183), breakout/reversal event vocabulary and the
    * structure score. The order-block/FVG/zone score components are
    * last-window lookbacks omitted from the per-bar twin (documented;
    * every corpus rule on this table expects 看涨/看跌/BOS/CHoCH values
    * the scanner never emits — dead in the reference too).
    */
  private val smc = MartDef(
    key = "smc", table = "大资金操盘扫描器",
    fields = Seq("event" -> "结构事件", "bias_d" -> "偏向", "score" -> "评分"),
    buildFrom = (s, dir, cframe) => {
      val wc = bySym.rowsBetween(-5, 5)
      // one projection per dependency level (r14, guide §7.3): the nb11
      // gate inlines into isph/ispl (same window spec — one physical pass)
      val c = cframe.select(col("*"),
          (count(lit(1)).over(wc) === 11 &&
            col("high") === max(col("high")).over(wc)).as("isph"),
          (count(lit(1)).over(wc) === 11 &&
            col("low") === min(col("low")).over(wc)).as("ispl"))
        .select(col("*"),
          last(when(col("isph"), col("high")), ignoreNulls = true)
            .over(bySym.rowsBetween(Window.unboundedPreceding, -5)).as("sh"),
          last(when(col("ispl"), col("low")), ignoreNulls = true)
            .over(bySym.rowsBetween(Window.unboundedPreceding, -5)).as("sl"),
          ewma(s, col("close"), 2.0 / 35.0).over(run).as("ema34"),
          row_number().over(bySym).as("rn"))
        .filter(col("rn") >= 35)
      val bull = col("close") >= col("ema34")
      val brkUp = col("sh").isNotNull && col("close") > col("sh")
      val brkDn = col("sl").isNotNull && col("close") < col("sl")
      val revDn = bull && brkDn
      val revUp = !bull && brkUp
      val event = when(revDn, "结构反转向下").when(revUp, "结构反转向上")
        .when(brkDn, "空头突破").when(brkUp, "多头突破").otherwise("区间震荡")
      val score = when(brkUp, 3.5).otherwise(0.0) +
        when(brkDn, -3.5).otherwise(0.0) +
        when(revDn, -4.5).otherwise(0.0) + when(revUp, 4.5).otherwise(0.0)
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"), event.as("event"),
        when(bull, "多头").otherwise("空头").as("bias_d"),
        q6(score).as("score"))
    },
    sqlCte = {
      val bull = "close >= ema34"
      val brkUp = "sh IS NOT NULL AND close > sh"
      val brkDn = "sl IS NOT NULL AND close < sl"
      s"""m_smc AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN ($bull) AND ($brkDn) THEN '结构反转向下'
         |         WHEN NOT ($bull) AND ($brkUp) THEN '结构反转向上'
         |         WHEN $brkDn THEN '空头突破'
         |         WHEN $brkUp THEN '多头突破'
         |         ELSE '区间震荡' END AS event,
         |    CASE WHEN $bull THEN '多头' ELSE '空头' END AS bias_d,
         |    ${q6s(s"(CASE WHEN $brkUp THEN 3.5 ELSE 0.0 END) + " +
              s"(CASE WHEN $brkDn THEN -3.5 ELSE 0.0 END) + " +
              s"(CASE WHEN ($bull) AND ($brkDn) THEN -4.5 ELSE 0.0 END) + " +
              s"(CASE WHEN NOT ($bull) AND ($brkUp) THEN 4.5 ELSE 0.0 END)")} AS score
         |  FROM (
         |    SELECT symbol, ts[i] AS bucket_ts, ${q6s("qv[i]")} AS turnover,
         |      cl[i] AS close, e34s[i] AS ema34,
         |      (list_filter(phl[1:greatest(i - 5, 0)], x -> x IS NOT NULL))[-1] AS sh,
         |      (list_filter(pll[1:greatest(i - 5, 0)], x -> x IS NOT NULL))[-1] AS sl
         |    FROM (
         |      SELECT symbol, ts, qv, cl, n, ${redSeries("cl", "2.0/35.0")} AS e34s,
         |        list_transform(generate_series(1, n), j ->
         |          CASE WHEN j > 5 AND j <= n - 5
         |                    AND hi[j] >= list_aggregate(hi[j-5:j+5], 'max')
         |               THEN hi[j] END) AS phl,
         |        list_transform(generate_series(1, n), j ->
         |          CASE WHEN j > 5 AND j <= n - 5
         |                    AND lo[j] <= list_aggregate(lo[j-5:j+5], 'min')
         |               THEN lo[j] END) AS pll
         |      FROM series) s,
         |      LATERAL (SELECT unnest(generate_series(35, n)) AS i) u))""".stripMargin
    },
    needsSeries = true)

  /** 量能斐波狙击扫描器 (batch/tv_fib_sniper.py:14-96, LENGTH scaled
    * 200→20): VWMA basis over hlc3, 方向 = 多头 iff close ≥ basis
    * (多头/空头 — corpus from-values dead); 价格区域 collapsed to the
    * basis side ± one σ band (the full fib-ratio ladder feeds only
    * message text — documented simplification).
    */
  private val fib = MartDef(
    key = "fib", table = "量能斐波狙击扫描器",
    fields = Seq("fdir" -> "方向", "fzone" -> "价格区域"),
    buildFrom = (s, dir, cframe) => {
      import graft.indicators.Windows.{meanOf, stdOf}
      val hlc3 = (col("high") + col("low") + col("close")) / 3
      // one projection per dependency level (r14, guide §7.3)
      val c = cframe
        .withColumn("src", hlc3)
        .select(col("*"),
          (sum(col("src") * col("volume")).over(lastN(20)) /
            nullif(sum(col("volume")).over(lastN(20)), lit(0.0))).as("basis"),
          collect_list(col("src")).over(lastN(20)).as("frame"),
          row_number().over(bySym).as("rn"))
        .withColumn("m", meanOf(col("frame")))
        .withColumn("dev", lit(2.0) * stdOf(col("frame"), col("m"), 1))
        .filter(col("rn") >= 30)
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(col("basis").isNull, "震荡")
          .when(col("close") >= col("basis"), "多头").otherwise("空头").as("fdir"),
        when(col("basis").isNull || col("dev").isNull, "等待")
          .when(abs(col("close") - col("basis")) <= col("dev"), "中间")
          .when(col("close") > col("basis"), "上通道").otherwise("下通道").as("fzone"))
    },
    sqlCte =
      s"""m_fib AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    CASE WHEN basis IS NULL THEN '震荡'
         |         WHEN close >= basis THEN '多头' ELSE '空头' END AS fdir,
         |    CASE WHEN basis IS NULL OR dev IS NULL THEN '等待'
         |         WHEN abs(close - basis) <= dev THEN '中间'
         |         WHEN close > basis THEN '上通道' ELSE '下通道' END AS fzone
         |  FROM (
         |    SELECT symbol, bucket_ts, quote_volume, close, basis,
         |      2.0 * sqrt(list_reduce(list_prepend(0.0,
         |        list_transform(frame, x -> (x - m) * (x - m))), (a, x) -> a + x)
         |        / (len(frame) - 1)) AS dev,
         |      row_number() OVER ($W) AS rn
         |    FROM (
         |      SELECT symbol, bucket_ts, quote_volume, close, frame,
         |        sum(src * volume) OVER ($W ${fr(20)}) /
         |          nullif(sum(volume) OVER ($W ${fr(20)}), 0.0) AS basis,
         |        list_reduce(list_prepend(0.0, frame), (a, x) -> a + x) / len(frame) AS m
         |      FROM (
         |        SELECT symbol, bucket_ts, quote_volume, close, volume, src,
         |          list(src) OVER ($W ${fr(20)}) AS frame
         |        FROM (
         |          SELECT *, (high + low + close) / 3 AS src FROM candles))))
         |  WHERE rn >= 30)""".stripMargin)

  /** VPVR排行生成器 (batch/vpvr.py:29-118) per bar over a trailing
    * 60-bar window: 12-bin close-volume histogram, POC = argmax bin,
    * 价值区位置 vocabulary 价值区上方/内/下方 (vpvr.py:102-106; the
    * corpus's 上方/下方 from-values never match — dead in the reference
    * too). The iterative 70%-coverage value-area expansion collapses to
    * a ±1-bin band around the POC (documented simplification).
    */
  private val vpvr = MartDef(
    key = "vpvr", table = "VPVR排行生成器",
    fields = Seq("vpos" -> "价值区位置", "poc" -> "控制点价格"),
    buildFrom = (s, dir, cframe) => {
      // The 12-bin histogram ran as a transform(sequence(0,11)) of
      // filter+aggregate HOFs — ~720 interpreted lambda dispatches per
      // row, the whole-corpus passes' single largest cost at depth. One
      // tight-loop kernel ([[graft.functions.ArrayFolds.vpvrPoc]], fold
      // orders bit-matching the oracle's list_filter/list_reduce
      // spelling; KernelSpec pins it against the old HOF twin) walks the
      // window once per row. CodegenBarrier pins the struct to a single
      // evaluation across its three consumers.
      val c = cframe
        .withColumn("cf", collect_list(struct(col("close").as("p"),
          col("volume").as("v"))).over(lastN(60)))
        .withColumn("rn", row_number().over(bySym))
        .filter(col("rn") >= 30)
        .withColumn("vp", graft.functions.CodegenBarrierCol.barrier(
          graft.functions.ArrayFoldCols.vpvrPoc(col("cf"), col("close"))))
      c.select(col("symbol"), col("bucket_ts"),
        q6(col("quote_volume")).as("turnover"),
        when(col("vp.mybin") > col("vp.pocb") + 1, "价值区上方")
          .when(col("vp.mybin") < col("vp.pocb") - 1, "价值区下方")
          .otherwise("价值区内").as("vpos"),
        q6(col("vp.poc")).as("poc"))
    },
    sqlCte = {
      val binOf = (p: String) =>
        s"least(floor(($p - plo) / nullif(phi - plo, 0.0) * 12), 11.0)"
      s"""m_vpvr AS (
         |  SELECT symbol, bucket_ts, turnover,
         |    CASE WHEN mybin > pocb + 1 THEN '价值区上方'
         |         WHEN mybin < pocb - 1 THEN '价值区下方'
         |         ELSE '价值区内' END AS vpos,
         |    ${q6s("CASE WHEN phi = plo THEN close ELSE plo + (pocb + 0.5) * (phi - plo) / 12 END")} AS poc
         |  FROM (
         |    SELECT symbol, bucket_ts, turnover, close, plo, phi,
         |      CAST(list_position(bins, list_aggregate(bins, 'max')) - 1 AS DOUBLE) AS pocb,
         |      CASE WHEN phi = plo THEN 0.0 ELSE ${binOf("close")} END AS mybin
         |    FROM (
         |      SELECT symbol, bucket_ts, turnover, close, plo, phi,
         |        list_transform(generate_series(0, 11), b ->
         |          list_reduce(list_prepend(0.0, list_transform(
         |            list_filter(cf, x -> ${binOf("x.p")} = CAST(b AS DOUBLE)),
         |            x -> x.v)), (a, y) -> a + y)) AS bins
         |      FROM (
         |        SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover, close,
         |          list(struct_pack(p := close, v := volume)) OVER ($W ${fr(60)}) AS cf,
         |          list_aggregate(list(close) OVER ($W ${fr(60)}), 'min') AS plo,
         |          list_aggregate(list(close) OVER ($W ${fr(60)}), 'max') AS phi,
         |          row_number() OVER ($W) AS rn
         |        FROM candles)
         |      WHERE rn >= 30)))""".stripMargin
    })

  /** All mart series, keyed by ascii table key. */
  val all: Map[String, MartDef] =
    Seq(macd, obv, cvd, volratio, taker,
      base, liquidity, scalping,
      boll, atr, donchian, keltner, sr, vwap,
      cci, wr, mfi, adx, harmonic, kdj, rsi,
      strend, precise, tline, ichi, zl, cloud, ha, volsig, gc, fut,
      kpat, smc, fib, vpvr)
      .map(d => d.key -> d).toMap
}
