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
    build: (SparkSession, String) => DataFrame,
    sqlCte: String,
    needsSeries: Boolean = false,
    needsMetrics: Boolean = false)

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

  private def candles(s: SparkSession, dir: String) = Tables.candles(s, dir)

  // DuckDB prefix-fold helpers (the Ewma-pack oracle idiom:
  // indicators/Ewma.scala — list_reduce folds in graft.Series.ewma's op
  // order, per-index series via generate_series).
  private[signals] def red(l: String, alpha: String): String =
    s"list_reduce($l, (acc, x) -> ($alpha) * x + (1.0 - ($alpha)) * acc)"
  private[signals] def redSeries(l: String, alpha: String): String =
    s"list_transform(generate_series(1, len($l)), i -> ${red(s"($l)[1:i]", alpha)})"
  /** Skip-null EWMA series (pandas ewm skip-NaN; [[graft.functions.Ewma]]
    * carries state through nulls): fold the null-filtered prefix.
    */
  private[signals] def redSeriesSkipNull(l: String, alpha: String): String =
    s"""list_transform(generate_series(1, len($l)),
       |      i -> ${red(s"list_filter(($l)[1:i], x -> x IS NOT NULL)", alpha)})""".stripMargin

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
    build = (s, dir) => {
      val c = candles(s, dir)
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
    build = (s, dir) =>
      candles(s, dir)
        .withColumn("d",
          coalesce(signum(col("close") - lag("close", 1).over(bySym)), lit(0.0)))
        .withColumn("obv", sum(col("d") * col("volume")).over(run))
        .withColumn("base", lag("obv", 29).over(bySym))
        .withColumn("rn", row_number().over(bySym))
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
    build = (s, dir) =>
      candles(s, dir)
        .withColumn("cvd",
          sum(lit(2.0) * col("taker_buy_volume") - col("volume")).over(run))
        .withColumn("rn", row_number().over(bySym))
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
    build = (s, dir) =>
      candles(s, dir)
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
    build = (s, dir) =>
      candles(s, dir)
        .filter(col("volume") > 0.0)
        .select(col("symbol"), col("bucket_ts"),
          q6(col("quote_volume")).as("turnover"),
          q6(col("taker_buy_volume") / col("volume")).as("bsr")),
    sqlCte =
      s"""m_taker AS (
         |  SELECT symbol, bucket_ts, ${q6s("quote_volume")} AS turnover,
         |    ${q6s("taker_buy_volume / volume")} AS bsr
         |  FROM candles WHERE volume > 0.0)""".stripMargin)

  /** All mart series, keyed by ascii table key. */
  val all: Map[String, MartDef] =
    Seq(macd, obv, cvd, volratio, taker).map(d => d.key -> d).toMap
}
