package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Indicator-mart fidelity layer (SURVEY.md §1.1 "indicator mart" +
  * hard part (e)).
  *
  * The reference writes one wide table per indicator into SQLite with the
  * registry's Chinese table names and a fixed leading-column contract
  * `交易对, 周期, 数据时间` (symbol / interval / ISO data time —
  * trading-service/src/indicators/base.py:6-10,64-75). A user of the
  * reference addresses tables and columns by those exact names, so the
  * rebuild keeps them verbatim: [[asMartRow]] adapts any graft indicator
  * output to the mart row contract, and [[RegistryNames]] carries the
  * query-key → registry-table-name mapping
  * (base.py:79-125 `@register` names).
  */
object Mart {

  /** Adapt an indicator output frame (symbol, bucket_ts, fields...) to the
    * reference mart row contract: fixed leading columns
    * `交易对, 周期, 数据时间`, then the indicator fields unchanged.
    * Backtick-quoting is only needed in SQL text; as `Column`s the Chinese
    * names are plain identifiers.
    */
  def asMartRow(df: DataFrame, interval: String): DataFrame = {
    val rest = df.columns.filterNot(Set("symbol", "bucket_ts").contains)
    df.select(
      col("symbol").as("交易对") +:
        lit(interval).as("周期") +:
        date_format(timestamp_seconds(col("bucket_ts")), "yyyy-MM-dd HH:mm:ss")
          .as("数据时间") +:
        rest.map(col): _*)
  }

  /** Separator for the fused multi-interval composite key
    * ([[graft.operators.Cycle.fusedFrame]]): U+0001 can never occur in a
    * symbol (the t16 merge-marker precedent).
    */
  val IvTagSep = "\u0001"

  /** [[asMartRow]] for a fused multi-interval frame whose symbol carries
    * the interval tag `symbol + IvTagSep + iv`: the tag splits back into
    * the (交易对, 周期) mart key columns.
    */
  def asMartRowTagged(df: DataFrame): DataFrame = {
    val rest = df.columns.filterNot(Set("symbol", "bucket_ts").contains)
    df.select(
      substring_index(col("symbol"), IvTagSep, 1).as("交易对") +:
        substring_index(col("symbol"), IvTagSep, -1).as("周期") +:
        date_format(timestamp_seconds(col("bucket_ts")), "yyyy-MM-dd HH:mm:ss")
          .as("数据时间") +:
        rest.map(col): _*)
  }

  /** S7 mart sink with the reference's schema-on-write DRIFT TOLERANCE
    * (db/reader.py:262-279): the writer aligns the incoming frame to the
    * union of stored+incoming columns — columns the batch lacks pad with
    * NULL, new columns extend the table (old rows read NULL there) — and
    * upserts by the mart key (`交易对, 周期, 数据时间`): stored rows with
    * an incoming key are replaced (the reference's DELETE-then-INSERT,
    * reader.py:253-260), others kept. The rewrite lands in a scratch dir
    * and swaps in atomically — the parquet analogue of SQLite's
    * transactional table rewrite. Mart tables are latest-snapshot sized
    * (≤ retention × symbols rows), so the rewrite is small by
    * construction; the 100 TB fact stores never go through this path.
    */
  def upsertMart(spark: org.apache.spark.sql.SparkSession, path: String,
      incoming: DataFrame): Unit = {
    val keys = Seq("交易对", "周期", "数据时间")
    require(keys.forall(incoming.columns.contains),
      s"mart frame must carry the ${keys.mkString("/")} contract")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      incoming.write.parquet(path)
      return
    }
    val stored = spark.read.parquet(path)
    val allCols = stored.columns ++
      incoming.columns.filterNot(stored.columns.contains)
    val typeOf: Map[String, org.apache.spark.sql.types.DataType] =
      (stored.schema.fields ++ incoming.schema.fields)
        .map(f => f.name -> f.dataType).toMap
    def align(df: DataFrame) = df.select(allCols.toSeq.map(c =>
      if (df.columns.contains(c)) col(c)
      else lit(null).cast(typeOf(c)).as(c)): _*)
    val kept = align(stored)
      .join(incoming.select(keys.map(col): _*), keys, "left_anti")
    val out = kept.unionByName(align(incoming))
    val tmp = new org.apache.hadoop.fs.Path(path + "__rewrite")
    out.write.mode("overwrite").parquet(tmp.toString)
    val dest = new org.apache.hadoop.fs.Path(path)
    fs.delete(dest, true)
    fs.rename(tmp, dest)
    ()
  }

  /** Filesystem name for a mart table directory. The reference's table
    * names are Chinese SQLite identifiers (base.py:79-125); on a
    * filesystem store the directory name must survive any JVM locale
    * (a non-UTF-8 `sun.jnu.encoding` rejects raw CJK paths), so non-ASCII
    * names are percent-encoded on disk and decoded on listing
    * ([[tableName]]). ASCII names round-trip unchanged.
    */
  def tableDirName(table: String): String =
    java.net.URLEncoder.encode(table, java.nio.charset.StandardCharsets.UTF_8)

  /** Inverse of [[tableDirName]]. */
  def tableName(dirName: String): String =
    java.net.URLDecoder.decode(dirName, java.nio.charset.StandardCharsets.UTF_8)

  /** Query key → reference registry table name (indicators/base.py:79-125;
    * the lean-indicator set registers under ASCII names).
    */
  val RegistryNames: Map[String, String] = Map(
    "i01_base_data" -> "基础数据同步器",
    "i02_atr" -> "ATR波幅扫描器",
    "i03_kdj" -> "KDJ随机指标扫描器",
    "i04_macd" -> "MACD柱状扫描器",
    "i05_obv" -> "OBV能量潮扫描器",
    "i06_cvd" -> "CVD信号排行榜",
    "i07_buy_sell_ratio" -> "主动买卖比扫描器",
    "i08_ema_gc" -> "G，C点扫描器",
    "i09_futures_sentiment" -> "期货情绪元数据",
    "i10_bollinger" -> "布林带扫描器",
    "i11_mfi" -> "MFI资金流量扫描器",
    "i12_volume_ratio" -> "成交量比率扫描器",
    "i13_vwap" -> "VWAP离线信号扫描",
    "i14_support_resistance" -> "全量支撑阻力扫描器",
    "i15_harmonic" -> "谐波信号扫描器",
    "i16_scalping" -> "剥头皮信号扫描器",
    "i17_super_trend_zl" -> "超级精准趋势扫描器",
    "i18_liquidity" -> "流动性扫描器",
    "i19_trend_line" -> "趋势线榜单",
    "i20_k_pattern" -> "K线形态扫描器",
    "i20b_chart_pattern" -> "K线形态扫描器", // price shapes land in the same mart table (k_pattern.py:232)
    "i21_vpvr" -> "VPVR排行生成器",
    "i22_rsi" -> "智能RSI扫描器",
    "i23_big_money" -> "大资金操盘扫描器",
    "i24_fib_sniper" -> "量能斐波狙击扫描器",
    "i25_ha_long_short" -> "多空信号扫描器",
    "i26_trend_cloud" -> "趋势云反转扫描器",
    "i27_ema_ribbon" -> "量能信号扫描器",
    "i28_zero_lag" -> "零延迟趋势扫描器",
    "i29_supertrend" -> "SuperTrend",
    "i30_adx" -> "ADX",
    "i31_cci" -> "CCI",
    "i32_williams_r" -> "WilliamsR",
    "i33_donchian" -> "Donchian",
    "i33_keltner" -> "Keltner",
    "i33_ichimoku" -> "Ichimoku",
    "i34_futures_aggregate" -> "期货情绪聚合表")
}
