package graft

/** DuckDB-dialect SQL fragments shared by every oracle query.
  *
  * The driver re-executes [[SparkEntry.oracleSql]] in DuckDB over the same
  * parquet files (registered as views named after the tables) and
  * hash-compares against the Spark result. These CTEs replay the
  * [[Tables.candles]] / [[Tables.metrics5m]] derivations exactly:
  * `epoch(date_trunc(...))` is encoding-agnostic on DuckDB's side and equals
  * Spark's integral `ts DIV 60e9 * 60` on the normalized nanosecond longs
  * ([[Tables.events]]).
  */
object Oracle {
  val CANDLES: String =
    """candles AS (
      |  SELECT printf('S%04d', user_id) AS symbol,
      |         CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_ts,
      |         min_by(value, event_id) AS open,
      |         max(value) AS high,
      |         min(value) AS low,
      |         max_by(value, event_id) AS close,
      |         sum(value) AS volume,
      |         sum(value * value) AS quote_volume,
      |         count(*) AS trade_count,
      |         sum(CASE WHEN event_id % 2 = 0 THEN value ELSE 0.0 END) AS taker_buy_volume
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  val METRICS: String =
    """metrics AS (
      |  SELECT printf('S%04d', user_id) AS symbol,
      |         CAST(floor(epoch(ts)) AS BIGINT) // 300 * 300 AS create_time,
      |         sum(value) AS sum_open_interest,
      |         sum(value * value) AS sum_open_interest_value,
      |         CAST(count(*) AS DOUBLE) AS count_toptrader_long_short_ratio,
      |         sum(1.0 + ((value % 7) - 3.0) / 10) AS sum_toptrader_long_short_ratio,
      |         CAST(count(*) AS DOUBLE) AS count_long_short_ratio,
      |         sum(1.0 + ((value % 5) - 2.0) / 10) AS sum_taker_long_short_vol_ratio
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  /** `list_reduce` EWMA over a list expression — identical op order to
    * `Series.ewma` (the indicator packs and the cycle slice share this so
    * their replays stay bit-equal).
    */
  def red(l: String, alpha: String): String =
    s"list_reduce($l, (acc, x) -> ($alpha) * x + (1.0 - ($alpha)) * acc)"

  /** Per-index EWMA series (prefix folds, O(n²) — oracle-side only). */
  def redSeries(l: String, alpha: String): String =
    s"list_transform(generate_series(1, len($l)), i -> ${red(s"($l)[1:i]", alpha)})"

  /** True-range list over (hi, lo, cl, n) series columns. */
  val TRS: String =
    """list_transform(generate_series(1, n), i ->
      |  CASE WHEN i = 1 THEN hi[1] - lo[1]
      |       ELSE greatest(hi[i] - lo[i], abs(hi[i] - cl[i-1]), abs(lo[i] - cl[i-1])) END)""".stripMargin

  /** Prepend the candle CTE: `withCandles("SELECT ... FROM candles ...")`. */
  def withCandles(sql: String): String = s"WITH $CANDLES\n$sql"

  def withCandlesAndMetrics(sql: String): String =
    s"WITH $CANDLES,\n$METRICS\n$sql"

  def withMetrics(sql: String): String = s"WITH $METRICS\n$sql"
}
