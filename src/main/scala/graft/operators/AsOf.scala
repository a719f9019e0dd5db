package graft.operators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with the same key
  * and `rightTs <= leftTs` (the time-series join every market-data engine
  * needs; the reference gets it implicitly from Timescale's
  * `last(...) ... GROUP BY time_bucket` reads and exact-grid joins, e.g.
  * the meta join async_full_engine.py:137-156 — here it is a first-class
  * operator, and DuckDB's native `ASOF JOIN` is the oracle).
  *
  * Spark has no built-in as-of join. The scalable shape is NOT a range
  * self-join (quadratic between sparse right rows) nor a per-row lookup:
  * it is union-then-window — tag both sides, union, and carry the right
  * side's payload forward with `last(_, ignoreNulls = true)` over ONE
  * per-key (ts, side) window. Cost: one shuffle on the key + one sort,
  * identical to a plain windowed aggregate, at any scale. Right rows sort
  * BEFORE left rows at equal ts, giving inclusive (≤) semantics.
  */
object AsOf {
  private type Q = (SparkSession, String) => DataFrame

  /** @param payload right-side columns carried to the matched left row
    *                 (each becomes `last(ignoreNulls)` over the union)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
    val lAligned = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
    val rAligned = leftCols.filterNot(keys.contains).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (keys ++ Seq("_ts", "_side") ++
      leftCols.filterNot(keys.contains) ++ payload).map(col)
    val uni = lAligned.select(cols: _*).unionAll(rAligned.select(cols: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(uni)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }

  /** a01 — 5m bars as-of joined to the latest (sparser, 15m-grid) futures
    * metrics row at or before the bar time: between metric arrivals the
    * last value carries forward; bars before the first metric get NULL.
    */
  private val asofMetrics: Q = (s, dir) => {
    val bars = Rollup.rollup(Tables.candles(s, dir), 300L)
      .select(col("symbol"), col("bucket_ts"), col("close"))
    val metrics = Tables.metrics5m(s, dir)
      .filter(col("create_time") % 900 === 0)
      .select(col("symbol"), col("create_time"),
        col("sum_open_interest").as("oi"))
    joinAsOf(bars, metrics, Seq("symbol"), "bucket_ts", "create_time",
        Seq("oi", "create_time"))
      .select(col("symbol"), col("bucket_ts"), round(col("close"), 6).as("close"),
        round(col("oi"), 6).as("oi"), col("create_time").as("oi_time"))
  }

  val queries: Map[String, Q] = Map("a01_asof_join" -> asofMetrics)

  val oracle: Map[String, String] = Map(
    "a01_asof_join" -> Oracle.withCandlesAndMetrics(
      """, r5 AS (
        |  SELECT symbol, bucket_ts // 300 * 300 AS bucket_ts,
        |         max_by(close, bucket_ts) AS close
        |  FROM candles GROUP BY 1, 2),
        |m AS (
        |  SELECT symbol, create_time, sum_open_interest AS oi
        |  FROM metrics WHERE create_time % 900 = 0)
        |SELECT r.symbol, r.bucket_ts, round(r.close, 6) AS close,
        |       round(m.oi, 6) AS oi, m.create_time AS oi_time
        |FROM r5 r ASOF LEFT JOIN m
        |  ON r.symbol = m.symbol AND m.create_time <= r.bucket_ts""".stripMargin))
}
