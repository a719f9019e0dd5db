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

  /** a03 — INTERPOLATING as-of join (the kdb `aj`+fill / Pandas
    * `merge_asof`-then-interpolate composite a quant stack reaches for
    * when carry-forward is too coarse): each 5m bar brackets the sparser
    * metric stream with its latest row at-or-before AND earliest row
    * strictly-after, and linearly interpolates between them; a bar past
    * the last metric holds the previous value flat, a bar before the
    * first gets NULL.
    *
    * Shape: a01's union-then-window with BOTH directions — prev via
    * `last(ignoreNulls)` over the preceding frame, next via
    * `first(ignoreNulls)` over the strictly-following frame. Both frames
    * share one (key, ts, side) sort, so the cost stays ONE shuffle + one
    * sort at any scale (no range self-join, no per-row lookup). A metric
    * exactly on the bar time lands in the preceding frame (side 0 sorts
    * first), making the interpolation weight 0 — the exact value, same
    * rule as the DuckDB twin's `<=`/`>` ASOF pair. The interpolation is
    * one IEEE chain, 6dp floor idiom (the ratio of epoch deltas CAN land
    * on dyadic halves).
    */
  /** The generic interpolating join: left rows gain `_prev_ts`,
    * `_next_ts`, and `_interp` (linear between the bracketing right
    * values of `valueCol`; flat hold past the last right row; NULL before
    * the first). One shuffle + one shared sort, two window frames.
    */
  def joinAsOfInterp(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs)).withColumn("_side", lit(1))
      .withColumn("_v", lit(null).cast("double"))
      .withColumn("_mt", lit(null).cast("long"))
    val r0 = right
      .withColumn("_ts", col(rightTs)).withColumn("_side", lit(0))
      .withColumn("_v", col(valueCol).cast("double"))
      .withColumn("_mt", col(rightTs).cast("long"))
    val rAligned = leftCols.filterNot(keys.contains).foldLeft(r0)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (keys ++ Seq("_ts", "_side") ++
      leftCols.filterNot(keys.contains) ++ Seq("_v", "_mt")).map(col)
    val uni = l.select(cols: _*).unionAll(rAligned.select(cols: _*))
    val wAll = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
    val back = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = wAll.rowsBetween(1, Window.unboundedFollowing)
    uni
      .withColumn("_op", last(col("_v"), ignoreNulls = true).over(back))
      .withColumn("_prev_ts", last(col("_mt"), ignoreNulls = true).over(back))
      .withColumn("_on", first(col("_v"), ignoreNulls = true).over(fwd))
      .withColumn("_next_ts", first(col("_mt"), ignoreNulls = true).over(fwd))
      .filter(col("_side") === 1)
      .withColumn("_interp",
        when(col("_prev_ts").isNull, lit(null).cast("double"))
          .when(col("_next_ts").isNull, col("_op"))
          .otherwise(col("_op") + (col("_on") - col("_op")) *
            ((col("_ts") - col("_prev_ts")).cast("double") /
              (col("_next_ts") - col("_prev_ts")).cast("double"))))
      .select((leftCols ++ Seq("_prev_ts", "_next_ts", "_interp")).map(col): _*)
  }

  private val asofInterp: Q = (s, dir) => {
    val bars = Rollup.rollup(Tables.candles(s, dir), 300L)
      .select(col("symbol"), col("bucket_ts"), col("close"))
    val metrics = Tables.metrics5m(s, dir)
      .filter(col("create_time") % 900 === 0)
      .select(col("symbol"), col("create_time"),
        col("sum_open_interest").as("oi"))
    joinAsOfInterp(bars, metrics, Seq("symbol"), "bucket_ts", "create_time",
        "oi")
      .select(col("symbol"), col("bucket_ts"),
        round(col("close"), 6).as("close"),
        col("_prev_ts").as("prev_time"), col("_next_ts").as("next_time"),
        (floor(col("_interp") * 1e6 + 0.5) / 1e6).as("oi_interp"))
  }

  val queries: Map[String, Q] = Map(
    "a01_asof_join" -> asofMetrics,
    "a03_asof_interp" -> asofInterp)

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
        |  ON r.symbol = m.symbol AND m.create_time <= r.bucket_ts""".stripMargin),
    "a03_asof_interp" -> Oracle.withCandlesAndMetrics(
      // the native twin: one backward (<=) and one forward (>) ASOF join
      // bracket each bar; the interpolation chain and 6dp floor mirror
      // the Spark spelling term for term
      """, r5 AS (
        |  SELECT symbol, bucket_ts // 300 * 300 AS bucket_ts,
        |         max_by(close, bucket_ts) AS close
        |  FROM candles GROUP BY 1, 2),
        |m AS MATERIALIZED (
        |  SELECT symbol, create_time, sum_open_interest AS oi
        |  FROM metrics WHERE create_time % 900 = 0)
        |SELECT r.symbol, r.bucket_ts, round(r.close, 6) AS close,
        |       p.create_time AS prev_time, n.create_time AS next_time,
        |       floor(CASE WHEN p.create_time IS NULL THEN NULL
        |          WHEN n.create_time IS NULL THEN p.oi
        |          ELSE p.oi + (n.oi - p.oi) *
        |            (CAST(r.bucket_ts - p.create_time AS DOUBLE) /
        |             CAST(n.create_time - p.create_time AS DOUBLE)) END
        |         * 1e6 + 0.5) / 1e6 AS oi_interp
        |FROM r5 r
        |ASOF LEFT JOIN m p
        |  ON r.symbol = p.symbol AND p.create_time <= r.bucket_ts
        |ASOF LEFT JOIN m n
        |  ON r.symbol = n.symbol AND n.create_time > r.bucket_ts""".stripMargin))
}
