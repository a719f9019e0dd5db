package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tumbling-interval roll-ups — the reference's single most load-bearing
  * operator (13 TimescaleDB continuous aggregates built from one
  * parameterized `time_bucket` GROUP BY,
  * reference libs/database/db/schema/004_continuous_aggregates.sql:24-46).
  *
  * Spark-first restatement: one hash aggregation per interval. The shuffle
  * key (symbol, bucket) matches the fact table's clustering, so with a
  * bucketed source table every roll-up is shuffle-free; partial aggregation
  * (map-side combine) makes the shuffle that does happen carry only one row
  * per (symbol, bucket) — at 100 TB the exchanged data is the *output* size,
  * not the input size. `min_by`/`max_by` give TimescaleDB's ordered
  * `first()`/`last()` without a sort.
  */
object Rollup {
  /** Interval vocabulary (001_timescaledb.sql:61-65) minus the calendar
    * month, which is not fixed-width — see [[rollupMonth]].
    */
  val IntervalSeconds: Map[String, Long] = Map(
    "1m" -> 60L, "3m" -> 180L, "5m" -> 300L, "15m" -> 900L, "30m" -> 1800L,
    "1h" -> 3600L, "2h" -> 7200L, "4h" -> 14400L, "6h" -> 21600L,
    "8h" -> 28800L, "12h" -> 43200L, "1d" -> 86400L, "3d" -> 259200L,
    "1w" -> 604800L)

  private def ohlcvAggs = Seq(
    min_by(col("open"), col("bucket_ts")).as("open"),
    max(col("high")).as("high"),
    min(col("low")).as("low"),
    max_by(col("close"), col("bucket_ts")).as("close"),
    sum(col("volume")).as("volume"),
    sum(col("quote_volume")).as("quote_volume"),
    sum(col("trade_count")).as("trade_count"),
    sum(col("taker_buy_volume")).as("taker_buy_volume"))

  /** The roll-up aggregate list for `candles`: OHLCV always, plus
    * `bool_and(is_closed)` when the input carries the completeness flag
    * (004_continuous_aggregates.sql:38 — a bucket is closed only when all
    * member bars are).
    */
  private def aggsFor(candles: DataFrame) =
    ohlcvAggs ++ (if (candles.columns.contains("is_closed"))
      Seq(min(col("is_closed")).as("is_closed")) else Nil)

  /** Roll candles up to a fixed-width interval. Input: any candle frame with
    * the [[graft.Tables.candles]] schema whose bucket_ts is already aligned
    * to a divisor of `seconds`.
    */
  def rollup(candles: DataFrame, seconds: Long): DataFrame = {
    val aggs = aggsFor(candles)
    candles
      .groupBy(col("symbol"),
        (expr(s"bucket_ts DIV $seconds") * seconds).as("bts"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("bts", "bucket_ts")
  }

  /** Calendar-month roll-up (the `1M` interval): bucket = epoch of the UTC
    * month start. Session timezone is pinned UTC so
    * `date_trunc('MONTH', timestamp_seconds(...))` is calendar-correct.
    */
  def rollupMonth(candles: DataFrame): DataFrame = {
    val aggs = aggsFor(candles)
    candles
      .groupBy(col("symbol"),
        unix_timestamp(date_trunc("MONTH", timestamp_seconds(col("bucket_ts"))))
          .as("bts"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("bts", "bucket_ts")
  }

  /** Incremental roll-up refresh — the continuous-aggregate maintenance
    * model (004_continuous_aggregates.sql:49-81: every interval's cagg
    * re-materializes a trailing `start_offset` window on a 1–60 min
    * schedule; effectively unlimited lateness inside the offset, SURVEY
    * §2.7). This is the job a production deployment runs per interval
    * every minute, instead of ever recomputing the full history:
    *
    *  1. align `now − startOffset` DOWN to an interval boundary;
    *  2. recompute the roll-up from the base (1m) store for just that
    *     trailing window — the base read prunes to the window's date
    *     partitions, so the scan cost is O(offset), not O(history);
    *  3. replace the recomputed buckets inside the touched date
    *     partitions (recompute-is-truth, i.e. cagg refresh semantics —
    *     NOT the field-level ingest merge, which could never lower a
    *     restated high), via dynamic partition overwrite. Rows outside
    *     the refresh window and partitions outside the date range are
    *     untouched bytes on disk.
    *
    * At 100 TB: step 2 reads a few dates of one symbol-sorted store;
    * step 3 rewrites only those same dates of the (much smaller)
    * roll-up store. Returns the refreshed `dt=` partition names.
    */
  def refreshRollup(spark: org.apache.spark.sql.SparkSession,
      basePath: String, outPath: String, seconds: Long,
      startOffsetSeconds: Long, nowTs: Long): Seq[String] =
    refreshGeneric(spark, basePath, outPath, seconds, startOffsetSeconds,
      nowTs, "bucket_ts")(rollup(_, seconds))

  /** [[refreshRollup]] for the metrics caggs (007_metrics_cagg_from_5m.sql
    * — the reference refreshes 15m/1h/4h/1d/1w metrics aggregates on the
    * same trailing-window schedule as the candle caggs). Identical refresh
    * semantics; the recompute is [[rollupMetrics]] and the event-time
    * column is `create_time`.
    */
  def refreshMetricsRollup(spark: org.apache.spark.sql.SparkSession,
      basePath: String, outPath: String, seconds: Long,
      startOffsetSeconds: Long, nowTs: Long): Seq[String] =
    refreshGeneric(spark, basePath, outPath, seconds, startOffsetSeconds,
      nowTs, "create_time")(rollupMetrics(_, seconds))

  private def refreshGeneric(spark: org.apache.spark.sql.SparkSession,
      basePath: String, outPath: String, seconds: Long,
      startOffsetSeconds: Long, nowTs: Long, timeCol: String)(
      recompute: DataFrame => DataFrame): Seq[String] = {
    val alignedStart = ((nowTs - startOffsetSeconds) / seconds) * seconds
    val base = graft.Tables.readCandles(spark, basePath)
      .filter(col(timeCol) >= alignedStart && col(timeCol) <= nowTs)
      .drop("dt")
    val recomputed = recompute(base)
      .withColumn("dt", to_date(timestamp_seconds(col(timeCol))))
    val dtStart = java.time.Instant.ofEpochSecond(alignedStart)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val dtEnd = java.time.Instant.ofEpochSecond(nowTs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val touched = Iterator.iterate(dtStart)(_.plusDays(1))
      .takeWhile(!_.isAfter(dtEnd)).map(_.toString).toSeq
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out =
      if (fs.exists(new org.apache.hadoop.fs.Path(outPath))) {
        // keep the touched partitions' pre-window rows; buckets inside
        // the window come exclusively from the recompute
        val kept = graft.Tables.readCandles(spark, outPath)
          .filter(col("dt").isin(touched: _*) &&
            col(timeCol) < alignedStart)
        recomputed.unionByName(kept, allowMissingColumns = true)
      } else recomputed
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try graft.Tables.writeCandlePartitions(out, outPath, timeCol)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    touched.map("dt=" + _)
  }

  /** Real-time roll-up read — Timescale's `materialized_only = false` cagg
    * semantics (reference 004_continuous_aggregates.sql:26; the real-time
    * meta views 006_candles_meta_views.sql:101-130): a query between
    * refreshes serves the MATERIALIZED buckets strictly below the refresh
    * watermark, UNION ALL an on-the-fly recompute of the base (1m) store's
    * post-watermark tail — so the last minutes are always fresh without
    * waiting for the next [[refreshRollup]] run.
    *
    * `wm` is a 1-row frame with an interval-aligned `wm` column (the
    * refresh metadata's watermark; data-derived in the registry entry so
    * both engines agree) — broadcast, never collected. Because `wm` is
    * aligned to `seconds`, every output bucket comes from exactly one
    * side: stored `bucket_ts < wm` and recomputed `bucket_ts >= wm` are
    * disjoint and complete. `from_tail` marks which side served the row —
    * the freshness split the spec and oracle pin.
    *
    * At 100 TB: the stored side is a partition-pruned scan of the (small)
    * roll-up table; the tail recompute reads only the watermark-forward
    * date partitions of the base store (O(offset), not O(history)) —
    * identical math to the cagg's own refresh, so serving and
    * materializing can never disagree.
    */
  def realtimeRollup(stored: DataFrame, base: DataFrame, seconds: Long,
      wm: DataFrame): DataFrame = {
    val served = stored.crossJoin(broadcast(wm))
      .filter(col("bucket_ts") < col("wm")).drop("wm")
      .withColumn("from_tail", lit(false))
    val fresh = rollup(
        base.crossJoin(broadcast(wm))
          .filter(col("bucket_ts") >= col("wm")).drop("wm"), seconds)
      .withColumn("from_tail", lit(true))
    served.unionByName(fresh, allowMissingColumns = false)
  }

  /** [[realtimeRollup]] served from the MATERIALIZED roll-up store — the
    * production shape of the real-time read. Timescale keeps the refresh
    * watermark as catalog metadata (a scalar known when the view query is
    * planned), so both sides prune STATICALLY, no runtime filter needed:
    *
    *  - the stored scan keeps only `dt` partitions at-or-before the
    *    watermark date (plus `bucket_ts < wm` row filter) — at 100 TB this
    *    is a partition-pruned read of the small roll-up table;
    *  - the base tail scan keeps only `dt` partitions at-or-after the
    *    watermark date, i.e. O(offset) of the 1m store, not O(history).
    *
    * The registry's `r19` entry instead derives the watermark from data
    * (the driver harness is stateless per query, so there is no refresh
    * metadata to consult there); RefreshSpec pins this path's pruning.
    */
  def realtimeRead(spark: org.apache.spark.sql.SparkSession,
      storedPath: String, basePath: String, seconds: Long,
      wmTs: Long): DataFrame = {
    require(wmTs % seconds == 0, s"watermark $wmTs not aligned to $seconds")
    val wmDate = java.time.Instant.ofEpochSecond(wmTs)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val served = graft.Tables.readCandles(spark, storedPath)
      .filter(col("dt") <= lit(wmDate) && col("bucket_ts") < wmTs)
      .drop("dt")
      .withColumn("from_tail", lit(false))
    val tail = graft.Tables.readCandles(spark, basePath)
      .filter(col("dt") >= lit(wmDate) && col("bucket_ts") >= wmTs)
      .drop("dt")
    served.unionByName(
      rollup(tail, seconds).withColumn("from_tail", lit(true)),
      allowMissingColumns = false)
  }

  /** Metrics roll-up (R5; 007_metrics_cagg_from_5m.sql:27-43): `last()` for
    * point-in-time gauges, ratio-of-sums for the ratio columns.
    */
  def rollupMetrics(metrics: DataFrame, seconds: Long): DataFrame =
    metrics
      .groupBy(col("symbol"),
        (expr(s"create_time DIV $seconds") * seconds).as("ct"))
      .agg(
        max_by(col("sum_open_interest"), col("create_time")).as("sum_open_interest"),
        max_by(col("sum_open_interest_value"), col("create_time")).as("sum_open_interest_value"),
        sum(col("count_toptrader_long_short_ratio")).as("count_toptrader_long_short_ratio"),
        sum(col("sum_toptrader_long_short_ratio")).as("sum_toptrader_long_short_ratio"),
        sum(col("count_long_short_ratio")).as("count_long_short_ratio"),
        sum(col("sum_taker_long_short_vol_ratio")).as("sum_taker_long_short_vol_ratio"))
      .withColumnRenamed("ct", "create_time")

  /** Joined candles×metrics "meta" view (R6;
    * 006_candles_meta_views.sql:29-93): bucketed equi-join plus the two
    * derived columns. The metrics side is one row per (symbol, bucket) — at
    * reference scale (~600 symbols) it broadcasts; at 100 TB both sides
    * share the (symbol, bucket) partitioning so the join is co-located.
    */
  def metaView(candles5m: DataFrame, metrics5m: DataFrame): DataFrame = {
    val m = metrics5m.select(
      col("symbol"), col("create_time").as("bucket_ts"),
      col("sum_open_interest").as("open_interest"),
      col("sum_open_interest_value").as("open_interest_value"),
      (col("sum_toptrader_long_short_ratio") /
        nullif(col("count_toptrader_long_short_ratio"), lit(0.0)))
        .as("top_long_short_ratio"),
      (col("sum_taker_long_short_vol_ratio") /
        nullif(col("count_long_short_ratio"), lit(0.0)))
        .as("taker_long_short_vol_ratio"))
    candles5m
      .join(m, Seq("symbol", "bucket_ts"), "left")
      .withColumn("amplitude_ratio",
        (col("high") - col("low")) / nullif(col("close"), lit(0.0)))
      .withColumn("vwap", col("quote_volume") / nullif(col("volume"), lit(0.0)))
  }
}
