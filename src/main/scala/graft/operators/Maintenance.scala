package graft.operators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-maintenance operators: the upsert MERGE (S3), retention trim
  * (S7), and the point-probe reads (R12, R16) from SURVEY.md §2.1-2.2.
  */
object Maintenance {
  private type Q = (SparkSession, String) => DataFrame

  /** S3 — candle upsert with field-level merge, the reference's
    * `ON CONFLICT DO UPDATE` semantics (001_timescaledb.sql:106-119):
    * `open` kept when the stored bar is closed and the incoming is not,
    * `high=GREATEST`, `low=LEAST`, `close/volume` taken from incoming,
    * `quote_volume/trade_count/taker_buy_volume` coalesced incoming-first,
    * `is_closed=OR`.
    *
    * Batch form: full-outer join on the conflict key. In production this is
    * a Delta `MERGE INTO` inside `foreachBatch` (same expressions in the
    * UPDATE SET clause); the join form is the pure-parquet fallback and the
    * semantic spec both share. Scale: one shuffle on (symbol, bucket_ts) —
    * the fact table's natural key — and AQE broadcast when the incoming
    * micro-batch is small.
    */
  def mergeCandles(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val t = existing.alias("t")
    val e = incoming.alias("e")
    val both = col("t.symbol").isNotNull && col("e.symbol").isNotNull
    def tc(f: String) = col(s"t.$f")
    def ec(f: String) = col(s"e.$f")
    def merged(f: String, whenBoth: Column) =
      when(both, whenBoth).otherwise(coalesce(tc(f), ec(f))).as(f)
    t.join(e, col("t.symbol") === col("e.symbol") &&
        col("t.bucket_ts") === col("e.bucket_ts"), "full_outer")
      .select(
        coalesce(col("t.symbol"), col("e.symbol")).as("symbol"),
        coalesce(col("t.bucket_ts"), col("e.bucket_ts")).as("bucket_ts"),
        merged("open", when(tc("is_closed") && !ec("is_closed"), tc("open"))
          .otherwise(ec("open"))),
        merged("high", greatest(tc("high"), ec("high"))),
        merged("low", least(tc("low"), ec("low"))),
        merged("close", ec("close")),
        merged("volume", ec("volume")),
        merged("quote_volume", coalesce(ec("quote_volume"), tc("quote_volume"))),
        merged("trade_count", coalesce(ec("trade_count"), tc("trade_count"))),
        merged("taker_buy_volume", coalesce(ec("taker_buy_volume"), tc("taker_buy_volume"))),
        merged("is_closed", tc("is_closed") || ec("is_closed")))
  }

  /** S3 at storage level — partition-scoped MERGE into a dt-partitioned
    * parquet table ([[Tables.writeCandles]] layout). A 100 TB ingest MERGE
    * must not rewrite the table: only the date partitions the batch
    * actually touches are read, merged ([[mergeCandles]]) and replaced via
    * dynamic partition overwrite — the plain-parquet analogue of Delta's
    * file-level `MERGE INTO` (reference: per-chunk upserts on Timescale,
    * services/data-service/src/adapters/timescale.py:53-130).
    *
    * The only driver-side materialization is the DISTINCT PARTITION KEY
    * list (metadata-scale: a few dates per ingest batch, never row data) —
    * the same listing a Delta commit does.
    */
  def mergeCandlesPartitioned(spark: SparkSession, path: String,
      incoming: DataFrame): Seq[String] = {
    val batch = incoming.withColumn("dt",
      to_date(timestamp_seconds(col("bucket_ts"))))
    val touched = batch.select(col("dt")).distinct()
      .collect().map(_.get(0).toString).sorted.toSeq
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap: first batch against an empty store is a plain write.
    // The stored side reads at the operator boundary (decimal → double,
    // Tables.readCandles) so the merge expressions are type-uniform; the
    // write below re-applies the Decimal(38,12) storage cast.
    val stored =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        Tables.readCandles(spark, path).filter(col("dt").isin(touched: _*))
      else batch.filter(lit(false))
    val cols = batch.columns.filter(_ != "dt").map(col).toSeq
    val merged = mergeCandles(
      stored.select(cols: _*), batch.select(cols: _*))
      .withColumn("dt", to_date(timestamp_seconds(col("bucket_ts"))))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try Tables.writeCandlePartitions(merged, path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    touched
  }

  /** u01 — exercise [[mergeCandles]] deterministically: batch A = candles
    * from even events (closed), batch B = candles from odd events (open,
    * quote_volume nulled on every 5th minute) — overlapping buckets get the
    * field-wise merge, disjoint ones pass through.
    */
  private val upsert: Q = (s, dir) => {
    def half(parity: Int, closed: Column) =
      Tables.events(s, dir)
        .where(col("event_id") % 2 === parity)
        .groupBy(
          format_string("S%04d", col("user_id")).as("symbol"),
          (expr("ts DIV 60000000000") * 60).as("bucket_ts"))
        .agg(
          min_by(col("value"), col("event_id")).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), col("event_id")).as("close"),
          sum(col("value")).as("volume"),
          sum(col("value") * col("value")).as("quote_volume"),
          count(lit(1)).as("trade_count"),
          sum(when(col("event_id") % 3 === 0, col("value")).otherwise(lit(0.0)))
            .as("taker_buy_volume"))
        .withColumn("is_closed", closed)
    val a = half(0, lit(true))
    val b = half(1, lit(false))
      .withColumn("quote_volume",
        when((col("bucket_ts") / 60) % 5 === 0, lit(null)).otherwise(col("quote_volume")))
    mergeCandles(a, b).select(
      col("symbol"), col("bucket_ts"),
      round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
      round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
      round(col("volume"), 6).as("volume"),
      round(col("quote_volume"), 6).as("quote_volume"),
      col("trade_count"), round(col("taker_buy_volume"), 6).as("taker_buy_volume"),
      col("is_closed"))
  }

  /** u03 — invalidation-driven refresh: the reference's repair model is
    * "track what went stale, recompute ONLY that" — the
    * `missing_intervals` queue (002_taker_buy_and_gap_tracking.sql:88-108)
    * plus the cagg refresh policies (004_continuous_aggregates.sql:49-81)
    * are exactly Timescale's invalidation-log machinery. Late writes
    * (event_id ≡ 0 mod 101 stands in for the late batch) invalidate their
    * (symbol, day) ranges; the refresh recomputes the 5m roll-up for ONLY
    * those ranges from the full store.
    *
    * Scale shape: the invalidation log is metadata-sized (distinct
    * symbol×day of the late batch) and BROADCASTS into a semi-join prune
    * of the base scan — at cluster scale this is static dt-partition
    * pruning plus a partition-scoped rewrite (the StorageLayoutSpec MERGE
    * path); the full fact is never re-aggregated. RefreshSpec proves the
    * patch invariant: stale store patched with these buckets equals the
    * fully-fresh roll-up.
    *
    * The day/bucket math (`ts DIV 86400e9`, truncation toward zero)
    * assumes post-1970 timestamps, same as e01/e07 — see the e07 note in
    * [[graft.operators.Events]]; the DuckDB oracle's date_trunc floors
    * and would diverge on a pre-epoch fixture.
    */
  private val invalidationRefresh: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .withColumn("symbol", format_string("S%04d", col("user_id")))
      .withColumn("day", expr("ts DIV 86400000000000"))
    val inval = ev.filter(col("event_id") % 101 === 0)
      .select(col("symbol"), col("day")).distinct()
    ev.join(broadcast(inval), Seq("symbol", "day"), "leftsemi")
      .groupBy(col("symbol"), col("day"),
        (expr("ts DIV 300000000000") * 300).as("bucket_ts"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        sum(col("value")).as("volume"),
        count(lit(1)).as("trade_count"))
      .select(col("symbol"), col("day"), col("bucket_ts"),
        round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
        round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
        round(col("volume"), 6).as("volume"), col("trade_count"))
  }

  /** S7 — retention trim (db/reader.py:298-332): keep the newest N rows per
    * symbol, report what remains. `row_number <= N` is the trim predicate
    * the mart rewrite uses.
    */
  private val retention: Q = (s, dir) => {
    val w = Window.partitionBy("symbol").orderBy(col("bucket_ts").desc)
    Tables.candles(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 30)
      .groupBy("symbol")
      .agg(count(lit(1)).as("kept"),
        min("bucket_ts").as("oldest_ts"),
        max("bucket_ts").as("newest_ts"))
  }

  /** R12 — max-timestamp probe (reader.py:214-225). */
  private val maxTs: Q = (s, dir) =>
    Tables.candles(s, dir).agg(
      max(col("bucket_ts")).as("max_ts"),
      count(lit(1)).cast("long").as("row_count"))

  /** R16 — period/symbol point read with symbol normalization
    * (data_provider.py:343-409): `S0007USDT` → `S0007`, latest row.
    */
  private val pointRead: Q = (s, dir) => {
    val wanted = Seq("S0007USDT", "S0010", "S0042USDT")
    Tables.candles(s, dir)
      .where(col("symbol").isin(wanted.map(_.stripSuffix("USDT")): _*))
      .groupBy("symbol")
      .agg(max("bucket_ts").as("bucket_ts"),
        round(max_by(col("close"), col("bucket_ts")), 6).as("close"),
        round(max_by(col("volume"), col("bucket_ts")), 6).as("volume"))
  }

  val queries: Map[String, Q] = Map(
    "u01_upsert_merge" -> upsert,
    "u03_invalidation_refresh" -> invalidationRefresh,
    "u02_retention_trim" -> retention,
    "r12_max_ts" -> maxTs,
    "r16_point_read" -> pointRead)

  // ---------------------------------------------------------------- oracle

  private def halfSql(parity: Int, closed: String): String =
    s"""SELECT printf('S%04d', user_id) AS symbol,
       |       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS bucket_ts,
       |       min_by(value, event_id) AS open,
       |       max(value) AS high, min(value) AS low,
       |       max_by(value, event_id) AS close,
       |       sum(value) AS volume,
       |       sum(value * value) AS quote_volume,
       |       count(*) AS trade_count,
       |       sum(CASE WHEN event_id % 3 = 0 THEN value ELSE 0.0 END) AS taker_buy_volume,
       |       $closed AS is_closed
       |FROM events WHERE event_id % 2 = $parity
       |GROUP BY 1, 2""".stripMargin

  val oracle: Map[String, String] = Map(
    "u03_invalidation_refresh" ->
      """WITH ev AS (
        |  SELECT printf('S%04d', user_id) AS symbol,
        |    CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day,
        |    CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 300 * 300
        |      AS bucket_ts,
        |    event_id, value
        |  FROM events),
        |inval AS (
        |  SELECT DISTINCT symbol, day FROM ev WHERE event_id % 101 = 0)
        |SELECT ev.symbol, ev.day, bucket_ts,
        |  round(min_by(value, event_id), 6) AS open,
        |  round(max(value), 6) AS high,
        |  round(min(value), 6) AS low,
        |  round(max_by(value, event_id), 6) AS close,
        |  round(sum(value), 6) AS volume,
        |  CAST(count(*) AS BIGINT) AS trade_count
        |FROM ev SEMI JOIN inval ON ev.symbol = inval.symbol AND ev.day = inval.day
        |GROUP BY 1, 2, 3""".stripMargin,
    "u01_upsert_merge" ->
      s"""WITH a AS (${halfSql(0, "TRUE")}),
         |b0 AS (${halfSql(1, "FALSE")}),
         |b AS (SELECT * REPLACE (CASE WHEN (bucket_ts / 60) % 5 = 0 THEN NULL
         |                             ELSE quote_volume END AS quote_volume) FROM b0)
         |SELECT
         |  coalesce(t.symbol, e.symbol) AS symbol,
         |  coalesce(t.bucket_ts, e.bucket_ts) AS bucket_ts,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL THEN
         |          CASE WHEN t.is_closed AND NOT e.is_closed THEN t.open ELSE e.open END
         |        ELSE coalesce(t.open, e.open) END, 6) AS open,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |        THEN greatest(t.high, e.high) ELSE coalesce(t.high, e.high) END, 6) AS high,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |        THEN least(t.low, e.low) ELSE coalesce(t.low, e.low) END, 6) AS low,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |        THEN e.close ELSE coalesce(t.close, e.close) END, 6) AS close,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |        THEN e.volume ELSE coalesce(t.volume, e.volume) END, 6) AS volume,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |        THEN coalesce(e.quote_volume, t.quote_volume)
         |        ELSE coalesce(t.quote_volume, e.quote_volume) END, 6) AS quote_volume,
         |  CAST(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |       THEN coalesce(e.trade_count, t.trade_count)
         |       ELSE coalesce(t.trade_count, e.trade_count) END AS BIGINT) AS trade_count,
         |  round(CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |        THEN coalesce(e.taker_buy_volume, t.taker_buy_volume)
         |        ELSE coalesce(t.taker_buy_volume, e.taker_buy_volume) END, 6) AS taker_buy_volume,
         |  CASE WHEN t.symbol IS NOT NULL AND e.symbol IS NOT NULL
         |       THEN t.is_closed OR e.is_closed
         |       ELSE coalesce(t.is_closed, e.is_closed) END AS is_closed
         |FROM a t FULL OUTER JOIN b e
         |  ON t.symbol = e.symbol AND t.bucket_ts = e.bucket_ts""".stripMargin,
    "u02_retention_trim" -> Oracle.withCandles(
      """SELECT symbol, CAST(count(*) AS BIGINT) AS kept,
        |       min(bucket_ts) AS oldest_ts, max(bucket_ts) AS newest_ts
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts DESC) AS rn
        |  FROM candles)
        |WHERE rn <= 30 GROUP BY symbol""".stripMargin),
    "r12_max_ts" -> Oracle.withCandles(
      """SELECT max(bucket_ts) AS max_ts, CAST(count(*) AS BIGINT) AS row_count
        |FROM candles""".stripMargin),
    "r16_point_read" -> Oracle.withCandles(
      """SELECT symbol, max(bucket_ts) AS bucket_ts,
        |       round(max_by(close, bucket_ts), 6) AS close,
        |       round(max_by(volume, bucket_ts), 6) AS volume
        |FROM candles
        |WHERE symbol IN (regexp_replace('S0007USDT', 'USDT$', ''),
        |                 regexp_replace('S0010', 'USDT$', ''),
        |                 regexp_replace('S0042USDT', 'USDT$', ''))
        |GROUP BY symbol""".stripMargin))
}
