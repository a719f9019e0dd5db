package graft.operators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface the reference actually executes
  * (SURVEY.md §2.2, R1–R17), restated as Catalyst-optimizable DataFrame
  * plans. Every query here has a DuckDB oracle.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame

  private def candles(s: SparkSession, dir: String) = Tables.candles(s, dir)

  /** R1 — scan + predicate + projection. Filter and projection sit directly
    * above the aggregation; on a persisted candle table both push into the
    * parquet scan (partition pruning on the date, min/max skipping on
    * symbol).
    */
  private val r01: Q = (s, dir) =>
    candles(s, dir)
      .filter(col("symbol").isin("S0003", "S0007", "S0011") &&
        col("bucket_ts") > lit(1705363200L))
      .select(col("symbol"), col("bucket_ts"),
        round(col("close"), 6).as("close"),
        round(col("volume"), 6).as("volume"))

  /** R2 — latest-N-per-key via ranked window (reference reader.py:77-89). */
  private val r02: Q = (s, dir) => {
    val w = Window.partitionBy("symbol").orderBy(col("bucket_ts").desc)
    candles(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("symbol"), col("bucket_ts"), round(col("close"), 6).as("close"),
        col("rn"))
  }

  /** R3 — latest-1-per-key as an aggregation (`max_by`), not a window: one
    * map-side-combinable pass, no per-partition sort — the scalable form of
    * `DISTINCT ON` (reference pg_engine.py:477-488).
    */
  private val r03: Q = (s, dir) =>
    candles(s, dir)
      .groupBy(col("symbol"))
      .agg(max(col("bucket_ts")).as("bucket_ts"),
        round(max_by(col("close"), col("bucket_ts")), 6).as("close"),
        round(max_by(col("volume"), col("bucket_ts")), 6).as("volume"))

  private def roundOhlcv(df: DataFrame): DataFrame =
    df.select(col("symbol"), col("bucket_ts"),
      round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
      round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
      round(col("volume"), 6).as("volume"),
      round(col("quote_volume"), 6).as("quote_volume"),
      col("trade_count"),
      round(col("taker_buy_volume"), 6).as("taker_buy_volume"))

  /** R4 — tumbling OHLCV roll-ups (the 13-interval continuous-aggregate
    * family, 004_continuous_aggregates.sql:27-45).
    */
  /** The reference's full 13-interval cagg grid (004_continuous_aggregates
    * .sql:67-79) through the ONE generic roll-up. Fixed-width intervals
    * are epoch-aligned integral buckets (`ts DIV w * w`) — identical to
    * Timescale's `time_bucket` for every divisor-of-a-day width and for
    * 3d (2000-01-03 origin is 3-day-aligned to epoch); `1w` is
    * epoch-aligned (Thursday-start) where Timescale weeks start Monday —
    * a documented alignment choice, replayed identically by the oracle.
    * Calendar `1M` needs real month boundaries ([[Rollup.rollupMonth]]).
    */
  private def r04(seconds: Long): Q =
    (s, dir) => roundOhlcv(Rollup.rollup(candles(s, dir), seconds))
  private val r04_1mo: Q = (s, dir) => roundOhlcv(Rollup.rollupMonth(candles(s, dir)))
  val Intervals: Map[String, Long] = Map(
    "3m" -> 180L, "5m" -> 300L, "15m" -> 900L, "30m" -> 1800L,
    "1h" -> 3600L, "2h" -> 7200L, "4h" -> 14400L, "6h" -> 21600L,
    "8h" -> 28800L, "12h" -> 43200L, "1d" -> 86400L, "3d" -> 259200L,
    "1w" -> 604800L)

  /** R19 — real-time cagg read ([[Rollup.realtimeRollup]], Timescale
    * `materialized_only = false`): stored 1h roll-up filtered to
    * pre-watermark buckets, union the tail recomputed fresh from the 1m
    * store. Watermark = 5 buckets below the corpus max, hour-aligned —
    * data-derived via a broadcast scalar so both engines agree. The
    * oracle is the algebraic spec: a real-time read equals a fully-fresh
    * materialization bucket-for-bucket, with `from_tail` marking the
    * post-watermark rows (the freshness split a stale-materialization
    * reader would get wrong).
    */
  private val r19: Q = (s, dir) => {
    val seconds = 3600L
    val c1m = candles(s, dir)
    val wm = c1m.agg(
      ((expr("max(bucket_ts) DIV 3600") - lit(5L)) * 3600L).as("wm"))
    val rt = Rollup.realtimeRollup(Rollup.rollup(c1m, seconds), c1m, seconds, wm)
    rt.select(col("symbol"), col("bucket_ts"),
      round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
      round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
      round(col("volume"), 6).as("volume"),
      round(col("quote_volume"), 6).as("quote_volume"),
      col("trade_count"),
      round(col("taker_buy_volume"), 6).as("taker_buy_volume"),
      col("from_tail"))
  }

  /** R19b — the PRODUCTION real-time read: [[Rollup.realtimeRead]] over an
    * actually-PERSISTED roll-up store. The entry materializes what the
    * refresh job would maintain — the 1m base store and the 1h roll-up
    * truncated strictly below the watermark (dt-partitioned parquet via
    * [[Tables.writeCandles]]) — then serves the read from DISK with static
    * dt-partition pruning on both sides, closing the gap between the
    * RefreshSpec-pinned path and the benched one (r19 derives the stored
    * side inline because the driver harness is stateless per query).
    *
    * The watermark is refresh-catalog metadata in production (a scalar
    * known at plan time — that's what makes the pruning STATIC); the
    * stateless stand-in reads the corpus max once, a 1-row aggregate
    * collect, before building the plan. Store writes land under a
    * PER-PROCESS subdir of the JVM temp dir keyed by the sf dir (two
    * concurrent runners never overwrite-vs-read the same path; within a
    * process, repeated invocations are idempotent overwrites and the
    * registry runs serially). The values are q6-quantized BEFORE the
    * Decimal(38,12) store cast so the comparison grid is shared with the
    * pure-double oracle: post-q6, every price/volume sits essentially ON
    * a 6-dp grid point, and the store round-trip's ≤5e-13 decimal
    * quantization can no longer move a value across a `round(x, 6)`
    * half-boundary (the r7 ADVICE latent-flip).
    */
  /** r19b store roots with a registered exit-time cleanup hook. */
  private val r19bCleanup =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private val r19b: Q = (s, dir) => {
    val seconds = 3600L
    def q6all(df: DataFrame): DataFrame =
      Tables.DecimalCols.foldLeft(df)((d, c) =>
        d.withColumn(c, floor(col(c) * lit(1e6) + lit(0.5)) / lit(1e6)))
    val c1m = candles(s, dir)
    val wmTs = (c1m.agg(max(col("bucket_ts"))).head.getLong(0)
      / seconds - 5L) * seconds
    val rootFile = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_r19b_" + java.lang.management.ManagementFactory
        .getRuntimeMXBean.getPid + "_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_"))
    // PID-keyed ⇒ unique per process run: without cleanup every bench/
    // verify invocation strands a new store under the temp dir (r8
    // ADVICE). One shutdown hook per root (repeat invocations reuse it).
    if (r19bCleanup.add(rootFile.getPath))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(rootFile)
      }))
    val root = rootFile.getPath
    // Build the store once per (process, dir, watermark, source stamp):
    // the entry benches the production READ (the refresh job maintains
    // the store out of band — RefreshSpec pins that path); rebuilding
    // the two parquet stores on every invocation billed the maintenance
    // write to every read. The marker carries the source file's
    // mtime+size so a rewritten fixture dir (ScaleGen) still rebuilds.
    val src = new java.io.File(dir, "events.parquet")
    val marker = new java.io.File(rootFile,
      s".built_${wmTs}_${src.lastModified()}_${src.length()}")
    if (!marker.exists()) {
      Tables.writeCandles(q6all(c1m), s"$root/base")
      Tables.writeCandles(
        q6all(Rollup.rollup(c1m, seconds).filter(col("bucket_ts") < wmTs)),
        s"$root/stored")
      marker.createNewFile()
    }
    Rollup.realtimeRead(s, s"$root/stored", s"$root/base", seconds, wmTs)
      .select(col("symbol"), col("bucket_ts"),
        round(col("open"), 6).as("open"), round(col("high"), 6).as("high"),
        round(col("low"), 6).as("low"), round(col("close"), 6).as("close"),
        round(col("volume"), 6).as("volume"),
        round(col("quote_volume"), 6).as("quote_volume"),
        col("trade_count"),
        round(col("taker_buy_volume"), 6).as("taker_buy_volume"),
        col("from_tail"))
  }

  /** R5 — metrics roll-up with ratio-of-sums (007:27-43), parameterized
    * over the reference's five cagg intervals (15m/1h/4h/1d/1w).
    */
  private def r05at(seconds: Long): Q = (s, dir) => {
    val m = Rollup.rollupMetrics(Tables.metrics5m(s, dir), seconds)
    m.select(col("symbol"), col("create_time"),
      round(col("sum_open_interest"), 6).as("sum_open_interest"),
      round(col("sum_open_interest_value"), 4).as("sum_open_interest_value"),
      round(col("count_toptrader_long_short_ratio"), 6).as("count_toptrader_long_short_ratio"),
      round(col("sum_toptrader_long_short_ratio"), 6).as("sum_toptrader_long_short_ratio"),
      round(col("sum_taker_long_short_vol_ratio") /
        nullif(col("count_long_short_ratio"), lit(0.0)), 6).as("taker_ratio"))
  }

  /** R6 — bucketed left join + derived columns (006:88-92), parameterized
    * like the reference's per-interval meta caggs (006:29-93 builds one
    * joined view per interval). At 5m the metrics side is the raw fact;
    * coarser views join the metrics roll-up at the same width.
    */
  private def r06at(seconds: Long): Q = (s, dir) => {
    val m5 = Tables.metrics5m(s, dir)
    val meta = Rollup.metaView(
      Rollup.rollup(candles(s, dir), seconds),
      if (seconds == 300L) m5 else Rollup.rollupMetrics(m5, seconds))
    meta.select(col("symbol"), col("bucket_ts"),
      round(col("close"), 6).as("close"),
      round(col("volume"), 6).as("volume"),
      round(col("vwap"), 6).as("vwap"),
      round(col("amplitude_ratio"), 6).as("amplitude_ratio"),
      round(col("open_interest"), 6).as("open_interest"),
      round(col("top_long_short_ratio"), 6).as("top_long_short_ratio"))
  }

  /** R7 — multi-branch top-k ranking union (async_full_engine.py:69-108):
    * per-symbol trailing-7d aggregates, three ORDER BY/LIMIT branches plus
    * the change-rank branch (latest close vs the close ~24h earlier,
    * async_full_engine.py:85-100), UNION DISTINCT. The max-timestamp
    * scalar stays in the plan as a broadcast cross join — no driver-side
    * collect.
    */
  private val r07: Q = (s, dir) => {
    val c = candles(s, dir)
    val maxTs = c.agg(max(col("bucket_ts")).as("max_ts"))
    // ONE pass over the 7-day window computes every branch's aggregate:
    // the volume/amplitude/count sums plus the change-rank pair as
    // conditional max_by (a null ordering key excludes the row) — round 2
    // scanned the fact table once per branch (4x the IO at 100 TB; this
    // was the whole 19x-vs-DuckDB gap in BENCH_r02). The four top-10
    // branches are TakeOrderedAndProject over the aggregate (see below).
    val win = c.join(broadcast(maxTs))
      .filter(col("bucket_ts") > col("max_ts") - 604800L)
      .groupBy(col("symbol"))
      .agg(sum(col("quote_volume")).as("qv"),
        avg((col("high") - col("low")) / nullif(col("close"), lit(0.0))).as("amp"),
        sum(col("trade_count")).as("n"),
        max_by(col("close"),
          when(col("bucket_ts") > col("max_ts") - 3600L, col("bucket_ts")))
          .as("close"),
        max_by(col("close"),
          when(col("bucket_ts").between(col("max_ts") - 90000L, col("max_ts") - 82800L),
            col("bucket_ts"))).as("prev_close"))
      .withColumn("chg",
        when(col("close").isNotNull && col("prev_close").isNotNull,
          abs((col("close") - col("prev_close")) /
            nullif(col("prev_close"), lit(0.0)))))
    // each branch is a TakeOrderedAndProject over the barrier'd aggregate
    // (r11, VERDICT #7): map-side partial top-10s meet at the driver, so
    // no global Window ever sorts |symbols| rows through ONE task — the
    // t15/t19 lesson applied to the last symbol-cardinality rank site
    val winB = Tables.barrier(win)
    def top10(cs: Column*) =
      winB.orderBy(cs: _*).limit(10).select(col("symbol"))
    top10(col("qv").desc, col("symbol"))
      .unionByName(top10(col("amp").desc, col("symbol")))
      .unionByName(top10(col("n").desc, col("symbol")))
      .unionByName(winB.filter(col("chg").isNotNull)
        .orderBy(col("chg").desc, col("symbol")).limit(10)
        .select(col("symbol")))
      .distinct()
  }

  /** R8 — global aggregate + per-row share (engine.py:288-330): latest OI
    * per symbol, market share vs the broadcast global total.
    */
  private val r08: Q = (s, dir) => {
    val latest = Tables.metrics5m(s, dir)
      .groupBy(col("symbol"))
      .agg(max_by(col("sum_open_interest"), col("create_time")).as("oi"))
    val total = latest.agg(sum(col("oi")).as("total_oi"))
    latest.join(broadcast(total))
      .select(col("symbol"), round(col("oi"), 6).as("oi"),
        round(col("oi") / nullif(col("total_oi"), lit(0.0)), 6).as("share"))
  }

  /** R9 — gap detection by per-day counts (backfill.py:63-96). */
  private val r09: Q = (s, dir) =>
    candles(s, dir)
      .groupBy(col("symbol"), (expr("bucket_ts DIV 86400") * 86400).as("day_ts"))
      .agg(count(lit(1)).as("bars"))
      .filter(col("bars") < 3)

  /** R10 — gap detection by sequence deltas (futures_gap_monitor.py:36-60). */
  private val r10: Q = (s, dir) => {
    val w = Window.partitionBy("symbol").orderBy("bucket_ts")
    candles(s, dir)
      .withColumn("delta", col("bucket_ts") - lag(col("bucket_ts"), 1).over(w))
      .groupBy(col("symbol"))
      .agg(sum(when(col("delta") > 3600L, 1L).otherwise(0L)).as("gap_segments"),
        count(lit(1)).as("bars"))
  }

  /** R11 + R12 — key listing and extent probe, fused into one stats pass. */
  private val r11: Q = (s, dir) =>
    candles(s, dir)
      .groupBy(col("symbol"))
      .agg(min(col("bucket_ts")).as("min_ts"), max(col("bucket_ts")).as("max_ts"),
        count(lit(1)).as("bars"))

  /** R13 — time-desc limited read (ohlc.py:37-55); unique (ts, symbol) sort
    * key makes the limit deterministic.
    */
  private val r13: Q = (s, dir) =>
    candles(s, dir)
      .orderBy(col("bucket_ts").desc, col("symbol"))
      .limit(100)
      .select(col("symbol"), col("bucket_ts"), round(col("close"), 6).as("close"))

  /** R14 — in-proc leaderboard ranking (telegram-service/src/cards/
    * 排行榜服务.py:156-168): sort the per-symbol mart rows by a metric,
    * head k, attach the 1-based rank. The mart side is one row per symbol
    * (bounded, ~hundreds at reference scale); the top-k is a
    * TakeOrderedAndProject and the rank window runs over the 10 survivors
    * — the heavy lifting is the map-side-combinable aggregate below it.
    */
  private val r14: Q = (s, dir) => {
    val base = candles(s, dir).groupBy(col("symbol"))
      .agg(round(max_by(col("close"), col("bucket_ts")), 6).as("price"),
        round(avg((col("high") - col("low")) / nullif(col("close"), lit(0.0))) * 100, 6)
          .as("avg_amplitude_pct"))
    // top-10 via TakeOrderedAndProject (r11, VERDICT #7), THEN the rank
    // window over the 10 surviving rows — the global sort never funnels
    // |symbols| rows through one task
    val w = Window.orderBy(col("avg_amplitude_pct").desc, col("symbol"))
    base.orderBy(col("avg_amplitude_pct").desc, col("symbol")).limit(10)
      .withColumn("rank", row_number().over(w))
  }

  /** R15/R16 — mart join: per-symbol metric row merged with base-data row,
    * then ranked (data_provider.py:510-543). Both sides are latest-per-key
    * aggregates; the join is a broadcast hash join at reference scale.
    */
  private val r15: Q = (s, dir) => {
    val base = candles(s, dir).groupBy(col("symbol"))
      .agg(round(max_by(col("close"), col("bucket_ts")), 6).as("price"),
        round(sum(col("quote_volume")), 4).as("total_qv"))
    val metric = Tables.metrics5m(s, dir).groupBy(col("symbol"))
      .agg(round(max_by(col("sum_open_interest"), col("create_time")), 6).as("oi"))
    metric.join(base, Seq("symbol"), "left")
      .orderBy(col("oi").desc, col("symbol")).limit(20)
  }

  /** R17 — set difference of ranking branches: high-volume symbols that are
    * not high-activity symbols (left anti join = EXCEPT).
    */
  private val r17: Q = (s, dir) => {
    val c = candles(s, dir)
    val agg = c.groupBy(col("symbol"))
      .agg(sum(col("quote_volume")).as("qv"),
        avg((col("high") - col("low")) / nullif(col("close"), lit(0.0))).as("amp"))
    val byQv = agg.orderBy(col("qv").desc, col("symbol")).limit(8).select("symbol")
    val byAmp = agg.orderBy(col("amp").desc, col("symbol")).limit(8).select("symbol")
    byQv.join(byAmp, Seq("symbol"), "left_anti")
  }

  /** W2 — the rank-function window suite (row_number / dense_rank / ntile /
    * percent_rank / cume_dist) per symbol, ordered by volume with a
    * deterministic tie-break. One symbol-partitioned window on the bucketed
    * fact table — zero exchanges on the parquet path.
    */
  private val w02: Q = (s, dir) => {
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("volume").desc, col("bucket_ts"))
    candles(s, dir)
      .select(col("symbol"), col("bucket_ts"), col("volume"))
      .withColumn("rn", row_number().over(w))
      .withColumn("dr", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank",
        floor(percent_rank().over(w) * 1e6 + 0.5) / 1e6)
      .withColumn("cume",
        floor(cume_dist().over(w) * 1e6 + 0.5) / 1e6)
      .drop("volume")
  }

  /** W3 — time-RANGE window frames: trailing 1-hour sums/counts per
    * symbol via `rangeBetween` on the epoch-second bucket key — the
    * VALUE-based frame kind (every other window in the engine is
    * rowsBetween). Unlike a 60-row frame, the RANGE frame is gap-correct:
    * a symbol with missing minutes still aggregates a trailing 1-hour
    * span. Both frame endpoints are inclusive (standard SQL RANGE), so
    * `rangeBetween(-3600, 0)` spans 3601 seconds — 61 one-minute buckets
    * when dense; the oracle mirrors the same inclusive frame.
    * Same single symbol-partitioned sort as w02.
    */
  private val w03: Q = (s, dir) => {
    val w = Window.partitionBy(col("symbol")).orderBy(col("bucket_ts"))
      .rangeBetween(-3600L, 0L)
    candles(s, dir)
      .select(col("symbol"), col("bucket_ts"), col("volume"))
      .withColumn("vol_1h", round(sum(col("volume")).over(w), 6))
      .withColumn("bars_1h", count(lit(1)).over(w))
      .withColumn("vwap_1h_proxy",
        floor(sum(col("volume") * col("bucket_ts")).over(w) /
          nullif(sum(col("volume")).over(w), lit(0.0)) * 1e4 + 0.5) / 1e4)
      .drop("volume")
  }

  /** R18 — pivot: per-symbol volume by day-of-week spread into columns
    * (the `groupBy().pivot()` API surface). With explicit pivot values the
    * plan is a single conditional-sum hash aggregate — one shuffle, no
    * second pass to discover the pivot domain.
    */
  private val r18: Q = (s, dir) =>
    candles(s, dir)
      .withColumn("dow", expr("((bucket_ts DIV 86400) + 4) % 7"))
      .groupBy(col("symbol"))
      .pivot("dow", (0 to 6).map(Integer.valueOf))
      .agg(round(sum(col("volume")), 4))
      .toDF("symbol" +: (0 to 6).map(d => s"dow$d"): _*)

  /** R20 — CUBE grouping sets (the OLAP subtotal lattice beside TPC-H's
    * ROLLUP): per (symbol, trading-day) volume cells PLUS symbol
    * subtotals, day subtotals, and the grand total in ONE pass —
    * Catalyst expands the cube into grouping sets over a single shuffle
    * (no 4× re-scan), and `grouping_id` disambiguates the NULL-keyed
    * subtotal rows exactly as DuckDB's GROUPING() bitmask does. The
    * symbol cut keeps the cell count display-sized; the shape is the
    * scale story (one scan, |cells| output at any corpus size).
    */
  private val r20: Q = (s, dir) =>
    candles(s, dir)
      .filter(col("symbol").isin("S0003", "S0007", "S0011"))
      .withColumn("day", expr("bucket_ts DIV 86400"))
      .cube(col("symbol"), col("day"))
      .agg(count(lit(1)).as("n_bars"),
        round(sum(col("volume")), 6).as("volume"),
        grouping_id().as("gid"))
      .select(col("symbol"), col("day"), col("n_bars"), col("volume"),
        col("gid"))

  val queries: Map[String, Q] =
    Intervals.map { case (n, secs) => s"r04_rollup_$n" -> r04(secs) } ++ Map(
    "r20_cube_volume" -> r20,
    "r01_scan_filter" -> r01,
    "r02_latest_n_per_key" -> r02,
    "r03_latest_per_key" -> r03,
    "r04_rollup_1month" -> r04_1mo,
    "r05_metrics_rollup_15m" -> r05at(900L),
    "r05_metrics_rollup_1h" -> r05at(3600L),
    "r06_meta_join_5m" -> r06at(300L),
    "r06_meta_join_1h" -> r06at(3600L),
    "r07_topk_union" -> r07,
    "r08_market_share" -> r08,
    "r09_gap_days" -> r09,
    "r10_gap_segments" -> r10,
    "r11_symbol_stats" -> r11,
    "r13_limit_desc" -> r13,
    "r14_rank_head" -> r14,
    "r15_mart_join" -> r15,
    "r17_rank_except" -> r17,
    "r18_pivot_dow" -> r18,
    "r19_realtime_rollup" -> r19,
    "r19b_realtime_store" -> r19b,
    "w02_rank_suite" -> w02,
    "w03_range_frame" -> w03)

  private def rollupOracle(seconds: Long): String = Oracle.withCandles(
    s"""SELECT symbol, bucket_ts // $seconds * $seconds AS bucket_ts,
       |  round(min_by(open, bucket_ts), 6) AS open, round(max(high), 6) AS high,
       |  round(min(low), 6) AS low, round(max_by(close, bucket_ts), 6) AS close,
       |  round(sum(volume), 6) AS volume, round(sum(quote_volume), 6) AS quote_volume,
       |  CAST(sum(trade_count) AS BIGINT) AS trade_count,
       |  round(sum(taker_buy_volume), 6) AS taker_buy_volume
       |FROM candles GROUP BY 1, 2""".stripMargin)

  val oracle: Map[String, String] =
    Intervals.map { case (n, secs) => s"r04_rollup_$n" -> rollupOracle(secs) } ++ Map(
    "r20_cube_volume" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts // 86400 AS day,
        |  CAST(count(*) AS BIGINT) AS n_bars,
        |  round(sum(volume), 6) AS volume,
        |  CAST(GROUPING(symbol, bucket_ts // 86400) AS BIGINT) AS gid
        |FROM candles
        |WHERE symbol IN ('S0003','S0007','S0011')
        |GROUP BY CUBE (symbol, bucket_ts // 86400)""".stripMargin),
    "r01_scan_filter" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts, round(close, 6) AS close, round(volume, 6) AS volume
        |FROM candles
        |WHERE symbol IN ('S0003','S0007','S0011') AND bucket_ts > 1705363200""".stripMargin),
    "r02_latest_n_per_key" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts, round(close, 6) AS close, rn FROM (
        |  SELECT symbol, bucket_ts, close,
        |         row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts DESC) AS rn
        |  FROM candles) WHERE rn <= 5""".stripMargin),
    "r03_latest_per_key" -> Oracle.withCandles(
      """SELECT symbol, max(bucket_ts) AS bucket_ts,
        |  round(max_by(close, bucket_ts), 6) AS close,
        |  round(max_by(volume, bucket_ts), 6) AS volume
        |FROM candles GROUP BY symbol""".stripMargin),

    "r04_rollup_1month" -> Oracle.withCandles(
      """SELECT symbol,
        |  CAST(epoch(date_trunc('month', to_timestamp(bucket_ts) AT TIME ZONE 'UTC')) AS BIGINT) AS bucket_ts,
        |  round(min_by(open, bucket_ts), 6) AS open, round(max(high), 6) AS high,
        |  round(min(low), 6) AS low, round(max_by(close, bucket_ts), 6) AS close,
        |  round(sum(volume), 6) AS volume, round(sum(quote_volume), 6) AS quote_volume,
        |  CAST(sum(trade_count) AS BIGINT) AS trade_count,
        |  round(sum(taker_buy_volume), 6) AS taker_buy_volume
        |FROM candles GROUP BY 1, 2""".stripMargin),
    "r05_metrics_rollup_15m" -> Oracle.withMetrics(
      """SELECT symbol, create_time // 900 * 900 AS create_time,
        |  round(max_by(sum_open_interest, create_time), 6) AS sum_open_interest,
        |  round(max_by(sum_open_interest_value, create_time), 4) AS sum_open_interest_value,
        |  round(sum(count_toptrader_long_short_ratio), 6) AS count_toptrader_long_short_ratio,
        |  round(sum(sum_toptrader_long_short_ratio), 6) AS sum_toptrader_long_short_ratio,
        |  round(sum(sum_taker_long_short_vol_ratio) / nullif(sum(count_long_short_ratio), 0.0), 6) AS taker_ratio
        |FROM metrics GROUP BY 1, 2""".stripMargin),
    "r05_metrics_rollup_1h" -> Oracle.withMetrics(
      """SELECT symbol, create_time // 3600 * 3600 AS create_time,
        |  round(max_by(sum_open_interest, create_time), 6) AS sum_open_interest,
        |  round(max_by(sum_open_interest_value, create_time), 4) AS sum_open_interest_value,
        |  round(sum(count_toptrader_long_short_ratio), 6) AS count_toptrader_long_short_ratio,
        |  round(sum(sum_toptrader_long_short_ratio), 6) AS sum_toptrader_long_short_ratio,
        |  round(sum(sum_taker_long_short_vol_ratio) / nullif(sum(count_long_short_ratio), 0.0), 6) AS taker_ratio
        |FROM metrics GROUP BY 1, 2""".stripMargin),
    "r06_meta_join_5m" -> Oracle.withCandlesAndMetrics(
      """SELECT c.symbol, c.bucket_ts, round(c.close, 6) AS close,
        |  round(c.volume, 6) AS volume,
        |  round(c.quote_volume / nullif(c.volume, 0.0), 6) AS vwap,
        |  round((c.high - c.low) / nullif(c.close, 0.0), 6) AS amplitude_ratio,
        |  round(m.sum_open_interest, 6) AS open_interest,
        |  round(m.sum_toptrader_long_short_ratio / nullif(m.count_toptrader_long_short_ratio, 0.0), 6) AS top_long_short_ratio
        |FROM (SELECT symbol, bucket_ts // 300 * 300 AS bucket_ts,
        |        min_by(open, bucket_ts) AS open, max(high) AS high, min(low) AS low,
        |        max_by(close, bucket_ts) AS close, sum(volume) AS volume,
        |        sum(quote_volume) AS quote_volume
        |      FROM candles GROUP BY 1, 2) c
        |LEFT JOIN metrics m ON c.symbol = m.symbol AND c.bucket_ts = m.create_time""".stripMargin),
    "r06_meta_join_1h" -> Oracle.withCandlesAndMetrics(
      """SELECT c.symbol, c.bucket_ts, round(c.close, 6) AS close,
        |  round(c.volume, 6) AS volume,
        |  round(c.quote_volume / nullif(c.volume, 0.0), 6) AS vwap,
        |  round((c.high - c.low) / nullif(c.close, 0.0), 6) AS amplitude_ratio,
        |  round(m.soi, 6) AS open_interest,
        |  round(m.stlsr / nullif(m.ctlsr, 0.0), 6) AS top_long_short_ratio
        |FROM (SELECT symbol, bucket_ts // 3600 * 3600 AS bucket_ts,
        |        min_by(open, bucket_ts) AS open, max(high) AS high, min(low) AS low,
        |        max_by(close, bucket_ts) AS close, sum(volume) AS volume,
        |        sum(quote_volume) AS quote_volume
        |      FROM candles GROUP BY 1, 2) c
        |LEFT JOIN (SELECT symbol, create_time // 3600 * 3600 AS create_time,
        |        max_by(sum_open_interest, create_time) AS soi,
        |        sum(sum_toptrader_long_short_ratio) AS stlsr,
        |        sum(count_toptrader_long_short_ratio) AS ctlsr
        |      FROM metrics GROUP BY 1, 2) m
        |  ON c.symbol = m.symbol AND c.bucket_ts = m.create_time""".stripMargin),
    "r07_topk_union" -> Oracle.withCandles(
      """, win AS (
        |  SELECT symbol, sum(quote_volume) AS qv,
        |         avg((high - low) / nullif(close, 0.0)) AS amp,
        |         sum(trade_count) AS n
        |  FROM candles
        |  WHERE bucket_ts > (SELECT max(bucket_ts) FROM candles) - 604800
        |  GROUP BY symbol)
        |SELECT symbol FROM (SELECT symbol FROM win ORDER BY qv DESC, symbol LIMIT 10) q
        |UNION
        |SELECT symbol FROM (SELECT symbol FROM win ORDER BY amp DESC, symbol LIMIT 10) a
        |UNION
        |SELECT symbol FROM (SELECT symbol FROM win ORDER BY n DESC, symbol LIMIT 10) n
        |UNION
        |SELECT symbol FROM (
        |  SELECT l.symbol
        |  FROM (SELECT symbol, max_by(close, bucket_ts) AS close FROM candles
        |        WHERE bucket_ts > (SELECT max(bucket_ts) FROM candles) - 3600
        |        GROUP BY symbol) l
        |  JOIN (SELECT symbol, max_by(close, bucket_ts) AS prev_close FROM candles
        |        WHERE bucket_ts BETWEEN (SELECT max(bucket_ts) FROM candles) - 90000
        |                            AND (SELECT max(bucket_ts) FROM candles) - 82800
        |        GROUP BY symbol) p USING (symbol)
        |  ORDER BY abs((l.close - p.prev_close) / nullif(p.prev_close, 0.0)) DESC,
        |           symbol LIMIT 10) ch""".stripMargin),
    "r08_market_share" -> Oracle.withMetrics(
      """, latest AS (
        |  SELECT symbol, max_by(sum_open_interest, create_time) AS oi
        |  FROM metrics GROUP BY symbol)
        |SELECT symbol, round(oi, 6) AS oi,
        |  round(oi / nullif((SELECT sum(oi) FROM latest), 0.0), 6) AS share
        |FROM latest""".stripMargin),
    "r09_gap_days" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts // 86400 * 86400 AS day_ts,
        |  count(*) AS bars
        |FROM candles GROUP BY 1, 2 HAVING count(*) < 3""".stripMargin),
    "r10_gap_segments" -> Oracle.withCandles(
      """SELECT symbol,
        |  CAST(sum(CASE WHEN delta > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS gap_segments,
        |  count(*) AS bars
        |FROM (SELECT symbol,
        |        bucket_ts - lag(bucket_ts) OVER (PARTITION BY symbol ORDER BY bucket_ts) AS delta
        |      FROM candles)
        |GROUP BY symbol""".stripMargin),
    "r11_symbol_stats" -> Oracle.withCandles(
      """SELECT symbol, min(bucket_ts) AS min_ts, max(bucket_ts) AS max_ts,
        |  count(*) AS bars
        |FROM candles GROUP BY symbol""".stripMargin),
    "r13_limit_desc" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts, round(close, 6) AS close
        |FROM candles ORDER BY bucket_ts DESC, symbol LIMIT 100""".stripMargin),
    "r14_rank_head" -> Oracle.withCandles(
      """, base AS (
        |  SELECT symbol, round(max_by(close, bucket_ts), 6) AS price,
        |         round(avg((high - low) / nullif(close, 0.0)) * 100, 6) AS avg_amplitude_pct
        |  FROM candles GROUP BY symbol)
        |SELECT symbol, price, avg_amplitude_pct,
        |       CAST(row_number() OVER (ORDER BY avg_amplitude_pct DESC, symbol) AS INT) AS rank
        |FROM base
        |QUALIFY rank <= 10""".stripMargin),
    "r15_mart_join" -> Oracle.withCandlesAndMetrics(
      """, base AS (
        |  SELECT symbol, round(max_by(close, bucket_ts), 6) AS price,
        |         round(sum(quote_volume), 4) AS total_qv
        |  FROM candles GROUP BY symbol),
        |metric AS (
        |  SELECT symbol, round(max_by(sum_open_interest, create_time), 6) AS oi
        |  FROM metrics GROUP BY symbol)
        |SELECT m.symbol, m.oi, b.price, b.total_qv
        |FROM metric m LEFT JOIN base b ON m.symbol = b.symbol
        |ORDER BY m.oi DESC, m.symbol LIMIT 20""".stripMargin),
    "r17_rank_except" -> Oracle.withCandles(
      """, agg AS (
        |  SELECT symbol, sum(quote_volume) AS qv,
        |         avg((high - low) / nullif(close, 0.0)) AS amp
        |  FROM candles GROUP BY symbol)
        |SELECT symbol FROM (SELECT symbol FROM agg ORDER BY qv DESC, symbol LIMIT 8)
        |EXCEPT
        |SELECT symbol FROM (SELECT symbol FROM agg ORDER BY amp DESC, symbol LIMIT 8)""".stripMargin),
    "r19_realtime_rollup" -> Oracle.withCandles(
      """, up AS (
        |  SELECT symbol, bucket_ts // 3600 * 3600 AS bucket_ts,
        |    round(min_by(open, bucket_ts), 6) AS open, round(max(high), 6) AS high,
        |    round(min(low), 6) AS low, round(max_by(close, bucket_ts), 6) AS close,
        |    round(sum(volume), 6) AS volume, round(sum(quote_volume), 6) AS quote_volume,
        |    CAST(sum(trade_count) AS BIGINT) AS trade_count,
        |    round(sum(taker_buy_volume), 6) AS taker_buy_volume
        |  FROM candles GROUP BY 1, 2),
        |wm AS (SELECT (max(bucket_ts) // 3600 - 5) * 3600 AS wm FROM candles)
        |SELECT up.*, bucket_ts >= (SELECT wm FROM wm) AS from_tail FROM up""".stripMargin),
    // r19b: the persisted-store read must equal the refresh-maintained
    // materialization. The Spark side q6-quantizes before the
    // Decimal(38,12) store cast (see the r19b builder Scaladoc); the
    // oracle mirrors the q6 at the same two points — on the rolled
    // stored values, and on the 1m base the tail re-aggregates — so both
    // engines' pre-round values sit on the shared 6-dp grid and the
    // store round-trip cannot flip the final round(x, 6).
    "r19b_realtime_store" -> Oracle.withCandles(
      """, wm AS (SELECT (max(bucket_ts) // 3600 - 5) * 3600 AS wm FROM candles),
        |q6base AS (
        |  SELECT symbol, bucket_ts,
        |    floor(open * 1e6 + 0.5) / 1e6 AS open,
        |    floor(high * 1e6 + 0.5) / 1e6 AS high,
        |    floor(low * 1e6 + 0.5) / 1e6 AS low,
        |    floor(close * 1e6 + 0.5) / 1e6 AS close,
        |    floor(volume * 1e6 + 0.5) / 1e6 AS volume,
        |    floor(quote_volume * 1e6 + 0.5) / 1e6 AS quote_volume,
        |    trade_count,
        |    floor(taker_buy_volume * 1e6 + 0.5) / 1e6 AS taker_buy_volume
        |  FROM candles),
        |stored AS (
        |  SELECT symbol, bucket_ts // 3600 * 3600 AS bucket_ts,
        |    floor(min_by(open, bucket_ts) * 1e6 + 0.5) / 1e6 AS open,
        |    floor(max(high) * 1e6 + 0.5) / 1e6 AS high,
        |    floor(min(low) * 1e6 + 0.5) / 1e6 AS low,
        |    floor(max_by(close, bucket_ts) * 1e6 + 0.5) / 1e6 AS close,
        |    floor(sum(volume) * 1e6 + 0.5) / 1e6 AS volume,
        |    floor(sum(quote_volume) * 1e6 + 0.5) / 1e6 AS quote_volume,
        |    CAST(sum(trade_count) AS BIGINT) AS trade_count,
        |    floor(sum(taker_buy_volume) * 1e6 + 0.5) / 1e6 AS taker_buy_volume
        |  FROM candles WHERE bucket_ts < (SELECT wm FROM wm)
        |  GROUP BY 1, 2),
        |tail AS (
        |  SELECT symbol, bucket_ts // 3600 * 3600 AS bucket_ts,
        |    min_by(open, bucket_ts) AS open, max(high) AS high,
        |    min(low) AS low, max_by(close, bucket_ts) AS close,
        |    sum(volume) AS volume, sum(quote_volume) AS quote_volume,
        |    CAST(sum(trade_count) AS BIGINT) AS trade_count,
        |    sum(taker_buy_volume) AS taker_buy_volume
        |  FROM q6base WHERE bucket_ts >= (SELECT wm FROM wm) GROUP BY 1, 2),
        |up AS (
        |  SELECT *, FALSE AS from_tail FROM stored
        |  UNION ALL
        |  SELECT *, TRUE AS from_tail FROM tail)
        |SELECT symbol, bucket_ts,
        |  round(open, 6) AS open, round(high, 6) AS high,
        |  round(low, 6) AS low, round(close, 6) AS close,
        |  round(volume, 6) AS volume, round(quote_volume, 6) AS quote_volume,
        |  trade_count, round(taker_buy_volume, 6) AS taker_buy_volume,
        |  from_tail
        |FROM up""".stripMargin),
    "r18_pivot_dow" -> Oracle.withCandles(
      """, dowed AS (
        |  SELECT symbol, volume, (bucket_ts // 86400 + 4) % 7 AS dow
        |  FROM candles)
        |SELECT symbol,
        |  round(sum(CASE WHEN dow = 0 THEN volume END), 4) AS dow0,
        |  round(sum(CASE WHEN dow = 1 THEN volume END), 4) AS dow1,
        |  round(sum(CASE WHEN dow = 2 THEN volume END), 4) AS dow2,
        |  round(sum(CASE WHEN dow = 3 THEN volume END), 4) AS dow3,
        |  round(sum(CASE WHEN dow = 4 THEN volume END), 4) AS dow4,
        |  round(sum(CASE WHEN dow = 5 THEN volume END), 4) AS dow5,
        |  round(sum(CASE WHEN dow = 6 THEN volume END), 4) AS dow6
        |FROM dowed GROUP BY symbol""".stripMargin),
    "w02_rank_suite" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  CAST(dense_rank() OVER w AS INT) AS dr,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pct_rank,
        |  floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cume
        |FROM candles
        |WINDOW w AS (PARTITION BY symbol ORDER BY volume DESC, bucket_ts)""".stripMargin),
    "w03_range_frame" -> Oracle.withCandles(
      """SELECT symbol, bucket_ts,
        |  round(sum(volume) OVER w, 6) AS vol_1h,
        |  CAST(count(*) OVER w AS BIGINT) AS bars_1h,
        |  floor(sum(volume * bucket_ts) OVER w /
        |    nullif(sum(volume) OVER w, 0.0) * 1e4 + 0.5) / 1e4
        |    AS vwap_1h_proxy
        |FROM candles
        |WINDOW w AS (PARTITION BY symbol ORDER BY bucket_ts
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin))
}
