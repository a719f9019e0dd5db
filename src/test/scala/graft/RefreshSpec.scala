package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental roll-up refresh (the cagg maintenance model,
  * 004_continuous_aggregates.sql:49-81): a late 1m bar must propagate into
  * the 5m and 1d stores by recomputing ONLY the trailing refresh window —
  * partitions outside the window stay untouched bytes on disk.
  */
class RefreshSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  // two UTC days of 1m bars; integer-valued prices/volumes so every
  // aggregate is IEEE-exact and store comparisons can be equality
  private def bars = {
    val s = spark
    import s.implicits._
    (0L until 2880L).map { m =>
      C1m("A", m * 60, m.toDouble, m + 2.0, m - 2.0, m + 1.0,
        1.0, 2.0, 1L, 1.0)
    }.toDF().withColumn("is_closed", lit(true))
  }

  private def snap(path: String): Set[(String, Long, Double, Double, Double)] =
    Tables.readCandles(spark, path)
      .select("symbol", "bucket_ts", "high", "close", "volume")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

  test("late 1m bar propagates to 5m and 1d via trailing-window refresh only") {
    val root = java.nio.file.Files.createTempDirectory("graft_refresh").toString
    val base = s"$root/c1m"; val p5 = s"$root/c5m"; val p1d = s"$root/c1d"
    val nowTs = 2879L * 60

    Tables.writeCandles(bars, base)
    // bootstrap: offset covers all history
    operators.Rollup.refreshRollup(spark, base, p5, 300L, nowTs + 300, nowTs)
    operators.Rollup.refreshRollup(spark, base, p1d, 86400L, nowTs + 86400, nowTs)
    assert(snap(p5) == snapOf(base, 300L) && snap(p1d) == snapOf(base, 86400L))

    def partFiles(path: String, dt: String): Set[(String, Long)] = {
      val d = new java.io.File(s"$path/dt=$dt")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    }
    val day1Before5 = partFiles(p5, "1970-01-01")
    val day1Before1d = partFiles(p1d, "1970-01-01")

    // a late day-2 bar restates minute 2800 with a 1000-higher high
    val s = spark
    import s.implicits._
    val late = Seq(C1m("A", 2800L * 60, 2800.0, 2800.0 + 1002.0,
      2798.0, 2801.0, 1.0, 2.0, 1L, 1.0)).toDF()
      .withColumn("is_closed", lit(true))
    operators.Maintenance.mergeCandlesPartitioned(spark, base, late)

    // incremental refresh: 2h trailing window (covers the 79-min-late bar;
    // lateness beyond start_offset is out of contract, 004:66-81) ⇒
    // touches day 2 only
    val t5 = operators.Rollup.refreshRollup(spark, base, p5, 300L, 7200L, nowTs)
    val t1d = operators.Rollup.refreshRollup(spark, base, p1d, 86400L, 7200L, nowTs)
    assert(t5 == Seq("dt=1970-01-02") && t1d == Seq("dt=1970-01-02"))

    // day-1 partitions: identical files, identical mtimes — no full recompute
    assert(partFiles(p5, "1970-01-01") == day1Before5)
    assert(partFiles(p1d, "1970-01-01") == day1Before1d)

    // the refreshed stores equal a from-scratch recompute of the merged base
    assert(snap(p5) == snapOf(base, 300L))
    assert(snap(p1d) == snapOf(base, 86400L))
    // and the late high actually shows up in both
    assert(snap(p5).exists(r => r._2 == (2800L * 60 / 300) * 300 && r._3 == 3802.0))
    assert(snap(p1d).exists(r => r._2 == 86400L && r._3 == 3802.0))
  }

  test("metrics cagg refresh: late 5m row propagates to the 15m store incrementally") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mref").toString
    val base = s"$root/m5m"; val p15 = s"$root/m15m"
    // two days of 5m metrics rows, integer-valued so sums are IEEE-exact
    val rows = (0L until 576L).map { i =>
      (("A"): String, i * 300, (i + 1).toDouble, 2.0 * (i + 1), 1.0, 1.0 + (i % 3),
        1.0, 1.0 + (i % 2))
    }.toDF("symbol", "create_time", "sum_open_interest",
      "sum_open_interest_value", "count_toptrader_long_short_ratio",
      "sum_toptrader_long_short_ratio", "count_long_short_ratio",
      "sum_taker_long_short_vol_ratio")
      .withColumn("dt", to_date(timestamp_seconds(col("create_time"))))
    val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    rows.repartition(col("dt")).write.mode("overwrite")
      .partitionBy("dt").parquet(base)
    val nowTs = 575L * 300
    operators.Rollup.refreshMetricsRollup(spark, base, p15, 900L, nowTs + 900, nowTs)

    def snapM(path: String): Set[(String, Long, Double, Double)] =
      Tables.readCandles(spark, path)
        .select("symbol", "create_time", "sum_open_interest",
          "sum_toptrader_long_short_ratio")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
    def recomputed: Set[(String, Long, Double, Double)] =
      operators.Rollup.rollupMetrics(
        Tables.readCandles(spark, base).drop("dt"), 900L)
        .select("symbol", "create_time", "sum_open_interest",
          "sum_toptrader_long_short_ratio")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
    assert(snapM(p15) == recomputed)

    val day1Files = new java.io.File(s"$p15/dt=1970-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified())).toSet

    // restate a late day-2 5m row (higher OI) directly in the base store;
    // i=572 is the LAST row of its 15m bucket, so the bucket's max_by
    // gauge must become the restated value
    val late = Seq(("A", 572L * 300, 9999.0, 2.0, 1.0, 3.0, 1.0, 2.0))
      .toDF(rows.columns.filter(_ != "dt"): _*)
      .withColumn("dt", to_date(timestamp_seconds(col("create_time"))))
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val day2 = Tables.readCandles(spark, base)
        .filter(col("dt") === "1970-01-02" && col("create_time") =!= 572L * 300)
      day2.unionByName(late).repartition(col("dt"))
        .write.mode("overwrite").partitionBy("dt").parquet(base)
    } finally prev match {
      case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    val touched = operators.Rollup.refreshMetricsRollup(
      spark, base, p15, 900L, 7200L, nowTs)
    assert(touched == Seq("dt=1970-01-02"))
    val day1After = new java.io.File(s"$p15/dt=1970-01-01").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified())).toSet
    assert(day1After == day1Files)
    assert(snapM(p15) == recomputed) // equals from-scratch recompute of restated base
    assert(snapM(p15).exists(r => r._2 == (572L * 300 / 900) * 900 && r._3 == 9999.0))
  }

  test("u03 patch invariant: stale store + invalidated-bucket refresh == fully-fresh rollup") {
    import org.apache.spark.sql.functions._
    val sf = TestSession.sf
    def roll(ev: org.apache.spark.sql.DataFrame) = ev
      .groupBy(format_string("S%04d", col("user_id")).as("symbol"),
        expr("ts DIV 86400000000000").as("day"),
        (expr("ts DIV 300000000000") * 300).as("bucket_ts"))
      .agg(round(sum(col("value")), 6).as("volume"),
        count(lit(1)).as("trade_count"))
    val all = Tables.events(spark, sf)
    // stale store: materialized before the late batch (event_id % 101 == 0) arrived
    val stale = roll(all.filter(col("event_id") % 101 =!= 0))
    val refreshed = operators.Maintenance.queries("u03_invalidation_refresh")(spark, sf)
      .select(col("symbol"), col("day"), col("bucket_ts"),
        col("volume"), col("trade_count"))
    // patch: drop every invalidated (symbol, day) from the stale store, then
    // append the refreshed buckets — exactly the partition-scoped rewrite
    val inval = refreshed.select("symbol", "day").distinct()
    val patched = stale.join(inval, Seq("symbol", "day"), "leftanti")
      .unionByName(refreshed)
    val fresh = roll(all)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("symbol", "day", "bucket_ts", "volume", "trade_count").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(key(patched) == key(fresh),
      "patched store must equal the fully-fresh rollup bucket-for-bucket")
  }

  test("real-time read: stale materialization + fresh tail equals a fully-fresh rollup") {
    // materialization watermark at hour 36 of 48: the stored 1h rollup
    // KNOWS NOTHING after it (the refresh hasn't run), yet the real-time
    // read must serve post-watermark buckets fresh from the 1m base
    val wmTs = 36L * 3600
    val stale = operators.Rollup.rollup(
      bars.filter(col("bucket_ts") < wmTs), 3600L)
    val wm = bars.agg(lit(wmTs).as("wm"))
    val rt = operators.Rollup.realtimeRollup(stale, bars, 3600L, wm)

    val fresh = operators.Rollup.rollup(bars, 3600L)
      .select("symbol", "bucket_ts", "high", "close", "volume")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val served = rt
      .select("symbol", "bucket_ts", "high", "close", "volume")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(served == fresh,
      "real-time read disagrees with a fully-fresh materialization")

    // the freshness split is exactly at the watermark
    val tails = rt.select("bucket_ts", "from_tail").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(tails.forall { case (b, t) => t == (b >= wmTs) })
    assert(tails.count(_._2) == 12) // 48 - 36 hourly buckets served fresh
  }

  test("materialized real-time read: both scans partition-prune at the watermark date") {
    val root = java.nio.file.Files.createTempDirectory("graft_rtread").toString
    val base = s"$root/c1m"; val p1h = s"$root/c1h"
    Tables.writeCandles(bars, base)
    // materialize the 1h rollup as of hour 36 of 48: the store knows
    // nothing after the watermark (refresh hasn't run since)
    val wmTs = 36L * 3600
    operators.Rollup.refreshRollup(spark, base, p1h, 3600L, wmTs, wmTs - 1)

    val rt = operators.Rollup.realtimeRead(spark, p1h, base, 3600L, wmTs)

    // serving and materializing can never disagree: the read equals a
    // fully-fresh rollup of the base store, split exactly at the watermark
    val fresh = operators.Rollup.rollup(
        Tables.readCandles(spark, base).drop("dt"), 3600L)
      .select("symbol", "bucket_ts", "high", "close", "volume")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val served = rt.select("symbol", "bucket_ts", "high", "close", "volume")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(served == fresh)
    val tails = rt.select("bucket_ts", "from_tail").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(tails.forall { case (b, t) => t == (b >= wmTs) })

    // the scalar watermark must reach BOTH scans as a dt partition filter:
    // stored side bounded above, base tail bounded below (day 2 = wm date)
    val scans = rt.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val storedScan = scans.find(_.contains("c1h")).getOrElse("")
    val baseScan = scans.find(_.contains("c1m")).getOrElse("")
    assert(storedScan.contains("PartitionFilters") &&
      storedScan.contains("1970-01-02"),
      s"stored side not pruned:\n$storedScan")
    assert(baseScan.contains("PartitionFilters") &&
      baseScan.contains("1970-01-02"),
      s"base tail not pruned:\n$baseScan")
  }

  private def snapOf(basePath: String,
      seconds: Long): Set[(String, Long, Double, Double, Double)] =
    operators.Rollup.rollup(
      Tables.readCandles(spark, basePath).drop("dt"), seconds)
      .select("symbol", "bucket_ts", "high", "close", "volume")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
}
