package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites. */
object TestSession {
  lazy val spark: SparkSession = SparkEntry.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class RegistrySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSession.sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  /** The inverse guard: a new operator cannot silently ship without its
    * DuckDB oracle. Every oracle-less entry must be on this DOCUMENTED
    * rows-only list (each is spec-gated instead: d03/d04 use xxhash64,
    * which has no DuckDB twin — PipelineSpec recall pins; f01/f01b are
    * the cycle rows-gates — CycleSpec pins; h24b is an approx sketch
    * tracked against exact h24 — its own accuracy spec).
    */
  test("every query has an oracle or a documented rows-only justification") {
    val rowsOnly = Set("f01_indicator_cycle", "f01b_priority_cycle",
      "d03_dedup_minhash_lsh", "d04_dedup_simhash",
      "h24b_group_quantiles_approx",
      // m05 decodes real JPEG bytes — no DuckDB decoder exists;
      // PipelineSpec pins exact twin recovery + zero false pairs, and
      // f01's composition itself is oracle-proved by the f01c slice
      "m05_phash_neardup")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries with neither oracle nor rows-only entry: $missing")
    val stale = rowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only list entries no longer registered: $stale")
  }

  // The round-5 sentinel: the driver regenerated events.parquet mid-round
  // with a different physical ts encoding (NANOS → MICROS/NTZ) and 86
  // registry entries failed analysis. Tables.events now normalizes at the
  // read boundary; this test reads every fixture table at every SF and
  // asserts the NORMALIZED schema, so the next regeneration fails exactly
  // here with a clear message instead of everywhere.
  test("fixture tables read with expected normalized schema at all SFs") {
    import org.apache.spark.sql.types._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      Tables.All.foreach { t =>
        val df = Tables.read(spark, dir, t)
        assert(df.schema.nonEmpty, s"$sf/$t unreadable")
      }
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == LongType,
        s"$sf events.ts normalized type is ${ev.schema("ts").dataType}, " +
          "expected LongType epoch-nanos — fixture encoding changed again? " +
          "See Tables.events normalization.")
      // sanity: normalized values are plausible epoch nanos (year > 2000)
      val minTs = ev.agg(org.apache.spark.sql.functions.min("ts")).head.getLong(0)
      assert(minTs > 946684800L * 1000000000L,
        s"$sf events.ts min $minTs not plausible epoch nanos")
    }
  }
}

class RollupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._

  lazy val c1m = Tables.candles(spark, TestSession.sf).cache()

  test("rollup preserves volume and trade_count (sum invariant)") {
    val base = c1m.agg(sum("volume"), sum("trade_count")).head
    for (sec <- Seq(300L, 3600L, 86400L)) {
      val up = operators.Rollup.rollup(c1m, sec).agg(sum("volume"), sum("trade_count")).head
      assert(math.abs(base.getDouble(0) - up.getDouble(0)) < 1e-6, s"volume at $sec")
      assert(base.getLong(1) == up.getLong(1), s"trade_count at $sec")
    }
  }

  test("rollup high is max of member highs, low is min (extremum invariant)") {
    val up = operators.Rollup.rollup(c1m, 3600L)
    val viaGroup = c1m.groupBy(col("symbol"),
        (expr("bucket_ts DIV 3600") * 3600).as("bucket_ts"))
      .agg(max("high").as("h2"), min("low").as("l2"))
    val joined = up.join(viaGroup, Seq("symbol", "bucket_ts"))
    val bad = joined.filter(col("high") =!= col("h2") || col("low") =!= col("l2")).count()
    assert(bad == 0)
  }

  test("rollup buckets align to the interval") {
    val up = operators.Rollup.rollup(c1m, 300L)
    assert(up.filter(expr("bucket_ts % 300 != 0")).count() == 0)
  }

  test("hierarchical rollup reassociates double sums (rejected-path pin)") {
    // documents WHY RuleCorpus.rolledCadences serves raw DIRECT roll-ups
    // in the single-build path instead of re-aggregating 1h→4h: the
    // hierarchical sum changes IEEE association order, so it is NOT
    // bit-identical (it IS identical on the engine's 6-dp output grid —
    // both variants quantize alike; this pin fails loudly if the fixture
    // ever stops exhibiting the reassociation, at which point the
    // cheaper hierarchical staging becomes safe to reconsider)
    val oneH = operators.Rollup.rollup(c1m, 3600L)
    val direct = operators.Rollup.rollup(c1m, 14400L)
    val hier = operators.Rollup.rollup(oneH, 14400L)
    assert(direct.count() == hier.count())
    assert(direct.exceptAll(hier).count() > 0, "expected IEEE reassociation")
    val q = (d: org.apache.spark.sql.DataFrame) => d.select(
      col("symbol"), col("bucket_ts"),
      floor(col("volume") * 1e6 + 0.5).as("v6"),
      floor(col("quote_volume") * 1e6 + 0.5).as("qv6"))
    assert(q(direct).exceptAll(q(hier)).count() == 0, "6-dp grid identity")
  }
}

/** S5 — CSV backfill ingest: pinned schema, malformed-row drop, and the
  * shared merge path (backfill repairs holes without clobbering closed
  * bars — reference backfill.py:300-520 + 001_timescaledb.sql:106-119).
  */
class CsvBackfillSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._

  test("csv backfill parses pinned schema, drops malformed rows, merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "day1.csv")
    val w = new java.io.PrintWriter(f)
    w.println("symbol,bucket_ts,open,high,low,close,volume,quote_volume,trade_count,taker_buy_volume,is_closed")
    w.println("S0001,60,1.0,3.0,0.5,2.0,10.0,20.0,4,6.0,true")
    w.println("S0001,120,2.0,4.0,1.5,3.0,11.0,22.0,5,7.0,true")
    w.println("S0002,not_a_ts,garbage,4.0,1.5,3.0,11.0,22.0,5,7.0,true")
    w.close()

    val batch = Tables.candlesFromCsv(spark, f.getAbsolutePath)
    // collect, not count: CSV column pruning means count() parses no
    // columns and so never sees the malformed fields
    assert(batch.collect().length == 2, "malformed row must be dropped")
    // CSV sources relax nullability; names and types must pin exactly
    assert(batch.schema.map(f => (f.name, f.dataType)) ==
      Tables.CandleSchema.map(f => (f.name, f.dataType)))

    // stored bar at ts=60 is open: merge takes greatest/least/new close
    val stored = batch.filter(col("bucket_ts") === 60)
      .select(col("symbol"), col("bucket_ts"), lit(9.9).as("open"),
        lit(2.5).as("high"), lit(1.0).as("low"), lit(1.5).as("close"),
        lit(5.0).as("volume"), lit(9.0).as("quote_volume"),
        lit(2L).as("trade_count"), lit(3.0).as("taker_buy_volume"),
        lit(false).as("is_closed"))
    val merged = streaming.StreamRollup.upsertBatch(stored, batch)
      .filter(col("bucket_ts") === 60).head
    assert(merged.getAs[Double]("high") == 3.0)   // greatest
    assert(merged.getAs[Double]("low") == 0.5)    // least
    assert(merged.getAs[Double]("close") == 2.0)  // incoming close wins
    assert(merged.getAs[Double]("open") == 1.0)   // stored bar not closed -> incoming open
    assert(merged.getAs[Boolean]("is_closed"))    // OR
    assert(streaming.StreamRollup.upsertBatch(stored, batch).count() == 2)
  }
}

/** Physical layout: date-partitioned write, partition pruning on read,
  * retention as partition drop (SURVEY §1.3/§4 storage contract).
  */
class StorageLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import org.apache.spark.sql.functions._

  test("partitioned write round-trips, prunes partitions, drops retention") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toFile.getAbsolutePath
    val candles = Tables.candles(spark, TestSession.sf)
    Tables.writeCandles(candles, dir)

    val back = Tables.readCandles(spark, dir)
    assert(back.count() == candles.count())

    // storage fidelity: prices/volumes persist as NUMERIC(38,12)
    // (001_timescaledb.sql:13-21); the operator boundary reads float64
    val storedTypes = Tables.readCandlesStored(spark, dir).schema
      .fields.map(f => f.name -> f.dataType).toMap
    Tables.DecimalCols.foreach { c =>
      assert(storedTypes(c) == Tables.StorageDecimal, s"$c stored as ${storedTypes(c)}")
    }
    Tables.DecimalCols.foreach { c =>
      assert(back.schema(c).dataType == org.apache.spark.sql.types.DoubleType)
    }

    // round-trip equality on a sample key (12-dp decimal quantization
    // bounds the drift at ~1e-12 per value)
    val a = candles.filter(col("symbol") === "S0003")
      .agg(sum("volume"), max("high")).head
    val b = back.filter(col("symbol") === "S0003")
      .agg(sum("volume"), max("high")).head
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6 &&
      math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9)

    // a date filter must reach the scan as a partition filter
    val pruned = back.filter(col("dt") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
      s"date filter not pushed to partition pruning:\n$scan")

    // retention: drop everything before Jan 10, only later partitions remain
    val dropped = Tables.dropPartitionsBefore(spark, dir, java.time.LocalDate.parse("2024-01-10"))
    assert(dropped.nonEmpty && dropped.forall(_ < "dt=2024-01-10"))
    val left = Tables.readCandles(spark, dir)
    assert(left.agg(min(col("dt").cast("string"))).head.getString(0) >= "2024-01-10")
    assert(left.count() < candles.count())
  }

  test("u04 compaction rewrites only fragmented partitions, preserves rows exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toFile.getAbsolutePath
    val candles = Tables.candles(spark, TestSession.sf)
    Tables.writeCandles(candles, dir)

    def partFiles(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("dt="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    }
    // fragment ONE partition into many small files (the streaming-ingest
    // shape): rewrite its rows with repartition(7)
    val victim = partFiles().keySet.min.stripPrefix("dt=")
    val frag = Tables.readCandlesStored(spark, dir)
      .filter(col("dt").cast("string") === victim).localCheckpoint()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    frag.repartition(7).write.mode("overwrite").partitionBy("dt").parquet(dir)
    val before = partFiles()
    assert(before(s"dt=$victim").size == 7, s"fragmentation failed: $before")
    val rowsBefore = Tables.readCandles(spark, dir)
      .agg(count(lit(1)), sum("volume"), sum(expr("hash(symbol, bucket_ts)")))
      .head

    val report = Tables.compactCandlePartitions(spark, dir)
    assert(report.map(_._1) == Seq(victim),
      s"only the fragmented partition compacts: $report")
    assert(report.head._2 == 7 && report.head._3 == 1, s"report wrong: $report")

    val after = partFiles()
    assert(after(s"dt=$victim").size == 1, "victim partition not compacted")
    before.keySet.filterNot(_ == s"dt=$victim").foreach { p =>
      assert(before(p) == after(p), s"healthy partition $p was rewritten")
    }
    // pure re-layout: identical row multiset (count + content hashes),
    // Decimal(38,12) storage types preserved
    val rowsAfter = Tables.readCandles(spark, dir)
      .agg(count(lit(1)), sum("volume"), sum(expr("hash(symbol, bucket_ts)")))
      .head
    assert(rowsBefore == rowsAfter, s"$rowsBefore vs $rowsAfter")
    val storedTypes = Tables.readCandlesStored(spark, dir).schema
      .fields.map(f => f.name -> f.dataType).toMap
    Tables.DecimalCols.foreach { c =>
      assert(storedTypes(c) == Tables.StorageDecimal) }
  }

  test("partition-scoped merge rewrites only the touched date partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toFile.getAbsolutePath
    val candles = Tables.candles(spark, TestSession.sf)
      .withColumn("is_closed", lit(true))
    Tables.writeCandles(candles, dir)

    def partFiles(): Map[String, Set[(String, Long)]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("dt="))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    }
    val before = partFiles()

    // incoming batch: one bucket of one symbol on one day, higher high
    val target = Tables.readCandles(spark, dir)
      .filter(col("symbol") === "S0003").orderBy("bucket_ts").limit(1)
      .drop("dt").cache()
    val key = target.select("bucket_ts").head.getLong(0)
    val oldHigh = target.select("high").head.getDouble(0)
    val batch = target
      .withColumn("high", col("high") + 1000.0)
      .withColumn("is_closed", lit(true))
    val touchedDt = java.time.Instant.ofEpochSecond(key)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

    val touched = graft.operators.Maintenance
      .mergeCandlesPartitioned(spark, dir, batch)
    assert(touched == Seq(touchedDt), s"touched=$touched")

    // untouched partitions: identical files, identical mtimes
    val after = partFiles()
    assert(before.keySet == after.keySet)
    before.keySet.filterNot(_ == s"dt=$touchedDt").foreach { p =>
      assert(before(p) == after(p), s"partition $p was rewritten")
    }
    // merged partition reflects GREATEST(high); 12-dp decimal storage
    // bounds round-trip drift at ~1e-12
    val got = Tables.readCandles(spark, dir)
      .filter(col("symbol") === "S0003" && col("bucket_ts") === key)
      .select("high").head.getDouble(0)
    assert(math.abs(got - (oldHigh + 1000.0)) < 1e-9)
    // row count unchanged (update, not append)
    assert(Tables.readCandles(spark, dir).count() == candles.count())
  }
}

/** Mart fidelity: the reference's fixed leading columns and registry
  * table names (indicators/base.py:64-75,79-125).
  */
class MartSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("asMartRow pins the reference leading columns verbatim") {
    val out = operators.Mart.asMartRow(
      indicators.Rolling.queries("i10_bollinger")(spark, TestSession.sf), "1m")
    assert(out.columns.take(3).toSeq == Seq("交易对", "周期", "数据时间"))
    val row = out.limit(1).collect().head
    assert(row.getAs[String]("周期") == "1m")
    assert(row.getAs[String]("数据时间").matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
  }

  test("mart upsert tolerates schema drift and replaces by key") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mart").toString + "/t"
    val v1 = Seq(("S1", "1m", "2024-01-01 00:00:00", 1.0, 10.0),
        ("S2", "1m", "2024-01-01 00:00:00", 2.0, 20.0))
      .toDF("交易对", "周期", "数据时间", "a", "b")
    operators.Mart.upsertMart(s, dir, v1)
    // v2 drops column b, adds column c, restates S1's row
    val v2 = Seq(("S1", "1m", "2024-01-01 00:00:00", 9.0, 99.0))
      .toDF("交易对", "周期", "数据时间", "a", "c")
    operators.Mart.upsertMart(s, dir, v2)
    val got = s.read.parquet(dir)
    assert(got.columns.toSet == Set("交易对", "周期", "数据时间", "a", "b", "c"))
    val rows = got.collect().map(r =>
      r.getAs[String]("交易对") -> (r.getAs[Any]("a"), r.getAs[Any]("b"),
        r.getAs[Any]("c"))).toMap
    assert(rows("S1") == ((9.0, null, 99.0)))  // replaced, b padded null
    assert(rows("S2") == ((2.0, 20.0, null)))  // kept, c padded null
    assert(got.count() == 2)
  }

  test("h24b approx quantiles track the exact aggregate within sketch error") {
    // the approx twin is the 100 TB form (bounded sketch state); no DuckDB
    // oracle exists for a Greenwald-Khanna sketch, so pin it here against
    // the exact percentile instead. Accuracy 10000 ⇒ rank error ≤ 1e-4;
    // on sf0.001's value distributions that is well under 1% in value.
    val exact = SparkEntry.queries("h24_group_quantiles")(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = SparkEntry.queries("h24b_group_quantiles_approx")(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, a) <- approx; e = exact(k); i <- 1 to 3) {
      val (av, ev) = (a.getDouble(i), e.getDouble(i))
      assert(math.abs(av - ev) <= 0.01 * math.abs(ev),
        s"$k col $i: approx $av vs exact $ev")
    }
    for ((k, a) <- approx)
      assert(a.getLong(4) == exact(k).getLong(4), s"$k count mismatch")
  }

  test("every indicator query has a registry table name") {
    val iKeys = SparkEntry.queries.keySet.filter(_.startsWith("i"))
      .filterNot(Set("i19_pivot_points", "i34_tail_streak")) // §2.3 primitives, not mart tables
    val missing = iKeys -- operators.Mart.RegistryNames.keySet
    assert(missing.isEmpty, s"indicator queries without registry names: $missing")
  }
}
