package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the full-indicator-cycle job (operators/Cycle.scala, the
  * reference's production hot loop — simple_scheduler.py:47,
  * core/engine.py:164-191) on a reduced 2-interval × 3-indicator slice so
  * the suite stays fast; the full 7×41 fan-out is gated by the driver's
  * f01 rows check at sf0.01.
  */
class CycleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private val miniIntervals = Seq("5m" -> 300L, "1h" -> 3600L)
  private def miniPack: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "i10_bollinger" -> indicators.Rolling.queries("i10_bollinger"),
    "i22_rsi" -> indicators.Ewma.queries("i22_rsi"),
    "i29_supertrend" -> indicators.Stateful.queries("i29_supertrend"))

  private lazy val frames = {
    val fs = operators.Cycle.workingFrames(spark, sf, miniIntervals)
    fs.foreach(_._2.count())
    fs
  }
  private lazy val branches =
    operators.Cycle.branchPlans(spark, sf, frames, miniPack)

  /** A branch plan leaf that is served from MEMORY, never the store: the
    * persisted working frames show as InMemoryRelation, the r14
    * checkpointed fused frame as LogicalRDD — both are the cached
    * working set; a FileScan leaf would be a store re-read.
    */
  private def inMemoryLeaf(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
    p.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation] ||
      p.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  test("cycle branches read the interval cache, never the store") {
    // the fact store is scanned once to build the working frames; every
    // (indicator × interval) branch plan must be cache-backed — a
    // FileScan inside a branch means the fan-out re-reads the fact table
    // per indicator, which at 100 TB multiplies the scan 287×
    assert(branches.size == miniIntervals.size * miniPack.size)
    branches.foreach { b =>
      val leaves = b.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(inMemoryLeaf),
        s"cycle branch touches the store: leaves = ${leaves.map(_.nodeName)}")
    }
  }

  test("cycle emits one mart snapshot per symbol × indicator × interval") {
    val out = operators.Cycle.runBranches(branches)
    val perKey = out.groupBy(col("交易对"), col("周期"), col("indicator"))
      .agg(countDistinct(col("数据时间")).as("n_ts"))
    assert(perKey.agg(max(col("n_ts"))).head.getLong(0) == 1L,
      "an indicator emitted more than one snapshot time for a symbol")
    val ivs = out.select("周期").distinct().collect().map(_.getString(0)).toSet
    assert(ivs == Set("5m", "1h"), s"interval set wrong: $ivs")
    val inds = out.select("indicator").distinct().count()
    assert(inds == 3L, s"expected 3 indicators, got $inds")
    frames.foreach(_._2.unpersist())
  }

  test("cascaded roll-ups == from-1m roll-ups (uncut, full history)") {
    // hierarchical-cagg nesting property (r10; measured slower than
    // re-scanning the cached fact in the cycle itself — workingFrames
    // scaladoc — but the property matters for refresh paths that CAN'T
    // hold the finest level): rolling 1m→5m→1h equals rolling 1m→1h.
    // OHLC argmin/argmax/min/max and the integer trade count compose
    // EXACTLY across nested buckets; the double volume sums merely
    // regroup additions — pin full equality on the driver fixture so
    // any drift (a non-nesting boundary, a wrong source) fails loudly.
    val base = Tables.candles(spark, sf)
    val direct = operators.Rollup.rollup(base, 3600L)
    val cascaded = operators.Rollup.rollup(
      operators.Rollup.rollup(base, 300L), 3600L)
    val cols = direct.columns.sorted.map(col).toSeq
    val d = direct.select(cols: _*).collect().map(_.toString).sorted
    val c = cascaded.select(cols: _*).collect().map(_.toString).sorted
    assert(d.length == c.length && d.length > 0,
      s"row counts differ: direct=${d.length} cascaded=${c.length}")
    assert(d.sameElements(c),
      s"first diff: ${d.zip(c).find { case (a, b) => a != b }}")
  }

  test("fused interval branches == per-interval branches row-for-row") {
    // the f01 driver-cost lever: ONE plan per indicator over a composite
    // symbol+iv key must emit exactly the rows of one plan per
    // (indicator, interval) — any divergence means an indicator is not
    // per-symbol pure (a cross-symbol aggregate would mix intervals)
    frames.foreach(_._2.persist()) // earlier tests may have unpersisted
    val fused = operators.Cycle.fusedFrame(spark,
      operators.Cycle.workingFrames(spark, sf, miniIntervals, persist = false))
    fused.count()
    try {
      val fusedBranches =
        operators.Cycle.fusedBranchPlans(spark, sf, fused, miniPack)
      // the cache contract carries over: every fused branch plan must be
      // backed by the fused cache, never the store
      fusedBranches.foreach { b =>
        val leaves = b.queryExecution.optimizedPlan.collectLeaves()
        assert(leaves.nonEmpty && leaves.forall(inMemoryLeaf),
          s"fused branch touches the store: leaves = ${leaves.map(_.nodeName)}")
      }
      val fusedOut = operators.Cycle.runBranches(fusedBranches)
        .collect().map(_.toString).sorted
      val perIv = operators.Cycle.runBranches(branches)
        .collect().map(_.toString).sorted
      assert(fusedOut.length == perIv.length,
        s"row counts differ: fused=${fusedOut.length} perIv=${perIv.length}")
      assert(fusedOut.sameElements(perIv),
        s"first diff: ${fusedOut.zip(perIv).find { case (a, b) => a != b }}")
    } finally { fused.unpersist(); () }
  }

  test("priority cycle: non-priority symbols never reach a frame or branch") {
    // the f01b cut mechanics (async_full_engine.py:54-131): the base fact
    // is semi-joined to the priority set BEFORE frames are built, so a
    // non-priority symbol must be absent from every working frame — not
    // merely filtered from the output after paying its indicator compute.
    // A fixed 5-of-15 set keeps the pin non-vacuous at sf0.001 (where
    // r07's ranking union can cover all symbols); f01b itself wires r07.
    val prioSet = Set("S0001", "S0003", "S0005", "S0007", "S0009")
    val s2 = spark
    import s2.implicits._
    val prio = prioSet.toSeq.toDF("symbol")
    val all = Tables.candles(spark, sf).select("symbol").distinct()
      .collect().map(_.getString(0)).toSet
    assert((all -- prioSet).nonEmpty, "cut is vacuous: every symbol is priority")
    val base = Tables.candles(spark, sf)
      .join(broadcast(prio), Seq("symbol"), "left_semi")
    val pframes = Tables.withCandleFrame(base)(
      operators.Cycle.workingFrames(spark, sf, miniIntervals))
    pframes.foreach(_._2.count())
    pframes.foreach { case (iv, f) =>
      val syms = f.select("symbol").distinct().collect().map(_.getString(0)).toSet
      assert(syms.subsetOf(prioSet),
        s"frame $iv leaked non-priority symbols: ${syms -- prioSet}")
    }
    val out = operators.Cycle.runBranches(
      operators.Cycle.branchPlans(spark, sf, pframes, miniPack))
    val outSyms = out.select("交易对").distinct().collect().map(_.getString(0)).toSet
    assert(outSyms.subsetOf(prioSet),
      s"branch output leaked non-priority symbols: ${outSyms -- prioSet}")

    // the futures pack reads BOTH facts (the taker-ratio scanner reads
    // candles, Futures.scala:27 — the f01b leak found at sf0.01): under
    // both overrides every futures query must stay inside the cut
    val mcut = Tables.metrics5m(spark, sf)
      .join(broadcast(prio), Seq("symbol"), "left_semi")
    Tables.withCandleFrame(base) {
      Tables.withMetricsFrame(mcut) {
        indicators.Futures.queries.foreach { case (key, q) =>
          val syms = q(spark, sf).select("symbol").distinct()
            .collect().map(_.getString(0)).toSet
          assert(syms.subsetOf(prioSet),
            s"futures branch $key leaked non-priority symbols: ${syms -- prioSet}")
        }
      }
    }
    pframes.foreach(_._2.unpersist())
  }

  test("f01d metrics slice: snapshot rides the trailing cut to each symbol's latest bar") {
    // the composition contract the oracle also proves: both metrics-fact
    // indicators flow through the shared read → trailing-240 cut →
    // snapshot → melt, so every (symbol, indicator) lands exactly one
    // bucket_ts — the symbol's NEWEST create_time (the cut keeps the
    // newest rows, so the latest bar survives it), at the native 5m itv
    val out = operators.Cycle.queries("f01d_cycle_metrics")(spark, sf)
      .persist()
    try {
      val inds = out.select("indicator").distinct()
        .collect().map(_.getString(0)).toSet
      assert(inds === Set("期货情绪元数据", "期货情绪聚合表"))
      assert(out.select("itv").distinct().collect()
        .map(_.getString(0)).toSet === Set("5m"))
      val latest = Tables.metrics5m(spark, sf)
        .groupBy("symbol").agg(max(col("create_time")).as("want_ts"))
      val off = out.select("symbol", "indicator", "bucket_ts").distinct()
        .join(latest, Seq("symbol"))
        .filter(col("bucket_ts") =!= col("want_ts"))
      assert(off.count() === 0,
        s"snapshot not at the latest bar: ${off.take(3).mkString(";")}")
      // one snapshot row per (symbol, indicator, field)
      val dup = out.groupBy("symbol", "indicator", "field").count()
        .filter(col("count") > 1)
      assert(dup.count() === 0, s"duplicate melt rows: ${dup.take(3).mkString(";")}")
    } finally { out.unpersist(); () }
  }

  test("futures branches read the cached facts, never the store") {
    // the r6/r7 carried unpersist-ordering bug: `base` was unpersisted
    // BEFORE the futures branches (which read it via withCandleFrame)
    // executed, so each branch re-scanned the 1m fact and re-ran the
    // priority semi-join once per cycle. Pin: with both facts cached,
    // every futures branch plan is cache-backed end to end.
    val base = Tables.candles(spark, sf).persist()
    val mframe = Tables.metrics5m(spark, sf).persist()
    base.count(); mframe.count()
    try {
      val branches = operators.Cycle.futuresBranchPlans(spark, sf, base, mframe)
      assert(branches.nonEmpty)
      branches.foreach { b =>
        val leaves = b.queryExecution.optimizedPlan.collectLeaves()
        assert(leaves.nonEmpty && leaves.forall(
            _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]),
          s"futures branch touches the store: leaves = ${leaves.map(_.nodeName)}")
      }
    } finally { base.unpersist(); mframe.unpersist() }
  }
}
