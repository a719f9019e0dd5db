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

  test("cycle branches read the interval cache, never the store") {
    // the fact store is scanned once to build the working frames; every
    // (indicator × interval) branch plan must be cache-backed — a
    // FileScan inside a branch means the fan-out re-reads the fact table
    // per indicator, which at 100 TB multiplies the scan 287×
    assert(branches.size == miniIntervals.size * miniPack.size)
    branches.foreach { b =>
      val leaves = b.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(
          _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]),
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
}
