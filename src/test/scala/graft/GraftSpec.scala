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
}
