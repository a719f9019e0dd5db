package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ad-hoc SQL surface: every table queryable by name via spark.sql,
  * results agreeing with the typed operators on the same data.
  */
class ViewsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("registered views serve ad-hoc SQL that matches the typed operators") {
    val names = Views.register(spark, TestSession.sf)
    assert(names.contains("candles") && names.contains("lineitem"))

    // star-schema join through pure SQL
    val n = spark.sql(
      """SELECT count(*) FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey""".stripMargin)
      .head.getLong(0)
    assert(n > 0)

    // candle view agrees with the typed roll-up operator
    // floor-1e6 both sides: double summation order differs between the two
    // plans, so exact equality on raw sums is flaky-prone.
    val sqlRollup = spark.sql(
      """SELECT symbol, CAST(bucket_ts / 300 AS BIGINT) * 300 AS b5,
        |  floor(sum(volume) * 1e6 + 0.5) / 1e6 AS v
        |FROM candles GROUP BY 1, 2""".stripMargin)
    val typed = operators.Rollup.rollup(
      Tables.candles(spark, TestSession.sf), 300L)
      .selectExpr("symbol", "bucket_ts AS b5",
        "floor(volume * 1e6 + 0.5) / 1e6 AS v")
    assert(sqlRollup.exceptAll(typed).count() == 0)
    assert(typed.exceptAll(sqlRollup).count() == 0)

    // window SQL over the view
    val latest = spark.sql(
      """SELECT symbol, close FROM (
        |  SELECT symbol, close,
        |    row_number() OVER (PARTITION BY symbol ORDER BY bucket_ts DESC) rn
        |  FROM candles) WHERE rn = 1""".stripMargin).count()
    assert(latest == Tables.candles(spark, TestSession.sf)
      .select("symbol").distinct().count())
  }
}
