package graft.operators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range join — pair each interval `(lo, hi]` with the points falling
  * inside it, per key. Spark plans a naive non-equi join as a broadcast
  * nested loop (or worse, a cartesian filter): quadratic per key. The
  * scalable shape buckets the time axis: intervals explode to the fixed-
  * width buckets they overlap, points carry their own bucket, the join is
  * a plain EQUI join on (key, bucket), and the exact range predicate
  * filters the bucket-boundary false positives. Fan-out is
  * ceil(range/bucketWidth)+1 rows per interval — bounded and chosen by the
  * caller — and every downstream operator sees an ordinary shuffled
  * equi-join, AQE-skew-handling included. (DuckDB plans the same query
  * with its native IEJoin, which is the oracle here.)
  */
object RangeJoin {
  private type Q = (SparkSession, String) => DataFrame

  /** @param lo/hi interval column names on `intervals` (half-open (lo, hi])
    * @param point point column name on `points`
    */
  def pointsInRange(intervals: DataFrame, points: DataFrame,
      keys: Seq[String], lo: String, hi: String, point: String,
      bucketWidth: Long): DataFrame = {
    val exploded = intervals.withColumn("_bkt",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    val bucketedPoints = points.withColumn("_bkt",
      floor(col(point) / bucketWidth).cast("long"))
    exploded.join(bucketedPoints, keys :+ "_bkt")
      .filter(col(point) > col(lo) && col(point) <= col(hi))
      .drop("_bkt")
  }

  /** a02 — each sparse (15m-grid) metrics row paired with the 5m bars in
    * the ±450 s window around it: unaligned ranges, so each interval
    * overlaps 2 buckets and the equi-join stays 2-per-interval fan-out.
    */
  private val rangeMetricsBars: Q = (s, dir) => {
    val bars = Rollup.rollup(Tables.candles(s, dir), 300L)
      .select(col("symbol"), col("bucket_ts"), col("close"))
    val m = Tables.metrics5m(s, dir)
      .filter(col("create_time") % 900 === 0)
      .select(col("symbol"), col("create_time"),
        (col("create_time") - 450L).as("lo"),
        (col("create_time") + 450L).as("hi"))
    pointsInRange(m, bars, Seq("symbol"), "lo", "hi", "bucket_ts", 900L)
      .select(col("symbol"), col("create_time"), col("bucket_ts"),
        round(col("close"), 6).as("close"))
  }

  val queries: Map[String, Q] = Map("a02_range_join" -> rangeMetricsBars)

  val oracle: Map[String, String] = Map(
    "a02_range_join" -> Oracle.withCandlesAndMetrics(
      """, r5 AS (
        |  SELECT symbol, bucket_ts // 300 * 300 AS bucket_ts,
        |         max_by(close, bucket_ts) AS close
        |  FROM candles GROUP BY 1, 2),
        |m AS (
        |  SELECT symbol, create_time FROM metrics WHERE create_time % 900 = 0)
        |SELECT m.symbol, m.create_time, b.bucket_ts, round(b.close, 6) AS close
        |FROM m JOIN r5 b
        |  ON b.symbol = m.symbol
        | AND b.bucket_ts > m.create_time - 450
        | AND b.bucket_ts <= m.create_time + 450""".stripMargin))
}
