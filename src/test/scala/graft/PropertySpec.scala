package graft

import graft.indicators.Series
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the algebra the engine leans on (SURVEY §5:
  * "ScalaCheck property tests for indicator math ... OHLC roll-up
  * invariants"). Pure-function properties run the default 100 cases;
  * Spark-backed ones run 10 (each case is a job).
  */
object PropertySpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // -------------------------------------------------------- generators
  /** Candle frames with DISTINCT (symbol, minute) keys and integer-valued
    * prices/volumes: aggregation order can't produce FP drift, and
    * min_by/max_by ties can't make the property nondeterministic.
    */
  private val barsGen: Gen[Seq[C1m]] = for {
    n <- Gen.choose(1, 80)
    keys <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 59L)))
    vals <- Gen.listOfN(n,
      Gen.zip(Gen.choose(1, 1000), Gen.choose(0, 20), Gen.choose(1, 100)))
  } yield keys.zip(vals).distinctBy(_._1).map {
    case ((s, m), (px, spread, vol)) =>
      C1m(s"S$s", m * 60, px.toDouble, (px + spread).toDouble,
        (px - spread).toDouble, (px + 1).toDouble, vol.toDouble,
        (2 * vol).toDouble, vol.toLong, (vol / 2).toDouble)
  }

  private lazy val spark = TestSession.spark

  private def toDf(bars: Seq[C1m]) = {
    val s = spark
    import s.implicits._
    bars.toDF()
  }

  private def snap(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // ------------------------------------------------- roll-up properties
  property("rollup composes: (1m->5m)->15m == 1m->15m") =
    forAll(barsGen.suchThat(_.nonEmpty)) { bars =>
      val df = toDf(bars)
      val twoStep = operators.Rollup.rollup(
        operators.Rollup.rollup(df, 300L), 900L)
      val oneStep = operators.Rollup.rollup(df, 900L)
      snap(twoStep) == snap(oneStep)
    }

  property("rollup preserves volume/trade_count and bounds extrema") =
    forAll(barsGen.suchThat(_.nonEmpty)) { bars =>
      val up = operators.Rollup.rollup(toDf(bars), 300L).collect()
      val byKey = bars.groupBy(b => (b.symbol, b.bucket_ts / 300 * 300))
      up.forall { r =>
        val g = byKey((r.getString(0), r.getLong(1)))
        r.getDouble(6).toLong == g.map(_.volume.toLong).sum &&
          r.getDouble(3) == g.map(_.high).max &&
          r.getDouble(4) == g.map(_.low).min &&
          r.getDouble(2) == g.minBy(_.bucket_ts).open &&
          r.getDouble(5) == g.maxBy(_.bucket_ts).close
      } && up.length == byKey.size
    }

  property("mergeCandles is idempotent on closed batches") =
    forAll(barsGen.suchThat(_.nonEmpty)) { bars =>
      val df = toDf(bars).withColumn("is_closed", lit(true))
      snap(operators.Maintenance.mergeCandles(df, df)) == snap(df)
    }

  property("mergeCandles of disjoint batches is their union") =
    forAll(barsGen.suchThat(_.nonEmpty)) { bars =>
      val df = toDf(bars).withColumn("is_closed", lit(true))
      val a = df.filter(col("bucket_ts") % 120 === 0)
      val b = df.filter(col("bucket_ts") % 120 =!= 0)
      snap(operators.Maintenance.mergeCandles(a, b)) == snap(df)
    }

  // ------------------------------------------- pure-function properties
  private val tsGen = Gen.listOf(Gen.choose(0L, 10000L))

  property("latestBars == sort.takeRight for any order and cap") =
    forAll(tsGen, Gen.choose(1, 50)) { (ts, cap) =>
      def bar(t: Long) = Series.Bar("S", t, 0, 0, 0, 0, 0, 0, 0)
      val got = Series.latestBars(ts.iterator.map(bar), cap).map(_.bucket_ts).toSeq
      val want = ts.sorted.takeRight(cap)
      got == want
    }
}
