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

  property("realtime read == fresh materialization for any aligned watermark") =
    forAll(barsGen.suchThat(_.nonEmpty), Gen.choose(0L, 12L)) { (bars, wmBucket) =>
      // the r19 contract: whatever the watermark, stored-pre-watermark ∪
      // recomputed-tail equals a fully-fresh roll-up, and the from_tail
      // split sits exactly at the watermark
      val seconds = 300L
      val df = toDf(bars)
      val wmTs = wmBucket * seconds
      val stale = operators.Rollup.rollup(
        df.filter(col("bucket_ts") < wmTs), seconds)
      val rt = operators.Rollup.realtimeRollup(
        stale, df, seconds, df.agg(lit(wmTs).as("wm")))
      val fresh = operators.Rollup.rollup(df, seconds)
      snap(rt.drop("from_tail")) == snap(fresh) &&
        rt.select("bucket_ts", "from_tail").collect()
          .forall(r => r.getBoolean(1) == (r.getLong(0) >= wmTs))
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

  // ------------------------------------------- sessionization properties
  /** Random event streams: a few users, second-resolution timestamps spread
    * so that gaps straddle the session threshold.
    */
  private val evGen: Gen[Seq[Ev]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 4L),
      Gen.choose(0L, 10L * operators.Events.SessionGapS)))
  } yield rows.zipWithIndex.map { case ((u, t), i) =>
    Ev(i.toLong, t * 1000000000L, u, 1.0)
  }

  property("sessionize: sessions partition events and never span a gap") =
    forAll(evGen.suchThat(_.nonEmpty)) { evs =>
      val s = spark
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_ev").toString
      evs.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
      val sess = operators.Events.sessionize(spark, dir).collect()
      val gap = operators.Events.SessionGapS
      // exact cover of the event log
      sess.map(_.getAs[Long]("n_events")).sum == evs.length &&
        // per-user session starts reproduce a reference fold over sorted times
        evs.groupBy(_.user_id).forall { case (u, rows) =>
          val ts = rows.map(_.ts / 1000000000L).sorted
          val wantStarts = ts.tail.foldLeft((List(ts.head), ts.head)) {
            case ((starts, prev), t) =>
              if (t - prev > gap) (t :: starts, t) else (starts, t)
          }._1.sorted
          val gotStarts = sess.filter(_.getAs[Long]("user_id") == u)
            .map(_.getAs[Long]("session_start")).sorted.toList
          gotStarts == wantStarts
        }
    }

  /** Random word streams from a small vocabulary, with a planted shared
    * run: doc B embeds a random ≥6-token slice of doc A at a random
    * offset. The winnowing guarantee (Schleimer et al. 2003) says the
    * shared run must produce a shared fingerprint — for EVERY such
    * corpus, not just the hand-built PipelineSpec case.
    */
  private val winnowGen: Gen[(Seq[String], Seq[String])] = for {
    lenA <- Gen.choose(8, 40)
    a <- Gen.listOfN(lenA, Gen.choose(0, 25).map(i => s"w$i"))
    runLen <- Gen.choose(6, math.min(12, lenA))
    from <- Gen.choose(0, lenA - runLen)
    lenB <- Gen.choose(0, 30)
    bPad <- Gen.listOfN(lenB, Gen.choose(26, 51).map(i => s"v$i"))
    at <- Gen.choose(0, lenB)
  } yield (a, bPad.take(at) ++ a.slice(from, from + runLen) ++ bPad.drop(at))

  property("winnowing guarantee: any planted >=6-token shared run shares a fingerprint") =
    forAll(winnowGen) { case (a, b) =>
      val s = spark
      import s.implicits._
      val fp = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
        .toDF("doc_id", "text")
        .select(col("doc_id"), pipeline.Text.winnowFp(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      (fp(1L) & fp(2L)).nonEmpty
    }

  /** Random source layouts (2–6 sources, 1–60 docs each) for the p06
    * integer-quota property.
    */
  private val srcSizesGen: Gen[Seq[Int]] = for {
    k <- Gen.choose(2, 6)
    sizes <- Gen.listOfN(k, Gen.choose(1, 60))
  } yield sizes

  property("temperature mix: integer quota math holds on any source layout") =
    forAll(srcSizesGen) { sizes =>
      val s = spark
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_p06").toString
      var id = 0L
      val docs = sizes.zipWithIndex.flatMap { case (n, i) =>
        (0 until n).map { _ => id += 1; (id, s"tok$id words", s"src$i") }
      }
      docs.toDF("doc_id", "text", "source")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = pipeline.Curation.queries("p06_temperature_mix")(spark, dir)
        .collect()
      // independent re-derivation of the quota formula (CEIL division,
      // r13: floor handed quota 0 to every source whenever budget*w <
      // sum_w; ceil guarantees each weighted source a seat, overshooting
      // the budget by at most one doc per source)
      val total = sizes.map(_.toLong).sum
      val w = sizes.map(n => math.sqrt(n.toDouble).toLong)
      val sumW = w.sum
      val wantQuota = sizes.zip(w).map { case (n, ws) =>
        math.min(n.toLong, (total / 2 * ws + sumW - 1) / sumW)
      }
      val bySrc = out.groupBy(_.getString(1))
      sizes.indices.forall { i =>
        val got = bySrc.getOrElse(s"src$i", Array.empty)
        got.length.toLong == wantQuota(i) &&
          got.forall(_.getAs[Long]("quota") == wantQuota(i))
      } && out.length.toLong <= total / 2 + sizes.length
    }

  property("repeat upweighting: epoch math matches a plain re-derivation on any layout") =
    forAll(srcSizesGen) { sizes =>
      val s = spark
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_p10").toString
      var id = 0L
      val docs = sizes.zipWithIndex.flatMap { case (n, i) =>
        (0 until n).map { _ =>
          id += 1
          (id, "x", s"src$i", 1L + (id * 37) % 400)
        }
      }
      docs.toDF("doc_id", "text", "source", "n_chars")
        .withColumn("lang", lit("en"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = pipeline.Curation.queries("p10_repeat_upweight")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
      // plain-Scala model of the whole chain: token units, temperature
      // targets (ceil division, 4-epoch cap), hash-ordered cumulative
      // offsets, remainder boundary test
      val tok = docs.map { case (d, _, src, nc) => (d, src, (nc + 3) / 4) }
      val avail = tok.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
      val w = avail.map { case (k, a) => k -> math.sqrt(a.toDouble).toLong }
      val sumW = w.values.sum
      val total = avail.values.sum
      val target = avail.map { case (k, a) =>
        k -> math.min(a * pipeline.Curation.MaxEpochs,
          (total * 2 * w(k) + sumW - 1) / sumW)
      }
      val want = tok.groupBy(_._2).flatMap { case (src, rows) =>
        val full = target(src) / avail(src)
        val rem = target(src) % avail(src)
        val ordered = rows.sortBy { case (d, _, _) =>
          ((d * 2654435761L) % 4294967296L, d) }
        var off = 0L
        ordered.map { case (d, _, t) =>
          val e = full + (if (off < rem) 1L else 0L); off += t; d -> e
        }
      }
      out == want
    }

  property("mix rebalance: quotas respected, shares within one doc of target") =
    forAll(Gen.const(())) { _ =>
      val out = pipeline.Curation.queries("p03_mix_rebalance")(
        spark, TestSession.sf).collect()
      val bySrc = out.groupBy(_.getAs[String]("source"))
      // every source's kept count equals its quota, and quota ∝ weight
      bySrc.forall { case (_, rows) =>
        rows.length == rows.head.getAs[Long]("quota") &&
          rows.forall(_.getAs[Long]("sample_rank") <= rows.head.getAs[Long]("quota"))
      } && {
        // shares track target weights: quota_s * W within W of N_total * w_s
        val w = bySrc.map { case (_, r) =>
          (r.head.getAs[Long]("target_w"), r.head.getAs[Long]("quota")) }
        val totW = w.map(_._1).sum
        val totQ = w.map(_._2).sum
        w.forall { case (tw, q) => (q * totW - totQ * tw).abs <= totW }
      }
    }
}
