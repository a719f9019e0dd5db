package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the event-stream analytics family (e01–e03). */
class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("e01 sessions partition the event log exactly") {
    val total = Tables.events(spark, TestSession.sf).count()
    val sess = operators.Events.sessionize(spark, TestSession.sf).cache()
    // every event lands in exactly one session
    assert(sess.agg(sum("n_events")).head.getLong(0) == total)
    // no session spans a gap: duration < gap * n_events (loose but
    // direction-correct: a session of n events has n-1 gaps ≤ gap each)
    val bad = sess.filter(col("duration_s") >
      lit(operators.Events.SessionGapS) * (col("n_events") - 1)).count()
    assert(bad == 0, s"$bad sessions span a silence longer than the gap")
    sess.unpersist()
  }

  test("e01 session_idx is dense from 1 per user") {
    val sess = operators.Events.sessionize(spark, TestSession.sf)
    val perUser = sess.groupBy("user_id")
      .agg(min("session_idx").as("lo"), max("session_idx").as("hi"),
        count(lit(1)).as("n"))
    assert(perUser.filter(col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
  }

  test("e02 funnel counts are monotone non-increasing down the stages") {
    val rows = operators.Events.funnel(spark, TestSession.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = operators.Events.FunnelStages.map(rows)
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
    assert(counts.head > 0)
  }

  test("e03 retention day_offset 0 row covers every cohort member once") {
    val ret = operators.Events.retention(spark, TestSession.sf).cache()
    // offset-0 cells sum to the number of distinct users
    val users = Tables.events(spark, TestSession.sf)
      .select("user_id").distinct().count()
    val atZero = ret.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head.getLong(0)
    assert(atZero == users)
    // no negative offsets; no cell exceeds its cohort's size
    assert(ret.filter(col("day_offset") < 0).count() == 0)
    val zero = ret.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    assert(ret.join(zero, "cohort_day")
      .filter(col("n_users") > col("cohort_size")).count() == 0)
    ret.unpersist()
  }

  test("e07 flags an injected rate spike and only minutes with enough history") {
    val session = spark
    import session.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e07").toString
    // 120 near-steady minutes alternating 9/11 events (sigma > 0 so z is
    // defined), then one 300-event spike minute
    val steady = for (m <- 0 until 120; i <- 0 until (9 + (m % 2) * 2))
      yield (m.toLong * 20 + i, 1L, m.toLong * 60L * 1000000000L, 1.0, "view")
    val spike = for (i <- 0 until 300)
      yield (10000L + i, 1L, 120L * 60L * 1000000000L, 1.0, "view")
    (steady ++ spike).toDF("event_id", "user_id", "ts", "value", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.Events.queries("e07_rate_anomaly")(spark, tmp)
      .orderBy("minute").collect()
    // minutes 0..29 have <30 trailing minutes: not scored
    assert(out.head.getLong(1) >= 30, "early minutes must be filtered")
    val spikeRow = out.find(_.getLong(1) == 120L).get
    assert(spikeRow.getBoolean(6), s"spike minute not flagged: $spikeRow")
    // steady minutes are never anomalies (sigma 0 -> z NULL, or tiny z)
    out.filter(_.getLong(1) < 120).foreach(r =>
      assert(r.isNullAt(6) || !r.getBoolean(6), s"false positive: $r"))
  }

  test("e06 HLL sketch meets its 5% accuracy contract against exact counts") {
    // measure the actual relative error directly (the registry entry only
    // surfaces the boolean contract): rsd 2.5% must land within 5% on
    // every event_type at fixture scale
    val agg = Tables.events(spark, TestSession.sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.025).as("approx"))
      .collect()
    assert(agg.nonEmpty)
    agg.foreach { r =>
      val exact = r.getLong(1); val approx = r.getLong(2)
      assert(exact > 0 && approx > 0)
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.05,
        f"HLL rel err $rel%.4f for ${r.getString(0)} ($approx vs $exact)")
    }
  }

  test("e09 funnel latency: hand-computed delays on a constructed funnel") {
    val session = spark
    import session.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e09").toString
    // user 1: view@0, click@100s, purchase@200s; user 2: view@0, click@300s
    // (no purchase) -> view_to_click delays {100, 300}: p50 = 200 by
    // linear interpolation; click_to_purchase = view_to_purchase base t3
    val ns = 1000000000L
    Seq((1L, 1L, 0L, "view"), (2L, 1L, 100L * ns, "click"),
      (3L, 1L, 200L * ns, "purchase"),
      (4L, 2L, 0L, "view"), (5L, 2L, 300L * ns, "click"))
      .map { case (id, u, t, ty) => (id, u, t, 1.0, ty) }
      .toDF("event_id", "user_id", "ts", "value", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.Events.queries("e09_funnel_latency")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4))).toMap
    assert(out("view_to_click") == ((2L, 200.0, 300.0)),
      s"${out("view_to_click")}")
    assert(out("click_to_purchase") == ((1L, 100.0, 100.0)),
      s"${out("click_to_purchase")}")
    assert(out("view_to_purchase") == ((1L, 200.0, 200.0)),
      s"${out("view_to_purchase")}")
  }

  test("e10 user entropy: planted single-type bot flags, mixed human does not") {
    val session = spark
    import session.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e10").toString
    // user 1: 50 events, ONE type -> entropy 0, flags. user 2: 32 events
    // over 4 types evenly -> entropy 2.0, above the 1.5 bar. user 3: only
    // 5 events of one type -> entropy 0 but below the volume bar
    val bot = (0 until 50).map(i => (i.toLong, 1L, i.toLong * 1000000000L, 1.0, "view"))
    val human = (0 until 32).map(i => (100L + i, 2L, i.toLong * 1000000000L, 1.0,
      Seq("view", "click", "purchase", "search")(i % 4)))
    val light = (0 until 5).map(i => (200L + i, 3L, i.toLong * 1000000000L, 1.0, "view"))
    (bot ++ human ++ light)
      .toDF("event_id", "user_id", "ts", "value", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.Events.queries("e10_user_entropy")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((50L, 0.0, true)), s"bot not flagged: ${out(1L)}")
    assert(out(2L) == ((32L, 2.0, false)), s"human misflagged: ${out(2L)}")
    assert(out(3L) == ((5L, 0.0, false)), s"light user misflagged: ${out(3L)}")
  }

  test("e08 CMS heavy hitters: planted heavy key ranks first and the contract holds") {
    val session = spark
    import session.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-e08").toString
    // user 999 fires 500 "view" events; 200 light users fire 1-3 each —
    // the planted key must surface at rank 1 and every winner's CMS
    // estimate must sit inside [exact, exact + ceil(eps*N)]
    val heavy = for (i <- 0 until 500)
      yield (i.toLong, 999L, i.toLong * 1000000000L, 1.0, "view")
    val light = for (u <- 0 until 200; i <- 0 to (u % 3))
      yield (10000L + u * 10 + i, u.toLong, i.toLong * 1000000000L, 1.0, "view")
    (heavy ++ light).toDF("event_id", "user_id", "ts", "value", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = operators.Events.queries("e08_cms_heavy_hitters")(spark, tmp)
      .orderBy("rank").collect()
    assert(out.length == 5, s"expected 5 winners, got ${out.length}")
    assert(out.head.getLong(1) == 999L && out.head.getLong(2) == 500L,
      s"planted heavy key not at rank 1: ${out.head}")
    out.foreach(r => assert(r.getBoolean(4), s"CMS contract violated: $r"))
  }
}
