package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the raw `events` table: sessionization,
  * ordered funnels, cohort retention. These are the canonical large-scale
  * clickstream shapes a training-data/analytics pipeline needs alongside the
  * candle operators — each plans as ONE shuffle on `user_id` (window or
  * aggregate), so at 100 TB the event log is hash-partitioned by user once
  * and every stage after that is co-partitioned.
  *
  * Time axis: `events.ts` is normalized to an epoch-nanosecond Long at the
  * read boundary whatever the file's encoding (see [[graft.Tables.events]]);
  * seconds = `ts DIV 1e9`, which matches DuckDB's `floor(epoch(ts))` on the
  * same files exactly.
  */
object Events {
  private type Q = (SparkSession, String) => DataFrame

  /** Session gap: a >6h silence starts a new session (tuned to the test
    * corpus density; the operator is gap-parametric).
    */
  val SessionGapS = 21600L

  /** Funnel conversion window: each stage must occur within 24h of the
    * previous stage's first completion.
    */
  val FunnelWindowNs: Long = 86400L * 1000000000L

  /** The funnel stage sequence (event_type values). */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  private def evSeconds(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(col("user_id"), col("event_id"),
      expr("ts DIV 1000000000").as("ts_s"), col("value"))

  /** e01 — gap-based sessionization: lag + running sum of session-start
    * flags inside one per-user window, then a per-session aggregate. The
    * window and the aggregate share the user_id partitioning: one shuffle
    * total, no driver state — the distributed restatement of the classic
    * sessionize-in-a-loop.
    */
  val sessionize: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    val flagged = evSeconds(s, dir)
      .withColumn("prev_s", lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_s").isNull || col("ts_s") - col("prev_s") > SessionGapS,
          1L).otherwise(0L))
    flagged
      .withColumn("session_idx", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts_s")).as("session_start"),
        (max(col("ts_s")) - min(col("ts_s"))).as("duration_s"),
        count(lit(1)).as("n_events"),
        (floor(sum(col("value")) * 1e6 + 0.5) / 1e6).as("total_value"))
  }

  /** e02 — ordered funnel with a conversion window: stage N counts users
    * whose first stage-N event falls within [[FunnelWindowNs]] after their
    * first stage-(N-1) completion. Decorrelates to a chain of per-user min
    * aggregates joined on user_id — all co-partitioned after one shuffle;
    * the per-stage outputs are single rows.
    */
  val funnel: Q = (s, dir) => {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts").as("tns"))
    def stage(prev: DataFrame, prevT: String, eventType: String, t: String): DataFrame =
      e.filter(col("event_type") === eventType)
        .join(prev.select(col("user_id"), col(prevT)), "user_id")
        .filter(col("tns") > col(prevT) &&
          col("tns") <= col(prevT) + lit(FunnelWindowNs))
        .groupBy(col("user_id")).agg(min(col("tns")).as(t))
    val s1 = e.filter(col("event_type") === FunnelStages.head)
      .groupBy(col("user_id")).agg(min(col("tns")).as("t1"))
    val s2 = stage(s1, "t1", FunnelStages(1), "t2")
    val s3 = stage(s2, "t2", FunnelStages(2), "t3")
    def counted(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    counted(s1, FunnelStages.head)
      .union(counted(s2, FunnelStages(1)))
      .union(counted(s3, FunnelStages(2)))
  }

  /** e09 — funnel time-to-convert distribution: e02 counts WHO converts;
    * this measures HOW FAST — per transition (view→click,
    * click→purchase, view→purchase), the converting users' delay
    * distribution as exact interpolated percentiles (Spark `percentile`
    * ≡ DuckDB `quantile_cont`, the h24 idiom) plus the max, in seconds
    * at the 6dp floor idiom. The stage chain is e02's own semantics
    * (first qualifying event within the window after the previous
    * stage), with the earlier stage times CARRIED through the per-user
    * aggregates so each transition's delay is one subtraction.
    *
    * Scale shape: e02's — per-user min aggregates co-partitioned after
    * one user_id shuffle; the percentile runs over the converting-user
    * relation (≤ |users| rows), and the output is three rows.
    */
  private val funnelLatency: Q = (s, dir) => {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts").as("tns"))
    val s1 = e.filter(col("event_type") === FunnelStages.head)
      .groupBy(col("user_id")).agg(min(col("tns")).as("t1"))
    val s2 = e.filter(col("event_type") === FunnelStages(1))
      .join(s1, "user_id")
      .filter(col("tns") > col("t1") &&
        col("tns") <= col("t1") + lit(FunnelWindowNs))
      .groupBy(col("user_id"))
      .agg(min(col("tns")).as("t2"), min(col("t1")).as("t1"))
    val s3 = e.filter(col("event_type") === FunnelStages(2))
      .join(s2, "user_id")
      .filter(col("tns") > col("t2") &&
        col("tns") <= col("t2") + lit(FunnelWindowNs))
      .groupBy(col("user_id")).agg(min(col("tns")).as("t3"),
        min(col("t2")).as("t2"), min(col("t1")).as("t1"))
    def f6(c: Column) = floor(c * 1e6 + 0.5) / 1e6
    def row(name: String, src: DataFrame, d: Column) =
      src.agg(count(lit(1)).as("n_users"),
        f6(percentile(d, lit(0.5))).as("p50_s"),
        f6(percentile(d, lit(0.9))).as("p90_s"),
        f6(max(d)).as("max_s"))
        .select(lit(name).as("transition"), col("n_users"),
          col("p50_s"), col("p90_s"), col("max_s"))
    def secs(a: Column, b: Column) = (a - b).cast("double") / 1e9
    row("view_to_click", s2, secs(col("t2"), col("t1")))
      .union(row("click_to_purchase", s3, secs(col("t3"), col("t2"))))
      .union(row("view_to_purchase", s3, secs(col("t3"), col("t1"))))
  }

  /** e10 bot-screen dials: flag users with at least [[BotMinEvents]]
    * events whose behavioral entropy (bits over the event-type
    * distribution) sits below [[BotEntropyMax]] — high-volume,
    * low-diversity actors (scripted scrapers fire one event type; humans
    * mix). Fixture-calibrated to a meaningful split.
    */
  val BotMinEvents = 30L
  val BotEntropyMax = 1.5

  /** e10 — per-user behavioral entropy (the bot/automation screen a
    * clickstream pipeline runs before using engagement as a training
    * signal): Shannon entropy of each user's event-type distribution
    * (t12's fold discipline — counts folded in event_type order, so the
    * float sum is order-identical cross-engine), beside volume and type
    * breadth; the flag thresholds the ROUNDED entropy (the e07
    * discipline). Scale shape: one (user, type) map-side-combined count
    * — |users|×|types| rows max — then a per-user collect of ≤|types|
    * counts; the raw log is scanned once.
    */
  private val userEntropy: Q = (s, dir) => {
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("user_id"))
      .agg(sum(col("cnt")).as("n_events"),
        count(lit(1)).as("n_types"),
        transform(
          array_sort(collect_list(struct(col("event_type"), col("cnt")))),
          p => p.getField("cnt")).as("tc"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        round(aggregate(col("tc"), lit(0.0), (acc, c0) => {
          val p = c0.cast("double") / col("n_events").cast("double")
          acc + -p * log2(p)
        }), 6).as("entropy"))
      .withColumn("bot_suspect",
        col("n_events") >= BotMinEvents && col("entropy") < BotEntropyMax)
  }

  /** e03 — cohort retention: cohort = a user's first active day; each
    * (cohort_day, day_offset) cell counts users active `offset` days after
    * their first day. Distinct user-days shuffle once on user_id; the final
    * cell aggregate is over |users|×|days| rows at most.
    */
  val retention: Q = (s, dir) => {
    val days = evSeconds(s, dir)
      .select(col("user_id"), expr("ts_s DIV 86400").as("day")).distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(first, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** e04 — event-type transition matrix (first-order Markov counts): each
    * user's chronological event stream contributes (prev → next) pairs via
    * one lag window; the count aggregate over |types|² cells is
    * metadata-scale. Same single user_id shuffle as e01.
    */
  val transitions: Q = (s, dir) => {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("tns"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("tns"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** e05 — rolling active users: per-day DAU, trailing-7-day WAU, and the
    * DAU/WAU stickiness ratio. Shape: the distinct (user, day) relation
    * (one user_id-keyed aggregate — orders of magnitude smaller than the
    * raw log), then each user-day CONTRIBUTES to the 7 report-day windows
    * that cover it (a ×7 fan-out of the deduplicated relation, NOT of raw
    * events), one day-keyed countDistinct per report day. Raw events are
    * scanned exactly once; report days are inner-joined to active days so
    * no phantom tail days appear. The dyadic DAU/WAU ratio rounds via the
    * floor(x·1e6+0.5) idiom — exact halves agree across engines.
    */
  val rollingActives: Q = (s, dir) => {
    val userDays = evSeconds(s, dir)
      .select(col("user_id"), expr("ts_s DIV 86400").as("day")).distinct()
    val dau = userDays.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = userDays
      .withColumn("off", explode(array((0 to 6).map(lit): _*)))
      .groupBy((col("day") + col("off")).as("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        (floor(col("dau") / col("wau") * 1e6 + 0.5) / 1e6).as("stickiness"))
  }

  /** e06 — sketched distinct counts: per-event-type distinct users, exact
    * AND via the HLL++ sketch (`approx_count_distinct`, rsd 2.5%). At
    * 100 TB the sketch is the only viable shape — fixed-size state,
    * map-side combinable, no shuffle of the user-id universe — so it
    * completes the engine's sketch trio (BloomFilter c02, approx
    * quantiles h24b, HLL e06). The exact column is the tracked control;
    * the output carries the sketch's ACCURACY CONTRACT (|approx−exact| ≤
    * 5%·exact) rather than the engine-specific sketch value, so the
    * DuckDB oracle pins both the exact counts and the contract — an HLL
    * drifting past 5% fails the row hash, while HLL implementation
    * details stay free to differ.
    */
  val sketchDistinct: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.025).as("approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")).cast("double") <=
          lit(0.05) * col("exact_users")).as("within_5pct"))

  /** CMS accuracy contract: estimate ≤ true + [[CmsEps]]·N with probability
    * ≥ [[CmsConf]] per probe (Cormode & Muthukrishnan 2005), and NEVER
    * below true.
    */
  val CmsEps = 0.001
  val CmsConf = 0.99
  val CmsSeed = 7

  /** e08 — count-min-sketch heavy hitters: the top-5 users per event type
    * by exact count, carried beside the CMS frequency estimate's accuracy
    * contract. Completes the engine's sketch QUARTET (Bloom c02, approx
    * quantiles h24b, HLL e06, CMS e08): at 100 TB the per-(type, user)
    * exact relation is the vocabulary-sized control, while the sketch is
    * the fixed-size map-side-combinable state a streaming monitor holds —
    * one pass over the log, no shuffle of the key universe, point-queryable
    * for ANY key after the fact (what neither the top-k relation nor HLL's
    * cardinality state can answer).
    *
    * The sketched key is `xxhash64(event_type, user_id)` — a Long, so the
    * agg-side `addLong` and the driver-side `estimateCount` hash the same
    * primitive. Spark exposes the CMS BUILDER as an agg function but no
    * row-local probe function, so the probe is a scalar closure over the
    * driver-held sketch (the state a monitoring loop holds — t16's driver
    * argmax stance) applied only to the O(5·|types|) winner rows, never
    * the corpus. Like e06, the output carries the CONTRACT — est ≥ exact
    * ∧ est ≤ exact + ⌈ε·N⌉ — not the engine-specific estimate, so the
    * DuckDB oracle pins the exact top-k and the contract flag; a sketch
    * drifting past its ε·N bound fails the row hash while CMS
    * implementation details stay free to differ.
    */
  private val cmsHeavyHitters: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        xxhash64(col("event_type"), col("user_id")).as("k"))
    val exact = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), first(col("k")).as("k"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("cnt").desc, col("user_id"))
    val top = exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
    val skRow = ev.agg(
      count_min_sketch(col("k"), lit(CmsEps), lit(CmsConf), lit(CmsSeed))
        .as("sk"),
      count(lit(1)).as("n")).head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]](0)))
    val slack = math.ceil(CmsEps * skRow.getLong(1)).toLong
    val est = udf((k: Long) => sketch.estimateCount(java.lang.Long.valueOf(k)))
    top.withColumn("est", est(col("k")))
      .select(col("event_type"), col("user_id"), col("cnt"), col("rank"),
        (col("est") >= col("cnt") &&
          col("est") <= col("cnt") + lit(slack)).as("within_contract"))
  }

  /** e07 trailing-history length (observed minutes) and minimum history
    * before a z-score is emitted.
    */
  val AnomalyWindow = 60
  val AnomalyMinHistory = 30

  /** e07 — event-rate anomaly detection: per (event_type, minute) counts,
    * each minute z-scored against its trailing [[AnomalyWindow]] OBSERVED
    * minutes (μ and σ_pop over the preceding counts; at least
    * [[AnomalyMinHistory]] minutes of history before scoring) — the rate
    * monitor that catches bot storms (z ≫ 0) and partial outages (z ≪ 0)
    * over a streaming ingest. Silent minutes are absent from the counted
    * relation, so this scores observed rates; total absence is the
    * r09/r10 gap scans' job.
    *
    * Scale shape: one map-side-combined count down to (type, minute) —
    * metadata-sized at any corpus (minutes × types) — then windows over
    * that tiny relation; the raw log is scanned exactly once. The anomaly
    * flag thresholds the ROUNDED z so both engines flip together.
    *
    * Positive-epoch assumption (shared with e01's and u03's bucket math):
    * the minute is `ts DIV 60e9`, integer division truncating toward
    * zero, while the DuckDB oracle's date_trunc floors — the two agree
    * only for ts ≥ 0 (post-1970 fixtures, which [[graft.Tables.events]]
    * guarantees today). A pre-epoch fixture would need floor division
    * here before the oracle comparison holds.
    */
  private val rateAnomaly: Q = (s, dir) => {
    val counts = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts DIV 60000000000").as("minute"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy(col("minute"))
      .rowsBetween(-AnomalyWindow, -1)
    counts
      .withColumn("hist", count(lit(1)).over(w))
      .withColumn("mu", avg(col("cnt")).over(w))
      .withColumn("sigma", stddev_pop(col("cnt")).over(w))
      .filter(col("hist") >= AnomalyMinHistory)
      .withColumn("z",
        round((col("cnt") - col("mu")) / nullif(col("sigma"), lit(0.0)), 6))
      .select(col("event_type"), col("minute"), col("cnt"),
        (floor(col("mu") * 1e6 + 0.5) / 1e6).as("mu"),
        round(col("sigma"), 6).as("sigma"),
        col("z"), (abs(col("z")) > 3.0).as("anomaly"))
  }

  val queries: Map[String, Q] = Map(
    "e07_rate_anomaly" -> rateAnomaly,
    "e01_sessionize" -> sessionize,
    "e02_funnel" -> funnel,
    "e03_retention" -> retention,
    "e04_transitions" -> transitions,
    "e05_rolling_actives" -> rollingActives,
    "e06_sketch_distinct" -> sketchDistinct,
    "e08_cms_heavy_hitters" -> cmsHeavyHitters,
    "e09_funnel_latency" -> funnelLatency,
    "e10_user_entropy" -> userEntropy)

  val oracle: Map[String, String] = Map(
    "e10_user_entropy" ->
      // counts folded in event_type order (unique per user, so both
      // engines walk the identical sequence); flag on the rounded value
      s"""WITH c AS MATERIALIZED (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
        |         CAST(count(*) AS BIGINT) AS n_types,
        |         list(cnt ORDER BY event_type) AS tc
        |  FROM c GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |  round(list_reduce(list_prepend(0.0, list_transform(tc,
        |    x -> -(CAST(x AS DOUBLE) / n_events) *
        |         log2(CAST(x AS DOUBLE) / n_events))),
        |    (a, y) -> a + y), 6) AS entropy,
        |  n_events >= $BotMinEvents AND
        |    round(list_reduce(list_prepend(0.0, list_transform(tc,
        |      x -> -(CAST(x AS DOUBLE) / n_events) *
        |           log2(CAST(x AS DOUBLE) / n_events))),
        |      (a, y) -> a + y), 6) < $BotEntropyMax AS bot_suspect
        |FROM u""".stripMargin,
    "e09_funnel_latency" ->
      // e02's stage chain with earlier stage times carried; percentile ≡
      // quantile_cont (the h24 idiom), 6dp floor
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |s1 AS (SELECT user_id, min(tns) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(tns) AS t2, min(t1) AS t1
        |       FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND tns > t1
        |         AND tns <= t1 + $FunnelWindowNs GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(tns) AS t3, min(t2) AS t2, min(t1) AS t1
        |       FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tns > t2
        |         AND tns <= t2 + $FunnelWindowNs GROUP BY 1)
        |SELECT 'view_to_click' AS transition, count(*) AS n_users,
        |  floor(quantile_cont(CAST(t2 - t1 AS DOUBLE) / 1e9, 0.5) * 1e6 + 0.5) / 1e6 AS p50_s,
        |  floor(quantile_cont(CAST(t2 - t1 AS DOUBLE) / 1e9, 0.9) * 1e6 + 0.5) / 1e6 AS p90_s,
        |  floor(max(CAST(t2 - t1 AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6 AS max_s
        |FROM s2
        |UNION ALL
        |SELECT 'click_to_purchase', count(*),
        |  floor(quantile_cont(CAST(t3 - t2 AS DOUBLE) / 1e9, 0.5) * 1e6 + 0.5) / 1e6,
        |  floor(quantile_cont(CAST(t3 - t2 AS DOUBLE) / 1e9, 0.9) * 1e6 + 0.5) / 1e6,
        |  floor(max(CAST(t3 - t2 AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
        |FROM s3
        |UNION ALL
        |SELECT 'view_to_purchase', count(*),
        |  floor(quantile_cont(CAST(t3 - t1 AS DOUBLE) / 1e9, 0.5) * 1e6 + 0.5) / 1e6,
        |  floor(quantile_cont(CAST(t3 - t1 AS DOUBLE) / 1e9, 0.9) * 1e6 + 0.5) / 1e6,
        |  floor(max(CAST(t3 - t1 AS DOUBLE) / 1e9) * 1e6 + 0.5) / 1e6
        |FROM s3""".stripMargin,
    "e07_rate_anomaly" ->
      s"""WITH cnts AS (
         |  SELECT event_type,
         |    CAST(epoch(date_trunc('minute', ts)) AS BIGINT) // 60 AS minute,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM events GROUP BY 1, 2),
         |sc AS (
         |  SELECT event_type, minute, cnt,
         |    count(*) OVER w AS hist,
         |    avg(cnt) OVER w AS mu,
         |    stddev_pop(cnt) OVER w AS sigma
         |  FROM cnts
         |  WINDOW w AS (PARTITION BY event_type ORDER BY minute
         |    ROWS BETWEEN $AnomalyWindow PRECEDING AND 1 PRECEDING))
         |SELECT event_type, minute, cnt,
         |  floor(mu * 1e6 + 0.5) / 1e6 AS mu,
         |  round(sigma, 6) AS sigma,
         |  round((cnt - mu) / nullif(sigma, 0.0), 6) AS z,
         |  abs(round((cnt - mu) / nullif(sigma, 0.0), 6)) > 3.0 AS anomaly
         |FROM sc WHERE hist >= $AnomalyMinHistory""".stripMargin,
    "e01_sessionize" ->
      s"""WITH ev AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |    value
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(ts_s) OVER w IS NULL
        |                   OR ts_s - lag(ts_s) OVER w > $SessionGapS
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |sess AS (
        |  SELECT *, CAST(sum(new_sess) OVER (
        |      PARTITION BY user_id ORDER BY ts_s, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, min(ts_s) AS session_start,
        |  max(ts_s) - min(ts_s) AS duration_s,
        |  count(*) AS n_events,
        |  floor(sum(value) * 1e6 + 0.5) / 1e6 AS total_value
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "e02_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |s1 AS (SELECT user_id, min(tns) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(tns) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND tns > t1
        |         AND tns <= t1 + $FunnelWindowNs GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(tns) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND tns > t2
        |         AND tns <= t2 + $FunnelWindowNs GROUP BY 1)
        |SELECT 'view' AS stage, count(*) AS n_users FROM s1
        |UNION ALL SELECT 'click', count(*) FROM s2
        |UNION ALL SELECT 'purchase', count(*) FROM s3""".stripMargin,
    "e04_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns
        |  FROM events),
        |seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY tns, event_id)
        |      AS prev_type
        |  FROM ev)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "e06_sketch_distinct" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  true AS within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    "e08_cms_heavy_hitters" ->
      // exact top-k control + the CMS contract literal — an estimate
      // drifting past eps*N (or under the true count, which CMS cannot
      // do) flips within_contract to false on the Spark side and fails
      // the row hash
      """WITH ex AS MATERIALIZED (
        |  SELECT event_type, user_id, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |top AS (
        |  SELECT event_type, user_id, cnt,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY cnt DESC, user_id) AS rank
        |  FROM ex)
        |SELECT event_type, user_id, cnt, rank, true AS within_contract
        |FROM top WHERE rank <= 5""".stripMargin,
    "e05_rolling_actives" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau
        |        FROM days GROUP BY 1),
        |wau AS (
        |  SELECT day + o AS day, count(DISTINCT user_id) AS wau
        |  FROM days CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS o)
        |  GROUP BY 1)
        |SELECT day, dau, wau,
        |  floor(dau / wau * 1e6 + 0.5) / 1e6 AS stickiness
        |FROM dau JOIN wau USING (day)""".stripMargin,
    "e03_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        |  FROM events),
        |first AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT days.user_id) AS n_users
        |FROM days JOIN first ON days.user_id = first.user_id
        |GROUP BY 1, 2""".stripMargin)
}
