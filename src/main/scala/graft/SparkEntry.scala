package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL for every SQL-expressible entry. Modules register themselves here.
  */
object SparkEntry {
  /** Session configs every graft session needs. The testdata's `events.ts`
    * physical encoding varies across fixture regenerations (NANOS in rounds
    * 1-4, MICROS/NTZ since round 5): `nanosAsLong` stays on so a NANOS file
    * remains READABLE (Spark 4 otherwise rejects it), and [[Tables.events]]
    * dtype-dispatches whatever arrives — Long nanos pass through,
    * TIMESTAMP/NTZ normalize to nanos — so both encodings work without
    * touching any query.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    // Runtime-measured broadcast decisions get a generous bar (executors
    // have GiBs of headroom; hash-broadcasting a ≤64 MB side beats
    // shuffling both). The STATIC threshold stays at Spark's default:
    // compile-time size estimates don't model explode fan-out, and a 64 MB
    // static bar made the planner broadcast a 2M-row shingle index whose
    // estimate derived from a 600 KB parquet scan.
    .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
    // The full-cycle fan-out (Cycle.scala: ~41 indicators × 7 intervals)
    // generates a few hundred distinct whole-stage sources per run; the
    // default 100-entry Janino class cache thrashes and re-pays compilation
    // on every branch (interval variants share SOURCE — literals live in
    // the references array — so they hit this cache when it is big enough).
    // Static conf: applies to sessions built through this configure().
    .config("spark.sql.codegen.cache.maxEntries", "4096")
    // Let the planner pick shuffled-hash over sort-merge when its size
    // conditions hold (optimization r13, guide §3.1/§9): the TPC-H family
    // measured 18.5 → 17.2 s at sf0.1 with identical results — SHJ skips
    // both sorts whenever one side's per-partition build fits, which AQE
    // verifies at runtime. Deployments preferring SMJ's graceful spill on
    // skewed builds can flip it back per session.
    .config("spark.sql.join.preferSortMergeJoin", "false")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full 5m OHLCV roll-up (the reference's load-bearing operator).
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("r04_rollup_5m")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.AsOf.queries ++
      operators.RangeJoin.queries ++
      operators.Relational.queries ++
      operators.Tpch.queries ++
      operators.Events.queries ++
      operators.Signals.queries ++
      operators.Maintenance.queries ++
      operators.Cycle.queries ++
      signals.RuleCorpus.queries ++
      functions.EwmaWindow.queries ++
      indicators.Rolling.queries ++
      indicators.Ewma.queries ++
      indicators.Stateful.queries ++
      indicators.Futures.queries ++
      indicators.Market.queries ++
      indicators.Patterns.queries ++
      pipeline.Dedup.queries ++
      pipeline.Similarity.queries ++
      pipeline.Text.queries ++
      pipeline.Curation.queries ++
      pipeline.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.AsOf.oracle ++
      operators.RangeJoin.oracle ++
      operators.Relational.oracle ++
      operators.Tpch.oracle ++
      operators.Events.oracle ++
      operators.Signals.oracle ++
      operators.Maintenance.oracle ++
      operators.Cycle.oracle ++
      signals.RuleCorpus.oracle ++
      functions.EwmaWindow.oracle ++
      indicators.Rolling.oracle ++
      indicators.Ewma.oracle ++
      indicators.Stateful.oracle ++
      indicators.Futures.oracle ++
      indicators.Market.oracle ++
      indicators.Patterns.oracle ++
      pipeline.Dedup.oracle ++
      pipeline.Similarity.oracle ++
      pipeline.Text.oracle ++
      pipeline.Curation.oracle ++
      pipeline.Multimodal.oracle
}
