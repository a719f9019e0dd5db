package graft.indicators

import graft.{Oracle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Indicator pack — candlestick / cloud patterns (SURVEY.md §2.4: I20,
  * I33-Ichimoku). The reference's K-pattern scanner delegates to TA-Lib's
  * CDL battery (batch/k_pattern.py:54-241); the patterns its downstream
  * actually asserts (engulfing, three-line strike — tv_trend_cloud.py:16-41)
  * plus the classic single/multi-bar set are pure lag comparisons, so here
  * they are closed-form window expressions: one per-symbol sort serves all
  * thirteen pattern flags, whole-stage-codegen end to end, per-bar output.
  */
/** The I20 candlestick rule corpus: (name, SQL boolean, bull/bear weight).
  *
  * Column vocabulary (all non-null after the `o3 IS NOT NULL` gate except
  * the lag-4 set, which its rules guard explicitly): current bar
  * `open/high/low/close`; lag-1 `po/ph/pl/pc`; lag-2 `o2/h2/l2/c2`; lag-3
  * `o3/c3/h3/l3`; lag-4 `o4/c4/h4/l4`; `ab` = mean body of the prior ≤10
  * bars. Each string parses identically in Spark SQL and DuckDB
  * (comparisons, abs/greatest/least, AND/OR/NOT only) — the single source
  * of truth for both engines. Weights: bullish +1, bearish −1,
  * neutral/context 0.
  */
private[graft] object KRules {
  /** Shared sub-expression vocabulary, hoisted into real columns that BOTH
    * engines compute once (Spark: two `withColumns` stages below the flag
    * projection; DuckDB: two nested SELECT levels). Round-3 postmortem: with
    * every rule re-expanding these macros inline, the 77-flag projection's
    * generated `processNext()` blew Janino's hard 64 KB method limit, so the
    * whole stage silently fell back to interpreted mode — 5× run-to-run
    * swings and a 23.6 s driver bench. Short comparisons over precomputed
    * columns keep the generated code an order of magnitude smaller.
    * Level 2 may reference level-1 names; rules may reference both.
    */
  val VOCAB1: Seq[(String, String)] = Seq(
    "bd" -> "abs(close - open)",            // current body
    "rg" -> "(high - low)",                 // current range
    "us" -> "(high - greatest(open, close))",   // upper shadow
    "lsd" -> "(least(open, close) - low)",      // lower shadow
    "bp" -> "abs(pc - po)",                 // lag-1 body
    "b2" -> "abs(c2 - o2)",                 // lag-2 body
    "rp" -> "(ph - pl)",                    // lag-1 range
    "r2" -> "(h2 - l2)",                    // lag-2 range
    "b4" -> "abs(c4 - o4)")                 // lag-4 body (null pre-gate)
  val VOCAB2: Seq[(String, String)] = Seq(
    "doji" -> "(rg > 0 AND bd <= 0.1 * rg)",
    "dojip" -> "(rp > 0 AND bp <= 0.1 * rp)",
    "doji2" -> "(r2 > 0 AND b2 <= 0.1 * r2)")

  val RULES: Seq[(String, String, Int)] = Seq(
    // -- single-bar: doji family (CDLDOJI, LONGLEGGED, DRAGONFLY,
    //    GRAVESTONE, RICKSHAWMAN, TAKURI)
    ("doji", "doji", 0),
    ("long_legged_doji", "doji AND us >= 0.3 * rg AND lsd >= 0.3 * rg", 0),
    ("dragonfly_doji", "doji AND us <= 0.1 * rg AND lsd >= 0.6 * rg", 1),
    ("gravestone_doji", "doji AND lsd <= 0.1 * rg AND us >= 0.6 * rg", -1),
    ("rickshaw_man", "doji AND us >= 0.3 * rg AND lsd >= 0.3 * rg" +
      " AND abs((open + close) / 2 - (high + low) / 2) <= 0.1 * rg", 0),
    ("takuri", "doji AND us <= 0.1 * rg AND lsd >= 0.8 * rg", 1),
    // -- single-bar: shadows + bodies (HAMMER, INVERTEDHAMMER, HANGINGMAN,
    //    SHOOTINGSTAR, MARUBOZU, CLOSINGMARUBOZU, SPINNINGTOP, HIGHWAVE,
    //    LONGLINE, SHORTLINE, BELTHOLD)
    ("hammer", "bd > 0 AND lsd >= 2.0 * bd AND us <= bd", 1),
    ("inverted_hammer", "bd > 0 AND us >= 2.0 * bd AND lsd <= bd AND pc < po", 1),
    ("hanging_man", "bd > 0 AND lsd >= 2.0 * bd AND us <= bd AND pc > po", -1),
    ("shooting_star", "bd > 0 AND us >= 2.0 * bd AND lsd <= bd", -1),
    ("bull_marubozu", "rg > 0 AND bd >= 0.95 * rg AND close > open", 1),
    ("bear_marubozu", "rg > 0 AND bd >= 0.95 * rg AND close < open", -1),
    ("bull_closing_marubozu",
      "rg > 0 AND close > open AND us <= 0.05 * rg AND bd >= 0.5 * rg", 1),
    ("bear_closing_marubozu",
      "rg > 0 AND close < open AND lsd <= 0.05 * rg AND bd >= 0.5 * rg", -1),
    ("spinning_top",
      "rg > 0 AND bd > 0 AND bd < 0.3 * rg AND us > bd AND lsd > bd AND NOT doji", 0),
    ("high_wave",
      "rg > 0 AND bd > 0 AND us >= 2.0 * bd AND lsd >= 2.0 * bd AND NOT doji", 0),
    ("long_line", "rg > 0 AND bd > 1.5 * ab", 0),
    ("short_line", "bd > 0 AND bd < 0.5 * ab", 0),
    ("bull_belt_hold", "rg > 0 AND close > open AND lsd <= 0.05 * rg AND bd > ab", 1),
    ("bear_belt_hold", "rg > 0 AND close < open AND us <= 0.05 * rg AND bd > ab", -1),
    // -- two-bar (ENGULFING, HARAMI, HARAMICROSS, PIERCING, DARKCLOUDCOVER,
    //    COUNTERATTACK, SEPARATINGLINES, MATCHINGLOW, HOMINGPIGEON, INNECK,
    //    ONNECK, THRUSTING, KICKING, DOJISTAR)
    ("bull_engulf", "pc < po AND close > open AND open <= pc AND close >= po", 1),
    ("bear_engulf", "pc > po AND close < open AND open >= pc AND close <= po", -1),
    ("bull_harami", "pc < po AND close > open AND open >= pc AND close <= po", 1),
    ("bear_harami", "pc > po AND close < open AND open <= pc AND close >= po", -1),
    ("bull_harami_cross",
      "pc < po AND doji AND least(open, close) >= pc AND greatest(open, close) <= po", 1),
    ("bear_harami_cross",
      "pc > po AND doji AND least(open, close) >= po AND greatest(open, close) <= pc", -1),
    ("piercing",
      "pc < po AND close > open AND open < pl AND close > (po + pc) / 2 AND close < po", 1),
    ("dark_cloud_cover",
      "pc > po AND close < open AND open > ph AND close < (po + pc) / 2 AND close > po", -1),
    ("bull_counterattack", "pc < po AND close > open AND bp > ab AND bd > ab" +
      " AND abs(close - pc) <= 0.2 * ab", 1),
    ("bear_counterattack", "pc > po AND close < open AND bp > ab AND bd > ab" +
      " AND abs(close - pc) <= 0.2 * ab", -1),
    ("bull_separating_lines",
      "pc < po AND close > open AND abs(open - po) <= 0.2 * ab AND bd > ab", 1),
    ("bear_separating_lines",
      "pc > po AND close < open AND abs(open - po) <= 0.2 * ab AND bd > ab", -1),
    ("matching_low", "pc < po AND close < open AND abs(close - pc) <= 0.2 * ab", 1),
    ("homing_pigeon", "pc < po AND close < open AND open <= po AND close >= pc", 1),
    ("in_neck", "pc < po AND close > open AND open < pl AND close >= pc" +
      " AND close <= pc + 0.1 * bp", -1),
    ("on_neck", "pc < po AND close > open AND open < pl AND abs(close - pl) <= 0.2 * ab", -1),
    ("thrusting", "pc < po AND close > open AND open < pl AND close > pc + 0.1 * bp" +
      " AND close < (po + pc) / 2", -1),
    ("bull_kicking", "rp > 0 AND bp >= 0.95 * rp AND pc < po" +
      " AND rg > 0 AND bd >= 0.95 * rg AND close > open AND low > ph", 1),
    ("bear_kicking", "rp > 0 AND bp >= 0.95 * rp AND pc > po" +
      " AND rg > 0 AND bd >= 0.95 * rg AND close < open AND high < pl", -1),
    ("doji_star", "doji AND ((pc > po AND least(open, close) > pc)" +
      " OR (pc < po AND greatest(open, close) < pc))", 0),
    // -- three-bar (3WHITESOLDIERS, 3BLACKCROWS, IDENTICAL3CROWS, 2CROWS,
    //    UPSIDEGAP2CROWS, 3INSIDE, 3OUTSIDE, MORNINGSTAR, EVENINGSTAR,
    //    MORNINGDOJISTAR, EVENINGDOJISTAR, TRISTAR, ABANDONEDBABY,
    //    STICKSANDWICH, TASUKIGAP, GAPSIDESIDEWHITE, ADVANCEBLOCK,
    //    STALLEDPATTERN) and four-bar 3LINESTRIKE
    ("three_white", "close > open AND pc > po AND c2 > o2 AND close > pc AND pc > c2", 1),
    ("three_black", "close < open AND pc < po AND c2 < o2 AND close < pc AND pc < c2", -1),
    ("identical_three_crows", "close < open AND pc < po AND c2 < o2" +
      " AND abs(po - c2) <= 0.2 * ab AND abs(open - pc) <= 0.2 * ab", -1),
    ("two_crows", "c2 > o2 AND pc < po AND po > c2 AND close < open" +
      " AND open >= pc AND open <= po AND close < c2 AND close > o2", -1),
    ("upside_gap_two_crows", "c2 > o2 AND pc < po AND least(po, pc) > c2" +
      " AND close < open AND open > po AND close < pc AND close > c2", -1),
    ("three_inside_up", "c2 < o2 AND pc > po AND po >= c2 AND pc <= o2" +
      " AND close > open AND close > o2", 1),
    ("three_inside_down", "c2 > o2 AND pc < po AND po <= c2 AND pc >= o2" +
      " AND close < open AND close < o2", -1),
    ("three_outside_up", "c2 < o2 AND pc > po AND po <= c2 AND pc >= o2" +
      " AND close > open AND close > pc", 1),
    ("three_outside_down", "c2 > o2 AND pc < po AND po >= c2 AND pc <= o2" +
      " AND close < open AND close < pc", -1),
    ("morning_star",
      "c2 < o2 AND bp <= 0.3 * b2 AND close > open AND close >= (o2 + c2) / 2", 1),
    ("evening_star",
      "c2 > o2 AND bp <= 0.3 * b2 AND close < open AND close <= (o2 + c2) / 2", -1),
    ("morning_doji_star",
      "c2 < o2 AND dojip AND close > open AND close >= (o2 + c2) / 2", 1),
    ("evening_doji_star",
      "c2 > o2 AND dojip AND close < open AND close <= (o2 + c2) / 2", -1),
    ("tristar", "doji AND dojip AND doji2", 0),
    ("bull_abandoned_baby",
      "c2 < o2 AND dojip AND ph < l2 AND ph < low AND close > open", 1),
    ("bear_abandoned_baby",
      "c2 > o2 AND dojip AND pl > h2 AND pl > high AND close < open", -1),
    ("stick_sandwich",
      "c2 < o2 AND pc > po AND close < open AND abs(close - c2) <= 0.2 * ab", 1),
    ("upside_tasuki_gap", "c2 > o2 AND pc > po AND po > c2 AND close < open" +
      " AND open < pc AND open > po AND close < po AND close > c2", 0),
    ("downside_tasuki_gap", "c2 < o2 AND pc < po AND po < c2 AND close > open" +
      " AND open > pc AND open < po AND close > po AND close < c2", 0),
    ("gap_side_side_white", "pc > po AND close > open" +
      " AND least(open, po) > greatest(o2, c2) AND abs(open - po) <= 0.2 * ab", 1),
    ("advance_block", "close > open AND pc > po AND c2 > o2 AND close > pc" +
      " AND pc > c2 AND bd < bp AND bp < b2", -1),
    ("stalled_pattern", "close > open AND pc > po AND c2 > o2 AND close > pc" +
      " AND pc > c2 AND bd <= 0.5 * bp", -1),
    ("bull_strike", "c3 < o3 AND c2 < o2 AND pc < po AND pc < c2 AND c2 < c3" +
      " AND close > open AND close > o3", 1),
    ("bear_strike", "c3 > o3 AND c2 > o2 AND pc > po AND pc > c2 AND c2 > c3" +
      " AND close < open AND close < o3", -1),
    // -- 4-5-bar trend-confirmation family (RISEFALL3METHODS, MATHOLD,
    //    BREAKAWAY, LADDERBOTTOM, 3STARSINSOUTH, CONCEALBABYSWALL,
    //    XSIDEGAP3METHODS, HIKKAKE incl. MOD's immediate form,
    //    UNIQUE3RIVER) — lag-4 columns o4/h4/l4/c4 are null on the first
    //    post-gate row, so every lag-4 rule leads with the IS NOT NULL
    //    guard (false AND null = false keeps the flag two-valued).
    ("rising_three_methods", "o4 IS NOT NULL AND c4 > o4 AND b4 > ab" +
      " AND c3 < o3 AND c2 < o2 AND pc < po" +
      " AND greatest(o3, c3) <= h4 AND least(o3, c3) >= l4" +
      " AND greatest(o2, c2) <= h4 AND least(o2, c2) >= l4" +
      " AND greatest(po, pc) <= h4 AND least(po, pc) >= l4" +
      " AND close > open AND bd > ab AND close > c4", 1),
    ("falling_three_methods", "o4 IS NOT NULL AND c4 < o4 AND b4 > ab" +
      " AND c3 > o3 AND c2 > o2 AND pc > po" +
      " AND greatest(o3, c3) <= h4 AND least(o3, c3) >= l4" +
      " AND greatest(o2, c2) <= h4 AND least(o2, c2) >= l4" +
      " AND greatest(po, pc) <= h4 AND least(po, pc) >= l4" +
      " AND close < open AND bd > ab AND close < c4", -1),
    ("mat_hold", "o4 IS NOT NULL AND c4 > o4 AND b4 > ab" +
      " AND c3 < o3 AND o3 > c4 AND c2 < o2 AND pc < po" +
      " AND least(c3, least(c2, pc)) >= (o4 + c4) / 2" +
      " AND close > open AND close > greatest(h3, greatest(h2, ph))", 1),
    ("bull_breakaway", "o4 IS NOT NULL AND c4 < o4 AND b4 > ab" +
      " AND c3 < o3 AND o3 < c4 AND c2 < c3 AND pc < c2" +
      " AND close > open AND close > o3 AND close < c4", 1),
    ("bear_breakaway", "o4 IS NOT NULL AND c4 > o4 AND b4 > ab" +
      " AND c3 > o3 AND o3 > c4 AND c2 > c3 AND pc > c2" +
      " AND close < open AND close < o3 AND close > c4", -1),
    ("ladder_bottom", "o4 IS NOT NULL AND c4 < o4 AND c3 < o3 AND c2 < o2" +
      " AND o3 < o4 AND o2 < o3 AND c3 < c4 AND c2 < c3" +
      " AND pc < po AND (ph - greatest(po, pc)) > 0.3 * bp" +
      " AND close > open AND open > po AND close > ph", 1),
    ("three_stars_in_south", "c2 < o2 AND b2 > ab" +
      " AND (least(o2, c2) - l2) >= b2" +
      " AND pc < po AND po <= o2 AND pl >= l2 AND bp < b2" +
      " AND close < open AND bd < bp" +
      " AND low >= pl AND high <= ph", 1),
    ("concealing_baby_swallow", "o4 IS NOT NULL" +
      " AND c4 < o4 AND (h4 - l4) > 0 AND b4 >= 0.95 * (h4 - l4)" +
      " AND c3 < o3 AND (h3 - l3) > 0 AND abs(c3 - o3) >= 0.95 * (h3 - l3)" +
      " AND pc < po AND po < c3 AND ph > c3" +
      " AND close < open AND high >= ph AND low <= pl", 1),
    ("upside_gap_three_methods", "c2 > o2 AND pc > po AND po > c2" +
      " AND close < open AND open >= po AND close <= c2", 1),
    ("downside_gap_three_methods", "c2 < o2 AND pc < po AND po < c2" +
      " AND close > open AND open <= po AND close >= c2", -1),
    ("bull_hikkake", "ph < h2 AND pl > l2 AND low < pl AND close > pl", 1),
    ("bear_hikkake", "ph < h2 AND pl > l2 AND high > ph AND close < ph", -1),
    ("unique_three_river", "c2 < o2 AND b2 > ab" +
      " AND pc < po AND po <= o2 AND pl < l2" +
      " AND close > open AND bd < bp AND close < pc", 1))
}

object Patterns {
  private type Q = (SparkSession, String) => DataFrame
  import Windows._

  private def candles(s: SparkSession, dir: String) = Tables.candles(s, dir)

  /** I20 — candlestick pattern battery (batch/k_pattern.py:9-31 maps
    * TA-Lib's ~61 CDL patterns; engulfing + three-line strike semantics per
    * tv_trend_cloud.py:16-41). Emits one row per bar where ≥1 pattern
    * fires: comma-joined pattern names, count, and net bull−bear strength.
    *
    * Every rule is defined ONCE as a SQL boolean over the lagged OHLC
    * columns ([[KRules.RULES]]) and evaluated by BOTH engines — `expr()`
    * here, spliced text in the DuckDB oracle — so cross-engine parity is
    * by construction, not by hand-kept duplicates. Closed-form lag-window
    * restatements, not TA-Lib ports: body/shadow thresholds are explicit
    * (0.1·range doji, 0.95·range marubozu, avg-prior-body for long/short),
    * where TA-Lib hides them behind per-pattern "body averages". Round 3
    * added the 4-5-bar trend-confirmation family (RISEFALL3METHODS,
    * MATHOLD, BREAKAWAY, LADDERBOTTOM, 3STARSINSOUTH, CONCEALBABYSWALL,
    * XSIDEGAP3METHODS, HIKKAKE — the immediate-bar form, which also
    * stands in for HIKKAKEMOD — and UNIQUE3RIVER) as lag-4 expressions,
    * so every entry in the reference's CDL map now has a flag here.
    *
    * Runs on the 1d roll-up — the fixture's 1m bars hold ~1 event each
    * (open=high=low=close, no body or shadow to pattern-match); daily bars
    * have real OHLC shape. The expressions are interval-agnostic, exactly
    * like the reference's per-interval scans. One per-symbol sort serves
    * all lags and the avg-body frame; all ~64 flags are plain codegen'd
    * boolean columns on top.
    */
  private val kPattern: Q = (s, dir) => {
    val df = graft.operators.Rollup.rollup(candles(s, dir), 86400L)
      .withColumn("po", lag1(col("open"))).withColumn("pc", lag1(col("close")))
      .withColumn("ph", lag1(col("high"))).withColumn("pl", lag1(col("low")))
      .withColumn("o2", lagN(col("open"), 2)).withColumn("c2", lagN(col("close"), 2))
      .withColumn("h2", lagN(col("high"), 2)).withColumn("l2", lagN(col("low"), 2))
      .withColumn("o3", lagN(col("open"), 3)).withColumn("c3", lagN(col("close"), 3))
      .withColumn("h3", lagN(col("high"), 3)).withColumn("l3", lagN(col("low"), 3))
      .withColumn("o4", lagN(col("open"), 4)).withColumn("c4", lagN(col("close"), 4))
      .withColumn("h4", lagN(col("high"), 4)).withColumn("l4", lagN(col("low"), 4))
      // avg body of the prior ≤10 bars as a sequential fold over the
      // collected frame — the repo's bit-stable cross-engine idiom
      // (Windows.meanOf): Spark and DuckDB then perform the identical
      // IEEE op sequence, so threshold comparisons can't flip
      .withColumn("abf", collect_list(abs(col("close") - col("open")))
        .over(bySymbol.rowsBetween(-10, -1)))
      // guarded: the first bar's empty frame would hit ANSI divide-by-zero
      // when evaluated ahead of the o3 filter; such rows are dropped anyway
      .withColumn("ab", when(size(col("abf")) > 0, meanOf(col("abf"))))
      .filter(col("o3").isNotNull)
      // o3 non-null ⇒ ≥3 prior bars ⇒ every lag-1..3 column and ab are
      // non-null too; telling codegen so elides every null branch in the
      // rule battery below (≈half the generated code = half the one-time
      // Janino compile). Lag-4 columns stay nullable — their rules guard.
      .withColumns(
        Seq("open", "high", "low", "close", "po", "pc", "ph", "pl",
          "o2", "c2", "h2", "l2", "o3", "c3", "h3", "l3", "ab")
          .map(c => c -> graft.functions.CodegenBarrierCol.assertNotNull(col(c)))
          .toMap)
    // vocabulary stages then flags: each shared sub-expression and each rule
    // evaluates ONCE into a column; the three consumers (name list, count,
    // strength) reference the flags. CollapseProject keeps multi-use
    // non-cheap aliases materialized instead of inlining, so the plan is
    // Project(vocab1) → Project(vocab2) → Project(flags) → consumers — each
    // small enough that whole-stage codegen stays compiled (pre-vocab the
    // fused projection blew Janino's 64 KB method limit and the stage ran
    // interpreted; PlanSpec pins the compile now).
    val vocab = df
      .withColumns(KRules.VOCAB1.map { case (n, sql) => n -> expr(sql) }.toMap)
      .withColumns(KRules.VOCAB2.map { case (n, sql) => n -> expr(sql) }.toMap)
    // ONE standalone projection computes all three consumers directly over
    // the rule trees: common-subexpression elimination evaluates each rule
    // once, and the CodegenBarrier on the (trivial) symbol column keeps the
    // projection OUT of whole-stage fusion — standalone it compiles via
    // UnsafeProjection's expression splitting into many small JIT-able
    // methods, where fused the 77 rules exceeded Janino's hard 64 KB
    // method limit and the stage paid a failed multi-second compile then
    // ran interpreted (the round-3 5× bench swings).
    val nFlags = KRules.RULES.map { case (_, sql, _) =>
      expr(sql).cast("int") }.reduce(_ + _)
    val strength = KRules.RULES.map { case (_, sql, w) =>
      when(expr(sql), w).otherwise(0) }.reduce(_ + _)
    val names = concat_ws(",",
      KRules.RULES.map { case (nm, sql, _) => when(expr(sql), nm) }: _*)
    // the barrier column is also what keeps the n_patterns filter from
    // being pushed through (and re-expanded inside) this projection
    vocab.select(
        graft.functions.CodegenBarrierCol.barrier(col("symbol")).as("symbol"),
        col("bucket_ts"),
        names.as("patterns"), nFlags.as("n_patterns"), strength.as("strength"))
      .filter(col("n_patterns") > 0)
  }

  /** I20b — chart-pattern pack (batch/k_pattern.py:129-213: the
    * tradingpatterns/patternpy price-shape detectors the CDL battery
    * doesn't cover), re-expressed as pivot-sequence rules instead of the
    * reference's per-symbol pandas library calls:
    *
    *  1. pivot highs/lows = centered 5-bar extrema on the daily roll-up
    *     (full window required, so series edges can't fake pivots);
    *  2. per symbol, the time-ordered pivot lists reduce to the trailing
    *     pivot shape:
    *     - 头肩顶 head&shoulders (−1.5): of the last 3 pivot highs the
    *       middle is the head and the outer shoulders level within 2%;
    *       头肩底 inverse (+1.5) mirrored on pivot lows;
    *     - 双顶 double top (−1.2): last 2 pivot highs level within 1.5%
    *       with a pivot-low neckline ≥2% below between them; 双底 double
    *       bottom (+1.2) mirrored;
    *     - 上升/下降/水平通道 channels (+1.0/−1.0/+0.5): joint direction
    *       of the last two pivot highs AND lows (the trendln fallback
    *       shape, k_pattern.py:168-213).
    *
    * One row per symbol — pattern names (Chinese, PRICE_PATTERN_NAMES
    * verbatim), detected count, Σ|score| strength, latest price — the
    * reference's output contract (k_pattern.py:232-241). Scale shape: the
    * pivot flags are one per-symbol window pass; the reduction is a
    * groupBy collecting only PIVOT rows (≲N/5 structs of 16 bytes; for a
    * 500-bar working window ≤100 structs/symbol — bounded group state).
    */
  private val chartPattern: Q = (s, dir) => {
    val daily = graft.operators.Rollup.rollup(candles(s, dir), 86400L)
    val wc = centered(2)
    val after = bySymbol.rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val piv = daily
      .withColumn("nb", count(lit(1)).over(wc))
      .withColumn("ph", col("nb") === 5 && col("high") === max(col("high")).over(wc))
      .withColumn("pl", col("nb") === 5 && col("low") === min(col("low")).over(wc))
      // "between the trailing two pivot highs" without array-lambda capture
      // (DuckDB 1.0 mis-binds captured outer expressions in lambdas — see
      // Futures.streakSql): a pivot low lies between the last two pivot
      // highs iff exactly ONE pivot high follows it, and vice versa
      .withColumn("highs_after",
        coalesce(sum(col("ph").cast("int")).over(after), lit(0)))
      .withColumn("lows_after",
        coalesce(sum(col("pl").cast("int")).over(after), lit(0)))
    val agg = piv.groupBy(col("symbol")).agg(
      max(col("bucket_ts")).as("bucket_ts"),
      max_by(col("close"), col("bucket_ts")).as("last_close"),
      sort_array(collect_list(when(col("ph"),
        struct(col("bucket_ts").as("ts"), col("high").as("v"))))).as("hs"),
      sort_array(collect_list(when(col("pl"),
        struct(col("bucket_ts").as("ts"), col("low").as("v"))))).as("ls"),
      min(when(col("pl") && col("highs_after") === 1, col("low"))).as("neck_low"),
      max(when(col("ph") && col("lows_after") === 1, col("high"))).as("neck_high"))
    // try_element_at: NULL out of range (ANSI element_at throws), matching
    // DuckDB's l[-i] semantics
    def last(a: String, i: Int, f: String) = try_element_at(col(a), lit(-i)).getField(f)
    val h1 = last("hs", 1, "v"); val h2 = last("hs", 2, "v"); val h3 = last("hs", 3, "v")
    val l1 = last("ls", 1, "v"); val l2 = last("ls", 2, "v"); val l3 = last("ls", 3, "v")
    val neckLow = col("neck_low")
    val neckHigh = col("neck_high")
    val flags: Seq[(String, Column, Double)] = Seq(
      ("头肩顶", size(col("hs")) >= 3 && h2 > h3 && h2 > h1 &&
        abs(h3 - h1) <= lit(0.02) * h2, -1.5),
      ("头肩底", size(col("ls")) >= 3 && l2 < l3 && l2 < l1 &&
        abs(l3 - l1) <= lit(0.02) * l2, 1.5),
      ("双顶", size(col("hs")) >= 2 && abs(h1 - h2) <= lit(0.015) * greatest(h1, h2) &&
        neckLow.isNotNull && neckLow <= lit(0.98) * least(h1, h2), -1.2),
      ("双底", size(col("ls")) >= 2 && abs(l1 - l2) <= lit(0.015) * greatest(l1, l2) &&
        neckHigh.isNotNull && neckHigh >= lit(1.02) * greatest(l1, l2), 1.2),
      ("上升通道", size(col("hs")) >= 2 && size(col("ls")) >= 2 &&
        h1 > h2 && l1 > l2, 1.0),
      ("下降通道", size(col("hs")) >= 2 && size(col("ls")) >= 2 &&
        h1 < h2 && l1 < l2, -1.0),
      ("水平通道", size(col("hs")) >= 2 && size(col("ls")) >= 2 &&
        !(h1 > h2 && l1 > l2) && !(h1 < h2 && l1 < l2), 0.5))
    val withFlags = agg.withColumns(
      flags.map { case (nm, c, _) => s"f_$nm" -> coalesce(c, lit(false)) }.toMap)
    val names = concat_ws(",",
      flags.map { case (nm, _, _) => when(col(s"f_$nm"), nm) }: _*)
    val n = flags.map { case (nm, _, _) => col(s"f_$nm").cast("int") }.reduce(_ + _)
    val strength = flags.map { case (nm, _, w) =>
      when(col(s"f_$nm"), lit(math.abs(w))).otherwise(lit(0.0)) }.reduce(_ + _)
    withFlags.select(col("symbol"), col("bucket_ts"),
      when(n > 0, names).otherwise(lit("无形态")).as("patterns"),
      n.as("n_patterns"), round(strength, 2).as("strength"),
      round(col("last_close"), 6).as("price"))
  }

  /** I33 — Ichimoku cloud (lean_indicators.py:249-281), parameterized; the
    * reference's (9, 26, 52, 26) needs 78 bars — deeper than the ~67-bar
    * fixture symbols — so the registered query runs the same expressions at
    * (9, 13, 26, 13).
    */
  private def ichimoku(t: Int, k: Int, sb: Int, disp: Int): Q = (s, dir) =>
    candles(s, dir)
      .withColumn("tenkan", (rollingMax(col("high"), t) + rollingMin(col("low"), t)) / 2)
      .withColumn("kijun", (rollingMax(col("high"), k) + rollingMin(col("low"), k)) / 2)
      .withColumn("senkou_a", lagN((col("tenkan") + col("kijun")) / 2, disp))
      .withColumn("senkou_b",
        lagN((rollingMax(col("high"), sb) + rollingMin(col("low"), sb)) / 2, disp))
      .withColumn("nbars", barsIn(sb + disp))
      .filter(col("nbars") === (sb + disp))
      .select(col("symbol"), col("bucket_ts"),
        round(col("tenkan"), 6).as("tenkan"), round(col("kijun"), 6).as("kijun"),
        round(col("senkou_a"), 6).as("senkou_a"),
        round(col("senkou_b"), 6).as("senkou_b"),
        when(col("close") > greatest(col("senkou_a"), col("senkou_b")), "above_cloud")
          .when(col("close") < least(col("senkou_a"), col("senkou_b")), "below_cloud")
          .otherwise("in_cloud").as("signal"))

  val queries: Map[String, Q] = Map(
    "i20_k_pattern" -> kPattern,
    "i20b_chart_pattern" -> chartPattern,
    "i33_ichimoku" -> ichimoku(9, 13, 26, 13))

  private val W = "PARTITION BY symbol ORDER BY bucket_ts"
  private def f(n: Int) = s"ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"

  val oracle: Map[String, String] = Map(
    "i20_k_pattern" -> Oracle.withCandles(
      s""", daily AS (
         |  SELECT symbol, dts AS bucket_ts, open, high, low, close FROM (
         |    SELECT symbol, bucket_ts // 86400 * 86400 AS dts,
         |           min_by(open, bucket_ts) AS open, max(high) AS high,
         |           min(low) AS low, max_by(close, bucket_ts) AS close
         |    FROM candles GROUP BY 1, 2))
         |SELECT symbol, bucket_ts,
         |  concat_ws(',', ${KRules.RULES.map { case (nm, c, _) =>
             s"CASE WHEN $c THEN '$nm' END" }.mkString(",\n    ")}) AS patterns,
         |  ${KRules.RULES.map { case (_, c, _) =>
             s"CAST($c AS INT)" }.mkString(" + ")} AS n_patterns,
         |  ${KRules.RULES.map { case (_, c, w) =>
             s"CASE WHEN $c THEN $w ELSE 0 END" }.mkString(" + ")} AS strength
         |FROM (
         |  SELECT *, ${KRules.VOCAB2.map { case (n, c) => s"$c AS $n" }.mkString(",\n    ")}
         |  FROM (
         |  SELECT *, ${KRules.VOCAB1.map { case (n, c) => s"$c AS $n" }.mkString(",\n    ")}
         |  FROM (
         |  SELECT symbol, bucket_ts, open, high, low, close,
         |         lag(open) OVER ($W) AS po, lag(close) OVER ($W) AS pc,
         |         lag(high) OVER ($W) AS ph, lag(low) OVER ($W) AS pl,
         |         lag(open, 2) OVER ($W) AS o2, lag(close, 2) OVER ($W) AS c2,
         |         lag(high, 2) OVER ($W) AS h2, lag(low, 2) OVER ($W) AS l2,
         |         lag(open, 3) OVER ($W) AS o3, lag(close, 3) OVER ($W) AS c3,
         |         lag(high, 3) OVER ($W) AS h3, lag(low, 3) OVER ($W) AS l3,
         |         lag(open, 4) OVER ($W) AS o4, lag(close, 4) OVER ($W) AS c4,
         |         lag(high, 4) OVER ($W) AS h4, lag(low, 4) OVER ($W) AS l4,
         |         list_reduce(list_prepend(0.0, abf), (a, x) -> a + x) / len(abf) AS ab
         |  FROM (
         |    SELECT *, list(abs(close - open))
         |        OVER ($W ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS abf
         |    FROM daily))))
         |WHERE o3 IS NOT NULL
         |  AND ${KRules.RULES.map { case (_, c, _) =>
             s"CAST($c AS INT)" }.mkString(" + ")} > 0""".stripMargin),
    "i20b_chart_pattern" -> Oracle.withCandles {
      val flags: Seq[(String, String, Double)] = Seq(
        ("头肩顶", "nh >= 3 AND h2 > h3 AND h2 > h1 AND abs(h3 - h1) <= 0.02 * h2", 1.5),
        ("头肩底", "nl >= 3 AND l2 < l3 AND l2 < l1 AND abs(l3 - l1) <= 0.02 * l2", 1.5),
        ("双顶", "nh >= 2 AND abs(h1 - h2) <= 0.015 * greatest(h1, h2) " +
          "AND neck_low <= 0.98 * least(h1, h2)", 1.2),
        ("双底", "nl >= 2 AND abs(l1 - l2) <= 0.015 * greatest(l1, l2) " +
          "AND neck_high >= 1.02 * greatest(l1, l2)", 1.2),
        ("上升通道", "nh >= 2 AND nl >= 2 AND h1 > h2 AND l1 > l2", 1.0),
        ("下降通道", "nh >= 2 AND nl >= 2 AND h1 < h2 AND l1 < l2", 1.0),
        ("水平通道", "nh >= 2 AND nl >= 2 AND NOT (h1 > h2 AND l1 > l2) " +
          "AND NOT (h1 < h2 AND l1 < l2)", 0.5))
      def flag(c: String) = s"coalesce($c, FALSE)"
      s""", daily AS (
         |  SELECT symbol, dts AS bucket_ts, open, high, low, close FROM (
         |    SELECT symbol, bucket_ts // 86400 * 86400 AS dts,
         |           min_by(open, bucket_ts) AS open, max(high) AS high,
         |           min(low) AS low, max_by(close, bucket_ts) AS close
         |    FROM candles GROUP BY 1, 2)),
         |piv AS (
         |  SELECT symbol, bucket_ts, high, low, close,
         |         count(*) OVER wc = 5 AND high = max(high) OVER wc AS ph,
         |         count(*) OVER wc = 5 AND low = min(low) OVER wc AS pl
         |  FROM daily
         |  WINDOW wc AS (PARTITION BY symbol ORDER BY bucket_ts
         |                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
         |piv2 AS (
         |  SELECT *,
         |    coalesce(sum(CASE WHEN ph THEN 1 ELSE 0 END) OVER wa, 0) AS highs_after,
         |    coalesce(sum(CASE WHEN pl THEN 1 ELSE 0 END) OVER wa, 0) AS lows_after
         |  FROM piv
         |  WINDOW wa AS (PARTITION BY symbol ORDER BY bucket_ts
         |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
         |agg AS (
         |  SELECT symbol, max(bucket_ts) AS bucket_ts,
         |         max_by(close, bucket_ts) AS last_close,
         |         list(high ORDER BY bucket_ts) FILTER (WHERE ph) AS hs,
         |         list(low ORDER BY bucket_ts) FILTER (WHERE pl) AS ls,
         |         min(CASE WHEN pl AND highs_after = 1 THEN low END) AS neck_low,
         |         max(CASE WHEN ph AND lows_after = 1 THEN high END) AS neck_high
         |  FROM piv2 GROUP BY symbol),
         |cls AS (
         |  SELECT symbol, bucket_ts, last_close, neck_low, neck_high,
         |         coalesce(len(hs), 0) AS nh, coalesce(len(ls), 0) AS nl,
         |         hs[-1] AS h1, hs[-2] AS h2, hs[-3] AS h3,
         |         ls[-1] AS l1, ls[-2] AS l2, ls[-3] AS l3
         |  FROM agg)
         |SELECT symbol, bucket_ts,
         |  CASE WHEN ${flags.map { case (_, c, _) =>
                s"CAST(${flag(c)} AS INT)" }.mkString(" + ")} > 0
         |  THEN concat_ws(',', ${flags.map { case (nm, c, _) =>
                s"CASE WHEN ${flag(c)} THEN '$nm' END" }.mkString(",\n    ")})
         |  ELSE '无形态' END AS patterns,
         |  ${flags.map { case (_, c, _) =>
              s"CAST(${flag(c)} AS INT)" }.mkString(" + ")} AS n_patterns,
         |  round(CAST(${flags.map { case (_, c, w) =>
              s"CASE WHEN ${flag(c)} THEN $w ELSE 0.0 END" }.mkString(" + ")}
         |    AS DOUBLE), 2) AS strength,
         |  round(last_close, 6) AS price
         |FROM cls""".stripMargin
    },
    "i33_ichimoku" -> Oracle.withCandles(
      s"""SELECT symbol, bucket_ts, round(tenkan, 6) AS tenkan,
         |  round(kijun, 6) AS kijun, round(senkou_a, 6) AS senkou_a,
         |  round(senkou_b, 6) AS senkou_b,
         |  CASE WHEN close > greatest(senkou_a, senkou_b) THEN 'above_cloud'
         |       WHEN close < least(senkou_a, senkou_b) THEN 'below_cloud'
         |       ELSE 'in_cloud' END AS signal
         |FROM (
         |  SELECT symbol, bucket_ts, close, tenkan, kijun,
         |         lag((tenkan + kijun) / 2, 13) OVER ($W) AS senkou_a,
         |         lag(sb_mid, 13) OVER ($W) AS senkou_b,
         |         count(*) OVER ($W ${f(39)}) AS nbars
         |  FROM (
         |    SELECT symbol, bucket_ts, close,
         |           (max(high) OVER ($W ${f(9)}) + min(low) OVER ($W ${f(9)})) / 2 AS tenkan,
         |           (max(high) OVER ($W ${f(13)}) + min(low) OVER ($W ${f(13)})) / 2 AS kijun,
         |           (max(high) OVER ($W ${f(26)}) + min(low) OVER ($W ${f(26)})) / 2 AS sb_mid
         |    FROM candles))
         |WHERE nbars = 39""".stripMargin))
}
