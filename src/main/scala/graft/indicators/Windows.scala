package graft.indicators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Per-symbol window primitives (SURVEY.md §2.3) shared by the indicator
  * library. Every spec partitions by symbol and orders by bucket_ts — at
  * scale one exchange+sort serves *all* window expressions in the same
  * select, and a source table bucketed by symbol removes the exchange
  * entirely (Catalyst reuses the single Window operator; verify with
  * `.explain`: one Window node, many expressions).
  */
object Windows {
  /** Per-symbol, time-ascending ordering — the frame of every indicator. */
  val bySymbol: WindowSpec = Window.partitionBy("symbol").orderBy("bucket_ts")

  /** Trailing n-row frame (pandas `rolling(n)`), current row inclusive. */
  def lastN(n: Int): WindowSpec = bySymbol.rowsBetween(-(n - 1), 0)

  /** Centered ±k frame (pivot-high/low detection). */
  def centered(k: Int): WindowSpec = bySymbol.rowsBetween(-k, k)

  /** Everything so far (pandas `cumsum`). */
  val cumulative: WindowSpec = bySymbol.rowsBetween(Window.unboundedPreceding, 0)

  /** Rows available in the trailing n-frame — emit gate for full windows
    * (pandas rolling(n) yields NaN until the window fills; filtering on
    * `fullWindow(n)` reproduces that contract deterministically).
    */
  def barsIn(n: Int): Column = count(lit(1)).over(lastN(n))

  def rollingAvg(c: Column, n: Int): Column = avg(c).over(lastN(n))
  def rollingStd(c: Column, n: Int): Column = stddev_samp(c).over(lastN(n))
  def rollingStdPop(c: Column, n: Int): Column = stddev_pop(c).over(lastN(n))
  def rollingMin(c: Column, n: Int): Column = min(c).over(lastN(n))
  def rollingMax(c: Column, n: Int): Column = max(c).over(lastN(n))
  def rollingSum(c: Column, n: Int): Column = sum(c).over(lastN(n))

  def lag1(c: Column): Column = lag(c, 1).over(bySymbol)
  def lagN(c: Column, n: Int): Column = lag(c, n).over(bySymbol)
  def cumsum(c: Column): Column = sum(c).over(cumulative)

  /** Mean absolute deviation of a pre-materialized frame list `lst` from a
    * pre-materialized frame mean `m` (CCI denominator). The deviation is
    * against the *frame's own* mean, which no plain window aggregate
    * expresses — collect the frame (`collect_list(c).over(lastN(n))`) and
    * `avg(c).over(lastN(n))` into columns first, then fold with a
    * higher-order function (stays in codegen, no UDF; window expressions
    * are not legal inside lambdas, hence the two-stage contract).
    */
  def madOf(lst: Column, m: Column): Column =
    graft.functions.ArrayFoldCols.sumAbsDev(lst, m) / size(lst)

  /** Frame mean as an explicit sequential left fold (`0 + x0 + x1 + …`)/n.
    * See [[stdOf]] for why: bit-stability across the DuckDB oracle boundary
    * (oracle form: `list_reduce(list_prepend(0.0, frame), (a,x) -> a+x)/len`).
    */
  def meanOf(lst: Column): Column =
    graft.functions.ArrayFoldCols.seqSum(lst) / size(lst)

  /** Frame standard deviation as an explicit sequential fold over the
    * collected frame (`ddof`=1 for pandas rolling.std, 0 for population).
    * Preferred over the built-in `stddev` for indicator outputs: Spark and
    * DuckDB implement `stddev` with different accumulation algorithms, and
    * ratios like %b divide by the std, amplifying the ulp-level gap past
    * the 6-dp output rounding. A left fold performs the identical IEEE op
    * sequence in both engines — bit-stable across the oracle boundary.
    */
  def stdOf(lst: Column, m: Column, ddof: Int): Column =
    sqrt(graft.functions.ArrayFoldCols.sumSqDev(lst, m) /
      nullif((size(lst) - lit(ddof)).cast("double"), lit(0.0)))

  /** True Range: max(h−l, |h−prev_close|, |l−prev_close|); first bar falls
    * back to h−l (reference incremental/atr.py:7-20).
    */
  def trueRange(high: Column, low: Column, close: Column): Column = {
    val pc = lag1(close)
    when(pc.isNull, high - low)
      .otherwise(greatest(high - low, abs(high - pc), abs(low - pc)))
  }
}
