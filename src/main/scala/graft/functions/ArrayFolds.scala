package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd sequential folds over double arrays.
  *
  * The indicator/similarity library computes frame statistics and dot
  * products as explicit left folds so the DuckDB oracle can replay the
  * identical IEEE op sequence (see [[graft.indicators.Windows.stdOf]]).
  * Spark's higher-order functions (`aggregate`/`transform`/`zip_with`)
  * express that faithfully but run INTERPRETED — one closure call and an
  * intermediate array element per step. These kernels perform the same
  * sequence (`s = s ⊕ f(x_i)` ascending i, seeded 0.0) in a tight
  * codegen'd loop: bit-identical results, ~10× less per-row cost, and the
  * projection stays inside whole-stage codegen.
  */
object ArrayFolds {
  /** Σ a_i·b_i, sequential — equals
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x)`
    * for equal-length arrays (the embedding contract).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Σ x_i, sequential — equals `aggregate(a, 0.0, (acc,x) -> acc+x)`. */
  def seqSum(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i); i += 1 }
    s
  }

  /** Σ (x_i − m)², sequential — equals the transform+fold spelling. */
  def sumSqDev(a: ArrayData, m: Double): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - m; s += d * d; i += 1 }
    s
  }

  /** Σ |x_i − m|, sequential — equals the transform+fold spelling. */
  def sumAbsDev(a: ArrayData, m: Double): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += math.abs(a.getDouble(i) - m); i += 1 }
    s
  }

  // ---- futures-series per-row kernels (signals/MartSeries `fut`) ------
  // Each walks a trailing-window array in tight loops, replacing the
  // interpreted transform+fold spelling whose per-ELEMENT lambda dispatch
  // dominated the mart at depth. Fold orders are ascending, seeded 0.0 —
  // bit-identical to the DuckDB oracle's list_transform + list_reduce
  // over the same windows.

  /** Stats over the consecutive pct-change series of `a`
    * ((a_j − a_{j−1})/a_{j−1}, j ascending): (count, mean | null if 0,
    * population std | null if count < 2). Matches the oracle's `dps`
    * list + fmean/pstd CASE guards.
    */
  def pctStats(a: ArrayData): GenericInternalRow = {
    val len = a.numElements()
    val n = len - 1
    if (n < 1) return new GenericInternalRow(Array[Any](0, null, null))
    var s = 0.0
    var j = 1
    while (j < len) {
      s += (a.getDouble(j) - a.getDouble(j - 1)) / a.getDouble(j - 1)
      j += 1
    }
    val m = s / n
    if (n < 2) return new GenericInternalRow(Array[Any](n, m, null))
    var ss = 0.0
    j = 1
    while (j < len) {
      val p = (a.getDouble(j) - a.getDouble(j - 1)) / a.getDouble(j - 1)
      val d = p - m
      ss += d * d
      j += 1
    }
    new GenericInternalRow(Array[Any](n, m, math.sqrt(ss / n)))
  }

  /** Stats over the |x − 1| deviation series of `a`: (count, mean | null
    * if 0, population std | null if count < 2) — the oracle's
    * `tds`/`kds` lists + guards.
    */
  def absDev1Stats(a: ArrayData): GenericInternalRow = {
    val n = a.numElements()
    if (n < 1) return new GenericInternalRow(Array[Any](0, null, null))
    var s = 0.0
    var i = 0
    while (i < n) { s += math.abs(a.getDouble(i) - 1.0); i += 1 }
    val m = s / n
    if (n < 2) return new GenericInternalRow(Array[Any](n, m, null))
    var ss = 0.0
    i = 0
    while (i < n) {
      val d = math.abs(a.getDouble(i) - 1.0) - m
      ss += d * d
      i += 1
    }
    new GenericInternalRow(Array[Any](n, m, math.sqrt(ss / n)))
  }

  /** Mean over the non-null elements of `a`, ascending — equals
    * `aggregate(filter(a, isNotNull), 0.0, (acc,x) -> acc+x) /
    * size(filter(a, isNotNull))` (one summed fold, ONE division at the
    * end). Returns (n, m | null if n == 0) — the harmonic mart's
    * valid-RSI mean (signals/MartSeries `harm`, batch/harmonic.py:7-44).
    */
  def meanNonNull(a: ArrayData): GenericInternalRow = {
    val len = a.numElements()
    var s = 0.0
    var n = 0
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) { s += a.getDouble(i); n += 1 }
      i += 1
    }
    if (n == 0) new GenericInternalRow(Array[Any](0, null))
    else new GenericInternalRow(Array[Any](n, s / n))
  }

  /** One-pass VPVR histogram over the trailing (p, v) struct window
    * (signals/MartSeries `vpvr`, batch/vpvr.py:29-118): min/max price,
    * 12-bin volume histogram, POC = first argmax bin. Returns
    * (mybin, pocb, poc) — everything downstream of the window list.
    *
    * Bit-identical to the HOF spelling it replaces:
    *  - per-bin volume sums accumulate in ascending element order, which
    *    equals the filter-then-`aggregate` fold per bin;
    *  - POC bin is the FIRST argmax (= `array_position(bins,
    *    array_max(bins)) - 1`);
    *  - a flat window (phi == plo → `nullif` width NULL) gives
    *    (0.0, 11.0, close): mybin/poc take the `when(w.isNull, …)`
    *    guards, but the bins do NOT — `least(NULL, 11.0)` SKIPS the null
    *    (both engines), so every element lands in bin 11 and the POC bin
    *    is 11. An empty window (NULL min/max, nothing to bin) gives
    *    (0.0, 0.0, close) — all-zero bins, first argmax 0;
    *  - `poc`/`mybin` arithmetic keeps the expression tree's exact op
    *    order (`plo + ((pocb + 0.5) * (phi - plo)) / 12`,
    *    `least(floor((p - plo) / w * 12), 11.0)`).
    * Assumes the candle fact's clean-double contract (no NaN prices or
    * volumes), like the other window kernels here.
    */
  def vpvrPoc(cf: ArrayData, close: Double): GenericInternalRow = {
    val n = cf.numElements()
    var plo = Double.PositiveInfinity
    var phi = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val p = cf.getStruct(i, 2).getDouble(0)
      if (p < plo) plo = p
      if (p > phi) phi = p
      i += 1
    }
    val w = phi - plo
    if (n == 0)
      return new GenericInternalRow(Array[Any](0.0, 0.0, close))
    if (w == 0.0)
      return new GenericInternalRow(Array[Any](0.0, 11.0, close))
    val bins = new Array[Double](12)
    i = 0
    while (i < n) {
      val row = cf.getStruct(i, 2)
      val b = math.min(math.floor((row.getDouble(0) - plo) / w * 12), 11.0).toInt
      bins(b) += row.getDouble(1)
      i += 1
    }
    var pocb = 0
    var mx = bins(0)
    i = 1
    while (i < 12) {
      if (bins(i) > mx) { mx = bins(i); pocb = i }
      i += 1
    }
    val pb = pocb.toDouble
    new GenericInternalRow(Array[Any](
      math.min(math.floor((close - plo) / w * 12), 11.0),
      pb,
      plo + (pb + 0.5) * (phi - plo) / 12))
  }

  /** PQ geometry — the ONE definition shared by the encode kernel below
    * and the LUT/ADC side in [[graft.pipeline.Similarity]] (which aliases
    * these; r13 ADVICE: the kernel previously duplicated them as literals,
    * so changing the pipeline's constants would have silently
    * desynchronized encode from ADC).
    */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCodebook = 16

  /** PQ subspace codes (optimization r13, guide §4): for each of the
    * [[PqSubspaces]] [[PqSubDim]]-dim subspaces, argmin_j over the
    * j-ordered codebook of the SEQUENTIAL squared-distance fold —
    * bit-identical to the `aggregate(cb, struct(MaxValue, PqCodebook),
    * ...)` HOF spelling in [[graft.pipeline.Similarity]] (strict (d,
    * j)-lexicographic update, init j = [[PqCodebook]] on an empty
    * codebook), which ran interpreted per element. `cb` rows are
    * struct(j int, ce array<double>) with ce the full 64-dim sample
    * vector; subspace m reads elements [m·PqSubDim, (m+1)·PqSubDim).
    */
  def pqCodes(e: ArrayData, cb: ArrayData): ArrayData = {
    val nCb = cb.numElements()
    val out = new Array[Int](PqSubspaces)
    var m = 0
    while (m < PqSubspaces) {
      var bd = Double.MaxValue
      var bj = PqCodebook
      var i = 0
      while (i < nCb) {
        val row = cb.getStruct(i, 2)
        val j = row.getInt(0)
        val ce = row.getArray(1)
        var s = 0.0
        var k = 0
        val lim = math.min(math.min(e.numElements(), ce.numElements()) -
          m * PqSubDim, PqSubDim)
        while (k < lim) {
          val d = e.getDouble(m * PqSubDim + k) - ce.getDouble(m * PqSubDim + k)
          s += d * d
          k += 1
        }
        if (s < bd || (s == bd && j < bj)) { bd = s; bj = j }
        i += 1
      }
      out(m) = bj
      m += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** ADC sum: Σ_m lut[m][codes[m]], m ascending — bit-identical to the
    * zip_with/aggregate + element_at spelling (1-based there, 0-based
    * direct indexing here). An out-of-range code yields null, matching
    * element_at's out-of-bounds null instead of throwing (r13 ADVICE —
    * unreachable from [[pqCodes]] output, but degenerate input must not
    * crash the stage where the HOF spelling returned null).
    */
  def pqAdcSum(codes: ArrayData, lut: ArrayData): java.lang.Double = {
    val n = codes.numElements()
    var s = 0.0
    var m = 0
    while (m < n) {
      val c = codes.getInt(m)
      val row = lut.getArray(m)
      if (c < 0 || c >= row.numElements()) return null
      s += row.getDouble(c)
      m += 1
    }
    s
  }

  /** SQ8 asymmetric-distance fold (s10's ADC): Σ_i (qe_i − (mn_i +
    * code_i·sc_i))², i ascending — bit-identical to the
    * zip_with/aggregate spelling over (codes, dim-index) structs.
    */
  def sqAdcSum(codes: ArrayData, qe: ArrayData, mn: ArrayData,
      sc: ArrayData): Double = {
    val n = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val rec = mn.getDouble(i) + codes.getInt(i).toDouble * sc.getDouble(i)
      val d = qe.getDouble(i) - rec
      s += d * d
      i += 1
    }
    s
  }

  /** Exact K-wide argmin over the broadcast centroid fold (the s09 Lloyd
    * assignment; optimization r14, guide §4): for each struct (k, c, cc)
    * element of `cents` in array order, d = en − 2·[[dot]](e, c) + cc,
    * strict (d, k)-lexicographic update from init (MaxValue, MaxValue) —
    * bit-identical to the `aggregate(cents, struct(...), ...)` HOF
    * spelling in [[graft.pipeline.Similarity]], which ran INTERPRETED per
    * (row × centroid) and dominated both the trainer rounds and the
    * full-corpus assignment. Double comparisons use Spark's SQL ordering
    * (NaN largest, -0.0 < 0.0 — `SQLOrderingUtil.compareDoubles`), the
    * semantics the HOF's LessThan/EqualTo applied, so degenerate inputs
    * cannot diverge. Result: struct(d double, k int) — the HOF acc shape.
    */
  def kmArgmin(e: ArrayData, en: Double, cents: ArrayData): Any = {
    val n = cents.numElements()
    var bd = Double.MaxValue
    var bk = Int.MaxValue
    var i = 0
    while (i < n) {
      val row = cents.getStruct(i, 3)
      val d = en - 2.0 * dot(e, row.getArray(1)) + row.getDouble(2)
      val k = row.getInt(0)
      val cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(d, bd)
      if (cmp < 0 || (cmp == 0 && k < bk)) { bd = d; bk = k }
      i += 1
    }
    new GenericInternalRow(Array[Any](bd, bk))
  }

  /** Probed cosine ARGMAX over a broadcast candidate-centroid array (the
    * d09 SemDeDup assignment; optimization r14, guide §4): for each
    * struct (c_id, ce, cn) element in array order, cc = [[dot]](e, ce) /
    * nullif(n·cn, 0.0); strict (cc desc, c_id asc) update from init
    * (-2.0, -1). Bit-identical to the interpreted `aggregate` HOF
    * spelling: a zero product is skipped exactly where `nullif` made the
    * lambda's comparison null (SQL double ordering — compareDoubles — for
    * both the zero test and the comparisons, the semantics the HOF's
    * interpreted EqualTo/GreaterThan applied).
    */
  def cosArgmax(e: ArrayData, n: Double, cands: ArrayData): Any = {
    import org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles
    val m = cands.numElements()
    var bc = -2.0
    var bid = -1L
    var i = 0
    while (i < m) {
      val row = cands.getStruct(i, 3)
      val prod = n * row.getDouble(2)
      if (compareDoubles(prod, 0.0) != 0) {
        val cc = dot(e, row.getArray(1)) / prod
        val cmp = compareDoubles(cc, bc)
        val cid = row.getLong(0)
        if (cmp > 0 || (cmp == 0 && cid < bid)) { bc = cc; bid = cid }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bc, bid))
  }

  /** Signed tail-streak over the consecutive-delta signs of `a`, walking
    * the MOST RECENT delta backwards (the reference's 尾部连续根数 and
    * exactly the dl → reverse → first-opposing-break spelling): null if
    * fewer than 2 elements, 0 if every delta is zero, else ±(number of
    * deltas, zeros included, before the first nonzero sign opposing the
    * most recent nonzero sign).
    */
  def tailStreakSigned(a: ArrayData): Any = {
    val len = a.numElements()
    if (len < 2) return null
    var s0 = 0
    var mag = 0
    var j = len - 1
    var done = false
    while (j >= 1 && !done) {
      val d = a.getDouble(j) - a.getDouble(j - 1)
      val sign = if (d == 0.0) 0 else if (d > 0.0) 1 else -1
      if (sign != 0 && s0 == 0) s0 = sign
      if (sign != 0 && sign != s0) done = true
      else mag += 1
      j -= 1
    }
    if (s0 == 0) 0 else s0 * mag
  }
}

case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayFolds.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayFolds.dot($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

case class SeqSum(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "seq_sum"
  override protected def nullSafeEval(a: Any): Any =
    ArrayFolds.seqSum(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ArrayFolds.seqSum($a)")
  override protected def withNewChildInternal(newChild: Expression): SeqSum =
    copy(child = newChild)
}

case class SumSqDev(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sum_sq_dev"
  override protected def nullSafeEval(a: Any, m: Any): Any =
    ArrayFolds.sumSqDev(a.asInstanceOf[ArrayData], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, m) => s"graft.functions.ArrayFolds.sumSqDev($a, $m)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): SumSqDev =
    copy(left = newLeft, right = newRight)
}

case class SumAbsDev(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sum_abs_dev"
  override protected def nullSafeEval(a: Any, m: Any): Any =
    ArrayFolds.sumAbsDev(a.asInstanceOf[ArrayData], m.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, m) => s"graft.functions.ArrayFolds.sumAbsDev($a, $m)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): SumAbsDev =
    copy(left = newLeft, right = newRight)
}

/** Shared shape for the struct-returning futures-series kernels: one
  * tight array walk per row, (n, m, sd) out. CodegenFallback is fine
  * here — the interpreted dispatch is once per ROW (the per-element work
  * is inside the JVM loop), unlike the HOF spelling it replaces.
  */
abstract class FutStatsExpr extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("m", DoubleType, nullable = true),
    StructField("sd", DoubleType, nullable = true)))
}

case class PctStats(child: Expression) extends FutStatsExpr {
  override def prettyName: String = "pct_stats"
  override protected def nullSafeEval(a: Any): Any =
    ArrayFolds.pctStats(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): PctStats =
    copy(child = newChild)
}

case class AbsDev1Stats(child: Expression) extends FutStatsExpr {
  override def prettyName: String = "abs_dev1_stats"
  override protected def nullSafeEval(a: Any): Any =
    ArrayFolds.absDev1Stats(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): AbsDev1Stats =
    copy(child = newChild)
}

case class MeanNonNull(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("m", DoubleType, nullable = true)))
  override def prettyName: String = "mean_non_null"
  override protected def nullSafeEval(a: Any): Any =
    ArrayFolds.meanNonNull(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): MeanNonNull =
    copy(child = newChild)
}

case class VpvrPoc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("p", DoubleType), StructField("v", DoubleType)))),
    DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("mybin", DoubleType, nullable = false),
    StructField("pocb", DoubleType, nullable = false),
    StructField("poc", DoubleType, nullable = false)))
  override def prettyName: String = "vpvr_poc"
  override protected def nullSafeEval(cf: Any, close: Any): Any =
    ArrayFolds.vpvrPoc(cf.asInstanceOf[ArrayData], close.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): VpvrPoc =
    copy(left = newLeft, right = newRight)
}

case class TailStreakSigned(child: Expression) extends UnaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "tail_streak_signed"
  override protected def nullSafeEval(a: Any): Any =
    ArrayFolds.tailStreakSigned(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): TailStreakSigned =
    copy(child = newChild)
}

/** Column-side entry points. */
case class PqCodes(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType),
    ArrayType(StructType(Seq(StructField("j", IntegerType),
      StructField("ce", ArrayType(DoubleType))))))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override protected def nullSafeEval(e: Any, cb: Any): Any =
    ArrayFolds.pqCodes(e.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, cb) => s"graft.functions.ArrayFolds.pqCodes($e, $cb)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): PqCodes =
    copy(left = newLeft, right = newRight)
}

case class SqAdcSum(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType),
    ArrayType(DoubleType), ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adc_sum"
  override protected def nullSafeEval(codes: Any, qe: Any, mn: Any,
      sc: Any): Any =
    ArrayFolds.sqAdcSum(codes.asInstanceOf[ArrayData],
      qe.asInstanceOf[ArrayData], mn.asInstanceOf[ArrayData],
      sc.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, q, m, s) =>
      s"graft.functions.ArrayFolds.sqAdcSum($c, $q, $m, $s)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): SqAdcSum =
    copy(first = f, second = s, third = t, fourth = q)
}

case class KmArgmin(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType),
    DoubleType,
    ArrayType(StructType(Seq(StructField("k", IntegerType),
      StructField("c", ArrayType(DoubleType)),
      StructField("cc", DoubleType)))))
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("k", IntegerType, nullable = false)))
  override def prettyName: String = "km_argmin"
  override protected def nullSafeEval(e: Any, en: Any, cents: Any): Any =
    ArrayFolds.kmArgmin(e.asInstanceOf[ArrayData], en.asInstanceOf[Double],
      cents.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, en, c) =>
      s"(InternalRow) graft.functions.ArrayFolds.kmArgmin($e, $en, $c)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): KmArgmin =
    copy(first = f, second = s, third = t)
}

case class CosArgmax(first: Expression, second: Expression, third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType),
    DoubleType,
    ArrayType(StructType(Seq(StructField("c_id", LongType),
      StructField("ce", ArrayType(DoubleType)),
      StructField("cn", DoubleType)))))
  override def dataType: DataType = StructType(Seq(
    StructField("ccos", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false)))
  override def prettyName: String = "cos_argmax"
  override protected def nullSafeEval(e: Any, n: Any, cands: Any): Any =
    ArrayFolds.cosArgmax(e.asInstanceOf[ArrayData], n.asInstanceOf[Double],
      cands.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (e, n, c) =>
      s"(InternalRow) graft.functions.ArrayFolds.cosArgmax($e, $n, $c)")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): CosArgmax =
    copy(first = f, second = s, third = t)
}

case class PqAdcSum(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType),
    ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  // null on out-of-range codes (the element_at semantics), beyond the
  // usual null-in-null-out
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_sum"
  override protected def nullSafeEval(codes: Any, lut: Any): Any =
    ArrayFolds.pqAdcSum(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val tmp = ctx.freshName("adc")
      s"""
      java.lang.Double $tmp = graft.functions.ArrayFolds.pqAdcSum($c, $l);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}

object ArrayFoldCols {
  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  def seqSum(a: Column): Column =
    GraftBridge.column(SeqSum(GraftBridge.expression(a)))
  def sumSqDev(a: Column, m: Column): Column =
    GraftBridge.column(SumSqDev(GraftBridge.expression(a), GraftBridge.expression(m)))
  def sumAbsDev(a: Column, m: Column): Column =
    GraftBridge.column(SumAbsDev(GraftBridge.expression(a), GraftBridge.expression(m)))
  def pctStats(a: Column): Column =
    GraftBridge.column(PctStats(GraftBridge.expression(a)))
  def absDev1Stats(a: Column): Column =
    GraftBridge.column(AbsDev1Stats(GraftBridge.expression(a)))
  def tailStreakSigned(a: Column): Column =
    GraftBridge.column(TailStreakSigned(GraftBridge.expression(a)))
  def vpvrPoc(cf: Column, close: Column): Column =
    GraftBridge.column(VpvrPoc(GraftBridge.expression(cf), GraftBridge.expression(close)))
  def meanNonNull(a: Column): Column =
    GraftBridge.column(MeanNonNull(GraftBridge.expression(a)))
  def pqCodes(e: Column, cb: Column): Column =
    GraftBridge.column(PqCodes(GraftBridge.expression(e), GraftBridge.expression(cb)))
  def pqAdcSum(codes: Column, lut: Column): Column =
    GraftBridge.column(PqAdcSum(GraftBridge.expression(codes), GraftBridge.expression(lut)))
  def sqAdcSum(codes: Column, qe: Column, mn: Column, sc: Column): Column =
    GraftBridge.column(SqAdcSum(GraftBridge.expression(codes),
      GraftBridge.expression(qe), GraftBridge.expression(mn),
      GraftBridge.expression(sc)))
  def kmArgmin(e: Column, en: Column, cents: Column): Column =
    GraftBridge.column(KmArgmin(GraftBridge.expression(e),
      GraftBridge.expression(en), GraftBridge.expression(cents)))
  def cosArgmax(e: Column, n: Column, cands: Column): Column =
    GraftBridge.column(CosArgmax(GraftBridge.expression(e),
      GraftBridge.expression(n), GraftBridge.expression(cands)))
}
