package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Column-side entry points. */
object ArrayFoldCols {
  def arrayDot(a: Column, b: Column): Column =
    GraftBridge.column(ArrayDot(GraftBridge.expression(a), GraftBridge.expression(b)))
  def seqSum(a: Column): Column =
    GraftBridge.column(SeqSum(GraftBridge.expression(a)))
  def sumSqDev(a: Column, m: Column): Column =
    GraftBridge.column(SumSqDev(GraftBridge.expression(a), GraftBridge.expression(m)))
  def sumAbsDev(a: Column, m: Column): Column =
    GraftBridge.column(SumAbsDev(GraftBridge.expression(a), GraftBridge.expression(m)))
}
