package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType

/** Identity passthrough that deliberately opts OUT of codegen.
  *
  * Purpose: whole-stage codegen fuses every operator between two stage
  * boundaries into a single generated `processNext()` method, and a
  * projection battery the size of i20_k_pattern's 77 candlestick rules
  * blows Janino's hard 64 KB per-method limit — the stage then silently
  * falls back to interpreted mode AFTER paying the failed multi-second
  * compile, which is exactly the round-3 bench instability (23.6 s vs
  * 4.9 s on identical input). Planting this wrapper on ONE expression of
  * the oversized projection excludes just that `ProjectExec` from fusion
  * (`CollapseCodegenStages.supportCodegen` rejects operators containing a
  * [[CodegenFallback]]): the projection then compiles standalone via
  * `UnsafeProjection`, whose expression-splitting emits many small
  * JIT-able methods instead of one giant un-JIT-able one. The wrapped
  * expression itself evaluates interpreted — wrap the cheapest column.
  */
case class CodegenBarrier(child: Expression)
    extends UnaryExpression with CodegenFallback {
  // ALSO non-deterministic: `PushDownPredicates` pushes a filter through
  // any all-deterministic projection by substituting projected aliases
  // into the predicate — for i20 that inlined all 77 rule trees into a
  // below-battery Filter (65 KB method, rules evaluated twice). One
  // non-deterministic field in the projection is the supported lever that
  // keeps predicates above it (and CollapseProject away from it).
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodegenBarrierCol {
  /** Column-level wrapper: marks the enclosing projection non-fusable. */
  def barrier(c: Column): Column =
    GraftBridge.column(CodegenBarrier(GraftBridge.expression(c)))

  /** Statically marks a column non-nullable (throws if violated at run
    * time). Codegen then elides every null branch downstream — for a
    * comparison-heavy battery like i20's rules this halves the generated
    * code, which is compile time, not row time, at this projection's
    * row counts. Only wrap columns whose non-nullness a preceding filter
    * actually guarantees.
    */
  def assertNotNull(c: Column): Column =
    GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull(
        GraftBridge.expression(c)))
}
