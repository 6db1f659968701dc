package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.DataType

/** Identity wrapper that hides its child from Catalyst's constraint
  * machinery by reporting itself NON-deterministic (alias constraints —
  * `EqualNullSafe(attr, expr)` — are only derived from deterministic
  * project aliases; see `QueryPlan.getAllValidConstraints`).
  *
  * Why it exists: a higher-order function (`transform`/`aggregate`/
  * `filter`, i.e. anything carrying a `LambdaFunction`) inside a
  * project alias poisons `InferFiltersFromConstraints` — the alias
  * constraint survives `localCheckpoint` via
  * `LogicalRDD.originConstraints`, and a later rename + equi-join
  * substitutes the OTHER join side's attribute into the lambda body
  * and materializes the result as a one-sided filter that fails
  * attribute binding at execution ([INTERNAL_ERROR_ATTRIBUTE_NOT_
  * FOUND] — found by the round-14 graph-scale probe on
  * [[graft.operators.HyperBall.effectiveDiameter]], reproduced in
  * HyperBallSpec). Wrapping the alias value in this barrier removes
  * the constraint at its source; evaluation and codegen are exact
  * pass-throughs.
  *
  * Trade-offs of the nondeterministic marking, acceptable at the two
  * call sites (HyperBall's seed vector and per-row estimator): no
  * filter/projection collapse THROUGH the wrapped alias (nothing ever
  * needs to push past those projects) and no constant folding of the
  * wrapped subtree (both wrap per-row column references, never
  * foldable). Use for expressions that (a) contain a LambdaFunction
  * and (b) land in frames that get checkpointed and re-joined.
  */
case class ConstraintBarrier(child: Expression) extends UnaryExpression {
  override def prettyName: String = "constraint_barrier"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: a nondeterministic alias yields no constraint
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): ConstraintBarrier =
    copy(child = newChild)
}

object ConstraintBarrier {
  /** Column API: `barrier(e)` — e, invisible to constraint inference. */
  def barrier(e: Column): Column =
    Shim.column(ConstraintBarrier(Shim.expression(e)))
}
