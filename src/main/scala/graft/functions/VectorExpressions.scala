package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.graftshim.Shim.AbstractDataType

/** Native Catalyst expression for the dense-vector dot product.
  *
  * Why a custom Expression (SURVEY §7.3 preference order): the built-in
  * routes both lose on 64-dim vectors —
  *  - `aggregate`/`zip_with` higher-order lambdas are interpreted
  *    (no codegen for HOFs);
  *  - unrolling 64 `element_at` products into one Add tree blows past
  *    the JVM JIT's method-size limit, so the generated method runs in
  *    the bytecode interpreter (~30× slower).
  * `doGenCode` emits a plain `for` LOOP over the two ArrayData buffers —
  * small generated method, JIT-compiled, stays inside whole-stage
  * codegen so Catalyst keeps pruning/pushdown around it.
  *
  * Summation is the sequential left-to-right fold — the same FP order
  * the DuckDB oracle states.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override val nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[VectorDot]]. */
  def vectorDot(a: Column, b: Column): Column =
    Shim.column(VectorDot(Shim.expression(a), Shim.expression(b)))
}
