package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark-private APIs needed by custom Catalyst
  * expressions (Column↔Expression bridging and the private[sql]
  * AbstractDataType) — the standard pattern for Spark extension
  * libraries: a tiny object inside the org.apache.spark.sql namespace.
  * Everything else in graft stays on public API. */
object Shim {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
