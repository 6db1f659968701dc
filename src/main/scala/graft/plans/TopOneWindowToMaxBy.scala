package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: collapse the TOP-1-PER-GROUP window idiom
  *
  *   Filter(rn = 1, Window(rn ← row_number() OVER (PARTITION BY p ORDER BY o)))
  *
  * into a hash AGGREGATE — `max_by(struct(*), o)` for descending order,
  * `min_by` for ascending (SURVEY §4's "latest-per-node window →
  * max_by" nicety, as an actual Catalyst rule instead of a calling
  * convention). The window form shuffles and SORTS every row of every
  * group; the aggregate form partial-aggregates map-side and never
  * sorts — at 100 TB that is the difference between a full
  * shuffle+sort of the findings table and a combiner-style shuffle of
  * one surviving row per (group, map task).
  *
  * Fires only on the airtight shape:
  *  - the Window computes EXACTLY one expression: row_number() with
  *    the default running frame;
  *  - the filter is `rn = 1` / `1 = rn` / `rn <= 1` on that column;
  *  - ORDER BY keys are all the same direction and NON-NULLABLE
  *    (row_number places null keys by null-ordering; max_by/min_by
  *    SKIP null keys — rewriting those would change which row wins);
  *  - under ties row_number keeps one arbitrary row and so does
  *    max_by: both forms are deterministic exactly when the order key
  *    is total, so the rewrite never changes a well-defined result.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (injectOptimizerRule) or per-session through
  * `spark.experimental.extraOptimizations`.
  */
object TopOneWindowToMaxBy extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w) match {
        case Some(agg) => Project(projList, agg)
        case None => f
      }
  }

  /** The filtered attribute if `cond` pins it to the first row. */
  private def rnOne(cond: Expression): Option[Attribute] = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some(a)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => Some(a)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => Some(a)
    case _ => None
  }

  private def frameOk(spec: WindowSpecDefinition): Boolean =
    spec.frameSpecification match {
      case UnspecifiedFrame => true
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        true
      case _ => false
    }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] =
    rnOne(cond).flatMap { rnAttr =>
      w.windowExpressions match {
        case Seq(rnAlias @ Alias(
            WindowExpression(_: RowNumber, spec: WindowSpecDefinition), _))
            if rnAlias.exprId == rnAttr.exprId && frameOk(spec) &&
              // global (empty PARTITION BY) top-1 must NOT rewrite: a
              // global Aggregate over an empty relation returns one
              // all-null row, where the window+filter returns zero rows
              w.partitionSpec.nonEmpty &&
              w.orderSpec.nonEmpty &&
              w.orderSpec.forall(k => !k.child.nullable) &&
              (w.orderSpec.forall(_.direction == Ascending) ||
                w.orderSpec.forall(_.direction == Descending)) =>
          val childOut = w.child.output
          val value = CreateStruct(childOut)
          val ordKey =
            if (w.orderSpec.length == 1) w.orderSpec.head.child
            else CreateStruct(w.orderSpec.map(_.child))
          val aggFn =
            if (w.orderSpec.head.direction == Ascending) MinBy(value, ordKey)
            else MaxBy(value, ordKey)
          val aggAlias = Alias(
            AggregateExpression(aggFn, Complete, isDistinct = false),
            "__top1")()
          val agg = Aggregate(w.partitionSpec, Seq(aggAlias), w.child)
          // restore the original attribute ids (parents keep resolving)
          // and pin the row_number column to its only surviving value, 1
          val structRef = aggAlias.toAttribute
          val restored = childOut.zipWithIndex.map { case (a, i) =>
            Alias(GetStructField(structRef, i, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          }
          val rnRestored = Alias(Literal(1, IntegerType), rnAlias.name)(
            exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
          Some(Project(restored :+ rnRestored, agg))
        case _ => None
      }
    }
}
