package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateArray, Expression,
  GetArrayItem, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Fuse sibling EXACT-percentile aggregates over the same operand into
  * one array-percentage `Percentile` (guide §2.3 — aggregate the shared
  * buffer once, not once per output column).
  *
  * The graft DSL compiles `median`/`quantile` to Spark's exact
  * `percentile` aggregate, whose buffer holds every group value in an
  * OpenHashMap and SORTS it at eval — so a summarize with k quantiles
  * of the same column (the q27/q44 stats shape, and any real
  * p50/p90/p99 report) pays k buffer inserts per row and k sorts per
  * group for what is one multiset. Spark computes
  * `percentile(x, array(p1..pk))` from ONE buffer and one sort, with
  * per-element arithmetic identical to the scalar calls (same
  * `getPercentile` over the same sorted counts), so rewriting scalar
  * siblings into `GetArrayItem(percentile(x, array(..)), i)` is
  * value-preserving bit-for-bit — including empty/all-null groups,
  * where the array aggregate evaluates to NULL and `GetArrayItem`
  * propagates it, exactly the scalar NULL.
  *
  * Scope guards: only non-distinct, unfiltered AggregateExpressions
  * (graft compiles `filter=` as a CASE-wrap of the operand, so the
  * filter is part of the operand key and distinct operands never
  * merge); only foldable scalar DOUBLE percentages; only groups that
  * share child, frequency and direction; only when ≥ 2 distinct
  * percentages exist (identical duplicates are already deduped by
  * PhysicalAggregation). `median` lowers to `percentile(x, 0.5)` in
  * the optimizer's finish-analysis batch, before this rule runs, so
  * median+quantile siblings fuse too. Window percentiles live under
  * Window nodes and are untouched. The rewrite is idempotent: fused
  * aggregates carry array percentages and are no longer candidates. */
object PercentileFusion extends Rule[LogicalPlan] {

  private def scalarP(ae: AggregateExpression): Option[Double] =
    ae.aggregateFunction match {
      case p: Percentile => p.percentageExpression match {
        case Literal(d: Double, DoubleType) => Some(d)
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val cands = agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression
            if !ae.isDistinct && ae.filter.isEmpty &&
              scalarP(ae).isDefined => ae
      })
      val groups = cands.groupBy { ae =>
        val p = ae.aggregateFunction.asInstanceOf[Percentile]
        (p.child.canonicalized, p.frequencyExpression.canonicalized,
          p.reverse, ae.mode)
      }.filter { case (_, aes) => aes.flatMap(scalarP).distinct.size >= 2 }
      if (groups.isEmpty) agg
      else {
        val repl = scala.collection.mutable.HashMap
          .empty[AggregateExpression, Expression]
        groups.values.foreach { aes =>
          val p0 = aes.head.aggregateFunction.asInstanceOf[Percentile]
          val ps = aes.flatMap(scalarP).distinct
          val fused = AggregateExpression(
            Percentile(p0.child,
              CreateArray(ps.map(d => Literal(d, DoubleType))),
              p0.frequencyExpression, 0, 0, p0.reverse),
            aes.head.mode, isDistinct = false)
          aes.foreach { ae =>
            repl(ae) = GetArrayItem(fused,
              Literal(ps.indexOf(scalarP(ae).get)))
          }
        }
        agg.copy(aggregateExpressions = agg.aggregateExpressions.map(ne =>
          ne.transform {
            case ae: AggregateExpression if repl.contains(ae) => repl(ae)
          }.asInstanceOf[NamedExpression]))
      }
  }
}
