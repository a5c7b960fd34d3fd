package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine optimizer rule (injected by GraftExtensions): rewrite
  *
  *   Aggregate[g..][count(1), sum(e), min(e), max(e), count(DISTINCT x)]
  *
  * into the Expand-free two-level form
  *
  *   Aggregate[g..][sum(cnt), sum(s), min(m), max(M), count(x)]
  *     Aggregate[g.., x][count(1) AS cnt, sum(e) AS s, min(e) AS m, max(e) AS M]
  *
  * Spark's built-in planning for mixed distinct/non-distinct aggregates
  * goes through Expand, which DUPLICATES the input relation once per
  * distinct group — on an exploded 100 TB token table that is the
  * dominant cost (measured 3× on the corpus term-frequency operator at
  * sf0.1). The two-level form keeps everything partially aggregated
  * before the exchange.
  *
  * Eligibility (correctness first): fires only when all grouping
  * expressions are attributes, EXACTLY one distinct aggregate shape
  * appears — count(DISTINCT a) on a single attribute (it may be referenced
  * from several output columns) — and every other aggregate is an
  * unfiltered non-distinct count(<non-null literal>) / sum / min / max —
  * the functions whose partials re-compose losslessly (sum of per-group
  * sums, min of mins, max of maxes). Aggregates may sit under arbitrary
  * scalar expressions (e.g. sum(x) cast to double): the scalar shell is
  * kept and only the AggregateExpression nodes inside are substituted.
  * count(NULL) is explicitly excluded: it must return 0, not count(*)
  * (round-2 advice). avg is excluded (avg of avgs is wrong — it would
  * need a sum/count split this rule does not do).
  *
  * Semantics preserved: sum(cnt) over per-(g, x) counts reproduces
  * count(1) (null x rows included); sum-of-sums skips all-null inner
  * groups exactly like the flat sum skips null rows; count(x) over the
  * inner groups reproduces count(DISTINCT x). Sum widens decimal types
  * per level, so each recombined aggregate is cast back to its original
  * dataType. Output exprIds are preserved (Alias.withNewChildren keeps
  * them) so parent plans resolve unchanged.
  */
object DistinctAggRewrite extends Rule[LogicalPlan] {

  /** Inner partial function and outer re-combiner for an aggregate whose
    * per-(g, x) partials re-compose losslessly. */
  private def decompose(fn: AggregateFunction): Option[(AggregateFunction, Attribute => AggregateFunction)] =
    fn match {
      // count(NULL) must stay 0 — only non-null literals qualify (advice fix)
      case Count(Seq(Literal(v, _))) if v != null =>
        Some((Count(Seq(Literal(1))), a => Sum(a)))
      case s: Sum => Some((s, a => Sum(a)))
      case m: Min => Some((m, a => Min(a)))
      case m: Max => Some((m, a => Max(a)))
      case _ => None
    }

  private def distinctCountAttr(ae: AggregateExpression): Option[Attribute] = ae match {
    case AggregateExpression(Count(Seq(a: Attribute)), _, true, None, _) => Some(a)
    case _ => None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.nonEmpty && groupingExprs.forall(_.isInstanceOf[Attribute]) =>
      val groupingAttrs = groupingExprs.map(_.asInstanceOf[Attribute])
      val allAggs = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
      val (distincts, plains) = allAggs.partition(_.isDistinct)
      val distinctAttrs = distincts.flatMap(distinctCountAttr).map(_.exprId).distinct
      val eligible =
        distincts.nonEmpty &&
        distincts.forall(distinctCountAttr(_).isDefined) &&
        distinctAttrs.length == 1 &&
        plains.forall(ae => ae.filter.isEmpty && decompose(ae.aggregateFunction).isDefined)
      if (!eligible) agg
      else {
        val distAttr = distincts.flatMap(distinctCountAttr).head
        // inner: group by (g.., x); one partial per plain aggregate instance
        val partials = scala.collection.mutable.LinkedHashMap.empty[AggregateExpression, Alias]
        plains.foreach { ae =>
          if (!partials.contains(ae)) {
            val (innerFn, _) = decompose(ae.aggregateFunction).get
            partials(ae) = Alias(
              AggregateExpression(innerFn, Complete, isDistinct = false),
              s"__graft_p${partials.size}")()
          }
        }
        val inner = Aggregate(
          groupingAttrs :+ distAttr,
          (groupingAttrs :+ distAttr) ++ partials.values,
          child)
        // outer: substitute each AggregateExpression in place; scalar shells
        // and Alias exprIds survive the transform untouched.
        val outerExprs: Seq[NamedExpression] = aggExprs.map { ne =>
          ne.transformUp {
            case ae: AggregateExpression if ae.isDistinct =>
              AggregateExpression(Count(Seq(distAttr)), Complete, isDistinct = false)
            case ae: AggregateExpression =>
              val pAttr = partials(ae).toAttribute
              val (_, outerFnOf) = decompose(ae.aggregateFunction).get
              val recombined =
                AggregateExpression(outerFnOf(pAttr), Complete, isDistinct = false)
              val nullFixed = ae.aggregateFunction match {
                case Count(_) => Coalesce(Seq(recombined, Literal(0L)))
                case _ => recombined
              }
              if (nullFixed.dataType == ae.dataType) nullFixed
              else Cast(nullFixed, ae.dataType, Some(conf.sessionLocalTimeZone))
          }.asInstanceOf[NamedExpression]
        }
        Aggregate(groupingAttrs, outerExprs, inner)
      }
  }
}
