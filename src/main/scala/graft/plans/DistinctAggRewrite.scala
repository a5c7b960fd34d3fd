package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine optimizer rule (injected by GraftExtensions): rewrite
  *
  *   Aggregate[g..][count(1), count(DISTINCT x)]
  *
  * into the Expand-free two-level form
  *
  *   Aggregate[g..][sum(cnt), count(x)]
  *     Aggregate[g.., x][count(1) AS cnt]
  *
  * Spark's built-in planning for mixed distinct/non-distinct aggregates
  * goes through Expand, which DUPLICATES the input relation once per
  * distinct group — on an exploded 100 TB token table that is the
  * dominant cost (measured 3× on the corpus term-frequency operator at
  * sf0.1). The two-level form keeps everything partially aggregated
  * before the exchange.
  *
  * Deliberately narrow (correctness first): fires only when every
  * aggregate is an unfiltered Count — any number of count(1)/count(*)
  * plus EXACTLY one count(DISTINCT a) on a single attribute — and all
  * grouping expressions are attributes. Semantics: sum(cnt) over the
  * per-(g, x) counts reproduces count(1) (null x rows included);
  * count(x) over the inner groups reproduces count(DISTINCT x) (null
  * group excluded, like distinct-count's null handling). Output exprIds
  * are preserved so parent plans resolve unchanged.
  */
object DistinctAggRewrite extends Rule[LogicalPlan] {

  private case class Shape(
      distinctAttr: Attribute,
      plainCounts: Seq[(Alias, AggregateExpression)],
      distinctAlias: Alias)

  private def asPlainCount(e: Expression): Option[AggregateExpression] = e match {
    case ae @ AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) => Some(ae)
    case _ => None
  }

  private def asDistinctCount(e: Expression): Option[(AggregateExpression, Attribute)] = e match {
    case ae @ AggregateExpression(Count(Seq(a: Attribute)), _, true, None, _) => Some((ae, a))
    case _ => None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groupingExprs, aggExprs, child, _)
        if groupingExprs.nonEmpty && groupingExprs.forall(_.isInstanceOf[Attribute]) =>
      val groupingAttrs = groupingExprs.map(_.asInstanceOf[Attribute])
      // classify every output expression; bail if anything else appears
      val classified = aggExprs.map {
        case a: Attribute if groupingAttrs.exists(_.exprId == a.exprId) => Left(a)
        case al @ Alias(ae: AggregateExpression, _) =>
          asPlainCount(ae).map(pc => Right(Left((al, pc))))
            .orElse(asDistinctCount(ae).map { case (de, attr) => Right(Right((al, de, attr))) })
            .getOrElse(null)
        case _ => null
      }
      val distincts = classified.collect { case Right(Right(t)) => t }
      if (classified.contains(null) || distincts.length != 1) agg
      else {
        val (distAlias, _, distAttr) = distincts.head
        // inner: group by (g.., x), count(1) AS __cnt
        val cntAlias = Alias(AggregateExpression(
          Count(Seq(Literal(1))), Complete, isDistinct = false), "__graft_cnt")()
        val inner = Aggregate(
          groupingAttrs :+ distAttr,
          (groupingAttrs :+ distAttr :+ cntAlias).map(_.asInstanceOf[NamedExpression]),
          child)
        val cntAttr = cntAlias.toAttribute
        // outer: original exprIds preserved
        val outerExprs: Seq[NamedExpression] = aggExprs.map {
          case a: Attribute => a
          case al @ Alias(ae: AggregateExpression, name) if asPlainCount(ae).isDefined =>
            Alias(
              Coalesce(Seq(
                AggregateExpression(Sum(cntAttr), Complete, isDistinct = false),
                Literal(0L))),
              name)(exprId = al.exprId, qualifier = al.qualifier)
          case al @ Alias(_, name) =>
            Alias(
              AggregateExpression(Count(Seq(distAttr)), Complete, isDistinct = false),
              name)(exprId = al.exprId, qualifier = al.qualifier)
        }
        Aggregate(groupingAttrs, outerExprs, inner)
      }
  }
}
