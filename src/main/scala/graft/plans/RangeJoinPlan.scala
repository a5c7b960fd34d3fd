package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Logical node for the broadcast interval-index range join — the
  * engine's tier-(c) Catalyst extension (custom LogicalPlan + Strategy +
  * SparkPlan via SparkSessionExtensions), used where composition of
  * built-in operators genuinely can't express the efficient plan:
  * matching a huge point relation into a small interval relation WITHOUT
  * either a bucket-explosion factor to tune
  * ([[graft.operators.TemporalJoin.rangeJoin]]) or the
  * BroadcastNestedLoopJoin Spark plans for a BETWEEN theta join (which
  * re-scans every interval per point).
  *
  * Semantics: one output row per (point, interval) with
  * `lo <= point < hi`, output = left columns ++ right columns.
  */
final case class RangeJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy (injected by GraftExtensions): plans
  * [[RangeJoinPlan]] as [[RangeJoinExec]]. */
object RangeJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, p, lo, hi) =>
      RangeJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast interval-index range join.
  *
  * The (small) interval side is collected once, sorted by `lo`, and
  * broadcast together with the PREFIX-MAX of `hi`; each point row
  * binary-searches the sorted lows and scans back while the prefix-max
  * hi still exceeds the point — an EXACT stopping rule (if every
  * remaining interval ends at or before p, none can contain p), with no
  * epsilon or max-length arithmetic that could drop matches for
  * large-magnitude bounds. O(log n + k) per point instead of O(n) for a
  * nested loop. The point side streams through unchanged:
  * `outputPartitioning` is the left child's, so NO exchange is
  * introduced on the big side (the plan proof asserts this).
  *
  * Numeric contract: bounds and points are compared in DOUBLE precision
  * (integers/decimals beyond 2^53 lose exactness — same contract as the
  * bucket-based [[graft.operators.TemporalJoin.rangeJoin]], whose
  * bucket math is double too). This is deliberately the broadcast-sized
  * flavor: a huge interval side should use the shuffle-based bucket join
  * instead.
  */
final case class RangeJoinExec(
    left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)

  /** Numeric eval → double; Decimal is NOT a java.lang.Number. */
  private def toD(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val loEval = BindReferences.bindReference(lo, right.output)
    val hiEval = BindReferences.bindReference(hi, right.output)
    val triples = right.executeCollect().flatMap { r =>
      val lv = loEval.eval(r)
      val hv = hiEval.eval(r)
      if (lv == null || hv == null) None
      else {
        val l = toD(lv)
        val h = toD(hv)
        // inverted intervals match nothing (same contract as rangeJoin)
        if (h >= l) Some((l, h, r.copy())) else None
      }
    }.sortBy(_._1)
    val lows = triples.map(_._1)
    val highs = triples.map(_._2)
    val rows = triples.map(_._3)
    // prefixMaxHi(i) = max(highs(0..i)) — the exact scan-back stopper
    val prefixMaxHi = new Array[Double](highs.length)
    var pi = 0
    while (pi < highs.length) {
      prefixMaxHi(pi) = if (pi == 0) highs(0) else math.max(prefixMaxHi(pi - 1), highs(pi))
      pi += 1
    }
    val bc = sparkContext.broadcast((lows, highs, rows, prefixMaxHi))

    val leftOutput = left.output
    val rightOutput = right.output
    val pointExpr = point
    left.execute().mapPartitions({ iter =>
      val (los, his, irows, maxHi) = bc.value
      val pEval = BindReferences.bindReference(pointExpr, leftOutput)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(leftOutput ++ rightOutput, leftOutput ++ rightOutput)
      iter.flatMap { lrow =>
        val pv = pEval.eval(lrow)
        if (pv == null || los.length == 0) Iterator.empty
        else {
          val p = toD(pv)
          // first index with lo > p
          var a = 0; var b = los.length
          while (a < b) {
            val m = (a + b) >>> 1
            if (los(m) <= p) a = m + 1 else b = m
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
          var j = a - 1
          // exact stop: once max(hi) of the remaining prefix is <= p, no
          // earlier interval can contain p
          while (j >= 0 && maxHi(j) > p) {
            if (p < his(j)) { // los(j) <= p by construction of a
              out += proj(joined(lrow, irows(j))).copy()
            }
            j -= 1
          }
          out.reverseIterator // ascending lo order: deterministic output
        }
      }
    }, preservesPartitioning = true)
  }
}
