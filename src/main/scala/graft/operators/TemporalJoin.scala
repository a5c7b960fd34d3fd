package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: AS-OF join and
  * interval/range join. Both are implemented in their scale-safe shapes —
  * one keyed shuffle each, never a theta-join cross product.
  */
object TemporalJoin {

  /** AS-OF join: attach to every left row the latest right row for the
    * same key with `rightTs <= leftTs` (inclusive, like DuckDB/kdb asof).
    * Unmatched left rows keep NULL right values (left-outer semantics).
    *
    * Implementation is the UNION + running-`last` form of sort-merge
    * as-of: both sides go through ONE hash exchange on `keyCol` and one
    * per-partition sort on (ts, side); a running `last(ignoreNulls)`
    * window carries the most recent right values forward into each left
    * row. No range predicate ever reaches a join — at 100 TB this is a
    * shuffle the same size as the inputs, where the naive
    * `l.ts >= r.ts` theta join is a per-key cross product. Right rows
    * sort BEFORE left rows at equal timestamps (side 0 < 1), which is
    * what makes the join inclusive.
    *
    * Determinism contract: callers must ensure `right` has at most one
    * row per (key, ts) — pre-aggregate if needed (multiple right rows at
    * the same instant have no defined winner in any as-of engine).
    *
    * Output: every left column, then each requested right value column as
    * `asof_<name>`, plus `asof_ts` (the matched right timestamp).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    val carried = rightTs +: valueCols
    // The right row's state travels as ONE nullable struct: the running
    // `last(ignoreNulls)` then picks whole rows atomically, so a right row
    // whose VALUE is legitimately NULL still wins as a unit — per-column
    // carry would tear the row, pairing that NULL with a stale older value.
    val stateType = StructType(carried.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(
        (Seq(col(keyCol), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == keyCol).map(col) :+
          lit(null).cast(stateType).as("__rstate")): _*)
    val r2 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(
        (Seq(col(keyCol), col("__ts"), col("__side")) ++
          leftCols.filterNot(_ == keyCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(carried.map(col): _*).as("__rstate")): _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outNames = ("asof_ts" +: valueCols.map(c => s"asof_$c"))
    l2.unionAll(r2)
      .withColumn("__state", last(col("__rstate"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        (Seq(col(keyCol)) ++ leftCols.filterNot(_ == keyCol).map(col) ++
          carried.zip(outNames).map { case (c, out) =>
            col("__state").getField(c).as(out)
          }): _*)
  }

  /** Range (interval) join: match each point row to every interval row
    * with `lo <= point < hi`.
    *
    * Implementation: BUCKET EXPANSION — intervals explode into the fixed-
    * width buckets they overlap, points map to their single bucket, and
    * the match becomes a bucket EQUI-join plus an exact range filter.
    * Each interval produces ~(hi-lo)/bucketWidth rows, so pick
    * `bucketWidth` near the typical interval length; the join itself
    * hash-partitions on the bucket key like any equi-join. The naive
    * `BETWEEN` theta join Spark plans as BroadcastNestedLoopJoin — fine
    * for a broadcast-able interval table, quadratic otherwise; this shape
    * stays shuffle-sized at any scale. A point falls in exactly one
    * bucket, so no post-join dedup is needed.
    */
  /** Range join through the engine's CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.RangeJoinExec]], planned by the injected
    * RangeJoinStrategy): the interval side is collected, sorted, and
    * broadcast as a binary-searchable index — no bucket width to tune,
    * O(log n + k) probes per point, and zero exchange on the point side.
    * Use when the interval table is broadcast-sized; otherwise use
    * [[rangeJoin]] (shuffle-based bucket join). Same semantics:
    * `lo <= point < hi`, inverted intervals match nothing. Requires
    * `points` and `intervals` to be distinct DataFrames (distinct
    * attribute ids). */
  def rangeJoinIndexed(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String): DataFrame = {
    val lplan = points.queryExecution.analyzed
    val rplan = intervals.queryExecution.analyzed
    // fail fast instead of silently mis-binding: shared lineage gives the
    // two sides overlapping attribute ids
    require(lplan.outputSet.intersect(rplan.outputSet).isEmpty,
      "points and intervals must not share lineage (duplicate attribute ids); " +
        "alias/copy one side first")
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) = {
      val a = plan.output.find(_.name == name)
        .getOrElse(sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
      require(a.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"$name must be numeric, got ${a.dataType.simpleString}")
      a
    }
    val plan = graft.plans.RangeJoinPlan(
      lplan, rplan, attr(lplan, pointCol), attr(rplan, loCol), attr(rplan, hiCol))
    org.apache.spark.sql.GraftSqlShim.ofRows(points.sparkSession, plan)
  }

  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // Inverted intervals (hi < lo) match nothing under the theta-join
    // semantics — filter them BEFORE the explode: Spark's sequence()
    // counts DOWN when start > stop, so one corrupt interval would
    // otherwise build a huge descending bucket array instead of no rows.
    val valid = intervals.where(col(hiCol) >= col(loCol))
    val iv = valid.withColumn("__bucket",
      explode(expr(
        s"sequence(CAST(floor($loCol / $bucketWidth) AS BIGINT), " +
          s"CAST(floor($hiCol / $bucketWidth) AS BIGINT))")))
    val pt = points.withColumn("__bucket",
      expr(s"CAST(floor($pointCol / $bucketWidth) AS BIGINT)"))
    pt.join(iv, "__bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
