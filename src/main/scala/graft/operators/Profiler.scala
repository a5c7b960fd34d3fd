package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first query any pipeline runs against a new
  * table: per column, its type, null count, distinct count, and
  * min/max rendered as strings.
  *
  * Two shapes, both Expand-free:
  *  - [[profile]] (exact): one aggregation branch PER COLUMN, unioned.
  *    Catalyst only reaches for Expand with >= 2 distinct-aggregate
  *    groups in one Aggregate (PlanProofSpec q66 proves the single-
  *    distinct case plans two-phase); a branch holds exactly one
  *    `countDistinct`, so each branch is a column-pruned scan of JUST
  *    its column feeding a partial-aggregated distinct — total I/O
  *    equals the profiled columns, with no (cols+1)× row duplication
  *    and no driver-side unpivot (the union IS the unpivot). The
  *    packed one-Aggregate spelling ([[statsAgg]] approx = false) is
  *    kept only as the measurable counterexample.
  *  - [[profileApprox]] (the 100 TB default): ONE scan, constant-size
  *    HLL partials, no distinct shuffle at all — when the table is too
  *    large to re-scan per column and 5% distinct error is acceptable.
  */
object Profiler {

  /** The 1-row stats aggregation both variants collect. Exposed so the
    * physical plan is assertable (PlanProofSpec): approx = false plans
    * through Expand (exact distinct), approx = true plans one
    * Expand-free pass of HLL sketches. */
  def statsAgg(df: DataFrame, cols: Seq[String], approx: Boolean,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approx) approx_count_distinct(col(c), rsd) else countDistinct(col(c)))
          .as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  private def unpivot(df: DataFrame, cols: Seq[String], stats: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = stats.head()
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    cols.map { c =>
      (c, types(c),
        row.getAs[Long](s"__n_$c"),
        row.getAs[Long](s"__nulls_$c"),
        row.getAs[Long](s"__distinct_$c"),
        Option(row.getAs[String](s"__min_$c")),
        Option(row.getAs[String](s"__max_$c")))
    }.toDF("column", "dtype", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }

  /** Exact profile: per-column aggregation branches, unioned (see class
    * doc — Expand-free, each branch scans only its own column). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column"), lit(types(c)).as("dtype"),
          col("n_rows"), col("n_nulls"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }.reduce(_ unionAll _)
  }

  /** The 100 TB profile: identical output shape to [[profile]] but
    * `n_distinct` is `approx_count_distinct` (HyperLogLog++, default rsd
    * 5%). Because no aggregate is DISTINCT, Catalyst plans ONE pass with
    * no Expand and no distinct shuffle — each column contributes a
    * constant-size HLL sketch to the partial aggregation, so the profile
    * costs one scan regardless of column count. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    unpivot(df, cols, statsAgg(df, cols, approx = true, rsd))
}
