package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first query any pipeline runs against a new
  * table: per column, its type, null count, distinct count, and
  * min/max rendered as strings.
  *
  * Shape: one scan feeding a single global aggregation, then a
  * driver-side unpivot of the 1-row result into (column, metric) rows
  * (the unpivot touches only aggregated scalars, never data). The scale
  * caveat is the EXACT countDistinct per column: Spark plans the mixed
  * distinct aggregates through Expand, duplicating each input row
  * (cols+1)× before partial aggregation — kept exact in [[profile]]
  * because it is oracle-compared; at 100 TB use [[profileApprox]],
  * which removes both the Expand and the distinct shuffle
  * (constant-size HLL partials; PlanProofSpec asserts the approx plan
  * is Expand-free).
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

  /** Exact profile (oracle-comparable; Expand-shaped — see class doc). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    unpivot(df, cols, statsAgg(df, cols, approx = false))

  /** The 100 TB profile: identical output shape to [[profile]] but
    * `n_distinct` is `approx_count_distinct` (HyperLogLog++, default rsd
    * 5%). Because no aggregate is DISTINCT, Catalyst plans ONE pass with
    * no Expand and no distinct shuffle — each column contributes a
    * constant-size HLL sketch to the partial aggregation, so the profile
    * costs one scan regardless of column count. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    unpivot(df, cols, statsAgg(df, cols, approx = true, rsd))
}
