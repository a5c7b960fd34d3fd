package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first query any pipeline runs against a new
  * table: per column, its type, null count, exact distinct count, and
  * min/max rendered as strings.
  *
  * Shape: one scan feeding a single global aggregation, then a
  * driver-side unpivot of the 1-row result into (column, metric) rows
  * (the unpivot touches only aggregated scalars, never data). The scale
  * caveat is the EXACT countDistinct per column: Spark plans the mixed
  * distinct aggregates through Expand, duplicating each input row
  * (cols+1)× before partial aggregation — kept exact here because the
  * profile is oracle-compared; a 100 TB profile should swap in
  * approx_count_distinct, which removes both the Expand and the
  * distinct shuffle (constant-size HLL partials).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__distinct_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
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
}
