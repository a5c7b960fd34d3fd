package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the first query any pipeline runs against a new
  * table: per column, its type, null count, exact distinct count, and
  * min/max rendered as strings.
  *
  * Shape: ONE pass over the data — every per-column aggregate lives in a
  * single global aggregation (Spark computes them in one scan with
  * map-side partials), then a driver-side unpivot of the 1-row result
  * into (column, metric) rows. The unpivot touches only the aggregated
  * scalars, never data. Exact countDistinct is the scale caveat: for a
  * 100 TB profile swap in approx_count_distinct — kept exact here so the
  * result is oracle-comparable.
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
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
