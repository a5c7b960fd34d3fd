package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Td

/** Scale-pattern operators: shapes that exist specifically because of the
  * 100 TB design constraint.
  */
object ScaleQueries {

  val specs: Seq[QuerySpec] = Seq(

    // ---- salted two-phase aggregation (hot-key skew pattern) ------------
    // A 3-value group key at 100 TB means 3 reducers own the whole
    // shuffle. Salting fans each hot key across 16 sub-keys (deterministic
    // salt — l_orderkey % 16, NOT rand(): rerunnable and oracle-safe),
    // aggregates partially per (key, salt) on 48 reducers, then merges the
    // 48 partials. Decimal sums survive both phases exactly, so the result
    // is identical to the direct group-by (which is what the oracle runs).
    // Spark's map-side partial aggregation already de-skews pure
    // count/sum aggs — the salt phase matters for skewed HIGH-CARDINALITY
    // payloads (collect_set, exact distinct, large state) and is the
    // documented pattern for them.
    QuerySpec("q65_agg_salted",
      (s, d) => Td.load(s, d, "lineitem")
        .groupBy(col("l_returnflag"), (col("l_orderkey") % 16).as("salt"))
        .agg(
          count(lit(1)).as("cnt_part"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).as("qty_part"))
        .groupBy("l_returnflag")
        .agg(
          sum(col("cnt_part")).as("cnt"),
          sum(col("qty_part")).cast(DoubleType).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(*) AS cnt,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
  )
}
