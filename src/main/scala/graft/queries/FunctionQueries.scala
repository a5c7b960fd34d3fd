package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Td

/** Scalar-function surface (SURVEY.md §2.8): regexp_extract / concat /
  * format_number / coalesce strings, date_format / unix_timestamp
  * datetimes, and the wide→long unpivot (§2.7 U1 equivalent via stack).
  * All pure projections — they stay inside whole-stage codegen and add no
  * shuffle beyond the final order.
  */
object FunctionQueries {
  import org.apache.spark.sql.Column
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(

    // regexp_extract (the reference's file_name extraction shape,
    // diabetes_etl_pipeline.py:73), concat, coalesce, format_number.
    QuerySpec("q24_string_funcs",
      (s, d) => Td.load(s, d, "part")
        .select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          coalesce(nullif(col("p_type"), lit("")), lit("unknown")).as("type_nn"),
          format_number(col("p_size") / 7.0, 3).as("size_ratio"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     regexp_extract(p_name, '^(\w+)', 1) AS first_word,
                     p_brand || '#' || p_type AS brand_type,
                     coalesce(nullif(p_type, ''), 'unknown') AS type_nn,
                     printf('%.3f', p_size / CAST(7.0 AS DOUBLE)) AS size_ratio
              FROM part ORDER BY p_partkey""")),

    // date_format + unix_timestamp (diabetes_etl_pipeline.py:558,:567).
    QuerySpec("q25_date_funcs",
      (s, d) => Td.load(s, d, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour_bucket"))
        .agg(
          count(lit(1)).as("cnt"),
          max(unix_timestamp(col("ts"))).as("max_epoch"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("hour_bucket"),
      Some("""SELECT strftime(ts, '%Y-%m-%d %H') AS hour_bucket, count(*) AS cnt,
                     CAST(max(epoch(date_trunc('second', ts))) AS BIGINT) AS max_epoch,
                     count(DISTINCT user_id) AS n_users
              FROM events GROUP BY 1 ORDER BY hour_bucket""")),

    // Wide→long unpivot of a 1-row global aggregate (executive-summary
    // long format, diabetes_etl_pipeline.py:375-387).
    QuerySpec("q26_unpivot",
      (s, d) => Td.load(s, d, "lineitem")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount")).as("sum_disc"))
        .selectExpr("""stack(3,
            'sum_qty', sum_qty,
            'sum_price', sum_price,
            'sum_disc', sum_disc) AS (metric, value)""")
        .orderBy("metric"),
      Some("""SELECT metric, value FROM (
                SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
                       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc
                FROM lineitem)
              UNPIVOT (value FOR metric IN (sum_qty, sum_price, sum_disc))
              ORDER BY metric""")),

    // A13 engine path: percentile_approx (a mergeable GK sketch — constant
    // executor memory, the ONLY median that survives 100 TB) next to the
    // exact percentile (TypedImperativeAggregate that buffers every value
    // on one reducer — correct, but a scale-killer; oracle-compare only).
    // The oracle pins the exact value and asserts the sketch lands within
    // 1% of it — the sketch's internal result is not bit-portable across
    // engines, its error bound is the contract.
    QuerySpec("q62_percentile_approx",
      (s, d) => Td.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          (floor(expr("percentile(l_extendedprice, 0.5)") * 100.0 + 0.5) / 100.0).as("exact_median"),
          expr("""abs(percentile_approx(l_extendedprice, 0.5) -
                      percentile(l_extendedprice, 0.5))
                  / percentile(l_extendedprice, 0.5) < 0.01""").as("sketch_within_1pct"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     floor(quantile_cont(l_extendedprice, 0.5) * CAST(100.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST(100.0 AS DOUBLE) AS exact_median,
                     true AS sketch_within_1pct
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- ROLLUP: hierarchical subtotals ---------------------------------
    // Beyond the reference's flat GROUP BYs — the standard dashboard
    // subtotal shape. Spark plans one Expand (3 grouping sets) + a single
    // hash agg; grouping() columns disambiguate subtotal NULLs from data
    // NULLs. Spark sorts NULLS FIRST ascending by default; the oracle
    // pins the same placement explicitly.
    QuerySpec("q72_rollup",
      (s, d) => Td.load(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
                     CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- PIVOT: wide-format reshape -------------------------------------
    // Values pinned explicitly (pivot("...", Seq(...))) so the output
    // schema is static — the scalable form (unpinned pivot needs a
    // driver-side distinct pass over the pivot column first). The oracle
    // states the equivalent conditional aggregation.
    QuerySpec("q73_pivot",
      (s, d) => Td.load(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
                     count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- DYNAMIC pivot: values discovered at plan time ------------------
    // Reshape.pivotDynamic runs one driver-side distinct over the pivot
    // column (capped, sorted → deterministic schema) then a static pivot.
    // The oracle pins the values the testdata is known to contain — the
    // point of the engine path is that it discovers the same set.
    QuerySpec("q84_pivot_dynamic",
      (s, d) => graft.operators.Reshape.pivotDynamic(
          Td.load(s, d, "lineitem"), Seq("l_linestatus"), "l_returnflag",
          count(lit(1)))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
                     count(CASE WHEN l_returnflag = 'A' THEN 1 END) AS "A",
                     count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS "N",
                     count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS "R"
              FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ---- JSON column extraction (events.props) --------------------------
    // Both the path-string API (get_json_object) and the typed parser
    // (from_json with an explicit schema — the scalable form: schema-on-
    // read, no inference pass) over the events stream's JSON payload.
    QuerySpec("q77_json_extract",
      (s, d) => Td.load(s, d, "events")
        .selectExpr("event_type",
          "CAST(get_json_object(props, '$.k') AS INT) AS k_path",
          "from_json(props, 'k INT').k AS k_typed")
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("k_path")).as("sum_k"),
          min(col("k_typed")).as("min_k"),
          max(col("k_typed")).as("max_k"),
          sum(when(col("k_path") === col("k_typed"), 0).otherwise(1)).as("parser_disagreements"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS cnt,
                     CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
                     min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
                     max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
                     CAST(0 AS BIGINT) AS parser_disagreements
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- ranking-window family ------------------------------------------
    // rank / dense_rank / ntile / percent_rank / cume_dist / lead / lag in
    // one pass over per-customer order history. The window ordering
    // includes the unique o_orderkey, so every ratio is a deterministic
    // ratio of ints (cross-engine safe) and lead/lag neighbors are fixed.
    QuerySpec("q78_window_family", { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      Td.load(s, d, "orders").filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy("o_custkey", "rk")
    },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(rank() OVER w AS INTEGER) AS rk,
                     CAST(dense_rank() OVER w AS INTEGER) AS drk,
                     CAST(ntile(4) OVER w AS INTEGER) AS quartile,
                     round(percent_rank() OVER w, 6) AS pct_rank,
                     round(cume_dist() OVER w, 6) AS cum_dist,
                     lag(o_totalprice, 1) OVER w AS prev_price,
                     lead(o_totalprice, 1) OVER w AS next_price
              FROM orders WHERE o_custkey < 50
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, rk""")),

    // ---- datetime-function breadth --------------------------------------
    // year/month/day extraction, Monday-start week truncation, month end,
    // day-of-week (aligned: Spark is 1=Sunday, DuckDB dow is 0=Sunday),
    // date arithmetic and day differences against a fixed anchor.
    QuerySpec("q79_date_functions",
      (s, d) => Td.load(s, d, "orders").filter(col("o_custkey") < 20)
        .selectExpr(
          "o_orderkey",
          "year(o_orderdate) AS yr",
          "month(o_orderdate) AS mo",
          "day(o_orderdate) AS dom",
          "date_trunc('week', o_orderdate) AS week_start",
          "last_day(CAST(o_orderdate AS DATE)) AS month_end",
          "dayofweek(o_orderdate) AS dow",
          "date_add(CAST(o_orderdate AS DATE), 30) AS plus_30d",
          "datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS days_since_anchor")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
                     CAST(year(o_orderdate) AS INTEGER) AS yr,
                     CAST(month(o_orderdate) AS INTEGER) AS mo,
                     CAST(day(o_orderdate) AS INTEGER) AS dom,
                     date_trunc('week', o_orderdate) AS week_start,
                     last_day(CAST(o_orderdate AS DATE)) AS month_end,
                     CAST(date_part('dow', o_orderdate) + 1 AS INTEGER) AS dow,
                     CAST(o_orderdate AS DATE) + 30 AS plus_30d,
                     CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_anchor
              FROM orders WHERE o_custkey < 20 ORDER BY o_orderkey"""))
  )
}
