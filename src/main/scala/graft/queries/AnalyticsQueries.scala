package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Td

/** Round-4 surface growth: the six previously-unused query slots
  * (q27-q29, q47-q49) filled with the analytics shapes a warehouse user
  * reaches for daily and the round-3 inventory lacked —
  * keep-latest window dedup, CUBE (completing the ROLLUP q72 /
  * GROUPING SETS q89 family), ntile quantile bucketing, the TPC-H-style
  * 5-table star join, fixed-width histograms, and a Markov transition
  * matrix over event sequences.
  *
  * All outputs follow the round-4 column-type policy (QuerySpec):
  * integer / string / decimal-routed doubles only.
  */
object AnalyticsQueries {

  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(

    // ---- keep-latest window dedup --------------------------------------
    // THE most common warehouse dedup: one surviving row per key, chosen
    // by recency. row_number (not rank — ties must not survive) over a
    // (ts, event_id) ordering that is total, so the survivor is
    // deterministic. Scale: one shuffle on user_id; Spark plans the
    // rn=1 filter as WindowGroupLimit, so each partition keeps only its
    // top row per key instead of materializing the full window.
    QuerySpec("q27_window_dedup", { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      Td.load(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    },
      Some("""SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) t
              WHERE rn = 1 ORDER BY user_id""")),

    // ---- CUBE: all grouping combinations -------------------------------
    // Completes the multi-dimensional agg family (ROLLUP q72, GROUPING
    // SETS q89): 2^2 grouping sets in ONE scan via Expand(4) + a single
    // hash agg. grouping() flags disambiguate subtotal NULLs from data
    // NULLs; ordering pins them (Spark default NULLS FIRST asc, oracle
    // states it explicitly).
    QuerySpec("q28_cube",
      (s, d) => Td.load(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
                     CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- ntile quantile bucketing --------------------------------------
    // Feature-engineering staple: users binned into spend quartiles.
    // NOT via `ntile(4).over(Window.orderBy(...))` — an unpartitioned
    // window funnels every user through ONE reducer for a global sort, a
    // scale-killer at billions of users (the round-4 verdict's last
    // perf-weak §2 plan). Instead ExactPercentile.ntileBuckets fetches
    // the three quartile-boundary (total, user_id) tuples by
    // range-partitioned selection and buckets with a pure-projection
    // CASE — bit-identical bins (the (total, user_id) ordering is total,
    // so rank<=k ≡ tuple<=k-th order statistic), zero global-sort
    // windows (PlanProofSpec pins the plan). Per-user totals go through
    // the DECIMAL(18,4) route so the double sums are order-insensitive;
    // totals is cached because the boundary selection and the final
    // aggregate both consume it.
    QuerySpec("q29_ntile_quartiles", { (s, d) =>
      val totals = Td.load(s, d, "events")
        .groupBy("user_id").agg(dsum(col("value")).as("total"))
        .cache()
      graft.operators.ExactPercentile
        .ntileBuckets(totals, 4, "total", "user_id", "quartile")
        .groupBy("quartile")
        .agg(count(lit(1)).as("n_users"),
          min("total").as("min_total"), max("total").as("max_total"))
        .orderBy("quartile")
    },
      Some("""WITH totals AS (
                SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
                FROM events GROUP BY 1),
              q AS (
                SELECT user_id, total,
                       CAST(ntile(4) OVER (ORDER BY total, user_id) AS INTEGER) AS quartile
                FROM totals)
              SELECT quartile, count(*) AS n_users,
                     min(total) AS min_total, max(total) AS max_total
              FROM q GROUP BY 1 ORDER BY quartile""")),

    // ---- 5-table star join ---------------------------------------------
    // The canonical TPC-H shape: fact⋈fact (lineitem⋈orders, the one
    // real shuffle, co-keyed on orderkey) then three dimension hops
    // (customer→nation→region) that AQE broadcasts — one exchange total
    // at any scale. No hints: Catalyst reorders, AQE sizes the dims.
    QuerySpec("q47_star_join",
      (s, d) => Td.load(s, d, "lineitem")
        .join(Td.load(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Td.load(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Td.load(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(Td.load(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy("r_name", "o_year"),
      Some("""SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
                     count(*) AS n_items,
                     CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1, 2 ORDER BY r_name, o_year""")),

    // ---- fixed-width histogram -----------------------------------------
    // Distribution-at-a-glance over a fact column: integer bucket ids
    // from a single floor division (IEEE-identical in both engines),
    // capped into a terminal overflow bucket. Pure map-side projection +
    // one tiny agg — the shape survives any scale.
    QuerySpec("q48_histogram",
      (s, d) => Td.load(s, d, "lineitem")
        .selectExpr("CAST(least(19, floor(l_extendedprice / 5000.0)) AS INT) AS bucket")
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("bucket_lo", col("bucket") * 5000)
        .select("bucket", "bucket_lo", "cnt")
        .orderBy("bucket"),
      Some("""SELECT bucket, bucket * 5000 AS bucket_lo, count(*) AS cnt FROM (
                SELECT CAST(least(19, floor(l_extendedprice / 5000.0)) AS INTEGER) AS bucket
                FROM lineitem) t
              GROUP BY bucket ORDER BY bucket""")),

    // ---- event-type transition matrix ----------------------------------
    // Sequence mining's first question: what follows what? lead() over
    // each user's (ts, event_id)-ordered stream — total order, so the
    // successor is deterministic — then a |types|²-sized count matrix.
    // Scale: one shuffle on user_id for the window; the aggregate is
    // vocabulary-sized.
    QuerySpec("q49_transitions", { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Td.load(s, d, "events")
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter("next_type IS NOT NULL")
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "next_type")
    },
      Some("""SELECT event_type, next_type, count(*) AS n FROM (
                SELECT event_type,
                       lead(event_type, 1) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS next_type
                FROM events) t
              WHERE next_type IS NOT NULL
              GROUP BY 1, 2 ORDER BY event_type, next_type""")),

    // ---- PageRank over the customer→supplier link graph -----------------
    // The web-graph quality signal a Common-Crawl-style pipeline ranks
    // domains with before sampling, run on the natural bipartite graph
    // orders⋈lineitem induces (customer buys-from supplier; suppliers
    // offset into a disjoint id space, and all dangling — the dangling
    // term carries most of the mass back, so it is exercised hard).
    // Six supersteps ENTIRELY IN INTEGER RANK UNITS (floor division,
    // scale 1e15): bit-identical under any partitioning or engine, so
    // the DuckDB oracle replays the same unrolled iterations and must
    // hash-match exactly — no float tolerance anywhere. Top-100 by
    // (rank, node): a total order.
    QuerySpec("q163_pagerank", { (s, d) =>
      val orders = Td.load(s, d, "orders").select("o_orderkey", "o_custkey")
      val li = Td.load(s, d, "lineitem").select("l_orderkey", "l_suppkey")
      val edges = orders
        .join(li, orders("o_orderkey") === li("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(10000000L)).as("dst"))
      graft.operators.PageRank.run(edges, "src", "dst", iterations = 6)
        .orderBy(desc("rank_units"), col("node"))
        .limit(100)
    },
      Some(graft.operators.PageRank.oracleSql(
        """SELECT o_custkey AS src, l_suppkey + 10000000 AS dst
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey""",
        iterations = 6) +
        "\nORDER BY rank_units DESC, node LIMIT 100"))
  )
}
