package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Td

/** Joins (SURVEY.md §2.3). The reference itself has zero joins — these
  * cover the parity harness's join surface on the join-shaped testdata
  * (FIXTURES.md §B): inner N-way, left outer, semi, anti, and an explicit
  * broadcast. Scale notes per query:
  *  - dimension tables (region 5, nation 25) are ALWAYS broadcast — no
  *    shuffle of the fact side on their keys;
  *  - customer⋈orders⋈lineitem are key-partitioned shuffle joins; at
  *    100 TB co-locate by bucketing both sides on the join key;
  *  - AQE converts the shuffle join to broadcast at runtime when a side
  *    turns out small — left enabled.
  */
object JoinQueries {
  import org.apache.spark.sql.Column
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  val specs: Seq[QuerySpec] = Seq(

    // 4-way inner join: revenue per nation (TPC-H Q5 shape).
    // nation is broadcast (25 rows); customer⋈orders⋈lineitem shuffle on keys.
    QuerySpec("q19_join_inner_agg",
      (s, d) => {
        val c = Td.load(s, d, "customer"); val n = Td.load(s, d, "nation")
        val o = Td.load(s, d, "orders"); val l = Td.load(s, d, "lineitem")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy("n_name")
          .agg(
            count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(*) AS n_items,
                     CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                          AS DECIMAL(18,4))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Left outer join preserving unmatched dimension rows; count(col)
    // skips nulls so empty nations show 0.
    QuerySpec("q20_join_left",
      (s, d) => {
        val c = Td.load(s, d, "customer"); val n = Td.load(s, d, "nation")
        n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
          .groupBy("n_name")
          .agg(count(col("c_custkey")).as("n_cust"),
            // avg as exact decimal-sum / count: partition-order-independent
            // (plain double avg is not); empty nations → 0.0 not null/div0.
            round(coalesce(dsum(col("c_acctbal")) / count(col("c_custkey")), lit(0.0)), 4).as("avg_bal"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, count(c_custkey) AS n_cust,
                     round(coalesce(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                                    / count(c_custkey), 0.0), 4) AS avg_bal
              FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
              GROUP BY n_name ORDER BY n_name""")),

    // Left-semi join = EXISTS: customers that placed a >300k order.
    QuerySpec("q21_join_semi",
      (s, d) => {
        val c = Td.load(s, d, "customer")
        val big = Td.load(s, d, "orders").filter(col("o_totalprice") > 300000.0)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
              ORDER BY c_custkey""")),

    // Left-anti join = NOT EXISTS: customers with no orders at all.
    QuerySpec("q22_join_anti",
      (s, d) => {
        val c = Td.load(s, d, "customer"); val o = Td.load(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              ORDER BY c_custkey""")),

    // Explicit broadcast of the snowflaked dimension (nation⋈region is
    // itself tiny) against customer — zero shuffle on the probe side.
    QuerySpec("q23_join_broadcast",
      (s, d) => {
        val c = Td.load(s, d, "customer")
        val n = Td.load(s, d, "nation"); val r = Td.load(s, d, "region")
        val dim = n.join(r, n("n_regionkey") === r("r_regionkey"))
          .select(col("n_nationkey"), col("r_name"))
        c.join(broadcast(dim), c("c_nationkey") === dim("n_nationkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_cust"),
            (dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name, count(*) AS n_cust,
                     CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_bal
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name ORDER BY r_name""")),

    // ---- set operations: INTERSECT / EXCEPT (distinct semantics) --------
    // Catalyst rewrites both to left-semi / left-anti joins over distinct
    // inputs — same scale shape as q21/q22, no dedicated machinery.
    QuerySpec("q74_setops",
      (s, d) => {
        val highVal = Td.load(s, d, "orders")
          .filter(col("o_totalprice") > 200000).select("o_custkey")
        val urgent = Td.load(s, d, "orders")
          .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        highVal.intersect(urgent)
          .selectExpr("'both' AS segment", "o_custkey")
          .unionAll(highVal.except(urgent)
            .selectExpr("'high_value_only' AS segment", "o_custkey"))
          .orderBy("segment", "o_custkey")
      },
      Some("""SELECT * FROM (
                SELECT 'both' AS segment, o_custkey FROM
                  (SELECT o_custkey FROM orders WHERE o_totalprice > 200000
                   INTERSECT
                   SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
                UNION ALL
                SELECT 'high_value_only', o_custkey FROM
                  (SELECT o_custkey FROM orders WHERE o_totalprice > 200000
                   EXCEPT
                   SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
              ORDER BY segment, o_custkey""")),

    // ---- correlated EXISTS / NOT EXISTS subqueries ----------------------
    // Exercises RewritePredicateSubquery: both decorrelate into semi/anti
    // joins on o_custkey — the declarative twin of q21/q22's DataFrame
    // forms, here arriving via SQL like the dashboard queries do.
    QuerySpec("q75_exists_subquery",
      (s, d) => {
        Td.registerAll(s, d)
        s.sql("""
          SELECT c_mktsegment,
                 count(*) AS n_customers,
                 count_if(EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_custkey = c.c_custkey
                                    AND o.o_totalprice > 300000)) AS n_with_big_order
          FROM customer c
          GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_customers,
                     CAST(count(CASE WHEN EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_custkey = c.c_custkey
                                       AND o.o_totalprice > 300000)
                           THEN 1 END) AS BIGINT) AS n_with_big_order
              FROM customer c
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- TPC-H Q3 shape: top-k revenue over a date-windowed join --------
    // The missing plan shape in the join family: a GLOBAL top-10 over a
    // grouped 3-way join. orderBy(...).limit(10) plans as
    // TakeOrderedAndProject — per-partition top-10 heaps merged on the
    // driver as 10-row sets — NOT a global sort; at 100 TB that is the
    // only acceptable top-k plan (PlanProofSpec asserts it). Revenue is
    // exact BIGINT cents (per-row double math is cross-engine IEEE-
    // identical, floor+cast makes the SUM order-insensitive integers —
    // the QuerySpec column policy). The tiebreak chain makes LIMIT
    // deterministic.
    QuerySpec("q106_tpch_q3", { (s, d) =>
      val c = Td.load(s, d, "customer"); val o = Td.load(s, d, "orders")
      val l = Td.load(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .where(col("c_mktsegment") === "BUILDING" &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType) &&
          col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(expr(
          "CAST(floor(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * 100.0 + 0.5) AS BIGINT)"))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }, Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
                      CAST(SUM(CAST(floor(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
               FROM lineitem
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               WHERE c_mktsegment = 'BUILDING'
                 AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                 AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
               GROUP BY l_orderkey, o_orderdate, o_orderpriority
               ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
               LIMIT 10""")),

    // ---- TPC-H Q5 shape: 6-way local-supplier join ----------------------
    // The classic "supplier and customer in the SAME nation" condition:
    // six tables, two independent fact-side shuffle keys (orders on
    // custkey, lineitem on orderkey/suppkey), dims broadcast, plus the
    // c_nationkey = s_nationkey equi-condition that prunes the join
    // product. Grouped over ALL regions (region as a real join hop, not
    // a filter) in a one-year order window.
    QuerySpec("q107_tpch_q5", { (s, d) =>
      val c = Td.load(s, d, "customer"); val o = Td.load(s, d, "orders")
      val l = Td.load(s, d, "lineitem"); val sup = Td.load(s, d, "supplier")
      val n = Td.load(s, d, "nation"); val r = Td.load(s, d, "region")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .where(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_items"),
          sum(expr(
            "CAST(floor(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * 100.0 + 0.5) AS BIGINT)"))
            .as("revenue_cents"))
        .orderBy("r_name", "n_name")
    }, Some("""SELECT r_name, n_name, count(*) AS n_items,
                      CAST(SUM(CAST(floor(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
               FROM customer
               JOIN orders ON c_custkey = o_custkey
               JOIN lineitem ON o_orderkey = l_orderkey
               JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
               JOIN nation ON s_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                 AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
               GROUP BY r_name, n_name
               ORDER BY r_name, n_name"""))
  )
}
