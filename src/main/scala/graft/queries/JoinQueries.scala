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
              GROUP BY c_mktsegment ORDER BY c_mktsegment"""))
  )
}
