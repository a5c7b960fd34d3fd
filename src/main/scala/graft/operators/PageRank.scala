package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the link-graph quality signal a
  * web-scale corpus pipeline ranks domains/URLs with before sampling
  * (the Common-Crawl-curation staple; Page et al. 1999, and the
  * iterative-aggregation shape of Malewicz et al.'s Pregel, SIGMOD
  * 2010, re-expressed as Spark joins).
  *
  * DETERMINISM — the whole computation runs in integer RANK UNITS
  * (`scale` units = rank 1.0) with floor division:
  * {{{
  *   r_0(v)    = scale div N
  *   r_{i+1}(v) = (15·scale) div (100·N)                      // teleport
  *              + Σ_{u→v} (85·r_i(u)) div (100·outdeg(u))     // links
  *              + (85·Σ_{dangling u} r_i(u)) div (100·N)      // dangling
  * }}}
  * Integer sums are associative and floor division is exact, so the
  * result is BIT-IDENTICAL under any partitioning, any plan, and any
  * engine — the property that lets a DuckDB oracle replay the same
  * unrolled iterations and hash-match. The ≤1-unit-per-term floor loss
  * (≤1e-15 of mass) is deterministic, not error.
  *
  * SCALE — one superstep = one join edges⋈ranks (shuffle on src), one
  * partial-aggregated groupBy(dst), one broadcast 1-row dangling sum;
  * `ranks` is localCheckpointed per superstep (the Pregel
  * materialization — without it each iteration's lineage re-evaluates
  * the previous ones exponentially, since ranks feeds both the link
  * term and the dangling term). `edges` and `outdeg` are checkpointed
  * once and reused by every superstep. Nothing driver-side but the
  * node count and the per-iteration loop bound.
  */
object PageRank {

  /** Run `iterations` supersteps over `edges(srcCol, dstCol)` (duplicate
    * edges collapse to one link). Returns `(node, rank_units)` — BIGINT
    * rank in `scale` units; divide by `scale` for the float rank.
    * Node ids must be non-null; src/dst share one id space. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, scale: Long = 1000000000000000L): DataFrame = {
    require(iterations >= 1, "pageRank: at least one iteration")
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val base = (15L * scale) / (100L * n) // teleport term, exact in Long

    var ranks = nodes.withColumn("r", lit(scale / n))
    (0 until iterations).foreach { _ =>
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .withColumn("c", expr("(85 * r) div (100 * outdeg)"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("in_sum"))
      val dangling = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dang"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(base) + coalesce(col("in_sum"), lit(0L)) +
            expr(s"(85 * dang) div (${100L * n})")).as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_units"))
  }

  /** The DuckDB replay of [[run]]: `iterations` unrolled CTE supersteps
    * with the identical integer arithmetic (`//` is DuckDB's floor
    * division; all values are positive, so it matches Spark's `div`).
    * `edgesSql` must yield columns (src, dst), possibly with duplicate
    * rows — the template dedups exactly like the operator. */
  def oracleSql(edgesSql: String, iterations: Int,
      scale: Long = 1000000000000000L): String = {
    val steps = (1 to iterations).map { i =>
      val prev = s"r${i - 1}"
      s"""r$i AS (
         |  SELECT nodes.node,
         |         CAST((15 * $scale) // (100 * nn.n)
         |              + coalesce(c.in_sum, 0)
         |              + (85 * dang.d) // (100 * nn.n) AS BIGINT) AS r
         |  FROM nodes CROSS JOIN nn
         |  CROSS JOIN (SELECT coalesce(sum(r), 0) AS d FROM $prev
         |              WHERE node NOT IN (SELECT src FROM deg)) dang
         |  LEFT JOIN (SELECT e.dst AS node,
         |                    sum((85 * p.r) // (100 * deg.outdeg)) AS in_sum
         |             FROM edges e
         |             JOIN $prev p ON p.node = e.src
         |             JOIN deg ON deg.src = e.src
         |             GROUP BY e.dst) c ON c.node = nodes.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,
       |                               CAST(dst AS BIGINT) AS dst
       |               FROM ($edgesSql)
       |               WHERE src IS NOT NULL AND dst IS NOT NULL),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST($scale // nn.n AS BIGINT) AS r
       |       FROM nodes CROSS JOIN nn),
       |$steps
       |SELECT node, r AS rank_units FROM r$iterations""".stripMargin
  }
}
