package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The injected optimizer rule must (a) remove Expand from eligible
  * count+countDistinct aggregates, (b) keep results identical, and
  * (c) leave ineligible aggregates (multiple distincts, non-count
  * functions) untouched. */
class DistinctAggRewriteSpec extends AnyFunSuite with SparkTestBase {

  private lazy val li = Td.load(spark, "/root/testdata/sf0.001", "lineitem")

  test("eligible aggregate plans without Expand and results match manual two-level") {
    val natural = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), countDistinct(col("l_partkey")).as("d"))
    assert(!natural.queryExecution.executedPlan.toString.contains("Expand"),
      natural.queryExecution.executedPlan.toString.take(600))

    val manual = li.groupBy("l_returnflag", "l_linestatus", "l_partkey")
      .agg(count(lit(1)).as("c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("c").as("n"), count(lit(1)).as("d"))
    assert(natural.orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq ===
      manual.orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq)
  }

  test("null distinct keys: count(1) includes them, countDistinct excludes them") {
    import spark.implicits._
    val df = Seq((1, Some("a")), (1, Some("a")), (1, None), (2, Some("b")))
      .toDF("g", "x")
    val out = df.groupBy("g")
      .agg(count(lit(1)).as("n"), countDistinct(col("x")).as("d"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, 3L, 1L), (2, 1L, 1L)))
  }

  test("ineligible shapes are untouched (two distincts / non-count aggs)") {
    val two = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_suppkey")))
    assert(two.queryExecution.executedPlan.toString.contains("Expand"))

    val mixed = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"), sum(col("l_quantity")).as("s"))
    // still correct whatever the plan
    assert(mixed.count() === 3)
  }
}
