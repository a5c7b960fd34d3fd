package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ExactPercentile

/** The distributed exact-percentile paths must be BIT-IDENTICAL to
  * Spark's built-in exact `percentile` aggregate (which itself hash-
  * matches DuckDB quantile_cont in q04/q11) — interpolation formula and
  * all. Pinned on two scale factors and several q values. */
class ExactPercentileSpec extends AnyFunSuite with SparkTestBase {

  private def li(sf: String) = Td.load(spark, sf, "lineitem")

  test("global quantileCont == built-in percentile, multiple q, both SFs") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
         q <- Seq(0.0, 0.25, 0.5, 0.9, 1.0)) {
      val df = li(sf).filter(col("l_quantity") > 0)
      val builtin = df.select(expr(s"percentile(l_extendedprice, $q)"))
        .head().getDouble(0)
      val ours = ExactPercentile.quantileCont(df, "l_extendedprice", q)
      assert(ours === builtin, s"sf=$sf q=$q")
    }
  }

  test("grouped quantileContByGroup == built-in grouped percentile") {
    for (q <- Seq(0.5, 0.9)) {
      val builtin = li("/root/testdata/sf0.01")
        .groupBy("l_returnflag")
        .agg(expr(s"percentile(l_extendedprice, $q)").as("p"))
        .orderBy("l_returnflag").collect().map(r => r.getString(0) -> r.getDouble(1))
      val ours = ExactPercentile.quantileContByGroup(
          li("/root/testdata/sf0.01"), Seq("l_returnflag"), "l_extendedprice", q, "p")
        .orderBy("l_returnflag").collect().map(r => r.getString(0) -> r.getDouble(1))
      assert(ours.toSeq === builtin.toSeq, s"q=$q")
    }
  }

  test("groups with only NULL values surface a NULL quantile, like the built-in") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None))
      .toDF("g", "v")
    val out = ExactPercentile.quantileContByGroup(df, Seq("g"), "v", 0.5, "p")
      .orderBy("g").collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out === Map("a" -> Some(2.0), "b" -> None))
  }

  test("grouped path plans a window sort, not a percentile aggregation buffer") {
    val plan = ExactPercentile.quantileContByGroup(
      li("/root/testdata/sf0.001"), Seq("l_returnflag"), "l_extendedprice", 0.5, "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), plan.take(600))
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"), plan.take(600))
  }
}
