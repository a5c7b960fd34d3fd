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

  test("ntileBuckets == ntile window, across n and N (incl. N % n != 0 and N < n)") {
    import org.apache.spark.sql.expressions.Window
    // Heavy value ties (only 50 distinct v over 5000 rows) with a unique
    // tie key — exactly the regime where the boundary compare must use
    // the full (value, tie) tuple to reproduce ntile's positional split.
    // (Synthetic, not lineitem: the testdata's (l_orderkey, l_linenumber)
    // is NOT unique, and ntileBuckets' contract requires a unique tie.)
    val base = spark.range(5000).select(
      (pmod(hash(col("id")), lit(50))).cast("double").as("v"), col("id").as("t"))
    for (n <- Seq(2, 4, 7); limit <- Seq(5000, 4999, 3)) {
      val df = base.where(col("t") < limit).cache()
      val viaWindow = df
        .withColumn("b", ntile(n).over(Window.orderBy(col("v"), col("t"))))
        .select("t", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val ours = ExactPercentile.ntileBuckets(df, n, "v", "t", "b")
        .select("t", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(ours === viaWindow, s"n=$n limit=$limit")
      df.unpersist()
    }
  }

  test("ntileBuckets rejects NULL ordering keys and empty input") {
    import spark.implicits._
    val withNull = Seq((Some(1.0), 1L), (None, 2L)).toDF("v", "t")
    val e = intercept[IllegalArgumentException] {
      ExactPercentile.ntileBuckets(withNull, 2, "v", "t", "b")
    }
    assert(e.getMessage.contains("NULL"))
    val empty = Seq.empty[(Double, Long)].toDF("v", "t")
    intercept[IllegalArgumentException] {
      ExactPercentile.ntileBuckets(empty, 2, "v", "t", "b")
    }
  }

  test("grouped path plans a window sort, not a percentile aggregation buffer") {
    val plan = ExactPercentile.quantileContByGroup(
      li("/root/testdata/sf0.001"), Seq("l_returnflag"), "l_extendedprice", 0.5, "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), plan.take(600))
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"), plan.take(600))
  }
}
