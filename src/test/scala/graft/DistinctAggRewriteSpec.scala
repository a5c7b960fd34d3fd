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

  test("ineligible shapes are untouched (two distincts / avg)") {
    val two = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_suppkey")))
    assert(two.queryExecution.executedPlan.toString.contains("Expand"))

    // avg does not re-compose from partials — the rule must not fire on it
    // (Spark's own one-distinct planning handles it); values must be exact.
    val withAvg = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"), avg(col("l_quantity")).as("a"))
      .orderBy("l_returnflag").collect()
    val expected = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity")).as("s"), count(col("l_quantity")).as("c"))
      .orderBy("l_returnflag").collect()
      .map(r => r.getDouble(1) / r.getLong(2))
    assert(withAvg.map(_.getDouble(2)).zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("count(NULL) stays 0 next to a countDistinct (advice regression)") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "a")).toDF("g", "x")
    val out = df.groupBy("g")
      .agg(count(lit(null)).as("cn"), countDistinct(col("x")).as("d"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // count(NULL) must be 0, never count(*) — the rewrite must not fire on it
    assert(out.toSeq === Seq((1, 0L, 2L), (2, 0L, 1L)))
  }

  test("sum/min/max alongside countDistinct plan Expand-free and match built-in results") {
    val natural = li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).as("sq"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"),
        countDistinct(col("l_partkey")).as("d"))
    assert(!natural.queryExecution.executedPlan.toString.contains("Expand"),
      natural.queryExecution.executedPlan.toString.take(600))

    // same query with the rule disabled via an ineligible no-op (second distinct)
    // is awkward; instead compare against the manual two-level form
    val manual = li.groupBy("l_returnflag", "l_linestatus", "l_partkey")
      .agg(count(lit(1)).as("c"), sum(col("l_quantity")).as("s"),
        min(col("l_extendedprice")).as("pmn"), max(col("l_extendedprice")).as("pmx"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("c").as("n"), sum("s").cast(natural.schema("sq").dataType).as("sq"),
        min("pmn").as("mn"), max("pmx").as("mx"), count(lit(1)).as("d"))
    assert(natural.orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq ===
      manual.orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq)
  }

  test("events goldDaily shape (count+sum+sum+countDistinct) plans Expand-free") {
    val ev = Td.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("event_day", date_trunc("day", col("ts")))
    val g = ev.groupBy("event_day", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
    assert(!g.queryExecution.executedPlan.toString.contains("Expand"),
      g.queryExecution.executedPlan.toString.take(600))
    assert(g.count() > 0)
  }
}
