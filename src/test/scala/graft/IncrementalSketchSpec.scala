package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Mergeable-sketch pattern for incremental pipelines: gold tables store
  * an HLL SKETCH per day (Spark's datasketches hll_sketch_agg), and any
  * wider rollup — weekly/monthly distinct users — re-aggregates the
  * sketches with hll_union_agg WITHOUT rescanning the fact table. At
  * 100 TB this is the only viable distinct-count architecture for
  * incremental gold: per-day partials are computed once on arrival and
  * every rollup after that costs kilobytes per day.
  *
  * (Spec-only component: sketch binaries are engine-specific, so there is
  * no DuckDB-hash-comparable query; q70 covers the approx-distinct value
  * contract against the oracle.)
  */
class IncrementalSketchSpec extends AnyFunSuite with SparkTestBase {

  test("union of daily HLL sketches == one-shot sketch; both within 5% of exact") {
    val ev = Td.load(spark, "/root/testdata/sf0.01", "events")
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))

    // incremental shape: one sketch per day (what a gold table would store)
    val daily = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    assert(daily.count() > 5) // multiple partials actually get merged

    val unioned = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    val oneShot = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est")).head().getLong(0)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)

    // HLL union is lossless at equal lgK: merging partials must give the
    // SAME registers (hence estimate) as sketching everything at once.
    assert(unioned === oneShot, s"union=$unioned oneShot=$oneShot")
    val relErr = math.abs(unioned - exact).toDouble / exact
    assert(relErr < 0.05, s"est=$unioned exact=$exact relErr=$relErr")
  }
}
