package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants of the round-4 analytics queries (q27-q29,
  * q47-q49) on real data — properties the oracle hash can't state
  * directly but that must hold for the semantics to be right.
  */
class AnalyticsInvariantsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q27: exactly one surviving row per user, and it is that user's latest event") {
    val out = run("q27_window_dedup")
    val users = out.select("user_id").distinct().count()
    assert(out.count() === users) // one row per key
    // the survivor carries the max (ts, event_id) per user: verify via an
    // independent max_by-free formulation
    val ev = Td.load(spark, sf, "events")
    val latest = ev.groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"))).as("m"))
      .select(col("user_id"), col("m.event_id").as("event_id"))
    val mismatches = out.select("user_id", "event_id")
      .exceptAll(latest.select("user_id", "event_id")).count()
    assert(mismatches === 0)
  }

  test("q28: the grand-total cube cell equals the table count; sets nest consistently") {
    val out = run("q28_cube").collect()
    val total = Td.load(spark, sf, "lineitem").count()
    val grand = out.filter(r => r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 1)
    assert(grand.length === 1 && grand.head.getAs[Long]("cnt") === total)
    // each subtotal level must re-add to the grand total
    Seq((0, 0), (0, 1), (1, 0)).foreach { case (grf, gls) =>
      val cells = out.filter(r => r.getAs[Int]("g_rf") == grf && r.getAs[Int]("g_ls") == gls)
      assert(cells.map(_.getAs[Long]("cnt")).sum === total, s"level ($grf,$gls)")
    }
  }

  test("q29: quartiles are balanced (sizes differ by at most 1) and ranges don't overlap") {
    val out = run("q29_ntile_quartiles").collect().sortBy(_.getAs[Int]("quartile"))
    assert(out.map(_.getAs[Int]("quartile")).toSeq === Seq(1, 2, 3, 4))
    val sizes = out.map(_.getAs[Long]("n_users"))
    assert(sizes.max - sizes.min <= 1, s"ntile must balance: ${sizes.toSeq}")
    // quartile value ranges are ordered: max(q) <= min(q+1)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_total") <= b.getAs[Double]("min_total"))
    }
  }

  test("q47: star-join revenue cells re-add to the one-table revenue total") {
    val out = run("q47_star_join")
    val joined = out.agg(sum("n_items"), sum("revenue")).head()
    // every lineitem has exactly one order/customer/nation/region chain,
    // so the star join must not duplicate or drop fact rows
    val items = Td.load(spark, sf, "lineitem").count()
    assert(joined.getLong(0) === items)
    val direct = Td.load(spark, sf, "lineitem")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double")).head().getDouble(0)
    assert(math.abs(joined.getDouble(1) - direct) < 1e-6)
  }

  test("q48: histogram conserves mass and buckets are within range") {
    val out = run("q48_histogram").collect()
    val total = Td.load(spark, sf, "lineitem").count()
    assert(out.map(_.getAs[Long]("cnt")).sum === total)
    assert(out.forall { r =>
      val b = r.getAs[Int]("bucket"); b >= 0 && b <= 19 })
  }

  test("q49: transition counts sum to (events - users with >=1 event)") {
    val out = run("q49_transitions")
    val nTransitions = out.agg(sum("n")).head().getLong(0)
    val ev = Td.load(spark, sf, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nTransitions === expected) // each user contributes (n_i - 1) edges
  }
}
