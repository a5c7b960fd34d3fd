package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the 100 TB knob for the
  * selective-dim ⋈ fact shape: when one join side is small AND filtered,
  * Catalyst injects a `might_contain(bloom, xxhash64(fact.key))` predicate into the fact
  * scan, so most fact rows die at the scan instead of riding the shuffle
  * to the join. Spark gates the injection behind size thresholds tuned
  * for clusters (application side ≥ 10 GB scan), so this spec lowers
  * them to prove the mechanism fires on this engine's join shapes and
  * that results are identical with and without it — the documentation
  * that the knob exists, what it needs, and that it is safe. */
class RuntimeFilterSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def factJoin() = {
    val l = Td.load(spark, sf, "lineitem")
    // selective creation side: one order priority slice of orders
    val o = Td.load(spark, sf, "orders").where(col("o_orderpriority") === "1-URGENT")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  test("bloom filter injects into the fact side under a selective dim join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      // keep the join a shuffle join so the filter has a shuffle to kill
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = factJoin()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain("),
        s"runtime bloom filter did not inject:\n$plan")
      // and it is SAFE: same result as the undecorated join
      val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val want = factJoin().collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got === want)
      }
    }
  }

  test("no injection without selectivity: an unfiltered creation side stays clean") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val l = Td.load(spark, sf, "lineitem")
      val o = Td.load(spark, sf, "orders") // no filter → nothing to transfer
      val plan = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain("),
        s"unexpected bloom filter on an unselective join:\n$plan")
    }
  }
}
