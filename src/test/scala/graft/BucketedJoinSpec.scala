package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves the co-located-join claim in the 100 TB design notes
  * (SURVEY.md §2.3 / JoinQueries scale comments): two tables bucketed on
  * the join key join WITHOUT any shuffle on the join inputs — versus the
  * plain parquet join which exchanges both sides. At scale this converts
  * the dominant fact⋈fact movement into local merges.
  * (Broadcast/AQE are disabled inside the test so the plan shape is the
  * one a large cluster would produce — at real scale neither side fits a
  * broadcast anyway.) */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed fact-fact join reads buckets with no join-input shuffle") {
    val sf = "/root/testdata/sf0.001"
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Td.load(spark, sf, "orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
      Td.load(spark, sf, "lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bkt")

      def agg(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("qty"))

      val bucketed = agg(spark.table("orders_bkt"), spark.table("lineitem_bkt"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      // everything below the join node (its inputs) must be exchange-free:
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(plan.indexOf("Exchange", joinIdx) === -1,
        s"bucketed join inputs should not shuffle:\n${plan.take(1000)}")

      val plain = agg(Td.load(spark, sf, "orders"), Td.load(spark, sf, "lineitem"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      val plainJoinIdx = plainPlan.indexOf("SortMergeJoin")
      assert(plainPlan.indexOf("Exchange", plainJoinIdx) > 0,
        "plain parquet join should shuffle its inputs")

      // same results either way
      assert(bucketed.collect().map(_.toString).sorted
        .sameElements(plain.collect().map(_.toString).sorted))
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
