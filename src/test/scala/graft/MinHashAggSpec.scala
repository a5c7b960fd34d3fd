package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Mergeability proof for the custom TypedImperativeAggregate: the
  * group signature must be invariant to partitioning (partial buffers
  * merge associatively), and equal to the brute elementwise minimum. */
class MinHashAggSpec extends AnyFunSuite with SparkTestBase {

  private lazy val sigs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    .selectExpr("lang",
      s"minhash_sigs(${graft.operators.Dedup.shingles("text")}) AS sigs")

  test("minhash_agg is partition-invariant (mergeable)") {
    def run(parts: Int) = sigs.repartition(parts)
      .groupBy("lang").agg(expr("array_join(minhash_agg(sigs), '|')").as("sig"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run(1) === run(16))
  }

  test("minhash_agg equals the brute elementwise minimum") {
    val viaAgg = sigs.groupBy("lang")
      .agg(expr("minhash_agg(sigs)").as("sig"))
      .selectExpr("lang", "array_join(sig, '|') AS sig")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val brute = sigs.selectExpr("lang", "posexplode(sigs) AS (j, v)")
      .groupBy("lang", "j").agg(min("v").as("m"))
      .groupBy("lang").agg(expr("array_join(array_sort(collect_list(struct(j, m))).m, '|')").as("sig"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaAgg === brute)
  }
}
