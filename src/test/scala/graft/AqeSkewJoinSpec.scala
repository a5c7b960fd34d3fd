package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable proof that Spark's OWN runtime skew handling covers the
  * q90 shape when statistics allow (round-3 verdict, next-round #8):
  * with AQE on and broadcast off, a join whose shuffle has one dominant
  * key gets its oversized partition SPLIT at runtime — the final
  * SortMergeJoin reports `skew=true` — with no manual salting.
  *
  * When does [[graft.operators.SkewJoin.saltedJoin]] still win? AQE's
  * split happens per REDUCER PARTITION after the map stage wrote it, so
  * it (a) cannot split the build side of a broadcast join, (b) only
  * triggers past `skewedPartitionThresholdInBytes` (256 MB default —
  * moderate skew rides below it), and (c) does nothing for the
  * AGGREGATION half of a skewed groupBy (q65's two-phase salted agg).
  * Salting spreads the hot key at SHUFFLE WRITE time, so it also fixes
  * shapes AQE never sees. Prefer AQE when stats make it fire; reach for
  * the salt when the skew is structural and known in advance.
  */
class AqeSkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("AQE splits the hot-key partition at runtime: final SMJ reports skew=true") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    // flatMap(Option(_)): a key whose default resolves to null (e.g.
    // adaptive.autoBroadcastJoinThreshold) must restore via unset, not
    // set(null)
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_)))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // scale the 256 MB production threshold down to test-data size
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // one hot key owning ~99.5% of rows + 100 cold keys
      val big = spark.range(201000).selectExpr(
        "CASE WHEN id < 200000 THEN 0 ELSE id % 100 + 1 END AS k",
        "id AS payload", "repeat('x', 64) AS pad")
      val dim = spark.range(101).selectExpr("id AS k", "id * 10 AS code")
      val joined = big.join(dim, "k")
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
