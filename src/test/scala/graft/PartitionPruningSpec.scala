package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Proves the storage-layout claim in the 100 TB design notes: a sink
  * partitioned by a filter column lets Catalyst prune whole partitions at
  * planning time — the scan never lists the other directories. */
class PartitionPruningSpec extends AnyFunSuite with SparkTestBase {

  test("partitionBy sink + filter → partition pruning in the plan") {
    val dir = graft.Scratch.dir("graft-part").toString
    val li = Td.load(spark, "/root/testdata/sf0.001", "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters"), plan.take(500))
    assert(plan.contains("l_returnflag"), plan.take(500))
    // correctness: pruned read equals the unpartitioned filter
    assert(pruned.count() === li.filter(col("l_returnflag") === "A").count())
    // the scan's selected partition count is 1 of 3 (A/N/R)
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty)
    assert(scan.get.selectedPartitions.partitionCount === 1)
  }
}
