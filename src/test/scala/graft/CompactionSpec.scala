package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Compaction

/** Compaction contract: many small files become few, data is unchanged,
  * and the directory stays readable after the swap. */
class CompactionSpec extends AnyFunSuite with SparkTestBase {

  test("compact merges a fragmented sink without changing its contents") {
    val dir = graft.Scratch.dir("graft-compact").toString + "/t"
    // fragment: 32 tiny files (a streaming-append shape)
    val df = Td.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    df.repartition(32).write.parquet(dir)
    val beforeRows = spark.read.parquet(dir).count()
    val beforeSum = spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.sum("l_quantity")).head().getDouble(0)

    val (nBefore, nAfter) = Compaction.compact(spark, dir, targetBytes = 512L << 20)
    assert(nBefore === 32)
    assert(nAfter === 1) // everything fits one target-size file

    val after = spark.read.parquet(dir)
    assert(after.count() === beforeRows)
    assert(after.agg(org.apache.spark.sql.functions.sum("l_quantity")).head().getDouble(0)
      === beforeSum)
    // no leftover temp/trash dirs
    val parent = java.nio.file.Paths.get(dir).getParent
    val siblings = java.nio.file.Files.list(parent).toArray
      .map(p => java.nio.file.Paths.get(p.toString).getFileName.toString)
    assert(siblings.count(_.contains("compact_")) === 0, siblings.mkString(", "))
  }

  test("compacting an empty or absent table directory is a no-op, not an error") {
    val empty = graft.Scratch.dir("graft-compact-empty").toString
    assert(Compaction.compact(spark, empty) === ((0, 0)))
    assert(Compaction.compact(spark, empty + "/never_written") === ((0, 0)))
  }
}
