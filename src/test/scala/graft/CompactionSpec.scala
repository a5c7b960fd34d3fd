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

  test("optimize(minFileBytes): already-full files are layout-final") {
    import spark.implicits._
    import graft.sources.TxLog
    val dir = graft.Scratch.dir("graft-minfile").toString + "/t"
    // two BIG files (many rows) + four tiny ones
    (0 until 2).foreach(i => TxLog.append(spark, dir,
      (0 until 20000).map(d => (i * 100000L + d, s"v$d")).toDF("id", "s").coalesce(1)))
    (0 until 4).foreach(i => TxLog.append(spark, dir,
      Seq((900000L + i, "small")).toDF("id", "s")))
    val before = TxLog.snapshot(dir)
    val bigPaths = before.files.sortBy(-_.bytes).take(2).map(_.path).toSet
    val cutoff = before.files.map(_.bytes).sorted.apply(3) + 1 // above the tiny four
    val (nIn, nOut) = TxLog.optimize(spark, dir, minFileBytes = Some(cutoff))
    assert(nIn === 4 && nOut === 1, s"expected 4->1, got $nIn->$nOut")
    val after = TxLog.snapshot(dir)
    // the big files were never rewritten — same paths, layout-final
    assert(bigPaths.subsetOf(after.files.map(_.path).toSet))
    assert(after.files.size === 3)
    assert(TxLog.read(spark, dir).count() === 40004L)
    // full OPTIMIZE (no cutoff) still consumes everything
    val (a2, b2) = TxLog.optimize(spark, dir)
    assert(a2 === 3 && b2 === 1)
    assert(TxLog.read(spark, dir).count() === 40004L)
  }
}
