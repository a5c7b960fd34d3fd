package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Vectorized merge-on-read ([[graft.plans.DvMaskRewrite]]): a SQL
  * read of a DV-bearing table plans as NATIVE parquet relations with a
  * codegen'd row-index mask — whole-stage codegen and vectorized
  * batches kept, no V1 `RDD[Row]` bridge — while file skipping still
  * runs through the log ([[GraftFileIndex]].listFiles) and DV
  * semantics stay exact. The V1 anti-join fallback remains for tables
  * over the dead-position budget and is result-identical. */
class DvMaskSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(tag: String): (String, String) = {
    val root = graft.Scratch.dir(s"graft-$tag").toString
    val cat = tag.filter(_.isLetter).take(6) +
      java.lang.Integer.toHexString(root.hashCode).takeRight(6)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def mkDvTable(dir: String): Unit = {
    import spark.implicits._
    val d = (0 until 100).map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "s", "b")
    TxLog.append(spark, dir, d.repartition(4))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id % 10 = 3") // 10 dead rows via DVs
    assert(TxLog.snapshot(dir).files.exists(_.dv.nonEmpty))
  }

  test("DV-table SQL scan is a codegen'd native parquet plan, rows exact") {
    val (cat, root) = freshCat("dvmask")
    val dir = s"$root/t"
    mkDvTable(dir)
    val q = spark.sql(s"SELECT sum(id) AS s, count(*) AS n FROM $cat.t WHERE b = 2")
    val live = (0 until 100).filter(i => i % 5 == 2 && i % 10 != 3)
    assert(q.collect().toSeq === Seq(org.apache.spark.sql.Row(
      live.map(_.toLong).sum, live.size.toLong)))
    // the FINAL (post-AQE) physical plan: native parquet scans over the
    // GraftFileIndex, codegen spans, no V1 bridge node
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"),
      s"expected a native parquet scan, got:\n$plan")
    assert(plan.contains("GraftFileIndex"),
      s"the scan must list through the log's file index:\n$plan")
    assert(!plan.contains("DvFallbackScanBuilder"),
      s"the V1 anti-join bridge is still in the plan:\n$plan")
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).nonEmpty,
      s"no whole-stage-codegen span (the *(n) markers):\n$plan")
    // full-row parity with the Scala read (the anti-join reference)
    val sqlRows = spark.sql(s"SELECT id, s, b FROM $cat.t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val scalaRows = TxLog.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(sqlRows === scalaRows && sqlRows.size === 90)
  }

  test("file skipping runs inside the masked scan's listFiles") {
    import spark.implicits._
    val (cat, root) = freshCat("dvskip")
    val dir = s"$root/t"
    val d = (0 until 30).map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
    TxLog.appendPartitioned(spark, dir, d, Seq("grp"))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 0")
    val q = spark.sql(s"SELECT id FROM $cat.t WHERE grp = 'g0'")
    val got = q.collect().map(_.getLong(0)).toSet
    assert(got === (0L until 30L).filter(i => i % 3 == 0 && i != 0L).toSet)
    val scans = q.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected native file scans")
    val opened = scans.map(_.metrics("numFiles").value).sum
    assert(opened === 1L,
      s"a grp-keyed query must open only g0's file, opened $opened")
  }

  test("over the dead-position budget the V1 fallback serves, result-identical") {
    val (cat, root) = freshCat("dvbudget")
    val dir = s"$root/t"
    mkDvTable(dir)
    val saved = TxLog.dvMaskMaxPositions
    TxLog.dvMaskMaxPositions = 0L
    try {
      val q = spark.sql(s"SELECT sum(id) AS s FROM $cat.t")
      assert(q.queryExecution.executedPlan.toString.contains("DvFallbackScanBuilder"),
        "budget 0 must force the V1 fallback")
      val expect = (0 until 100).filterNot(_ % 10 == 3).map(_.toLong).sum
      assert(q.head().getLong(0) === expect)
      TxLog.dvMaskMaxPositions = saved
      val q2 = spark.sql(s"SELECT sum(id) AS s FROM $cat.t")
      assert(!q2.queryExecution.executedPlan.toString.contains("DvFallbackScanBuilder"))
      assert(q2.head().getLong(0) === expect)
    } finally TxLog.dvMaskMaxPositions = saved
  }

  test("DML and writes on a DV table are untouched by the rewrite") {
    val (cat, root) = freshCat("dvdml")
    val dir = s"$root/t"
    mkDvTable(dir)
    spark.sql(s"INSERT INTO $cat.t VALUES (1000, 'new', 9)")
    spark.sql(s"UPDATE $cat.t SET s = 'patched' WHERE id = 2")
    spark.sql(s"DELETE FROM $cat.t WHERE id = 4")
    val got = spark.sql(s"SELECT s FROM $cat.t WHERE id = 2").head().getString(0)
    assert(got === "patched")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE id = 4")
      .head().getLong(0) === 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE id = 1000")
      .head().getLong(0) === 1L)
  }

  test("time travel reads the pinned DV state through the mask") {
    val (cat, root) = freshCat("dvtt")
    val dir = s"$root/t"
    mkDvTable(dir) // v0 append, v1 props, v2 delete
    TxLog.delete(spark, dir, "id = 8") // v3
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 2")
      .head().getLong(0) === 90L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 89L)
  }
}
