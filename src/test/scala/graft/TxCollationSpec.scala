package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Collated string columns (Spark 4 `STRING COLLATE …`) vs the stats
  * machinery: per-file stats and pv strings compare in BINARY (UTF-8)
  * order, which diverges from a case-insensitive collation's equality —
  * so a collated column must carry NO stats (pruning conservative,
  * never collation-unsound) and must be REFUSED as a partition column
  * (pv equality is byte-wise). */
class TxCollationSpec extends AnyFunSuite with SparkTestBase {

  test("collated column: equality honors the collation; no stats recorded") {
    val root = graft.Scratch.dir("graft-collate").toString
    val cat = "col" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"""CREATE TABLE $cat.t (
      id BIGINT, tag STRING COLLATE UNICODE_CI, plain STRING)""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'alpha', 'x'), (2, 'ALPHA', 'y'), " +
      "(3, 'beta', 'z')")
    // collation-aware equality finds BOTH spellings — file skipping must
    // not have pruned on binary bounds
    val got = spark.sql(s"SELECT id FROM $cat.t WHERE tag = 'Alpha'")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
    // the collated column carries no stats (binary min/max would be
    // collation-unsound); the plain column does
    val snap = TxLog.snapshot(s"$root/t")
    assert(snap.files.forall(f => !f.stats.contains("tag")),
      s"collated column must not carry stats: ${snap.files.map(_.stats.keySet)}")
    assert(snap.files.exists(_.stats.contains("plain")))
    // DML through the engine stays exact under collation
    spark.sql(s"DELETE FROM $cat.t WHERE tag = 'ALPHA'")
    assert(spark.sql(s"SELECT id FROM $cat.t").collect()
      .map(_.getLong(0)).toSet === Set(3L))
  }

  test("collated partition column is refused (pv equality is byte-wise)") {
    val root = graft.Scratch.dir("graft-collate2").toString
    val cat = "co2" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    intercept[Exception](spark.sql(
      s"""CREATE TABLE $cat.p (id BIGINT, tag STRING COLLATE UNICODE_CI)
          PARTITIONED BY (tag)"""))
    // and evolution refuses it too
    spark.sql(s"CREATE TABLE $cat.q (id BIGINT, tag STRING COLLATE UNICODE_CI)")
    intercept[IllegalArgumentException](
      TxLog.setPartitioning(s"$root/q", Seq("tag")))
  }
}
