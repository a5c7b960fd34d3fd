package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** TRUNCATE TABLE as a metadata-only commit: all live files removed
  * from the log with zero data IO; time travel keeps the pre-truncate
  * versions; CDF tables fall back to the row-materializing DELETE so
  * the change feed stays complete. */
class TxTruncateSpec extends AnyFunSuite with SparkTestBase {

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  test("SQL TRUNCATE: metadata-only, time travel intact") {
    val root = graft.Scratch.dir("graft-trunc").toString
    val cat = "trc" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    TxLog.append(spark, dir, df(0 until 50))
    val before = TxLog.snapshot(dir)
    val mtimes = before.files.map(f =>
      Files.getLastModifiedTime(Paths.get(dir, f.path)))
    spark.sql(s"TRUNCATE TABLE $cat.t")
    val after = TxLog.snapshot(dir)
    assert(after.files.isEmpty)
    assert(after.version === before.version + 1, "one commit")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 0L)
    // zero data IO: the files were neither rewritten nor deleted (VACUUM
    // reclaims), and time travel still reads them
    before.files.zip(mtimes).foreach { case (f, t) =>
      assert(Files.getLastModifiedTime(Paths.get(dir, f.path)) === t)
    }
    assert(TxLog.read(spark, dir, Some(before.version)).count() === 50L)
    // metrics on the commit
    val h = TxLog.history(spark, dir).collect()
      .find(_.getLong(0) == after.version).get
    assert(h.getString(1) === "truncate")
  }

  test("CDF table: truncate falls back to row-materializing delete") {
    val root = graft.Scratch.dir("graft-trunc-cdf").toString
    val cat = "trd" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    TxLog.append(spark, dir, df(0 until 10))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val v0 = TxLog.latestVersion(dir)
    spark.sql(s"TRUNCATE TABLE $cat.t")
    assert(TxLog.read(spark, dir).count() === 0L)
    val changes = TxLog.readChangeFeed(spark, dir, v0)
    assert(changes.where(s"${TxLog.ChangeTypeCol} = 'delete'").count() === 10L)
  }
}
