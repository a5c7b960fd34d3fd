package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** DML with IN-subquery conditions: `DELETE/UPDATE … WHERE k IN
  * (SELECT …)` rewrites onto the mergeClauses semi-join machinery —
  * one distributed plan, no driver-side value collection, the same
  * commit/rebase protocol as every other DML. NOT IN / EXISTS /
  * correlated shapes are refused loudly (their three-valued NULL
  * semantics do not reduce to the semi-join); NULL subquery keys drop
  * exactly (SQL IN only yields TRUE on a non-NULL match). */
class TxSubqueryDmlSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(): (String, String) = {
    val root = graft.Scratch.dir("graft-subqdml").toString
    val cat = "sqd" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(root: String, name: String): String = {
    import spark.implicits._
    val dir = s"$root/$name"
    TxLog.append(spark, dir,
      (0 until 20).map(i => (i.toLong, s"v$i", (i % 3).toLong)).toDF("id", "s", "grp"))
    dir
  }

  private def ids(dir: String): Set[Long] =
    TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet

  test("DELETE WHERE id IN (SELECT …) — semi-join, duplicates and NULLs exact") {
    val (cat, root) = freshCat()
    val dir = seed(root, "t")
    import spark.implicits._
    // duplicates, an out-of-range key, and a NULL — all exact under IN
    Seq(Some(3L), Some(3L), Some(7L), Some(99L), None)
      .toDF("k").createOrReplaceTempView("del_keys")
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (SELECT k FROM del_keys)")
    assert(ids(dir) === (0L until 20L).toSet -- Set(3L, 7L))
  }

  test("DELETE WHERE id IN (…) AND residual condition") {
    val (cat, root) = freshCat()
    val dir = seed(root, "t")
    import spark.implicits._
    Seq(1L, 2L, 4L, 5L).toDF("k").createOrReplaceTempView("del_keys2")
    spark.sql(
      s"DELETE FROM $cat.t WHERE id IN (SELECT k FROM del_keys2) AND grp = 1")
    // grp = id % 3: of {1,2,4,5} only 1 and 4 have grp 1
    assert(ids(dir) === (0L until 20L).toSet -- Set(1L, 4L))
  }

  test("UPDATE … WHERE id IN (SELECT …) with pre-update reads and residual") {
    val (cat, root) = freshCat()
    val dir = seed(root, "t")
    import spark.implicits._
    Seq(2L, 3L, 5L, 8L).toDF("k").createOrReplaceTempView("upd_keys")
    spark.sql(s"""UPDATE $cat.t
                  SET s = concat(s, '!'), grp = grp * 10
                  WHERE id IN (SELECT k FROM upd_keys) AND grp > 0""")
    val byId = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // grp = id % 3 > 0 of {2,3,5,8}: ids 2 (grp 2), 5 (grp 2), 8 (grp 2)
    assert(byId(2L) === (("v2!", 20L)) && byId(5L) === (("v5!", 20L)) &&
      byId(8L) === (("v8!", 20L)))
    assert(byId(3L) === (("v3", 0L))) // grp 0: residual fails, untouched
    assert(byId(1L) === (("v1", 1L)))
  }

  test("composite probe: (id, grp) IN (SELECT …)") {
    val (cat, root) = freshCat()
    val dir = seed(root, "t")
    import spark.implicits._
    // (4, 1) matches (4 % 3 == 1); (5, 1) does not (5 % 3 == 2)
    Seq((4L, 1L), (5L, 1L)).toDF("a", "b").createOrReplaceTempView("ck")
    spark.sql(s"DELETE FROM $cat.t WHERE (id, grp) IN (SELECT a, b FROM ck)")
    assert(ids(dir) === (0L until 20L).toSet - 4L)
  }

  test("the subquery may read another txlog table") {
    val (cat, root) = freshCat()
    val dir = seed(root, "t")
    seed(root, "keys")
    spark.sql(s"DELETE FROM $cat.keys WHERE id >= 3") // keys 0,1,2 remain
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (SELECT id FROM $cat.keys)")
    assert(ids(dir) === (3L until 20L).toSet)
  }

  test("refusals: NOT IN, EXISTS, subquery in SET, correlated") {
    val (cat, root) = freshCat()
    seed(root, "t")
    import spark.implicits._
    Seq(1L).toDF("k").createOrReplaceTempView("rk")
    def msg(f: => Any): String = {
      val e = intercept[Exception](f)
      def all(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ all(t.getCause)
      all(e).mkString("; ")
    }
    assert(msg(spark.sql(
      s"DELETE FROM $cat.t WHERE id NOT IN (SELECT k FROM rk)")).nonEmpty)
    assert(msg(spark.sql(
      s"DELETE FROM $cat.t WHERE EXISTS (SELECT 1 FROM rk)")).nonEmpty)
    assert(msg(spark.sql(
      s"UPDATE $cat.t SET grp = (SELECT max(k) FROM rk) WHERE id = 1"))
      .contains("SET value"))
    // nothing was deleted or updated by the refused statements
    assert(ids(s"$root/t") === (0L until 20L).toSet)
  }
}

/** The semi-join DML rewrite keeps every downstream contract of the
  * merge machinery — including the change feed. */
class TxSubqueryDmlCdfSpec extends AnyFunSuite with SparkTestBase {

  test("subquery DELETE emits its rows on the change feed") {
    val root = graft.Scratch.dir("graft-subqcdf").toString
    val cat = "sqc" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    import spark.implicits._
    TxLog.append(spark, dir,
      (0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "s"))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val v0 = TxLog.latestVersion(dir)
    Seq(3L, 7L, 11L).toDF("k").createOrReplaceTempView("cdf_keys")
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (SELECT k FROM cdf_keys)")
    val ch = TxLog.readChangeFeed(spark, dir, v0)
    assert(ch.where(s"${TxLog.ChangeTypeCol} = 'delete'")
      .select("id").collect().map(_.getLong(0)).toSet === Set(3L, 7L, 11L))
  }
}
