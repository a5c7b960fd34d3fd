package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Arbitrary-predicate replaceWhere: atomically replace every row
  * satisfying the predicate with the incoming frame — incoming rows
  * must all satisfy it (loud refusal otherwise), touch discovery is
  * predicate-pruned (untouched files never opened), straddlers rewrite
  * keeping only non-matching live rows, one commit. Reachable from the
  * public API via `df.writeTo(t).overwrite(cond)`. */
class TxReplaceWhereSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-replwhere").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
  }

  private def rows(dir: String): Set[(Long, String)] =
    TxLog.read(spark, dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("range replace: matched rows out, incoming in, one commit") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30))
    import spark.implicits._
    val repl = Seq((100L, "r1", "gX"), (101L, "r2", "gX")).toDF("id", "s", "grp")
    val v0 = TxLog.latestVersion(dir)
    TxLog.replaceWhere(spark, dir, repl, "id >= 100 OR id >= 20")
    assert(TxLog.latestVersion(dir) === v0 + 1, "one commit")
    assert(rows(dir).map(_._1) === ((0L until 20L).toSet ++ Set(100L, 101L)))
  }

  test("incoming rows outside the predicate are refused, nothing committed") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10))
    import spark.implicits._
    val bad = Seq((5L, "in", "g0"), (50L, "out", "g0")).toDF("id", "s", "grp")
    val v0 = TxLog.latestVersion(dir)
    intercept[IllegalArgumentException](
      TxLog.replaceWhere(spark, dir, bad, "id < 10"))
    assert(TxLog.latestVersion(dir) === v0)
    assert(rows(dir).map(_._1) === (0L until 10L).toSet)
  }

  test("predicate-pruned: untouched files are never opened") {
    val dir = tmp()
    // three contiguous id bands, one file each
    (0 until 3).foreach(b =>
      TxLog.append(spark, dir, df(b * 10 until (b + 1) * 10).coalesce(1)))
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size === 3)
    // corrupt the band the predicate excludes
    val hi = snap.files.maxBy(_.stats("id").min.get.toLong)
    Files.write(Paths.get(dir, hi.path), Array[Byte](9, 9, 9))
    import spark.implicits._
    val repl = Seq((5L, "r", "g0")).toDF("id", "s", "grp")
    TxLog.replaceWhere(spark, dir, repl, "id < 10")
    assert(TxLog.snapshot(dir).files.map(_.path).contains(hi.path),
      "the excluded band rode through untouched")
  }

  test("DV'd rows stay deleted through the rewrite") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 20).coalesce(1))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 3") // DV, no rewrite
    import spark.implicits._
    val repl = Seq((5L, "r", "gX")).toDF("id", "s", "grp")
    // replaces ids 0..9 (3 already dead); keeps 10..19 via the straddler
    TxLog.replaceWhere(spark, dir, repl, "id < 10")
    assert(rows(dir) === ((10L until 20L).map(i => (i, s"v$i")).toSet + ((5L, "r"))))
  }

  test("SQL surface: df.writeTo(cat.t).overwrite(non-equality predicate)") {
    val root = graft.Scratch.dir("graft-replsql").toString
    val cat = "rpw" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    TxLog.append(spark, dir, df(0 until 30))
    import spark.implicits._
    Seq((100L, "r", "gX")).toDF("id", "s", "grp")
      .writeTo(s"$cat.t").overwrite(col("id") >= 20L)
    assert(rows(dir).map(_._1) === ((0L until 20L).toSet + 100L))
    // equality filters still take the pv/static path (regression guard)
    Seq((7L, "e", "g1")).toDF("id", "s", "grp")
      .writeTo(s"$cat.t").overwrite(col("grp") === "g1" && col("id") === 7L)
  }
}
