package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog
import graft.sources.TxLog.{WhenMatchedDelete, WhenMatchedUpdate, WhenNotMatchedInsert}

/** Conditional multi-clause MERGE ([[TxLog.mergeClauses]]): the full
  * `WHEN MATCHED [AND c] THEN UPDATE SET …/DELETE, WHEN NOT MATCHED
  * [AND c] THEN INSERT` surface — first-firing-clause-in-order
  * semantics, partial SET lists, extra source columns that drive
  * conditions but never land, change-feed completeness, bounded touch
  * discovery, and the SQL `MERGE INTO` routing. */
class MergeClausesSpec extends AnyFunSuite with SparkTestBase {

  private def fresh(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString + "/t"

  /** (id, v, amount) × 10: id 0..9, v = "v<id>", amount = id * 10. */
  private def seed(dir: String): Unit = {
    import spark.implicits._
    TxLog.append(spark, dir,
      (0 until 10).map(i => (i.toLong, s"v$i", i * 10.0)).toDF("id", "v", "amount"))
  }

  private def state(dir: String): Map[Long, (String, Double)] =
    TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

  test("debezium-style CDC feed: delete + update + guarded insert in one commit") {
    import spark.implicits._
    val dir = fresh("cdc")
    seed(dir)
    // op feed: delete 2, update 3 -> U3/999, insert 20 -> NEW/1, and a
    // tombstone for a key that never existed (21,'d') which must no-op
    val feed = Seq(
      (2L, "x", 0.0, "d"), (3L, "U3", 999.0, "u"),
      (20L, "NEW", 1.0, "c"), (21L, "gone", 0.0, "d"))
      .toDF("id", "v", "amount", "op")
    TxLog.mergeClauses(spark, dir, feed, "id", Seq(
      WhenMatchedDelete(Some("s.op = 'd'")),
      WhenMatchedUpdate(None, Map("v" -> "s.v", "amount" -> "s.amount")),
      WhenNotMatchedInsert(Some("s.op <> 'd'"),
        Map("id" -> "s.id", "v" -> "s.v", "amount" -> "s.amount"))))
    val got = state(dir)
    assert(!got.contains(2L) && !got.contains(21L))
    assert(got(3L) === (("U3", 999.0)))
    assert(got(20L) === (("NEW", 1.0)))
    assert(got.size === 10) // 10 - 1 deleted + 1 inserted
    (0L until 10L).filter(i => i != 2 && i != 3)
      .foreach(i => assert(got(i) === ((s"v$i", i * 10.0))))
  }

  test("clause order: the FIRST firing clause wins") {
    import spark.implicits._
    val dir = fresh("order")
    seed(dir)
    val src = Seq((1L, 5.0), (2L, 500.0)).toDF("id", "thresh")
    // both rows match both clauses' key; the update fires first for
    // amount < thresh, else the delete
    TxLog.mergeClauses(spark, dir, src, "id", Seq(
      WhenMatchedUpdate(Some("t.amount < s.thresh"), Map("v" -> "'small'")),
      WhenMatchedDelete(None)))
    val got = state(dir)
    assert(!got.contains(1L)) // amount 10 >= 5 -> update skipped, delete fired
    assert(got(2L) === (("small", 20.0))) // amount 20 < 500 -> update fired first
    assert(got.size === 9)
  }

  test("matched row firing no clause keeps; unmatched source firing no insert drops") {
    import spark.implicits._
    val dir = fresh("nofire")
    seed(dir)
    val src = Seq((4L, 1.0), (30L, 2.0)).toDF("id", "x")
    TxLog.mergeClauses(spark, dir, src, "id", Seq(
      WhenMatchedUpdate(Some("t.amount > 1000"), Map("v" -> "'big'")),
      WhenNotMatchedInsert(Some("s.x > 100"),
        Map("id" -> "s.id", "v" -> "'ins'", "amount" -> "s.x"))))
    val got = state(dir)
    assert(got(4L) === (("v4", 40.0))) // matched, condition false -> untouched
    assert(!got.contains(30L)) // unmatched, insert guard false -> dropped
    assert(got.size === 10)
  }

  test("partial SET keeps unmentioned columns; expressions read both sides") {
    import spark.implicits._
    val dir = fresh("partial")
    seed(dir)
    val src = Seq((5L, 7.0)).toDF("id", "delta")
    TxLog.mergeClauses(spark, dir, src, "id", Seq(
      WhenMatchedUpdate(None, Map("amount" -> "t.amount + s.delta"))))
    val got = state(dir)
    assert(got(5L) === (("v5", 57.0))) // v untouched, amount = 50 + 7
    assert(got.size === 10)
  }

  test("star clauses: UPDATE SET * / INSERT * from like-named source columns") {
    import spark.implicits._
    val dir = fresh("star")
    seed(dir)
    val src = Seq((6L, "SIX", 600.0, "u"), (40L, "FORTY", 4.0, "c"))
      .toDF("id", "v", "amount", "op")
    TxLog.mergeClauses(spark, dir, src, "id", Seq(
      WhenMatchedUpdate(None), WhenNotMatchedInsert(None)))
    val got = state(dir)
    assert(got(6L) === (("SIX", 600.0)))
    assert(got(40L) === (("FORTY", 4.0)))
    assert(got.size === 11)
    // the extra op column drove nothing into the table
    assert(TxLog.read(spark, dir).columns.toSeq === Seq("id", "v", "amount"))
  }

  test("star clause with a missing source column refused; bad SET target refused") {
    import spark.implicits._
    val dir = fresh("refuse")
    seed(dir)
    val narrow = Seq((1L, "x")).toDF("id", "v") // no amount
    val e1 = intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, dir, narrow, "id", Seq(WhenMatchedUpdate(None)))
    }
    assert(e1.getMessage.contains("amount"))
    val src = Seq((1L, "x", 1.0)).toDF("id", "v", "amount")
    val e2 = intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, dir, src, "id", Seq(
        WhenMatchedUpdate(None, Map("nope" -> "s.v"))))
    }
    assert(e2.getMessage.contains("nope"))
  }

  test("duplicate and NULL source keys refused") {
    import spark.implicits._
    val dir = fresh("dupes")
    seed(dir)
    val dup = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("id", "v", "amount")
    intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, dir, dup, "id", Seq(WhenMatchedUpdate(None)))
    }
    val withNull = Seq((Some(1L), "a", 1.0), (None, "b", 2.0))
      .toDF("id", "v", "amount")
    intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, dir, withNull, "id", Seq(WhenMatchedUpdate(None)))
    }
  }

  test("CDF on: clause merge writes a complete change set") {
    import spark.implicits._
    val dir = fresh("cdf")
    seed(dir)
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val from = TxLog.latestVersion(dir)
    val feed = Seq((2L, "x", 0.0, "d"), (3L, "U3", 999.0, "u"),
      (20L, "NEW", 1.0, "c")).toDF("id", "v", "amount", "op")
    TxLog.mergeClauses(spark, dir, feed, "id", Seq(
      WhenMatchedDelete(Some("s.op = 'd'")),
      WhenMatchedUpdate(None),
      WhenNotMatchedInsert(Some("s.op <> 'd'"))))
    val changes = TxLog.readChangeFeed(spark, dir, from)
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(changes === Set(
      (2L, "v2", "delete"),
      (3L, "v3", "update_preimage"), (3L, "U3", "update_postimage"),
      (20L, "NEW", "insert")))
  }

  test("CDF off: a delete-bearing clause merge refuses to serve the feed") {
    import spark.implicits._
    val dir = fresh("nocdf")
    seed(dir)
    val from = TxLog.latestVersion(dir)
    val feed = Seq((2L, "x", 0.0, "d")).toDF("id", "v", "amount", "op")
    TxLog.mergeClauses(spark, dir, feed, "id", Seq(
      WhenMatchedDelete(Some("s.op = 'd'"))))
    val e = intercept[IllegalStateException] {
      TxLog.readChangeFeed(spark, dir, from).collect()
    }
    assert(e.getMessage.contains("deleted rows"))
    // a delete-free clause merge still serves (insert-class rule)
    val dir2 = fresh("nocdf2")
    seed(dir2)
    val from2 = TxLog.latestVersion(dir2)
    val feed2 = Seq((3L, "U3", 9.0, "u")).toDF("id", "v", "amount", "op")
    TxLog.mergeClauses(spark, dir2, feed2, "id", Seq(WhenMatchedUpdate(None)))
    assert(TxLog.readChangeFeed(spark, dir2, from2)
      .where("id = 3").count() >= 1L)
  }

  test("operation metrics: updated/deleted/inserted counts and bounded discovery") {
    import spark.implicits._
    val dir = fresh("metrics")
    // 4 one-file bands of 100 keys each
    val rows = (0 until 400).map(i => (i.toLong, s"v$i", i * 1.0))
      .toDF("id", "v", "amount")
    (0 until 4).foreach(b => TxLog.append(spark, dir,
      rows.where(col("id") >= b * 100 && col("id") < (b + 1) * 100).coalesce(1)))
    // all keys in band 0: 2 updates, 1 delete, 1 insert
    val feed = Seq((10L, "U", 1.0, "u"), (11L, "U", 2.0, "u"),
      (12L, "x", 0.0, "d"), (1000L, "N", 3.0, "c")).toDF("id", "v", "amount", "op")
    TxLog.mergeClauses(spark, dir, feed, "id", Seq(
      WhenMatchedDelete(Some("s.op = 'd'")),
      WhenMatchedUpdate(None),
      WhenNotMatchedInsert(Some("s.op <> 'd'"))))
    val m = TxLog.history(spark, dir).where("op = 'merge'")
      .select(explode(col("metrics"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("rows_updated") === 2L)
    assert(m("rows_deleted") === 1L)
    assert(m("rows_inserted") === 1L)
    assert(m("rows_matched") === 3L)
    assert(m("files_live") === 4L)
    assert(m("files_scanned") === 1L) // key-banded batch opens 1 of 4
    assert(m("files_touched") === 1L)
    assert(TxLog.read(spark, dir).count() === 400L) // 400 - 1 + 1
  }

  test("SQL MERGE INTO with conditional clauses routes through mergeClauses") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sqlclauses").toString
    val cat = "mc" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    seed(dir)
    Seq((2L, "x", 0.0, "d"), (3L, "U3", 999.0, "u"), (20L, "NEW", 1.0, "c"))
      .toDF("id", "v", "amount", "op").createOrReplaceTempView("cdc_feed")
    spark.sql(
      s"""MERGE INTO $cat.t t USING cdc_feed s ON t.id = s.id
         |WHEN MATCHED AND s.op = 'd' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, amount = s.amount
         |WHEN NOT MATCHED AND s.op <> 'd' THEN
         |  INSERT (id, v, amount) VALUES (s.id, s.v, s.amount)
         |""".stripMargin)
    val got = state(dir)
    assert(!got.contains(2L))
    assert(got(3L) === (("U3", 999.0)))
    assert(got(20L) === (("NEW", 1.0)))
    assert(got.size === 10)
  }

  test("SQL conditional UPDATE with partial SET and both-side expressions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sqlpartial").toString
    val cat = "mp" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    seed(dir)
    Seq((5L, 7.0), (6L, 1000.0)).toDF("id", "delta")
      .createOrReplaceTempView("deltas")
    spark.sql(
      s"""MERGE INTO $cat.t t USING deltas s ON t.id = s.id
         |WHEN MATCHED AND s.delta < 100 THEN UPDATE SET amount = t.amount + s.delta
         |""".stripMargin)
    val got = state(dir)
    assert(got(5L) === (("v5", 57.0)))
    assert(got(6L) === (("v6", 60.0))) // guard false -> untouched
    assert(got.size === 10)
  }
}
