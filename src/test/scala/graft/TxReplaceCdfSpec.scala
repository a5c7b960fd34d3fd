package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Change-feed completeness for the replace family: overwrite,
  * replaceWhere (predicate / value-set / static-eq), and dynamic
  * partition overwrite emit the REMOVED rows as `delete` changes and
  * the incoming rows as `insert` changes when the feed is enabled —
  * and a HISTORICAL replace commit without change files refuses the
  * feed loudly instead of silently omitting its removals. */
class TxReplaceCdfSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-replcdf").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
  }

  private def changes(dir: String, fromEx: Long): Map[String, Set[Long]] =
    TxLog.readChangeFeed(spark, dir, fromEx).collect()
      .groupBy(_.getString(3)).map { case (t, rs) =>
        t -> rs.map(_.getLong(0)).toSet }

  test("replaceWhere emits deletes of the replaced band + inserts") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val v0 = TxLog.latestVersion(dir)
    import spark.implicits._
    TxLog.replaceWhere(spark, dir,
      Seq((5L, "r", "gX")).toDF("id", "s", "grp"), "id < 10")
    val ch = changes(dir, v0)
    assert(ch("delete") === (0L until 10L).toSet)
    assert(ch("insert") === Set(5L))
  }

  test("full overwrite emits the whole change set") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 8))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val v0 = TxLog.latestVersion(dir)
    TxLog.overwrite(spark, dir, df(100 until 105))
    val ch = changes(dir, v0)
    assert(ch("delete") === (0L until 8L).toSet)
    assert(ch("insert") === (100L until 105L).toSet)
  }

  test("dynamic partition overwrite emits per-partition deletes + inserts") {
    val dir = tmp()
    TxLog.appendPartitioned(spark, dir, df(0 until 30), Seq("grp"))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val v0 = TxLog.latestVersion(dir)
    import spark.implicits._
    TxLog.overwritePartitions(spark, dir,
      Seq((1000L, "r", "g1")).toDF("id", "s", "grp"))
    val ch = changes(dir, v0)
    assert(ch("delete") === (0L until 30L).filter(_ % 3 == 1).toSet)
    assert(ch("insert") === Set(1000L))
  }

  test("historical replace without change files refuses the feed loudly") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10))
    val vPre = TxLog.latestVersion(dir)
    TxLog.overwrite(spark, dir, df(50 until 55))   // CDF off: no change files
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val e = intercept[IllegalStateException](
      TxLog.readChangeFeed(spark, dir, vPre - 1).collect())
    assert(e.getMessage.contains("replaced rows"))
    // a range past the gap serves normally
    TxLog.append(spark, dir, df(200 until 203))
    val ch = changes(dir, TxLog.latestVersion(dir) - 1)
    assert(ch("insert") === (200L until 203L).toSet)
  }
}

/** RESTORE on the change feed: the commit carries the exact row-level
  * diff (rows that disappear as deletes, rows that reappear as
  * inserts); a schema-changing restore refuses while the feed is on;
  * a historical restore without change files refuses the feed. */
class TxRestoreCdfSpec extends AnyFunSuite with SparkTestBase {

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  test("restore emits the row-level diff as delete/insert changes") {
    val dir = graft.Scratch.dir("graft-restorecdf").toString + "/t"
    TxLog.append(spark, dir, df(0 until 10))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val vKeep = TxLog.latestVersion(dir)
    TxLog.delete(spark, dir, "id < 3")      // rows 0,1,2 out
    TxLog.append(spark, dir, df(50 until 53))
    val vPre = TxLog.latestVersion(dir)
    TxLog.restore(spark, dir, vKeep)        // 0,1,2 back; 50..52 gone
    val ch = TxLog.readChangeFeed(spark, dir, vPre).collect()
      .groupBy(_.getString(2)).map { case (t, rs) =>
        t -> rs.map(_.getLong(0)).toSet }
    assert(ch("insert") === Set(0L, 1L, 2L))
    assert(ch("delete") === Set(50L, 51L, 52L))
  }

  test("historical restore without change files refuses the feed") {
    val dir = graft.Scratch.dir("graft-restorecdf2").toString + "/t"
    TxLog.append(spark, dir, df(0 until 6))
    val vKeep = TxLog.latestVersion(dir)
    TxLog.append(spark, dir, df(10 until 12))
    val vPre = TxLog.latestVersion(dir)
    TxLog.restore(spark, dir, vKeep)        // CDF off: invisible move
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true"))
    val e = intercept[IllegalStateException](
      TxLog.readChangeFeed(spark, dir, vPre).collect())
    assert(e.getMessage.contains("restore"))
  }
}
