package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Change-data-feed contract: with the property on, DELETE/UPDATE
  * persist their changed rows and readChangeFeed serves a COMPLETE
  * row-level stream (inserts synthesized from data files, deletions and
  * pre/post update images from change files); without it, a DML commit
  * in the range fails the read loudly; vacuum retires change files with
  * their commit's retention window. */
class TxChangeFeedSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txcdf").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  private def enable(dir: String): Unit =
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true")): Unit

  test("feed serves inserts, deletes, and update pre/post images") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 6)) // v0: 6 inserts
    enable(dir) // v1
    TxLog.delete(spark, dir, "id IN (1, 4)") // v2
    TxLog.update(spark, dir, "id = 2", Map("s" -> "'upd'")) // v3
    val feed = TxLog.readChangeFeed(spark, dir, fromVersionExclusive = -1L)
    val rows = feed.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val inserts = (0 until 6).map(i => (i.toLong, s"v$i", "insert", 0L)).toSet
    assert(rows === inserts ++ Set(
      (1L, "v1", "delete", 2L), (4L, "v4", "delete", 2L),
      (2L, "v2", "update_preimage", 3L), (2L, "upd", "update_postimage", 3L)))
    // an update commit must NOT double-report its postimage as an insert
    assert(feed.where("_commit_version = 3").count() === 2L)
  }

  test("incremental consumption: only changes after the remembered version") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3)) // v0
    enable(dir) // v1
    val seen = TxLog.latestVersion(dir)
    TxLog.delete(spark, dir, "id = 0") // v2
    TxLog.append(spark, dir, df(10 until 12)) // v3
    val feed = TxLog.readChangeFeed(spark, dir, fromVersionExclusive = seen)
    val types = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types === Map("delete" -> 1L, "insert" -> 2L))
  }

  test("DML without the property fails the feed loudly (no silent omission)") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    TxLog.delete(spark, dir, "id = 1") // property off: no change files
    val e = intercept[IllegalStateException](
      TxLog.readChangeFeed(spark, dir, -1L))
    assert(e.getMessage.contains(TxLog.Cdf.Enabled))
  }

  test("optimize and delete-rewrites contribute nothing; merge surfaces as inserts") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4).coalesce(1)) // v0
    enable(dir) // v1
    TxLog.optimize(spark, dir) // v2 (may no-op with 1 file)
    import spark.implicits._
    TxLog.merge(spark, dir, Seq((0L, "m0"), (9L, "m9")).toDF("id", "s"), "id") // upsert
    val feed = TxLog.readChangeFeed(spark, dir, fromVersionExclusive = 0L)
    val rows = feed.select("id", "s", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // merge = insert-class source rows; the rewritten remainder of the
    // touched file (ids 1..3) must NOT re-appear
    assert(rows === Set((0L, "m0", "insert"), (9L, "m9", "insert")))
  }

  test("vacuum retires change files outside retention; feed then fails on the gap") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4).repartition(1)) // v0
    enable(dir) // v1
    TxLog.delete(spark, dir, "id = 1") // v2 (writes a change file)
    val feedOk = TxLog.readChangeFeed(spark, dir, -1L)
    assert(feedOk.where("_change_type = 'delete'").count() === 1L)
    // push the delete commit out of the retention window
    TxLog.append(spark, dir, df(10 until 12)) // v3
    TxLog.append(spark, dir, df(12 until 14)) // v4
    val reclaimed = TxLog.vacuum(dir, retainVersions = 2, staleStagingMillis = 0L)
    assert(reclaimed.nonEmpty)
    // the live table is intact; the feed over the vacuumed range breaks
    // on the missing change file (the documented retention trade)
    assert(TxLog.read(spark, dir).count() === 7L)
    intercept[Exception](
      TxLog.readChangeFeed(spark, dir, -1L).collect())
  }

  test("streaming change feed delivers deletions incrementally across restarts") {
    val root = graft.Scratch.dir("graft-txcdfs").toString
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    def runOnce(): Seq[(Long, String, Long)] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      val q = spark.readStream.format("txlog")
        .option("path", dir).option("readChangeFeed", "true").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id", "_change_type", "_commit_version").collect()
            .foreach(r => got.synchronized {
              got += ((r.getLong(0), r.getString(1), r.getLong(2)))
            }): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSeq
    }
    TxLog.append(spark, dir, df(0 until 3).coalesce(1)) // v0
    enable(dir) // v1
    val first = runOnce()
    assert(first.map(t => (t._1, t._2)).toSet ===
      (0 until 3).map(i => (i.toLong, "insert")).toSet)
    // a deletion committed between runs arrives as a delete row
    TxLog.delete(spark, dir, "id = 1") // v2
    val second = runOnce()
    assert(second === Seq((1L, "delete", 2L)),
      s"resumed feed must deliver exactly the deletion, got $second")
    // nothing new → empty pass
    assert(runOnce().isEmpty)
  }

  test("change feed on a column-mapped table serves logical names") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir,
      Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "s", "score")) // v0
    enable(dir) // v1
    TxLog.renameColumn(dir, "score", "points") // v2
    TxLog.update(spark, dir, "id = 1", Map("points" -> "points + 1")) // v3
    val feed = TxLog.readChangeFeed(spark, dir, fromVersionExclusive = 2L)
    assert(feed.columns.toSeq === Seq("id", "s", "points", "_change_type", "_commit_version"))
    val post = feed.where("_change_type = 'update_postimage'").head()
    assert(post.getInt(2) === 11)
  }
}
