package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** LOG RETENTION: cleanupLog bounds `_txlog/` growth by deleting commit
  * files below a checkpoint that serves as the replay base. Reads at or
  * above the cut are unchanged; below it they fail loudly; incremental
  * readers refuse a pre-cut range instead of silently omitting changes;
  * VACUUM after a cleanup must not eat live files whose adding commit
  * was cleaned (the checkpoint, not the commits, proves liveness). */
class TxLogCleanupSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txclean").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  private def logFiles(dir: String): Set[String] = {
    val ld = java.nio.file.Paths.get(dir, "_txlog")
    val s = Files.list(ld)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toSet
    } finally s.close()
  }

  test("cleanup cuts at a checkpoint; reads above survive, below fail loudly") {
    val dir = tmp()
    (0 until 25).foreach(i => TxLog.append(spark, dir, df(i * 2 until i * 2 + 2)))
    val n = TxLog.cleanupLog(dir, retainVersions = 5)
    assert(n > 0)
    // the cut lands at checkpoint 20 (newest ckpt at or below 25-5=20)
    assert(!logFiles(dir).contains(f"${0L}%020d.json"))
    assert(!logFiles(dir).contains(f"${19L}%020d.json"))
    assert(logFiles(dir).contains(f"${20L}%020d.json"))
    assert(logFiles(dir).contains(f"${20L}%020d.ckpt.json"))
    // head and in-window time travel unchanged
    assert(TxLog.read(spark, dir).count() === 50L)
    assert(TxLog.read(spark, dir, Some(21L)).count() === 44L)
    // below the cut: loud failure, never a partial replay
    intercept[TxLog.VersionNotFoundException] {
      TxLog.snapshot(dir, Some(3L))
    }
    // idempotent: nothing more to delete at the same retention
    assert(TxLog.cleanupLog(dir, retainVersions = 5) === 0)
  }

  test("cleanup writes a fresh checkpoint when none exists at the cut") {
    val dir = tmp()
    (0 until 7).foreach(i => TxLog.append(spark, dir, df(i until i + 1)))
    // no checkpoint exists yet (interval = 10); retain 3 → cut at 4
    assert(TxLog.cleanupLog(dir, retainVersions = 3) === 4)
    assert(logFiles(dir).contains(f"${4L}%020d.ckpt.json"))
    assert(TxLog.read(spark, dir).count() === 7L)
    assert(TxLog.snapshot(dir, Some(4L)).rows === 5L)
  }

  test("VACUUM after a cleanup keeps live files the cleaned commits added") {
    val dir = tmp()
    (0 until 25).foreach(i => TxLog.append(spark, dir, df(i * 2 until i * 2 + 2)))
    TxLog.cleanupLog(dir, retainVersions = 5)
    // every live file's adding commit (< 20) is gone from the log; the
    // orphan rule must consult the checkpointed snapshots, not commits
    val reclaimed = TxLog.vacuum(dir, retainVersions = 1, staleStagingMillis = 0L)
    assert(TxLog.read(spark, dir).count() === 50L,
      s"vacuum ate live files after log cleanup: $reclaimed")
  }

  test("incremental readers refuse a pre-cut range instead of omitting changes") {
    val dir = tmp()
    (0 until 25).foreach(i => TxLog.append(spark, dir, df(i * 2 until i * 2 + 2)))
    TxLog.cleanupLog(dir, retainVersions = 5)
    val e = intercept[IllegalStateException] {
      TxLog.changedFilesBetween(dir, -1L, 24L)
    }
    assert(e.getMessage.contains("log cleanup"))
    intercept[IllegalStateException](TxLog.readChanges(spark, dir, 3L))
    // from the cut onward the stream range serves fine (2 files/commit)
    assert(TxLog.changedFilesBetween(dir, 19L, 24L).size === 10)
    assert(TxLog.readChanges(spark, dir, 19L).count() === 10L)
    // a FRESH stream on the cleaned table fails at source; an explicit
    // startingVersion at/after the cut works
    val root = java.nio.file.Paths.get(dir).getParent.toString
    intercept[Exception] {
      val q = spark.readStream.format("txlog").option("path", dir).load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/ckpt-fresh")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q2 = spark.readStream.format("txlog").option("path", dir)
      .option("startingVersion", "20").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("id").collect().foreach(r => got.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", s"$root/ckpt-sv")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === (40L until 50L).toSet)
  }

  test("CALL cleanup_log from SQL") {
    val root = graft.Scratch.dir("graft-txclean-call").toString
    val cat = "clg" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (0 until 12).foreach(i => TxLog.append(spark, s"$root/t", df(i until i + 1)))
    val n = spark.sql(
      s"CALL $cat.cleanup_log(`table` => 't', retain_versions => 2)")
      .head().getInt(0)
    assert(n === 10)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 12L)
  }
}
