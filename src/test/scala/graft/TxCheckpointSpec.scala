package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Scalable snapshot resolution: multi-part checkpoints (JSONL shards
  * readable as a DataFrame), the `_last_checkpoint` pointer that picks
  * the replay base without scanning the checkpoint listing, and
  * snapshot memoization keyed by (dir, version).
  *
  * The invariant: checkpoints and pointers are ACCELERATORS — every
  * state they serve must equal the state a raw commit-by-commit replay
  * produces, and a missing/stale/corrupt pointer or a sharded layout
  * must never change a query answer. */
class TxCheckpointSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txckpt").toString + "/t"

  private def df(i: Int) = {
    import spark.implicits._
    (i * 10 until i * 10 + 10).map(j => (j.toLong, s"v$j")).toDF("id", "s")
  }

  private def logNames(dir: String): Seq[String] = {
    val s = Files.list(Paths.get(dir, "_txlog"))
    try s.iterator().asScala.map(_.getFileName.toString).toList.sorted
    finally s.close()
  }

  test("multi-part checkpoint: shards + pointer written; replay equals raw") {
    val dir = tmp()
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      // 11 commits × 2 files = 22 live files; the v10 checkpoint must
      // shard into ceil(22/8) = 3 parts — PARQUET under a live session
      // (FORMAT.md §3 v2; JSONL shards remain readable, see the
      // synthetic logs in DistributedPlanSpec/DistributedDmlPlanSpec)
      (0 until 11).foreach(i => TxLog.append(spark, dir, df(i).repartition(2)))
      val names = logNames(dir)
      assert(names.contains("00000000000000000010.ckpt.json"))
      assert(names.count(_.matches("00000000000000000010\\.ckpt\\.part-\\d{5}-of-00003\\.parquet")) === 3)
      assert(names.contains("_last_checkpoint"))
      // the distributed read of the file listing sees every shard line
      val listed = TxLog.checkpointFilesDf(spark, dir, 10L)
      assert(listed.nonEmpty && listed.get.count() === 22L)
      assert(listed.get.agg(org.apache.spark.sql.functions.sum("rows"))
        .head().getLong(0) === 110L)
      // replay THROUGH the sharded checkpoint (+ a post-checkpoint tail)
      // serves exactly the raw state
      TxLog.append(spark, dir, df(11).repartition(2))
      TxLog.invalidateSnapshots(dir) // force a cold re-resolution
      val snap = TxLog.snapshot(dir)
      assert(snap.files.size === 24)
      assert(TxLog.read(spark, dir).count() === 120L)
      // time travel BELOW the checkpoint still replays from raw commits
      assert(TxLog.read(spark, dir, versionAsOf = Some(4L)).count() === 50L)
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("stale or corrupt _last_checkpoint falls back to the listing") {
    val dir = tmp()
    (0 until 12).foreach(i => TxLog.append(spark, dir, df(i).coalesce(1)))
    val ptr = Paths.get(dir, "_txlog", "_last_checkpoint")
    assert(Files.exists(ptr))
    // pointer names a checkpoint that does not exist → ignored
    Files.write(ptr, """{"version":9997,"parts":0}""".getBytes)
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.read(spark, dir).count() === 120L)
    // unparseable pointer → ignored
    Files.write(ptr, "garbage".getBytes)
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.read(spark, dir).count() === 120L)
    // pointer gone entirely → ignored
    Files.delete(ptr)
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.read(spark, dir).count() === 120L)
  }

  test("log cleanup removes a dropped checkpoint's shards with its manifest") {
    val dir = tmp()
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 4
    try {
      (0 until 31).foreach(i => TxLog.append(spark, dir, df(i).coalesce(1)))
      assert(logNames(dir).exists(_.startsWith("00000000000000000010.ckpt.part-")))
      // retain 3 → cut at the v20 checkpoint: v10's manifest AND shards go
      assert(TxLog.cleanupLog(dir, retainVersions = 3) > 0)
      val names = logNames(dir)
      assert(!names.contains("00000000000000000010.ckpt.json"))
      assert(!names.exists(_.startsWith("00000000000000000010.ckpt.part-")))
      // retained state replays through the surviving sharded checkpoint
      TxLog.invalidateSnapshots(dir)
      assert(TxLog.read(spark, dir).count() === 310L)
      assert(TxLog.read(spark, dir, versionAsOf = Some(20L)).count() === 210L)
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("snapshot memoization: repeat resolutions are the same instance; dropTable invalidates") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0))
    val a = TxLog.snapshot(dir)
    val b = TxLog.snapshot(dir)
    assert(a eq b, "a committed version's snapshot memoizes")
    assert(TxLog.snapshot(dir, Some(0L)) eq a)
    // a new commit yields a new version — not served from the old entry
    TxLog.append(spark, dir, df(1))
    val c = TxLog.snapshot(dir)
    assert(c.version === 1L && (c ne a))
    // dropping and re-creating at the SAME path must not serve the old
    // table's cached state
    TxLog.dropTable(dir)
    TxLog.append(spark, dir, df(7))
    val fresh = TxLog.snapshot(dir)
    assert(fresh.version === 0L)
    assert(TxLog.read(spark, dir).count() === 10L)
    assert(TxLog.read(spark, dir).select("id").head().getLong(0) >= 70L)
  }

  test("graft.checkpointInterval: per-table cadence; replay unchanged") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0)) // v0
    TxLog.setProperties(dir,
      Map(TxLog.Checkpoints.Interval -> "3")) // v1
    (1 to 4).foreach(i => TxLog.append(spark, dir, df(i))) // v2..v5
    val names = logNames(dir)
    // v3 checkpointed under the table's own interval; default-10 would
    // have written nothing yet
    assert(names.contains("00000000000000000003.ckpt.json"))
    assert(!names.exists(n => n.contains(".ckpt.json") &&
      !n.startsWith("00000000000000000003")))
    // interval change is a property like any other: visible in the head
    assert(TxLog.snapshot(dir).props(TxLog.Checkpoints.Interval) === "3")
    // replay through the early checkpoint serves the raw state
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.read(spark, dir).count() === 50L)
    // tombstone returns the table to the default cadence: v6 (empty
    // string) and v7..v8 commit without a v6 checkpoint
    TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "")) // v6
    (5 to 6).foreach(i => TxLog.append(spark, dir, df(i))) // v7, v8
    assert(!logNames(dir).exists(n =>
      n.startsWith("00000000000000000006") && n.contains("ckpt")))
    // malformed values refuse loudly at SET time
    val e = intercept[IllegalArgumentException] {
      TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "zero"))
    }
    assert(e.getMessage.contains("integer"))
    intercept[IllegalArgumentException] {
      TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "0"))
    }
  }
}
