package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Writer features (FORMAT.md §5, the write-side half of Delta's split
  * table-features protocol): a committer must declare every capability
  * the table requires BEFORE mutating it, because a feature-ignorant
  * writer corrupts invariants it cannot see — committing files without
  * row ids, resurrecting DV-deleted rows, vacuuming DV sidecars as
  * orphans. Readers never check writer features; that asymmetry (writes
  * refuse, reads stay green) is the contract under test. */
class WriterFeaturesSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"v$i")).toDF("id", "s")
  }

  private def withCaps[A](caps: Set[String])(body: => A): A = {
    val prev = TxLog.writerCapabilities
    TxLog.writerCapabilities = caps
    try body finally TxLog.writerCapabilities = prev
  }

  private def refuses(name: String)(op: => Any): Unit = {
    val e = intercept[TxLog.UnsupportedWriterFeatureException](op)
    assert(e.getMessage.contains(name), s"refusal must name '$name': ${e.getMessage}")
  }

  test("a stripped writer refuses EVERY mutation path by name; reads stay green") {
    val dir = tmp("wf-strip")
    TxLog.append(spark, dir, df(1L, 2L, 3L))
    TxLog.setProperties(dir, Map(
      TxLog.DeletionVectors.Enabled -> "true",
      TxLog.Cdf.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 3") // a real DV + change feed exist
    val vBefore = TxLog.latestVersion(dir)

    withCaps(TxLog.supportedWriterFeatures -- Set("deletionVectors")) {
      // every write path refuses BEFORE touching the table
      refuses("deletionVectors")(TxLog.append(spark, dir, df(9L)))
      refuses("deletionVectors")(TxLog.appendBatch(spark, dir, df(9L), "app", 0L))
      refuses("deletionVectors")(TxLog.appendEvolve(spark, dir, df(9L)))
      refuses("deletionVectors")(TxLog.overwrite(spark, dir, df(9L)))
      refuses("deletionVectors")(TxLog.delete(spark, dir, "id = 1"))
      refuses("deletionVectors")(TxLog.update(spark, dir, "id = 1", Map("s" -> "'x'")))
      refuses("deletionVectors")(TxLog.merge(spark, dir, df(1L), Seq("id")))
      refuses("deletionVectors")(TxLog.optimize(spark, dir))
      refuses("deletionVectors")(TxLog.truncate(spark, dir))
      refuses("deletionVectors")(TxLog.restore(spark, dir, 0L))
      refuses("deletionVectors")(TxLog.setProperties(dir, Map("x" -> "y")))
      refuses("deletionVectors")(TxLog.vacuum(dir)) // publishes no commit — gated anyway
      // nothing landed
      assert(TxLog.latestVersion(dir) === vBefore)
      // reads are unaffected: scan, time travel, change feed
      assert(TxLog.read(spark, dir).count() === 2L)
      assert(TxLog.read(spark, dir, Some(1L)).count() === 3L)
      assert(TxLog.readChangeFeed(spark, dir, 1L, None)
        .where("_change_type = 'delete'").count() === 1L)
    }
    // capabilities restored: the same writes succeed again
    TxLog.append(spark, dir, df(9L))
    assert(TxLog.read(spark, dir).count() === 3L)
  }

  test("legacy tables gate from properties alone (no persisted wfeatures)") {
    val dir = tmp("wf-legacy")
    TxLog.append(spark, dir, df(1L, 2L))
    // hand-write a LEGACY property commit: enables DVs, stamps nothing
    Files.writeString(Paths.get(dir, "_txlog").resolve(f"${1L}%020d.json"),
      """{"version":1,"op":"setProperties","ts":0,"adds":[],"removes":[],""" +
        s""""props":{"${TxLog.DeletionVectors.Enabled}":"true"}}""")
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.snapshot(dir).wfeatures.isEmpty, "legacy log persists none")
    withCaps(TxLog.supportedWriterFeatures -- Set("deletionVectors")) {
      refuses("deletionVectors")(TxLog.append(spark, dir, df(9L)))
      assert(TxLog.read(spark, dir).count() === 2L)
    }
  }

  test("an unknown FUTURE writer feature refuses writes by name; reads stay green") {
    val dir = tmp("wf-future")
    TxLog.append(spark, dir, df(1L, 2L))
    Files.writeString(Paths.get(dir, "_txlog").resolve(f"${1L}%020d.json"),
      """{"version":1,"op":"x","ts":0,"adds":[],"removes":[],""" +
        """"wfeatures":["vectorIndexMaintenance"]}""")
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.read(spark, dir).count() === 2L, "reader never checks wfeatures")
    refuses("vectorIndexMaintenance")(TxLog.append(spark, dir, df(9L)))
    refuses("vectorIndexMaintenance")(TxLog.delete(spark, dir, "id = 1"))
  }

  test("capability-enabling commits stamp wfeatures; checkpoints carry them forward") {
    val dir = tmp("wf-stamp")
    TxLog.append(spark, dir, df(1L, 2L))
    val v = TxLog.setProperties(dir, Map(
      TxLog.DeletionVectors.Enabled -> "true",
      TxLog.Cdf.Enabled -> "true"))
    val commit = Files.readString(
      Paths.get(dir, "_txlog").resolve(f"$v%020d.json"))
    assert(commit.contains("\"wfeatures\":[\"changeDataFeed\",\"deletionVectors\"]"))
    assert(TxLog.snapshot(dir).wfeatures ===
      Set("deletionVectors", "changeDataFeed"))
    // rename introduces column mapping — stamped in the same commit
    val v2 = TxLog.renameColumn(dir, "s", "t")
    assert(Files.readString(Paths.get(dir, "_txlog").resolve(f"$v2%020d.json"))
      .contains("\"wfeatures\":[\"columnMapping\"]"))
    // a checkpoint manifest re-states the cumulative union, so the
    // requirement survives a log-retention trim of the stamping commits
    TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "1"))
    val v3 = TxLog.append(spark, dir, df(9L).withColumnRenamed("s", "t"))
    val ckpt = Files.readString(
      Paths.get(dir, "_txlog").resolve(f"$v3%020d.ckpt.json"))
    assert(ckpt.contains("changeDataFeed") && ckpt.contains("deletionVectors")
      && ckpt.contains("columnMapping"))
    assert(TxLog.snapshotMeta(dir).wfeatures ===
      Set("deletionVectors", "changeDataFeed", "columnMapping"))
  }

  test("row tracking implies the gate even mid-pipeline (enable, strip, refuse)") {
    val dir = tmp("wf-rowtrack")
    TxLog.append(spark, dir, df(1L, 2L))
    TxLog.enableRowTracking(spark, dir)
    withCaps(TxLog.supportedWriterFeatures -- Set("rowTracking")) {
      refuses("rowTracking")(TxLog.append(spark, dir, df(9L)))
      refuses("rowTracking")(TxLog.optimize(spark, dir))
      assert(TxLog.read(spark, dir).where("_row_id IS NOT NULL").count() === 2L)
    }
    TxLog.append(spark, dir, df(9L)) // restored writer allocates ids again
    assert(TxLog.read(spark, dir).where("_row_id IS NOT NULL").count() === 3L)
  }
}
