package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Table features (FORMAT.md §5, Delta's reader-features successor to
  * monotone protocol ints): commits name the capabilities a reader
  * must understand, readers refuse unknown features BY NAME, legacy
  * int-only logs imply the feature set of their version, and feature
  * commits stamp both forms so pre-features readers keep their int
  * refusal. The failure this surface exists to prevent: a reader
  * supporting deletion vectors but not type widening could never say
  * so with one int — it either refused both or misread one. */
class TxFeaturesSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  private def seed(dir: String): Unit = {
    import spark.implicits._
    TxLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
  }

  test("a DV commit stamps the named feature AND the legacy int") {
    val dir = tmp("feat-stamp")
    seed(dir)
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 1")
    val snap = TxLog.snapshot(dir)
    assert(snap.protocol === 3L)
    assert(snap.features === Set("deletionVectors"))
    val commit = Files.readString(Paths.get(dir, "_txlog")
      .resolve(f"${snap.version}%020d.json"))
    assert(commit.contains("\"protocol\":3"))
    assert(commit.contains("\"features\":[\"deletionVectors\"]"))
  }

  test("legacy int-only commits imply their feature set") {
    val dir = tmp("feat-legacy")
    seed(dir)
    // hand-write a legacy protocol-3 commit with NO features field
    Files.writeString(Paths.get(dir, "_txlog").resolve(f"${1L}%020d.json"),
      """{"version":1,"op":"append","ts":0,"adds":[],"removes":[],"protocol":3}""")
    TxLog.invalidateSnapshots(dir)
    val snap = TxLog.snapshot(dir)
    assert(snap.protocol === 3L)
    assert(snap.features === Set("columnMapping", "deletionVectors"),
      "int N implies the features of versions 2..N")
  }

  test("an unknown feature refuses BY NAME; a sibling table with known features reads") {
    val dir = tmp("feat-future")
    seed(dir)
    Files.writeString(Paths.get(dir, "_txlog").resolve(f"${1L}%020d.json"),
      """{"version":1,"op":"append","ts":0,"adds":[],"removes":[],""" +
        """"features":["columnEncryption"]}""")
    TxLog.invalidateSnapshots(dir)
    val e = intercept[TxLog.UnsupportedProtocolException](TxLog.snapshot(dir))
    assert(e.getMessage.contains("columnEncryption"),
      s"refusal must name the missing feature: ${e.getMessage}")
    // the meta path refuses identically
    intercept[TxLog.UnsupportedProtocolException](TxLog.snapshotMeta(dir))
    // the refusal is PER TABLE: this reader still serves tables using
    // only features it knows — the int could never express that
    val other = tmp("feat-known")
    seed(other)
    TxLog.setProperties(other, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, other, "id = 1")
    assert(TxLog.read(spark, other).count() === 1L)
  }

  test("an unknown feature in a checkpoint refuses too (replay base covered)") {
    val dir = tmp("feat-ckpt")
    seed(dir)
    val ld = Paths.get(dir, "_txlog")
    // a checkpoint written by a future engine, naming its new feature
    Files.writeString(ld.resolve(f"${0L}%020d.ckpt.json"),
      """{"version":0,"protocol":1,"schema":"id BIGINT,s STRING","txns":{},""" +
        """"props":{},"features":["rowTrackingV9"],"files":[]}""")
    TxLog.invalidateSnapshots(dir)
    val e = intercept[TxLog.UnsupportedProtocolException](TxLog.snapshot(dir))
    assert(e.getMessage.contains("rowTrackingV9"))
  }

  test("features survive the checkpoint round trip and meta replay") {
    val dir = tmp("feat-roundtrip")
    seed(dir)
    TxLog.setProperties(dir, Map(
      TxLog.DeletionVectors.Enabled -> "true",
      TxLog.Checkpoints.Interval -> "1"))
    TxLog.delete(spark, dir, "id = 1") // checkpointed commit, DV feature
    TxLog.invalidateSnapshots(dir)
    val snap = TxLog.snapshot(dir)
    assert(snap.features === Set("deletionVectors"))
    val meta = TxLog.snapshotMeta(dir)
    assert(meta.features === snap.features)
    val ckpt = Files.readString(Paths.get(dir, "_txlog")
      .resolve(f"${snap.version}%020d.ckpt.json"))
    assert(ckpt.contains("\"features\":[\"deletionVectors\"]"))
  }
}
