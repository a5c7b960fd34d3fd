package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** DROP FEATURE with history truncation: the only way a capability can
  * LEAVE a table's requirement set. The drop must verify the feature is
  * genuinely unused (un-gating live deletion vectors would resurrect
  * deleted rows for readers that skip them), the checkpoint must
  * re-state the REDUCED set, and truncation must make a legacy reader —
  * one that never learned the feature — read the table again. */
class TxDropFeatureSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  private def withReaderCaps[A](caps: Set[String])(body: => A): A = {
    val prev = TxLog.readerCapabilities
    TxLog.readerCapabilities = caps
    try body finally TxLog.readerCapabilities = prev
  }

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"v$i")).toDF("id", "s")
  }

  private def legacyRead(dir: String): Long = withReaderCaps(
    TxLog.supportedFeatures - "deletionVectors") {
    TxLog.invalidateSnapshots(dir) // a FRESH legacy reader, no warm cache
    TxLog.read(spark, dir).count()
  }

  test("gate, purge, drop, truncate: a pre-DV reader reads the table again") {
    val dir = tmp("dropfeat")
    TxLog.append(spark, dir, df(1L to 20L: _*))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id % 4 = 1") // merge-on-read: live DVs exist

    // a legacy reader refuses BY NAME while the feature is required
    val e = intercept[TxLog.UnsupportedProtocolException](legacyRead(dir))
    assert(e.getMessage.contains("deletionVectors"))

    // the drop verifies genuine unuse, in order: property, then live DVs
    assert(intercept[IllegalArgumentException](
      TxLog.dropFeature(spark, dir, "deletionVectors"))
      .getMessage.contains("disable"))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    assert(intercept[IllegalArgumentException](
      TxLog.dropFeature(spark, dir, "deletionVectors"))
      .getMessage.contains("purgeDeletes"))
    TxLog.purgeDeletes(spark, dir)
    val v = TxLog.dropFeature(spark, dir, "deletionVectors")

    // requirement gone: reduced features/protocol, legacy reader green
    val snap = TxLog.snapshot(dir)
    assert(snap.features.isEmpty && snap.wfeatures.isEmpty && snap.protocol === 1L)
    assert(legacyRead(dir) === 15L)
    assert(TxLog.read(spark, dir).where("id % 4 = 1").count() === 0L,
      "deleted rows must STAY deleted through purge + drop")
    // history truncated: time travel below the drop is gone
    intercept[TxLog.VersionNotFoundException] {
      TxLog.read(spark, dir, versionAsOf = Some(v - 1)): Unit
    }
  }

  test("re-enabling after a drop re-stamps and re-gates (the marker is positional)") {
    val dir = tmp("dropfeat-re")
    TxLog.append(spark, dir, df(1L to 12L: _*))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 3")
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    TxLog.purgeDeletes(spark, dir)
    TxLog.dropFeature(spark, dir, "deletionVectors")
    assert(legacyRead(dir) === 11L)

    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 5") // stamps the feature AFTER the drop
    assert(TxLog.snapshot(dir).features === Set("deletionVectors"))
    intercept[TxLog.UnsupportedProtocolException](legacyRead(dir))
    assert(TxLog.read(spark, dir).count() === 10L)
  }

  test("drop on a SHARDED base: liveness probed distributed, manifest re-states reduced set") {
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 4
    try {
      val dir = tmp("dropfeat-shard")
      TxLog.append(spark, dir, df(1L to 8L: _*).repartition(8))
      TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "3"))
      TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(spark, dir, "id IN (2, 6)")
      (0 until 3).foreach(i => TxLog.append(spark, dir, df(100L + i)))
      assert(TxLog.planningMeta(dir, None).exists(_.ckptBase.nonEmpty),
        "expected a sharded replay base")
      // live DVs refuse through the DISTRIBUTED probe
      TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
      assert(intercept[IllegalArgumentException](
        TxLog.dropFeature(spark, dir, "deletionVectors"))
        .getMessage.contains("purgeDeletes"))
      TxLog.purgeDeletes(spark, dir)
      TxLog.dropFeature(spark, dir, "deletionVectors")
      assert(legacyRead(dir) === 9L)
      assert(TxLog.snapshot(dir).features.isEmpty)
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("truncateHistory=false reduces the requirement but cannot un-gate a legacy reader") {
    val dir = tmp("dropfeat-notrunc")
    TxLog.append(spark, dir, df(1L to 10L: _*))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 4")
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    TxLog.purgeDeletes(spark, dir)
    val v = TxLog.dropFeature(spark, dir, "deletionVectors", truncateHistory = false)
    // capable readers see the reduced requirement...
    val snap = TxLog.snapshot(dir)
    assert(snap.features.isEmpty && snap.protocol === 1L)
    // ...but a legacy reader still refuses MID-REPLAY on the pre-drop
    // commits that name the feature — truncation, not the marker, is
    // what un-gates (the documented Delta semantics)
    intercept[TxLog.UnsupportedProtocolException](legacyRead(dir))
    // a later log-retention cut past the drop completes the un-gating
    // (cleanupLog writes the cut checkpoint itself — reduced manifest)
    TxLog.cleanupLog(dir, retainVersions =
      (TxLog.latestVersion(dir) - v + 1).toInt): Unit
    assert(legacyRead(dir) === 9L)
  }

  test("drop → re-enable → checkpoint → fresh replay keeps the re-stamped feature") {
    val dir = tmp("dropfeat-reckpt")
    TxLog.append(spark, dir, df(1L to 12L: _*))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 3")
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    TxLog.purgeDeletes(spark, dir)
    TxLog.dropFeature(spark, dir, "deletionVectors")

    // re-enable AFTER the drop, then let a checkpoint land on top: the
    // manifest's cumulative props still carry the positional drop marker,
    // but its features list states the net (re-stamped) set — a fresh
    // replay from that checkpoint must NOT re-subtract the marker
    TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "1"))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 5") // stamps the feature post-drop, then checkpoints
    TxLog.invalidateSnapshots(dir)     // force replay FROM the new checkpoint
    val snap = TxLog.snapshot(dir)
    assert(snap.features === Set("deletionVectors"),
      "checkpoint replay stripped a feature re-enabled after a drop")
    assert(snap.protocol === 3L) // deletionVectors' legacy int
    // the reader gate still fires on the freshly replayed snapshot…
    intercept[TxLog.UnsupportedProtocolException](legacyRead(dir))
    // …and the WRITER gate still refuses a DV-ignorant writer — this is
    // the resurrect-deleted-rows corruption the subtraction bug opened
    val prevW = TxLog.writerCapabilities
    TxLog.writerCapabilities = TxLog.supportedWriterFeatures - "deletionVectors"
    try intercept[TxLog.UnsupportedWriterFeatureException](
      TxLog.append(spark, dir, df(99L)): Unit)
    finally TxLog.writerCapabilities = prevW
    assert(TxLog.read(spark, dir).count() === 10L)
  }

  test("a commit race between DV verification and publish re-runs the liveness probe") {
    val dir = tmp("dropfeat-race")
    TxLog.append(spark, dir, df(1L to 8L: _*))
    // the initial verification sees a clean table; a concurrent
    // enable → DV-creating delete → disable lands BEFORE our publish —
    // net property state looks clean at the new head, but live DVs exist
    @volatile var sneaked = false
    val racingStore = new graft.sources.LogStore {
      override def putIfAbsent(target: java.nio.file.Path,
          content: Array[Byte]): Boolean = {
        val s = new String(content, java.nio.charset.StandardCharsets.UTF_8)
        if (!sneaked && s.contains("\"op\":\"dropFeature\"")) {
          sneaked = true
          TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
          TxLog.delete(spark, dir, "id = 2") // merge-on-read: live DV
          TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
          false // the drop lost this version to the concurrent sequence
        } else graft.sources.HardLinkLogStore.putIfAbsent(target, content)
      }
      override def putOverwrite(target: java.nio.file.Path,
          content: Array[Byte]): Unit =
        graft.sources.HardLinkLogStore.putOverwrite(target, content)
    }
    val prev = TxLog.logStore
    TxLog.logStore = racingStore
    try {
      val e = intercept[IllegalArgumentException](
        TxLog.dropFeature(spark, dir, "deletionVectors"))
      assert(e.getMessage.contains("purgeDeletes"),
        s"rebase must re-run the live-DV probe, got: ${e.getMessage}")
    } finally TxLog.logStore = prev
    assert(sneaked, "the race hook never fired")
    // the feature survived the failed drop; deleted row stays deleted
    assert(TxLog.snapshot(dir).features === Set("deletionVectors"))
    assert(TxLog.read(spark, dir).count() === 7L)
  }

  test("a writer-ONLY feature drops symmetrically: identityColumns") {
    import spark.implicits._
    val dir = tmp("dropfeat-wonly")
    TxLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    TxLog.addIdentityColumn(spark, dir, "id")
    assert(TxLog.snapshot(dir).wfeatures.contains("identityColumns"))
    val prevW = TxLog.writerCapabilities
    // an identity-ignorant writer refuses while the spec lives…
    TxLog.writerCapabilities = TxLog.supportedWriterFeatures - "identityColumns"
    try intercept[TxLog.UnsupportedWriterFeatureException](
      TxLog.append(spark, dir, Seq((9L, "z")).toDF("id", "s")): Unit)
    finally TxLog.writerCapabilities = prevW
    // …and the drop refuses while the spec lives (un-gating now would
    // let that writer append rows without allocated ids)
    assert(intercept[IllegalArgumentException](
      TxLog.dropFeature(spark, dir, "identityColumns"))
      .getMessage.contains("still live"))
    // tombstone the spec, then drop WITHOUT truncation: writer features
    // never gate replay (readers don't check them), so the positional
    // marker alone un-gates a legacy writer — symmetric to the
    // reader-feature path where truncation is load-bearing
    TxLog.setProperties(dir, Map(TxLog.Identity.Prefix + "id" -> ""))
    TxLog.dropFeature(spark, dir, "identityColumns", truncateHistory = false)
    val snap = TxLog.snapshot(dir)
    assert(!snap.wfeatures.contains("identityColumns"))
    TxLog.writerCapabilities = TxLog.supportedWriterFeatures - "identityColumns"
    try assert(TxLog.append(spark, dir, Seq((9L, "z")).toDF("id", "s")) > 0L)
    finally TxLog.writerCapabilities = prevW
    assert(TxLog.read(spark, dir).count() === 3L)
    // re-enabling re-stamps and re-gates, the positional rule
    TxLog.addIdentityColumn(spark, dir, "id")
    assert(TxLog.snapshot(dir).wfeatures.contains("identityColumns"))
    TxLog.writerCapabilities = TxLog.supportedWriterFeatures - "identityColumns"
    try intercept[TxLog.UnsupportedWriterFeatureException](
      TxLog.append(spark, dir, Seq((12L, "y")).toDF("id", "s")): Unit)
    finally TxLog.writerCapabilities = prevW
  }

  test("a later CROSS-FEATURE drop must not re-subtract an earlier drop's feature") {
    // drop(deletionVectors) → re-enable DV + DV-creating delete →
    // drop(identityColumns): a cumulative drop marker would carry
    // deletionVectors into the SECOND drop commit and replay would
    // subtract it there — with no DV-liveness check (the identity drop
    // verifies only identity specs) and truncateHistory cementing the
    // reduced set into the checkpoint manifest, a legacy reader would
    // stop refusing and resurrect the deleted rows
    val dir = tmp("dropfeat-cross")
    TxLog.append(spark, dir, df(1L to 12L: _*))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 3")
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    TxLog.purgeDeletes(spark, dir)
    TxLog.dropFeature(spark, dir, "deletionVectors")
    // re-enable: DVs live again — the feature is BACK in real use
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 5") // merge-on-read: live DV
    // an unrelated writer-only feature comes and goes…
    TxLog.addIdentityColumn(spark, dir, "id")
    TxLog.setProperties(dir, Map(TxLog.Identity.Prefix + "id" -> ""))
    TxLog.dropFeature(spark, dir, "identityColumns") // truncates history
    // …and deletionVectors must still be required afterwards
    TxLog.invalidateSnapshots(dir) // fresh replay from the drop's checkpoint
    val snap = TxLog.snapshot(dir)
    assert(snap.features === Set("deletionVectors"),
      "identityColumns drop stripped the re-enabled deletionVectors requirement")
    assert(snap.protocol === 3L)
    assert(!snap.wfeatures.contains("identityColumns"))
    intercept[TxLog.UnsupportedProtocolException](legacyRead(dir))
    assert(TxLog.read(spark, dir).count() === 10L,
      "deleted rows must stay deleted through the cross-feature drop")
  }

  test("the raw marker and undroppable features refuse loudly") {
    val dir = tmp("dropfeat-guard")
    TxLog.append(spark, dir, df(1L, 2L))
    assert(intercept[IllegalArgumentException](
      TxLog.setProperties(dir, Map(TxLog.DroppedFeatures.Key -> "deletionVectors")))
      .getMessage.contains("dropFeature"))
    assert(intercept[IllegalArgumentException](
      TxLog.dropFeature(spark, dir, "columnMapping"))
      .getMessage.contains("not droppable"))
    assert(intercept[IllegalArgumentException](
      TxLog.dropFeature(spark, dir, "futureFeature"))
      .getMessage.contains("unknown"))
  }
}
