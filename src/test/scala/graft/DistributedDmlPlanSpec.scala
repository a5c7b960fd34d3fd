package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-15 closure of the one remaining O(table-file-count) driver
  * cost: the WRITE-path metadata plane. DELETE / UPDATE / MERGE touch
  * discovery, compactSmall / optimizePartition / purgeDeletes
  * candidate selection, TRUNCATE, append head resolution, the
  * streaming source's pinned state, VACUUM retention, and the
  * post-commit checkpoint itself must all run off
  * [[TxLog.snapshotMeta]] / [[TxLog.planFilesMeta]] on a sharded-base
  * table — the snapshot cache (per-file stats maps, GBs at a million
  * files) PROVABLY never materializes.
  *
  * Proof vehicle (the DistributedPlanSpec pattern): a synthetic
  * 102,400-file sharded log where only the files each operation must
  * physically open exist on disk — if any step folded the full
  * AddFile list the [[TxLog.snapshotCached]] observable trips, and if
  * any step tried to OPEN an unpruned file the scan would fail on the
  * fake path. Parity semantics (sharded result == inline result, op by
  * op) ride DmlPruneFuzzSpec's sharded trials and the suite-wide
  * sharded parity test below. */
class DistributedDmlPlanSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  /** One AddFile JSONL shard line: file i covers k ∈ [10i, 10i+9]. */
  private def line(i: Int, rows: Long = 10L, bytes: Long = 10000000L): String =
    s"""{"path":"d-seed/f${"%06d".format(i)}.parquet","rows":$rows,"bytes":$bytes,""" +
      s""""dc":true,"stats":{"k":{"t":"bigint","min":"${10L * i}","max":"${10L * i + 9}","nulls":0}}}"""

  /** Write the REAL parquet file for slot `i` (k = 10i..10i+9). */
  private def writeReal(dir: String, i: Int): Unit = {
    import spark.implicits._
    val stage = graft.Scratch.dir("graft-dmlplan-stage").toString + s"/w$i"
    (0 until 10).map(d => (10L * i + d, s"v${10L * i + d}"))
      .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator()
    val src = {
      var found: java.nio.file.Path = null
      while (part.hasNext) {
        val p = part.next()
        if (p.toString.endsWith(".parquet")) found = p
      }
      found
    }
    Files.createDirectories(Paths.get(dir, "d-seed"))
    Files.move(src, Paths.get(dir, f"d-seed/f$i%06d.parquet"),
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def buildSynthetic(dir: String, realSlots: Seq[Int],
      smallSlots: Set[Int]): Unit = {
    val ld = Paths.get(dir, "_txlog")
    Files.createDirectories(ld)
    val nFiles = 102400; val nParts = 25; val per = nFiles / nParts
    def put(name: String, content: String): Unit =
      Files.write(ld.resolve(name), content.getBytes("UTF-8")): Unit
    put("00000000000000000000.json",
      """{"version":0,"op":"create","ts":1,"schema":"k BIGINT,v STRING","adds":[],"removes":[]}""")
    put("00000000000000000001.json",
      """{"version":1,"op":"append","ts":2,"adds":[],"removes":[]}""")
    (0 until nParts).foreach { p =>
      val sb = new StringBuilder
      (p * per until (p + 1) * per).foreach { i =>
        sb.append(line(i, bytes = if (smallSlots(i)) 100L else 10000000L)).append('\n')
      }
      put(f"${1L}%020d.ckpt.part-$p%05d-of-$nParts%05d.jsonl", sb.toString)
    }
    put("00000000000000000001.ckpt.json",
      s"""{"version":1,"protocol":1,"schema":"k BIGINT,v STRING","txns":{},"props":{},"parts":$nParts}""")
    put("_last_checkpoint", s"""{"version":1,"parts":$nParts}""")
    realSlots.foreach(writeReal(dir, _))
  }

  private def assertNoSnap(dir: String): Unit =
    (0L to TxLog.latestVersion(dir)).foreach(v =>
      assert(!TxLog.snapshotCached(dir, v),
        s"version $v of $dir was materialized on the driver"))

  private def commitJson(dir: String, v: Long) =
    org.json4s.jackson.JsonMethods.parse(
      Files.readString(Paths.get(dir, "_txlog", f"$v%020d.json")))

  private def removesOf(dir: String, v: Long): Set[String] = {
    import org.json4s._
    (commitJson(dir, v) \ "removes") match {
      case JArray(rs) => rs.map { case JString(p) => p; case o => o.toString }.toSet
      case _ => Set.empty
    }
  }

  private def metric(dir: String, v: Long, name: String): Long = {
    import org.json4s._
    (commitJson(dir, v) \ "metrics" \ name) match {
      case JInt(x) => x.toLong
      case JLong(x) => x
      case o => sys.error(s"no metric $name in v$v: $o")
    }
  }

  test("DML + maintenance + append + streaming on a 102,400-file sharded log: no driver materialization, only pruned files opened") {
    val dir = tmp("dmlplan-synth")
    // real files: 55 delete, 56 update, 57 merge, 58 deleteKeys,
    // 59 DV-delete + purge, 60/61 compactSmall (small bytes)
    buildSynthetic(dir, Seq(55, 56, 57, 58, 59, 60, 61), Set(60, 61))

    // ---- compactSmall: distributed small-file discovery --------------------
    val compacted = TxLog.compactSmall(spark, dir, smallFileBytes = 1000L)
    assert(compacted === Some((2, 1)))
    val vCompact = TxLog.latestVersion(dir)
    assert(removesOf(dir, vCompact) === Set("d-seed/f000060.parquet", "d-seed/f000061.parquet"))
    assertNoSnap(dir)

    // ---- UPDATE: distributed touch discovery -------------------------------
    TxLog.update(spark, dir, "k = 560", Map("v" -> "'updated'"))
    val vUpd = TxLog.latestVersion(dir)
    assert(removesOf(dir, vUpd) === Set("d-seed/f000056.parquet"))
    assert(metric(dir, vUpd, "rows_updated") === 1L)
    assert(metric(dir, vUpd, "files_scanned") === 1L)
    assert(metric(dir, vUpd, "files_live") === 102399L) // 102400 - 2 + 1
    assertNoSnap(dir)

    // ---- DELETE (predicate) -------------------------------------------------
    TxLog.delete(spark, dir, "k >= 550 AND k <= 551")
    val vDel = TxLog.latestVersion(dir)
    assert(removesOf(dir, vDel) === Set("d-seed/f000055.parquet"))
    assert(metric(dir, vDel, "rows_deleted") === 2L)
    assert(metric(dir, vDel, "files_scanned") === 1L)
    assertNoSnap(dir)

    // ---- DELETE (keyed, the GDPR path) --------------------------------------
    import spark.implicits._
    TxLog.deleteKeys(spark, dir, Seq(580L, 581L).toDF("k"), "k")
    val vDelK = TxLog.latestVersion(dir)
    assert(removesOf(dir, vDelK) === Set("d-seed/f000058.parquet"))
    assert(metric(dir, vDelK, "rows_deleted") === 2L)
    assertNoSnap(dir)

    // ---- merge-on-read DELETE + purge ---------------------------------------
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "k = 590")
    val vDv = TxLog.latestVersion(dir)
    assert(removesOf(dir, vDv) === Set.empty) // positions only, no rewrite
    assert(metric(dir, vDv, "rows_deleted") === 1L)
    assertNoSnap(dir)
    val purged = TxLog.purgeDeletes(spark, dir)
    assert(purged === Some((1, 1))) // exactly the DV-bearing file rewrote
    val vPurge = TxLog.latestVersion(dir)
    assert(removesOf(dir, vPurge) === Set("d-seed/f000059.parquet"))
    assertNoSnap(dir)

    // ---- MERGE (keyed upsert) ------------------------------------------------
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    val src = Seq((570L, "merged"), (571L, "merged"), (99999999L, "new"))
      .toDF("k", "v")
    TxLog.merge(spark, dir, src, "k")
    val vMerge = TxLog.latestVersion(dir)
    assert(removesOf(dir, vMerge) === Set("d-seed/f000057.parquet"))
    assert(metric(dir, vMerge, "rows_matched") === 2L)
    assert(metric(dir, vMerge, "rows_inserted") === 1L)
    assert(metric(dir, vMerge, "files_scanned") === 1L)
    assertNoSnap(dir)

    // the ops above crossed the v10 checkpoint boundary: the INCREMENTAL
    // checkpoint writer must have published a new sharded base without
    // replaying the table (content correctness is pinned by the ops
    // after v10 still pruning correctly, and by the parity test below)
    assert(TxLog.latestVersion(dir) >= 10L)
    assert(Files.exists(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json")),
      "the v10 checkpoint was not written")
    val ckpt10 = org.json4s.jackson.JsonMethods.parse(
      Files.readString(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json")))
    import org.json4s._
    val parts10 = (ckpt10 \ "parts") match {
      case JInt(x) => x.toInt; case JLong(x) => x.toInt; case _ => 0
    }
    assert(parts10 >= 25, "the incremental checkpoint lost its sharding")
    assertNoSnap(dir)

    // ---- streaming source: pinned state from the meta plane ----------------
    val source = new TxLogSource(spark, dir)
    assert(source.schema.fieldNames.toSeq === Seq("k", "v"))
    source.stop()
    assertNoSnap(dir)

    // ---- append: head resolution through the meta plane --------------------
    TxLog.append(spark, dir, Seq((77770000L, "appended")).toDF("k", "v"))
    assertNoSnap(dir)

    // ---- plan parity on the touched band ------------------------------------
    // post-DML state of slots 55-61 read through the DISTRIBUTED plan:
    // the one-band scans open only real files
    val band = TxLog.planScan(spark, dir,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 550L),
        org.apache.spark.sql.sources.LessThanOrEqual("k", 619L)))
    val rows = band.flatMap { f =>
      spark.read.schema("k BIGINT, v STRING")
        .parquet(Paths.get(dir, f.path).toString)
        .where(col("k").between(550L, 619L))
        .collect().map(r => (r.getLong(0), r.getString(1)))
    }.sortBy(_._1)
    val expected = ((550L to 619L).toSet -- Set(550L, 551L, 580L, 581L, 590L))
      .toSeq.sorted.map {
        case k if k == 560L => (k, "updated")
        case k if k == 570L || k == 571L => (k, "merged")
        case k => (k, s"v$k")
      }
    assert(rows === expected)
    assertNoSnap(dir)

    // ---- TRUNCATE: metadata-only, list ∝ the commit it writes ---------------
    val vTrunc = TxLog.truncate(spark, dir)
    assert(metric(dir, vTrunc, "files_removed") >= 102390L)
    assertNoSnap(dir)
  }

  test("restore / readChanges / appendEvolve on a 102,400-file sharded log: meta-plane resolution, no driver materialization") {
    val dir = tmp("dmlplan-restore")
    buildSynthetic(dir, Seq(42), Set.empty)

    // UPDATE one row of slot 42's band: CoW rewrites f000042 → a
    // dataChange=false remainder plus a dataChange=true post-image
    TxLog.update(spark, dir, "k = 420", Map("v" -> "'updated'"))
    val vUpd = TxLog.latestVersion(dir)
    assert(removesOf(dir, vUpd) === Set("d-seed/f000042.parquet"))
    assertNoSnap(dir)

    // ---- readChanges: schema context from the meta plane, scans only
    // the WINDOW's dataChange adds (the post-image — a real file)
    val changed = TxLog.readChanges(spark, dir, fromVersionExclusive = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(changed === Seq((420L, "updated", vUpd)))
    assertNoSnap(dir)

    // ---- restore to the pre-DML version: distributed two-way diff —
    // adds = exactly the rewritten original, removes = its rewrites
    val vRestore = TxLog.restore(spark, dir, 1L)
    assert(vRestore === vUpd + 1)
    val restoredAdds = {
      import org.json4s._
      (commitJson(dir, vRestore) \ "adds") match {
        case JArray(as) => as.map(a => (a \ "path") match {
          case JString(p) => p; case o => o.toString
        }).toSet
        case _ => Set.empty[String]
      }
    }
    assert(restoredAdds === Set("d-seed/f000042.parquet"))
    assert(removesOf(dir, vRestore).forall(p =>
      p.startsWith("d-") && !p.startsWith("d-seed/")))
    assert(removesOf(dir, vRestore).size === 2) // remainder + post-image
    assertNoSnap(dir)
    // the restored band reads back whole through the distributed plan
    val band = TxLog.planScan(spark, dir,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 420L),
        org.apache.spark.sql.sources.LessThanOrEqual("k", 429L)))
    val rows = band.flatMap { f =>
      spark.read.schema("k BIGINT, v STRING")
        .parquet(Paths.get(dir, f.path).toString)
        .collect().map(_.getLong(0))
    }.sorted
    assert(rows === (420L to 429L))
    assertNoSnap(dir)

    // ---- appendEvolve: schema evolution resolves metadata-only -------------
    import spark.implicits._
    val vEvolve = TxLog.appendEvolve(spark, dir,
      Seq((99999990L, "wide", 7L)).toDF("k", "v", "extra"))
    assert(vEvolve === vRestore + 1)
    assertNoSnap(dir)
    assert(TxLog.planningMeta(dir, None).exists(
      _.schema.fieldNames.toSeq === Seq("k", "v", "extra")))
    assertNoSnap(dir)
  }

  test("recomputeStats on a real sharded base: meta-plane resolution, stats refreshed") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val dir = tmp("dmlplan-analyze")
      (0 until 12).foreach { i =>
        TxLog.append(spark, dir,
          (0 until 10).map(d => (i * 10L + d, s"v$i-$d")).toDF("k", "v").coalesce(1))
      }
      assert(TxLog.planningMeta(dir, None).exists(_.ckptBase.nonEmpty),
        "expected a sharded replay base")
      TxLog.invalidateSnapshots(dir)
      val v = TxLog.recomputeStats(spark, dir)
      assertNoSnap(dir)
      // ANALYZE preserved the live set and its stats stay skip-sharp:
      // a one-band filter still plans a one-file scan
      val band = TxLog.planScan(spark, dir,
        Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("k", 50L),
          org.apache.spark.sql.sources.LessThanOrEqual("k", 59L)))
      assert(band.size === 1, s"ANALYZE dulled the stats: ${band.map(_.path)}")
      assertNoSnap(dir)
      assert(TxLog.read(spark, dir).count() === 120L)
      assert(v === TxLog.latestVersion(dir))
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("VACUUM over a sharded base: distributed retention, identical semantics") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val dir = tmp("dmlplan-vacuum")
      // 12 single-file commits → sharded checkpoint at v9 (interval 10
      // counts v0), then DML so old rewrites expire
      (0 until 12).foreach { i =>
        TxLog.append(spark, dir,
          (0 until 10).map(d => (i * 10L + d, s"v$i-$d")).toDF("k", "v").coalesce(1))
      }
      assert(TxLog.planningMeta(dir, None).exists(_.ckptBase.nonEmpty),
        "expected a sharded replay base")
      TxLog.delete(spark, dir, "k < 20")        // rewrites 2 files
      TxLog.update(spark, dir, "k = 25", Map("v" -> "'u'")) // rewrites 1
      val before = TxLog.read(spark, dir).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      // the reads above materialized snapshots legitimately (the V1
      // read API); drop them so the vacuum observable is clean
      TxLog.invalidateSnapshots(dir)
      // stale staging: an orphan parquet in a d- dir, backdated
      val orphanDir = Paths.get(dir, "d-orphan-test")
      Files.createDirectories(orphanDir)
      val orphan = orphanDir.resolve("dead.parquet")
      Files.write(orphan, Array[Byte](1, 2, 3))
      Files.setLastModifiedTime(orphan,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 30L * 24 * 3600 * 1000))

      val dry = TxLog.vacuum(dir, retainVersions = 1, dryRun = true)
      assertNoSnap(dir)
      assert(dry.contains("d-orphan-test/dead.parquet"), s"dry run missed the orphan: $dry")
      assert(dry.size >= 4, s"expected the 3 rewritten originals + orphan, got $dry")
      val reclaimed = TxLog.vacuum(dir, retainVersions = 1)
      assert(reclaimed.toSet === dry.toSet,
        "vacuum deleted a different set than its own dry run announced")
      assertNoSnap(dir)
      assert(!Files.exists(orphan))
      // the table reads back unchanged, and time travel into the
      // vacuumed range now fails (the retention trade)
      val after = TxLog.read(spark, dir).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(after === before)
      val v = TxLog.latestVersion(dir)
      intercept[Exception] {
        TxLog.read(spark, dir, Some(v - 2)).collect(): Unit
      }
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("sharded vs inline parity: every DML/maintenance op lands identical state") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    def run(shardMax: Int): (Seq[(Long, String)], Seq[Long]) = {
      TxLog.ckptPartMaxFiles = shardMax
      val dir = tmp(s"dmlplan-parity-$shardMax")
      try {
        (0 until 12).foreach { i =>
          TxLog.appendPartitioned(spark, dir,
            (0 until 10).map(d => (i * 10L + d, s"v$i-$d", i % 3))
              .toDF("k", "v", "p").coalesce(1), Seq("p"))
        }
        val rowCounts = scala.collection.mutable.ArrayBuffer[Long]()
        def snap(): Unit =
          rowCounts += TxLog.read(spark, dir).count()
        TxLog.delete(spark, dir, "k % 7 = 3"); snap()
        TxLog.update(spark, dir, "k % 5 = 1", Map("v" -> "concat(v, '!')")); snap()
        TxLog.merge(spark, dir,
          Seq((30L, "m", 0), (31L, "m", 1), (2000L, "m", 2)).toDF("k", "v", "p"),
          "k"); snap()
        TxLog.optimizePartition(spark, dir, Map("p" -> "1")); snap()
        TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
        TxLog.delete(spark, dir, "k % 11 = 5"); snap()
        TxLog.purgeDeletes(spark, dir); snap()
        TxLog.replaceWhereEq(spark, dir,
          (0 until 5).map(d => (5000L + d, "rw", 2)).toDF("k", "v", "p"),
          Map("p" -> "2")); snap()
        // restore past the DV-delete + purge + replaceWhere: the sharded
        // run diffs the live sets DISTRIBUTED, the inline run on the
        // driver — identical commit, identical rows
        TxLog.restore(spark, dir, TxLog.latestVersion(dir) - 3); snap()
        TxLog.appendEvolve(spark, dir,
          Seq((9000L, "ev", 0, 1L)).toDF("k", "v", "p", "extra")); snap()
        val state = TxLog.read(spark, dir).orderBy("k")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        (state, rowCounts.toSeq)
      } finally TxLog.ckptPartMaxFiles = saved
    }
    val (inlineState, inlineCounts) = run(100000)
    val (shardState, shardCounts) = run(4) // sharded from the 5th file on
    assert(shardCounts === inlineCounts, "op-by-op row counts diverged")
    assert(shardState === inlineState, "final table state diverged")
  }
}
