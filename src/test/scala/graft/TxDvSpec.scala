package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Deletion-vector (merge-on-read DML) contract: with
  * `graft.enableDeletionVectors=true`, DELETE/UPDATE write dead-row
  * POSITION LISTS instead of rewriting files — data files are never
  * rewritten by DML, whole-file deletes are metadata-only, a file's
  * descriptor always holds its complete dead set, reads (Scala + SQL
  * catalog + readRange + time travel) apply the vectors, rewrites
  * (optimize/purge) drop them, vacuum retires superseded DV dirs, and
  * a stale layout rewrite racing a DV commit is refused (resurrection
  * guard). First DV commit stamps protocol 3. */
class TxDvSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txdv").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "s", "grp")
  }

  private def dvTable(ids: Range): String = {
    val dir = tmp()
    TxLog.append(spark, dir, df(ids).repartition(1))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    dir
  }

  private def idSet(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("DV delete removes rows without rewriting any data file") {
    val dir = dvTable(0 until 100)
    val filesBefore = TxLog.snapshot(dir).files
    val mtime = Files.getLastModifiedTime(Paths.get(dir, filesBefore.head.path))
    val v = TxLog.delete(spark, dir, "grp = 1")
    assert(v === 2L)
    val snap = TxLog.snapshot(dir)
    // same physical file, now carrying a descriptor — never rewritten
    assert(snap.files.map(_.path) === filesBefore.map(_.path))
    assert(Files.getLastModifiedTime(Paths.get(dir, snap.files.head.path)) === mtime)
    val dv = snap.files.head.dv
    assert(dv.nonEmpty && dv.get.dead === (0 until 100).count(_ % 3 == 1).toLong)
    assert(snap.files.head.rows === (0 until 100).count(_ % 3 != 1).toLong)
    assert(idSet(TxLog.read(spark, dir)) ===
      (0L until 100L).toSet.filterNot(_ % 3 == 1))
    // time travel to the pre-delete version sees everything
    assert(idSet(TxLog.read(spark, dir, Some(0L))) === (0L until 100L).toSet)
    assert(snap.protocol === 3L)
  }

  test("second DV delete on the same file merges into one complete descriptor") {
    val dir = dvTable(0 until 50)
    TxLog.delete(spark, dir, "grp = 1")
    val v = TxLog.delete(spark, dir, "grp = 2")
    assert(v === 3L)
    val f = TxLog.snapshot(dir).files.head
    val expectDead = (0 until 50).count(i => i % 3 == 1 || i % 3 == 2).toLong
    assert(f.dv.get.dead === expectDead)
    assert(f.rows === 50L - expectDead)
    assert(idSet(TxLog.read(spark, dir)) ===
      (0L until 50L).toSet.filter(_ % 3 == 0))
    // the second delete's directory holds the COMPLETE set; re-deleting
    // already-dead rows is a no-op (they are not live)
    assert(TxLog.delete(spark, dir, "grp = 1") === 3L)
  }

  test("a file whose live rows all match is removed by metadata alone") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 40).repartition(1))   // file A
    TxLog.append(spark, dir, df(100 until 140).repartition(1)) // file B
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    val before = TxLog.snapshot(dir).files.map(_.path)
    TxLog.delete(spark, dir, "id >= 100")
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size === 1)
    assert(snap.files.head.dv.isEmpty) // file A untouched, no descriptor
    // file B's bytes still on disk for time travel until vacuum
    val fileB = (before.toSet -- snap.files.map(_.path)).head
    assert(Files.exists(Paths.get(dir, fileB)))
    assert(idSet(TxLog.read(spark, dir)) === (0L until 40L).toSet)
  }

  test("DV deleteKeys: distributed erasure, positions only") {
    val dir = dvTable(0 until 500)
    import spark.implicits._
    val keys = (0L until 500L by 7L).toDF("id")
    TxLog.deleteKeys(spark, dir, keys, "id")
    assert(idSet(TxLog.read(spark, dir)) ===
      (0L until 500L).toSet.filterNot(_ % 7 == 0))
    assert(TxLog.snapshot(dir).files.head.dv.get.dead ===
      (0L until 500L).count(_ % 7 == 0).toLong)
  }

  test("DV update: old image dies via vector, new rows land dataChange=true") {
    val dir = dvTable(0 until 30)
    val filesBefore = TxLog.snapshot(dir).files.map(_.path).toSet
    val v = TxLog.update(spark, dir, "grp = 0", Map("s" -> "concat('u', id)"))
    val snap = TxLog.snapshot(dir)
    // original file survives with a DV; updated rows are NEW files
    assert(snap.files.map(_.path).toSet.intersect(filesBefore) === filesBefore)
    val orig = snap.files.find(f => filesBefore.contains(f.path)).get
    assert(orig.dv.get.dead === (0 until 30).count(_ % 3 == 0).toLong)
    val newFiles = snap.files.filterNot(f => filesBefore.contains(f.path))
    assert(newFiles.nonEmpty && newFiles.forall(_.dataChange))
    val rows = TxLog.read(spark, dir).collect()
    assert(rows.length === 30)
    rows.foreach { r =>
      val (id, s, grp) = (r.getLong(0), r.getString(1), r.getInt(2))
      if (grp == 0) assert(s === s"u$id") else assert(s === s"v$id")
    }
    // a stream delivers exactly the updated rows of this version
    val changed = TxLog.readChanges(spark, dir, v - 1)
    assert(changed.count() === (0 until 30).count(_ % 3 == 0).toLong)
  }

  test("update validates constraints and leaves no DV on rejection") {
    val dir = dvTable(0 until 10)
    TxLog.addConstraint(spark, dir, "pos", "id >= 0")
    intercept[TxLog.ConstraintViolationException] {
      TxLog.update(spark, dir, "grp = 0", Map("id" -> "-1"))
    }
    assert(TxLog.snapshot(dir).files.forall(_.dv.isEmpty))
    assert(TxLog.read(spark, dir).count() === 10L)
  }

  test("optimize and purgeDeletes rewrite DV files clean; vacuum retires the dv dir") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 60).repartition(1))
    TxLog.append(spark, dir, df(100 until 160).repartition(1))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id < 10") // DV on file A only
    val dvDir = TxLog.snapshot(dir).files.flatMap(_.dv).head.path
    assert(Files.isDirectory(Paths.get(dir, dvDir)))
    // purge rewrites ONLY the DV-bearing file
    val (nBefore, _) = TxLog.purgeDeletes(spark, dir).get
    assert(nBefore === 1)
    val snap = TxLog.snapshot(dir)
    assert(snap.files.forall(_.dv.isEmpty))
    assert(idSet(TxLog.read(spark, dir)) ===
      ((10L until 60L) ++ (100L until 160L)).toSet)
    // the superseded dv dir ages out of the retention window
    (1 to 4).foreach(_ => TxLog.append(spark, dir, df(900 until 901)))
    TxLog.vacuum(dir, retainVersions = 2, staleStagingMillis = 0L)
    assert(!Files.isDirectory(Paths.get(dir, dvDir)))
    assert(idSet(TxLog.read(spark, dir)) ===
      ((10L until 60L) ++ (100L until 160L) ++ Seq.fill(4)(900L)).toSet)
  }

  test("stale layout rewrite racing a DV delete is refused (resurrection guard)") {
    val dir = dvTable(0 until 40)
    val stale = TxLog.snapshot(dir)
    TxLog.delete(spark, dir, "grp = 1") // concurrent DV commit: same path, new descriptor
    intercept[TxLog.ConcurrentWriteException] {
      TxLog.commitRewrite(spark, dir, "d-nonexistent", Nil, stale, "optimize")
    }
  }

  test("DV survives the checkpoint round-trip") {
    val dir = dvTable(0 until 20)
    TxLog.delete(spark, dir, "grp = 2") // v2
    // push past a checkpoint boundary (every 10 commits)
    (0 until 9).foreach(i => TxLog.append(spark, dir, df(1000 + i until 1001 + i)))
    val (_, ckpts) = {
      val m = classOf[TxLog.type] // just assert a checkpoint exists via log dir
      val ld = Paths.get(dir, "_txlog")
      val names = Files.list(ld)
      try (m, names.iterator().asScala.map(_.getFileName.toString)
        .count(_.endsWith(".ckpt.json"))) finally names.close()
    }
    assert(ckpts >= 1)
    val snap = TxLog.snapshot(dir)
    assert(snap.files.exists(_.dv.nonEmpty))
    assert(snap.protocol === 3L)
    assert(idSet(TxLog.read(spark, dir)).filter(_ < 20L) ===
      (0L until 20L).toSet.filterNot(_ % 3 == 2))
  }

  test("DV delete works on array-typed columns (non-vectorized reader path)") {
    val dir = tmp()
    import spark.implicits._
    val d = (0 until 30).map(i => (i.toLong, Seq.fill(4)(i.toDouble)))
      .toDF("id", "vec").repartition(1)
    TxLog.append(spark, dir, d)
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id % 2 = 0")
    val out = TxLog.read(spark, dir)
    assert(idSet(out) === (1L until 30L by 2L).toSet)
    assert(out.selectExpr("sum(vec[0])").head().getDouble(0) ===
      (1 until 30 by 2).map(_.toDouble).sum)
  }

  test("SQL catalog serves DV tables through the fallback scan; SQL DELETE writes a DV") {
    val root = graft.Scratch.dir("graft-txdv-cat").toString
    spark.conf.set("spark.sql.catalog.dvcat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvcat.root", root)
    try {
      TxLog.append(spark, s"$root/t", df(0 until 50))
      TxLog.setProperties(s"$root/t", Map(TxLog.DeletionVectors.Enabled -> "true"))
      spark.sql("DELETE FROM dvcat.t WHERE grp = 1")
      val snap = TxLog.snapshot(s"$root/t")
      assert(snap.files.exists(_.dv.nonEmpty)) // SQL DML took the DV path
      assert(spark.sql("SELECT count(*) AS n FROM dvcat.t").head().getLong(0) ===
        (0 until 50).count(_ % 3 != 1).toLong)
      assert(spark.sql("SELECT sum(id) AS s FROM dvcat.t").head().getLong(0) ===
        (0L until 50L).filterNot(_ % 3 == 1).sum)
      // time travel through the catalog still serves the fast path (v0 pre-DV)
      assert(spark.sql("SELECT count(*) AS n FROM dvcat.t VERSION AS OF 0")
        .head().getLong(0) === 50L)
    } finally {
      spark.conf.unset("spark.sql.catalog.dvcat")
      spark.conf.unset("spark.sql.catalog.dvcat.root")
    }
  }

  test("DV composes with column mapping: delete through a renamed column") {
    val dir = dvTable(0 until 30)
    TxLog.renameColumn(dir, "grp", "bucket")
    TxLog.delete(spark, dir, "bucket = 1")
    val out = TxLog.read(spark, dir)
    assert(out.columns.toSeq === Seq("id", "s", "bucket"))
    assert(idSet(out) === (0L until 30L).toSet.filterNot(_ % 3 == 1))
    // and update through the mapping on a DV-bearing file
    TxLog.update(spark, dir, "bucket = 0", Map("s" -> "'z'"))
    val rows = TxLog.read(spark, dir).where("bucket = 0").select("s")
      .collect().map(_.getString(0)).toSet
    assert(rows === Set("z"))
  }

  test("readRange applies DVs after stats pruning") {
    val dir = dvTable(0 until 100)
    TxLog.delete(spark, dir, "id >= 20 AND id < 30")
    val got = idSet(TxLog.readRange(spark, dir, "id", "10", "40"))
    assert(got === ((10L to 40L).toSet -- (20L until 30L)))
  }

  test("restore past a DV delete revives the rows; restore onto a DV version keeps it") {
    val dir = dvTable(0 until 20)
    TxLog.delete(spark, dir, "grp = 0") // v2
    TxLog.append(spark, dir, df(500 until 510)) // v3
    TxLog.restore(spark, dir, 1L) // pre-delete
    assert(idSet(TxLog.read(spark, dir)) === (0L until 20L).toSet)
    TxLog.restore(spark, dir, 2L) // back onto the DV snapshot
    assert(idSet(TxLog.read(spark, dir)) ===
      (0L until 20L).toSet.filterNot(_ % 3 == 0))
  }

  test("change feed: DV delete serves its deleted rows; without CDF the feed fails") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 20))
    TxLog.setProperties(dir, Map(
      TxLog.DeletionVectors.Enabled -> "true",
      TxLog.Cdf.Enabled -> "true"))
    TxLog.delete(spark, dir, "grp = 1")
    val feed = TxLog.readChangeFeed(spark, dir, 1L)
    val deletes = feed.where(s"${TxLog.ChangeTypeCol} = 'delete'")
    assert(idSet(deletes) === (0L until 20L).toSet.filter(_ % 3 == 1))
    // a DV delete without CDF is loudly unreadable as a feed
    val dir2 = dvTable(0 until 10)
    TxLog.delete(spark, dir2, "grp = 1")
    intercept[IllegalStateException](
      TxLog.readChangeFeed(spark, dir2, 0L).collect())
  }

  test("auto-compaction over DV-bearing small files purges them without losing rows") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 40).repartition(1))
    TxLog.setProperties(dir, Map(
      TxLog.DeletionVectors.Enabled -> "true",
      TxLog.AutoOptimize.Enabled -> "true",
      TxLog.AutoOptimize.MinSmallFiles -> "3",
      TxLog.AutoOptimize.SmallFileBytes -> (1L << 30).toString,
      TxLog.AutoOptimize.TargetBytes -> (1L << 40).toString))
    TxLog.delete(spark, dir, "grp = 1") // DV on the only file
    // appends push the small-file count past the trigger; the compaction
    // consumes the DV-bearing file through the filtered scan
    TxLog.append(spark, dir, df(100 until 110).repartition(1))
    TxLog.append(spark, dir, df(200 until 210).repartition(1))
    val snap = TxLog.snapshot(dir)
    assert(snap.files.forall(_.dv.isEmpty), "compaction must purge the DV")
    assert(idSet(TxLog.read(spark, dir)) ===
      ((0L until 40L).toSet.filterNot(_ % 3 == 1) ++
        (100L until 110L) ++ (200L until 210L)))
  }

  test("no-match DV DML is a no-op without a commit") {
    val dir = dvTable(0 until 10)
    assert(TxLog.delete(spark, dir, "id = 999") === 1L)
    assert(TxLog.update(spark, dir, "id = 999", Map("s" -> "'x'")) === 1L)
    assert(TxLog.latestVersion(dir) === 1L)
  }

  test("DV merge: matched images die via vector, source lands, no rewrite") {
    import spark.implicits._
    val dir = dvTable(0 until 100)
    val before = TxLog.snapshot(dir).files
    val mtime = Files.getLastModifiedTime(Paths.get(dir, before.head.path))
    // upsert ids 50..109: 50 matches (die in place), 10 inserts
    val src = (50 until 110).map(i => (i.toLong, s"M$i", 9)).toDF("id", "s", "grp")
    TxLog.merge(spark, dir, src, "id")
    val snap = TxLog.snapshot(dir)
    val orig = snap.files.find(_.path == before.head.path).get
    // the touched file was never rewritten — descriptor only
    assert(Files.getLastModifiedTime(Paths.get(dir, orig.path)) === mtime)
    assert(orig.dv.get.dead === 50L && orig.rows === 50L)
    assert(snap.protocol === 3L)
    val rows = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size === 110)
    assert(rows(50L) === "M50" && rows(109L) === "M109" && rows(0L) === "v0")
    val m = TxLog.history(spark, dir).where("op = 'merge'")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("metrics"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("rows_matched") === 50L && m("rows_inserted") === 10L)
    // the stream-visible change set is exactly the source rows
    val changed = TxLog.changedFilesBetween(dir, 1L, TxLog.latestVersion(dir))
    assert(changed.map(_.rows).sum === 60L)
  }

  test("DV clause merge: fired rows die in place, keeps stay, full-dead file removed") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10).coalesce(1))
    TxLog.append(spark, dir, df(10 until 20).coalesce(1))
    TxLog.setProperties(dir, Map(TxLog.Cdf.Enabled -> "true",
      TxLog.DeletionVectors.Enabled -> "true"))
    val before = TxLog.snapshot(dir).files
    val fileA = before.minBy(_.path) // which holds 0..9 is unknown; derive
    val aIds = idSet(TxLog.read(spark, dir)
      .where(org.apache.spark.sql.functions
        .col("_metadata.file_path").endsWith(fileA.path)))
    val bIds = (0L until 20L).toSet -- aIds
    val from = TxLog.latestVersion(dir)
    // tombstone ALL of file B, update two rows of file A
    val twoA = aIds.toSeq.sorted.take(2)
    val feed = (bIds.toSeq.sorted.map(i => (i, "x", "d")) ++
      twoA.map(i => (i, s"U$i", "u"))).toDF("id", "s", "op")
    TxLog.mergeClauses(spark, dir, feed, "id", Seq(
      TxLog.WhenMatchedDelete(Some("s.op = 'd'")),
      TxLog.WhenMatchedUpdate(None, Map("s" -> "s.s"))))
    val snap = TxLog.snapshot(dir)
    // file B: every live row fired a delete — removed by metadata alone
    assert(!snap.files.exists(_.path == before.filterNot(_ == fileA).head.path))
    // file A: still the SAME file, two dead positions, keeps unwritten
    val a2 = snap.files.find(_.path == fileA.path).get
    assert(a2.dv.get.dead === 2L && a2.rows === 8L)
    val got = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet === aIds)
    twoA.foreach(i => assert(got(i) === s"U$i"))
    // the change feed is complete: deletes + update pre/post images
    val changes = TxLog.readChangeFeed(spark, dir, from)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(changes === (bIds.map(i => (i, "delete")) ++
      twoA.flatMap(i => Seq((i, "update_preimage"), (i, "update_postimage")))))
  }

  test("DV merge is exactly-once under txn tags (mergeBatch replay skips)") {
    import spark.implicits._
    val dir = dvTable(0 until 10)
    val src = Seq((1L, "B1", 9), (20L, "B20", 9)).toDF("id", "s", "grp")
    assert(TxLog.mergeBatch(spark, dir, src, "id", "dvapp", 0L).nonEmpty)
    val snap1 = TxLog.snapshot(dir)
    assert(TxLog.mergeBatch(spark, dir, src, "id", "dvapp", 0L).isEmpty)
    assert(TxLog.snapshot(dir).version === snap1.version)
    val rows = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "B1" && rows(20L) === "B20" && rows.size === 11)
  }
}

/** File skipping on the DV-bearing SQL scan: pushed filters prune the
  * pinned file list before the merge-on-read anti-join plan is built —
  * a partition-keyed SQL query on a DV table never opens foreign
  * partitions' files, and DV-deleted rows stay deleted under the
  * replayed predicates. */
class TxDvPrunedScanSpec extends AnyFunSuite with SparkTestBase {

  test("SQL scan over a DV table prunes files and keeps DV semantics") {
    val root = graft.Scratch.dir("graft-dvprune").toString
    val cat = "dvp" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    import spark.implicits._
    val d = (0 until 30).map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
    TxLog.appendPartitioned(spark, dir, d, Seq("grp"))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    // DV delete inside g0 (no rewrite), then corrupt g2's file: a
    // g0-keyed SQL query must neither resurrect the deleted row nor
    // open the foreign partition
    TxLog.delete(spark, dir, "id = 0")
    val snap = TxLog.snapshot(dir)
    assert(snap.files.exists(_.dv.nonEmpty), "delete should have used a DV")
    val g2 = snap.files.find(_.pv.get("grp").contains("g2")).get
    Files.write(Paths.get(dir, g2.path), Array[Byte](1, 2, 3))
    val got = spark.sql(s"SELECT id FROM $cat.t WHERE grp = 'g0'")
      .collect().map(_.getLong(0)).toSet
    assert(got === (0L until 30L).filter(i => i % 3 == 0 && i != 0L).toSet)
    // an unprunable full scan still hits the corruption (nothing is
    // silently skipped)
    intercept[Exception](spark.sql(s"SELECT sum(id) FROM $cat.t").collect())
  }
}
