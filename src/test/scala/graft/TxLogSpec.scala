package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Contract of the log-based transactional table format: exactly-one
  * winner per version under real thread races, time travel across
  * appends/overwrites/optimize, snapshot isolation (optimize never
  * changes contents; old versions stay readable until vacuum), stats
  * pruning that never loses rows, schema enforcement, and checkpointed
  * log replay equivalence. */
class TxLogSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txlog").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  private def idSet(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("append creates version 0 with schema; read returns the rows") {
    val dir = tmp()
    assert(TxLog.append(spark, dir, df(0 until 10)) === 0L)
    val snap = TxLog.snapshot(dir)
    assert(snap.version === 0L)
    assert(snap.rows === 10L)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "s"))
    assert(idSet(TxLog.read(spark, dir)) === (0L until 10L).toSet)
  }

  test("time travel: each version sees exactly its own prefix of appends") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 5))
    TxLog.append(spark, dir, df(5 until 9))
    TxLog.append(spark, dir, df(9 until 12))
    assert(idSet(TxLog.read(spark, dir, Some(0L))) === (0L until 5L).toSet)
    assert(idSet(TxLog.read(spark, dir, Some(1L))) === (0L until 9L).toSet)
    assert(idSet(TxLog.read(spark, dir, Some(2L))) === (0L until 12L).toSet)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 12L).toSet)
    intercept[TxLog.VersionNotFoundException](TxLog.snapshot(dir, Some(3L)))
    intercept[TxLog.VersionNotFoundException](TxLog.snapshot(dir, Some(-1L)))
  }

  test("overwrite replaces contents; the pre-overwrite version still reads") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 6))
    TxLog.overwrite(spark, dir, df(100 until 103))
    assert(idSet(TxLog.read(spark, dir)) === Set(100L, 101L, 102L))
    assert(idSet(TxLog.read(spark, dir, Some(0L))) === (0L until 6L).toSet)
  }

  test("append enforces the commit-0 schema (and never leaks staging)") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 3))
    val staged = Files.list(Paths.get(dir))
      .filter(_.getFileName.toString.startsWith("d-")).count()
    val wrong = Seq((1L, 2L)).toDF("id", "s") // s: bigint, not string
    intercept[TxLog.SchemaMismatchException](TxLog.append(spark, dir, wrong))
    val renamed = Seq((1L, "x")).toDF("id", "t")
    intercept[TxLog.SchemaMismatchException](TxLog.append(spark, dir, renamed))
    // Rejected appends left no orphaned d- staging directories behind.
    assert(Files.list(Paths.get(dir))
      .filter(_.getFileName.toString.startsWith("d-")).count() === staged)
  }

  test("hard-link claim: a pre-existing version file forces a rebase, not a clobber") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    // Simulate a concurrent writer that already claimed version 1.
    val foreign = """{"version":1,"op":"append","ts":0,"adds":[],"removes":[]}"""
    Files.writeString(Paths.get(dir, "_txlog", f"${1L}%020d.json"), foreign)
    // Our append must land at version 2, preserving the foreign commit.
    assert(TxLog.append(spark, dir, df(10 until 13)) === 2L)
    assert(TxLog.snapshot(dir).rows === 6L)
    assert(idSet(TxLog.read(spark, dir)) === Set(0L, 1L, 2L, 10L, 11L, 12L))
  }

  test("concurrent appends: all land, versions are distinct, no rows lost") {
    val dir = tmp()
    val nWriters = 6
    val pool = Executors.newFixedThreadPool(nWriters)
    val gate = new CountDownLatch(1)
    val versions = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val futures = (0 until nWriters).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          gate.await()
          versions.add(TxLog.append(spark, dir, df(w * 10 until w * 10 + 10))): Unit
        }
      })
    }
    gate.countDown()
    futures.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    import scala.jdk.CollectionConverters._
    assert(versions.asScala.toSet === (0L until nWriters.toLong).toSet)
    assert(TxLog.snapshot(dir).rows === nWriters * 10L)
    assert(idSet(TxLog.read(spark, dir)) ===
      (0 until nWriters).flatMap(w => w * 10 until w * 10 + 10).map(_.toLong).toSet)
  }

  test("overwrite conflicts with a concurrent commit and cleans up its staging") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 5))
    // Deterministic race: the overwrite read version 0 as head, then a
    // foreign commit claims version 1 before it publishes.
    val foreign = """{"version":1,"op":"append","ts":0,"adds":[],"removes":[]}"""
    val probe = Files.list(Paths.get(dir)).filter(_.getFileName.toString.startsWith("d-")).count()
    Files.writeString(Paths.get(dir, "_txlog", f"${1L}%020d.json"), foreign)
    intercept[TxLog.ConcurrentWriteException](
      TxLog.overwriteAt(spark, dir, df(50 until 52), readVersion = 0L))
    // Loser's staged directory was deleted: same number of d- dirs as before.
    assert(Files.list(Paths.get(dir))
      .filter(_.getFileName.toString.startsWith("d-")).count() === probe)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 5L).toSet)
  }

  test("optimize compacts files without changing contents; old version intact") {
    val dir = tmp()
    (0 until 5).foreach(i => TxLog.append(spark, dir, df(i * 4 until i * 4 + 4)))
    val before = TxLog.snapshot(dir)
    assert(before.files.size >= 5)
    val (nBefore, nAfter) = TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    assert(nBefore === before.files.size && nAfter === 1)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 20L).toSet)
    // Snapshot isolation: the pre-optimize version still reads its files.
    assert(idSet(TxLog.read(spark, dir, Some(before.version))) === (0L until 20L).toSet)
    // Contents unchanged, rows preserved exactly.
    assert(TxLog.snapshot(dir).rows === 20L)
  }

  test("optimize rebases over a concurrent append but aborts if inputs vanish") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4))
    TxLog.append(spark, dir, df(4 until 8))
    // Claim v2 with a foreign APPEND (inputs untouched) → optimize rebases to v3.
    val foreignAdd = """{"version":2,"op":"append","ts":0,"adds":[],"removes":[]}"""
    Files.writeString(Paths.get(dir, "_txlog", f"${2L}%020d.json"), foreignAdd)
    val (b, a) = TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    assert(b >= 2 && a === 1)
    assert(TxLog.latestVersion(dir) === 3L)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 8L).toSet)
  }

  test("per-file stats: readRange prunes files after a clustered optimize") {
    val dir = tmp()
    import spark.implicits._
    val data = (0 until 4000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    TxLog.append(spark, dir, data.repartition(8))
    // Unclustered: random-hash files each span ~the full id range.
    val snapBefore = TxLog.snapshot(dir)
    val (survBefore, _) = TxLog.prunedFiles(snapBefore, "id", "100", "199")
    assert(survBefore.size === snapBefore.files.size) // nothing prunable
    // Cluster on id: 8 range-disjoint files.
    TxLog.optimize(spark, dir, targetBytes = 1L, sortBy = Seq("id"))
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size >= 4)
    val (surv, pruned) = TxLog.prunedFiles(snap, "id", "100", "199")
    assert(surv.size <= 2 && pruned.nonEmpty)
    // And the skipping read returns exactly the right rows.
    assert(idSet(TxLog.readRange(spark, dir, "id", "100", "199")) ===
      (100L to 199L).toSet)
  }

  test("stats record null counts; all-NULL files are prunable, mixed survive") {
    val dir = tmp()
    import spark.implicits._
    val mixed = Seq((Some(1L), "a"), (None, "b")).toDF("id", "s").coalesce(1)
    val allNull = Seq((None: Option[Long], "c")).toDF("id", "s").coalesce(1)
    TxLog.append(spark, dir, mixed)
    TxLog.append(spark, dir, allNull)
    val snap = TxLog.snapshot(dir)
    val byNulls = snap.files.map(f => f.stats("id").nulls).sorted
    assert(byNulls === Seq(1L, 1L))
    val (surv, pruned) = TxLog.prunedFiles(snap, "id", "0", "5")
    assert(surv.size === 1 && pruned.size === 1) // all-NULL file pruned
    assert(TxLog.readRange(spark, dir, "id", "0", "5").count() === 1L)
  }

  test("vacuum reclaims only files outside the retained versions") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4))
    TxLog.append(spark, dir, df(4 until 8))
    TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    val deleted = TxLog.vacuum(dir, retainVersions = 1)
    assert(deleted.nonEmpty) // the two pre-optimize files
    // Latest still reads fine.
    assert(idSet(TxLog.read(spark, dir)) === (0L until 8L).toSet)
    // Vacuumed time travel fails at scan time (files gone), as documented.
    intercept[Exception](TxLog.read(spark, dir, Some(0L)).count())
    // Idempotent: nothing left to reclaim.
    assert(TxLog.vacuum(dir, retainVersions = 1).isEmpty)
  }

  test("vacuum retainMillis keeps every version inside the time window") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4))
    TxLog.append(spark, dir, df(4 until 8))
    TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    // a generous window covers every commit just made: even with
    // retainVersions=1 nothing may be reclaimed (MIN of the policies —
    // adding a duration only ever retains more)
    assert(TxLog.vacuum(dir, retainVersions = 1,
      retainMillis = Some(3600L * 1000)).isEmpty)
    assert(idSet(TxLog.read(spark, dir, Some(0L))) === (0L until 4L).toSet,
      "time travel inside the window must survive")
    // once every commit has aged past the window, the version policy
    // governs alone and the pre-optimize files reclaim
    Thread.sleep(60)
    val deleted = TxLog.vacuum(dir, retainVersions = 1,
      retainMillis = Some(5L))
    assert(deleted.nonEmpty)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 8L).toSet)
    // dry-run surface composes with the time policy
    assert(TxLog.vacuum(dir, retainVersions = 1, dryRun = true,
      retainMillis = Some(5L)).isEmpty)
  }

  test("checkpointed replay: snapshot equals full replay past a checkpoint") {
    val dir = tmp()
    // 13 commits: checkpoint lands at version 10 (interval = 10).
    (0 until 13).foreach(i => TxLog.append(spark, dir, df(i * 2 until i * 2 + 2)))
    assert(Files.exists(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json")))
    val snap = TxLog.snapshot(dir)
    assert(snap.version === 12L && snap.rows === 26L)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 26L).toSet)
    // Time travel BELOW the checkpoint replays from commit 0 and agrees.
    assert(idSet(TxLog.read(spark, dir, Some(4L))) === (0L until 10L).toSet)
    // Deleting the checkpoint must not change any snapshot (pure cache).
    Files.delete(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json"))
    assert(idSet(TxLog.read(spark, dir)) === (0L until 26L).toSet)
  }

  test("empty table: read yields zero rows with the pinned schema") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    TxLog.overwrite(spark, dir, df(0 until 0))
    val out = TxLog.read(spark, dir)
    assert(out.count() === 0L)
    assert(out.schema.fieldNames.toSeq === Seq("id", "s"))
  }

  test("readRange plan: the scan lists only survivor files, predicate pushed") {
    val dir = tmp()
    import spark.implicits._
    val data = (0 until 4000).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    TxLog.append(spark, dir, data.repartition(8))
    TxLog.optimize(spark, dir, targetBytes = 1L, sortBy = Seq("id"))
    val snap = TxLog.snapshot(dir)
    val (surv, _) = TxLog.prunedFiles(snap, "id", "100", "199")
    val qe = TxLog.readRange(spark, dir, "id", "100", "199").queryExecution
    val scan = qe.sparkPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, qe.sparkPlan.toString.take(800))
    // The file list the scan schedules IS the pruned survivor set — the
    // skipped files never reach Spark at all.
    assert(scan.get.relation.location.inputFiles.length === surv.size)
    assert(surv.size < snap.files.size)
    // And inside the survivors, the range predicate still pushes down to
    // parquet row groups.
    val pushed = scan.get.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(id,100") &&
      pushed.contains("LessThanOrEqual(id,199"), pushed)
  }

  test("z-ordered optimize prunes on BOTH columns; linear sort only on its leading one") {
    import spark.implicits._
    // 64×64 uniform grid over (x, y): every (x, y) box is selective.
    val grid = (0 until 4096).map(i => (i.toLong, (i / 64).toLong, (i % 64).toLong))
      .toDF("id", "x", "y")

    def build(zorder: Boolean): String = {
      val dir = tmp()
      TxLog.append(spark, dir, grid.repartition(8))
      if (zorder) TxLog.optimize(spark, dir, targetBytes = 1L, zorderBy = Seq("x", "y"))
      else TxLog.optimize(spark, dir, targetBytes = 1L, sortBy = Seq("x", "y"))
      dir
    }
    def survivors(dir: String, c: String): Int =
      TxLog.prunedFiles(TxLog.snapshot(dir), c, "8", "15")._1.size

    val zd = build(zorder = true); val ld = build(zorder = false)
    val nZ = TxLog.snapshot(zd).files.size; val nL = TxLog.snapshot(ld).files.size
    assert(nZ >= 4 && nL >= 4)
    // Leading column: both layouts prune.
    assert(survivors(ld, "x") < nL)
    assert(survivors(zd, "x") < nZ)
    // Trailing column: the linear layout reads EVERYTHING, z-order prunes.
    assert(survivors(ld, "y") === nL)
    assert(survivors(zd, "y") < nZ)
    // Box query via readRanges: correct rows from the pruned scan.
    val box = TxLog.readRanges(spark, zd, Seq(("x", "8", "15"), ("y", "8", "15")))
    assert(box.count() === 64L) // 8 x-values × 8 y-values
    assert(box.agg(min("x"), max("x"), min("y"), max("y")).head().toSeq ===
      Seq(8L, 15L, 8L, 15L))
  }

  test("appendBatch: a replayed (app, batch) is skipped, not duplicated") {
    val dir = tmp()
    assert(TxLog.appendBatch(spark, dir, df(0 until 4), "appA", 0L) === Some(0L))
    // foreachBatch redelivery after a crash: same app, same batch.
    assert(TxLog.appendBatch(spark, dir, df(0 until 4), "appA", 0L) === None)
    assert(TxLog.snapshot(dir).rows === 4L)
    // The next batch commits; an unrelated app's batch 0 also commits.
    assert(TxLog.appendBatch(spark, dir, df(4 until 6), "appA", 1L) === Some(1L))
    assert(TxLog.appendBatch(spark, dir, df(6 until 7), "appB", 0L) === Some(2L))
    assert(TxLog.snapshot(dir).rows === 7L)
    assert(TxLog.snapshot(dir).txns === Map("appA" -> 1L, "appB" -> 0L))
    // A LATE replay of an old batch is still skipped (high-water mark).
    assert(TxLog.appendBatch(spark, dir, df(0 until 4), "appA", 0L) === None)
  }

  test("appendBatch txn state survives checkpointed replay") {
    val dir = tmp()
    (0 until 12).foreach(b =>
      assert(TxLog.appendBatch(spark, dir, df(b * 2 until b * 2 + 2), "s", b.toLong).isDefined))
    assert(Files.exists(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json")))
    assert(TxLog.snapshot(dir).txns === Map("s" -> 11L))
    assert(TxLog.appendBatch(spark, dir, df(0 until 2), "s", 11L) === None)
    // The checkpoint carries the txn map: with it deleted (pure cache)
    // the full replay agrees.
    Files.delete(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json"))
    assert(TxLog.snapshot(dir).txns === Map("s" -> 11L))
  }

  test("appendEvolve widens the schema; old files read as NULL") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 3))
    val wide = Seq((100L, "w", 7.5)).toDF("id", "s", "score")
    TxLog.appendEvolve(spark, dir, wide)
    val out = TxLog.read(spark, dir)
    assert(out.schema.fieldNames.toSeq === Seq("id", "s", "score"))
    assert(out.count() === 4L)
    assert(out.where(col("score").isNull).count() === 3L) // pre-evolution rows
    assert(out.where(col("id") === 100L).select("score").head().getDouble(0) === 7.5)
    // Time travel to the narrow version keeps the narrow schema.
    assert(TxLog.read(spark, dir, Some(0L)).schema.fieldNames.toSeq === Seq("id", "s"))
    // Existing-column type conflicts still fail.
    val bad = Seq((1L, 2L)).toDF("id", "s")
    intercept[TxLog.SchemaMismatchException](TxLog.appendEvolve(spark, dir, bad))
    // Plain appends must now match the WIDE schema exactly.
    intercept[TxLog.SchemaMismatchException](TxLog.append(spark, dir, df(9 until 10)))
    TxLog.append(spark, dir, wide)
    assert(TxLog.snapshot(dir).rows === 5L)
  }

  test("appendEvolve conflicts with any concurrent commit") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 3))
    // Deterministic race: evolve read version 0 as head, then a foreign
    // commit claims version 1 before it publishes (the overwriteAt seam).
    val foreign = """{"version":1,"op":"append","ts":0,"adds":[],"removes":[]}"""
    Files.writeString(Paths.get(dir, "_txlog", f"${1L}%020d.json"), foreign)
    val wide = Seq((1L, "x", 1.0)).toDF("id", "s", "score")
    intercept[TxLog.ConcurrentWriteException](
      TxLog.appendEvolveAt(spark, dir, wide, readVersion = 0L))
    val staged = Files.list(Paths.get(dir)).filter(_.getFileName.toString.startsWith("d-")).count()
    assert(staged === 1) // only v0's staging directory remains
    // Schema unchanged by the failed evolution.
    assert(TxLog.snapshot(dir).schema.fieldNames.toSeq === Seq("id", "s"))
  }

  test("replaceWhereIn: full-file removes, straddle rewrites, untouched files unopened") {
    val dir = tmp()
    import spark.implicits._
    def part(day: Long, ids: Range) = ids.map(i => (i.toLong, day, s"v$i"))
      .toDF("id", "day", "s")
    // day-clustered files: day 1, day 2, day 3 each a single file...
    TxLog.append(spark, dir, part(1L, 0 until 4).coalesce(1))
    TxLog.append(spark, dir, part(2L, 10 until 14).coalesce(1))
    TxLog.append(spark, dir, part(3L, 20 until 24).coalesce(1))
    // ...plus one file STRADDLING days 3 and 4.
    TxLog.append(spark, dir, (part(3L, 30 until 32).unionAll(part(4L, 40 until 42))).coalesce(1))
    val before = TxLog.snapshot(dir)

    // Replace days 2 and 3 with fresh rows.
    val fresh = part(2L, 100 until 102).unionAll(part(3L, 200 until 203))
    TxLog.replaceWhereIn(spark, dir, fresh, "day")

    val out = TxLog.read(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set(
      (0L, 1L), (1L, 1L), (2L, 1L), (3L, 1L),            // day 1 untouched
      (100L, 2L), (101L, 2L),                            // day 2 replaced
      (200L, 3L), (201L, 3L), (202L, 3L),                // day 3 replaced
      (40L, 4L), (41L, 4L)))                             // day 4 survivors of the straddle
    // The day-1 file is the SAME physical file (never rewritten).
    val day1Before = before.files.find(_.stats("day").min.contains("1")).get.path
    assert(TxLog.snapshot(dir).files.map(_.path).contains(day1Before))
    // Old version still reads the pre-replace state (snapshot isolation).
    assert(TxLog.read(spark, dir, Some(before.version)).count() === 16L)
  }

  test("replaceWhereIn keeps NULL-day rows through a straddle rewrite") {
    val dir = tmp()
    import spark.implicits._
    val mixed = Seq((1L, Some(7L), "a"), (2L, None, "b"), (3L, Some(8L), "c"))
      .toDF("id", "day", "s").coalesce(1)
    TxLog.append(spark, dir, mixed)
    val fresh = Seq((10L, Some(7L), "x")).toDF("id", "day", "s")
    TxLog.replaceWhereIn(spark, dir, fresh, "day")
    val out = TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 3L, 10L)) // NULL row and day-8 row kept, day-7 replaced
    // NULL values in the REPLACEMENT's partition column are rejected.
    intercept[IllegalArgumentException](
      TxLog.replaceWhereIn(spark, dir,
        Seq((9L, None: Option[Long], "z")).toDF("id", "day", "s"), "day"))
  }

  test("history lists every commit with op, counts, and txn tags") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4))
    TxLog.appendBatch(spark, dir, df(4 until 6), "appX", 3L)
    TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    val h = TxLog.history(spark, dir).orderBy("version").collect()
    assert(h.map(_.getString(1)).toSeq === Seq("append", "streamingAppend", "optimize"))
    assert(h.map(_.getLong(4)).toSeq === Seq(4L, 2L, 6L)) // rows_added
    assert(h(1).getString(6) === "appX" && h(1).getLong(7) === 3L)
    assert(h(2).getLong(5) >= 2L) // optimize removed the input files
  }

  test("readChanges: inserts after a version, rewrites excluded") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))         // v0
    TxLog.append(spark, dir, df(3 until 5))         // v1
    TxLog.optimize(spark, dir, targetBytes = 1L << 30) // v2 — rewrite, no change
    TxLog.append(spark, dir, df(5 until 9))         // v3
    val ch = TxLog.readChanges(spark, dir, fromVersionExclusive = 0L)
    val byVersion = ch.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byVersion === Map(1L -> 2L, 3L -> 4L)) // v2's rewrite absent
    assert(idSet(ch.select("id", "s")) === (3L until 9L).toSet)
    // Consuming from the head yields nothing.
    assert(TxLog.readChanges(spark, dir, 3L).count() === 0L)
  }

  test("optimize racing concurrent appends: no rows lost, all commits land") {
    val dir = tmp()
    (0 until 4).foreach(i => TxLog.append(spark, dir, df(i * 5 until i * 5 + 5)))
    val pool = Executors.newFixedThreadPool(3)
    val gate = new CountDownLatch(1)
    val appender = (w: Int) => pool.submit(new Runnable {
      def run(): Unit = {
        gate.await()
        TxLog.append(spark, dir, df(100 + w * 10 until 100 + w * 10 + 10)): Unit
      }
    })
    val optimizer = pool.submit(new Runnable {
      def run(): Unit = {
        gate.await()
        // Rebases over whichever appends land first; its input files are
        // never removed by an append, so it must succeed.
        TxLog.optimize(spark, dir, targetBytes = 1L << 30): Unit
      }
    })
    val apps = Seq(appender(0), appender(1))
    gate.countDown()
    (apps :+ optimizer).foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // 20 seed rows + 2 × 10 appended rows, regardless of interleaving.
    assert(TxLog.snapshot(dir).rows === 40L)
    assert(idSet(TxLog.read(spark, dir)) ===
      ((0L until 20L) ++ (100L until 110L) ++ (110L until 120L)).toSet)
    // Every version 0..latest is present (no holes in the log).
    val latest = TxLog.latestVersion(dir)
    (0L to latest).foreach(v => TxLog.snapshot(dir, Some(v)): Unit)
    assert(latest === 6L) // 4 seeds + 2 appends + 1 optimize
  }

  test("merge: matched rows replaced, new keys inserted, untouched files unopened") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 4).coalesce(1))   // keys 0-3
    TxLog.append(spark, dir, df(10 until 14).coalesce(1)) // keys 10-13
    TxLog.append(spark, dir, df(20 until 24).coalesce(1)) // keys 20-23
    val before = TxLog.snapshot(dir)

    // Update keys 1 and 12 (two different files), insert keys 50-51.
    val source = Seq((1L, "UPD1"), (12L, "UPD12"), (50L, "NEW50"), (51L, "NEW51"))
      .toDF("id", "s")
    TxLog.merge(spark, dir, source, "id")

    val out = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 14)
    assert(out(1L) === "UPD1" && out(12L) === "UPD12")
    assert(out(50L) === "NEW50" && out(51L) === "NEW51")
    assert(out(0L) === "v0" && out(13L) === "v13" && out(23L) === "v23")
    // The 20-23 file held no matched key: same physical file survives.
    val f20 = before.files.find(_.stats("id").min.contains("20")).get.path
    assert(TxLog.snapshot(dir).files.map(_.path).contains(f20))
    // The two touched files are gone from the live set.
    assert(!TxLog.snapshot(dir).files.map(_.path)
      .exists(p => before.files.take(2).map(_.path).contains(p)))
    // Snapshot isolation: pre-merge version unchanged.
    assert(TxLog.read(spark, dir, Some(before.version)).count() === 12L)
    assert(TxLog.history(spark, dir).orderBy("version").collect()
      .last.getString(1) === "merge")
  }

  test("merge rejects duplicate and NULL source keys") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 3))
    intercept[IllegalArgumentException](TxLog.merge(spark, dir,
      Seq((1L, "a"), (1L, "b")).toDF("id", "s"), "id"))
    intercept[IllegalArgumentException](TxLog.merge(spark, dir,
      Seq((Some(1L), "a"), (None, "b")).toDF("id", "s"), "id"))
    assert(TxLog.snapshot(dir).rows === 3L) // table untouched
  }

  test("restore rewinds the live set as a new commit; history is preserved") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4))      // v0
    TxLog.append(spark, dir, df(4 until 6))      // v1
    TxLog.overwrite(spark, dir, df(50 until 53)) // v2
    TxLog.restore(spark, dir, 1L)                // v3
    assert(TxLog.latestVersion(dir) === 3L)
    assert(idSet(TxLog.read(spark, dir)) === (0L until 6L).toSet)
    // History keeps the overwritten state readable (v2) and logs the restore.
    assert(idSet(TxLog.read(spark, dir, Some(2L))) === Set(50L, 51L, 52L))
    val ops = TxLog.history(spark, dir).orderBy("version")
      .collect().map(_.getString(1)).toSeq
    assert(ops === Seq("append", "append", "overwrite", "restore"))
    // Restoring a vacuumed version fails loudly.
    TxLog.vacuum(dir, retainVersions = 1)
    intercept[IllegalArgumentException](TxLog.restore(spark, dir, 2L))
  }

  test("change feed excludes ALL rewrites: merge remainders, replaceWhere remainders, restore re-adds") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 6).coalesce(1))           // v0: 6 inserts
    // v1 merge: update key 1 — the 5-row remainder is a rewrite, only
    // the 1-row source is a change.
    TxLog.merge(spark, dir, Seq((1L, "UPD")).toDF("id", "s"), "id")
    val ch1 = TxLog.readChanges(spark, dir, 0L)
    assert(ch1.count() === 1L)
    assert(ch1.select("id").head().getLong(0) === 1L)
    // v2 restore to v0: re-adds are not changes.
    TxLog.restore(spark, dir, 0L)
    assert(TxLog.readChanges(spark, dir, 1L).count() === 0L)
  }

  test("replaceWhere remainders are not changes; the replacement rows are") {
    val dir = tmp()
    import spark.implicits._
    val part = (ids: Range, day: Long) => ids.map(i => (i.toLong, day)).toDF("id", "day")
    TxLog.append(spark, dir, part(0 until 3, 1L).unionAll(part(10 until 13, 2L)).coalesce(1))
    TxLog.replaceWhereIn(spark, dir, part(100 until 102, 2L), "day")
    val ch = TxLog.readChanges(spark, dir, 0L)
    // Only the 2 replacement rows — not the 3 day-1 rows the straddling
    // file rewrite re-staged.
    assert(ch.select("id").collect().map(_.getLong(0)).toSet === Set(100L, 101L))
  }

  test("NaN stats never crash or mis-prune double-column reads") {
    val dir = tmp()
    import spark.implicits._
    val withNan = Seq((1L, 1.5), (2L, Double.NaN)).toDF("id", "x").coalesce(1)
    val clean = Seq((3L, 100.0), (4L, 200.0)).toDF("id", "x").coalesce(1)
    TxLog.append(spark, dir, withNan)
    TxLog.append(spark, dir, clean)
    // The NaN file's max stat is the string "NaN": it must SURVIVE
    // pruning (never crash, never lose the 1.5 row).
    val out = TxLog.readRange(spark, dir, "x", "0", "10")
    assert(out.select("id").collect().map(_.getLong(0)).toSet === Set(1L))
    // And replaceWhere on the same column rewrites conservatively.
    TxLog.replaceWhereIn(spark, dir, Seq((9L, 1.5)).toDF("id", "x"), "x")
    assert(TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet ===
      Set(2L, 3L, 4L, 9L))
  }

  test("restore rewinds the schema too: an evolution is undone") {
    val dir = tmp()
    import spark.implicits._
    TxLog.append(spark, dir, df(0 until 3))
    TxLog.appendEvolve(spark, dir, Seq((10L, "w", 1.0)).toDF("id", "s", "score"))
    assert(TxLog.read(spark, dir).schema.fieldNames.length === 3)
    TxLog.restore(spark, dir, 0L)
    assert(TxLog.read(spark, dir).schema.fieldNames.toSeq === Seq("id", "s"))
    // The original pipeline's narrow append works again post-restore.
    TxLog.append(spark, dir, df(5 until 7))
    assert(TxLog.snapshot(dir).rows === 5L)
  }

  test("vacuum reclaims crashed writers' stale staging, not fresh staging") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    // Simulate a crashed writer: a staged parquet file referenced by no
    // commit, with an old mtime.
    val dead = Paths.get(dir, "d-deadbeef")
    Files.createDirectories(dead)
    Files.writeString(dead.resolve("part-000.parquet"), "orphan")
    Files.setLastModifiedTime(dead.resolve("part-000.parquet"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10_000_000L))
    // A FRESH unreferenced staging (in-flight writer) must survive.
    val fresh = Paths.get(dir, "d-feedface")
    Files.createDirectories(fresh)
    Files.writeString(fresh.resolve("part-000.parquet"), "in-flight")
    val deleted = TxLog.vacuum(dir, retainVersions = 2, staleStagingMillis = 1_000_000L)
    assert(deleted === Seq("d-deadbeef/part-000.parquet"))
    assert(!Files.exists(dead)) // emptied dir dropped
    assert(Files.exists(fresh.resolve("part-000.parquet")))
    assert(TxLog.snapshot(dir).rows === 3L) // live data untouched
  }

  test("log garbage tolerance: stray temp files in _txlog are ignored") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    Files.writeString(Paths.get(dir, "_txlog", ".tmp-deadbeef"), "{broken")
    Files.writeString(Paths.get(dir, "_txlog", "notes.txt"), "hi")
    assert(TxLog.snapshot(dir).rows === 3L)
  }

  test("string stats prune in UTF-8 order: supplementary-plane rows are never lost") {
    import spark.implicits._
    val dir = tmp()
    // U+1F600 (emoji, a surrogate pair in UTF-16) sorts BELOW U+E000 in
    // UTF-16 code-unit order but ABOVE it in Spark's UTF-8/code-point
    // collation — the stats were written under the latter, so a
    // String.compareTo-based comparator would see max("😀") <
    // lo("") and wrongly prune the file that holds the match.
    val emoji = "😀" // U+1F600
    TxLog.append(spark, dir, Seq((1L, emoji)).toDF("id", "s").coalesce(1))
    TxLog.append(spark, dir, Seq((2L, "ascii")).toDF("id", "s").coalesce(1))
    val snap = TxLog.snapshot(dir)
    val lo = ""       // U+E000 (private use, below U+1F600 by code point)
    val hi = "🛀" // U+1F6C0 (above U+1F600)
    val (surv, pruned) = TxLog.prunedFiles(snap, "s", lo, hi)
    assert(surv.exists(_.stats("s").min.contains(emoji)),
      s"emoji file wrongly pruned: surv=${surv.map(_.stats("s").min)}")
    assert(pruned.exists(_.stats("s").min.contains("ascii"))) // below lo in BOTH orders
    assert(idSet(TxLog.readRange(spark, dir, "s", lo, hi)) === Set(1L))
  }

  test("table properties: last-writer-wins replay, surviving checkpoints") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    TxLog.setProperties(dir, Map("graft.autoOptimize" -> "false", "owner" -> "a"))
    TxLog.setProperties(dir, Map("owner" -> "b")) // partial update merges, not replaces
    assert(TxLog.snapshot(dir).props ===
      Map("graft.autoOptimize" -> "false", "owner" -> "b"))
    // push past the checkpoint interval: props must ride the checkpoint
    (0 until 12).foreach(i => TxLog.append(spark, dir, df(10 + i until 11 + i)))
    assert(Files.exists(Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json")))
    assert(TxLog.snapshot(dir).props("owner") === "b")
    // a version BEFORE the property commit replays without it
    assert(TxLog.snapshot(dir, Some(0L)).props === Map.empty)
  }

  test("auto-compaction bounds the live file count under many small appends") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 2).coalesce(1))
    // every file counts as small; compact whenever 4 accumulate
    TxLog.setProperties(dir, Map(
      TxLog.AutoOptimize.Enabled -> "true",
      TxLog.AutoOptimize.MinSmallFiles -> "4",
      TxLog.AutoOptimize.SmallFileBytes -> (1L << 30).toString,
      TxLog.AutoOptimize.TargetBytes -> (1L << 40).toString))
    (1 until 12).foreach { i =>
      TxLog.append(spark, dir, df(i * 2 until i * 2 + 2).coalesce(1))
      val live = TxLog.snapshot(dir).files.size
      assert(live < 4, s"after append $i: $live live files — auto-compaction never fired")
    }
    // no row lost or duplicated through the interleaved compactions
    assert(idSet(TxLog.read(spark, dir)) === (0L until 24L).toSet)
    assert(TxLog.read(spark, dir).count() === 24L)
    // compactions are real commits with the optimize dataChange contract
    val ops = TxLog.history(spark, dir).select("op").collect().map(_.getString(0))
    assert(ops.count(_ == "autoOptimize") >= 2, s"ops: ${ops.toSeq}")
    // rewrites are not changes: the change feed yields exactly the appends
    val changes = TxLog.readChanges(spark, dir, fromVersionExclusive = -1L)
    assert(changes.count() === 24L)
    // a pre-compaction version still time-travels (files not yet vacuumed)
    assert(idSet(TxLog.read(spark, dir, Some(0L))) === Set(0L, 1L))
  }

  test("CHECK constraints: writes validate, violations stage nothing, NULL passes") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 5))
    TxLog.addConstraint(spark, dir, "id_nonneg", "id >= 0")
    // valid append passes; violating append throws and leaves NO staging
    TxLog.append(spark, dir, df(5 until 8))
    val before = TxLog.latestVersion(dir)
    val bad = Seq((-1L, "neg")).toDF("id", "s")
    assertThrows[TxLog.ConstraintViolationException](TxLog.append(spark, dir, bad))
    assert(TxLog.latestVersion(dir) === before, "violation must not commit")
    val stray = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator()
    val entries = scala.jdk.CollectionConverters.IteratorHasAsScala(stray).asScala
      .map(_.getFileName.toString).filter(_.startsWith("d-")).toSeq
    // staged dirs present are only those of the 2 successful appends
    assert(entries.size === 2, s"violating write leaked staging: $entries")
    // NULL evaluates to pass (SQL-standard CHECK)
    TxLog.append(spark, dir, Seq((Option.empty[Long], "n")).toDF("id", "s")
      .selectExpr("CAST(id AS BIGINT) AS id", "s"))
    // overwrite and merge validate too
    assertThrows[TxLog.ConstraintViolationException](
      TxLog.overwrite(spark, dir, bad))
    assertThrows[TxLog.ConstraintViolationException](
      TxLog.merge(spark, dir, bad, "id"))
    // existing-data gate: a constraint current rows violate is rejected
    assertThrows[TxLog.ConstraintViolationException](
      TxLog.addConstraint(spark, dir, "tight", "id >= 3"))
    // drop, then the formerly-violating append lands
    TxLog.dropConstraint(dir, "id_nonneg")
    TxLog.append(spark, dir, bad)
    assert(idSet(TxLog.read(spark, dir).where("id IS NOT NULL")).contains(-1L))
  }

  test("protocol versioning: a newer-protocol log refuses to read; current logs record v1") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    val v0 = Paths.get(dir, "_txlog", f"${0L}%020d.json")
    assert(Files.readString(v0).contains("\"protocol\":1"), "commit 0 must record the protocol")
    assert(TxLog.snapshot(dir).rows === 3L) // own protocol reads fine
    // a future writer bumps the protocol past this reader's capability
    // (TxLog.protocolVersion, currently 4 since type widening): it
    // must refuse, not misread
    val future = TxLog.protocolVersion + 1
    Files.writeString(v0,
      Files.readString(v0).replace("\"protocol\":1", s""""protocol":$future"""))
    // rewriting a committed file in place simulates a DIFFERENT table's
    // log — production commits are immutable, so the snapshot memo must
    // be dropped by hand for the fixture hack to be visible
    TxLog.invalidateSnapshots(dir)
    val e = intercept[TxLog.UnsupportedProtocolException](TxLog.snapshot(dir))
    assert(e.getMessage.contains(s"protocol $future"))
    // pre-versioning logs (no protocol field) stay readable
    Files.writeString(v0,
      Files.readString(v0).replace(s""","protocol":$future""", ""))
    TxLog.invalidateSnapshots(dir)
    assert(TxLog.snapshot(dir).rows === 3L)
  }

  test("auto-compaction racing concurrent appenders loses no rows") {
    val dir = tmp()
    TxLog.append(spark, dir, df(1000 until 1002).coalesce(1))
    TxLog.setProperties(dir, Map(
      TxLog.AutoOptimize.Enabled -> "true",
      TxLog.AutoOptimize.MinSmallFiles -> "3",
      TxLog.AutoOptimize.SmallFileBytes -> (1L << 30).toString,
      TxLog.AutoOptimize.TargetBytes -> (1L << 40).toString))
    // 4 writers × 3 appends, every append a compaction trigger candidate:
    // compactions race appends (and each other) constantly; lost races
    // are best-effort no-ops, but DATA must be exactly the union
    val pool = Executors.newFixedThreadPool(4)
    val gate = new CountDownLatch(1)
    val futures = for (w <- 0 until 4; k <- 0 until 3) yield pool.submit(new Runnable {
      def run(): Unit = {
        gate.await()
        val lo = w * 100 + k * 10
        TxLog.append(spark, dir, df(lo until lo + 5).coalesce(1)): Unit
      }
    })
    gate.countDown()
    futures.foreach(_.get(180, TimeUnit.SECONDS))
    pool.shutdown()
    val expect = (1000 until 1002).map(_.toLong).toSet ++
      (for (w <- 0 until 4; k <- 0 until 3; i <- 0 until 5)
        yield (w * 100 + k * 10 + i).toLong)
    assert(idSet(TxLog.read(spark, dir)) === expect)
    assert(TxLog.snapshot(dir).rows === expect.size.toLong)
    // a settle-pass compaction bounds the live set afterwards
    TxLog.compactSmall(spark, dir, smallFileBytes = 1L << 30, targetBytes = 1L << 40)
    assert(TxLog.snapshot(dir).files.size === 1)
    assert(idSet(TxLog.read(spark, dir)) === expect)
  }

  test("auto-compaction stays dormant without the table property") {
    val dir = tmp()
    (0 until 6).foreach(i => TxLog.append(spark, dir, df(i until i + 1).coalesce(1)))
    val ops = TxLog.history(spark, dir).select("op").collect().map(_.getString(0))
    assert(!ops.contains("autoOptimize"))
    assert(TxLog.snapshot(dir).files.size === 6)
  }
}
