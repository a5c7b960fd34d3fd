package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Optimistic conflict RESOLUTION for row-level DML: a DELETE / UPDATE /
  * MERGE that loses the commit race REBASES onto the new head when the
  * histories are logically disjoint (the winner neither removed nor
  * DML'd a touched file, left schema and properties alone, and — for
  * merge — inserted no source key), and throws only when they genuinely
  * cross. The read-version seams (deleteAt / updateAt / mergeAt) pin the
  * DML's snapshot while foreign commits land in between, exactly the
  * interleaving a streaming sink plus a periodic GDPR delete produces. */
class TxDmlConcurrencySpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txconc").toString + "/t"

  private def df(ids: Range, grpMod: Int = 3) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", i % grpMod)).toDF("id", "s", "grp")
  }

  private def idSet(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  test("delete rebases over a concurrent append: both land, nothing lost") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30))          // v0 — delete reads here
    TxLog.append(spark, dir, df(100 until 110))       // v1 — the racing winner
    val v = TxLog.deleteAt(spark, dir, "grp = 1", readVersion = 0L)
    assert(v === 2L, "the delete must rebase to the next free version")
    // serial order: delete first (over v0's rows), append after — the
    // appended rows survive even where they match the predicate
    val want = (0L until 30L).filterNot(_ % 3 == 1).toSet ++ (100L until 110L)
    assert(idSet(TxLog.read(spark, dir)) === want)
  }

  test("update rebases over a concurrent append") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 20))
    TxLog.append(spark, dir, df(200 until 205))
    val v = TxLog.updateAt(spark, dir, "grp = 2", Map("s" -> "'upd'"),
      readVersion = 0L)
    assert(v === 2L)
    val upd = TxLog.read(spark, dir).where("s = 'upd'")
    assert(idSet(upd) === (0L until 20L).filter(_ % 3 == 2).toSet,
      "only the read snapshot's matching rows update; the appended rows ride through")
    assert(TxLog.read(spark, dir).count() === 25L)
  }

  test("delete rebases over a concurrent compaction of UNtouched files") {
    val dir = tmp()
    // touched file: big (above the small-file cutoff used below)
    TxLog.append(spark, dir, df(0 until 50000).repartition(1))  // v0
    // small files a streaming sink would leave behind
    TxLog.append(spark, dir, df(100000 until 100010).repartition(1)) // v1
    TxLog.append(spark, dir, df(100010 until 100020).repartition(1)) // v2
    val big = TxLog.snapshot(dir, Some(0L)).files.head
    // pin the delete's read BEFORE the compaction; compaction consumes
    // only the two small appended files (the big touched one is excluded)
    val deleteRead = 2L
    val compacted = TxLog.compactSmall(spark, dir,
      smallFileBytes = big.bytes, targetBytes = 128L << 20)          // v3
    assert(compacted.exists(_._1 === 2), "compaction must consume the 2 small files")
    val v = TxLog.deleteAt(spark, dir, s"id < 10", readVersion = deleteRead)
    assert(v === 4L, "auto-compaction must not fail the concurrent DELETE")
    assert(TxLog.read(spark, dir).count() === 50000L + 20L - 10L)
  }

  test("delete conflicts when the winner rewrote a touched file") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 40).repartition(1))     // one file
    TxLog.delete(spark, dir, "id = 5")                          // v1 rewrites it
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.deleteAt(spark, dir, "id = 7", readVersion = 0L)
    }
    assert(e.getMessage.contains("touched file"))
    assert(TxLog.latestVersion(dir) === 1L, "the loser must publish nothing")
    assert(idSet(TxLog.read(spark, dir)) === (0L until 40L).toSet - 5L)
  }

  test("delete conflicts when the schema or properties changed concurrently") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10))
    TxLog.addColumns(dir, Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.DoubleType)))
    val e1 = intercept[TxLog.ConcurrentWriteException] {
      TxLog.deleteAt(spark, dir, "grp = 0", readVersion = 0L)
    }
    assert(e1.getMessage.contains("schema"))

    val dir2 = tmp()
    TxLog.append(spark, dir2, df(0 until 10))
    TxLog.setProperties(dir2, Map("graft.enableChangeDataFeed" -> "true"))
    val e2 = intercept[TxLog.ConcurrentWriteException] {
      TxLog.deleteAt(spark, dir2, "grp = 0", readVersion = 0L)
    }
    assert(e2.getMessage.contains("properties"))
  }

  test("merge rebases over an append with DISJOINT keys; conflicts on overlap") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 20))                    // v0
    TxLog.append(spark, dir, df(50 until 55))                   // v1: keys 50-54
    val src = Seq((3L, "new3", 0), (99L, "new99", 0)).toDF("id", "s", "grp")
    val v = TxLog.mergeAt(spark, dir, src, "id", readVersion = 0L)
    assert(v === 2L)
    val got = TxLog.read(spark, dir)
    assert(got.where("id = 3").select("s").head().getString(0) === "new3")
    assert(got.count() === 26L) // 20 - 1 replaced + 1 + 5 appended + insert 99

    // overlap: the winner appended key 3 — rebasing would leave duplicates
    val dir2 = tmp()
    TxLog.append(spark, dir2, df(0 until 20))
    TxLog.append(spark, dir2, Seq((3L, "winner", 0)).toDF("id", "s", "grp"))
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.mergeAt(spark, dir2, src, "id", readVersion = 0L)
    }
    assert(e.getMessage.contains("duplicates"))
  }

  test("merge-on-read delete rebases over appends; conflicts on a DV change") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30).repartition(2))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true")) // v1
    TxLog.append(spark, dir, df(100 until 105))                            // v2
    val v = TxLog.deleteAt(spark, dir, "id = 4", readVersion = 1L)
    assert(v === 3L, "a DV delete rebases over a disjoint append")
    assert(idSet(TxLog.read(spark, dir)) ===
      ((0L until 30L).toSet - 4L) ++ (100L until 105L))

    // second DV delete pinned BEFORE the first: same file's DV pointer
    // changed → resurrection risk → conflict
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.deleteAt(spark, dir, "id = 4", readVersion = 2L)
    }
    assert(e.getMessage.contains("touched file"))
  }

  test("zombie-twin mergeBatch cannot double-commit a batch through the rebase") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10))                    // v0
    // the twin that WON, committing (app, 7)
    TxLog.mergeBatch(spark, dir,
      Seq((1L, "won", 1)).toDF("id", "s", "grp"), "id", "app", 7L)
    // the zombie pinned at v0 replays the same batch: the rebase loop's
    // txn re-check must refuse it (key overlap would also catch THIS
    // content; the txn check holds even for disjoint replays)
    val e = intercept[TxLog.ConcurrentWriteException] {
      TxLog.mergeAt(spark, dir,
        Seq((99L, "zombie", 1)).toDF("id", "s", "grp"), "id",
        readVersion = 0L, txn = Some(("app", 7L)))
    }
    assert(e.getMessage.contains("zombie"))
    assert(TxLog.read(spark, dir).where("s = 'zombie'").isEmpty)
  }

  test("streaming-sink shape: appends + auto-compaction + deletes, retry-on-conflict converges") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmp()
    // the verdict-11 failure scenario: a busy table whose OWN
    // auto-compaction races user DML. Writers retry on genuine
    // conflicts (the operational contract); the invariant is the final
    // state, not the interleaving.
    TxLog.append(spark, dir, df(0 until 100))
    TxLog.setProperties(dir, Map(
      TxLog.AutoOptimize.Enabled -> "true",
      TxLog.AutoOptimize.MinSmallFiles -> "2"))
    def retrying(body: => Unit): Unit = {
      var tries = 0
      var done = false
      while (!done) {
        try { body; done = true }
        catch {
          case _: TxLog.ConcurrentWriteException if tries < 30 => tries += 1
        }
      }
    }
    val pool = Executors.newFixedThreadPool(6)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks: Seq[() => Unit] =
      (0 until 3).map(g => () =>
        retrying(TxLog.append(spark, dir,
          df(1000 + g * 100 until 1000 + g * 100 + 20)): Unit)) ++
      Seq(
        () => retrying(TxLog.delete(spark, dir, "id >= 0 AND id < 10"): Unit),
        () => retrying(TxLog.delete(spark, dir, "id >= 50 AND id < 60"): Unit),
        () => retrying(TxLog.update(spark, dir, "id = 99",
          Map("s" -> "'u99'")): Unit))
    tasks.foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try t() catch { case e: Throwable => errs.add(e): Unit }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"every retried writer must converge: $errs")
    val got = TxLog.read(spark, dir)
    val want = ((10L until 50L) ++ (60L until 100L)).toSet ++
      (0 until 3).flatMap(g => 1000L + g * 100 until 1000L + g * 100 + 20)
    assert(idSet(got) === want)
    assert(got.where("id = 99").head().getString(1) === "u99")
  }

  test("truly concurrent appends + disjoint deletes all land (threaded)") {
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = tmp()
    // 4 writer groups, each owning a disjoint id range in its own files
    (0 until 4).foreach(g =>
      TxLog.append(spark, dir, df(g * 1000 until g * 1000 + 100).repartition(1)))
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (0 until 4).flatMap { g =>
      Seq(
        () => TxLog.append(spark, dir, df(g * 1000 + 500 until g * 1000 + 510)): Unit,
        () => TxLog.delete(spark, dir,
          s"id >= ${g * 1000} AND id < ${g * 1000 + 10}"): Unit)
    }
    tasks.foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try t() catch { case e: Throwable => errs.add(e): Unit }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"all disjoint writers must land: ${errs}")
    // every append landed, every delete erased exactly its 10 ids
    val want = (0 until 4).flatMap { g =>
      (g * 1000 + 10 until g * 1000 + 100) ++ (g * 1000 + 500 until g * 1000 + 510)
    }.map(_.toLong).toSet
    assert(idSet(TxLog.read(spark, dir)) === want)
    // versions are contiguous — no lost or double-claimed commits
    val (commits, _) = (TxLog.latestVersion(dir), 0)
    assert(commits === 4L + 8L - 1L)
  }
}
