package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ConditionalPutLogStore, HardLinkLogStore, LogStore, TxLog}

/** The commit protocol over the pluggable [[LogStore]] seam: the same
  * multi-writer race must produce a contiguous, loss-free log on BOTH
  * the POSIX hard-link store and the object-store-shaped conditional-put
  * store — proving correctness rests on the put-if-absent contract, not
  * on a filesystem quirk. */
class TxLogStoreSpec extends AnyFunSuite with SparkTestBase {

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  private def withStore[A](store: LogStore)(body: => A): A = {
    val prev = TxLog.logStore
    TxLog.logStore = store
    try body finally TxLog.logStore = prev
  }

  private def stress(store: LogStore, label: String): Unit = withStore(store) {
    val dir = graft.Scratch.dir(s"graft-store-$label").toString + "/t"
    val nWriters = 6
    val perWriter = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until nWriters).foreach { w =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until perWriter).foreach { b =>
            val base = (w * perWriter + b) * 100
            TxLog.append(spark, dir, df(base until base + 100)): Unit
          } catch { case e: Throwable => errs.add(e): Unit }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"[$label] writers failed: $errs")
    // exactly one winner per version, versions contiguous, no lost commit
    assert(TxLog.latestVersion(dir) === (nWriters * perWriter - 1).toLong,
      s"[$label] version count drifted")
    val snap = TxLog.snapshot(dir)
    assert(snap.rows === (nWriters * perWriter * 100).toLong, s"[$label] rows lost")
    assert(TxLog.read(spark, dir).select("id").distinct().count() ===
      (nWriters * perWriter * 100).toLong)
    // no temp-file litter in the log dir (losers clean up)
    val ld = java.nio.file.Paths.get(dir, "_txlog")
    val tmps = {
      val s = Files.list(ld)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith(".tmp")).toList
      } finally s.close()
    }
    assert(tmps.isEmpty, s"[$label] temp litter: $tmps")
  }

  test("commit-race stress: hard-link store (POSIX put-if-absent)") {
    stress(HardLinkLogStore, "hardlink")
  }

  test("commit-race stress: conditional-put store (object-store-shaped)") {
    stress(ConditionalPutLogStore, "condput")
  }

  test("transformProperties is a CAS: a racing property commit composes, never overwrites") {
    val dir = graft.Scratch.dir("graft-store-tp").toString + "/t"
    TxLog.append(spark, dir, df(0 until 10)): Unit
    TxLog.setProperties(dir, Map("graft.test.counter" -> "0")): Unit
    // a concurrent writer lands 0 → 10 BETWEEN our head read and our
    // publish: plain read-then-setProperties would retry the stale
    // "1" onto the new head and silently erase the 10 (the lost-update
    // anomaly the drift accumulators hit); the CAS must re-derive
    @volatile var sneaked = false
    val racing = new LogStore {
      override def putIfAbsent(target: java.nio.file.Path,
          content: Array[Byte]): Boolean = {
        val s = new String(content, java.nio.charset.StandardCharsets.UTF_8)
        if (!sneaked && s.contains("\"graft.test.counter\":\"1\"}")) {
          sneaked = true
          TxLog.setProperties(dir, Map("graft.test.counter" -> "10")): Unit
          false // our attempt lost this version to the concurrent commit
        } else HardLinkLogStore.putIfAbsent(target, content)
      }
      override def putOverwrite(target: java.nio.file.Path,
          content: Array[Byte]): Unit =
        HardLinkLogStore.putOverwrite(target, content)
    }
    withStore(racing) {
      TxLog.transformProperties(dir) { props =>
        Map("graft.test.counter" ->
          (props("graft.test.counter").toLong + 1).toString)
      }: Unit
    }
    assert(sneaked, "the race hook never fired")
    assert(TxLog.snapshot(dir).props("graft.test.counter") === "11",
      "the retry must re-derive from the sneaked head (10 + 1), not re-publish 0 + 1")
  }

  test("transformProperties with an EMPTY delta commits nothing") {
    val dir = graft.Scratch.dir("graft-store-tp0").toString + "/t"
    TxLog.append(spark, dir, df(0 until 10)): Unit
    val v0 = TxLog.latestVersion(dir)
    // the nothing-to-do verdict must not burn a table version — the
    // probe-refresh path re-derives its work from the head and
    // legitimately finds none (a replayed stream batch, for one)
    val got = TxLog.transformProperties(dir)(_ => Map.empty)
    assert(got === v0, "empty delta must return the head version")
    assert(TxLog.latestVersion(dir) === v0, "empty delta must not commit")
  }

  test("transformProperties under contention: every increment lands exactly once") {
    val dir = graft.Scratch.dir("graft-store-tp2").toString + "/t"
    TxLog.append(spark, dir, df(0 until 10)): Unit
    TxLog.setProperties(dir, Map("graft.test.counter" -> "0")): Unit
    val nWriters = 6; val per = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    val start = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until nWriters).foreach { _ =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          try (0 until per).foreach { _ =>
            TxLog.transformProperties(dir) { props =>
              Map("graft.test.counter" ->
                (props("graft.test.counter").toLong + 1).toString)
            }: Unit
          } catch { case t: Throwable => errs.add(t) }
        }
      }): Unit
    }
    start.countDown(); pool.shutdown()
    assert(pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"writers failed: ${errs.peek()}")
    assert(TxLog.snapshot(dir).props("graft.test.counter") ===
      (nWriters * per).toString)
  }

  test("the DML rebase race runs identically over the conditional-put store") {
    withStore(ConditionalPutLogStore) {
      import spark.implicits._
      val dir = graft.Scratch.dir("graft-store-race").toString + "/t"
      (0 until 3).foreach(g => TxLog.append(spark, dir,
        (g * 100 until g * 100 + 50).map(i => (i.toLong, s"v$i")).toDF("id", "s")
          .repartition(1)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      val start = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val tasks: Seq[() => Unit] = (0 until 3).flatMap { g =>
        Seq(
          () => TxLog.append(spark, dir,
            Seq((1000L + g, "a")).toDF("id", "s")): Unit,
          () => TxLog.delete(spark, dir,
            s"id >= ${g * 100} AND id < ${g * 100 + 5}"): Unit)
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
      assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"disjoint writers over the object store failed: $errs")
      val ids = TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
      val want = (0 until 3).flatMap(g =>
        (g * 100 + 5 until g * 100 + 50).map(_.toLong) :+ (1000L + g)).toSet
      assert(ids === want)
      assert(TxLog.latestVersion(dir) === 8L)
    }
  }

  test("commit-race stress under injected latency + AMBIGUOUS put timeouts") {
    // the object-store failure mode POSIX never shows: the conditional
    // put times out before OR after the service acted. The protocol's
    // read-back rule must keep the race loss-free and duplicate-free —
    // a writer whose winning put's response was lost must still know
    // it won (a re-commit of the same batch would double its rows; an
    // abort would lose them).
    val flaky = new graft.sources.FlakyObjectStoreLogStore(
      seed = 20260815L, latencyMaxMs = 2, ambiguousRate = 0.35)
    stress(flaky, "flaky")
    // the faults actually fired — both the lost-response-after-success
    // class and the never-happened class
    assert(flaky.ambiguousAfter.get() > 0L,
      "no post-put ambiguity was injected — the spec proved nothing")
    assert(flaky.ambiguousBefore.get() > 0L,
      "no pre-put ambiguity was injected — the spec proved nothing")
  }

  test("DML rebase race survives the flaky store (losers rebase or abort, never corrupt)") {
    val flaky = new graft.sources.FlakyObjectStoreLogStore(
      seed = 7L, latencyMaxMs = 2, ambiguousRate = 0.3)
    withStore(flaky) {
      import spark.implicits._
      val dir = graft.Scratch.dir("graft-store-flakydml").toString + "/t"
      (0 until 3).foreach(g => TxLog.append(spark, dir,
        (g * 100 until g * 100 + 50).map(i => (i.toLong, s"v$i")).toDF("id", "s")
          .repartition(1)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
      val start = new java.util.concurrent.CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val tasks: Seq[() => Unit] = (0 until 3).flatMap { g =>
        Seq(
          () => TxLog.append(spark, dir,
            Seq((1000L + g, "a")).toDF("id", "s")): Unit,
          () => TxLog.delete(spark, dir,
            s"id >= ${g * 100} AND id < ${g * 100 + 5}"): Unit)
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
      assert(pool.awaitTermination(180, java.util.concurrent.TimeUnit.SECONDS))
      assert(errs.isEmpty, s"disjoint writers over the flaky store failed: $errs")
      val ids = TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
      val want = (0 until 3).flatMap(g =>
        (g * 100 + 5 until g * 100 + 50).map(_.toLong) :+ (1000L + g)).toSet
      assert(ids === want)
      assert(TxLog.latestVersion(dir) === 8L)
    }
  }

  test("DML, checkpoints, and time travel work unchanged over the conditional-put store") {
    withStore(ConditionalPutLogStore) {
      val dir = graft.Scratch.dir("graft-store-dml").toString + "/t"
      // 12 commits cross the checkpoint interval (10)
      (0 until 12).foreach(i => TxLog.append(spark, dir, df(i * 5 until i * 5 + 5)))
      assert(Files.exists(
        java.nio.file.Paths.get(dir, "_txlog", f"${10L}%020d.ckpt.json")))
      TxLog.delete(spark, dir, "id % 7 = 0")
      val live = TxLog.read(spark, dir).count()
      assert(live === (0L until 60L).count(_ % 7 != 0).toLong)
      assert(TxLog.read(spark, dir, Some(3L)).count() === 20L)
    }
  }
}
