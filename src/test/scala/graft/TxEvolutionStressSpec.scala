package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Concurrency stress for partition evolution and the general
  * replaceWhere: racing writers under the optimistic protocol must
  * converge to a serial-equivalent state — every appended row present
  * exactly once, the final layout one of the contenders', old-layout
  * files harmlessly legacy. */
class TxEvolutionStressSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-evostress").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
  }

  test("8 appenders race one partition evolution: no row lost or duplicated") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10))
    val pool = Executors.newFixedThreadPool(9)
    val start = new CountDownLatch(1)
    val errs = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Throwable]())
    (0 until 8).foreach { t =>
      pool.execute { () =>
        start.await()
        try TxLog.append(spark, dir, df(1000 + t * 100 until 1000 + t * 100 + 20))
        catch { case e: Throwable => errs.add(e): Unit }
      }
    }
    pool.execute { () =>
      start.await()
      try TxLog.setPartitioning(dir, Seq("grp")): Unit
      catch { case e: Throwable => errs.add(e): Unit }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"unexpected failures: $errs")
    val got = TxLog.read(spark, dir).select("id").collect().map(_.getLong(0))
    val want = (0L until 10L) ++
      (0 until 8).flatMap(t => 1000 + t * 100 until 1000 + t * 100 + 20).map(_.toLong)
    assert(got.sorted.toSeq === want.sorted, "exactly-once across the race")
    assert(TxLog.partitionColsOf(TxLog.snapshot(dir)) === Seq("grp"))
    // appends that landed after the evolution are aligned; earlier ones
    // are legacy — both readable, and OPTIMIZE converges the layout
    TxLog.optimize(spark, dir)
    val snap = TxLog.snapshot(dir)
    assert(snap.files.filter(_.rows > 0).forall(_.pv.contains("grp")))
    assert(TxLog.read(spark, dir).count() === want.size.toLong)
  }

  test("replaceWhere rebases over a disjoint concurrent append") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30))          // v0 — replace reads here
    TxLog.append(spark, dir, df(500 until 510))       // v1 — racing winner
    import spark.implicits._
    val repl = Seq((5L, "r", "gX")).toDF("id", "s", "grp")
    val v = TxLog.replaceWhere(spark, dir, repl, "id < 10",
      readVersionOpt = Some(0L))
    assert(v === 2L, "the replace must rebase past the winner")
    // serial order: replace first (over v0), append after — the appended
    // rows survive even though they match nothing here
    val ids = TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === ((10L until 30L).toSet + 5L ++ (500L until 510L)))
  }

  test("replaceWhere conflicts loudly when the winner touched a replaced file") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30).coalesce(1)) // one file: everything collides
    TxLog.delete(spark, dir, "id = 3")                   // v1 rewrites the file
    import spark.implicits._
    val repl = Seq((5L, "r", "gX")).toDF("id", "s", "grp")
    intercept[TxLog.ConcurrentWriteException](
      TxLog.replaceWhere(spark, dir, repl, "id < 10", readVersionOpt = Some(0L)))
  }
}
