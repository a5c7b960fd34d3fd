package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AtomicSwap

/** Crash-window recovery contract of the directory swap, exercised
  * directly for both failure points: died BETWEEN the two renames (live
  * missing, trash present → restore) and died AFTER the swap but before
  * cleanup (both present → drop stale trash). */
class AtomicSwapSpec extends AnyFunSuite {

  private def mkDir(parent: String, name: String, marker: String): String = {
    val d = Paths.get(parent, name)
    Files.createDirectories(d)
    Files.writeString(d.resolve("data.txt"), marker)
    d.toString
  }

  test("recover restores the trash snapshot when live is missing") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t.swap_old", "old-data")
    AtomicSwap.recover(s"$root/t")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "old-data")
    assert(!Files.exists(Paths.get(root, "t.swap_old")))
  }

  test("recover drops stale trash when live exists") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t", "live-data")
    mkDir(root, "t.swap_old", "stale")
    AtomicSwap.recover(s"$root/t")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "live-data")
    assert(!Files.exists(Paths.get(root, "t.swap_old")))
  }

  test("replace swaps tmp into live and cleans up") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t", "before")
    mkDir(root, "t.new", "after")
    AtomicSwap.replace(s"$root/t", s"$root/t.new")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "after")
    assert(!Files.exists(Paths.get(root, "t.new")))
    assert(!Files.exists(Paths.get(root, "t.swap_old")))
  }

  test("replaceVersioned archives the displaced snapshot; versions list and retention work") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t", "gen0")
    mkDir(root, "t.n1", "gen1")
    mkDir(root, "t.n2", "gen2")
    assert(AtomicSwap.replaceVersioned(s"$root/t", s"$root/t.n1") === Some(0))
    assert(AtomicSwap.replaceVersioned(s"$root/t", s"$root/t.n2") === Some(1))
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "gen2")
    assert(AtomicSwap.versions(s"$root/t") === Seq(0, 1))
    assert(Files.readString(
      Paths.get(AtomicSwap.versionDir(s"$root/t", 0), "data.txt")) === "gen0")
    assert(Files.readString(
      Paths.get(AtomicSwap.versionDir(s"$root/t", 1), "data.txt")) === "gen1")
    AtomicSwap.dropVersionsBefore(s"$root/t", 1)
    assert(AtomicSwap.versions(s"$root/t") === Seq(1))
    // recover() must not disturb a healthy versioned layout
    AtomicSwap.recover(s"$root/t")
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "gen2")
    assert(AtomicSwap.versions(s"$root/t") === Seq(1))
  }

  test("writer lock: a second writer fails cleanly while the first holds the span") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t", "gen0")
    val tmpA = mkDir(root, "t.a", "writer-a")
    val tmpB = mkDir(root, "t.b", "writer-b")
    val aInside = new java.util.concurrent.CountDownLatch(1)
    val bDone = new java.util.concurrent.CountDownLatch(1)
    @volatile var bFailure: Option[Throwable] = None
    val a = new Thread(() =>
      AtomicSwap.withWriterLock(s"$root/t") {
        aInside.countDown()
        bDone.await() // hold the lock until B has tried and lost
        AtomicSwap.replace(s"$root/t", tmpA) // reentrant under the held lock
      })
    val b = new Thread(() => {
      aInside.await()
      bFailure = scala.util.Try(AtomicSwap.replace(s"$root/t", tmpB)).failed.toOption
      bDone.countDown()
    })
    a.start(); b.start(); a.join(30000); b.join(30000)
    assert(bFailure.exists(_.isInstanceOf[AtomicSwap.ConcurrentSwapException]),
      s"loser should fail with ConcurrentSwapException, got $bFailure")
    // winner's swap landed; loser's tmp dir survives untouched for a retry
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "writer-a")
    assert(Files.readString(Paths.get(tmpB, "data.txt")) === "writer-b")
    // lock released → the loser's retry now succeeds
    AtomicSwap.replace(s"$root/t", tmpB)
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "writer-b")
  }

  test("racing versioned swaps: every survivor state is a complete single version") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t", "gen0")
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val others = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { w =>
      new Thread(() => (0 until 25).foreach { i =>
        val tmp = mkDir(root, s"t.w$w-$i", s"w$w-$i")
        try AtomicSwap.replaceVersioned(s"$root/t", tmp)
        catch {
          case _: AtomicSwap.ConcurrentSwapException => losses.incrementAndGet()
          case t: Throwable => others.add(t)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    // No mid-protocol wreckage: only lock losses, never rename collisions
    assert(others.isEmpty, s"non-lock failures: ${others.toArray.toSeq}")
    // live dir is exactly one writer's complete payload
    val liveMarker = Files.readString(Paths.get(root, "t", "data.txt"))
    assert(liveMarker.matches("w[12]-\\d+|gen0"), liveMarker)
    assert(!Files.exists(Paths.get(s"$root/t.swap_old")))
    assert(!Files.exists(Paths.get(s"$root/t.swap_lock")))
  }

  test("breakLock clears a crashed writer's orphan lock; recover leaves locks alone") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t", "gen0")
    val tmp = mkDir(root, "t.new", "gen1")
    Files.createFile(Paths.get(s"$root/t.swap_lock")) // simulated crash leftovers
    AtomicSwap.recover(s"$root/t")
    assert(Files.exists(Paths.get(s"$root/t.swap_lock")), "recover must not steal a lock")
    intercept[AtomicSwap.ConcurrentSwapException] {
      AtomicSwap.replace(s"$root/t", tmp)
    }
    AtomicSwap.breakLock(s"$root/t")
    AtomicSwap.replace(s"$root/t", tmp)
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "gen1")
  }

  test("versioned swap on first write (no prior live) archives nothing") {
    val root = graft.Scratch.dir("graft-swap").toString
    mkDir(root, "t.n0", "gen0")
    assert(AtomicSwap.replaceVersioned(s"$root/t", s"$root/t.n0") === None)
    assert(Files.readString(Paths.get(root, "t", "data.txt")) === "gen0")
    assert(AtomicSwap.versions(s"$root/t") === Seq.empty)
  }
}

/** The concurrent-reader half of the swap contract (round-3 verdict,
  * next-round #5), exercised with a REAL Spark reader: a scan whose file
  * listing was resolved before the swap must either complete on the old
  * data or fail cleanly — never return a mix of old and new rows. A
  * reader that instead pins an archived [[AtomicSwap.versionDir]] is
  * untouched by the rewrite. */
class AtomicSwapReaderSpec extends AnyFunSuite with SparkTestBase {

  test("pre-swap reader: all-old rows or clean failure, never a mixed read") {
    val root = graft.Scratch.dir("graft-swap-rd").toString
    val live = s"$root/t"
    // generation 0: marker value 1 in several files
    spark.range(0, 1000).selectExpr("id", "1 AS gen")
      .repartition(4).write.parquet(live)
    // the reader resolves its file listing NOW (InMemoryFileIndex pins paths)
    val reader = spark.read.parquet(live)
    assert(reader.inputFiles.nonEmpty)
    // generation 1 arrives and is swapped in
    spark.range(0, 1000).selectExpr("id", "2 AS gen")
      .repartition(4).write.parquet(s"$root/t.new")
    AtomicSwap.replace(live, s"$root/t.new")
    val outcome = scala.util.Try(reader.select("gen").collect().map(_.getInt(0)).toSet)
    outcome match {
      case scala.util.Success(gens) =>
        assert(gens === Set(1), s"mixed-version read observed: $gens")
      case scala.util.Failure(_) => () // clean failure is inside the contract
    }
    // a fresh reader sees only the new generation
    val fresh = spark.read.parquet(live).select("gen").collect().map(_.getInt(0)).toSet
    assert(fresh === Set(2))
  }

  test("versioned reader is untouched by a later rewrite") {
    val root = graft.Scratch.dir("graft-swap-rd").toString
    val live = s"$root/t"
    spark.range(0, 100).selectExpr("id", "1 AS gen").write.parquet(live)
    spark.range(0, 100).selectExpr("id", "2 AS gen").write.parquet(s"$root/t.new")
    val v = AtomicSwap.replaceVersioned(live, s"$root/t.new").get
    val pinned = spark.read.parquet(AtomicSwap.versionDir(live, v))
    spark.range(0, 100).selectExpr("id", "3 AS gen").write.parquet(s"$root/t.new2")
    assert(AtomicSwap.replaceVersioned(live, s"$root/t.new2") === Some(v + 1))
    // the pinned version still reads completely and purely
    assert(pinned.select("gen").collect().map(_.getInt(0)).toSet === Set(1))
    assert(spark.read.parquet(live).select("gen").head().getInt(0) === 3)
  }
}
