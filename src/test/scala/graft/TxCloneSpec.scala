package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Shallow-clone contract: zero data copy (hard links — same inode),
  * full content equality at the cloned version, complete independence
  * after the clone (either side's writes/DML/vacuum never affect the
  * other), properties/constraints/DV/column-mapping carry over, and a
  * source vacuum cannot break the clone. */
class TxCloneSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txclone").toString

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", i % 3)).toDF("id", "s", "grp")
  }

  private def idSet(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  private def ino(p: String): Any =
    Files.getAttribute(Paths.get(p), "unix:ino")

  test("clone equals the source snapshot with zero data copy (same inodes)") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 100).repartition(3))
    assert(TxLog.shallowClone(src, dst) === 0L)
    assert(idSet(TxLog.read(spark, dst)) === (0L until 100L).toSet)
    val srcSnap = TxLog.snapshot(src)
    srcSnap.files.foreach { f =>
      assert(ino(s"$src/${f.path}") === ino(s"$dst/${f.path}"), s"${f.path} was copied")
    }
    // stats/rows carried: pruning works immediately in the clone
    assert(TxLog.snapshot(dst).files.map(f => (f.path, f.rows, f.stats)).toSet ===
      srcSnap.files.map(f => (f.path, f.rows, f.stats)).toSet)
  }

  test("clone is independent: writes and DML on either side stay local") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 50))
    TxLog.shallowClone(src, dst)
    TxLog.append(spark, dst, df(100 until 110))
    TxLog.delete(spark, src, "id < 10")
    assert(idSet(TxLog.read(spark, src)) === (10L until 50L).toSet)
    assert(idSet(TxLog.read(spark, dst)) === ((0L until 50L) ++ (100L until 110L)).toSet)
  }

  test("source vacuum cannot break the clone (links keep bytes alive)") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 40))
    TxLog.shallowClone(src, dst)
    // rewrite the source so the original files leave its live set, then
    // reclaim them on the source side
    TxLog.overwrite(spark, src, df(500 until 505))
    (1 to 3).foreach(_ => TxLog.append(spark, src, df(600 until 601)))
    TxLog.vacuum(src, retainVersions = 2, staleStagingMillis = 0L)
    assert(idSet(TxLog.read(spark, dst)) === (0L until 40L).toSet)
  }

  test("time-travel clone pins a historical version") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 20))
    TxLog.append(spark, src, df(100 until 120))
    TxLog.shallowClone(src, dst, versionAsOf = Some(0L))
    assert(idSet(TxLog.read(spark, dst)) === (0L until 20L).toSet)
    assert(TxLog.latestVersion(dst) === 0L)
  }

  test("properties, constraints, and protocol carry over") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 10))
    TxLog.addConstraint(spark, src, "pos", "id >= 0")
    TxLog.setProperties(src, Map("graft.custom" -> "x"))
    TxLog.shallowClone(src, dst)
    assert(TxLog.snapshot(dst).props.get("graft.custom").contains("x"))
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(spark, dst, df(-5 until -1))
    }
  }

  test("cloning a DV-bearing snapshot links the vectors and keeps them applied") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 60).repartition(1))
    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "grp = 1")
    TxLog.shallowClone(src, dst)
    assert(idSet(TxLog.read(spark, dst)) === (0L until 60L).toSet.filterNot(_ % 3 == 1))
    assert(TxLog.snapshot(dst).protocol === 3L)
    // further DML in the clone merges its linked descriptor cleanly
    TxLog.delete(spark, dst, "grp = 2")
    assert(idSet(TxLog.read(spark, dst)) === (0L until 60L).toSet.filter(_ % 3 == 0))
    assert(idSet(TxLog.read(spark, src)) === (0L until 60L).toSet.filterNot(_ % 3 == 1))
  }

  test("cloning a column-mapped table keeps the logical/physical binding") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 10))
    TxLog.renameColumn(src, "grp", "bucket")
    TxLog.shallowClone(src, dst)
    val out = TxLog.read(spark, dst)
    assert(out.columns.toSeq === Seq("id", "s", "bucket"))
    assert(out.where("bucket = 1").count() === (0 until 10).count(_ % 3 == 1).toLong)
  }

  test("streaming a cloned DV table delivers only live rows (no resurrection)") {
    val root = tmp()
    val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ckpt")
    TxLog.append(spark, src, df(0 until 30).repartition(1))
    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "grp = 1")
    TxLog.shallowClone(src, dst)
    // fresh checkpoint streams the clone's v0 — its adds carry the DV
    val q = spark.readStream.format("txlog").option("path", dst).load()
      .writeStream.format("memory").queryName("clone_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("clone_stream").select("id")
      .collect().map(_.getLong(0)).toSet
    spark.catalog.dropTempView("clone_stream")
    assert(got === (0L until 30L).toSet.filterNot(_ % 3 == 1))
  }

  test("clone refuses an existing target") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    TxLog.append(spark, src, df(0 until 5))
    TxLog.append(spark, dst, df(0 until 5))
    intercept[TxLog.TableExistsException] {
      TxLog.shallowClone(src, dst)
    }
  }
}
