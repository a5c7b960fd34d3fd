package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** CONVERT-to-format contract: a plain parquet directory becomes a full
  * TxLog table with zero data copy (hard links), the stats pass makes
  * pruning work immediately, and every capability (append, DV DML,
  * OPTIMIZE, time travel) applies after conversion. */
class TxConvertSpec extends AnyFunSuite with SparkTestBase {

  private def ino(p: String): Any =
    Files.getAttribute(Paths.get(p), "unix:ino")

  test("convert adopts a plain parquet dir zero-copy; table is fully functional") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graft-convert").toString + "/t"
    (0 until 200).map(i => (i.toLong, s"v$i", i % 4))
      .toDF("id", "s", "grp").repartition(3)
      .write.parquet(dir)
    val origParquet = {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.map(_.toString).filter(_.endsWith(".parquet")).toList
      finally s.close()
    }
    assert(TxLog.convertFromParquet(spark, dir) === 0L)
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size === origParquet.size)
    // zero copy: each adopted file shares an inode with an original
    val origInos = origParquet.map(ino).toSet
    snap.files.foreach(f => assert(origInos.contains(ino(s"$dir/${f.path}"))))
    assert(TxLog.read(spark, dir).count() === 200L)
    // stats landed: a selective range prunes files immediately
    assert(TxLog.readRange(spark, dir, "id", "0", "10").count() === 11L)
    // full capability after conversion: append, DV delete, optimize, travel
    TxLog.append(spark, dir, Seq((900L, "x", 0)).toDF("id", "s", "grp"))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "grp = 1")
    assert(TxLog.read(spark, dir).count() === 201L - 50L)
    assert(TxLog.read(spark, dir, Some(0L)).count() === 200L)
    TxLog.optimize(spark, dir)
    assert(TxLog.read(spark, dir).count() === 151L)
  }

  test("convert picks up nested subdirectories and refuses empty/already-converted dirs") {
    import spark.implicits._
    val root = graft.Scratch.dir("graft-convert2").toString
    val dir = s"$root/t"
    (0 until 30).map(i => (i.toLong, i % 3)).toDF("id", "p")
      .write.partitionBy("p").parquet(dir)
    // hive-partitioned layout: values live in the PATH, not the files —
    // the footer schema has only `id`; conversion adopts the data columns
    TxLog.convertFromParquet(spark, dir)
    assert(TxLog.read(spark, dir).columns.toSeq === Seq("id"))
    assert(TxLog.read(spark, dir).count() === 30L)
    intercept[IllegalArgumentException] {
      TxLog.convertFromParquet(spark, dir) // already a table
    }
    intercept[IllegalArgumentException] {
      TxLog.convertFromParquet(spark, s"$root/empty-nothing")
    }
  }
}
