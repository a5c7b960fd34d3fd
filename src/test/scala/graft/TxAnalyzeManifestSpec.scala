package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** recomputeStats (ANALYZE) and generateManifest (external-engine
  * export): metadata-only stats refresh that sharpens skipping, and an
  * atomic point-in-time manifest of the live files. */
class TxAnalyzeManifestSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-analyze").toString + "/t"

  private def banded(dir: String, props: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    val rows = (0L until 400L).map(i => (i, s"v$i"))
    TxLog.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    if (props.nonEmpty) TxLog.setProperties(dir, props)
    (0 until 4).foreach(j => TxLog.append(spark, dir,
      rows.filter(r => r._1 / 100 == j).toDF("id", "s").coalesce(1)))
  }

  private def deleteScanned(dir: String): Long =
    TxLog.history(spark, dir).where("op = 'delete'").orderBy(desc("version"))
      .select(element_at(col("metrics"), "files_scanned")).head().getLong(0)

  test("ANALYZE sharpens skipping on files written under a no-stats policy") {
    val dir = tmp()
    banded(dir, Map(TxLog.Stats.NumIndexed -> "0"))
    assert(TxLog.snapshot(dir).files.forall(_.stats.isEmpty))
    TxLog.delete(spark, dir, "id = 17")
    assert(deleteScanned(dir) === 4L) // nothing to prune with
    // widen the policy back to default, re-derive stats, same shape prunes
    TxLog.setProperties(dir, Map(TxLog.Stats.NumIndexed -> ""))
    val v = TxLog.recomputeStats(spark, dir)
    assert(TxLog.snapshot(dir).files.forall(_.stats.contains("id")))
    TxLog.delete(spark, dir, "id = 217")
    assert(deleteScanned(dir) === 1L)
    assert(TxLog.read(spark, dir).count() === 398L)
    // metadata-only: the commit added no data and a stream sees nothing
    val h = TxLog.history(spark, dir).where(s"version = $v").head()
    assert(TxLog.changedFilesBetween(dir, v - 1, v).isEmpty, s"op=${h}")
  }

  test("ANALYZE preserves rows/pv and respects time travel") {
    val dir = tmp()
    banded(dir)
    val before = TxLog.snapshot(dir)
    val v = TxLog.recomputeStats(spark, dir)
    val after = TxLog.snapshot(dir)
    assert(after.files.map(f => f.path -> f.rows).toMap ===
      before.files.map(f => f.path -> f.rows).toMap)
    assert(TxLog.read(spark, dir).count() === 400L)
    // the prior version still replays with the OLD stats
    val prior = TxLog.snapshot(dir, Some(v - 1))
    assert(prior.files.map(_.path).toSet === after.files.map(_.path).toSet)
  }

  test("manifest lists exactly the live files, atomically, post-DML") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    banded(dir)
    TxLog.delete(spark, dir, "id >= 300") // drops one whole band
    val mf = TxLog.generateManifest(dir)
    val listed = Files.readAllLines(mf).asScala.filter(_.nonEmpty)
    val live = TxLog.snapshot(dir).files
      .map(f => Paths.get(dir, f.path).toAbsolutePath.toString)
    assert(listed.toSet === live.toSet)
    assert(listed.forall(p => Files.exists(Paths.get(p))))
    // an external reader over the manifest paths sees exactly the table
    val ext = spark.read.parquet(listed.toSeq: _*)
    assert(ext.count() === TxLog.read(spark, dir).count())
    // regeneration replaces atomically
    TxLog.append(spark, dir,
      { import spark.implicits._; Seq((999L, "x")).toDF("id", "s") })
    val listed2 = Files.readAllLines(TxLog.generateManifest(dir)).asScala
      .filter(_.nonEmpty)
    assert(listed2.size === listed.size + 1)
  }

  test("manifest refuses deletion vectors") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir,
      (0L until 50L).map(i => (i, s"v$i")).toDF("id", "s").coalesce(1))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id = 7")
    intercept[IllegalArgumentException] { TxLog.generateManifest(dir) }
  }
}
