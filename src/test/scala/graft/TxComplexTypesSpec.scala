package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Complex-typed columns (array / map / struct) through the full table
  * lifecycle: append, SQL read, DML rewrite, OPTIMIZE, time travel.
  * Stats/pv machinery ignores them (statSupported is scalar-only), so
  * file skipping stays conservative; the data path is ordinary
  * parquet. */
class TxComplexTypesSpec extends AnyFunSuite with SparkTestBase {

  test("array/map/struct columns survive append, DML, OPTIMIZE, time travel") {
    val root = graft.Scratch.dir("graft-complex").toString
    val cat = "cpx" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    import spark.implicits._
    val d = (0 until 20).map(i =>
      (i.toLong, Seq(s"t$i", s"u$i"), Map("k" -> i), (i * 2, s"n$i")))
      .toDF("id", "tags", "attrs", "nested")
    TxLog.append(spark, dir, d)
    // scalar stats recorded; complex columns skipped, not crashed
    val snap = TxLog.snapshot(dir)
    assert(snap.files.exists(_.stats.contains("id")))
    assert(snap.files.forall(f => !f.stats.contains("tags")))
    // SQL reads the complex values incl. pushdown-unfriendly shapes
    assert(spark.sql(s"SELECT tags[1] FROM $cat.t WHERE id = 3")
      .head().getString(0) === "u3")
    assert(spark.sql(s"SELECT nested._1 FROM $cat.t WHERE id = 4")
      .head().getInt(0) === 8)
    // DML predicated on a scalar rewrites files carrying complex data
    spark.sql(s"DELETE FROM $cat.t WHERE id < 5")
    spark.sql(s"UPDATE $cat.t SET id = id + 100 WHERE id = 7")
    val ids = TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet
    assert(ids === ((5L until 20L).toSet - 7L + 107L))
    // the rewritten rows kept their complex payloads
    assert(spark.sql(s"SELECT attrs['k'] FROM $cat.t WHERE id = 107")
      .head().getInt(0) === 7)
    val vPre = TxLog.latestVersion(dir)
    TxLog.optimize(spark, dir)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 15L)
    assert(spark.sql(s"SELECT sum(size(tags)) FROM $cat.t").head().getLong(0) === 30L)
    // time travel reaches the pre-optimize complex data
    assert(TxLog.read(spark, dir, Some(vPre)).count() === 15L)
  }
}
