package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** `SHOW PARTITIONS` over the log's pv metadata (DSv2
  * SupportsPartitionManagement, read side): served from the snapshot
  * alone — zero file opens; partial specs filter; mutation DDL
  * (ADD/DROP PARTITION) is refused (partitions derive from written
  * data); a mixed-generation table refuses the listing rather than
  * under-reporting. */
class TxShowPartitionsSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(): (String, String) = {
    val root = graft.Scratch.dir("graft-showpart").toString
    val cat = "shp" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", s"g${i % 3}", (i % 2).toLong))
      .toDF("id", "s", "grp", "par")
  }

  test("full listing, partial spec, typed rendering") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/t", df(0 until 30), Seq("grp", "par"))
    val all = spark.sql(s"SHOW PARTITIONS $cat.t").collect().map(_.getString(0))
    assert(all.toSet === (for (g <- 0 to 2; p <- 0 to 1)
      yield s"grp=g$g/par=$p").toSet)
    val some = spark.sql(s"SHOW PARTITIONS $cat.t PARTITION (grp = 'g1')")
      .collect().map(_.getString(0))
    assert(some.toSet === Set("grp=g1/par=0", "grp=g1/par=1"))
  }

  test("listing reflects DML: an emptied partition disappears") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/t", df(0 until 30), Seq("grp"))
    spark.sql(s"DELETE FROM $cat.t WHERE grp = 'g2'")
    val all = spark.sql(s"SHOW PARTITIONS $cat.t").collect().map(_.getString(0))
    assert(all.toSet === Set("grp=g0", "grp=g1"))
  }

  test("mutation DDL refused; unpartitioned and mixed-generation refuse") {
    val (cat, root) = freshCat()
    TxLog.appendPartitioned(spark, s"$root/t", df(0 until 12), Seq("grp"))
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ADD PARTITION (grp = 'g9')"))
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t DROP PARTITION (grp = 'g0')"))
    assert(spark.sql(s"SHOW PARTITIONS $cat.t").count() === 3)
    // unpartitioned: Spark itself refuses the statement
    TxLog.append(spark, s"$root/u", df(0 until 6))
    intercept[Exception](spark.sql(s"SHOW PARTITIONS $cat.u").collect())
    // mixed generation (partition evolution mid-migration): refuse
    // rather than under-report the legacy files' partitions
    TxLog.append(spark, s"$root/m", df(0 until 12))
    TxLog.setPartitioning(s"$root/m", Seq("grp"))
    TxLog.append(spark, s"$root/m", df(12 until 24))
    val e = intercept[Exception](spark.sql(s"SHOW PARTITIONS $cat.m").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("OPTIMIZE")))
    TxLog.optimize(spark, s"$root/m")
    assert(spark.sql(s"SHOW PARTITIONS $cat.m").count() === 3)
  }
}
