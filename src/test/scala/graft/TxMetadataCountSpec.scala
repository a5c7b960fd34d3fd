package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Metadata-only `SELECT count(*)`: the unfiltered count is a LOG fact
  * (AddFile.rows is the live, DV-adjusted count) — answered with zero
  * file opens at any table size. Proven by corrupting EVERY data file:
  * the bare count still answers exactly; any filtered or grouped form
  * takes the real scan and hits the corruption. */
class TxMetadataCountSpec extends AnyFunSuite with SparkTestBase {

  test("count(*) answers from the log; filtered/grouped forms still scan") {
    val root = graft.Scratch.dir("graft-metacount").toString
    val cat = "mct" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    import spark.implicits._
    TxLog.append(spark, dir,
      (0 until 40).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "g"))
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id % 10 = 0") // 4 rows dead via DV
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 36L)
    // the plan is a local scan of the log fact, not a file read
    val plan = spark.sql(s"SELECT count(*) FROM $cat.t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"expected the log-fact local scan in:\n$plan")
    // corrupt EVERY data file: the bare count still answers…
    TxLog.snapshot(dir).files.foreach(f =>
      Files.write(Paths.get(dir, f.path), Array[Byte](0)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) === 36L)
    // …while a filtered count takes the real scan and hits the corruption
    intercept[Exception](
      spark.sql(s"SELECT count(*) FROM $cat.t WHERE id > 5").collect())
    intercept[Exception](
      spark.sql(s"SELECT g, count(*) FROM $cat.t GROUP BY g").collect())
  }

  test("empty table counts zero; count composes with other projections normally") {
    val root = graft.Scratch.dir("graft-metacount0").toString
    val cat = "mc0" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT, g STRING)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.e").head().getLong(0) === 0L)
    import spark.implicits._
    TxLog.append(spark, s"$root/e",
      (0 until 7).map(i => (i.toLong, "x")).toDF("id", "g"))
    // count + another aggregate: not the bare-count shape, normal path
    val r = spark.sql(s"SELECT count(*) AS n, sum(id) AS s FROM $cat.e").head()
    assert(r.getLong(0) === 7L && r.getLong(1) === 21L)
  }
}

/** Consumed pv-equality filters: on a fully partition-aligned table, a
  * partition equality/IN filter is consumed by the scan (pv is exact
  * per file), so `count(*) WHERE part = v` is answered from the log —
  * zero file opens — and filtered scans carry no redundant Filter over
  * the partition column. Any ineligible shape (mixed generations,
  * non-partition column, range) stays a residual. */
class TxPartitionCountSpec extends AnyFunSuite with SparkTestBase {

  test("partition-filtered count(*) answers from the log; probes prove zero IO") {
    val root = graft.Scratch.dir("graft-pcount").toString
    val cat = "pct" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    import spark.implicits._
    TxLog.appendPartitioned(spark, dir,
      (0 until 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"), Seq("grp"))
    // corrupt EVERY data file: the partition-filtered bare count still
    // answers exactly (log fact over pv-pruned survivors)
    TxLog.snapshot(dir).files.foreach(f =>
      Files.write(Paths.get(dir, f.path), Array[Byte](0)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE grp = 'g1'")
      .head().getLong(0) === 10L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE grp IN ('g0', 'g2')")
      .head().getLong(0) === 20L)
    // a range or non-partition filter keeps the real scan — and hits
    // the corruption
    intercept[Exception](spark.sql(
      s"SELECT count(*) FROM $cat.t WHERE grp = 'g1' AND id > 3").collect())
    intercept[Exception](spark.sql(
      s"SELECT count(*) FROM $cat.t WHERE id > 3").collect())
  }

  test("mixed-generation table: partition filters stay residual, rows exact") {
    val root = graft.Scratch.dir("graft-pcount2").toString
    val cat = "pc2" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val dir = s"$root/t"
    import spark.implicits._
    TxLog.append(spark, dir,
      (0 until 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"))
    TxLog.setPartitioning(dir, Seq("grp"))
    TxLog.append(spark, dir,
      (30 until 60).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp"))
    // legacy files lack pv: the filter must NOT be consumed — the scan
    // evaluates it row-wise and the answer spans both generations
    assert(spark.sql(s"SELECT count(*) FROM $cat.t WHERE grp = 'g1'")
      .head().getLong(0) === 20L)
    assert(spark.sql(s"SELECT sum(id) AS s FROM $cat.t WHERE grp = 'g1'")
      .head().getLong(0) ===
        (0L until 60L).filter(_ % 3 == 1).sum)
  }
}
