package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** `CALL <cat>.<proc>(…)` maintenance surface: optimize (with z-order),
  * vacuum, purge_deletes, history, clone, restore — all from plain SQL,
  * each returning a result relation; unknown procedures fail with the
  * available list. */
class TxProcedureSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(): (String, String) = {
    val root = graft.Scratch.dir("graft-proc").toString
    val cat = "prc" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(root: String, slices: Int = 4): String = {
    import spark.implicits._
    val dir = s"$root/t"
    (0 until slices).foreach { k =>
      TxLog.append(spark, dir,
        (0 until 50).map(i => (k * 1000L + i, s"v$i")).toDF("id", "s").repartition(1))
    }
    dir
  }

  test("CALL optimize compacts; CALL history reports the commits") {
    val (cat, root) = freshCat()
    val dir = seed(root)
    val r = spark.sql(s"CALL $cat.optimize(`table` => 't')").head()
    assert(r.getInt(0) === 4 && r.getInt(1) === 1)
    assert(TxLog.snapshot(dir).files.size === 1)
    val hist = spark.sql(s"CALL $cat.history(`table` => 't')").collect()
    assert(hist.length === 5) // 4 appends + optimize
    assert(hist.map(_.getString(1)).toSeq ===
      Seq("append", "append", "append", "append", "optimize"))
  }

  test("CALL vacuum reclaims after compaction; DRY RUN predicts without deleting") {
    val (cat, root) = freshCat()
    seed(root)
    spark.sql(s"CALL $cat.optimize(`table` => 't')")
    // push old versions out of the retention window
    (0 until 2).foreach(_ => spark.sql(s"INSERT INTO $cat.t VALUES (9999, 'x')"))
    val wouldDelete = spark.sql(
      s"CALL $cat.vacuum(`table` => 't', retain_versions => 2, dry_run => true)")
      .head().getLong(0)
    // dry run deleted NOTHING: time travel to version 0 still works
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 0")
      .head().getLong(0) === 50L)
    val deleted = spark.sql(s"CALL $cat.vacuum(`table` => 't', retain_versions => 2)")
      .head().getLong(0)
    assert(deleted === wouldDelete) // the prediction was exact
    assert(deleted >= 4L) // at least the four pre-compaction files
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 202L)
  }

  test("CALL vacuum retain_hours keeps versions inside the time window") {
    val (cat, root) = freshCat()
    seed(root)
    spark.sql(s"CALL $cat.optimize(`table` => 't')")
    (0 until 2).foreach(_ => spark.sql(s"INSERT INTO $cat.t VALUES (9999, 'x')"))
    // every commit is seconds old: a 1-hour window retains everything
    val kept = spark.sql(
      s"CALL $cat.vacuum(`table` => 't', retain_versions => 2, retain_hours => 1.0)")
      .head().getLong(0)
    assert(kept === 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 0")
      .head().getLong(0) === 50L)
  }

  test("CALL purge_deletes rewrites DV files from SQL") {
    val (cat, root) = freshCat()
    val dir = seed(root, slices = 2)
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    // v1-translatable predicate hitting both files partially
    spark.sql(s"DELETE FROM $cat.t WHERE id < 25 OR (id >= 1000 AND id < 1025)")
    assert(TxLog.snapshot(dir).files.exists(_.dv.nonEmpty))
    val r = spark.sql(s"CALL $cat.purge_deletes(`table` => 't')").head()
    assert(r.getInt(0) === 2)
    assert(TxLog.snapshot(dir).files.forall(_.dv.isEmpty))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 50L)
  }

  test("CALL clone + restore round-trip from SQL") {
    val (cat, root) = freshCat()
    seed(root, slices = 2)
    val v = spark.sql(s"CALL $cat.clone(source => 't', target => 'dev')")
      .head().getLong(0)
    assert(v === 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dev").head().getLong(0) === 100L)
    spark.sql(s"INSERT INTO $cat.dev VALUES (777, 'w')")
    spark.sql(s"CALL $cat.restore(`table` => 'dev', version => 0)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dev").head().getLong(0) === 100L)
  }

  test("CALL restore by timestamp resolves via monotonized commit time") {
    import spark.implicits._
    val (cat, root) = freshCat()
    val dir = s"$root/t"
    TxLog.append(spark, dir,
      (0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "s").repartition(1))
    Thread.sleep(15) // distinct commit millis: ts0 must resolve to v0 only
    TxLog.append(spark, dir,
      (1000 until 1050).map(i => (i.toLong, s"v$i")).toDF("id", "s").repartition(1))
    // the instant between v0 and v1, from the LOG's own timestamps
    // (wall-clock assertions would race the test machine)
    val h = TxLog.history(spark, dir).orderBy("version").collect()
    val ts0 = h(0).getLong(2)
    spark.sql(s"CALL $cat.restore(`table` => 't', timestamp => '$ts0')")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 50L)
    // exactly one of version/timestamp — both or neither refuse
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.restore(`table` => 't', version => 0, timestamp => '$ts0')")
    }
    assert(e.getMessage.contains("exactly one") ||
      (e.getCause != null && e.getCause.getMessage.contains("exactly one")))
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.restore(`table` => 't')")
    }
    assert(e2.getMessage.contains("exactly one") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("exactly one")))
  }

  test("CALL compute_stats re-derives stats; CALL generate_manifest exports paths") {
    import scala.jdk.CollectionConverters._
    val (cat, root) = freshCat()
    val dir = seed(root)
    // blank the stats, then ANALYZE from SQL and confirm they return
    TxLog.setProperties(dir, Map(TxLog.Stats.NumIndexed -> "0"))
    TxLog.recomputeStats(spark, dir)
    assert(TxLog.snapshot(dir).files.forall(_.stats.isEmpty))
    TxLog.setProperties(dir, Map(TxLog.Stats.NumIndexed -> ""))
    val v = spark.sql(s"CALL $cat.compute_stats(`table` => 't')").head().getLong(0)
    assert(v === TxLog.latestVersion(dir))
    assert(TxLog.snapshot(dir).files.forall(_.stats.contains("id")))
    val m = spark.sql(s"CALL $cat.generate_manifest(`table` => 't')").head()
    val paths = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(m.getString(0))).asScala.filter(_.nonEmpty)
    assert(m.getLong(1) === paths.size.toLong)
    assert(paths.size === TxLog.snapshot(dir).files.size)
    assert(spark.read.parquet(paths.toSeq: _*).count() === 200L)
  }

  test("CALL convert adopts a plain parquet directory") {
    import spark.implicits._
    val (cat, root) = freshCat()
    (0 until 80).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .repartition(2).write.parquet(s"$root/raw")
    val r = spark.sql(s"CALL $cat.convert(`table` => 'raw')").head()
    assert(r.getLong(0) === 0L && r.getInt(1) === 2)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.raw").head().getLong(0) === 80L)
    spark.sql(s"INSERT INTO $cat.raw VALUES (999, 'x')")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.raw").head().getLong(0) === 81L)
  }

  test("CALL drop_feature retires deletion vectors from SQL") {
    val (cat, root) = freshCat()
    val dir = seed(root)
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "id % 10 = 3")
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> ""))
    spark.sql(s"CALL $cat.purge_deletes(`table` => 't')").collect(): Unit
    val v = spark.sql(s"CALL $cat.drop_feature(`table` => 't', " +
      "feature => 'deletionVectors')").head().getLong(0)
    val snap = TxLog.snapshot(dir)
    assert(snap.version === v && snap.features.isEmpty && snap.protocol === 1L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 180L)
  }

  test("SHOW PROCEDURES lists the maintenance surface") {
    val (cat, _) = freshCat()
    val names = spark.sql(s"SHOW PROCEDURES IN $cat").collect()
      .map(_.getString(3)).toSet
    assert(names === Set("optimize", "optimize_partition", "vacuum",
      "purge_deletes", "history", "clone", "restore", "convert", "detail",
      "cleanup_log", "compute_stats", "generate_manifest", "set_partitioning",
      "drop_feature", "table_features"))
  }

  test("CALL table_features surfaces protocol and both feature sets") {
    val (cat, root) = freshCat()
    seed(root)
    TxLog.setProperties(s"$root/t",
      Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, s"$root/t", "id % 7 = 0")
    val r = spark.sql(s"CALL $cat.table_features(`table` => 't')").head()
    assert(r.getLong(0) === 3L) // deletionVectors' legacy int
    assert(r.getString(1) === "deletionVectors")
    assert(r.getString(2) === "deletionVectors")
  }

  test("CALL detail reports the snapshot's operational state") {
    val (cat, root) = freshCat()
    seed(root)
    TxLog.setProperties(s"$root/t",
      Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, s"$root/t", "id % 7 = 0")
    val r = spark.sql(s"CALL $cat.detail(`table` => 't')").head()
    assert(r.getLong(0) === TxLog.latestVersion(s"$root/t")) // version
    val snap = TxLog.snapshot(s"$root/t")
    assert(r.getLong(1) === snap.files.size.toLong)
    assert(r.getLong(3) === snap.rows)
    assert(r.getString(4) === "") // unpartitioned
    assert(r.getLong(5) === 3L)  // DV commit stamped protocol 3
    assert(r.getLong(6) >= 1L)   // at least one DV-bearing file
    assert(r.getLong(7) === 0L)  // unpartitioned: no legacy-layout files
    // partition evolution: legacy files counted until OPTIMIZE migrates
    TxLog.setPartitioning(s"$root/t", Seq("s"))
    val r2 = spark.sql(s"CALL $cat.detail(`table` => 't')").head()
    assert(r2.getLong(7) > 0L)
    TxLog.optimize(spark, s"$root/t")
    val r3 = spark.sql(s"CALL $cat.detail(`table` => 't')").head()
    assert(r3.getLong(7) === 0L)
  }

  test("unknown procedure fails with the available list") {
    val (cat, root) = freshCat()
    seed(root, slices = 1)
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.nonsense(`table` => 't')")
    }
    assert(e.getMessage.contains("no procedure") ||
      (e.getCause != null && e.getCause.getMessage.contains("no procedure")))
  }
}
