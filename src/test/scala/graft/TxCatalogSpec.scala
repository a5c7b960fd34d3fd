package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TxCatalog, TxLog}

/** SQL surface of the transactional format: `VERSION AS OF` resolves
  * through Spark's native time-travel parse to the pinned log snapshot,
  * never the directory; plain reads see the head; the scan inherits v2
  * parquet pushdown. */
class TxCatalogSpec extends AnyFunSuite with SparkTestBase {

  private def freshCatalog(): (String, String) = {
    val root = graft.Scratch.dir("graft-txcat").toString
    val cat = "txc" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  test("VERSION AS OF reads the pinned snapshot; head read sees everything") {
    val (cat, root) = freshCatalog()
    (0 until 3).foreach(i => TxLog.append(spark, s"$root/t", df(i * 10 until i * 10 + 10)))
    val v1 = spark.sql(s"SELECT id FROM $cat.t VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSet
    assert(v1 === (0L until 20L).toSet, "v1 must exclude version 2's files already on disk")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 30L)
    // an overwritten head: SQL must follow the log, not accumulate files
    TxLog.overwrite(spark, s"$root/t", df(100 until 105))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 5L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 2").head().getLong(0) === 30L)
  }

  test("missing table and missing version fail with analysis-time errors") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 3))
    assertThrows[AnalysisException](spark.sql(s"SELECT * FROM $cat.nope").collect())
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 9").collect())
    assert(e.getMessage.contains("version 9") || e.getMessage.contains("VERSION"))
  }

  test("TIMESTAMP AS OF resolves to the latest commit at or before the time") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 5))
    Thread.sleep(25)
    val mid = System.currentTimeMillis()
    Thread.sleep(25)
    TxLog.append(spark, s"$root/t", df(5 until 9))
    // render the probe instant in UTC explicitly — the session timezone
    // is UTC, the JVM default may not be
    val lit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(mid))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t TIMESTAMP AS OF '$lit'")
      .head().getLong(0) === 5L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 9L)
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.t TIMESTAMP AS OF '1990-01-01 00:00:00'").collect())
    assert(e.getMessage.contains("predates"))
  }

  test("the SQL scan pushes filters and prunes columns like any v2 parquet read") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 1000))
    val plan = spark.sql(s"SELECT id FROM $cat.t WHERE id >= 990")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(id,990)") && plan.contains("PushedFilters"),
      plan)
    assert(plan.contains("ReadSchema: struct<id:bigint>"), plan)
  }

  test("SHOW TBLPROPERTIES surfaces the log's properties and constraints") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 4))
    // note: 'owner'/'provider'/'location'/'comment' are Spark-reserved
    // table properties that SHOW TBLPROPERTIES filters out — use a
    // non-reserved key for the freeform case
    TxLog.setProperties(s"$root/t", Map(
      TxLog.AutoOptimize.Enabled -> "true", "team" -> "pipelines"))
    TxLog.addConstraint(spark, s"$root/t", "id_nonneg", "id >= 0")
    TxLog.addConstraint(spark, s"$root/t", "gone", "id < 100")
    TxLog.dropConstraint(s"$root/t", "gone")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props(TxLog.AutoOptimize.Enabled) === "true")
    assert(props("team") === "pipelines")
    assert(props(TxLog.ConstraintPrefix + "id_nonneg") === "id >= 0")
    assert(!props.contains(TxLog.ConstraintPrefix + "gone"),
      "tombstoned constraints must not surface")
    // the delegating table still scans: same rows as the API read
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 4L)
  }

  test("SHOW TABLES lists exactly the _txlog-bearing directories") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/a", df(0 until 2))
    TxLog.append(spark, s"$root/b", df(0 until 2))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/plain"))
    val names = spark.sql(s"SHOW TABLES IN $cat").select("tableName")
      .collect().map(_.getString(0)).toSet
    assert(names === Set("a", "b"))
  }

  test("SQL scans FILE-SKIP through pushed filters: pv partitions and stats ranges") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    val d = (0 until 30).map(i => (i.toLong, s"v$i", s"g${i % 3}"))
      .toDF("id", "s", "grp")
    TxLog.appendPartitioned(spark, s"$root/t", d, Seq("grp"))
    // corrupt a foreign partition's file: a SQL scan that opens it dies,
    // so a passing filtered query proves the file was skipped
    val g2 = TxLog.snapshot(s"$root/t").files.find(_.pv("grp") == "g2").get
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/t", g2.path), "junk".getBytes)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE grp = 'g0'")
      .head().getLong(0) === 10L)
    assert(spark.sql(
      s"SELECT sum(id) AS x FROM $cat.t WHERE grp IN ('g0','g1') AND id < 10")
      .head().getLong(0) === (0 until 10).filter(_ % 3 != 2).sum.toLong)
    // the unfiltered scan must still hit the corruption (skipping is
    // filter-driven, not accidental); sum, not count(*) — the bare
    // count answers from the log without opening any file
    intercept[Exception](spark.sql(s"SELECT sum(id) FROM $cat.t").collect())

    // stats-range skipping on a CLUSTERED unpartitioned table
    val d2 = (0 until 1000).map(i => (i.toLong, s"w$i")).toDF("id", "s")
    TxLog.append(spark, s"$root/r", d2.repartition(4))
    TxLog.optimize(spark, s"$root/r", targetBytes = 4096, sortBy = Seq("id"))
    val snap = TxLog.snapshot(s"$root/r")
    assert(snap.files.size > 1, "need multiple clustered files")
    // corrupt the file holding the HIGHEST ids; a low-range query skips it
    val top = snap.files.maxBy(_.stats("id").max.get.toLong)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/r", top.path), "junk".getBytes)
    val lowCut = snap.files.map(_.stats("id").min.get.toLong).max - 1
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.r WHERE id < $lowCut")
      .head().getLong(0) === lowCut)
    intercept[Exception](
      spark.sql(s"SELECT count(*) FROM $cat.r WHERE id >= $lowCut").collect())
  }

  test("SQL ALTER TABLE RENAME COLUMN is metadata-only and DML-visible") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 10))
    val filesBefore = TxLog.snapshot(s"$root/t").files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN s TO label")
    assert(TxLog.snapshot(s"$root/t").files.map(_.path).toSet === filesBefore,
      "a rename must not rewrite any data file")
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq === Seq("id", "label"))
    // SQL DML resolves the NEW name through the mapping
    spark.sql(s"DELETE FROM $cat.t WHERE label = 'v3'")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 9L)
    assert(spark.sql(s"SELECT label FROM $cat.t WHERE id = 4").head().getString(0) === "v4")
  }

  test("SQL ALTER TABLE DROP COLUMN narrows the schema without rewriting") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 5))
    val filesBefore = TxLog.snapshot(s"$root/t").files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN s")
    assert(TxLog.snapshot(s"$root/t").files.map(_.path).toSet === filesBefore)
    assert(spark.table(s"$cat.t").schema.fieldNames.toSeq === Seq("id"))
    // re-adding the same name via SQL reads NULL, never the dropped bytes
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (s STRING)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE s IS NOT NULL")
      .head().getLong(0) === 0L)
  }

  test("SQL ALTER COLUMN TYPE widens metadata-only; old files read promoted") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    val dir = s"$root/t"
    // int / float / decimal(10,2) columns, written narrow
    TxLog.append(spark, dir,
      (0 until 10).map(i => (i, i.toFloat / 2, BigDecimal(i * 100) / 100))
        .toDF("id", "ratio", "amt")
        .select(col("id").cast("int"), col("ratio").cast("float"),
          col("amt").cast("decimal(10,2)")))
    val filesBefore = TxLog.snapshot(dir).files.map(_.path).toSet
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN ratio TYPE DOUBLE")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN amt TYPE DECIMAL(16,2)")
    assert(TxLog.snapshot(dir).files.map(_.path).toSet === filesBefore,
      "a widening must not rewrite any data file")
    val sch = spark.table(s"$cat.t").schema
    assert(sch.map(f => f.name -> f.dataType.sql).toMap ===
      Map("id" -> "BIGINT", "ratio" -> "DOUBLE", "amt" -> "DECIMAL(16,2)"))
    // the narrow pages read through the widened schema, both surfaces
    val got = spark.sql(s"SELECT id, ratio, amt FROM $cat.t WHERE id = 7").head()
    assert(got.getLong(0) === 7L && got.getDouble(1) === 3.5 &&
      got.getDecimal(2) === new java.math.BigDecimal("7.00"))
    assert(TxLog.read(spark, dir).where("id = 7").head().getLong(0) === 7L)
    // new appends land wide; a mixed (narrow+wide file) scan agrees
    TxLog.append(spark, dir, Seq((100L, 9.5d, BigDecimal("123456789012.34")))
      .toDF("id", "ratio", "amt").select(col("id"), col("ratio"),
        col("amt").cast("decimal(16,2)")))
    assert(spark.sql(s"SELECT sum(id) AS s FROM $cat.t").head().getLong(0) ===
      45L + 100L)
    // pre-widening snapshots time-travel under their recorded schema
    assert(spark.sql(s"SELECT id FROM $cat.t VERSION AS OF 0").schema
      .head.dataType.sql === "INT")
  }

  test("ALTER COLUMN TYPE refuses narrowing and lossy retypes loudly") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    val dir = s"$root/t"
    TxLog.append(spark, dir,
      Seq((1L, 1.0d)).toDF("id", "x"))
    // integral narrowing dies in Spark's own analyzer (canUpCast);
    // lossy-but-upcastable retypes (long->double, double->string) pass
    // the analyzer and must die in the catalog's widening check
    val e1 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE INT"))
    assert(e1.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    val e2 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE DOUBLE"))
    assert(e2.getMessage.contains("not a widening"))
    val e3 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN x TYPE STRING"))
    assert(e3.getMessage.contains("not a widening"))
    // idempotent: same type is a no-op, not an error
    val v = TxLog.latestVersion(dir)
    TxLog.alterColumnType(dir, "id", org.apache.spark.sql.types.LongType)
    assert(TxLog.latestVersion(dir) === v)
  }

  test("widening stamps protocol 4; DML, stats pruning, and partitions survive it") {
    import spark.implicits._
    val (cat, root) = freshCatalog()
    val dir = s"$root/t"
    spark.sql(s"CREATE TABLE $cat.t (id INT, grp INT, v STRING) PARTITIONED BY (grp)")
    TxLog.append(spark, dir,
      (0 until 40).map(i => (i, i % 4, s"v$i")).toDF("id", "grp", "v"))
    assert(TxLog.snapshot(dir).protocol === 1L)
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN grp TYPE BIGINT") // partition col
    assert(TxLog.snapshot(dir).protocol === 4L)
    // pv pruning and stats written under INT still discriminate for a
    // BIGINT predicate (typed numeric canon), and DML routes through
    spark.sql(s"DELETE FROM $cat.t WHERE grp = 3")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 30L)
    spark.sql(s"UPDATE $cat.t SET v = 'wide' WHERE id = 8")
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE id = 8").head().getString(0) === "wide")
    assert(spark.sql(s"SELECT sum(grp) AS s FROM $cat.t").head().getLong(0) ===
      (0 until 40).filter(_ % 4 != 3).map(_ % 4).sum.toLong)
  }
}
