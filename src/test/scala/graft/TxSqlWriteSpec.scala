package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TxCatalog, TxLog}

/** SQL WRITE path through the TxCatalog: INSERT INTO / INSERT OVERWRITE /
  * CTAS / CREATE / ALTER / DROP / RENAME all route through the TxLog
  * commit protocol — every statement lands as a log commit with the
  * same guarantees (schema fidelity, CHECK constraints, time travel)
  * as the Scala API. */
class TxSqlWriteSpec extends AnyFunSuite with SparkTestBase {

  private def freshCatalog(): (String, String) = {
    val root = graft.Scratch.dir("graft-txsql").toString
    val cat = "txw" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  test("CREATE TABLE + INSERT INTO commit through the log; time travel sees each insert") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, s STRING)")
    assert(TxLog.latestVersion(s"$root/t") === 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 0L)
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'c')")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 1")
      .head().getLong(0) === 2L)
  }

  test("INSERT INTO casts and positionally aligns to the table schema") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, s STRING)")
    // INT literal → BIGINT cast is Spark's own insert resolution
    spark.sql(s"SELECT CAST(7 AS INT) AS x, 'z' AS y").createOrReplaceTempView("ins_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM ins_src")
    val r = spark.sql(s"SELECT id, s FROM $cat.t").head()
    assert(r.getLong(0) === 7L && r.getString(1) === "z")
  }

  test("INSERT OVERWRITE replaces contents as one overwrite commit") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 6))
    spark.sql(s"INSERT OVERWRITE $cat.t VALUES (100, 'x')")
    assert(spark.sql(s"SELECT id FROM $cat.t").collect().map(_.getLong(0)).toSeq === Seq(100L))
    // the pre-overwrite version still reads (logical overwrite)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 0")
      .head().getLong(0) === 6L)
  }

  test("CTAS creates and loads in one statement") {
    val (cat, root) = freshCatalog()
    spark.sql(
      s"""CREATE TABLE $cat.agg AS
          SELECT CAST(id % 2 AS BIGINT) AS grp, count(*) AS n
          FROM VALUES (0), (1), (2), (3), (4) AS v(id)
          GROUP BY id % 2""")
    val out = spark.sql(s"SELECT grp, n FROM $cat.agg ORDER BY grp").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 3L), (1L, 2L)))
    assert(TxLog.latestVersion(s"$root/agg") === 1L) // create + insert
  }

  test("SQL inserts validate CHECK constraints; a rejected insert leaves no commit") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 3))
    TxLog.addConstraint(spark, s"$root/t", "id_small", "id < 1000")
    val before = TxLog.latestVersion(s"$root/t")
    val e = intercept[Exception](spark.sql(s"INSERT INTO $cat.t VALUES (5000, 'bad')"))
    assert(e.getMessage.contains("id_small") ||
      Option(e.getCause).exists(_.getMessage.contains("id_small")), e.getMessage)
    assert(TxLog.latestVersion(s"$root/t") === before)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 3L)
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES and ADD COLUMNS commit schema/props") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 3))
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.autoOptimize' = 'true')")
    assert(TxLog.snapshot(s"$root/t").props("graft.autoOptimize") === "true")
    spark.sql(s"ALTER TABLE $cat.t UNSET TBLPROPERTIES ('graft.autoOptimize')")
    assert(!spark.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
      .exists(_.getString(0) == "graft.autoOptimize"))
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (score DOUBLE)")
    // old rows read the new column as NULL; schema-only commit, no rewrite
    val r = spark.sql(s"SELECT id, score FROM $cat.t ORDER BY id").head()
    assert(r.isNullAt(1))
    spark.sql(s"INSERT INTO $cat.t VALUES (9, 'n', 0.5)")
    assert(spark.sql(s"SELECT score FROM $cat.t WHERE id = 9").head().getDouble(0) === 0.5)
  }

  test("DROP TABLE and RENAME TO operate on the table directory") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 3))
    // RENAME TO takes the new name relative to the table's catalog — a
    // catalog-prefixed name would be read as a NAMESPACE inside it
    spark.sql(s"ALTER TABLE $cat.t RENAME TO u")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/t")))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.u").head().getLong(0) === 3L)
    spark.sql(s"DROP TABLE $cat.u")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/u")))
    assertThrows[AnalysisException](spark.sql(s"SELECT * FROM $cat.u").collect())
  }

  test("DELETE FROM commits through the log; time travel keeps the rows") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 10))
    spark.sql(s"DELETE FROM $cat.t WHERE id >= 7 OR s = 'v2'")
    assert(spark.sql(s"SELECT id FROM $cat.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(0L, 1L, 3L, 4L, 5L, 6L))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t VERSION AS OF 0")
      .head().getLong(0) === 10L)
    // IN-list + NULL-test predicates translate too
    spark.sql(s"DELETE FROM $cat.t WHERE id IN (0, 4) AND s IS NOT NULL")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 4L)
    // unconditional delete empties the table but keeps it
    spark.sql(s"DELETE FROM $cat.t")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 0L)
  }

  test("concurrent CREATE: exactly one wins") {
    val (cat, root) = freshCatalog()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType)))
    TxLog.create(s"$root/c", schema)
    intercept[TxLog.TableExistsException](TxLog.create(s"$root/c", schema))
    intercept[Exception](spark.sql(s"CREATE TABLE $cat.c (id BIGINT)"))
  }

  test("a time-travel relation rejects writes") {
    val (cat, root) = freshCatalog()
    TxLog.append(spark, s"$root/t", df(0 until 3))
    TxLog.append(spark, s"$root/t", df(3 until 5))
    // INSERT targets can't carry VERSION AS OF in SQL; exercise the
    // guard directly through the catalog table's write builder
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "t")
    val catImpl = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val travel = catImpl.loadTable(ident, "0")
    assert(!travel.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.V1_BATCH_WRITE))
  }
}
