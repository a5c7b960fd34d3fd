package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** SQL UPDATE / MERGE INTO against TxLog catalog tables: routed by the
  * planner strategy through the same driver-side commit protocol as the
  * Scala API — expressions re-rendered, upsert/erasure merges mapped
  * structurally, unsupported shapes refused loudly, time-travel
  * relations read-only. */
class TxSqlDmlSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(): (String, String) = {
    val root = graft.Scratch.dir("graft-sqldml").toString
    val cat = "dml" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def seed(root: String, name: String = "t"): String = {
    import spark.implicits._
    val dir = s"$root/$name"
    TxLog.append(spark, dir,
      (0 until 20).map(i => (i.toLong, s"v$i", (i % 3).toLong)).toDF("id", "s", "grp"))
    dir
  }

  test("UPDATE with arithmetic, CASE, and pre-update column reads") {
    val (cat, root) = freshCat()
    val dir = seed(root)
    spark.sql(s"UPDATE $cat.t SET s = concat('u', CAST(id AS STRING)), grp = grp + 10 " +
      s"WHERE id % 4 = 1")
    val byId = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    (0L until 20L).foreach { i =>
      if (i % 4 == 1) assert(byId(i) === ((s"u$i", i % 3 + 10)))
      else assert(byId(i) === ((s"v$i", i % 3)))
    }
    assert(byId.size === 20)
  }

  test("UPDATE without WHERE touches every row; no-match UPDATE commits nothing") {
    val (cat, root) = freshCat()
    val dir = seed(root)
    spark.sql(s"UPDATE $cat.t SET grp = 0")
    assert(TxLog.read(spark, dir).where("grp <> 0").count() === 0L)
    val v = TxLog.latestVersion(dir)
    spark.sql(s"UPDATE $cat.t SET grp = 99 WHERE id = 12345")
    assert(TxLog.latestVersion(dir) === v)
  }

  test("MERGE upsert: UPDATE SET * + INSERT *") {
    import spark.implicits._
    val (cat, root) = freshCat()
    val dir = seed(root)
    Seq((5L, "FIVE", 50L), (100L, "HUNDRED", 0L))
      .toDF("id", "s", "grp").createOrReplaceTempView("src_upsert")
    spark.sql(s"""MERGE INTO $cat.t USING src_upsert ON t.id = src_upsert.id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""")
    val byId = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId.size === 21)
    assert(byId(5L) === (("FIVE", 50L)))
    assert(byId(100L) === (("HUNDRED", 0L)))
    assert(byId(6L) === (("v6", 0L)))
  }

  test("MERGE upsert aligns a differently-ordered source by name") {
    import spark.implicits._
    val (cat, root) = freshCat()
    seed(root)
    Seq(("REORDERED", 7L, 70L))
      .toDF("s", "id", "grp").createOrReplaceTempView("src_reorder")
    spark.sql(s"""MERGE INTO $cat.t USING src_reorder ON t.id = src_reorder.id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""")
    val r = spark.sql(s"SELECT s, grp FROM $cat.t WHERE id = 7").head()
    assert((r.getString(0), r.getLong(1)) === (("REORDERED", 70L)))
  }

  test("MERGE delete: WHEN MATCHED THEN DELETE erases the key set") {
    import spark.implicits._
    val (cat, root) = freshCat()
    val dir = seed(root)
    Seq(1L, 3L, 999L).toDF("id").createOrReplaceTempView("src_erase")
    spark.sql(s"""MERGE INTO $cat.t USING src_erase ON t.id = src_erase.id
                  WHEN MATCHED THEN DELETE""")
    assert(TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet ===
      (0L until 20L).toSet -- Set(1L, 3L))
  }

  test("conditional and partial MERGE clauses route through the generic path") {
    import spark.implicits._
    val (cat, root) = freshCat()
    val dir = seed(root)
    Seq((1L, "x", 0L)).toDF("id", "s", "grp").createOrReplaceTempView("src_cond")
    // conditional matched clause: id 1 has grp 1, condition holds -> *
    spark.sql(s"""MERGE INTO $cat.t USING src_cond ON t.id = src_cond.id
                  WHEN MATCHED AND t.grp = 1 THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""")
    assert(TxLog.read(spark, dir).where("id = 1").head().getString(1) === "x")
    // partial-column update leaves the other columns' pre-images
    spark.sql(s"""MERGE INTO $cat.t USING src_cond ON t.id = src_cond.id
                  WHEN MATCHED THEN UPDATE SET s = concat(src_cond.s, '!')""")
    val r = TxLog.read(spark, dir).where("id = 1").head()
    assert(r.getString(1) === "x!" && r.getLong(2) === 0L)
  }

  test("unsupported MERGE shapes and nondeterministic UPDATEs are refused loudly") {
    import spark.implicits._
    val (cat, root) = freshCat()
    seed(root)
    Seq((1L, "x", 0L)).toDF("id", "s", "grp").createOrReplaceTempView("src_bad")
    // a non-equality ON condition is refused loudly
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $cat.t USING src_bad ON t.id > src_bad.id
                    WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e1.getMessage.contains("txlog SQL DML") ||
      e1.getCause != null && e1.getCause.getMessage.contains("txlog SQL DML"))
    val e3 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.t SET grp = CAST(rand() * 10 AS BIGINT)")
    }
    assert(e3.getMessage.contains("deterministic") ||
      e3.getCause != null && e3.getCause.getMessage.contains("deterministic"))
    // silently dropping the evolution request would be the failure mode
    val e4 = intercept[Exception] {
      spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t
                    USING src_bad ON t.id = src_bad.id
                    WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e4.getMessage.contains("SCHEMA EVOLUTION") ||
      e4.getCause != null && e4.getCause.getMessage.contains("SCHEMA EVOLUTION"))
  }

  test("UPDATE takes the merge-on-read path when deletion vectors are on") {
    val (cat, root) = freshCat()
    val dir = seed(root)
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    spark.sql(s"UPDATE $cat.t SET s = 'dv' WHERE grp = 1")
    assert(TxLog.snapshot(dir).files.exists(_.dv.nonEmpty))
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE s = 'dv'")
      .head().getLong(0) === (0 until 20).count(_ % 3 == 1).toLong)
  }

  test("SQL UPDATE and MERGE work through a column mapping (renamed column)") {
    import spark.implicits._
    val (cat, root) = freshCat()
    val dir = seed(root)
    TxLog.renameColumn(dir, "grp", "bucket")
    spark.sql(s"UPDATE $cat.t SET s = concat(s, '!') WHERE bucket = 1")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE s LIKE '%!'")
      .head().getLong(0) === (0 until 20).count(_ % 3 == 1).toLong)
    Seq((7L, "MERGED", 70L)).toDF("id", "s", "bucket")
      .createOrReplaceTempView("src_mapped")
    spark.sql(s"""MERGE INTO $cat.t USING src_mapped ON t.id = src_mapped.id
                  WHEN MATCHED THEN UPDATE SET *
                  WHEN NOT MATCHED THEN INSERT *""")
    val r = spark.sql(s"SELECT s, bucket FROM $cat.t WHERE id = 7").head()
    assert((r.getString(0), r.getLong(1)) === (("MERGED", 70L)))
  }

  test("expression rendering round-trips quotes, typed literals, and nested CASE") {
    import spark.implicits._
    val (cat, root) = freshCat()
    TxLog.append(spark, s"$root/q",
      Seq((1L, "plain"), (2L, "it's")).toDF("id", "s"))
    // embedded single quote in both WHERE and SET literals
    spark.sql(s"UPDATE $cat.q SET s = 'x''y' WHERE s = 'it''s'")
    assert(TxLog.read(spark, s"$root/q").where("id = 2").head().getString(1) === "x'y")
    // typed date literal + function call in the predicate
    TxLog.append(spark, s"$root/d",
      Seq((1L, java.sql.Date.valueOf("2024-01-15")),
        (2L, java.sql.Date.valueOf("2023-06-01"))).toDF("id", "dt"))
    spark.sql(s"UPDATE $cat.d SET id = id + 10 " +
      "WHERE dt >= DATE'2024-01-01' AND year(dt) = 2024")
    assert(TxLog.read(spark, s"$root/d").select("id").collect()
      .map(_.getLong(0)).toSet === Set(11L, 2L))
    // nested CASE + function composition in SET
    spark.sql(s"UPDATE $cat.q SET s = CASE WHEN length(s) > 3 " +
      "THEN upper(substring(s, 1, 2)) ELSE s END")
    assert(TxLog.read(spark, s"$root/q").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap === Map(1L -> "PL", 2L -> "x'y"))
  }

  test("constraints gate SQL UPDATE; a violation leaves the table untouched") {
    val (cat, root) = freshCat()
    val dir = seed(root)
    TxLog.addConstraint(spark, dir, "pos", "id >= 0")
    intercept[Exception] {
      spark.sql(s"UPDATE $cat.t SET id = -id WHERE grp = 2")
    }
    assert(TxLog.read(spark, dir).where("id < 0").count() === 0L)
    assert(TxLog.latestVersion(dir) === 1L)
  }
}
