package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Column DEFAULT values through the DSv2 catalog: fixed at CREATE
  * TABLE, stored as SQL expression text
  * ([[TxLog.ColumnDefaults]]), surfaced to Spark as the
  * CURRENT_DEFAULT/EXISTS_DEFAULT column metadata so the ANALYZER
  * substitutes them into SQL INSERTs — the engine's write path never
  * fills anything itself, so the Scala-API strict-schema contract is
  * untouched. Rename migrates the property; drop tombstones it;
  * later ADD COLUMN … DEFAULT is refused (would need per-file-vintage
  * EXISTS-default semantics the read path does not track). */
class TxDefaultColumnsSpec extends AnyFunSuite with SparkTestBase {

  private def freshCat(): (String, String) = {
    val root = graft.Scratch.dir("graft-defcols").toString
    val cat = "dfl" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("omitted column and DEFAULT keyword both take the default; explicit wins") {
    val (cat, root) = freshCat()
    spark.sql(
      s"""CREATE TABLE $cat.t (
            k   INT,
            v   STRING DEFAULT 'missing',
            n   DOUBLE DEFAULT 1.5
          )""")
    val props = TxLog.snapshot(s"$root/t").props
    assert(props(TxLog.ColumnDefaults.Prefix + "v") === "'missing'")
    assert(props(TxLog.ColumnDefaults.Prefix + "n") === "1.5")
    // column-list INSERT omitting v,n; DEFAULT keyword; explicit values
    spark.sql(s"INSERT INTO $cat.t (k) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'real', 9.0)")
    val rows = spark.sql(s"SELECT k, v, n FROM $cat.t ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((1, "missing", 1.5), (2, "missing", 1.5), (3, "real", 9.0)))
  }

  test("non-literal default (expression) is evaluated by the analyzer") {
    val (cat, _) = freshCat()
    spark.sql(
      s"""CREATE TABLE $cat.e (
            k INT,
            tag STRING DEFAULT concat('u', '-', 'v')
          )""")
    spark.sql(s"INSERT INTO $cat.e (k) VALUES (7)")
    assert(spark.sql(s"SELECT tag FROM $cat.e").head().getString(0) === "u-v")
  }

  test("RENAME COLUMN migrates the default; DROP COLUMN tombstones it") {
    val (cat, root) = freshCat()
    spark.sql(s"CREATE TABLE $cat.r (k INT, v STRING DEFAULT 'd')")
    val dir = s"$root/r"
    spark.sql(s"INSERT INTO $cat.r (k) VALUES (1)")
    spark.sql(s"ALTER TABLE $cat.r RENAME COLUMN v TO w")
    val p1 = TxLog.snapshot(dir).props
    assert(p1.get(TxLog.ColumnDefaults.Prefix + "v").forall(_.isEmpty))
    assert(p1(TxLog.ColumnDefaults.Prefix + "w") === "'d'")
    // the migrated default still fills an omitted w
    spark.sql(s"INSERT INTO $cat.r (k) VALUES (2)")
    val rows = spark.sql(s"SELECT k, w FROM $cat.r ORDER BY k").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1))).toSeq ===
      Seq((1, "d"), (2, "d")))
    spark.sql(s"ALTER TABLE $cat.r DROP COLUMN w")
    val p2 = TxLog.snapshot(dir).props
    assert(p2.get(TxLog.ColumnDefaults.Prefix + "w").forall(_.isEmpty))
  }

  test("RENAME COLUMN migrates an identity spec with its high-water mark") {
    val (cat, root) = freshCat()
    spark.sql(s"""CREATE TABLE $cat.i (
      id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
      v STRING)""")
    val dir = s"$root/i"
    spark.sql(s"INSERT INTO $cat.i (v) VALUES ('a'), ('b')")
    spark.sql(s"ALTER TABLE $cat.i RENAME COLUMN id TO rid")
    val p = TxLog.snapshot(dir).props
    assert(p(TxLog.Identity.Prefix + "rid") === "10,2")
    assert(p.get(TxLog.Identity.Prefix + "id").forall(_.isEmpty))
    // allocation continues under the new name from the carried high water
    spark.sql(s"INSERT INTO $cat.i (v) VALUES ('c')")
    assert(spark.sql(s"SELECT rid FROM $cat.i ORDER BY rid").collect()
      .map(_.getLong(0)).toSeq === Seq(10L, 12L, 14L))
  }

  test("ADD COLUMN with DEFAULT is refused; DEFAULT + identity/generated refused") {
    val (cat, _) = freshCat()
    spark.sql(s"CREATE TABLE $cat.a (k INT)")
    val e1 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.a ADD COLUMN v STRING DEFAULT 'x'")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e1).exists(_.contains("DEFAULT")))
    val e2 = intercept[Exception] {
      spark.sql(s"""CREATE TABLE $cat.b (
        id BIGINT GENERATED ALWAYS AS IDENTITY DEFAULT 0)""")
    }
    assert(msgs(e2).nonEmpty)
  }

  test("Scala-API append stays strict: defaults never fill a missing column") {
    val (cat, root) = freshCat()
    spark.sql(s"CREATE TABLE $cat.s (k INT, v STRING DEFAULT 'd')")
    val dir = s"$root/s"
    import spark.implicits._
    // a frame missing v entirely must be refused, not silently defaulted
    intercept[Exception] {
      TxLog.append(spark, dir, Seq(1).toDF("k"))
    }
    // a frame with v = NULL keeps NULL (no write-path substitution)
    TxLog.append(spark, dir,
      Seq((2, null: String)).toDF("k", "v"))
    val r = spark.sql(s"SELECT k, v FROM $cat.s").collect()
    assert(r.map(x => (x.getInt(0), Option(x.getString(1)))).toSeq ===
      Seq((2, None)))
  }
}
