package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Generated partition columns ([[TxLog.GeneratedCols]] — Iceberg's
  * hidden partitioning / Delta's generated columns): a materialized
  * transform of a base column, computed on write, certified by a
  * companion CHECK, and consumed by file skipping through PREDICATE
  * DERIVATION — a filter on the raw base column prunes by the
  * generated partition with no query rewrite. */
class TxGeneratedSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-gen").toString + "/t"

  private def ts(s: String) = Timestamp.valueOf(s)

  /** events-shaped table hidden-partitioned by date(ts): 4 days × 50
    * rows, one partition file per day. */
  private def dayTable(dir: String): Unit = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("ts_day", org.apache.spark.sql.types.DateType)))
    TxLog.create(dir, schema, partitionBy = Seq("ts_day"))
    TxLog.addGeneratedColumn(spark, dir, "ts_day", "date(ts)")
    val rows = for (d <- 0 until 4; i <- 0 until 50) yield
      (d * 50L + i, ts(f"2026-03-${d + 10}%02d ${i % 24}%02d:30:00"))
    // the frame OMITS ts_day entirely — the write computes it
    TxLog.append(spark, dir, rows.toDF("id", "ts"))
  }

  private def scanned(dir: String, op: String): Seq[Long] =
    TxLog.history(spark, dir).where(s"op = '$op'").orderBy("version")
      .select(element_at(col("metrics"), "files_scanned"))
      .collect().toSeq.map(_.getLong(0))

  test("write computes the omitted generated column and partition-aligns") {
    val dir = tmp()
    dayTable(dir)
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size === 4)
    assert(snap.files.flatMap(_.pv.get("ts_day")).sorted ===
      Seq("2026-03-10", "2026-03-11", "2026-03-12", "2026-03-13"))
    val got = TxLog.read(spark, dir).where("id = 57").head()
    assert(got.getDate(2).toString === "2026-03-11")
  }

  test("raw-ts range DELETE prunes to the touched days via derivation") {
    val dir = tmp()
    dayTable(dir)
    // a raw-timestamp range spanning one day — NO reference to ts_day
    TxLog.delete(spark, dir,
      "ts >= timestamp'2026-03-11 00:00:00' AND ts < timestamp'2026-03-12 00:00:00'")
    assert(scanned(dir, "delete") === Seq(1L))
    assert(TxLog.read(spark, dir).count() === 150L)
    assert(TxLog.read(spark, dir)
      .where("ts >= '2026-03-11' AND ts < '2026-03-12'").count() === 0L)
  }

  test("boundary soundness: an inclusive day-edge bound keeps the edge row") {
    import spark.implicits._
    val dir = tmp()
    dayTable(dir)
    // midnight row ON the derived boundary
    TxLog.append(spark, dir, Seq((999L, ts("2026-03-12 00:00:00"))).toDF("id", "ts"))
    TxLog.delete(spark, dir, "ts <= timestamp'2026-03-12 00:00:00'")
    // day-10, day-11 files die; the midnight row lives in a day-12 file
    // that MUST be scanned (ts <= midnight derives ts_day <= 2026-03-12)
    assert(TxLog.read(spark, dir).where("id = 999").count() === 0L)
    assert(TxLog.read(spark, dir).count() === 100L)
  }

  test("bucket transform: equality derives, ranges do not") {
    import spark.implicits._
    val dir = tmp()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("k_bucket", org.apache.spark.sql.types.LongType)))
    TxLog.create(dir, schema, partitionBy = Seq("k_bucket"))
    TxLog.addGeneratedColumn(spark, dir, "k_bucket", "bucket(4, k)")
    TxLog.append(spark, dir,
      (0L until 200L).map(k => (k, s"v$k")).toDF("k", "v"))
    val files = TxLog.snapshot(dir).files.size
    assert(files === 4)
    TxLog.delete(spark, dir, "k = 17")
    assert(scanned(dir, "delete") === Seq(1L))
    assert(TxLog.read(spark, dir).count() === 199L)
    // a RANGE on the base must not derive a bucket bound: all bucket
    // files holding the range are scanned and the delete is complete
    TxLog.delete(spark, dir, "k >= 100")
    assert(TxLog.read(spark, dir).count() === 99L)
    assert(TxLog.read(spark, dir).where("k >= 100").count() === 0L)
  }

  test("truncate transforms: integral floor (negatives too) and string prefix") {
    import spark.implicits._
    val dir = tmp()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_trunc", org.apache.spark.sql.types.LongType)))
    TxLog.create(dir, schema, partitionBy = Seq("n_trunc"))
    TxLog.addGeneratedColumn(spark, dir, "n_trunc", "truncate(100, n)")
    TxLog.append(spark, dir, (-150L to 249L).map(Tuple1(_)).toDF("n"))
    val pvs = TxLog.snapshot(dir).files.flatMap(_.pv.get("n_trunc")).sorted
    assert(pvs === Seq("-100", "-200", "0", "100", "200").sorted)
    TxLog.delete(spark, dir, "n = -150") // floor(-150/100)*100 = -200
    assert(scanned(dir, "delete") === Seq(1L))
    assert(TxLog.read(spark, dir).count() === 399L)

    val dir2 = tmp()
    val schema2 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("s_trunc", org.apache.spark.sql.types.StringType)))
    TxLog.create(dir2, schema2, partitionBy = Seq("s_trunc"))
    TxLog.addGeneratedColumn(spark, dir2, "s_trunc", "truncate(2, s)")
    TxLog.append(spark, dir2,
      Seq("aardvark", "apple", "banana", "berry", "cherry").map(Tuple1(_)).toDF("s"))
    TxLog.delete(spark, dir2, "s = 'banana'")
    assert(scanned(dir2, "delete") === Seq(1L))
    assert(TxLog.read(spark, dir2).count() === 4L)
  }

  test("month/hour/year transforms derive lexicographic range bounds") {
    import spark.implicits._
    val dir = tmp()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("ts_month", org.apache.spark.sql.types.StringType)))
    TxLog.create(dir, schema, partitionBy = Seq("ts_month"))
    TxLog.addGeneratedColumn(spark, dir, "ts_month", "month(ts)")
    val rows = for (m <- 1 to 4; i <- 0 until 10) yield
      (m * 10L + i, ts(f"2025-$m%02d-15 12:00:00"))
    TxLog.append(spark, dir, rows.toDF("id", "ts"))
    assert(TxLog.snapshot(dir).files.size === 4)
    // month boundary crossing December→January is still lexicographic
    TxLog.delete(spark, dir, "ts >= timestamp'2025-02-01 00:00:00' " +
      "AND ts < timestamp'2025-03-01 00:00:00'")
    assert(scanned(dir, "delete") === Seq(1L))
    assert(TxLog.read(spark, dir).count() === 30L)
  }

  test("NULL heal and wrong-value rejection") {
    import spark.implicits._
    val dir = tmp()
    dayTable(dir)
    // a frame CARRYING the column as NULL (Spark's by-name INSERT pad)
    val withNull = Seq((1000L, ts("2026-03-10 05:00:00")))
      .toDF("id", "ts")
      .withColumn("ts_day", lit(null).cast("date"))
    TxLog.append(spark, dir, withNull)
    assert(TxLog.read(spark, dir).where("id = 1000")
      .head().getDate(2).toString === "2026-03-10")
    // a WRONG non-null value fails the companion CHECK loudly
    val wrong = Seq((1001L, ts("2026-03-10 05:00:00")))
      .toDF("id", "ts")
      .withColumn("ts_day", lit("2026-12-25").cast("date"))
    intercept[TxLog.ConstraintViolationException] {
      TxLog.append(spark, dir, wrong)
    }
  }

  test("merge CDC feed without the generated column upserts into the right day") {
    import spark.implicits._
    val dir = tmp()
    dayTable(dir)
    TxLog.merge(spark, dir,
      Seq((57L, ts("2026-03-11 23:00:00")), (2000L, ts("2026-03-13 01:00:00")))
        .toDF("id", "ts"), "id")
    assert(TxLog.read(spark, dir).count() === 201L)
    assert(TxLog.read(spark, dir).where("id = 57")
      .head().getTimestamp(1) === ts("2026-03-11 23:00:00"))
    assert(TxLog.read(spark, dir).where("id = 2000")
      .head().getDate(2).toString === "2026-03-13")
  }

  test("UPDATE refuses SET on the generated column and recomputes it from the base") {
    val dir = tmp()
    dayTable(dir)
    intercept[IllegalArgumentException] {
      TxLog.update(spark, dir, "id = 3", Map("ts_day" -> "date'2026-01-01'"))
    }
    TxLog.update(spark, dir, "id = 3",
      Map("ts" -> "timestamp'2026-03-13 06:00:00'"))
    val r = TxLog.read(spark, dir).where("id = 3").head()
    assert(r.getTimestamp(1) === ts("2026-03-13 06:00:00"))
    assert(r.getDate(2).toString === "2026-03-13")
  }

  test("dropping the companion CHECK disables derivation but not correctness") {
    val dir = tmp()
    dayTable(dir)
    TxLog.dropConstraint(dir, TxLog.GeneratedCols.checkName("ts_day"))
    TxLog.delete(spark, dir,
      "ts >= timestamp'2026-03-11 00:00:00' AND ts < timestamp'2026-03-12 00:00:00'")
    // no derivation: every live file scanned (the raw-ts stats still
    // bound per-file, but all four days were written in one commit —
    // each file's ts range is one day, so stats alone ALSO prune here;
    // assert correctness and that the result matches the derived path
    assert(TxLog.read(spark, dir).count() === 150L)
  }

  test("rename/drop of base or generated column is refused while the CHECK stands") {
    val dir = tmp()
    dayTable(dir)
    intercept[IllegalArgumentException] { TxLog.renameColumn(dir, "ts", "ts2") }
    intercept[IllegalArgumentException] { TxLog.dropColumn(dir, "ts") }
  }

  test("SQL hidden partitioning: CREATE TABLE PARTITIONED BY (days(ts), bucket(4, id))") {
    withSqlCatalog { cat =>
      spark.sql(s"CREATE TABLE $cat.ev (id BIGINT, ts TIMESTAMP, v STRING) " +
        "PARTITIONED BY (days(ts), bucket(4, id))")
      spark.sql(s"INSERT INTO $cat.ev (id, ts, v) VALUES " +
        "(1, timestamp'2026-03-10 05:00:00', 'a'), " +
        "(2, timestamp'2026-03-11 06:00:00', 'b'), " +
        "(7, timestamp'2026-03-11 07:00:00', 'c')")
      val out = spark.sql(s"SELECT id, v, ts_day FROM $cat.ev " +
        "WHERE ts >= timestamp'2026-03-11 00:00:00' ORDER BY id").collect()
      assert(out.map(_.getLong(0)).toSeq === Seq(2L, 7L))
      assert(out.head.getDate(2).toString === "2026-03-11")
      // hidden columns materialize exactly the declared transforms
      val bad = spark.sql(s"SELECT * FROM $cat.ev WHERE NOT " +
        "(ts_day <=> to_date(ts) AND id_bucket <=> pmod(xxhash64(id), 4))")
      assert(bad.isEmpty)
    }
  }

  /** Registers a throwaway TxCatalog rooted in a temp dir. */
  private def withSqlCatalog(f: String => Unit): Unit = {
    val root = graft.Scratch.dir("graft-gencat").toString
    val name = "gencat"
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.TxCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    try f(name)
    finally spark.conf.unset(s"spark.sql.catalog.$name")
  }
}
