package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Identity columns ([[TxLog.Identity]] — GENERATED ALWAYS AS
  * IDENTITY): engine-allocated BIGINT keys from a transactional
  * high-water mark advanced in the same commit as the rows it covers.
  * Uniqueness is a commit-protocol property: a lost race restages with
  * fresh ids. */
class TxIdentitySpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-ident").toString + "/t"

  private def mkTable(dir: String, start: Long = 1L, step: Long = 1L): Unit = {
    TxLog.create(dir, StructType(Seq(
      StructField("row_id", LongType),
      StructField("v", StringType))))
    TxLog.addIdentityColumn(spark, dir, "row_id", start, step)
  }

  private def idStats(dir: String) = {
    val r = TxLog.read(spark, dir).agg(
      count(lit(1)), countDistinct(col("row_id")),
      min("row_id"), max("row_id"), sum("row_id")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("appends allocate dense unique ids; a second append continues above") {
    import spark.implicits._
    val dir = tmp()
    mkTable(dir)
    TxLog.append(spark, dir, (0 until 100).map(i => s"a$i").toDF("v"))
    assert(idStats(dir) === ((100L, 100L, 1L, 100L, 5050L)))
    TxLog.append(spark, dir, (0 until 50).map(i => s"b$i").toDF("v"))
    assert(idStats(dir) === ((150L, 150L, 1L, 150L, 150L * 151L / 2)))
    // the high-water is a table property, visible in the snapshot
    assert(TxLog.snapshot(dir).props(TxLog.Identity.HighWater + "row_id") === "150")
  }

  test("start/step respected; explicit values and UPDATE SET are refused") {
    import spark.implicits._
    val dir = tmp()
    mkTable(dir, start = 1000L, step = 10L)
    TxLog.append(spark, dir, Seq("x", "y", "z").toDF("v"))
    val got = TxLog.read(spark, dir).select("row_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1000L, 1010L, 1020L))
    // explicit values fail from inside the allocation pass (the check
    // rides the zipWithIndex job — no extra scan), so the driver sees
    // Spark's task-failure wrapper; the ALWAYS message must survive it
    val e = intercept[Exception] {
      TxLog.append(spark, dir, Seq((9999L, "w")).toDF("row_id", "v"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("GENERATED ALWAYS AS IDENTITY")))
    intercept[IllegalArgumentException] {
      TxLog.update(spark, dir, "v = 'x'", Map("row_id" -> "42"))
    }
    // an ALL-NULL arriving column is the omitted shape (what SQL INSERT
    // pads) — it allocates instead of refusing
    TxLog.append(spark, dir,
      Seq((Option.empty[Long], "nn")).toDF("row_id", "v"))
    val got2 = TxLog.read(spark, dir).where("v = 'nn'")
      .select("row_id").head().getLong(0)
    assert(got2 === 1030L)
  }

  test("SYNC on a non-empty table: allocation continues past existing values") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir,
      Seq((500L, "old1"), (7L, "old2")).toDF("row_id", "v").coalesce(1))
    TxLog.addIdentityColumn(spark, dir, "row_id")
    TxLog.append(spark, dir, Seq("new1", "new2").toDF("v"))
    val ids = TxLog.read(spark, dir).where("v LIKE 'new%'")
      .select("row_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(501L, 502L))
  }

  test("12 racing appends never allocate the same id (restage on lost race)") {
    import spark.implicits._
    val dir = tmp()
    mkTable(dir)
    val threads = (0 until 12).map { t =>
      new Thread(() => {
        TxLog.append(spark, dir,
          (0 until 20).map(i => s"t$t-$i").toDF("v").coalesce(1)): Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // 240 rows, 240 DISTINCT ids, dense 1..240 (each commit's block is
    // contiguous; blocks never overlap because losers restaged)
    assert(idStats(dir) === ((240L, 240L, 1L, 240L, 240L * 241L / 2)))
  }

  test("exactly-once streaming batches allocate too; replay skips without burning ids") {
    import spark.implicits._
    val dir = tmp()
    mkTable(dir)
    assert(TxLog.appendBatch(spark, dir,
      Seq("s0", "s1").toDF("v"), "app", 0L).nonEmpty)
    // a zombie replay of batch 0 must not land OR advance the mark
    assert(TxLog.appendBatch(spark, dir,
      Seq("s0", "s1").toDF("v"), "app", 0L).isEmpty)
    assert(TxLog.appendBatch(spark, dir,
      Seq("s2").toDF("v"), "app", 1L).nonEmpty)
    assert(idStats(dir) === ((3L, 3L, 1L, 3L, 6L)))
  }

  test("layout ops do not advance the mark; DML keeps ids stable") {
    import spark.implicits._
    val dir = tmp()
    mkTable(dir)
    TxLog.append(spark, dir, (0 until 30).map(i => s"a$i").toDF("v").coalesce(1))
    val hwBefore = TxLog.snapshot(dir).props(TxLog.Identity.HighWater + "row_id")
    TxLog.optimize(spark, dir)
    TxLog.delete(spark, dir, "row_id = 5")
    assert(TxLog.snapshot(dir).props(TxLog.Identity.HighWater + "row_id") === hwBefore)
    TxLog.append(spark, dir, Seq("tail").toDF("v"))
    assert(TxLog.read(spark, dir).agg(max("row_id")).head().getLong(0) === 31L)
    assert(TxLog.read(spark, dir).where("row_id = 5").count() === 0L)
  }
}
