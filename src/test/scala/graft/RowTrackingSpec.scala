package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Row tracking ([[TxLog.enableRowTracking]]): stable per-row BIGINT
  * ids that survive every layout rewrite and DML path — the handle for
  * row-level incremental maintenance that CDF (which hides
  * dataChange=false rewrites by design) cannot provide. Pinned: the
  * backfill (1..n, DV-masked), stability across OPTIMIZE / CoW UPDATE
  * / DV DELETE / MERGE, fresh allocation beyond the high-water for
  * every insert path, and the ALWAYS refusals. */
class RowTrackingSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  private def mkTable(dir: String, n: Int = 40): Unit = {
    import spark.implicits._
    (0 until 4).foreach { b =>
      TxLog.append(spark, dir, (b * n / 4 until (b + 1) * n / 4)
        .map(i => (i.toLong, s"v$i", i % 3)).toDF("k", "v", "g").coalesce(1))
    }
  }

  private def ids(dir: String): Map[Long, Long] =
    TxLog.read(spark, dir).select("k", "_row_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("backfill numbers live rows 1..n once; appends continue beyond") {
    import spark.implicits._
    val dir = tmp("rt-backfill")
    mkTable(dir)
    TxLog.enableRowTracking(spark, dir)
    val m = ids(dir)
    assert(m.size === 40)
    assert(m.values.toSeq.sorted === (1L to 40L))
    assert(TxLog.snapshot(dir).props(TxLog.RowTracking.Column) === "_row_id")
    // append: identity allocation beyond the synced high-water
    TxLog.append(spark, dir, Seq((100L, "new", 0)).toDF("k", "v", "g"))
    val m2 = ids(dir)
    assert(m2(100L) === 41L)
    assert(m2.filterNot(_._1 == 100L) === m, "existing ids untouched by append")
  }

  test("ids stable across OPTIMIZE compaction and Z-order") {
    val dir = tmp("rt-optimize")
    mkTable(dir)
    TxLog.enableRowTracking(spark, dir)
    val before = ids(dir)
    assert(TxLog.snapshot(dir).files.size > 1)
    TxLog.optimize(spark, dir)
    assert(ids(dir) === before, "compaction must not renumber rows")
    TxLog.optimize(spark, dir, targetBytes = 1L, zorderBy = Seq("k", "g"))
    assert(ids(dir) === before, "z-order rewrite must not renumber rows")
  }

  test("ids stable across CoW UPDATE, DV DELETE and purge") {
    val dir = tmp("rt-dml")
    mkTable(dir)
    TxLog.enableRowTracking(spark, dir)
    val before = ids(dir)
    TxLog.update(spark, dir, "k = 7", Map("v" -> "'patched'"))
    assert(ids(dir) === before, "CoW update keeps every id")
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "k = 3")
    val afterDel = ids(dir)
    assert(afterDel === before.removed(3L), "DV delete keeps survivors' ids")
    TxLog.purgeDeletes(spark, dir)
    assert(ids(dir) === afterDel, "purge rewrite keeps survivors' ids")
  }

  test("merge: matched rows keep ids, inserted rows allocate fresh") {
    import spark.implicits._
    val dir = tmp("rt-merge")
    mkTable(dir, n = 8)
    TxLog.enableRowTracking(spark, dir)
    val before = ids(dir)
    val src = Seq((1L, "M1", 0), (99L, "NEW", 1)).toDF("k", "v", "g")
      .withColumn("_row_id", lit(null).cast("long"))
    TxLog.merge(spark, dir, src, "k")
    val after = ids(dir)
    assert(after(1L) === before(1L), "matched row keeps its id")
    assert(after(99L) === 9L, "insert allocates beyond the high-water")
    assert(after.removed(1L).removed(99L) === before.removed(1L))
  }

  test("ALWAYS refusals: explicit ids and SET are rejected; backfill masks DVs") {
    import spark.implicits._
    val dir = tmp("rt-refuse")
    mkTable(dir, n = 8)
    // a DV delete BEFORE enabling: dead rows must not receive ids
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, dir, "k = 2")
    TxLog.enableRowTracking(spark, dir)
    val m = ids(dir)
    assert(m.size === 7 && m.values.toSeq.sorted === (1L to 7L))
    val e = intercept[Exception] {
      TxLog.append(spark, dir, Seq((50L, "x", 0, 999L))
        .toDF("k", "v", "g", "_row_id"))
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("GENERATED ALWAYS")))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.update(spark, dir, "k = 1", Map("_row_id" -> "77"))
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"))
    // enabling twice is refused
    val e3 = intercept[IllegalArgumentException](TxLog.enableRowTracking(spark, dir))
    assert(e3.getMessage.contains("already exists"))
  }
}
