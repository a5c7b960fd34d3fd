package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.RowIdView
import graft.sources.TxLog

/** [[RowIdView]]: row-level incremental view maintenance keyed on
  * tracked row ids. Pinned: incremental ≡ recompute after every DML
  * phase (inserts, CoW update, DV delete, predicate-crossing update);
  * a layout-only window (OPTIMIZE) is consumed with ZERO data reads
  * (the skip gate fires) and the state survives it; replaying a
  * window is idempotent. */
class RowIdViewSpec extends AnyFunSuite with SparkTestBase {

  private val pred = "v < 500"
  private val proj = Seq("v2" -> "v * 2", "tag" -> "concat('t', CAST(k % 3 AS STRING))")

  private def fresh(name: String): (String, String) = {
    val root = graft.Scratch.dir(s"graft-rowview-$name").toString
    (root + "/src", root + "/view")
  }

  private def df(spark: org.apache.spark.sql.SparkSession, ks: Range) = {
    import spark.implicits._
    ks.map(k => (k.toLong, k.toLong % 900)).toDF("k", "v")
  }

  private def assertMatches(src: String, view: String): Unit = {
    val got = TxLog.read(spark, view)
    val want = RowIdView.recompute(spark, src, pred, proj)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "maintained view diverged from recompute")
  }

  test("initialize-then-maintain tracks DML exactly; OPTIMIZE windows cost zero reads") {
    val (src, view) = fresh("main")
    (0 until 3).foreach(b => TxLog.append(spark, src, df(spark, b * 100 until (b + 1) * 100).coalesce(1)))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    var at = RowIdView.initialize(spark, src, view, pred, proj)
    assertMatches(src, view)

    // CoW update: values change, some rows cross the predicate
    TxLog.update(spark, src, "k % 7 = 2", Map("v" -> "v + 400"))
    val r1 = RowIdView.maintain(spark, src, view, at, pred, proj)
    at = r1.srcVersion
    assert(!r1.layoutOnlySkip && r1.rowsApplied > 0)
    assertMatches(src, view)

    // OPTIMIZE: every physical row rewrites, ids stable → ZERO reads
    TxLog.optimize(spark, src)
    val r2 = RowIdView.maintain(spark, src, view, at, pred, proj)
    at = r2.srcVersion
    assert(r2.layoutOnlySkip, "optimize window was not skipped")
    assert(r2.rowsApplied === 0L)
    assertMatches(src, view)

    // merge-on-read DELETE: rows leave via the feed's delete markers
    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "k % 5 = 3")
    val r3 = RowIdView.maintain(spark, src, view, at, pred, proj)
    at = r3.srcVersion
    assert(r3.rowsApplied > 0)
    assertMatches(src, view)

    // append: fresh ids insert (only predicate-passers land)
    TxLog.append(spark, src, df(spark, 300 until 420))
    val r4 = RowIdView.maintain(spark, src, view, at, pred, proj)
    at = r4.srcVersion
    assertMatches(src, view)

    // auto-compaction-style churn + another update in ONE window:
    // the window reads only the update's changes
    TxLog.optimize(spark, src)
    TxLog.update(spark, src, "k % 11 = 4", Map("v" -> "v - 350"))
    val r5 = RowIdView.maintain(spark, src, view, at, pred, proj)
    assert(!r5.layoutOnlySkip && r5.rowsApplied > 0)
    assertMatches(src, view)

    // replaying the SAME window is idempotent (upserts re-apply, the
    // absent-id deletes fire nothing)
    val r6 = RowIdView.maintain(spark, src, view, at, pred, proj)
    assert(r6.rowsApplied === r5.rowsApplied)
    assertMatches(src, view)
  }

  test("a CDF-less DML commit in the window fails LOUDLY, never silently stales") {
    val (src, view) = fresh("loud")
    TxLog.append(spark, src, df(spark, 0 until 100).coalesce(1))
    TxLog.enableRowTracking(spark, src)
    val at = RowIdView.initialize(spark, src, view, pred, proj)
    // DML without CDF: the window carries changes the feed cannot serve
    TxLog.delete(spark, src, "k % 2 = 0")
    val e = intercept[IllegalStateException] {
      RowIdView.maintain(spark, src, view, at, pred, proj)
    }
    assert(e.getMessage.contains("change files"))
  }
}
