package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.RowIdView
import graft.sources.TxLog

/** Streaming RowIdView: the view follows its source hands-free as a
  * foreachBatch consumer of the CDF stream — maintain's exact change
  * derivation per micro-batch, txn-tagged merges for exactly-once
  * across checkpointed passes, layout-only windows arriving as empty
  * batches that commit nothing. */
class StreamingRowIdViewSpec extends AnyFunSuite with SparkTestBase {

  test("view follows update/optimize/delete/append via the stream; replays are no-ops") {
    import spark.implicits._
    val r = graft.Scratch.dir("graft-rvstream").toString
    val src = s"$r/src"; val view = s"$r/view"; val ckpt = s"$r/ckpt"
    val df0 = (1L to 400L).map(i => (i, i * 10 % 97)).toDF("k", "v")
    (0 until 2).foreach(b =>
      TxLog.append(spark, src, df0.where(s"k % 2 = $b").coalesce(1)))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val pred = "v < 90"
    val proj = Seq("k" -> "k", "v2" -> "v * 2")
    val at = RowIdView.initialize(spark, src, view, pred, proj)
    def sync(): Unit = RowIdView.stream(spark, src, view, ckpt, at, pred, proj)

    sync() // nothing past initialization: must not commit
    val vInit = TxLog.latestVersion(view)
    assert(vInit === 0L, "the empty first pass burned a view commit")

    TxLog.update(spark, src, "k % 7 = 2", Map("v" -> "v + 50")) // crosses pred both ways
    TxLog.optimize(spark, src) // layout-only: an EMPTY batch, no view commit
    TxLog.delete(spark, src, "k % 5 = 3")
    TxLog.append(spark, src, (401L to 500L).map(i => (i, i % 97)).toDF("k", "v"))
    sync() // applies exactly the three DML windows

    val got = TxLog.read(spark, view).select("_row_id", "k", "v2")
    val want = RowIdView.recompute(spark, src, pred, proj)
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty, "streamed view ≢ recompute")
    assert(TxLog.latestVersion(view) === 3L,
      "expected init + exactly one commit per DML window (optimize none)")

    // exactly-once: a replayed pass over the same checkpoint changes nothing
    sync()
    assert(TxLog.latestVersion(view) === 3L)
  }
}
