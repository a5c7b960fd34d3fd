package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.RowIdView
import graft.sources.TxLog

/** Randomized maintenance fuzz — the DmlPruneFuzzSpec discipline
  * applied to row-id-keyed view maintenance: seeded random DML
  * sequences (CoW and DV updates/deletes, appends, layout rewrites,
  * predicate-boundary crossings) against random view predicates and
  * projections, with maintained ≡ recompute asserted after EVERY
  * window. Hand-picked scenarios prove the shapes we thought of; the
  * fuzz hunts the interleavings we did not. */
class ViewMaintenanceFuzzSpec extends AnyFunSuite with SparkTestBase {

  private val Trials = 8 // ~80 s; seeds 0xF00D..+7 — bump for a deeper hunt

  test(s"$Trials seeded random DML sequences: maintained view ≡ recompute after every window") {
    import spark.implicits._
    val preds = Seq(
      "v < 500", "v % 3 = 1", "v >= 200 AND v < 800",
      "k % 2 = 0 AND v < 700", "v IS NOT NULL")
    val projPool = Seq(
      Seq("k" -> "k", "v2" -> "v * 2"),
      Seq("k" -> "k", "vneg" -> "-v", "vcap" -> "least(v, 600)"),
      Seq("vk" -> "v + k"))
    (0 until Trials).foreach { trial =>
      val rnd = new scala.util.Random(0xF00D + trial)
      val r = graft.Scratch.dir(s"graft-rvfuzz$trial").toString
      val src = s"$r/src"; val view = s"$r/view"
      val n = 60 + rnd.nextInt(120)
      def rows(ids: Range) = ids.map(i => (i.toLong, (i * 37 % 1000).toLong)).toDF("k", "v")
      TxLog.append(spark, src, rows(0 until n).repartition(1 + rnd.nextInt(3)))
      TxLog.enableRowTracking(spark, src)
      TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
      if (rnd.nextBoolean())
        TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
      val pred = preds(rnd.nextInt(preds.size))
      val proj = projPool(rnd.nextInt(projPool.size))
      var at = RowIdView.initialize(spark, src, view, pred, proj)
      var nextKey = n.toLong
      val ops = 4 + rnd.nextInt(3)
      (0 until ops).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 => // update that crosses the predicate boundary both ways
            TxLog.update(spark, src, s"k % ${2 + rnd.nextInt(5)} = ${rnd.nextInt(2)}",
              Map("v" -> s"(v + ${100 + rnd.nextInt(500)}) % 1000"))
          case 1 =>
            TxLog.delete(spark, src, s"k % ${3 + rnd.nextInt(5)} = ${rnd.nextInt(3)}")
          case 2 =>
            val m = 10 + rnd.nextInt(40)
            TxLog.append(spark, src, rows(nextKey.toInt until (nextKey + m).toInt))
            nextKey += m
          case 3 =>
            TxLog.optimize(spark, src): Unit
          case 4 => // flip the DML engine mid-history (CoW <-> merge-on-read)
            TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled ->
              (if (rnd.nextBoolean()) "true" else "")))
          case 5 => // delete-then-reinsert the same keys (id churn)
            TxLog.delete(spark, src, s"k < ${5 + rnd.nextInt(10)} AND k >= 0")
            TxLog.append(spark, src, rows(0 until (3 + rnd.nextInt(5))))
        }
        // maintain after a random-length window (1..2 ops fold together)
        if (rnd.nextBoolean()) {
          at = RowIdView.maintain(spark, src, view, at, pred, proj).srcVersion
          val got = TxLog.read(spark, view)
          val want = RowIdView.recompute(spark, src, pred, proj)
          assert(got.count() === want.count(),
            s"trial $trial: row counts diverged (pred=$pred)")
          assert(got.exceptAll(want).isEmpty,
            s"trial $trial: maintained ≢ recompute (pred=$pred)")
        }
      }
      // the final window always closes out and must converge
      RowIdView.maintain(spark, src, view, at, pred, proj): Unit
      val got = TxLog.read(spark, view)
      val want = RowIdView.recompute(spark, src, pred, proj)
      assert(got.count() === want.count() && got.exceptAll(want).isEmpty,
        s"trial $trial: final state diverged (pred=$pred, proj=$proj)")
    }
  }
}
