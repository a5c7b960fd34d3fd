package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

private[graft] case class DvModelRow(id: Long, s: String, grp: Long)

/** Model-based stress test for the DML/maintenance surface: a
  * deterministic random walk over append / predicate-delete / key-erase
  * / update / optimize / compactSmall / purgeDeletes / vacuum — with the
  * deletion-vector property TOGGLING mid-history, so merge-on-read DML
  * lands on copy-on-write remnants and vice versa — checked op-by-op
  * against an in-memory reference model. Catches cross-feature
  * interactions no single-purpose spec stages: DVs over rewritten
  * files, CoW deletes over DV files, counts after mixed erasure, purge
  * racing nothing but its own bookkeeping. */
class TxDvModelSpec extends AnyFunSuite with SparkTestBase {
  private type Row = DvModelRow
  private def Row(id: Long, s: String, grp: Long) = DvModelRow(id, s, grp)

  test("random DML walk with DV toggling matches the reference model") {
    import spark.implicits._
    val dir = graft.Scratch.dir("graft-txdvmodel").toString + "/t"
    val rnd = new scala.util.Random(42)
    var model = Map.empty[Long, Row]
    var nextId = 0L
    var dvOn = false
    // last few (version -> model) snapshots; restore targets stay within
    // the vacuum retention window (retainVersions = 3 → latest-2)
    var history = Vector.empty[(Long, Map[Long, Row])]
    def record(): Unit =
      history = (history :+ (TxLog.latestVersion(dir) -> model)).takeRight(4)

    def appendBatch(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        val r = Row(nextId, s"s$nextId", nextId % 5); nextId += 1; r
      }
      TxLog.append(spark, dir,
        rows.toDF().select($"id", $"s", $"grp").repartition(1))
      model ++= rows.map(r => r.id -> r)
    }

    def check(): Unit = {
      val got = TxLog.read(spark, dir).collect()
        .map(r => Row(r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === model.values.toSet, s"divergence (dvOn=$dvOn)")
      assert(TxLog.snapshot(dir).rows === model.size.toLong,
        "snapshot row count out of sync with live rows")
    }

    appendBatch(40)
    record()
    val ops = 70
    (0 until ops).foreach { i =>
      rnd.nextInt(11) match {
        case 0 | 1 =>
          appendBatch(1 + rnd.nextInt(12))
        case 2 =>
          // toggle the write path: future DML switches CoW <-> MoR
          dvOn = !dvOn
          TxLog.setProperties(dir,
            Map(TxLog.DeletionVectors.Enabled -> dvOn.toString)): Unit
        case 3 | 4 =>
          val g = rnd.nextInt(5)
          val m = rnd.nextInt(3)
          TxLog.delete(spark, dir, s"grp = $g AND id % 3 = $m")
          model = model.filterNot { case (_, r) => r.grp == g && r.id % 3 == m }
        case 5 =>
          val sel = rnd.nextInt(7)
          val ids = model.keys.toSeq.sorted.filter(_ % 7 == sel)
          if (ids.nonEmpty) {
            TxLog.deleteKeys(spark, dir, ids.toDF("id"), "id")
            model --= ids
          }
        case 6 =>
          val g = rnd.nextInt(5)
          TxLog.update(spark, dir, s"grp = $g", Map("s" -> "concat(s, 'u')"))
          model = model.map { case (k, r) =>
            k -> (if (r.grp == g) r.copy(s = r.s + "u") else r)
          }
        case 7 =>
          if (rnd.nextBoolean()) TxLog.optimize(spark, dir, targetBytes = 1L << 20): Unit
          else TxLog.compactSmall(spark, dir, smallFileBytes = 1L << 20): Unit
        case 8 =>
          TxLog.purgeDeletes(spark, dir): Unit
        case 9 =>
          TxLog.vacuum(dir, retainVersions = 3, staleStagingMillis = 0L): Unit
        case 10 =>
          // RESTORE to a retained version; the model rewinds with it
          val latest = TxLog.latestVersion(dir)
          val cands = history.filter(_._1 >= latest - 2)
          if (cands.nonEmpty) {
            val (v, m) = cands(rnd.nextInt(cands.size))
            TxLog.restore(spark, dir, v)
            model = m
          }
      }
      record()
      if (i % 6 == 5) check()
    }
    check()
  }
}
