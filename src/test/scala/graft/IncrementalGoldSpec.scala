package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{EventsPipeline, IncrementalGold, RunContext}

/** The incremental gold contract: folding disjoint silver batches into the
  * day-partitioned state table yields EXACTLY the full-recompute
  * `goldDaily` after every batch (bit-equal doubles — the decimal partials
  * make merge order invisible), and a batch leaves the day partitions it
  * does not touch byte-identical on disk (the property that makes the
  * cost per batch O(batch), not O(table)). */
class IncrementalGoldSpec extends AnyFunSuite with SparkTestBase {

  private def canon(df: DataFrame): Seq[(String, String, Long, Double, Long, Long)] =
    df.select(date_format(col("event_day"), "yyyy-MM-dd HH:mm:ss").as("d"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users"), col("sum_k"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))

  private def partitionSnapshot(dir: File): Map[String, (Long, Long)] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile)
      .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap

  test("incremental ≡ full after every batch; untouched day partitions stay byte-identical") {
    val sf = "/root/testdata/sf0.001"
    val silver = EventsPipeline
      .silver(Td.load(spark, sf, "events"), RunContext.golden).cache()
    val dcol = date_format(col("event_day"), "yyyy-MM-dd")
    val days = silver.select(dcol.as("d")).distinct()
      .orderBy("d").collect().map(_.getString(0))
    assert(days.length >= 6, s"need several days, got ${days.length}")
    val cut0 = days(days.length / 3)
    val cut1 = days(days.length * 2 / 3)
    // Disjoint row batches with OVERLAPPING days in [cut0, cut1): batch 2
    // must merge into state batch 1 already wrote for those days.
    val b1 = silver.where(dcol < cut1 && (dcol < cut0 || pmod(col("event_id"), lit(2)) === 0))
    val b2 = silver.where(dcol >= cut0 && (dcol >= cut1 || pmod(col("event_id"), lit(2)) === 1))
    assert(b1.count() + b2.count() === silver.count())

    val stateDir = java.nio.file.Files.createTempDirectory("graft-incr-gold").toString + "/state"

    val affected1 = IncrementalGold.ingestBatch(spark, stateDir, b1)
    assert(affected1 === days.filter(_ < cut1).toSeq)
    assert(canon(IncrementalGold.gold(spark, stateDir)) ===
      canon(EventsPipeline.goldDaily(b1)))

    // snapshot a day batch 2 does not touch (all days < cut0)
    val untouchedDay = days.head
    val untouchedDir = new File(s"$stateDir/day_key=$untouchedDay")
    assert(untouchedDir.isDirectory)
    val before = partitionSnapshot(untouchedDir)
    assert(before.nonEmpty)

    val affected2 = IncrementalGold.ingestBatch(spark, stateDir, b2)
    assert(affected2 === days.filter(_ >= cut0).toSeq)
    // exact parity with the full recompute over ALL rows — including the
    // overlap days whose (day, type, user) state rows merged across batches
    assert(canon(IncrementalGold.gold(spark, stateDir)) ===
      canon(EventsPipeline.goldDaily(silver)))
    // and the untouched partition was not rewritten
    assert(partitionSnapshot(untouchedDir) === before)

    silver.unpersist()
  }

  test("goldFromState on a single all-at-once batch matches goldDaily directly") {
    val sf = "/root/testdata/sf0.001"
    val silver = EventsPipeline
      .silver(Td.load(spark, sf, "events"), RunContext.golden)
    assert(canon(IncrementalGold.goldFromState(IncrementalGold.partials(silver))) ===
      canon(EventsPipeline.goldDaily(silver)))
  }
}
