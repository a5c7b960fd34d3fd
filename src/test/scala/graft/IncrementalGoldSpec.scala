package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.AtomicSwap
import graft.pipeline.{EventsPipeline, IncrementalGold, RunContext}

/** The incremental gold contract: folding disjoint silver batches into the
  * day-partitioned state table yields EXACTLY the full-recompute
  * `goldDaily` after every batch (bit-equal doubles — the decimal partials
  * make merge order invisible), and a batch leaves the day partitions it
  * does not touch byte-identical on disk (the property that makes the
  * cost per batch O(batch), not O(table)).
  *
  * Plus the round-5-advice commit protocol: a replayed batch is an
  * idempotent no-op, a batch killed between day commits resumes exactly
  * (no loss, no double count), and a concurrent second writer fails
  * cleanly instead of losing an update.
  */
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

  private def stateSnapshot(stateDir: String): Map[String, Map[String, (Long, Long)]] =
    Option(new File(stateDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(d => d.getName -> partitionSnapshot(d)).toMap

  /** silver + two disjoint row batches whose DAY ranges overlap. */
  private def fixtures(): (DataFrame, DataFrame, DataFrame, Array[String], String, String) = {
    val sf = "/root/testdata/sf0.001"
    val silver = EventsPipeline
      .silver(Td.load(spark, sf, "events"), RunContext.golden)
    val dcol = date_format(col("event_day"), "yyyy-MM-dd")
    val days = silver.select(dcol.as("d")).distinct()
      .orderBy("d").collect().map(_.getString(0))
    assert(days.length >= 6, s"need several days, got ${days.length}")
    val cut0 = days(days.length / 3)
    val cut1 = days(days.length * 2 / 3)
    val b1 = silver.where(dcol < cut1 && (dcol < cut0 || pmod(col("event_id"), lit(2)) === 0))
    val b2 = silver.where(dcol >= cut0 && (dcol >= cut1 || pmod(col("event_id"), lit(2)) === 1))
    (silver, b1, b2, days, cut0, cut1)
  }

  private def freshStateDir(): String =
    graft.Scratch.dir("graft-incr-gold").toString + "/state"

  test("incremental ≡ full after every batch; untouched day partitions stay byte-identical") {
    val (silver0, b1, b2, days, cut0, cut1) = fixtures()
    val silver = silver0.cache()
    assert(b1.count() + b2.count() === silver.count())

    val stateDir = freshStateDir()

    val affected1 = IncrementalGold.ingestBatch(spark, stateDir, b1, "batch-1")
    assert(affected1 === days.filter(_ < cut1).toSeq)
    assert(canon(IncrementalGold.gold(spark, stateDir)) ===
      canon(EventsPipeline.goldDaily(b1)))

    // snapshot a day batch 2 does not touch (all days < cut0)
    val untouchedDay = days.head
    val untouchedDir = new File(s"$stateDir/day_key=$untouchedDay")
    assert(untouchedDir.isDirectory)
    val before = partitionSnapshot(untouchedDir)
    assert(before.nonEmpty)

    val affected2 = IncrementalGold.ingestBatch(spark, stateDir, b2, "batch-2")
    assert(affected2 === days.filter(_ >= cut0).toSeq)
    // exact parity with the full recompute over ALL rows — including the
    // overlap days whose (day, type, user) state rows merged across batches
    assert(canon(IncrementalGold.gold(spark, stateDir)) ===
      canon(EventsPipeline.goldDaily(silver)))
    // and the untouched partition was not rewritten
    assert(partitionSnapshot(untouchedDir) === before)
    // every committed day carries its manifest
    assert(IncrementalGold.committedBatches(stateDir, untouchedDay) === Seq("batch-1"))
    assert(IncrementalGold.committedBatches(stateDir, cut0) === Seq("batch-1", "batch-2"))

    silver.unpersist()
  }

  test("replayed batch is an idempotent no-op (nothing rewritten, gold unchanged)") {
    val (_, b1, _, _, _, _) = fixtures()
    val stateDir = freshStateDir()
    val affected = IncrementalGold.ingestBatch(spark, stateDir, b1, "batch-1")
    assert(affected.nonEmpty)
    val goldBefore = canon(IncrementalGold.gold(spark, stateDir))
    val snapBefore = stateSnapshot(stateDir)

    val replayed = IncrementalGold.ingestBatch(spark, stateDir, b1, "batch-1")
    assert(replayed === Seq.empty)
    assert(stateSnapshot(stateDir) === snapBefore) // byte-identical, not rewritten
    assert(canon(IncrementalGold.gold(spark, stateDir)) === goldBefore)
  }

  test("ingest killed between day commits resumes exactly: no loss, no double count") {
    val (silver, b1, b2, _, _, _) = fixtures()
    val stateDir = freshStateDir()
    IncrementalGold.ingestBatch(spark, stateDir, b1, "batch-1")

    // fail injection: die after the FIRST day of batch 2 commits
    val committed = scala.collection.mutable.ArrayBuffer.empty[String]
    val boom = intercept[RuntimeException] {
      IncrementalGold.ingestBatch(spark, stateDir, b2, "batch-2",
        onDayCommitted = d => { committed += d; throw new RuntimeException("killed mid-batch") })
    }
    assert(boom.getMessage === "killed mid-batch")
    assert(committed.size === 1)
    // the committed day carries batch-2 in its manifest; later days do not
    assert(IncrementalGold.committedBatches(stateDir, committed.head).contains("batch-2"))

    // retrying the SAME batch completes only the missing days …
    val resumed = IncrementalGold.ingestBatch(spark, stateDir, b2, "batch-2")
    assert(!resumed.contains(committed.head))
    // … and the result is exact: the half-committed day was not re-merged
    assert(canon(IncrementalGold.gold(spark, stateDir)) ===
      canon(EventsPipeline.goldDaily(silver)))
  }

  test("second concurrent writer fails cleanly with ConcurrentSwapException") {
    val (_, b1, b2, _, _, _) = fixtures()
    val stateDir = freshStateDir()
    IncrementalGold.ingestBatch(spark, stateDir, b1, "batch-1")
    val goldBefore = canon(IncrementalGold.gold(spark, stateDir))

    AtomicSwap.withWriterLock(stateDir) {
      // a writer holds the state lock; an ingest racing from another
      // thread must fail cleanly without touching the state
      var failure: Option[Throwable] = None
      val t = new Thread(() =>
        try { IncrementalGold.ingestBatch(spark, stateDir, b2, "batch-2"); () }
        catch { case e: Throwable => failure = Some(e) })
      t.start(); t.join()
      assert(failure.exists(_.isInstanceOf[AtomicSwap.ConcurrentSwapException]))
    }
    assert(canon(IncrementalGold.gold(spark, stateDir)) === goldBefore)
    // the loser's clean failure released nothing it didn't own: the
    // winner's span ended normally, so a fresh ingest now succeeds
    assert(IncrementalGold.ingestBatch(spark, stateDir, b2, "batch-2").nonEmpty)
  }

  test("streaming foreachBatch drives the gold exactly-once end-to-end") {
    // the glue contract: Structured Streaming's (batch, batchId) pairs
    // feed ingestBatch; at-least-once redelivery (simulated by re-running
    // a batch id) must not double-count, and after the stream drains the
    // state-derived gold equals the full recompute to the bit
    val (silver0, _, _, _, _, _) = fixtures()
    val silver = silver0.cache()
    val root = graft.Scratch.dir("graft-stream-gold").toString
    silver.repartition(4).write.parquet(s"$root/silver")
    val stateDir = s"$root/state"

    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema(spark.read.parquet(s"$root/silver").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/silver")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        seen += batchId
        if (batchId == 0L) batch.write.mode("overwrite").parquet(s"$root/b0")
        IncrementalGold.ingestBatch(spark, stateDir, batch, s"stream-$batchId"): Unit
      }
      .start()
    q.awaitTermination()
    assert(seen.size >= 3, s"expected multiple micro-batches, got $seen")

    val goldOnce = canon(IncrementalGold.gold(spark, stateDir))
    assert(goldOnce === canon(EventsPipeline.goldDaily(silver)))

    // at-least-once redelivery of an already-committed batch: no-op
    val replayed = IncrementalGold.ingestBatch(spark, stateDir,
      spark.read.parquet(s"$root/b0"), s"stream-0")
    assert(replayed === Seq.empty)
    assert(canon(IncrementalGold.gold(spark, stateDir)) === goldOnce)
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
