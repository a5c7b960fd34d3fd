package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** The production-mode windowed stream aggregation (watermark + APPEND
  * to a parquet sink): every emitted window must equal the batch
  * aggregation of the same day, only watermark-open tail windows may be
  * withheld, and a checkpointed re-run emits nothing twice. */
class StreamWindowAppendSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("append-mode emission equals the batch aggregation on closed windows") {
    val root = graft.Scratch.dir("graft-swa").toString
    val out = StreamingOps.windowedEventCountsAppend(
      spark, sf, s"$root/out", s"$root/ckpt")

    val batch = Td.load(spark, sf, "events")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n_events"))

    // (a) every emitted row matches the batch result exactly
    val emitted = out.select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val expected = batch.select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(emitted.subsetOf(expected),
      s"emitted rows diverge from batch: ${emitted.diff(expected).take(3)}")

    // (b) the only rows withheld are tail windows the watermark (max ts
    // minus 1 day) has not closed — nothing in the interior is missing
    val maxTs = Td.load(spark, sf, "events").agg(max("ts")).head().getTimestamp(0)
    val watermark = maxTs.getTime - 24L * 3600 * 1000
    val withheld = batch.collect().filter { r =>
      !emitted.contains((r.getTimestamp(0), r.getString(2), r.getLong(3)))
    }
    assert(withheld.nonEmpty, "a finite run must withhold the still-open tail window")
    withheld.foreach { r =>
      assert(r.getTimestamp(1).getTime > watermark,
        s"interior window withheld: ends ${r.getTimestamp(1)}, watermark $watermark")
    }

    // (c) exactly-once: a second AvailableNow run over the same source,
    // checkpoint, and sink directory finds no new data and adds no rows
    val n1 = out.count()
    val again = StreamingOps.windowedEventCountsAppend(
      spark, sf, s"$root/out", s"$root/ckpt")
    assert(again.count() === n1, "checkpointed re-run duplicated sink rows")
  }
}
