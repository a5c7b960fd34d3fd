package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize.Event

/** Streaming dedup contract: a key redelivered in a LATER micro-batch
  * (the at-least-once case a file-redelivery test cannot exercise,
  * since one AvailableNow listing is one batch) is dropped while its
  * state lives inside the watermark horizon. */
class StreamDedupSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, minute: Long): Event =
    Event(id, new Timestamp(1700000000000L + minute * 60000), 1L, "click", 1.0)

  test("dropDuplicatesWithinWatermark collapses cross-batch redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = in.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_xbatch")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0), ev(2, 10))
      q.processAllAvailable()
      // batch 2 redelivers id 2 (same event time, still inside the
      // watermark horizon) alongside a genuinely new id 3
      in.addData(ev(2, 10), ev(3, 20))
      q.processAllAvailable()
      val ids = spark.table("dedup_xbatch")
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L),
        s"cross-batch redelivery of id 2 must not duplicate: ${ids.toSeq}")
    } finally q.stop()
  }
}
