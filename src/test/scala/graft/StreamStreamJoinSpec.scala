package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Sessionize.Event

/** Stream-stream interval join with watermarks on both sides — the
  * attribution-style join (click within 10 minutes after a view by the
  * same user). State on both sides is watermark-bounded; matches emit as
  * soon as both events have arrived, across micro-batches. */
class StreamStreamJoinSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, user: Long, minute: Long, kind: String): Event =
    Event(id, new Timestamp(1700000000000L + minute * 60000), user, kind, 1.0)

  test("view⋈click interval join matches across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val v = views.toDS().withWatermark("ts", "30 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val c = clicks.toDS().withWatermark("ts", "30 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val joined = v.join(c,
      expr("""v_user = c_user AND c_ts >= v_ts AND
              c_ts <= v_ts + INTERVAL 10 MINUTES"""))
    val sink = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      views.addData(ev(1, 7, 0, "view"), ev(2, 8, 0, "view"))
      q.processAllAvailable()
      // clicks arrive in a LATER batch: user 7 within 10min (match),
      // user 8 after 20min (no match), user 9 with no view (no match)
      clicks.addData(ev(10, 7, 5, "click"), ev(11, 8, 20, "click"), ev(12, 9, 3, "click"))
      q.processAllAvailable()
      val rows = spark.table(sink).select("view_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 10L)))
    } finally q.stop()
  }
}
