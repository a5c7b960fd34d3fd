package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize.Event

/** Stream-stream interval join: a click buffered in state matches a
  * purchase arriving in a LATER micro-batch iff the purchase falls
  * inside the attribution window. */
class StreamJoinSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, user: Long, minute: Long, typ: String): Event =
    Event(id, new Timestamp(1700000000000L + minute * 60000), user, typ, 1.0)

  test("clicks match later-batch purchases inside the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[Event]
    val purchasesIn = MemoryStream[Event]
    val clicks = clicksIn.toDF()
      .selectExpr("event_id AS click_id", "user_id", "ts AS click_ts")
      .withWatermark("click_ts", "1 day")
    val purchases = purchasesIn.toDF()
      .selectExpr("event_id AS purchase_id", "user_id AS p_user", "ts AS purchase_ts")
      .withWatermark("purchase_ts", "1 day")
    val q = clicks.join(purchases, expr(
      """user_id = p_user AND purchase_ts >= click_ts
         AND purchase_ts <= click_ts + INTERVAL 24 HOURS"""))
      .writeStream.format("memory").queryName("sj_pairs")
      .outputMode("append").start()
    try {
      clicksIn.addData(ev(1, 7, 0, "click"), ev(2, 8, 0, "click"))
      q.processAllAvailable()
      // later batch: user 7 converts inside 24h; user 8's purchase is
      // outside the window; user 9 never clicked
      purchasesIn.addData(
        ev(10, 7, 30, "purchase"),
        ev(11, 8, 25 * 60, "purchase"),
        ev(12, 9, 30, "purchase"))
      q.processAllAvailable()
      val pairs = spark.table("sj_pairs")
        .select("click_id", "purchase_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 10L)),
        s"exactly the in-window same-user pair must emit, got $pairs")
    } finally q.stop()
  }
}
