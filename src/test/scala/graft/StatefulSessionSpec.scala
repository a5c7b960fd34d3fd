package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** Proves the stateful (flatMapGroupsWithState) sessionization emits the
  * same CLOSED sessions as the declarative batch formulation (q64), and
  * that state survives micro-batch boundaries. */
class StatefulSessionSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, user: Long, minute: Long): Event =
    Event(id, new Timestamp(1700000000000L + minute * 60000), user, "click", 1.0)

  // user 1: events at t=0,10 | gap | t=1000,1005 | gap | t=3000 (open)
  // user 2: single event (stays open, never emitted)
  private val batch1 = Seq(ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5))
  private val batch2 = Seq(ev(4, 1, 1000), ev(5, 1, 1005), ev(6, 1, 3000))
  private val gapSec = 3600L // 60 min

  test("native session_window agrees with the declarative sessionizer on real data") {
    // Spark's built-in gap session window vs q64's lag+running-sum
    // formulation over the events table. Semantics note: session_window
    // is end-EXCLUSIVE at the gap boundary (an event landing exactly
    // last_ts + gap starts a new session) while q64's `diff > gap` keeps
    // it — the testdata has zero exact-boundary gaps (checked via
    // DuckDB), so the two must agree row-for-row here.
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val native = Td.load(spark, sf, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(_.toString).sorted
    val declarative = SparkEntry.queries("q64_sessionize")(spark, sf)
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(_.toString).sorted
    assert(native.length === declarative.length,
      s"session counts differ: ${native.length} vs ${declarative.length}")
    assert(native.sameElements(declarative))
  }

  test("batch mode: closed sessions match the expected gap splits") {
    import spark.implicits._
    val all = spark.createDataset(batch1 ++ batch2)
    val out = Sessionize.statefulSessions(all, gapSec).collect().sortBy(s => (s.user_id, s.session_start.getTime))
    // user 1 closes (0,10) and (1000,1005); the t=3000 session and user 2's
    // single event stay open -> not emitted.
    assert(out.toSeq === Seq(
      Session(1, 2, ev(1, 1, 0).ts, ev(2, 1, 10).ts),
      Session(1, 2, ev(4, 1, 1000).ts, ev(5, 1, 1005).ts)))
  }

  test("streaming mode: state persists across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val sessions = Sessionize.statefulSessions(source.toDS(), gapSec)
    val sink = s"sessions_${System.nanoTime()}"
    val q = sessions.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      source.addData(batch1: _*)
      q.processAllAvailable()
      // nothing closed yet: both users have one open session
      assert(spark.table(sink).count() === 0)

      source.addData(batch2: _*)
      q.processAllAvailable()
      // batch2's t=1000 event closes user 1's (0,10) session (state kept
      // from batch 1); t=3000 closes (1000,1005).
      val out = spark.table(sink).as[Session].collect().sortBy(_.session_start.getTime)
      assert(out.toSeq === Seq(
        Session(1, 2, ev(1, 1, 0).ts, ev(2, 1, 10).ts),
        Session(1, 2, ev(4, 1, 1000).ts, ev(5, 1, 1005).ts)))
    } finally q.stop()
  }

  test("stateful ≡ declarative on the real events table (closed sessions)") {
    import spark.implicits._
    val gap = 43200L // q64's 12h
    val events = Sessionize.eventsOf(spark, "/root/testdata/sf0.001")
    val stateful = Sessionize.statefulSessions(events, gap)
      .collect().map(s => (s.user_id, s.n_events, s.session_start, s.session_end)).toSet
    // Declarative q64 output, minus each user's LAST session (stateful
    // keeps the open tail in state).
    val q64 = SparkEntry.queries("q64_sessionize")(spark, "/root/testdata/sf0.001")
    val rows = q64.collect()
    val lastIdx = rows.groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(1)).max }
    val declarative = rows
      .filter(r => lastIdx(r.getLong(0)) != r.getLong(1))
      .map(r => (r.getLong(0), r.getLong(2),
        r.getTimestamp(rows.head.fieldIndex("session_start")),
        r.getTimestamp(rows.head.fieldIndex("session_end")))).toSet
    assert(stateful === declarative)
  }
}
