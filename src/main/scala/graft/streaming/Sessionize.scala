package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom-state streaming capability
  * (builder brief: `KeyValueGroupedDataset.flatMapGroupsWithState`).
  *
  * Two implementations with the same semantics:
  *  - the BATCH path (declarative lag + running-sum window, q64) — use it
  *    whenever the input is bounded; Catalyst plans one shuffle on
  *    user_id and two window passes;
  *  - [[statefulSessions]] — incremental state per user for unbounded
  *    streams: sessions close when a later event arrives more than
  *    `gapSec` after the last one; closed sessions are emitted, the open
  *    session stays in [[GroupState]] across micro-batches.
  *
  * Scale notes: state is one (count, start, end) triple per active user —
  * constant per key; events within one micro-batch per key are sorted
  * in-memory (bounded by per-trigger input, not by history). In
  * production add a state TTL via `GroupStateTimeout.EventTimeTimeout`
  * to flush sessions for users that go quiet forever.
  */
object Sessionize {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(nEvents: Long, start: Timestamp, end: Timestamp)
  final case class Session(user_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** Microsecond epoch — gap comparisons must run at the data's full
    * precision or boundary gaps classify differently than the
    * declarative (epoch-double) formulation. */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Closed sessions for a user given this batch's events + prior state. */
  private def step(gapSec: Long)(
      userId: Long, batch: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var cur = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      cur match {
        case Some(s) if micros(e.ts) - micros(s.end) > gapSec * 1000000L =>
          closed += Session(userId, s.nEvents, s.start, s.end)
          cur = Some(SessionState(1, e.ts, e.ts))
        case Some(s) =>
          val end = if (micros(e.ts) > micros(s.end)) e.ts else s.end
          cur = Some(SessionState(s.nEvents + 1, s.start, end))
        case None =>
          cur = Some(SessionState(1, e.ts, e.ts))
      }
    }
    cur.foreach(state.update)
    closed.result().iterator
  }

  /** Streaming (or single-batch) sessionization; emits CLOSED sessions.
    * The final open session per user remains in state (streaming) or is
    * discarded (batch) — mirror of how an unbounded stream behaves. */
  def statefulSessions(events: Dataset[Event], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step(gapSec))
  }

  /** Typed view of the events table (ts already micros). */
  def eventsOf(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Td.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").as[Event]
  }
}
