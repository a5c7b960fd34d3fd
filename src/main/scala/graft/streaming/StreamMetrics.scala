package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** One micro-batch's progress record (top-level so Spark can derive an
  * Encoder for it). */
final case class BatchProgress(
    queryId: String, runId: String, batchId: Long,
    inputRows: Long, durationMs: Long, timestamp: String)

/** Streaming observability — the DLT event-log equivalent for the
  * engine's streams: a [[StreamingQueryListener]] that records one row
  * per micro-batch (query id, batch id, input rows, batch duration,
  * trigger timestamp) into a bounded in-memory buffer, queryable as a
  * DataFrame for monitoring/alerting exactly like
  * `PipelineResult.expectationMetrics` is for the batch DAG.
  *
  * Scale note: progress events are driver-side metadata (a few hundred
  * bytes per batch), never data; the buffer is capped so a long-lived
  * stream cannot grow the driver heap — production would sink these rows
  * to a metrics table instead of RAM.
  */
final class StreamMetrics(maxEvents: Int = 10000) extends StreamingQueryListener {

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchProgress]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.add(BatchProgress(p.id.toString, p.runId.toString, p.batchId,
      p.numInputRows, p.batchDuration, p.timestamp))
    while (buf.size > maxEvents) buf.poll()
  }

  /** Snapshot of recorded batches as a queryable DataFrame. */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq.toDF()
  }

  /** Recorded batch count (for polling in tests). */
  def size: Int = buf.size
}
