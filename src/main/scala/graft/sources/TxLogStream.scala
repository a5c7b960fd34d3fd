package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The transactional table as a STREAMING SOURCE — the Delta
  * `readStream.format("delta")` capability for [[TxLog]] tables:
  * micro-batch offsets ARE log versions, so each batch delivers exactly
  * the rows of the commits in `(lastOffset, latestVersion]`, and the
  * query checkpoint (which persists offsets) resumes mid-log after a
  * restart without re-delivering anything.
  *
  * Change semantics match [[TxLog.readChanges]]: only `dataChange=true`
  * adds are delivered — an OPTIMIZE / auto-compaction / merge-remainder
  * rewrite adds files but re-delivers no rows, so a downstream consumer
  * never double-counts a compaction. Removes are NOT streamed (like
  * Delta's default source without CDF: appends-and-rewrites in,
  * deletions require the change-feed reader).
  *
  * Scale shape: `getOffset` is one log listing; `getBatch` is one log
  * replay plus a parquet scan of exactly the new files — never a
  * directory listing, never a rescan of delivered data. Usage:
  * {{{
  *   spark.readStream.format("txlog").option("path", dir).load()
  * }}}
  */
class TxLogStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "txlog"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("txlog source: set .option(\"path\", <table dir>)"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val table = TxLog.snapshot(pathOf(parameters)).schema
    // the source always scans under the LOG's schema; a user-supplied
    // schema that differs would silently misbind columns — reject it
    // upfront rather than deliver rows the plan mislabels
    schema.foreach { s =>
      require(s == table,
        s"txlog source: user schema $s differs from the table schema $table — " +
          "omit .schema(); the log is the schema authority")
    }
    ("txlog", table)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxLogSource(ctx.sparkSession, pathOf(parameters),
      parameters.get("maxVersionsPerTrigger").map(_.toLong))
}

class TxLogSource(spark: SparkSession, dir: String,
    maxVersionsPerTrigger: Option[Long] = None)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit}

  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))

  override val schema: StructType = TxLog.snapshot(dir).schema

  /** AvailableNow freezes the catch-up TARGET at query start (commits
    * racing the run are the next run's work); the rate limit then walks
    * batches toward it. Implementing SupportsTriggerAvailableNow is
    * what lets a LIMITED source keep advancing under AvailableNow —
    * without it the engine snapshots one getOffset() and would stop at
    * the first capped batch. */
  private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(TxLog.latestVersion(dir))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** At most `maxVersionsPerTrigger` NEW versions per micro-batch
    * (Delta's maxFilesPerTrigger discipline at version granularity — a
    * month-long backlog streams as bounded batches, not one giant
    * catch-up job); unlimited otherwise. */
  private def cappedEnd(from: Long): Option[Long] = {
    val latest = availableTarget.getOrElse(TxLog.latestVersion(dir))
    if (latest < 0) return None
    val capped = maxVersionsPerTrigger
      .map(m => math.min(latest, from + m)).getOrElse(latest)
    if (capped <= from) None else Some(capped)
  }

  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset = {
    val from = Option(start).map(versionOf).getOrElse(-1L)
    cappedEnd(from).map(LongOffset(_)).orNull
  }

  override def reportLatestOffset(): ConnOffset = {
    val v = TxLog.latestVersion(dir)
    if (v < 0) null else LongOffset(v)
  }

  /** The plain-Source path is bypassed once admission control exists
    * (the engine routes through latestOffset) — keep it truthful for
    * any caller that still asks. */
  override def getOffset: Option[Offset] = {
    val v = TxLog.latestVersion(dir)
    if (v < 0) None else Some(LongOffset(v))
  }

  private def versionOf(o: ConnOffset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L)
    val to = versionOf(end)
    // (recovery needs no bootstrap here: the engine passes the
    // checkpointed start offset into latestOffset, so the limiter
    // always advances from the committed position)
    val files = TxLog.changedFilesBetween(dir, from, to)
    // the engine asserts isStreaming=true on the returned frame; route
    // the (lazy) batch scan through the one sanctioned shim
    val rdd =
      if (files.isEmpty)
        spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else
        spark.read.schema(schema)
          .parquet(files.map(f => java.nio.file.Paths.get(dir, f).toString): _*)
          .queryExecution.toRdd
    org.apache.spark.sql.graft.GraftSqlShims.streamingDataFrame(spark, rdd, schema)
  }

  override def stop(): Unit = ()
}
