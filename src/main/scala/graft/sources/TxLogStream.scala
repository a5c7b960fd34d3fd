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
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("txlog", schema.getOrElse(TxLog.snapshot(pathOf(parameters)).schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxLogSource(ctx.sparkSession, pathOf(parameters))
}

class TxLogSource(spark: SparkSession, dir: String) extends Source {

  override val schema: StructType = TxLog.snapshot(dir).schema

  override def getOffset: Option[Offset] = {
    val v = TxLog.latestVersion(dir)
    if (v < 0) None else Some(LongOffset(v))
  }

  private def versionOf(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(-1L)
    val to = versionOf(end)
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
