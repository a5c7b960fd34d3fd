package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
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
  *
  * Start position (Delta's `startingVersion`/`startingTimestamp`
  * discipline; effective only on a FRESH checkpoint — a resumed query
  * always continues from its committed offset):
  *  - `startingVersion`: first log version to deliver (or `"latest"` to
  *    deliver only commits made after the stream starts — the
  *    backfill-from-now case);
  *  - `startingTimestamp`: epoch millis, ISO-8601 instant, or
  *    `yyyy-MM-dd HH:mm:ss` (UTC) — delivers every version whose
  *    monotonized commit timestamp is at or after it (resolution via
  *    [[TxLog.versionAtTime]]); a timestamp before the first commit
  *    delivers everything.
  *
  * Admission control: `maxVersionsPerTrigger` bounds versions per
  * micro-batch; `maxFilesPerTrigger` bounds FILES and may stop inside a
  * commit ([[TxFileOffset]]) so one huge backfill commit drains as
  * bounded exactly-once batches.
  *
  * `partitionFilter` (`"col=val,col2=val2"`): a one-partition consumer —
  * foreign partitions' files are skipped by pv METADATA (never opened),
  * with a row-level guard for pv-less files, so correctness never rests
  * on the skip.
  */
class TxLogStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "txlog"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("txlog source: set .option(\"path\", <table dir>)"))

  /** The transactional table as a STREAMING SINK —
    * `writeStream.format("txlog").option("path", dir)`, the Delta
    * `writeStream.format("delta")` capability, without hand-rolling a
    * foreachBatch:
    *  - Append mode lands each micro-batch through [[TxLog.appendBatch]]
    *    with the Delta `txn` action, so the sink is EXACTLY-ONCE: the
    *    txn app id is derived from the query's CHECKPOINT location
    *    (overridable via `.option("txnAppId", …)`), pairing the id's
    *    lifetime 1:1 with the checkpoint's — exactly the discipline the
    *    appendBatch caveat requires (a rebuilt checkpoint means a new
    *    app id, so replayed batch ids cannot silently swallow new data).
    *  - Complete mode publishes each batch as an [[TxLog.overwrite]]
    *    commit (the aggregation-refresh case); replays converge by
    *    content.
    *  - Update mode is refused: keyed upserts need the key column —
    *    that is [[graft.streaming.StreamingTx]]'s mergeBatch loop.
    * First batch creates the table; later batches enforce schema
    * identity and CHECK constraints like any other writer. */
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode != OutputMode.Update(),
      "txlog sink: Update mode needs a merge key — use " +
        "StreamingTx/TxLog.mergeBatch in foreachBatch; Append and Complete are native")
    val dir = pathOf(parameters)
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation")
        .map(p => java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString))
      .getOrElse(throw new IllegalArgumentException(
        "txlog sink: set .option(\"checkpointLocation\", …) (its path keys " +
          "exactly-once batch tracking) or an explicit .option(\"txnAppId\", …)"))
    new TxLogSink(ctx.sparkSession, dir, appId,
      complete = outputMode == OutputMode.Complete(),
      partitionBy = partitionColumns)
  }

  private def cdfMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    // schema resolution needs no file list — meta plane, so attaching a
    // stream to a million-file table never folds its AddFiles
    val snap = TxLog.snapshotMeta(pathOf(parameters)).metaSnap
    // readChangeFeed=true streams the row-level CHANGE FEED instead of
    // new rows: schema gains _change_type + _commit_version
    val table =
      if (cdfMode(parameters))
        snap.schema
          .add(org.apache.spark.sql.types.StructField(
            TxLog.ChangeTypeCol, org.apache.spark.sql.types.StringType, nullable = false))
          .add(org.apache.spark.sql.types.StructField(
            "_commit_version", org.apache.spark.sql.types.LongType, nullable = false))
      else snap.schema
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
      parameters: Map[String, String]): Source = {
    require(!(parameters.contains("startingVersion") && parameters.contains("startingTimestamp")),
      "txlog source: startingVersion and startingTimestamp are mutually exclusive")
    require(!(parameters.contains("maxFilesPerTrigger") && cdfMode(parameters)),
      "txlog source: maxFilesPerTrigger splits data-file batches and does " +
        "not compose with readChangeFeed (change batches are per-commit; " +
        "use maxBytesPerTrigger, which weighs whole commits)")
    require(!(parameters.contains("partitionFilter") && cdfMode(parameters)),
      "txlog source: partitionFilter does not compose with readChangeFeed")
    // "col=val,col2=val2" — exact pv match per column (stats-canon strings)
    val partFilter: Map[String, String] =
      parameters.get("partitionFilter").map(_.split(",").toSeq.map(_.trim)
        .filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"txlog source: bad partitionFilter entry '$kv'")
          kv.take(i).trim -> kv.drop(i + 1).trim
        }.toMap).getOrElse(Map.empty)
    new TxLogSource(ctx.sparkSession, pathOf(parameters),
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      parameters.get("startingVersion"),
      parameters.get("startingTimestamp"),
      readChangeFeed = cdfMode(parameters),
      maxFilesPerTrigger = parameters.get("maxFilesPerTrigger").map(_.toLong),
      partitionFilter = partFilter,
      maxBytesPerTrigger = parameters.get("maxBytesPerTrigger").map(_.toLong))
  }
}

/** Streaming offset INSIDE a commit: `index` dataChange files of
  * `version` delivered (all earlier versions fully delivered) — what
  * lets [[TxLogSource]] drain a 10,000-file backfill commit as bounded
  * micro-batches (`maxFilesPerTrigger`, Delta's admission unit) instead
  * of one giant catch-up job. Whole-version boundaries keep the plain
  * numeric [[LongOffset]] encoding, so existing checkpoints resume
  * unchanged and the option can be added or removed across restarts. */
private[sources] case class TxFileOffset(version: Long, index: Long) extends Offset {
  override def json: String = s"""{"v":$version,"i":$index}"""
}

/** V1 streaming sink over the commit protocol ([[TxLogStreamProvider
  * .createSink]]). The incoming frame is bound to the micro-batch's
  * incremental execution; its physical rows are rebound as a batch
  * frame (the Delta V1-sink pattern) before entering the ordinary
  * write path — no second evaluation of the streaming plan. */
class TxLogSink(spark: SparkSession, dir: String, appId: String,
    complete: Boolean, partitionBy: Seq[String] = Nil) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val df = org.apache.spark.sql.graft.GraftSqlShims.batchDataFrame(
      spark, data.queryExecution.toRdd, data.schema)
    // `.partitionBy(...)` on the stream writer fixes the table's
    // first-class partition columns at creation (later batches follow
    // the property; a mismatch against an existing table fails loudly)
    if (partitionBy.nonEmpty) {
      val v = TxLog.latestVersion(dir)
      if (v < 0)
        try TxLog.create(dir, df.schema, partitionBy)
        catch { case _: TxLog.TableExistsException => () } // concurrent creator won
      else {
        val existing = TxLog.partitionColsOf(TxLog.snapshotMeta(dir).metaSnap)
        require(existing == partitionBy,
          s"txlog sink: partitionBy $partitionBy != table partitioning $existing")
      }
    }
    if (complete) TxLog.overwrite(spark, dir, df): Unit
    else TxLog.appendBatch(spark, dir, df, appId, batchId): Unit
  }
  override def toString: String = s"TxLogSink[$dir]"
}

class TxLogSource(spark: SparkSession, dir: String,
    maxVersionsPerTrigger: Option[Long] = None,
    startingVersion: Option[String] = None,
    startingTimestamp: Option[String] = None,
    readChangeFeed: Boolean = false,
    maxFilesPerTrigger: Option[Long] = None,
    partitionFilter: Map[String, String] = Map.empty,
    maxBytesPerTrigger: Option[Long] = None)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit}

  maxVersionsPerTrigger.foreach(m => require(m >= 1,
    s"maxVersionsPerTrigger must be >= 1, got $m"))
  maxFilesPerTrigger.foreach(m => require(m >= 1,
    s"maxFilesPerTrigger must be >= 1, got $m"))
  maxBytesPerTrigger.foreach(m => require(m >= 1,
    s"maxBytesPerTrigger must be >= 1, got $m"))

  /** Pinned at stream construction; also carries the column mapping the
    * scan needs (physical names never change, so the pinned mapping
    * covers every file the guard below lets through). Resolved through
    * the META plane — the source consumes schema/props only (batches
    * come from [[TxLog.changedFilesBetween]], never the live list), so
    * stream construction is O(checkpoint window) on any table size. */
  private val pinnedSnap: TxLog.Snapshot = TxLog.snapshotMeta(dir).metaSnap

  override val schema: StructType =
    if (readChangeFeed)
      pinnedSnap.schema
        .add(org.apache.spark.sql.types.StructField(
          TxLog.ChangeTypeCol, org.apache.spark.sql.types.StringType, nullable = false))
        .add(org.apache.spark.sql.types.StructField(
          "_commit_version", org.apache.spark.sql.types.LongType, nullable = false))
    else pinnedSnap.schema

  /** Exclusive lower bound for a FRESH checkpoint. Resolved ONCE at
    * source creation (so `latest` pins the stream-start version, not a
    * moving target); a resumed query never consults this — the engine
    * passes the checkpointed offset as `start`. */
  private val initialFrom: Long = (startingVersion, startingTimestamp) match {
    case (None, None) => -1L
    case (Some("latest"), _) => TxLog.latestVersion(dir)
    case (Some(v), _) =>
      val n = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"txlog source: startingVersion must be a version number or 'latest', got '$v'")
      }
      require(n >= 0, s"txlog source: startingVersion must be >= 0, got $n")
      n - 1
    case (_, Some(ts)) =>
      // deliver versions with monotonized commit ts >= the requested
      // instant ⇔ exclude those with ts <= instant-1ms; a timestamp
      // before the first commit means deliver-from-the-beginning
      val millis = parseTsMillis(ts)
      try TxLog.versionAtTime(dir, millis - 1)
      catch { case _: TxLog.VersionNotFoundException => -1L }
  }

  private def parseTsMillis(ts: String): Long =
    try TxLog.parseTsMillis(ts) catch {
      case e: IllegalArgumentException => throw new IllegalArgumentException(
        s"txlog source: startingTimestamp: ${e.getMessage}")
    }

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

  /** Per-version dataChange file counts and lists — commits are
    * immutable once published, so the cache never invalidates. */
  private val versionFiles =
    scala.collection.mutable.Map.empty[Long, Seq[TxLog.AddFile]]
  private def filesOf(v: Long): Seq[TxLog.AddFile] =
    versionFiles.getOrElseUpdate(v, TxLog.changedFilesBetween(dir, v - 1, v))
  private val versionChangeBytes = scala.collection.mutable.Map.empty[Long, Long]
  private def changeBytes(v: Long): Long =
    versionChangeBytes.getOrElseUpdate(v, TxLog.changeBytesOf(dir, v))

  /** Offsets normalize to a POSITION `(v, i)` = "all versions below `v`
    * fully delivered, plus the first `i` dataChange files of `v`".
    * A whole-version LongOffset(n) is position (n+1, 0). */
  private def startPos(o: ConnOffset): (Long, Long) = o match {
    case LongOffset(v) => (v + 1, 0L)
    case TxFileOffset(v, i) => (v, i)
    case other =>
      val j = other.json.trim
      if (j.startsWith("{")) {
        val p = org.json4s.jackson.JsonMethods.parse(j)
        ((p \ "v"), (p \ "i")) match {
          case (org.json4s.JInt(v), org.json4s.JInt(i)) => (v.toLong, i.toLong)
          case _ => sys.error(s"txlog source: unreadable offset $j")
        }
      } else (j.toLong + 1, 0L)
  }

  /** Admission control (Delta's maxFilesPerTrigger / maxBytesPerTrigger
    * / maxVersionsPerTrigger triple): the version cap bounds how far
    * the TARGET advances; the file and byte budgets walk forward
    * file-by-file — composing, either exhausting stops — and may stop
    * INSIDE a commit ([[TxFileOffset]]), so a single 10,000-file
    * backfill commit drains as bounded exactly-once micro-batches and a
    * commit of a few multi-GB files cannot flood one batch despite a
    * generous file cap. The byte budget is a SOFT max (Delta's rule):
    * a batch always admits at least one file, so a single file larger
    * than the budget still makes progress instead of stalling. */
  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset = {
    // Fresh checkpoint with an explicit start position and nothing to
    // deliver yet: emit ONE empty batch at the resolved position so the
    // engine checkpoints it — otherwise `latest` (or a timestamp) would
    // be re-resolved at every restart and silently skip commits made
    // between runs.
    def nothingNew: ConnOffset =
      if (start == null && initialFrom >= 0) LongOffset(initialFrom) else null
    val latest = availableTarget.getOrElse(TxLog.latestVersion(dir))
    if (latest < 0) return nothingNew
    val (sv, si) = Option(start).map(startPos).getOrElse((initialFrom + 1, 0L))
    val target = maxVersionsPerTrigger
      .map(m => math.min(latest, (sv - 1) + m)).getOrElse(latest)
    if (readChangeFeed && maxBytesPerTrigger.nonEmpty) {
      // CHANGE-FEED admission is VERSION-granular: a commit's change
      // set is transactionally whole, so the byte budget weighs whole
      // commits — at least one data-bearing commit always admits
      // (Delta's soft-max rule), and zero-byte commits (property or
      // layout changes) ride along free.
      val budget = maxBytesPerTrigger.get
      var v = sv; var used = 0L; var anyData = false; var stop = false
      while (!stop && v <= target) {
        val b = changeBytes(v)
        // `anyData` counts only data-bearing commits: a leading
        // zero-byte commit must not consume the "always admit one"
        // allowance (it would make the batch empty and defer the data).
        if (anyData && b > 0L && used + b > budget) stop = true
        else { used += b; if (b > 0L) anyData = true; v += 1 }
      }
      if (v == sv) nothingNew else LongOffset(v - 1)
    } else if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) {
      // uncapped: whole versions, no per-commit file listing needed;
      // mid-commit checkpoint with the option since removed: finish
      // the split version, then whole versions as before
      if (target < sv && si == 0L) nothingNew else LongOffset(math.max(target, sv))
    } else {
      var v = sv; var i = si; var admitted = 0L
      var fileBudget = maxFilesPerTrigger.getOrElse(Long.MaxValue)
      var byteBudget = maxBytesPerTrigger.getOrElse(Long.MaxValue)
      var stop = false
      while (!stop && v <= target) {
        val fs = filesOf(v)
        if (i >= fs.size) { v += 1; i = 0L } // version drained (or empty)
        else {
          val bytes = math.max(0L, fs(i.toInt).bytes)
          if (fileBudget <= 0L || (admitted > 0L && byteBudget < bytes)) stop = true
          else {
            admitted += 1; fileBudget -= 1; byteBudget -= bytes; i += 1
          }
        }
      }
      if (v == sv && i == si) nothingNew
      else if (i == 0L) LongOffset(v - 1)
      else TxFileOffset(v, i)
    }
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

  /** An END offset as an INCLUSIVE position: LongOffset(v) takes all of
    * version v; a file offset takes its prefix. */
  private def endPos(o: ConnOffset): (Long, Long) = o match {
    case LongOffset(v) => (v, Long.MaxValue)
    case TxFileOffset(v, i) => (v, i)
    case other =>
      val j = other.json.trim
      if (j.startsWith("{")) {
        val p = org.json4s.jackson.JsonMethods.parse(j)
        ((p \ "v"), (p \ "i")) match {
          case (org.json4s.JInt(v), org.json4s.JInt(i)) => (v.toLong, i.toLong)
          case _ => sys.error(s"txlog source: unreadable offset $j")
        }
      } else (j.toLong, Long.MaxValue)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val (sv, si) = start
      .map(o => startPos(o.asInstanceOf[ConnOffset]))
      .getOrElse((initialFrom + 1, 0L))
    val (ev, ei) = endPos(end.asInstanceOf[ConnOffset])
    val to = ev
    // Schema-drift guard: the source scans every file under the schema
    // pinned at stream construction — if appendEvolve widened the table
    // mid-stream, scanning new files under the old schema would SILENTLY
    // drop the added columns. Fail the query loudly instead (Delta's
    // behavior on streaming schema change); the user restarts the stream
    // to adopt the new schema. The converse direction is SAFE and must
    // not fail: a resumed stream catching up over pre-evolution versions
    // scans old files under the (wider) pinned schema — absent columns
    // read NULL, which is exactly what those rows hold.
    val atEnd = TxLog.snapshotMeta(dir, Some(to)).schema
    val pinned = schema.fields.map(f => f.name -> f.dataType).toMap
    val unrepresentable = atEnd.fields
      .filter(f => !pinned.get(f.name).contains(f.dataType))
    if (unrepresentable.nonEmpty)
      throw new IllegalStateException(
        s"txlog source: table schema changed mid-stream — version $to has " +
          s"column(s) ${unrepresentable.map(_.name).mkString(", ")} the " +
          s"stream's pinned schema cannot represent; restart the " +
          "streaming query to adopt the new schema")
    // change-feed mode: the batch IS the row-level feed of the range —
    // deletions and update images included (a plain stream cannot carry
    // them); the same loud-failure rule applies to DML commits that
    // predate enabling the table property
    if (readChangeFeed) {
      // CDF batches are whole commits (file splitting is rejected at
      // construction), so the version bounds carry everything
      val feed = TxLog.readChangeFeed(spark, dir, sv - 1, Some(to))
      return org.apache.spark.sql.graft.GraftSqlShims.streamingDataFrame(
        spark, feed.queryExecution.toRdd, schema)
    }
    // (recovery needs no bootstrap here: the engine passes the
    // checkpointed start offset into latestOffset, so the limiter
    // always advances from the committed position)
    // The slice between two positions: version sv from file si, whole
    // versions in between, version ev up to file ei — exactly-once at
    // FILE granularity (a file is delivered by precisely one batch).
    val sliced = (sv to ev).flatMap { v =>
      val fs = filesOf(v)
      val lo = if (v == sv) math.min(si, fs.size.toLong).toInt else 0
      val hi = if (v == ev) math.min(ei, fs.size.toLong).toInt else fs.size
      fs.slice(lo, hi)
    }
    // partitionFilter: a one-partition consumer never OPENS foreign
    // partitions' files (pv metadata skip — sound because pv is
    // immutable per file, so the skip decision is replay-stable);
    // pv-less files survive and filter row-wise below
    val files =
      if (partitionFilter.isEmpty) sliced
      else TxLog.pruneByFilters(pinnedSnap.copy(files = sliced),
        partitionFilter.toSeq.map { case (c, v) =>
          org.apache.spark.sql.sources.EqualTo(c, v) })
    // the engine asserts isStreaming=true on the returned frame; route
    // the (lazy) batch scan through the one sanctioned shim. scanAdds
    // applies deletion vectors carried by a clone commit's initial adds
    // (append/update adds are always DV-free at their own version).
    val rdd =
      if (files.isEmpty)
        spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow]
      else {
        val scan = TxLog.scanAdds(spark, dir, pinnedSnap, files)
        // row-level guard: correctness never rests on the metadata skip
        // (a pv-less file in the slice filters here)
        val guarded = partitionFilter.foldLeft(scan) { case (d, (c, v)) =>
          val field = pinnedSnap.schema.fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"txlog source: partitionFilter column $c not in the table schema"))
          d.where(org.apache.spark.sql.functions.col(c) ===
            org.apache.spark.sql.functions.lit(v).cast(field.dataType))
        }
        guarded.queryExecution.toRdd
      }
    org.apache.spark.sql.graft.GraftSqlShims.streamingDataFrame(spark, rdd, schema)
  }

  override def stop(): Unit = ()
}
