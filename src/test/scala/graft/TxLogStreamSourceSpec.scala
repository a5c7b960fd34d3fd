package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** The transactional table as a streaming source: offsets are log
  * versions, a checkpointed restart resumes mid-log, rewrites
  * (dataChange=false) deliver nothing. */
class TxLogStreamSourceSpec extends AnyFunSuite with SparkTestBase {

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "s")
  }

  /** One AvailableNow pass into a foreachBatch sink (the memory sink
    * forbids checkpoint recovery, which is exactly what this spec
    * exercises); returns the ids THIS pass delivered. */
  private def runOnce(table: String, ckpt: String, sink: String): Set[Long] = {
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.format("txlog").option("path", table).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").collect().foreach(r => got.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    got.asScala.toSet
  }

  test("streams committed rows; restart resumes at the last version; compaction delivers nothing") {
    val root = graft.Scratch.dir("graft-txstream").toString
    val (table, ckpt) = (s"$root/t", s"$root/ckpt")
    TxLog.append(spark, table, df(0 until 5).coalesce(1))
    TxLog.append(spark, table, df(5 until 8).coalesce(1))
    assert(runOnce(table, ckpt, "txs_a") === (0L until 8L).toSet)

    // nothing new: the offset checkpoint must yield an empty pass
    assert(runOnce(table, ckpt, "txs_b") === Set.empty[Long])

    // a compaction rewrites every row with dataChange=false: the stream
    // must NOT re-deliver them...
    TxLog.optimize(spark, table)
    assert(runOnce(table, ckpt, "txs_c") === Set.empty[Long],
      "optimize outputs are rewrites, not changes")

    // ...while a genuine append after the compaction arrives alone
    TxLog.append(spark, table, df(100 until 103).coalesce(1))
    assert(runOnce(table, ckpt, "txs_d") === (100L until 103L).toSet)
  }

  test("maxVersionsPerTrigger streams a backlog as bounded batches, nothing lost") {
    val root = graft.Scratch.dir("graft-txstream3").toString
    val table = s"$root/t"
    (0 until 5).foreach(i => TxLog.append(spark, table, df(i * 2 until i * 2 + 2)))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.format("txlog").option("path", table)
      .option("maxVersionsPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("id").collect().map(_.getLong(0))
        batchSizes.synchronized { batchSizes += rows.length.toLong }
        rows.foreach(r => got.add(r)): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === (0L until 10L).toSet, "rate limiting must not lose rows")
    assert(batchSizes.length >= 3,
      s"5 versions at <=2/trigger need >=3 batches, got $batchSizes")
    assert(batchSizes.forall(_ <= 4L),
      s"a batch exceeded 2 versions (4 rows): $batchSizes")
  }

  test("a fresh checkpoint replays the whole log exactly once") {
    val root = graft.Scratch.dir("graft-txstream2").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 4))
    TxLog.overwrite(spark, table, df(10 until 13))
    // overwrite is insert-class for the change feed: its adds carry
    // dataChange=true (the removes are not modeled) — a fresh reader
    // sees both generations, matching readChanges
    val got = runOnce(table, s"$root/ckpt", "txs_e")
    assert(got === ((0L until 4L) ++ (10L until 13L)).toSet)
    val viaChanges = TxLog.readChanges(spark, table, fromVersionExclusive = -1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === viaChanges, "stream must agree with the batch change feed")
  }

  /** runOnce with explicit source options. */
  private def runOnceOpts(table: String, ckpt: String,
      opts: Map[String, String]): Set[Long] = {
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val reader = spark.readStream.format("txlog").option("path", table)
    opts.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").collect().foreach(r => got.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    got.asScala.toSet
  }

  test("startingVersion skips earlier versions on a fresh checkpoint") {
    val root = graft.Scratch.dir("graft-txsv").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 3))  // v0
    TxLog.append(spark, table, df(3 until 6))  // v1
    TxLog.append(spark, table, df(6 until 9))  // v2
    assert(runOnceOpts(table, s"$root/c1", Map("startingVersion" -> "1")) ===
      (3L until 9L).toSet)
    // a RESUMED query ignores the option and continues from its offset
    TxLog.append(spark, table, df(9 until 11)) // v3
    assert(runOnceOpts(table, s"$root/c1", Map("startingVersion" -> "0")) ===
      (9L until 11L).toSet)
  }

  test("startingVersion composes with readChangeFeed: the feed starts mid-log") {
    val root = graft.Scratch.dir("graft-txsvcdf").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 4))  // v0
    TxLog.setProperties(table, Map(TxLog.Cdf.Enabled -> "true")) // v1
    TxLog.append(spark, table, df(10 until 14)) // v2
    TxLog.delete(spark, table, "id = 11")       // v3 (delete change rows)
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, String)]()
    val q = spark.readStream.format("txlog").option("path", table)
      .option("readChangeFeed", "true")
      .option("startingVersion", "2")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id", TxLog.ChangeTypeCol).collect()
          .foreach(r => got.add((r.getLong(0), r.getString(1)))): Unit
      }
      .option("checkpointLocation", s"$root/c")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    // only versions >= 2: v2's inserts and v3's deletion — v0's backlog
    // inserts never appear
    assert(got.asScala.toSet ===
      ((10L until 14L).map(_ -> "insert").toSet + (11L -> "delete")))
  }

  test("startingVersion=latest delivers only post-start commits") {
    val root = graft.Scratch.dir("graft-txsl").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 5)) // v0: pre-existing backlog
    assert(runOnceOpts(table, s"$root/c1", Map("startingVersion" -> "latest")) ===
      Set.empty[Long], "backfill-from-now must skip the backlog")
    TxLog.append(spark, table, df(5 until 7)) // v1
    assert(runOnceOpts(table, s"$root/c1", Map("startingVersion" -> "latest")) ===
      (5L until 7L).toSet,
      "the same checkpoint continues; 'latest' was pinned at first start")
  }

  test("startingTimestamp delivers versions committed at or after it") {
    val root = graft.Scratch.dir("graft-txst").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 3)) // v0
    Thread.sleep(20)
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    TxLog.append(spark, table, df(3 until 5)) // v1, after the cut
    assert(runOnceOpts(table, s"$root/c1",
      Map("startingTimestamp" -> cut.toString)) === (3L until 5L).toSet)
    // a timestamp before the first commit delivers everything
    assert(runOnceOpts(table, s"$root/c2",
      Map("startingTimestamp" -> "0")) === (0L until 5L).toSet)
  }

  test("start options are mutually exclusive and validated") {
    val root = graft.Scratch.dir("graft-txsx").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 2))
    intercept[Exception] {
      runOnceOpts(table, s"$root/c1",
        Map("startingVersion" -> "0", "startingTimestamp" -> "0"))
    }
    intercept[Exception] {
      runOnceOpts(table, s"$root/c2", Map("startingVersion" -> "nope"))
    }
  }

  test("mid-stream schema widening fails the batch; a restarted query adopts it") {
    val root = graft.Scratch.dir("graft-txse").toString
    val table = s"$root/t"
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    TxLog.append(spark, table, df(0 until 3)) // v0
    // drive the source like the engine would, so the widening lands
    // MID-STREAM (between batches of one continuous query)
    val src = new graft.sources.TxLogSource(spark, table)
    src.getBatch(None, LongOffset(0L)) // pinned (id, s); v0 scans fine
    TxLog.appendEvolve(spark, table,
      Seq((100L, "w", 7)).toDF("id", "s", "extra")) // v1 widens
    val e = intercept[IllegalStateException] {
      src.getBatch(Some(LongOffset(0L)), LongOffset(1L))
    }
    assert(e.getMessage.contains("schema changed"), e.getMessage)
    // a RESTARTED query (fresh source) pins the widened schema and
    // catches up: pre-evolution files read with extra=NULL, nothing lost
    assert(runOnce(table, s"$root/c-fresh", "txs_se3") ===
      ((0L until 3L).toSet + 100L))
  }

  test("partitionFilter: a one-partition consumer never opens foreign files") {
    import spark.implicits._
    val root = graft.Scratch.dir("graft-txstream-p").toString
    val table = s"$root/t"
    val d = (0 until 30).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    TxLog.appendPartitioned(spark, table, d, Seq("grp"))
    // corrupt a foreign partition's file: a stream that opens it dies
    val g2 = TxLog.snapshot(table).files.find(_.pv("grp") == "g2").get
    Files.write(java.nio.file.Paths.get(table, g2.path), "junk".getBytes)
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.format("txlog").option("path", table)
      .option("partitionFilter", "grp=g1").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").collect().foreach(r => got.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === (0L until 30L).filter(_ % 3 == 1).toSet)
    // appends keep streaming through the filter
    TxLog.append(spark, table,
      Seq((100L, "g1"), (101L, "g0")).toDF("id", "grp"))
    val got2 = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q2 = spark.readStream.format("txlog").option("path", table)
      .option("partitionFilter", "grp=g1").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("id").collect().foreach(r => got2.add(r.getLong(0))): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(got2.asScala.toSet === Set(100L))
  }

  test("maxFilesPerTrigger drains a many-file commit across bounded batches") {
    val root = graft.Scratch.dir("graft-txstream-f").toString
    val table = s"$root/t"
    // ONE commit of 10 files + a second 3-file commit
    TxLog.append(spark, table, df(0 until 100).repartition(10))
    TxLog.append(spark, table, df(100 until 130).repartition(3))
    val batchFiles = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.format("txlog").option("path", table)
      .option("maxFilesPerTrigger", "4").load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("id").collect().map(_.getLong(0))
        batchFiles.synchronized { batchFiles += rows.length.toLong }
        rows.foreach(r => got.add(r)): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    // no duplicate, no loss: 130 distinct ids and 130 total rows
    assert(got.asScala.toSet === (0L until 130L).toSet)
    assert(batchFiles.sum === 130L, s"row total drifted: $batchFiles")
    // 13 files at exactly 4/trigger = batches of (4,4,4,1) files: each
    // batch's row count must equal the corresponding consecutive file
    // window of the log's own per-file row counts
    val fileRows = (TxLog.changedFilesBetween(table, -1L, 0L) ++
      TxLog.changedFilesBetween(table, 0L, 1L)).map(_.rows)
    val wantBatches = fileRows.grouped(4).map(_.sum).toSeq
    assert(batchFiles.filter(_ > 0).toSeq === wantBatches,
      s"batches $batchFiles != 4-file windows $wantBatches")
  }

  test("a restart resumes EXACTLY-ONCE from a mid-commit file offset") {
    val root = graft.Scratch.dir("graft-txstream-r").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 90).repartition(9)) // one 9-file commit
    def onePass(trigger: Trigger): Set[Long] = {
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = spark.readStream.format("txlog").option("path", table)
        .option("maxFilesPerTrigger", "4").load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id").collect().foreach(r => got.add(r.getLong(0))): Unit
        }
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(trigger).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    // Trigger.Once = exactly ONE micro-batch: the first 4 of the 9
    // files, then the checkpoint holds a MID-COMMIT TxFileOffset
    val fileRows = TxLog.changedFilesBetween(table, -1L, 0L).map(_.rows)
    val first = onePass(Trigger.Once())
    assert(first.size.toLong === fileRows.take(4).sum,
      s"one batch = the first 4 files' rows, got ${first.size}")
    // the restarted query resumes from the file offset: the remaining
    // files' rows arrive, none of the first batch repeats
    val second = onePass(Trigger.AvailableNow())
    assert(second.size.toLong === fileRows.drop(4).sum && (first & second).isEmpty,
      s"resume must deliver exactly the remaining files once " +
        s"(got ${second.size} rows, overlap ${(first & second).size})")
    assert(first ++ second === (0L until 90L).toSet)
  }

  test("maxBytesPerTrigger drains a mixed-size commit within byte budget") {
    val root = graft.Scratch.dir("graft-txstream-b").toString
    val table = s"$root/t"
    // ONE commit of 8 files with very different sizes (50..400 rows):
    // an 8-partition RDD where partition p fans out (p+1)*50 rows — a
    // union of LocalRelations would fold back into one partition
    import spark.implicits._
    val rdd = spark.sparkContext.parallelize(0 until 8, 8)
      .flatMap(p => (0 until (p + 1) * 50).map(i => (p * 100000L + i, s"v$i")))
    TxLog.append(spark, table, rdd.toDF("id", "s"))
    val files0 = TxLog.changedFilesBetween(table, -1L, 0L)
    assert(files0.size === 8, "premise: one commit, eight size-diverse files")
    // budget ~ 2.5 median files: replay the greedy soft-max walk
    // independently and check the observed batch row totals match
    val budget = files0.map(_.bytes).sorted.apply(files0.size / 2) * 5 / 2
    val batchRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.format("txlog").option("path", table)
      .option("maxBytesPerTrigger", budget.toString).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("id").collect().map(_.getLong(0))
        batchRows.synchronized { batchRows += rows.length.toLong }
        rows.foreach(r => got.add(r)): Unit
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val allIds = files0.map(_.rows).sum
    assert(got.asScala.size.toLong === allIds, "no loss, no duplicates")
    // greedy soft-max windows over the commit's own file list
    val want = scala.collection.mutable.ArrayBuffer.empty[Long]
    var acc = 0L; var accBytes = 0L
    files0.foreach { f =>
      if (acc > 0L && accBytes + f.bytes > budget) {
        want += acc; acc = 0L; accBytes = 0L
      }
      acc += f.rows; accBytes += f.bytes
    }
    if (acc > 0L) want += acc
    assert(batchRows.filter(_ > 0).toSeq === want.toSeq,
      s"batches $batchRows != byte windows $want (budget $budget, " +
        s"files ${files0.map(_.bytes)})")
  }

  test("an oversized file still admits alone; byte budget composes with file cap") {
    val root = graft.Scratch.dir("graft-txstream-b2").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 60).repartition(6)) // 6 similar files
    val files0 = TxLog.changedFilesBetween(table, -1L, 0L)
    // budget below every file's size: soft max => exactly one file/batch
    val tiny = files0.map(_.bytes).min - 1
    val batchRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(opts: Map[String, String], ckpt: String): Set[Long] = {
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val r = spark.readStream.format("txlog").option("path", table)
      val q = opts.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }.load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.select("id").collect().map(_.getLong(0))
          batchRows.synchronized { batchRows += rows.length.toLong }
          rows.foreach(r => got.add(r)): Unit
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    assert(run(Map("maxBytesPerTrigger" -> tiny.toString), s"$root/c1") ===
      (0L until 60L).toSet)
    assert(batchRows.filter(_ > 0).toSeq === files0.map(_.rows).toSeq,
      "sub-file budget must deliver exactly one file per batch")
    // byte cap composes with the file cap: a generous byte budget but
    // maxFilesPerTrigger=2 still bounds batches to 2 files
    batchRows.clear()
    assert(run(Map("maxBytesPerTrigger" -> (tiny * 1000).toString,
      "maxFilesPerTrigger" -> "2"), s"$root/c2") === (0L until 60L).toSet)
    assert(batchRows.filter(_ > 0).toSeq ===
      files0.map(_.rows).grouped(2).map(_.sum).toSeq)
  }

  test("CDF stream byte admission is version-granular: commits never split") {
    import org.apache.spark.sql.functions._
    val root = graft.Scratch.dir("graft-txcdfadm").toString
    val table = s"$root/t"
    TxLog.append(spark, table, df(0 until 40).coalesce(1))
    TxLog.setProperties(table, Map(TxLog.Cdf.Enabled -> "true"))
    TxLog.append(spark, table, df(40 until 80).coalesce(1)) // v2
    TxLog.append(spark, table, df(80 until 120).coalesce(1)) // v3
    TxLog.delete(spark, table, "id = 50") // v4: cdf delete
    TxLog.update(spark, table, "id = 90", Map("s" -> "'upd'")) // v5

    def run(budget: String, ckpt: String): (Seq[Long], Map[String, Long]) = {
      val versions = scala.collection.mutable.ListBuffer.empty[Seq[Long]]
      val types = scala.collection.mutable.Map.empty[String, Long]
      val q = spark.readStream.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("maxBytesPerTrigger", budget).load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val vs = b.select("_commit_version").distinct()
            .collect().map(_.getLong(0)).toSeq.sorted
          if (vs.nonEmpty) versions.synchronized { versions += vs }
          b.groupBy("_change_type").count().collect().foreach(r =>
            types.synchronized {
              types(r.getString(0)) = types.getOrElse(r.getString(0), 0L) + r.getLong(1)
            }): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (versions.toSeq.map(_.max), types.toMap)
    }

    // a 1-byte budget: every data-bearing commit is its own batch —
    // never split, never merged (zero-byte property commits ride free)
    val (ends, types) = run("1", s"$root/c1")
    assert(ends.size === 5, s"expected 5 single-commit batches, got $ends")
    assert(types === Map(
      "insert" -> 120L, "delete" -> 1L,
      "update_preimage" -> 1L, "update_postimage" -> 1L))
    // a huge budget: one batch carries the whole feed, same totals
    val (ends2, types2) = run((1L << 40).toString, s"$root/c2")
    assert(ends2.size === 1)
    assert(types2 === types)
    // maxFilesPerTrigger stays refused in CDF mode
    val ex = intercept[Exception] {
      spark.readStream.format("txlog").option("path", table)
        .option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", "2").load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/c3")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(ex.getMessage.contains("maxFilesPerTrigger") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxFilesPerTrigger")))
  }
}
