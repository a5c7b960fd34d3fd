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
    val root = Files.createTempDirectory("graft-txstream").toString
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
    val root = Files.createTempDirectory("graft-txstream3").toString
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
    val root = Files.createTempDirectory("graft-txstream2").toString
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
}
