package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog
import graft.streaming.StreamingTx

/** Streaming into the transactional table: incremental passes commit
  * versions, an unchanged directory commits nothing, and the txn
  * high-water mark absorbs the checkpoint-loss replay the file log
  * cannot cover. */
class StreamingTxSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def drop(dir: String, name: String, ids: Range): Unit = {
    Files.createDirectories(Paths.get(dir))
    val body = "id,v\n" + ids.map(i => s"$i,r$i").mkString("\n") + "\n"
    Files.writeString(Paths.get(dir, name), body): Unit
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("incremental passes: each batch is a table version; no re-ingest on rerun") {
    val root = graft.Scratch.dir("graft-stx").toString
    val (raw, table, ckpt) = (s"$root/raw", s"$root/t", s"$root/ckpt")

    drop(raw, "a.csv", 0 until 5)
    val first = StreamingTx.ingest(spark, raw, table, ckpt, schema, appId = "s1")
    assert(ids(first) === (0L until 5L).toSet)
    assert(TxLog.snapshot(table).txns === Map("s1" -> 0L))

    // Unchanged directory: the checkpoint's file log yields no batch.
    val rerun = StreamingTx.ingest(spark, raw, table, ckpt, schema, appId = "s1")
    assert(ids(rerun) === (0L until 5L).toSet)
    assert(TxLog.latestVersion(table) === 0L)

    // New file: exactly the new rows, one more version, batch id advanced.
    drop(raw, "b.csv", 5 until 9)
    val second = StreamingTx.ingest(spark, raw, table, ckpt, schema, appId = "s1")
    assert(ids(second) === (0L until 9L).toSet)
    assert(TxLog.snapshot(table).txns === Map("s1" -> 1L))
    assert(TxLog.history(spark, table).where("op = 'streamingAppend'").count() === 2L)
  }

  test("checkpoint loss with the same appId cannot duplicate rows (txn guard)") {
    val root = graft.Scratch.dir("graft-stx2").toString
    val (raw, table) = (s"$root/raw", s"$root/t")
    drop(raw, "a.csv", 0 until 6)
    StreamingTx.ingest(spark, raw, table, s"$root/ckpt1", schema, appId = "app")
    assert(TxLog.snapshot(table).rows === 6L)
    // The checkpoint is lost; the restarted stream re-reads EVERYTHING as
    // batch 0. The table's high-water mark (batch 0 committed) absorbs
    // the replay — rows must not double.
    StreamingTx.ingest(spark, raw, table, s"$root/ckpt2", schema, appId = "app")
    assert(TxLog.snapshot(table).rows === 6L)
    assert(TxLog.latestVersion(table) === 0L)
  }

  private val cdcSchema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType),
    StructField("seq", LongType)))

  private def cdcDrop(dir: String, name: String, rows: Seq[(Long, String, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val body = "id,v,seq\n" + rows.map { case (i, v, s) => s"$i,$v,$s" }.mkString("\n") + "\n"
    Files.writeString(Paths.get(dir, name), body): Unit
  }

  private def state(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("CDC upsert: latest-wins per key across batches, in-batch dups collapsed, replay skipped") {
    val root = graft.Scratch.dir("graft-stx3").toString
    val (raw, table, ckpt) = (s"$root/raw", s"$root/t", s"$root/ckpt")

    // batch 0: key 2 appears TWICE in one batch (seq 1 then 3) — the
    // per-key latest must land, or merge would reject the duplicate
    cdcDrop(raw, "a.csv", Seq((1L, "a1", 1L), (2L, "b1", 1L), (2L, "b2", 3L)))
    val first = StreamingTx.upsert(spark, raw, table, ckpt, cdcSchema,
      keyCol = "id", orderCol = "seq", appId = "cdc")
    assert(state(first) === Map(1L -> "a1", 2L -> "b2"))

    // batch 1: update key 1, insert key 3
    cdcDrop(raw, "b.csv", Seq((1L, "a2", 5L), (3L, "c1", 5L)))
    val second = StreamingTx.upsert(spark, raw, table, ckpt, cdcSchema,
      keyCol = "id", orderCol = "seq", appId = "cdc")
    assert(state(second) === Map(1L -> "a2", 2L -> "b2", 3L -> "c1"))
    assert(TxLog.history(spark, table).where("op = 'merge'").count() === 1L,
      "batch 0 creates the table; batch 1 must be a merge commit")

    // checkpoint loss: everything replays as batch 0 under the same
    // appId — the txn high-water mark (batch 1 seen) must skip it
    // wholesale, leaving the upserted state intact
    val replay = StreamingTx.upsert(spark, raw, table, s"$root/ckpt2", cdcSchema,
      keyCol = "id", orderCol = "seq", appId = "cdc")
    assert(state(replay) === Map(1L -> "a2", 2L -> "b2", 3L -> "c1"))
  }
}
