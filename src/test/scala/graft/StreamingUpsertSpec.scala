package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingUpsert

/** Streaming keyed-upsert contract: newest version per key wins across
  * batches AND within a batch; replaying a batch is a no-op (merge
  * idempotency is what makes foreachBatch at-least-once delivery safe
  * here). Uses mergeBatch directly with a CSV-file stream driving it. */
class StreamingUpsertSpec extends AnyFunSuite with SparkTestBase {

  import org.apache.spark.sql.functions._

  test("newest version per key wins; replay is a no-op; stream drives merges") {
    import spark.implicits._
    val table = graft.Scratch.dir("graft-upsert").toString + "/t"

    // batch 1: keys 1..3 at v1 (with an in-batch duplicate of key 2 — v2 wins)
    val b1 = Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (2L, 2L, "b2"), (3L, 1L, "c1"))
      .toDF("k", "v", "payload")
    StreamingUpsert.mergeBatch(spark, b1, table, "k", "v")
    val s1 = spark.read.parquet(table).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(s1.toSeq === Seq((1L, 1L, "a1"), (2L, 2L, "b2"), (3L, 1L, "c1")))

    // replay the SAME batch (at-least-once redelivery) — no change
    StreamingUpsert.mergeBatch(spark, b1, table, "k", "v")
    assert(spark.read.parquet(table).count() === 3)

    // batch 2: update key 2, insert key 4; keys 1/3 carry over
    val b2 = Seq((2L, 3L, "b3"), (4L, 1L, "d1")).toDF("k", "v", "payload")
    StreamingUpsert.mergeBatch(spark, b2, table, "k", "v")
    val s2 = spark.read.parquet(table).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(s2.toSeq === Seq((1L, 1L, "a1"), (2L, 3L, "b3"), (3L, 1L, "c1"), (4L, 1L, "d1")))

    // review regression: a LATE batch carrying an OLDER version of key 2
    // must not overwrite the newer snapshot row (cross-batch version check)
    StreamingUpsert.mergeBatch(spark,
      Seq((2L, 1L, "stale")).toDF("k", "v", "payload"), table, "k", "v")
    val s2b = spark.read.parquet(table).where("k = 2")
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(s2b.toSeq === Seq((3L, "b3")))

    // crash-recovery contract: a swap that died between its two renames
    // (live gone, trash present) is healed by the next merge
    val livePath = java.nio.file.Paths.get(table)
    val trashPath = java.nio.file.Paths.get(table + ".swap_old")
    java.nio.file.Files.move(livePath, trashPath)
    StreamingUpsert.mergeBatch(spark,
      Seq((6L, 1L, "f1")).toDF("k", "v", "payload"), table, "k", "v")
    assert(spark.read.parquet(table).count() === 5) // 4 recovered keys + key 6

    // end-to-end through the real stream engine: file source → upsert sink
    val raw = graft.Scratch.dir("graft-upsert-raw")
    Files.writeString(raw.resolve("u1.csv"), "k,v,payload\n1,9,a9\n5,1,e1\n")
    val streamTable = graft.Scratch.dir("graft-upsert2").toString + "/t"
    // seed with the batch-2 state so the stream updates an existing table
    spark.read.parquet(table).write.parquet(streamTable)
    val src = spark.readStream
      .format("csv").option("header", "true")
      .schema("k LONG, v LONG, payload STRING")
      .load(raw.toString)
    val out = StreamingUpsert.run(spark, src, streamTable,
      graft.Scratch.dir("graft-upsert-ckpt").toString, "k", "v")
    val s3 = out.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(s3.toSeq === Seq((1L, 9L, "a9"), (2L, 3L, "b3"), (3L, 1L, "c1"),
      (4L, 1L, "d1"), (5L, 1L, "e1"), (6L, 1L, "f1")))
  }
}
