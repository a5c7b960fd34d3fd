package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize.Event

/** Streaming ingest dedup — the LLM-pipeline pattern of dropping
  * re-delivered events across micro-batches: `dropDuplicates` on a
  * stream keeps per-key state, so a duplicate arriving in a LATER batch
  * is still suppressed (bounded by watermark in production). */
class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  private def ev(id: Long, minute: Long): Event =
    Event(id, new Timestamp(1700000000000L + minute * 60000), id % 7, "click", 1.0)

  test("stream dropDuplicates suppresses cross-batch redelivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Event]
    val sink = s"dedup_${System.nanoTime()}"
    val q = source.toDS()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id", "ts")
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      source.addData(ev(1, 0), ev(2, 1), ev(2, 1)) // intra-batch dup
      q.processAllAvailable()
      source.addData(ev(2, 1), ev(3, 2)) // cross-batch redelivery of 2
      q.processAllAvailable()
      // watermark holds back rows until it passes their event time; push
      // it far forward so all unique rows flush to the append sink
      source.addData(ev(99, 600))
      q.processAllAvailable()
      val ids = spark.table(sink).as[Event].collect().map(_.event_id).sorted
      // event 2 exactly once despite 3 deliveries across 2 batches;
      // 99 is the (unique) watermark-pusher itself
      assert(ids.toSeq === Seq(1L, 2L, 3L, 99L))
    } finally q.stop()
  }

  test("foreachBatch NEAR-dup ingest: each batch fuzzy-dedups against all stored content") {
    // the incremental complement of BloomDedupSpec's exact ingest: a
    // lightly edited re-send (no exact hash match) is still dropped,
    // cross-batch, by nearDupHits against the growing store
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = graft.Scratch.dir("graft-fuzzy-ingest").toString
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(store)
    val source = MemoryStream[(Long, String)]
    val q = source.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val history = batch.sparkSession.read.parquet(store)
          .selectExpr("doc_id AS eval_id", "text")
        val hits = graft.operators.Decontamination
          .nearDupHits(batch, "doc_id", "text", history, "eval_id", "text", 0.6)
        batch.join(hits.select("doc_id"), Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(store)
      }
      .start()
    try {
      // 10 = one-word edit of the seed (near-dup, no exact match); 11 new
      source.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta iota"),
        (11L, "one two three four five six seven eight"))
      q.processAllAvailable()
      // 12 = one-word edit of 11 (near-dups a doc stored by a PRIOR batch)
      source.addData(
        (12L, "one two three four five six seven nine"),
        (13L, "fresh content entirely unlike anything stored"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 11L, 13L), s"stored: ${ids.toSeq}")
  }
}
