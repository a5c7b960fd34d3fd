package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Chunker + packer (q114/q115's operators): window arithmetic including
  * overlap and the short last window, full-coverage/overlap invariants,
  * packing bin sizes around the context budget, and determinism. */
class ChunkingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("hand-computed: 5 tokens, chunk 3, stride 2 -> windows [1-3],[3-5],[5]") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 3, 2)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array((0L, 3L, "a b c"), (1L, 3L, "c d e"), (2L, 1L, "e")))
  }

  test("stride = chunk size -> disjoint cover; every token appears exactly once") {
    val docs = Seq((1L, (1 to 50).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 8, 8)
      .orderBy("chunk_idx").collect().map(_.getString(3))
    assert(chunks.length === 7) // ceil(50/8)
    val rejoined = chunks.flatMap(_.split(" "))
    assert(rejoined.toSeq === (1 to 50).map(i => s"t$i"))
  }

  test("50% overlap: consecutive full windows share exactly stride tokens") {
    val docs = Seq((1L, (1 to 64).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 32, 16)
      .orderBy("chunk_idx").collect().map(_.getString(3).split(" ").toSeq)
    chunks.sliding(2).foreach {
      case Array(a, b) if b.size == 32 =>
        assert(a.takeRight(16) === b.take(16), "overlap mismatch")
      case _ =>
    }
  }

  test("single short doc yields one short chunk; token counts are per-chunk exact") {
    val docs = Seq((1L, "only four small words")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, "doc_id", "text", 32, 16).collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 4L)
  }

  test("packing: bins straddle by at most one chunk around the context budget") {
    val docs = (0 until 100)
      .map(i => (i.toLong, (1 to 40).map(j => s"w$j").mkString(" "), s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
    val chunks = TextAnalysis
      .chunkDocuments(docs, "doc_id", "text", 32, 16)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val bins = TextAnalysis.packChunks(chunks, "lang", 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // every non-final bin holds >= 512 tokens (it closed because it
    // crossed the budget) and < 512 + max chunk size (straddle bound)
    val byLang = bins.groupBy(_._1)
    byLang.foreach { case (_, bs) =>
      val sorted = bs.sortBy(_._2)
      sorted.dropRight(1).foreach { case (l, b, t) =>
        assert(t >= 512 && t < 512 + 32, s"bin ($l, $b) holds $t tokens")
      }
    }
    // conservation: packed token total == chunk token total
    val total = chunks.agg(org.apache.spark.sql.functions.sum("n_chunk_tokens"))
      .head().getLong(0)
    assert(bins.map(_._3).sum === total)
  }

  test("packing is partition-invariant") {
    val docs = (0 until 120)
      .map(i => (i.toLong, (1 to (10 + i % 30)).map(j => s"w$j").mkString(" "), s"l${i % 2}"))
      .toDF("doc_id", "text", "lang")
    val runs = Seq(1, 4, 13).map { p =>
      val chunks = TextAnalysis
        .chunkDocuments(docs.repartition(p), "doc_id", "text", 16, 16)
        .join(docs.select("doc_id", "lang"), "doc_id")
      TextAnalysis.packChunks(chunks, "lang", 256)
        .orderBy("lang", "bin").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(runs.distinct.size === 1)
  }
}
