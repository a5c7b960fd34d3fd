package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Semantics of the greedy longest-match wordpiece tokenizer, pinned two
  * ways: hand-computed cases for every regime (single-piece, multi-piece,
  * longest-match preference, UNK fallback, truncation, degenerate text),
  * and a property check against an independent driver-side reference
  * implementation over the real corpus. The Spark↔DuckDB parity is the
  * driver gate's job (q101) — both sides emit from one template. */
class SubwordSpec extends AnyFunSuite with SparkTestBase {

  private val vocab = Seq("the", "win", "dow", "ta", "ble", "so", "rt",
    "up", "slow", "t", "spark")

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.subwordCounts(rows.toDF("doc_id", "text"), "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  /** Independent reference: plain Scala greedy longest-match. */
  private def ref(text: String, vocab: Seq[String], maxWordLen: Int = 64): (Long, Long, Long) = {
    val words = Option(text).getOrElse("").toLowerCase.split(" ", -1)
      .filter(_.nonEmpty).map(_.take(maxWordLen))
    var cnt = 0L; var unk = 0L
    for (w <- words) {
      var pos = 0
      while (pos < w.length) {
        val best = vocab.filter(p => w.startsWith(p, pos)).map(_.length).maxOption
        cnt += 1
        if (best.isEmpty) { unk += 1; pos += 1 } else pos += best.get
      }
    }
    (words.length.toLong, cnt, unk)
  }

  test("hand-computed cases: pieces, longest-match, UNK, casing") {
    val out = run(
      1L -> "the window",   // the(1); win+dow(2)
      2L -> "sort slow",    // so+rt(2); slow(1)
      3L -> "big",          // no piece covers b/i/g → 3 UNK singles
      4L -> "dup",          // d=UNK, then up → cnt 2, unk 1
      5L -> "THE Table",    // lowercased: the(1); ta+ble(2)
      6L -> "t tt",         // t(1); t+t(2) — single-char piece reuse
      7L -> "")             // no words at all
    assert(out(1L) === ((2L, 3L, 0L)))
    assert(out(2L) === ((2L, 3L, 0L)))
    assert(out(3L) === ((1L, 3L, 3L)))
    assert(out(4L) === ((1L, 2L, 1L)))
    assert(out(5L) === ((2L, 3L, 0L)))
    assert(out(6L) === ((2L, 3L, 0L)))
    assert(out(7L) === ((0L, 0L, 0L)))
  }

  test("NULL text and words longer than maxWordLen (truncated before tokenizing)") {
    import spark.implicits._
    val long = "x" * 100 + "up" // truncation at 64 drops the trailing "up"
    val out = TextAnalysis.subwordCounts(
      Seq((1L, null.asInstanceOf[String]), (2L, long)).toDF("doc_id", "text"),
      "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((0L, 0L, 0L)))
    assert(out(2L) === ((1L, 64L, 64L))) // 64 UNK 'x' chars, nothing beyond
  }

  test("matches the independent driver-side reference over the real corpus") {
    val corpusVocab = Seq("the", "data", "join", "win", "dow", "ta", "ble",
      "col", "umn", "so", "rt", "up", "slow", "t", "spark", "que", "ry")
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    val got = TextAnalysis.subwordCounts(docs, "doc_id", "text", corpusVocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ref(r.getString(1), corpusVocab)).toMap
    assert(got === want)
  }

  test("native subword_stats ≡ the dialect-template HOF fold (the oracle's algorithm)") {
    val d = graft.queries.SparkSql
    val corpusVocab = Seq("the", "data", "win", "dow", "ta", "ble", "so",
      "rt", "up", "slow", "t", "spark", "que", "ry")
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    val native = TextAnalysis.subwordCounts(docs, "doc_id", "text", corpusVocab)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val tok = TextAnalysis.subwordTokExpr(d, "text", corpusVocab, 64)
    val hof = docs.selectExpr("doc_id", s"$tok AS tok")
      .selectExpr("doc_id" +: TextAnalysis.subwordCountExprs(d, "tok"): _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(native === hof)
  }

  test("subword_stats is NULL-element-safe: a NULL word is no word (public SQL function)") {
    // round-5 advice: the session-registered function must not NPE on an
    // array with NULL slots, which split-of-coalesced-text never produces
    // but arbitrary SQL can
    val out = spark.sql(
      "SELECT subword_stats(array('up', CAST(NULL AS STRING), 'big'), array('up'), 64) AS s")
      .collect()(0).getSeq[Long](0)
    assert(out === Seq(2L, 4L, 3L)) // up = 1 piece; big = 3 UNKs; NULL ignored
    val allNull = spark.sql(
      "SELECT subword_stats(array(CAST(NULL AS STRING)), array('up'), 64) AS s")
      .collect()(0).getSeq[Long](0)
    assert(allNull === Seq(0L, 0L, 0L))
  }

  test("supplementary-plane characters: native ≡ HOF fold (code-point walk + truncation)") {
    // round-5 advice: the native loop must count and truncate by CODE
    // POINT like both engines' substr/length, not by UTF-16 unit — an
    // astral char is ONE unk, and maxWordLen truncates at 64 code points
    import spark.implicits._
    val d = graft.queries.SparkSql
    val smile = "😀" // U+1F600, one code point, two UTF-16 units
    val docs = Seq(
      (1L, s"$smile${smile}up the"), // two astral UNKs, then pieces
      (2L, (smile * 70) + "up"),     // truncation at 64 code points drops "up"
      (3L, s"a${smile}t"))           // astral between ASCII
      .toDF("doc_id", "text")
    val native = TextAnalysis.subwordCounts(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val tok = TextAnalysis.subwordTokExpr(d, "text", vocab, 64)
    val hof = docs.selectExpr("doc_id", s"$tok AS tok")
      .selectExpr("doc_id" +: TextAnalysis.subwordCountExprs(d, "tok"): _*)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(native === hof)
    assert(native(0).drop(1) === Seq(2L, 4L, 2L)) // smile,smile,up | the
    assert(native(1).drop(1) === Seq(1L, 64L, 64L)) // 64 astral UNKs, no "up"
  }

  test("vocabulary contract: rejects empty, oversized, duplicate, non-ascii pieces") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.subwordCounts(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.subwordCounts(docs, "doc_id", "text", Seq("ab", "ab"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.subwordCounts(docs, "doc_id", "text", Seq("O'Brien"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.subwordCounts(docs, "doc_id", "text", Seq("abc"), maxWordLen = 2)
    }
  }
}
