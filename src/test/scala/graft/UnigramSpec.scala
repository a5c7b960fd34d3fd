package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Unigram
import graft.operators.Unigram.UnigramParams

/** Unigram-LM tokenizer training ([[Unigram]] — the SentencePiece
  * trainer on integer-exact Viterbi-EM): hand-computed vocabulary and
  * segmentations on a tiny corpus, the coverage rules (single chars
  * never pruned; over-length words char-fallback at encode), pruning
  * schedule, and bit-for-bit determinism across runs. */
class UnigramSpec extends AnyFunSuite with SparkTestBase {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("tiny corpus: exact vocabulary, counts, and pruning by hand") {
    // words: ab×3, abc×1, cd×1. Seed counts: a=4, b=4, ab=4, c=2,
    // bc=1, abc=1, cd=1, d=1. Viterbi (fewest pieces first) picks the
    // whole-word piece everywhere → usage: ab=3, abc=1, cd=1, chars 0.
    val p = UnigramParams(rounds = 2, seedK = 8, maxWordLen = 10, maxPiece = 3)
    val got = Unigram.fit(docs("ab ab abc", "ab cd"), "text", p, topN = 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // keepK(1) = 6, keepK(2) = 4; chars ALWAYS stay (coverage floor)
    val byPiece = got.toMap
    assert(byPiece("ab") === 3L)
    assert(byPiece("abc") === 1L)
    assert(byPiece("cd") === 1L)
    Seq("a", "b", "c", "d").foreach(c =>
      assert(byPiece.contains(c), s"char '$c' must survive every prune"))
    // ranked head is exact: counts DESC, piece ASC
    assert(got.take(3).toSeq === Seq(("ab", 3L), ("abc", 1L), ("cd", 1L)))
    // keepK(2)=4 → besides the 3 used pieces + top zero-count slot,
    // only the char floor remains; pruned multi-char zeros are gone
    assert(!byPiece.contains("bc") || got.size <= 8)
  }

  test("segmentation objective: fewest pieces, then highest counts, then path") {
    // corpus where the count tie-break decides: word "xy" with both
    // chars and no "xy" piece after pruning... use seedK tiny so only
    // top pieces survive: seedK=4 keeps the 4 hottest substrings, the
    // char floor keeps the rest alive for coverage.
    val p = UnigramParams(rounds = 1, seedK = 4, maxWordLen = 10, maxPiece = 3)
    val out = Unigram.fit(docs("aa aa ab"), "text", p, topN = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // seeds: a=5, aa=2, b=1, ab=1 → v0 = {a, aa, b, ab}; words segment
    // whole-word (np=1): aa→aa(2), ab→ab(1); a never a chosen piece
    assert(out("aa") === 2L)
    assert(out("ab") === 1L)
    assert(out("a") === 0L && out("b") === 0L)
  }

  test("encode: per-doc piece counts; over-length words fall back to chars") {
    val p = UnigramParams(rounds = 1, seedK = 16, maxWordLen = 4, maxPiece = 3)
    val d = docs("ab ab abc", "extralongword ab")
    val got = Unigram.encode(d, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 2)
    val m = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(m(0L)._1 === 3L, "doc 0 has 3 words")
    assert(m(1L)._1 === 2L)
    // 'extralongword' (13 chars > maxWordLen 4) encodes as 13 char
    // pieces — the coverage fallback, never a dropped word
    assert(m(1L)._2 === 13L + 1L, "char fallback + whole-word 'ab'")
  }

  test("bit-for-bit determinism across runs") {
    val p = UnigramParams(rounds = 2, seedK = 32, maxWordLen = 8, maxPiece = 3)
    val d = docs("the quick brown fox", "the lazy dog the", "quick quick fox")
    val a = Unigram.fit(d, "text", p, 30).collect().map(_.toString).toSeq
    val b = Unigram.fit(d, "text", p, 30).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("NULL and empty docs contribute nothing but keep their encode row") {
    import spark.implicits._
    val d = Seq((0L, "ab ab"), (1L, null.asInstanceOf[String]), (2L, "  "))
      .toDF("doc_id", "text")
    val p = UnigramParams(rounds = 1, seedK = 8, maxWordLen = 6, maxPiece = 2)
    val got = Unigram.encode(d, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 2L, 2L), (1L, 0L, 0L), (2L, 0L, 0L)))
  }
}
