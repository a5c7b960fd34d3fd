package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Unigram}

/** Byte-level fallback for both tokenizer families (GPT-2's byte BPE
  * rule, SentencePiece's byte_fallback): encoding a corpus containing
  * characters the trainer never saw produces ZERO UNK — unknown
  * characters decompose into UTF-8 byte tokens — with exact
  * hand-computed counts on a controlled corpus, and the delimiter
  * soundness precondition checked against the real testdata. */
class ByteFallbackSpec extends AnyFunSuite with SparkTestBase {

  private def docsOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("BPE byte fallback: exact counts on a controlled corpus, zero UNK") {
    // train: 'abab' dominates → merges (a,b)->(ab), then (ab,ab)
    val train = docsOf(Seq((0L, "abab abab abab cd"), (2L, "abab cd cd")))
    // eval: known word, unseen word with a 3-byte char (⟡ = U+27E1),
    // and a mixed word
    val eval0 = docsOf(Seq((1L, "abab ⟡ a⟡b"), (3L, "cd")))
    val out = Bpe.encodeFallback(train, eval0, "doc_id", "text", rounds = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: 'abab' -> 1 symbol after two merges; '⟡' -> 3 byte tokens;
    // 'a⟡b' -> a + 3 bytes + b = 5 symbols (a,b known but NOT adjacent,
    // so the (a,b) merge cannot fire across the byte tokens)
    assert(out.toSeq === Seq(
      (1L, 3L, 1L + 3L + 5L, 6L, 0L),
      (3L, 1L, 2L, 0L, 0L))) // 'cd' untouched by the learned merges
  }

  test("unigram byte fallback: exact counts on a controlled corpus") {
    val p = Unigram.UnigramParams(rounds = 1, seedK = 8, maxWordLen = 6, maxPiece = 2)
    val train = docsOf(Seq((0L, "abab abab cd cd cd")))
    val eval0 = docsOf(Seq((1L, "abab zz⟡ ⟡")))
    val out = Unigram.encodeFallback(train, eval0, "doc_id", "text", p)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 'abab' segmented by the trained DP (2 pieces: ab+ab under any
    // surviving vocab with 'ab'); 'zz⟡' unseen → z,z known chars (no:
    // z is NOT in the train charset → 1 byte each) → 2 bytes + 3 bytes;
    // '⟡' → 3 bytes
    assert(out.toSeq === Seq((1L, 3L, 2L + 5L + 3L, 5L + 3L)))
  }

  test("delimiter soundness precondition holds on the real testdata corpus") {
    // byte tokens are ⟨HH⟩ whole symbols; a collision with a trainable
    // symbol needs the literal delimiters in the corpus — pin absent
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    val hits = docs.where("instr(text, '⟨') > 0 OR instr(text, '⟩') > 0").count()
    assert(hits === 0L, "testdata contains the byte-token delimiters")
    // and the q215/q216 injected characters genuinely fall back
    val train = docs.where("doc_id % 2 = 0")
    val eval0 = docs.where("doc_id % 2 = 1")
      .selectExpr("doc_id", "text || ' x⟡y'  AS text")
    val agg = Bpe.encodeFallback(train, eval0, "doc_id", "text", rounds = 2)
      .agg(sum("n_fallback_bytes"), sum("n_unk")).head()
    assert(agg.getLong(0) > 0L, "no fallback bytes — the injection missed")
    assert(agg.getLong(1) === 0L, "UNK symbols escaped the open vocabulary")
  }
}
