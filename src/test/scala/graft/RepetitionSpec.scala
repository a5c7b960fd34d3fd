package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Gopher repetition filters (q111's operator): hand-computed gram-mass
  * arithmetic, the count-tie-break contract, monotonicity on planted
  * spam, and partition invariance. */
class RepetitionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("hand-computed: duplicate-3-gram and top-bigram mass fractions") {
    // tokens: x y z x y z  -> 3-grams: "x y z"(2), "y z x"(1), "z x y"(1)
    // all grams are 5 chars: total3 = 20, dup3 = 10 -> dup3_bp = 5000
    // bigrams: "x y"(2) "y z"(2) "z x"(1), all 3 chars: total2 = 15
    // top = max(struct) = ("y z", 2) [tie 2-2 breaks to greater gram]
    // top2_bp = half-up(2*3*10000/15) = 4000
    val docs = Seq((1L, "x y z x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScores(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array((1L, 4L, 5000L, 4000L)))
  }

  test("no repetition -> dup3_bp = 0; fully repeated -> dup3_bp = 10000") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b a b a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(1L) === 0L)
    assert(got(2L) === 10000L)
  }

  test("planted spam raises both signals vs the clean version of the same doc") {
    val clean = "the quick brown fox jumps over the lazy dog near the river bank today"
    val spam = clean + " click here click here click here click here"
    val docs = Seq((1L, clean), (2L, spam)).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScores(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got(1)._1 > got(0)._1, "dup3_bp did not increase on spam")
    assert(got(1)._2 > got(0)._2, "top2_bp did not increase on spam")
  }

  test("docs shorter than 3 tokens have no 3-grams and drop out") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScores(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("scores are partition-invariant") {
    val docs = (0 until 150)
      .map(i => (i.toLong, (0 to 12).map(j => s"w${(i + j) % 5}").mkString(" ")))
      .toDF("doc_id", "text")
    val runs = Seq(1, 4, 13).map { p =>
      TextAnalysis.repetitionScores(docs.repartition(p), "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(runs.distinct.size === 1)
  }
}
