package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** The bigram-LM scorer (q110's operator): hand-computed add-one
  * arithmetic, the exact half-up integer rounding, smoothing of bigrams
  * and prefixes the LM never saw (train ≠ score), short-doc exclusion,
  * and partition invariance of the all-integer pipeline. */
class BigramLmSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val train = Seq(
    (1L, "a b a b"), // bigrams: (a b) x2, (b a)
    (2L, "a b c") //    bigrams: (a b), (b c)
  ).toDF("doc_id", "text")
  // c2: "a b"->3, "b a"->1, "b c"->1; c1: a->3, b->2; V = 3 (a, b, c)

  test("hand-computed scores: counts, smoothing, half-up integer rounding") {
    val got = TextAnalysis.bigramLmScores(train, train, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: (a b)=  (3+1)*1e4/(3+3) = 6666.67 -> 6667 (x2), (b a) = (1+1)*1e4/(2+3) = 4000
    //        sum 17334, avg half-up(5778.0) = 5778
    // doc 2: (a b) 6667, (b c) = 4000 -> sum 10667, avg half-up(5333.5) = 5334
    assert(got === Array((1L, 3L, 17334L, 5778L), (2L, 2L, 10667L, 5334L)))
  }

  test("unseen bigram and unseen prefix both smooth instead of vanishing") {
    val score = Seq((9L, "a b z q")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(train, score, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    // (a b) = 6667; (b z): c2=0, c1(b)=2 -> 1e4/(2+3) = 2000;
    // (z q): c2=0, c1(z)=0 -> 1e4/(0+3) = 3333.33 -> 3333
    assert(got === ((9L, 3L, 6667L + 2000L + 3333L)))
  }

  test("documents with fewer than two tokens are excluded (no bigrams)") {
    val score = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(train, score, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(2L))
  }

  test("scores are partition-invariant (all-integer arithmetic)") {
    val docs = (0 until 200)
      .map(i => (i.toLong, s"w${i % 7} w${i % 5} w${i % 3} w${i % 11} w${i % 5}"))
      .toDF("doc_id", "text")
    val runs = Seq(1, 4, 13).map { p =>
      TextAnalysis.bigramLmScores(docs.repartition(p), docs.repartition(p),
          "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    }
    assert(runs.distinct.size === 1)
  }
}
