package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Stupid-backoff trigram LM scoring against hand-computed cases.
  * Train corpus: one doc "a b c a b d" →
  *   N=6, V=4; c1: a=2 b=2 c=1 d=1;
  *   c2: "a b"=2 "b c"=1 "c a"=1 "b d"=1;
  *   c3: "a b c"=1 "b c a"=1 "c a b"=1 "a b d"=1.
  * Backoff levels (α=0.4, basis points, half-up):
  *   known trigram       → 10000·c3/c2(ctx)
  *   tail bigram known   →  4000·c2(tail)/c1(w2)
  *   else (add-one floor)→  1600·(c1(w3)+1)/(N+V) */
class TrigramLmSpec extends AnyFunSuite with SparkTestBase {

  private def score(texts: (Long, String)*): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val sc = texts.toDF("doc_id", "text")
    TextAnalysis.trigramLmScores(train, sc, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("known trigram scores at its direct ratio") {
    // "a b c": c3=1, ctx "a b"=2 → (20000·1+2) DIV 4 = 5000
    assert(score(1L -> "a b c")(1L) === ((1L, 5000L, 5000L)))
  }

  test("unseen trigram with known tail bigram backs off once (α=0.4)") {
    // "x a b": tail "a b"=2, c1(a)=2 → (8000·2+2) DIV 4 = 4000
    assert(score(1L -> "x a b")(1L) === ((1L, 4000L, 4000L)))
  }

  test("unseen trigram AND tail backs off twice to the add-one unigram floor") {
    // "b c d": tail "c d" unseen; w3=d, c1(d)=1 → (3200·2+10) DIV 20 = 320
    assert(score(1L -> "b c d")(1L) === ((1L, 320L, 320L)))
  }

  test("a completely unseen word still scores (add-one floor at c1=0)") {
    // "a b z": tail "b z" unseen; w3=z unseen → (3200·1+10) DIV 20 = 160
    assert(score(1L -> "a b z")(1L) === ((1L, 160L, 160L)))
  }

  test("multi-trigram doc sums and averages half-up") {
    // "a b c a": "a b c"→5000; "b c a": c3=1, ctx "b c"=1 →
    // (20000+1) DIV 2 = 10000. sum 15000, avg (30000+2) DIV 4 = 7500
    assert(score(1L -> "a b c a")(1L) === ((2L, 15000L, 7500L)))
    // docs under 3 tokens emit nothing
    assert(!score(2L -> "a b").contains(2L))
  }
}
