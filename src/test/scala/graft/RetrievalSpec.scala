package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

/** BM25 ranked retrieval: scoring against the closed-form formula,
  * total-order ranking, probe shape, and stats reuse. */
class RetrievalSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana banana banana"),
    (4L, "durian elderberry fig grape")
  ).toDF("id", "text")

  /** The BM25 formula, straight from the scaladoc. */
  private def bm25(tf: Long, df: Long, len: Long, n: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len / avgdl))
  }

  test("scores match the closed-form formula; n_hits counts matched terms") {
    val got = Retrieval.bm25TopK(corpus, "id", "text", Seq("apple", "banana"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    val n = 4L; val avgdl = (3 + 2 + 3 + 4) / 4.0
    val exp1 = bm25(2, 2, 3, n, avgdl) + bm25(1, 2, 3, n, avgdl) // doc 1
    val exp2 = bm25(1, 2, 2, n, avgdl)                           // doc 2
    val exp3 = bm25(3, 2, 3, n, avgdl)                           // doc 3
    assert(got.map(_._1) === List(1L, 3L, 2L), s"ranking: $got")
    val byId = got.map(t => t._1 -> t).toMap
    assert(math.abs(byId(1L)._2 - exp1) < 1e-6)
    assert(math.abs(byId(2L)._2 - exp2) < 1e-6)
    assert(math.abs(byId(3L)._2 - exp3) < 1e-6)
    assert(byId(1L)._3 === 2L && byId(2L)._3 === 1L && byId(3L)._3 === 1L)
    // doc 4 contains no query term: absent, not zero-scored
    assert(!byId.contains(4L))
  }

  test("topK truncates after the (score desc, id) total order; ties break by id") {
    // two identical docs -> identical scores; the lower id must win rank
    val dup = Seq((10L, "kiwi lime"), (11L, "kiwi lime"), (12L, "mango"))
      .toDF("id", "text")
    val got = Retrieval.bm25TopK(dup, "id", "text", Seq("kiwi"), 1).collect()
    assert(got.map(_.getLong(0)).toList === List(10L))
  }

  test("duplicate query terms collapse to set semantics") {
    val once = Retrieval.bm25TopK(corpus, "id", "text", Seq("apple"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val twice = Retrieval.bm25TopK(corpus, "id", "text", Seq("apple", "apple"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(once === twice)
  }

  test("precomputed stats reproduce the inline-stats result") {
    val st = Retrieval.bm25Stats(corpus, "text")
    val inline = Retrieval.bm25TopK(corpus, "id", "text", Seq("banana"), 10)
      .collect().toList
    val reused = Retrieval.bm25TopK(corpus, "id", "text", Seq("banana"), 10,
      stats = Some(st)).collect().toList
    assert(inline === reused)
  }

  test("result is partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(df, "id", "text", Seq("apple", "banana"), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(run(corpus) === run(corpus.repartition(7)))
    assert(run(corpus) === run(corpus.coalesce(1)))
  }

  test("top-k plans as TakeOrdered, not a global sort") {
    val plan = Retrieval.bm25TopK(corpus, "id", "text", Seq("apple"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("malformed queries are rejected") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "id", "text", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] { // SQL-literal injection / non-token
      Retrieval.bm25TopK(corpus, "id", "text", Seq("a'b"), 5)
    }
    intercept[IllegalArgumentException] { // space can never match a token
      Retrieval.bm25TopK(corpus, "id", "text", Seq("two words"), 5)
    }
  }

  // ---- rrfFuse ------------------------------------------------------------

  test("rrfFuse: closed-form scores; single-arm docs score their one term") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", "rank", topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    def rnd(x: Double) = math.round(x * 1e6) / 1e6
    assert(out(10L) === ((rnd(rr(1) + rr(2)), 2L)))
    assert(out(20L) === ((rnd(rr(1) + rr(2)), 2L))) // symmetric ranks
    assert(out(30L) === ((rnd(rr(3)), 1L)))
    assert(out(40L) === ((rnd(rr(3)), 1L)))
  }

  test("rrfFuse: equal scores break ties by id; topK truncates the total order") {
    val a = Seq((5L, 1), (9L, 2)).toDF("id", "rank")
    val b = Seq((9L, 1), (5L, 2)).toDF("id", "rank")
    // both docs score rr(1)+rr(2): tie -> id order, topK 1 keeps id 5
    val top = Retrieval.rrfFuse(Seq(a, b), "id", "rank", topK = 1).collect()
    assert(top.map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("rrfFuse: three arms sum in fixed arm order — partition-invariant") {
    val arms = Seq(
      Seq((1L, 1), (2L, 2), (3L, 3)),
      Seq((2L, 1), (3L, 2), (1L, 3)),
      Seq((3L, 1), (1L, 2), (2L, 3)))
    def run(parts: Int) = Retrieval.rrfFuse(
      arms.map(rows => rows.toDF("id", "rank").repartition(parts)),
      "id", "rank", topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(run(1) === run(7))
    // every doc in all 3 arms with ranks {1,2,3} in some order -> equal
    // scores, id tie-break
    assert(run(1).map(_._1) === Seq(1L, 2L, 3L))
    assert(run(1).map(_._3).distinct === Seq(3L))
  }

  test("rrfFuse: invalid arguments are rejected") {
    val a = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq.empty, "id", "rank", 5) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), "id", "rank", 0) }
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Seq(a), "id", "rank", 5, rrfK = 0) }
  }
}
