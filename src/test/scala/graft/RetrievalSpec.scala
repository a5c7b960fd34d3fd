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
}
