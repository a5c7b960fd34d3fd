package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Quality bound for the MinHash-LSH near-dup operator: with 6 bands × 2
  * rows, candidate-recall at Jaccard ≥ 0.7 is 1-(1-0.49)^6 ≈ 0.98 in
  * expectation — this test pins it empirically at 100% on the sf0.001
  * corpus by comparing q55's output against the exact quadratic
  * all-pairs computation (the kind of check that CAN'T run at scale,
  * which is exactly why it lives in the test suite, not the engine). */
class LshRecallSpec extends AnyFunSuite with SparkTestBase {

  test("q55 finds every pair the exact all-pairs Jaccard ≥ 0.7 finds") {
    val sf = "/root/testdata/sf0.001"
    val docs = Td.load(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))

    val tk = corpus
      .where("size(split(text, ' ')) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
           i -> concat_ws(' ', slice(split(text, ' '), i, 3)))) AS sh""")
    val exact = tk.as("a").join(tk.as("b"), col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) / size(array_union(a.sh, b.sh)) AS j")
      .where("j >= 0.7")
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = SparkEntry.queries("q55_dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "corpus should contain high-similarity pairs")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed ${missed.size} of ${exact.size} pairs: ${missed.take(5)}")
  }
}
