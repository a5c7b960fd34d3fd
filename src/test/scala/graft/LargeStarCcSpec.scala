package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Large-star/small-star connected components: parity with the
  * min-label-propagation [[Dedup.clusters]] on real LSH pairs, plus the
  * property that justifies its existence — logarithmic round count on
  * long chains, where plain propagation needs diameter rounds.
  */
class LargeStarCcSpec extends AnyFunSuite with SparkTestBase {

  test("parity: identical labels to clusters() on real near-dup pairs") {
    val sf = "/root/testdata/sf0.001"
    val docs = Td.load(spark, sf, "documents").select("doc_id", "text")
    // plant near-dups so clusters are non-trivial (same recipe as LshRecallSpec)
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.6)
    val viaPropagation = Dedup.clusters(pairs, "doc_a", "doc_b")
    val viaStars = Dedup.clustersLargeStar(pairs, "doc_a", "doc_b")
    assert(viaStars.count() > 0)
    assert(viaPropagation.exceptAll(viaStars).count() === 0)
    assert(viaStars.exceptAll(viaPropagation).count() === 0)
    viaPropagation.unpersist(); viaStars.unpersist()
  }

  test("long chain: converges in O(log n) rounds where propagation needs n") {
    import spark.implicits._
    // a 256-node path has diameter 255: min-label propagation moves the
    // label one hop per round, so 12 rounds CANNOT finish ...
    val path = (0L until 255L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ex = intercept[IllegalArgumentException] {
      Dedup.clusters(path, "doc_a", "doc_b", maxIters = 12)
    }
    assert(ex.getMessage.contains("did not converge"))
    // ... while star alternation halves chain length per round and lands
    // the whole path on node 0 inside the same budget
    val labels = Dedup.clustersLargeStar(path, "doc_a", "doc_b", maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length === 256)
    assert(labels.forall(_._2 === 0L), "every path node must label to the min node")
    }

  test("edge cases: empty pairs and pure self-pairs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clustersLargeStar(empty, "doc_a", "doc_b").count() === 0)
    val selfOnly = Seq((7L, 7L), (9L, 9L)).toDF("doc_a", "doc_b")
    val out = Dedup.clustersLargeStar(selfOnly, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(7L -> 7L, 9L -> 9L))
  }

  test("mixed topology: chain + clique + pair matches the known labeling") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val out = Dedup.clustersLargeStar(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }
}
