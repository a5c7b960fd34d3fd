package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, Similarity}

/** Graph ANN contract: bounded degree, determinism and partition
  * invariance, exact retrieval of planted duplicates, and the claim
  * that motivates the tier — on a corpus whose true nearest neighbors
  * straddle quantizer-cell boundaries, graph search recovers what
  * IVF's fixed posting lists structurally cannot. */
class GraphAnnSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val D = 8

  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = Array.fill(D)(0f)
    parts.foreach { case (i, x) => a(i) = x }
    a
  }

  /** Two bulk clusters on axes 0 and 1, plus `straddlePairs` mutual-
    * nearest pairs planted ON the cell boundary: s_i leans to axis 0,
    * its partner s_i' to axis 1, both share a pair-unique dim-2
    * signature so each one's TRUE nearest neighbor is its partner —
    * which the axis-anchored quantizer puts in the OTHER cell. */
  private def corpus(bulkPerCluster: Int, straddlePairs: Int): DataFrame = {
    val bulk = (0 until bulkPerCluster).flatMap { i =>
      Seq(
        (i.toLong, vec(0 -> 1f, 3 -> 0.01f * (i % 5))),
        ((100 + i).toLong, vec(1 -> 1f, 4 -> 0.01f * (i % 5))))
    }
    val straddle = (0 until straddlePairs).flatMap { i =>
      Seq(
        ((200 + i).toLong, vec(0 -> 1.01f, 1 -> 1f, 2 -> (0.3f + 0.1f * i))),
        ((300 + i).toLong, vec(0 -> 1f, 1 -> 1.01f, 2 -> (0.3f + 0.1f * i))))
    }
    (bulk ++ straddle).toDF("vec_id", "embedding")
  }

  private val anchors =
    Seq((900L, vec(0 -> 1f)), (901L, vec(1 -> 1f)))
      .toDF("cent_id", "cent_emb")

  private def ivfCents =
    Seq((900L, vec(0 -> 1f)), (901L, vec(1 -> 1f)))
      .toDF("vec_id", "embedding")

  private def graph(v: DataFrame, rounds: Int = 1) =
    GraphAnn.buildKnnGraph(v, anchors, m = 6, rounds = rounds)

  test("bounded degree: no node exceeds m + longLinks out-edges") {
    val v = corpus(25, 8)
    val g = graph(v)
    val maxDeg = g.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    assert(maxDeg <= 8, s"degree $maxDeg > m=6 + longLinks=2")
  }

  test("boundary straddle: graph search finds the cross-cell partner, IVF nprobe=1 cannot") {
    val v = corpus(25, 8)
    val g = graph(v)
    // queries: the cell-0 side of every straddle pair
    val queryFilter = "vec_id >= 200 AND vec_id < 300"
    val truth = Similarity.topK(v, v.where(queryFilter), k = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    // every straddle query's true top-1 is its planted partner
    (0 until 8).foreach(i => assert(truth(200L + i) === 300L + i))

    val got = GraphAnn.searchTopK(v, g, v.where(queryFilter),
      k = 1, beam = 8, hops = 3, entryCount = 4)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val graphHits = truth.count { case (q, t) => got.get(q).contains(t) }

    val ivf = Similarity.ivfTopK(v, ivfCents, queryFilter, k = 1, nprobe = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toMap
    val ivfHits = truth.count { case (q, t) => ivf.get(q).contains(t) }

    // IVF probes the query's own cell only; the partner lives in the
    // other cell, so its recall here is structurally 0.
    assert(ivfHits === 0, s"IVF unexpectedly crossed the boundary: $ivfHits")
    assert(graphHits >= 7, s"graph recall@1 on straddle pairs: $graphHits/8")
  }

  test("overall recall@3 vs brute force on mixed queries") {
    val v = corpus(25, 8)
    val g = graph(v)
    val queryFilter = "vec_id IN (0, 3, 101, 104, 200, 204, 302, 306)"
    def topSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val truth = topSet(Similarity.topK(v, v.where(queryFilter), k = 3))
    val got = topSet(GraphAnn.searchTopK(v, g, v.where(queryFilter),
      k = 3, beam = 8, hops = 3, entryCount = 4))
    val recall = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size
    assert(recall >= 0.85, s"recall@3 = $recall")
  }

  test("deterministic and partition-invariant") {
    val v = corpus(20, 5)
    def run(in: DataFrame) = {
      val g = GraphAnn.buildKnnGraph(in, anchors, m = 6, rounds = 1)
      GraphAnn.searchTopK(in, g, in.where("vec_id < 3"),
        k = 3, beam = 8, hops = 2, entryCount = 4)
        .orderBy("q_id", "rank").collect().toSeq
    }
    assert(run(v) === run(v.repartition(7)))
    assert(run(v) === run(v))
  }

  test("degenerate embeddings are excluded from graph and results") {
    val v = corpus(20, 5).unionAll(Seq(
      (500L, Array.fill(D)(0f)),
      (501L, Array(Float.NaN, 1f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val g = graph(v)
    assert(g.where(col("src") >= 500 || col("dst") >= 500).count() === 0)
    val got = GraphAnn.searchTopK(v, g, v.where("vec_id < 3 OR vec_id >= 500"),
      k = 3, beam = 8, hops = 2, entryCount = 4).collect()
    assert(got.forall(r => r.getLong(0) < 500 && r.getLong(1) < 500))
    assert(got.forall(r => !r.getDouble(2).isNaN))
  }
}
