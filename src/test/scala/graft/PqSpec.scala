package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Product-quantization ANN: encoding shape and determinism, exact
  * retrieval of planted duplicates through the code path, cluster
  * recall, and partition invariance. Small dims (8 = 2 subspaces × 4)
  * so distances are hand-checkable. */
class PqSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // Three well-separated anchors in 8-dim space; vectors jitter around
  // them deterministically. Cluster of id i = i % 3.
  private def anchor(c: Int): Array[Float] = {
    val a = Array.fill(8)(0f)
    a(c * 2) = 10f; a(c * 2 + 1) = 10f
    a
  }
  private def vec(i: Int): Array[Float] = {
    val a = anchor(i % 3).clone()
    a(7) = a(7) + (i % 7) * 0.01f // small deterministic jitter
    a
  }
  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("encode: m codes per vector, all in [0, nCodes)") {
    val vs = corpus(60)
    val cb = Similarity.pqCodebook(vs, "vec_id < 6", nCodes = 6)
    assert(cb.count() === 6)
    val codes = Similarity.pqEncode(vs, cb, m = 2, subDim = 4).collect()
    assert(codes.length === 120) // 60 vectors × 2 subspaces
    assert(codes.forall { r =>
      val c = r.getAs[Int]("code"); c >= 0 && c < 6
    })
  }

  test("identical vectors always share codes (tie-break is id-free)") {
    val vs = corpus(30)
    val cb = Similarity.pqCodebook(vs, "vec_id < 6", nCodes = 6)
    val codes = Similarity.pqEncode(vs, cb, 2, 4)
      .groupBy("vec_id").agg(sort_array(collect_list(struct(col("s"), col("code")))).as("cs"))
    val byVec = codes.collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    // 23 ≡ 2 (mod 21): same anchor (mod 3) and same jitter (mod 7), so
    // ids 2 and 23 are identical vectors and must share all codes.
    assert(vec(2).toSeq === vec(23).toSeq)
    assert(byVec(2L) === byVec(23L))
  }

  test("a planted exact duplicate of the query is retrieved at rank 1") {
    val vs = corpus(60)
    val out = Similarity.pqTopK(vs, vs.where("vec_id = 9"), "vec_id < 6",
      m = 2, subDim = 4, nCodes = 6, rerankDepth = 10, k = 3).collect()
    // 9 % 3 == 0 and 9 % 7 == 2: ids with the same anchor and jitter are
    // duplicates of 9 — e.g. 30 (30%3=0, 30%7=2). Its cosine is exactly 1.
    assert(out.head.getAs[Int]("rank") === 1)
    assert(out.head.getAs[Double]("cosine") === 1.0)
  }

  test("cluster recall: every candidate of a query shares its cluster") {
    val vs = corpus(90)
    val out = Similarity.pqTopK(vs, vs.where("vec_id IN (4, 5)"), "vec_id < 6",
      m = 2, subDim = 4, nCodes = 6, rerankDepth = 8, k = 5).collect()
    out.foreach { r =>
      val q = r.getAs[Long]("q_id"); val v = r.getAs[Long]("vec_id")
      assert(v % 3 === q % 3, s"query $q retrieved cross-cluster $v")
    }
  }

  test("partition invariance: repartitioned corpus yields identical rows") {
    val vs = corpus(80)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(df, df.where("vec_id < 3"), "vec_id % 11 = 4",
        m = 2, subDim = 4, nCodes = 5, rerankDepth = 12, k = 4)
        .orderBy("q_id", "rank").collect().toSeq
    assert(run(vs.repartition(1)) === run(vs.repartition(7, col("vec_id"))))
  }
}
