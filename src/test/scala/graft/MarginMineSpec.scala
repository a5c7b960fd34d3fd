package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Margin-mining contract: a genuine near-duplicate pair mines with a
  * high ratio margin while a HUB vector (close to everything) is
  * suppressed — the property raw-cosine thresholds lack; results are
  * bit-exact under repartitioning; anti-correlated neighborhoods drop;
  * degenerate inputs reject. */
class MarginMineSpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("mines the planted pair; suppresses the hub") {
    // x0 ≈ y0 (planted translation pair). y9 is a HUB: decent cosine to
    // EVERY x (it sits near the centroid), so raw cosine would pair the
    // hubless x1/x2 with it — but the hub's own backward top-k average
    // is just as high, so its margin hovers ≈ 1 and falls under the bar.
    val xs = vecs(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0.3f, 0.3f)),
      (2L, Seq(0f, 0.3f, 1f, 0.3f)))
    val ys = vecs(
      (10L, Seq(0.99f, 0.01f, 0f, 0f)), // y0: x0's genuine partner
      (11L, Seq(0f, 0.5f, 0.5f, 0.5f)), // hub-ish: similar to x1 and x2
      (12L, Seq(0f, 0.45f, 0.55f, 0.5f))) // second hub-ish vector
    val out = Similarity.marginMine(xs, ys, k = 2, thresholdMicro = 1050000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    // the planted pair survives with a clear margin
    assert(out.contains(0L) && out(0L)._1 === 10L)
    assert(out(0L)._2 > 1050000L)
    // the hub-dependent x rows do NOT mine: their best partners are the
    // hubs, whose margins sit at ~1 (cosine ≈ both endpoints' k-NN avg)
    assert(!out.contains(1L) && !out.contains(2L))
  }

  test("bit-exact under repartitioning (integer micro-units throughout)") {
    import spark.implicits._
    val xs = (0L until 30L).map(i =>
      (i, Seq.tabulate(8)(j => math.sin(i * 7 + j).toFloat))).toDF("vec_id", "embedding")
    val ys = (100L until 140L).map(i =>
      (i, Seq.tabulate(8)(j => math.cos(i * 3 + j).toFloat))).toDF("vec_id", "embedding")
    def run(px: Int) = Similarity
      .marginMine(xs.repartition(px), ys.repartition(px), k = 3, thresholdMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(run(1) === run(11))
  }

  test("anti-correlated neighborhoods drop instead of dividing by non-positive sums") {
    val xs = vecs((0L, Seq(1f, 0f)))
    val ys = vecs((1L, Seq(-1f, 0f)), (2L, Seq(-0.9f, -0.1f)))
    // every cross cosine is negative: sf + sb <= 0 → no mined rows, no error
    assert(Similarity.marginMine(xs, ys, k = 2, thresholdMicro = 0L).count() === 0L)
  }

  test("degenerate inputs reject or drop") {
    val xs = vecs((0L, Seq(1f, 0f)))
    intercept[IllegalArgumentException] {
      Similarity.marginMine(xs, xs, k = 0)
    }
    // invalid embeddings drop before pairing
    val bad = vecs((1L, Seq(0f, 0f)), (2L, Seq(Float.NaN, 1f)))
    assert(Similarity.marginMine(xs, bad, k = 1, thresholdMicro = 0L).count() === 0L)
  }
}
