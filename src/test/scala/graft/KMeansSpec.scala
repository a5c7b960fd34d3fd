package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Similarity}

/** Deterministic Lloyd's k-means: bit-identical centroids under any
  * partitioning (the decimal-sum + driver-BigDecimal-mean discipline),
  * perfect separation of well-separated blobs, a non-increasing
  * objective, empty-cluster retention, and the IVF integration — trained
  * centroids drive ivfTopK through its existing centroid-table port. */
class KMeansSpec extends AnyFunSuite with SparkTestBase {

  /** Two tight, far-apart blobs around (0,0,…) and (100,100,…), built
    * from hash arithmetic (no rand — reproducible rows). */
  private def blobs(n: Int, d: Int = 4) = {
    import spark.implicits._
    (0 until n).map { i =>
      val base = if (i % 2 == 0) 0.0f else 100.0f
      val emb = Array.tabulate(d)(j => base + ((i * 31 + j * 7) % 10) / 10.0f)
      (i.toLong, emb)
    }.toDF("vec_id", "embedding")
  }

  test("centroids are bit-identical under any partitioning") {
    val data = blobs(200)
    val results = Seq(1, 4, 13).map { p =>
      KMeans.fit(data.repartition(p), "vec_id", "embedding", k = 2, maxIters = 10)
    }
    assert(results.map(_._1).distinct.size === 1,
      s"partitioning changed the centroids: $results")
  }

  test("well-separated blobs: converged assignment separates them perfectly") {
    val data = blobs(200)
    val (cents, iters) = KMeans.fit(data, "vec_id", "embedding", k = 2)
    assert(iters >= 1)
    val assigned = KMeans.assign(data, "embedding", cents)
      .select(col("vec_id"), col("assigned")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val evenCluster = assigned(0L)
    assert(assigned.forall { case (id, c) =>
      c == (if (id % 2 == 0) evenCluster else 1 - evenCluster) })
    // the two centroids sit near the blob centers
    val mids = cents.map(_.head).sorted
    assert(mids(0) > -1 && mids(0) < 1 && mids(1) > 99 && mids(1) < 101, s"$cents")
  }

  test("objective is non-increasing across iterations") {
    val data = blobs(120, d = 3).cache()
    var prev = Double.MaxValue
    for (i <- 1 to 4) {
      val (cents, _) = KMeans.fit(data, "vec_id", "embedding", k = 3, maxIters = i)
      val c = KMeans.cost(data, "embedding", cents)
      assert(c <= prev + 1e-9, s"cost rose at iter $i: $prev -> $c")
      prev = c
    }
    data.unpersist()
  }

  test("k exceeding occupied cells: empty clusters keep their seed centroid") {
    import spark.implicits._
    // 8 identical points: one cluster absorbs them, the other seed never
    // gets members after round 1 — it must keep its previous coordinates
    val data = (0L until 8L).map(i => (i, Array(5.0f, 5.0f))).toDF("vec_id", "embedding")
    val (cents, _) = KMeans.fit(data, "vec_id", "embedding", k = 2, maxIters = 5)
    assert(cents.size === 2)
    assert(cents.count(c => math.abs(c.head - 5.0) < 1e-9) >= 1)
    assert(cents.forall(_.forall(v => !v.isNaN)))
  }

  test("trained centroids drive ivfTopK through its centroid-table port") {
    val data = blobs(200)
    val (cents, _) = KMeans.fit(data, "vec_id", "embedding", k = 2)
    val out = Similarity.ivfTopK(
      data, KMeans.centroidTable(spark, cents), "vec_id < 4", k = 3, nprobe = 1)
    val byQ = out.collect().groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    // with nprobe=1 on separated blobs, every neighbor shares its query's parity
    byQ.foreach { case (q, rows) =>
      rows.foreach(r => assert(r.getLong(1) % 2 === q % 2, s"q=$q got ${r.getLong(1)}"))
    }
  }
}
