package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The similarity library's ENFORCED input contract: degenerate
  * embeddings (NULL / empty / NaN / Inf / zero-norm) are filtered at
  * every operator entry. Without the guard a zero vector's cosine is
  * 0/0 = NaN, which sorts GREATER than everything in Spark — it would
  * rank first in every top-k and pass any >= minCosine near-dup bar,
  * gluing semantic-dedup clusters together. */
class EmbeddingContractSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def unit(dim: Int, axis: Int, scale: Float = 1f): Array[Float] = {
    val a = Array.fill(dim)(0f)
    a(axis) = scale
    a
  }

  // 20 clean vectors on 4 axes (ids sharing id%4 are collinear → cosine 1).
  private def clean =
    (0 until 20).map(i => (i.toLong, unit(8, i % 4, 1f + i / 4 * 0.5f)))
      .toDF("vec_id", "embedding")

  private def degenerate = Seq(
    (100L, Array.fill(8)(0f)),                       // zero norm
    (101L, Array(Float.NaN, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (102L, Array(Float.PositiveInfinity, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (103L, Array.empty[Float])                       // empty
  ).toDF("vec_id", "embedding")
    .unionAll(Seq(104L).toDF("vec_id")
      .withColumn("embedding", lit(null).cast("array<float>")))

  private def dirty = clean.unionAll(degenerate)

  test("validEmbeddings keeps exactly the finite nonzero-norm rows") {
    assert(Similarity.validEmbeddings(dirty).count() === 20)
    assert(Similarity.validEmbeddings(dirty)
      .where(col("vec_id") >= 100).count() === 0)
  }

  test("topK on a dirty corpus equals topK on the pre-filtered corpus") {
    val q = dirty.filter(col("vec_id") < 2 || col("vec_id") >= 100)
    val got = Similarity.topK(dirty, q, k = 3).orderBy("q_id", "rank").collect()
    val want = Similarity.topK(clean, clean.filter(col("vec_id") < 2), k = 3)
      .orderBy("q_id", "rank").collect()
    assert(got.toSeq === want.toSeq)
    // and no NaN ever reaches the output
    assert(got.forall(r => !r.getDouble(2).isNaN))
  }

  test("without the guard a zero vector WOULD rank first (the bug being prevented)") {
    // Document the failure mode the contract kills: NaN cosine sorts
    // above every real cosine in Spark's ordering.
    val ranked = Seq(("a", Double.NaN), ("b", 0.99), ("c", 0.5))
      .toDF("id", "cosine")
      .orderBy(col("cosine").desc).select("id").as[String].collect()
    assert(ranked.head === "a")
  }

  test("semanticDedup on a dirty corpus: degenerates drop, clean clusters unchanged") {
    // seeds = 2 clean centroids; plant an exact copy (id 50) of id 0.
    val corpus = dirty.unionAll(Seq((50L, unit(8, 0, 1f))).toDF("vec_id", "embedding"))
    val cents = Seq((0L, unit(8, 0)), (1L, unit(8, 1)))
      .toDF("cent_id", "cent_emb")
    val kept = Similarity.semanticDedup(corpus, cents, minCosine = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // degenerates are not in the kept set at all
    assert(kept.intersect(Set(100L, 101L, 102L, 103L, 104L)) === Set.empty)
    // collinear family of axis 0 (ids 0,4,8,12,16,50 — cosine 1.0)
    // collapses to its min id; axis-1 family likewise; axes 2,3 families
    // also collapse (every member is collinear with its axis-mates).
    assert(kept === Set(0L, 1L, 2L, 3L))
  }

  test("ivfTopK and pqTopK drop degenerate centroids/codebook rows instead of corrupting ranks") {
    val got = Similarity.ivfTopK(dirty, dirty.filter(col("vec_id") % 2 === 0),
      "vec_id < 2", k = 3, nprobe = 1).collect()
    assert(got.forall(r => !r.getDouble(2).isNaN && r.getLong(1) < 100))
    val pq = Similarity.pqTopK(dirty, dirty.filter(col("vec_id") < 2 || col("vec_id") >= 100),
      "vec_id % 2 = 1", m = 2, subDim = 4, nCodes = 4, rerankDepth = 8, k = 3).collect()
    assert(pq.forall(r => !r.getDouble(2).isNaN && r.getLong(1) < 100))
    assert(!pq.exists(r => r.getLong(0) >= 100)) // degenerate queries gone too
  }

  test("the guard predicate agrees between the Spark and DuckDB emissions on paper cases") {
    // Same fragment, Spark dialect, evaluated by Spark SQL — the DuckDB
    // side is the same arithmetic (norm² finiteness/positivity), gated
    // end-to-end by q59/q60/q71/q108/q126's oracle compare.
    val pred = Similarity.validEmbExpr(graft.queries.SparkSql, "embedding")
    val got = dirty.selectExpr("vec_id", s"coalesce($pred, false) AS ok")
      .as[(Long, Boolean)].collect().toMap
    assert((0 until 20).forall(i => got(i.toLong)))
    assert(Seq(100L, 101L, 102L, 103L, 104L).forall(id => !got(id)))
  }
}
