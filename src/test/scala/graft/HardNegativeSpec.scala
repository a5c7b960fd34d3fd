package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Hard-negative mining contract: only differently-labeled candidates
  * qualify, near-identical vectors are excluded by the duplicate
  * ceiling, ordering is hardest-first with a deterministic tie-break,
  * and invalid embeddings drop on both sides. */
class HardNegativeSpec extends AnyFunSuite with SparkTestBase {

  private def vecs(rows: (Long, Seq[Float], Int)*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("mines top-k most-similar differently-labeled vectors") {
    // query 0 (label 0) at e1; candidates along a similarity gradient
    val v = vecs(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, Seq(1f, 0.1f, 0f), 0),   // same label: never a negative
      (2L, Seq(0.9f, 0.4f, 0f), 1), // hard negative (most similar other-label)
      (3L, Seq(0.5f, 0.8f, 0f), 1), // medium
      (4L, Seq(0f, 0f, 1f), 2))     // easy (orthogonal)
    val out = Similarity
      .hardNegatives(v, v.filter("vec_id = 0"), "label", k = 2, dupCeiling = 0.999)
      .collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 3L))
    assert(out.map(_.getInt(3)).toSeq === Seq(1, 2))
    // hardest first
    assert(out(0).getDouble(2) > out(1).getDouble(2))
  }

  test("duplicate ceiling drops near-identical other-label candidates") {
    val v = vecs(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(1f, 1e-4f), 1), // cosine ~1: unlabeled positive, not a negative
      (2L, Seq(0.7f, 0.7f), 1))
    val out = Similarity
      .hardNegatives(v, v.filter("vec_id = 0"), "label", k = 5, dupCeiling = 0.95)
      .collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L))
  }

  test("invalid embeddings drop from both sides; self never matches") {
    val v = vecs(
      (0L, Seq(1f, 0f), 0),
      (1L, Seq(0f, 0f), 1),                 // zero norm: invalid
      (2L, Seq(Float.NaN, 1f), 1),          // NaN: invalid
      (3L, Seq(0.5f, 0.5f), 1))
    val out = Similarity
      .hardNegatives(v, v, "label", k = 5, dupCeiling = 1.1)
      .collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    assert(!out.exists(r => r.getLong(1) == 1L || r.getLong(1) == 2L))
    assert(!out.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L))
  }
}
