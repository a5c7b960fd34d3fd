package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

/** PCA contract: recovers planted principal axes, components are
  * orthonormal with descending explained variance, the model is
  * bit-identical under any partitioning (decimal moments), and
  * projection is a pure, dimension-guarded projection. */
class PcaSpec extends AnyFunSuite with SparkTestBase {

  // points spread along (0.6, 0.8, 0) with a smaller spread along z and
  // an offset mean — PC1 must recover the planted axis, PC2 the z axis
  private def planted() = {
    import spark.implicits._
    val ts = (-10 to 10).map(_.toDouble)
    val zs = Seq(-1.0, 0.0, 1.0)
    (for { t <- ts; z <- zs } yield
      (Array((0.6f * t + 5.0).toFloat, (0.8f * t - 2.0).toFloat, z.toFloat), 1L))
      .toDF("embedding", "row_id")
  }

  test("recovers planted axes; components orthonormal; variance descending") {
    val m = Pca.fit(planted(), "embedding", k = 2)
    assert(m.dim === 3 && m.n === 63L)
    val pc1 = m.components(0); val pc2 = m.components(1)
    assert(math.abs(pc1(0) - 0.6) < 1e-6 && math.abs(pc1(1) - 0.8) < 1e-6
      && math.abs(pc1(2)) < 1e-6, pc1.toSeq.toString)
    assert(math.abs(math.abs(pc2(2)) - 1.0) < 1e-6, pc2.toSeq.toString)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(pc1, pc1) - 1.0) < 1e-9)
    assert(math.abs(dot(pc2, pc2) - 1.0) < 1e-9)
    assert(math.abs(dot(pc1, pc2)) < 1e-9, "components must be orthogonal")
    assert(m.varianceExplained(0) > m.varianceExplained(1))
    // explained variance of the planted main axis: Var(t) over ts
    assert(math.abs(m.varianceExplained(0) - 36.666666) < 1e-3)
  }

  test("model is bit-identical under repartitioning (decimal moments)") {
    val a = Pca.fit(planted().repartition(7), "embedding", k = 3)
    val b = Pca.fit(planted().repartition(1), "embedding", k = 3)
    assert(a.mean.toSeq === b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq === b.components.map(_.toSeq).toSeq)
    assert(a.varianceExplained.toSeq === b.varianceExplained.toSeq)
  }

  test("projection centers then rotates; NULL/wrong-dim rows project NULL") {
    import spark.implicits._
    val m = Pca.fit(planted(), "embedding", k = 2)
    val out = Pca.project(planted(), "embedding", m)
    // projections of the planted set onto PC1 must span the t range
    val p1 = out.select("pc0").collect().map(_.getDouble(0))
    assert(math.abs(p1.max - 10.0) < 1e-4 && math.abs(p1.min + 10.0) < 1e-4,
      s"PC1 span ${p1.min}..${p1.max}")
    // mean of projections along every component is ~0 (centered)
    assert(math.abs(p1.sum / p1.length) < 1e-9)
    val bad = Seq((Array(1.0f, 2.0f), 1L), (null.asInstanceOf[Array[Float]], 2L))
      .toDF("embedding", "row_id")
    val badOut = Pca.project(bad, "embedding", m).select("pc0").collect()
    assert(badOut.forall(_.isNullAt(0)), "dimension-contract rows must project NULL")
  }

  test("the real embeddings table fits and projects deterministically") {
    val df = Td.load(spark, "/root/testdata/sf0.001", "embeddings")
    val m1 = Pca.fit(df, "embedding", k = 4)
    val m2 = Pca.fit(df.repartition(13), "embedding", k = 4)
    assert(m1.components.map(_.toSeq).toSeq === m2.components.map(_.toSeq).toSeq)
    assert(m1.varianceExplained.forall(_ >= 0.0))
    val projected = Pca.project(df, "embedding", m1)
    assert(projected.where("pc0 IS NULL").count() === 0)
  }

  test("jacobiEigen handles equal diagonal entries (theta = 0)") {
    // [[1, .5], [.5, 1]] has eigenvalues {1.5, 0.5}; with the signum(0)
    // form the rotation degenerated to the identity and the solve spun
    // to the sweep cap returning {1.0, 1.0} silently
    val (vals, _) = Pca.jacobiEigen(Array(Array(1.0, 0.5), Array(0.5, 1.0)))
    assert(vals.sorted.zip(Seq(0.5, 1.5)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // duplicated-dimension covariance (rank-deficient, equal diagonals)
    val (v2, vec2) = Pca.jacobiEigen(
      Array(Array(2.0, 2.0, 0.0), Array(2.0, 2.0, 0.0), Array(0.0, 0.0, 1.0)))
    assert(math.abs(v2.map(math.abs).max - 4.0) < 1e-12)
    assert(v2.exists(x => math.abs(x) < 1e-12))
    // eigenvectors stay orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until 3).map(i => vec2(i)(a) * vec2(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("rejects k out of range and empty input") {
    assertThrows[IllegalArgumentException](Pca.fit(planted(), "embedding", k = 0))
    assertThrows[IllegalArgumentException](Pca.fit(planted(), "embedding", k = 4))
    import spark.implicits._
    val empty = Seq.empty[(Array[Float], Long)].toDF("embedding", "row_id")
    assertThrows[IllegalArgumentException](Pca.fit(empty, "embedding", k = 1))
  }
}
