package graft.operators

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over an ARRAY<FLOAT> embedding column —
  * the centroid TRAINER for [[Similarity.ivfTopK]] (which accepts any
  * centroid table; q71 feeds it hash-sampled vectors, this learns real
  * cell centers so posting lists balance and probes hit).
  *
  * Everything is partition-invariant, unlike textbook float k-means:
  *
  *  - INIT: the k seeds are the k smallest `md5_u32(id)` vectors (one
  *    WindowGroupLimit-style top-k, no rand()) — rerunnable, and
  *    independent of file layout;
  *  - ASSIGNMENT: a PURE PROJECTION. The centroids are a driver-side
  *    k×d literal (k·d doubles — broadcast-small by definition), the
  *    squared-L2 fold per centroid is a sequential lambda over the
  *    row's own array (deterministic order), argmin tie-breaks on the
  *    lower centroid id. No join, no shuffle, no window;
  *  - UPDATE: per-dimension sums in DECIMAL(28,10) via posexplode →
  *    groupBy(cluster, dim) — exact, so merge order is invisible — and
  *    the mean is taken on the driver in BigDecimal with one fixed
  *    HALF_UP rounding to 10 decimals before becoming the next round's
  *    literal. Bit-identical centroids on any partitioning;
  *  - EMPTY CLUSTERS keep their previous centroid (documented Lloyd
  *    convention);
  *  - each round is ONE aggregation job over the input; the loop plans
  *    from the same cached frame plus fresh literals, so the logical
  *    plan does NOT grow with rounds (no lineage recursion — this is
  *    the loop shape that does NOT need the CC checkpoint trick).
  *
  * At 100 TB: per round = one scan + one (k·d)-row exchange. The scan
  * dominates; rounds are bounded by `maxIters` and the exact-fixpoint
  * stop (centroid literals repeating exactly).
  */
object KMeans {

  /** Squared-L2 distance of `emb` to one literal centroid, as a Column:
    * sequential fold so both the arithmetic and its ORDER are fixed. */
  private def sqDist(emb: Column, cent: Seq[Double]): Column = {
    val c = array(cent.map(lit): _*)
    aggregate(
      zip_with(emb, c, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Argmin cluster id over the literal centroids (ties → lowest id). */
  private[operators] def assignExpr(emb: Column, cents: Seq[Seq[Double]]): Column =
    if (cents.size == 1) lit(0)
    else {
      val dists = cents.map(sqDist(emb, _))
      val minD = least(dists: _*)
      dists.zipWithIndex.foldRight(lit(-1): Column) { case ((d, j), rest) =>
        when(d === minD, lit(j)).otherwise(rest)
      }
    }

  /** Returns `docs` with an `assigned` cluster-id column (pure projection). */
  def assign(vectors: DataFrame, vecCol: String, cents: Seq[Seq[Double]]): DataFrame =
    vectors.withColumn("assigned", assignExpr(col(vecCol), cents))

  /** Train k centroids; returns (centroids, iterations). Centroid i of
    * the result is `Seq[Double]` of length d. The input should be
    * cached by the caller when it does not sit in fast storage — each
    * iteration scans it once. */
  def fit(vectors: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 20): (Seq[Seq[Double]], Int) = {
    require(k >= 1, s"k $k < 1")
    val base = vectors.select(col(idCol).as("__id"), col(vecCol).as("__emb"))
      .where(col("__emb").isNotNull)
    // hash-rank init: the k smallest md5_u32(id) rows, order pinned by id
    var cents: Seq[Seq[Double]] = base
      .selectExpr("__emb", "md5_u32(CAST(__id AS STRING)) AS __h", "__id")
      .orderBy("__h", "__id").limit(k)
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    require(cents.nonEmpty, "k-means needs at least one non-null vector")
    val d = cents.head.length
    val mc = new MathContext(38, RoundingMode.HALF_UP)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      val sums = assign(base, "__emb", cents)
        .select(col("assigned"), posexplode(col("__emb")).as(Seq("dim", "v")))
        .groupBy("assigned", "dim")
        .agg(sum(col("v").cast("decimal(28,10)")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = Array.tabulate(cents.size)(j => cents(j).toArray) // empty keeps old
      sums.foreach { r =>
        val (cl, dim) = (r.getInt(0), r.getInt(1))
        val mean = r.getDecimal(2)
          .divide(new JBigDecimal(r.getLong(3)), mc)
          .setScale(10, RoundingMode.HALF_UP)
        next(cl)(dim) = mean.doubleValue()
      }
      val nextSeq = next.map(_.toSeq).toSeq
      converged = nextSeq == cents
      cents = nextSeq
      iter += 1
    }
    (cents, iter)
  }

  /** The trained centroids as a [[Similarity.ivfTopK]]-shaped table:
    * (vec_id = cluster id, embedding ARRAY<FLOAT>). */
  def centroidTable(spark: org.apache.spark.sql.SparkSession,
      cents: Seq[Seq[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex
      .map { case (c, j) => (j.toLong, c.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
  }

  /** Within-cluster sum of squared distances under `cents` — the Lloyd
    * objective (each full iteration never increases it). */
  def cost(vectors: DataFrame, vecCol: String, cents: Seq[Seq[Double]]): Double = {
    val assigned = assign(vectors, vecCol, cents)
    val dists = cents.zipWithIndex.map { case (c, j) =>
      when(col("assigned") === j, sqDist(col(vecCol), c))
    }
    assigned.select(sum(coalesce(dists: _*)).as("c")).head().getDouble(0)
  }
}
