package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, posexplode}
import graft.queries.{DuckSql, SparkSql, SqlDialect}

/** Distributed PCA over an embedding column — the whitening /
  * dimensionality-reduction step embedding pipelines run before
  * clustering or semantic dedup (SemDeDup's own preprocessing).
  *
  * Two-phase shape (the J2 collect→literal discipline applied to linear
  * algebra, and the same split Spark MLlib's RowMatrix uses):
  *
  *  1. DISTRIBUTED moment aggregation: per-dimension sums and the
  *     upper-triangle Gram matrix land from one posexplode-squared
  *     relation, grouped on (i, j) — d(d+1)/2 groups, map-side partial
  *     aggregation, so the exchange carries ONE partial matrix per
  *     partition (the treeAggregate shape, relationally). All sums run
  *     in DECIMAL: float×float is exact in double, the decimal cast is
  *     value-preserving, and decimal addition is order-insensitive — so
  *     the moments are BIT-IDENTICAL under any partitioning (a double
  *     sum would drift in the last ulp and leak into every eigenvector).
  *  2. DRIVER-LOCAL eigensolve: cyclic Jacobi on the d×d covariance
  *     (O(d³) per sweep, d=64 → microseconds; the matrix, not the data,
  *     crosses the driver boundary — O(d²) bytes however many rows).
  *
  * Eigenvector sign is pinned (largest-|component| positive) and ties
  * on eigenvalue break by dimension index, so the model is a pure
  * function of the input SET. Rows with NULL or wrong-dimension vectors
  * are dropped (the [[Similarity]] input-contract discipline).
  */
object Pca {

  final case class Model(dim: Int, n: Long, mean: Array[Double],
      components: Array[Array[Double]], varianceExplained: Array[Double])

  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    // dimension = the MAX vector size — a deterministic aggregate, not
    // limit(1) over an unordered frame (with mixed-dimension input the
    // sampled row would decide which rows get dropped, breaking the
    // pure-function-of-the-input-set contract run to run)
    val dim = df.selectExpr(s"max(size($vecCol)) AS d").collect()
      .headOption.filterNot(_.isNullAt(0)).map(_.getInt(0)).filter(_ > 0)
      .getOrElse(throw new IllegalArgumentException(s"no non-empty $vecCol vectors"))
    require(k >= 1 && k <= dim, s"k must be in 1..$dim, got $k")
    val clean = df.where(s"$vecCol IS NOT NULL AND size($vecCol) = $dim")
      .select(col(vecCol).as("__v"))

    // first + second moments in one pass over the exploded relation;
    // j >= i keeps the upper triangle (symmetry fills the rest)
    val moments = clean
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
      .where("j >= i")
      .selectExpr("i", "j",
        "CAST(CAST(xi AS DOUBLE) * CAST(xj AS DOUBLE) AS DECIMAL(38,12)) AS p",
        "CASE WHEN j = i THEN CAST(CAST(xi AS DOUBLE) AS DECIMAL(38,12)) END AS x")
      .groupBy("i", "j")
      .agg(expr("sum(p)").as("sp"), expr("sum(x)").as("sx"),
        expr("count(*)").as("c"))
      .collect()

    val n = moments.find(r => r.getInt(0) == 0 && r.getInt(1) == 0)
      .map(_.getLong(4)).getOrElse(0L)
    require(n >= 2, s"PCA needs at least 2 vectors, got $n")
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    moments.foreach { r =>
      if (r.getInt(0) == r.getInt(1))
        mean(r.getInt(0)) = r.getDecimal(3).doubleValue() / n
    }
    moments.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val e2 = r.getDecimal(2).doubleValue() / n
      val c = e2 - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }

    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => (-values(i), i)).take(k)
    val comps = order.map { ei =>
      val v = Array.tabulate(dim)(d => vectors(d)(ei))
      // pin the sign: the largest-magnitude component is positive
      // (first such index on exact ties)
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    Model(dim, n, mean, comps, order.map(values(_)).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix V with V(:,e) the e-th eigenvector). Classic
    * textbook form (Golub & Van Loan §8.5): sweep all (p,q) pairs,
    * rotate away each off-diagonal entry, until the off-diagonal norm
    * vanishes. Deterministic: fixed sweep order, no pivoting on data. */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      for (p <- 0 until d; q <- p + 1 until d) s += a(p)(q) * a(p)(q)
      s
    }
    while (off() > 1e-20 && sweep < 100) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-15) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // Numerical Recipes form: theta == 0 (equal diagonal entries)
        // must give t = 1 (a 45° rotation), not t = 0 — signum(0)=0 would
        // make the rotation an identity and the pair never annihilates.
        val t0 = 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val t = if (theta < 0) -t0 else t0
        val cos = 1.0 / math.sqrt(t * t + 1.0)
        val sin = t * cos
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cos * aip - sin * aiq
          a(i)(q) = sin * aip + cos * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = cos * api - sin * aqi
          a(q)(i) = sin * api + cos * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cos * vip - sin * viq
          v(i)(q) = sin * vip + cos * viq
        }
      }
      sweep += 1
    }
    // fail loudly rather than return a silently-unconverged factorization;
    // tolerance scales with the matrix (off is a sum of squares)
    val diagScale = math.max(1.0, (0 until d).map(i => a(i)(i) * a(i)(i)).sum)
    require(off() <= 1e-12 * diagScale,
      s"Jacobi eigensolve failed to converge in $sweep sweeps (off=${off()})")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** One component's center-and-project fold as dialect SQL — the SAME
    * expression tree in Spark and in the DuckDB oracle (model rides as
    * bit-exact `dblArray` literals; the dot product is `dsum`'s
    * sequential left fold), so projections are bit-identical
    * cross-engine and the eigensolve-fitted model can be hash-gated
    * end-to-end without replaying the eigensolve in SQL. Rows that fail
    * the dimension contract project NULL. */
  def projectionSql(d: SqlDialect, vecCol: String, model: Model,
      component: Int): String = {
    val mean = d.dblArray(model.mean.toSeq)
    val centered = d match {
      case SparkSql =>
        s"zip_with($vecCol, $mean, (x, m) -> CAST(x AS DOUBLE) - m)"
      case DuckSql =>
        s"list_transform(list_zip($vecCol, $mean), p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    }
    val dot = d.dsum(d.zipMul(centered, d.dblArray(model.components(component).toSeq)))
    s"CASE WHEN $vecCol IS NOT NULL AND ${d.len(vecCol)} = ${model.dim} THEN $dot END"
  }

  /** Append projection columns `<prefix>0 .. <prefix>{k-1}` — each the
    * dot product of the CENTERED vector with one component, as a pure
    * projection (no join, no shuffle; the model rides the generated
    * expression as literals, the J2 pattern). The fold is sequential in
    * dimension order, so projections are bit-stable under any
    * partitioning. */
  def project(df: DataFrame, vecCol: String, model: Model,
      prefix: String = "pc"): DataFrame =
    model.components.indices.foldLeft(df) { (acc, i) =>
      acc.withColumn(s"$prefix$i",
        expr(projectionSql(SparkSql, vecCol, model, i)))
    }
}
