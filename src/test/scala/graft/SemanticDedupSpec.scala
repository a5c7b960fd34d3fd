package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, KMeans, Similarity}

/** SemDeDup (q108's operator surface): cell assignment, within-cell pair
  * generation, and the one-call dedup — including the properties the
  * oracle hash can't state: exact copies are ALWAYS dropped regardless of
  * centroid quality (identical embeddings share a cell by construction),
  * the kept set is partition-invariant, trained centroids slot in
  * unchanged, and the cell-size cap turns a degenerate quantizer into
  * reduced recall instead of a quadratic blow-up. */
class SemanticDedupSpec extends AnyFunSuite with SparkTestBase {

  /** Corpus of md5-mixed pseudo-random vectors (reproducible, no rand;
    * non-copy cosines concentrate near 0) with planted exact copies:
    * id >= 1000 copies id - 1000. */
  private def corpus(n: Int, copies: Int, d: Int = 8): DataFrame = {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Float = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % 2001L - 1000L) / 1000.0f
    }
    val base = (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j => h(s"v$i#$j")))
    }
    val dup = (0 until copies).map { i => (1000L + i, base(i)._2) }
    (base ++ dup).toDF("vec_id", "embedding")
  }

  private def seeds(vectors: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    vectors.selectExpr("vec_id", "embedding", "md5_u32(CAST(vec_id AS STRING)) AS h")
      .orderBy("h", "vec_id").limit(k)
      .withColumn("cent_id",
        (row_number().over(Window.orderBy("h", "vec_id")) - 1).cast("long"))
      .select(col("cent_id"), col("embedding").as("cent_emb"))
  }

  test("exact copies land in their original's cell and are dropped; originals kept") {
    val data = corpus(120, 20)
    val kept = Similarity.semanticDedup(data, seeds(data, 11), minCosine = 0.999)
      .collect().map(_.getLong(0)).toSet
    // every planted copy gone, every original id present
    assert((1000L until 1020L).forall(!kept.contains(_)), s"copies survived: $kept")
    assert((0L until 120L).forall(kept.contains), "an original was dropped")
  }

  test("kept set is partition-invariant") {
    val data = corpus(150, 15)
    val sets = Seq(1, 3, 8).map { p =>
      Similarity.semanticDedup(data.repartition(p), seeds(data, 13), 0.999)
        .collect().map(_.getLong(0)).toSet
    }
    assert(sets.distinct.size === 1)
  }

  test("trained KMeans centroids are a drop-in quantizer with the same copy guarantee") {
    val data = corpus(120, 20).cache()
    val (cents, _) = KMeans.fit(data, "vec_id", "embedding", k = 11, maxIters = 5)
    val centTable = KMeans.centroidTable(spark, cents)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val kept = Similarity.semanticDedup(data, centTable, 0.999)
      .collect().map(_.getLong(0)).toSet
    assert((1000L until 1020L).forall(!kept.contains(_)))
    assert((0L until 120L).forall(kept.contains))
    data.unpersist()
  }

  test("maxCellSize excludes oversized cells from pairing (kept, not compared)") {
    val data = corpus(100, 10)
    // one centroid -> every vector in cell 0, size 110 > cap 50:
    // no pairs can form, so everything (copies included) is kept
    val one = seeds(data, 1)
    val assigned = Similarity.assignCells(data, one)
    assert(Similarity.semanticPairs(assigned, 0.999, maxCellSize = 50).count() === 0)
    val kept = Similarity.semanticDedup(data, one, 0.999, maxCellSize = 50)
    assert(kept.count() === 110)
    // with the cap lifted the copies are found again
    assert(Similarity.semanticDedup(data, one, 0.999).count() === 100)
  }

  test("within-cell pairs agree with a brute-force scan restricted to the same cells") {
    val data = corpus(80, 8)
    val assigned = Similarity.assignCells(data, seeds(data, 7)).cache()
    val got = Similarity.semanticPairs(assigned, 0.9)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = assigned.select("vec_id", "cell", "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).map(_.toDouble)))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = (for {
      (ia, ca, ea) <- rows; (ib, cb, eb) <- rows
      if ca == cb && ia < ib &&
        BigDecimal(cos(ea, eb)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.9
    } yield (ia, ib)).toSet
    assert(got === want)
    assigned.unpersist()
  }

  test("semanticDedup materializes the assignment ONCE: both consumers scan the checkpoint") {
    import org.apache.spark.sql.execution.LogicalRDD
    val data = corpus(100, 10)
    val kept = Similarity.semanticDedup(data, seeds(data, 9), 0.999)
    val plan = kept.queryExecution.optimizedPlan
    // The N×C broadcast argmax (min_by over the centroid cross) must not
    // appear in the returned plan at all — it ran once, eagerly, behind
    // the localCheckpoint; pairs and the final anti-join both scan it.
    assert(!plan.toString.contains("min_by"), plan.toString.take(1500))
    val rddScans = plan.collect { case r: LogicalRDD => r }
    assert(rddScans.size >= 2,
      s"expected both branches to scan the checkpointed assignment, got:\n$plan")
    // and the one-pass plan still keeps exactly the non-copies
    val ids = kept.collect().map(_.getLong(0)).toSet
    assert(ids === (0L until 100L).toSet)
  }

  test("assignment plan: no window, min_by partial aggregation (the round-5 IVF shape)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val data = corpus(50, 0)
    val df = Similarity.assignCells(data, seeds(data, 5))
    df.queryExecution.executedPlan.foreach {
      case w: WindowExec => fail("assignCells planned a Window:\n" + w)
      case _ =>
    }
    assert(df.queryExecution.sparkPlan.toString.contains("min_by"))
  }
}
