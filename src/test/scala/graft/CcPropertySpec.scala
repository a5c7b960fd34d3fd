package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Property check for BOTH connected-components implementations against
  * an independent driver-side union-find oracle on seeded random graphs —
  * the fixed topologies in LargeStarCcSpec/LshRecallSpec prove the known
  * hard shapes; this closes the gap for arbitrary edge mixes (dup edges,
  * self-loops, multi-component tangles).
  */
class CcPropertySpec extends AnyFunSuite with SparkTestBase {

  /** Min-id component label per node, via plain union-find. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(ra) = rb }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.map(n => n -> minOfRoot(find(n))).toMap
  }

  test("seeded random graphs: clusters and clustersLargeStar both match union-find") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      val n = 60 + rng.nextInt(140)
      val m = 1 + rng.nextInt(2 * n)
      // nextInt twice per edge: allows self-loops and duplicate edges on
      // purpose — the operators must tolerate both
      val edges = Seq.fill(m)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val expected = oracle(edges)
      val df = edges.toDF("doc_a", "doc_b")
      val viaProp = Dedup.clusters(df, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaStars = Dedup.clustersLargeStar(df, "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // all three label the same universe (every id appearing in pairs,
      // self-loop-only nodes included as their own singleton component)
      assert(viaProp === expected, s"trial $trial (n=$n m=$m): propagation")
      assert(viaStars === expected, s"trial $trial (n=$n m=$m): stars")
    }
  }

  test("NULL-endpoint pairs are ignored identically by both implementations") {
    import spark.implicits._
    val pairs = Seq((Some(1L), Some(2L)), (None, Some(5L)), (Some(7L), None))
      .toDF("doc_a", "doc_b")
    val expected = Set(1L -> 1L, 2L -> 1L) // NULL-sided rows carry no pairing info
    val viaProp = Dedup.clusters(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val viaStars = Dedup.clustersLargeStar(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(viaProp === expected)
    assert(viaStars === expected)
  }
}
