package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** PageRank contract: integer rank units make the result bit-exact
  * under any partitioning; the arithmetic tracks the closed-form /
  * float simulation within floor-loss bounds; duplicate edges collapse;
  * dangling mass redistributes; mass is conserved up to deterministic
  * floor loss. */
class PageRankSpec extends AnyFunSuite with SparkTestBase {

  private val Scale = 1000000000000000L

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is stationary at 1/2 each") {
    val r = ranksOf(PageRank.run(edges((1L, 2L), (2L, 1L)), "src", "dst", 8))
    assert(r.keySet === Set(1L, 2L))
    // exact stationarity modulo ≤ a few units of floor loss per step
    r.values.foreach(v => assert(math.abs(v - Scale / 2) <= 20L))
  }

  test("star graph concentrates rank on the hub; hub mass returns via dangling") {
    // 1,2,3 → 0; node 0 dangling. Float simulation with the same
    // structure is the semantic reference (integer result within
    // iterations × ~1 unit per term of it).
    val k = 6
    val r = ranksOf(PageRank.run(edges((1L, 0L), (2L, 0L), (3L, 0L)), "src", "dst", k))
    var f = Map(0L -> 0.25, 1L -> 0.25, 2L -> 0.25, 3L -> 0.25)
    (0 until k).foreach { _ =>
      val dang = f(0L)
      val base = 0.15 / 4 + 0.85 * dang / 4
      f = Map(
        0L -> (base + 0.85 * (f(1L) + f(2L) + f(3L))),
        1L -> base, 2L -> base, 3L -> base)
    }
    f.foreach { case (node, expect) =>
      assert(math.abs(r(node) / Scale.toDouble - expect) < 1e-9,
        s"node $node: ${r(node) / Scale.toDouble} vs $expect")
    }
    assert(r(0L) > r(1L) * 2)
  }

  test("bit-exact under repartitioning (integer units, no float order)") {
    val e = edges((1L to 40L).flatMap(i => Seq((i, i % 7), (i, (i * 3) % 11))): _*)
    val a = ranksOf(PageRank.run(e.repartition(1), "src", "dst", 5))
    val b = ranksOf(PageRank.run(e.repartition(13), "src", "dst", 5))
    assert(a === b)
  }

  test("duplicate edges collapse to one link") {
    val once = ranksOf(PageRank.run(edges((1L, 2L), (2L, 3L), (3L, 1L)), "src", "dst", 4))
    val dup = ranksOf(PageRank.run(
      edges((1L, 2L), (1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L)), "src", "dst", 4))
    assert(once === dup)
  }

  test("mass is conserved up to deterministic floor loss") {
    val e = edges((1L to 30L).map(i => (i, (i * 5) % 13)): _*)
    val r = PageRank.run(e, "src", "dst", 6)
    val total = r.agg(org.apache.spark.sql.functions.sum("rank_units"))
      .head().getLong(0)
    // every term floors: loss < (#nodes × 3 terms) units per iteration
    assert(total <= Scale)
    assert(total > Scale - 6L * 40L * 3L)
    r.collect().foreach(row => assert(row.getLong(1) > 0L))
  }

  test("empty and degenerate inputs are rejected") {
    intercept[IllegalArgumentException] {
      PageRank.run(edges(), "src", "dst", 3).collect()
    }
    intercept[IllegalArgumentException] {
      PageRank.run(edges((1L, 2L)), "src", "dst", 0)
    }
  }
}
