package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.HeavyHittersAgg

/** The two regimes of the Misra-Gries aggregate: EXACT (distinct terms
  * per group <= k — no eviction, weights are true counts, deterministic
  * under any partitioning; what q105's oracle compares) and SKETCH
  * (distinct > k — every term with true frequency > n/(k+1) present,
  * every weight a lower bound undercounting by at most n/(k+1),
  * regardless of partitioning/merge order). Plus the serialization
  * roundtrip the multi-partition merge path depends on. */
class HeavyHittersSpec extends AnyFunSuite with SparkTestBase {

  private def hh(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] =
    df.agg(expr(s"heavy_hitters(term, $k)").as("hh"))
      .selectExpr("inline(hh)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("exact regime: weights equal true counts under any partitioning") {
    import spark.implicits._
    val data = (1 to 997).map(i => s"t${i % 7}") // 7 distinct terms
    for (parts <- Seq(1, 4, 13)) {
      val df = data.toDF("term").repartition(parts)
      val want = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      assert(hh(df, 16) === want, s"parts=$parts")
    }
  }

  test("sketch regime: guaranteed presence and bounded undercount") {
    import spark.implicits._
    // one term with a 30% share, 200 singleton stragglers
    val n = 1000
    val data = Seq.fill(300)("hot") ++
      (1 to 500).map(i => s"warm${i % 5}") ++ // 5 terms at 10% each
      (1 to 200).map(i => s"cold$i")
    assert(data.size === n)
    val k = 8
    val trueCounts = data.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    for (parts <- Seq(1, 4, 13)) {
      val got = hh(data.toDF("term").repartition(parts), k)
      assert(got.size <= k)
      // presence: every term with true frequency > n/(k+1) must survive
      val threshold = n.toDouble / (k + 1)
      trueCounts.filter(_._2 > threshold).keys.foreach { t =>
        assert(got.contains(t), s"parts=$parts: $t (freq ${trueCounts(t)}) missing")
      }
      // bound: every reported weight is a lower bound within n/(k+1)
      got.foreach { case (t, w) =>
        assert(w <= trueCounts(t), s"parts=$parts: $t overcounted")
        assert(trueCounts(t) - w <= threshold, s"parts=$parts: $t undercounted past n/(k+1)")
      }
    }
  }

  test("NULL terms are ignored; empty input yields an empty array") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("term")
    assert(hh(df, 4) === Map("a" -> 2L))
    assert(hh(Seq.empty[String].toDF("term"), 4) === Map.empty)
  }

  test("output is sorted by (weight DESC, term) — a deterministic surface") {
    import spark.implicits._
    val df = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(5)("z")).toDF("term")
    val rows = df.agg(expr("heavy_hitters(term, 8)").as("hh"))
      .selectExpr("inline(hh)").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("z", 5L), ("a", 3L), ("b", 3L)))
  }

  test("serialize/deserialize roundtrip preserves the buffer") {
    val agg = HeavyHittersAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal(4))
    val buf = scala.collection.mutable.HashMap("a" -> 3L, "b" -> 1L, "zz" -> 7L)
    assert(agg.deserialize(agg.serialize(buf)) === buf)
  }

  test("k contract: rejects non-foldable, non-positive, and wrong-typed k") {
    import spark.implicits._
    val df = Seq("a").toDF("term")
    intercept[Exception](df.agg(expr("heavy_hitters(term, 0)")).collect())
    intercept[Exception](df.agg(expr("heavy_hitters(term, 'x')")).collect())
  }
}
