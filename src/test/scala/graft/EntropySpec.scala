package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis
import graft.queries.SparkSql

/** Closed-form checks of the entropy template: H = ln L − Σ c·ln c / L
  * over the element distribution, 6 dp, empty → 0. */
class EntropySpec extends AnyFunSuite with SparkTestBase {

  private def charEntropy(s: String): Double = {
    import spark.implicits._
    Seq(s).toDF("text").selectExpr(
      s"${TextAnalysis.entropyExpr(SparkSql, SparkSql.splitOn("text", ""))} AS h")
      .head().getDouble(0)
  }

  test("hand-computed values: uniform, degenerate, mixed, empty") {
    assert(charEntropy("abcd") === BigDecimal(math.log(4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(charEntropy("aaaa") === 0.0) // one symbol: no information
    // "aabb": ln 4 − (2·ln2 + 2·ln2)/4 = ln 2
    assert(charEntropy("aabb") === BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(charEntropy("") === 0.0)
  }

  test("word-level template agrees with a direct computation on real docs") {
    val out = Td.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(20)
      .selectExpr("text",
        s"${TextAnalysis.entropyExpr(SparkSql, SparkSql.splitSpace("text"))} AS h")
      .collect()
    out.foreach { r =>
      val toks = r.getString(0).split(" ", -1)
      val expected = math.log(toks.length.toDouble) -
        toks.groupBy(identity).values.map { g =>
          g.length.toDouble * math.log(g.length.toDouble)
        }.sum / toks.length
      assert(math.abs(r.getDouble(1) - expected) < 5e-6,
        s"template ${r.getDouble(1)} vs direct $expected")
    }
  }
}
