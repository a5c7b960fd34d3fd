package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The native codegen'd cosine_sim (GraftExtensions) must be BIT-equal to
  * the composed-builtin HOF form — q58-q60's oracle parity depends on it. */
class CosineSimilaritySpec extends AnyFunSuite with SparkTestBase {

  private lazy val e = Td.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("cosine_sim ≡ zip_with/aggregate fold, bitwise, on real embeddings") {
    val hof = """aggregate(zip_with(embedding, embedding2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
                 / (sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                  * sqrt(aggregate(zip_with(embedding2, embedding2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))"""
    val pairs = e.select(col("vec_id"), col("embedding"))
      .crossJoin(e.select(col("vec_id").as("vec_id2"), col("embedding").as("embedding2"))
        .filter(col("vec_id2") < 3))
      .filter(col("vec_id") < 50)
    val diff = pairs
      .selectExpr("cosine_sim(embedding, embedding2) AS native", s"$hof AS hof")
      .filter("native != hof OR (isnan(native) != isnan(hof))")
      .count()
    assert(diff === 0)
  }

  test("cosine_sim of a vector with itself is 1.0") {
    val bad = e.selectExpr("cosine_sim(embedding, embedding) AS c")
      .filter("abs(c - 1.0) > 1e-12").count()
    assert(bad === 0)
  }

  test("cosine_sim is null-safe") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").head()
    assert(r.isNullAt(0))
  }
}
