package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.pipeline.{DiabetesPipeline, RunContext}

/** Unit + property tests for the silver feature engineering (bucketizers,
  * risk score, quality score) — SURVEY.md §5 plan items 3 and 4.
  * Properties use scalacheck generators over a single generated DataFrame
  * (per-sample Spark jobs would be pathologically slow). */
class BucketizerSpec extends AnyFunSuite with SparkTestBase {

  private def silverOf(rows: Seq[(Int, Int, Int, Int, Int, Double, Double, Int, Int)]) = {
    import spark.implicits._
    DiabetesPipeline.silver(
      rows.toDF("Pregnancies", "Glucose", "BloodPressure", "SkinThickness",
        "Insulin", "BMI", "DiabetesPedigreeFunction", "Age", "Outcome"),
      RunContext.golden)
  }

  // Reference bucketizer semantics re-stated independently (the test's
  // own mirror of diabetes_etl_pipeline.py:187-224).
  private def expectedAgeGroup(age: Int): String =
    if (age < 30) "Young (< 30)" else if (age < 40) "Adult (30-39)"
    else if (age < 50) "Middle Age (40-49)" else if (age < 60) "Mature (50-59)"
    else "Senior (60+)"

  test("age_group boundaries (29/30, 39/40, 49/50, 59/60)") {
    val rows = Seq(29, 30, 39, 40, 49, 50, 59, 60).map(a =>
      (1, 100, 70, 20, 80, 25.0, 0.5, a, 0))
    val got = silverOf(rows).select("Age", "age_group").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    got.foreach { case (age, g) => assert(g === expectedAgeGroup(age), s"age $age") }
  }

  test("bmi_category boundaries (18.5 / 25 / 30)") {
    val rows = Seq(18.4, 18.5, 24.9, 25.0, 29.9, 30.0).map(b =>
      (1, 100, 70, 20, 80, b, 0.5, 30, 0))
    val got = silverOf(rows).select("BMI", "bmi_category").collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got(18.4) === "Underweight" && got(18.5) === "Normal")
    assert(got(24.9) === "Normal" && got(25.0) === "Overweight")
    assert(got(29.9) === "Overweight" && got(30.0) === "Obese")
  }

  test("properties over generated patients: totality, score range, consistency") {
    val genRow = for {
      preg <- Gen.chooseNum(0, 17)
      glucose <- Gen.chooseNum(0, 250)
      bp <- Gen.chooseNum(0, 180)
      skin <- Gen.chooseNum(0, 99)
      insulin <- Gen.chooseNum(0, 900)
      bmi <- Gen.chooseNum(0.0, 70.0)
      dpf <- Gen.chooseNum(0.05, 2.5)
      age <- Gen.chooseNum(1, 119)
      outcome <- Gen.oneOf(0, 1)
    } yield (preg, glucose, bp, skin, insulin,
      math.rint(bmi * 10) / 10, math.rint(dpf * 1000) / 1000, age, outcome)
    val rows = Gen.listOfN(300, genRow).sample.get
    val out = silverOf(rows).collect()
    assert(out.length === rows.length) // silver never drops rows

    val ageGroups = Set("Young (< 30)", "Adult (30-39)", "Middle Age (40-49)",
      "Mature (50-59)", "Senior (60+)")
    val bmiCats = Set("Underweight", "Normal", "Overweight", "Obese")
    val riskLevels = Set("Low", "Medium", "High")
    out.foreach { r: Row =>
      assert(ageGroups.contains(r.getAs[String]("age_group")))     // totality
      assert(bmiCats.contains(r.getAs[String]("bmi_category")))
      assert(riskLevels.contains(r.getAs[String]("risk_level")))
      val q = r.getAs[Int]("data_quality_score")
      assert(q % 20 === 0 && q >= 0 && q <= 100)                   // score lattice
      val score = r.getAs[Double]("risk_score")
      val lvl = r.getAs[String]("risk_level")                      // consistency
      assert(if (score < 0.4) lvl == "Low" else if (score < 0.6) lvl == "Medium" else lvl == "High")
      assert(r.getAs[String]("age_group") === expectedAgeGroup(r.getAs[Int]("Age")))
    }
  }

  test("imputation-order quirk: flags false even when zeros were imputed") {
    val rows = Seq((1, 0, 0, 0, 0, 0.0, 0.5, 30, 0), (2, 150, 80, 30, 90, 31.0, 0.4, 44, 1))
    val out = silverOf(rows)
    Seq("glucose_imputed", "bp_imputed", "skin_imputed", "insulin_imputed", "bmi_imputed")
      .foreach(f => assert(out.filter(org.apache.spark.sql.functions.col(f)).count() === 0, f))
    assert(out.filter("data_quality_score != 100").count() === 0)
  }
}
