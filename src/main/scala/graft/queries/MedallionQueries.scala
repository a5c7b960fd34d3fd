package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dashboard, DiabetesPipeline}

/** Parity queries for the medallion pipeline (SURVEY.md §2.10, §3.3): each
  * runs the full quirk-faithful diabetes DAG (once per session, cached)
  * with the golden frozen clock, selects one node, and is hash-compared
  * against [[DiabetesOracle]]'s independent DuckDB recomputation of the
  * same semantics over the same CSVs.
  *
  * These queries ignore the scale-factor dir: the pipeline's corpus is the
  * reference's own 768-row dataset (fixed by FIXTURES.md §A), which is
  * what makes the golden invariants (268 cases / 34.90% / medians
  * 117-72-29-125-32.3 / quality ≡ 100) checkable.
  */
object MedallionQueries {

  private def run(s: SparkSession) = DiabetesPipeline.cachedRun(s)

  private def q(name: String, oracle: String)(fn: SparkSession => DataFrame): QuerySpec =
    QuerySpec(name, (s, _) => fn(s), Some(oracle))

  import DiabetesOracle._

  /** Base-record ordering that is total on the raw data (rows identical
    * across all 9 measures + file are identical across all 27 silver
    * columns, so any residual tie is between equal rows). */
  private val silverOrder = Seq("file_name", "Pregnancies", "Glucose", "BloodPressure",
    "SkinThickness", "Insulin", "BMI", "DiabetesPedigreeFunction", "Age", "Outcome")

  val specs: Seq[QuerySpec] = Seq(

    // ---- silver: the whole cleaned/engineered patient table -------------
    q("q30_pipeline_silver",
      s"""$silverChain
         SELECT * FROM silver ORDER BY ${silverOrder.mkString(", ")}""") { s =>
      run(s)("diabetes_silver").orderBy(silverOrder.map(col): _*)
    },

    // ---- gold tables ----------------------------------------------------
    q("q31_gold_demographics",
      s"""$silverChain, $demographicsCte
         SELECT * FROM diabetes_demographics_summary
         ORDER BY age_group, bmi_category, pregnancy_risk""") { s =>
      run(s)("diabetes_demographics_summary")
        .orderBy("age_group", "bmi_category", "pregnancy_risk")
    },

    q("q32_gold_risk_analysis",
      s"""$silverChain, $riskCte
         SELECT * FROM diabetes_risk_analysis
         ORDER BY risk_level, glucose_level, bp_category""") { s =>
      run(s)("diabetes_risk_analysis")
        .orderBy("risk_level", "glucose_level", "bp_category")
    },

    q("q33_gold_executive",
      s"""$silverChain, $executiveCte
         SELECT * FROM diabetes_executive_summary""") { s =>
      run(s)("diabetes_executive_summary")
    },

    q("q34_gold_quality_metrics",
      s"""$silverChain, $qualityCte
         SELECT * FROM diabetes_data_quality_metrics ORDER BY source_file""") { s =>
      run(s)("diabetes_data_quality_metrics").orderBy("source_file")
    },

    q("q35_gold_refresh_log",
      s"""$silverChain, $refreshLogCte
         SELECT * FROM dashboard_refresh_log""") { s =>
      run(s)("dashboard_refresh_log")
    },

    q("q36_gold_health_metrics",
      s"""$silverChain, $healthCte
         SELECT * FROM pipeline_health_metrics ORDER BY processing_hour, file_name""") { s =>
      run(s)("pipeline_health_metrics").orderBy("processing_hour", "file_name")
    },

    // corr's binary result is algorithm-dependent across engines, so the
    // parity projection rounds it to 6 dp on BOTH sides (the underlying
    // gold table keeps the raw doubles, faithful to the reference).
    q("q37_gold_feature_correlation",
      s"""$silverChain, $correlationCte
         SELECT age_group, bmi_category, sample_size,
                round(glucose_bmi_corr, 6) AS glucose_bmi_corr,
                round(age_pregnancies_corr, 6) AS age_pregnancies_corr,
                round(bp_bmi_corr, 6) AS bp_bmi_corr,
                round(insulin_glucose_corr, 6) AS insulin_glucose_corr,
                diabetes_prevalence, correlation_strength, created_at
         FROM diabetes_feature_correlation ORDER BY age_group, bmi_category""") { s =>
      run(s)("diabetes_feature_correlation")
        .select(col("age_group"), col("bmi_category"), col("sample_size"),
          round(col("glucose_bmi_corr"), 6).as("glucose_bmi_corr"),
          round(col("age_pregnancies_corr"), 6).as("age_pregnancies_corr"),
          round(col("bp_bmi_corr"), 6).as("bp_bmi_corr"),
          round(col("insulin_glucose_corr"), 6).as("insulin_glucose_corr"),
          col("diabetes_prevalence"), col("correlation_strength"), col("created_at"))
        .orderBy("age_group", "bmi_category")
    },

    q("q38_gold_validation",
      s"""$silverChain, $validationCte
         SELECT * FROM data_validation_summary""") { s =>
      run(s)("data_validation_summary")
    },

    // ---- view sink (S4) -------------------------------------------------
    q("q39_view_demographics",
      s"""$silverChain, $demographicsCte
         SELECT age_group, bmi_category, pregnancy_risk, patient_count,
                diabetes_rate, avg_risk_score, avg_age, avg_bmi, avg_glucose,
                created_at
         FROM diabetes_demographics_summary
         ORDER BY age_group, bmi_category, pregnancy_risk""") { s =>
      run(s)("v_demographics_dashboard")
        .orderBy("age_group", "bmi_category", "pregnancy_risk")
    },

    // ---- expectation metrics (P5 drop + P6 warn, as a queryable table) --
    q("q40_expectation_metrics",
      s"""$silverChain
         SELECT * FROM (
           SELECT 'diabetes_bronze' AS table_name, 'valid_file' AS expectation,
                  'drop' AS expectation_mode,
                  CAST(count(CASE WHEN file_name IS NOT NULL THEN 1 END) AS BIGINT) AS passed_count,
                  CAST(count(CASE WHEN file_name IS NULL THEN 1 END) AS BIGINT) AS failed_count
           FROM bronze
           UNION ALL
           SELECT 'diabetes_silver', 'valid_age', 'warn',
                  CAST(count(CASE WHEN Age > 0 AND Age < 120 THEN 1 END) AS BIGINT),
                  CAST(count(CASE WHEN NOT (Age > 0 AND Age < 120) THEN 1 END) AS BIGINT)
           FROM silver
           UNION ALL
           SELECT 'diabetes_silver', 'valid_outcome', 'warn',
                  CAST(count(CASE WHEN Outcome IN (0,1) THEN 1 END) AS BIGINT),
                  CAST(count(CASE WHEN NOT (Outcome IN (0,1)) THEN 1 END) AS BIGINT)
           FROM silver
           UNION ALL
           SELECT 'diabetes_silver', 'valid_pregnancies', 'warn',
                  CAST(count(CASE WHEN Pregnancies >= 0 THEN 1 END) AS BIGINT),
                  CAST(count(CASE WHEN NOT (Pregnancies >= 0) THEN 1 END) AS BIGINT)
           FROM silver
         ) ORDER BY table_name, expectation""") { s =>
      run(s).expectationMetrics(s)
        .select(col("table").as("table_name"), col("expectation"),
          col("mode").as("expectation_mode"),
          col("passedCount").as("passed_count"),
          col("failedCount").as("failed_count"))
        .orderBy("table_name", "expectation")
    },

    // ---- the 6 dashboard datasets, run VERBATIM via spark.sql -----------
    q("q41_dash_kpi_cards",
      s"""$silverChain, $executiveCte
         ${rewriteDash(Dashboard.kpiCards)} ORDER BY metric_name""") { s =>
      run(s); s.sql(Dashboard.kpiCards).orderBy("metric_name")
    },

    q("q42_dash_rate_by_age",
      s"""$silverChain, $demographicsCte
         ${rewriteDash(Dashboard.rateByAgeGroup)}""") { s =>
      run(s); s.sql(Dashboard.rateByAgeGroup)
    },

    q("q43_dash_bmi_distribution",
      s"""$silverChain, $demographicsCte
         ${rewriteDash(Dashboard.bmiDistribution)}""") { s =>
      run(s); s.sql(Dashboard.bmiDistribution)
    },

    q("q44_dash_risk_matrix",
      s"""$silverChain, $riskCte
         ${rewriteDash(Dashboard.riskMatrix)}""") { s =>
      run(s); s.sql(Dashboard.riskMatrix)
    },

    q("q45_dash_pregnancy_outcomes",
      s"""$silverChain, $riskCte
         ${rewriteDash(Dashboard.pregnancyOutcomes)}""") { s =>
      run(s); s.sql(Dashboard.pregnancyOutcomes)
    },

    q("q46_dash_risk_distribution",
      s"""$silverChain, $demographicsCte
         ${rewriteDash(Dashboard.riskDistribution)}""") { s =>
      run(s); s.sql(Dashboard.riskDistribution)
    }
  )

  /** DuckDB-side tweaks to the verbatim dashboard SQL: SUM over BIGINT
    * group counts is HUGEINT in DuckDB (poor arrow round-trip) and Spark
    * evaluates `x * 100.0 / y` in DECIMAL — mirror with explicit casts.
    * The WITH in dataset 6 must splice into the oracle's existing chain. */
  private def rewriteDash(sql: String): String = {
    sql
      .replaceAll("(?i)SUM\\((patient_count|diabetes_cases)\\)(?! OVER)", "CAST(SUM($1) AS BIGINT)")
      .replace("WITH risk_distribution AS (", ", risk_distribution AS (")
  }
}
