package graft.pipeline

/** The 6 dashboard datasets from
  * `/root/reference/reports/Diabetes-Dashboard.lvdash.json:3-135`, verbatim
  * except: the 3-part Unity-Catalog prefixes (`dbw_capstone_etl_…​.default.`
  * and the stale `diabetes_catalog.diabetes_schema.` in dataset 3 — a
  * reference bug that happens to hit a same-shaped table, SURVEY.md §3.3)
  * are stripped so the queries resolve against the pipeline's registered
  * temp views. Run each with `spark.sql` after [[DiabetesPipeline]] ran.
  */
object Dashboard {

  /** 1. Executive KPI Cards — lvdash.json:6-21 (8-way UNION ALL). */
  val kpiCards: String = """
    SELECT 'Total Patients'        AS metric_name, total_patients        AS metric_value FROM diabetes_executive_summary
    UNION ALL SELECT 'Diabetes Cases',        diabetes_cases       FROM diabetes_executive_summary
    UNION ALL SELECT 'Diabetes Percentage',   diabetes_percentage  FROM diabetes_executive_summary
    UNION ALL SELECT 'High Risk Patients',    high_risk_patients   FROM diabetes_executive_summary
    UNION ALL SELECT 'High Risk Percentage',  high_risk_percentage FROM diabetes_executive_summary
    UNION ALL SELECT 'Average Age',           avg_age              FROM diabetes_executive_summary
    UNION ALL SELECT 'Average Risk Score',    avg_risk_score       FROM diabetes_executive_summary
    UNION ALL SELECT 'Data Quality Score',    data_quality_score   FROM diabetes_executive_summary"""

  /** 2. Diabetes Rate by Age Group — lvdash.json:28-47. */
  val rateByAgeGroup: String = """
    SELECT
        age_group,
        SUM(patient_count) as total_patients,
        SUM(diabetes_cases) as diabetes_cases,
        ROUND(AVG(diabetes_rate), 1) as diabetes_rate,
        ROUND(AVG(avg_risk_score), 3) as avg_risk_score
    FROM diabetes_demographics_summary
    GROUP BY age_group
    ORDER BY
        CASE age_group
            WHEN 'Young (< 30)' THEN 1
            WHEN 'Adult (30-39)' THEN 2
            WHEN 'Middle Age (40-49)' THEN 3
            WHEN 'Mature (50-59)' THEN 4
            WHEN 'Senior (60+)' THEN 5
        END"""

  /** 3. BMI Category Distribution — lvdash.json:49-69 (scalar subquery). */
  val bmiDistribution: String = """
    SELECT
        bmi_category,
        SUM(patient_count) as total_patients,
        SUM(diabetes_cases) as diabetes_cases,
        ROUND((SUM(diabetes_cases) * 100.0 / SUM(patient_count)), 1) as diabetes_rate,
        ROUND((SUM(patient_count) * 100.0 / (SELECT SUM(patient_count) FROM diabetes_demographics_summary)), 1) as population_percentage
    FROM diabetes_demographics_summary
    GROUP BY bmi_category
    ORDER BY
        CASE bmi_category
            WHEN 'Underweight' THEN 1
            WHEN 'Normal' THEN 2
            WHEN 'Overweight' THEN 3
            WHEN 'Obese' THEN 4
        END"""

  /** 4. Risk Level Analysis Matrix — lvdash.json:70-87 (HAVING). The
    * reference's ORDER BY is not total (ties across bp_category); callers
    * append bp_category for a deterministic comparison order. */
  val riskMatrix: String = """
    SELECT
        risk_level,
        glucose_level,
        bp_category,
        SUM(patient_count) as patients,
        ROUND(AVG(diabetes_rate), 1) as avg_diabetes_rate,
        ROUND(AVG(avg_risk_score), 3) as avg_risk_score
    FROM diabetes_risk_analysis
    GROUP BY risk_level, glucose_level, bp_category
    HAVING SUM(patient_count) > 0
    ORDER BY
        CASE risk_level WHEN 'Low' THEN 1 WHEN 'Medium' THEN 2 WHEN 'High' THEN 3 END,
        CASE glucose_level WHEN 'Normal' THEN 1 WHEN 'Prediabetic' THEN 2 WHEN 'Diabetic Range' THEN 3 END,
        bp_category"""

  /** 5. Pregnancy Risk vs Diabetes Outcomes — lvdash.json:88-100. */
  val pregnancyOutcomes: String = """
    SELECT
        SUM(patient_count) as total_patients,
        SUM(diabetes_cases) as diabetes_cases,
        ROUND(AVG(diabetes_rate), 1) as diabetes_rate,
        ROUND(AVG(avg_risk_score), 3) as risk_score
    FROM diabetes_risk_analysis"""

  /** 6. Comprehensive Risk Score Distribution — lvdash.json:101-135
    * (CTE + GROUP BY CASE + SUM() OVER ()). */
  val riskDistribution: String = """
    WITH risk_distribution AS (
      SELECT
        CASE
          WHEN avg_risk_score < 0.3 THEN '0.0-0.3 (Very Low)'
          WHEN avg_risk_score < 0.4 THEN '0.3-0.4 (Low)'
          WHEN avg_risk_score < 0.5 THEN '0.4-0.5 (Moderate)'
          WHEN avg_risk_score < 0.6 THEN '0.5-0.6 (High)'
          ELSE '0.6+ (Very High)'
        END as risk_range,
        SUM(patient_count) as patient_count,
        ROUND(AVG(diabetes_rate), 1) as avg_diabetes_rate
      FROM diabetes_demographics_summary
      GROUP BY
        CASE
          WHEN avg_risk_score < 0.3 THEN '0.0-0.3 (Very Low)'
          WHEN avg_risk_score < 0.4 THEN '0.3-0.4 (Low)'
          WHEN avg_risk_score < 0.5 THEN '0.4-0.5 (Moderate)'
          WHEN avg_risk_score < 0.6 THEN '0.5-0.6 (High)'
          ELSE '0.6+ (Very High)'
        END
    )
    SELECT
      risk_range,
      patient_count,
      avg_diabetes_rate,
      ROUND((patient_count * 100.0 / SUM(patient_count) OVER()), 1) as population_percentage
    FROM risk_distribution
    ORDER BY risk_range"""

  val all: Map[String, String] = Map(
    "kpi_cards" -> kpiCards,
    "rate_by_age_group" -> rateByAgeGroup,
    "bmi_distribution" -> bmiDistribution,
    "risk_matrix" -> riskMatrix,
    "pregnancy_outcomes" -> pregnancyOutcomes,
    "risk_distribution" -> riskDistribution)
}
