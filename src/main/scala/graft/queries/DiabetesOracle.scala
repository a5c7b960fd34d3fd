package graft.queries

/** DuckDB oracle SQL for the medallion pipeline queries: an independent
  * re-computation of bronze→silver→gold (diabetes_etl_pipeline.py:46-672)
  * as one WITH-chain over `read_csv` of the reference's shipped shards.
  *
  * Determinism contract with the Spark side (QuerySpec.scala rules):
  *  - the frozen RunContext literals are mirrored verbatim;
  *  - `source_file` is 'file:' || filename (Spark `_metadata.file_path`
  *    renders local paths as `file:/abs/path`, verified empirically);
  *  - Spark `percentile_approx` ≡ DuckDB `quantile_disc` on this corpus
  *    (verified: 117 / 72 / 29 / 125 / 32.3);
  *  - integer-typed aggregates are pinned to BIGINT (DuckDB SUM is
  *    HUGEINT);
  *  - doubles compared raw rely on both engines evaluating the same
  *    left-associated IEEE expression; where an aggregate's binary result
  *    is algorithm-dependent (corr), the parity query rounds both sides.
  */
object DiabetesOracle {

  val ts = "TIMESTAMP '2026-01-01 00:00:00'"
  val dt = "DATE '2026-01-01'"
  val runId = "'00000000-0000-4000-8000-000000000042'"

  private def D(x: String) = s"CAST($x AS DOUBLE)"

  /** Mirror of DiabetesPipeline.davg: exact decimal sum, one division. */
  private def davg(c: String) =
    s"CAST(sum(CAST($c AS DECIMAL(27,12))) AS DOUBLE) / count($c)"

  /** bronze → silver as chained CTEs; every oracle query appends to this. */
  val silverChain: String = s"""
    WITH bronze AS (
      SELECT Pregnancies, Glucose, BloodPressure, SkinThickness, Insulin, BMI,
             DiabetesPedigreeFunction, Age, Outcome,
             $ts AS ingestion_timestamp,
             concat('file:', filename) AS source_file,
             $dt AS ingestion_date,
             regexp_extract(filename, '([^/]+)\\.csv$$', 1) AS file_name
      FROM read_csv('/root/reference/data/diabetes_part_*.csv', header=true, filename=true,
           columns={'Pregnancies':'INTEGER','Glucose':'INTEGER','BloodPressure':'INTEGER',
                    'SkinThickness':'INTEGER','Insulin':'INTEGER','BMI':'DOUBLE',
                    'DiabetesPedigreeFunction':'DOUBLE','Age':'INTEGER','Outcome':'INTEGER'})
    ),
    med AS (
      SELECT quantile_disc(CASE WHEN Glucose > 0 THEN Glucose END, 0.5) AS g_med,
             quantile_disc(CASE WHEN BloodPressure > 0 THEN BloodPressure END, 0.5) AS bp_med,
             quantile_disc(CASE WHEN SkinThickness > 0 THEN SkinThickness END, 0.5) AS sk_med,
             quantile_disc(CASE WHEN Insulin > 0 THEN Insulin END, 0.5) AS ins_med,
             quantile_disc(CASE WHEN BMI > 0 THEN BMI END, 0.5) AS bmi_med
      FROM bronze
    ),
    imp AS ( -- imputation first ...
      SELECT b.Pregnancies,
             CASE WHEN b.Glucose = 0 THEN m.g_med ELSE b.Glucose END AS Glucose,
             CASE WHEN b.BloodPressure = 0 THEN m.bp_med ELSE b.BloodPressure END AS BloodPressure,
             CASE WHEN b.SkinThickness = 0 THEN m.sk_med ELSE b.SkinThickness END AS SkinThickness,
             CASE WHEN b.Insulin = 0 THEN m.ins_med ELSE b.Insulin END AS Insulin,
             CASE WHEN b.BMI = 0 THEN m.bmi_med ELSE b.BMI END AS BMI,
             b.DiabetesPedigreeFunction, b.Age, b.Outcome,
             b.ingestion_timestamp, b.source_file, b.ingestion_date, b.file_name
      FROM bronze b CROSS JOIN med m
    ),
    flagged AS ( -- ... flags test the ALREADY-imputed columns (quirk §2.10.1)
      SELECT *,
             Glucose = 0 AS glucose_imputed,
             BloodPressure = 0 AS bp_imputed,
             SkinThickness = 0 AS skin_imputed,
             Insulin = 0 AS insulin_imputed,
             BMI = 0 AS bmi_imputed,
             $ts AS transformation_timestamp
      FROM imp
    ),
    feat AS (
      SELECT *,
             CASE WHEN Age < 30 THEN 'Young (< 30)'
                  WHEN Age < 40 THEN 'Adult (30-39)'
                  WHEN Age < 50 THEN 'Middle Age (40-49)'
                  WHEN Age < 60 THEN 'Mature (50-59)'
                  ELSE 'Senior (60+)' END AS age_group,
             CASE WHEN BMI < 18.5 THEN 'Underweight'
                  WHEN BMI < 25 THEN 'Normal'
                  WHEN BMI < 30 THEN 'Overweight'
                  ELSE 'Obese' END AS bmi_category,
             CASE WHEN Glucose < 100 THEN 'Normal'
                  WHEN Glucose < 126 THEN 'Prediabetic'
                  ELSE 'Diabetic Range' END AS glucose_level,
             CASE WHEN BloodPressure < 80 THEN 'Normal'
                  WHEN BloodPressure < 90 THEN 'High Normal'
                  WHEN BloodPressure < 100 THEN 'Mild Hypertension'
                  ELSE 'Hypertension' END AS bp_category,
             CASE WHEN Pregnancies = 0 THEN 'No Pregnancies'
                  WHEN Pregnancies <= 2 THEN 'Low Risk'
                  WHEN Pregnancies <= 5 THEN 'Moderate Risk'
                  ELSE 'High Risk' END AS pregnancy_risk,
             (${D("Glucose")} / ${D("200.0")}) * ${D("0.25")} +
             (${D("BMI")} / ${D("50.0")}) * ${D("0.20")} +
             (${D("Age")} / ${D("100.0")}) * ${D("0.15")} +
             (${D("Pregnancies")} / ${D("20.0")}) * ${D("0.10")} +
             (${D("BloodPressure")} / ${D("200.0")}) * ${D("0.10")} +
             (DiabetesPedigreeFunction / ${D("2.5")}) * ${D("0.10")} +
             (${D("Insulin")} / ${D("1000.0")}) * ${D("0.05")} +
             (${D("SkinThickness")} / ${D("100.0")}) * ${D("0.05")} AS risk_score
      FROM flagged
    ),
    silver AS (
      SELECT *,
             CASE WHEN risk_score < 0.4 THEN 'Low'
                  WHEN risk_score < 0.6 THEN 'Medium'
                  ELSE 'High' END AS risk_level,
             CAST((CASE WHEN glucose_imputed THEN 0 ELSE 20 END +
                   CASE WHEN bp_imputed THEN 0 ELSE 20 END +
                   CASE WHEN skin_imputed THEN 0 ELSE 20 END +
                   CASE WHEN insulin_imputed THEN 0 ELSE 20 END +
                   CASE WHEN bmi_imputed THEN 0 ELSE 20 END) AS INTEGER) AS data_quality_score
      FROM feat
    )"""

  private def pct(num: String, den: String) =
    s"round((${D(num)} / ${D(den)}) * 100, 2)"

  /** Gold CTEs (each gold oracle appends its own to silverChain). */
  val demographicsCte: String = s"""
    demo0 AS (
      SELECT age_group, bmi_category, pregnancy_risk,
             count(*) AS patient_count,
             CAST(sum(CAST(Outcome AS INTEGER)) AS BIGINT) AS diabetes_cases,
             round(avg(Age), 2) AS avg_age,
             round(${davg("BMI")}, 2) AS avg_bmi,
             round(avg(Glucose), 2) AS avg_glucose,
             round(avg(BloodPressure), 2) AS avg_blood_pressure,
             round(${davg("risk_score")}, 3) AS avg_risk_score,
             round(avg(data_quality_score), 2) AS avg_data_quality,
             min(Age) AS min_age, max(Age) AS max_age
      FROM silver GROUP BY age_group, bmi_category, pregnancy_risk
    ),
    diabetes_demographics_summary AS (
      SELECT *, ${pct("diabetes_cases", "patient_count")} AS diabetes_rate,
             $ts AS created_at
      FROM demo0
    )"""

  val riskCte: String = s"""
    risk0 AS (
      SELECT risk_level, glucose_level, bp_category,
             count(*) AS patient_count,
             CAST(sum(CAST(Outcome AS INTEGER)) AS BIGINT) AS diabetes_cases,
             round(${davg("risk_score")}, 3) AS avg_risk_score,
             round(stddev_samp(risk_score), 3) AS stddev_risk_score,
             round(${davg("DiabetesPedigreeFunction")}, 3) AS avg_pedigree_function,
             round(avg(Insulin), 2) AS avg_insulin,
             round(avg(SkinThickness), 2) AS avg_skin_thickness,
             CAST(count(DISTINCT age_group) AS BIGINT) AS age_groups_represented,
             round(avg(data_quality_score), 2) AS avg_data_quality
      FROM silver GROUP BY risk_level, glucose_level, bp_category
    ),
    diabetes_risk_analysis AS (
      SELECT *, ${pct("diabetes_cases", "patient_count")} AS diabetes_rate,
             concat(printf('%.3f', avg_risk_score - coalesce(stddev_risk_score, 0.0)),
                    ' - ',
                    printf('%.3f', avg_risk_score + coalesce(stddev_risk_score, 0.0))) AS risk_score_range,
             $ts AS created_at
      FROM risk0
    )"""

  val executiveCte: String = s"""
    exec0 AS (
      SELECT count(*) AS total_patients,
             CAST(sum(CASE WHEN Outcome = 1 THEN 1 ELSE 0 END) AS BIGINT) AS diabetes_cases,
             CAST(sum(CASE WHEN risk_level = 'High' THEN 1 ELSE 0 END) AS BIGINT) AS high_risk_patients,
             round(avg(Age), 1) AS avg_age,
             round(${davg("risk_score")}, 3) AS avg_risk_score,
             round(avg(data_quality_score), 1) AS data_quality_score
      FROM silver
    ),
    diabetes_executive_summary AS (
      SELECT 'summary' AS summary_type,
             ${D("total_patients")} AS total_patients,
             ${D("diabetes_cases")} AS diabetes_cases,
             ${pct("diabetes_cases", "total_patients")} AS diabetes_percentage,
             ${D("high_risk_patients")} AS high_risk_patients,
             ${pct("high_risk_patients", "total_patients")} AS high_risk_percentage,
             avg_age, avg_risk_score, data_quality_score,
             $dt AS summary_date, $ts AS created_at
      FROM exec0
    )"""

  val qualityCte: String = s"""
    qual0 AS (
      SELECT $dt AS processing_date, source_file,
             count(*) AS total_records,
             CAST(sum(CASE WHEN glucose_imputed THEN 1 ELSE 0 END) AS BIGINT) AS glucose_imputed_count,
             CAST(sum(CASE WHEN bp_imputed THEN 1 ELSE 0 END) AS BIGINT) AS bp_imputed_count,
             CAST(sum(CASE WHEN skin_imputed THEN 1 ELSE 0 END) AS BIGINT) AS skin_imputed_count,
             CAST(sum(CASE WHEN insulin_imputed THEN 1 ELSE 0 END) AS BIGINT) AS insulin_imputed_count,
             CAST(sum(CASE WHEN bmi_imputed THEN 1 ELSE 0 END) AS BIGINT) AS bmi_imputed_count,
             round(avg(data_quality_score), 2) AS avg_data_quality_score,
             min(data_quality_score) AS min_data_quality_score,
             max(data_quality_score) AS max_data_quality_score
      FROM silver GROUP BY source_file
    ),
    diabetes_data_quality_metrics AS (
      SELECT *,
             CAST(glucose_imputed_count + bp_imputed_count + skin_imputed_count +
                  insulin_imputed_count + bmi_imputed_count AS INTEGER) AS total_imputed_fields,
             round((${D("glucose_imputed_count + bp_imputed_count + skin_imputed_count + insulin_imputed_count + bmi_imputed_count")} /
                    (${D("total_records")} * 5)) * 100, 2) AS imputation_rate,
             $ts AS created_at
      FROM qual0
    )"""

  val refreshLogCte: String = s"""
    refresh0 AS (
      SELECT count(*) AS total_records_processed,
             CAST(count(DISTINCT source_file) AS BIGINT) AS files_processed,
             max(ingestion_timestamp) AS latest_ingestion,
             max(transformation_timestamp) AS latest_transformation,
             round(avg(data_quality_score), 2) AS overall_data_quality
      FROM silver
    ),
    dashboard_refresh_log AS (
      SELECT *, $runId AS pipeline_run_id,
             $ts AS pipeline_completion_time,
             'COMPLETED' AS status,
             $ts AS next_dashboard_refresh_due,
             CASE WHEN overall_data_quality < 80 THEN 'HIGH'
                  WHEN total_records_processed > 1000 THEN 'HIGH'
                  ELSE 'NORMAL' END AS refresh_priority
      FROM refresh0
    )"""

  val healthCte: String = s"""
    health0 AS (
      SELECT strftime(ingestion_timestamp, '%Y-%m-%d %H') AS processing_hour, file_name,
             count(*) AS records_processed,
             CAST(count(DISTINCT source_file) AS BIGINT) AS unique_files,
             min(ingestion_timestamp) AS first_record_time,
             max(ingestion_timestamp) AS last_record_time
      FROM bronze GROUP BY 1, 2
    ),
    health AS (
      SELECT *,
             (epoch(last_record_time) - epoch(first_record_time)) / ${D("60.0")} AS processing_duration_minutes,
             CASE WHEN (epoch(last_record_time) - epoch(first_record_time)) / ${D("60.0")} > 0
                  THEN round(${D("records_processed")} / ((epoch(last_record_time) - epoch(first_record_time)) / ${D("60.0")}), 2)
                  ELSE ${D("records_processed")} END AS records_per_minute,
             $ts AS created_at
      FROM health0
    ),
    pipeline_health_metrics AS (
      SELECT *, CASE WHEN records_processed = 0 THEN 'ERROR'
                     WHEN records_per_minute < 10 THEN 'SLOW'
                     ELSE 'HEALTHY' END AS health_status
      FROM health
    )"""

  val correlationCte: String = s"""
    corr0 AS (
      SELECT age_group, bmi_category,
             count(*) AS sample_size,
             corr(Glucose, BMI) AS glucose_bmi_corr,
             corr(Age, Pregnancies) AS age_pregnancies_corr,
             corr(BloodPressure, BMI) AS bp_bmi_corr,
             corr(Insulin, Glucose) AS insulin_glucose_corr,
             round(avg(Outcome), 3) AS diabetes_prevalence
      FROM silver GROUP BY age_group, bmi_category
    ),
    diabetes_feature_correlation AS (
      SELECT *,
             CASE WHEN abs(glucose_bmi_corr) > 0.7 THEN 'Strong'
                  WHEN abs(glucose_bmi_corr) > 0.4 THEN 'Moderate'
                  ELSE 'Weak' END AS correlation_strength,
             $ts AS created_at
      FROM corr0
    )"""

  val validationCte: String = s"""
    val0 AS (
      SELECT count(*) AS total_records,
             CAST(sum(CASE WHEN Age > 0 AND Age < 120 THEN 1 ELSE 0 END) AS BIGINT) AS valid_age_count,
             CAST(sum(CASE WHEN Outcome IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS valid_outcome_count,
             CAST(sum(CASE WHEN Pregnancies >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS valid_pregnancies_count,
             CAST(sum(CASE WHEN Glucose > 0 THEN 1 ELSE 0 END) AS BIGINT) AS valid_glucose_count,
             CAST(sum(CASE WHEN BMI > 0 THEN 1 ELSE 0 END) AS BIGINT) AS valid_bmi_count
      FROM silver
    ),
    val1 AS (
      SELECT *,
             ${pct("valid_age_count", "total_records")} AS age_validity_rate,
             ${pct("valid_outcome_count", "total_records")} AS outcome_validity_rate,
             ${pct("valid_pregnancies_count", "total_records")} AS pregnancies_validity_rate,
             ${pct("valid_glucose_count", "total_records")} AS glucose_validity_rate,
             ${pct("valid_bmi_count", "total_records")} AS bmi_validity_rate
      FROM val0
    ),
    data_validation_summary AS (
      SELECT *,
             round((age_validity_rate + outcome_validity_rate + pregnancies_validity_rate +
                    glucose_validity_rate + bmi_validity_rate) / 5, 2) AS overall_data_quality,
             $ts AS validation_timestamp, $dt AS validation_date
      FROM val1
    )"""
}
