package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** The reference's entire 14-node medallion DAG (SURVEY.md §1.1),
  * re-expressed on [[PipelineGraph]]: 2 bronze + 1 silver + 8 gold tables
  * + 3 views, from `/root/reference/src/diabetes_etl_pipeline.py:46-672`.
  *
  * Behavioral quirks replicated bug-for-bug (SURVEY.md §2.10):
  *  - each measure column is imputed BEFORE its `*_imputed` flag is
  *    computed, so every flag is false and `data_quality_score` ≡ 100
  *    (diabetes_etl_pipeline.py:159-179);
  *  - median fallbacks 117.0/72.0/23.0/125.0/32.3 apply only when the
  *    computed median is null (empty bronze) (:123-155);
  *  - `expect_or_drop("valid_file", ...)` never drops in practice because
  *    `regexp_extract` yields "" (not NULL) on no-match (:54);
  *  - silver expectations are warn-only: violating rows stay (:109-113).
  *
  * Scale departures from the reference (semantics preserved):
  *  - the 5 median scalars come back in ONE aggregation job (5 mergeable
  *    `percentile_approx` sketches over `CASE WHEN x>0 THEN x END`, which
  *    ignores nulls exactly like the reference's `filter(x>0)` pre-agg)
  *    instead of 5 separate collect() round-trips (:123-151). At 100 TB
  *    that is 1 scan instead of 5, constant executor memory (the sketch is
  *    mergeable — never buffers raw values).
  */
object DiabetesPipeline {

  /** Explicit ingest schema — diabetes_etl_pipeline.py:26-36. */
  val diabetesSchema: StructType = StructType(Seq(
    StructField("Pregnancies", IntegerType, nullable = true),
    StructField("Glucose", IntegerType, nullable = true),
    StructField("BloodPressure", IntegerType, nullable = true),
    StructField("SkinThickness", IntegerType, nullable = true),
    StructField("Insulin", IntegerType, nullable = true),
    StructField("BMI", DoubleType, nullable = true),
    StructField("DiabetesPedigreeFunction", DoubleType, nullable = true),
    StructField("Age", IntegerType, nullable = true),
    StructField("Outcome", IntegerType, nullable = true)))

  /** Default corpus: the reference's own shipped CSV shards (read-only;
    * public Pima-Indians data). Overridable for streaming/golden tests. */
  val defaultDataDir = "/root/reference/data"

  // ---- node builders (each cites its reference definition) -------------

  /** Bronze ingest, batch flavor — diabetes_etl_pipeline.py:46-74. The
    * streaming flavor (readStream + AvailableNow) is in
    * [[StreamingBronze]]; both produce this exact schema. */
  def bronzeBatch(spark: SparkSession, dataDir: String, rc: RunContext): DataFrame =
    spark.read
      .format("csv")
      .option("header", "true")
      .option("inferSchema", "false")
      .schema(diabetesSchema)
      .load(dataDir)
      .withColumn("ingestion_timestamp", rc.now)
      .withColumn("source_file", col("_metadata.file_path"))
      .withColumn("ingestion_date", rc.today)
      .withColumn("file_name", regexp_extract(col("_metadata.file_path"), "([^/]+)\\.csv$", 1))

  /** Silver clean + feature engineering — diabetes_etl_pipeline.py:101-259. */
  def silver(bronze: DataFrame, rc: RunContext): DataFrame = {
    // One pass for all five medians (reference: five filter→agg→collect
    // jobs, :123-151). percentile_approx over CASE WHEN x>0 ignores nulls,
    // matching filter(x>0); result type follows the input column (INT for
    // the four integer measures, DOUBLE for BMI) exactly as the reference's
    // collected Python scalars do.
    val meds = bronze.select(
      expr("percentile_approx(CASE WHEN Glucose > 0 THEN Glucose END, 0.5)").as("g"),
      expr("percentile_approx(CASE WHEN BloodPressure > 0 THEN BloodPressure END, 0.5)").as("bp"),
      expr("percentile_approx(CASE WHEN SkinThickness > 0 THEN SkinThickness END, 0.5)").as("sk"),
      expr("percentile_approx(CASE WHEN Insulin > 0 THEN Insulin END, 0.5)").as("ins"),
      expr("percentile_approx(CASE WHEN BMI > 0 THEN BMI END, 0.5)").as("bmi")).head()
    // Fallback constants :123-155 (note SkinThickness fallback 23.0 differs
    // from the shipped data's computed median 29 — distinguishes the paths).
    def medOr(i: Int, fallback: Double): Any = if (meds.isNullAt(i)) fallback else meds.get(i)
    val gMed = medOr(0, 117.0); val bpMed = medOr(1, 72.0); val skMed = medOr(2, 23.0)
    val insMed = medOr(3, 125.0); val bmiMed = medOr(4, 32.3)

    // Quirk §2.10.1: impute FIRST, then flag the already-imputed column.
    val cleaned = bronze
      .withColumn("Glucose", when(col("Glucose") === 0, lit(gMed)).otherwise(col("Glucose")))
      .withColumn("glucose_imputed", when(col("Glucose") === 0, true).otherwise(false))
      .withColumn("BloodPressure", when(col("BloodPressure") === 0, lit(bpMed)).otherwise(col("BloodPressure")))
      .withColumn("bp_imputed", when(col("BloodPressure") === 0, true).otherwise(false))
      .withColumn("SkinThickness", when(col("SkinThickness") === 0, lit(skMed)).otherwise(col("SkinThickness")))
      .withColumn("skin_imputed", when(col("SkinThickness") === 0, true).otherwise(false))
      .withColumn("Insulin", when(col("Insulin") === 0, lit(insMed)).otherwise(col("Insulin")))
      .withColumn("insulin_imputed", when(col("Insulin") === 0, true).otherwise(false))
      .withColumn("BMI", when(col("BMI") === 0, lit(bmiMed)).otherwise(col("BMI")))
      .withColumn("bmi_imputed", when(col("BMI") === 0, true).otherwise(false))
      .withColumn("transformation_timestamp", rc.now)

    cleaned
      .withColumn("age_group", // :187-193
        when(col("Age") < 30, lit("Young (< 30)"))
          .when(col("Age") < 40, lit("Adult (30-39)"))
          .when(col("Age") < 50, lit("Middle Age (40-49)"))
          .when(col("Age") < 60, lit("Mature (50-59)"))
          .otherwise(lit("Senior (60+)")))
      .withColumn("bmi_category", // :196-201
        when(col("BMI") < 18.5, lit("Underweight"))
          .when(col("BMI") < 25, lit("Normal"))
          .when(col("BMI") < 30, lit("Overweight"))
          .otherwise(lit("Obese")))
      .withColumn("glucose_level", // :204-208
        when(col("Glucose") < 100, lit("Normal"))
          .when(col("Glucose") < 126, lit("Prediabetic"))
          .otherwise(lit("Diabetic Range")))
      .withColumn("bp_category", // :211-216
        when(col("BloodPressure") < 80, lit("Normal"))
          .when(col("BloodPressure") < 90, lit("High Normal"))
          .when(col("BloodPressure") < 100, lit("Mild Hypertension"))
          .otherwise(lit("Hypertension")))
      .withColumn("pregnancy_risk", // :219-224
        when(col("Pregnancies") === 0, lit("No Pregnancies"))
          .when(col("Pregnancies") <= 2, lit("Low Risk"))
          .when(col("Pregnancies") <= 5, lit("Moderate Risk"))
          .otherwise(lit("High Risk")))
      .withColumn("risk_score", // :227-238
        ((col("Glucose").cast(DoubleType) / 200.0) * 0.25 +
          (col("BMI").cast(DoubleType) / 50.0) * 0.20 +
          (col("Age").cast(DoubleType) / 100.0) * 0.15 +
          (col("Pregnancies").cast(DoubleType) / 20.0) * 0.10 +
          (col("BloodPressure").cast(DoubleType) / 200.0) * 0.10 +
          (col("DiabetesPedigreeFunction") / 2.5) * 0.10 +
          (col("Insulin").cast(DoubleType) / 1000.0) * 0.05 +
          (col("SkinThickness").cast(DoubleType) / 100.0) * 0.05).cast(DoubleType))
      .withColumn("risk_level", // :241-245
        when(col("risk_score") < 0.4, lit("Low"))
          .when(col("risk_score") < 0.6, lit("Medium"))
          .otherwise(lit("High")))
      .withColumn("data_quality_score", // :248-256 — ≡100 by quirk §2.10.1
        (when(col("glucose_imputed"), lit(0)).otherwise(lit(20)) +
          when(col("bp_imputed"), lit(0)).otherwise(lit(20)) +
          when(col("skin_imputed"), lit(0)).otherwise(lit(20)) +
          when(col("insulin_imputed"), lit(0)).otherwise(lit(20)) +
          when(col("bmi_imputed"), lit(0)).otherwise(lit(20))).cast(IntegerType))
  }

  private def rate(num: String, den: String): org.apache.spark.sql.Column =
    round((col(num).cast(DoubleType) / col(den).cast(DoubleType)) * 100, 2)

  /** Average of a DOUBLE column via an exact decimal sum, then one IEEE
    * division. Plain double avg is partition-order-sensitive, so its
    * round() ties flip nondeterministically (and across engines); the
    * decimal route is bit-stable at any partitioning, both here and in the
    * DuckDB oracle. Integer-typed averages need no hardening (Spark sums
    * them exactly as LONG). Value drift vs plain avg: < 1e-12. */
  private def davg(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast(DecimalType(27, 12))).cast(DoubleType) / count(col(c))

  /** Gold: demographics summary — diabetes_etl_pipeline.py:268-301. */
  def demographicsSummary(silver: DataFrame, rc: RunContext): DataFrame =
    silver
      .groupBy("age_group", "bmi_category", "pregnancy_risk")
      .agg(
        count(lit(1)).as("patient_count"),
        sum(col("Outcome").cast(IntegerType)).as("diabetes_cases"),
        round(avg("Age"), 2).as("avg_age"),
        round(davg("BMI"), 2).as("avg_bmi"),
        round(avg("Glucose"), 2).as("avg_glucose"),
        round(avg("BloodPressure"), 2).as("avg_blood_pressure"),
        round(davg("risk_score"), 3).as("avg_risk_score"),
        round(avg("data_quality_score"), 2).as("avg_data_quality"),
        min("Age").as("min_age"),
        max("Age").as("max_age"))
      .withColumn("diabetes_rate", rate("diabetes_cases", "patient_count"))
      .withColumn("created_at", rc.now)
      .orderBy("age_group", "bmi_category", "pregnancy_risk")

  /** Gold: risk analysis — diabetes_etl_pipeline.py:303-342. */
  def riskAnalysis(silver: DataFrame, rc: RunContext): DataFrame =
    silver
      .groupBy("risk_level", "glucose_level", "bp_category")
      .agg(
        count(lit(1)).as("patient_count"),
        sum(col("Outcome").cast(IntegerType)).as("diabetes_cases"),
        round(davg("risk_score"), 3).as("avg_risk_score"),
        round(stddev("risk_score"), 3).as("stddev_risk_score"),
        round(davg("DiabetesPedigreeFunction"), 3).as("avg_pedigree_function"),
        round(avg("Insulin"), 2).as("avg_insulin"),
        round(avg("SkinThickness"), 2).as("avg_skin_thickness"),
        countDistinct("age_group").as("age_groups_represented"),
        round(avg("data_quality_score"), 2).as("avg_data_quality"))
      .withColumn("diabetes_rate", rate("diabetes_cases", "patient_count"))
      .withColumn("risk_score_range", // :333-338
        concat(
          format_number(col("avg_risk_score") - coalesce(col("stddev_risk_score"), lit(0.0)), 3),
          lit(" - "),
          format_number(col("avg_risk_score") + coalesce(col("stddev_risk_score"), lit(0.0)), 3)))
      .withColumn("created_at", rc.now)
      .orderBy("risk_level", "glucose_level", "bp_category")

  /** Gold: executive summary (long format) — diabetes_etl_pipeline.py:344-389.
    * Uses `withColumns` (multi-map projection, SURVEY.md §2.2 P2). */
  def executiveSummary(silver: DataFrame, rc: RunContext): DataFrame =
    silver
      .agg(
        count(lit(1)).as("total_patients"),
        sum(when(col("Outcome") === 1, 1).otherwise(0)).as("diabetes_cases"),
        sum(when(col("risk_level") === "High", 1).otherwise(0)).as("high_risk_patients"),
        round(avg("Age"), 1).as("avg_age"),
        round(davg("risk_score"), 3).as("avg_risk_score"),
        round(avg("data_quality_score"), 1).as("data_quality_score"))
      .withColumns(Map(
        "diabetes_percentage" -> rate("diabetes_cases", "total_patients"),
        "high_risk_percentage" -> rate("high_risk_patients", "total_patients")))
      .select(
        lit("summary").as("summary_type"),
        col("total_patients").cast(DoubleType).as("total_patients"),
        col("diabetes_cases").cast(DoubleType).as("diabetes_cases"),
        col("diabetes_percentage"),
        col("high_risk_patients").cast(DoubleType).as("high_risk_patients"),
        col("high_risk_percentage"),
        col("avg_age"),
        col("avg_risk_score"),
        col("data_quality_score"),
        rc.today.as("summary_date"),
        rc.now.as("created_at"))

  /** Gold: per-file data-quality metrics — diabetes_etl_pipeline.py:453-489. */
  def dataQualityMetrics(silver: DataFrame, rc: RunContext): DataFrame =
    silver
      .withColumn("processing_date", rc.today)
      .groupBy("processing_date", "source_file")
      .agg(
        count(lit(1)).as("total_records"),
        sum(when(col("glucose_imputed"), 1).otherwise(0)).as("glucose_imputed_count"),
        sum(when(col("bp_imputed"), 1).otherwise(0)).as("bp_imputed_count"),
        sum(when(col("skin_imputed"), 1).otherwise(0)).as("skin_imputed_count"),
        sum(when(col("insulin_imputed"), 1).otherwise(0)).as("insulin_imputed_count"),
        sum(when(col("bmi_imputed"), 1).otherwise(0)).as("bmi_imputed_count"),
        round(avg("data_quality_score"), 2).as("avg_data_quality_score"),
        min("data_quality_score").as("min_data_quality_score"),
        max("data_quality_score").as("max_data_quality_score"))
      .withColumn("total_imputed_fields",
        (col("glucose_imputed_count") + col("bp_imputed_count") +
          col("skin_imputed_count") + col("insulin_imputed_count") +
          col("bmi_imputed_count")).cast(IntegerType))
      .withColumn("imputation_rate",
        round((col("total_imputed_fields").cast(DoubleType) /
          (col("total_records").cast(DoubleType) * 5)) * 100, 2))
      .withColumn("created_at", rc.now)

  /** Gold: dashboard refresh log — diabetes_etl_pipeline.py:498-534. */
  def dashboardRefreshLog(silver: DataFrame, rc: RunContext): DataFrame =
    silver
      .agg(
        count(lit(1)).as("total_records_processed"),
        countDistinct("source_file").as("files_processed"),
        max("ingestion_timestamp").as("latest_ingestion"),
        max("transformation_timestamp").as("latest_transformation"),
        round(avg("data_quality_score"), 2).as("overall_data_quality"))
      .withColumn("pipeline_run_id", rc.uuid)
      .withColumn("pipeline_completion_time", rc.now)
      .withColumn("status", lit("COMPLETED"))
      .withColumn("next_dashboard_refresh_due", rc.now)
      .withColumn("refresh_priority", // quirk: HIGH reachable only via count
        when(col("overall_data_quality") < 80, lit("HIGH"))
          .when(col("total_records_processed") > 1000, lit("HIGH"))
          .otherwise(lit("NORMAL")))

  /** Gold: pipeline health — diabetes_etl_pipeline.py:543-580 (reads BRONZE). */
  def pipelineHealthMetrics(bronze: DataFrame, rc: RunContext): DataFrame =
    bronze
      .withColumn("processing_hour", date_format(col("ingestion_timestamp"), "yyyy-MM-dd HH"))
      .groupBy("processing_hour", "file_name")
      .agg(
        count(lit(1)).as("records_processed"),
        countDistinct("source_file").as("unique_files"),
        min("ingestion_timestamp").as("first_record_time"),
        max("ingestion_timestamp").as("last_record_time"))
      .withColumn("processing_duration_minutes",
        (unix_timestamp(col("last_record_time")) - unix_timestamp(col("first_record_time"))) / 60.0)
      .withColumn("records_per_minute",
        when(col("processing_duration_minutes") > 0,
          round(col("records_processed").cast(DoubleType) / col("processing_duration_minutes"), 2))
          .otherwise(col("records_processed").cast(DoubleType)))
      .withColumn("health_status",
        when(col("records_processed") === 0, lit("ERROR"))
          .when(col("records_per_minute") < 10, lit("SLOW"))
          .otherwise(lit("HEALTHY")))
      .withColumn("created_at", rc.now)

  /** Gold: feature correlation — diabetes_etl_pipeline.py:589-622. */
  def featureCorrelation(silver: DataFrame, rc: RunContext): DataFrame =
    silver
      .groupBy("age_group", "bmi_category")
      .agg(
        count(lit(1)).as("sample_size"),
        corr("Glucose", "BMI").as("glucose_bmi_corr"),
        corr("Age", "Pregnancies").as("age_pregnancies_corr"),
        corr("BloodPressure", "BMI").as("bp_bmi_corr"),
        corr("Insulin", "Glucose").as("insulin_glucose_corr"),
        round(avg("Outcome"), 3).as("diabetes_prevalence"))
      .withColumn("correlation_strength", // :614-617 (§2.8 abs)
        when(abs(col("glucose_bmi_corr")) > 0.7, lit("Strong"))
          .when(abs(col("glucose_bmi_corr")) > 0.4, lit("Moderate"))
          .otherwise(lit("Weak")))
      .withColumn("created_at", rc.now)

  /** Gold: validation summary — diabetes_etl_pipeline.py:631-672. */
  def validationSummary(silver: DataFrame, rc: RunContext): DataFrame = {
    def validityRate(cnt: String): org.apache.spark.sql.Column =
      round((col(cnt).cast(DoubleType) / col("total_records").cast(DoubleType)) * 100, 2)
    silver
      .agg(
        count(lit(1)).as("total_records"),
        sum(when(col("Age") > 0 && col("Age") < 120, 1).otherwise(0)).as("valid_age_count"),
        sum(when(col("Outcome").isin(0, 1), 1).otherwise(0)).as("valid_outcome_count"),
        sum(when(col("Pregnancies") >= 0, 1).otherwise(0)).as("valid_pregnancies_count"),
        sum(when(col("Glucose") > 0, 1).otherwise(0)).as("valid_glucose_count"),
        sum(when(col("BMI") > 0, 1).otherwise(0)).as("valid_bmi_count"))
      .withColumn("age_validity_rate", validityRate("valid_age_count"))
      .withColumn("outcome_validity_rate", validityRate("valid_outcome_count"))
      .withColumn("pregnancies_validity_rate", validityRate("valid_pregnancies_count"))
      .withColumn("glucose_validity_rate", validityRate("valid_glucose_count"))
      .withColumn("bmi_validity_rate", validityRate("valid_bmi_count"))
      .withColumn("overall_data_quality",
        round((col("age_validity_rate") + col("outcome_validity_rate") +
          col("pregnancies_validity_rate") + col("glucose_validity_rate") +
          col("bmi_validity_rate")) / 5, 2))
      .withColumn("validation_timestamp", rc.now)
      .withColumn("validation_date", rc.today)
  }

  // ---- the DAG ---------------------------------------------------------

  /** All 14 nodes wired with the reference's dependency edges. `bronze`
    * lets the streaming flavor substitute its own ingest (M4). */
  def tableDefs(
      spark: SparkSession, rc: RunContext,
      bronze: PipelineResult.Reader => DataFrame): Seq[TableDef] = Seq(
    TableDef("diabetes_bronze", Nil,
      expectations = Seq(Expectation.drop("valid_file", "file_name IS NOT NULL")),
      build = _ => bronze(null)),
    TableDef("diabetes_bronze_materialized", Seq("diabetes_bronze"),
      build = read => read("diabetes_bronze")),
    TableDef("diabetes_silver", Seq("diabetes_bronze_materialized"),
      expectations = Seq(
        Expectation.warn("valid_age", "Age > 0 AND Age < 120"),
        Expectation.warn("valid_outcome", "Outcome IN (0, 1)"),
        Expectation.warn("valid_pregnancies", "Pregnancies >= 0")),
      build = read => silver(read("diabetes_bronze_materialized"), rc)),
    TableDef("diabetes_demographics_summary", Seq("diabetes_silver"),
      build = read => demographicsSummary(read("diabetes_silver"), rc)),
    TableDef("diabetes_risk_analysis", Seq("diabetes_silver"),
      build = read => riskAnalysis(read("diabetes_silver"), rc)),
    TableDef("diabetes_executive_summary", Seq("diabetes_silver"),
      build = read => executiveSummary(read("diabetes_silver"), rc)),
    TableDef("diabetes_data_quality_metrics", Seq("diabetes_silver"),
      build = read => dataQualityMetrics(read("diabetes_silver"), rc)),
    TableDef("dashboard_refresh_log", Seq("diabetes_silver"),
      build = read => dashboardRefreshLog(read("diabetes_silver"), rc)),
    TableDef("pipeline_health_metrics", Seq("diabetes_bronze"),
      build = read => pipelineHealthMetrics(read("diabetes_bronze"), rc)),
    TableDef("diabetes_feature_correlation", Seq("diabetes_silver"),
      build = read => featureCorrelation(read("diabetes_silver"), rc)),
    TableDef("data_validation_summary", Seq("diabetes_silver"),
      build = read => validationSummary(read("diabetes_silver"), rc)),
    TableDef("v_demographics_dashboard", Seq("diabetes_demographics_summary"), isView = true,
      build = read => read("diabetes_demographics_summary").select(
        col("age_group"), col("bmi_category"), col("pregnancy_risk"),
        col("patient_count"), col("diabetes_rate"), col("avg_risk_score"),
        col("avg_age"), col("avg_bmi"), col("avg_glucose"), col("created_at"))),
    TableDef("v_risk_analysis_dashboard", Seq("diabetes_risk_analysis"), isView = true,
      build = read => read("diabetes_risk_analysis").select(
        col("risk_level"), col("glucose_level"), col("bp_category"),
        col("patient_count"), col("diabetes_rate"), col("avg_risk_score"),
        col("avg_pedigree_function"), col("avg_insulin"), col("created_at"))),
    TableDef("v_executive_summary_dashboard", Seq("diabetes_executive_summary"), isView = true,
      build = read => read("diabetes_executive_summary").select(
        col("total_patients"), col("diabetes_cases"), col("diabetes_percentage"),
        col("high_risk_patients"), col("high_risk_percentage"), col("avg_age"),
        col("avg_risk_score"), col("data_quality_score"), col("summary_date"),
        col("created_at"))))

  // ---- cached runner for the parity harness ----------------------------

  private val runCache = TrieMap.empty[(SparkSession, String), PipelineResult]

  /** Run (once per session+corpus) the full batch DAG with the golden
    * frozen clock; parity queries select from the result. */
  def cachedRun(spark: SparkSession, dataDir: String = defaultDataDir): PipelineResult =
    runCache.getOrElseUpdate((spark, dataDir), {
      val rc = RunContext.golden
      val work = graft.Scratch.dir("graft-diabetes-").toString
      run(spark, dataDir, work, rc)
    })

  /** Run the full batch DAG. */
  def run(spark: SparkSession, dataDir: String, workDir: String, rc: RunContext): PipelineResult = {
    val defs = tableDefs(spark, rc, _ => bronzeBatch(spark, dataDir, rc))
    // 768-row corpus: single-file sinks (see PipelineGraph.run Scaladoc).
    val result = PipelineGraph.run(spark, defs, workDir, sinkPartitions = Some(1))
    result.expectationMetrics(spark).createOrReplaceTempView("pipeline_expectation_metrics")
    result
  }
}
