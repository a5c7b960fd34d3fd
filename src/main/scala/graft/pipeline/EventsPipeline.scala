package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** A SECOND medallion instance on [[PipelineGraph]] — the clickstream
  * domain (the `events` testdata table) — proving the runner, the
  * expectation engine, and the frozen clock are generic engine pieces,
  * not diabetes-specific code. Four nodes:
  *
  *   events_bronze  — provenance-stamped ingest (drop: null event_id)
  *   events_silver  — JSON payload extraction, day bucket, value bands
  *                    (warn: non-negative value)
  *   events_gold_daily — day × type: counts, exact decimal value sums,
  *                    distinct users (the count+countDistinct shape the
  *                    DistinctAggRewrite rule plans Expand-free)
  *   events_gold_users — per-user activity span and intensity
  */
object EventsPipeline {

  /** Silver transform — pure projections over bronze. */
  def silver(bronze: DataFrame, rc: RunContext): DataFrame =
    bronze
      .withColumn("k", expr("CAST(get_json_object(props, '$.k') AS INT)"))
      .withColumn("event_day", date_trunc("day", col("ts")))
      .withColumn("value_band",
        when(col("value") < 5, lit("low"))
          .when(col("value") < 15, lit("mid"))
          .otherwise(lit("high")))
      .withColumn("is_error", (col("event_type") === "error").cast(IntegerType))
      .withColumn("processed_at", rc.now)

  def goldDaily(silver: DataFrame): DataFrame =
    silver
      .groupBy("event_day", "event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("k")).as("sum_k"))

  def goldUsers(silver: DataFrame): DataFrame =
    silver
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen"),
        sum(col("is_error")).as("n_errors"),
        countDistinct(col("event_day")).as("n_active_days"))

  def tableDefs(spark: SparkSession, sfDir: String, rc: RunContext): Seq[TableDef] = Seq(
    TableDef("events_bronze", Nil,
      expectations = Seq(Expectation.drop("valid_event_id", "event_id IS NOT NULL")),
      build = _ => graft.Td.load(spark, sfDir, "events")
        .withColumn("ingested_at", rc.now)),
    TableDef("events_silver", Seq("events_bronze"),
      expectations = Seq(Expectation.warn("non_negative_value", "value >= 0")),
      build = read => silver(read("events_bronze"), rc)),
    TableDef("events_gold_daily", Seq("events_silver"),
      build = read => goldDaily(read("events_silver"))),
    TableDef("events_gold_users", Seq("events_silver"),
      build = read => goldUsers(read("events_silver"))))

  private val runCache = TrieMap.empty[(SparkSession, String), PipelineResult]

  def cachedRun(spark: SparkSession, sfDir: String): PipelineResult =
    runCache.getOrElseUpdate((spark, sfDir), {
      val work = graft.Scratch.dir("graft-events-pipe").toString
      PipelineGraph.run(spark, tableDefs(spark, sfDir, RunContext.golden), work)
    })
}
