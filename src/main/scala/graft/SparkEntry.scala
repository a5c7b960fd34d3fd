package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-parity surface: one named query per operator
  * in SURVEY.md §2 (plus the beyond-reference LLM-pipeline operators),
  * each taking (session, scale-factor dir). `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible query; the driver hash-compares
  * the two at sf0.01.
  */
object SparkEntry {

  private[graft] val allSpecs: Seq[QuerySpec] =
    CoreQueries.specs ++ JoinQueries.specs ++ FunctionQueries.specs ++
      MedallionQueries.specs ++ TextQueries.specs ++ DedupQueries.specs ++
      AnnQueries.specs ++ MultimodalQueries.specs ++ StreamQueries.specs ++
      ScaleQueries.specs ++ EventsMedallionQueries.specs ++ TemporalQueries.specs ++
      AnalyticsQueries.specs ++ TxQueries.specs ++ TxQueries2.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q19_join_inner_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QuerySpec.toQueries(allSpecs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QuerySpec.toOracles(allSpecs)

  /** Data-dependent oracles (fitted-model literals embedded at dump
    * time); Verify evaluates these against the verify sf dir and merges
    * them into oracle_sql.json alongside [[oracleSql]]. */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    QuerySpec.toDynOracles(allSpecs).flatMap { case (name, f) =>
      // a dynamic-oracle failure degrades THAT query to rows-only,
      // never the whole dump
      try Some(name -> f(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracle $name failed: ${e.getMessage}")
        None
      }
    }
}
