package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One parity-harness query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. Column names/aliases MUST match between
  * the two — the driver sorts columns by name before hashing values.
  *
  * Cross-engine determinism rules used throughout (SURVEY.md §7.4):
  *  - every query ends in a total ORDER BY (row order is part of the hash);
  *  - double SUM/AVG go through an exact DECIMAL(18,4) cast, then back to
  *    DOUBLE (parallel double summation is order-sensitive; decimal is not);
  *  - inherently floating aggregates (stddev/corr/percentile) are rounded
  *    coarsely enough that a ~1e-9 cross-engine delta cannot flip a digit;
  *  - integer aggregates are pinned to BIGINT on the DuckDB side (DuckDB
  *    SUM(int) is HUGEINT, which round-trips poorly through arrow);
  *  - DuckDB literals like `100.0` are DECIMAL, not DOUBLE — oracles cast
  *    explicitly wherever Spark computes in DOUBLE.
  *
  * COLUMN-TYPE POLICY (round-4, after q90/q99/q100's driver-side
  * hash-only mismatches): every oracle-compared column must be integer,
  * decimal, string, boolean, date, or timestamp typed. A DOUBLE output
  * column is allowed ONLY when it is provably single-rounding from exact
  * integer/decimal inputs AND has survived a driver round green; when in
  * doubt, emit the scaled exact integer instead (cents, basis points:
  * `CAST(floor(x·10ᵏ+0.5) AS BIGINT)`). Rationale: the driver's oracle
  * environment (DuckDB version, float→hash formatting) is outside our
  * control, and an integer column has no representation ambiguity.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Data-dependent oracle: SQL emitted with access to (session, sfDir)
      * so a deterministically-fitted model (PCA mean/components) can ride
      * into the DuckDB replay as literals. Evaluated by Verify at dump
      * time against the SAME sf dir the queries ran on; mutually
      * exclusive with `oracle`. */
    dynOracle: Option[(SparkSession, String) => String] = None) {
  require(oracle.isEmpty || dynOracle.isEmpty,
    s"$name: static and dynamic oracle are mutually exclusive")
}

object QuerySpec {
  def toQueries(specs: Seq[QuerySpec]): Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.fn).toMap
  def toOracles(specs: Seq[QuerySpec]): Map[String, String] =
    specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
  def toDynOracles(specs: Seq[QuerySpec]): Map[String, (SparkSession, String) => String] =
    specs.flatMap(s => s.dynOracle.map(s.name -> _)).toMap
}
