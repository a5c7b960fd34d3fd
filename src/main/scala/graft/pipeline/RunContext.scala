package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic substitutes for the reference pipeline's nondeterministic
  * scalar functions (SURVEY.md §2.10.5): `current_timestamp` (11 call
  * sites, e.g. diabetes_etl_pipeline.py:70,182,299), `current_date`
  * (:72,385,468,669) and `uuid()` (:523).
  *
  * In frozen mode (the default for verification and golden tests) all
  * three collapse to literals, so every pipeline output is bit-stable and
  * hash-comparable against the DuckDB oracle. In production mode
  * (`frozen = false`) they fall through to the real Spark functions —
  * semantics identical to the reference.
  *
  * Scale note: literals and `current_timestamp()` are both evaluated once
  * per plan (Catalyst folds `CurrentTimestamp` at plan time), so the
  * frozen clock costs nothing at any scale.
  */
final case class RunContext(
    runTimestamp: String,
    runDate: String,
    runId: String,
    frozen: Boolean = true) {

  /** Replacement for `current_timestamp()`. Built via a timestamp literal
    * so the instant is interpreted in the session time zone (UTC in all
    * harness sessions), not the JVM default. */
  def now: Column = if (frozen) expr(s"timestamp'$runTimestamp'") else current_timestamp()

  /** Replacement for `current_date()`. */
  def today: Column = if (frozen) expr(s"date'$runDate'") else current_date()

  /** Replacement for `expr("uuid()")` (diabetes_etl_pipeline.py:523). */
  def uuid: Column = if (frozen) lit(runId) else expr("uuid()")
}

object RunContext {
  /** The context used by Verify/golden tests; values mirrored in every
    * DuckDB oracle that touches a pipeline timestamp column. */
  val golden: RunContext = RunContext(
    runTimestamp = "2026-01-01 00:00:00",
    runDate = "2026-01-01",
    runId = "00000000-0000-4000-8000-000000000042")

  /** Production behavior: real clock, real uuids. */
  val live: RunContext = RunContext("", "", "", frozen = false)
}
