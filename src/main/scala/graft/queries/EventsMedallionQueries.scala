package graft.queries

import graft.pipeline.EventsPipeline

/** Parity queries for the events medallion ([[EventsPipeline]]) — the
  * second PipelineGraph instance. Unlike the diabetes queries these run
  * against whatever scale-factor dir the driver passes, so the pipeline
  * scales with the fact table. Timestamps in silver come from the frozen
  * clock; everything else is data-derived.
  */
object EventsMedallionQueries {

  private val ts = DiabetesOracle.ts // same golden frozen clock literal

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q81_events_silver",
      (s, dir) => EventsPipeline.cachedRun(s, dir)("events_silver")
        .orderBy("event_id"),
      Some(s"""SELECT event_id, ts, user_id, event_type, value, props,
                      $ts AS ingested_at,
                      CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
                      date_trunc('day', ts) AS event_day,
                      CASE WHEN value < 5 THEN 'low'
                           WHEN value < 15 THEN 'mid'
                           ELSE 'high' END AS value_band,
                      CAST(event_type = 'error' AS INTEGER) AS is_error,
                      $ts AS processed_at
               FROM events ORDER BY event_id""")),

    QuerySpec("q82_events_gold_daily",
      (s, dir) => EventsPipeline.cachedRun(s, dir)("events_gold_daily")
        .orderBy("event_day", "event_type"),
      Some("""SELECT date_trunc('day', ts) AS event_day, event_type,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                     CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
              FROM events GROUP BY 1, 2 ORDER BY event_day, event_type""")),

    QuerySpec("q83_events_gold_users",
      (s, dir) => EventsPipeline.cachedRun(s, dir)("events_gold_users")
        .orderBy("user_id"),
      Some("""SELECT user_id, count(*) AS n_events,
                     min(ts) AS first_seen, max(ts) AS last_seen,
                     CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                     CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_active_days
              FROM events GROUP BY user_id ORDER BY user_id"""))
  )
}
