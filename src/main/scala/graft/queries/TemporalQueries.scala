package graft.queries

import org.apache.spark.sql.functions._
import graft.Td

/** Temporal-join + sampling parity queries (beyond-reference operators a
  * training-data pipeline needs): AS-OF join, interval/range join, and
  * the deterministic hash split. Each oracle derives the same result by a
  * DIFFERENT algorithm (correlated-subquery asof; theta-join range join),
  * so the bucket/union tricks are cross-checked, not mirrored.
  */
object TemporalQueries {

  val specs: Seq[QuerySpec] = Seq(

    // ---- SCD Type 2: versioned dimension from the event change log ------
    // Kimball's slowly-changing-dimension pattern: each user's event_type
    // stream becomes versioned status rows with half-open validity
    // intervals; re-sends of an unchanged status collapse into the open
    // version. All keyed-window work (operators/Scd) — one exchange on
    // user_id, no unpartitioned window. The oracle mirrors with plain SQL
    // lag/lead; event_id is the same-timestamp tie-break AND the total
    // output order.
    QuerySpec("q112_scd2", { (s, dir) =>
      graft.operators.Scd.scd2(
        Td.load(s, dir, "events").select("user_id", "event_id", "event_type", "ts"),
        keyCol = "user_id", attrCols = Seq("event_type"),
        tsCol = "ts", tieCol = "event_id")
        .withColumnRenamed("event_type", "status")
        .orderBy("user_id", "event_id")
    }, Some("""WITH ordered AS (
                 SELECT user_id, event_id, event_type, ts,
                        lag(event_type) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_type
                 FROM events),
               changes AS (
                 SELECT user_id, event_id, event_type, ts FROM ordered
                 WHERE prev_type IS NULL OR prev_type <> event_type)
               SELECT user_id, event_id, event_type AS status, ts AS valid_from,
                      lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS valid_to,
                      (lead(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) IS NULL) AS is_current
               FROM changes ORDER BY user_id, event_id""")),

    // ---- AS-OF join: clicks pick up the user's latest purchase-day state
    // Right side is pre-aggregated to one row per (user, day) — the
    // determinism contract of any asof engine. The engine path is the
    // union + running-last sort-merge form (one shuffle); the oracle is
    // an independent correlated-subquery derivation.
    QuerySpec("q85_asof_join", { (s, dir) =>
      val ev = Td.load(s, dir, "events")
      val clicks = ev.where("event_type = 'click'")
        .select("event_id", "user_id", "ts", "value")
      val state = ev.where("event_type = 'purchase'")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day_ts"))
        .agg(max("value").as("day_max"))
      graft.operators.TemporalJoin
        .asOfJoin(clicks, state, "user_id", "ts", "day_ts", Seq("day_max"))
        .orderBy("event_id")
    },
      Some("""WITH st AS (
                SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
                       max(value) AS day_max
                FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
              cl AS (
                SELECT event_id, user_id, ts, value
                FROM events WHERE event_type = 'click'),
              m AS (
                SELECT cl.*,
                       (SELECT max(day_ts) FROM st
                        WHERE st.user_id = cl.user_id AND st.day_ts <= cl.ts) AS asof_ts
                FROM cl)
              SELECT m.user_id, m.event_id, m.ts, m.value,
                     m.asof_ts, st.day_max AS asof_day_max
              FROM m LEFT JOIN st
                ON st.user_id = m.user_id AND st.day_ts = m.asof_ts
              ORDER BY event_id""")),

    // ---- range join: event values matched into overlapping bands -------
    // 40 deterministic intervals [8i, 8i+12) (4-wide overlaps, so values
    // match 1-2 bands). Engine: bucket-expansion equi-join; oracle: the
    // naive theta join — same rows, different algorithm.
    QuerySpec("q86_range_join", { (s, dir) =>
      val bands = s.range(40).selectExpr(
        "concat('band', CAST(id AS STRING)) AS label",
        "CAST(id * 8.0 AS DOUBLE) AS lo",
        "CAST(id * 8.0 + 12.0 AS DOUBLE) AS hi")
      val points = Td.load(s, dir, "events").select("event_id", "value")
      graft.operators.TemporalJoin
        .rangeJoin(points, "value", bands, "lo", "hi", bucketWidth = 8.0)
        .select("event_id", "value", "label", "lo", "hi")
        .orderBy("event_id", "label")
    },
      Some("""WITH bands AS (
                SELECT concat('band', CAST(i AS VARCHAR)) AS label,
                       CAST(i * 8.0 AS DOUBLE) AS lo,
                       CAST(i * 8.0 + 12.0 AS DOUBLE) AS hi
                FROM generate_series(0, 39) t(i))
              SELECT e.event_id, e.value, b.label, b.lo, b.hi
              FROM events e JOIN bands b
                ON e.value >= b.lo AND e.value < b.hi
              ORDER BY event_id, label""")),

    // ---- time-range rolling window: 1-hour trailing stats per user -----
    // RANGE frame over epoch seconds (not ROWS — late/dense events change
    // row offsets but not the time window). The rolling sum routes through
    // decimal so it is exact and order-insensitive across engines; at
    // 100 TB this is one hash exchange on user_id + a per-partition sort,
    // the same shape as any sessionization pass.
    QuerySpec("q88_window_range", { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Td.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("ts_sec"),
          col("value"))
      val w = Window.partitionBy("user_id").orderBy("ts_sec")
        .rangeBetween(-3599, Window.currentRow)
      ev.select(col("event_id"), col("user_id"), col("ts_sec"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .over(w).cast("double").as("sum_1h"))
        .orderBy("event_id")
    },
      Some("""SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
                     count(*) OVER w AS n_1h,
                     CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                           RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
              ORDER BY event_id""")),

    // ---- GROUPING SETS: subtotals along chosen axes ---------------------
    // The general form behind q72's ROLLUP; grouping() markers pin the
    // NULL-vs-subtotal ambiguity, and the orderBy is total.
    QuerySpec("q89_grouping_sets", { (s, dir) =>
      Td.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(grouping(l_returnflag) AS INT) AS g_rf,
               CAST(grouping(l_linestatus) AS INT) AS g_ls
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
      """)
    },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
                     CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
                     CAST(GROUPING(l_linestatus) AS INT) AS g_ls
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                      (l_returnflag), (l_linestatus))
              ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // ---- range join via the CUSTOM PHYSICAL OPERATOR -------------------
    // Same contract as q86, but planned through the engine's injected
    // RangeJoinStrategy → RangeJoinExec (broadcast sorted-interval index,
    // binary-search probes, zero exchange on the point side) — tier (c)
    // of the Catalyst ladder exercised end-to-end under the oracle gate.
    QuerySpec("q98_range_join_indexed", { (s, dir) =>
      val bands = s.range(40).selectExpr(
        "concat('band', CAST(id AS STRING)) AS label",
        "CAST(id * 8.0 AS DOUBLE) AS lo",
        "CAST(id * 8.0 + 12.0 AS DOUBLE) AS hi")
      val points = Td.load(s, dir, "events").select("event_id", "value")
      graft.operators.TemporalJoin
        .rangeJoinIndexed(points, "value", bands, "lo", "hi")
        .select("event_id", "value", "label", "lo", "hi")
        .orderBy("event_id", "label")
    },
      Some("""WITH bands AS (
                SELECT concat('band', CAST(i AS VARCHAR)) AS label,
                       CAST(i * 8.0 AS DOUBLE) AS lo,
                       CAST(i * 8.0 + 12.0 AS DOUBLE) AS hi
                FROM generate_series(0, 39) t(i))
              SELECT e.event_id, e.value, b.label, b.lo, b.hi
              FROM events e JOIN bands b
                ON e.value >= b.lo AND e.value < b.hi
              ORDER BY event_id, label""")),

    // ---- funnel: ordered signup → click → purchase conversion ----------
    // Each step is an equi-join on user_id with a strict ts lower bound
    // from the previous step's first event — hash joins plus filters, no
    // theta join, so the funnel scales like any keyed aggregation.
    QuerySpec("q92_funnel", { (s, dir) =>
      val ev = Td.load(s, dir, "events")
      val su = ev.where("event_type = 'signup'")
        .groupBy("user_id").agg(min("ts").as("s_ts"))
      val cl = ev.where("event_type = 'click'").as("e")
        .join(su.as("s"), col("e.user_id") === col("s.user_id") && col("e.ts") > col("s.s_ts"))
        .groupBy(col("e.user_id")).agg(min("e.ts").as("c_ts"))
      val pu = ev.where("event_type = 'purchase'").as("e")
        .join(cl.as("c"), col("e.user_id") === col("c.user_id") && col("e.ts") > col("c.c_ts"))
        .groupBy(col("e.user_id")).agg(min("e.ts").as("p_ts"))
      su.agg(count(lit(1)).as("n_signup"))
        .crossJoin(cl.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(pu.agg(count(lit(1)).as("n_purchase_after")))
    },
      Some("""WITH s AS (SELECT user_id, min(ts) AS s_ts
                         FROM events WHERE event_type = 'signup' GROUP BY 1),
                   c AS (SELECT e.user_id, min(e.ts) AS c_ts
                         FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
                         WHERE e.event_type = 'click' GROUP BY 1),
                   p AS (SELECT e.user_id, min(e.ts) AS p_ts
                         FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
                         WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT (SELECT count(*) FROM s) AS n_signup,
                     (SELECT count(*) FROM c) AS n_click_after,
                     (SELECT count(*) FROM p) AS n_purchase_after""")),

    // ---- retention cohorts: first-event week × activity-week offset ----
    // Two keyed aggregations and one equi-join on user_id; distinct
    // (user, week) activity before the join keeps the joined relation at
    // most one row per user-week. Week offsets are non-negative, so the
    // int cast truncation equals floor in both engines.
    QuerySpec("q93_retention", { (s, dir) =>
      val ev = Td.load(s, dir, "events")
      val cohort = ev.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).as("cohort"))
      val activity = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk")).distinct()
      activity.join(cohort, "user_id")
        .withColumn("week_offset", (datediff(col("wk"), col("cohort")) / 7).cast("int"))
        .groupBy("cohort", "week_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort", "week_offset")
    },
      Some("""WITH cohort AS (
                SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
                FROM events GROUP BY 1),
              act AS (
                SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
                FROM events)
              SELECT c.cohort,
                     CAST(datediff('day', c.cohort, a.wk) // 7 AS INT) AS week_offset,
                     count(DISTINCT a.user_id) AS n_users
              FROM act a JOIN cohort c ON a.user_id = c.user_id
              GROUP BY 1, 2 ORDER BY cohort, week_offset""")),

    // ---- salted skew join: hot keys spread across reducers --------------
    // events (5 event_type values ⇒ every key is hot) salted 8 ways
    // against an in-query type-dimension. The salt is internal — the
    // oracle is the PLAIN join, proving row-identical results; the engine
    // plan shuffles on (event_type, salt) so no reducer owns a whole key.
    // Output is exact-integer cents (CAST(floor(..) AS BIGINT)): the
    // floor is single-rounding IEEE from integer-valued inputs and the
    // hashed column carries no double representation at all, so the
    // driver's oracle environment cannot diverge on float formatting
    // (round-3 verdict item 1).
    QuerySpec("q90_join_salted", { (s, dir) =>
      val dim = s.createDataFrame(Seq(
        ("view", 1.0), ("click", 2.0), ("purchase", 10.0),
        ("signup", 5.0), ("error", 0.0)))
        .toDF("event_type", "weight")
      val ev = Td.load(s, dir, "events").select("event_id", "event_type", "value")
      graft.operators.SkewJoin
        .saltedJoin(ev, dim, Seq("event_type"), col("event_id"), saltFactor = 8)
        .selectExpr("event_id", "event_type",
          "CAST(floor(value * weight * 100.0 + 0.5) AS BIGINT) AS weighted_cents")
        .orderBy("event_id")
    },
      Some("""WITH dim(event_type, weight) AS (VALUES
                ('view', CAST(1.0 AS DOUBLE)), ('click', CAST(2.0 AS DOUBLE)),
                ('purchase', CAST(10.0 AS DOUBLE)), ('signup', CAST(5.0 AS DOUBLE)),
                ('error', CAST(0.0 AS DOUBLE)))
              SELECT e.event_id, e.event_type,
                     CAST(floor(e.value * d.weight * CAST(100.0 AS DOUBLE)
                           + CAST(0.5 AS DOUBLE)) AS BIGINT) AS weighted_cents
              FROM events e JOIN dim d ON e.event_type = d.event_type
              ORDER BY event_id""")),

    // ---- deterministic hash split: per-language stratification check ---
    // Same md5-derived bucket in both engines (SqlDialect.hex32); the
    // query aggregates per (lang, split) so the oracle verifies both
    // membership and the ~80/20 proportions.
    QuerySpec("q87_hash_split", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      graft.operators.Sampling.hashSplit(docs, "doc_id", 80)
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("lang", "split")
    }, {
      val d = DuckSql
      Some(s"""SELECT lang,
                      CASE WHEN ${d.hex32("CAST(doc_id AS VARCHAR)")} % 100 < 80
                           THEN 'train' ELSE 'test' END AS split,
                      count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
               FROM documents
               GROUP BY 1, 2 ORDER BY lang, split""")
    }),

    // ---- epoch-seeded shuffle-shard export order ------------------------
    // Sampling.shuffleShards assigns every doc a shard and a pseudo-random
    // in-shard position, pure functions of (id, epoch). The query exposes
    // the FULL permutation for two epochs side by side: the oracle
    // re-derives both from md5 arithmetic, so membership, shard balance,
    // in-shard order, AND the epoch-to-epoch reshuffle are all hash-gated.
    // (The operator itself is a zero-shuffle projection; the row_number
    // here is the TEST's materialization of "position", not the export
    // path — the writer sorts within partitions instead, see scaladoc.)
    QuerySpec("q139_shuffle_shards", { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Td.load(s, dir, "documents").select("doc_id")
      def epochView(epoch: Int, tag: String) = {
        val sh = graft.operators.Sampling.shuffleShards(docs, "doc_id", 8, epoch)
        val w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
        sh.withColumn("pos", row_number().over(w))
          .select(col("doc_id"), col("shard").as(s"shard_$tag"),
            col("pos").cast("long").as(s"pos_$tag"))
      }
      epochView(0, "e0").join(epochView(1, "e1"), "doc_id").orderBy("doc_id")
    }, {
      val d = DuckSql
      def epochCte(epoch: Int) =
        s"""SELECT doc_id, k % 8 AS shard,
                   CAST(row_number() OVER (PARTITION BY k % 8 ORDER BY k, doc_id)
                        AS BIGINT) AS pos
            FROM (SELECT doc_id,
                         ${d.hex32(s"concat(CAST(doc_id AS VARCHAR), '#e$epoch')")} AS k
                  FROM documents)"""
      Some(s"""WITH e0 AS (${epochCte(0)}), e1 AS (${epochCte(1)})
               SELECT e0.doc_id, e0.shard AS shard_e0, e0.pos AS pos_e0,
                      e1.shard AS shard_e1, e1.pos AS pos_e1
               FROM e0 JOIN e1 ON e0.doc_id = e1.doc_id
               ORDER BY e0.doc_id""")
    })
  )
}
