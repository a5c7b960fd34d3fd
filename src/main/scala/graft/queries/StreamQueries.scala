package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Td
import graft.streaming.StreamingOps

/** Stream-analytics parity queries over `events`: a real Structured
  * Streaming windowed aggregation (q63 — the plan runs through the
  * streaming engine, AvailableNow, then the final state is compared to
  * the batch oracle) and gap-based sessionization (q64 — the batch
  * lag+running-sum formulation; its incremental twin is
  * [[graft.streaming.Sessionize.statefulSessions]], proven equivalent in
  * StatefulSessionSpec). */
object StreamQueries {

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec("q63_stream_window",
      (s, dir) => StreamingOps.windowedEventCounts(s, dir)
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('day', ts) AS window_start, event_type,
                     count(*) AS n_events,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // Sessions split when a user's inter-event gap exceeds 12 h. Epoch
    // seconds compared as DOUBLE: event micros < 2^52, so the subtraction
    // is exact in both engines.
    QuerySpec("q64_sessionize", { (s, dir) =>
      val order = Seq(col("ts"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(order: _*)
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Td.load(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_flag",
          when(col("prev_ts").isNull ||
            col("ts").cast(DoubleType) - col("prev_ts").cast(DoubleType) > 43200.0, 1)
            .otherwise(0))
        .withColumn("session_idx", sum("gap_flag").over(cum))
        .groupBy("user_id", "session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          min("ts").as("session_start"),
          max("ts").as("session_end"))
        .withColumn("duration_sec",
          col("session_end").cast(DoubleType) - col("session_start").cast(DoubleType))
        .orderBy("user_id", "session_idx")
    },
      Some("""WITH flags AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 43200.0
                            THEN 1 ELSE 0 END AS gap_flag
                FROM events),
              sess AS (
                SELECT user_id, ts,
                       CAST(SUM(gap_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
                FROM flags)
              SELECT user_id, session_idx, count(*) AS n_events,
                     min(ts) AS session_start, max(ts) AS session_end,
                     epoch(max(ts)) - epoch(min(ts)) AS duration_sec
              FROM sess GROUP BY user_id, session_idx
              ORDER BY user_id, session_idx""")),

    // ---- manifest-mode streaming ingest ---------------------------------
    // The Auto-Loader-scale ingest (StreamingBronze.ingestManifest): the
    // stream's file source lists only a tiny path LEDGER, never the data
    // directory. Proven in-gate: documents split into 4 CSVs by
    // pmod(doc_id,4), ledgered in two drops (parts 0-1 then 2-3) through
    // two checkpointed AvailableNow passes — plus an UNLEDGERED decoy
    // copy of part 0 in the same directory, whose rows would double
    // batch 0 if anything listed the data dir. The batch a row lands in
    // is therefore pure ledger history, which the oracle re-derives from
    // doc_id arithmetic.
    QuerySpec("q121_manifest_ingest", { (s, dir) =>
      import org.apache.spark.sql.types._
      val docs = Td.load(s, dir, "documents")
        .selectExpr("doc_id", "lang", "n_chars", "pmod(doc_id, 4) AS part")
      val root = graft.Scratch.dir("graft-q121").toString
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("n_chars", LongType)))
      (0 to 3).foreach { p =>
        docs.where(col("part") === p).select("doc_id", "lang", "n_chars")
          .coalesce(1).write.option("header", "true").csv(s"$root/data/part$p")
      }
      def csvOf(p: Int): String = {
        val d = new java.io.File(s"$root/data/part$p")
        d.listFiles().filter(_.getName.endsWith(".csv")).head.getAbsolutePath
      }
      val decoy = java.nio.file.Paths.get(s"$root/data/part0_decoy.csv")
      java.nio.file.Files.copy(java.nio.file.Paths.get(csvOf(0)), decoy)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/ledger"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/ledger/drop0.txt"), s"${csvOf(0)}\n${csvOf(1)}\n")
      graft.streaming.StreamingBronze.ingestManifest(s, s"$root/ledger",
        s"$root/sink", s"$root/ckpt", schema)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/ledger/drop1.txt"), s"${csvOf(2)}\n${csvOf(3)}\n")
      graft.streaming.StreamingBronze.ingestManifest(s, s"$root/ledger",
        s"$root/sink", s"$root/ckpt", schema)
        .groupBy(col("batch_id").cast(LongType).as("batch_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("lang").as("n_langs"))
        .orderBy("batch_id")
    },
      Some("""SELECT CAST(CASE WHEN doc_id % 4 <= 1 THEN 0 ELSE 1 END AS BIGINT) AS batch_id,
                     count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
              FROM documents GROUP BY 1 ORDER BY batch_id""")),

    // ---- streaming ingest into the transactional table ------------------
    // StreamingTx: checkpointed file stream → foreachBatch →
    // TxLog.appendBatch, each pass one txn-tagged table version. Two
    // drops in two passes; the batch a row lands in is its pass, which
    // the _commit_version column exposes and the oracle re-derives from
    // doc_id arithmetic (the q121 pattern, now with the table format's
    // exactly-once txn guard under it).
    QuerySpec("q131_stream_tx_ingest", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
        .selectExpr("doc_id", "lang", "n_chars", "pmod(doc_id, 4) AS part")
      val root = graft.Scratch.dir("graft-q131").toString
      val schema = StructType(Seq(StructField("doc_id", LongType),
        StructField("lang", StringType), StructField("n_chars", LongType)))
      (0 to 3).foreach { p =>
        docs.where(col("part") === p).select("doc_id", "lang", "n_chars")
          .coalesce(1).write.option("header", "true").csv(s"$root/raw/part$p")
      }
      def csvOf(p: Int): String = {
        val d = new java.io.File(s"$root/raw/part$p")
        d.listFiles().filter(_.getName.endsWith(".csv")).head.getAbsolutePath
      }
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
      def stagePass(ps: Seq[Int]): Unit = ps.foreach { p =>
        java.nio.file.Files.copy(java.nio.file.Paths.get(csvOf(p)),
          java.nio.file.Paths.get(s"$root/in/part$p.csv")): Unit
      }
      stagePass(Seq(0, 1))
      graft.streaming.StreamingTx.ingest(s, s"$root/in", s"$root/t",
        s"$root/ckpt", schema, appId = "q131")
      stagePass(Seq(2, 3))
      graft.streaming.StreamingTx.ingest(s, s"$root/in", s"$root/t",
        s"$root/ckpt", schema, appId = "q131")
      graft.sources.TxLog.readChanges(s, s"$root/t", fromVersionExclusive = -1L)
        .groupBy(col("_commit_version").as("pass_version"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          countDistinct("lang").as("n_langs"))
        .orderBy("pass_version")
    },
      Some("""SELECT CAST(CASE WHEN doc_id % 4 <= 1 THEN 0 ELSE 1 END AS BIGINT) AS pass_version,
                     count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                     CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
              FROM documents GROUP BY 1 ORDER BY pass_version""")),

    // ---- streaming dedup: at-least-once in, exactly-once out ------------
    // Every event is delivered TWICE (two directory entries over the
    // same parquet); dropDuplicatesWithinWatermark must collapse the
    // redelivery in-stream — watermark-bounded state, unlike plain
    // dropDuplicates — before the rows reach the sink. The oracle
    // aggregates the SINGLE-delivery raw table: a dedup miss doubles
    // n_events and sum_value and breaks the hash; keying state by
    // event_id (not whole-row) is what makes redelivered IDENTICAL rows
    // collapse. Decimal-routed sum, order-insensitive.
    QuerySpec("q145_stream_dedup", { (s, dir) =>
      StreamingOps.dedupedDoubleDelivery(s, dir)
        .orderBy("event_type")
    },
      Some("""SELECT event_type, count(*) AS n_events,
                     CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- stream-stream interval join: conversion attribution ------------
    // Clicks joined to same-user purchases within 24h — BOTH sides
    // unbounded streams through the streaming engine; the time-bound +
    // watermarks let Spark evict unmatchable join state. The full pair
    // list (total order on (click_id, purchase_id)) is hash-compared to
    // the batch self-join the oracle runs: a state-eviction bug drops
    // pairs, a bound bug invents them.
    QuerySpec("q147_stream_join", { (s, dir) =>
      // one user band (the round-16 sanctioned weight trim): the
      // stream-stream interval join, watermarks, and state eviction are
      // identical; the retained join state and pair volume drop ~4×
      StreamingOps.clickPurchaseAttribution(s, dir, userFilter = "user_id % 4 = 1")
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          (col("purchase_ts").cast(LongType) - col("click_ts").cast(LongType))
            .as("gap_sec"),
          col("purchase_value"))
        .orderBy("click_id", "purchase_id")
    },
      Some("""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                     c.user_id,
                     CAST(floor(epoch(p.ts)) AS BIGINT)
                       - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_sec,
                     p.value AS purchase_value
              FROM events c JOIN events p
                ON c.user_id = p.user_id
               AND c.event_type = 'click' AND p.event_type = 'purchase'
               AND c.user_id % 4 = 1
               AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOURS
              ORDER BY click_id, purchase_id"""))
  )
}
