package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnnIndex, IvfIndex, PqIndex, Similarity}
import graft.sources.TxLog

/** Spark JOBS PER MAINTENANCE WINDOW, pinned exactly — the standing
  * regression net the round-18 steal adjudication asked for: the
  * protocol family's bench cost is job count × scheduling latency
  * (many small actions, not data volume), so an accidental extra
  * action per window is a real regression even when every result stays
  * correct — and a removed one (the r18 `knownCount` probe, the r19
  * count+stats fusion) is an improvement this suite makes visible.
  * The scenarios are deterministic (fixed generator, fixed window), so
  * the counts are reproducible numbers, not statistics; a pin moving
  * means the WINDOW'S ACTION SHAPE changed and the new number must be
  * justified, not absorbed. */
class IndexJobCountSpec extends AnyFunSuite with SparkTestBase {

  private def root(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString

  /** Jobs submitted while `body` runs (listener-bus drained before the
    * count is read, so late async submissions are included). The bus is
    * ALSO drained before the listener attaches: an event posted by an
    * earlier suite but still queued is dispatched to whatever listeners
    * are registered at delivery time, so without the pre-drain a
    * neighboring suite's stray job start bleeds +1 into this count —
    * seen once as a full-suite-only 82-vs-81 flake. */
  private def countJobs(body: => Unit): Int = {
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    n.get
  }

  /** The shared deterministic 8-dim generator (IvfIndexSpec's). */
  private def vecs(ids: Seq[Long]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map { i =>
        Row(i, (0 until 8).map(j => ((i * 31 + j * 17) % 19 - 9) / 3.0f))
      }, 2), schema)
  }

  test("IvfIndex.maintain: one update window's job count is pinned") {
    val r = root("jobs-ivf"); val src = s"$r/src"; val idx = s"$r/idx"
    val cents = vecs((0L until 20L).map(_ * 13L)).localCheckpoint(true)
    TxLog.append(spark, src, vecs(0L until 200L))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = IvfIndex.initialize(spark, src, idx, cents)
    TxLog.update(spark, src, "vec_id % 11 = 3",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val jobs = countJobs {
      IvfIndex.maintain(spark, src, idx, at, cents): Unit
    }
    info(s"IvfIndex.maintain update-window jobs: $jobs")
    assert(jobs === IvfJobs, s"IvfIndex window job shape changed: $jobs")
  }

  test("PqIndex.maintain: one update window's job count is pinned") {
    val r = root("jobs-pq"); val src = s"$r/src"; val idx = s"$r/idx"
    val base = vecs(0L until 200L)
    val cbPlan = Similarity.pqCodebook(base, "vec_id % 13 = 0", 8)
    val cb = spark.createDataFrame(
      java.util.Arrays.asList(cbPlan.collect(): _*), cbPlan.schema)
      .localCheckpoint(true)
    TxLog.append(spark, src, base)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = PqIndex.initialize(spark, src, idx, cb, 4, 2)
    TxLog.update(spark, src, "vec_id % 11 = 3",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val jobs = countJobs {
      PqIndex.maintain(spark, src, idx, at, cb, 4, 2): Unit
    }
    info(s"PqIndex.maintain update-window jobs: $jobs")
    assert(jobs === PqJobs, s"PqIndex window job shape changed: $jobs")
  }

  test("GraphAnnIndex.maintain: one update window's job count is pinned") {
    val r = root("jobs-gann"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = vecs(0L until 200L).localCheckpoint(true)
    val cents = vecs((0L until 10L).map(_ * 23L))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = GraphAnnIndex.initialize(spark, src, idx, cents, 8, rounds = 1)
    TxLog.update(spark, src, "vec_id % 11 = 3",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val jobs = countJobs {
      GraphAnnIndex.maintain(spark, src, idx, at, 8,
        beam = 16, hops = 2, entryCount = 4, cents = Some(cents)): Unit
    }
    info(s"GraphAnnIndex.maintain update-window jobs: $jobs")
    assert(jobs === GannJobs, s"GraphAnnIndex window job shape changed: $jobs")
  }

  // The pinned action shapes (local[4] test session, AQE on, fixed
  // 200-row corpus, one embedding-flip update window). Accounting:
  // IVF/PQ windows are ~12 SQL executions — the change-set checkpoint
  // + fused stats agg, then the merge machinery's staging write, the
  // FUSED key census (r20: one groupBy + bounded-fold job carries the
  // totals AND the IN-list; the separate countDistinct agg and the
  // per-column distinct().collect() are gone — 27 → 24 here), touch
  // discovery, touched rewrite, DV dead-count + sidecar stage, insert
  // anti-join stage, CDF stage — each paying 1 job per
  // AQE-materialized exchange plus the final. The graph window adds
  // planEdits' checkpointed intermediates and the per-hop beam-search
  // checkpoints (hops=2 here); its composite-key merge census fuses
  // the same way (81 → 80). A cache-for-checkpoint variant was
  // MEASURED and REVERTED in r19: it saved ~5 graph-window jobs but
  // paid columnar encode/decode on the embedding arrays — slower
  // wall-clock suite-wide.
  // (84 before the r19 last-hop-checkpoint cut in GraphAnn.searchTopK
  // — the attach search no longer pays a final materialization job;
  // 82 before the r19 batch-internal-wiring checkpoint cut — that
  // frame is consumed exactly once by the gained-union's own
  // materialization, so its eager checkpoint was a pure extra job)
  // r20 second cut: the change-set/last-image emptiness gates, drift
  // stats and arrivals counts now ride their checkpoints as
  // Dataset.observe metrics (one job instead of checkpoint + agg), the
  // edits emptiness check rides the edits checkpoint the same way, and
  // planEdits' surviving-graph view went lazy (an arrivals-free window
  // never materializes it) — IVF/PQ 24 → 22, graph 80 → 75.
  private val IvfJobs = 22
  private val PqJobs = 22
  private val GannJobs = 75
}
