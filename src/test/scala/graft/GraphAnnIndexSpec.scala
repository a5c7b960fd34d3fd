package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, GraphAnnIndex, Similarity}
import graft.sources.TxLog

/** Incremental k-NN graph maintenance. Graph edges are corpus-dependent
  * so maintained ≠ rebuilt byte-wise (the FreshDiskANN trade) — the
  * contract here is INVARIANTS (edges ⊆ live×live, new nodes wired,
  * degree caps) and RECALL (maintained-graph search within a fixed
  * slack of the rebuilt graph against brute-force truth). The corpus is
  * the driver's deterministic embeddings table — graph ANN needs real
  * cluster geometry; synthetic uniform-random vectors have no
  * neighborhood structure for ANY graph method to exploit. */
class GraphAnnIndexSpec extends AnyFunSuite with SparkTestBase {

  private val M = 8
  private val Sf = "/root/testdata/sf0.001"

  private def root(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString

  private def corpus() = Td.load(spark, Sf, "embeddings")
    .select("vec_id", "embedding")
    .where(expr(Similarity.validEmbExpr(graft.queries.SparkSql, "embedding")))
    .localCheckpoint(true)

  private def recall(res: org.apache.spark.sql.DataFrame,
      truth: org.apache.spark.sql.DataFrame): Double = {
    val t = truth.select("q_id", "vec_id")
    res.select("q_id", "vec_id").intersect(t).count().toDouble / t.count()
  }

  test("invariants and recall across update / optimize / delete / append") {
    val r = root("gannidx"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = corpus()
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok.where("vec_id % 10 < 8"))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    var at = GraphAnnIndex.initialize(spark, src, idx, cents, M, rounds = 2)

    TxLog.update(spark, src, "vec_id % 13 = 2",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val rUpd = GraphAnnIndex.maintain(spark, src, idx, at, M,
      beam = 32, hops = 3, entryCount = 8, cents = Some(cents)); at = rUpd.srcVersion
    assert(rUpd.rowsApplied > 0L && !rUpd.layoutOnlySkip)

    TxLog.optimize(spark, src)
    val rOpt = GraphAnnIndex.maintain(spark, src, idx, at, M,
      cents = Some(cents)); at = rOpt.srcVersion
    assert(rOpt.layoutOnlySkip && rOpt.rowsApplied === 0L)

    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "vec_id % 7 = 3")
    val rDel = GraphAnnIndex.maintain(spark, src, idx, at, M,
      cents = Some(cents)); at = rDel.srcVersion
    assert(rDel.rowsApplied > 0L)

    TxLog.append(spark, src, ok.where("vec_id % 10 >= 8"))
    GraphAnnIndex.maintain(spark, src, idx, at, M,
      beam = 32, hops = 3, entryCount = 8, cents = Some(cents)): Unit

    val live = TxLog.read(spark, src).select("vec_id", "embedding")
      .localCheckpoint(true)
    val edges = TxLog.read(spark, idx).localCheckpoint(true)
    val liveIds = live.select(col("vec_id"))
    // edges ⊆ live × live — no edge touches a deleted (or stale) id
    assert(edges.join(liveIds, edges("src") === liveIds("vec_id"), "left_anti")
      .count() === 0L, "edge with dead src")
    assert(edges.join(liveIds, edges("dst") === liveIds("vec_id"), "left_anti")
      .count() === 0L, "edge with dead dst")
    // every appended vector is wired in (has out-edges)
    val lateLive = live.where("vec_id % 10 >= 8").count()
    assert(edges.where("src % 10 >= 8").select("src").distinct().count() === lateLive)
    // degree cap: initial build allows m + 2 long links; re-pruned and
    // newly attached nodes sit at ≤ m
    val maxDeg = edges.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= M + 2, s"degree cap violated: $maxDeg")

    // recall: maintained within fixed slack of a full rebuild, vs truth
    // (queries one-in-nine of the live set — a dozen-query sample makes
    // recall@3 quantized in 1/36 steps and the pins noisy)
    val queries = live.where("vec_id % 9 = 1")
    val truth = Similarity.topK(live, queries, 3)
    val maintained = recall(GraphAnnIndex.searchTopK(spark, src, idx,
      queries, k = 3, beam = 32, hops = 3, entryCount = 8), truth)
    val rebuilt = recall(GraphAnn.searchTopK(live,
      GraphAnnIndex.buildFor(live, cents, M, rounds = 2), queries,
      k = 3, beam = 32, hops = 3, entryCount = 8), truth)
    // deterministic corpus + deterministic build/search ⇒ these recalls
    // are REPRODUCIBLE numbers, not statistics. Round 16 (one-hop
    // patch, exactly-m attach pool, no batch-internal wiring, M=6,
    // one NN-descent round, beam 16) measured 0.73 maintained vs 0.87
    // rebuilt on a dozen-query sample; round 17 (two-hop delete
    // consolidation, 2m attach pool, half-capped batch-internal
    // wiring, EXACT small-corpus builds, M=8, beam 32) measures
    // ~0.94 maintained vs ~0.99 rebuilt on the one-in-nine sample —
    // the pins below hold that gain and the ≤0.1 gap
    assert(rebuilt >= 0.85, s"rebuilt recall $rebuilt < 0.85 — corpus unfit")
    assert(maintained >= 0.8, s"maintained recall $maintained < 0.8 (rebuilt $rebuilt)")
    assert(maintained >= rebuilt - 0.1,
      s"maintained recall $maintained too far below rebuilt $rebuilt")
  }

  test("an UPDATE that changes vec_id under the same row id evicts the old node") {
    val r = root("gannidx-rekey"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = corpus()
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok.where("vec_id < 400"))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = GraphAnnIndex.initialize(spark, src, idx, cents, M, rounds = 1)
    // re-key a slice: the OLD vec_ids (x) exist only in the UPDATE
    // preimages — post-image-only eviction would leave their edges behind
    TxLog.update(spark, src, "vec_id % 11 = 4",
      Map("vec_id" -> "vec_id + 100000"))
    val res = GraphAnnIndex.maintain(spark, src, idx, at, M,
      beam = 16, hops = 3, entryCount = 8)
    assert(res.rowsApplied > 0L)
    val live = TxLog.read(spark, src).select("vec_id", "embedding")
      .localCheckpoint(true)
    val edges = TxLog.read(spark, idx).localCheckpoint(true)
    val liveIds = live.select(col("vec_id"))
    // the retired ids are fully evicted and the new ids are wired in
    assert(edges.join(liveIds, edges("src") === liveIds("vec_id"), "left_anti")
      .count() === 0L, "edge with retired src id")
    assert(edges.join(liveIds, edges("dst") === liveIds("vec_id"), "left_anti")
      .count() === 0L, "edge with retired dst id")
    val rekeyed = live.where("vec_id >= 100000").count()
    assert(rekeyed > 0L)
    assert(edges.where("src >= 100000").select("src").distinct().count() === rekeyed,
      "re-keyed nodes not wired in under their new ids")
  }

  test("streaming maintenance: the graph follows its source, replays are no-ops") {
    val r = root("gannidx-stream"); val src = s"$r/src"; val idx = s"$r/idx"
    val ckpt = s"$r/ckpt"
    val ok = corpus()
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok.where("vec_id % 10 < 8"))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = GraphAnnIndex.initialize(spark, src, idx, cents, M, rounds = 2)
    TxLog.update(spark, src, "vec_id % 13 = 2",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    TxLog.optimize(spark, src) // layout-only: empty batch, no graph commit
    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "vec_id % 7 = 3")
    TxLog.append(spark, src, ok.where("vec_id % 10 >= 8"))
    GraphAnnIndex.stream(spark, src, idx, ckpt, at, M,
      beam = 32, hops = 3, entryCount = 8, cents = Some(cents))
    // same invariants the batch path pins: edges ⊆ live×live, appended
    // nodes wired, degree cap
    val live = TxLog.read(spark, src).select("vec_id", "embedding")
      .localCheckpoint(true)
    val edges = TxLog.read(spark, idx).localCheckpoint(true)
    val liveIds = live.select(col("vec_id"))
    assert(edges.join(liveIds, edges("src") === liveIds("vec_id"), "left_anti")
      .count() === 0L, "edge with dead src")
    assert(edges.join(liveIds, edges("dst") === liveIds("vec_id"), "left_anti")
      .count() === 0L, "edge with dead dst")
    val lateLive = live.where("vec_id % 10 >= 8").count()
    assert(edges.where("src % 10 >= 8").select("src").distinct().count() === lateLive)
    val maxDeg = edges.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= M + 2, s"degree cap violated: $maxDeg")
    // the version-2 property commit (DV enable) is row-changeless and,
    // like the OPTIMIZE window, burns no graph commit: exactly one graph
    // commit per DML window on top of the initialize append
    val v = TxLog.latestVersion(idx)
    assert(v === 3L, s"exactly one graph commit per DML window, got $v")
    GraphAnnIndex.stream(spark, src, idx, ckpt, at, M,
      beam = 32, hops = 3, entryCount = 8, cents = Some(cents)) // replay
    assert(TxLog.latestVersion(idx) === v, "replayed pass must be a no-op")
  }

  test("probe recall monitor: eviction-only (lazy) maintenance trips; repaired does not") {
    val r = root("gannprobe"); val src = s"$r/src"
    val idxR = s"$r/idxr"; val idxL = s"$r/idxl"
    val band = 1000L
    val ok = corpus()
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = TxLog.latestVersion(src)
    // ONE build feeds both indexes: identical starting graph, so the
    // only difference between the two runs is the repair mode
    val g = GraphAnnIndex.buildFor(ok, cents, M, rounds = 1)
      .localCheckpoint(true)
    TxLog.append(spark, idxR, g): Unit
    TxLog.append(spark, idxL, g): Unit
    intercept[IllegalArgumentException](GraphAnnIndex.recallReport(idxR, band))
    Seq(idxR, idxL).foreach(ix => GraphAnnIndex.enableProbes(spark, src, ix,
      "vec_id % 37 = 2", k = 3, beam = 8, hops = 3, entryCount = 4))
    val base = GraphAnnIndex.recallReport(idxR, band)
    assert(base.pairs > 0L && base.dropBp === 0L && !base.tripped)
    // the delete-heavy window, maintained from the same feed twice
    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "vec_id % 3 = 0 AND vec_id % 37 <> 2")
    var atR = at; var atL = at
    atR = GraphAnnIndex.maintain(spark, src, idxR, atR, M, cents = Some(cents)).srcVersion
    atL = GraphAnnIndex.maintain(spark, src, idxL, atL, M, cents = Some(cents),
      repair = false).srcVersion
    TxLog.delete(spark, src, "vec_id % 3 = 1 AND vec_id % 37 <> 2")
    GraphAnnIndex.maintain(spark, src, idxR, atR, M, cents = Some(cents)): Unit
    GraphAnnIndex.maintain(spark, src, idxL, atL, M, cents = Some(cents),
      repair = false): Unit
    val rR = GraphAnnIndex.recallReport(idxR, band)
    val rL = GraphAnnIndex.recallReport(idxL, band)
    info(s"base=$base repaired=$rR lazy=$rL")
    // both benchmarks shrank identically (same feed): pairs whose
    // endpoint departed left the denominator, never the corpus
    assert(rR.pairs === rL.pairs && rR.pairs < base.pairs && rR.pairs > 0L)
    assert(!rR.tripped,
      s"repaired maintenance tripped the monitor: drop ${rR.dropBp} bp")
    assert(rL.tripped,
      s"eviction-only maintenance did not trip: drop ${rL.dropBp} bp")
    assert(rL.dropBp > rR.dropBp)
    // recallReport is a property read by construction (no SparkSession
    // in its signature — the driftReport discipline): the searches ran
    // inside the maintain passes, not here
  }

  test("append displacement: a strictly-closer arrival drops the stored truth pair") {
    val r = root("gannprobe-app"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = corpus().where("vec_id < 400").localCheckpoint(true)
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = GraphAnnIndex.initialize(spark, src, idx, cents, M, rounds = 1)
    GraphAnnIndex.enableProbes(spark, src, idx, "vec_id % 37 = 2",
      k = 3, beam = 8, hops = 3, entryCount = 4)
    val base = GraphAnnIndex.recallReport(idx, bandBp = 1000)
    // the probe under attack and its enable-time rank-3 truth pair —
    // the pair a strictly-closer arrival must push out of the top-3
    val probeId = ok.where("vec_id % 37 = 2").agg(min("vec_id")).head().getLong(0)
    val rank3 = Similarity.topK(ok, ok.where(s"vec_id = $probeId"), 3)
      .where("rank = 3").select("vec_id").head().getLong(0)
    // append a CLONE of the probe's own embedding under a fresh id:
    // cosine(q, clone) = 1 ranks ahead of every distinct neighbor, so
    // exactly q's rank-3 pair leaves the true top-3 — an append window
    // touches NO existing pair endpoint, which is precisely the case
    // endpoint-only invalidation missed (round-18 advice)
    TxLog.append(spark, src, TxLog.read(spark, src)
      .where(s"vec_id = $probeId")
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")))
    GraphAnnIndex.maintain(spark, src, idx, at, M,
      beam = 16, hops = 3, entryCount = 8, cents = Some(cents)): Unit
    val after = GraphAnnIndex.recallReport(idx, bandBp = 1000)
    assert(after.pairs < base.pairs,
      s"append displaced no pair: ${base.pairs} -> ${after.pairs}")
    // the surviving benchmark for q is exactly its top-2: rank 3 out,
    // ranks 1-2 (one closer arrival each: rank + 1 ≤ k) retained
    val truthProp = TxLog.snapshot(idx).props(GraphAnnIndex.Probe.Truth)
    val qPairs = truthProp.split(",").filter(_.nonEmpty)
      .map { s => val p = s.split(":"); (p(0).toLong, p(1).toLong) }
      .filter(_._1 == probeId).map(_._2).toSet
    assert(!qPairs.contains(rank3), s"displaced rank-3 pair $rank3 survived")
    assert(qPairs.size === 2, s"expected q's top-2 to survive, got $qPairs")
  }

  test("benchmark exhaustion: churn below the floor flags; rebuild + re-arm clears") {
    val r = root("gannprobe-exh"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = corpus().localCheckpoint(true)
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true",
      TxLog.DeletionVectors.Enabled -> "true"))
    var at = TxLog.latestVersion(src)
    TxLog.append(spark, idx, GraphAnnIndex.buildFor(ok, cents, M, rounds = 1)): Unit
    GraphAnnIndex.enableProbes(spark, src, idx, "vec_id % 37 = 2",
      k = 3, beam = 8, hops = 3, entryCount = 4)
    val base = GraphAnnIndex.recallReport(idx, bandBp = 1000)
    assert(!base.exhausted)
    // the published lazy-repair lifecycle, multi-window: eviction-only
    // windows accumulate decay the monitor must bound...
    var drops = Seq.empty[Long]
    for (m3 <- Seq(0, 1)) {
      TxLog.delete(spark, src, s"vec_id % 3 = $m3 AND vec_id % 37 <> 2")
      at = GraphAnnIndex.maintain(spark, src, idx, at, M, cents = Some(cents),
        repair = false).srcVersion
      drops :+= GraphAnnIndex.recallReport(idx, bandBp = 1000).dropBp
    }
    assert(drops(1) >= drops(0),
      s"lazy decay did not accumulate across windows: $drops")
    assert(GraphAnnIndex.recallReport(idx, bandBp = 1000).tripped,
      "accumulated lazy decay did not trip")
    // ...and churning the PROBES themselves exhausts the benchmark —
    // the monitor must SAY it stopped monitoring, not report baseline
    TxLog.delete(spark, src, "vec_id % 37 = 2 AND vec_id % 4 <> 3")
    at = GraphAnnIndex.maintain(spark, src, idx, at, M, cents = Some(cents),
      repair = false).srcVersion
    val exh = GraphAnnIndex.recallReport(idx, bandBp = 1000)
    assert(exh.pairs * 100L < base.pairs * 25L,
      s"churn left ${exh.pairs} of ${base.pairs} pairs — test premise broken")
    assert(exh.exhausted, "decayed benchmark not flagged exhausted")
    // the lifecycle's repair leg: REBUILD the graph at the churned head
    // and re-arm — the monitor returns to a full, quiet benchmark
    val live = TxLog.read(spark, src).select("vec_id", "embedding")
      .where(expr(Similarity.validEmbExpr(graft.queries.SparkSql, "embedding")))
      .localCheckpoint(true)
    TxLog.overwrite(spark, idx, GraphAnnIndex.buildFor(live, cents, M, rounds = 1)): Unit
    GraphAnnIndex.enableProbes(spark, src, idx, "vec_id % 37 = 2",
      k = 3, beam = 8, hops = 3, entryCount = 4)
    val rearmed = GraphAnnIndex.recallReport(idx, bandBp = 1000)
    assert(!rearmed.exhausted && !rearmed.tripped && rearmed.dropBp === 0L)
    assert(rearmed.pairs > 0L)
  }

  test("streamed windows with probes enabled: refresh is replay-safe via the AsOf cursor") {
    val r = root("gannprobe-stream"); val src = s"$r/src"; val idx = s"$r/idx"
    val ckpt = s"$r/ckpt"
    val ok = corpus().where("vec_id < 400").localCheckpoint(true)
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = GraphAnnIndex.initialize(spark, src, idx, cents, M, rounds = 1)
    GraphAnnIndex.enableProbes(spark, src, idx, "vec_id % 37 = 2",
      k = 3, beam = 8, hops = 3, entryCount = 4)
    TxLog.update(spark, src, "vec_id % 13 = 2",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val v0 = TxLog.latestVersion(idx)
    GraphAnnIndex.stream(spark, src, idx, ckpt, at, M,
      beam = 16, hops = 3, entryCount = 8, cents = Some(cents))
    val v1 = TxLog.latestVersion(idx)
    // a probe-enabled streamed window is merge + probe refresh — two
    // commits by design (the refresh must search the POST-merge graph)
    assert(v1 - v0 === 2L, s"expected merge + refresh, got ${v1 - v0} commits")
    val props1 = TxLog.snapshot(idx).props
    assert(props1(GraphAnnIndex.Probe.AsOf).toLong === TxLog.latestVersion(src))
    GraphAnnIndex.stream(spark, src, idx, ckpt, at, M,
      beam = 16, hops = 3, entryCount = 8, cents = Some(cents)) // replay
    // the replayed batch skips the merge (txn tag) AND the refresh
    // (AsOf already at the window's version): zero commits, stable props
    assert(TxLog.latestVersion(idx) === v1, "replayed pass committed")
    assert(TxLog.snapshot(idx).props === props1)
  }

  test("a delete-only window against a never-initialized index is a clean no-op") {
    val r = root("gannidx-noinit"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = corpus()
    TxLog.append(spark, src, ok.where("vec_id < 60"))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true",
      TxLog.DeletionVectors.Enabled -> "true"))
    val at = TxLog.latestVersion(src)
    TxLog.delete(spark, src, "vec_id % 2 = 0")
    // all-delete window, no graph yet: plans nothing, commits nothing,
    // and the probe check must not touch the nonexistent index table
    val res = GraphAnnIndex.maintain(spark, src, idx, at, M)
    assert(res.rowsApplied > 0L && !res.layoutOnlySkip)
    assert(TxLog.latestVersion(idx) === -1L, "no index table may appear")
  }

  test("a delete-only window leaves the survivors' graph searchable") {
    val r = root("gannidx-del"); val src = s"$r/src"; val idx = s"$r/idx"
    val ok = corpus()
    val cents = ok.where("vec_id % 100 = 7")
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      .localCheckpoint(true)
    TxLog.append(spark, src, ok)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = GraphAnnIndex.initialize(spark, src, idx, cents, M, rounds = 1)
    TxLog.delete(spark, src, "vec_id % 3 = 1")
    val res = GraphAnnIndex.maintain(spark, src, idx, at, M)
    assert(res.rowsApplied > 0L)
    val live = TxLog.read(spark, src).select("vec_id", "embedding")
    val found = GraphAnnIndex.searchTopK(spark, src, idx,
      live.where("vec_id < 9"), k = 3)
    // no deleted id can surface as a result (its edges are gone)
    assert(found.where("vec_id % 3 = 1").count() === 0L)
    assert(found.count() > 0L)
  }
}
