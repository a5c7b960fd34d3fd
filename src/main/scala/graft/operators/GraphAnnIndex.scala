package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TxLog
import graft.sources.TxLog.{WhenMatchedDelete, WhenMatchedUpdate, WhenNotMatchedInsert}

/** INCREMENTAL k-NN graph maintenance — the FreshDiskANN discipline
  * (Singh et al. 2021, arXiv:2105.09613) re-expressed over the change
  * feed: the last of the three ANN tiers whose index was rebuild-only.
  *
  * Unlike IVF cells and PQ codes, graph edges are CORPUS-dependent, so
  * a maintained graph is NOT bit-identical to a rebuilt one — published
  * streaming-ANN systems accept that and maintain quality instead:
  * new vectors wire in by SEARCHING the existing graph (their best
  * beam-search results become their out-edges, and reverse edges
  * attach them to the graph with the touched nodes re-pruned to the
  * degree cap); deletes propagate by key. The spec therefore pins
  * INVARIANTS (edges ⊆ live×live, new nodes wired, degree caps) and
  * RECALL (maintained-graph search vs brute force, within a fixed
  * slack of the rebuilt graph on a deterministic corpus), not byte
  * equality — [[IvfIndex]]/[[PqIndex]] carry the bit-exact story for
  * the tiers where it exists.
  *
  * A window's whole graph surgery — eviction of every edge touching a
  * changed id, the delete-consolidation patch, the beam-search attach,
  * the degree re-prune — is PLANNED against DataFrame views of the
  * pre-window graph and applied as ONE keyed MERGE on (src, dst): the
  * IvfIndex/RowIdView one-commit-per-window discipline, which is also
  * what makes [[stream]]'s txn-tagged exactly-once possible (a replayed
  * micro-batch is one skipped merge, not four half-replayed commits).
  * Every step is delta-proportional and distributed: eviction is keyed
  * anti-joins, the attach searches only the batch's vectors (cost ∝
  * batch × beam·hops — never the corpus), the re-prune touches only
  * edge-gaining nodes. Edges live in a TxLog table (src, dst, cosine);
  * versioned, time-travelable, vacuumable like every other table. */
object GraphAnnIndex {

  final case class MaintainResult(srcVersion: Long, rowsApplied: Long,
      layoutOnlySkip: Boolean)

  /** Property keys of the RECALL monitor ([[enableProbes]] /
    * [[recallReport]]) — the graph tier's staleness signal. IVF/PQ
    * freeze a quantizer and watch assignment quality decay
    * ([[IvfIndex.driftReport]]); the graph tier has no quantizer, and
    * its failure mode is different: maintenance is NOT bit-exact, so
    * recall can decay silently across windows. The monitor freezes a
    * small PROBE BENCHMARK instead: a deterministic probe set and its
    * EXACT top-k truth, stamped at [[enableProbes]] time (the one
    * corpus-sized scoring pass, like the IVF baseline), then
    * delta-maintained — a window's touched ids invalidate exactly the
    * pairs they touch (no corpus rescan, ever), and the maintained
    * graph re-searches ONLY the probes (cost ∝ probes · beam · degree ·
    * hops, corpus-independent). [[recallReport]] itself is an O(1)
    * driver-side property read, the driftReport discipline. */
  object Probe {
    val Ids = "graft.gann.probe.ids"     // probe vec_ids, comma-joined
    val Truth = "graft.gann.probe.truth" // surviving truth pairs "q:v,…"
    val Conf = "graft.gann.probe.conf"   // "k,beam,hops,entryCount"
    val Base = "graft.gann.probe.base"   // "hits:pairs" at enable time
    val Last = "graft.gann.probe.last"   // "hits:pairs" after last window
    val AsOf = "graft.gann.probe.asof"   // source version the state reflects
  }

  /** [[recallReport]]'s verdict: probe recall in integer basis points
    * at enable time vs after the last maintained window, the drop, the
    * surviving benchmark size, the band verdict, and the EXHAUSTION
    * signal — churn only ever shrinks the benchmark, and a monitor
    * whose pair list decayed below usefulness must SAY so instead of
    * quietly reporting the baseline forever ([[recallReport]]'s
    * floor). */
  final case class RecallReport(baseRecallBp: Long, recallBp: Long,
      dropBp: Long, pairs: Long, tripped: Boolean, exhausted: Boolean)

  private def validPred = coalesce(expr(
    Similarity.validEmbExpr(graft.queries.SparkSql, "embedding")), lit(false))

  /** The graph build [[initialize]] uses, size-dispatched on
    * [[GraphAnn.DefaultMaxCellSize]] (the ONE shared constant — also
    * the bucketed builder's cell cap and the batch-internal wiring's
    * dispatch bound, so the exact path's broadcast cross-join can
    * never run at a size the cell contract didn't admit): a corpus
    * within one cell's worth of vectors gets the EXACT k-NN graph +
    * long links ([[GraphAnn.exactKnnGraph]] — a handful of stages, and
    * exact ≥ any approximation); larger corpora take the seeded
    * NN-descent builder, the never-all-pairs scale path. Public so
    * rebuilt-vs-maintained comparisons can use the IDENTICAL build.
    * `knownCount` skips the size-probe job when the caller already
    * counted the corpus (`rounds` only reaches the bucketed path —
    * the exact graph has nothing to refine). */
  def buildFor(live: DataFrame, cents: DataFrame, m: Int,
      rounds: Int, knownCount: Option[Long] = None): DataFrame =
    if (knownCount.getOrElse(live.count()) <= GraphAnn.DefaultMaxCellSize)
      GraphAnn.exactKnnGraph(live, m)
    else GraphAnn.buildKnnGraph(live, cents, m, rounds)

  /** Full initial build ([[buildFor]]) at the source's current
    * version. Returns the version the graph reflects. */
  def initialize(spark: SparkSession, srcDir: String, indexDir: String,
      cents: DataFrame, m: Int, rounds: Int): Long = {
    val v = TxLog.latestVersion(srcDir)
    val live = TxLog.read(spark, srcDir, Some(v))
      .select("vec_id", "embedding")
    TxLog.append(spark, indexDir, buildFor(live, cents, m, rounds)): Unit
    v
  }

  /** The LAST change image per tracked row id of a feed window
    * (update preimages excluded — they matter only for eviction keys,
    * see [[planEdits]]). */
  private def lastImages(feed: DataFrame, idCol: String): DataFrame = feed
    .where(col(TxLog.ChangeTypeCol) =!= "update_preimage")
    .withColumn("__rn", row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col("_commit_version").desc)))
    .where(col("__rn") === 1)

  /** Every vec_id a window touches: last post-images plus UPDATE
    * preimages (a re-key retires its old id through the preimage only).
    * Shared by [[planEdits]]' eviction and the probe benchmark's
    * delta-invalidation so they cannot diverge. */
  private def touchedOf(last: DataFrame, feed: DataFrame): DataFrame = last
    .select("vec_id")
    .unionByName(feed.where(col(TxLog.ChangeTypeCol) === "update_preimage")
      .select("vec_id"))
    .distinct()

  /** Plan one window's edge edits against the CURRENT graph, as a
    * single (src, dst)-keyed merge source with `__ga_act` ∈
    * {delete, upsert}:
    *  1. the delete-consolidation patch (FreshDiskANN's repair — without
    *     it the graph fragments and recall collapses): every surviving
    *     in-neighbor of a departing node inherits candidate edges to
    *     its surviving out-neighbors, scored exact — including TWO-HOP
    *     inheritance through a chain of departing nodes (x → t → t2 → y,
    *     t and t2 both departing), so adjacent removals in one batch
    *     cannot sever every path that ran through the pair;
    *  2. eviction of every edge touching a changed id — including the
    *     UPDATE PREIMAGES' vec_ids: an update that changes a row's
    *     vec_id under the same tracked id retires the OLD node, whose
    *     id appears only in the preimage;
    *  3. the attach: each upserted vector beam-searches the SURVIVING
    *     graph view (candidate pool 2m — the RobustPrune discipline:
    *     wider exact-scored discoverability at the same final degree);
    *  4. batch-internal wiring when `cents` is given: a batch's beam
    *     searches all run against the PRE-batch graph, so new↔new
    *     neighborhoods would never form from search results alone (the
    *     sequential-insert property FreshDiskANN gets for free); the
    *     bucketed builder wires the batch against itself, HALF-CAPPED
    *     so these edges cannot crowd the old↔new bridges out of the m
    *     slots (measured: un-capped they lower recall);
    *  5. the degree re-prune of every edge gainer over existing ∪ new,
    *     top-m by cosine.
    * Work ∝ |batch| · degree², never the graph. */
  private def planEdits(last: DataFrame, feed: DataFrame, liveRaw: => DataFrame,
      g0: Option[DataFrame], m: Int, beam: Int, hops: Int, entryCount: Int,
      idCol: String, cents: Option[DataFrame], newCount: Long,
      repair: Boolean = true): DataFrame = {
    val spark = last.sparkSession
    // live corpus view — LAZY: only the repair patch's scoring and the
    // attach search read it, so a repair-off arrivals-free window (the
    // monitor's hot case) never pays the corpus read/checkpoint at all
    lazy val live = liveRaw.localCheckpoint(true)
    // checkpointed only when the window reads it more than twice (the
    // repair patch and the attach machinery); the delete-only eviction
    // path reads it exactly twice through IDENTICAL distinct subtrees,
    // which exchange reuse computes once — the eager checkpoint there
    // was a pure extra job
    val touched = {
      val t = touchedOf(last, feed)
      if (repair || newCount > 0L) t.localCheckpoint(true) else t
    }
    // 1. consolidation patch from the PRE-eviction graph — skipped in
    //    EVICTION-ONLY mode (repair = false): the lazy-repair trade
    //    published with the method (cheaper delete windows, decaying
    //    recall) that [[recallReport]]'s probe monitor exists to bound
    val patch: Option[DataFrame] = if (!repair) None else g0.map { g =>
      val tid = touched
      val inN = g.join(tid.select(col("vec_id").as("dst")), Seq("dst"))
        .select(col("src").as("x"), col("dst").as("t"))
        .join(tid.select(col("vec_id").as("x")), Seq("x"), "left_anti")
      val depOut = g.join(tid.select(col("vec_id").as("src")), Seq("src"))
        .select(col("src").as("t"), col("dst").as("y"))
      val outSurv = depOut
        .join(tid.select(col("vec_id").as("y")), Seq("y"), "left_anti")
      val outDep = depOut
        .join(tid.select(col("vec_id").as("y")), Seq("y"), "left_semi")
      val outTwoHop = outDep.select(col("t"), col("y").as("t2"))
        .join(outSurv.select(col("t").as("t2"), col("y")), Seq("t2"))
        .select("t", "y")
      val outN = outSurv.select("t", "y").unionByName(outTwoHop).distinct()
      val pairs = inN.join(outN, Seq("t"))
        .where(col("x") =!= col("y"))
        .select(col("x").as("src"), col("y").as("dst")).distinct()
      // no checkpoint: the patch is consumed exactly once (folded into
      // the gained-union's own materialization)
      pairs
        .join(live.select(col("vec_id").as("src"), col("embedding").as("__se")), Seq("src"))
        .join(live.select(col("vec_id").as("dst"), col("embedding").as("__de")), Seq("dst"))
        .selectExpr("src", "dst", "cosine_sim(__se, __de) AS cosine")
    }
    // 2. the surviving-graph VIEW (eviction applied logically; the
    //    physical deletes ride the single merge below) — LAZY: an
    //    arrivals-free repair-off window (the monitor's hot case) has
    //    no consumer for it, so its checkpoint job and the exchange
    //    materializations inside it are skipped outright (§2.4)
    lazy val gSurv: Option[DataFrame] = g0.map(
      _.join(touched.select(col("vec_id").as("src")), Seq("src"), "left_anti")
        .join(touched.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
        .select("src", "dst", "cosine").localCheckpoint(true))
    // 3. attach: search the surviving graph for each new vector's
    //    neighborhood — batch-sized queries, never a corpus pass.
    //    `newCount` arrives from the caller (it rides the change-set
    //    checkpoint as an observe metric), so the emptiness gate costs
    //    no job here and an arrivals-free window checkpoints nothing
    val nvOpt =
      if (newCount == 0L) None
      else Some(last
        .where(col(TxLog.ChangeTypeCol) =!= "delete" && validPred)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true))
    val attach: Seq[DataFrame] = (gSurv, nvOpt) match {
      case (Some(g), Some(nv)) =>
        val cand = GraphAnn.searchTopK(live, g, nv,
          k = 2 * m, beam = beam, hops = hops, entryCount = entryCount)
          .localCheckpoint(true)
        Seq(cand.select(col("q_id").as("src"), col("vec_id").as("dst"), col("cosine")),
          cand.select(col("vec_id").as("src"), col("q_id").as("dst"), col("cosine")))
      case _ => Nil
    }
    // 4. batch-internal wiring, half-capped (see scaladoc). Size
    //    dispatch: a batch within one cell's worth of vectors gets its
    //    EXACT top-half neighbors from one broadcast cross-join (two
    //    stages, and exact ≥ the bucketed approximation it replaces —
    //    measured: the bucketed builder's ~10-stage program dominated
    //    window wall time at batch sizes it was never needed for);
    //    larger batches take the bucketed builder, the never-all-pairs
    //    scale path.
    val batchInternal: Option[DataFrame] = (cents, nvOpt) match {
      case (Some(c), Some(nv)) =>
        val half = math.max(1, m / 2)
        val edges =
          if (newCount <= GraphAnn.DefaultMaxCellSize)
            Similarity.topK(nv, nv, half)
              .select(col("q_id").as("src"), col("vec_id").as("dst"),
                col("cosine"))
          else GraphAnn.buildKnnGraph(nv, c, half, rounds = 1)
            .withColumn("__rn", row_number().over(
              Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))))
            .where(col("__rn") <= half).drop("__rn")
        // no checkpoint: consumed exactly once by the gained-union's own
        // materialization below (same rule as the patch — an eager
        // checkpoint here was one pure extra scheduled job per window;
        // its inputs `nv` are already checkpointed, and the exact path
        // is two stages over a broadcast)
        Some(edges)
      case _ => None
    }
    // 5. degree re-prune for every edge gainer; a node can gain through
    //    several branches in one batch, so the cap binds on the UNION
    val fwd = attach.headOption
    val gained = (attach.drop(1) ++ patch.toSeq ++ batchInternal.toSeq)
      .reduceOption(_ unionByName _)
    // (src, dst) dedup BEFORE the cap: the same logical edge can arrive
    // from several branches at slightly different cosines (search
    // results round to 6 dp; patch/batch edges score raw) — keep the
    // best score so the merge source is key-unique
    def capped(df: DataFrame): DataFrame = df
      .groupBy("src", "dst").agg(max("cosine").as("cosine"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))))
      .where(col("__rn") <= m).drop("__rn")
    val empty = last.select(col("vec_id").as("src"),
      col("vec_id").as("dst"), lit(0.0).as("cosine")).limit(0)
    val (desired, affected) = gained match {
      case Some(extra0) =>
        val extra = extra0.localCheckpoint(true)
        val aff = (Seq(extra.select("src")) ++ fwd.map(_.select("src")).toSeq)
          .reduce(_ unionByName _).distinct().localCheckpoint(true)
        val existing = gSurv.map(_.join(aff, Seq("src"), "left_semi"))
          .getOrElse(empty)
        (capped(fwd.fold(existing.unionByName(extra))(
          _ unionByName existing.unionByName(extra))).localCheckpoint(true), aff)
      case None =>
        (fwd.map(f => capped(f).localCheckpoint(true)).getOrElse(empty),
          fwd.map(_.select("src").distinct()).getOrElse(empty.select("src")))
    }
    // merge source: deletions = evicted edges + affected srcs' surviving
    // edges not re-stated by the re-prune; upserts = the desired state
    // of every affected src. Upserts win key collisions (a deleted
    // (src,dst) that the new state re-creates is just an update).
    val dels0 = g0.map { g =>
      val evict =
        g.join(touched.select(col("vec_id").as("src")), Seq("src"), "left_semi")
          .unionByName(
            g.join(touched.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
              .select("src", "dst", "cosine"))
      // the restate branch re-deletes surviving edges the re-prune did
      // not re-state; with no attach and no gained edges `affected` is
      // provably empty, so the branch (and gSurv, its only remaining
      // consumer on that path) is skipped
      val withRestate =
        if (fwd.isEmpty && gained.isEmpty) evict
        else evict.unionByName(
          gSurv.get.join(affected, Seq("src"), "left_semi"))
      withRestate.select("src", "dst").distinct()
    }.getOrElse(empty.select("src", "dst"))
    val ups = desired.withColumn("__ga_act", lit("upsert"))
    val dels = dels0.join(ups.select("src", "dst"), Seq("src", "dst"), "left_anti")
      .withColumn("cosine", lit(null).cast("double"))
      .withColumn("__ga_act", lit("delete"))
    ups.unionByName(dels.select("src", "dst", "cosine", "__ga_act"))
  }

  private val mergeClauses: Seq[TxLog.MergeClause] = Seq(
    WhenMatchedDelete(Some("s.__ga_act = 'delete'")),
    WhenMatchedUpdate(Some("s.__ga_act = 'upsert'"), Map("cosine" -> "s.cosine")),
    WhenNotMatchedInsert(Some("s.__ga_act = 'upsert'"), Map(
      "src" -> "s.src", "dst" -> "s.dst", "cosine" -> "s.cosine")))

  /** Apply the source's changes in `(fromExclusive, latest]` as ONE
    * (src, dst)-keyed merge planned by [[planEdits]]. Pass the frozen
    * quantizer as `cents` to enable batch-internal wiring (recommended
    * for append-heavy sources — see [[planEdits]] step 4).
    * `repair = false` is EVICTION-ONLY maintenance: the delete-
    * consolidation patch is skipped — cheaper delete-heavy windows at
    * the price of decaying recall, which the [[enableProbes]] monitor
    * exists to bound (the published lazy-repair trade; FreshDiskANN
    * batches its consolidation for the same reason). */
  def maintain(spark: SparkSession, srcDir: String, indexDir: String,
      fromExclusive: Long, m: Int, beam: Int = 8, hops: Int = 2,
      entryCount: Int = 4, idCol: String = "_row_id",
      cents: Option[DataFrame] = None,
      repair: Boolean = true): MaintainResult = {
    val to = TxLog.latestVersion(srcDir)
    if (to <= fromExclusive)
      return MaintainResult(to, 0L, layoutOnlySkip = false)
    if (!TxLog.hasRowChanges(srcDir, fromExclusive, to))
      return MaintainResult(to, 0L, layoutOnlySkip = true)
    val feed = TxLog.readChangeFeed(spark, srcDir, fromExclusive, Some(to))
    // localCheckpoint, not cache: these frames carry embedding arrays,
    // and DataFrame caching pays columnar encode/decode on array
    // columns where the checkpoint stores raw rows (measured slower
    // suite-wide when cache was tried — r19 run 1). The emptiness gate
    // AND the arrivals count ride the checkpoint as observe metrics —
    // the separate count job per window is gone (§2.4)
    val obsL = org.apache.spark.sql.Observation()
    val last = lastImages(feed, idCol)
      .observe(obsL, count(lit(1)).as("n"),
        count(when(col(TxLog.ChangeTypeCol) =!= "delete" && validPred, 1))
          .as("arrivals"))
      .localCheckpoint(true)
    val mL = obsL.get
    val applied = mL("n").asInstanceOf[Long]
    if (applied == 0L) return MaintainResult(to, 0L, layoutOnlySkip = false)
    // passed by name — planEdits checkpoints it lazily (see there)
    def live = TxLog.read(spark, srcDir, Some(to))
      .select("vec_id", "embedding")
    val g0 = if (TxLog.latestVersion(indexDir) < 0) None
      else Some(TxLog.read(spark, indexDir).select("src", "dst", "cosine"))
    // the edits emptiness gate rides the checkpoint the same way
    val obsE = org.apache.spark.sql.Observation()
    val edits = planEdits(last, feed, live, g0, m, beam, hops, entryCount,
      idCol, cents, mL("arrivals").asInstanceOf[Long], repair)
      .observe(obsE, count(lit(1)).as("n"))
      .localCheckpoint(true)
    if (obsE.get("n").asInstanceOf[Long] > 0L) {
      if (g0.isEmpty)
        TxLog.append(spark, indexDir,
          edits.where(col("__ga_act") === "upsert")
            .select("src", "dst", "cosine")): Unit
      else
        TxLog.mergeClauses(spark, indexDir, edits, Seq("src", "dst"),
          mergeClauses): Unit
    }
    if (TxLog.latestVersion(indexDir) >= 0 &&
        TxLog.snapshot(indexDir).props.contains(Probe.Conf))
      refreshProbes(spark, srcDir, indexDir, to)
    MaintainResult(to, applied, layoutOnlySkip = false)
  }

  /** HANDS-FREE maintenance — the [[IvfIndex.stream]] symmetry for the
    * graph tier: a foreachBatch consumer of the source's CDF stream
    * applies [[planEdits]]' exact derivation per micro-batch through
    * the txn-tagged [[TxLog.mergeClausesBatch]], so a batch replayed
    * across a checkpoint restart is SKIPPED without staging
    * (exactly-once — possible precisely because a window is ONE merge).
    * Attach searches score against the source's HEAD corpus: a vector
    * retired by a still-pending later window simply cannot be scored
    * yet, and that window's own eviction restores the invariant when it
    * arrives. Call after [[initialize]]; layout-only source windows
    * arrive as EMPTY batches and commit nothing. One AvailableNow pass
    * per call. */
  def stream(spark: SparkSession, srcDir: String, indexDir: String,
      ckptDir: String, initializedAt: Long, m: Int, beam: Int = 8,
      hops: Int = 2, entryCount: Int = 4, idCol: String = "_row_id",
      cents: Option[DataFrame] = None,
      appId: String = "graphannindex"): Unit = {
    val q = spark.readStream.format("txlog").option("path", srcDir)
      .option("readChangeFeed", "true")
      .option("startingVersion", (initializedAt + 1).toString)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // the emptiness gate, the batch's end version (the probe
        // cursor's upTo — bounded by the BATCH, not the source head,
        // so a backlogged stream refreshes window-by-window against
        // the graph state each merge produced) AND the arrivals count
        // all ride the checkpoint as observe metrics — the separate
        // agg job per micro-batch is gone (§2.4)
        val obsB = org.apache.spark.sql.Observation()
        val last = lastImages(batch, idCol)
          .observe(obsB, count(lit(1)).as("n"),
            max(col("_commit_version")).as("v"),
            count(when(col(TxLog.ChangeTypeCol) =!= "delete" && validPred, 1))
              .as("arrivals"))
          .localCheckpoint(true)
        val mB = obsB.get
        if (mB("n").asInstanceOf[Long] > 0L) {
          // by name — planEdits checkpoints it lazily (see there)
          def live = TxLog.read(s, srcDir, Some(TxLog.latestVersion(srcDir)))
            .select("vec_id", "embedding")
          val g0 = if (TxLog.latestVersion(indexDir) < 0) None
            else Some(TxLog.read(s, indexDir).select("src", "dst", "cosine"))
          val obsE = org.apache.spark.sql.Observation()
          val edits = planEdits(last, batch, live, g0, m, beam, hops,
            entryCount, idCol, cents, mB("arrivals").asInstanceOf[Long])
            .observe(obsE, count(lit(1)).as("n"))
            .localCheckpoint(true)
          if (obsE.get("n").asInstanceOf[Long] > 0L)
            TxLog.mergeClausesBatch(s, indexDir, edits, Seq("src", "dst"),
              mergeClauses, appId, batchId): Unit
          // replay-safe by the AsOf cursor: a replayed batch (merge
          // skipped above) finds AsOf already at its version and
          // commits nothing — the probe plane inherits the merge's
          // exactly-once (a probe-enabled window is merge + refresh,
          // two commits; the REFRESH is idempotent, the merge tagged)
          if (TxLog.latestVersion(indexDir) >= 0 &&
              TxLog.snapshot(indexDir).props.contains(Probe.Conf))
            refreshProbes(s, srcDir, indexDir, mB("v").asInstanceOf[Long])
        }
      }
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Search the maintained graph — [[GraphAnn.searchTopK]] over the
    * edge table and the live source. */
  def searchTopK(spark: SparkSession, srcDir: String, indexDir: String,
      queries: DataFrame, k: Int, beam: Int = 8, hops: Int = 2,
      entryCount: Int = 4): DataFrame =
    GraphAnn.searchTopK(
      TxLog.read(spark, srcDir).select("vec_id", "embedding"),
      TxLog.read(spark, indexDir).select("src", "dst", "cosine"),
      queries, k, beam, hops, entryCount)

  /** Stamp the probe benchmark (see [[Probe]]): probes = the live rows
    * matching `probePred` (a SMALL deterministic set — the benchmark
    * lives in the table's property plane), truth = their exact top-`k`
    * over the live corpus (the one corpus-sized scoring pass, paid at
    * enable time exactly like [[IvfIndex.initialize]]'s drift
    * baseline), base = the maintained graph's probe recall right now.
    * Re-run after a rebuild to re-arm a churned-out benchmark. The
    * truth collect is bounded by the ≤ 512-pair contract below. */
  def enableProbes(spark: SparkSession, srcDir: String, indexDir: String,
      probePred: String, k: Int, beam: Int = 8, hops: Int = 2,
      entryCount: Int = 4): Unit = {
    val v = TxLog.latestVersion(srcDir)
    val live = TxLog.read(spark, srcDir, Some(v)).select("vec_id", "embedding")
      .where(validPred).localCheckpoint(true)
    val probes = live.where(probePred)
    val truth = Similarity.topK(live, probes, k).select("q_id", "vec_id")
    val pairs = truth.limit(513).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    require(pairs.nonEmpty, s"enableProbes: no live row matches '$probePred'")
    require(pairs.length <= 512,
      s"enableProbes: over 512 truth pairs — the benchmark rides the " +
        "property plane; pick a smaller probe set")
    val ids = pairs.map(_._1).distinct
    val hits = searchHits(spark, srcDir, Some(v), indexDir, ids, pairs, k,
      beam, hops, entryCount)
    val packed = s"$hits:${pairs.length}"
    TxLog.setProperties(indexDir, Map(
      Probe.Ids -> ids.mkString(","),
      Probe.Truth -> pairs.map(p => s"${p._1}:${p._2}").mkString(","),
      Probe.Conf -> s"$k,$beam,$hops,$entryCount",
      Probe.Base -> packed, Probe.Last -> packed,
      Probe.AsOf -> v.toString)): Unit
  }

  /** The probes' beam-search hit count against `pairs` — cost ∝
    * |probes| · beam · degree · hops, never the corpus (the searches
    * join live vectors BY KEY to score frontier candidates; no
    * corpus-sized scoring pass exists on this path). `srcVersion` pins
    * the live view to the version the probe state reflects. */
  private def searchHits(spark: SparkSession, srcDir: String,
      srcVersion: Option[Long], indexDir: String, ids: Seq[Long],
      pairs: Seq[(Long, Long)], k: Int, beam: Int, hops: Int,
      entryCount: Int): Long = {
    val live = TxLog.read(spark, srcDir, srcVersion).select("vec_id", "embedding")
    val res = GraphAnn.searchTopK(live,
      TxLog.read(spark, indexDir).select("src", "dst", "cosine"),
      live.where(col("vec_id").isin(ids: _*)), k, beam, hops, entryCount)
    // the result is ≤ |ids| · k rows and ids ride the ≤ 512-pair probe
    // contract, so the hit count is a bounded driver fold over ONE
    // collect — the old intersect().count() paid an extra aggregate +
    // join (2–3 exchanges, each an AQE materialization job) per search
    val want = pairs.toSet
    res.select("q_id", "vec_id").collect()
      .count(r => want((r.getLong(0), r.getLong(1)))).toLong
  }

  /** Delta-maintain the probe benchmark through the windows in
    * `(Probe.AsOf, upTo]` of the SOURCE's change feed — called after a
    * window's merge, but deriving everything from the property plane's
    * own cursor, which buys three guarantees the old
    * pass-the-touched-frame shape could not give:
    *  - REPLAY-SAFE / SELF-HEALING: a replayed stream batch finds
    *    AsOf already at its version and commits nothing; a crash
    *    between a merge and its refresh is healed by the NEXT
    *    window's refresh, which covers both windows' feed range.
    *  - CAS-CORRECT: the whole derivation (invalidation, displacement,
    *    re-search) runs INSIDE the [[TxLog.transformProperties]]
    *    closure against the head props — a concurrent
    *    enableProbes/refresh makes this attempt re-derive, never
    *    silently overwrite.
    *  - APPEND-AWARE: endpoint invalidation covers removals and moves;
    *    an APPENDED vector near a probe displaces stored pairs from
    *    the true top-k without touching any existing pair, so pairs a
    *    strictly-closer new neighbor pushes below rank k are dropped
    *    too (scored probes × changed-rows — delta-sized), keeping
    *    "surviving pairs are genuine top-k members" true on
    *    append-heavy feeds.
    * Work per refresh: the tiny pair list (≤ 512 by contract) joined
    * by key, the window's changed rows, and probe-only beam searches —
    * no corpus-sized scoring pass, ever. */
  private def refreshProbes(spark: SparkSession, srcDir: String,
      indexDir: String, upTo: Long): Unit = {
    import spark.implicits._
    TxLog.transformProperties(indexDir) { props =>
      val conf = props.get(Probe.Conf).map(_.split(",").map(_.toInt))
      val asOf = props.get(Probe.AsOf).map(_.toLong)
      val pairs0 = props.get(Probe.Truth).toSeq.flatMap(_.split(","))
        .filter(_.nonEmpty)
        .map { s => val p = s.split(":"); (p(0).toLong, p(1).toLong) }
      if (conf.isEmpty || asOf.isEmpty || pairs0.isEmpty ||
          upTo <= asOf.get) Map.empty
      else {
        val Array(k, beam, hops, entryCount) = conf.get
        val feed = TxLog.readChangeFeed(spark, srcDir, asOf.get, Some(upTo))
        // every vec_id the windows touched, preimages included (a
        // re-key retires its old id through the preimage only) — a
        // changed id ends its pairs' validity on either endpoint; the
        // arrivals flag rides the same checkpoint as an observe metric
        // (was a separate limit(1).count job per refresh)
        val obsT = org.apache.spark.sql.Observation()
        val t = feed
          .observe(obsT, count(when(
            col(TxLog.ChangeTypeCol) === "insert" ||
              col(TxLog.ChangeTypeCol) === "update_postimage", 1)).as("arr"))
          .select(col("vec_id")).distinct().localCheckpoint(true)
        val survDf = pairs0.toDF("q_id", "vec_id")
          .join(t.select(col("vec_id").as("q_id")), Seq("q_id"), "left_anti")
          .join(t, Seq("vec_id"), "left_anti")
        // delete-only windows skip the displacement machinery: a
        // departure never displaces (removals only promote survivors),
        // so endpoint invalidation alone is exact — one small probe
        // job instead of the scoring DAG (the monitor's hot case:
        // eviction-heavy feeds are what it exists to bound)
        val hasArrivals = obsT.get("arr").asInstanceOf[Long] > 0L
        val surv = if (!hasArrivals)
          survDf.select("q_id", "vec_id").as[(Long, Long)].collect().toSeq.sorted
        else {
          // displacement: the post-window images of the changed ids,
          // scored against every surviving probe (|probes| × |delta| —
          // never the corpus); a pair pushed below rank k by
          // strictly-closer arrivals is out of the true top-k
          val live = TxLog.read(spark, srcDir, Some(upTo))
            .select("vec_id", "embedding").where(validPred)
          val arrived = live.join(t, Seq("vec_id"), "left_semi")
            .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
          val qEmb = live.select(col("vec_id").as("q_id"),
            col("embedding").as("q_emb"))
          val vEmb = live.select(col("vec_id").as("vec_id"),
            col("embedding").as("v_emb"))
          val scored = survDf.join(qEmb, Seq("q_id")).join(vEmb, Seq("vec_id"))
            .selectExpr("q_id", "vec_id", "q_emb",
              "cosine_sim(q_emb, v_emb) AS pcos")
            .withColumn("rnk", row_number().over(Window.partitionBy("q_id")
              .orderBy(col("pcos").desc, col("vec_id"))))
          val closer = scored.join(broadcast(arrived),
              col("a_id") =!= col("q_id") &&
              (expr("cosine_sim(q_emb, a_emb)") > col("pcos") ||
                (expr("cosine_sim(q_emb, a_emb)") === col("pcos") &&
                  col("a_id") < col("vec_id"))), "left")
            .groupBy("q_id", "vec_id", "rnk")
            .agg(count(col("a_id")).as("n_closer"))
          closer.where(col("rnk") + col("n_closer") <= k)
            .select("q_id", "vec_id").as[(Long, Long)].collect().toSeq.sorted
        }
        val hits = if (surv.isEmpty) 0L
          else searchHits(spark, srcDir, Some(upTo), indexDir,
            surv.map(_._1).distinct, surv, k, beam, hops, entryCount)
        Map(
          Probe.Truth -> surv.map(p => s"${p._1}:${p._2}").mkString(","),
          Probe.Last -> s"$hits:${surv.length}",
          Probe.AsOf -> upTo.toString)
      }
    }: Unit
  }

  /** Is the maintained graph's RECALL decaying? The graph-tier
    * staleness signal ([[IvfIndex.driftReport]]'s discipline on the
    * probe benchmark): compares the probes' current recall (in integer
    * basis points over the SURVIVING benchmark pairs) to the
    * enable-time baseline and trips when the drop exceeds `bandBp`.
    * O(1): a driver-side property read — zero Spark jobs, no searches
    * (the maintain/stream passes already re-searched the probes).
    * EXHAUSTION: churn only ever shrinks the benchmark, and a
    * benchmark fully invalidated (pairs = 0) reports the baseline and
    * never trips — so the report flags `exhausted` when the surviving
    * pair list has decayed below `floorPct`% of the enable-time
    * benchmark (both sizes live in the property plane): the signal
    * that the monitor has quietly stopped monitoring and
    * [[enableProbes]] must re-arm it. */
  def recallReport(indexDir: String, bandBp: Long,
      floorPct: Int = 25): RecallReport = {
    require(floorPct >= 0 && floorPct <= 100,
      s"recallReport: floorPct must be in [0, 100], got $floorPct")
    val props = TxLog.snapshot(indexDir).props
    def unpack(v: Option[String]): (Long, Long) = v match {
      case Some(x) => val p = x.split(":"); (p(0).toLong, p(1).toLong)
      case None => (0L, 0L)
    }
    val (bh, bp) = unpack(props.get(Probe.Base))
    require(bp > 0L, s"recallReport: $indexDir has no probe benchmark — " +
      "enableProbes() stamps it")
    val (lh, lp) = unpack(props.get(Probe.Last))
    val baseBp = Math.floorDiv(10000L * bh, bp)
    val lastBp = if (lp == 0L) baseBp else Math.floorDiv(10000L * lh, lp)
    val drop = baseBp - lastBp
    RecallReport(baseBp, lastBp, drop, lp, lp > 0L && drop > bandBp,
      lp * 100L < bp * floorPct)
  }
}
