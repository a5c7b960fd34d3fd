package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TxLog

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
  * Every maintenance step is delta-proportional and distributed: the
  * changed-id edge eviction is two keyed anti-join deletes, the attach
  * searches only the batch's vectors (cost ∝ batch × beam·hops — never
  * the corpus), and the degree re-prune touches only the nodes that
  * gained reverse edges. Edges live in a TxLog table (src, dst,
  * cosine); versioned, time-travelable, vacuumable like every other
  * table. */
object GraphAnnIndex {

  final case class MaintainResult(srcVersion: Long, rowsApplied: Long,
      layoutOnlySkip: Boolean)

  private def validPred = coalesce(expr(
    Similarity.validEmbExpr(graft.queries.SparkSql, "embedding")), lit(false))

  /** Full initial build ([[GraphAnn.buildKnnGraph]]) at the source's
    * current version. Returns the version the graph reflects. */
  def initialize(spark: SparkSession, srcDir: String, indexDir: String,
      cents: DataFrame, m: Int, rounds: Int): Long = {
    val v = TxLog.latestVersion(srcDir)
    val live = TxLog.read(spark, srcDir, Some(v))
      .select("vec_id", "embedding")
    TxLog.append(spark, indexDir,
      GraphAnn.buildKnnGraph(live, cents, m, rounds)): Unit
    v
  }

  /** Apply the source's changes in `(fromExclusive, latest]`:
    *  1. compute the DELETE-CONSOLIDATION patch (FreshDiskANN's repair
    *     — without it the graph fragments and recall collapses): every
    *     surviving in-neighbor of a departing node inherits candidate
    *     edges to the node's surviving out-neighbors, scored exact;
    *  2. evict every edge touching a changed id (two keyed deletes —
    *     updates re-attach below, deletes stay gone);
    *  3. wire each upserted vector in via beam search on the surviving
    *     graph: its results become its out-edges, their reverses attach
    *     it for discovery;
    *  4. re-prune every node that gained edges (reverse attaches and
    *     patch inheritors) to the degree cap — existing ∪ new edges,
    *     keep top-m by cosine. Work ∝ |batch| · degree², never the
    *     graph. */
  def maintain(spark: SparkSession, srcDir: String, indexDir: String,
      fromExclusive: Long, m: Int, beam: Int = 8, hops: Int = 2,
      entryCount: Int = 4, idCol: String = "_row_id",
      cents: Option[DataFrame] = None): MaintainResult = {
    val to = TxLog.latestVersion(srcDir)
    if (to <= fromExclusive)
      return MaintainResult(to, 0L, layoutOnlySkip = false)
    if (!TxLog.hasRowChanges(srcDir, fromExclusive, to))
      return MaintainResult(to, 0L, layoutOnlySkip = true)
    val feed = TxLog.readChangeFeed(spark, srcDir, fromExclusive, Some(to))
    val last = feed
      .where(col(TxLog.ChangeTypeCol) =!= "update_preimage")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("_commit_version").desc)))
      .where(col("__rn") === 1)
      .localCheckpoint(true)
    val applied = last.count()
    if (applied == 0L) return MaintainResult(to, 0L, layoutOnlySkip = false)
    // eviction keys must include the UPDATE preimages' vec_ids: an
    // update that changes a row's vec_id under the same tracked id
    // retires the OLD node, whose id appears only in the preimage —
    // keying off post-images alone would leave its edges in the graph
    // forever (and skip its delete-consolidation repair)
    val touched = last.select("vec_id")
      .unionByName(feed.where(col(TxLog.ChangeTypeCol) === "update_preimage")
        .select("vec_id"))
      .distinct().localCheckpoint(true)
    val live = TxLog.read(spark, srcDir, Some(to))
      .select("vec_id", "embedding").localCheckpoint(true)
    // 1. consolidation patch from the PRE-eviction graph: surviving
    //    in-neighbors of departing nodes inherit their out-neighbors —
    //    including TWO-HOP inheritance through a chain of departing
    //    nodes (x → t → t2 → y with t, t2 both departing): without the
    //    second hop, a batch that removes adjacent nodes severs every
    //    path that ran through the pair and recall decays with batch
    //    size. Cost stays delta-proportional: both hops are keyed joins
    //    whose left side is the departing set's edge lists.
    val patch: Option[DataFrame] =
      if (TxLog.latestVersion(indexDir) < 0) None
      else {
        val g = TxLog.read(spark, indexDir).select("src", "dst")
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
        Some(pairs
          .join(live.select(col("vec_id").as("src"), col("embedding").as("__se")), Seq("src"))
          .join(live.select(col("vec_id").as("dst"), col("embedding").as("__de")), Seq("dst"))
          .selectExpr("src", "dst", "cosine_sim(__se, __de) AS cosine")
          .localCheckpoint(true))
      }
    // 2. evict: changed ids leave the graph entirely (keyed anti-joins)
    if (TxLog.latestVersion(indexDir) >= 0) {
      TxLog.deleteKeys(spark, indexDir,
        touched.select(col("vec_id").as("src")), "src"): Unit
      TxLog.deleteKeys(spark, indexDir,
        touched.select(col("vec_id").as("dst")), "dst"): Unit
    }
    // 3. attach: search the SURVIVING graph for each new vector's
    //    neighborhood — batch-sized queries, never a corpus pass
    val newVecs = last
      .where(col(TxLog.ChangeTypeCol) =!= "delete" && validPred)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val graphNow =
      if (TxLog.latestVersion(indexDir) < 0) None
      else Some(TxLog.read(spark, indexDir).select("src", "dst", "cosine"))
    val nvOpt = if (newVecs.isEmpty) None else Some(newVecs)
    val attach: Seq[DataFrame] = (graphNow, nvOpt) match {
      case (Some(g), Some(nv)) =>
        // candidate pool 2m, pruned to the degree cap in step 4 — the
        // RobustPrune discipline: a wider exact-scored pool gives the
        // new node more reverse-edge discoverability than exactly-m
        // results would, at the same final degree
        val cand = GraphAnn.searchTopK(live, g, nv,
          k = 2 * m, beam = beam, hops = hops, entryCount = entryCount)
          .localCheckpoint(true)
        Seq(cand.select(col("q_id").as("src"), col("vec_id").as("dst"), col("cosine")),
          cand.select(col("vec_id").as("src"), col("q_id").as("dst"), col("cosine")))
      case _ => Nil
    }
    // 3b. BATCH-INTERNAL wiring: a batch's beam searches all run
    //     against the PRE-batch graph, so nearest-neighbor edges AMONG
    //     the batch's own vectors — the dominant neighborhoods of an
    //     append-heavy window — would never form from search results
    //     alone (the sequential-insert property FreshDiskANN gets for
    //     free and a batch system must restore). The bucketed builder
    //     wires the batch against itself: cells + random buckets, cost
    //     ∝ |batch|, never all-pairs.
    val batchInternal: Option[DataFrame] = (cents, nvOpt) match {
      case (Some(c), Some(nv)) =>
        // capped at m/2 per src BEFORE the union: batch-internal edges
        // supply the missing new↔new neighborhoods but must not crowd
        // the old↔new bridge edges out of the m slots — without the
        // half-cap the appended region turns into a well-wired island
        // the walk cannot enter (measured: recall drops, not rises)
        val half = math.max(1, m / 2)
        Some(GraphAnn.buildKnnGraph(nv, c, half, rounds = 1)
          .withColumn("__rn", row_number().over(
            Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))))
          .where(col("__rn") <= half).drop("__rn")
          .localCheckpoint(true))
      case _ => None
    }
    // 4. degree re-prune for every edge gainer (reverse attaches,
    //    patch inheritors, batch-internal edges); forward search edges
    //    of new nodes are already ≤ 2m and cap to m below
    val fwd = attach.headOption
    val gained = (attach.drop(1) ++ patch.toSeq ++ batchInternal.toSeq)
      .reduceOption(_ unionByName _)
    // a node can gain edges through BOTH branches in one batch (a new
    // node is its own forward source AND a reverse/patch gainer when it
    // surfaced as another's candidate) — the degree cap binds on the
    // UNION, so the prune runs once over the combined per-src set
    def capped(df: DataFrame): DataFrame = df.distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))))
      .where(col("__rn") <= m).drop("__rn")
    gained match {
      case Some(extra0) =>
        val extra = extra0.localCheckpoint(true)
        val affected = (Seq(extra.select("src")) ++
          fwd.map(_.select("src")).toSeq).reduce(_ unionByName _)
          .distinct().localCheckpoint(true)
        val existing = graphNow.map(
            _.join(affected, Seq("src"), "left_semi"))
          .getOrElse(extra.limit(0))
        val desired = capped(
          fwd.fold(existing.unionByName(extra))(
            _ unionByName existing.unionByName(extra)))
          .localCheckpoint(true)
        if (TxLog.latestVersion(indexDir) >= 0)
          TxLog.deleteKeys(spark, indexDir, affected, "src"): Unit
        TxLog.append(spark, indexDir, desired): Unit
      case None =>
        fwd.foreach(f => TxLog.append(spark, indexDir, capped(f)): Unit)
    }
    MaintainResult(to, applied, layoutOnlySkip = false)
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
}
