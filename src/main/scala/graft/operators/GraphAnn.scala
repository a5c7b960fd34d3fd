package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based ANN — the recall tier above IVF/PQ: a bounded-degree
  * k-NN graph as a plain DataFrame relation, searched by iterative
  * beam expansion. The published lineage is NSW/HNSW (Malkov & Yashunin
  * 2016) for search-over-a-neighborhood-graph and NN-descent (Dong et
  * al., WWW 2011) for graph construction; both are re-derived here in
  * relational form because HNSW's sequential insert loop does not
  * distribute, while its two load-bearing ideas — a sparse graph whose
  * edges follow similarity, and greedy search that only ever touches a
  * frontier's neighbors — map exactly onto joins:
  *
  *  - BUILD: seed edges from two sources — coarse-quantizer cells (the
  *    SemDeDup/IVF assignment reused: within-cell pairs follow
  *    similarity) and RANDOM HASH BUCKETS (two salted md5 bucketings of
  *    ~`randomBucketSize` nodes each, all-pairs within a bucket).
  *    The random links matter structurally: cell-only seeding can never
  *    produce a cross-cell edge — NN-descent only recombines existing
  *    endpoints, so the graph would stay cell-disconnected forever and
  *    inherit exactly IVF's boundary blindness. The salted buckets are
  *    the relational stand-in for NN-descent's random initialization
  *    and HNSW's long-range links: similarity-agnostic edges that make
  *    the graph connected w.h.p. so refinement and search can cross
  *    cell boundaries. Each node RESERVES `longLinks` degree slots for
  *    its best random-bucket edges, kept through every round — a plain
  *    top-M re-rank would evict them (cluster-mates always win the
  *    similarity contest), quietly re-disconnecting the graph and
  *    blinding search to everything outside the entry cluster. Then
  *    NN-descent rounds: each node's candidates are its neighbors,
  *    reverse neighbors, and neighbors-of-neighbors (one self-join of
  *    the edge relation), re-ranked to top-M plus the pinned long
  *    links. Every round's candidate set is ≤ N·(2(M+L) + (M+L)²) rows
  *    — degree-bounded, never all-pairs — and each round is one
  *    equi-join + one WindowGroupLimit top-M.
  *  - SEARCH: queries start from E deterministic entry points (global
  *    min-hash nodes, the q108 seeding discipline), then `hops` rounds
  *    of: take the per-query best `beam` visited nodes, expand their
  *    out-edges, score only NEVER-VISITED candidates (anti-join), merge.
  *    Per hop per query the frontier is ≤ beam·M rows — the probe cost
  *    knob that graph ANN spends on FOLLOWING SIMILARITY GRADIENTS
  *    instead of IVF's fixed posting lists, which is where its
  *    recall-at-equal-probe-cost advantage comes from (GraphAnnSpec
  *    measures it head-to-head).
  *
  * Determinism: cosine through the codegen'd `cosine_sim` (bit-identical
  * to the oracle's sequential fold), every rank tie-broken by id, entry
  * points by (md5 hash, id) — both engines replay the exact same graph
  * and the exact same walk; q134's oracle unrolls build rounds and hops
  * as CTE chains (the BPE-oracle precedent).
  *
  * At 100 TB: the graph is N·M rows (a projection of the corpus scale),
  * built with cell-bucketed seeding (capped cells, the capBuckets
  * guard) and degree-bounded rounds; search shuffles only
  * |queries|·beam·M rows per hop and broadcasts the query set. Inputs
  * follow [[Similarity]]'s enforced embedding contract. */
object GraphAnn {

  /** The one shared small-corpus bound: [[buildKnnGraph]]'s default
    * cell-seeding cap AND the size-dispatch threshold below which the
    * exact builders (a broadcast cross-join) are admissible —
    * [[GraphAnnIndex.buildFor]] and its batch-internal wiring dispatch
    * on THIS constant, so the "within one cell's worth" contract and
    * the broadcast-side bound cannot drift apart. */
  val DefaultMaxCellSize = 4096

  /** Per-src top-`m` by (cosine desc, dst asc) — rank ≤ m over a
    * partition-local window, which Spark executes as WindowGroupLimit
    * (per-partition heaps), not a global sort. */
  private def topM(scored: DataFrame, m: Int): DataFrame =
    scored
      .withColumn("__rn", row_number().over(
        Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))))
      .where(col("__rn") <= m)
      .drop("__rn")

  /** Build the degree-`m` directed k-NN graph (src, dst, cosine).
    *
    * `cents` is the coarse quantizer (cent_id, cent_emb) — the same
    * relation IVF and SemDeDup take; cell seeding compares only within
    * a cell (cells larger than `maxCellSize` are excluded from seeding,
    * the runaway-quadratic guard). The salted random buckets average
    * `randomBucketSize` nodes (sizes concentrate Poisson-tight, so
    * all-pairs within a bucket is O(randomBucketSize²) rows per
    * bucket); one bounded count() sizes the bucket space — the J2
    * collect→literal pattern, one scan, scalar result. `rounds`
    * NN-descent refinements then climb the similarity gradient over
    * the union. */
  /** The EXACT degree-`m` k-NN graph plus pinned long-range links —
    * the small-corpus build: one broadcast cross-join + per-src rank
    * (a handful of stages) where [[buildKnnGraph]]'s seeded NN-descent
    * program runs dozens, and exact local edges dominate any
    * approximation's. All-pairs by construction, so callers must
    * size-dispatch: this is the ≤ one-cell's-worth path; at corpus
    * scale the bucketed builder is the only admissible shape. Long
    * links come from the same salted random buckets as the bucketed
    * build — an exact-kNN-only graph has no long-range edges and beam
    * search cannot cross clusters without them. */
  def exactKnnGraph(vectors: DataFrame, m: Int,
      randomBucketSize: Int = 6, longLinks: Int = 2): DataFrame = {
    require(m >= 1, s"degree $m out of range")
    val v = Similarity.validEmbeddings(vectors)
    val local = Similarity.topK(v, v, m)
      .select(col("q_id").as("src"), col("vec_id").as("dst"), col("cosine"))
    if (longLinks == 0) return local
    val nBuckets = math.max(1L, v.count() / randomBucketSize)
    val rnd = (0 to 1).map { salt =>
      val b = v.selectExpr("vec_id", "embedding",
        s"pmod(md5_u32(concat('$salt#', CAST(vec_id AS STRING))), ${nBuckets}L) AS __rb")
      b.as("a").join(b.as("b"),
          col("a.__rb") === col("b.__rb") && col("a.vec_id") =!= col("b.vec_id"))
        .selectExpr("a.vec_id AS src", "b.vec_id AS dst",
          "cosine_sim(a.embedding, b.embedding) AS cosine")
    }.reduce(_ unionAll _).distinct()
    local.unionAll(topM(rnd, longLinks)).distinct()
  }

  def buildKnnGraph(vectors: DataFrame, cents: DataFrame, m: Int,
      rounds: Int, maxCellSize: Int = DefaultMaxCellSize,
      randomBucketSize: Int = 6, longLinks: Int = 2): DataFrame = {
    require(m >= 1 && rounds >= 0, s"degree $m / rounds $rounds out of range")
    require(randomBucketSize >= 2, s"randomBucketSize $randomBucketSize < 2")
    require(longLinks >= 0, s"longLinks $longLinks < 0")
    val v = Similarity.validEmbeddings(vectors)
    val assigned = Similarity.assignCells(v, cents)
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("__cn"))
    val sized = assigned.join(sizes.where(col("__cn") <= maxCellSize), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val cellPairs = sized.as("a").join(sized.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .selectExpr("a.vec_id AS src", "b.vec_id AS dst",
        "cosine_sim(a.embedding, b.embedding) AS cosine")
    val nBuckets = math.max(1L, v.count() / randomBucketSize)
    def randomPairs(salt: Int): DataFrame = {
      val b = v.selectExpr("vec_id", "embedding",
        s"pmod(md5_u32(concat('$salt#', CAST(vec_id AS STRING))), ${nBuckets}L) AS __rb")
      b.as("a").join(b.as("b"),
          col("a.__rb") === col("b.__rb") && col("a.vec_id") =!= col("b.vec_id"))
        .selectExpr("a.vec_id AS src", "b.vec_id AS dst",
          "cosine_sim(a.embedding, b.embedding) AS cosine")
    }
    // distinct: a pair seeded by both a cell and a bucket (or both
    // buckets) carries the identical deterministic cosine, so exact
    // dedup keeps it from occupying two degree slots. Materialized ONCE:
    // both the long-link ranking and the seed union read this relation —
    // lazily, the two bucket self-joins would each run twice.
    val rnd = randomPairs(0).unionAll(randomPairs(1)).distinct()
      .localCheckpoint(eager = true)
    // The pinned long-range slots: each node's best `longLinks` random
    // edges, immune to similarity eviction — tiny (N·L rows), reused
    // every round, so it gets its own materialization barrier.
    val longEdges = topM(rnd, longLinks).localCheckpoint(eager = true)
    val seeded = cellPairs.unionAll(rnd).distinct()
    // One checkpoint per round (localCheckpoint discipline of the CC
    // loop): without the barrier each round's plan re-runs every prior
    // round; dead rounds release their blocks eagerly.
    var edges = topM(seeded, m).unionAll(longEdges).distinct()
      .localCheckpoint(eager = true)
    CheckpointBlocks.release(rnd)
    (1 to rounds).foreach { _ =>
      val cand = edges.select(col("src"), col("dst"))
        .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
        .unionAll(edges.as("x").join(edges.as("y"), col("x.dst") === col("y.src"))
          .select(col("x.src").as("src"), col("y.dst").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
      val scored = cand
        .join(v.select(col("vec_id").as("src"), col("embedding").as("__se")), Seq("src"))
        .join(v.select(col("vec_id").as("dst"), col("embedding").as("__de")), Seq("dst"))
        .selectExpr("src", "dst", "cosine_sim(__se, __de) AS cosine")
      val next = topM(scored, m).unionAll(longEdges).distinct()
        .localCheckpoint(eager = true)
      CheckpointBlocks.release(edges)
      edges = next
    }
    // the pinned slots are baked into the final materialized edge set —
    // their standalone blocks are dead from here (q102 hygiene: release
    // eagerly, don't wait for the GC-timed ContextCleaner)
    CheckpointBlocks.release(longEdges)
    edges
  }

  /** Beam search over a [[buildKnnGraph]] relation: per query, the
    * top-`k` of every node scored during a `hops`-round walk from the
    * `entryCount` global min-hash entry points, beam width `beam`.
    * Output is the q59 contract: (q_id, vec_id, cosine, rank), self-
    * matches excluded. */
  def searchTopK(vectors: DataFrame, graph: DataFrame, queries: DataFrame,
      k: Int, beam: Int, hops: Int, entryCount: Int): DataFrame = {
    require(k >= 1 && beam >= 1 && hops >= 0 && entryCount >= 1,
      s"k $k / beam $beam / hops $hops / entries $entryCount out of range")
    val v = Similarity.validEmbeddings(vectors)
    val q = Similarity.validEmbeddings(queries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val entries = v
      .selectExpr("vec_id", "embedding", "md5_u32(CAST(vec_id AS STRING)) AS __h")
      .orderBy("__h", "vec_id").limit(entryCount)
      .select(col("vec_id").as("node"), col("embedding").as("__ne"))
    var visited = q.crossJoin(broadcast(entries))
      .selectExpr("q_id", "node", "cosine_sim(q_emb, __ne) AS cosine")
      .localCheckpoint(eager = true)
    (1 to hops).foreach { h =>
      val frontier = visited
        .withColumn("__rn", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cosine").desc, col("node"))))
        .where(col("__rn") <= beam)
        .select(col("q_id"), col("node"))
      val expand = frontier
        .join(graph.select(col("src").as("node"), col("dst")), Seq("node"))
        .select(col("q_id"), col("dst").as("node"))
        .distinct()
      val fresh = expand.join(visited.select("q_id", "node"), Seq("q_id", "node"), "left_anti")
      val scored = fresh
        .join(v.select(col("vec_id").as("node"), col("embedding").as("__ne")), Seq("node"))
        .join(broadcast(q), Seq("q_id"))
        .selectExpr("q_id", "node", "cosine_sim(q_emb, __ne) AS cosine")
      // checkpoint BETWEEN hops only: each hop reads `visited` twice
      // (frontier + anti-join), so intermediate materialization is
      // load-bearing — but the LAST hop's result is consumed exactly
      // once by the final ranking, so its eager checkpoint was a pure
      // extra scheduled job per search (attach, probe refresh, and
      // recall evals all pay it; job count × scheduling latency is the
      // protocol family's measured bench cost). The penultimate
      // checkpoint keeps the final plan's depth at one hop.
      if (h < hops) {
        val next = visited.unionAll(scored).localCheckpoint(eager = true)
        CheckpointBlocks.release(visited)
        visited = next
      } else visited = visited.unionAll(scored)
    }
    visited
      .where(col("node") =!= col("q_id"))
      .select(col("q_id"), col("node").as("vec_id"), col("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .selectExpr("q_id", "vec_id", "round(cosine, 6) AS cosine", "rank")
  }
}
