package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.SparkSql

/** The engine's deduplication library — the reusable API behind parity
  * queries q54-q58/q76. Each function takes any DataFrame with an id and
  * a payload column and returns a deterministic result DataFrame; the
  * scale rationale for each shape lives in the corresponding query's
  * Scaladoc (bucket-join candidate generation, no all-pairs).
  *
  * Hot-bucket guard: every bucket-join operator takes a `maxBucketSize`
  * cap. A boilerplate-heavy corpus (identical headers/footers, template
  * pages) can put thousands of documents into ONE band bucket, making
  * that bucket's candidate join quadratic; buckets above the cap are
  * dropped from candidate generation (a documented recall trade — members
  * of a dropped bucket can still meet in their other bands). Use
  * [[hotBuckets]] to observe what a cap would drop before choosing it.
  * The default cap (10000) is far above any bucket the test corpora
  * produce, so parity oracles need not mirror it.
  *
  * Hashing uses the engine's native expressions (GraftExtensions must be
  * registered on the session, as every harness session does).
  */
object Dedup {

  private val d = SparkSql

  /** Default [[hotBuckets]] cap: no-op on the test corpora, a real guard
    * on a skewed production corpus. */
  val DefaultMaxBucketSize = 10000

  /** Tokenize/shingle/hash chains are CPU-bound row work; a NARROW input
    * (one small parquet file, a union of a few scans) would run them on a
    * handful of cores. Widen-only: inputs already at/above the session's
    * shuffle parallelism pass through untouched — no extra exchange at
    * scale, where the corpus scan has plenty of partitions. */
  private def widen(df: DataFrame): DataFrame = {
    val sp = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < sp) df.repartition(sp) else df
  }

  /** 3-token shingle set of a text column (lambda-bound tokenization). */
  def shingles(textCol: String): String =
    d.bind(d.splitSpace(textCol), "tk",
      d.adistinct(d.map(d.range1(s"${d.len("tk")} - 2"), "i", d.wordSlice("tk", "i", 3))))

  /** Buckets of a (…, bucket) relation larger than `cap` — the skew
    * observability companion to the capped candidate joins: query it to
    * see exactly which buckets a cap drops and how big they are. */
  def hotBuckets(bands: DataFrame, cap: Int): DataFrame =
    bands.groupBy("bucket").agg(count(lit(1)).as("bucket_size"))
      .where(col("bucket_size") > cap)

  /** Hot-bucket guard: drop all rows of buckets larger than `cap` before
    * a candidate self-join. One window count over the same `bucket` key
    * the join shuffles on — no extra exchange. */
  private[operators] def capBuckets(bands: DataFrame, cap: Int): DataFrame =
    if (cap == Int.MaxValue) bands
    else bands
      .withColumn("__bucket_size", count(lit(1)).over(Window.partitionBy("bucket")))
      .where(col("__bucket_size") <= cap)
      .drop("__bucket_size")

  /** Exact content-hash dedup: one row per distinct payload with the
    * minimum id as keeper. */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (doc_id, bucket) LSH band relation for [[minhashLshPairs]] — 12
    * signature slots in 6 bands × 2 rows. */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.where(s"${d.len(d.splitSpace(textCol))} >= 3")
      .selectExpr(s"$idCol AS doc_id", s"minhash_sigs(${shingles(textCol)}) AS sigs")
      .selectExpr("doc_id", "sigs", "explode(sequence(0, 5)) AS j")
      .selectExpr("doc_id",
        """concat(CAST(j AS STRING), ':',
                  CAST(element_at(sigs, 2*j+1) AS STRING), '|',
                  CAST(element_at(sigs, 2*j+2) AS STRING)) AS bucket""")

  /** MinHash+LSH near-dup pairs with exact-Jaccard confirmation
    * (12 signature slots in 6 bands × 2 rows).
    *
    * The (doc_id, shingles, sigs) signature relation is MATERIALIZED
    * once (eager localCheckpoint — same ownership contract as
    * [[clusters]]) and every branch of the plan reads the leaf: the
    * band self-join uses it twice and the exact-Jaccard confirm joins
    * it twice more, so a lazy plan re-evaluates the tokenize → shingle →
    * md5-signature chain — interpreted higher-order functions, the most
    * expensive expressions in the engine — up to five times per run
    * (measured 6.2 s → 2.0 s on the sf0.1 paragraph pseudo-corpus, and
    * at 100 TB those are five full scans of the corpus vs one). Blocks
    * are signature-sized (id + ~k shingle strings + 12 ints per doc),
    * released by the ContextCleaner when the result is unreferenced. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val sig = widen(docs).where(s"${d.len(d.splitSpace(textCol))} >= 3")
      .selectExpr(s"$idCol AS doc_id", s"${shingles(textCol)} AS shingles")
      .selectExpr("doc_id", "shingles", "minhash_sigs(shingles) AS sigs")
      .localCheckpoint(true)
    val tk = sig.select("doc_id", "shingles")
    val bands = capBuckets(
      sig.selectExpr("doc_id", "sigs", "explode(sequence(0, 5)) AS j")
        .selectExpr("doc_id",
          """concat(CAST(j AS STRING), ':',
                    CAST(element_at(sigs, 2*j+1) AS STRING), '|',
                    CAST(element_at(sigs, 2*j+2) AS STRING)) AS bucket"""),
      maxBucketSize)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(tk.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(tk.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
      .selectExpr("doc_a", "doc_b",
        s"round(CAST(${d.interSize("sa", "sb")} AS DOUBLE) / CAST(${d.unionSize("sa", "sb")} AS DOUBLE), 6) AS jaccard")
      .where(s"jaccard >= $jaccardThreshold")
  }

  /** (doc_id, simhash, bucket) band relation for [[simhashPairs]]: the
    * 32-bit signature split into FOUR 8-bit bands (band k = bits
    * [8k, 8k+8)). A pair within hamming distance ≤ 3 differs in at most 3
    * bands, so it is GUARANTEED to collide in at least one — unlike a
    * single 16-bit prefix table, which misses every pair whose differing
    * bits fall in the prefix (~17% of hamming-3 pairs; round-2 verdict). */
  def simhashBands(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.selectExpr(s"$idCol AS doc_id", s"simhash32(split($textCol, ' ')) AS simhash")
      .selectExpr("doc_id", "simhash", "explode(sequence(0, 3)) AS k")
      .selectExpr("doc_id", "simhash",
        s"""concat(CAST(k AS STRING), ':',
                   CAST(${d.shiftr("simhash", "8*k")} % 256 AS STRING)) AS bucket""")

  /** SimHash near-dup pairs: 32-bit signatures, 4×8-bit band tables
    * (full recall for hamming ≤ 3), hamming distance filter. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(maxHamming <= 3,
      s"4 bands over 32 bits guarantee recall only for hamming <= 3, got $maxHamming")
    val bands = capBuckets(simhashBands(docs, idCol, textCol), maxBucketSize)
    bands.as("a").join(bands.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        s"bit_count(${d.bxor("a.simhash", "b.simhash")}) AS hamming")
      .where(s"hamming <= $maxHamming")
      .distinct()
  }

  /** Embedding near-dup pairs: sign-pattern (first 16 dims) buckets,
    * native cosine confirmation. */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val sign = d.joinStr(d.map(d.range("1", "16"), "i",
      s"CASE WHEN ${d.elem(vecCol, "i")} >= 0 THEN '1' ELSE '0' END"), "")
    val withB = capBuckets(
      vectors.selectExpr(s"$idCol AS vec_id", s"$vecCol AS embedding",
        s"$sign AS bucket"),
      maxBucketSize)
    withB.as("a").join(withB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b",
        "round(cosine_sim(a.embedding, b.embedding), 6) AS cosine")
      .where(s"cosine >= $minCosine")
  }

  /** Connected components over a near-dup PAIR list: every document in a
    * duplicate cluster gets `cluster_id = min(doc id reachable via
    * pairs)` — the step that turns pairwise similarity into an actual
    * keep/drop decision (keep `doc_id == cluster_id`, drop the rest).
    *
    * Implementation: iterative min-label propagation — per round, every
    * node takes the min of its own label and its neighbors' labels (one
    * equi-join + one groupBy-min per round), stopping at fixpoint.
    * Rounds needed = graph diameter; dedup clusters are shallow (near-dup
    * graphs are dense cliques, diameter 2-3), so this converges in a
    * handful of rounds even at corpus scale. For adversarially long
    * chains the large-star/small-star variant halves diameters per round;
    * the `maxIters` cap turns non-convergence into an error instead of an
    * infinite job. Only ids that appear in `pairs` are labeled — callers
    * keep unpaired docs implicitly (they are their own cluster).
    */
  def clusters(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 50): DataFrame = {
    // a pair row with a NULL endpoint carries no pairing information —
    // ignored here and in [[clustersLargeStar]] (shared contract; the
    // min-aggregate would otherwise hand NULL nodes a neighbor's label
    // without merging anything)
    val valid = pairs.where(s"$aCol IS NOT NULL AND $bCol IS NOT NULL")
    val edges = valid.selectExpr(s"$aCol AS u", s"$bCol AS v")
      .unionAll(valid.selectExpr(s"$bCol AS u", s"$aCol AS v"))
      .distinct().cache()
    val idType = edges.schema("u").dataType
    // Eager localCheckpoint, not cache: the round plan references the
    // previous labels frame twice, so with cache alone the LOGICAL plan
    // doubles per round (cache stores blocks but keeps the full lineage
    // tree for plan matching) — a deep graph turns planning itself into
    // the bottleneck and eventually OOMs the driver. Checkpointing
    // materializes the same blocks AND truncates the plan to a leaf;
    // stale round blocks are dropped EAGERLY (CheckpointBlocks — the
    // ContextCleaner alone is GC-timed and lets dead rounds pile up
    // across a long session). On a real
    // cluster localCheckpoint trades executor-loss recoverability for
    // speed — acceptable here because a lost round restarts the
    // (diameter-bounded) job, not a multi-hour lineage replay.
    var ckpt = edges.select(col("u").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id")).localCheckpoint(true)
    var labels = ckpt
    var iter = 0
    var converged = ckpt.isEmpty // empty pair set: already at fixpoint
    while (!converged && iter < maxIters) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "v"), "v")
        .select(col("u").as("doc_id"), col("cluster_id"))
      // Change detection rides the round's ONE shuffle: each doc's own row
      // carries its current label as `old` (neighbor candidates carry
      // NULL; every doc_id has exactly one own-row, so max(old) recovers
      // it exactly — ids are any orderable type, STRING URLs included).
      // Labels only ever DECREASE (element-wise min), so the fixpoint is
      // reached exactly when no row has cluster_id ≠ old — an EXACT
      // per-round check for the cost of a scan over the freshly
      // materialized blocks (early-exit isEmpty, no shuffle), replacing
      // the round-9 digest job + exceptAll confirm that tripled q91/q102.
      val next = labels.withColumn("old", col("cluster_id"))
        .unionByName(viaNeighbor.withColumn("old", lit(null).cast(idType)))
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"), max("old").as("old"))
        .localCheckpoint(true)
      converged = next.where(not(col("cluster_id") <=> col("old"))).isEmpty
      // `next` is materialized and the change check has run — the old
      // round's blocks are dead, drop them now
      CheckpointBlocks.release(ckpt)
      ckpt = next
      labels = next.select("doc_id", "cluster_id")
      iter += 1
    }
    edges.unpersist()
    require(converged, s"label propagation did not converge in $maxIters rounds")
    // The returned frame is backed by MATERIALIZED localCheckpoint blocks
    // (a narrow projection over them): downstream actions read the final
    // label table directly instead of replaying the iteration chain
    // (measured 2× on q94 when uncached). Blocks are label-table-sized
    // and are released by the ContextCleaner once the frame is
    // unreferenced; callers' unpersist() calls are harmless no-ops.
    labels
  }

  /** Alternating large-star/small-star connected components (the
    * MapReduce-CC formulation of Kiveris et al.) — same contract and
    * output as [[clusters]], but the round count scales with
    * log(diameter) instead of diameter: each large-star step points
    * every node that is above a local minimum DIRECTLY at that minimum,
    * halving long chains per alternation. Use when components may be
    * long paths (e.g. transitively-chained near-dups); for the shallow
    * dense cliques LSH emits, [[clusters]] runs fewer shuffles per
    * round and converges just as fast.
    *
    * Edges are kept in canonical (larger → smaller) orientation, which
    * both star steps preserve, so each round is two join+groupBy stages
    * over an edge set that never exceeds the input edge count.
    * Convergence = the canonical edge digest (count + xxhash64 sum)
    * repeating, then confirmed by one exact set-difference — the cheap
    * digest gates every round, the exact check runs only at the
    * fixpoint candidate, so convergence is never declared on a hash
    * collision.
    */
  def clustersLargeStar(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Checkpoint the raw pair columns ONCE: the node universe and the
    // canonical edge set both derive from this leaf, so an expensive
    // pair-generation input (an LSH candidate join) executes exactly
    // once. The eager
    // localCheckpoint also matters per round, more acutely than in
    // [[clusters]]: one star round references the previous edge set ~12
    // times (both unions + the min join on each side), so cached-but-
    // uncut lineage grows ~12^rounds and planning OOMs long before the
    // data does. Checkpointing keeps every round's plan constant-size;
    // stale round blocks are freed by the ContextCleaner (GC-timed —
    // fine for edge-set-sized rounds bounded by log(diameter)).
    val raw = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .where("a IS NOT NULL AND b IS NOT NULL") // same contract as [[clusters]]
      .localCheckpoint(true)
    // node universe from the RAW columns, not the canonical edges: a
    // self-pair (x,x) survives distinct-canonicalization only as a
    // u==v row that the edge filter drops, but x must still be labeled
    val nodes = raw.select(col("a").as("doc_id"))
      .unionAll(raw.select(col("b").as("doc_id"))).distinct()
    var edges = raw
      .selectExpr("greatest(a, b) AS u", "least(a, b) AS v")
      .where("u != v").distinct().localCheckpoint(true)

    def digest(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast(DecimalType(38, 0)))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    // large-star: every neighbor y > x links to m(x) = min(N(x) ∪ {x})
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.unionAll(nbrs.select(col("u"), col("u").as("v")))
        .groupBy("u").agg(min("v").as("m"))
      nbrs.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }
    // small-star: all smaller neighbors of u (and u itself) link to m(u)
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("u").agg(min("v").as("m"))
      val moved = e.join(mins, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      moved.unionAll(mins.select(col("u"), col("m").as("v"))).distinct()
    }

    var prev = digest(edges)
    var converged = prev._1 == 0L // no proper edges: already a star forest
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val dg = digest(next)
      if (dg == prev) {
        // A repeated digest is necessary but probabilistic (a cross-round
        // xxhash64-sum collision would declare convergence early and emit
        // wrong labels); confirm with one EXACT set difference — it runs
        // only at the fixpoint candidate, not every round. The digest
        // already matched the counts, so empty difference ⇒ equal sets.
        converged = next.exceptAll(edges).isEmpty
      }
      prev = dg
      // `next` is materialized and the exact confirm (the only consumer
      // of the old round) has run — the old round's blocks are dead
      CheckpointBlocks.release(edges)
      edges = next
      iter += 1
    }
    require(converged, s"large-star/small-star did not converge in $maxIters rounds")
    // at the fixpoint every non-root carries exactly one edge to its root
    val nonRoot = edges.groupBy("u").agg(min("v").as("cluster_id"))
      .select(col("u").as("doc_id"), col("cluster_id"))
    // materialized-leaf ownership, same contract as [[clusters]]: no
    // recompute downstream, unpersist() is a no-op. The eager checkpoint
    // below is the last reader of `raw` and the fixpoint edge set, so
    // both release immediately after it materializes.
    val out = nodes.join(nonRoot, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .localCheckpoint(true)
    CheckpointBlocks.release(raw)
    CheckpointBlocks.release(edges)
    out
  }

  /** End-to-end near-dup drop: keep exactly one representative (the
    * cluster-minimum id) from every near-duplicate cluster and every
    * unpaired document — the convenience composition of
    * [[minhashLshPairs]] + [[clusters]] that q94's curation pipeline
    * inlines. Returns `docs` filtered to the keep set. `useStars` routes
    * clustering through [[clustersLargeStar]] instead — pick it when
    * duplicate chains may be long (log-diameter rounds). */
  def dropNearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double,
      maxBucketSize: Int = DefaultMaxBucketSize,
      useStars: Boolean = false): DataFrame = {
    val pairs = minhashLshPairs(docs, idCol, textCol, jaccardThreshold, maxBucketSize)
    val labeled =
      if (useStars) clustersLargeStar(pairs, "doc_a", "doc_b")
      else clusters(pairs, "doc_a", "doc_b")
    val nonRep = labeled
      .where("doc_id != cluster_id")
      .select(col("doc_id").as(idCol))
    docs.join(nonRep, Seq(idCol), "left_anti")
  }

  /** Cluster-canonical selection (the RefinedWeb/FineWeb curation step,
    * Penedo et al. 2023): instead of [[dropNearDuplicates]]'s arbitrary
    * min-id representative, keep the BEST document of every near-dup
    * cluster under a caller-supplied quality ordering — highest
    * `qualityExpr`, ties broken by lowest id so the keeper is total and
    * partition-invariant. Unpaired documents keep themselves.
    *
    * Scale shape: only PAIRED docs (the near-dup minority) enter the
    * per-cluster window; the ranking plans as WindowGroupLimit with
    * rk=1, so each cluster tracks one running best instead of sorting —
    * and the full corpus is touched only by the final id anti-join.
    * `qualityExpr` must be deterministic per row (a projection of the
    * doc itself, e.g. a token count or a [[LinearClassifier]] margin);
    * NULL quality ranks below every non-NULL quality. */
  def keepBestPerCluster(docs: DataFrame, idCol: String, textCol: String,
      qualityExpr: String, jaccardThreshold: Double,
      maxBucketSize: Int = DefaultMaxBucketSize,
      useStars: Boolean = false): DataFrame = {
    val pairs = minhashLshPairs(docs, idCol, textCol, jaccardThreshold, maxBucketSize)
    val labeled =
      if (useStars) clustersLargeStar(pairs, "doc_a", "doc_b")
      else clusters(pairs, "doc_a", "doc_b")
    // quality is evaluated on the paired slice only — the join keys the
    // docs by id (broadcast when the paired set is small), never the
    // reverse (labels carry two ids; docs carry document bodies). No
    // cast on the id: labels inherit the caller's id type from the
    // pairs, and a lossy cast here would NULL out non-numeric ids and
    // silently skip the drop entirely.
    val scored = docs
      .select(col(idCol).as("doc_id"), expr(qualityExpr).as("__q"))
      .join(labeled, "doc_id")
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("__q").desc_nulls_last, col("doc_id"))
    val losers = scored
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") =!= 1)
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Fixed word-window "paragraphs" of each document: token windows of
    * `paraWords` (the last one possibly shorter), keyed (doc_id,
    * para_idx). A pure projection + posexplode — row count grows by
    * ~len/paraWords, nothing shuffles. */
  def paragraphs(docs: DataFrame, idCol: String, textCol: String,
      paraWords: Int): DataFrame = {
    require(paraWords >= 3, s"paraWords must be >= 3 (shingle minimum), got $paraWords")
    val n = d.idiv(s"(${d.len("__tk")} + ${paraWords - 1})", s"$paraWords")
    val windows = d.map(d.range1(n), "i",
      d.wordSlice("__tk", s"(i-1)*$paraWords + 1", paraWords))
    docs.selectExpr(s"$idCol AS __doc_id", s"${d.splitSpace(textCol)} AS __tk")
      .selectExpr("__doc_id", s"posexplode($windows) AS (para_idx, para_text)")
      .selectExpr("__doc_id AS doc_id", "para_idx", "para_text")
  }

  /** Corpus-wide paragraph-level near-dedup — the boilerplate-removal
    * pass LLM pipelines run AFTER document-level dedup: a paragraph
    * repeated across the corpus (headers, footers, licence blocks)
    * survives document dedup because its carriers differ elsewhere.
    * Reuses the whole document machinery on the exploded relation: each
    * (doc, idx) window becomes a pseudo-doc keyed `doc_id·maxParasPerDoc
    * + para_idx` (cluster-minimum on the packed key ≡ lexicographic
    * (doc, idx) minimum, so the keeper is deterministic), then
    * [[dropNearDuplicates]] runs unchanged — same LSH bands, same capped
    * bucket joins, same checkpointed clustering; scale story inherited
    * verbatim. Returns surviving (doc_id, para_idx, para_text) rows. */
  def dropDuplicateParagraphs(docs: DataFrame, idCol: String, textCol: String,
      paraWords: Int, jaccardThreshold: Double,
      maxBucketSize: Int = DefaultMaxBucketSize,
      maxParasPerDoc: Int = 1024): DataFrame = {
    // widen BEFORE the window construction: the split + word-slice HOFs
    // are the expensive per-row work here, and a small corpus arrives on
    // 1-2 scan partitions (the downstream signature stage would widen
    // anyway, but only after this chain had run narrow)
    val keyed = paragraphs(widen(docs), idCol, textCol, paraWords)
      // assert_true (kept alive by the filter on its NULL result) fails
      // the job on key overflow rather than silently aliasing paragraphs
      .withColumn("__chk", expr(
        s"assert_true(para_idx < $maxParasPerDoc, 'para_idx >= $maxParasPerDoc: raise maxParasPerDoc')"))
      .where(col("__chk").isNull).drop("__chk")
      .withColumn("pkey", col("doc_id") * maxParasPerDoc + col("para_idx"))
      // materialize ONCE: the paragraph relation feeds both the LSH
      // signature build and dropNearDuplicates' final anti-join scan —
      // lazily, the tokenize + window-slice posexplode (interpreted
      // HOFs over every doc) would run twice (the q108 double-pass
      // shape). Blocks are paragraph-sized, same budget as the sig
      // checkpoint that derives from them.
      .localCheckpoint(true)
    // CC stays min-label propagation: measured at sf0.1 (isolated, min of
    // 3) the large-star variant is SLOWER here (8.8 s vs 7.2 s) — the
    // paragraph near-dup graph is shallow dense cliques, the regime
    // [[clustersLargeStar]]'s own doc says plain propagation wins.
    dropNearDuplicates(keyed, "pkey", "para_text", jaccardThreshold, maxBucketSize)
      .select("doc_id", "para_idx", "para_text")
  }

  /** Exact substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499): remove every
    * token SPAN covered by an n-token gram that occurs >= `minCount`
    * times across the corpus — sub-document boilerplate (licence
    * headers, navigation chrome, templated intros) that whole-document
    * and paragraph dedup both miss. Removal is by span, not by doc: the
    * paper's suffix-array "duplicated substring" is re-expressed as the
    * union of duplicated fixed-width gram windows, the standard
    * shingle-granularity relaxation (a duplicated run of length L >= n
    * is exactly covered by its L-n+1 duplicated grams, so every >= n
    * duplicated run is removed in full; runs shorter than n survive —
    * the same resolution limit the paper's n-token threshold sets).
    *
    * Output: (doc_id, n_tokens, n_removed, kept_text) — one row per
    * input doc, kept_text the surviving tokens in order ('' when the
    * whole doc was duplicated boilerplate).
    *
    * Scale shape: two corpus scans (gram build, token build), then
    * everything is relational — gram counts partial-aggregate map-side
    * before one exchange keyed on the gram; duplicated-gram starts come
    * from an equi-join (AQE broadcasts the dup set when small); covered
    * positions and the token anti-join are both keyed (doc_id, p), so
    * the distinct's exchange is reused by the join. No per-doc state
    * ever exceeds the doc's own token count, and no stage is quadratic
    * in anything. Gram strings ride one shuffle (n·avg_token bytes per
    * gram — the price of EXACTNESS; the hashed variant would be
    * xxhash64(gram) at a collision-false-dedup risk this operator's
    * contract rejects). */
  def dropDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minCount: Int = 2): DataFrame = {
    require(n >= 2, s"dropDuplicateSpans: n must be >= 2, got $n")
    require(minCount >= 2, s"dropDuplicateSpans: minCount must be >= 2, got $minCount")
    // materialize the token arrays ONCE (the minhashLshPairs signature
    // discipline): four plan branches consume them (gram build for the
    // count, gram build for the covered-start join, position explode,
    // n_tokens) — lazily each would re-run the corpus scan + split HOF
    // NULL text coalesces to '' (one empty token, no grams — reported
    // untouched) so NULL docs keep their output row instead of turning
    // every downstream count NULL
    val toks = widen(docs)
      .selectExpr(s"$idCol AS doc_id",
        s"${d.splitSpace(s"coalesce($textCol, '')")} AS tk")
      .localCheckpoint(true)
    val grams = toks
      .select(col("doc_id"), col("tk"),
        explode(expr(d.range1(s"${d.len("tk")} - ${n - 1}"))).as("i"))
      .selectExpr("doc_id", "i", s"${d.wordSlice("tk", "i", n)} AS gram")
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= minCount).select("gram")
    val covered = grams.join(dup, Seq("gram"))
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${n - 1})")).as("p"))
      .distinct()
    val pos = toks
      .select(col("doc_id"), col("tk"), explode(expr(d.range1(d.len("tk")))).as("p"))
      .selectExpr("doc_id", "p", s"${d.elem("tk", "p")} AS tok")
    val kept = pos.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n_kept"),
        expr("concat_ws(' ', transform(array_sort(collect_list(struct(p, tok))), s -> s.tok))")
          .as("__kept_text"))
    toks.selectExpr("doc_id", s"CAST(${d.len("tk")} AS BIGINT) AS n_tokens")
      .join(kept, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_tokens",
        "n_tokens - coalesce(__n_kept, CAST(0 AS BIGINT)) AS n_removed",
        "coalesce(__kept_text, '') AS kept_text")
  }

  /** Length-banded edit-distance near-dup pairs (high-precision verifier;
    * see q76 for the recall/cost trade).
    *
    * This is QUADRATIC within a length band — a verifier for candidate
    * sets, not a corpus-scale dedup path (that is [[dropNearDuplicates]]).
    * `maxBandSize` makes the scope programmatic, not just Scaladoc: the
    * operator eagerly counts each band (one tiny aggregate, dwarfed by
    * the pairwise join it guards) and FAILS when any band exceeds the
    * cap. Failing beats silently capping here: a verifier that quietly
    * dropped pairs would report false "no duplicates". */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int, bandWidth: Int = 100,
      maxBandSize: Int = DefaultMaxBucketSize): DataFrame = {
    val slice = docs.selectExpr(s"$idCol AS doc_id", s"$textCol AS text",
      s"length($textCol) DIV $bandWidth AS len_band")
    val worst = slice.groupBy("len_band").count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    require(worst <= maxBandSize,
      s"editDistancePairs: a length band holds $worst docs (> maxBandSize=" +
        s"$maxBandSize) — ${worst * worst / 2} comparisons in one band; " +
        "use dropNearDuplicates (bucketed LSH) for corpus-scale dedup, or " +
        "raise maxBandSize deliberately")
    slice.as("a").join(slice.as("b"),
        col("a.len_band") === col("b.len_band") && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "levenshtein(a.text, b.text) AS edit_dist")
      .where(s"edit_dist <= $maxDistance")
  }

  /** Incremental exact dedup of an `incoming` batch against a `history`
    * corpus — EXACT output (= incoming ANTI JOIN history on content
    * hash), with a Bloom pre-filter so the anti-join's shuffle carries
    * only the rows that might be duplicates, not the whole batch.
    *
    * Two phases:
    *  1. build one mergeable Bloom filter over xxhash64 of history's
    *     content (map-side-combinable `bloom_agg`; ONE m/8-byte value
    *     leaves the executors) and ship it as a BROADCAST VARIABLE
    *     probed through `bloom_contains_bcast` — the bytes travel once
    *     per executor over the torrent protocol, NOT per task binary
    *     (a `lit(filter)` embed deserializes the whole filter per task,
    *     catastrophic at the GB-scale sizing below; a broadcast-join
    *     alternative would memcpy the filter into every joined row);
    *  2. rows the filter rejects are DEFINITELY new (no false
    *     negatives) and short-circuit past the join entirely; only the
    *     survivors — true duplicates plus the configured false-positive
    *     rate of the batch — are anti-joined against history's md5 set
    *     for exactness.
    *
    * At 100 TB: the history is scanned once per filter refresh (the
    * filter is mergeable, so per-partition partials maintain it
    * incrementally), and per batch the exchange carries
    * |dups| + fp·|incoming| rows instead of |incoming|. Size m for the
    * history cardinality (1% FP at 10⁹ keys ≈ 1.2 GB — a valid
    * broadcast; past the 2 GB `Array[Byte]` wall or driver RAM use
    * [[newAgainstHistoryPartitioned]], which never collects a filter). */
  def newAgainstHistory(history: DataFrame, incoming: DataFrame,
      textCol: String,
      numBits: Int = 1 << 20, numProbes: Int = 5): DataFrame = {
    val filter = history
      .selectExpr(s"bloom_agg(xxhash64($textCol), $numBits, $numProbes) AS f")
      .head().getAs[Array[Byte]](0)
    val handle = graft.functions.BloomBroadcasts.register(
      history.sparkSession.sparkContext.broadcast(filter))
    // An exception before the plan resolves the handle (eager analysis of
    // the withColumn Dataset) would otherwise leave the registry's strong
    // pin in place forever — no plan escapes here, so release is safe.
    try {
      splitConfirm(history,
        incoming.withColumn("__maybe_seen",
          org.apache.spark.sql.functions.call_function("bloom_contains_bcast",
            lit(handle), expr(s"xxhash64($textCol)"))),
        textCol)
    } catch { case e: Throwable =>
      graft.functions.BloomBroadcasts.release(handle); throw e
    }
  }

  /** [[newAgainstHistory]] for histories whose single filter would blow
    * the 2 GB `Array[Byte]` wall (≈ 1.7·10⁹ keys at 1% FP): the history
    * is hash-bucketed and ONE filter built PER BUCKET (`groupBy(bucket)`
    * over the same mergeable aggregate), each broadcast separately and
    * probed through a CASE dispatch on a ONCE-computed bucket column.
    * An incoming row whose bucket holds no history probes NULL →
    * definitely new.
    *
    * All buckets share `numBits`, so the total footprint is
    * numBuckets × (numBits/8 + 8) bytes — driver RAM still holds the sum
    * while broadcasting (each array is just individually far from the
    * 2 GB wall). For histories whose filter sum exceeds driver RAM use
    * [[newAgainstHistoryPartitioned]]. */
  def newAgainstHistoryBucketed(history: DataFrame, incoming: DataFrame,
      textCol: String, numBuckets: Int = 16,
      numBits: Int = 1 << 20, numProbes: Int = 5): DataFrame = {
    require(numBuckets >= 1, s"numBuckets $numBuckets < 1")
    val sc = history.sparkSession.sparkContext
    // Registered handles are strongly pinned until the plan resolves
    // them; if anything throws between a register and plan construction
    // (a later broadcast failing mid-loop, an analysis error on
    // `incoming`), release every handle registered so far — no plan has
    // escaped, so the broadcasts are safely destroyable.
    val registered = scala.collection.mutable.ArrayBuffer.empty[Int]
    try {
      val handles = history
        .selectExpr(s"pmod(xxhash64($textCol), $numBuckets) AS __b",
          s"xxhash64($textCol) AS __h")
        .groupBy("__b")
        .agg(org.apache.spark.sql.functions.call_function("bloom_agg",
          col("__h"), lit(numBits), lit(numProbes)).as("__f"))
        .collect()
        .map { r =>
          val h = graft.functions.BloomBroadcasts.register(
            sc.broadcast(r.getAs[Array[Byte]](1)))
          registered += h
          r.getLong(0) -> h
        }
        .sortBy(_._1)
      // bucket + hash computed ONCE per row (not per CASE arm); only the
      // matching arm's probe evaluates.
      val dispatch = handles.foldRight(lit(null).cast("boolean")) {
        case ((b, handle), rest) =>
          when(col("__bloom_b") === b,
            org.apache.spark.sql.functions.call_function("bloom_contains_bcast",
              lit(handle), col("__bloom_h"))).otherwise(rest)
      }
      val marked = incoming
        .withColumn("__bloom_h", expr(s"xxhash64($textCol)"))
        .withColumn("__bloom_b", pmod(col("__bloom_h"), lit(numBuckets.toLong)))
        .withColumn("__maybe_seen", dispatch)
        .drop("__bloom_h", "__bloom_b")
      splitConfirm(history, marked, textCol)
    } catch { case e: Throwable =>
      registered.foreach(graft.functions.BloomBroadcasts.release)
      throw e
    }
  }

  /** The beyond-driver-RAM Bloom path: per-bucket filters that NEVER
    * leave the executors. The history's filters are built per bucket as
    * a distributed relation (one row per bucket) and both sides are
    * repartitioned by the bucket via a typed cogroup — each group sees
    * exactly one filter plus its incoming rows, probes them locally,
    * and the filter bytes are materialized once per GROUP, not copied
    * per row (the cost a bucket-keyed equi-join would pay).
    *
    * Cost: one extra shuffle of `incoming` (by bucket) and one of the
    * filter relation (numBuckets rows) through the object-serialized
    * typed API — the trade for a history too large to broadcast at
    * all. Exactness tail identical to [[newAgainstHistory]]. */
  def newAgainstHistoryPartitioned(history: DataFrame, incoming: DataFrame,
      textCol: String, numBuckets: Int = 64,
      numBits: Int = 1 << 20, numProbes: Int = 5): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    require(numBuckets >= 1, s"numBuckets $numBuckets < 1")
    val filters = history
      .selectExpr(s"pmod(xxhash64($textCol), $numBuckets) AS __b",
        s"xxhash64($textCol) AS __h")
      .groupBy("__b")
      .agg(org.apache.spark.sql.functions.call_function("bloom_agg",
        col("__h"), lit(numBits), lit(numProbes)).as("__f"))
    val n = incoming.schema.size
    val keyed = incoming
      .withColumn("__bloom_b", expr(s"pmod(xxhash64($textCol), $numBuckets)"))
      .withColumn("__bloom_h", expr(s"xxhash64($textCol)"))
    val outSchema = StructType(incoming.schema.fields :+
      StructField("__maybe_seen", BooleanType, nullable = true))
    val marked = keyed.groupByKey(_.getLong(n))(Encoders.scalaLong)
      .cogroup(filters.groupByKey(_.getLong(0))(Encoders.scalaLong)) {
        (_, rows, fs) =>
          val f = if (fs.hasNext) fs.next().getAs[Array[Byte]]("__f") else null
          rows.map { r =>
            val seen: Any =
              if (f == null) null
              else graft.functions.BloomOps.mightContain(f, r.getLong(n + 1))
            Row.fromSeq(r.toSeq.dropRight(2) :+ seen)
          }
      }(Encoders.row(outSchema))
    splitConfirm(history, marked.toDF(), textCol)
  }

  /** Shared exactness tail of the Bloom dedup paths. `marked` is the
    * incoming batch with a `__maybe_seen` probe column: rows whose probe
    * is false or NULL are definitely new (NULL text / empty bucket — an
    * anti-join would keep them too, NULL never equi-matches); probe
    * survivors are anti-joined on md5 content for exactness. */
  private def splitConfirm(history: DataFrame, marked: DataFrame,
      textCol: String): DataFrame = {
    val surelyNew = marked
      .where(col("__maybe_seen").isNull || !col("__maybe_seen"))
      .drop("__maybe_seen")
    val confirmed = marked.where(col("__maybe_seen")).drop("__maybe_seen")
      .withColumn("__ch", md5(col(textCol)))
      .join(history.select(md5(col(textCol)).as("__ch")).distinct(),
        Seq("__ch"), "left_anti")
      .drop("__ch")
    surelyNew.unionAll(confirmed)
  }
}
