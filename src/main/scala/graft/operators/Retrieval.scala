package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, expr, lit}

/** BM25 ranked retrieval (Robertson & Spärck Jones; the Okapi BM25
  * scoring Lucene ships as its default) — the keyword-search complement
  * to the embedding ANN stack ([[Similarity]]/[[GraphAnn]]): LLM data
  * pipelines use it for eval-set mining, targeted corpus slicing
  * ("every doc mentioning X"), and hybrid (lexical + vector) retrieval.
  *
  * {{{
  *   score(d, q) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
  *                            / (tf(t,d) + k1·(1 − b + b·len(d)/avgdl))
  *   idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )   [Lucene form]
  * }}}
  *
  * Scale shape — the inverted-index probe, not a corpus scan per query:
  * tokens explode once, the query-term filter cuts the exploded relation
  * to rows whose term is one of |q| literals (pushed into the scan;
  * everything else never leaves the mapper), tf is a map-side-combined
  * (term, doc) count, and df(t) computed AFTER that filter is exact
  * full-corpus df for the probed terms (the filter keeps every doc
  * containing t). The only whole-corpus aggregate is (N, avgdl) — one
  * map-side-combined global agg, broadcast back as a 1-row frame; pass
  * `stats` to reuse a precomputed pair across many probes (the realistic
  * serving path: corpus stats change per ingest, not per query). Top-k
  * plans as TakeOrdered (per-partition heaps, k-row merge).
  */
object Retrieval {

  /** Corpus stats for [[bm25TopK]]: one row (n_docs BIGINT, avgdl
    * DOUBLE). Computed once per corpus version, reused across probes. */
  def bm25Stats(docs: DataFrame, textCol: String): DataFrame =
    docs.selectExpr(s"CAST(size(split($textCol, ' ')) AS BIGINT) AS __len")
      .selectExpr("CAST(count(*) AS BIGINT) AS n_docs",
        "CAST(avg(__len) AS DOUBLE) AS avgdl")

  /** Top-k documents for a bag of query terms under BM25. Returns
    * (id, score, n_hits) — score rounded to 6 decimals with ties broken
    * by id, so the ranking is total and both engines agree row-for-row;
    * n_hits = how many distinct query terms the doc contains. Duplicate
    * query terms are collapsed (set semantics, the standard bag-of-words
    * simplification). Terms must be space-free (they are matched against
    * whitespace tokens); empty or symbol-bearing terms are rejected
    * rather than silently never matching or breaking the SQL literal. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int, k1: Double = 1.2, b: Double = 0.75,
      stats: Option[DataFrame] = None): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    require(queryTerms.forall(_.matches("[a-z0-9]+")),
      s"query terms must be lowercase alphanumerics (token-matchable, " +
        s"SQL-literal-safe), got $queryTerms")
    require(topK > 0, s"topK must be positive, got $topK")
    val terms = queryTerms.distinct.map(t => s"'$t'").mkString(", ")
    val st = stats.getOrElse(bm25Stats(docs, textCol))
    // materialize the probe ONCE: both the df aggregate and the scoring
    // join read this relation — lazily, the corpus explode+filter scan
    // would run twice (the q102/q108 single-materialization discipline).
    // Blocks are (matching docs × query terms)-sized, released by the
    // ContextCleaner when the result frame dies.
    val tf = docs
      .selectExpr(s"$idCol AS __id",
        s"CAST(size(split($textCol, ' ')) AS BIGINT) AS __len",
        s"explode(split($textCol, ' ')) AS __term")
      .where(s"__term IN ($terms)")
      .groupBy("__id", "__len", "__term")
      .agg(expr("CAST(count(*) AS BIGINT)").as("__tf"))
      .localCheckpoint(true)
    val df = tf.groupBy("__term")
      .agg(expr("CAST(count(*) AS BIGINT)").as("__df"))
    tf.join(broadcast(df), "__term")
      .crossJoin(broadcast(st))
      .withColumn("__idf", expr(
        "ln((CAST(n_docs AS DOUBLE) - __df + 0.5) / (__df + 0.5) + 1.0)"))
      .withColumn("__s", expr(
        s"""__idf * (CAST(__tf AS DOUBLE) * ${k1 + 1.0})
            / (CAST(__tf AS DOUBLE) + $k1 * (1.0 - $b + $b * __len / avgdl))"""))
      .groupBy("__id")
      // Per-doc term contributions are summed by a SEQUENTIAL fold in
      // term order, not sum(): a doc's (term, tf) rows arrive from
      // whichever partitions the (id, term) exchange hashed them to, so
      // a float sum() adds in arrival order — nondeterministic in the
      // last ulp, which can flip the 6-dp rounding on a knife-edge
      // score. The sorted fold fixes the addition order (term is unique
      // per doc) and the oracle replays the same left-to-right sum via
      // an ORDER BY term list aggregate.
      .agg(expr(
        """round(aggregate(
             transform(array_sort(collect_list(struct(__term, __s))), x -> x.__s),
             CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 6)""").as("score"),
        expr("CAST(count(*) AS BIGINT)").as("n_hits"))
      .select(col("__id").as(idCol), col("score"), col("n_hits"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * the standard hybrid-retrieval combiner: given ranked lists from
    * independent retrievers (BM25, vector ANN, ...), each doc scores
    * {{{
    *   rrf(d) = Σ_{arms containing d} 1 / (rrfK + rank_arm(d))
    * }}}
    * Rank-based, so arms with incomparable score scales (cosine vs BM25)
    * fuse without calibration. Returns (idCol, rrf_score, n_arms) top-k
    * by (score desc, id).
    *
    * Determinism: contributions are summed by a SEQUENTIAL fold over the
    * per-doc contribution list sorted by arm index — a fixed float
    * addition order, so results are bit-stable under any partitioning
    * and an oracle replays the same left-to-right sum (coalesce-chained
    * per-arm terms). Each input must rank a doc at most once; ranks must
    * be positive.
    *
    * Scale shape: inputs are already top-k lists (tiny); the fusion is
    * one union + one grouped fold over ≤ Σ|arm| rows. */
  def rrfFuse(ranked: Seq[DataFrame], idCol: String, rankCol: String,
      topK: Int, rrfK: Int = 60): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse: no ranked lists")
    require(topK > 0 && rrfK >= 1, s"topK $topK / rrfK $rrfK out of range")
    val arms = ranked.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).as("__id"), lit(i).as("__arm"),
        col(rankCol).cast("long").as("__rank"))
    }
    arms.reduce(_ unionAll _)
      .groupBy("__id")
      .agg(
        expr(s"""round(aggregate(
                   array_sort(collect_list(struct(__arm, __rank))),
                   CAST(0.0 AS DOUBLE),
                   (acc, x) -> acc + 1.0 / ($rrfK + x.__rank)), 6)""").as("rrf_score"),
        expr("CAST(count(*) AS BIGINT)").as("n_arms"))
      .select(col("__id").as(idCol), col("rrf_score"), col("n_arms"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }
}
