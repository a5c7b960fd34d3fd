package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, expr}

/** Data Selection via Importance Resampling (DSIR; Xie et al.,
  * NeurIPS 2023) — the published recipe for slicing a raw crawl toward
  * a target distribution (quality corpus, target domain, target
  * language): score every raw document by how much more likely its
  * hashed bag-of-words is under the target's unigram distribution than
  * under the raw corpus's own, then keep the top slice.
  *
  * {{{
  *   w(d) = Σ_b c_b(d) · [ ln p̂_T(b) − ln p̂_R(b) ]
  *   p̂(b) = (count(b) + 1) / (total + B)        [add-one smoothing]
  * }}}
  * with tokens hashed into `buckets` feature buckets by the two-dialect
  * `md5_u32` (so a DuckDB oracle replays the exact bucketing — the
  * paper's hashing trick doubles as the parity mechanism).
  *
  * Scale shape: ONE scan of the raw corpus producing the (doc, bucket)
  * count relation — bounded by docs × min(B, doc_len), the thing
  * actually materialized; the raw bucket histogram is a RE-AGGREGATION
  * of that relation (never a second corpus scan), the target histogram
  * is one scan of the (small) target set, and both histograms are
  * B-row broadcasts. The per-doc weight is a fixed-order fold over the
  * doc's buckets (the BM25/RRF discipline: float addition order pinned
  * by sorting on the unique bucket id, so results are bit-stable under
  * any partitioning), rounded to 6 dp with id tie-break — a total
  * ranking both engines agree on row-for-row.
  */
object Dsir {

  /** Per-document importance weights of `raw` toward `target`.
    * Returns (idCol, weight DOUBLE 6dp, n_toks BIGINT). NULL text is
    * treated as EMPTY text (both tokenize to one empty-string token and
    * score identically), so every input document appears in the output
    * — mapping NULL to '' at the tokenizer costs nothing, where keeping
    * a separate weight-0 contract for NULL would need a corpus-wide
    * outer join just to re-attach the dropped ids. */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // (doc, bucket) token counts — the one corpus-scan product; both the
    // scoring join and the raw histogram read it (materialize once, the
    // q102/q108/BM25 discipline). Blocks bounded by docs × buckets.
    val docCounts = raw
      .selectExpr(s"$idCol AS __id",
        s"explode(split(coalesce($textCol, ''), ' ')) AS __tok")
      .selectExpr("__id", s"md5_u32(__tok) % $buckets AS __b")
      .groupBy("__id", "__b")
      .agg(expr("CAST(count(*) AS BIGINT)").as("__c"))
      .localCheckpoint(true)
    val rawHist = docCounts.groupBy("__b")
      .agg(expr("CAST(sum(__c) AS BIGINT)").as("__cr"))
    val tgtHist = target
      .selectExpr(s"explode(split($textCol, ' ')) AS __tok")
      .selectExpr(s"md5_u32(__tok) % $buckets AS __b")
      .groupBy("__b")
      .agg(expr("CAST(count(*) AS BIGINT)").as("__ct"))
    val totals = rawHist.selectExpr("CAST(sum(__cr) AS BIGINT) AS __tr")
      .crossJoin(tgtHist.selectExpr("CAST(sum(__ct) AS BIGINT) AS __tt"))
    // per-bucket log ratio, one tiny broadcast relation; buckets the
    // target never hit smooth to ln(1/(T+B))
    val logRatio = rawHist
      .join(tgtHist, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .selectExpr("__b",
        s"""ln((CAST(coalesce(__ct, 0) AS DOUBLE) + 1.0) / (__tt + $buckets))
            - ln((CAST(__cr AS DOUBLE) + 1.0) / (__tr + $buckets)) AS __lr""")
    docCounts
      .join(broadcast(logRatio), "__b")
      .selectExpr("__id", "__b", "CAST(__c AS DOUBLE) * __lr AS __w", "__c")
      .groupBy("__id")
      .agg(
        expr("""round(aggregate(
                  transform(array_sort(collect_list(struct(__b, __w))), x -> x.__w),
                  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v), 6)""").as("weight"),
        expr("CAST(sum(__c) AS BIGINT)").as("n_toks"))
      .select(col("__id").as(idCol), col("weight"), col("n_toks"))
  }

  /** The selection step: top-`k` raw documents by importance weight
    * (weight DESC, id ASC — total order). Plans as TakeOrdered over the
    * weight relation joined back to the docs; the corpus is never
    * sorted globally. */
  def selectTopK(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 64): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = importanceWeights(raw, target, idCol, textCol, buckets)
    raw.join(w, idCol)
      .orderBy(col("weight").desc, col(idCol))
      .limit(k)
  }
}
