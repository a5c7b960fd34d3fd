package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.SqlDialect

/** Benchmark decontamination — the train/eval overlap scrub every LLM
  * training-data pipeline runs before a corpus ships: a training document
  * that shares even one long word n-gram with an evaluation document
  * leaks the benchmark into the weights, so such documents are flagged
  * (for audit) and dropped (for the shipped corpus). The classic recipe
  * is verbatim 13-gram overlap on lowercased, whitespace-split text
  * (GPT-3 appendix C / PaLM-style); `n` is a parameter because shorter
  * grams trade precision for recall.
  *
  * Scale shape (the part that matters at 100 TB): the EVAL side is small
  * by nature — benchmarks are thousands of documents, the corpus is
  * billions — so its distinct n-gram set is collected into a BROADCAST
  * hash relation, and the corpus side streams through a map-side
  * broadcast join: the corpus's exploded n-grams are never shuffled, the
  * only exchange is the per-doc hit count over the (tiny) matching rows.
  * The explicit `broadcast()` hint encodes the size contract; an eval
  * set too large to broadcast is a different problem (route it through
  * [[Dedup.minhashLshPairs]] on the union instead).
  *
  * Both engines evaluate the SAME dialect template for the n-gram set
  * (the subwordTokExpr precedent), so the q103 oracle re-proves the
  * semantics cross-engine every round.
  */
object Decontamination {

  /** Distinct word n-grams of `textCol` — lowercased, whitespace-split,
    * n consecutive tokens joined by one space; empty for docs shorter
    * than n words. Dialect-parameterized so the DuckDB oracle runs the
    * identical construction. */
  def ngramsExpr(d: SqlDialect, textCol: String, n: Int): String = {
    require(n >= 2 && n <= 64, s"n-gram width $n not in [2, 64]")
    d.bind(d.splitSpace(s"lower(coalesce($textCol, ''))"), "tk",
      d.adistinct(d.map(d.range1(s"${d.len("tk")} - ${n - 1}"), "i",
        d.wordSlice("tk", "i", n))))
  }

  /** (doc_id, ngram) relation — one row per distinct n-gram per doc. */
  def ngrams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val d = graft.queries.SparkSql
    docs.selectExpr(s"$idCol AS doc_id",
      s"explode(${ngramsExpr(d, textCol, n)}) AS ngram")
  }

  /** Corpus documents sharing at least one n-gram with the eval set:
    * (doc_id, n_hits) where n_hits counts the doc's DISTINCT n-grams
    * that appear anywhere in eval. The audit artifact — review it before
    * dropping (a hit on a common boilerplate gram may warrant a bigger
    * `n`, not a drop). */
  def contaminationHits(corpus: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int = 13): DataFrame = {
    val evalGrams = ngrams(evalDocs.selectExpr(s"0 AS __eid", s"$evalTextCol AS __etext"),
      "__eid", "__etext", n).select("ngram").distinct()
    ngrams(corpus, idCol, textCol, n)
      .join(broadcast(evalGrams), "ngram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The shipped corpus: `corpus` minus every contaminated document. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String, n: Int = 13): DataFrame =
    corpus.join(
      contaminationHits(corpus, idCol, textCol, evalDocs, evalTextCol, n)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** FUZZY decontamination — the near-dup complement of
    * [[contaminationHits]]: corpus documents whose 3-token shingle set
    * reaches >= `jaccardThreshold` Jaccard with ANY eval document.
    * Catches lightly paraphrased / truncated / decorated benchmark
    * leakage that verbatim n-gram overlap misses (Lee et al. 2022 §6 —
    * exact-substring "dirty" splits undercount contamination).
    *
    * Same banded-LSH machinery as [[Dedup.minhashLshPairs]] but
    * CROSS-corpus: each side's (id, shingles, sigs) relation is built
    * once (corpus side materialized — the signature discipline; eval
    * side is benchmark-sized), candidates come from an equi-join of the
    * two band relations (never all-pairs; corpus bands hot-bucket
    * capped), survivors confirm on exact shingle Jaccard. The exchange
    * carries band keys and candidate id pairs only. Output: one row per
    * contaminated corpus doc — (doc_id, n_hits, max_jaccard). */
  def nearDupHits(corpus: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalIdCol: String, evalTextCol: String,
      jaccardThreshold: Double,
      maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val d = graft.queries.SparkSql
    def sigRel(docs: DataFrame, id: String, text: String, as: String) =
      docs.where(s"${d.len(d.splitSpace(text))} >= 3")
        .selectExpr(s"$id AS $as", s"${Dedup.shingles(text)} AS shingles")
        .selectExpr(as, "shingles", "minhash_sigs(shingles) AS sigs")
        .localCheckpoint(true)
    def bands(sig: DataFrame, as: String) =
      sig.selectExpr(as, "sigs", "explode(sequence(0, 5)) AS j")
        .selectExpr(as,
          """concat(CAST(j AS STRING), ':',
                    CAST(element_at(sigs, 2*j+1) AS STRING), '|',
                    CAST(element_at(sigs, 2*j+2) AS STRING)) AS bucket""")
    val csig = sigRel(corpus, idCol, textCol, "doc_id")
    val esig = sigRel(evalDocs, evalIdCol, evalTextCol, "eval_id")
    val cand = Dedup.capBuckets(bands(csig, "doc_id"), maxBucketSize)
      .join(bands(esig, "eval_id"), "bucket")
      .select("doc_id", "eval_id").distinct()
    cand
      .join(csig.select(col("doc_id"), col("shingles").as("ca")), "doc_id")
      .join(esig.select(col("eval_id"), col("shingles").as("ea")), "eval_id")
      .selectExpr("doc_id", "eval_id",
        s"round(CAST(${d.interSize("ca", "ea")} AS DOUBLE) / " +
          s"CAST(${d.unionSize("ca", "ea")} AS DOUBLE), 6) AS jaccard")
      .where(s"jaccard >= $jaccardThreshold")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), max("jaccard").as("max_jaccard"))
  }
}
