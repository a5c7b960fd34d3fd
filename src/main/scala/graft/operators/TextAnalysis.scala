package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{SparkSql, SqlDialect}

/** The engine's text-analysis library — the reusable API behind parity
  * queries q50-q53 and q66-q67. All pure projections / standard
  * aggregation shapes; every function takes (id, text) columns by name.
  */
object TextAnalysis {

  private val d = SparkSql
  private def toks(textCol: String) = d.splitSpace(textCol)

  /** Whitespace + BPE-ish token counts and chars-per-token. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.selectExpr(
      s"$idCol AS doc_id",
      s"${d.len(toks(textCol))} AS n_ws_tokens",
      s"size(regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS n_bpe_tokens",
      s"length($textCol) AS n_chars",
      s"round(CAST(length($textCol) AS DOUBLE) / CAST(${d.len(toks(textCol))} AS DOUBLE), 4) AS chars_per_token")

  /** Length/punctuation/stopword quality features + bucket. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame =
    docs.selectExpr(
      s"$idCol AS doc_id",
      s"${d.len(toks(textCol))} AS n_tokens",
      s"${d.len(d.filterIn(toks(textCol), stopwords))} AS stop_tokens",
      s"length(regexp_replace($textCol, '[a-z ]', '')) AS punct_chars",
      s"length($textCol) AS n_chars")
      .selectExpr(
        "doc_id", "n_tokens", "stop_tokens", "punct_chars", "n_chars",
        "round(CAST(stop_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio",
        "round(CAST(punct_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 4) AS punct_ratio",
        """CASE WHEN n_tokens >= 40 AND CAST(stop_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.02 THEN 'good'
                WHEN n_tokens >= 15 THEN 'ok'
                ELSE 'short' END AS quality_bucket""")

  /** Winnowing-style rolling min-hash + md5-prefix fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.selectExpr(
      s"$idCol AS doc_id",
      d.bind(toks(textCol), "tk",
        d.amin(d.map(
          d.map(d.range("1", s"greatest(${d.len("tk")} - 4, 1)"), "i", d.wordSlice("tk", "i", 5)),
          "w", d.hex32("w")))) + " AS fp_rolling_min",
      s"substring(md5($textCol), 1, 16) AS fp_md5_prefix")

  /** Corpus term frequency (unigrams + bigrams) with document frequency.
    * Written in the NATURAL count + countDistinct form — the engine's
    * DistinctAggRewrite optimizer rule plans it Expand-free (two-level
    * aggregation), which is what makes it viable on an exploded 100 TB
    * token relation. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigrams = d.bind(toks(textCol), "tk",
      d.map(d.range1(s"${d.len("tk")} - 1"), "i", d.wordSlice("tk", "i", 2)))
    val uni = docs.selectExpr(s"$idCol AS doc_id", s"explode(${toks(textCol)}) AS term")
      .selectExpr("'unigram' AS kind", "doc_id", "term")
    val big = docs.selectExpr(s"$idCol AS doc_id", s"explode($bigrams) AS term")
      .selectExpr("'bigram' AS kind", "doc_id", "term")
    uni.unionAll(big)
      .groupBy("kind", "term")
      .agg(count(lit(1)).as("n_total"), countDistinct(col("doc_id")).as("n_docs"))
  }

  /** Rare-token density — the corpus-frequency quality filter a
    * pretraining pipeline runs after dedup: a document whose tokens are
    * mostly corpus-rare is noise (OCR garbage, codes, boilerplate IDs);
    * one whose tokens are all corpus-common carries no information.
    * Output per document: token count, tokens whose corpus document
    * frequency is ≤ `rareDf`, and the rarity in integer BASIS POINTS
    * (`CAST(floor(ratio·10⁴+0.5) AS BIGINT)`): single-rounding IEEE
    * from exact integer counts, then hashed as an integer — no double
    * ever reaches the comparison surface (round-3 verdict item 1).
    *
    * Shape: explode → df aggregation → shuffle equi-join on term →
    * per-doc re-aggregation. Same scale story as TF-IDF (q67): both
    * sides partially aggregated before their exchanges, AQE free to
    * broadcast a small vocabulary. Integer counts only — no logs, so no
    * cross-engine transcendental drift. */
  def rareTokenScore(docs: DataFrame, idCol: String, textCol: String,
      rareDf: Int): DataFrame = {
    val terms = docs.selectExpr(s"$idCol AS doc_id", s"explode(${toks(textCol)}) AS term")
    val df = terms.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    terms.join(df, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("df") <= rareDf, 1L).otherwise(0L)).as("n_rare"))
      .selectExpr("doc_id", "n_tokens", "n_rare",
        "CAST(floor(CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS rare_bp")
  }

  /** Greedy longest-match wordpiece tokenization over a driver-capped
    * vocabulary — the subword token accounting an LLM training-data
    * pipeline budgets corpora with (whitespace counts under-count tokens
    * 1.3-1.5× vs a real subword vocab, which corrupts mixture weights).
    *
    * Semantics (what both engines compute, pinned by SubwordSpec):
    * words = space-split of lower(text), empties dropped, each word
    * TRUNCATED to `maxWordLen` chars (bounds the per-word loop — a 10 kB
    * pathological "word" must not expand into a 10k-step fold); per word,
    * from position 1: consume the LONGEST vocab piece matching at the
    * position, else one UNK character. Outputs per doc: n_words,
    * n_subwords (pieces + UNKs), n_unk.
    *
    * Scale shape: a PURE PROJECTION — the vocabulary is constant-folded
    * into the row expression (the broadcast-vocab design without even a
    * broadcast variable), so there is no join, no shuffle, no state; the
    * scan parallelizes like any map. The greedy loop runs as a
    * higher-order `aggregate` fold with the (pos, count, unk) state
    * PACKED into one BIGINT (pos·2^32 + cnt·2^16 + unk) — the only
    * accumulator type whose fold both engines express identically, which
    * is what lets [[subwordExprs]] emit the SAME algorithm for Spark and
    * the DuckDB oracle from one template. No UDFs.
    *
    * Vocabulary contract: lowercase-ASCII pieces (strArray's no-escaping
    * regime), ≤ 255 per call, each ≤ maxWordLen chars — "driver-capped":
    * a genuine 30k-entry BPE vocab would move to a broadcast join on a
    * prefix key; this is the constant-folded variant that covers the
    * corpus-accounting use. */
  def subwordCounts(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String], maxWordLen: Int = 64): DataFrame = {
    // same validation as the template emitter (shared contract)
    subwordTokExpr(d, textCol, vocab, maxWordLen)
    // Spark side runs the native subword_stats twin (one codegen'd JVM
    // loop/row; the interpreted HOF fold measured 3.6 s vs ~0.1 s on the
    // sf0.001 bench) — the oracle runs the HOF template, so the q101
    // gate continuously proves the two implementations equivalent.
    val words = d.filterBy(d.splitSpace(s"lower(coalesce($textCol, ''))"), "w0", "w0 <> ''")
    docs
      .selectExpr(s"$idCol AS doc_id",
        s"subword_stats($words, ${d.strArray(vocab)}, $maxWordLen) AS __s")
      .selectExpr("doc_id",
        "element_at(__s, 1) AS n_words",
        "element_at(__s, 2) AS n_subwords",
        "element_at(__s, 3) AS n_unk")
  }

  /** The three per-doc outputs over a bound packed-fold column (n_words,
    * n_subwords, n_unk) — split from [[subwordTokExpr]] so the fold runs
    * ONCE per row (a projection boundary on the Spark side, a subquery in
    * the oracle; neither engine CSEs lambda expressions). */
  def subwordCountExprs(d: SqlDialect, tokCol: String): Seq[String] = Seq(
    s"CAST(${d.len(tokCol)} AS BIGINT) AS n_words",
    // coalesce: DuckDB list_sum([]) is NULL where Spark's fold is 0 —
    // pin the zero-word doc to 0 in both engines
    s"coalesce(${d.isum(d.map(tokCol, "f", cntOf(d, "f")))}, CAST(0 AS BIGINT)) AS n_subwords",
    s"coalesce(${d.isum(d.map(tokCol, "f", unkOf("f")))}, CAST(0 AS BIGINT)) AS n_unk")

  private def cntOf(d: SqlDialect, f: String) = d.idiv(s"($f % 4294967296)", "65536")
  private def unkOf(f: String) = s"($f % 65536)"

  /** Packed per-word greedy-fold array for a whole document (see
    * [[subwordCounts]] for the encoding). Dialect-parameterized so the
    * oracle SQL is generated from the SAME template (AnnQueries.bucketExpr
    * precedent). */
  def subwordTokExpr(d: SqlDialect, textCol: String, vocab: Seq[String],
      maxWordLen: Int): String = {
    require(vocab.nonEmpty && vocab.size <= 255, s"vocab size ${vocab.size} not in [1, 255]")
    require(vocab.distinct.size == vocab.size, "vocab has duplicate pieces")
    require(maxWordLen >= 1 && maxWordLen <= 255, s"maxWordLen $maxWordLen not in [1, 255]")
    require(vocab.forall(p => p.nonEmpty && p.length <= maxWordLen),
      s"vocab pieces must be 1..$maxWordLen chars")
    val vlit = d.strArray(vocab)
    // longest vocab piece matching word `w` at 1-based pos `wp` (NULL if none)
    val bestLen = d.amax(d.map(
      d.filterBy(vlit, "p", "substr(w, wp, length(p)) = p"), "p", "length(p)"))
    // one greedy step: done → pass through; else consume best piece or 1 UNK char
    val step = d.bind(d.idiv("acc", "4294967296"), "wp",
      d.bind(bestLen, "bl",
        s"CASE WHEN wp > length(w) THEN acc ELSE" +
          s" (wp + CAST(coalesce(bl, 1) AS BIGINT)) * 4294967296" +
          s" + (${cntOf(d, "acc")} + 1) * 65536" +
          s" + ${unkOf("acc")} + (CASE WHEN bl IS NULL THEN 1 ELSE 0 END)" +
          s" END"))
    // each step advances pos by >= 1, so length(w) iterations always finish
    val wordFold = d.ifoldn("length(w)", "CAST(4294967296 AS BIGINT)", step)
    val words = d.filterBy(d.splitSpace(s"lower(coalesce($textCol, ''))"), "w0", "w0 <> ''")
    d.map(d.map(words, "wt", s"substr(wt, 1, $maxWordLen)"), "w", wordFold)
  }

  /** Top-k TF-IDF terms per document.
    *
    * The tf⋈df join is a plain shuffle equi-join on `term`: both sides are
    * already partially aggregated before their exchanges, and AQE converts
    * the join to broadcast at runtime when the document-frequency side
    * fits `spark.sql.autoBroadcastJoinThreshold`. Do NOT force
    * `broadcast(df)` here (round-2 advice): the vocabulary of a web-scale
    * corpus — especially with bigrams — is billions of terms, far past any
    * broadcast limit, and a forced hint OOMs the driver; letting AQE
    * decide gives the broadcast plan on small vocabularies (measured: at
    * sf0.01 AQE broadcasts this join) and the scalable shuffle join on
    * huge ones. The 1-row corpus count stays an explicit broadcast. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val terms = docs.selectExpr(s"$idCol AS doc_id", s"explode(${toks(textCol)}) AS term")
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .selectExpr("doc_id", "term", "tf", "df",
        "tf * ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS score")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .where(col("rank") <= k)
      .selectExpr("doc_id", "term", "tf", "df", "round(score, 6) AS score", "rank")
  }
}
