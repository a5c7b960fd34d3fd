package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Bigram language-model document scoring — the CCNet-style quality
    * signal (Wenzek et al. 2020: score documents by an n-gram LM over a
    * reference corpus; low-probability text is noise, extremely
    * high-probability text is boilerplate). `train` supplies the LM
    * counts; `score` is the corpus being graded (self-scoring = pass the
    * same frame twice, q110).
    *
    * The model is add-one-smoothed: P(w|prev) = (c2(prev,w)+1) /
    * (c1(prev)+V). Per-token "probability" is emitted in EXACT integer
    * basis points — half-up integer division (20000·(c2+1) + (c1+V)) DIV
    * (2·(c1+V)) — so sums and averages are order-insensitive BIGINTs
    * end to end: no log(), no doubles, no cross-engine transcendental
    * drift (the column-type policy in QuerySpec). A real perplexity
    * needs logs; monotonically it ranks identically per token, and the
    * exact-integer form is what can survive a hash-compare.
    *
    * Scale shape: bigram counts aggregate map-side to vocabulary size
    * before their exchange; c1 derives from c2 (vocab-sized input, not
    * a second corpus pass); V is one driver scalar (J2 precedent). The
    * scoring join is corpus × vocab on the bigram key — AQE broadcasts
    * the count tables when they fit, else it is a plain hash join with
    * map-side-combined re-aggregation per doc. One corpus scan for
    * counts, one for scoring. */
  def bigramLmScores(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val bigramsOf = d.bind(toks(textCol), "tk",
      d.map(d.range1(s"${d.len("tk")} - 1"), "i", d.wordSlice("tk", "i", 2)))
    def bigrams(docs: DataFrame) =
      docs.selectExpr(s"$idCol AS doc_id", s"explode($bigramsOf) AS bigram")
    val c2 = bigrams(train).groupBy("bigram").agg(count(lit(1)).as("n2"))
    val c1 = c2.selectExpr(s"${d.elem(d.splitSpace("bigram"), "1")} AS prev", "n2")
      .groupBy("prev").agg(sum("n2").as("n1"))
    val vSize = train
      .selectExpr(s"explode(${toks(textCol)}) AS tok")
      .agg(countDistinct(col("tok"))).head().getLong(0)
    // LEFT joins so scoring a corpus the LM never saw still smooths:
    // unseen bigram -> c2=0, unseen prefix -> c1=0 (add-one handles both)
    bigrams(score)
      .join(c2, Seq("bigram"), "left")
      .withColumn("prev", expr(d.elem(d.splitSpace("bigram"), "1")))
      .join(c1, Seq("prev"), "left")
      .selectExpr("doc_id", "coalesce(n2, CAST(0 AS BIGINT)) AS n2f",
        "coalesce(n1, CAST(0 AS BIGINT)) AS n1f")
      .selectExpr("doc_id",
        s"${d.idiv(s"(20000 * (n2f + 1) + (n1f + $vSize))", s"(2 * (n1f + $vSize))")} AS bp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("bp").as("sum_bp"))
      .selectExpr("doc_id", "n_bigrams", "sum_bp",
        s"${d.idiv("(2 * sum_bp + n_bigrams)", "(2 * n_bigrams)")} AS avg_bp")
  }

  /** Trigram language-model scoring with STUPID BACKOFF (Brants et al.
    * 2007, "Large Language Models in Machine Translation" — the
    * web-scale recipe that replaces Kneser-Ney's held-out discounting
    * with one fixed backoff factor α=0.4, chosen there precisely
    * because it needs no normalization pass over a corpus too large to
    * hold): the higher-order successor to [[bigramLmScores]]' CCNet
    * shape. Per scored trigram (w1 w2 w3):
    *
    *   S = c3(w1 w2 w3) / c2(w1 w2)                   if the trigram is known
    *     = 0.4 · c2(w2 w3) / c1(w2)                   else if its tail bigram is
    *     = 0.4² · (c1(w3)+1) / (N+V)                  else (add-one floor, so an
    *                                                   unseen WORD still scores)
    *
    * emitted in the same exact-integer basis-point discipline as q110:
    * 10000·S under half-up integer division — level 1 is
    * (20000·c3 + c2) DIV (2·c2), level 2 (8000·c2 + c1) DIV (2·c1),
    * level 3 (3200·(c1+1) + (N+V)) DIV (2·(N+V)); 8000 = 2·0.4·10⁴ and
    * 3200 = 2·0.4²·10⁴ fold α into the numerator exactly (0.4 = 2/5 is
    * exact in integers — the reason α=0.4 survives the no-floats
    * policy). c3>0 implies c2(ctx)>0 and c2(tail)>0 implies c1(w2)>0,
    * so no branch divides by zero.
    *
    * Scale shape: ALL count tables (c1, c2, c3, N, V) come from ONE
    * train-corpus scan — a 3-level `stack` explode whose counts
    * collapse map-side to Σ vocabulary sizes before the exchange; N/V
    * derive from the level-1 rows (vocab-sized input). The scoring
    * join is corpus × vocab on the gram keys — AQE broadcasts the
    * count tables when they fit. Docs with fewer than 3 tokens emit no
    * trigrams and are absent from the output (the q110 contract). */
  def trigramLmScores(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def gramsOf(n: Int) = d.bind(toks(textCol), "tk",
      d.map(d.range1(s"${d.len("tk")} - ${n - 1}"), "i", d.wordSlice("tk", "i", n)))
    // one pass over the train corpus for every count level
    val counts = train.selectExpr(
        s"stack(3, 1, ${gramsOf(1)}, 2, ${gramsOf(2)}, 3, ${gramsOf(3)}) AS (lvl, gs)")
      .selectExpr("lvl", "explode(gs) AS gram")
      .groupBy("lvl", "gram").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds 5 joins + the N/V fold: evaluate once
    val c3 = counts.where(col("lvl") === 3).select(col("gram").as("tri"), col("n").as("n3"))
    val c2 = counts.where(col("lvl") === 2).select(col("gram").as("bi"), col("n").as("n2"))
    val c1 = counts.where(col("lvl") === 1).select(col("gram").as("tok"), col("n").as("n1"))
    val nv = counts.where(col("lvl") === 1)
      .agg(sum("n").cast("long"), count(lit(1))).head()
    val nTotal = nv.getLong(0); val vSize = nv.getLong(1)
    val tri = score.selectExpr(s"$idCol AS doc_id", s"explode(${gramsOf(3)}) AS tri")
      .withColumn("__t", split(col("tri"), " "))
      .selectExpr("doc_id", "tri",
        "concat(__t[0], ' ', __t[1]) AS ctx",
        "concat(__t[1], ' ', __t[2]) AS tail",
        "__t[1] AS w2", "__t[2] AS w3")
    tri
      .join(c3, Seq("tri"), "left")
      .join(c2.select(col("bi").as("ctx"), col("n2").as("n2c")), Seq("ctx"), "left")
      .join(c2.select(col("bi").as("tail"), col("n2").as("n2t")), Seq("tail"), "left")
      .join(c1.select(col("tok").as("w2"), col("n1").as("n1w2")), Seq("w2"), "left")
      .join(c1.select(col("tok").as("w3"), col("n1").as("n1w3")), Seq("w3"), "left")
      .selectExpr("doc_id",
        s"""CASE WHEN coalesce(n3, 0) > 0
                 THEN ${d.idiv("(20000 * n3 + n2c)", "(2 * n2c)")}
                 WHEN coalesce(n2t, 0) > 0
                 THEN ${d.idiv("(8000 * n2t + n1w2)", "(2 * n1w2)")}
                 ELSE ${d.idiv(
                   s"(3200 * (coalesce(n1w3, CAST(0 AS BIGINT)) + 1) + ${nTotal + vSize})",
                   s"(2 * ${nTotal + vSize})")} END AS bp""")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"), sum("bp").as("sum_bp"))
      .selectExpr("doc_id", "n_trigrams", "sum_bp",
        s"${d.idiv("(2 * sum_bp + n_trigrams)", "(2 * n_trigrams)")} AS avg_bp")
  }

  /** ALL word n-gram occurrences (with multiplicity — unlike
    * Decontamination.ngramsExpr's distinct set): n consecutive tokens
    * joined by one space; empty for docs shorter than n words. */
  def allGramsExpr(d: SqlDialect, textCol: String, n: Int): String =
    d.bind(d.splitSpace(textCol), "tk",
      d.map(d.range1(s"${d.len("tk")} - ${n - 1}"), "i", d.wordSlice("tk", "i", n)))

  /** Shannon entropy (nats, 6 dp) of the element distribution of an
    * ARRAY expression — the information-theoretic quality signal next
    * to the Gopher repetition filters: machine-generated boilerplate
    * and keyword-stuffed spam sit at the entropy extremes where
    * natural text does not. Computed per row as a PURE PROJECTION
    * (no explode, no shuffle — at 100 TB the n-gram-histogram
    * formulation would shuffle the corpus; this never leaves the row):
    *
    *   H = ln L − (Σ_v c_v·ln c_v) / L,   v over distinct elements
    *
    * with the Σ folded over the SORTED distinct list — fixed float
    * addition order, bit-stable under any partitioning, and replayed
    * left-to-right identically by the oracle dialect. Per-row cost is
    * O(distinct × L) comparisons; empty arrays score 0. ASCII-element
    * contract (both engines sort ASCII in binary order; non-ASCII tie
    * order is not pinned). */
  def entropyExpr(d: SqlDialect, arrExpr: String): String =
    d.bind(arrExpr, "ea",
      s"""round(CASE WHEN ${d.len("ea")} = 0 THEN CAST(0.0 AS DOUBLE) ELSE
            ln(CAST(${d.len("ea")} AS DOUBLE)) -
            ${d.dsum(d.map(d.asort(d.adistinct("ea")), "v",
              d.bind(s"CAST(${d.len(d.filterBy("ea", "x", "x = v"))} AS DOUBLE)",
                "cv", "cv * ln(cv)")))}
            / CAST(${d.len("ea")} AS DOUBLE) END, 6)""".stripMargin)

  /** Gopher-style repetition filters (Rae et al. 2021, arXiv:2112.11446
    * table A1): documents dominated by repeated n-grams are boilerplate /
    * spam and get filtered before pretraining. Two of the paper's
    * signals, in exact integer basis points:
    *
    *  - `dup3_bp`: the mass fraction of word-3-gram occurrences whose
    *    gram occurs more than once in the doc (mass = occurrences ×
    *    gram characters — the standard reimplementation of the paper's
    *    "fraction of characters in duplicate n-grams"; exact positional
    *    character coverage would need overlap resolution);
    *  - `top2_bp`: the mass fraction of the single most frequent bigram
    *    ("fraction of characters in the most common 2-gram"). Count ties
    *    break to the lexicographically greatest gram — max(struct) here,
    *    row_number (cnt DESC, gram DESC) in the oracle: the same pick.
    *
    * Shape: explode → (doc, gram) count with map-side partials → per-doc
    * re-aggregation. Two corpus scans (3-grams, 2-grams), both
    * embarrassingly keyed on doc_id; no joins against anything
    * corpus-global, so this is a pure per-document pipeline at any
    * scale. Integer counts and lengths only. */
  def repetitionScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def gramCounts(n: Int) = docs
      .selectExpr(s"$idCol AS doc_id", s"explode(${allGramsExpr(d, textCol, n)}) AS gram")
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
    val tri = gramCounts(3)
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams3"),
        sum(expr("c * length(gram)")).as("total3"),
        sum(expr("CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END")).as("dup3"))
      .selectExpr("doc_id", "n_grams3",
        s"${d.idiv("(20000 * dup3 + total3)", "(2 * total3)")} AS dup3_bp")
    val bi = gramCounts(2)
      .groupBy("doc_id")
      .agg(max(struct(col("c"), col("gram"))).as("top"),
        sum(expr("c * length(gram)")).as("total2"))
      .selectExpr("doc_id",
        s"${d.idiv("(20000 * top.c * length(top.gram) + total2)", "(2 * total2)")} AS top2_bp")
    tri.join(bi, Seq("doc_id"))
  }

  /** Overlapping fixed-size token windows per document — the chunker a
    * pretraining/RAG pipeline runs before packing or embedding: chunk i
    * covers tokens [i·stride, i·stride + chunkTokens); the last chunk
    * may be short; stride < chunkTokens yields overlap. A pure
    * projection + explode (zero shuffle at any scale); the same dialect
    * template emits the oracle SQL. Output: (doc_id, chunk_idx,
    * n_chunk_tokens, chunk). */
  def chunkExprs(d: SqlDialect, textCol: String, chunkTokens: Int,
      stride: Int): String = {
    require(chunkTokens >= 1 && stride >= 1 && stride <= chunkTokens,
      s"chunker: need 1 <= stride <= chunkTokens, got ($stride, $chunkTokens)")
    // chunk count = ceil(n_tokens / stride) bounded so the LAST chunk
    // still starts inside the doc: floor((n-1)/stride) + 1 for n >= 1
    val nChunks = s"(${d.idiv(s"(${d.len("tk")} - 1)", stride.toString)} + 1)"
    d.bind(d.splitSpace(textCol), "tk",
      d.map(d.range1(nChunks), "i",
        d.wordSlice("tk", s"(i - 1) * $stride + 1", chunkTokens)))
  }

  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame =
    docs
      .selectExpr(s"$idCol AS doc_id",
        s"posexplode(${chunkExprs(d, textCol, chunkTokens, stride)}) AS (chunk_idx, chunk)")
      .selectExpr("doc_id", "CAST(chunk_idx AS BIGINT) AS chunk_idx",
        s"CAST(${d.len(d.splitSpace("chunk"))} AS BIGINT) AS n_chunk_tokens", "chunk")

  /** Greedy contiguous context-window packing: stream the chunks of one
    * `streamCol` group (e.g. language) in (doc_id, chunk_idx) order and
    * cut a new bin every time the running token total crosses a
    * multiple of `contextTokens` — bin id = exclusive-prefix-sum DIV
    * context. The exact bin-packing a sequence packer wants is
    * order-sensitive; this contiguous approximation is what streaming
    * packers actually run (bins straddle by at most one chunk), and it
    * is fully deterministic: integer cumsum over a total order, keyed
    * window only (one exchange on the stream column). */
  def packChunks(chunks: DataFrame, streamCol: String,
      contextTokens: Int): DataFrame = {
    require(contextTokens >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(streamCol).orderBy("doc_id", "chunk_idx")
    chunks
      .withColumn("__cum",
        sum(col("n_chunk_tokens")).over(w) - col("n_chunk_tokens"))
      .withColumn("bin", expr(s"${d.idiv("__cum", contextTokens.toString)}"))
      .groupBy(col(streamCol), col("bin"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("bin_tokens"))
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

  /** Visible-text expression for [[extractHtmlText]], emitted per
    * dialect: drop script/style blocks (their content has no '<' in the
    * supported regime, so `[^<]*` bounds the block without non-greedy
    * matching), strip all remaining tags, decode the common entities
    * (`&amp;` LAST, the standard unescape order — `&amp;lt;` must yield
    * literal "&lt;", not "<"), collapse runs of spaces, trim. All
    * patterns stay in the backslash-free, quote-free subset both
    * engines parse identically (the PiiRedaction rule). */
  def htmlVisibleExpr(d: SqlDialect, h: String): String = {
    val noScript = d.regexReplaceAll(h, "<script[^>]*>[^<]*</script>", " ")
    val noStyle = d.regexReplaceAll(noScript, "<style[^>]*>[^<]*</style>", " ")
    val noTags = d.regexReplaceAll(noStyle, "<[^>]*>", " ")
    val decoded = s"replace(replace(replace(replace(replace($noTags, " +
      "'&lt;', '<'), '&gt;', '>'), '&nbsp;', ' '), '&quot;', '\"'), '&amp;', '&')"
    s"trim(${d.regexReplaceAll(decoded, "  +", " ")})"
  }

  /** Total chars of anchor inner text, measured on the script-free
    * markup — both engines expose `regexp_extract_all(x, pat, group)`
    * with identical semantics for the backslash-free pattern. COALESCE
    * pins the no-links case: DuckDB's list_sum of an empty list is NULL
    * where Spark's aggregate init is 0. */
  def htmlLinkCharsExpr(d: SqlDialect, h: String): String = {
    val noScript = d.regexReplaceAll(h, "<script[^>]*>[^<]*</script>", " ")
    s"COALESCE(${d.isum(d.map(
      s"regexp_extract_all($noScript, '<a[^>]*>([^<]*)</a>', 1)", "t", "length(t)"))}, 0)"
  }

  /** Main-content extraction from raw HTML — the pre-text step every
    * web-corpus pipeline (CCNet, RefinedWeb) runs before any quality
    * filter: strip boilerplate markup, measure LINK DENSITY (chars of
    * anchor inner text per visible char, the classic boilerplate signal
    * — navigation and spam pages are mostly links), and keep docs that
    * clear the density and length bars. Pure projections — zero shuffle
    * at any scale; integer basis points only (the repetitionScores
    * rounding idiom), so the output hashes identically cross-engine.
    *
    * Output: (doc_id, text, text_chars, n_links, link_chars,
    * link_density_bp, kept). */
  def extractHtmlText(docs: DataFrame, idCol: String, htmlCol: String,
      maxLinkDensityBp: Int, minChars: Int): DataFrame = {
    docs.selectExpr(
      s"$idCol AS doc_id",
      s"${htmlVisibleExpr(d, htmlCol)} AS text",
      s"CAST(${htmlLinkCharsExpr(d, htmlCol)} AS BIGINT) AS link_chars",
      s"${d.regexCount(htmlCol, "<a[^>]*>")} AS n_links")
      .selectExpr("doc_id", "text",
        "length(text) AS text_chars", "n_links", "link_chars")
      .selectExpr("doc_id", "text", "text_chars", "n_links", "link_chars",
        s"CASE WHEN text_chars = 0 THEN 10000 ELSE ${d.idiv("(20000 * link_chars + text_chars)", "(2 * text_chars)")} END AS link_density_bp")
      .selectExpr("doc_id", "text", "text_chars", "n_links", "link_chars",
        "link_density_bp",
        s"CAST(CASE WHEN text_chars >= $minChars AND link_density_bp <= $maxLinkDensityBp THEN 1 ELSE 0 END AS INTEGER) AS kept")
  }

  /** Language identification by rank-order character-trigram profiles —
    * Cavnar & Trenkle 1994 ("N-Gram-Based Text Categorization"), the
    * n-gram-heuristic langid a pretraining pipeline runs before
    * per-language filtering. Entirely INTEGER arithmetic (counts, ranks,
    * out-of-place distances) — no logs, no doubles — so results are
    * bit-identical across engines and partitionings.
    *
    *  - TRAIN: docs matching `trainPred` pool their lowercased char
    *    trigrams per language; each language keeps its `profileSize`
    *    most frequent grams ranked 1..k (ties: count DESC, gram ASC).
    *  - CLASSIFY: every held-out doc builds its own top-k profile the
    *    same way; its distance to a language is the out-of-place sum
    *    Σ |rank_doc(g) − rank_lang(g)| with the max penalty k for grams
    *    absent from the language profile. Prediction = argmin distance
    *    (ties: language ASC).
    *
    * Scale shape: language profiles are (#languages × k) rows —
    * broadcast to both the candidate cross join and the profile lookup,
    * so the only exchanges are the two keyed aggregations on
    * (doc_id, gram) / doc_id that every per-doc pipeline pays. Nothing
    * corpus-global is joined at any scale; docs shorter than one
    * trigram are excluded from both sides (no profile to classify).
    *
    * Output: (doc_id, true_lang, pred_lang, oop_dist) for held-out docs. */
  def langId(docs: DataFrame, idCol: String, textCol: String, langCol: String,
      trainPred: Column, profileSize: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(profileSize >= 1, s"langId: profileSize >= 1, got $profileSize")
    val base = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        lower(col(textCol)).as("t"), trainPred.as("is_train"))
      .where(length(col("t")) >= 3)

    def grams(df: DataFrame, key: String): DataFrame = df
      .select(col(key), explode(sequence(lit(1), length(col("t")) - 2)).as("i"),
        col("t"))
      .select(col(key), col("t").substr(col("i"), lit(3)).as("g"))

    def topK(df: DataFrame, key: String, rank: String): DataFrame = df
      .groupBy(col(key), col("g")).agg(count(lit(1)).as("c"))
      .withColumn(rank, row_number().over(
        Window.partitionBy(key).orderBy(col("c").desc, col("g"))))
      .where(col(rank) <= profileSize)
      .select(col(key), col("g"), col(rank))

    val langProfile = topK(grams(base.where(col("is_train")), "lang"), "lang", "rl")
      .select(col("lang").as("pred_lang"), col("g"), col("rl"))
    val test = base.where(!col("is_train"))
    val docProfile = topK(grams(test, "doc_id"), "doc_id", "rd")
    val langs = langProfile.select("pred_lang").distinct()

    docProfile
      .crossJoin(broadcast(langs))
      .join(broadcast(langProfile), Seq("pred_lang", "g"), "left")
      .groupBy("doc_id", "pred_lang")
      .agg(sum(coalesce(abs(col("rd") - col("rl")), lit(profileSize)))
        .cast("long").as("oop_dist"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("oop_dist"), col("pred_lang"))))
      .where(col("rn") === 1)
      .join(test.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
      .select("doc_id", "true_lang", "pred_lang", "oop_dist")
  }
}
