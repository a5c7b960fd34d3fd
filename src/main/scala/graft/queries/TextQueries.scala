package graft.queries

import org.apache.spark.sql.functions._
import graft.Td

/** Beyond-reference text-analysis operators over `documents`
  * (SURVEY.md §7.2 M5; builder brief "text analysis"): token counting,
  * quality scoring, language-ID, document fingerprinting, corpus term
  * frequency, and TF-IDF — thin parity wrappers over
  * [[graft.operators.TextAnalysis]].
  *
  * The per-row operators (q50-q53) are pure projections with zero
  * shuffles at any scale (the final orderBy exists only for the oracle
  * hash); the corpus-level ones (q66-q67) shuffle only vocabulary-sized
  * aggregates.
  */
object TextQueries {

  /** Shared per-dialect scalar fragments (t = text column name). */
  private def toks(d: SqlDialect) = d.splitSpace("text")

  /** q152's gate columns, one dialect template for both engines:
    * reasons bit 1 = too short, 2 = stopword-starved, 4 = low entropy,
    * 8 = language not allowlisted; keep ⇔ mask 0. Integer arithmetic
    * everywhere except the (identically-templated, 6-dp) entropy. */
  private def curationCols(d: SqlDialect): Seq[String] = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "for")
    val nt = d.len(toks(d))
    val st = d.len(d.filterIn(toks(d), stop))
    val ent = graft.operators.TextAnalysis.entropyExpr(d, toks(d))
    val reasons =
      s"""(CASE WHEN $nt < 15 THEN 1 ELSE 0 END
          + CASE WHEN 10000 * $st <= 200 * $nt THEN 2 ELSE 0 END
          + CASE WHEN $ent < 2.0 THEN 4 ELSE 0 END
          + CASE WHEN lang NOT IN ('en', 'es', 'fr', 'de') THEN 8 ELSE 0 END)"""
    Seq(
      s"CAST($nt AS BIGINT) AS n_tokens",
      s"CAST($reasons AS BIGINT) AS reasons",
      s"CAST($reasons = 0 AS BOOLEAN) AS keep")
  }
  private val toksSpark = SparkSql.splitSpace("text")

  /** q101's wordpiece vocabulary: full words, sub-pieces whose greedy
    * composition covers most corpus words in 2 pieces, overlaps that
    * force the longest-match decision, and deliberate gaps ("big", the
    * leading 'd' of "dup") that exercise the UNK path. */
  private val wordpieceVocab: Seq[String] = Seq(
    "the", "data", "join", "key", "row", "a", "win", "dow", "ta", "ble",
    "col", "umn", "vec", "tor", "str", "eam", "val", "ue", "small", "fil",
    "ter", "gro", "up", "hash", "cust", "omer", "so", "rt", "or", "der",
    "li", "ne", "par", "fast", "agg", "que", "ry", "scan", "bat", "ch",
    "mer", "ge", "spark", "slow", "t")

  /** q104's planted-PII corpus: the same CASE text in both engines (the
    * planted literals avoid quotes/backslashes, so the two dialects'
    * string literals are identical byte-for-byte). */
  private val piiCaseSql =
    """CASE WHEN doc_id % 7 = 0
            THEN concat(text, ' contact jane.doe+spam@mail-svc.io from 10.0.42.7 ref 123-45-6789')
            WHEN doc_id % 7 = 3
            THEN concat(text, ' or bob@10.0.0.5.mail.io backup host 192.168.1.200 uptime 99')
            ELSE text END"""

  private def piiCorpus(s: org.apache.spark.sql.SparkSession, dir: String) =
    Td.load(s, dir, "documents").selectExpr("doc_id", s"$piiCaseSql AS text")

  /** q111's planted-repetition corpus (lowercase+space literal only —
    * byte-identical in both dialects). */
  private val repetitionCaseSql =
    """CASE WHEN doc_id % 9 = 0
            THEN concat(text, ' click here click here click here buy now buy now')
            ELSE text END"""

  /** q113's integer feature vector: bias, spam-bigram count ×1000,
    * repetition basis points. Same template both dialects. */
  private def classifierFeatures(d: SqlDialect): Seq[String] = {
    val grams2 = graft.operators.TextAnalysis.allGramsExpr(d, "text", 2)
    val t = toks(d)
    Seq(
      "CAST(1 AS BIGINT)",
      s"1000 * CAST(${d.len(d.filterBy(grams2, "g", "g IN ('click here', 'buy now')"))} AS BIGINT)",
      s"CAST(${d.idiv(s"(${d.len(t)} - ${d.len(d.adistinct(t))}) * 10000", d.len(t))} AS BIGINT)")
  }

  private val classifierLabel =
    "CASE WHEN doc_id % 9 = 0 THEN 1 ELSE -1 END"

  /** The q113 oracle: the SAME batch-perceptron training re-derived as
    * one chained CTE per epoch (epoch k's weights = epoch k-1's weights
    * + the misclassified y·x sum — all BIGINT), then the margin/pred
    * projection with the final weights. An independent derivation of
    * the training loop, not a mirror of the driver-side iteration. */
  private def perceptronOracleSql(d: SqlDialect, epochs: Int): String = {
    val feats = classifierFeatures(d)
    val j = feats.indices
    def marginOf(w: Int => String) =
      j.map(i => s"(${w(i)} * x$i)").mkString("(", " + ", ")")
    val featCte = "feat AS (SELECT doc_id, " +
      j.map(i => s"${feats(i)} AS x$i").mkString(", ") +
      s", CAST($classifierLabel AS BIGINT) AS y FROM docs2)"
    val epochCtes = (1 to epochs).map { e =>
      // DuckDB SUM(BIGINT) is HUGEINT (round-trips as double through
      // arrow) — every epoch sum is pinned back to BIGINT
      if (e == 1) {
        val m = marginOf(_ => "CAST(0 AS BIGINT)")
        s"e1 AS (SELECT " + j.map(i =>
          s"CAST(sum(CASE WHEN y * $m <= 0 THEN y * x$i ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS w$i")
          .mkString(", ") + " FROM feat)"
      } else {
        val m = marginOf(i => s"w$i")
        s"e$e AS (SELECT " + j.map(i =>
          s"CAST(w$i + CAST(sum(CASE WHEN y * $m <= 0 THEN y * x$i ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS BIGINT) AS w$i")
          .mkString(", ") +
          s" FROM feat CROSS JOIN e${e - 1} GROUP BY " +
          j.map(i => s"w$i").mkString(", ") + ")"
      }
    }
    val fm = marginOf(i => s"w$i")
    s"""WITH docs2 AS (SELECT doc_id, $repetitionCaseSql AS text FROM documents),
       $featCte,
       ${epochCtes.mkString(",\n")}
       SELECT f.doc_id, CAST($fm AS BIGINT) AS margin,
              CAST(CASE WHEN $fm > 0 THEN 1 ELSE -1 END AS INTEGER) AS pred,
              CAST(f.y AS INTEGER) AS label
       FROM feat f CROSS JOIN e$epochs ORDER BY f.doc_id"""
  }

  // ---- q135: TRAINED multi-class language ID --------------------------
  // The trained upgrade of q52's marker heuristic and q125's rank
  // profiles: a fastText-shaped hashed-character-trigram bag (32 hash
  // buckets, length-normalized basis-point shares) with a nearest-
  // centroid head (Rocchio), trained on a labeled 4/5 split and scored
  // on the held-out fifth as one linear argmax per class. Languages are
  // planted as deterministic ASCII function-word decorations
  // (doc_id % 3), so both engines build byte-identical corpora; the
  // model must LEARN which hash buckets separate them — nothing names
  // the markers anywhere in the features.
  //
  // Head adjudication (round 9, numbers in SURVEY.md §8): the batch
  // perceptron loop (q113's trainer, one weight row per class) never
  // converges on this corpus — real docs are NOISY and non-separable
  // in 32-bucket share space, so the lr=1 batch update oscillates at
  // chance (0.33) for every epoch count probed (1..20, raw/normalized/
  // averaged). The one-pass centroid head hits 0.82 holdout — exactly
  // the least-squares probe's ceiling for a linear model on these
  // features. fitMulticlassPerceptron stays the trainer for separable
  // gates and is spec-proven to beat the q52 marker heuristic there
  // (LinearClassifierSpec).

  private val LangBuckets = 32
  private val LangClasses = 3

  private val langCaseSql =
    """CASE WHEN doc_id % 3 = 0 THEN concat(text, ' the of and to in the of and')
            WHEN doc_id % 3 = 1 THEN concat(text, ' der und das ein zu der und das')
            ELSE concat(text, ' le et la les des le et la') END"""

  /** Hashed trigram bucket ids of the decorated, lowercased text — ONE
    * array per row (bound so the decorated text evaluates once), shared
    * by all bucket-share features. */
  private def langBucketArr(d: SqlDialect): String =
    d.bind(s"lower($langCaseSql)", "t",
      d.map(d.map(d.range1("length(t) - 2"), "i", "substring(t, i, 3)"),
        "g", s"${d.hex32("g")} % $LangBuckets"))

  /** Per-bucket trigram SHARES in basis points (floor division — both
    * dialects truncate identically on the non-negative operands) over a
    * precomputed bucket-array column: the fastText hashed bag,
    * length-normalized so a 50-char and a 550-char doc land in the same
    * feature space, integer throughout. */
  private def langFeatures(d: SqlDialect, bCol: String): Seq[String] =
    (0 until LangBuckets).map(j =>
      s"CAST(${d.idiv(s"(${d.len(d.filterBy(bCol, "b", s"b = $j"))} * 10000)", d.len(bCol))} AS BIGINT)")

  /** The q135 oracle: centroid fitting re-derived as ONE conditional-
    * aggregation CTE (μ̃_cj = floor(10⁴·Σ_{y=c}x_j / N_c), the exact
    * integer arithmetic the operator does), then the argmin-distance
    * scoring of the held-out split as −(10⁴·x−μ̃)² margins. Pred uses
    * the operator's own argmaxExpr, so tie semantics are shared by
    * construction. */
  private def centroidOracleSql(d: SqlDialect): String = {
    val js = 0 until LangBuckets
    val cs = 0 until LangClasses
    val xCols = ("doc_id" +: "y" +: js.map(j =>
      s"${langFeatures(d, "bs")(j)} AS x$j").toSeq).mkString(", ")
    val muCols = (for (c <- cs; j <- js) yield
      s"CAST(${d.idiv(s"(10000 * sum(CASE WHEN y = $c THEN x$j ELSE CAST(0 AS BIGINT) END))",
        s"sum(CASE WHEN y = $c THEN 1 ELSE 0 END)")} AS BIGINT) AS mu${c}_$j").mkString(", ")
    def marginOf(c: Int): String =
      js.map(j => s"(-1 * ((10000 * h.x$j) - mu${c}_$j) * ((10000 * h.x$j) - mu${c}_$j))")
        .mkString("(", " + ", ")")
    val margins = cs.map(marginOf)
    val pred = graft.operators.LinearClassifier.argmaxExpr(margins)
    s"""WITH b0 AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS y,
                           ${langBucketArr(d)} AS bs FROM documents),
        bx AS (SELECT $xCols FROM b0),
        mu AS (SELECT $muCols FROM bx WHERE doc_id % 5 <> 0),
        hold AS (SELECT * FROM bx WHERE doc_id % 5 = 0)
        SELECT h.doc_id, CAST(h.y AS INTEGER) AS label,
               CAST($pred AS INTEGER) AS pred,
               CAST(greatest(${margins.mkString(", ")}) AS BIGINT) AS margin
        FROM hold h CROSS JOIN mu ORDER BY h.doc_id"""
  }

  private lazy val langTrainedSpec: QuerySpec =
    QuerySpec("q135_langid_trained", { (s, dir) =>
      val d = SparkSql
      // The corpus arrives as ONE small parquet split at bench scale, so
      // without an explicit fan-out the whole trigram+md5 extraction (the
      // dominant cost) runs on a single core. At 100 TB the scan has
      // thousands of splits and this exchange is a no-op by comparison;
      // here it buys full parallelism for ~ms of shuffle.
      val docs2 = Td.load(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .selectExpr(
          "doc_id", "CAST(doc_id % 3 AS INT) AS y", s"${langBucketArr(d)} AS __b")
      // Features computed ONCE as named columns (the oracle's own bx-CTE
      // shape), then fit/score reference plain columns. Passing the
      // feature EXPRESSION TEXT into scoreNearestCentroid instead would
      // splice each feature into its margin polynomial 2·classes = 6
      // times — 192 interpreted array passes per row, measured 6× the
      // whole extraction cost at sf0.1. (A relational explode+histogram
      // variant was measured too: the 33-wide aggregate over the
      // trigram-exploded corpus is 6× slower than these per-row share
      // projections — the wide agg falls out of JIT.) The checkpoint
      // shares the one extraction job between fit and score.
      val feat = docs2
        .selectExpr("doc_id" +: "y" +:
          langFeatures(d, "__b").zipWithIndex.map { case (x, j) => s"$x AS __x$j" }: _*)
        .localCheckpoint(true)
      val feats = (0 until LangBuckets).map(j => s"__x$j")
      val mu = graft.operators.LinearClassifier.fitNearestCentroid(
        feat.where("doc_id % 5 <> 0"), feats, "y", LangClasses)
      graft.operators.LinearClassifier
        .scoreNearestCentroid(feat.where("doc_id % 5 = 0"), feats, mu)
        .selectExpr("doc_id", "CAST(y AS INT) AS label", "pred", "margin")
        .orderBy("doc_id")
    }, Some(centroidOracleSql(DuckSql)))

  val specs: Seq[QuerySpec] = langTrainedSpec +: Seq(

    // ---- corpus term frequency (unigram + bigram) -----------------------
    // The canonical LLM-corpus word-count: explode multiplies rows ~60×,
    // then partial aggregation collapses them map-side BEFORE the shuffle,
    // so the exchange carries only (kind, term) partials — vocabulary-
    // sized, not corpus-sized. Stop-words make (kind, term) skewed at
    // 100 TB: map-side combine absorbs it for count/countDistinct-free
    // aggs; for heavier per-term state apply q65's salting pattern.
    QuerySpec("q66_term_frequency", { (s, dir) =>
      graft.operators.TextAnalysis
        .termFrequencies(Td.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("kind", "term")
    }, {
      val d = DuckSql
      val bigrams = d.bind(toks(d), "tk",
        d.map(d.range1(s"${d.len("tk")} - 1"), "i", d.wordSlice("tk", "i", 2)))
      Some(s"""WITH uni AS (
                 SELECT 'unigram' AS kind, doc_id,
                        unnest(${toks(d)}) AS term FROM documents),
               big AS (
                 SELECT 'bigram' AS kind, doc_id,
                        unnest($bigrams) AS term FROM documents),
               all_terms AS (SELECT * FROM uni UNION ALL SELECT * FROM big)
               SELECT kind, term, count(*) AS n_total,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
               FROM all_terms GROUP BY kind, term ORDER BY kind, term""")
    }),

    // ---- corpus mixture weights: per (source, lang) share of tokens -----
    // The data-mixing table a pretraining run is configured from: doc and
    // token counts per (source, lang) cell plus each cell's share of the
    // corpus token budget (share via an unpartitioned window over the
    // ALREADY-AGGREGATED cells — cell-count-sized, not corpus-sized, so
    // the single-partition window is harmless at any scale). Share is
    // exact-integer basis points (floor of ratio·10⁴, single-rounding
    // IEEE from BIGINT token counts) so the hashed column is an integer —
    // no float formatting reaches the driver's oracle (round-3 verdict).
    QuerySpec("q100_source_mix", { (s, dir) =>
      val d = SparkSql
      Td.load(s, dir, "documents")
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr(s"${d.len(toksSpark)}")).as("n_tokens"))
        .withColumn("share_bp",
          expr("CAST(floor(CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"))
        .orderBy("source", "lang")
    }, {
      val d = DuckSql
      Some(s"""WITH cells AS (
                 SELECT source, lang, count(*) AS n_docs,
                        CAST(sum(${d.len(toks(d))}) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY 1, 2)
               SELECT source, lang, n_docs, n_tokens,
                      CAST(floor(CAST(n_tokens AS DOUBLE) /
                            CAST(sum(n_tokens) OVER () AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS share_bp
               FROM cells ORDER BY source, lang""")
    }),

    // ---- token-budget mixture sampling ---------------------------------
    // q100 prices the corpus; this query SPENDS it: a 4-domain mixture
    // (equal quarters) under a 5000-token budget becomes per-domain keep
    // rates (basis points, floor division) applied by the deterministic
    // md5 row rule — domains outside the mix drop entirely, a domain
    // whose quarter exceeds its corpus caps at keep-everything (src19 at
    // sf0.01). Oracle mirrors the integer rate arithmetic in a CTE, so
    // both engines agree on every rate and every surviving row.
    QuerySpec("q137_token_budget_mix", { (s, dir) =>
      val d = SparkSql
      val docs = Td.load(s, dir, "documents").selectExpr(
        "doc_id", "source", s"CAST(${d.len(toksSpark)} AS BIGINT) AS n_tokens")
      graft.operators.Sampling
        .sampleTokenBudget(docs, "source", "doc_id", "n_tokens",
          Map("src0" -> 2500L, "src1" -> 2500L, "src2" -> 2500L, "src19" -> 2500L),
          budgetTokens = 5000L)
        .selectExpr("doc_id", "source", "n_tokens", "CAST(rate_bp AS BIGINT) AS rate_bp")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""WITH w(dom, wbp) AS (VALUES
                 ('src0', 2500), ('src1', 2500), ('src2', 2500), ('src19', 2500)),
               d0 AS (SELECT doc_id, source,
                             CAST(${d.len(toks(d))} AS BIGINT) AS n_tokens
                      FROM documents),
               dom AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS dom_tokens
                       FROM d0 GROUP BY source),
               rates AS (
                 SELECT source,
                        CAST(CASE WHEN dom_tokens <= 0 THEN 10000
                                  ELSE least(10000, ${d.idiv("(5000 * wbp)", "dom_tokens")})
                             END AS BIGINT) AS rate_bp
                 FROM dom JOIN w ON dom.source = w.dom WHERE wbp > 0)
               SELECT d0.doc_id, d0.source, d0.n_tokens, r.rate_bp
               FROM d0 JOIN rates r ON d0.source = r.source
               WHERE ${d.hex32("coalesce(CAST(doc_id AS VARCHAR), '')")} % 10000 < r.rate_bp
               ORDER BY d0.doc_id""")
    }),

    // ---- temperature-flattened mixture ----------------------------------
    // q137 takes the mixture as config; this DERIVES it from the corpus
    // with temperature α=0.25 (two sqrt halvings — sqrt is correctly
    // rounded in both engines where pow is not), upweighting small
    // source domains under an 8000-token budget. The oracle replays
    // Σ t^α in domain order, the rounded per-domain targets, and the
    // md5 row rule — the full keep set is hash-pinned.
    QuerySpec("q153_temperature_mix", { (s, dir) =>
      val d = SparkSql
      val docs = Td.load(s, dir, "documents").selectExpr(
        "doc_id", "source", s"CAST(${d.len(toksSpark)} AS BIGINT) AS n_tokens")
      graft.operators.Sampling
        .sampleTemperature(docs, "source", "doc_id", "n_tokens",
          halvings = 2, budgetTokens = 8000L)
        .selectExpr("doc_id", "source", "n_tokens", "CAST(rate_bp AS BIGINT) AS rate_bp")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""WITH d0 AS (SELECT doc_id, source,
                                  CAST(${d.len(toks(d))} AS BIGINT) AS n_tokens
                           FROM documents),
               dom AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS t,
                              sqrt(sqrt(CAST(sum(n_tokens) AS BIGINT))) AS pw
                       FROM d0 GROUP BY source),
               tot AS (SELECT ${d.dsum("list(pw ORDER BY source)")} AS s FROM dom),
               rates AS (
                 SELECT source,
                        CAST(CASE WHEN t <= 0 THEN 10000
                                  ELSE least(10000,
                                    ${d.idiv("10000 * CAST(round(8000 * pw / s) AS BIGINT)", "t")})
                             END AS BIGINT) AS rate_bp
                 FROM dom CROSS JOIN tot)
               SELECT d0.doc_id, d0.source, d0.n_tokens, r.rate_bp
               FROM d0 JOIN rates r ON d0.source = r.source
               WHERE ${d.hex32("coalesce(CAST(doc_id AS VARCHAR), '')")} % 10000 < r.rate_bp
               ORDER BY d0.doc_id""")
    }),

    // ---- Shannon entropy quality signals --------------------------------
    // Char- and word-distribution entropy per doc — the info-theoretic
    // complement to q111's repetition mass: spam sits at the extremes.
    // Both engines run the SAME dialect template (fixed-order fold over
    // the sorted distinct list), so this is a pure projection with a
    // replayable float story — no explode, no shuffle, no histogram
    // exchange at any corpus size.
    QuerySpec("q151_entropy", { (s, dir) =>
      val sp = SparkSql
      Td.load(s, dir, "documents").selectExpr("doc_id",
        s"${graft.operators.TextAnalysis.entropyExpr(sp, sp.splitOn("text", ""))} AS char_entropy",
        s"${graft.operators.TextAnalysis.entropyExpr(sp, sp.splitSpace("text"))} AS word_entropy")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""SELECT doc_id,
                      ${graft.operators.TextAnalysis.entropyExpr(d, d.splitOn("text", ""))} AS char_entropy,
                      ${graft.operators.TextAnalysis.entropyExpr(d, d.splitSpace("text"))} AS word_entropy
               FROM documents ORDER BY doc_id""")
    }),

    // ---- composite curation gate ----------------------------------------
    // The decision a curation pipeline actually ships: four independent
    // keep/drop signals (Gopher-style length + stopword bars, the q151
    // entropy bar, a language allowlist) folded into one REASONS BITMASK
    // per doc — dropped docs stay queryable with their reasons (the
    // quarantine-accounting discipline; a pipeline that only emits
    // survivors cannot explain its own yield). Every signal is a shared
    // dialect template or integer arithmetic, so both engines compute
    // the identical mask; keep ⇔ reasons = 0. Pure projection.
    QuerySpec("q152_curation_gate", { (s, dir) =>
      Td.load(s, dir, "documents")
        .selectExpr(Seq("doc_id", "lang") ++ curationCols(SparkSql): _*)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""SELECT doc_id, lang, ${curationCols(d).mkString(",\n                      ")}
               FROM documents ORDER BY doc_id""")
    }),

    // ---- DSIR importance resampling (Xie et al. 2023) -------------------
    // Score every raw doc by how much likelier its hashed bag-of-words
    // is under the TARGET histogram (the en slice) than under the raw
    // corpus's own; keep the top 50. Histograms are B-row broadcasts off
    // ONE (doc, bucket) count relation (the raw histogram is a re-agg,
    // never a second corpus scan); per-doc weights fold in bucket order
    // (the BM25/RRF float-determinism discipline) and round to 6 dp with
    // id tie-break. The oracle replays bucketing (two-dialect md5),
    // smoothing, log-ratio, fold, and selection end to end.
    QuerySpec("q146_dsir_select", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      graft.operators.Dsir
        .selectTopK(docs, docs.where("lang = 'en'"), "doc_id", "text",
          k = 50, buckets = 64)
        .select("doc_id", "lang", "weight", "n_toks")
    }, {
      val d = DuckSql
      Some(s"""WITH dc AS (
                 SELECT doc_id, ${d.hex32("tok")} % 64 AS b,
                        CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT doc_id, unnest(${d.splitSpace("coalesce(text, '')")}) AS tok
                       FROM documents)
                 GROUP BY 1, 2),
               rh AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM dc GROUP BY b),
               th AS (
                 SELECT ${d.hex32("tok")} % 64 AS b, CAST(count(*) AS BIGINT) AS ct
                 FROM (SELECT unnest(${d.splitSpace("coalesce(text, '')")}) AS tok
                       FROM documents WHERE lang = 'en')
                 GROUP BY 1),
               tot AS (SELECT (SELECT CAST(sum(cr) AS BIGINT) FROM rh) AS tr,
                              (SELECT CAST(sum(ct) AS BIGINT) FROM th) AS tt),
               lr AS (
                 SELECT rh.b,
                        ln((CAST(coalesce(th.ct, 0) AS DOUBLE) + 1.0) / (tot.tt + 64))
                        - ln((CAST(rh.cr AS DOUBLE) + 1.0) / (tot.tr + 64)) AS lrv
                 FROM rh LEFT JOIN th ON rh.b = th.b CROSS JOIN tot),
               wts AS (
                 SELECT dc.doc_id,
                        round(${d.dsum("list(CAST(dc.c AS DOUBLE) * lr.lrv ORDER BY dc.b)")}, 6) AS weight,
                        CAST(sum(dc.c) AS BIGINT) AS n_toks
                 FROM dc JOIN lr ON dc.b = lr.b GROUP BY dc.doc_id)
               SELECT doc.doc_id, doc.lang, wts.weight, wts.n_toks
               FROM documents doc JOIN wts ON doc.doc_id = wts.doc_id
               ORDER BY wts.weight DESC, doc.doc_id LIMIT 50""")
    }),

    // ---- BM25 ranked retrieval (inverted-index probe) -------------------
    // The lexical complement to the ANN stack (q59/q71/q134): top-15
    // docs for a 3-term query under Lucene-form BM25. The probe never
    // scans non-matching tokens past the mapper (term IN (...) on the
    // exploded relation); df comes from the filtered postings (exact
    // full-corpus df for probed terms); the only whole-corpus aggregate
    // is the 1-row (N, avgdl) stats frame. Scores round to 6 decimals
    // with id tie-break, so both engines rank identically.
    QuerySpec("q138_bm25_topk", { (s, dir) =>
      graft.operators.Retrieval
        .bm25TopK(Td.load(s, dir, "documents"), "doc_id", "text",
          Seq("vector", "stream", "merge"), topK = 15)
    }, {
      val d = DuckSql
      Some(s"""WITH st AS (
                 SELECT CAST(count(*) AS BIGINT) AS n_docs,
                        CAST(avg(${d.len(toks(d))}) AS DOUBLE) AS avgdl
                 FROM documents),
               tok AS (
                 SELECT doc_id, CAST(${d.len(toks(d))} AS BIGINT) AS dl,
                        unnest(${d.splitSpace("text")}) AS term
                 FROM documents),
               tf AS (
                 SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
                 FROM tok WHERE term IN ('vector', 'stream', 'merge')
                 GROUP BY doc_id, dl, term),
               dfreq AS (
                 SELECT term, CAST(count(*) AS BIGINT) AS df
                 FROM tf GROUP BY term),
               contrib AS (
                 SELECT tf.doc_id, tf.term,
                        ln((CAST(st.n_docs AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                        * (CAST(tf.tf AS DOUBLE) * 2.2)
                        / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * tf.dl / st.avgdl)) AS s
                 FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN st)
               SELECT doc_id,
                      round(${DuckSql.dsum("list(s ORDER BY term)")}, 6) AS score,
                      CAST(count(*) AS BIGINT) AS n_hits
               FROM contrib
               GROUP BY doc_id
               ORDER BY score DESC, doc_id LIMIT 15""")
    }),

    // ---- subword token accounting: greedy longest-match wordpiece ------
    // The corpus token budget a mixture config is actually priced in:
    // whitespace counts under-count subword tokens, so per-doc counts run
    // through TextAnalysis.subwordCounts' constant-folded greedy
    // tokenizer (pure projection — no join, no shuffle, no UDF; see the
    // operator Scaladoc for the packed-BIGINT fold). The oracle SQL is
    // generated from the SAME dialect template, so both engines run the
    // identical algorithm. The vocabulary exercises every regime: full
    // words, multi-piece splits (win+dow, cust+omer), longest-match
    // preference ("the" over "t", "slow" over "so"), and UNK fallbacks
    // ("big" has no covering pieces; "dup" opens with an UNK char).
    QuerySpec("q101_subword_tokens", { (s, dir) =>
      graft.operators.TextAnalysis
        .subwordCounts(Td.load(s, dir, "documents"), "doc_id", "text", wordpieceVocab)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val tok = graft.operators.TextAnalysis.subwordTokExpr(d, "text", wordpieceVocab, 64)
      val outs = graft.operators.TextAnalysis.subwordCountExprs(d, "tok").mkString(", ")
      Some(s"""SELECT doc_id, $outs
               FROM (SELECT doc_id, $tok AS tok FROM documents) t
               ORDER BY doc_id""")
    }),

    // ---- PII redaction (pre-training scrub + audit counts) --------------
    // Planted PII: every 7th doc gains an email+IP+SSN tail; every
    // (7k+3)rd gains an email whose HOST is IP-shaped plus a bare IP —
    // the order-sensitive case (email rule must consume its host before
    // the IP rule sees it) next to a genuine IP hit. Both
    // engines run the identical backslash-free patterns (the dialect
    // regex contract lives in operators/PiiRedaction); the redacted TEXT
    // itself is oracle-hashed, not just the counts.
    QuerySpec("q104_pii_redaction", { (s, dir) =>
      graft.operators.PiiRedaction
        .redact(piiCorpus(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val outs = (s"${graft.operators.PiiRedaction.redactExpr(d, "text")} AS redacted" +:
        graft.operators.PiiRedaction.countExprs(d, "text")).mkString(", ")
      Some(s"""WITH corpus AS (SELECT doc_id, $piiCaseSql AS text FROM documents)
               SELECT doc_id, $outs
               FROM corpus ORDER BY doc_id""")
    }),

    // ---- rare-token density: corpus-frequency quality filter ------------
    // Integer-count scoring only (no logs — transcendental functions
    // differ in the last ulp across engines); rare = corpus df <= 2.
    QuerySpec("q99_rare_tokens", { (s, dir) =>
      graft.operators.TextAnalysis
        .rareTokenScore(Td.load(s, dir, "documents"), "doc_id", "text", rareDf = 2)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""WITH terms AS (
                 SELECT doc_id, unnest(${toks(d)}) AS term FROM documents),
               dfreq AS (
                 SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                 FROM terms GROUP BY term)
               SELECT t.doc_id, count(*) AS n_tokens,
                      CAST(sum(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
                      CAST(floor(CAST(sum(CASE WHEN d.df <= 2 THEN 1 ELSE 0 END) AS DOUBLE) /
                            CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS rare_bp
               FROM terms t JOIN dfreq d ON t.term = d.term
               GROUP BY t.doc_id ORDER BY doc_id""")
    }),

    // ---- bigram-LM document scoring (CCNet-style quality signal) --------
    // Score every document by an add-one-smoothed bigram LM trained on
    // the corpus itself (Wenzek et al. 2020's perplexity filter, in the
    // exact-integer form the hash-compare policy demands — see
    // TextAnalysis.bigramLmScores for why basis points instead of logs).
    // Scale shape: count tables aggregate to vocabulary size before any
    // exchange; c1 derives from c2 without re-touching the corpus; the
    // scoring join is AQE-broadcastable. No floats anywhere.
    QuerySpec("q110_bigram_lm", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      graft.operators.TextAnalysis
        .bigramLmScores(docs, docs, "doc_id", "text")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val bigrams = d.bind(toks(d), "tk",
        d.map(d.range1(s"${d.len("tk")} - 1"), "i", d.wordSlice("tk", "i", 2)))
      Some(s"""WITH big AS (
                 SELECT doc_id, unnest($bigrams) AS bigram FROM documents),
               c2 AS (SELECT bigram, count(*) AS n2 FROM big GROUP BY 1),
               c1 AS (SELECT ${d.elem(d.splitSpace("bigram"), "1")} AS prev,
                             CAST(sum(n2) AS BIGINT) AS n1
                      FROM c2 GROUP BY 1),
               v AS (SELECT count(DISTINCT tok) AS vsize
                     FROM (SELECT unnest(${toks(d)}) AS tok FROM documents)),
               scored AS (
                 SELECT b.doc_id,
                        ${d.idiv("(20000 * (c2.n2 + 1) + (c1.n1 + v.vsize))",
                                 "(2 * (c1.n1 + v.vsize))")} AS bp
                 FROM big b
                 JOIN c2 ON b.bigram = c2.bigram
                 JOIN c1 ON ${d.elem(d.splitSpace("b.bigram"), "1")} = c1.prev
                 CROSS JOIN v)
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                      CAST(sum(bp) AS BIGINT) AS sum_bp,
                      CAST(${d.idiv("(2 * sum(bp) + count(*))", "(2 * count(*))")} AS BIGINT) AS avg_bp
               FROM scored GROUP BY doc_id ORDER BY doc_id""")
    }),

    // ---- trigram-LM scoring with stupid backoff (q110's successor) ------
    // Brants et al. 2007's web-scale smoothing: trigram ratio when the
    // trigram is known, α=0.4 backoff to the tail bigram, α² to an
    // add-one unigram floor — in the same exact-integer basis-point
    // discipline as q110 (α=2/5 is exact in integers). The scored
    // corpus is the train corpus BRACKETED by two tokens the LM never
    // saw ('zzq ' prefix, ' zzw' suffix), so every document exercises
    // all three backoff levels: its first trigram (zzq w1 w2) is
    // unseen with a KNOWN tail bigram (level 2), its last (wn-1 wn
    // zzw) ends in an unseen WORD (the level-3 add-one floor), and
    // everything between scores at level 1. Scale shape: all count
    // levels from ONE train scan (3-level stack explode, map-side
    // collapse to vocab size); scoring joins are AQE-broadcastable.
    QuerySpec("q220_trigram_lm", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      val bracketed = docs.selectExpr("doc_id",
        "concat('zzq ', text, ' zzw') AS text")
      graft.operators.TextAnalysis
        .trigramLmScores(docs, bracketed, "doc_id", "text")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      def grams(src: String, n: Int) =
        s"SELECT doc_id, unnest(${graft.operators.TextAnalysis.allGramsExpr(d, "text", n)}) AS gram FROM $src"
      Some(s"""WITH sc AS (SELECT doc_id, concat('zzq ', text, ' zzw') AS text
                           FROM documents),
               c3 AS (SELECT gram AS tri, count(*) AS n3
                      FROM (${grams("documents", 3)}) GROUP BY 1),
               c2 AS (SELECT gram AS bi, count(*) AS n2
                      FROM (${grams("documents", 2)}) GROUP BY 1),
               c1 AS (SELECT gram AS tok, count(*) AS n1
                      FROM (${grams("documents", 1)}) GROUP BY 1),
               nv AS (SELECT CAST(sum(n1) + count(*) AS BIGINT) AS x FROM c1),
               tri AS (SELECT doc_id, gram AS tri,
                              ${d.elem(d.splitSpace("gram"), "1")} AS w1,
                              ${d.elem(d.splitSpace("gram"), "2")} AS w2,
                              ${d.elem(d.splitSpace("gram"), "3")} AS w3
                       FROM (${grams("sc", 3)})),
               scored AS (
                 SELECT t.doc_id,
                        CASE WHEN coalesce(c3.n3, 0) > 0
                             THEN ${d.idiv("(20000 * c3.n3 + cc.n2)", "(2 * cc.n2)")}
                             WHEN coalesce(ct.n2, 0) > 0
                             THEN ${d.idiv("(8000 * ct.n2 + c1b.n1)", "(2 * c1b.n1)")}
                             ELSE ${d.idiv("(3200 * (coalesce(c1c.n1, 0) + 1) + nv.x)",
                                           "(2 * nv.x)")} END AS bp
                 FROM tri t
                 LEFT JOIN c3 ON t.tri = c3.tri
                 LEFT JOIN c2 cc ON concat(t.w1, ' ', t.w2) = cc.bi
                 LEFT JOIN c2 ct ON concat(t.w2, ' ', t.w3) = ct.bi
                 LEFT JOIN c1 c1b ON t.w2 = c1b.tok
                 LEFT JOIN c1 c1c ON t.w3 = c1c.tok
                 CROSS JOIN nv)
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
                      CAST(sum(bp) AS BIGINT) AS sum_bp,
                      CAST(${d.idiv("(2 * sum(bp) + count(*))", "(2 * count(*))")} AS BIGINT) AS avg_bp
               FROM scored GROUP BY doc_id ORDER BY doc_id""")
    }),

    // ---- Gopher repetition filters (duplicate/top n-gram mass) ----------
    // Rae et al. 2021's pre-training repetition signals over a corpus
    // with PLANTED spam ("click here click here ... buy now buy now" on
    // every 9th doc — the literal is lowercase+space only, so both
    // dialects' string literals are byte-identical). Everything is
    // per-document: no corpus-global join, integer counts and char
    // lengths only. See TextAnalysis.repetitionScores for the
    // mass-fraction definition and the tie-break contract.
    QuerySpec("q111_repetition", { (s, dir) =>
      val spam = Td.load(s, dir, "documents").selectExpr("doc_id",
        s"$repetitionCaseSql AS text")
      graft.operators.TextAnalysis.repetitionScores(spam, "doc_id", "text")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      def grams(n: Int) =
        graft.operators.TextAnalysis.allGramsExpr(d, "text", n)
      Some(s"""WITH docs2 AS (
                 SELECT doc_id, $repetitionCaseSql AS text FROM documents),
               g3c AS (SELECT doc_id, gram, count(*) AS c
                       FROM (SELECT doc_id, unnest(${grams(3)}) AS gram FROM docs2)
                       GROUP BY 1, 2),
               a3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams3,
                             CAST(${d.idiv(
                               "(20000 * sum(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) + sum(c * length(gram)))",
                               "(2 * sum(c * length(gram)))")} AS BIGINT) AS dup3_bp
                      FROM g3c GROUP BY 1),
               g2c AS (SELECT doc_id, gram, count(*) AS c
                       FROM (SELECT doc_id, unnest(${grams(2)}) AS gram FROM docs2)
                       GROUP BY 1, 2),
               t2 AS (SELECT doc_id, CAST(sum(c * length(gram)) AS BIGINT) AS total2
                      FROM g2c GROUP BY 1),
               top2 AS (SELECT doc_id, c, gram FROM (
                          SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY c DESC, gram DESC) AS rn FROM g2c)
                        WHERE rn = 1),
               a2 AS (SELECT t.doc_id,
                             CAST(${d.idiv("(20000 * p.c * length(p.gram) + t.total2)",
                               "(2 * t.total2)")} AS BIGINT) AS top2_bp
                      FROM t2 t JOIN top2 p ON t.doc_id = p.doc_id)
               SELECT a3.doc_id, a3.n_grams3, a3.dup3_bp, a2.top2_bp
               FROM a3 JOIN a2 ON a3.doc_id = a2.doc_id ORDER BY a3.doc_id""")
    }),

    // ---- trained quality classifier (deterministic batch perceptron) ----
    // The fastText-style document-quality gate, TRAINED inside the engine:
    // a batch perceptron over (bias, spam-bigram count ×1000, repetition
    // basis points) learns to separate the planted click-spam (every 9th
    // doc) from clean docs — perfect separation by epoch 5 on this
    // corpus. Training is integer-exact and order-insensitive (one
    // BIGINT-sum aggregate per epoch, weights as driver literals — see
    // LinearClassifier), so the ORACLE RE-RUNS THE ENTIRE TRAINING LOOP
    // in SQL (one chained CTE per epoch) and hash-matches the margins
    // bit for bit: cross-engine reproducible model fitting, not just
    // scoring. The ×1000 rescale balances the count feature against the
    // bp feature (textbook perceptron conditioning; without it the
    // margin is dominated by rep_bp and training oscillates).
    QuerySpec("q113_quality_classifier", { (s, dir) =>
      val spam = Td.load(s, dir, "documents")
        .selectExpr("doc_id", s"$repetitionCaseSql AS text")
      val d = SparkSql
      val feats = classifierFeatures(d)
      val w = graft.operators.LinearClassifier
        .fitBatchPerceptron(spam, feats, classifierLabel, epochs = 5)
      graft.operators.LinearClassifier.scoreLinear(spam, feats, w)
        .selectExpr("doc_id", "margin", "pred",
          s"CAST($classifierLabel AS INT) AS label")
        .orderBy("doc_id")
    }, Some(perceptronOracleSql(DuckSql, epochs = 5))),

    // ---- document chunking: overlapping fixed-token windows -------------
    // The pretraining/RAG chunker: 32-token windows, stride 16 (50%
    // overlap), last window short. Pure projection + explode — zero
    // shuffle at any scale; the oracle re-derives the windows through
    // an index unnest instead of the engine's posexplode'd list (same
    // wordSlice template, different relational shape).
    QuerySpec("q114_chunking", { (s, dir) =>
      graft.operators.TextAnalysis
        .chunkDocuments(Td.load(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 32, stride = 16)
        .orderBy("doc_id", "chunk_idx")
    }, {
      val d = DuckSql
      val nChunks = s"(${d.idiv(s"(${d.len("tk")} - 1)", "16")} + 1)"
      Some(s"""WITH tkt AS (SELECT doc_id, ${d.splitSpace("text")} AS tk FROM documents),
               idx AS (SELECT doc_id, tk, unnest(${d.range1(nChunks)}) AS i FROM tkt),
               ch AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
                             ${d.wordSlice("tk", "(i-1)*16 + 1", 32)} AS chunk
                      FROM idx)
               SELECT doc_id, chunk_idx,
                      CAST(${d.len(d.splitSpace("chunk"))} AS BIGINT) AS n_chunk_tokens, chunk
               FROM ch ORDER BY doc_id, chunk_idx""")
    }),

    // ---- context-window packing: greedy contiguous 512-token bins -------
    // The sequence packer's bin assignment: per language stream, chunks
    // (from q114's chunker) are packed in (doc_id, chunk_idx) order by
    // exclusive-prefix-sum DIV 512 — deterministic integer cumsum over a
    // keyed window (one exchange on lang), bins straddle by at most one
    // chunk. Output bins sit at ~512 tokens each.
    QuerySpec("q115_context_packing", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      val chunks = graft.operators.TextAnalysis
        .chunkDocuments(docs, "doc_id", "text", chunkTokens = 32, stride = 16)
        .join(docs.select("doc_id", "lang"), "doc_id")
      graft.operators.TextAnalysis.packChunks(chunks, "lang", contextTokens = 512)
        .orderBy("lang", "bin")
    }, {
      val d = DuckSql
      val nChunks = s"(${d.idiv(s"(${d.len("tk")} - 1)", "16")} + 1)"
      Some(s"""WITH tkt AS (SELECT doc_id, lang, ${d.splitSpace("text")} AS tk FROM documents),
               idx AS (SELECT doc_id, lang, tk, unnest(${d.range1(nChunks)}) AS i FROM tkt),
               ch AS (SELECT doc_id, lang, CAST(i - 1 AS BIGINT) AS chunk_idx,
                             CAST(${d.len(d.splitSpace(d.wordSlice("tk", "(i-1)*16 + 1", 32)))} AS BIGINT) AS n
                      FROM idx),
               cum AS (SELECT lang, n,
                              sum(n) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS cumx
                       FROM ch)
               SELECT lang, CAST(${d.idiv("cumx", "512")} AS BIGINT) AS bin,
                      count(*) AS n_chunks, CAST(sum(n) AS BIGINT) AS bin_tokens
               FROM cum GROUP BY 1, 2 ORDER BY lang, bin""")
    }),

    // ---- token counting: whitespace + BPE-ish regex pieces --------------
    QuerySpec("q50_text_tokens",
      (s, dir) => {
        val docs = Td.load(s, dir, "documents")
        graft.operators.TextAnalysis.tokenCounts(docs, "doc_id", "text")
          .join(docs.select("doc_id", "lang"), "doc_id")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang,
                      ${DuckSql.len(toks(DuckSql))} AS n_ws_tokens,
                      len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
                      length(text) AS n_chars,
                      round(CAST(length(text) AS DOUBLE) / CAST(${DuckSql.len(toks(DuckSql))} AS DOUBLE), 4) AS chars_per_token
               FROM documents ORDER BY doc_id""")),

    // ---- quality scoring: length / punctuation / stopword ratios --------
    QuerySpec("q51_text_quality", {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "for")
      (s, dir) => graft.operators.TextAnalysis
        .qualityScore(Td.load(s, dir, "documents"), "doc_id", "text", stop)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "for")
      Some(s"""WITH t0 AS (
                 SELECT doc_id,
                        ${d.len(toks(d))} AS n_tokens,
                        ${d.len(d.filterIn(toks(d), stop))} AS stop_tokens,
                        length(regexp_replace(text, '[a-z ]', '', 'g')) AS punct_chars,
                        length(text) AS n_chars
                 FROM documents)
               SELECT doc_id, n_tokens, stop_tokens, punct_chars, n_chars,
                      round(CAST(stop_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 4) AS stop_ratio,
                      round(CAST(punct_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 4) AS punct_ratio,
                      CASE WHEN n_tokens >= 40 AND CAST(stop_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.02 THEN 'good'
                           WHEN n_tokens >= 15 THEN 'ok'
                           ELSE 'short' END AS quality_bucket
               FROM t0 ORDER BY doc_id""")
    }),

    // ---- language-ID: stopword-marker scoring with fixed tie-break ------
    QuerySpec("q52_text_langid", {
      val markers = Seq(
        "en" -> Seq("the", "a", "of", "and"),
        "de" -> Seq("der", "die", "das", "und"),
        "es" -> Seq("el", "la", "de", "y"),
        "fr" -> Seq("le", "les", "et", "une"))
      def scores(d: SqlDialect): Seq[String] =
        markers.map { case (l, ws) => s"${d.len(d.filterIn(toks(d), ws))} AS sc_$l" }
      val pred =
        """CASE WHEN sc_en >= sc_de AND sc_en >= sc_es AND sc_en >= sc_fr THEN 'en'
                WHEN sc_de >= sc_es AND sc_de >= sc_fr THEN 'de'
                WHEN sc_es >= sc_fr THEN 'es'
                ELSE 'fr' END AS pred_lang"""
      (s, dir) =>
        Td.load(s, dir, "documents")
          .selectExpr(Seq("doc_id", "lang") ++ scores(SparkSql): _*)
          .selectExpr("doc_id", "lang", "sc_en", "sc_de", "sc_es", "sc_fr", pred)
          .withColumn("agrees", col("pred_lang") === col("lang"))
          .orderBy("doc_id")
    }, {
      val d = DuckSql
      val markers = Seq(
        "en" -> Seq("the", "a", "of", "and"),
        "de" -> Seq("der", "die", "das", "und"),
        "es" -> Seq("el", "la", "de", "y"),
        "fr" -> Seq("le", "les", "et", "une"))
      val sc = markers.map { case (l, ws) => s"${d.len(d.filterIn(toks(d), ws))} AS sc_$l" }
      Some(s"""WITH t0 AS (SELECT doc_id, lang, ${sc.mkString(", ")} FROM documents),
               t1 AS (SELECT *,
                      CASE WHEN sc_en >= sc_de AND sc_en >= sc_es AND sc_en >= sc_fr THEN 'en'
                           WHEN sc_de >= sc_es AND sc_de >= sc_fr THEN 'de'
                           WHEN sc_es >= sc_fr THEN 'es'
                           ELSE 'fr' END AS pred_lang FROM t0)
               SELECT *, pred_lang = lang AS agrees FROM t1 ORDER BY doc_id""")
    }),

    // ---- TF-IDF: top-3 terms per document -------------------------------
    // Scale shape: term counts partial-agg before the (doc_id, term)
    // shuffle; the document-frequency table is VOCABULARY-sized, so it
    // broadcasts back onto the corpus-sized tf relation — no second big
    // shuffle. Ranking ties (identical tf·idf) break on the term string,
    // so cross-engine ulp differences in ln() cannot reorder output.
    QuerySpec("q67_tfidf", { (s, dir) =>
      graft.operators.TextAnalysis
        .tfidfTopTerms(Td.load(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rank")
    }, {
      val d = DuckSql
      Some(s"""WITH terms AS (
                 SELECT doc_id, unnest(${toks(d)}) AS term FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
               df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                      FROM terms GROUP BY 1),
               n AS (SELECT count(*) AS n_docs FROM documents),
               scored AS (
                 SELECT tf.doc_id, tf.term, tf.tf, df.df,
                        tf.tf * ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)) AS score
                 FROM tf JOIN df USING (term) CROSS JOIN n),
               ranked AS (
                 SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS INTEGER) AS rank
                 FROM scored)
               SELECT doc_id, term, tf, df, round(score, 6) AS score, rank
               FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""")
    }),

    // ---- fingerprinting: min-hash over rolling 5-token windows ----------
    // (winnowing-style: hash every window, keep the minimum) plus a whole-
    // document md5 prefix for exact-dup detection.
    QuerySpec("q53_text_fingerprint", {
      (s, dir) => graft.operators.TextAnalysis
        .fingerprints(Td.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val fp = d.bind(toks(d), "tk",
        d.amin(d.map(
          d.map(d.range("1", s"greatest(${d.len("tk")} - 4, 1)"), "i", d.wordSlice("tk", "i", 5)),
          "w", d.hex32("w"))))
      Some(s"""SELECT doc_id,
                      $fp AS fp_rolling_min,
                      substring(md5(text), 1, 16) AS fp_md5_prefix
               FROM documents ORDER BY doc_id""")
    }),

    // ---- BPE merge training ---------------------------------------------
    // Learns the tokenizer vocabulary q101 previously took as given: 4
    // rounds of exact weighted pair counting + lexicographic-tie argmax
    // + left-to-right merge application. The oracle replays the ENTIRE
    // training loop in chained CTEs (q113 precedent), so the hash match
    // proves cross-engine reproducible vocabulary learning, not just a
    // matching final answer.
    QuerySpec("q117_bpe_train", { (s, dir) =>
      import s.implicits._
      graft.operators.Bpe
        .fitMerges(Td.load(s, dir, "documents"), "text", rounds = 4)
        .toDF("round", "pair", "cnt")
        .orderBy("round")
    }, Some(graft.operators.Bpe.fitMergesSql(DuckSql, "documents", "text", 4))),

    // ---- BPE encoding with the LEARNED vocabulary -------------------------
    // The apply side of q117: train 4 merges, replay them over the word
    // table, and tokenize the corpus with the result — per-doc subword
    // counts and the exact integer compression ratio. Train->apply in one
    // engine, re-derived end-to-end by the oracle's CTE chain.
    QuerySpec("q119_bpe_encode", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      val merges = graft.operators.Bpe.fitMerges(docs, "text", rounds = 4)
      graft.operators.Bpe.encode(docs, "doc_id", "text", merges)
        .orderBy("doc_id")
    }, Some(graft.operators.Bpe.encodeSql(DuckSql, "documents", "doc_id", "text", 4))),

    // ---- unigram-LM tokenizer training (SentencePiece path) --------------
    // The Llama/T5-family trainer beside q117's GPT-family BPE: seed
    // substring vocabulary, integer-exact hard-Viterbi segmentation
    // (fewest pieces, then highest counts, then path), usage-count M
    // step, 3/4 prune schedule — two EM rounds. The oracle replays the
    // ENTIRE loop (seed → DP stages → prune, ~20 chained CTEs), so the
    // hash pins cross-engine reproducible EM, not just a final answer.
    QuerySpec("q211_unigram_train", { (s, dir) =>
      graft.operators.Unigram.fit(Td.load(s, dir, "documents"), "text",
        graft.operators.Unigram.UnigramParams(
          rounds = 2, seedK = 96, maxWordLen = 8, maxPiece = 3), topN = 20)
    }, Some(graft.operators.Unigram.trainSql(DuckSql, "documents", "text",
      graft.operators.Unigram.UnigramParams(
        rounds = 2, seedK = 96, maxWordLen = 8, maxPiece = 3), 20))),

    // The apply side of q211: one EM round, then tokenize the corpus —
    // per-document word and piece counts, over-length words falling
    // back to chars (coverage). Train→apply in one engine, re-derived
    // end-to-end by the oracle.
    QuerySpec("q212_unigram_encode", { (s, dir) =>
      graft.operators.Unigram.encode(Td.load(s, dir, "documents"),
        "doc_id", "text",
        graft.operators.Unigram.UnigramParams(
          rounds = 1, seedK = 64, maxWordLen = 8, maxPiece = 3))
    }, Some(graft.operators.Unigram.encodeSql(DuckSql, "documents",
      "doc_id", "text",
      graft.operators.Unigram.UnigramParams(
        rounds = 1, seedK = 64, maxWordLen = 8, maxPiece = 3)))),

    // ---- BPE with BYTE-LEVEL FALLBACK (GPT-2's open-vocabulary rule) ------
    // Train on the even-doc half, encode the odd-doc half with words of
    // UNSEEN UNICODE injected (U+27E1 / 牛 / λ via hex — no multibyte
    // literals in SQL text): unknown characters decompose into UTF-8
    // byte tokens, so nothing is ever OOV. Pinned per doc: subword and
    // fallback-byte counts AND a computed n_unk column (symbols outside
    // charset ∪ merge-products ∪ byte-token space) that the oracle
    // re-derives — zero everywhere, data-verified open vocabulary.
    QuerySpec("q215_bpe_byte_fallback", { (s, dir) =>
      val docs = Td.load(s, dir, "documents").localCheckpoint(true)
      val train = docs.where("doc_id % 2 = 0")
      val eval0 = docs.where("doc_id % 2 = 1")
        .selectExpr("doc_id", s"text || ' ' || ${fallbackSfx(SparkSql)} AS text")
      graft.operators.Bpe
        .encodeFallback(train, eval0, "doc_id", "text", rounds = 4)
        .orderBy("doc_id")
    }, Some(graft.operators.Bpe.encodeFallbackSql(DuckSql,
      "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0) tr",
      s"(SELECT doc_id, text || ' ' || ${fallbackSfx(DuckSql)} AS text " +
        "FROM documents WHERE doc_id % 2 = 1) ev",
      "doc_id", "text", 4))),

    // ---- unigram-LM with BYTE-LEVEL FALLBACK (byte_fallback=true) ---------
    // The SentencePiece production detail beside q215's GPT rule: the
    // odd-doc corpus (same unseen-unicode injection) encodes under the
    // even-doc vocabulary — segmented words take their DP piece count,
    // unseen words char-walk with unknown characters counting their
    // UTF-8 bytes. Zero UNK by construction; fallback volume pinned.
    QuerySpec("q216_unigram_byte_fallback", { (s, dir) =>
      val docs = Td.load(s, dir, "documents").localCheckpoint(true)
      val train = docs.where("doc_id % 2 = 0")
      val eval0 = docs.where("doc_id % 2 = 1")
        .selectExpr("doc_id", s"text || ' ' || ${fallbackSfx(SparkSql)} AS text")
      graft.operators.Unigram.encodeFallback(train, eval0, "doc_id", "text",
        graft.operators.Unigram.UnigramParams(
          rounds = 1, seedK = 64, maxWordLen = 8, maxPiece = 3))
    }, Some(graft.operators.Unigram.encodeFallbackSql(DuckSql,
      "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0) tr",
      s"(SELECT doc_id, text || ' ' || ${fallbackSfx(DuckSql)} AS text " +
        "FROM documents WHERE doc_id % 2 = 1) ev",
      "doc_id", "text",
      graft.operators.Unigram.UnigramParams(
        rounds = 1, seedK = 64, maxWordLen = 8, maxPiece = 3)))),

    // ---- URL canonicalization + per-domain stats --------------------------
    // CCNet/RefinedWeb pre-text step: derive deterministic crawl-style
    // URLs (scheme/www/port/trailing-slash/tracking-param/fragment
    // variants keyed by doc_id), canonicalize, aggregate per host, join
    // the host stats back as a domain filter. Canonicalization is a pure
    // projection (zero shuffle); the stats join is host-keyed and
    // AQE-broadcastable.
    QuerySpec("q118_url_domains", { (s, dir) =>
      import graft.operators.UrlOps
      val docs = Td.load(s, dir, "documents")
        .selectExpr("doc_id", "lang", s"${urlExpr(SparkSql)} AS url")
      val canon = UrlOps.canonicalize(docs, "url")
      val stats = canon.groupBy("host").agg(
        count(lit(1)).as("host_docs"),
        countDistinct(col("lang")).as("host_langs"))
      canon.join(stats, Seq("host"))
        .selectExpr("doc_id", "host", "canon_url", "host_docs", "host_langs",
          "CAST(CASE WHEN host_docs >= 15 THEN 1 ELSE 0 END AS INT) AS kept_domain")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      import graft.operators.UrlOps
      Some(s"""WITH raw AS (
                 SELECT doc_id, lang, ${urlExpr(d)} AS url FROM documents),
               canon AS (
                 SELECT doc_id, lang,
                        ${UrlOps.canonUrlExpr(d, "url")} AS canon_url,
                        ${UrlOps.hostExpr(d, "url")} AS host
                 FROM raw),
               stats AS (
                 SELECT host, count(*) AS host_docs,
                        CAST(count(DISTINCT lang) AS BIGINT) AS host_langs
                 FROM canon GROUP BY host)
               SELECT c.doc_id, c.host, c.canon_url, s.host_docs, s.host_langs,
                      CAST(CASE WHEN s.host_docs >= 15 THEN 1 ELSE 0 END AS INTEGER) AS kept_domain
               FROM canon c JOIN stats s USING (host)
               ORDER BY c.doc_id""")
    }),

    // ---- language identification ---------------------------------------
    // Cavnar-Trenkle rank-order trigram langid (TextAnalysis.langId):
    // profiles train on docs with doc_id % 5 <> 0, the held-out fifth is
    // classified. Integer out-of-place distances; the oracle replays the
    // full train-then-classify algebra. (On this synthetic corpus the
    // lang labels are nearly independent of the shared vocabulary, so
    // accuracy is chance — LangIdSpec demonstrates real discrimination
    // on separable languages; HERE the hash pins the rank arithmetic.)
    QuerySpec("q125_langid", { (s, dir) =>
      graft.operators.TextAnalysis.langId(Td.load(s, dir, "documents"),
        "doc_id", "text", "lang", trainPred = pmod(col("doc_id"), lit(5)) =!= 0,
        profileSize = 40)
        .orderBy("doc_id")
    },
      Some("""WITH d AS (SELECT doc_id, lang, lower(text) AS t FROM documents
                         WHERE length(text) >= 3),
              tr AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
              te AS (SELECT * FROM d WHERE doc_id % 5 = 0),
              trg AS (SELECT lang, substr(t, CAST(i AS INTEGER), 3) AS g
                      FROM tr, UNNEST(generate_series(1, length(t) - 2)) AS u(i)),
              tp0 AS (SELECT lang, g, count(*) AS c FROM trg GROUP BY 1, 2),
              tp AS (SELECT lang, g, r FROM (
                       SELECT lang, g, row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS r
                       FROM tp0) WHERE r <= 40),
              teg AS (SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS g
                      FROM te, UNNEST(generate_series(1, length(t) - 2)) AS u(i)),
              dp0 AS (SELECT doc_id, g, count(*) AS c FROM teg GROUP BY 1, 2),
              dp AS (SELECT doc_id, g, r FROM (
                       SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS r
                       FROM dp0) WHERE r <= 40),
              langs AS (SELECT DISTINCT lang FROM tp),
              scored AS (SELECT dp.doc_id, l.lang AS pred_lang,
                                sum(COALESCE(abs(dp.r - tp.r), 40)) AS oop
                         FROM dp CROSS JOIN langs l
                         LEFT JOIN tp ON tp.lang = l.lang AND tp.g = dp.g
                         GROUP BY 1, 2),
              best AS (SELECT doc_id, pred_lang, oop,
                              row_number() OVER (PARTITION BY doc_id ORDER BY oop, pred_lang) AS rn
                       FROM scored)
              SELECT b.doc_id, te.lang AS true_lang, b.pred_lang,
                     CAST(b.oop AS BIGINT) AS oop_dist
              FROM best b JOIN te ON te.doc_id = b.doc_id
              WHERE b.rn = 1 ORDER BY b.doc_id""")),

    // ---- HTML main-content extraction -----------------------------------
    // extractHtmlText over crawl-style pages derived deterministically
    // from the documents table (the urlExpr trick): script/style blocks,
    // headings with entities, the body text, nav anchors, and — on every
    // fifth doc — a spam link block that pushes link density over the
    // bar. The oracle replays the same wrap-then-extract algebra, so
    // tag stripping, entity decode order, link measurement, and the
    // integer density rounding are all hash-pinned.
    QuerySpec("q129_html_extract", { (s, dir) =>
      val html = htmlExpr(SparkSql)
      graft.operators.TextAnalysis.extractHtmlText(
        Td.load(s, dir, "documents").selectExpr("doc_id", s"$html AS html"),
        "doc_id", "html", maxLinkDensityBp = 900, minChars = 150)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      import graft.operators.TextAnalysis
      Some(s"""WITH raw AS (
                 SELECT doc_id, ${htmlExpr(d)} AS html FROM documents),
               ext AS (
                 SELECT doc_id,
                        ${TextAnalysis.htmlVisibleExpr(d, "html")} AS text,
                        CAST(${TextAnalysis.htmlLinkCharsExpr(d, "html")} AS BIGINT) AS link_chars,
                        ${d.regexCount("html", "<a[^>]*>")} AS n_links
                 FROM raw),
               sized AS (
                 SELECT doc_id, text, length(text) AS text_chars, n_links, link_chars
                 FROM ext),
               dens AS (
                 SELECT *, CASE WHEN text_chars = 0 THEN 10000
                                ELSE ${d.idiv("(20000 * link_chars + text_chars)", "(2 * text_chars)")}
                           END AS link_density_bp
                 FROM sized)
               SELECT doc_id, text, text_chars, n_links, link_chars, link_density_bp,
                      CAST(CASE WHEN text_chars >= 150 AND link_density_bp <= 900
                                THEN 1 ELSE 0 END AS INTEGER) AS kept
               FROM dens ORDER BY doc_id""")
    }),

    // ---- CCNet perplexity-bucketed sampling (composition) ---------------
    // The published CCNet pipeline step after langid: score every doc
    // with the corpus LM, split the corpus into head/middle/tail
    // PERPLEXITY TERCILES, keep head+middle whole and hash-sample the
    // tail. Composes three engine operators — bigramLmScores (integer
    // basis points), ExactPercentile.ntileBuckets (the scale-safe exact
    // global ntile: boundary tuples collected, bucketing a pure
    // projection — never a single-reducer sort), and the md5_u32
    // deterministic sampler. The oracle replays scoring with plain
    // ntile + the same hash arithmetic.
    QuerySpec("q130_ccnet_buckets", { (s, dir) =>
      val docs = Td.load(s, dir, "documents")
      val scores = graft.operators.TextAnalysis
        .bigramLmScores(docs, docs, "doc_id", "text").cache()
      graft.operators.ExactPercentile
        .ntileBuckets(scores, 3, "avg_bp", "doc_id", "tercile")
        .selectExpr("doc_id", "n_bigrams", "avg_bp",
          "CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket",
          "CAST(CASE WHEN tercile < 3 OR md5_u32(CAST(doc_id AS STRING)) % 100 < 40 " +
            "THEN 1 ELSE 0 END AS INTEGER) AS kept")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val bigrams = d.bind(toks(d), "tk",
        d.map(d.range1(s"${d.len("tk")} - 1"), "i", d.wordSlice("tk", "i", 2)))
      Some(s"""WITH big AS (
                 SELECT doc_id, unnest($bigrams) AS bigram FROM documents),
               c2 AS (SELECT bigram, count(*) AS n2 FROM big GROUP BY 1),
               c1 AS (SELECT ${d.elem(d.splitSpace("bigram"), "1")} AS prev,
                             CAST(sum(n2) AS BIGINT) AS n1
                      FROM c2 GROUP BY 1),
               v AS (SELECT count(DISTINCT tok) AS vsize
                     FROM (SELECT unnest(${toks(d)}) AS tok FROM documents)),
               scored AS (
                 SELECT b.doc_id,
                        ${d.idiv("(20000 * (c2.n2 + 1) + (c1.n1 + v.vsize))",
                                 "(2 * (c1.n1 + v.vsize))")} AS bp
                 FROM big b
                 JOIN c2 ON b.bigram = c2.bigram
                 JOIN c1 ON ${d.elem(d.splitSpace("b.bigram"), "1")} = c1.prev
                 CROSS JOIN v),
               agg AS (
                 SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                        CAST(${d.idiv("(2 * sum(bp) + count(*))", "(2 * count(*))")} AS BIGINT) AS avg_bp
                 FROM scored GROUP BY doc_id),
               terc AS (
                 SELECT *, CAST(ntile(3) OVER (ORDER BY avg_bp, doc_id) AS INTEGER) AS tercile
                 FROM agg)
               SELECT doc_id, n_bigrams, avg_bp,
                      CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
                      CAST(CASE WHEN tercile < 3 OR ${d.hex32(d.toStr("doc_id"))} % 100 < 40
                                THEN 1 ELSE 0 END AS INTEGER) AS kept
               FROM terc ORDER BY doc_id""")
    }),

    // ---- Unicode-normalization-aware dedup ------------------------------
    // The step every hash-keyed dedup operator silently assumes: the
    // precomposed 'café' (U+00E9) and the decomposed 'cafe'+U+0301 are
    // the same document to a reader but different bytes to md5/minhash/
    // simhash. Spark has no normalization builtin, so nfc_normalize is
    // the engine's own codegen'd expression (functions/NormalizeExprs)
    // sharing DuckDB's builtin name — the SQL fragments are verbatim
    // identical in both engines. Each doc is planted with two raw
    // variants: NFC-equal on even ids (n_forms collapses to 1, saving
    // one byte of combining-mark encoding), genuinely distinct on odd
    // (n_forms stays 2 — proof the collapse is the normalizer, not the
    // grouping). Pure projection + two bounded aggs: zero corpus-sized
    // state at any scale, and the ASCII fast path makes the normalizer
    // allocation-free on the overwhelmingly-ASCII hot rows.
    QuerySpec("q141_nfc_dedup", { (s, dir) =>
      val d = SparkSql
      Td.load(s, dir, "documents")
        .selectExpr("doc_id",
          s"explode(array(text || ${nfcSuffixPre(d)}, text || CASE WHEN doc_id % 2 = 0 " +
            s"THEN ${nfcSuffixCombining(d)} ELSE ${nfcSuffixDistinct(d)} END)) AS raw")
        .selectExpr("doc_id", "raw", "nfc_normalize(raw) AS norm")
        .groupBy("doc_id")
        .agg(countDistinct(col("norm")).as("n_forms"),
          sum(expr(s"${d.byteLen("raw")} - ${d.byteLen("norm")}")).as("bytes_saved"))
        .groupBy("n_forms")
        .agg(count(lit(1)).as("n_docs"), sum(col("bytes_saved")).as("total_bytes_saved"))
        .orderBy("n_forms")
    }, {
      val d = DuckSql
      Some(s"""WITH variants AS (
                 SELECT doc_id,
                        unnest([text || ${nfcSuffixPre(d)},
                                text || CASE WHEN doc_id % 2 = 0
                                             THEN ${nfcSuffixCombining(d)}
                                             ELSE ${nfcSuffixDistinct(d)} END]) AS raw
                 FROM documents),
               norm AS (SELECT doc_id, raw, nfc_normalize(raw) AS norm FROM variants),
               per_doc AS (
                 SELECT doc_id, CAST(count(DISTINCT norm) AS BIGINT) AS n_forms,
                        CAST(sum(${d.byteLen("raw")} - ${d.byteLen("norm")}) AS BIGINT) AS bytes_saved
                 FROM norm GROUP BY doc_id)
               SELECT n_forms, count(*) AS n_docs,
                      CAST(sum(bytes_saved) AS BIGINT) AS total_bytes_saved
               FROM per_doc GROUP BY n_forms ORDER BY n_forms""")
    }),

    // ---- accent-folded term statistics ----------------------------------
    // Search-side text normalization: strip_accents (NFD + drop
    // combining marks — the engine's codegen'd expression, DuckDB's
    // builtin name) folds 'café'/'cafe' and 'niño'/'nino' onto one term.
    // The planted suffix carries both accented and plain spellings, so
    // n_raw_forms ≥ 2 proves the fold is live while per-term counts stay
    // deterministic. Explode → map-side-combined groupBy on a 3-term
    // post-filter vocabulary: the exchange carries 3 partials per task.
    QuerySpec("q142_accent_fold", { (s, dir) =>
      val d = SparkSql
      Td.load(s, dir, "documents")
        .selectExpr("doc_id", s"explode(${d.splitSpace(s"text || ${accentSuffix(d)}")}) AS tok")
        .selectExpr("doc_id", "tok", "strip_accents(tok) AS term")
        .where(col("term").isin("cafe", "nino", "muhleisen"))
        .groupBy("term")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("tok")).as("n_raw_forms"),
          countDistinct(col("doc_id")).as("n_docs"))
        .orderBy("term")
    }, {
      val d = DuckSql
      Some(s"""WITH tok AS (
                 SELECT doc_id, unnest(${d.splitSpace(s"text || ${accentSuffix(d)}")}) AS tok
                 FROM documents),
               folded AS (SELECT doc_id, tok, strip_accents(tok) AS term FROM tok)
               SELECT term, count(*) AS n_occurrences,
                      CAST(count(DISTINCT tok) AS BIGINT) AS n_raw_forms,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
               FROM folded WHERE term IN ('cafe', 'nino', 'muhleisen')
               GROUP BY term ORDER BY term""")
    })
  )

  /** q141's planted variants (UTF-8 bytes via hex so the source stays
    * ASCII): 'café' precomposed (U+00E9), 'cafe'+combining-acute
    * (U+0301, NFC-equal to the first), and 'cafè' (U+00E8, genuinely
    * distinct under any normalization). */
  private def nfcSuffixPre(d: SqlDialect) = s"'caf' || ${d.utf8FromHex("C3A9")}"
  private def nfcSuffixCombining(d: SqlDialect) = s"'cafe' || ${d.utf8FromHex("CC81")}"
  private def nfcSuffixDistinct(d: SqlDialect) = s"'caf' || ${d.utf8FromHex("C3A8")}"

  /** q142's planted accent suffix: accented and plain spellings of the
    * same three terms (é=C3A9, ñ=C3B1, ü=C3BC), all lowercase so no
    * case-folding step muddies the accent-fold parity. */
  private def accentSuffix(d: SqlDialect) =
    s"' caf' || ${d.utf8FromHex("C3A9")} || ' cafe ni' || ${d.utf8FromHex("C3B1")} || " +
      s"'o nino m' || ${d.utf8FromHex("C3BC")} || 'hleisen'"

  /** q129's crawl-style page, derived deterministically from the
    * documents columns: script + style boilerplate, an entity-bearing
    * heading, the body text, two nav anchors, and a spam link block on
    * every fifth doc (pushes link density past the keep bar). */
  private def htmlExpr(d: SqlDialect): String =
    "'<html><head><script type=text/javascript>var doc = 1;</script>" +
      "<style>p { margin: 0 }</style></head><body><h1>Doc ' || " +
      s"${d.toStr("doc_id")} || ' &amp; the &lt;corpus&gt;</h1><p>' || text || " +
      "'</p><a href=/by-lang>' || lang || '</a> <a href=/by-src>' || source || '</a>' || " +
      "CASE WHEN doc_id % 5 = 0 THEN '<ul><li><a href=/s1>click here for the best prizes</a></li>" +
      "<li><a href=/s2>more winning links right here</a></li>" +
      "<li><a href=/s3>subscribe now for endless offers</a></li></ul>' ELSE '' END || " +
      "'</body></html>'"

  /** q118's crawl-style URL, derived deterministically from doc_id /
    * lang / source: scheme, WWW and subdomain spellings, default and
    * non-default ports, trailing slashes, tracking params, and fragments
    * all vary so every canonicalization rule fires on real rows. */
  /** The unseen-unicode suffix q215/q216 inject into the eval half —
    * two words mixing known ASCII with characters absent from the
    * synthetic corpus: "x⟡y" (U+27E1) and "牛λ" (U+725B, U+03BB), all
    * routed through utf8FromHex (the no-multibyte-literals rule). */
  private def fallbackSfx(d: SqlDialect): String =
    s"'x' || ${d.utf8FromHex("E29FA1")} || 'y' || ' ' || " +
      s"${d.utf8FromHex("E7899B")} || ${d.utf8FromHex("CEBB")}"

  private def urlExpr(d: SqlDialect): String =
    "CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END || '://' || " +
      "CASE WHEN doc_id % 5 = 0 THEN 'WWW.' WHEN doc_id % 5 = 3 THEN 'news.' ELSE '' END || " +
      "source || '.Example.' || CASE WHEN doc_id % 3 = 0 THEN 'COM' ELSE 'org' END || " +
      "CASE WHEN doc_id % 4 = 0 THEN ':443' WHEN doc_id % 4 = 1 THEN ':8080' " +
      "WHEN doc_id % 4 = 2 THEN ':80' ELSE '' END || " +
      s"'/' || lang || '/Article/' || ${d.toStr("doc_id")} || " +
      "CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END || " +
      s"'?id=' || ${d.toStr("doc_id")} || " +
      "CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed' ELSE '' END || " +
      "CASE WHEN doc_id % 7 = 0 THEN '&ref=rss' ELSE '' END || " +
      "CASE WHEN doc_id % 5 = 1 THEN '&page=2' ELSE '' END || " +
      "CASE WHEN doc_id % 3 = 1 THEN '#sec1' ELSE '' END"
}
