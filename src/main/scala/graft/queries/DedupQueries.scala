package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Td

/** Beyond-reference deduplication operators over `documents` /
  * `embeddings` (builder brief; SURVEY.md §7.2 M5): exact hash-groupBy,
  * MinHash+LSH banded near-dup, SimHash hamming near-dup, n-gram Jaccard
  * (the quadratic baseline), and embedding-cosine near-dup.
  *
  * Scale shape: every near-dup operator is BUCKET-JOIN shaped — documents
  * meet only inside an LSH band / simhash prefix / sign-pattern bucket, so
  * the join is an equi-join Catalyst hash-partitions on the bucket key;
  * nothing here is all-pairs except q57, which exists as the explicitly-
  * labeled quadratic baseline on a 80-doc slice (at 100 TB you run q55/q56
  * instead — same output contract). Candidate verification (exact Jaccard)
  * re-joins the shingle sets by doc id rather than carrying arrays through
  * the band explode, so the exploded relation stays narrow (id + bucket).
  *
  * The synthetic corpus is all-distinct, so each query unions in
  * deterministic near-duplicates (id+10000, suffix-perturbed) to give the
  * operators real work; the DuckDB oracle builds the identical corpus.
  */
object DedupQueries {

  /** documents ∪ perturbed copies of doc_id < 100 (near-dups). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = Td.load(s, dir, "documents").select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))
  }

  private val corpusSql =
    """corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 10000 AS doc_id, concat(text, ' near duplicate suffix marker') AS text
         FROM documents WHERE doc_id < 100)"""

  /** 3-token shingle set (distinct). The token array is lambda-bound so
    * the split() happens once per row, not once per window index. */
  private def shinglesExpr(d: SqlDialect): String =
    d.bind(d.splitSpace("text"), "tk",
      d.adistinct(d.map(d.range1(s"${d.len("tk")} - 2"), "i", d.wordSlice("tk", "i", 3))))

  /** 12 minhashes over the (lambda-bound) shingle set. An md5 is 128 bits
    * = FOUR 32-bit hash slots, so 12 signatures need only 3 seeded md5
    * per shingle (concat of md5(s#0..2), 96 hex chars). Slot j reads seed
    * j%3, chunk j/3 — consecutive slots always use DIFFERENT seed md5s,
    * so every 2-row LSH band mixes two independent hash streams (a
    * same-seed pairing would correlate bands and flood the candidate
    * join — measured +50% runtime from spurious candidates). */
  private def sigsExpr(d: SqlDialect): String = {
    // Fixed-width lowercase hex sorts lexicographically == numerically, so
    // the minhash can min over the RAW 8-hex-digit substrings — no
    // digit-parse arithmetic at all (the interpreted per-digit parse was
    // ~30 M expression evals at sf0.1, the actual hot spot).
    val start = s"(j % 3) * 32 + ${d.idiv("j", "3")} * 8"
    d.bind(shinglesExpr(d), "sh",
      d.bind(d.map("sh", "s", "concat(md5(concat(s, '#0')), md5(concat(s, '#1')), md5(concat(s, '#2')))"), "hs",
        d.map(d.range("0", "11"), "j", d.amin(d.map("hs", "h", s"substring(h, $start + 1, 8)")))))
  }

  /** Shared oracle CTE chain ending in `pairs(doc_a, doc_b, jaccard)` —
    * the q55 result set, reused verbatim by the q91 cluster oracle and
    * (retargeted at a paragraph pseudo-corpus via `from`) by q102. */
  private def minhashPairsSql(d: SqlDialect, from: String = "corpus"): String =
    s"""tk AS (
          SELECT doc_id, ${shinglesExpr(d)} AS shingles
          FROM $from WHERE ${d.len(d.splitSpace("text"))} >= 3),
        sig AS (SELECT doc_id, ${sigsExpr(d)} AS sigs
                FROM $from WHERE ${d.len(d.splitSpace("text"))} >= 3),
        bands AS (
          SELECT doc_id,
                 concat(CAST(t.j AS VARCHAR), ':',
                        CAST(sigs[2*t.j+1] AS VARCHAR), '|',
                        CAST(sigs[2*t.j+2] AS VARCHAR)) AS bucket
          FROM sig CROSS JOIN generate_series(0, 5) t(j)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
        pairs AS (
          SELECT doc_a, doc_b,
                 round(CAST(${d.interSize("ta.shingles", "tb.shingles")} AS DOUBLE) /
                       CAST(${d.unionSize("ta.shingles", "tb.shingles")} AS DOUBLE), 6) AS jaccard
          FROM cand
          JOIN tk ta ON ta.doc_id = doc_a
          JOIN tk tb ON tb.doc_id = doc_b
          WHERE CAST(${d.interSize("ta.shingles", "tb.shingles")} AS DOUBLE) /
                CAST(${d.unionSize("ta.shingles", "tb.shingles")} AS DOUBLE) >= 0.6)"""

  val specs: Seq[QuerySpec] = Seq(

    // ---- exact dedup: content-hash groupBy ------------------------------
    // At scale: one hash-exchange on md5(text) (32 hex chars, not the
    // document body), map-side partial agg. Keeper = min id. Corpus here
    // unions in EXACT copies (doc_id+20000) so the operator has real work.
    QuerySpec("q54_dedup_exact",
      (s, dir) => {
        val base = Td.load(s, dir, "documents").select("doc_id", "text")
        val corpus = base.unionAll(base.filter(col("doc_id") < 50)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
        graft.operators.Dedup.exactDuplicates(corpus, "doc_id", "text")
          .orderBy("content_hash")
      },
      Some(s"""WITH corpus AS (
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 20000, text FROM documents WHERE doc_id < 50)
               SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
                      count(*) AS n_copies
               FROM corpus GROUP BY 1 ORDER BY content_hash""")),

    // ---- MinHash + LSH banded near-dup ----------------------------------
    // 12 minhashes → 6 bands × 2 rows; docs meeting in ≥1 band become
    // candidates; exact 3-gram Jaccard ≥ 0.6 confirms. Candidate recall at
    // s=0.7 is 1-(1-0.7^2)^6 ≈ 0.98. The oracle recomputes the identical
    // signatures/bands, so both engines agree on the candidate set too.
    QuerySpec("q55_dedup_minhash", { (s, dir) =>
      graft.operators.Dedup.minhashLshPairs(corpus(s, dir), "doc_id", "text", 0.6)
        .orderBy("doc_a", "doc_b")
    }, {
      val d = DuckSql
      Some(s"""WITH $corpusSql, ${minhashPairsSql(d)}
               SELECT doc_a, doc_b, jaccard FROM pairs
               ORDER BY doc_a, doc_b""")
    }),

    // ---- near-dup CLUSTERS: connected components over the LSH pairs -----
    // Engine: Dedup.clusters (iterative min-label propagation, one
    // join+groupBy-min per round). Oracle: a DIFFERENT algorithm —
    // recursive-CTE transitive closure + min over each node's reachable
    // set — so the distributed propagation is independently cross-checked.
    // keep/drop decision: keep doc_id == cluster_id.
    QuerySpec("q91_dedup_clusters", { (s, dir) =>
      val pairs = graft.operators.Dedup
        .minhashLshPairs(corpus(s, dir), "doc_id", "text", 0.6)
      graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""WITH RECURSIVE $corpusSql, ${minhashPairsSql(d)},
               und AS (
                 SELECT doc_a AS u, doc_b AS v FROM pairs
                 UNION
                 SELECT doc_b, doc_a FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM und
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
               SELECT u AS doc_id, min(v) AS cluster_id
               FROM reach GROUP BY u ORDER BY doc_id""")
    }),

    // ---- cluster-canonical selection: keep the BEST doc per cluster ----
    // The RefinedWeb curation step on top of q91's clusters: the
    // representative is the highest-QUALITY member (here token count —
    // the perturbed +10000 copies carry a 4-token suffix, so the keeper
    // is the COPY, not q91's min-id original: the ordering is genuinely
    // exercised, not vacuously equal to min-id). Oracle = the q91
    // recursive-CTE clustering + the same quality window in DuckDB.
    QuerySpec("q136_dedup_keep_best", { (s, dir) =>
      val d = SparkSql
      val q = s"CAST(${d.len(d.splitSpace("text"))} AS BIGINT)"
      graft.operators.Dedup
        .keepBestPerCluster(corpus(s, dir), "doc_id", "text", q, 0.6)
        .selectExpr("doc_id", s"$q AS n_tokens")
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val q = s"CAST(${d.len(d.splitSpace("text"))} AS BIGINT)"
      Some(s"""WITH RECURSIVE $corpusSql, ${minhashPairsSql(d)},
               und AS (
                 SELECT doc_a AS u, doc_b AS v FROM pairs
                 UNION
                 SELECT doc_b, doc_a FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM und
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
               labels AS (SELECT u AS doc_id, min(v) AS cluster_id
                          FROM reach GROUP BY u),
               scored AS (
                 SELECT c.doc_id, $q AS quality, l.cluster_id
                 FROM corpus c JOIN labels l ON c.doc_id = l.doc_id),
               losers AS (
                 SELECT doc_id FROM (
                   SELECT doc_id, row_number() OVER (
                     PARTITION BY cluster_id
                     ORDER BY quality DESC, doc_id) AS rk
                   FROM scored) t
                 WHERE rk <> 1)
               SELECT doc_id, $q AS n_tokens FROM corpus
               WHERE doc_id NOT IN (SELECT doc_id FROM losers)
               ORDER BY doc_id""")
    }),

    // ---- paragraph-level near-dedup (post-document boilerplate pass) ----
    // 20-word windows of the SAME perturbed corpus: the doc_id+10000
    // copies share every leading paragraph with their originals exactly,
    // so the operator must drop those while keeping each document's
    // divergent tail window — within-corpus boilerplate removal through
    // the unchanged document machinery (pseudo-docs keyed
    // doc·1024+idx; see Dedup.dropDuplicateParagraphs). Oracle = the
    // identical window construction + the SAME pairs chain retargeted at
    // the paragraph pseudo-corpus + the q91 recursive-CTE clustering.
    QuerySpec("q102_paragraph_dedup", { (s, dir) =>
      graft.operators.Dedup
        .dropDuplicateParagraphs(corpus(s, dir), "doc_id", "text",
          paraWords = 20, jaccardThreshold = 0.6)
        .orderBy("doc_id", "para_idx")
    }, {
      val d = DuckSql
      val nParas = d.idiv(s"(${d.len("tk")} + 19)", "20")
      Some(s"""WITH RECURSIVE $corpusSql,
               tkk AS (SELECT doc_id AS src_doc, ${d.splitSpace("text")} AS tk FROM corpus),
               parai AS (SELECT src_doc, tk, unnest(${d.range1(nParas)}) AS i FROM tkk),
               paras AS (
                 SELECT src_doc, CAST(i - 1 AS INTEGER) AS para_idx,
                        ${d.wordSlice("tk", "(i-1)*20 + 1", 20)} AS text
                 FROM parai),
               pcorpus AS (
                 SELECT src_doc, para_idx, src_doc * 1024 + para_idx AS doc_id, text
                 FROM paras),
               ${minhashPairsSql(d, from = "pcorpus")},
               und AS (
                 SELECT doc_a AS u, doc_b AS v FROM pairs
                 UNION
                 SELECT doc_b, doc_a FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM und
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
               nonrep AS (
                 SELECT u AS pkey FROM reach GROUP BY u HAVING u <> min(v))
               SELECT src_doc AS doc_id, para_idx, text AS para_text
               FROM pcorpus
               WHERE doc_id NOT IN (SELECT pkey FROM nonrep)
               ORDER BY doc_id, para_idx""")
    }),

    // ---- SimHash hamming near-dup ---------------------------------------
    // 32-bit majority simhash split into FOUR 8-bit band tables (band k =
    // bits [8k, 8k+8)): ≤3 differing bits occupy ≤3 bands, so every
    // hamming≤3 pair collides in at least one band — full recall, unlike
    // the single 16-bit prefix of round 2 (which missed pairs whose
    // differing bits fell in the prefix). Candidates = distinct union of
    // the 4 bucket equi-joins; hamming filter verifies.
    QuerySpec("q56_dedup_simhash", { (s, dir) =>
      graft.operators.Dedup.simhashPairs(corpus(s, dir), "doc_id", "text", 3)
        .orderBy("doc_a", "doc_b")
    }, {
      val d = DuckSql
      Some(s"""WITH $corpusSql,
               sh AS (SELECT doc_id, ${simhashBound(d)} AS simhash FROM corpus),
               bands AS (
                 SELECT doc_id, simhash,
                        concat(CAST(t.k AS VARCHAR), ':',
                               CAST(${d.shiftr("simhash", "(8*t.k)")} % 256 AS VARCHAR)) AS bucket
                 FROM sh CROSS JOIN generate_series(0, 3) t(k))
               SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      bit_count(${d.bxor("a.simhash", "b.simhash")}) AS hamming
               FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
               WHERE bit_count(${d.bxor("a.simhash", "b.simhash")}) <= 3
               ORDER BY doc_a, doc_b""")
    }),

    // ---- FLAGSHIP COMPOSITION: the full training-data curation pipeline
    // quality filter → exact dedup (min-id keeper) → minhash-LSH near-dup
    // clusters → drop non-representatives → deterministic 80/20 split →
    // per-(lang, split) corpus stats. Every stage is one of the engine's
    // reusable operators; the oracle re-derives the whole chain in SQL
    // (recursive CTE for the cluster step). This is the query a user of
    // the engine actually runs before a training job.
    QuerySpec("q94_training_pipeline", { (s, dir) =>
      val d = SparkSql
      val base = Td.load(s, dir, "documents").select("doc_id", "text", "lang")
      val c = base
        .unionAll(base.filter(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(col("text"), lit(" near duplicate suffix marker")).as("text"),
            col("lang")))
        .unionAll(base.filter(col("doc_id") < 50)
          .select((col("doc_id") + 20000).as("doc_id"), col("text"), col("lang")))
      val quality = c.where(s"${d.len(d.splitSpace("text"))} >= 15")
      val keepExact = graft.operators.Dedup.exactDuplicates(quality, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val deduped = quality.join(keepExact, "doc_id")
      val pairs = graft.operators.Dedup.minhashLshPairs(deduped, "doc_id", "text", 0.6)
      val nonRep = graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
        .where("doc_id != cluster_id").select("doc_id")
      val kept = deduped.join(nonRep, Seq("doc_id"), "left_anti")
      graft.operators.Sampling.hashSplit(kept, "doc_id", 80)
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr(s"${d.len(d.splitSpace("text"))}")).as("n_tokens"))
        .orderBy("lang", "split")
    }, {
      val d = DuckSql
      Some(s"""WITH RECURSIVE raw AS (
                 SELECT doc_id, text, lang FROM documents
                 UNION ALL
                 SELECT doc_id + 10000, concat(text, ' near duplicate suffix marker'), lang
                 FROM documents WHERE doc_id < 100
                 UNION ALL
                 SELECT doc_id + 20000, text, lang FROM documents WHERE doc_id < 50),
               quality AS (
                 SELECT * FROM raw WHERE ${d.len(d.splitSpace("text"))} >= 15),
               keep_exact AS (
                 SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
               corpus AS (
                 SELECT q.doc_id, q.text, q.lang
                 FROM quality q JOIN keep_exact k ON q.doc_id = k.doc_id),
               ${minhashPairsSql(d)},
               und AS (
                 SELECT doc_a AS u, doc_b AS v FROM pairs
                 UNION
                 SELECT doc_b, doc_a FROM pairs),
               reach(u, v) AS (
                 SELECT u, u FROM und
                 UNION
                 SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
               non_rep AS (
                 SELECT u AS doc_id FROM reach GROUP BY u HAVING u != min(v)),
               kept AS (
                 SELECT c.* FROM corpus c
                 WHERE NOT EXISTS (SELECT 1 FROM non_rep n WHERE n.doc_id = c.doc_id))
               SELECT lang,
                      CASE WHEN ${d.hex32("CAST(doc_id AS VARCHAR)")} % 100 < 80
                           THEN 'train' ELSE 'test' END AS split,
                      count(*) AS n_docs,
                      CAST(sum(${d.len(d.splitSpace("text"))}) AS BIGINT) AS n_tokens
               FROM kept GROUP BY 1, 2 ORDER BY lang, split""")
    }),

    // ---- n-gram Jaccard: the labeled QUADRATIC BASELINE -----------------
    // Char-4-gram Jaccard, all pairs over an 80-doc slice. This is the
    // correctness baseline the LSH operators are measured against; at
    // scale it is intentionally not used (see q55/q56).
    QuerySpec("q57_dedup_ngram_jaccard", { (s, dir) =>
      val d = SparkSql
      val grams = d.adistinct(d.map(d.range1("length(text) - 3"), "i", "substring(text, i, 4)"))
      val base = corpus(s, dir).where("doc_id % 10000 < 40")
        .selectExpr("doc_id", s"$grams AS grams")
      base.as("a").join(base.as("b"), col("a.doc_id") < col("b.doc_id"))
        .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
          s"round(CAST(${d.interSize("a.grams", "b.grams")} AS DOUBLE) / CAST(${d.unionSize("a.grams", "b.grams")} AS DOUBLE), 6) AS jaccard")
        .where("jaccard >= 0.5")
        .orderBy("doc_a", "doc_b")
    }, {
      val d = DuckSql
      val grams = d.adistinct(d.map(d.range1("length(text) - 3"), "i", "substring(text, i, 4)"))
      Some(s"""WITH $corpusSql,
               base AS (SELECT doc_id, $grams AS grams FROM corpus WHERE doc_id % 10000 < 40)
               SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      round(CAST(${d.interSize("a.grams", "b.grams")} AS DOUBLE) /
                            CAST(${d.unionSize("a.grams", "b.grams")} AS DOUBLE), 6) AS jaccard
               FROM base a JOIN base b ON a.doc_id < b.doc_id
               WHERE CAST(${d.interSize("a.grams", "b.grams")} AS DOUBLE) /
                     CAST(${d.unionSize("a.grams", "b.grams")} AS DOUBLE) >= 0.5
               ORDER BY doc_a, doc_b""")
    }),

    // ---- edit-distance near-dup (length-banded levenshtein) -------------
    // Classic edit distance is identical in both engines. Candidates are
    // restricted to the SAME 100-char length band (an equi-join — a true
    // near-dup can't differ by more than the distance threshold in
    // length, so banding loses only cross-band boundary pairs, a
    // documented recall trade). Levenshtein itself is O(len²) per pair —
    // banding keeps the pair count, not the per-pair cost, in check; for
    // corpus-scale fuzzy dedup prefer q55/q56 and keep edit distance as
    // the high-precision verifier it is here.
    QuerySpec("q76_dedup_editdistance", { (s, dir) =>
      graft.operators.Dedup.editDistancePairs(
        corpus(s, dir).where("doc_id % 10000 < 40"), "doc_id", "text", 35)
        .orderBy("doc_a", "doc_b")
    },
      Some(s"""WITH $corpusSql,
               slice AS (
                 SELECT doc_id, text, length(text) // 100 AS len_band
                 FROM corpus WHERE doc_id % 10000 < 40)
               SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      CAST(levenshtein(a.text, b.text) AS INTEGER) AS edit_dist
               FROM slice a JOIN slice b
                 ON a.len_band = b.len_band AND a.doc_id < b.doc_id
               WHERE levenshtein(a.text, b.text) <= 35
               ORDER BY doc_a, doc_b""")),

    // ---- group-level minhash signatures (custom mergeable AGGREGATE) ----
    // minhash_agg (functions/MinHashAgg, a TypedImperativeAggregate) folds
    // per-doc signatures into one per-language signature — union-of-sets
    // semantics via element-wise min, mergeable across partitions like
    // sum(). Pairwise slot agreement then estimates cross-corpus Jaccard
    // WITHOUT revisiting any document: at 100 TB the comparison costs 12
    // strings per group. The oracle reproduces the aggregate as twelve
    // per-slot min() aggregations.
    QuerySpec("q80_minhash_group_agg", { (s, dir) =>
      val d = SparkSql
      val tk = Td.load(s, dir, "documents")
        .where(s"${d.len(d.splitSpace("text"))} >= 3")
        .selectExpr("lang", s"minhash_sigs(${shinglesExpr(d)}) AS sigs")
      val agg = tk.groupBy("lang").agg(expr("minhash_agg(sigs)").as("sig"))
      agg.as("a").join(agg.as("b"), col("a.lang") < col("b.lang"))
        .selectExpr(
          "a.lang AS lang_a", "b.lang AS lang_b",
          "array_join(a.sig, '|') AS sig_a",
          "size(filter(sequence(1, 12), j -> element_at(a.sig, j) = element_at(b.sig, j))) AS matching_slots")
        .selectExpr("lang_a", "lang_b", "sig_a", "matching_slots",
          "round(CAST(matching_slots AS DOUBLE) / 12.0, 6) AS est_jaccard")
        .orderBy("lang_a", "lang_b")
    }, {
      val d = DuckSql
      val slotMins = (1 to 12).map(j => s"min(sigs[$j])").mkString("[", ", ", "]")
      Some(s"""WITH tk AS (
                 SELECT lang, ${sigsExpr(d)} AS sigs
                 FROM documents WHERE ${d.len(d.splitSpace("text"))} >= 3),
               agg AS (SELECT lang, $slotMins AS sig FROM tk GROUP BY lang)
               SELECT a.lang AS lang_a, b.lang AS lang_b,
                      array_to_string(a.sig, '|') AS sig_a,
                      len(list_filter(generate_series(1, 12), j -> a.sig[j] = b.sig[j])) AS matching_slots,
                      round(CAST(len(list_filter(generate_series(1, 12), j -> a.sig[j] = b.sig[j])) AS DOUBLE) / CAST(12.0 AS DOUBLE), 6) AS est_jaccard
               FROM agg a JOIN agg b ON a.lang < b.lang
               ORDER BY lang_a, lang_b""")
    }),

    // ---- embedding-cosine near-dup --------------------------------------
    // Bucket = sign pattern of the first 16 dims (a deterministic 16-bit
    // hyperplane sketch); exact copies land in the same bucket, candidates
    // verified by full cosine ≥ 0.99.
    QuerySpec("q58_dedup_embedding", { (s, dir) =>
      val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
      val corpusE = e.unionAll(e.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
      graft.operators.Dedup.cosinePairs(corpusE, "vec_id", "embedding", 0.99)
        .orderBy("vec_a", "vec_b")
    }, {
      val d = DuckSql
      val sign = d.joinStr(d.map(d.range("1", "16"), "i",
        s"CASE WHEN ${d.elem("embedding", "i")} >= 0 THEN '1' ELSE '0' END"), "")
      Some(s"""WITH corpus AS (
                 SELECT vec_id, embedding FROM embeddings
                 UNION ALL
                 SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 50),
               wb AS (
                 SELECT vec_id, embedding, $sign AS bucket,
                        sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm
                 FROM corpus)
               SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                      round(${d.dsum(d.zipMul("a.embedding", "b.embedding"))} / (a.nrm * b.nrm), 6) AS cosine
               FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
               WHERE ${d.dsum(d.zipMul("a.embedding", "b.embedding"))} / (a.nrm * b.nrm) >= 0.99
               ORDER BY vec_a, vec_b""")
    }),

    // ---- benchmark decontamination (train/eval n-gram overlap) ----------
    // eval = every 23rd document; corpus = the perturbed near-dup corpus,
    // so the contaminated set exercises BOTH hit kinds: eval members
    // themselves (self-overlap) and their id+10000 suffix-perturbed
    // copies (cross-document leakage — the case decontamination exists
    // for). Scale shape: eval's distinct 13-grams broadcast; the corpus's
    // exploded grams meet them in a map-side join and only the matches
    // reach the per-doc count exchange (operators/Decontamination).
    QuerySpec("q103_decontaminate", { (s, dir) =>
      val eval = Td.load(s, dir, "documents").where("doc_id % 23 = 0")
      graft.operators.Decontamination
        .contaminationHits(corpus(s, dir), "doc_id", "text", eval, "text", 13)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      val grams = graft.operators.Decontamination.ngramsExpr(d, "text", 13)
      Some(s"""WITH $corpusSql,
               eval AS (SELECT text FROM documents WHERE doc_id % 23 = 0),
               cg AS (SELECT doc_id, unnest($grams) AS ngram FROM corpus),
               eg AS (SELECT DISTINCT unnest($grams) AS ngram FROM eval)
               SELECT cg.doc_id, count(*) AS n_hits
               FROM cg JOIN eg ON cg.ngram = eg.ngram
               GROUP BY cg.doc_id
               ORDER BY doc_id""")
    }),

    // ---- incremental dedup against history (Bloom pre-filter) -----------
    // The nightly-crawl shape: drop incoming docs whose content the
    // corpus has EVER seen, without joining the whole history per batch.
    // history = 3/4 of the corpus; incoming = the remaining 1/4 (new)
    // plus re-sends of 150 history docs under fresh ids (must be
    // dropped). The result is EXACT — the Bloom filter (no false
    // negatives) only short-circuits definitely-new rows past the
    // md5 anti-join; false positives get caught by the join. The oracle
    // is therefore a plain NOT EXISTS on content hash: the sketch is a
    // plan optimization, invisible in the answer (same contract as AQE).
    QuerySpec("q109_dedup_incremental", { (s, dir) =>
      val docs = Td.load(s, dir, "documents").select("doc_id", "text")
      val history = docs.where("doc_id % 4 <> 0")
      val incoming = docs.where("doc_id % 4 = 0")
        .unionAll(history.where("doc_id < 200")
          .select((col("doc_id") + 30000).as("doc_id"), col("text")))
      graft.operators.Dedup
        .newAgainstHistory(history, incoming, "text")
        .select(col("doc_id"), md5(col("text")).as("content_hash"))
        .orderBy("doc_id")
    }, Some("""WITH history AS (
                 SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0),
               incoming AS (
                 SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0
                 UNION ALL
                 SELECT doc_id + 30000, text FROM history WHERE doc_id < 200)
               SELECT i.doc_id, md5(i.text) AS content_hash
               FROM incoming i
               WHERE NOT EXISTS (
                 SELECT 1 FROM history h WHERE md5(h.text) = md5(i.text))
               ORDER BY i.doc_id""")),

    // ---- exact substring (span-level) dedup ------------------------------
    // Lee et al. 2022: remove duplicated TOKEN SPANS, not whole docs —
    // the sub-paragraph boilerplate q102's 20-word windows are too coarse
    // for. Corpus plants cross-doc duplicated prefixes: docs 20000+k
    // repeat doc k's first 12 tokens, so every 8-gram inside those
    // prefixes is duplicated and both copies lose exactly tokens 1-12
    // (the planted doc, being nothing but the prefix, empties out).
    // The oracle re-derives the whole span algebra relationally; the
    // result is exact, so sketch-free hash compare applies.
    QuerySpec("q116_substring_dedup", { (s, dir) =>
      val sp = SparkSql
      val docs = Td.load(s, dir, "documents").select("doc_id", "text")
      val planted = docs.where("doc_id < 40").selectExpr(
        "doc_id + 20000 AS doc_id",
        s"${sp.wordSlice(sp.splitSpace("text"), "1", 12)} AS text")
      graft.operators.Dedup
        .dropDuplicateSpans(docs.unionAll(planted), "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      Some(s"""WITH corpus AS (
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 20000,
                        ${d.wordSlice(d.splitSpace("text"), "1", 12)}
                 FROM documents WHERE doc_id < 40),
               toks AS (SELECT doc_id, ${d.splitSpace("coalesce(text, '')")} AS tk FROM corpus),
               gidx AS (SELECT doc_id, tk, unnest(${d.range1(s"${d.len("tk")} - 7")}) AS i FROM toks),
               grams AS (SELECT doc_id, i, ${d.wordSlice("tk", "i", 8)} AS gram FROM gidx),
               dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
               covx AS (SELECT doc_id, unnest(${d.range("i", "i + 7")}) AS p
                        FROM grams JOIN dup USING (gram)),
               cov AS (SELECT DISTINCT doc_id, p FROM covx),
               pidx AS (SELECT doc_id, tk, unnest(${d.range1(d.len("tk"))}) AS p FROM toks),
               pos AS (SELECT doc_id, p, ${d.elem("tk", "p")} AS tok FROM pidx),
               kept AS (SELECT pos.doc_id, pos.p, pos.tok FROM pos
                        WHERE NOT EXISTS (SELECT 1 FROM cov
                          WHERE cov.doc_id = pos.doc_id AND cov.p = pos.p)),
               ka AS (SELECT doc_id, count(*) AS n_kept,
                             string_agg(tok, ' ' ORDER BY p) AS kept_text
                      FROM kept GROUP BY doc_id)
               SELECT t.doc_id,
                      CAST(${d.len("t.tk")} AS BIGINT) AS n_tokens,
                      CAST(${d.len("t.tk")} - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
                      coalesce(ka.kept_text, '') AS kept_text
               FROM toks t LEFT JOIN ka USING (doc_id)
               ORDER BY doc_id""")
    }),

    // ---- FUZZY decontamination: near-dup eval leakage ---------------------
    // q103's exact 13-gram scrub misses paraphrased leakage; this one
    // flags corpus docs whose shingle Jaccard with ANY eval doc >= 0.5.
    // Planted leaks: each eval doc re-enters the corpus (doc_id+40000)
    // truncated by its first two words and decorated with a fresh token —
    // zero exact 13-gram guarantee, high Jaccard. Eval docs themselves
    // live in the corpus too (self-match at 1.0). Oracle re-derives the
    // full cross-corpus band algebra from the q55 signature templates.
    QuerySpec("q120_fuzzy_decontaminate", { (s, dir) =>
      val sp = SparkSql
      val docs = Td.load(s, dir, "documents").select("doc_id", "text")
      val evalD = docs.where("doc_id % 23 = 0")
        .selectExpr("doc_id AS eval_id", "text")
      val planted = docs.where("doc_id % 23 = 0").selectExpr(
        "doc_id + 40000 AS doc_id",
        s"${sp.wordSlice(sp.splitSpace("text"), "3", 1000)} || ' zz' || ${sp.toStr("doc_id")} AS text")
      graft.operators.Decontamination
        .nearDupHits(docs.unionAll(planted), "doc_id", "text",
          evalD, "eval_id", "text", jaccardThreshold = 0.5)
        .orderBy("doc_id")
    }, {
      val d = DuckSql
      def bandsSql(sig: String, id: String) =
        s"""SELECT $id,
                   concat(CAST(t.j AS VARCHAR), ':',
                          CAST(sigs[2*t.j+1] AS VARCHAR), '|',
                          CAST(sigs[2*t.j+2] AS VARCHAR)) AS bucket
            FROM $sig CROSS JOIN generate_series(0, 5) t(j)"""
      Some(s"""WITH corpus AS (
                 SELECT doc_id, text FROM documents
                 UNION ALL
                 SELECT doc_id + 40000,
                        ${d.wordSlice(d.splitSpace("text"), "3", 1000)} || ' zz' || ${d.toStr("doc_id")}
                 FROM documents WHERE doc_id % 23 = 0),
               ev AS (SELECT doc_id AS eval_id, text FROM documents WHERE doc_id % 23 = 0),
               ctk AS (SELECT doc_id, ${shinglesExpr(d)} AS shingles
                       FROM corpus WHERE ${d.len(d.splitSpace("text"))} >= 3),
               csig AS (SELECT doc_id, ${sigsExpr(d)} AS sigs
                        FROM corpus WHERE ${d.len(d.splitSpace("text"))} >= 3),
               etk AS (SELECT eval_id, ${shinglesExpr(d)} AS shingles
                       FROM ev WHERE ${d.len(d.splitSpace("text"))} >= 3),
               esig AS (SELECT eval_id, ${sigsExpr(d)} AS sigs
                        FROM ev WHERE ${d.len(d.splitSpace("text"))} >= 3),
               cbands AS (${bandsSql("csig", "doc_id")}),
               ebands AS (${bandsSql("esig", "eval_id")}),
               cand AS (SELECT DISTINCT c.doc_id, e.eval_id
                        FROM cbands c JOIN ebands e USING (bucket)),
               hits AS (
                 SELECT cand.doc_id, cand.eval_id,
                        round(CAST(${d.interSize("ca.shingles", "ea.shingles")} AS DOUBLE) /
                              CAST(${d.unionSize("ca.shingles", "ea.shingles")} AS DOUBLE), 6) AS jaccard
                 FROM cand
                 JOIN ctk ca ON ca.doc_id = cand.doc_id
                 JOIN etk ea ON ea.eval_id = cand.eval_id
                 WHERE CAST(${d.interSize("ca.shingles", "ea.shingles")} AS DOUBLE) /
                       CAST(${d.unionSize("ca.shingles", "ea.shingles")} AS DOUBLE) >= 0.5)
               SELECT doc_id, count(*) AS n_hits, max(jaccard) AS max_jaccard
               FROM hits GROUP BY doc_id ORDER BY doc_id""")
    })
  )

  /** 32-bit simhash over the `text` column. The token-hash array is
    * lambda-bound (`d.bind`) so the md5-digit parse per token happens
    * once, not once per simhash bit — project-collapse would otherwise
    * inline the array into all 32 bit-votes (measured 30× slowdown). */
  private def simhashBound(d: SqlDialect): String = {
    val hs = d.map(d.splitSpace("text"), "t", d.hex32("t"))
    val bitVote = d.isum(d.map("hs", "h",
      s"CASE WHEN ${d.shiftr("h", "b")} % 2 = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END"))
    d.bind(hs, "hs",
      d.isum(d.map(d.range("0", "31"), "b",
        s"CASE WHEN $bitVote > 0 THEN ${d.shiftl("CAST(1 AS BIGINT)", "b")} ELSE CAST(0 AS BIGINT) END")))
  }
}
