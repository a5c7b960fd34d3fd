package graft.queries

import org.apache.spark.sql.functions._
import graft.Td

/** Beyond-reference similarity search over `embeddings.embedding`
  * (ARRAY<FLOAT>, 64-dim): brute-force cosine top-k as the exactness
  * baseline, and a random-hyperplane-LSH bucketed variant as the 100 TB
  * scale path.
  *
  * Cosines run through the engine's native `cosine_sim` expression
  * (functions/CosineSimilarity) whose accumulation order matches the
  * DuckDB oracle's sequential fold bit-for-bit; no UDFs anywhere.
  */
object AnnQueries {

  private val K = 5

  /** The operators' embedding-validity guard (Similarity.validEmbExpr),
    * mirrored into every oracle's base CTE so both engines agree on the
    * acceptance set even when the corpus carries NaN/Inf/zero-norm
    * embeddings (on the clean test tables the filter is a no-op). */
  private def vOK(d: SqlDialect): String =
    graft.operators.Similarity.validEmbExpr(d, "embedding")

  val specs: Seq[QuerySpec] = Seq(

    // ---- brute-force cosine top-k ---------------------------------------
    // Scale shape: the query set (5 vectors) is broadcast; the candidate
    // scan is embarrassingly parallel; per-query top-k goes through a
    // rank-window that Spark rewrites to a per-partition group-limit
    // (WindowGroupLimit), so no full sort of the candidate set. At 100 TB
    // the only data movement is the final k rows per query.
    QuerySpec("q59_ann_bruteforce", { (s, dir) =>
      val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
      graft.operators.Similarity.topK(e, e.filter(col("vec_id") < K), K)
        .orderBy("q_id", "rank")
    }, {
      val d = DuckSql
      Some(s"""WITH e AS (
                 SELECT vec_id, embedding,
                        sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm
                 FROM embeddings WHERE ${vOK(d)}),
               q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
                     FROM e WHERE vec_id < $K),
               scored AS (
                 SELECT q.q_id, e.vec_id,
                        ${d.dsum(d.zipMul("q.q_emb", "e.embedding"))} / (q.q_nrm * e.nrm) AS cosine
                 FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
               ranked AS (
                 SELECT q_id, vec_id, cosine,
                        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
               SELECT q_id, vec_id, round(cosine, 6) AS cosine, rank
               FROM ranked WHERE rank <= $K ORDER BY q_id, rank""")
    }),

    // ---- hyperplane-LSH bucketed ANN (the scale path) -------------------
    // 8 pseudo-random hyperplanes with md5-derived weights (deterministic
    // and engine-independent) give every vector an 8-bit bucket; a query
    // probes only its own bucket (candidate set ~ n/256), then ranks by
    // exact cosine. Trades recall for a 256× smaller join — the classic
    // ANN contract; the oracle mirrors the same planes, so both engines
    // agree on buckets exactly.
    QuerySpec("q60_ann_lsh", { (s, dir) =>
      val e = Td.load(s, dir, "embeddings")
        .selectExpr("vec_id", "embedding", s"${bucketExpr(SparkSql)} AS bucket")
      graft.operators.Similarity.bucketedTopK(e, e.filter(col("vec_id") < K), 3)
        .orderBy("q_id", "rank")
    }, {
      val d = DuckSql
      Some(s"""WITH e AS (
                 SELECT vec_id, embedding,
                        sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm,
                        ${bucketExpr(d)} AS bucket
                 FROM embeddings WHERE ${vOK(d)}),
               q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
                            bucket AS q_bucket
                     FROM e WHERE vec_id < $K),
               scored AS (
                 SELECT q.q_id, e.vec_id,
                        ${d.dsum(d.zipMul("q.q_emb", "e.embedding"))} / (q.q_nrm * e.nrm) AS cosine
                 FROM e JOIN q ON e.bucket = q.q_bucket AND e.vec_id <> q.q_id),
               ranked AS (
                 SELECT q_id, vec_id, cosine,
                        CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
                 FROM scored)
               SELECT q_id, vec_id, round(cosine, 6) AS cosine, rank
               FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")
    })
  ) :+ ivfSpec :+ semanticDedupSpec :+ pqSpec :+ graphSpec :+ hybridSpec :+
    pcaSpec :+ hardNegSpec :+ marginSpec

  // ---- margin-based pair mining (LASER/CCMatrix criterion) --------------
  // Ratio margin = cosine over the mean of both endpoints' k-NN cosines
  // (suppresses hubs that fish up spurious pairs under a raw-cosine
  // bar). Everything after the micro-quantization of the cosine is
  // integer, so the oracle replays the identical top-k sums, margin
  // division, and ranking with no float tolerance anywhere.
  private lazy val marginSpec: QuerySpec = QuerySpec("q169_margin_mining", { (s, dir) =>
    val e = Td.load(s, dir, "embeddings")
    graft.operators.Similarity.marginMine(
        e.filter(col("label") === 0), e.filter(col("label") === 1),
        k = 4, thresholdMicro = 1050000L)
      .orderBy("x_id")
  }, {
    val d = DuckSql
    val k = 4
    Some(s"""WITH e AS (
               SELECT vec_id, label, embedding,
                      sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm
               FROM embeddings WHERE ${vOK(d)}),
             x AS (SELECT vec_id AS x_id, embedding AS x_emb, nrm AS x_nrm
                   FROM e WHERE label = 0),
             y AS (SELECT vec_id AS y_id, embedding AS y_emb, nrm AS y_nrm
                   FROM e WHERE label = 1),
             pairs AS (
               SELECT x_id, y_id,
                      CAST(floor(${d.dsum(d.zipMul("x_emb", "y_emb"))} / (x_nrm * y_nrm)
                                 * 1000000 + 0.5) AS BIGINT) AS c_micro
               FROM x CROSS JOIN y),
             fr AS (SELECT x_id, c_micro,
                           row_number() OVER (PARTITION BY x_id
                             ORDER BY c_micro DESC, y_id) AS r FROM pairs),
             sf AS (SELECT x_id, sum(c_micro) AS sf FROM fr WHERE r <= $k GROUP BY x_id),
             br AS (SELECT y_id, c_micro,
                           row_number() OVER (PARTITION BY y_id
                             ORDER BY c_micro DESC, x_id) AS r FROM pairs),
             sb AS (SELECT y_id, sum(c_micro) AS sb FROM br WHERE r <= $k GROUP BY y_id),
             margins AS (
               SELECT p.x_id, p.y_id, p.c_micro,
                      CAST((p.c_micro * ${2 * k} * 1000000) // (sf.sf + sb.sb) AS BIGINT) AS margin_micro
               FROM pairs p JOIN sf ON p.x_id = sf.x_id JOIN sb ON p.y_id = sb.y_id
               WHERE sf.sf + sb.sb > 0),
             best AS (SELECT *, row_number() OVER (PARTITION BY x_id
                        ORDER BY margin_micro DESC, y_id) AS rn FROM margins)
             SELECT x_id, y_id, c_micro, margin_micro
             FROM best WHERE rn = 1 AND margin_micro > 1050000
             ORDER BY x_id""")
  })

  // ---- contrastive hard-negative mining ---------------------------------
  // The DPR/E5/SimCSE training-pair step: per query, top-k most-similar
  // DIFFERENTLY-LABELED vectors (hard because similar, negative because
  // the label differs), with a cosine ceiling dropping near-identical
  // candidates (an unlabeled positive/duplicate, not a useful negative).
  // Same broadcast + group-limit scale shape as q59; the oracle mirrors
  // the label filter and the ceiling on the identical cosine fold, so
  // both engines agree on the candidate band exactly.
  private lazy val hardNegSpec: QuerySpec = QuerySpec("q165_hard_negatives", { (s, dir) =>
    val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding", "label")
    graft.operators.Similarity
      .hardNegatives(e, e.filter(col("vec_id") < K), "label", K, dupCeiling = 0.95)
      .orderBy("q_id", "rank")
  }, {
    val d = DuckSql
    Some(s"""WITH e AS (
               SELECT vec_id, label, embedding,
                      sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm
               FROM embeddings WHERE ${vOK(d)}),
             q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm,
                          label AS q_label
                   FROM e WHERE vec_id < $K),
             scored AS (
               SELECT q.q_id, e.vec_id,
                      ${d.dsum(d.zipMul("q.q_emb", "e.embedding"))} / (q.q_nrm * e.nrm) AS cosine
               FROM e CROSS JOIN q
               WHERE e.vec_id <> q.q_id AND e.label <> q.q_label),
             banded AS (SELECT * FROM scored WHERE cosine < 0.95),
             ranked AS (
               SELECT q_id, vec_id, cosine,
                      CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
               FROM banded)
             SELECT q_id, vec_id, round(cosine, 6) AS cosine, rank
             FROM ranked WHERE rank <= $K ORDER BY q_id, rank""")
  })

  // ---- distributed PCA over the embedding table -------------------------
  // Exact-decimal Gram moments (bit-identical under any partitioning) →
  // driver-local Jacobi eigensolve → expression-only projection. The
  // eigensolve itself is not SQL-expressible, but the model IS a
  // deterministic pure function of the input set — so the DYNAMIC oracle
  // refits it at dump time, embeds mean/components as bit-exact literals
  // (SqlDialect.dblArray), and has DuckDB replay the center-and-project
  // fold through the SAME Pca.projectionSql expression tree Spark runs.
  // Projections are bit-identical cross-engine (sequential dsum fold),
  // so the output is emitted as exact BIGINT micro-units per the
  // column-type policy; PcaSpec keeps the eigensolve honest
  // (planted-axis recovery, orthonormality, partition invariance).
  private def pcMicro(inner: String): String =
    s"CAST(floor(($inner) * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"

  private lazy val pcaSpec: QuerySpec = QuerySpec("q149_pca_embed", { (s, dir) =>
    val emb = Td.load(s, dir, "embeddings")
    val model = graft.operators.Pca.fit(emb, "embedding", k = 4)
    val micros = (0 to 3).map(i => expr(pcMicro(
      graft.operators.Pca.projectionSql(SparkSql, "embedding", model, i)))
      .as(s"pc${i}_micro"))
    emb.select(col("vec_id") +: col("label") +: micros: _*)
      .orderBy("vec_id")
  }, None, Some { (s, dir) =>
    val model = graft.operators.Pca.fit(Td.load(s, dir, "embeddings"), "embedding", k = 4)
    val cols = (0 to 3).map(i => pcMicro(
      graft.operators.Pca.projectionSql(DuckSql, "embedding", model, i)) +
      s" AS pc${i}_micro").mkString(", ")
    s"SELECT vec_id, label, $cols FROM embeddings ORDER BY vec_id"
  })

  /** q140: hybrid lexical+vector retrieval fused by RRF — the modern
    * retrieval default (BM25 keyword arm + embedding-cosine arm, ranks
    * combined by Retrieval.rrfFuse; doc_id ≡ vec_id in the testdata).
    * The oracle re-derives BOTH arms (the q138 BM25 replay; the q59
    * cosine replay) and fuses with a coalesce-chained fixed-order sum —
    * the same left-to-right float addition as the operator's sorted
    * sequential fold, so scores are bit-comparable. */
  private lazy val hybridSpec: QuerySpec = QuerySpec("q140_hybrid_rrf", { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Td.load(s, dir, "documents")
    // Lexical arm: BM25 top-30 with explicit ranks. The unpartitioned
    // window runs over the ALREADY-LIMITED 30-row list, not the corpus.
    val lex = graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("vector", "stream", "merge"), topK = 30)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "rank")
    val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
    val vec = graft.operators.Similarity.topK(e, e.filter(col("vec_id") === 7), 30)
      .select(col("vec_id").as("doc_id"), col("rank"))
    graft.operators.Retrieval.rrfFuse(Seq(lex, vec), "doc_id", "rank", topK = 15)
  }, {
    val d = DuckSql
    val dl = d.len(d.splitSpace("text"))
    Some(s"""WITH st AS (
               SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(avg($dl) AS DOUBLE) AS avgdl
               FROM documents),
             tok AS (
               SELECT doc_id, CAST($dl AS BIGINT) AS dlen,
                      unnest(${d.splitSpace("text")}) AS term
               FROM documents),
             tf AS (
               SELECT doc_id, dlen, term, CAST(count(*) AS BIGINT) AS tf
               FROM tok WHERE term IN ('vector', 'stream', 'merge')
               GROUP BY doc_id, dlen, term),
             dfreq AS (
               SELECT term, CAST(count(*) AS BIGINT) AS df
               FROM tf GROUP BY term),
             contrib AS (
               SELECT tf.doc_id, tf.term,
                      ln((CAST(st.n_docs AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
                      * (CAST(tf.tf AS DOUBLE) * 2.2)
                      / (CAST(tf.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * tf.dlen / st.avgdl)) AS s
               FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN st),
             bm AS (
               SELECT doc_id, round(${d.dsum("list(s ORDER BY term)")}, 6) AS score
               FROM contrib GROUP BY doc_id),
             bmr AS (
               SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r
               FROM bm ORDER BY score DESC, doc_id LIMIT 30),
             e AS (
               SELECT vec_id, embedding,
                      sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm
               FROM embeddings WHERE ${vOK(d)}),
             q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id = 7),
             vs AS (
               SELECT e.vec_id AS doc_id,
                      ${d.dsum(d.zipMul("q.q_emb", "e.embedding"))} / (q.q_nrm * e.nrm) AS cosine
               FROM e CROSS JOIN q WHERE e.vec_id <> 7),
             vr AS (
               SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS r
               FROM vs ORDER BY cosine DESC, doc_id LIMIT 30),
             fused AS (
               SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
                      round(coalesce(CAST(1.0 AS DOUBLE) / (60 + b.r), CAST(0.0 AS DOUBLE))
                            + coalesce(CAST(1.0 AS DOUBLE) / (60 + v.r), CAST(0.0 AS DOUBLE)), 6) AS rrf_score,
                      CAST((CASE WHEN b.r IS NOT NULL THEN 1 ELSE 0 END)
                           + (CASE WHEN v.r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_arms
               FROM bmr b FULL OUTER JOIN vr v ON b.doc_id = v.doc_id)
             SELECT doc_id, rrf_score, n_arms FROM fused
             ORDER BY rrf_score DESC, doc_id LIMIT 15""")
  })

  /** Product-quantization ANN (Similarity.pqTopK) — the memory tier:
    * vectors scan as m=4 one-byte codes (64× compression of the scan
    * working set), queries probe with a broadcast (m × nCodes) LUT, and
    * only the top-20 ADC candidates are re-ranked with exact cosine.
    * Codebook = the 16 lowest-id vectors with vec_id % 29 = 5 (the q71
    * sampled-quantizer discipline — nothing iterative to replay). Both
    * engines fold the same squared-diff kernel sequentially and sum LUT
    * entries as DECIMAL, so the candidate sets match exactly. */
  private lazy val pqSpec: QuerySpec = QuerySpec("q126_ann_pq", { (s, dir) =>
    val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
    graft.operators.Similarity.pqTopK(
      e, e.filter(col("vec_id") < K), "vec_id % 29 = 5",
      m = 4, subDim = 16, nCodes = 16, rerankDepth = 20, k = 3)
      .orderBy("q_id", "rank")
  }, {
    val d = DuckSql
    def sub(a: String, b: String) =
      graft.operators.Similarity.subL2Expr(d, a, b, 16)
    def cos(a: String, b: String) =
      s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE ${vOK(d)}),
             cb AS (SELECT cw_id, cw_emb FROM (
                      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cw_id,
                             embedding AS cw_emb
                      FROM e WHERE vec_id % 29 = 5) WHERE cw_id < 16),
             subs AS (SELECT unnest(generate_series(0, 3)) AS s),
             dists AS (
               SELECT v.vec_id, sub.s, c.cw_id,
                      ${sub("v.embedding", "c.cw_emb")} AS dist
               FROM e v CROSS JOIN subs sub CROSS JOIN cb c),
             codes AS (
               SELECT vec_id, s, cw_id AS code FROM (
                 SELECT vec_id, s, cw_id,
                        row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cw_id) AS rn
                 FROM dists) WHERE rn = 1),
             q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < $K),
             lut AS (
               SELECT q.q_id, sub.s, c.cw_id,
                      CAST(${sub("q.q_emb", "c.cw_emb")} AS DECIMAL(18,6)) AS ldist
               FROM q CROSS JOIN subs sub CROSS JOIN cb c),
             adc AS (
               SELECT l.q_id, c.vec_id, sum(l.ldist) AS adc_dist
               FROM codes c JOIN lut l ON l.s = c.s AND l.cw_id = c.code
               WHERE c.vec_id <> l.q_id GROUP BY 1, 2),
             cands AS (
               SELECT q_id, vec_id FROM (
                 SELECT q_id, vec_id,
                        row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, vec_id) AS arank
                 FROM adc) WHERE arank <= 20),
             scored AS (
               SELECT ca.q_id, ca.vec_id, ${cos("q.q_emb", "v.embedding")} AS cosine
               FROM cands ca JOIN q ON q.q_id = ca.q_id JOIN e v ON v.vec_id = ca.vec_id),
             ranked AS (
               SELECT q_id, vec_id, cosine,
                      CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
               FROM scored)
             SELECT q_id, vec_id, round(cosine, 6) AS cosine, rank
             FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")
  })

  /** Graph ANN (GraphAnn.buildKnnGraph + searchTopK) — the recall tier
    * above IVF: a degree-6 k-NN graph seeded from quantizer cells and
    * refined by one NN-descent round, searched by 2-hop beam expansion
    * (beam 8) from 4 global min-hash entry points. The oracle unrolls
    * the build round and both hops as CTE chains (the BPE-oracle
    * precedent) — cell assignment, within-cell top-M, the
    * reverse/neighbor-of-neighbor candidate union, per-src re-rank,
    * then the walk: frontier → out-edges → never-visited scoring →
    * merge, twice. Both engines replay the exact same graph and walk;
    * any divergence in seeding, tie-breaks, or the anti-join shows as a
    * hash mismatch. */
  private lazy val graphSpec: QuerySpec = QuerySpec("q134_ann_graph", { (s, dir) =>
    val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
    val cents = e.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val g = graft.operators.GraphAnn.buildKnnGraph(e, cents, m = 6, rounds = 1)
    graft.operators.GraphAnn.searchTopK(e, g, e.filter(col("vec_id") < K),
      k = 3, beam = 8, hops = 2, entryCount = 4)
      .orderBy("q_id", "rank")
  }, {
    val d = DuckSql
    def cos(a: String, b: String) =
      s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
    // per-src top-M re-rank of a scored edge relation
    def topM(from: String, m: Int) =
      s"""SELECT src, dst, cosine FROM (
            SELECT src, dst, cosine,
                   row_number() OVER (PARTITION BY src ORDER BY cosine DESC, dst) AS rn
            FROM $from) WHERE rn <= $m"""
    // one search hop: beam over vPrev, expand over g, score fresh, merge
    def hop(vPrev: String, f: String, x: String, n: String, vNext: String) =
      s"""$f AS (SELECT q_id, node FROM (
                   SELECT q_id, node,
                          row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, node) AS rn
                   FROM $vPrev) WHERE rn <= 8),
          $x AS (SELECT DISTINCT f.q_id, g.dst AS node
                 FROM $f f JOIN g1 g ON g.src = f.node),
          $n AS (SELECT x.q_id, x.node, ${cos("q.q_emb", "ev.embedding")} AS cosine
                 FROM $x x JOIN q ON q.q_id = x.q_id JOIN e ev ON ev.vec_id = x.node
                 WHERE NOT EXISTS (SELECT 1 FROM $vPrev v
                                   WHERE v.q_id = x.q_id AND v.node = x.node)),
          $vNext AS (SELECT * FROM $vPrev UNION ALL SELECT * FROM $n)"""
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE ${vOK(d)}),
             cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
                       FROM e WHERE vec_id % 100 = 7),
             casc AS (
               SELECT e.vec_id, e.embedding, c.cent_id,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS rn
               FROM e CROSS JOIN cents c),
             assigned AS (SELECT vec_id, embedding, cent_id AS cell FROM casc WHERE rn = 1),
             sized AS (SELECT a.* FROM assigned a
                       JOIN (SELECT cell, count(*) AS cn FROM assigned GROUP BY 1) s USING (cell)
                       WHERE s.cn <= 4096),
             nb AS (SELECT greatest(1, ${d.idiv("count(*)", "6")}) AS n FROM e),
             rb AS (SELECT vec_id, embedding,
                           ${d.hex32(s"concat('0#', ${d.toStr("vec_id")})")} % (SELECT n FROM nb) AS rb0,
                           ${d.hex32(s"concat('1#', ${d.toStr("vec_id")})")} % (SELECT n FROM nb) AS rb1
                    FROM e),
             rnd AS (
               SELECT DISTINCT src, dst, cosine FROM (
                 SELECT a.vec_id AS src, b.vec_id AS dst,
                        ${cos("a.embedding", "b.embedding")} AS cosine
                 FROM rb a JOIN rb b ON a.rb0 = b.rb0 AND a.vec_id <> b.vec_id
                 UNION ALL
                 SELECT a.vec_id, b.vec_id, ${cos("a.embedding", "b.embedding")}
                 FROM rb a JOIN rb b ON a.rb1 = b.rb1 AND a.vec_id <> b.vec_id)),
             glong AS (${topM("rnd", 2)}),
             seeded AS (
               SELECT DISTINCT src, dst, cosine FROM (
                 SELECT a.vec_id AS src, b.vec_id AS dst,
                        ${cos("a.embedding", "b.embedding")} AS cosine
                 FROM sized a JOIN sized b ON a.cell = b.cell AND a.vec_id <> b.vec_id
                 UNION ALL
                 SELECT src, dst, cosine FROM rnd)),
             g0 AS (SELECT DISTINCT src, dst, cosine FROM (
                      ${topM("seeded", 6)}
                      UNION ALL SELECT src, dst, cosine FROM glong)),
             cand1 AS (
               SELECT DISTINCT src, dst FROM (
                 SELECT src, dst FROM g0
                 UNION ALL SELECT dst, src FROM g0
                 UNION ALL SELECT x.src, y.dst FROM g0 x JOIN g0 y ON x.dst = y.src)
               WHERE src <> dst),
             scored1 AS (
               SELECT c.src, c.dst, ${cos("es.embedding", "ed.embedding")} AS cosine
               FROM cand1 c JOIN e es ON es.vec_id = c.src
                            JOIN e ed ON ed.vec_id = c.dst),
             g1 AS (SELECT DISTINCT src, dst, cosine FROM (
                      ${topM("scored1", 6)}
                      UNION ALL SELECT src, dst, cosine FROM glong)),
             q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM e WHERE vec_id < $K),
             entries AS (SELECT vec_id AS node, embedding FROM (
                           SELECT vec_id, embedding,
                                  ${d.hex32(d.toStr("vec_id"))} AS h
                           FROM e ORDER BY h, vec_id LIMIT 4)),
             v0 AS (SELECT q.q_id, en.node, ${cos("q.q_emb", "en.embedding")} AS cosine
                    FROM q CROSS JOIN entries en),
             ${hop("v0", "f1", "x1", "n1", "v1")},
             ${hop("v1", "f2", "x2", "n2", "v2")},
             ranked AS (
               SELECT q_id, node AS vec_id, cosine,
                      CAST(row_number() OVER (PARTITION BY q_id
                           ORDER BY cosine DESC, node) AS INTEGER) AS rank
               FROM v2 WHERE node <> q_id)
             SELECT q_id, vec_id, round(cosine, 6) AS cosine, rank
             FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")
  })

  /** SemDeDup (Abbas et al. 2023): dedup by MEANING, not wording —
    * cluster embeddings with a coarse quantizer, compare only within a
    * cell, drop all but the min-id member of every near-dup component.
    * The corpus plants exact copies (vec_id+10000 for vec_id<50): a copy
    * shares its original's embedding, hence its cosines, hence its cell
    * (tie-breaks are id-free), so the operator must drop exactly the
    * copies regardless of where the cell boundaries fall.
    *
    * k = ⌈√n⌉ centroids (the paper's order), chosen by hash-rank — the
    * k smallest md5_u32(vec_id) vectors, the same seeding as KMeans.fit
    * (operators/KMeans.scala) so the trained path is a drop-in. One
    * driver-side count() picks k (the J2 two-phase precedent); the seed
    * relation is k rows, so its row_number window is harmless.
    *
    * Scale shape: assignment = broadcast-expand + map-side min_by (no
    * exchange over N×C, see Similarity.assignCells); pair generation =
    * equi-join on cell with the maxCellSize runaway guard; clustering =
    * the checkpointed min-label propagation. Every stage bucket-shaped. */
  private lazy val semanticDedupSpec: QuerySpec = QuerySpec("q108_semantic_dedup", { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // The validity guard is applied BEFORE the count so k (= ⌈√n⌉ over
    // the accepted corpus) matches the oracle's filtered count even on
    // dirty data; semanticDedup re-applies the same filter internally.
    val e = graft.operators.Similarity.validEmbeddings(
      Td.load(s, dir, "embeddings").select("vec_id", "embedding"))
    val corpus = e.unionAll(e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val k = math.ceil(math.sqrt(corpus.count().toDouble)).toInt
    val seeds = corpus
      .selectExpr("vec_id", "embedding", "md5_u32(CAST(vec_id AS STRING)) AS h")
      .orderBy("h", "vec_id").limit(k)
      .withColumn("cent_id",
        (row_number().over(Window.orderBy("h", "vec_id")) - 1).cast("long"))
      .select(col("cent_id"), col("embedding").as("cent_emb"))
    graft.operators.Similarity.semanticDedup(corpus, seeds, minCosine = 0.98)
      .orderBy("vec_id")
  }, {
    val d = DuckSql
    Some(s"""WITH RECURSIVE corpus AS (
               SELECT vec_id, embedding FROM embeddings WHERE ${vOK(d)}
               UNION ALL
               SELECT vec_id + 10000, embedding FROM embeddings
               WHERE vec_id < 50 AND ${vOK(d)}),
             hashed AS (
               SELECT vec_id, embedding,
                      ${d.hex32(d.toStr("vec_id"))} AS h FROM corpus),
             seeds AS (
               SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS BIGINT) AS cent_id,
                      embedding AS cent,
                      sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS cnrm
               FROM hashed ORDER BY h, vec_id
               LIMIT (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM corpus)),
             e AS (
               SELECT vec_id, embedding,
                      sqrt(${d.dsum(d.zipMul("embedding", "embedding"))}) AS nrm
               FROM corpus),
             scored AS (
               SELECT e.vec_id, e.embedding, e.nrm, s.cent_id,
                      ${d.dsum(d.zipMul("e.embedding", "s.cent"))} / (e.nrm * s.cnrm) AS c_cos
               FROM e CROSS JOIN seeds s),
             assigned AS (
               SELECT vec_id, embedding, nrm, cent_id AS cell
               FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY c_cos DESC, cent_id) AS rn FROM scored)
               WHERE rn = 1),
             sized AS (
               SELECT a.* FROM assigned a
               JOIN (SELECT cell, count(*) AS cn FROM assigned GROUP BY 1) c USING (cell)
               WHERE c.cn <= 4096),
             pairs AS (
               SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
               FROM sized a JOIN sized b ON a.cell = b.cell AND a.vec_id < b.vec_id
               WHERE round(${d.dsum(d.zipMul("a.embedding", "b.embedding"))} / (a.nrm * b.nrm), 6) >= 0.98),
             und AS (SELECT vec_a AS u, vec_b AS v FROM pairs
                     UNION SELECT vec_b, vec_a FROM pairs),
             reach(u, v) AS (
               SELECT u, u FROM und
               UNION
               SELECT r.u, e2.v FROM reach r JOIN und e2 ON r.v = e2.u),
             labels AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
             SELECT a.vec_id, a.cell FROM assigned a
             LEFT JOIN labels l ON a.vec_id = l.vec_id
             WHERE l.vec_id IS NULL OR l.cluster_id = a.vec_id
             ORDER BY a.vec_id""")
  })

  /** IVF (inverted-file) ANN — the clustered alternative to q60's
    * hyperplane LSH. Coarse quantizer = 1-in-100 deterministic sample of
    * the corpus itself (vec_id % 100 == 7), broadcast everywhere; every
    * vector is assigned to its max-cosine centroid (map-side-combinable
    * min_by argmax, same tie-break discipline as q59 — see
    * Similarity.ivfTopK's scale note); queries probe their nprobe=2
    * closest centroids' posting lists only. Scale: the assignment pass is
    * a broadcast-join scan whose aggregate collapses map-side (no
    * exchange carries more than |vectors| rows); the probe join is an
    * equi-join on centroid id over ~2/C of the data. */
  private lazy val ivfSpec: QuerySpec = QuerySpec("q71_ann_ivf", { (s, dir) =>
    val e = Td.load(s, dir, "embeddings").select("vec_id", "embedding")
    graft.operators.Similarity.ivfTopK(
      e, e.filter(col("vec_id") % 100 === 7), s"vec_id < $K", k = 3, nprobe = 2)
      .orderBy("q_id", "rank")
  }, {
    val d = DuckSql
    def cos(a: String, b: String) =
      s"${d.dsum(d.zipMul(a, b))} / (sqrt(${d.dsum(d.zipMul(a, a))}) * sqrt(${d.dsum(d.zipMul(b, b))}))"
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE ${vOK(d)}),
             cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
                       FROM e WHERE vec_id % 100 = 7),
             ranked AS (
               SELECT e.vec_id, e.embedding, c.cent_id,
                      CAST(row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY ${cos("e.embedding", "c.cent_emb")} DESC, c.cent_id) AS INTEGER) AS c_rank
               FROM e CROSS JOIN cents c),
             assigned AS (SELECT vec_id, embedding, cent_id FROM ranked WHERE c_rank = 1),
             probes AS (SELECT vec_id AS q_id, embedding AS q_emb, cent_id
                        FROM ranked WHERE c_rank <= 2 AND vec_id < $K),
             scored AS (
               SELECT p.q_id, a.vec_id,
                      ${cos("p.q_emb", "a.embedding")} AS cosine
               FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
               WHERE a.vec_id <> p.q_id),
             rk AS (SELECT q_id, vec_id, cosine,
                           CAST(row_number() OVER (PARTITION BY q_id
                                ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
                    FROM scored)
             SELECT q_id, vec_id, round(cosine, 6) AS cosine, rank
             FROM rk WHERE rank <= 3 ORDER BY q_id, rank""")
  })

  /** 8-bit hyperplane bucket: bit p = sign of <e, w_p>, where
    * w_p[i] = hex32(md5("w{p}#{i}")) % 2001 - 1000 — deterministic,
    * engine-independent pseudo-random planes (no RNG, no engine-native
    * hash).
    *
    * On the Spark side the 8×64 weights are precomputed HERE (same md5
    * arithmetic via java MessageDigest) and embedded as constant-folded
    * literal arrays — zero per-row hash work; the scan side of the plan
    * is 8 dot products against constants. The oracle recomputes the same
    * weights in SQL (cheap once-per-row there is unavoidable but the
    * oracle only runs at sf0.01). */
  private lazy val planes: Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    (0 to 7).map(p => (1 to 64).map(i => hex32(s"w$p#$i") % 2001 - 1000: Long))
  }

  private def bucketExpr(d: SqlDialect): String = d match {
    case SparkSql =>
      val dots = planes.map { w =>
        val lit = w.map(v => s"CAST($v AS DOUBLE)").mkString("array(", ", ", ")")
        d.dsum(d.zipMul("embedding", lit))
      }
      d.isum(s"array(${dots.zipWithIndex.map { case (dot, p) =>
        s"CASE WHEN $dot > 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
      }.mkString(", ")})")
    case DuckSql =>
      val w = d.hex32(s"concat('w', ${d.toStr("p")}, '#', ${d.toStr("i")})") + " % 2001 - 1000"
      val dot = d.dsum(d.map(d.range("1", "64"), "i",
        s"CAST(${d.elem("embedding", "i")} AS DOUBLE) * CAST($w AS DOUBLE)"))
      d.isum(d.map(d.range("0", "7"), "p",
        s"CASE WHEN $dot > 0 THEN ${d.shiftl("CAST(1 AS BIGINT)", "p")} ELSE CAST(0 AS BIGINT) END"))
  }
}
