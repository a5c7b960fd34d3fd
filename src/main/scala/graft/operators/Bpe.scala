package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{SparkSql, SqlDialect}

/** Byte-pair-encoding merge TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909) — learns the merge table q101's wordpiece scorer
  * consumes, instead of taking a vocabulary as given.
  *
  * The loop is the repo's deterministic-iteration pattern
  * (LinearClassifier.fitBatchPerceptron, KMeans.fit): per round ONE
  * distributed aggregation over the word table — adjacent-symbol pair
  * counts weighted by word frequency, exact BIGINTs — then a 1-row
  * driver collect of the argmax (count DESC, pair ASC: ties break
  * lexicographically, id-free and partition-free), then the merge is
  * applied as a vocabulary-sized projection. Nothing corpus-sized ever
  * reaches the driver: the corpus collapses to the word-frequency table
  * in one map-side-combined pass, and every round after that is
  * vocab-sized (checkpointed per round, the CC discipline).
  *
  * Merge application is an explicit left-to-right fold over the symbol
  * string (greedy non-overlapping, the reference BPE semantics: in
  * 'a a a' the pair (a,a) merges once) expressed through the dialect so
  * the DuckDB oracle replays the IDENTICAL training loop in chained
  * CTEs (the q113 precedent for cross-engine model-fit reproducibility).
  */
object Bpe {

  private val d = SparkSql

  /** Learned merge: `pair` is the two space-separated symbols merged in
    * `round`, chosen with weighted occurrence count `count`. */
  final case class Merge(round: Int, pair: String, count: Long)

  /** word -> space-separated character symbols: 'key' -> 'k e y'. */
  def charSymsExpr(d: SqlDialect, wCol: String): String =
    d.joinStr(d.splitOn(wCol, ""), " ")

  /** All ADJACENT symbol pairs of a symbol string, each as an 'a b'
    * string — with multiplicity (overlaps included: 'a a a' yields
    * (a,a) twice), the counting side of the reference algorithm. */
  def pairsExpr(d: SqlDialect, symsCol: String): String =
    d.bind(d.splitSpace(symsCol), "sy",
      d.map(d.range1(s"${d.len("sy")} - 1"), "i", d.wordSlice("sy", "i", 2)))

  /** Apply ONE merge (a, b) -> ab to a symbol string, left-to-right
    * non-overlapping: fold the symbols rebuilding the string; when the
    * accumulator ends with symbol `a` (exact-symbol check — the leading
    * space guards against `a` being a suffix of a longer symbol) and the
    * next symbol is `b`, the tail is rewritten to the merged symbol —
    * which is then NOT eligible as the left side of another merge this
    * round, exactly the semantics of the reference implementation's
    * single simultaneous pass. `aSql`/`bSql` are SQL string expressions
    * — on BOTH sides the cross-joined merge relation's columns (the
    * argmax CTE `b$r` in the oracle, the broadcast 1-row pair table on
    * the Spark side), so symbol content never appears in SQL text. */
  def applyMergeExpr(d: SqlDialect, symsCol: String,
      aSql: String, bSql: String): String = {
    val body =
      s"CASE WHEN x = $bSql AND length(acc) > length($aSql) AND " +
        s"substr(acc, length(acc) - length($aSql), length($aSql) + 1) = (' ' || $aSql) " +
        s"THEN substr(acc, 1, length(acc) - length($aSql) - 1) || ' ' || $aSql || $bSql " +
        s"ELSE acc || ' ' || x END"
    s"trim(${d.sfold(d.splitSpace(symsCol), "''", body)})"
  }

  /** Corpus -> (w, freq, syms) word-frequency table: the ONLY
    * corpus-sized pass; everything downstream is vocabulary-sized. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.selectExpr(
        s"explode(${d.splitSpace(s"lower(coalesce($textCol, ''))")}) AS w")
      .where("w <> ''")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .selectExpr("w", "freq", s"${charSymsExpr(d, "w")} AS syms")

  /** Apply one learned merge (a, b) to the word table, carrying the
    * symbols as DATA — a broadcast 1-row relation cross-joined in,
    * mirroring the oracle's `b$r` CTE shape — never as inlined SQL
    * literals. Any charset survives (apostrophes, punctuation,
    * non-ASCII): the symbol text never touches SQL syntax, so nothing
    * in a real corpus can break or smuggle quoting. */
  private def applyMergeAsData(words: DataFrame, a: String, b: String): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words
      .crossJoin(broadcast(Seq((a, b)).toDF("__bpe_a", "__bpe_b")))
      .selectExpr("w", "freq",
        s"${applyMergeExpr(d, "syms", "__bpe_a", "__bpe_b")} AS syms")
  }

  /** Train `rounds` merges. Returns fewer when the corpus runs out of
    * adjacent pairs (every word fully merged). */
  def fitMerges(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"fitMerges: rounds must be >= 1, got $rounds")
    var words = wordTable(docs, textCol).localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = words
        .select(explode(expr(pairsExpr(d, "syms"))).as("pair"), col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pair = best(0).getString(0)
        out += Merge(r, pair, best(0).getLong(1))
        val Array(a, b) = pair.split(" ", 2)
        val next = applyMergeAsData(words, a, b).localCheckpoint(true)
        CheckpointBlocks.release(words) // next is materialized; round r-1 is dead
        words = next
        r += 1
      }
    }
    CheckpointBlocks.release(words) // only the collected merges leave this scope
    out.result()
  }

  /** The shared CTE chain replaying `rounds` training rounds: `w0`/`s0`
    * (word freq + char symbols), then per round `p/c` (pair counts),
    * `b` (LIMIT 1 argmax) and `s` (cross-join merge application);
    * `s<rounds>` holds the final symbolization. */
  private def trainCtes(d: SqlDialect, corpusFrom: String, textCol: String,
      rounds: Int): String = {
    val head =
      s"""w0 AS (
         |  SELECT w, count(*) AS freq FROM (
         |    SELECT unnest(${d.splitSpace(s"lower(coalesce($textCol, ''))")}) AS w
         |    FROM $corpusFrom) u
         |  WHERE w <> '' GROUP BY w),
         |s0 AS (SELECT w, freq, ${charSymsExpr(d, "w")} AS syms FROM w0)""".stripMargin
    val roundsSql = (1 to rounds).map { r =>
      s"""p$r AS (SELECT unnest(${pairsExpr(d, "syms")}) AS pair, freq FROM s${r - 1}),
         |c$r AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p$r GROUP BY pair),
         |b$r AS (SELECT pair, cnt,
         |               ${d.elem(d.splitSpace("pair"), "1")} AS a,
         |               ${d.elem(d.splitSpace("pair"), "2")} AS b
         |        FROM c$r ORDER BY cnt DESC, pair LIMIT 1),
         |s$r AS (SELECT w, freq,
         |               ${applyMergeExpr(d, "syms", s"b$r.a", s"b$r.b")} AS syms
         |        FROM s${r - 1} CROSS JOIN b$r)""".stripMargin
    }
    s"$head,\n${roundsSql.mkString(",\n")}"
  }

  /** The oracle side of [[fitMerges]]: one SQL statement whose chained
    * CTEs replay `rounds` training rounds (pair counts -> LIMIT 1 argmax
    * -> cross-join apply) and emit (round, pair, cnt). `corpusFrom` is
    * the FROM-able relation holding `textCol`. */
  def fitMergesSql(d: SqlDialect, corpusFrom: String, textCol: String,
      rounds: Int): String = {
    require(rounds >= 1)
    val unions = (1 to rounds)
      .map(r => s"SELECT CAST($r AS INTEGER) AS round, pair, cnt FROM b$r")
      .mkString("\n UNION ALL\n ")
    s"WITH ${trainCtes(d, corpusFrom, textCol, rounds)}\n$unions\nORDER BY round"
  }

  /** ENCODE the corpus with a learned merge table (the apply side of
    * BPE): replay the merges over the word-frequency table — still the
    * one corpus-sized pass plus vocab-sized rounds — then join the
    * per-word subword count back to the exploded corpus (vocab-sized
    * build side, AQE-broadcastable) and aggregate per document. Output:
    * (doc_id, n_words, n_subwords, cr_bp) with cr_bp the exact
    * half-up-integer compression ratio in basis points (the bigram-LM
    * integer discipline: no doubles near a hash compare). EVERY input
    * doc_id gets a row — NULL/empty/whitespace-only docs emit
    * (n_words=0, n_subwords=0, cr_bp=NULL) instead of vanishing (the
    * dropDuplicateSpans row-preservation contract): callers joining the
    * result back by doc_id must not lose rows silently. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    var words = wordTable(docs, textCol)
    merges.foreach { m =>
      val Array(a, b) = m.pair.split(" ", 2)
      words = applyMergeAsData(words, a, b)
    }
    val wsub = words.selectExpr("w",
      s"CAST(${d.len(d.splitSpace("syms"))} AS BIGINT) AS n_sub")
    val perDoc = docs.selectExpr(s"$idCol AS doc_id",
        s"explode(${d.splitSpace(s"lower(coalesce($textCol, ''))")}) AS w")
      .where("w <> ''")
      .join(wsub, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
    // cr_bp computed from the PRE-coalesce counts: NULL DIV NULL = NULL
    // for wordless docs, never a division by zero.
    docs.selectExpr(s"$idCol AS doc_id").distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n_words, 0) AS BIGINT) AS n_words",
        "CAST(coalesce(n_subwords, 0) AS BIGINT) AS n_subwords",
        s"${d.idiv("(20000 * n_subwords + n_words)", "(2 * n_words)")} AS cr_bp")
  }

  // ---- byte-level fallback (GPT-2's open-vocabulary rule) ------------------

  /** The byte-token delimiters: U+27E8/U+27E9 (math angle brackets),
    * routed through [[SqlDialect.utf8FromHex]] so no raw multibyte
    * literal rides three quoting layers. A byte token is ONE symbol
    * (`⟨E2⟩`), so a learned merge — which compares WHOLE symbols —
    * can never touch its interior; collision with a trained symbol
    * would need the literal token text as a training word, which the
    * q-entries pin absent (`delims_in_train = 0`). */
  private def tokLo(d: SqlDialect): String = d.utf8FromHex("E29FA8")
  private def tokHi(d: SqlDialect): String = d.utf8FromHex("E29FA9")

  /** A character's UTF-8 bytes as space-separated byte tokens:
    * '⟡' -> '⟨E2⟩ ⟨9F⟩ ⟨A1⟩'. */
  def byteToksExpr(d: SqlDialect, chSql: String): String =
    d.joinStr(d.map(d.range1(d.byteLen(chSql)), "bj",
      s"${tokLo(d)} || substr(${d.hexBytes(chSql)}, bj * 2 - 1, 2) || ${tokHi(d)}"), " ")

  /** Fallback symbolization of a word against the TRAINING charset
    * `csSql` (a single sorted-concat string): known characters stay
    * themselves (mergeable), unknown characters decompose into their
    * byte tokens — every character of every word always encodes, the
    * open-vocabulary guarantee. */
  def charSymsFallbackExpr(d: SqlDialect, wCol: String, csSql: String): String =
    s"trim(${d.joinStr(d.map(d.splitOn(wCol, ""), "ch",
      s"CASE WHEN instr($csSql, ch) > 0 THEN ch ELSE ${byteToksExpr(d, "ch")} END"),
      " ")})"

  /** Train on `trainDocs`, ENCODE `evalDocs` under the learned merges
    * with byte-level fallback — the corpus-transfer case [[encode]]
    * (train == eval) never faces. Output per eval doc:
    * (doc_id, n_words, n_subwords, n_fallback_bytes, n_unk) — n_unk is
    * computed (symbols outside charset ∪ merge-products ∪ byte-token
    * space), and is ZERO by construction: the open-vocabulary claim,
    * data-verified rather than asserted. */
  def encodeFallback(trainDocs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, rounds: Int): DataFrame = {
    val spark = trainDocs.sparkSession
    import spark.implicits._
    val merges = fitMerges(trainDocs, textCol, rounds)
    val trainWords = wordTable(trainDocs, textCol)
    val charset = trainWords
      .selectExpr(s"explode(${d.splitOn("w", "")}) AS c")
      .selectExpr(s"${d.strAggSorted("c")} AS __bpe_cs")
    // the trained vocabulary: training characters plus merge products
    val vocab = trainWords
      .selectExpr(s"explode(${d.splitOn("w", "")}) AS piece").distinct()
      .unionAll(merges.map(m => m.pair.split(" ", 2) match {
        case Array(a, b) => a + b
      }).toDF("piece"))
      .distinct().localCheckpoint(true)
    var words = evalDocs
      .selectExpr(s"explode(${d.splitSpace(s"lower(coalesce($textCol, ''))")}) AS w")
      .where("w <> ''")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(charset))
      .selectExpr("w", "freq",
        s"${charSymsFallbackExpr(d, "w", "__bpe_cs")} AS syms")
    merges.foreach { m =>
      val Array(a, b) = m.pair.split(" ", 2)
      words = applyMergeAsData(words, a, b)
    }
    val lo = tokLo(d)
    val wstat = words.selectExpr("w",
      s"CAST(${d.len(d.splitSpace("syms"))} AS BIGINT) AS n_sub",
      s"CAST(${d.len(d.filterBy(d.splitSpace("syms"), "sy",
        s"substr(sy, 1, 1) = $lo"))} AS BIGINT) AS n_fb")
    val wunk = words
      .selectExpr("w", s"explode(${d.splitSpace("syms")}) AS sy")
      .where(s"substr(sy, 1, 1) <> $lo")
      .join(vocab, col("sy") === col("piece"), "left_anti")
      .groupBy("w").agg(count(lit(1)).as("n_unk"))
    val perDoc = evalDocs.selectExpr(s"$idCol AS doc_id",
        s"explode(${d.splitSpace(s"lower(coalesce($textCol, ''))")}) AS w")
      .where("w <> ''")
      .join(wstat, Seq("w"))
      .join(wunk, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"),
        sum("n_fb").as("n_fallback_bytes"),
        sum(coalesce(col("n_unk"), lit(0L))).as("n_unk"))
    evalDocs.selectExpr(s"$idCol AS doc_id").distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n_words, 0) AS BIGINT) AS n_words",
        "CAST(coalesce(n_subwords, 0) AS BIGINT) AS n_subwords",
        "CAST(coalesce(n_fallback_bytes, 0) AS BIGINT) AS n_fallback_bytes",
        "CAST(coalesce(n_unk, 0) AS BIGINT) AS n_unk")
  }

  /** Oracle side of [[encodeFallback]]: the training CTEs over the
    * TRAIN relation, then the eval corpus re-symbolized with fallback
    * and pushed through the same per-round merge CTEs. */
  def encodeFallbackSql(d: SqlDialect, trainFrom: String, evalFrom: String,
      idCol: String, textCol: String, rounds: Int): String = {
    val lo = tokLo(d)
    val evalRounds = (1 to rounds).map { r =>
      s"""fs$r AS (SELECT w, freq,
         |               ${applyMergeExpr(d, "syms", s"b$r.a", s"b$r.b")} AS syms
         |        FROM fs${r - 1} CROSS JOIN b$r)""".stripMargin
    }.mkString(",\n")
    val mergeVocab = (1 to rounds)
      .map(r => s"SELECT a || b AS piece FROM b$r").mkString("\n UNION \n")
    s"""WITH ${trainCtes(d, trainFrom, textCol, rounds)},
       |chs AS (SELECT ${d.strAggSorted("c")} AS cs FROM (
       |          SELECT DISTINCT ${d.unnest(d.splitOn("w", ""))} AS c FROM w0) tc),
       |fw0 AS (SELECT w, count(*) AS freq FROM (
       |          SELECT ${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w
       |          FROM $evalFrom) u WHERE w <> '' GROUP BY w),
       |fs0 AS (SELECT w, freq,
       |               ${charSymsFallbackExpr(d, "w", "chs.cs")} AS syms
       |        FROM fw0 CROSS JOIN chs),
       |$evalRounds,
       |vocab AS (SELECT DISTINCT ${d.unnest(d.splitOn("w", ""))} AS piece FROM w0
       |          UNION $mergeVocab),
       |wstat AS (SELECT w,
       |                 CAST(${d.len(d.splitSpace("syms"))} AS BIGINT) AS n_sub,
       |                 CAST(${d.len(d.filterBy(d.splitSpace("syms"), "sy",
                             s"substr(sy, 1, 1) = $lo"))} AS BIGINT) AS n_fb
       |          FROM fs$rounds),
       |wunk AS (SELECT w, count(*) AS n_unk FROM (
       |           SELECT w, ${d.unnest(d.splitSpace("syms"))} AS sy FROM fs$rounds) e
       |         WHERE substr(sy, 1, 1) <> $lo
       |           AND sy NOT IN (SELECT piece FROM vocab)
       |         GROUP BY w),
       |docw AS (SELECT $idCol AS doc_id,
       |                ${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w
       |         FROM $evalFrom),
       |j AS (SELECT doc_id, n_sub, n_fb, coalesce(n_unk, 0) AS n_unk
       |      FROM docw JOIN wstat USING (w) LEFT JOIN wunk USING (w)
       |      WHERE docw.w <> ''),
       |agg AS (SELECT doc_id, count(*) AS n_words,
       |               CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       |               CAST(sum(n_fb) AS BIGINT) AS n_fallback_bytes,
       |               CAST(sum(n_unk) AS BIGINT) AS n_unk
       |        FROM j GROUP BY doc_id),
       |ids AS (SELECT DISTINCT $idCol AS doc_id FROM $evalFrom)
       |SELECT ids.doc_id,
       |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |       CAST(coalesce(n_subwords, 0) AS BIGINT) AS n_subwords,
       |       CAST(coalesce(n_fallback_bytes, 0) AS BIGINT) AS n_fallback_bytes,
       |       CAST(coalesce(n_unk, 0) AS BIGINT) AS n_unk
       |FROM ids LEFT JOIN agg USING (doc_id) ORDER BY ids.doc_id""".stripMargin
  }

  /** Oracle side of train-then-[[encode]]: the training CTEs, then the
    * per-document aggregation over the final symbolization. */
  def encodeSql(d: SqlDialect, corpusFrom: String, idCol: String,
      textCol: String, rounds: Int): String =
    s"""WITH ${trainCtes(d, corpusFrom, textCol, rounds)},
       |docw AS (
       |  SELECT $idCol AS doc_id,
       |         unnest(${d.splitSpace(s"lower(coalesce($textCol, ''))")}) AS w
       |  FROM $corpusFrom),
       |j AS (SELECT doc_id,
       |             CAST(${d.len(d.splitSpace("syms"))} AS BIGINT) AS n_sub
       |      FROM docw JOIN s$rounds USING (w) WHERE w <> ''),
       |agg AS (SELECT doc_id, count(*) AS n_words,
       |               CAST(sum(n_sub) AS BIGINT) AS n_subwords
       |        FROM j GROUP BY doc_id),
       |ids AS (SELECT DISTINCT $idCol AS doc_id FROM $corpusFrom)
       |SELECT ids.doc_id,
       |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |       CAST(coalesce(n_subwords, 0) AS BIGINT) AS n_subwords,
       |       ${d.idiv("(20000 * n_subwords + n_words)", "(2 * n_words)")} AS cr_bp
       |FROM ids LEFT JOIN agg USING (doc_id) ORDER BY ids.doc_id""".stripMargin
}
