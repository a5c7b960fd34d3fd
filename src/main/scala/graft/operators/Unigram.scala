package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.{SparkSql, SqlDialect}

/** Unigram-LM tokenizer TRAINING (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece trainer behind the Llama/T5 tokenizer family),
  * re-expressed on the repo's integer-exact iteration discipline so a
  * DuckDB oracle replays the IDENTICAL training loop in chained CTEs
  * (the [[Bpe]] precedent):
  *
  *  - SEED: all substrings up to [[UnigramParams.maxPiece]] chars of
  *    the (lowercased, whitespace-split, length-capped) word table,
  *    weighted by word frequency; top `seedK` by (count DESC, piece)
  *    plus ALL single characters (never pruned — coverage).
  *  - E STEP (hard Viterbi): each word takes its best segmentation
  *    under the current vocabulary by the integer objective
  *    (fewest pieces, then highest total piece count, then lexicograp-
  *    hically smallest path) — a bounded DP over word positions,
  *    unrolled to `maxWordLen` stages so it is pure non-recursive SQL.
  *    Real SentencePiece maximizes Σ log p(piece); with hard counts
  *    the fewest-pieces-then-highest-counts order is its integer-exact
  *    analog (log p is monotone in count at fixed piece number), and
  *    every tie-break is total — no floats anywhere near the hash.
  *  - M STEP + PRUNE: piece counts re-estimated from the chosen
  *    segmentations; the vocabulary keeps the top `keep_r` (a 3/4
  *    geometric schedule, SentencePiece's shrinking factor) plus the
  *    character floor; `rounds` EM rounds.
  *
  * The Spark side runs the loop as ITERATIVE DataFrame stages, each
  * DP position checkpointed ([[Bpe]]'s discipline — a stage references
  * its three predecessors, so an un-materialized lineage re-expands as
  * a 3^positions tree in every consumer); the DuckDB oracle replays
  * the identical loop from the [[trainCtes]] chained-CTE generator,
  * and the correctness gate hash-compares the two. Scale shape: the
  * corpus collapses to the word table in one pass; every DP stage is
  * O(words × maxPiece) rows joined against a vocabulary small enough
  * to broadcast; the global windows rank VOCAB-sized relations only
  * (documented single-partition, like every trainer argmax here). */
object Unigram {

  final case class UnigramParams(rounds: Int = 2, seedK: Int = 96,
      maxWordLen: Int = 10, maxPiece: Int = 3) {
    require(rounds >= 1 && seedK >= 4 && maxWordLen >= 2 && maxPiece >= 2)
    /** The shrinking vocabulary budget per round (3/4 schedule). */
    def keepK(r: Int): Int = {
      var k = seedK
      (1 to r).foreach(_ => k = math.max(4, (k * 3) / 4))
      k
    }
  }

  /** The full training replay: chained CTEs from the corpus relation to
    * the final vocabulary `v<rounds>` (piece, cnt). `corpusFrom` must
    * be FROM-able and expose `textCol`. */
  def trainCtes(d: SqlDialect, corpusFrom: String, textCol: String,
      p: UnigramParams): String = {
    val sb = new StringBuilder
    // the ONLY corpus-sized pass: lowercased whitespace words, capped
    // to maxWordLen (longer words fall back to char-level at encode)
    sb ++=
      s"""w0 AS ${d.ctem}(
         |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT ${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w
         |    FROM $corpusFrom) u
         |  WHERE w <> '' AND length(w) <= ${p.maxWordLen} GROUP BY w)""".stripMargin
    // seed candidates: every substring of length 1..maxPiece, weighted
    val subCtes = (1 to p.maxPiece).map { pl =>
      s"""sub$pl AS ${d.ctem}(
         |  SELECT piece, freq FROM (
         |    SELECT ${d.unnest(d.map(d.range1(s"length(w) - ${pl - 1}"), "i",
        s"substr(w, i, $pl)"))} AS piece, freq
         |    FROM w0 WHERE length(w) >= $pl) q)""".stripMargin
    }
    sb ++= ",\n" + subCtes.mkString(",\n")
    sb ++=
      s""",
         |seedc AS ${d.ctem}(SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
         |          FROM (${(1 to p.maxPiece).map(pl => s"SELECT * FROM sub$pl")
        .mkString(" UNION ALL ")}) a
         |          GROUP BY piece),
         |seedr AS ${d.ctem}(SELECT piece, cnt,
         |                 row_number() OVER (ORDER BY cnt DESC, piece) AS rn
         |          FROM seedc),
         |v0 AS ${d.ctem}(SELECT piece, cnt FROM seedr WHERE rn <= ${p.seedK}
         |       UNION
         |       SELECT piece, cnt FROM seedr WHERE length(piece) = 1)""".stripMargin
    // EM rounds: DP segmentation against v{r-1}, usage counts, prune
    (1 to p.rounds).foreach { r =>
      sb ++=
        s""",
           |d${r}_0 AS ${d.ctem}(SELECT w, freq, 0 AS pos, 0 AS np,
           |                   CAST(0 AS BIGINT) AS sc, '' AS path FROM w0)""".stripMargin
      (1 to p.maxWordLen).foreach { i =>
        val cands = (1 to math.min(p.maxPiece, i)).map { pl =>
          val j = i - pl
          s"""SELECT dd.w, dd.freq, $i AS pos, dd.np + 1 AS np,
             |       dd.sc + v.cnt AS sc, dd.path || ' ' || v.piece AS path
             |FROM d${r}_$j dd JOIN v${r - 1} v
             |  ON substr(dd.w, ${j + 1}, $pl) = v.piece
             |WHERE length(dd.w) >= $i""".stripMargin
        }
        sb ++=
          s""",
             |d${r}_$i AS ${d.ctem}(
             |  SELECT w, freq, pos, np, sc, path FROM (
             |    SELECT *, row_number() OVER (PARTITION BY w
             |                 ORDER BY np, sc DESC, path) AS rn
             |    FROM (${cands.mkString("\nUNION ALL\n")}) c) q
             |  WHERE rn = 1)""".stripMargin
      }
      val segUnion = (1 to p.maxWordLen)
        .map(i => s"SELECT w, freq, path FROM d${r}_$i WHERE length(w) = $i")
        .mkString("\nUNION ALL\n")
      sb ++=
        s""",
           |seg$r AS ${d.ctem}($segUnion),
           |u$r AS ${d.ctem}(SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
           |          SELECT ${d.unnest(d.splitSpace("trim(path)"))} AS piece, freq
           |          FROM seg$r) e
           |        GROUP BY piece),
           |uv$r AS ${d.ctem}(SELECT v.piece, CAST(coalesce(u.cnt, 0) AS BIGINT) AS cnt
           |         FROM v${r - 1} v LEFT JOIN u$r u ON v.piece = u.piece),
           |rk$r AS ${d.ctem}(SELECT piece, cnt,
           |                row_number() OVER (ORDER BY cnt DESC, piece) AS rn
           |         FROM uv$r),
           |v$r AS ${d.ctem}(SELECT piece, cnt FROM rk$r WHERE rn <= ${p.keepK(r)}
           |        UNION
           |        SELECT piece, cnt FROM rk$r WHERE length(piece) = 1)""".stripMargin
    }
    sb.toString
  }

  /** Final vocabulary, top `topN` by (cnt DESC, piece) — the total
    * order the hash compare needs. */
  def trainSql(d: SqlDialect, corpusFrom: String, textCol: String,
      p: UnigramParams, topN: Int): String =
    s"""WITH ${trainCtes(d, corpusFrom, textCol, p)}
       |SELECT piece, cnt FROM v${p.rounds}
       |ORDER BY cnt DESC, piece LIMIT $topN""".stripMargin

  // ---- Spark side: the iterative mirror --------------------------------

  private val d = SparkSql

  private def wordTable(docs: DataFrame, textCol: String,
      p: UnigramParams): DataFrame =
    docs.selectExpr(
        s"${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w")
      .where(s"w <> '' AND length(w) <= ${p.maxWordLen}")
      .groupBy("w").agg(count(lit(1)).cast("long").as("freq"))

  private def seedVocab(words: DataFrame, p: UnigramParams): DataFrame = {
    val subs = (1 to p.maxPiece).map { pl =>
      words.where(s"length(w) >= $pl")
        .selectExpr(s"${d.unnest(d.map(d.range1(s"length(w) - ${pl - 1}"),
          "i", s"substr(w, i, $pl)"))} AS piece", "freq")
    }.reduce(_.unionAll(_))
    val ranked = subs.groupBy("piece").agg(sum("freq").cast("long").as("cnt"))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("cnt").desc, col("piece"))))
    ranked.where(s"rn <= ${p.seedK}").select("piece", "cnt")
      .union(ranked.where("length(piece) = 1").select("piece", "cnt"))
      .distinct()
  }

  /** Hard-Viterbi segmentation of every word under `vocab`: DP over
    * positions, one checkpointed stage per position. Returns
    * (w, freq, path). */
  private def segment(words: DataFrame, vocab: DataFrame,
      p: UnigramParams): DataFrame = {
    val v = broadcast(vocab)
    val dps = scala.collection.mutable.ArrayBuffer[DataFrame]()
    dps += words.selectExpr("w", "freq", "0 AS pos", "0 AS np",
      "CAST(0 AS BIGINT) AS sc", "'' AS path").localCheckpoint(true)
    (1 to p.maxWordLen).foreach { i =>
      val cands = (1 to math.min(p.maxPiece, i)).map { pl =>
        val j = i - pl
        dps(j).where(s"length(w) >= $i").as("dd")
          .join(v.as("v"), expr(s"substr(dd.w, ${j + 1}, $pl) = v.piece"))
          .selectExpr("dd.w AS w", "dd.freq AS freq", s"$i AS pos",
            "dd.np + 1 AS np", "dd.sc + v.cnt AS sc",
            "dd.path || ' ' || v.piece AS path")
      }.reduce(_.unionAll(_))
      dps += cands.withColumn("rn", row_number().over(
          Window.partitionBy("w")
            .orderBy(col("np"), col("sc").desc, col("path"))))
        .where("rn = 1").drop("rn").localCheckpoint(true)
    }
    val seg = (1 to p.maxWordLen).map(i =>
        dps(i).where(s"length(w) = $i").select("w", "freq", "path"))
      .reduce(_.unionAll(_)).localCheckpoint(true)
    dps.foreach(CheckpointBlocks.release)
    seg
  }

  /** The trained vocabulary and the LAST round's segmentation (what
    * [[encodeSql]]'s `seg<rounds>` is) as checkpointed frames; the
    * caller must release both. */
  private def fitInternal(docs: DataFrame, textCol: String,
      p: UnigramParams): (DataFrame, DataFrame) = {
    val words = wordTable(docs, textCol, p).localCheckpoint(true)
    var vocab = seedVocab(words, p).localCheckpoint(true)
    var lastSeg: DataFrame = null
    (1 to p.rounds).foreach { r =>
      val seg = segment(words, vocab, p)
      val usage = seg.selectExpr(
          s"${d.unnest(d.splitSpace("trim(path)"))} AS piece", "freq")
        .groupBy("piece").agg(sum("freq").cast("long").as("cnt"))
      val ranked = vocab.select("piece")
        .join(usage, Seq("piece"), "left")
        .selectExpr("piece", "CAST(coalesce(cnt, 0) AS BIGINT) AS cnt")
        .withColumn("rn",
          row_number().over(Window.orderBy(col("cnt").desc, col("piece"))))
      val next = ranked.where(s"rn <= ${p.keepK(r)}").select("piece", "cnt")
        .union(ranked.where("length(piece) = 1").select("piece", "cnt"))
        .distinct().localCheckpoint(true)
      CheckpointBlocks.release(vocab)
      if (lastSeg != null) CheckpointBlocks.release(lastSeg)
      lastSeg = seg
      vocab = next
    }
    CheckpointBlocks.release(words)
    (vocab, lastSeg)
  }

  /** Train on Spark: final vocabulary, top `topN` by (cnt DESC, piece)
    * — collected (it is topN rows) so every training block releases. */
  def fit(docs: DataFrame, textCol: String, p: UnigramParams,
      topN: Int): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    val (vocab, seg) = fitInternal(docs, textCol, p)
    val rows = vocab.orderBy(col("cnt").desc, col("piece"))
      .limit(topN).collect().toSeq
    CheckpointBlocks.release(vocab)
    CheckpointBlocks.release(seg)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType))))
  }

  /** ENCODE: per-document piece counts under the trained vocabulary —
    * the word table re-segments through the same DP and each document
    * aggregates its words' piece counts (words over maxWordLen fall
    * back to one piece per character: the coverage rule). Output
    * (doc_id, n_words, n_pieces), every input id preserved. */
  def encodeSql(d: SqlDialect, corpusFrom: String, idCol: String,
      textCol: String, p: UnigramParams): String =
    s"""WITH ${trainCtes(d, corpusFrom, textCol, p)},
       |wp AS ${d.ctem}(SELECT w, CAST(${d.len(d.splitSpace("trim(path)"))} AS BIGINT) AS np
       |       FROM seg${p.rounds}),
       |docw AS ${d.ctem}(
       |  SELECT $idCol AS doc_id,
       |         ${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w
       |  FROM $corpusFrom),
       |j AS ${d.ctem}(SELECT doc_id,
       |             CAST(coalesce(wp.np, length(dw.w)) AS BIGINT) AS np
       |      FROM docw dw LEFT JOIN wp ON dw.w = wp.w WHERE dw.w <> ''),
       |agg AS ${d.ctem}(SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |               CAST(sum(np) AS BIGINT) AS n_pieces
       |        FROM j GROUP BY doc_id),
       |ids AS ${d.ctem}(SELECT DISTINCT $idCol AS doc_id FROM $corpusFrom)
       |SELECT ids.doc_id,
       |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |       CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces
       |FROM ids LEFT JOIN agg ON ids.doc_id = agg.doc_id
       |ORDER BY ids.doc_id""".stripMargin

  // ---- byte-level fallback (SentencePiece's byte_fallback=true) -----------

  /** Character-walk piece count with BYTE fallback against the
    * training charset `csSql`: a known character is one piece (the
    * char floor is never pruned), an unknown character counts its
    * UTF-8 byte length (one byte token per byte) — no character of any
    * corpus is ever OOV, SentencePiece's byte_fallback rule on the
    * integer-exact discipline. */
  private def fallbackNpExpr(dd: SqlDialect, wCol: String, csSql: String): String =
    dd.isum(dd.map(dd.splitOn(wCol, ""), "ch",
      s"CASE WHEN instr($csSql, ch) > 0 THEN 1 ELSE ${dd.byteLen("ch")} END"))

  /** Fallback BYTES used by a word (0 when every char is known). */
  private def fallbackFbExpr(dd: SqlDialect, wCol: String, csSql: String): String =
    dd.isum(dd.map(dd.splitOn(wCol, ""), "ch",
      s"CASE WHEN instr($csSql, ch) > 0 THEN 0 ELSE ${dd.byteLen("ch")} END"))

  /** Train on `trainDocs`, ENCODE `evalDocs` with byte fallback: words
    * the training table segmented take their DP piece count; unseen or
    * overlong words char-walk, with unknown characters decomposing to
    * byte tokens. Output (doc_id, n_words, n_pieces,
    * n_fallback_bytes) — zero-UNK by construction. */
  def encodeFallback(trainDocs: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String, p: UnigramParams): DataFrame = {
    val spark = trainDocs.sparkSession
    import spark.implicits._
    val (vocab, seg) = fitInternal(trainDocs, textCol, p)
    val wp = seg.selectExpr("w",
      s"CAST(${d.len(d.splitSpace("trim(path)"))} AS BIGINT) AS np")
    val charset = wordTable(trainDocs, textCol, p)
      .selectExpr(s"explode(${d.splitOn("w", "")}) AS c")
      .selectExpr(s"${d.strAggSorted("c")} AS __ug_cs")
    val docw = evalDocs.selectExpr(s"$idCol AS doc_id",
        s"${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w")
      .where("w <> ''")
    val agg = docw.join(wp, Seq("w"), "left")
      .crossJoin(broadcast(charset))
      .selectExpr("doc_id",
        s"CAST(coalesce(np, ${fallbackNpExpr(d, "w", "__ug_cs")}) AS BIGINT) AS np",
        s"CAST(CASE WHEN np IS NULL THEN ${fallbackFbExpr(d, "w", "__ug_cs")} " +
          "ELSE 0 END AS BIGINT) AS fb")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("np").cast("long").as("n_pieces"),
        sum("fb").cast("long").as("n_fallback_bytes"))
    val out = evalDocs.selectExpr(s"$idCol AS doc_id").distinct()
      .join(agg, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n_words, 0) AS BIGINT) AS n_words",
        "CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces",
        "CAST(coalesce(n_fallback_bytes, 0) AS BIGINT) AS n_fallback_bytes")
      .orderBy("doc_id")
      .localCheckpoint(true)
    CheckpointBlocks.release(vocab)
    CheckpointBlocks.release(seg)
    out
  }

  /** Oracle side of [[encodeFallback]]: the training CTEs over the
    * TRAIN relation, charset from its word table, eval words joined
    * against the segmentation with the byte-fallback char-walk. */
  def encodeFallbackSql(dd: SqlDialect, trainFrom: String, evalFrom: String,
      idCol: String, textCol: String, p: UnigramParams): String =
    s"""WITH ${trainCtes(dd, trainFrom, textCol, p)},
       |wp AS ${dd.ctem}(SELECT w, CAST(${dd.len(dd.splitSpace("trim(path)"))} AS BIGINT) AS np
       |       FROM seg${p.rounds}),
       |chs AS ${dd.ctem}(SELECT ${dd.strAggSorted("c")} AS cs FROM (
       |         SELECT DISTINCT ${dd.unnest(dd.splitOn("w", ""))} AS c FROM w0) tc),
       |docw AS ${dd.ctem}(
       |  SELECT $idCol AS doc_id,
       |         ${dd.unnest(dd.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w
       |  FROM $evalFrom),
       |j AS ${dd.ctem}(SELECT doc_id,
       |             CAST(coalesce(wp.np,
       |                  ${fallbackNpExpr(dd, "dw.w", "chs.cs")}) AS BIGINT) AS np,
       |             CAST(CASE WHEN wp.np IS NULL
       |                  THEN ${fallbackFbExpr(dd, "dw.w", "chs.cs")}
       |                  ELSE 0 END AS BIGINT) AS fb
       |      FROM docw dw LEFT JOIN wp ON dw.w = wp.w CROSS JOIN chs
       |      WHERE dw.w <> ''),
       |agg AS ${dd.ctem}(SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |               CAST(sum(np) AS BIGINT) AS n_pieces,
       |               CAST(sum(fb) AS BIGINT) AS n_fallback_bytes
       |        FROM j GROUP BY doc_id),
       |ids AS ${dd.ctem}(SELECT DISTINCT $idCol AS doc_id FROM $evalFrom)
       |SELECT ids.doc_id,
       |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |       CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces,
       |       CAST(coalesce(n_fallback_bytes, 0) AS BIGINT) AS n_fallback_bytes
       |FROM ids LEFT JOIN agg ON ids.doc_id = agg.doc_id
       |ORDER BY ids.doc_id""".stripMargin

  /** Encode on Spark: the iterative mirror of [[encodeSql]] — words
    * over `maxWordLen` fall back to one piece per character. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      p: UnigramParams): DataFrame = {
    val (vocab, seg) = fitInternal(docs, textCol, p)
    val wp = seg.selectExpr("w",
      s"CAST(${d.len(d.splitSpace("trim(path)"))} AS BIGINT) AS np")
    val docw = docs.selectExpr(s"$idCol AS doc_id",
        s"${d.unnest(d.splitSpace(s"lower(coalesce($textCol, ''))"))} AS w")
      .where("w <> ''")
    val agg = docw.join(wp, Seq("w"), "left")
      .selectExpr("doc_id", "CAST(coalesce(np, length(w)) AS BIGINT) AS np")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("np").cast("long").as("n_pieces"))
    val out = docs.selectExpr(s"$idCol AS doc_id").distinct()
      .join(agg, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "CAST(coalesce(n_words, 0) AS BIGINT) AS n_words",
        "CAST(coalesce(n_pieces, 0) AS BIGINT) AS n_pieces")
      .orderBy("doc_id")
      .localCheckpoint(true)
    CheckpointBlocks.release(vocab)
    CheckpointBlocks.release(seg)
    out
  }
}
