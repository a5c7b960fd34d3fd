package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TxLog
import graft.sources.TxLog.{WhenMatchedDelete, WhenMatchedUpdate, WhenNotMatchedInsert}

/** INCREMENTAL product-quantization code maintenance — [[IvfIndex]]'s
  * sibling for the PQ tier (Jégou et al. 2011): the code table (each
  * vector's `m` small codes, the 64× compressed representation a
  * 100 TB corpus scans instead of raw floats) is a TxLog table keyed by
  * the source's tracked row id, maintained from the change feed.
  *
  * PQ codes are PURE per-row functions of a FROZEN codebook, which
  * makes incremental maintenance exact by construction: only the
  * window's change delta is ever encoded (cost ∝ batch — a rebuild
  * re-pays |corpus| × m × nCodes distance kernels per ingest window),
  * deletes drop by key, and a layout-only window costs zero reads
  * ([[TxLog.hasRowChanges]]). Codes are stored PACKED — one row per
  * vector, `codes[s]` = the subspace-s codeword — so the posting table
  * is m ints per vector and the ADC scan explodes them back to
  * (s, code) pairs at query time. Re-training the codebook is a
  * rebuild, not maintenance, exactly as with [[IvfIndex]]'s quantizer.
  *
  * Encoding reuses [[Similarity.subL2Expr]]'s exact distance kernel and
  * the min_by-over-(dist, cw_id) tie-break, so maintained codes are
  * BIT-IDENTICAL to a fresh [[Similarity.pqEncode]] of the live corpus
  * ([[recompute]] pins it). Rows whose embedding fails
  * [[Similarity.validEmbExpr]] are out of the table (MV predicate
  * semantics, NULL coalesced to false — the IvfIndex rule). */
object PqIndex {

  final case class MaintainResult(srcVersion: Long, rowsApplied: Long,
      layoutOnlySkip: Boolean)

  /** Drift accumulator property keys — the [[IvfIndex.Drift]] pattern
    * on the PQ tier's quality measure (total quantization distance in
    * integer micro-units; HIGHER is worse, unlike the IVF cosine). */
  object Drift {
    val Base = "graft.pq.drift.base"
    val Last = "graft.pq.drift.last"
    val Cum = "graft.pq.drift.cum"
  }

  /** [[driftReport]]'s verdict: average quantization distance
    * (micro-units) of the baseline corpus vs the maintained flow, the
    * degradation (flow − base), the flow size, and the band verdict. */
  final case class DriftReport(baseAvgUnits: Long, flowAvgUnits: Long,
      driftUnits: Long, flowN: Long, tripped: Boolean)

  private def validPred = coalesce(expr(
    Similarity.validEmbExpr(graft.queries.SparkSql, "embedding")), lit(false))

  /** Encode `rows` (idCol, vec_id, embedding) to packed codes: per
    * (row, subspace) argmin over the broadcast codebook collapses
    * map-side; a second vocab-free per-row fold packs the m codes in
    * subspace order. No exchange carries more than |rows|·m short
    * rows; at maintenance time |rows| is the change delta. */
  private def encodePacked(rows: DataFrame, codebook: DataFrame, m: Int,
      subDim: Int, idCol: String): DataFrame = {
    val d = graft.queries.SparkSql
    rows
      .select(col(idCol), col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .crossJoin(broadcast(codebook))
      .selectExpr(idCol, "vec_id", "s", "cw_id",
        s"${Similarity.subL2Expr(d, "embedding", "cw_emb", subDim)} AS dist")
      .groupBy(col(idCol), col("s"))
      .agg(first(col("vec_id")).as("vec_id"),
        min_by(col("cw_id"), struct(col("dist"), col("cw_id"))).as("code"),
        // per-subspace best distance lands as DECIMAL(18,6) (the
        // module's own ADC discipline — pqTopK's ldist): the cross-
        // subspace sum below must be order-independent, and a DOUBLE
        // sum under Spark's unordered partial aggregation can flip a
        // floor boundary by one ulp between runs — which would break
        // the bit-exact maintained≡recompute diffs q223/the specs pin
        min(col("dist")).cast("decimal(18,6)").as("__sdist"))
      .groupBy(idCol)
      .agg(first(col("vec_id")).as("vec_id"),
        transform(array_sort(collect_list(struct(col("s"), col("code")))),
          c => c.getField("code")).as("codes"),
        // encoding QUALITY: total quantization distance in integer
        // micro-units — the drift metric's raw material, paid for by
        // the argmin this job runs anyway; exact decimal arithmetic,
        // scaled to micro-units (6 dp → ×1e6 is lossless)
        (sum(col("__sdist")) * 1000000).cast("long").as("q_units"))
      .select(col(idCol), col("vec_id"), col("codes"), col("q_units"))
  }

  private def packStats(s: (Long, Long)): String = s"${s._1}:${s._2}"
  private def unpackStats(v: Option[String]): (Long, Long) = v match {
    case Some(x) => val p = x.split(":"); (p(0).toLong, p(1).toLong)
    case None => (0L, 0L)
  }

  /** Checkpoint the change set with its stats riding the SAME job
    * ([[IvfIndex.checkpointWithStats]]' observe-metrics discipline):
    * the emptiness gate + drift stats land as metrics of the checkpoint
    * materialization, so the separate stats job disappears. */
  private def checkpointWithStats(
      changes: DataFrame): (DataFrame, (Long, Long, Long)) = {
    val obs = org.apache.spark.sql.Observation()
    // localCheckpoint, not cache — the [[IvfIndex]] rule: embedding-
    // array frames pay columnar encode under cache()
    val ck = changes.observe(obs,
      count(lit(1)).as("applied"),
      coalesce(sum(when(col("__pq_act") === "upsert", col("q_units"))),
        lit(0L)).as("s"),
      count(when(col("__pq_act") === "upsert", 1)).as("n"))
      .localCheckpoint(true)
    val m = obs.get
    (ck, (m("applied").asInstanceOf[Long], m("s").asInstanceOf[Long],
      m("n").asInstanceOf[Long]))
  }

  /** The drift-accumulator rider a window's merge commit carries —
    * the [[IvfIndex.driftRider]] discipline on the PQ measure:
    * atomic with the data, CAS-safe against concurrent maintainers,
    * and replay-skipped together with the stream batch it rides. */
  private def driftRider(w: (Long, Long)): Option[Map[String, String] => Map[String, String]] =
    if (w._2 == 0L) None
    else Some { props =>
      val cum = unpackStats(props.get(Drift.Cum))
      Map(Drift.Last -> packStats(w),
        Drift.Cum -> packStats((cum._1 + w._1, cum._2 + w._2)))
    }

  /** Full initial encode at the source's current version (the ONE
    * corpus-sized pass). Returns the source version the table reflects. */
  def initialize(spark: SparkSession, srcDir: String, indexDir: String,
      codebook: DataFrame, m: Int, subDim: Int,
      idCol: String = "_row_id"): Long = {
    val v = TxLog.latestVersion(srcDir)
    val src = TxLog.read(spark, srcDir, Some(v)).where(validPred)
      .select(col(idCol), col("vec_id"), col("embedding"))
    // baseline stats ride the checkpoint materialization as observe
    // metrics (no extra job — the IvfIndex.initialize discipline)
    val obs = org.apache.spark.sql.Observation()
    val encoded = encodePacked(src, codebook, m, subDim, idCol)
      .observe(obs, coalesce(sum(col("q_units")), lit(0L)).as("s"),
        count(lit(1)).as("n"))
      .localCheckpoint(true)
    val mm = obs.get
    TxLog.append(spark, indexDir, encoded): Unit
    TxLog.setProperties(indexDir, Map(
      Drift.Base -> packStats(
        (mm("s").asInstanceOf[Long], mm("n").asInstanceOf[Long])),
      Drift.Last -> "0:0", Drift.Cum -> "0:0")): Unit
    v
  }

  /** Apply the source's changes in `(fromExclusive, latest]`: last
    * image per row id wins, the upsert delta re-encodes (delta-sized),
    * deletes and invalidated embeddings drop by key — one keyed MERGE. */
  def maintain(spark: SparkSession, srcDir: String, indexDir: String,
      fromExclusive: Long, codebook: DataFrame, m: Int, subDim: Int,
      idCol: String = "_row_id"): MaintainResult = {
    val to = TxLog.latestVersion(srcDir)
    if (to <= fromExclusive)
      return MaintainResult(to, 0L, layoutOnlySkip = false)
    if (!TxLog.hasRowChanges(srcDir, fromExclusive, to))
      return MaintainResult(to, 0L, layoutOnlySkip = true)
    val feed = TxLog.readChangeFeed(spark, srcDir, fromExclusive, Some(to))
    val (changes, (applied, wSum, wN)) =
      checkpointWithStats(changesOf(feed, codebook, m, subDim, idCol))
    if (applied == 0L) return MaintainResult(to, 0L, layoutOnlySkip = false)
    // drift accumulation rides the merge commit ([[driftRider]]): no
    // extra kernels, no extra commit, no crash window
    TxLog.mergeClauses(spark, indexDir, changes, Seq(idCol),
      mergeClausesFor(idCol), driftRider((wSum, wN))): Unit
    MaintainResult(to, applied, layoutOnlySkip = false)
  }

  /** Is the frozen codebook STALE for the data now arriving? The
    * [[IvfIndex.driftReport]] discipline on the PQ quality measure:
    * trips when the maintained flow's average quantization distance
    * exceeds the baseline's by more than `bandUnits` micro-units. O(1):
    * reads only the accumulator properties — no corpus rescan, no
    * kernel re-runs (no SparkSession in the signature). BOTH
    * consumption modes accumulate ([[IvfIndex.driftReport]]'s rule):
    * the accumulator delta rides each window's merge commit, so the
    * one-commit-per-window pin holds and a replayed stream batch
    * skips data and accumulators together. */
  def driftReport(indexDir: String, bandUnits: Long,
      window: String = "last"): DriftReport = {
    require(window == "last" || window == "cum",
      s"driftReport: window must be last|cum, got $window")
    val props = TxLog.snapshot(indexDir).props
    val (bs, bn) = unpackStats(props.get(Drift.Base))
    val (fs, fn) = unpackStats(props.get(
      if (window == "last") Drift.Last else Drift.Cum))
    require(bn > 0L, s"driftReport: $indexDir has no drift baseline — " +
      "initialize() stamps it; pre-drift indexes need a rebuild to gain one")
    val baseAvg = Math.floorDiv(bs, bn)
    val flowAvg = if (fn == 0L) baseAvg else Math.floorDiv(fs, fn)
    val drift = flowAvg - baseAvg // distance: HIGHER is worse
    DriftReport(baseAvg, flowAvg, drift, fn, fn > 0L && drift > bandUnits)
  }

  /** The keyed code-change set of a feed window: last image per id,
    * upserts re-encoded against the frozen codebook (only the delta —
    * the cost-∝-batch claim the q-entry pins), deletes and invalidated
    * embeddings marked for removal. Shared by [[maintain]] and
    * [[stream]] so the two consumption modes cannot diverge. */
  private def changesOf(feed: DataFrame, codebook: DataFrame, m: Int,
      subDim: Int, idCol: String): DataFrame = {
    val last = feed
      .where(col(TxLog.ChangeTypeCol) =!= "update_preimage")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("_commit_version").desc)))
      .where(col("__rn") === 1)
    val ups = encodePacked(
      last.where(col(TxLog.ChangeTypeCol) =!= "delete" && validPred)
        .select(col(idCol), col("vec_id"), col("embedding")),
      codebook, m, subDim, idCol).withColumn("__pq_act", lit("upsert"))
    val dels = last
      .where(col(TxLog.ChangeTypeCol) === "delete" || !validPred)
      .select(col(idCol), col("vec_id"),
        lit(null).cast("array<int>").as("codes"), lit(0L).as("q_units"),
        lit("delete").as("__pq_act"))
    ups.unionByName(dels)
  }

  private def mergeClausesFor(idCol: String): Seq[TxLog.MergeClause] = Seq(
    WhenMatchedDelete(Some("s.__pq_act = 'delete'")),
    WhenMatchedUpdate(Some("s.__pq_act = 'upsert'"), Map(
      "vec_id" -> "s.vec_id", "codes" -> "s.codes", "q_units" -> "s.q_units")),
    WhenNotMatchedInsert(Some("s.__pq_act = 'upsert'"), Map(
      idCol -> s"s.$idCol", "vec_id" -> "s.vec_id", "codes" -> "s.codes",
      "q_units" -> "s.q_units")))

  /** HANDS-FREE maintenance — the [[IvfIndex.stream]] symmetry for the
    * PQ tier: a foreachBatch consumer of the source's CDF stream applies
    * [[maintain]]'s exact change derivation per micro-batch through the
    * txn-tagged [[TxLog.mergeClausesBatch]], so a batch replayed across
    * a checkpoint restart is SKIPPED without staging (exactly-once).
    * Call after [[initialize]] with the version it returned; layout-only
    * source windows arrive as EMPTY batches and commit nothing. One
    * AvailableNow pass per call. */
  def stream(spark: SparkSession, srcDir: String, indexDir: String,
      ckptDir: String, initializedAt: Long, codebook: DataFrame, m: Int,
      subDim: Int, idCol: String = "_row_id",
      appId: String = "pqindex"): Unit = {
    val clauses = mergeClausesFor(idCol)
    val q = spark.readStream.format("txlog").option("path", srcDir)
      .option("readChangeFeed", "true")
      .option("startingVersion", (initializedAt + 1).toString)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (changes, (applied, wSum, wN)) =
          checkpointWithStats(changesOf(batch, codebook, m, subDim, idCol))
        if (applied > 0L)
          TxLog.mergeClausesBatch(batch.sparkSession, indexDir, changes,
            Seq(idCol), clauses, appId, batchId,
            driftRider((wSum, wN))): Unit
      }
      .option("checkpointLocation", ckptDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The code table rebuilt from scratch at the source's head — the
    * bit-identity oracle. */
  def recompute(spark: SparkSession, srcDir: String, codebook: DataFrame,
      m: Int, subDim: Int, idCol: String = "_row_id"): DataFrame = {
    val src = TxLog.read(spark, srcDir).where(validPred)
      .select(col(idCol), col("vec_id"), col("embedding"))
    encodePacked(src, codebook, m, subDim, idCol)
  }

  /** ADC search over the MAINTAINED code table: the query LUT and
    * decimal-exact distance sum of [[Similarity.pqTopK]], with the
    * candidate scan reading ONLY the packed integer codes (exploded to
    * (s, code) pairs), then exact re-rank of the short list — the
    * corpus-sized encode pass never re-runs. `liveVectors` supplies
    * full-precision embeddings for the re-rank fetch. */
  def searchTopK(index: DataFrame, liveVectors: DataFrame, queries: DataFrame,
      codebook: DataFrame, m: Int, subDim: Int, rerankDepth: Int,
      k: Int): DataFrame = {
    val d = graft.queries.SparkSql
    val q = Similarity.validEmbeddings(queries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val lut = q.crossJoin(broadcast(codebook))
      .select(col("q_id"), col("q_emb"), col("cw_id"), col("cw_emb"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .selectExpr("q_id", "s", "cw_id",
        s"CAST(${Similarity.subL2Expr(d, "q_emb", "cw_emb", subDim)} AS DECIMAL(18,6)) AS ldist")
    val codes = index.select(col("vec_id"),
        posexplode(col("codes")).as(Seq("s", "code")))
    val cands = codes
      .join(broadcast(lut), codes("s") === lut("s") && codes("code") === lut("cw_id"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("ldist")).as("adc_dist"))
      .withColumn("arank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("adc_dist"), col("vec_id"))))
      .where(col("arank") <= rerankDepth)
      .select("q_id", "vec_id")
    cands
      .join(liveVectors.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .selectExpr("q_id", "vec_id", "cosine_sim(q_emb, embedding) AS cosine")
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .selectExpr("q_id", "vec_id", "round(cosine, 6) AS cosine", "rank")
  }
}
