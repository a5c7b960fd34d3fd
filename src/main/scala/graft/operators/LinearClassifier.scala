package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic linear document classifier — the quality-filter pattern
  * LLM pipelines use to select "reference-like" documents (a small
  * linear model over cheap text features, fastText-style; CCNet and the
  * LLaMA data notes both describe this gate).
  *
  * Training is the BATCH perceptron: per epoch, sum y·x over currently
  * misclassified rows (margin ≤ 0) and add it to the weights. With
  * integer features and labels the update is an exact BIGINT sum —
  * order-insensitive, so the fitted weights are BIT-IDENTICAL under any
  * partitioning (the same discipline as KMeans.fit's decimal sums, with
  * no rounding step at all). Contrast SGD, whose row-order dependence
  * cannot be reproduced across engines or partitionings.
  *
  * Each epoch is ONE aggregation job over the feature frame; weights
  * live driver-side as literals (d+1 longs — the J2 two-phase
  * precedent), so the per-epoch plan is scan → project → 4-column sum:
  * map-side partials collapse before the single-row exchange. At 100 TB
  * the cost is `epochs` scans of the (projected, narrow) feature
  * columns, nothing else.
  *
  * No floats anywhere: margins, updates, and scores are BIGINTs, so the
  * parity oracle can re-derive the ENTIRE training loop in SQL (chained
  * epoch CTEs) and hash-match the scores exactly (q113).
  */
object LinearClassifier {

  /** Dot product of literal weights with feature expressions, as a SQL
    * string (all-BIGINT arithmetic). */
  def marginExpr(weights: Seq[Long], featureExprs: Seq[String]): String =
    weights.zip(featureExprs)
      .map { case (w, x) => s"(CAST($w AS BIGINT) * ($x))" }
      .mkString("(", " + ", ")")

  /** Fit a batch perceptron. `featureExprs` are integer-typed SQL
    * expressions over `docs`' columns (include a literal `1` for the
    * bias); `labelExpr` must evaluate to +1 / -1. Returns the weight
    * vector after `epochs` full passes (an all-zero start makes epoch 1
    * classify everything as misclassified — the standard convention). */
  def fitBatchPerceptron(docs: DataFrame, featureExprs: Seq[String],
      labelExpr: String, epochs: Int): Seq[Long] = {
    require(featureExprs.nonEmpty && epochs >= 1)
    // Materialized ONCE: every epoch re-reads the projected integer
    // feature frame ((d+1) BIGINTs per row — what training consumes),
    // not the raw corpus. Without this, each epoch's job recomputes the
    // feature extraction from source text (epochs× the dominant cost
    // when features are array expressions, measured on q113). Blocks are
    // released before returning — weights are plain driver-side longs.
    val feat = docs.selectExpr(
      (featureExprs.zipWithIndex.map { case (x, j) => s"CAST($x AS BIGINT) AS __x$j" } :+
        s"CAST($labelExpr AS BIGINT) AS __y"): _*)
      .localCheckpoint(true)
    try {
      val spark = docs.sparkSession
      val d = featureExprs.size
      // Weights ride as a broadcast 1-row FRAME of data rows, not spliced
      // literals: literal weights make every epoch a structurally
      // different plan, so each epoch pays a fresh whole-stage-codegen
      // compile; with the weights as data the per-epoch generated code is
      // byte-identical and the codegen cache serves epochs 2..n (the
      // carry-values-as-data discipline of the round-8 BPE fix, applied
      // to a loop).
      val wSchema = org.apache.spark.sql.types.StructType((0 until d).map(j =>
        org.apache.spark.sql.types.StructField(s"__w$j",
          org.apache.spark.sql.types.LongType, nullable = false)))
      def wFrame(w: Seq[Long]) = spark.createDataFrame(
        java.util.Collections.singletonList(org.apache.spark.sql.Row.fromSeq(w)), wSchema)
      val m = (0 until d).map(j => s"(__w$j * __x$j)").mkString("(", " + ", ")")
      var w = Seq.fill(d)(0L)
      var epoch = 0
      while (epoch < epochs) {
        val updates = feat.crossJoin(broadcast(wFrame(w))).selectExpr(
          (0 until d).map(j =>
            s"sum(CASE WHEN __y * $m <= 0 THEN __y * __x$j ELSE CAST(0 AS BIGINT) END) AS __u$j"): _*)
          .head()
        w = w.indices.map(j => w(j) + (if (updates.isNullAt(j)) 0L else updates.getLong(j)))
        epoch += 1
      }
      w
    } finally CheckpointBlocks.release(feat)
  }

  /** Score every row with a fitted weight vector: appends BIGINT
    * `margin` (w·x) and INT `pred` (sign; 0 margin → -1, matching the
    * perceptron's "margin ≤ 0 is misclassified" convention). A pure
    * projection — zero shuffle at any scale. */
  def scoreLinear(docs: DataFrame, featureExprs: Seq[String],
      weights: Seq[Long]): DataFrame = {
    require(weights.size == featureExprs.size)
    docs
      .withColumn("margin", expr(marginExpr(weights, featureExprs)))
      .withColumn("pred", expr("CASE WHEN margin > 0 THEN 1 ELSE -1 END").cast("int"))
  }

  /** Chained-CASE argmax over per-class margin expressions, ties → the
    * LOWEST class index. Arm c only tests `m_c >= m_j` for j > c: if
    * every earlier arm failed, each earlier class was strictly beaten
    * by some later one, so the first arm whose "≥ all later" holds is
    * exactly the lowest index achieving the maximum. Dialect-neutral
    * SQL (plain CASE/AND), so oracles replay predictions verbatim. */
  def argmaxExpr(margins: Seq[String]): String = {
    require(margins.size >= 2, "argmaxExpr: need at least 2 classes")
    val arms = margins.init.zipWithIndex.map { case (m, c) =>
      val conds = (c + 1 until margins.size)
        .map(j => s"($m) >= (${margins(j)})").mkString(" AND ")
      s"WHEN $conds THEN $c"
    }
    s"(CASE ${arms.mkString(" ")} ELSE ${margins.size - 1} END)"
  }

  /** Multi-class batch perceptron — ONE BIGINT weight row per class
    * (the fastText-shaped multi-class gate: language ID, domain
    * routing, quality tiers). Per epoch, with pred = argmax_c w_c·x
    * (ties → lowest class) under the CURRENT weights:
    * {{{
    *   w_c += Σ_{y=c, pred≠c} x  −  Σ_{pred=c, y≠c} x
    * }}}
    * — the Collins (2002) structured-perceptron update, batched. All
    * sums are exact BIGINTs, so fitted weights are bit-identical under
    * any partitioning and the oracle replays the whole loop as chained
    * epoch CTEs (q135, the q113 precedent one tier up).
    *
    * Each epoch is ONE aggregation job: scan → pred projection →
    * (numClasses × d) sums that collapse map-side before a single-row
    * exchange; weights travel as literals (numClasses·d longs, the J2
    * pattern). `labelExpr` must evaluate to 0..numClasses-1. */
  def fitMulticlassPerceptron(docs: DataFrame, featureExprs: Seq[String],
      labelExpr: String, numClasses: Int, epochs: Int): Seq[Seq[Long]] = {
    require(featureExprs.nonEmpty && numClasses >= 2 && epochs >= 1)
    val d = featureExprs.size
    // Materialized once, released on exit — the fitBatchPerceptron
    // rationale (epochs× re-extraction otherwise).
    val feat = docs.selectExpr(
      (featureExprs.zipWithIndex.map { case (x, j) => s"CAST($x AS BIGINT) AS __x$j" } :+
        s"CAST($labelExpr AS INT) AS __y"): _*)
      .localCheckpoint(true)
    try {
      val spark = docs.sparkSession
      // Per-class weights as a broadcast 1-row data frame — identical
      // generated code every epoch (see fitBatchPerceptron).
      val wSchema = org.apache.spark.sql.types.StructType(
        (for (c <- 0 until numClasses; j <- 0 until d) yield
          org.apache.spark.sql.types.StructField(s"__w${c}_$j",
            org.apache.spark.sql.types.LongType, nullable = false)))
      def wFrame(w: Seq[Seq[Long]]) = spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row.fromSeq(w.flatten)), wSchema)
      val margins = (0 until numClasses).map(c =>
        (0 until d).map(j => s"(__w${c}_$j * __x$j)").mkString("(", " + ", ")"))
      var w = Seq.fill(numClasses)(Seq.fill(d)(0L))
      (1 to epochs).foreach { _ =>
        val sums = feat.crossJoin(broadcast(wFrame(w)))
          .withColumn("__p", expr(argmaxExpr(margins)))
          .selectExpr(
            (for (c <- 0 until numClasses; j <- 0 until d) yield
              s"sum(CASE WHEN __y = $c AND __p <> $c THEN __x$j " +
                s"WHEN __p = $c AND __y <> $c THEN -__x$j " +
                s"ELSE CAST(0 AS BIGINT) END) AS __u${c}_$j"): _*)
          .head()
        w = (0 until numClasses).map { c =>
          (0 until d).map { j =>
            val i = c * d + j
            w(c)(j) + (if (sums.isNullAt(i)) 0L else sums.getLong(i))
          }
        }
      }
      w.map(_.toSeq)
    } finally CheckpointBlocks.release(feat)
  }

  /** Score with fitted multi-class weights: appends INT `pred` (argmax
    * class, ties → lowest) and BIGINT `margin` (the winning class's
    * w·x, = greatest of the margins). A pure projection. */
  def scoreMulticlass(docs: DataFrame, featureExprs: Seq[String],
      weights: Seq[Seq[Long]]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_.size == featureExprs.size))
    val margins = weights.map(wc => marginExpr(wc, featureExprs))
    docs
      .withColumn("pred", expr(argmaxExpr(margins)).cast("int"))
      .withColumn("margin", expr(s"greatest(${margins.mkString(", ")})").cast("long"))
  }

  /** Nearest-class-centroid trainer (Rocchio 1971) — the robust head
    * for NOISY, non-separable text (language ID over hashed trigram
    * shares). The batch perceptron above has no convergence guarantee
    * off separable data: measured on the q135 corpus it oscillates at
    * chance accuracy (0.33) for every epoch count while this one-pass
    * trainer hits 0.82 holdout — the same as an unregularized
    * least-squares probe, i.e. all the accuracy a linear model can get
    * from those features (numbers in SURVEY.md §8, round 9).
    *
    * Returns μ̃(c)(j) = floor(scale · Σ_{y=c} x_j / N_c) — the class
    * centroid in `scale`-fixed-point. Exact integer arithmetic end to
    * end: ONE groupBy-label aggregation job (numClasses partial rows
    * per task), floor-division driver-side, so fitted centroids are
    * bit-identical under any partitioning and an oracle replays them
    * as a conditional-aggregation CTE. Features must be NON-NEGATIVE
    * (DIV truncation = floor only then — Spark DIV and DuckDB //
    * agree); a class absent from `docs` gets the zero centroid.
    *
    * Overflow bound: scoring squares (scale·x_j − μ̃_cj), so keep
    * scale·max(x_j) below ~2.6e9 (√(2⁶³/d) for d features); with
    * basis-point shares (x_j ≤ 10⁴, scale 10⁴) headroom is 100×. */
  def fitNearestCentroid(docs: DataFrame, featureExprs: Seq[String],
      labelExpr: String, numClasses: Int, scale: Long = 10000L): Seq[Seq[Long]] = {
    require(featureExprs.nonEmpty && numClasses >= 2 && scale >= 1)
    val d = featureExprs.size
    val feat = docs.selectExpr(
      (featureExprs.zipWithIndex.map { case (x, j) => s"CAST($x AS BIGINT) AS __x$j" } :+
        s"CAST($labelExpr AS INT) AS __y"): _*)
    val sums = feat.selectExpr(
      ((for (c <- 0 until numClasses) yield
        s"sum(CASE WHEN __y = $c THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS __n$c") ++
        (for (c <- 0 until numClasses; j <- 0 until d) yield
          s"sum(CASE WHEN __y = $c THEN __x$j ELSE CAST(0 AS BIGINT) END) AS __s${c}_$j")): _*)
      .head()
    (0 until numClasses).map { c =>
      val n = if (sums.isNullAt(c)) 0L else sums.getLong(c)
      (0 until d).map { j =>
        val i = numClasses + c * d + j
        val s = if (sums.isNullAt(i)) 0L else sums.getLong(i)
        if (n == 0L) 0L else (scale * s) / n
      }
    }
  }

  /** Nearest-centroid scoring as a LINEAR head: margin_c =
    * −Σ_j (scale·x_j − μ̃_cj)², pred = argmax (ties → lowest class,
    * the shared [[argmaxExpr]] semantics), `margin` = the winning
    * class's value (= −min squared distance). A pure projection —
    * zero shuffle at any scale. */
  def scoreNearestCentroid(docs: DataFrame, featureExprs: Seq[String],
      centroids: Seq[Seq[Long]], scale: Long = 10000L): DataFrame = {
    require(centroids.nonEmpty && centroids.forall(_.size == featureExprs.size))
    val margins = centroids.map { mu =>
      mu.zip(featureExprs).map { case (m, x) =>
        s"(-1 * ((CAST($scale AS BIGINT) * ($x)) - CAST($m AS BIGINT)) * ((CAST($scale AS BIGINT) * ($x)) - CAST($m AS BIGINT)))"
      }.mkString("(", " + ", ")")
    }
    docs
      .withColumn("pred", expr(argmaxExpr(margins)).cast("int"))
      .withColumn("margin", expr(s"greatest(${margins.mkString(", ")})").cast("long"))
  }
}
