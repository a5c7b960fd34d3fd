package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, coalesce, col, element_at, expr, lit, row_number, typedLit}

/** Deterministic sampling/splitting for training-data pipelines. */
object Sampling {

  /** Hash-based train/test split: a row lands in 'train' iff
    * `md5_u32(id) % 100 < trainPct`.
    *
    * Properties that matter at 100 TB:
    *  - DETERMINISTIC and seed-free: the same row goes to the same split
    *    on every run, every partitioning, every cluster size — unlike
    *    `randomSplit`, which reshuffles membership whenever partitioning
    *    changes.
    *  - pure projection: zero shuffle, zero state; filters on the split
    *    column push down to the scan like any predicate.
    *  - stratification-friendly: md5 mixes uniformly, so per-stratum
    *    proportions track `trainPct` (q87 checks this per language).
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int,
      splitCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct must be 0..100, got $trainPct")
    df.withColumn(splitCol, expr(
      s"CASE WHEN md5_u32(CAST($idCol AS STRING)) % 100 < $trainPct " +
        "THEN 'train' ELSE 'test' END"))
  }

  /** K-fold assignment with the same properties as [[hashSplit]]:
    * fold = md5_u32(id) % k, deterministic and partition-invariant, so
    * cross-validation folds are stable across runs and cluster sizes. */
  def hashFold(df: DataFrame, idCol: String, k: Int,
      foldCol: String = "fold"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn(foldCol, expr(s"md5_u32(CAST($idCol AS STRING)) % $k"))
  }

  /** Deterministic stratified downsample — the corpus-rebalancing step of
    * a training-data mix (e.g. keep 10% of crawl, all of books): a row
    * survives iff `md5_u32(id) % 10000 < fraction(stratum)·10000`.
    * Strata not named in `fractions` are kept in full.
    *
    * Same 100 TB properties as [[hashSplit]], and the reason this exists
    * instead of `df.stat.sampleBy`: Bernoulli sampling draws from
    * `rand(seed)`, whose stream depends on row order WITHIN a partition
    * and on the partitioning itself, so a repartition or an AQE change
    * silently changes which rows survive; the hash rule is a pure
    * projection of the row's own id — stable across runs, partitionings,
    * cluster sizes, and engines (md5 is two-dialect, so a DuckDB oracle
    * reproduces the exact sample).
    *
    * Resolution is 1 basis point: a nonzero fraction below 0.00005 is
    * rejected rather than silently rounding the stratum to zero. Rows
    * with a NULL stratum fall under "not named" (kept). Rows with a NULL
    * id hash as the empty string — deterministic, but they share ONE
    * draw per stratum; give rows real ids for per-row sampling. */
  def sampleStratified(df: DataFrame, stratumCol: String, idCol: String,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1], got $fractions")
    require(fractions.values.forall(f => f == 0.0 || math.round(f * 10000) > 0),
      s"nonzero fractions below 1 basis point (0.0001) would round to " +
        s"'drop everything' — got $fractions")
    val bpByStratum = fractions.map { case (s, f) => s -> math.round(f * 10000) }
    // map-literal lookup, not a string-built CASE: survives empty maps,
    // quotes/backslashes in stratum keys, and NULL strata (→ kept)
    val bp =
      if (bpByStratum.isEmpty) lit(10000L)
      else coalesce(
        element_at(typedLit(bpByStratum), col(stratumCol).cast("string")),
        lit(10000L))
    df.where(expr(s"md5_u32(coalesce(CAST($idCol AS STRING), ''))") % 10000 < bp)
  }

  /** Token-budget mixture sampling — the step that turns a mixture
    * config ("20% web, 30% code, ...") plus a GLOBAL token budget into
    * per-domain keep rates (the Pile / Llama corpus-mixture recipe,
    * priced in tokens because that is what training consumes):
    * {{{
    *   rate_bp(dom) = min(10000, budgetTokens·weightBp(dom) DIV tokens(dom))
    * }}}
    * then a row survives iff `md5_u32(id) % 10000 < rate_bp(domain)` —
    * the same deterministic, partition-invariant hash rule as
    * [[sampleStratified]], so reruns and engines agree row-for-row.
    * A domain whose weighted budget exceeds its corpus is kept in full
    * (rate capped at 10000 — upsampling/epoch repetition is a separate
    * decision); a domain absent from `weightsBp` (or with weight 0, or
    * a NULL domain) is NOT in the mix and is dropped.
    *
    * Scale shape: one map-side-combined groupBy(domain) sum for the
    * per-domain token totals, rates computed IN the plan on that
    * domain-count-sized frame, broadcast back — no driver collect, no
    * second scan barrier beyond the agg itself. Integer arithmetic end
    * to end (weights in basis points, floor division on non-negative
    * operands where Spark DIV ≡ DuckDB //), so an oracle replays rates
    * exactly. Overflow bound: budgetTokens·weightBp must fit a BIGINT —
    * budgets up to ~9·10^14 tokens at full weight (≈ 30× a 100 TB
    * corpus), enforced by a require.
    *
    * Returns surviving rows with `rate_bp` appended. `tokensExpr` is
    * any non-negative per-row token count (whitespace, subword — the
    * caller picks the pricing model). */
  def sampleTokenBudget(df: DataFrame, domainCol: String, idCol: String,
      tokensExpr: String, weightsBp: Map[String, Long],
      budgetTokens: Long, rateCol: String = "rate_bp"): DataFrame = {
    require(weightsBp.nonEmpty, "sampleTokenBudget: empty mixture")
    require(weightsBp.values.forall(w => w >= 0L && w <= 10000L),
      s"weights are basis points in [0, 10000], got $weightsBp")
    require(weightsBp.values.sum <= 10000L,
      s"mixture weights exceed 100%: ${weightsBp.values.sum} bp")
    require(budgetTokens >= 0L && budgetTokens <= Long.MaxValue / 10000L,
      s"budgetTokens out of the overflow-safe range: $budgetTokens")
    require(!df.columns.contains(rateCol),
      s"input already has a $rateCol column — rename it before sampleTokenBudget")
    val wbp = element_at(typedLit(weightsBp), col("__dom").cast("string"))
    val rates = df
      .groupBy(col(domainCol).as("__dom"))
      .agg(expr(s"sum(CAST($tokensExpr AS BIGINT))").as("__dom_tokens"))
      .withColumn("__wbp", wbp)
      .where(col("__wbp").isNotNull && col("__wbp") > 0)
      .withColumn(rateCol, expr(
        s"""CASE WHEN __dom_tokens <= 0 THEN CAST(10000 AS BIGINT)
                 ELSE least(CAST(10000 AS BIGINT),
                            CAST($budgetTokens AS BIGINT) * __wbp DIV __dom_tokens)
            END"""))
      .select(col("__dom"), col(rateCol))
    df.join(broadcast(rates), col(domainCol) === col("__dom"))
      .where(expr(s"md5_u32(coalesce(CAST($idCol AS STRING), '')) % 10000") < col(rateCol))
      .drop("__dom")
  }

  /** Temperature-flattened mixture — the multilingual/domain rebalance
    * of XLM-R / mC4 (Conneau et al. 2020): target shares ∝ tokens^α
    * with α < 1 UPWEIGHTING small domains, derived from the corpus
    * itself (where [[sampleTokenBudget]] takes the mixture as given),
    * then applied as per-domain keep rates under a global token budget:
    * {{{
    *   w_d    = t_d^α / Σ_e t_e^α           α = 2^-halvings
    *   rate_d = min(1, B·w_d / t_d)         in basis points
    * }}}
    *
    * α is expressed as `halvings` sqrt applications (1 → α=0.5,
    * 2 → α=0.25), NOT a free exponent: sqrt is correctly rounded by
    * IEEE 754 in BOTH engines, `pow` is not — a free α would let the
    * two engines disagree in the last ulp and flip a basis-point
    * rounding. Σ t^α folds in domain order (fixed float addition
    * order); everything after the two doubles is integer.
    *
    * Scale shape mirrors [[sampleTokenBudget]]: one map-side-combined
    * groupBy(domain), a domain-count-sized weight relation folded to
    * one scalar, rates broadcast back, the md5 row rule — no driver
    * collect, no second corpus scan. Empty domains keep-all (their
    * natural share is zero; dropping them silently would be a
    * surprising data loss). */
  def sampleTemperature(df: DataFrame, domainCol: String, idCol: String,
      tokensExpr: String, halvings: Int, budgetTokens: Long,
      rateCol: String = "rate_bp"): DataFrame = {
    require(halvings >= 1 && halvings <= 4,
      s"halvings must be 1..4 (alpha 0.5 .. 0.0625), got $halvings")
    require(budgetTokens >= 0L && budgetTokens <= Long.MaxValue / 10000L,
      s"budgetTokens out of the overflow-safe range: $budgetTokens")
    require(!df.columns.contains(rateCol),
      s"input already has a $rateCol column — rename it before sampleTemperature")
    val pow = (1 to halvings).foldLeft("CAST(__t AS DOUBLE)")((e, _) => s"sqrt($e)")
    val domTok = df
      .groupBy(col(domainCol).as("__dom"))
      .agg(expr(s"sum(CAST($tokensExpr AS BIGINT))").as("__t"))
      .withColumn("__pw", expr(pow))
    val total = domTok.agg(expr(
      """aggregate(
           transform(array_sort(collect_list(struct(__dom, __pw))), x -> x.__pw),
           CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("__s"))
    val rates = domTok.crossJoin(broadcast(total))
      .withColumn(rateCol, expr(
        s"""CASE WHEN __t <= 0 THEN CAST(10000 AS BIGINT)
                 ELSE least(CAST(10000 AS BIGINT),
                            10000 * CAST(round($budgetTokens * __pw / __s) AS BIGINT) DIV __t)
            END"""))
      .select(col("__dom"), col(rateCol))
    // NULL-safe domain match: an unclassified (NULL-domain) slice gets
    // its own histogram row and rate; a plain equi-join would evaluate
    // NULL = NULL to NULL and silently drop every such row — exactly
    // the unrequested data loss this operator's contract rules out
    df.join(broadcast(rates), col(domainCol) <=> col("__dom"))
      .where(expr(s"md5_u32(coalesce(CAST($idCol AS STRING), '')) % 10000") < col(rateCol))
      .drop("__dom")
  }

  /** Deterministic epoch-seeded global shuffle + sharding — the EXPORT
    * step that turns a curated corpus into training shards: every row
    * gets a shard id and a pseudo-random sort key, both pure functions
    * of (row id, epoch):
    * {{{
    *   key(id)  = md5_u32(id || '#e' || epoch)   // 32-bit, uniform
    *   shard    = key % nShards
    *   order within shard = (key, id)            // id breaks md5 ties
    * }}}
    * Training wants a DIFFERENT permutation each epoch but the SAME one
    * on every rerun of that epoch — `rand(seed)` gives neither under
    * repartitioning, the hash rule gives both (the [[hashSplit]]
    * argument, applied to ordering).
    *
    * This is a PURE PROJECTION — zero shuffle, zero state. The writer
    * picks the physical layout:
    * {{{
    *   shuffleShards(docs, "doc_id", 1024, epoch = 3)
    *     .repartition(1024, col("shard"))
    *     .sortWithinPartitions("shard", "shuffle_key", "doc_id")
    *     .write.partitionBy("shard")...
    * }}}
    * — ONE hash exchange plus an in-partition sort, the cost floor for
    * ordered shards, and each task streams its shard straight to a file
    * (no per-shard window, no global sort barrier: UnsafeExternalSorter
    * spills, so a shard larger than executor memory still exports).
    * Size `nShards` so a shard is a sane file (100 TB / 1 GiB files ≈
    * 100k shards).
    *
    * Tie-break caveat: md5_u32 is 32-bit, so at corpus scale key
    * collisions are certain (birthday bound ~80k rows); the trailing id
    * makes the order total PROVIDED ids are unique and non-null. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int, epoch: Int,
      shardCol: String = "shard", keyCol: String = "shuffle_key"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(epoch >= 0, s"epoch must be non-negative, got $epoch")
    Seq(shardCol, keyCol).foreach(c => require(!df.columns.contains(c),
      s"input already has a $c column — rename it before shuffleShards"))
    val key = expr(s"md5_u32(concat(CAST($idCol AS STRING), '#e$epoch'))")
    df.withColumn(keyCol, key).withColumn(shardCol, key % nShards)
  }

  /** Fixed-SIZE per-stratum cap — the other half of mix rebalancing
    * ("at most k docs per source"): keep the k rows of each stratum with
    * the smallest (md5_u32(id), id) rank. Deterministic and
    * partition-invariant like [[sampleStratified]] (the hash rank is a
    * property of the row, not of execution order), and the rank filter
    * plans as WindowGroupLimit, so each group tracks only its current
    * top-k instead of sorting whole strata (SamplingSpec proves the
    * plan shape). The id tiebreak makes the cap total under md5
    * collisions — PROVIDED ids are unique and non-null per row; rows
    * sharing an id (or with NULL ids) tie on both sort keys, and which
    * tied row survives a rank-k boundary then depends on execution
    * order. */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("__rk"),
      "input already has a __rk column — rename it before capPerStratum")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy(expr(s"md5_u32(coalesce(CAST($idCol AS STRING), ''))"), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }
}
