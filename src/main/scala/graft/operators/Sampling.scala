package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

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
}
