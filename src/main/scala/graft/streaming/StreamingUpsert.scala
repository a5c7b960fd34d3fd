package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.AtomicSwap

/** Streaming keyed upsert — the foreachBatch MERGE pattern: each
  * micro-batch merges into a keyed table by primary key, keeping the
  * HIGHEST `versionCol` per key across the existing snapshot and the
  * batch (CDC `MERGE WHEN MATCHED AND s.version >= t.version UPDATE /
  * WHEN NOT MATCHED INSERT`). A late-arriving older version in a later
  * batch therefore cannot overwrite newer state, and replaying a
  * redelivered batch is a no-op — which is what makes foreachBatch's
  * at-least-once delivery safe here without the per-batch partition
  * guard the append sink needs
  * ([[StreamingBronze.writeBatchIdempotent]]).
  *
  * The merge is a union + per-key newest-wins window against the current
  * snapshot, rewritten via [[AtomicSwap]] (rename swap with crash
  * recovery). On a table format (Delta/Iceberg) the same handler body
  * would be a real MERGE INTO and only this function changes.
  *
  * Scale: the merge shuffles on the key — with a bucketed/clustered base
  * table even that exchange disappears (BucketedJoinSpec's shape). The
  * full-snapshot rewrite is the parquet tax that a table format's
  * row-level MERGE removes.
  */
object StreamingUpsert {

  /** Merge `batch` into the keyed parquet table at `tableDir`: per key,
    * the row with the highest `versionCol` wins across snapshot + batch;
    * on equal versions the batch row wins (so redelivered batches are
    * no-ops, not flip-flops). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, tableDir: String,
      keyCol: String, versionCol: String): Unit = {
    AtomicSwap.recover(tableDir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(versionCol).desc, col("__src").desc)
    val tagged = batch.withColumn("__src", lit(1))
    val exists = new java.io.File(tableDir).exists()
    val all =
      if (!exists) tagged
      else spark.read.parquet(tableDir).withColumn("__src", lit(0)).unionByName(tagged)
    val merged = all
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__src")
    val tmp = tableDir + ".upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    AtomicSwap.replace(tableDir, tmp)
  }

  /** Run an AvailableNow pass of `source` upserting into `tableDir`. */
  def run(spark: SparkSession, source: DataFrame, tableDir: String,
      checkpointDir: String, keyCol: String, versionCol: String): DataFrame = {
    val q = source.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(spark, batch, tableDir, keyCol, versionCol)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(tableDir)
  }
}
