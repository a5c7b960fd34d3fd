package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming keyed upsert — the foreachBatch MERGE pattern: each
  * micro-batch merges into a keyed table by primary key, keeping the
  * newest version of each row (CDC-style `MERGE WHEN MATCHED UPDATE /
  * WHEN NOT MATCHED INSERT`).
  *
  * The merge itself is a full-outer coalesce against the current
  * snapshot, rewritten atomically (write temp → swap) — on a table
  * format (Delta/Iceberg) the same handler body would be a real MERGE
  * INTO and only this function changes. Because a keyed merge is
  * IDEMPOTENT (merging the same batch twice yields the same table),
  * foreachBatch's at-least-once redelivery needs no extra guard — unlike
  * the append sink, which needs per-batch partition overwrite
  * ([[StreamingBronze.writeBatchIdempotent]]).
  *
  * Scale: the merge shuffles on the key — the join both sides are
  * already keyed by; with a bucketed/clustered base table even that
  * exchange disappears (BucketedJoinSpec's shape). Batch sizes stay
  * micro; the snapshot rewrite is the parquet tax that a table format's
  * row-level MERGE removes.
  */
object StreamingUpsert {

  /** Merge `batch` into the keyed parquet table at `tableDir`: per key
    * keep the batch's row if present, else the existing row. Within one
    * batch, the row with the highest `versionCol` wins (late duplicates
    * inside a batch are resolved deterministically). */
  def mergeBatch(spark: SparkSession, batch: DataFrame, tableDir: String,
      keyCol: String, versionCol: String): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(versionCol).desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
    val exists = new java.io.File(tableDir).exists()
    val merged =
      if (!exists) latest
      else {
        val cur = spark.read.parquet(tableDir)
        // batch rows win; untouched keys carry over
        cur.join(latest.select(col(keyCol).as("__k")), col(keyCol) === col("__k"), "left_anti")
          .unionByName(latest)
      }
    val tmp = tableDir + ".upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val livePath = java.nio.file.Paths.get(tableDir)
    val trash = java.nio.file.Paths.get(tableDir + ".upsert_old")
    if (exists) java.nio.file.Files.move(livePath, trash,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), livePath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    if (exists) {
      java.nio.file.Files.walk(trash).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
    }
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
