package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` reach the engine needs: a V1 streaming
  * `Source.getBatch` must hand back a DataFrame whose logical plan is
  * tagged `isStreaming=true`, and the only constructor for such a frame
  * (`internalCreateDataFrame`) is package-private to `org.apache.spark
  * .sql`. This shim lives in that package to call it — the standard
  * third-party streaming-connector pattern (file-based sources inside
  * Spark do exactly this call). Nothing else in the repo reaches into
  * Spark internals this way; keep it that way. */
object GraftSqlShims {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The sink-side mirror: a V1 streaming `Sink.addBatch` receives a
    * frame bound to the micro-batch's incremental execution — re-using
    * it as a normal batch frame would re-plan the streaming query. The
    * connector pattern (Delta's V1 sink does this exact call) is to
    * rebind the already-planned physical rows as a BATCH frame. */
  def batchDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
