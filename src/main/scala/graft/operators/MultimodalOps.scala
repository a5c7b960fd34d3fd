package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): treat media payloads as
  * opaque BINARY columns with typed metadata, keeping the Spark-side
  * mechanics — schema, batch iteration, partition parallelism — real
  * while the actual media decode is STUBBED (no image/audio codecs exist
  * in this environment).
  *
  * Two decode paths:
  *  - [[withFakeDecode]]: pure Catalyst expressions (codegen'd, the path
  *    used by the oracle-compared q61) deriving deterministic pseudo
  *    image metadata from the payload bytes;
  *  - [[decodeBatch]]: the imperative per-partition path a real codec
  *    would use (`mapPartitions` over payload byte arrays → fixed-width
  *    feature vectors). The feature math is a DETERMINISTIC FAKE standing
  *    in for `decode_jpeg`/`resample` etc.; swap `fakeFeature` for a real
  *    codec call and nothing else changes. Batches stay on executors —
  *    the driver never sees a payload.
  *
  * Scale notes: payloads ride through shuffles only if explicitly
  * selected; metadata-only plans prune the binary column at the parquet
  * scan. Partitioning by `content_hash` prefix gives media-dedup the same
  * bucket-join shape as text dedup (DedupQueries).
  */
object MultimodalOps {

  /** Wrap a text corpus as a binary-payload table: payload BINARY plus a
    * metadata struct — the shape a real image/audio table would have. */
  def packDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("content_hash"),
        lit("text/plain").as("mime")).as("meta"))

  /** Expression-path fake decode: deterministic pseudo image metadata
    * derived from the payload (all codegen'd; no UDF). */
  def withFakeDecode(packed: DataFrame): DataFrame = {
    val h = "CAST(instr('0123456789abcdef', substring(meta.content_hash, 1, 1)) - 1 AS BIGINT)"
    packed
      .withColumn("img_w", expr(s"160 + $h * 32"))
      .withColumn("img_h", expr(
        "120 + CAST(instr('0123456789abcdef', substring(meta.content_hash, 2, 1)) - 1 AS BIGINT) * 24"))
      .withColumn("n_frames", expr("meta.n_bytes % 7 + 1"))
  }

  /** Feature width of the stub decoder. */
  val FeatureDim = 8

  /** Imperative batch decode path (mapPartitions — the ONLY non-Catalyst
    * operator in the engine, used exactly where per-row imperative codec
    * work is unavoidable). STUB: `fakeFeature` deterministically folds
    * payload bytes; a real implementation would decode media here. */
  def decodeBatch(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val rdd = packed.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, fakeFeature(bytes))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB decode: fold bytes into FeatureDim accumulators (stands in for
    * a codec + pooling; deterministic so tests can golden it). */
  private[operators] def fakeFeature(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }
}
