package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): treat media payloads as
  * opaque BINARY columns with typed metadata, keeping the Spark-side
  * mechanics — schema, batch iteration, partition parallelism — real.
  * As of round 4 the DECODE is real too, via the JDK's own image codec
  * (`javax.imageio` BMP — no external deps): [[packImages]] encodes
  * genuine BMP payloads and [[decodeBatch]] pixel-decodes them.
  *
  * Decode paths:
  *  - [[withFakeDecode]]: pure Catalyst expressions (codegen'd, the path
  *    used by the oracle-compared q61) deriving deterministic pseudo
  *    image metadata from the payload bytes — kept because it shows the
  *    metadata-only shape that never touches a codec;
  *  - [[decodeBatch]]: the imperative per-partition path
  *    (`mapPartitions` over payload byte arrays → fixed-width feature
  *    vectors). Image payloads (BMP magic) go through
  *    `ImageIO.read` and real pixel statistics; non-image payloads fall
  *    back to a deterministic byte-fold, standing in for codecs the JDK
  *    lacks (JPEG-in-sandbox, audio). Batches stay on executors — the
  *    driver never sees a payload.
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

  /** Feature width of the decoder (both the image and byte-fold paths). */
  val FeatureDim = 8

  /** ImageIO defaults to a DISK-backed stream cache (a temp file created
    * and deleted per encode/decode) — pure waste for payloads already in
    * memory. Flip it off once per executor JVM; referenced by both codec
    * entry points. */
  private lazy val imageIoInMemory: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Pack a text corpus as a REAL image table: each document rendered as
    * a genuine BMP (dimensions and pixels deterministically derived from
    * the text's md5 chain, encoded by `javax.imageio` — real file-format
    * bytes, decodable by any BMP reader). The executor-side mapPartitions
    * is exactly where a real `fetch + transcode` ingest would run. */
  def packImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("n_bytes", IntegerType),
        StructField("content_hash", StringType),
        StructField("mime", StringType))))))
    val rdd = docs.select("doc_id", "text").rdd.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val text = if (r.isNullAt(1)) null else r.getString(1)
        if (text == null) {
          // match packDocuments' NULL tolerance: null payload/meta fields
          Row(r.getLong(0), null, Row(null, null, "image/bmp"))
        } else {
          val bytes = renderBmp(text)
          md.reset()
          val hash = md.digest(bytes).map("%02x".format(_)).mkString
          Row(r.getLong(0), bytes, Row(bytes.length, hash, "image/bmp"))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic text→BMP rendering: 8..15 × 8..15 pixels whose RGB
    * bytes come from an md5 hash chain over the text, written through the
    * JDK BMP encoder. Deterministic so tests can golden the round trip. */
  private[graft] def renderBmp(text: String): Array[Byte] = {
    imageIoInMemory
    val md = java.security.MessageDigest.getInstance("MD5")
    val seed = md.digest(text.getBytes("UTF-8"))
    val w = 8 + (seed(0) & 0x07)
    val h = 8 + (seed(1) & 0x07)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var block = seed
    var off = 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (off + 3 > block.length) { block = md.digest(block); off = 0 }
        val rgb = ((block(off) & 0xff) << 16) |
          ((block(off + 1) & 0xff) << 8) | (block(off + 2) & 0xff)
        img.setRGB(x, y, rgb)
        off += 3
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  /** Imperative batch decode path (mapPartitions — the ONLY non-Catalyst
    * operator in the engine, used exactly where per-row imperative codec
    * work is unavoidable). Image payloads are REALLY decoded
    * (`ImageIO.read` → pixel statistics); anything else falls back to
    * the deterministic byte-fold. */
  def decodeBatch(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val rdd = packed.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row(id, decodeFeature(bytes))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Dispatch on the payload's magic: BMP → real pixel decode; anything
    * else → byte-fold fallback. Fixed FeatureDim width either way.
    * The magic check is a HINT, not proof — a text payload can start
    * with "BM" ("BMW recall…"), so a decoder exception falls through to
    * the byte-fold instead of failing the task. NULL payload → zero
    * vector (matches packDocuments/packImages NULL rows). */
  private[graft] def decodeFeature(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return new Array[Float](FeatureDim)
    if (bytes.length > 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      imageIoInMemory
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img != null) return imageFeature(img)
      } catch { case _: Exception => () }
    }
    fakeFeature(bytes)
  }

  /** Real decoded-pixel features: [w, h, meanR, meanG, meanB, minGray,
    * maxGray, stddevGray] (channel stats normalized to [0,1]). */
  private[operators] def imageFeature(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    var (sr, sg, sb) = (0L, 0L, 0L)
    var mn = 255.0; var mx = 0.0
    var sum = 0.0; var sumSq = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val gray = (r + g + b) / 3.0
        if (gray < mn) mn = gray
        if (gray > mx) mx = gray
        sum += gray; sumSq += gray * gray
        x += 1
      }
      y += 1
    }
    val n = (w * h).toDouble
    val mean = sum / n
    val variance = math.max(0.0, sumSq / n - mean * mean)
    Array(w.toFloat, h.toFloat,
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      (mn / 255.0).toFloat, (mx / 255.0).toFloat,
      (math.sqrt(variance) / 255.0).toFloat)
  }

  /** Batch RESIZE (brief: "decode / feature-extract / resize /
    * frame-sample"): decode each BMP payload, nearest-neighbor resample
    * to `outW`×`outH`, re-encode through the JDK BMP writer. Output
    * (doc_id, payload, w, h, resized): `resized=false` rows (NULL or
    * non-decodable payloads) pass through untouched — the transform is
    * total over a mixed-media table, and the flag keeps the skip
    * observable instead of silent. Executor-side mapPartitions like
    * [[decodeBatch]]; one decoded image in flight per row, never a
    * collected batch. */
  def resizeBatch(packed: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, s"bad target size ${outW}x$outH")
    val spark = packed.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("resized", BooleanType, nullable = false)))
    val rdd = packed.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        decodeImage(bytes) match {
          case Some(img) =>
            val out = resizeNearest(img, outW, outH)
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "bmp", baos)
            Row(id, baos.toByteArray, outW, outH, true)
          case None => Row(id, bytes, null, null, false)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Nearest-neighbor resample — the one resampling kernel whose output
    * pixels are EXACT source pixels, so tests can golden the mapping
    * (src(x·w/outW, y·h/outH)) without float filtering tolerances. */
  private[operators] def resizeNearest(img: java.awt.image.BufferedImage,
      outW: Int, outH: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      outW, outH, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < outH) {
      val sy = y * img.getHeight / outH
      var x = 0
      while (x < outW) {
        out.setRGB(x, y, img.getRGB(x * img.getWidth / outW, sy))
        x += 1
      }
      y += 1
    }
    out
  }

  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes != null && bytes.length > 2 &&
      bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      imageIoInMemory
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    } else None

  // ---- frame-sampled "video" containers ------------------------------
  // A deterministic length-prefixed container of BMP frames ("GFV0" +
  // frame count + [len + bytes]*) stands in for a real video codec the
  // JDK lacks; the Spark-side plumbing a video table needs — an opaque
  // multi-frame BINARY column, container parsing on executors, evenly-
  // spaced frame selection, per-frame decode, one output row per sampled
  // frame — is all real.

  private val VideoMagic = Array[Byte]('G', 'F', 'V', '0')

  /** Pack each document as an n-frame video: frame f is the BMP of
    * `text#<f>` (distinct deterministic pixels per frame). */
  def packVideos(docs: DataFrame, nFrames: Int): DataFrame = {
    require(nFrames >= 1, s"nFrames $nFrames < 1")
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("n_bytes", IntegerType),
        StructField("n_frames", IntegerType),
        StructField("mime", StringType))))))
    val rdd = docs.select("doc_id", "text").rdd.mapPartitions { it =>
      it.map { r =>
        val text = if (r.isNullAt(1)) null else r.getString(1)
        if (text == null) Row(r.getLong(0), null, Row(null, null, "video/x-graft"))
        else {
          val baos = new java.io.ByteArrayOutputStream()
          val out = new java.io.DataOutputStream(baos)
          out.write(VideoMagic)
          out.writeInt(nFrames)
          var f = 0
          while (f < nFrames) {
            val frame = renderBmp(s"$text#$f")
            out.writeInt(frame.length)
            out.write(frame)
            f += 1
          }
          out.flush()
          val bytes = baos.toByteArray
          Row(r.getLong(0), bytes, Row(bytes.length, nFrames, "video/x-graft"))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Sample `k` evenly spaced frames from each video payload and decode
    * each to its feature vector — one output row per (doc, sampled
    * frame). Selection is the deterministic endpoint-inclusive grid
    * `idx_i = floor(i·(n-1)/(k-1))` (first and last frame always kept;
    * k=1 keeps the first), clamped to k ≤ n. Malformed or NULL payloads
    * yield zero rows — a corrupt container must not kill a 100 TB scan
    * (same fall-through contract as [[decodeFeature]]). */
  def sampleFrames(videos: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k $k < 1")
    val spark = videos.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val rdd = videos.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        parseVideo(r.getAs[Array[Byte]](1)) match {
          case Some(frames) =>
            val n = frames.length
            val kk = math.min(k, n)
            val picks =
              if (kk == 1) Seq(0)
              else (0 until kk).map(i => i * (n - 1) / (kk - 1))
            picks.map(i => Row(id, i, decodeFeature(frames(i))))
          case None => Seq.empty
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Container parse: None for NULL/short/wrong-magic/truncated
    * payloads, Some(frame byte arrays) otherwise. */
  private[operators] def parseVideo(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (bytes == null || bytes.length < 8 ||
      !VideoMagic.indices.forall(i => bytes(i) == VideoMagic(i))) return None
    try {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes, 4, bytes.length - 4))
      val n = in.readInt()
      if (n < 0 || n > (1 << 20)) return None
      Some(Array.fill(n) {
        val len = in.readInt()
        val frame = new Array[Byte](len)
        in.readFully(frame)
        frame
      })
    } catch { case _: Exception => None }
  }

  /** Byte-fold fallback for payloads without a JDK codec: fold bytes into
    * FeatureDim accumulators (deterministic so tests can golden it). */
  private[graft] def fakeFeature(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      acc(i % FeatureDim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }
}
