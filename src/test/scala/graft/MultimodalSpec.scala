package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}
import graft.operators.MultimodalOps

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "ab"), (2L, "hello world"), (3L, "")).toDF("doc_id", "text")
  }

  test("packDocuments: binary payload + typed metadata struct") {
    val packed = MultimodalOps.packDocuments(docs)
    assert(packed.schema("payload").dataType === BinaryType)
    val meta = packed.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("n_bytes", "content_hash", "mime"))
    val r = packed.filter("doc_id = 2").head()
    assert(r.getAs[Row]("meta") != null)
  }
  private type Row = org.apache.spark.sql.Row

  test("decodeBatch: deterministic fixed-width features, executor-side") {
    val out1 = MultimodalOps.decodeBatch(MultimodalOps.packDocuments(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val out2 = MultimodalOps.decodeBatch(MultimodalOps.packDocuments(docs))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out1 === out2) // deterministic stub
    assert(out1.values.forall(_.length === MultimodalOps.FeatureDim))
    // "ab" = bytes 97, 98 → acc(0)=97/255, acc(1)=98/255, rest 0
    val ab = out1(1L)
    assert(math.abs(ab(0) - 97f / 255f) < 1e-6 && math.abs(ab(1) - 98f / 255f) < 1e-6)
    assert(ab.drop(2).forall(_ === 0f))
    assert(out1(3L).forall(_ === 0f)) // empty payload → zero vector
  }

  test("real decode: a known solid-color BMP yields its true pixel statistics") {
    // Encode a 6x4 image filled with RGB(40, 80, 120) through the JDK BMP
    // writer, then decode through MultimodalOps — the features must be the
    // REAL channel means, proving actual pixel decode (not a byte fold).
    val img = new java.awt.image.BufferedImage(
      6, 4, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, (40 << 16) | (80 << 8) | 120)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    val f = MultimodalOps.decodeFeature(baos.toByteArray)
    assert(f.length === MultimodalOps.FeatureDim)
    assert(f(0) === 6f && f(1) === 4f)
    assert(math.abs(f(2) - 40f / 255f) < 1e-6, s"meanR ${f(2)}")
    assert(math.abs(f(3) - 80f / 255f) < 1e-6, s"meanG ${f(3)}")
    assert(math.abs(f(4) - 120f / 255f) < 1e-6, s"meanB ${f(4)}")
    val gray = (40 + 80 + 120) / 3f / 255f
    assert(math.abs(f(5) - gray) < 1e-2 && math.abs(f(6) - gray) < 1e-2)
    assert(f(7) < 1e-2) // solid color → zero gray stddev
  }

  test("packImages → decodeBatch: genuine BMP payloads, pixel-decoded on executors") {
    val packed = MultimodalOps.packImages(docs.filter("doc_id <= 2"))
    val rows = packed.collect()
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(bytes(0) === 'B'.toByte && bytes(1) === 'M'.toByte)
      assert(r.getAs[Row]("meta").getAs[String]("mime") === "image/bmp")
      // any BMP reader can decode the payload
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth >= 8 && img.getWidth <= 15)
    }
    val feats = MultimodalOps.decodeBatch(packed)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // decoded dims must equal the real image dims, per doc
    rows.foreach { r =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      val f = feats(r.getLong(0))
      assert(f(0) === img.getWidth.toFloat && f(1) === img.getHeight.toFloat)
      // channel means of a hash-derived image are strictly inside (0, 1)
      assert(f(2) > 0f && f(2) < 1f && f(6) > f(5))
    }
    // deterministic end to end
    val again = MultimodalOps.decodeBatch(MultimodalOps.packImages(docs.filter("doc_id <= 2")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again === feats)
  }

  test("decodeFeature: 'BM'-prefixed TEXT payload falls back to byte-fold, no crash") {
    // a text payload can legitimately start with the BMP magic
    val trap = "BMW recall notice: check engine".getBytes("UTF-8")
    val f = MultimodalOps.decodeFeature(trap)
    assert(f.length === MultimodalOps.FeatureDim)
    // byte-fold result, not a decoded image (fold of 31 bytes sums > dims)
    assert(f.sameElements(MultimodalOps.fakeFeature(trap)))
    // and NULL payloads yield the zero vector instead of an NPE
    assert(MultimodalOps.decodeFeature(null).forall(_ === 0f))
  }

  test("packImages: NULL text rows produce null payload/meta, decode survives them") {
    import org.apache.spark.sql.functions.lit
    val withNull = docs.unionByName(
      docs.limit(1).select(lit(99L).as("doc_id"), lit(null).cast("string").as("text")))
    val packed = MultimodalOps.packImages(withNull)
    val nullRow = packed.filter("doc_id = 99").head()
    assert(nullRow.isNullAt(1)) // payload
    val feats = MultimodalOps.decodeBatch(packed).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(99L).forall(_ === 0f))
    assert(feats.size === 4)
  }

  test("withFakeDecode: expression-path metadata stays in plausible ranges") {
    val out = MultimodalOps.withFakeDecode(MultimodalOps.packDocuments(docs)).collect()
    out.foreach { r =>
      val w = r.getAs[Long]("img_w"); val h = r.getAs[Long]("img_h")
      assert(w >= 160 && w <= 160 + 15 * 32)
      assert(h >= 120 && h <= 120 + 15 * 24)
      val f = r.getAs[Int]("n_frames")
      assert(f >= 1 && f <= 7)
    }
  }

  test("decodeBatch output schema: array<float> feature column") {
    val out = MultimodalOps.decodeBatch(MultimodalOps.packDocuments(docs))
    assert(out.schema("feature").dataType === ArrayType(FloatType, containsNull = false))
  }

  test("metadata-only plans prune the binary payload at the parquet scan") {
    import org.apache.spark.sql.functions.col
    val real = Td.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = graft.Scratch.dir("graft-mm").toString
    MultimodalOps.packDocuments(real).write.mode("overwrite").parquet(dir)
    val qe = spark.read.parquet(dir)
      .select(col("doc_id"), col("meta.n_bytes"))
      .queryExecution
    val scan = qe.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    // payload (the dominant bytes of a media table) must not be read
    assert(!scan.requiredSchema.fieldNames.contains("payload"),
      scan.requiredSchema.treeString)
  }

  test("mapPartitions decode path: 40x corpus within wall-clock budget, rows preserved") {
    import org.apache.spark.sql.functions._
    val real = Td.load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    val big = real.crossJoin(spark.range(40).select(col("id").as("copy")))
      .select((col("doc_id") + col("copy") * 100000L).as("doc_id"),
        concat(col("text"), lit(" c"), col("copy")).as("text"))
    val t0 = System.nanoTime()
    // real-codec path: 40× corpus → BMP-encode then pixel-decode each doc
    val decoded = MultimodalOps.decodeBatch(MultimodalOps.packImages(big))
    val n = decoded.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === big.count())
    // local[4] CI budget — catches an accidental collect()/driver loop,
    // not a perf benchmark.
    assert(secs < 60, s"decodeBatch on ${n} payloads took ${secs}s")
    // features remain fixed-width and non-degenerate at scale
    val stats = decoded.select(
      min(size(col("feature"))), max(size(col("feature"))),
      sum(expr("aggregate(feature, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"))).head()
    assert(stats.getInt(0) === MultimodalOps.FeatureDim)
    assert(stats.getInt(1) === MultimodalOps.FeatureDim)
    assert(stats.getDouble(2) > 0.0)
  }

  private def solidBmp(w: Int, h: Int, fill: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", baos)
    baos.toByteArray
  }

  test("resizeBatch: exact nearest-neighbor pixels; non-image rows pass through flagged") {
    import spark.implicits._
    // 2x2 quadrant image: each quadrant of the 4x4 upscale must be the
    // EXACT source pixel (nearest-neighbor goldens, no filter tolerance)
    val quads = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val bmp = solidBmp(2, 2, (x, y) => quads(y * 2 + x))
    val packed = Seq(
      (1L, bmp),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    val out = MultimodalOps.resizeBatch(packed, 4, 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]]("payload"), r.getBoolean(4)))).toMap
    assert(out(1)._2 === true)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1)._1))
    assert(img.getWidth === 4 && img.getHeight === 4)
    for (y <- 0 until 4; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) === quads((y / 2) * 2 + x / 2), s"($x,$y)")
    // passthrough rows: untouched bytes, resized=false
    assert(out(2)._2 === false && out(2)._1.toSeq === "not an image".getBytes("UTF-8").toSeq)
    assert(out(3)._2 === false && out(3)._1 === null)
  }

  test("packVideos → sampleFrames: evenly spaced frames, per-frame real decode") {
    import spark.implicits._
    val vids = MultimodalOps.packVideos(Seq((7L, "clip a")).toDF("doc_id", "text"), 10)
    val meta = vids.head()
    assert(meta.getAs[Row]("meta").getInt(1) === 10)
    val got = MultimodalOps.sampleFrames(vids, 3)
      .collect().map(r => (r.getInt(1), r.getSeq[Float](2))).toMap
    // endpoint-inclusive grid over n=10, k=3 → frames 0, 4, 9
    assert(got.keySet === Set(0, 4, 9))
    // each sampled frame decodes to the SAME features as its standalone BMP
    for (i <- Seq(0, 4, 9)) {
      val frame = MultimodalOps.renderBmp(s"clip a#$i")
      assert(got(i) === MultimodalOps.decodeFeature(frame).toSeq, s"frame $i")
    }
  }

  test("sampleFrames: k=1 keeps frame 0; k>n clamps; corrupt/NULL payloads yield no rows") {
    import spark.implicits._
    val vids = MultimodalOps.packVideos(Seq((1L, "x")).toDF("doc_id", "text"), 4)
    assert(MultimodalOps.sampleFrames(vids, 1)
      .collect().map(_.getInt(1)).toSeq === Seq(0))
    assert(MultimodalOps.sampleFrames(vids, 99)
      .collect().map(_.getInt(1)).sorted.toSeq === Seq(0, 1, 2, 3))
    val bad = Seq(
      (1L, "GFV0junk".getBytes("UTF-8")),
      (2L, "tiny".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    assert(MultimodalOps.sampleFrames(bad, 2).count() === 0L)
  }
}
