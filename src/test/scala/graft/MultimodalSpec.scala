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
}
