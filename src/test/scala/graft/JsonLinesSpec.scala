package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JsonLines

/** JSONL ingest contract: valid lines parse under the pinned schema,
  * sparse lines fill NULL, broken lines survive with the raw text in
  * the corrupt column — nothing is dropped, nothing kills the read. */
class JsonLinesSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType),
    StructField("score", DoubleType)))

  test("valid, sparse, and broken lines all land; accounting is a filter") {
    val dir = graft.Scratch.dir("graft-jsonl").toString
    Files.writeString(Paths.get(dir, "a.jsonl"),
      """{"id": 1, "text": "hello", "score": 0.5}
        |{"id": 2, "text": "sparse"}
        |{"id": 3, BROKEN
        |not json at all
        |{"id": 4, "text": "ok", "score": 1.25, "extra": "ignored"}
        |""".stripMargin)
    // one full-width collect: Spark's analyzer rejects queries whose
    // referenced columns are ONLY the corrupt column (the documented
    // source caveat) — accounting queries must carry a data column
    val rows = JsonLines.read(spark, dir, schema).collect()
    assert(rows.length === 5, "no line may be dropped")
    val good = rows.filter(_.isNullAt(3))
    assert(good.length === 3)
    assert(good.find(_.getLong(0) == 2L).get.isNullAt(2), "missing field fills NULL")
    assert(good.find(_.getLong(0) == 4L).get.getDouble(2) === 1.25,
      "unknown extra fields are ignored under the pinned schema")
    val bad = rows.filter(!_.isNullAt(3)).map(_.getString(3)).toSet
    assert(bad === Set("""{"id": 3, BROKEN""", "not json at all"),
      s"broken lines must preserve their raw text: $bad")
  }

  test("rejects a schema that already claims the corrupt column") {
    assertThrows[IllegalArgumentException](
      JsonLines.read(spark, "/tmp/nowhere",
        schema.add(StructField("_corrupt_record", StringType))))
  }
}
