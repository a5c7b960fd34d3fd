package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Schema evolution on plain parquet sinks: old files without a newly
  * added column must remain readable (mergeSchema union + NULL backfill),
  * and readers pinning an explicit schema must get exactly that schema
  * regardless of file vintage — the two contracts a long-lived 100 TB
  * table depends on when its producer adds a field. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkTestBase {

  test("mergeSchema unions file vintages; explicit schema pins the read") {
    val dir = graft.Scratch.dir("graft-evo").toString
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    // v1 files: two columns; v2 files add quality
    docs.where("doc_id % 2 = 0").select("doc_id", "text")
      .write.parquet(s"$dir/batch=1")
    docs.where("doc_id % 2 = 1").select(col("doc_id"), col("text"),
        length(col("text")).as("quality"))
      .write.parquet(s"$dir/batch=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "batch"))
    assert(merged.count() === docs.count())
    // old-vintage rows surface NULL for the new column, new rows a value
    assert(merged.where("batch = 1 AND quality IS NOT NULL").count() === 0)
    assert(merged.where("batch = 2 AND quality IS NULL").count() === 0)

    // explicit-schema read: consumers pin (doc_id, text) and never see
    // the new data column, whatever vintage the files are (the partition
    // discriminator is always appended by the source)
    val pinned = spark.read
      .schema("doc_id LONG, text STRING")
      .parquet(dir)
    assert(pinned.columns.toSeq === Seq("doc_id", "text", "batch"))
    assert(!pinned.columns.contains("quality"))
    assert(pinned.count() === docs.count())
  }
}
