package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines ingestion — the interchange format LLM corpora actually
  * arrive in (one JSON object per line: crawl dumps, dataset releases,
  * API exports).
  *
  * Production rules, both scale-motivated:
  *  - EXPLICIT schema, never inference: `spark.read.json` without a
  *    schema runs a full extra pass over the corpus just to guess types
  *    (and guesses differently when a field is absent from the sampled
  *    split — a 100 TB ingest cannot afford either);
  *  - PERMISSIVE parse with a corrupt-record column, never FAILFAST or
  *    DROPMALFORMED: real crawls contain broken lines, a 10-hour ingest
  *    must not die at hour 9, and silently dropping rows destroys the
  *    accounting a curation pipeline needs (the reference's
  *    expectation-metrics discipline applied to parse errors). A
  *    malformed line lands with every schema field NULL and the RAW
  *    LINE preserved in `corruptCol` — quarantine and accounting are
  *    then plain filters.
  */
object JsonLines {

  /** Read `path` as JSONL under `schema` + a trailing corrupt-record
    * column. Caveat inherited from Spark's JSON source: a query that
    * references ONLY the corrupt column is rejected by the analyzer —
    * always select at least one data column alongside it (every
    * accounting query naturally does). */
  def read(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already contains $corruptCol")
    spark.read
      .schema(StructType(schema.fields :+ StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
