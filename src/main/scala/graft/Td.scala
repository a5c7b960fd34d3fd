package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Testdata access (TESTDATA.md / FIXTURES.md §B).
  *
  * All parity queries read the driver-generated parquet star schema from a
  * scale-factor directory. Tables are also registered as temp views so SQL
  * queries (CTE, scalar subquery, UNION ALL — SURVEY.md §2.7, §3.3) can run
  * through `spark.sql`.
  */
object Td {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which the vectorized reader
      // rejects; read it as raw nanos and truncate to micros (Spark's
      // native timestamp precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every testdata table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tables.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
}
