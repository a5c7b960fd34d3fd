package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also writes `diag.json`: per query, row count + per-column
  * {type, min, max, nulls} + the first rows rendered as strings. When the
  * driver's oracle environment disagrees with a local run (round-3's
  * q90/q99/q100 hash-only mismatches were undiagnosable), this gives the
  * next judge a value-level view of what THIS side produced, so the diff
  * can be located without rerunning anything.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    Scratch.install("verify") // before the session: temp dirs under one root
    // Optional 3rd arg: comma-separated query names — dev-loop subset runs
    // (check.py compares only the output dirs present, so this composes).
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    /** One query's value-level fingerprint, computed from the parquet just
      * written (so it describes EXACTLY what the driver will compare).
      * One aggregation job (row count folded in with the per-column
      * stats) plus one limit-collect for the sample. */
    def diag(df: DataFrame): String = {
      import org.apache.spark.sql.functions._
      val cols = df.schema.fields
      val aggs = count(lit(1)).as("__rows") +: cols.toSeq.flatMap { f =>
        val c = col(f.name)
        Seq(min(c).cast("string").as(s"min_${f.name}"),
          max(c).cast("string").as(s"max_${f.name}"),
          sum(when(c.isNull, 1L).otherwise(0L)).as(s"null_${f.name}"))
      }
      val statRow = df.agg(aggs.head, aggs.tail: _*).head()
      val nRows = statRow.getLong(0)
      val colJson = cols.zipWithIndex.map { case (f, i) =>
        val (mn, mx, nl) =
          if (nRows == 0) ("", "", 0L)
          else (Option(statRow.getString(3 * i + 1)).getOrElse("null"),
            Option(statRow.getString(3 * i + 2)).getOrElse("null"),
            statRow.getLong(3 * i + 3))
        s"""{"name": ${q(f.name)}, "type": ${q(f.dataType.simpleString)}, "min": ${q(mn)}, "max": ${q(mx)}, "nulls": $nl}"""
      }.mkString("[", ",", "]")
      val sample = df.limit(5).collect().map { r =>
        q((0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|"))
      }.mkString("[", ",", "]")
      s"""{"rows": $nRows, "columns": $colJson, "sample": $sample}"""
    }

    val diags = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // Two SEPARATE failure domains: a query failure means the driver
      // compare will be red; a diag-only failure must NOT be recorded as
      // one (the parquet was written and will compare green) — it gets
      // its own diag_error marker instead.
      val wrote =
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          true
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          diags += s"${q(name)}: {\"rows\": -1, \"error\": ${q(String.valueOf(e.getMessage))}}"
          false
        }
      if (wrote) {
        try diags += s"${q(name)}: ${diag(spark.read.parquet(s"$outDir/$name"))}"
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name diag failed (query output intact): ${e.getMessage}")
          diags += s"${q(name)}: {\"diag_error\": ${q(String.valueOf(e.getMessage))}}"
        }
      }
      // Drop caches left by cache-returning operators (Dedup.clusters)
      // so a 100-query dump doesn't accumulate resident blocks.
      spark.catalog.clearCache()
      // Memory-sink temp views from finished streaming queries pin
      // their rows for the SESSION; drop them so later queries don't
      // run under someone else's retained state.
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name): Unit)
    }
    Files.writeString(Paths.get(s"$outDir/diag.json"),
      diags.mkString("{", ",\n", "}"))
    val json = (SparkEntry.oracleSql ++ SparkEntry.dynamicOracleSql(spark, sfDir))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
