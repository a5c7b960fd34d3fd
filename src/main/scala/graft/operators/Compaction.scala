package graft.operators

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the stand-in
  * for the reference's `pipelines.autoOptimize.managed` table property
  * (diabetes_etl_pipeline.py:49-52), which Databricks implements as
  * background OPTIMIZE. Streaming appends and per-batch dynamic partition
  * overwrites accumulate files far below the scan-efficient size; a scan
  * of 10k tiny files pays 10k footer reads and schedules 10k splits.
  *
  * `compact` rewrites a directory to ~`targetBytes` files:
  *   1. heal any crashed previous rewrite ([[AtomicSwap.recover]]);
  *   2. read the current snapshot and write it `coalesce`d to a sibling
  *      temp dir (coalesce, not repartition: no shuffle, just fewer
  *      write tasks);
  *   3. swap directories ([[AtomicSwap.replace]] — rename-based with
  *      crash recovery on the next pass).
  *
  * An empty or not-yet-written table is a NO-OP, not an error — a
  * maintenance sweep must skip tables that produced no rows yet.
  *
  * Returns (filesBefore, filesAfter).
  */
object Compaction {

  private def parquetFiles(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).toSeq
    } finally s.close()
  }

  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    AtomicSwap.recover(dir)
    val live = Paths.get(dir)
    val before = parquetFiles(live)
    if (before.isEmpty) return (0, 0)
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = dir + ".compact_tmp"
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp)
    AtomicSwap.replace(dir, tmp)

    (before.size, parquetFiles(live).size)
  }
}
