package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet table directories — the stand-in
  * for the reference's `pipelines.autoOptimize.managed` table property
  * (diabetes_etl_pipeline.py:49-52), which Databricks implements as
  * background OPTIMIZE. Streaming appends and per-batch dynamic partition
  * overwrites accumulate files far below the scan-efficient size; a scan
  * of 10k tiny files pays 10k footer reads and schedules 10k splits.
  *
  * `compact` rewrites a directory to ~`targetBytes` files:
  *   1. read the current snapshot;
  *   2. write it `coalesce`d to a sibling temp dir (full parallelism up
  *      to the target file count — coalesce, not repartition: no shuffle,
  *      just fewer write tasks);
  *   3. atomically swap directories (rename old → trash, temp → live,
  *      delete trash). Readers opening the path mid-swap see either the
  *      old or the new complete directory on a POSIX filesystem; on an
  *      object store you would use a manifest/table format instead —
  *      that trade is exactly why Delta exists, and this operator is the
  *      plain-parquet approximation of it.
  *
  * Returns (filesBefore, filesAfter).
  */
object Compaction {

  private def parquetFiles(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => p.toString.endsWith(".parquet")).toSeq
    } finally s.close()
  }

  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20): (Int, Int) = {
    val live = Paths.get(dir)
    val before = parquetFiles(live)
    val totalBytes = before.map(Files.size).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val tmp = Paths.get(dir + ".compact_tmp")
    val trash = Paths.get(dir + ".compact_old")
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)

    Files.move(live, trash, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    // best-effort trash cleanup (data is already live in the new dir)
    parquetFiles(trash).foreach(Files.delete)
    Files.walk(trash).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p): Unit)

    (before.size, parquetFiles(live).size)
  }
}
