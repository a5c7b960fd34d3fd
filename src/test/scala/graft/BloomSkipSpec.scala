package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Per-file Bloom-filter indexes ([[TxLog.BloomIndex]]): on a table
  * whose key is NOT clustered or partitioned (round-robin layout, so
  * every file's min/max spans the whole key space and range stats
  * cannot discriminate), equality/IN file skipping probes the sidecar
  * filters — keyed DELETE and MERGE discovery open only the files that
  * can hold the keys. Soundness: a bloom miss is a proof of absence
  * (no false negatives); missing sidecars, type-mismatched literals,
  * and lossy renders never prune. Sidecars die with their data file. */
class BloomSkipSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-bloom").toString + "/t"

  /** 4 round-robin files: file j holds ids ≡ j (mod 4), so every
    * file's id range spans [j, 4n+j] — range pruning is useless. */
  private def roundRobin(dir: String, n: Int = 400): Unit = {
    import spark.implicits._
    val rows = (0 until n).map(i => (i.toLong, s"v$i"))
    TxLog.append(spark, dir, rows.filter(_._1 % 4 == 0).toDF("id", "s").coalesce(1))
    TxLog.setProperties(dir, Map(TxLog.BloomIndex.Columns -> "id",
      TxLog.BloomIndex.Bits -> (1 << 16).toString))
    (1 to 3).foreach(j => TxLog.append(spark, dir,
      rows.filter(_._1 % 4 == j).toDF("id", "s").coalesce(1)))
  }

  private def mergeScans(dir: String): Seq[Long] =
    TxLog.history(spark, dir).where("op = 'merge'").orderBy("version")
      .select(element_at(col("metrics"), "files_scanned"))
      .collect().toSeq.map(_.getLong(0))

  test("merge discovery on a round-robin table: blooms prune where ranges cannot") {
    import spark.implicits._
    val dir = tmp()
    roundRobin(dir)
    // keys 8 and 16 are both ≡ 0 (mod 4): live only in the first file.
    // Every file's range spans [0..399], so only the bloom discriminates
    // — but the FIRST file predates the property and has no sidecar, so
    // it always survives (fallback); the other three are bloom-pruned.
    TxLog.merge(spark, dir, Seq((8L, "U8"), (16L, "U16")).toDF("id", "s"), "id")
    assert(mergeScans(dir) === Seq(1L))
    val got = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(8L) === "U8" && got(16L) === "U16" && got.size === 400)
    // keys in two residue classes (1 and 3): their two files scanned,
    // plus the sidecar-less first file (fallback always survives)
    TxLog.merge(spark, dir, Seq((9L, "U9"), (19L, "U19")).toDF("id", "s"), "id")
    assert(mergeScans(dir).last === 3L)
  }

  test("keyed DELETE and SQL point lookup ride the same bloom skip") {
    import spark.implicits._
    val dir = tmp()
    roundRobin(dir)
    // all four files carry sidecars after a plain OPTIMIZE (outputs are
    // re-bloomed); cluster nothing — layout stays key-interleaved
    TxLog.optimize(spark, dir, targetBytes = 1L)
    val before = TxLog.read(spark, dir).count()
    TxLog.delete(spark, dir, "id = 13")
    assert(TxLog.read(spark, dir).count() === before - 1)
    val m = TxLog.history(spark, dir).where("op = 'delete'")
      .select(element_at(col("metrics"), "rows_deleted")).head().getLong(0)
    assert(m === 1L)
  }

  test("soundness: present keys are never bloom-pruned (seeded sweep)") {
    import spark.implicits._
    val dir = tmp()
    roundRobin(dir, n = 200)
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(30)(rnd.nextInt(200).toLong).distinct
    keys.foreach { k =>
      // a DELETE of a present key must land — a false negative in the
      // bloom would silently keep the row
      val pre = TxLog.read(spark, dir).where(s"id = $k").count()
      assert(pre === 1L, s"fixture: key $k should be present once")
      TxLog.delete(spark, dir, s"id = $k")
      assert(TxLog.read(spark, dir).where(s"id = $k").count() === 0L,
        s"bloom pruned a file holding id=$k")
    }
  }

  test("type-mismatched literal never wrongly prunes (double column, int literal)") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir,
      (0 until 50).map(i => (i.toDouble, s"v$i")).toDF("d", "s").coalesce(1))
    TxLog.setProperties(dir, Map(TxLog.BloomIndex.Columns -> "d"))
    TxLog.append(spark, dir,
      (50 until 100).map(i => (i.toDouble, s"v$i")).toDF("d", "s").coalesce(1))
    // the stats render 5.0 as "5.0"; a probe of the int literal's canon
    // "5" must re-render under the column type before hashing — a raw
    // probe would miss and silently skip the file holding the row
    TxLog.delete(spark, dir, "d = 55")
    assert(TxLog.read(spark, dir).where("d = 55.0").count() === 0L)
    assert(TxLog.read(spark, dir).count() === 99L)
  }

  test("sidecars exist per (file, column), survive commits, die with VACUUM") {
    import spark.implicits._
    val dir = tmp()
    roundRobin(dir)
    val withSidecars = TxLog.snapshot(dir).files
      .filter(f => Files.exists(Paths.get(dir, "_bloom", s"${f.path}.id.bloom")))
    assert(withSidecars.size === 3) // the 3 appends after the property
    // OPTIMIZE consumes the old files; vacuum reclaims them AND their
    // sidecars (no orphaned _bloom entries for dead files)
    TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    val deadWithSidecar = withSidecars.head.path
    TxLog.vacuum(dir, retainVersions = 1)
    assert(!Files.exists(Paths.get(dir, deadWithSidecar)))
    assert(!Files.exists(Paths.get(dir, "_bloom", s"$deadWithSidecar.id.bloom")))
    // the surviving compacted file carries a fresh sidecar and reads fine
    val live = TxLog.snapshot(dir).files
    assert(live.forall(f =>
      Files.exists(Paths.get(dir, "_bloom", s"${f.path}.id.bloom"))))
    assert(TxLog.read(spark, dir).count() === 400L)
  }

  test("CLONE links sidecars with the files; clone skipping stays sharp") {
    import spark.implicits._
    val dir = tmp()
    roundRobin(dir)
    val dst = tmp()
    TxLog.shallowClone(dir, dst)
    // the 3 sidecar-bearing files carried their blooms into the clone
    val cloned = TxLog.snapshot(dst).files
      .count(f => Files.exists(Paths.get(dst, "_bloom", s"${f.path}.id.bloom")))
    assert(cloned === 3)
    TxLog.merge(spark, dst, Seq((8L, "C8")).toDF("id", "s"), "id")
    assert(mergeScans(dst) === Seq(1L))
    // source vacuum cannot break the clone's sidecars (hard links)
    TxLog.optimize(spark, dir, targetBytes = 1L << 30)
    TxLog.vacuum(dir, retainVersions = 1)
    assert(TxLog.snapshot(dst).files.forall(f =>
      !Files.exists(Paths.get(dst, "_bloom", s"${f.path}.id.bloom")) ||
        Files.readAllBytes(Paths.get(dst, "_bloom", s"${f.path}.id.bloom")).nonEmpty))
    assert(TxLog.read(spark, dst).where("id = 8").head().getString(1) === "C8")
  }

  test("a table without the property never builds or consults sidecars") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, (0 until 20).map(i => (i.toLong, s"v$i"))
      .toDF("id", "s").coalesce(1))
    TxLog.append(spark, dir, (20 until 40).map(i => (i.toLong, s"v$i"))
      .toDF("id", "s").coalesce(1))
    assert(!Files.exists(Paths.get(dir, "_bloom")))
    TxLog.delete(spark, dir, "id = 5")
    assert(TxLog.read(spark, dir).count() === 39L)
  }
}
