package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Type-mismatch soundness of DML file pruning, and the bounded merge
  * touch discovery built on it.
  *
  * The invariant under test: pruning is an OPTIMIZATION, never a
  * correctness dependency — a literal whose type differs from the
  * column's (int literal on a double partition, string date on a
  * timestamp column) must either canonicalize into the column's stats
  * domain or not prune at all. The regression shapes here previously
  * pruned files that HELD matching rows, silently skipping their
  * deletes/updates. Sharpness is asserted with the corrupt-foreign-file
  * probe: a partition's data file is overwritten with garbage in place,
  * so any scan that opens it fails loudly — a passing DML proves the
  * pruning actually skipped it. */
class DmlPruneTypeSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-dmlprune").toString + "/t"

  private def corrupt(dir: String, rel: String): Unit =
    Files.write(Paths.get(dir, rel), "not parquet".getBytes): Unit

  /** Corrupt `rels` in place for the duration of `body` (any scan that
    * opens one fails loudly — a passing body proves pruning skipped
    * them), then RESTORE the original bytes so follow-up reads can
    * verify the data outcome. */
  private def withCorrupted[A](dir: String, rels: Seq[String])(body: => A): A = {
    val saved = rels.map(r => r -> Files.readAllBytes(Paths.get(dir, r)))
    rels.foreach(corrupt(dir, _))
    try body
    finally saved.foreach { case (r, b) => Files.write(Paths.get(dir, r), b): Unit }
  }

  test("int literal on a double partition column: DELETE/UPDATE still land") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 7.0), (4L, 7.0))
      .toDF("id", "c")
    TxLog.appendPartitioned(spark, dir, df, Seq("c"))
    // pv is "5.0"; the parsed literal canon used to be "5" — the string
    // mismatch pruned the matching partition and the DELETE no-opped
    TxLog.delete(spark, dir, "c = 5 AND id = 1")
    assert(TxLog.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(2L, 3L, 4L))
    TxLog.update(spark, dir, "c = 5", Map("id" -> "id + 10"))
    assert(TxLog.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(12L, 3L, 4L))
  }

  test("int literal on a double partition still PRUNES foreign partitions") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 7.0), (4L, 7.0))
      .toDF("id", "c")
    TxLog.appendPartitioned(spark, dir, df, Seq("c"))
    val foreign = TxLog.snapshot(dir).files.find(_.pv("c") == "7.0").get
    corrupt(dir, foreign.path)
    // typed pv equality matches "5.0" against canon "5" via BigDecimal;
    // the corrupt 7.0 partition must never be opened
    TxLog.delete(spark, dir, "c = 5 AND id = 1")
    assert(TxLog.snapshot(dir).files.exists(_.path == foreign.path),
      "foreign double partition rode through untouched")
  }

  test("string date bound on a timestamp column keeps the midnight row in scope") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-02 10:30:00")))
      .toDF("id", "ts")
    TxLog.append(spark, dir, df.repartition(2, col("id")))
    // canon of the string literal used to be "2026-01-01", which sorts
    // BELOW the stats min "2026-01-01 00:00:00" — the midnight row's
    // file was lexically pruned and the retention delete skipped it
    TxLog.delete(spark, dir, "ts <= '2026-01-01'")
    assert(TxLog.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(2L))
  }

  test("timestamp range pruning stays sharp after the canon fix") {
    import spark.implicits._
    val dir = tmp()
    val old = Seq((1L, java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .toDF("id", "ts")
    val recent = Seq((2L, java.sql.Timestamp.valueOf("2026-06-01 12:00:00")))
      .toDF("id", "ts")
    TxLog.append(spark, dir, old.coalesce(1))
    TxLog.append(spark, dir, recent.coalesce(1))
    val recentFile = TxLog.snapshot(dir).files
      .find(_.stats("ts").min.exists(_.startsWith("2026"))).get
    // a retention delete below the recent file's range must not open it
    withCorrupted(dir, Seq(recentFile.path)) {
      TxLog.delete(spark, dir, "ts < '2025-06-01'")
    }
    assert(TxLog.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(2L), "2025 row deleted; the never-opened 2026 row lives")
  }

  test("numeric literal on a STRING column never prunes (Spark casts the column)") {
    import spark.implicits._
    val dir = tmp()
    // "05" casts to 5 and matches `s = 5` under Spark's coercion, but
    // lexically "05" < "5": an equality filter canonized as "5" would
    // prune the file holding "05" and the delete would silently skip it
    val df = Seq((1L, "05"), (2L, "5"), (3L, "7")).toDF("id", "s")
    TxLog.append(spark, dir, df.repartition(3, col("id")))
    TxLog.delete(spark, dir, "s = 5")
    assert(TxLog.read(spark, dir).select("id").as[Long].collect().toSet
      === Set(3L))
  }

  test("merge on a key-partitioned table opens only matching partitions") {
    import spark.implicits._
    val dir = tmp()
    // partition BY THE MERGE KEY: the ≤64-key IN-list then pv-prunes
    // candidates to exact partition hits
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "x")
    TxLog.appendPartitioned(spark, dir, df, Seq("k"))
    val foreign = TxLog.snapshot(dir).files.filter(_.pv("k") != "2").map(_.path)
    withCorrupted(dir, foreign) {
      TxLog.merge(spark, dir, Seq((2L, "B", 22.0)).toDF("k", "s", "x"), "k")
    }
    val h = TxLog.history(spark, dir).where("op = 'merge'")
      .select(element_at(col("metrics"), "files_scanned"),
        element_at(col("metrics"), "files_touched")).head()
    assert(h.getLong(0) === 1L && h.getLong(1) === 1L)
    assert(TxLog.read(spark, dir).where("k = 2").select("s")
      .head().getString(0) === "B")
  }

  test("merge on an id-clustered table opens O(selectivity) files") {
    import spark.implicits._
    val dir = tmp()
    // 4 appends of disjoint id ranges → per-file id stats are disjoint
    (0 until 4).foreach { i =>
      val part = (i * 100 until (i + 1) * 100)
        .map(j => (j.toLong, s"v$j")).toDF("id", "s")
      TxLog.append(spark, dir, part.coalesce(1))
    }
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size === 4)
    // corrupt every file whose range excludes all batch keys
    val foreign = snap.files.filter(f =>
      !f.stats("id").min.exists(_.toLong <= 190) ||
        !f.stats("id").max.exists(_.toLong >= 105)).map(_.path)
    val batch = Seq((105L, "u105"), (190L, "u190"), (1000L, "new"))
      .toDF("id", "s")
    withCorrupted(dir, foreign) {
      TxLog.merge(spark, dir, batch, "id")
    }
    val h = TxLog.history(spark, dir).where("op = 'merge'")
      .select(element_at(col("metrics"), "files_scanned"),
        element_at(col("metrics"), "files_touched"),
        element_at(col("metrics"), "files_live")).head()
    assert(h.getLong(0) === 1L, "only the [100,199] file is a candidate")
    assert(h.getLong(1) === 1L)
    assert(h.getLong(2) === 4L)
    val got = TxLog.read(spark, dir)
    assert(got.where("id = 105").select("s").head().getString(0) === "u105")
    assert(got.where("id = 1000").count() === 1L)
    assert(got.count() === 401L)
  }

  test("deleteKeys touch discovery is bounded by the erase list's key range") {
    import spark.implicits._
    val dir = tmp()
    (0 until 4).foreach { i =>
      val part = (i * 100 until (i + 1) * 100)
        .map(j => (j.toLong, s"v$j")).toDF("id", "s")
      TxLog.append(spark, dir, part.coalesce(1))
    }
    // corrupt the three files outside the erase list's range [10, 20]
    val foreign = TxLog.snapshot(dir).files.filter(f =>
      f.stats("id").min.exists(_.toLong >= 100)).map(_.path)
    withCorrupted(dir, foreign) {
      TxLog.deleteKeys(spark, dir, Seq(10L, 20L).toDF("id"), "id")
    }
    assert(TxLog.read(spark, dir).count() === 398L)
    assert(TxLog.read(spark, dir).where("id IN (10, 20)").count() === 0L)
  }

  test("merge with an out-of-range batch touches nothing (pure fast append)") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, (0 until 50).map(j => (j.toLong, s"v$j"))
      .toDF("id", "s").coalesce(1))
    // corrupt the only live file: a merge whose keys lie wholly above
    // its id range must not open it at all
    corrupt(dir, TxLog.snapshot(dir).files.head.path)
    TxLog.merge(spark, dir,
      Seq((1000L, "n0"), (1001L, "n1")).toDF("id", "s"), "id")
    val h = TxLog.history(spark, dir).where("op = 'merge'")
      .select(element_at(col("metrics"), "files_scanned")).head()
    assert(h.getLong(0) === 0L)
  }

  test("graft.clusterBy: a plain OPTIMIZE range-clusters, sharpening key-bounded merges") {
    import spark.implicits._
    val dir = tmp()
    // interleaved appends: every file spans nearly the whole key range,
    // so pre-clustering a key-bounded batch intersects all of them
    (0 until 4).foreach { i =>
      val rows = (0 until 400).filter(_ % 4 == i).map(j => (j.toLong, s"v$j"))
      TxLog.append(spark, dir, rows.toDF("id", "s").coalesce(1))
    }
    TxLog.setProperties(dir, Map(TxLog.ClusterBy.Columns -> "id"))
    // targetBytes=1 forces nOut = input file count → 4 range-disjoint files
    val (before, after) = TxLog.optimize(spark, dir, targetBytes = 1L)
    assert(before === 4 && after === 4)
    val snap = TxLog.snapshot(dir)
    // range clustering → per-file id ranges are disjoint
    val ranges = snap.files.map(f =>
      (f.stats("id").min.get.toLong, f.stats("id").max.get.toLong)).sortBy(_._1)
    ranges.sliding(2).foreach { case Seq((_, hi), (lo, _)) => assert(hi < lo) }
    // a key-localized merge now opens exactly one file — the foreign
    // three are corrupted in place to prove they are never read
    val batch = Seq((10L, "u10"), (11L, "u11"), (12L, "u12")).toDF("id", "s")
    val foreign = snap.files.filter(f =>
      f.stats("id").min.get.toLong > 12 || f.stats("id").max.get.toLong < 10)
      .map(_.path)
    assert(foreign.size === 3)
    withCorrupted(dir, foreign) {
      TxLog.merge(spark, dir, batch, "id")
    }
    val m = TxLog.history(spark, dir).where("op = 'merge'")
      .select(element_at(col("metrics"), "files_scanned")).head()
    assert(m.getLong(0) === 1L)
    assert(TxLog.read(spark, dir).where("s LIKE 'u%'").count() === 3L)
  }

  test("graft.clusterBy validates: unknown columns and partitioned tables rejected") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, Seq((1L, "a")).toDF("id", "s"))
    intercept[IllegalArgumentException](
      TxLog.setProperties(dir, Map(TxLog.ClusterBy.Columns -> "nope")))
    val pdir = tmp()
    TxLog.appendPartitioned(spark, pdir,
      Seq((1L, "a", "g0"), (2L, "b", "g1")).toDF("id", "s", "grp"), Seq("grp"))
    intercept[IllegalArgumentException](
      TxLog.setProperties(pdir, Map(TxLog.ClusterBy.Columns -> "id")))
  }

  test("vacuum survives a retainVersions larger than the cleaned log") {
    import spark.implicits._
    val dir = tmp()
    (0 until 8).foreach(i =>
      TxLog.append(spark, dir, Seq((i.toLong, s"v$i")).toDF("id", "s")))
    assert(TxLog.cleanupLog(dir, retainVersions = 3) > 0)
    // retention window (5) exceeds the retained commit count (3): the
    // cut must clamp to the oldest retained commit instead of resolving
    // a cleaned version and throwing
    val reclaimed = TxLog.vacuum(dir, retainVersions = 5)
    assert(reclaimed.isEmpty, "nothing is out of retention")
    assert(TxLog.read(spark, dir).count() === 8L)
  }

  test("INSERT OVERWRITE ... PARTITION works on a timestamp partition column") {
    import spark.implicits._
    val root = graft.Scratch.dir("graft-tscat").toString
    val cat = "tsc" + java.lang.Integer.toHexString(root.hashCode).takeRight(6)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.ev (id BIGINT, ts TIMESTAMP) PARTITIONED BY (ts)")
    spark.sql(s"""INSERT INTO $cat.ev VALUES
      (1, TIMESTAMP '2026-01-01 00:00:00'), (2, TIMESTAMP '2026-01-02 00:00:00')""")
    // java.sql.Timestamp.toString renders '…00:00:00.0', which never
    // equals the stats canon — the overwrite's foreign-row check used
    // to refuse every timestamp-partition INSERT OVERWRITE
    spark.sql(s"""INSERT OVERWRITE $cat.ev
      PARTITION (ts = TIMESTAMP '2026-01-01 00:00:00') (SELECT 10)""")
    val got = spark.sql(s"SELECT id FROM $cat.ev ORDER BY id")
      .as[Long].collect().toSeq
    assert(got === Seq(2L, 10L))
  }

  test("evolving merge whose key column is new rebases cleanly over a winner") {
    import spark.implicits._
    val dir = tmp()
    TxLog.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "s")) // v0
    TxLog.setProperties(dir, Map(TxLog.AutoMerge.Enabled -> "true"))    // v1
    // a concurrent append wins between the merge's read (v1) and publish
    TxLog.append(spark, dir, Seq((3L, "c")).toDF("id", "s"))            // v2
    // the evolving merge's key column `k` is NEW to the table: winners
    // committed under the old schema provably cannot contain it — the
    // rebase must skip the winner key scan instead of failing to
    // resolve `k` against the winner files
    val src = Seq((1L, "a", 100L), (9L, "z", 900L)).toDF("id", "s", "k")
    TxLog.mergeAt(spark, dir, src, "k", readVersion = 1L)
    val got = TxLog.read(spark, dir)
    assert(got.count() === 5L, "2 base + 1 winner + 2 inserted")
    assert(got.where("k IS NOT NULL").count() === 2L)
  }
}
