package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Partition evolution ([[TxLog.setPartitioning]]): change the table's
  * partition columns without rewriting data. Old-generation files keep
  * their truthful pv (or none); every consumer classifies them by
  * stats plus a row-level guard; new writes align to the new layout;
  * plain OPTIMIZE migrates the table to all-new-generation pv. Time
  * travel keeps each version's own layout. */
class TxPartitionEvolutionSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txpevo").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", s"g${i % 3}")).toDF("id", "s", "grp")
  }

  private def idSet(d: org.apache.spark.sql.DataFrame): Set[Long] =
    d.select("id").collect().map(_.getLong(0)).toSet

  private def corrupt(dir: String, relPath: String): Unit =
    Files.write(Paths.get(dir, relPath), Array[Byte](0, 1, 2, 3),
      StandardOpenOption.TRUNCATE_EXISTING)

  test("unpartitioned -> partitioned: new writes align, OPTIMIZE migrates") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30))         // legacy, pv-less
    val v = TxLog.setPartitioning(dir, Seq("grp"))
    assert(TxLog.partitionColsOf(TxLog.snapshot(dir)) === Seq("grp"))
    TxLog.append(spark, dir, df(30 until 60))        // new generation
    val snap = TxLog.snapshot(dir)
    val (legacy, aligned) = snap.files.partition(_.pv.isEmpty)
    assert(legacy.nonEmpty && aligned.nonEmpty)
    assert(aligned.map(_.pv("grp")).toSet === Set("g0", "g1", "g2"))
    // mixed-generation partition read: complete (row-wise guard on the
    // legacy files), and it never OPENS a foreign new-generation file
    val foreignNew = aligned.find(_.pv("grp") == "g2").get
    val origBytes = Files.readAllBytes(Paths.get(dir, foreignNew.path))
    corrupt(dir, foreignNew.path)
    assert(idSet(TxLog.readPartition(spark, dir, Map("grp" -> "g1"))) ===
      (0L until 60L).filter(_ % 3 == 1).toSet)
    // history records the evolution as its own operation
    assert(TxLog.history(spark, dir).collect()
      .exists(r => r.getLong(0) == v && r.getString(1) == "setPartitioning"))
    Files.write(Paths.get(dir, foreignNew.path), origBytes) // un-corrupt
    TxLog.optimize(spark, dir)
    val migrated = TxLog.snapshot(dir)
    assert(migrated.files.filter(_.rows > 0).forall(_.pv.contains("grp")),
      "plain OPTIMIZE must restage under the current layout")
    // post-migration: O(1) foreign pruning — corrupt one partition,
    // read another
    val g0 = migrated.files.filter(_.rows > 0).find(_.pv("grp") == "g0").get
    corrupt(dir, g0.path)
    assert(idSet(TxLog.readPartition(spark, dir, Map("grp" -> "g1"))) ===
      (0L until 60L).filter(_ % 3 == 1).toSet)
  }

  test("repartition a -> b: both generations' pv stay truthful for pruning") {
    import spark.implicits._
    val dir = tmp()
    val d = (0 until 40).map(i =>
      (i.toLong, s"g${i % 2}", s"h${i % 4}")).toDF("id", "a", "b")
    TxLog.appendPartitioned(spark, dir, d, Seq("a"))
    TxLog.setPartitioning(dir, Seq("b"))
    val d2 = (40 until 80).map(i =>
      (i.toLong, s"g${i % 2}", s"h${i % 4}")).toDF("id", "a", "b")
    TxLog.append(spark, dir, d2)
    val snap = TxLog.snapshot(dir)
    // old files pv-keyed by a, new by b
    assert(snap.files.exists(f => f.pv.keySet == Set("a")))
    assert(snap.files.exists(f => f.pv.keySet == Set("b")))
    // a filter on the OLD partition column still prunes old-generation
    // files by pv: count survivors for a = g0
    val eqA = Seq(org.apache.spark.sql.sources.EqualTo("a", "g0"))
    val survA = TxLog.pruneByFilters(snap, eqA)
    val oldForeign = snap.files.filter(f => f.pv.get("a").contains("g1"))
    assert(oldForeign.nonEmpty && !survA.exists(oldForeign.contains(_)))
    // and a filter on the NEW column prunes new-generation files by pv
    val eqB = Seq(org.apache.spark.sql.sources.EqualTo("b", "h1"))
    val survB = TxLog.pruneByFilters(snap, eqB)
    val newForeign = snap.files.filter(f =>
      f.pv.get("b").exists(_ != "h1"))
    assert(newForeign.nonEmpty && !survB.exists(newForeign.contains(_)))
    // full-table correctness across generations
    assert(idSet(TxLog.read(spark, dir)) === (0L until 80L).toSet)
    assert(idSet(TxLog.readPartition(spark, dir, Map("b" -> "h1"))) ===
      (0L until 80L).filter(_ % 4 == 1).toSet)
  }

  test("dynamic partition overwrite replaces legacy straddlers after evolution") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 30))          // legacy straddles all grps
    TxLog.setPartitioning(dir, Seq("grp"))
    import spark.implicits._
    val repl = Seq((1000L, "r", "g1")).toDF("id", "s", "grp")
    TxLog.overwritePartitions(spark, dir, repl)
    // g1 is exactly the replacement; g0/g2 rows from the legacy files kept
    assert(idSet(TxLog.readPartition(spark, dir, Map("grp" -> "g1"))) === Set(1000L))
    assert(idSet(TxLog.read(spark, dir)) ===
      ((0L until 30L).filterNot(_ % 3 == 1).toSet + 1000L))
  }

  test("un-partition: new appends unaligned; partition ops refuse") {
    val dir = tmp()
    TxLog.appendPartitioned(spark, dir, df(0 until 12), Seq("grp"))
    TxLog.setPartitioning(dir, Nil)
    assert(TxLog.partitionColsOf(TxLog.snapshot(dir)).isEmpty)
    TxLog.append(spark, dir, df(12 until 24))
    val snap = TxLog.snapshot(dir)
    assert(snap.files.exists(_.pv.isEmpty), "post-evolution appends are unaligned")
    intercept[IllegalArgumentException](
      TxLog.overwritePartitions(spark, dir, df(0 until 3)))
    assert(idSet(TxLog.read(spark, dir)) === (0L until 24L).toSet)
  }

  test("time travel keeps each version's own layout") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 6))           // v0, unpartitioned
    val v = TxLog.setPartitioning(dir, Seq("grp"))
    assert(TxLog.partitionColsOf(TxLog.snapshot(dir, Some(v - 1))).isEmpty)
    assert(TxLog.partitionColsOf(TxLog.snapshot(dir, Some(v))) === Seq("grp"))
  }

  test("refusals: unknown column, duplicates, clusterBy, raw property; no-op") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 6))
    intercept[IllegalArgumentException](TxLog.setPartitioning(dir, Seq("nope")))
    intercept[IllegalArgumentException](
      TxLog.setPartitioning(dir, Seq("grp", "grp")))
    TxLog.setProperties(dir, Map(TxLog.ClusterBy.Columns -> "id"))
    intercept[IllegalArgumentException](TxLog.setPartitioning(dir, Seq("grp")))
    TxLog.setProperties(dir, Map(TxLog.ClusterBy.Columns -> ""))
    intercept[IllegalArgumentException](
      TxLog.setProperties(dir, Map("graft.partitionColumns" -> "grp")))
    val v = TxLog.setPartitioning(dir, Seq("grp"))
    assert(TxLog.setPartitioning(dir, Seq("grp")) === v, "no-op returns current")
  }

  test("hidden partitioning by evolution: generated column becomes the layout") {
    import spark.implicits._
    val dir = tmp()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows1 = for (d <- 0 until 3; i <- 0 until 10) yield
      (d * 10L + i, ts(f"2026-03-${d + 10}%02d 08:00:00"))
    TxLog.append(spark, dir, rows1.toDF("id", "ts"))          // plain table
    // retrofit Iceberg-style hidden partitioning onto the EXISTING table:
    // widen with the transform column, BACKFILL it (generated columns
    // are materialized — the one unavoidable rewrite), declare it
    // generated, then evolve the layout onto it
    TxLog.addColumns(dir, Seq(org.apache.spark.sql.types.StructField(
      "day", org.apache.spark.sql.types.DateType)))
    TxLog.update(spark, dir, "TRUE", Map("day" -> "date(ts)"))
    TxLog.addGeneratedColumn(spark, dir, "day", "date(ts)")
    TxLog.setPartitioning(dir, Seq("day"))
    val rows2 = for (d <- 0 until 3; i <- 0 until 10) yield
      (100 + d * 10L + i, ts(f"2026-03-${d + 10}%02d 17:00:00"))
    TxLog.append(spark, dir, rows2.toDF("id", "ts"))          // omits day: computed
    val snap = TxLog.snapshot(dir)
    val aligned = snap.files.filter(_.pv.contains("day"))
    assert(aligned.map(_.pv("day")).toSet ===
      Set("2026-03-10", "2026-03-11", "2026-03-12"))
    // predicate DERIVATION: a filter on the BASE column prunes via the
    // generated partition column's pv (new generation) + stats (legacy)
    val eqTs = Seq(org.apache.spark.sql.sources.EqualTo(
      "ts", ts("2026-03-11 17:00:00")))
    val surv = TxLog.pruneByFilters(snap, eqTs)
    val foreignNew = aligned.filter(_.pv("day") != "2026-03-11")
    assert(foreignNew.nonEmpty && !surv.exists(foreignNew.contains(_)),
      "base-column equality must prune foreign partitions via derived pv")
    // full correctness across generations
    assert(idSet(TxLog.read(spark, dir)) ===
      (rows1.map(_._1) ++ rows2.map(_._1)).toSet)
  }

  test("CALL set_partitioning from SQL") {
    val root = graft.Scratch.dir("graft-pevo-sql").toString
    val cat = "pev" + java.lang.Integer.toHexString(root.hashCode).takeRight(7)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    TxLog.append(spark, s"$root/t", df(0 until 12))
    val out = spark.sql(
      s"CALL $cat.set_partitioning(`table` => 't', columns => 'grp')").collect()
    assert(out.head.getString(1) === "grp")
    spark.sql(s"INSERT INTO $cat.t SELECT id + 100, s, grp FROM $cat.t")
    val snap = TxLog.snapshot(s"$root/t")
    assert(TxLog.partitionColsOf(snap) === Seq("grp"))
    assert(snap.files.exists(_.pv.contains("grp")))
  }
}
