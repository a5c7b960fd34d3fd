package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The distributed metadata plane ([[TxLog.snapshotMeta]] /
  * [[TxLog.planScan]] / [[TxLog.planStatsMeta]]): planning a read of a
  * table whose replay base is a SHARDED checkpoint must never fold the
  * live file list on the driver — the shard lines are pruned as a
  * distributed job and only survivors are collected. Pinned here:
  *
  *  1. a synthetic 102,400-file log plans a selective scan while the
  *     snapshot cache PROVABLY stays empty for that version (the
  *     bounded-collect proof), and the survivors equal the driver
  *     path's to the file;
  *  2. on a real sharded table — deltas past the checkpoint, deletion
  *     vectors in the shard lines, generated-column pruning props —
  *     meta fields, pruning results and live-set stats all equal the
  *     materialized snapshot's, filter shape by filter shape (the
  *     no-divergence guard over [[TxLog.mkFilePruner]]'s shared
  *     closure). */
class DistributedPlanSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  // ---- 1. synthetic 102k-file log -----------------------------------------

  /** One AddFile JSONL line in the checkpoint-shard format (FORMAT.md
    * §4): file i covers k ∈ [10i, 10i+9]. */
  private def line(i: Int, rows: Long = 10L): String = {
    val lo = 10L * i; val hi = lo + 9
    s"""{"path":"f${"%06d".format(i)}.parquet","rows":$rows,"bytes":100,""" +
      s""""dc":true,"stats":{"k":{"t":"bigint","min":"$lo","max":"$hi","nulls":0}}}"""
  }

  test("planScan over a synthetic 102,400-file sharded log: bounded collect, no driver materialization") {
    val dir = tmp("distplan-synth")
    val ld = Paths.get(dir, "_txlog")
    Files.createDirectories(ld)
    val nFiles = 102400; val nParts = 25; val per = nFiles / nParts
    def put(name: String, content: String): Unit =
      Files.write(ld.resolve(name), content.getBytes("UTF-8")): Unit
    put("00000000000000000000.json",
      """{"version":0,"op":"create","ts":1,"schema":"k BIGINT,v STRING","adds":[],"removes":[]}""")
    put("00000000000000000001.json",
      """{"version":1,"op":"append","ts":2,"adds":[],"removes":[]}""")
    (0 until nParts).foreach { p =>
      val sb = new StringBuilder
      (p * per until (p + 1) * per).foreach(i => sb.append(line(i)).append('\n'))
      put(f"${1L}%020d.ckpt.part-$p%05d-of-$nParts%05d.jsonl", sb.toString)
    }
    put("00000000000000000001.ckpt.json",
      s"""{"version":1,"protocol":1,"schema":"k BIGINT,v STRING","txns":{},"props":{},"parts":$nParts}""")
    put("_last_checkpoint", s"""{"version":1,"parts":$nParts}""")
    // the delta: two new files, one base file removed, one RE-ADDED
    // with different stats (delta must win over its shard line)
    put("00000000000000000002.json",
      s"""{"version":2,"op":"append","ts":3,"adds":[${line(200000)},${line(200001)},${line(5, rows = 7L)}],""" +
        """"removes":["f000007.parquet"]}""")

    val meta = TxLog.snapshotMeta(dir)
    assert(meta.version === 2L)
    assert(meta.ckptBase === Some((1L, nParts)))
    assert(meta.deltaAdds.map(_.path).toSet ===
      Set("f200000.parquet", "f200001.parquet", "f000005.parquet"))
    assert(meta.deltaExcludes === Set("f000007.parquet"))

    // selective equality: k = 555 lives only in file 55
    val hits = TxLog.planScan(spark, dir, Seq(EqualTo("k", 555L)))
    assert(hits.map(_.path) === Seq("f000055.parquet"))
    // a removed base file never surfaces; a re-added one serves the
    // DELTA's AddFile (rows 7, not the shard line's 10)
    assert(TxLog.planScan(spark, dir, Seq(EqualTo("k", 75L))).isEmpty)
    val readd = TxLog.planScan(spark, dir, Seq(EqualTo("k", 55L)))
    assert(readd.map(f => (f.path, f.rows)) === Seq(("f000005.parquet", 7L)))
    // range across the top of the base plus the delta files
    val top = TxLog.planScan(spark, dir, Seq(GreaterThanOrEqual("k", 1023990L)))
    assert(top.map(_.path).toSet ===
      Set("f102399.parquet", "f200000.parquet", "f200001.parquet"))

    // THE PROOF: planning ran without ever materializing the snapshot
    assert(!TxLog.snapshotCached(dir, 2L),
      "planScan materialized the full file list on the driver")

    // live-set stats, distributed: 102400 - 1 removed - 1 re-added in
    // base, + 3 delta adds; no pv anywhere → every live file counts as
    // unaligned on a partitioned table, but this one isn't partitioned
    val (nf, nr, nb, nd, nu, ndead) = TxLog.planStatsMeta(spark, dir, meta)
    assert(nf === (nFiles - 2 + 3).toLong)
    assert(nr === (nFiles - 2) * 10L + 10L + 10L + 7L)
    assert(nb === (nFiles + 1) * 100L)
    assert(nd === 0L)
    assert(nu === 0L)
    assert(ndead === 0L)

    // filtered metadata count, distributed — zero survivor collect
    assert(TxLog.planCountMeta(spark, dir, meta, Nil) === nr)
    assert(TxLog.planCountMeta(spark, dir, meta, Seq(EqualTo("k", 555L))) === 10L)

    // now — deliberately — the driver path, as the parity oracle
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size.toLong === nf)
    assert(TxLog.pruneByFilters(snap, Seq(EqualTo("k", 555L)), Some(dir))
      .map(_.path) === hits.map(_.path))
    assert(TxLog.pruneByFilters(snap, Seq(GreaterThanOrEqual("k", 1023990L)), Some(dir))
      .map(_.path).toSet === top.map(_.path).toSet)
  }

  // ---- 2. real sharded table parity ----------------------------------------

  test("planScan/planStats equal the driver path on a real sharded table (DVs, deltas, all filter shapes)") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val dir = tmp("distplan-real")
      def batch(i: Int) =
        (10 * i until 10 * i + 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      // 11 appends × 2 files → the v10 checkpoint shards (22 > 8)
      (0 until 11).foreach(i => TxLog.append(spark, dir, batch(i).repartition(2)))
      // DVs + per-commit checkpoints, then a delete that lands dv
      // descriptors INSIDE the next sharded checkpoint's lines
      TxLog.setProperties(dir, Map(
        TxLog.DeletionVectors.Enabled -> "true",
        TxLog.Checkpoints.Interval -> "1"))
      TxLog.delete(spark, dir, "k >= 42 AND k <= 44")
      // and a plain append past the latest checkpoint — the delta fold
      TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> ""))
      TxLog.append(spark, dir, batch(11).repartition(2))

      TxLog.invalidateSnapshots(dir)
      val meta = TxLog.snapshotMeta(dir)
      assert(meta.ckptBase.nonEmpty, "expected a sharded replay base")
      val snap = TxLog.snapshot(dir)
      // meta fields replay identically to the full snapshot's
      assert(meta.version === snap.version)
      assert(meta.schemaDdl === snap.schemaDdl)
      assert(meta.props === snap.props)
      assert(meta.txns === snap.txns)
      assert(meta.protocol === snap.protocol)

      val shapes: Seq[(String, Seq[Filter])] = Seq(
        "unfiltered" -> Nil,
        "eq" -> Seq(EqualTo("k", 43L)),
        "range" -> Seq(GreaterThan("k", 100L)),
        "conj" -> Seq(GreaterThanOrEqual("k", 20L), LessThan("k", 60L)),
        "in" -> Seq(In("k", Array[Any](5L, 115L))),
        "notnull" -> Seq(IsNotNull("v")),
        "string" -> Seq(EqualTo("v", "v7")))
      shapes.foreach { case (name, fs) =>
        val a = TxLog.planScanMeta(spark, dir, meta, fs)
          .map(f => (f.path, f.rows, f.dv)).toSet
        val b = TxLog.pruneByFilters(snap, fs, Some(dir))
          .map(f => (f.path, f.rows, f.dv)).toSet
        assert(a === b, s"planScan diverged from pruneByFilters on $name")
      }

      val (nf, nr, nb, nd, nu, ndead) = TxLog.planStatsMeta(spark, dir, meta)
      assert(nf === snap.files.size.toLong)
      assert(nr === snap.files.map(_.rows).sum)
      assert(nb === snap.files.map(_.bytes).sum)
      assert(nd === snap.files.count(_.dv.nonEmpty).toLong)
      assert(nd > 0L, "the delete should have left live DV descriptors")
      assert(nu === 0L, "non-partitioned: no file can be pv-unaligned")
      assert(ndead === snap.files.flatMap(_.dv).map(_.dead).sum)
      // the DV-bearing subset collects distributed, bounded by the budget
      assert(TxLog.planDvFilesMeta(spark, dir, meta)
        .map(f => (f.path, f.dv)).toSet ===
        snap.files.filter(_.dv.nonEmpty).map(f => (f.path, f.dv)).toSet)
      assert(TxLog.planCountMeta(spark, dir, meta, Nil) ===
        snap.files.map(_.rows).sum)
    } finally TxLog.ckptPartMaxFiles = saved
  }

  // ---- 3. SQL end-to-end through the catalog --------------------------------

  test("SQL SELECT on a sharded table plans distributed — correct rows, no snapshot materialized") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val root = graft.Scratch.dir("graft-distplan-sql").toString
      val cat = "dpc" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val dir = s"$root/t"
      def batch(i: Int) =
        (10 * i until 10 * i + 10).map(k => (k.toLong, s"v$k")).toDF("k", "v")
      (0 until 11).foreach(i =>
        TxLog.append(spark, dir, batch(i).repartition(2)))
      TxLog.invalidateSnapshots(dir)
      val headV = TxLog.latestVersion(dir)
      assert(TxLog.planningMeta(dir, None).exists(_.ckptBase.nonEmpty),
        "precondition: the table must have a sharded replay base")

      // a filtered SELECT and a metadata count, both through SQL
      val got = spark.sql(s"SELECT k, v FROM $cat.t WHERE k >= 42 AND k < 45 ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((42L, "v42"), (43L, "v43"), (44L, "v44")))
      assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 110L)

      // the proof: the whole SQL round trip never folded the file list
      assert(!TxLog.snapshotCached(dir, headV),
        "a SELECT on a sharded table materialized the snapshot on the driver")

      // DV-bearing sharded table: the VECTORIZED mask composes with
      // distributed planning — native parquet scans over GraftFileIndex,
      // still no snapshot materialized
      TxLog.setProperties(dir, Map(
        TxLog.DeletionVectors.Enabled -> "true",
        TxLog.Checkpoints.Interval -> "1"))
      TxLog.delete(spark, dir, "k = 43")
      TxLog.invalidateSnapshots(dir)
      val headV2 = TxLog.latestVersion(dir)
      assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) === 109L)
      val q2 = spark.sql(s"SELECT k FROM $cat.t WHERE k >= 42 AND k < 45 ORDER BY k")
      assert(q2.collect().map(_.getLong(0)).toSeq === Seq(42L, 44L))
      val plan2 = q2.queryExecution.executedPlan.toString
      assert(plan2.contains("GraftFileIndex") &&
        !plan2.contains("DvFallbackScanBuilder"),
        s"sharded+DV should take the vectorized mask:\n$plan2")
      assert(!TxLog.snapshotCached(dir, headV2),
        "the sharded DV read materialized the snapshot")
      // over the mask budget, the V1 fallback still serves — and still
      // without materializing the snapshot
      val savedBudget = TxLog.dvMaskMaxPositions
      TxLog.dvMaskMaxPositions = 0L
      try {
        TxLog.invalidateSnapshots(dir)
        val q3 = spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE k >= 42 AND k < 45")
        assert(q3.head().getLong(0) === 2L)
        assert(q3.queryExecution.executedPlan.toString.contains("DvFallbackScanBuilder"))
        assert(!TxLog.snapshotCached(dir, headV2))
      } finally TxLog.dvMaskMaxPositions = savedBudget
    } finally TxLog.ckptPartMaxFiles = saved
  }

  // ---- 4. SHOW PARTITIONS on a sharded table --------------------------------

  test("SHOW PARTITIONS and partition metadata plan distributed on a sharded table") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val root = graft.Scratch.dir("graft-distplan-parts").toString
      val cat = "dpp" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val dir = s"$root/t"
      // 12 single-partition appends over 4 groups → sharded checkpoint
      TxLog.appendPartitioned(spark, dir,
        (0 until 40).map(i => (i.toLong, s"g${i % 4}")).toDF("k", "g"), Seq("g"))
      TxLog.setProperties(dir, Map(TxLog.Checkpoints.Interval -> "1"))
      (0 until 9).foreach { b =>
        TxLog.appendPartitioned(spark, dir,
          (0 until 4).map(i => (100L + b * 4 + i, s"g${i % 4}")).toDF("k", "g"),
          Seq("g"))
      }
      TxLog.invalidateSnapshots(dir)
      val headV = TxLog.latestVersion(dir)
      assert(TxLog.planningMeta(dir, None).exists(_.ckptBase.nonEmpty))
      val parts = spark.sql(s"SHOW PARTITIONS $cat.t")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(parts === Seq("g=g0", "g=g1", "g=g2", "g=g3"))
      assert(!TxLog.snapshotCached(dir, headV),
        "SHOW PARTITIONS on a sharded table materialized the snapshot")
      // per-partition metadata from the distributed fold
      val meta = TxLog.snapshotMeta(dir)
      val (nf, nr, nb) = TxLog.planPartitionStatsMeta(spark, dir, meta,
        Map("g" -> "g1"))
      assert(nr === 19L, s"g1 rows: 10 base + 9 appended, got $nr")
      assert(nf > 0L && nb > 0L)
    } finally TxLog.ckptPartMaxFiles = saved
  }
}
