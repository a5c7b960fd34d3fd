package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.TxLog.{AddFile, ColStats, Dv}

/** FORMAT.md §3 v2: PARQUET checkpoint shards with typed metadata
  * columns and widened `mind`/`maxd` pruning indexes. Pinned:
  *
  *  1. a table crossing the shard threshold under a live session
  *     publishes parquet parts + a `pformat` manifest, and every
  *     distributed planner (scan, stats, count, partitions, DV set)
  *     equals the materialized snapshot filter shape by filter shape;
  *  2. the scan planner's coarse predicate is genuinely PUSHED into
  *     the metadata scan (PushedFilters on the index columns) and is
  *     a sound superset of the exact pruner on adversarial bounds
  *     (doubles rounded, decimal canon, string canon);
  *  3. AddFiles round-trip the parquet encoding EXACTLY (stats canon,
  *     DV descriptors, pv, dataChange) — `mind`/`maxd` are derived,
  *     never authoritative;
  *  4. a legacy JSONL-sharded base keeps reading, and MIGRATES to
  *     parquet at its next incremental checkpoint with identical
  *     state. */
class ParquetCheckpointSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  test("parquet shards: written past the threshold, planners equal the snapshot") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val dir = tmp("pckpt-write")
      // 12 single-file commits, partitioned, some DVs later
      (0 until 12).foreach { i =>
        TxLog.appendPartitioned(spark, dir,
          (0 until 10).map(d => (i * 10L + d, s"v$i-$d", i % 3))
            .toDF("k", "v", "p").coalesce(1), Seq("p"))
      }
      TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
      TxLog.delete(spark, dir, "k = 7")
      // force a checkpoint boundary cross (interval 10: v10 done above)
      val names = {
        val s = Files.list(Paths.get(dir, "_txlog"))
        try { import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString).toList }
        finally s.close()
      }
      assert(names.exists(_.matches(".*ckpt\\.part-\\d{5}-of-\\d{5}\\.parquet")),
        s"no parquet shard written: $names")
      val meta = TxLog.snapshotMeta(dir)
      assert(meta.ckptBase.nonEmpty && meta.ckptParquet)

      val snap = TxLog.snapshot(dir)
      def parity(filters: Seq[Filter]): Unit = {
        val dist = TxLog.planScanMeta(spark, dir, meta, filters)
          .sortBy(_.path)
        val drv = TxLog.pruneByFilters(snap, filters, Some(dir))
          .sortBy(_.path)
        assert(dist === drv, s"planScan diverged under $filters")
        assert(TxLog.planCountMeta(spark, dir, meta, filters) ===
          drv.map(_.rows).sum, s"planCount diverged under $filters")
      }
      parity(Nil)
      parity(Seq(EqualTo("k", 55L)))
      parity(Seq(EqualTo("p", 1)))
      parity(Seq(GreaterThanOrEqual("k", 100L)))
      parity(Seq(LessThan("k", 20L), GreaterThan("k", 3L)))
      parity(Seq(In("k", Array[Any](5L, 115L))))
      parity(Seq(Or(EqualTo("k", 5L), EqualTo("k", 115L))))
      parity(Seq(EqualTo("v", "v3-3")))
      parity(Seq(IsNotNull("k")))

      val (nf, nr, nb, nd, nu, ndead) = TxLog.planStatsMeta(spark, dir, meta)
      assert(nf === snap.files.size.toLong)
      assert(nr === snap.files.map(_.rows).sum)
      assert(nb === snap.files.map(_.bytes).sum)
      assert(nd === snap.files.count(_.dv.nonEmpty).toLong)
      assert(nu === 0L)
      assert(ndead === snap.files.flatMap(_.dv).map(_.dead).sum)
      assert(TxLog.planPartitionsMeta(spark, dir, meta).toSet ===
        snap.files.filter(_.rows > 0).map(_.pv).toSet)
      assert(TxLog.planDvFilesMeta(spark, dir, meta).map(_.path).toSet ===
        snap.files.filter(_.dv.nonEmpty).map(_.path).toSet)
      // the listing frame serves from the typed columns
      val ckptV = meta.ckptBase.get._1
      val listed = TxLog.checkpointFilesDf(spark, dir, ckptV).get
      assert(listed.columns.toSeq === Seq("path", "rows", "bytes"))
      assert(listed.count() > 0L)
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("coarse predicate: pushed into the metadata scan, always a superset") {
    import spark.implicits._
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      val dir = tmp("pckpt-push")
      (0 until 12).foreach { i =>
        TxLog.append(spark, dir,
          (0 until 10).map(d => (i * 10L + d, (i * 10.5 + d), s"s${i * 10 + d}"))
            .toDF("k", "x", "s").coalesce(1))
      }
      val meta = TxLog.snapshotMeta(dir)
      assert(meta.ckptParquet)
      val (cv, parts) = meta.ckptBase.get
      val df = TxLog.shardDf(spark, dir, cv, parts)
      val tz = spark.sessionState.conf.sessionLocalTimeZone

      // numeric filter → widened mind/maxd predicate, PUSHED
      val numPred = TxLog.coarseShardPred(df.schema,
        Seq(GreaterThanOrEqual("k", 100L)), meta.schema, meta.props, tz)
      val numScan = df.where(numPred)
      numScan.collect()
      val numPlan = numScan.queryExecution.executedPlan.toString
      assert(numPlan.contains("PushedFilters") && numPlan.contains("maxd"),
        s"numeric index predicate not pushed:\n$numPlan")
      // string filter → canon min/max predicate, PUSHED
      val strPred = TxLog.coarseShardPred(df.schema,
        Seq(EqualTo("s", "s55")), meta.schema, meta.props, tz)
      val strScan = df.where(strPred)
      strScan.collect()
      val strPlan = strScan.queryExecution.executedPlan.toString
      assert(strPlan.contains("PushedFilters") && strPlan.contains("max"),
        s"string canon predicate not pushed:\n$strPlan")

      // superset soundness on adversarial literals: every file the
      // exact pruner keeps, the coarse predicate keeps
      val snap = TxLog.snapshot(dir)
      val probes: Seq[Seq[Filter]] = Seq(
        Seq(EqualTo("x", 57.5d)), Seq(EqualTo("x", 5.0d)),
        Seq(LessThanOrEqual("k", 59L)), Seq(GreaterThan("x", 100.25d)),
        Seq(EqualTo("s", "s100")), Seq(LessThan("s", "s2")),
        Seq(In("k", Array[Any](0L, 119L))),
        Seq(EqualTo("k", new java.math.BigDecimal("55.00"))))
      // the coarse layer judges BASE SHARD rows only — delta files ride
      // deltaAdds past it, so restrict the exact side to the base
      val deltaPaths = meta.deltaAdds.map(_.path).toSet ++ meta.deltaExcludes
      probes.foreach { fs =>
        val coarse = TxLog.coarseShardPred(df.schema, fs, meta.schema, meta.props, tz)
        val coarseKept = df.where(coarse).select("path")
          .collect().map(_.getString(0)).toSet
        val exactKept = TxLog.pruneByFilters(snap, fs, Some(dir)).map(_.path).toSet
          .diff(deltaPaths)
        assert(exactKept.subsetOf(coarseKept),
          s"coarse predicate DROPPED exact survivors under $fs: " +
            s"${exactKept -- coarseKept}")
      }
    } finally TxLog.ckptPartMaxFiles = saved
  }

  test("AddFile round-trips the parquet encoding exactly") {
    val adds = Seq(
      AddFile("d-a/f1.parquet", 10L, 1234L,
        Map("k" -> ColStats("bigint", Some("-3"), Some("900"), 2L),
          "s" -> ColStats("string", Some(""), Some("zz"), 0L),
          "ts" -> ColStats("timestamp", Some("2026-01-01 00:00:00"),
            Some("2026-02-01 10:11:12"), 1L),
          "d" -> ColStats("double", Some("-1.5E-300"), Some("NaN"), 0L))),
      AddFile("d-a/f2.parquet", 0L, 5L, Map.empty, dataChange = false,
        dv = Some(Dv("dv-x", 7L)), pv = Map("p" -> "3", "q" -> "x y")),
      AddFile("d-b/f3.parquet", 99L, 1L,
        Map("dec" -> ColStats("decimal(9,2)", Some("-11111.25"), Some("5.00"), 3L)),
        pv = Map("p" -> "0")))
    val statsCols = adds.flatMap(_.stats.keys).distinct.sorted
    val rows = adds.map(a => TxLog.addToShardRow(a, statsCols))
    // write through spark so the parquet encoder is the real one
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      TxLogTestSeams.shardSchema(statsCols))
    val out = graft.Scratch.dir("graft-pckpt-rt").toString
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out).collect().map(TxLog.shardRowToAdd)
      .sortBy(_.path)
    assert(back.toSeq === adds.sortBy(_.path))
  }

  test("JSONL base keeps reading and migrates to parquet at the next checkpoint") {
    import spark.implicits._
    // a synthetic JSONL-sharded base (the v1 encoding, written by hand)
    val dir = tmp("pckpt-migrate")
    val ld = Paths.get(dir, "_txlog")
    Files.createDirectories(ld)
    def put(n: String, c: String): Unit =
      Files.write(ld.resolve(n), c.getBytes("UTF-8")): Unit
    def line(i: Int): String =
      s"""{"path":"d-seed/f$i.parquet","rows":10,"bytes":100,"dc":true,""" +
        s""""stats":{"k":{"t":"bigint","min":"${10 * i}","max":"${10 * i + 9}","nulls":0}}}"""
    put("00000000000000000000.json",
      """{"version":0,"op":"create","ts":1,"schema":"k BIGINT,v STRING","adds":[],"removes":[]}""")
    (0 until 4).foreach { p =>
      put(f"${0L}%020d.ckpt.part-$p%05d-of-00004.jsonl",
        (p * 5 until (p + 1) * 5).map(line).mkString("", "\n", "\n"))
    }
    put("00000000000000000000.ckpt.json",
      """{"version":0,"protocol":1,"schema":"k BIGINT,v STRING","txns":{},"props":{"graft.checkpointInterval":"2"},"parts":4}""")
    put("_last_checkpoint", """{"version":0,"parts":4}""")
    // the real files behind the seed paths
    Files.createDirectories(Paths.get(dir, "d-seed"))
    (0 until 20).foreach { i =>
      val stage = graft.Scratch.dir("graft-pckpt-mig-stage").toString + s"/w$i"
      (0 until 10).map(d => (10L * i + d, s"v${10 * i + d}"))
        .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
      val fs = Files.list(Paths.get(stage))
      val part = try { import scala.jdk.CollectionConverters._
        fs.iterator().asScala.find(_.toString.endsWith(".parquet")).get }
      finally fs.close()
      Files.move(part, Paths.get(dir, s"d-seed/f$i.parquet")): Unit
    }
    val meta0 = TxLog.snapshotMeta(dir)
    assert(meta0.ckptBase.nonEmpty && !meta0.ckptParquet)
    // JSONL base read parity
    assert(TxLog.planScan(spark, dir, Seq(EqualTo("k", 55L))).map(_.path) ===
      Seq("d-seed/f5.parquet"))
    // two appends cross the interval-2 boundary → incremental
    // checkpoint rebuilds the base AS PARQUET
    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    try {
      TxLog.append(spark, dir, Seq((9000L, "new")).toDF("k", "v"))
      TxLog.append(spark, dir, Seq((9001L, "new2")).toDF("k", "v"))
      val meta2 = TxLog.snapshotMeta(dir)
      assert(meta2.ckptParquet,
        s"expected the migrated base to be parquet: ${meta2.ckptBase}")
      assert(meta2.ckptBase.exists(_._1 === 2L))
      // identical state through the migrated base, cold
      TxLog.invalidateSnapshots(dir)
      assert(TxLog.planScan(spark, dir, Seq(EqualTo("k", 55L))).map(_.path) ===
        Seq("d-seed/f5.parquet"))
      val m = TxLog.snapshotMeta(dir)
      val (nf, nr, _, _, _, _) = TxLog.planStatsMeta(spark, dir, m)
      assert(nf === 22L)
      assert(nr === 202L)
      val snap = TxLog.snapshot(dir)
      assert(snap.files.map(_.path).toSet ===
        ((0 until 20).map(i => s"d-seed/f$i.parquet").toSet ++
          snap.files.map(_.path).filter(_.matches("d-[0-9a-f]{8}/.*")).toSet))
    } finally TxLog.ckptPartMaxFiles = saved
  }
}

class NoSessionCheckpointSpec extends AnyFunSuite with SparkTestBase {
  test("the no-session JSONL incremental fallback streams the base verbatim") {
    import spark.implicits._
    // a JSONL-sharded synthetic base + live commits, then checkpoint
    // WITHOUT a session: the driver-streaming JSONL writer must produce
    // a base the (session-backed) readers replay identically
    val dir = graft.Scratch.dir("graft-nosess").toString + "/t"
    val ld = Paths.get(dir, "_txlog")
    Files.createDirectories(ld)
    def put(n: String, c: String): Unit =
      Files.write(ld.resolve(n), c.getBytes("UTF-8")): Unit
    def line(i: Int): String =
      s"""{"path":"d-seed/f$i.parquet","rows":10,"bytes":100,"dc":true,""" +
        s""""stats":{"k":{"t":"bigint","min":"${10 * i}","max":"${10 * i + 9}","nulls":0}}}"""
    put("00000000000000000000.json",
      """{"version":0,"op":"create","ts":1,"schema":"k BIGINT,v STRING","adds":[],"removes":[]}""")
    (0 until 4).foreach { p =>
      put(f"${0L}%020d.ckpt.part-$p%05d-of-00004.jsonl",
        (p * 5 until (p + 1) * 5).map(line).mkString("", "\n", "\n"))
    }
    put("00000000000000000000.ckpt.json",
      """{"version":0,"protocol":1,"schema":"k BIGINT,v STRING","txns":{},"props":{},"parts":4}""")
    put("_last_checkpoint", """{"version":0,"parts":4}""")
    // one commit re-adds a path with new stats, one removes a path
    put("00000000000000000001.json",
      s"""{"version":1,"op":"append","ts":2,"adds":[${line(3).replace("\"rows\":10", "\"rows\":7")}],""" +
        """"removes":["d-seed/f7.parquet"]}""")
    val before = TxLog.planScan(spark, dir, Nil)
      .map(a => (a.path, a.rows)).sortBy(_._1)

    val saved = TxLog.ckptPartMaxFiles
    TxLog.ckptPartMaxFiles = 8
    val sess = org.apache.spark.sql.SparkSession.getDefaultSession
    try {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      TxLog.debugWriteCheckpoint(dir, 1L)
    } finally {
      sess.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      sess.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      TxLog.ckptPartMaxFiles = saved
    }
    val meta = TxLog.snapshotMeta(dir, Some(1L))
    assert(meta.ckptBase === Some((1L, 3)) && !meta.ckptParquet,
      s"expected a 3-part JSONL base: ${meta.ckptBase} pq=${meta.ckptParquet}")
    val after = TxLog.planScan(spark, dir, Nil)
      .map(a => (a.path, a.rows)).sortBy(_._1)
    assert(after === before, "the incremental JSONL checkpoint drifted")
    assert(after.size === 19 && after.find(_._1 == "d-seed/f3.parquet").exists(_._2 == 7L))
    assert(!after.exists(_._1 == "d-seed/f7.parquet"))
  }
}

/** Test seam: the shard schema builder is private to TxLog; specs need
  * it to drive the real parquet encoder on hand-built rows. */
object TxLogTestSeams {
  def shardSchema(statsCols: Seq[String]): org.apache.spark.sql.types.StructType =
    TxLog.shardSchemaForTest(statsCols)
}
