package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{TxCatalog, TxLog}

/** Column mapping contract (rename/drop without rewrite): renames and
  * drops are metadata-only commits; physical bytes never move; dropped
  * names are never resurrected; every read/write surface — Scala reads,
  * appends, merge, DML, OPTIMIZE, range pruning, SQL catalog, streaming
  * source, change feed — agrees on the logical↔physical binding; and
  * the protocol stamps lock pre-mapping readers out of mapped tables
  * while leaving plain tables at protocol 1. */
class TxColumnMappingSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-txcm").toString + "/t"

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"v$i", i * 10)).toDF("id", "s", "score")
  }

  test("rename is metadata-only: same files, new logical name, data intact") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 10))
    val filesBefore = TxLog.snapshot(dir).files.map(_.path).toSet
    TxLog.renameColumn(dir, "score", "points")
    val snap = TxLog.snapshot(dir)
    assert(snap.files.map(_.path).toSet === filesBefore, "rename must not rewrite files")
    assert(snap.schema.fieldNames.toSeq === Seq("id", "s", "points"))
    val r = TxLog.read(spark, dir).orderBy("id").select("points").head()
    assert(r.getInt(0) === 0)
    assert(TxLog.read(spark, dir).where("points = 50").count() === 1L)
  }

  test("append/merge/delete after a rename read and write the physical name") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 5))
    TxLog.renameColumn(dir, "score", "points")
    import spark.implicits._
    // append uses the NEW logical schema
    TxLog.append(spark, dir,
      Seq((100L, "new", 999)).toDF("id", "s", "points"))
    assert(TxLog.read(spark, dir).where("points = 999").count() === 1L)
    // the new file physically stores the OLD name — old and new files
    // must agree (one scan schema serves both)
    assert(TxLog.read(spark, dir).count() === 6L)
    // merge touches both generations
    TxLog.merge(spark, dir, Seq((0L, "upd", 111)).toDF("id", "s", "points"), "id")
    assert(TxLog.read(spark, dir).where("id = 0").head().getInt(2) === 111)
    // DML predicate on the logical name
    TxLog.delete(spark, dir, "points = 999")
    assert(TxLog.read(spark, dir).count() === 5L)
  }

  test("rename survives OPTIMIZE and stats-based range pruning") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 100).repartition(4))
    TxLog.renameColumn(dir, "score", "points")
    TxLog.optimize(spark, dir, targetBytes = 1L, sortBy = Seq("points"))
    // pruning keyed by the LOGICAL name must hit the physical stats
    val (survivors, pruned) = TxLog.prunedFiles(TxLog.snapshot(dir), "points", "0", "90")
    assert(pruned.nonEmpty, "clustered optimize + narrow range must prune files")
    val out = TxLog.readRange(spark, dir, "points", "100", "290")
    assert(out.count() === 20L)
  }

  test("drop is metadata-only; re-adding the name gets FRESH storage (no resurrection)") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 5))
    val filesBefore = TxLog.snapshot(dir).files.map(_.path).toSet
    TxLog.dropColumn(dir, "score")
    assert(TxLog.snapshot(dir).files.map(_.path).toSet === filesBefore)
    assert(TxLog.read(spark, dir).columns.toSeq === Seq("id", "s"))
    // re-add the same logical name: old bytes must NOT come back
    TxLog.addColumns(dir, Seq(org.apache.spark.sql.types.StructField(
      "score", org.apache.spark.sql.types.IntegerType)))
    val scores = TxLog.read(spark, dir).select("score").collect()
    assert(scores.forall(_.isNullAt(0)),
      "re-added column must read NULL, not the dropped column's bytes")
    // and new writes to it land under the fresh physical name
    import spark.implicits._
    TxLog.append(spark, dir, Seq((50L, "x", 7)).toDF("id", "s", "score"))
    assert(TxLog.read(spark, dir).where("score = 7").count() === 1L)
    assert(TxLog.read(spark, dir).where("score IS NULL").count() === 5L)
  }

  test("appendEvolve after a drop also avoids the burned physical name") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 4))
    TxLog.dropColumn(dir, "score")
    import spark.implicits._
    TxLog.appendEvolve(spark, dir, Seq((70L, "e", 5.5)).toDF("id", "s", "score"))
    // evolve re-introduced `score` as DOUBLE under a fresh physical name
    val out = TxLog.read(spark, dir)
    assert(out.where("score IS NULL").count() === 4L)
    assert(out.where("score = 5.5").count() === 1L)
  }

  test("protocol: mapped tables stamp 2 and lock out by protocol; plain tables stay 1") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    assert(TxLog.snapshot(dir).protocol === 1L)
    TxLog.renameColumn(dir, "s", "label")
    assert(TxLog.snapshot(dir).protocol === 2L)
    // checkpoints persist the TABLE's protocol (2), not blanket-stamp
    // plain tables: a fresh plain table's checkpoint stays protocol 1
    val plain = tmp()
    (0 until 11).foreach(i => TxLog.append(spark, plain, df(i until i + 1)))
    assert(TxLog.snapshot(plain).protocol === 1L)
  }

  test("restore past a rename revives the old binding") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 5)) // v0
    TxLog.renameColumn(dir, "score", "points") // v1
    TxLog.restore(spark, dir, 0L) // v2: back to (id, s, score)
    val snap = TxLog.snapshot(dir)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "s", "score"))
    assert(TxLog.read(spark, dir).where("score = 20").count() === 1L)
  }

  test("rename/drop refuse while a CHECK constraint references the column") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    TxLog.addConstraint(spark, dir, "pos_score", "score >= 0")
    intercept[IllegalArgumentException](TxLog.renameColumn(dir, "score", "pts"))
    intercept[IllegalArgumentException](TxLog.dropColumn(dir, "score"))
    TxLog.dropConstraint(dir, "pos_score")
    TxLog.renameColumn(dir, "score", "pts") // now fine
    assert(TxLog.snapshot(dir).schema.fieldNames.contains("pts"))
  }

  test("SQL catalog reads a mapped table under logical names (incl. time travel)") {
    val root = graft.Scratch.dir("graft-txcmsql").toString
    val cat = "txm" + java.lang.Integer.toHexString(root.hashCode).takeRight(8)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[TxCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    TxLog.append(spark, s"$root/t", df(0 until 10))
    TxLog.renameColumn(s"$root/t", "score", "points")
    val rows = spark.sql(s"SELECT id, points FROM $cat.t WHERE points >= 50 ORDER BY id")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === (5L until 10L).toSeq)
    assert(rows.head.getInt(1) === 50)
    // aggregation + pruned projection through the renaming shim
    assert(spark.sql(s"SELECT sum(points) AS s FROM $cat.t").head().getLong(0) === 450L)
    // pre-rename version still serves the OLD name
    assert(spark.sql(s"SELECT score FROM $cat.t VERSION AS OF 0 WHERE id = 3")
      .head().getInt(0) === 30)
    // SQL INSERT into the mapped table writes the physical name
    spark.sql(s"INSERT INTO $cat.t VALUES (200, 'z', 1000)")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE points = 1000")
      .head().getLong(0) === 1L)
  }

  test("streaming source and change feed deliver mapped tables under logical names") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3).coalesce(1)) // v0
    TxLog.renameColumn(dir, "score", "points") // v1
    TxLog.append(spark, dir,
      df(10 until 12).toDF("id", "s", "points").coalesce(1)) // v2
    val changes = TxLog.readChanges(spark, dir, fromVersionExclusive = -1L)
    assert(changes.columns.toSeq === Seq("id", "s", "points", "_commit_version"))
    assert(changes.where("points = 100").count() === 1L)
    // streaming: fresh checkpoint, whole log under the new logical schema
    val got = scala.collection.mutable.Set.empty[(Long, Int)]
    val q = spark.readStream.format("txlog").option("path", dir).load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("id", "points").collect()
          .foreach(r => got.synchronized { got += ((r.getLong(0), r.getInt(1))) }): Unit
      }
      .option("checkpointLocation",
        graft.Scratch.dir("graft-txcm-ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(got.toSet === Set((0L, 0), (1L, 10), (2L, 20), (10L, 100), (11L, 110)))
  }

  test("identity-mapped tables take the exact pre-mapping plan (no extra Project)") {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val plain = tmp()
    TxLog.append(spark, plain, df(0 until 5))
    assert(!TxLog.read(spark, plain).queryExecution.analyzed
      .exists(_.isInstanceOf[Project]),
      "an unmapped table's read must be the bare scan relation")
    val mapped = tmp()
    TxLog.append(spark, mapped, df(0 until 5))
    TxLog.renameColumn(mapped, "score", "points")
    assert(TxLog.read(spark, mapped).queryExecution.analyzed
      .exists(_.isInstanceOf[Project]),
      "a mapped table's read renames through a projection")
  }

  test("rename validations: missing/colliding names, word-like targets") {
    val dir = tmp()
    TxLog.append(spark, dir, df(0 until 3))
    intercept[IllegalArgumentException](TxLog.renameColumn(dir, "nope", "x"))
    intercept[IllegalArgumentException](TxLog.renameColumn(dir, "score", "id"))
    intercept[IllegalArgumentException](TxLog.renameColumn(dir, "score", "bad name"))
    intercept[IllegalArgumentException](TxLog.dropColumn(dir, "nope"))
  }
}
