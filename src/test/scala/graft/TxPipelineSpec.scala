package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Expectation, PipelineGraph, TableDef}
import graft.sources.TxLog

/** The medallion runner with transactional (TxLog) sinks: identical
  * results to the plain-parquet mode, versioned re-runs with time
  * travel to the previous run, partition-scoped refresh through
  * replaceWhereIn, and expectation metrics intact (observation rides
  * the staging write). */
class TxPipelineSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def defs(src: DataFrame): Seq[TableDef] = Seq(
    TableDef("tx_bronze", Nil, build = _ => src),
    TableDef("tx_silver", Seq("tx_bronze"),
      expectations = Seq(Expectation.drop("positive_value", "value > 0")),
      build = r => r("tx_bronze").withColumn("doubled", col("value") * 2)),
    TableDef("tx_gold", Seq("tx_silver"),
      build = r => r("tx_silver").groupBy("day")
        .agg(count(lit(1)).as("n"), sum("doubled").as("sum_doubled"))),
    TableDef("tx_daily", Seq("tx_silver"), partitionBy = Seq("day"),
      build = r => r("tx_silver").select("day", "id", "doubled")))

  private def src(rows: Seq[(Long, Long, Long)]): DataFrame =
    rows.toDF("id", "day", "value")

  /** Rows with columns in name order — plain parquet's partitionBy
    * re-read relocates the partition column to the end, the
    * transactional sink preserves the build's order; values must agree
    * regardless. */
  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.select(df.columns.sorted.map(col).toSeq: _*)
      .collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  test("transactional run ≡ plain run, and expectation metrics survive") {
    val rows = (0 until 40).map(i => (i.toLong, (i % 4).toLong, (i - 2).toLong))
    val plainDir = graft.Scratch.dir("graft-txp-plain").toString
    val txDir = graft.Scratch.dir("graft-txp-tx").toString
    val plain = PipelineGraph.run(spark, defs(src(rows)), plainDir)
    val tx = PipelineGraph.run(spark, defs(src(rows)), txDir, transactionalSinks = true)
    Seq("tx_bronze", "tx_silver", "tx_gold", "tx_daily").foreach { t =>
      assert(collectSorted(tx(t)) === collectSorted(plain(t)), t)
    }
    assert(tx.expectations === plain.expectations)
    val drop = tx.expectations.find(_.expectation == "positive_value").get
    assert(drop.failedCount === 3L) // values -2, -1, 0
    // Every table sink is a transactional table at version 0.
    Seq("tx_bronze", "tx_silver", "tx_gold").foreach { t =>
      assert(TxLog.latestVersion(s"$txDir/$t") === 0L)
    }
  }

  test("a re-run commits a new version; the previous run stays time-travel readable") {
    val txDir = graft.Scratch.dir("graft-txp-rerun").toString
    val rows1 = (0 until 20).map(i => (i.toLong, (i % 2).toLong, (i + 1).toLong))
    val rows2 = (0 until 30).map(i => (i.toLong, (i % 3).toLong, (i + 1).toLong))
    PipelineGraph.run(spark, defs(src(rows1)), txDir, transactionalSinks = true)
    val run2 = PipelineGraph.run(spark, defs(src(rows2)), txDir, transactionalSinks = true)
    assert(TxLog.latestVersion(s"$txDir/tx_gold") === 1L)
    assert(run2("tx_gold").agg(sum("n")).head().getLong(0) === 30L)
    // Run 1's gold is intact at version 0.
    val gold0 = TxLog.read(spark, s"$txDir/tx_gold", Some(0L))
    assert(gold0.agg(sum("n")).head().getLong(0) === 20L)
  }

  test("partitioned node refreshes only its partitions (replaceWhereIn path)") {
    val txDir = graft.Scratch.dir("graft-txp-part").toString
    val rows1 = (0 until 20).map(i => (i.toLong, (i % 4).toLong, (i + 1).toLong))
    PipelineGraph.run(spark, defs(src(rows1)), txDir, transactionalSinks = true)
    val before = TxLog.snapshot(s"$txDir/tx_daily")
    // Second run produces ONLY days 1 and 2: days 0 and 3 must survive
    // from run 1 in tx_daily (dynamic-partition-overwrite semantics).
    val rows2 = (100 until 106).map(i => (i.toLong, (i % 2 + 1).toLong, (i + 1).toLong))
    PipelineGraph.run(spark, defs(src(rows2)), txDir, transactionalSinks = true)
    val daily = TxLog.read(spark, s"$txDir/tx_daily")
    val byDay = daily.groupBy("day").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDay(1L) === 3L && byDay(2L) === 3L) // refreshed days: run-2 rows only
    assert(byDay(0L) === 5L && byDay(3L) === 5L) // untouched days: run-1 rows
    assert(TxLog.snapshot(s"$txDir/tx_daily").version === before.version + 1)
  }
}
