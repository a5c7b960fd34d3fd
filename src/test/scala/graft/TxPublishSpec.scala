package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{PipelineGraph, TableDef}
import graft.sources.{TxLog, TxPublish}

/** The run-manifest publish layer: a reader that resolves one manifest
  * sees every table at that run's version — all-old or all-new, never
  * mixed — even while the next run's per-table commits are landing, and
  * a crashed half-run publishes nothing. */
class TxPublishSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def root(): String =
    graft.Scratch.dir("graft-txpub").toString

  private def table(rootDir: String, name: String, tag: Long, n: Int): Long =
    TxLog.append(spark, s"$rootDir/$name",
      (0 until n).map(i => (i.toLong, tag)).toDF("id", "tag"))

  private def overwriteTable(rootDir: String, name: String, tag: Long, n: Int): Long =
    TxLog.overwrite(spark, s"$rootDir/$name",
      (0 until n).map(i => (i.toLong, tag)).toDF("id", "tag"))

  private def tagOf(df: DataFrame): Set[Long] =
    df.select("tag").distinct().as[Long].collect().toSet

  test("publish pins every table; readRun resolves a consistent set") {
    val r = root()
    val va = table(r, "a", tag = 1, n = 5)
    val vb = table(r, "b", tag = 1, n = 7)
    val run = TxPublish.publish(r, Map("a" -> va, "b" -> vb))
    assert(run === 0L)
    val m = TxPublish.manifest(r)
    assert(m.run === 0L && m.tables === Map("a" -> 0L, "b" -> 0L))
    val frames = TxPublish.readRun(spark, r)
    assert(tagOf(frames("a")) === Set(1L) && tagOf(frames("b")) === Set(1L))
  }

  test("a reader mid-run sees all-old; after publish, all-new; never mixed") {
    val r = root()
    TxPublish.publish(r, Map(
      "a" -> overwriteTable(r, "a", tag = 1, n = 5),
      "b" -> overwriteTable(r, "b", tag = 1, n = 5)))
    // Run 2 in flight: table a's NEW version has landed, b's has not.
    val va2 = overwriteTable(r, "a", tag = 2, n = 5)
    val mid = TxPublish.readRun(spark, r)
    assert(tagOf(mid("a")) === Set(1L), "mid-run reader must see the OLD a")
    assert(tagOf(mid("b")) === Set(1L))
    // Run 2 completes and publishes; a new resolution sees all-new.
    val vb2 = overwriteTable(r, "b", tag = 2, n = 5)
    TxPublish.publish(r, Map("a" -> va2, "b" -> vb2))
    val post = TxPublish.readRun(spark, r)
    assert(tagOf(post("a")) === Set(2L) && tagOf(post("b")) === Set(2L))
    // The old resolution's pinned frames STILL read old data (immutable
    // versions): the reader's view never tears mid-flight.
    assert(tagOf(mid("a")) === Set(1L) && tagOf(mid("b")) === Set(1L))
    // And run 0 stays addressable by number.
    val r0 = TxPublish.readRun(spark, r, runAsOf = Some(0L))
    assert(tagOf(r0("a")) === Set(1L) && tagOf(r0("b")) === Set(1L))
  }

  test("a crashed run (tables committed, no publish) is invisible to readers") {
    val r = root()
    TxPublish.publish(r, Map("a" -> overwriteTable(r, "a", 1, 4)))
    overwriteTable(r, "a", tag = 99, n = 4) // run 2 dies before publishing
    assert(TxPublish.manifest(r).run === 0L)
    assert(tagOf(TxPublish.readRun(spark, r)("a")) === Set(1L))
  }

  test("concurrent publishers both land with distinct run numbers") {
    val r = root()
    val v = overwriteTable(r, "a", 1, 3)
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val futs = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = { latch.await(); TxPublish.publish(r, Map("a" -> v, "w" -> i.toLong)) }
        })
      }
      latch.countDown()
      val runs = futs.map(_.get(60, TimeUnit.SECONDS))
      assert(runs.toSet.size === 4, s"duplicate run numbers: $runs")
      assert(TxPublish.history(r).size === 4)
    } finally pool.shutdown()
  }

  test("errors: no runs, unknown run, unknown table") {
    val r = root()
    intercept[TxPublish.NoPublishedRunException](TxPublish.manifest(r))
    TxPublish.publish(r, Map("a" -> table(r, "a", 1, 2)))
    intercept[TxPublish.NoPublishedRunException](TxPublish.manifest(r, Some(9L)))
    intercept[TxPublish.NoPublishedRunException](
      TxPublish.readTable(spark, r, "nope"))
  }

  test("PipelineGraph publishRun: one manifest per run, old runs readable as a set") {
    val r = root()
    def defs(tag: Long): Seq[TableDef] = Seq(
      TableDef("pub_bronze", Nil,
        build = _ => (0 until 10).map(i => (i.toLong, tag)).toDF("id", "tag")),
      TableDef("pub_gold", Seq("pub_bronze"),
        build = rd => rd("pub_bronze").groupBy("tag").agg(count(lit(1)).as("n"))))
    val run1 = PipelineGraph.run(spark, defs(1), r,
      transactionalSinks = true, publishRun = true)
    assert(run1.publishedRun === Some(0L))
    val run2 = PipelineGraph.run(spark, defs(2), r,
      transactionalSinks = true, publishRun = true)
    assert(run2.publishedRun === Some(1L))
    val m = TxPublish.manifest(r)
    assert(m.tables.keySet === Set("pub_bronze", "pub_gold"))
    assert(tagOf(TxPublish.readRun(spark, r)("pub_bronze")) === Set(2L))
    val old = TxPublish.readRun(spark, r, runAsOf = Some(0L))
    assert(tagOf(old("pub_bronze")) === Set(1L))
    assert(old("pub_gold").select("tag").as[Long].collect().toSet === Set(1L))
    // plain (non-transactional) runs never publish
    intercept[IllegalArgumentException](
      PipelineGraph.run(spark, defs(3), root(), publishRun = true))
  }
}
