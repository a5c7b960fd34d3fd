package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** `writeStream.format("txlog")` sink contract: Append mode is an
  * exactly-once txn-tagged sink keyed by the checkpoint path, restarts
  * resume without duplicating, Complete mode overwrites per refresh,
  * Update mode is refused, partitionBy creates a partitioned table, and constraints gate the
  * streamed rows like any writer. */
class TxLogSinkSpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String = graft.Scratch.dir("graft-txsink").toString

  test("append mode: exactly-once across restarts, one commit per batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    val in = MemoryStream[Long]
    def run(): Unit = {
      val q = in.toDS().toDF("id")
        .writeStream.format("txlog")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    in.addData(1L, 2L, 3L)
    run()
    assert(TxLog.read(spark, dir).count() === 3L)
    // restart with no new data: nothing re-lands
    val vAfterFirst = TxLog.latestVersion(dir)
    run()
    assert(TxLog.latestVersion(dir) === vAfterFirst)
    assert(TxLog.read(spark, dir).count() === 3L)
    // new data resumes from the checkpoint
    in.addData(4L, 5L)
    run()
    assert(TxLog.read(spark, dir).select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
    // the txn app id is the checkpoint path: recorded in the snapshot
    assert(TxLog.snapshot(dir).txns.keys.exists(_.contains("ckpt")))
  }

  test("complete mode: each refresh overwrites with the new aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    val in = MemoryStream[Long]
    def run(): Unit = {
      val q = in.toDS().toDF("id")
        .groupBy((org.apache.spark.sql.functions.col("id") % 2).as("par"))
        .count()
        .writeStream.format("txlog")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    in.addData(1L, 2L, 3L)
    run()
    val first = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first === Map(0L -> 1L, 1L -> 2L))
    in.addData(4L, 6L)
    run()
    val second = TxLog.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(second === Map(0L -> 3L, 1L -> 2L))
  }

  test("update mode and missing checkpoint/appId are refused") {
    val p = new graft.sources.TxLogStreamProvider
    val ctx = spark.sqlContext
    intercept[IllegalArgumentException] {
      p.createSink(ctx, Map("path" -> tmp()), Nil, OutputMode.Update())
    }
    intercept[IllegalArgumentException] {
      p.createSink(ctx, Map("path" -> tmp()), Nil, OutputMode.Append())
    }
    // explicit txnAppId substitutes for the checkpoint-derived id
    p.createSink(ctx, Map("path" -> tmp(), "txnAppId" -> "app"), Nil,
      OutputMode.Append())
  }

  test("partitionBy on the stream writer creates a partitioned table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    val in = MemoryStream[Long]
    in.addData(0L until 12L: _*)
    val q = in.toDS().toDF("id")
      .withColumn("grp", expr("concat('g', id % 3)"))
      .writeStream.format("txlog")
      .partitionBy("grp")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val snap = TxLog.snapshot(dir)
    assert(TxLog.partitionColsOf(snap) === Seq("grp"))
    assert(snap.files.nonEmpty && snap.files.forall(_.pv.contains("grp")))
    assert(TxLog.readPartition(spark, dir, Map("grp" -> "g1")).count() === 4L)
    // a mismatched partitionBy against the existing table fails loudly
    val in2 = MemoryStream[Long]
    in2.addData(100L)
    val q2 = in2.toDS().toDF("id")
      .withColumn("grp", expr("concat('g', id % 3)"))
      .writeStream.format("txlog")
      .partitionBy("id")
      .option("path", dir)
      .option("checkpointLocation", s"$root/ckpt2")
      .trigger(Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.awaitTermination()
    }
    assert(e.getCause.getMessage.contains("partition"))
  }

  test("constraints gate streamed batches; the failed batch retries cleanly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val (dir, ckpt) = (s"$root/t", s"$root/ckpt")
    TxLog.append(spark, dir, Seq(1L).toDF("id"))
    TxLog.addConstraint(spark, dir, "pos", "id > 0")
    val in = MemoryStream[Long]
    in.addData(-5L)
    val q = in.toDS().toDF("id")
      .writeStream.format("txlog")
      .option("path", dir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getCause.getMessage.contains("pos") ||
      e.getCause.toString.contains("Constraint"))
    assert(TxLog.read(spark, dir).count() === 1L) // nothing landed
  }
}
