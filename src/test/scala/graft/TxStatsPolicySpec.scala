package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog

/** Stats policy ([[TxLog.Stats]]): string min/max truncation with sound
  * max round-up, and stats column selection — the log-size controls for
  * string-heavy / wide tables. Skipping on truncated or absent stats
  * must only ever WEAKEN (scan more), never lose rows. */
class TxStatsPolicySpec extends AnyFunSuite with SparkTestBase {

  private def tmp(): String =
    graft.Scratch.dir("graft-stats").toString + "/t"

  test("long string stats truncate: min is a prefix, max rounds up, queries stay exact") {
    import spark.implicits._
    val dir = tmp()
    val docs = Seq(
      (1L, "alpha" + ("x" * 500)),
      (2L, "alpha" + ("y" * 500)),
      (3L, "beta" + ("z" * 500))).toDF("id", "text")
    TxLog.create(dir, StructType(docs.schema.fields))
    TxLog.setProperties(dir, Map(TxLog.Stats.MaxStringLen -> "16"))
    TxLog.append(spark, dir, docs.coalesce(1))
    val cs = TxLog.snapshot(dir).files.head.stats("text")
    assert(cs.min.get.length <= 16 && cs.max.get.length <= 16)
    assert(cs.min.get === "alpha" + ("x" * 11)) // prefix of the true min
    assert(cs.max.get > "beta" + ("z" * 500)) // rounded-up upper bound
    // equality on a full long value still finds its row (stats only admit)
    assert(TxLog.read(spark, dir)
      .where(col("text") === lit("beta" + ("z" * 500))).count() === 1L)
    // a DELETE keyed on the full string lands despite truncated stats
    TxLog.delete(spark, dir, s"text = '${"alpha" + ("y" * 500)}'")
    assert(TxLog.read(spark, dir).count() === 2L)
  }

  test("un-roundable max is dropped; min alone still bounds LessThan") {
    import spark.implicits._
    val dir = tmp()
    val high = "퟿" + ("￿" * 30) // every unit >= U+D7FF
    val rows = Seq((1L, "m" + ("q" * 100)), (2L, high + ("￿" * 100)))
    TxLog.create(dir, StructType(Seq(
      StructField("id", LongType), StructField("s", StringType))))
    TxLog.setProperties(dir, Map(TxLog.Stats.MaxStringLen -> "8"))
    TxLog.append(spark, dir, rows.toDF("id", "s").coalesce(1))
    val cs = TxLog.snapshot(dir).files.head.stats("s")
    assert(cs.min.get === "m" + ("q" * 7))
    assert(cs.max.isEmpty)
    // both rows remain reachable; a low range still prunes nothing wrong
    assert(TxLog.read(spark, dir).count() === 2L)
    assert(TxLog.read(spark, dir).where("s < 'z'").count() === 1L)
  }

  test("numIndexedCols: only the first N (plus machinery columns) carry stats") {
    import spark.implicits._
    val dir = tmp()
    val df = (0L until 100L).map(i => (i, s"v$i", i * 2.0, s"w$i"))
      .toDF("a", "b", "c", "d")
    TxLog.create(dir, StructType(df.schema.fields))
    TxLog.setProperties(dir, Map(TxLog.Stats.NumIndexed -> "2"))
    TxLog.append(spark, dir, df.coalesce(1))
    val stats = TxLog.snapshot(dir).files.head.stats
    assert(stats.keySet === Set("a", "b"))
    // filters on un-indexed columns still answer exactly (scan fallback)
    assert(TxLog.read(spark, dir).where("c = 50.0").count() === 1L)
    TxLog.delete(spark, dir, "d = 'w42'")
    assert(TxLog.read(spark, dir).count() === 99L)
  }

  test("explicit stats.columns list; bloom-indexed column stays indexed regardless") {
    import spark.implicits._
    val dir = tmp()
    val df = (0L until 50L).map(i => (i, s"v$i", i * 1.5)).toDF("k", "s", "x")
    TxLog.create(dir, StructType(df.schema.fields))
    TxLog.setProperties(dir, Map(
      TxLog.Stats.Columns -> "x",
      TxLog.BloomIndex.Columns -> "k",
      TxLog.BloomIndex.Bits -> (1 << 14).toString))
    TxLog.append(spark, dir, df.coalesce(1))
    TxLog.append(spark, dir,
      (50L until 100L).map(i => (i, s"v$i", i * 1.5)).toDF("k", "s", "x").coalesce(1))
    val stats = TxLog.snapshot(dir).files.head.stats
    assert(stats.contains("x") && stats.contains("k") && !stats.contains("s"))
    // bloom skipping on k still works (needs k's stats entry for the type)
    TxLog.delete(spark, dir, "k = 75")
    val m = TxLog.history(spark, dir).where("op = 'delete'")
      .select(element_at(col("metrics"), "files_scanned")).head().getLong(0)
    assert(m === 1L)
    assert(TxLog.read(spark, dir).count() === 99L)
  }

  test("partition columns are exempt from truncation (pv stays exact)") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq(
      (1L, "partition-value-alpha", 1.0),
      (2L, "partition-value-beta", 2.0),
      (3L, "partition-value-alpha", 3.0)).toDF("id", "p", "v")
    TxLog.create(dir, StructType(df.schema.fields), partitionBy = Seq("p"))
    TxLog.setProperties(dir, Map(TxLog.Stats.MaxStringLen -> "4"))
    TxLog.append(spark, dir, df)
    val pvs = TxLog.snapshot(dir).files.flatMap(_.pv.get("p")).distinct.sorted
    assert(pvs === Seq("partition-value-alpha", "partition-value-beta"))
    assert(TxLog.readPartition(spark, dir,
      Map("p" -> "partition-value-beta")).count() === 1L)
  }

  test("generated column and its base stay indexed under a selection") {
    import spark.implicits._
    val dir = tmp()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType),
      StructField("pay", StringType), StructField("ts_day", DateType)))
    TxLog.create(dir, schema, partitionBy = Seq("ts_day"))
    TxLog.addGeneratedColumn(spark, dir, "ts_day", "date(ts)")
    TxLog.setProperties(dir, Map(TxLog.Stats.Columns -> "id"))
    val rows = for (d <- 0 until 3; i <- 0 until 10) yield
      (d * 10L + i, java.sql.Timestamp.valueOf(f"2026-04-${d + 1}%02d 08:00:00"), "p" * 40)
    TxLog.append(spark, dir, rows.toDF("id", "ts", "pay"))
    val stats = TxLog.snapshot(dir).files.head.stats
    assert(stats.contains("ts") && stats.contains("ts_day") && stats.contains("id"))
    assert(!stats.contains("pay"))
    // derivation still prunes the raw-ts range to one day
    TxLog.delete(spark, dir,
      "ts >= timestamp'2026-04-02 00:00:00' AND ts < timestamp'2026-04-03 00:00:00'")
    val m = TxLog.history(spark, dir).where("op = 'delete'")
      .select(element_at(col("metrics"), "files_scanned")).head().getLong(0)
    assert(m === 1L)
    assert(TxLog.read(spark, dir).count() === 20L)
  }
}
