package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of the parity surface itself: a
  * duplicate query name would silently collapse in the Map (one of the
  * two implementations would never be verified), an oracle without a
  * query would never run, and a malformed name would break the driver's
  * reporting. Cheap, and exactly the class of bug a 94-query surface
  * grows by copy-paste. */
class HarnessContractSpec extends AnyFunSuite with SparkTestBase {

  test("query names are unique, well-formed, and every oracle has a query") {
    val names = SparkEntry.allSpecs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    names.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"), s"malformed name: $n"))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size === names.size)
  }

  test("driver smoke contract: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // ---- testdata-drift contract for events.ts -------------------------------
  // Round 9 lost three queries and the test suite to a SILENT driver-side
  // regeneration that switched events.parquet from TIMESTAMP(NANOS) (read
  // as LONG under nanosAsLong) to TIMESTAMP(MICROS) NTZ. These cases pin
  // the canonicalization contract for every encoding the driver has ever
  // shipped, so the next drift fails HERE at `sbt test` time instead of as
  // oracle divergence in the round report.

  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** 2024-01-15T12:00:00Z in epoch micros — an arbitrary fixed instant. */
  private val epochMicros = 1705320000000000L

  test("events.ts canonicalizes to TIMESTAMP with correct values for all known parquet encodings") {
    import spark.implicits._
    val tmp = graft.Scratch.dir("graft-ts-contract")

    // (a) legacy TIMESTAMP(NANOS): Spark cannot WRITE nanos parquet, but
    // under nanosAsLong the reader surfaces it as a raw LONG column — so a
    // plain LONG parquet round-trips through the identical code path.
    val nanosPath = s"$tmp/nanos.parquet"
    Seq(epochMicros * 1000L).toDF("ts").write.parquet(nanosPath)
    val fromNanos = Td.canonicalizeTs(spark.read.parquet(nanosPath))

    // (b) TIMESTAMP(MICROS) NTZ — what the round-9 regeneration shipped.
    val ntzPath = s"$tmp/ntz.parquet"
    Seq(1L).toDF("i")
      .select(to_timestamp_ntz(lit("2024-01-15 12:00:00")).as("ts"))
      .write.parquet(ntzPath)
    val fromNtz = Td.canonicalizeTs(spark.read.parquet(ntzPath))
    assert(spark.read.parquet(ntzPath).schema("ts").dataType === TimestampNTZType,
      "NTZ fixture must actually exercise the NTZ branch")

    // (c) TIMESTAMP(MICROS) UTC-adjusted — the pass-through case.
    val tzPath = s"$tmp/tz.parquet"
    Seq(new java.sql.Timestamp(epochMicros / 1000L)).toDF("ts").write.parquet(tzPath)
    val fromTz = Td.canonicalizeTs(spark.read.parquet(tzPath))

    for ((df, enc) <- Seq(fromNanos -> "nanos-as-long", fromNtz -> "ntz", fromTz -> "utc")) {
      assert(df.schema("ts").dataType === TimestampType, s"encoding $enc")
      val micros = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(micros === epochMicros, s"encoding $enc: value drifted")
    }

    // (d) an encoding nobody handled must fail loudly, not pass through.
    val bad = Seq("2024-01-15").toDF("ts")
    assertThrows[IllegalArgumentException](Td.canonicalizeTs(bad))
  }

  test("the shipped testdata loads to canonical TIMESTAMP in a sane epoch range") {
    val ev = Td.load(spark, "/root/testdata/sf0.001", "events")
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"events.ts outside sane epoch range: years ${r.getInt(0)}..${r.getInt(1)} — " +
        "a unit-scale bug (nanos/micros/millis confusion) shifts years by orders of magnitude")
    // the streaming probe must agree with the batch contract end-to-end
    val streamed = graft.streaming.StreamingOps.windowedEventCounts(spark, "/root/testdata/sf0.001")
    val batch = ev.groupBy(date_trunc("day", col("ts")), col("event_type")).count()
    assert(streamed.count() === batch.count(),
      "streaming window count diverged from batch day-window count")
  }
}
