package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.Scd

/** SCD Type 2 builder (q112's operator): version boundaries and interval
  * chaining, re-send collapse, NULL-safe attribute comparison,
  * same-timestamp tie-breaks, multi-attribute tracking, and the
  * contiguity/single-current invariants on generated logs. */
class ScdSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("versions open on change, chain half-open intervals, flag one current") {
    val log = Seq(
      (1L, 10L, "bronze", ts(100)),
      (1L, 11L, "bronze", ts(200)), // re-send: collapses
      (1L, 12L, "silver", ts(300)),
      (1L, 13L, "gold", ts(400)),
      (2L, 20L, "silver", ts(150))
    ).toDF("user_id", "event_id", "status", "ts")
    val got = Scd.scd2(log, "user_id", Seq("status"), "ts", "event_id")
      .orderBy("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getBoolean(5)))
    assert(got === Array(
      (1L, 10L, "bronze", ts(100), ts(300), false),
      (1L, 12L, "silver", ts(300), ts(400), false),
      (1L, 13L, "gold", ts(400), null, true),
      (2L, 20L, "silver", ts(150), null, true)))
  }

  test("NULL attribute values are values: NULL->x and x->NULL open versions, NULL->NULL collapses") {
    val log = Seq(
      (1L, 1L, null.asInstanceOf[String], ts(10)),
      (1L, 2L, null.asInstanceOf[String], ts(20)), // collapses
      (1L, 3L, "a", ts(30)),
      (1L, 4L, null.asInstanceOf[String], ts(40))
    ).toDF("user_id", "event_id", "status", "ts")
    val got = Scd.scd2(log, "user_id", Seq("status"), "ts", "event_id")
      .orderBy("event_id").collect().map(r => (r.getLong(1), r.getString(2)))
    assert(got === Array((1L, null), (3L, "a"), (4L, null)))
  }

  test("same-timestamp updates order by the tie column") {
    val log = Seq(
      (1L, 2L, "b", ts(100)),
      (1L, 1L, "a", ts(100)),
      (1L, 3L, "c", ts(100))
    ).toDF("user_id", "event_id", "status", "ts")
    val got = Scd.scd2(log, "user_id", Seq("status"), "ts", "event_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getBoolean(5)))
    assert(got === Array((1L, "a", false), (2L, "b", false), (3L, "c", true)))
  }

  test("multi-attribute tracking: a change in ANY tracked column opens a version") {
    val log = Seq(
      (1L, 1L, "a", 10.0, ts(10)),
      (1L, 2L, "a", 20.0, ts(20)), // value changed
      (1L, 3L, "a", 20.0, ts(30)) // unchanged: collapses
    ).toDF("user_id", "event_id", "status", "value", "ts")
    val got = Scd.scd2(log, "user_id", Seq("status", "value"), "ts", "event_id")
      .orderBy("event_id").collect().map(_.getLong(1))
    assert(got === Array(1L, 2L))
  }

  test("invariants on a generated log: contiguous intervals, exactly one current per key") {
    val log = (0 until 600).map { i =>
      (i % 7L, i.toLong, s"s${(i / 13) % 3}", ts(1000L + i))
    }.toDF("user_id", "event_id", "status", "ts")
    val dim = Scd.scd2(log, "user_id", Seq("status"), "ts", "event_id").cache()
    val perKey = dim.collect()
      .map(r => (r.getLong(0), r.getTimestamp(3), r.getTimestamp(4), r.getBoolean(5)))
      .groupBy(_._1)
    perKey.foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      assert(sorted.count(_._4) === 1, s"key $k: not exactly one current")
      assert(sorted.last._3 == null, s"key $k: current version has valid_to")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 == b._2, s"key $k: gap between ${a._3} and ${b._2}")
        case _ =>
      }
    }
    dim.unpersist()
  }
}
