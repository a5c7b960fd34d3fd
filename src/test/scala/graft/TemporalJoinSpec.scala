package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TemporalJoin}

/** Edge semantics of the temporal joins: inclusive as-of ties, unmatched
  * left rows, bucket-boundary exactness of the range join, and the
  * partition-invariance of the hash split. */
class TemporalJoinSpec extends AnyFunSuite with SparkTestBase {

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: inclusive at equal ts, latest-prior otherwise, NULL when no prior") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 09:00:00"), "early"),   // before any state -> NULL
      (1L, ts("2024-01-01 10:00:00"), "tie"),     // equal ts -> inclusive match
      (1L, ts("2024-01-01 11:30:00"), "between"), // between states -> 10:00 state
      (1L, ts("2024-01-02 00:00:00"), "late"),    // after both -> 12:00 state
      (2L, ts("2024-01-01 12:00:00"), "otherkey") // key with no state -> NULL
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 12.0)
    ).toDF("k", "rt", "v")

    val out = TemporalJoin.asOfJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("tag", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      "early" -> None, "tie" -> Some(10.0), "between" -> Some(10.0),
      "late" -> Some(12.0), "otherkey" -> None))
  }

  test("asOfJoin: a matched right row with a NULL value wins AS A UNIT (no torn rows)") {
    import spark.implicits._
    // review regression: per-column carry paired the 12:00 row's ts with
    // the 10:00 row's value whenever the 12:00 value was NULL
    val left = Seq((1L, ts("2024-01-01 13:00:00"), "l")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5.0)),
      (1L, ts("2024-01-01 12:00:00"), None)
    ).toDF("k", "rt", "v")
    val r = TemporalJoin.asOfJoin(left, right, "k", "t", "rt", Seq("v")).head()
    assert(r.getAs[java.sql.Timestamp]("asof_ts") === ts("2024-01-01 12:00:00"))
    assert(r.isNullAt(r.fieldIndex("asof_v")), r.toString)
  }

  test("rangeJoin: inverted intervals match nothing instead of exploding") {
    import spark.implicits._
    val points = Seq((1L, 5.0)).toDF("id", "p")
    val iv = Seq(("ok", 0.0, 10.0), ("inverted", 1e9, 0.0)).toDF("label", "lo", "hi")
    val out = TemporalJoin.rangeJoin(points, "p", iv, "lo", "hi", bucketWidth = 1.0)
      .select("label").collect().map(_.getString(0)).toSeq
    assert(out === Seq("ok"))
  }

  test("rangeJoin: lo inclusive, hi exclusive, intervals spanning buckets still match") {
    import spark.implicits._
    val points = Seq((1L, 8.0), (2L, 11.999), (3L, 12.0), (4L, 25.0)).toDF("id", "p")
    // interval [8, 12) spans buckets 1..3 at width 4; [20, 30) spans 5..7
    val iv = Seq(("a", 8.0, 12.0), ("b", 20.0, 30.0)).toDF("label", "lo", "hi")
    val out = TemporalJoin.rangeJoin(points, "p", iv, "lo", "hi", bucketWidth = 4.0)
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "a"), (2L, "a"), (4L, "b"))) // 12.0 excluded (hi-exclusive)
  }

  test("rangeJoinIndexed (custom SparkPlan): equals theta join, plans RangeJoinExec, no exchange") {
    val bands = spark.range(40).selectExpr(
      "concat('band', CAST(id AS STRING)) AS label",
      "CAST(id * 8.0 AS DOUBLE) AS lo",
      "CAST(id * 8.0 + 12.0 AS DOUBLE) AS hi")
    val points = Td.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "value")
    val df = TemporalJoin.rangeJoinIndexed(points, "value", bands, "lo", "hi")
    val got = df.select("event_id", "label").collect().map(_.toString).sorted
    val theta = points.join(bands,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "label").collect().map(_.toString).sorted
    assert(got.sameElements(theta))

    // the custom strategy planned the custom exec, and the point side
    // streams through with NO exchange (outputPartitioning passthrough)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), plan.take(600)) // nodeName strips "Exec"
    assert(!plan.contains("Exchange"), plan.take(600))

    // edge semantics match rangeJoin: hi-exclusive, inverted intervals dropped
    import spark.implicits._
    val pts = Seq((1L, 8.0), (2L, 12.0), (3L, 5.0)).toDF("id", "p")
    val iv = Seq(("a", 8.0, 12.0), ("bad", 1e9, 0.0)).toDF("label", "lo", "hi")
    val out = TemporalJoin.rangeJoinIndexed(pts, "p", iv, "lo", "hi")
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "a")))
  }

  test("rangeJoin result equals the naive theta join on real data") {
    val bands = spark.range(40).selectExpr(
      "concat('band', CAST(id AS STRING)) AS label",
      "CAST(id * 8.0 AS DOUBLE) AS lo",
      "CAST(id * 8.0 + 12.0 AS DOUBLE) AS hi")
    val points = Td.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "value")
    val bucketed = TemporalJoin.rangeJoin(points, "value", bands, "lo", "hi", 8.0)
      .select("event_id", "label").collect().map(_.toString).sorted
    val theta = points.join(bands,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "label").collect().map(_.toString).sorted
    assert(bucketed.sameElements(theta))
  }

  test("saltedJoin: row-identical to the plain join, shuffles on (key, salt)") {
    import graft.operators.SkewJoin
    import spark.implicits._
    val big = Td.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "event_type", "value")
    val dim = Seq(("view", 1), ("click", 2), ("purchase", 3), ("signup", 4), ("error", 5))
      .toDF("event_type", "code")
    val plain = big.join(dim, "event_type")
      .select("event_id", "code").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(big, dim, Seq("event_type"), col("event_id"), 8)
      .select("event_id", "code").collect().map(_.toString).sorted
    assert(salted.sameElements(plain))

    // the join's exchange must carry the salt (key spread across reducers)
    val plan = SkewJoin.saltedJoin(big, dim, Seq("event_type"), col("event_id"), 8)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("__salt"), plan.take(800))
  }

  test("saltedJoin: rejects inputs that already carry a __salt column") {
    import graft.operators.SkewJoin
    import spark.implicits._
    val big = Seq(("a", 1L, 0)).toDF("k", "id", "__salt")
    val dim = Seq(("a", 9)).toDF("k", "code")
    assertThrows[IllegalArgumentException](
      SkewJoin.saltedJoin(big, dim, Seq("k"), col("id"), 4))
    assertThrows[IllegalArgumentException](
      SkewJoin.saltedJoin(dim, big, Seq("k"), col("code"), 4))
  }

  test("hashSplit: deterministic across repartitionings, proportions near trainPct") {
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    val a = Sampling.hashSplit(docs, "doc_id", 80)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.hashSplit(docs.repartition(17), "doc_id", 80)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b, "split membership must not depend on partitioning")
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"trainFrac=$trainFrac")
  }

  test("hashFold: k folds partition the corpus, every fold populated, deterministic") {
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
    val folds = Sampling.hashFold(docs, "doc_id", 5)
      .groupBy("fold").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(folds.values.sum === docs.count())
    // roughly balanced (md5 mixes uniformly): no fold under half the mean
    val mean = docs.count() / 5.0
    assert(folds.values.forall(_ > mean / 2), folds.toString)
  }
}
