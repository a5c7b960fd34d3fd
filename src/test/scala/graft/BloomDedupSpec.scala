package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The Bloom membership sketch (bloom_agg / bloom_contains) and the
  * incremental-dedup operator built on it: bit-identical filters under
  * any partitioning, the no-false-negatives contract, a measured
  * false-positive envelope, exactness of newAgainstHistory against a
  * plain anti-join, and the pruning claim — only dups + FPs survive the
  * pre-filter. */
class BloomDedupSpec extends AnyFunSuite with SparkTestBase {

  private def keys(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => s"$tag-doc-$i content body").toDF("text")
  }

  test("aggregated filter is bit-identical under any partitioning") {
    val data = keys(2000, "h")
    val filters = Seq(1, 4, 13).map { p =>
      data.repartition(p)
        .selectExpr("bloom_agg(xxhash64(text), 16384, 5) AS f")
        .head().getAs[Array[Byte]](0).toSeq
    }
    assert(filters.distinct.size === 1, "merge order changed the filter bytes")
  }

  test("no false negatives: every inserted key probes true") {
    val data = keys(2000, "h").cache()
    val f = data.selectExpr("bloom_agg(xxhash64(text), 16384, 5) AS f")
      .head().getAs[Array[Byte]](0)
    val misses = data
      .where(!call_function("bloom_contains", lit(f), expr("xxhash64(text)")))
      .count()
    assert(misses === 0)
    data.unpersist()
  }

  test("false-positive rate stays near the configured envelope") {
    // n=1000, m=16384, k=5 -> theoretical fp ~ 0.2%; assert < 2%
    val f = keys(1000, "h")
      .selectExpr("bloom_agg(xxhash64(text), 16384, 5) AS f")
      .head().getAs[Array[Byte]](0)
    val probes = keys(10000, "other")
    val fp = probes
      .where(call_function("bloom_contains", lit(f), expr("xxhash64(text)")))
      .count()
    assert(fp < 200, s"fp rate ${fp / 10000.0} way above envelope")
  }

  test("newAgainstHistory is EXACTLY the anti-join (planted dups + new)") {
    import spark.implicits._
    val history = (0 until 500).map(i => (i.toLong, s"hist body $i")).toDF("doc_id", "text")
    val incoming = ((1000 until 1300).map(i => (i.toLong, s"new body $i")) ++
      (0 until 120).map(i => (2000L + i, s"hist body $i"))) // re-sends
      .toDF("doc_id", "text")
    val got = Dedup.newAgainstHistory(history, incoming, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = incoming.join(history.select("text"), Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    assert(got === (1000L until 1300L).toSet, "re-sent history rows survived")
  }

  test("result is partition-invariant") {
    import spark.implicits._
    val history = (0 until 300).map(i => (i.toLong, s"hist $i")).toDF("doc_id", "text")
    val incoming = ((500 until 700).map(i => (i.toLong, s"new $i")) ++
      (0 until 50).map(i => (900L + i, s"hist $i"))).toDF("doc_id", "text")
    val sets = Seq(1, 3, 8).map { p =>
      Dedup.newAgainstHistory(history.repartition(p), incoming.repartition(p),
        "text").select("doc_id").collect().map(_.getLong(0)).toSet
    }
    assert(sets.distinct.size === 1)
  }

  test("pre-filter pruning: only dups + FPs reach the anti-join side") {
    import spark.implicits._
    val history = (0 until 2000).map(i => (i.toLong, s"hist $i")).toDF("doc_id", "text").cache()
    val incoming = ((0 until 10000).map(i => (10000L + i, s"fresh $i")) ++
      (0 until 100).map(i => (50000L + i, s"hist $i"))).toDF("doc_id", "text")
    val f = history.selectExpr("bloom_agg(xxhash64(text), 1048576, 5) AS f")
      .head().getAs[Array[Byte]](0)
    val survivors = incoming
      .where(call_function("bloom_contains", lit(f), expr("xxhash64(text)")))
      .count()
    // 100 true dups; at m=2^20, n=2000 the fp rate is ~0 — allow 1%
    assert(survivors >= 100 && survivors < 100 + 100,
      s"$survivors rows survived the pre-filter for 100 true dups")
    history.unpersist()
  }

  test("NULL text rows are definitely-new (anti-join semantics)") {
    import spark.implicits._
    val history = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val incoming = Seq((10L, "a"), (11L, null.asInstanceOf[String]), (12L, "c"))
      .toDF("doc_id", "text")
    val got = Dedup.newAgainstHistory(history, incoming, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(11L, 12L))
  }

  test("empty history: everything is new, nothing crashes") {
    import spark.implicits._
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val incoming = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val got = Dedup.newAgainstHistory(history, incoming, "text")
    assert(got.count() === 2)
  }

  test("bucketed variant: identical result to the single-filter path and the anti-join") {
    import spark.implicits._
    val history = (0 until 800).map(i => (i.toLong, s"hist body $i")).toDF("doc_id", "text")
    val incoming = ((1000 until 1400).map(i => (i.toLong, s"new body $i")) ++
      (0 until 150).map(i => (5000L + i, s"hist body $i"))).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = ids(incoming.join(history.select("text"), Seq("text"), "left_anti"))
    val single = ids(Dedup.newAgainstHistory(history, incoming, "text"))
    val bucketed = ids(Dedup.newAgainstHistoryBucketed(history, incoming,
      "text", numBuckets = 7, numBits = 16384))
    assert(single === want)
    assert(bucketed === want)
  }

  test("bucketed variant: an incoming bucket with no history probes NULL -> kept") {
    import spark.implicits._
    // single-row history: most of the incoming rows' buckets are empty
    val history = Seq((1L, "only history row")).toDF("doc_id", "text")
    val incoming = ((0 until 200).map(i => (100L + i, s"fresh $i")) :+
      ((999L, "only history row"))).toDF("doc_id", "text")
    val got = Dedup.newAgainstHistoryBucketed(history, incoming,
      "text", numBuckets = 32, numBits = 8192)
    assert(got.count() === 200)
    assert(!got.select("doc_id").collect().map(_.getLong(0)).contains(999L))
  }

  test("broadcast transport: a 64 MB filter rides a broadcast, never the plan/task binary") {
    import spark.implicits._
    // 2^29 bits = 64 MB of filter — the sizing where a lit() embed is
    // catastrophic (64 MB deserialized per task, a >128 MB plan string).
    val history = (0 until 1000).map(i => (i.toLong, s"hist body $i"))
      .toDF("doc_id", "text").repartition(2)
    // through parquet, not a LocalRelation — the optimizer folds filters
    // over local data at plan time, which would hide the probe
    val dir = graft.Scratch.dir("graft-bloom-bcast").toString
    ((5000 until 5200).map(i => (i.toLong, s"new body $i")) ++
      (0 until 60).map(i => (9000L + i, s"hist body $i"))).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val incoming = spark.read.parquet(dir)
    val got = Dedup.newAgainstHistory(history, incoming, "text", numBits = 1 << 29)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === (5000L until 5200L).toSet)
    val plan = got.queryExecution.sparkPlan.toString
    assert(plan.contains("bloom_contains_bcast"), plan.take(1200))
    assert(plan.length < (1 << 20),
      s"plan string is ${plan.length} bytes - the filter leaked into the plan")
  }

  test("partitioned variant: exact vs the anti-join; empty buckets kept; partition-invariant") {
    import spark.implicits._
    val history = (0 until 800).map(i => (i.toLong, s"hist body $i")).toDF("doc_id", "text")
    val incoming = ((1000 until 1400).map(i => (i.toLong, s"new body $i")) ++
      (0 until 150).map(i => (5000L + i, s"hist body $i"))).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = ids(incoming.join(history.select("text"), Seq("text"), "left_anti"))
    val sets = Seq(1, 3, 8).map { p =>
      ids(Dedup.newAgainstHistoryPartitioned(history.repartition(p),
        incoming.repartition(p), "text", numBuckets = 7, numBits = 16384))
    }
    assert(sets.forall(_ === want))
    // single-row history: most incoming buckets hold no filter -> NULL probe -> kept
    val tiny = Seq((1L, "only history row")).toDF("doc_id", "text")
    val probeIn = ((0 until 100).map(i => (100L + i, s"fresh $i")) :+
      ((999L, "only history row"))).toDF("doc_id", "text")
    val kept = ids(Dedup.newAgainstHistoryPartitioned(tiny, probeIn, "text",
      numBuckets = 32, numBits = 8192))
    assert(kept === (100L until 200L).toSet)
  }

  test("partitioned variant: no filter bytes reach the driver plan either") {
    import spark.implicits._
    val history = (0 until 500).map(i => (i.toLong, s"hist $i")).toDF("doc_id", "text")
    val incoming = (700 until 900).map(i => (i.toLong, s"new $i")).toDF("doc_id", "text")
    val got = Dedup.newAgainstHistoryPartitioned(history, incoming, "text",
      numBuckets = 8, numBits = 1 << 23)
    assert(got.count() === 200)
    val plan = got.queryExecution.sparkPlan.toString
    assert(plan.length < (1 << 20), s"plan string is ${plan.length} bytes")
    assert(plan.contains("CoGroup"), plan.take(1200))
  }

  test("broadcast handle lifecycle: release() makes NEW analysis fail cleanly") {
    val f = keys(100, "h")
      .selectExpr("bloom_agg(xxhash64(text), 8192, 5) AS f")
      .head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(f)
    val id = graft.functions.BloomBroadcasts.register(bc)
    assert(graft.functions.BloomBroadcasts.lookup(id) eq bc)
    graft.functions.BloomBroadcasts.release(id)
    val err = intercept[Throwable] {
      keys(10, "x").withColumn("m",
        call_function("bloom_contains_bcast", lit(id), expr("xxhash64(text)")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("no filter registered")), msgs(err).mkString(" | "))
  }

  test("broadcast handle lifecycle: a failed operator releases its pins (no forever-leak)") {
    import spark.implicits._
    val history = (0 until 50).map(i => (i.toLong, s"h $i")).toDF("doc_id", "text")
    // `incoming` lacks the text column, so plan construction throws AFTER
    // the filter is built and registered — the error path must release
    // the handle, or the registry pins the broadcast forever (the purge
    // loop skips strong slots).
    val bad = (0 until 10).map(i => (i.toLong, s"n $i")).toDF("doc_id", "other")
    val before = graft.functions.BloomBroadcasts.pinnedCount
    intercept[Throwable](Dedup.newAgainstHistory(history, bad, "text"))
    assert(graft.functions.BloomBroadcasts.pinnedCount === before,
      "newAgainstHistory leaked a strong pin on its error path")
    intercept[Throwable](Dedup.newAgainstHistoryBucketed(history, bad, "text",
      numBuckets = 4))
    assert(graft.functions.BloomBroadcasts.pinnedCount === before,
      "newAgainstHistoryBucketed leaked strong pins on its error path")
  }

  test("broadcast handle lifecycle: register→lookup window survives GC with no caller reference") {
    // BroadcastManager holds TorrentBroadcast only weakly, so if the
    // registry didn't pin it, a GC between register and plan analysis
    // could reclaim the filter. Register inside a method so no local
    // survives, force GC, then lookup must still succeed.
    def registerAndDrop(): Int = {
      val f = keys(50, "g")
        .selectExpr("bloom_agg(xxhash64(text), 8192, 5) AS f")
        .head().getAs[Array[Byte]](0)
      graft.functions.BloomBroadcasts.register(spark.sparkContext.broadcast(f))
    }
    val id = registerAndDrop()
    System.gc(); Thread.sleep(50); System.gc()
    val marked = keys(50, "g").withColumn("m",
      call_function("bloom_contains_bcast", lit(id), expr("xxhash64(text)")))
    assert(marked.filter(col("m")).count() === 50)
    graft.functions.BloomBroadcasts.release(id)
  }

  test("streaming ingest: foreachBatch dedups each micro-batch against all prior content") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val store = graft.Scratch.dir("graft-bloom-ingest").toString
    // seed the corpus so batch 1 already dedups against something
    Seq((1L, "seed alpha"), (2L, "seed beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(store)
    val source = MemoryStream[(Long, String)]
    val q = source.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val history = batch.sparkSession.read.parquet(store)
        Dedup.newAgainstHistory(history, batch, "text",
          numBits = 8192).write.mode("append").parquet(store)
      }
      .start()
    try {
      source.addData((10L, "doc one"), (11L, "seed alpha")) // 11 = redelivery of seed
      q.processAllAvailable()
      source.addData((12L, "doc one"), (13L, "doc two")) // 12 = cross-batch dup of 10
      q.processAllAvailable()
    } finally q.stop()
    val texts = spark.read.parquet(store).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(texts.map(_._2).distinct.length === texts.length, s"dup text survived: ${texts.toSeq}")
    assert(texts.map(_._1).toSeq === Seq(1L, 2L, 10L, 13L), texts.toSeq)
  }
}
