package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic stratified downsampling: the survivor set must be a pure
  * function of row ids — identical under any partitioning — and track the
  * requested per-stratum fractions. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val li = Td.load(spark, sf, "lineitem")
    .select(concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("id"),
      col("l_returnflag"))

  test("survivor set is identical across partitionings (unlike rand-based sampleBy)") {
    val fr = Map("A" -> 0.3, "N" -> 0.7, "R" -> 0.05)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.sampleStratified(df, "l_returnflag", "id", fr)
        .select("id").collect().map(_.getString(0)).toSet
    val base = ids(li)
    assert(base === ids(li.repartition(7, col("l_returnflag"))))
    assert(base === ids(li.coalesce(1)))
    assert(base.nonEmpty)
  }

  test("per-stratum survival rates track the requested fractions") {
    val fr = Map("A" -> 0.25, "N" -> 0.5) // R unnamed: kept in full
    val before = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.sampleStratified(li, "l_returnflag", "id", fr)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after("R") === before("R"), "unnamed stratum must be kept in full")
    Seq("A" -> 0.25, "N" -> 0.5).foreach { case (s, f) =>
      val rate = after(s).toDouble / before(s)
      assert(math.abs(rate - f) < 0.05, s"stratum $s: rate $rate vs fraction $f")
    }
  }

  test("fraction 0 drops a stratum entirely; fraction 1 keeps it entirely") {
    val out = Sampling.sampleStratified(li, "l_returnflag", "id",
        Map("A" -> 0.0, "N" -> 1.0))
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("A"))
    assert(out("N") === before("N"))
  }

  test("invalid fractions are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.sampleStratified(li, "l_returnflag", "id", Map("A" -> 1.2))
    }
    intercept[IllegalArgumentException] {
      // nonzero but below 1 basis point: would silently drop the stratum
      Sampling.sampleStratified(li, "l_returnflag", "id", Map("A" -> 0.00004))
    }
    intercept[IllegalArgumentException] {
      Sampling.capPerStratum(li, "l_returnflag", "id", 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.capPerStratum(li.withColumn("__rk", lit(1)), "l_returnflag", "id", 5)
    }
  }

  test("edge cases: empty fractions keep everything; quoted/backslash strata match; NULLs kept") {
    import spark.implicits._
    assert(Sampling.sampleStratified(li, "l_returnflag", "id", Map.empty).count()
      === li.count())
    val tricky = Seq(
      ("1", "it's"), ("2", "it's"), ("3", raw"C:\docs"), ("4", raw"C:\docs"),
      ("5", null), ("6", "plain")).toDF("id", "src")
    // strata with a quote and a backslash are DROPPED at fraction 0 —
    // proving the lookup matches them (a mis-escaped CASE would keep them)
    val out = Sampling.sampleStratified(tricky, "src", "id",
      Map("it's" -> 0.0, raw"C:\docs" -> 0.0))
    val kept = out.select("id").collect().map(_.getString(0)).toSet
    assert(kept === Set("5", "6"), s"NULL and unnamed strata kept, got $kept")
    // NULL id in an unnamed stratum must survive (hashes as '')
    val nullId = Seq((null.asInstanceOf[String], "plain")).toDF("id", "src")
    assert(Sampling.sampleStratified(nullId, "src", "id", Map("other" -> 0.5)).count() === 1)
  }

  test("capPerStratum: exactly min(k, n) rows per stratum, same set across partitionings") {
    val before = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 100
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.capPerStratum(df, "l_returnflag", "id", k)
        .select("id").collect().map(_.getString(0)).toSet
    val base = ids(li)
    assert(base === ids(li.repartition(7)))
    val counts = Sampling.capPerStratum(li, "l_returnflag", "id", k)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (s, n) =>
      assert(counts(s) === math.min(k.toLong, n), s"stratum $s") }
  }

  test("capPerStratum plans WindowGroupLimit (per-group top-k, no full stratum sort)") {
    val plan = Sampling.capPerStratum(li, "l_returnflag", "id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  // ---- sampleTokenBudget (q137's operator) ------------------------------

  private def budgetDocs = {
    import spark.implicits._
    // 3 domains × 10 docs × 100 tokens each = 1000 tokens per domain
    (0 until 30).map(i => (i.toLong, s"d${i % 3}", 100L)).toDF("id", "dom", "toks")
  }

  test("sampleTokenBudget: rates follow the integer formula; absent domains drop") {
    // weights d0=50%, d1=25% of a 1000-token budget over 1000-token
    // domains -> rate_bp 500*10000/... = 1000*5000/1000=5000bp, 2500bp.
    // d2 is not in the mix: dropped entirely.
    val out = Sampling.sampleTokenBudget(budgetDocs, "dom", "id", "toks",
      Map("d0" -> 5000L, "d1" -> 2500L), budgetTokens = 1000L)
    val rates = out.select("dom", "rate_bp").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates.keySet.subsetOf(Set("d0", "d1")))
    assert(rates.getOrElse("d0", -1L) === 5000L || !rates.contains("d0"))
    assert(rates.getOrElse("d1", -1L) === 2500L || !rates.contains("d1"))
    assert(out.where("dom = 'd2'").count() === 0)
  }

  test("sampleTokenBudget: over-budget domains cap at keep-everything") {
    val out = Sampling.sampleTokenBudget(budgetDocs, "dom", "id", "toks",
      Map("d0" -> 10000L), budgetTokens = 50000L) // 50x the domain
    assert(out.count() === 10)
    assert(out.select("rate_bp").distinct().head().getLong(0) === 10000L)
  }

  test("sampleTokenBudget: survivor set is partition-invariant") {
    val w = Map("d0" -> 4000L, "d1" -> 4000L, "d2" -> 2000L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.sampleTokenBudget(df, "dom", "id", "toks", w, 1500L)
        .select("id").collect().map(_.getLong(0)).toSet
    val base = ids(budgetDocs)
    assert(base === ids(budgetDocs.repartition(7)))
    assert(base === ids(budgetDocs.coalesce(1)))
  }

  test("sampleTokenBudget: zero-token domain in the mix is kept in full") {
    import spark.implicits._
    val docs = Seq((1L, "d0", 0L), (2L, "d0", 0L), (3L, "d1", 50L))
      .toDF("id", "dom", "toks")
    val out = Sampling.sampleTokenBudget(docs, "dom", "id", "toks",
      Map("d0" -> 5000L, "d1" -> 5000L), 100L)
    assert(out.where("dom = 'd0'").count() === 2)
  }

  test("sampleTokenBudget: invalid mixtures are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.sampleTokenBudget(budgetDocs, "dom", "id", "toks", Map.empty, 100L)
    }
    intercept[IllegalArgumentException] { // weights over 100%
      Sampling.sampleTokenBudget(budgetDocs, "dom", "id", "toks",
        Map("d0" -> 9000L, "d1" -> 2000L), 100L)
    }
    intercept[IllegalArgumentException] { // overflow-unsafe budget
      Sampling.sampleTokenBudget(budgetDocs, "dom", "id", "toks",
        Map("d0" -> 10000L), Long.MaxValue / 100L)
    }
  }

  test("sampleTokenBudget: rate lookup joins broadcast (no corpus-side shuffle)") {
    val plan = Sampling.sampleTokenBudget(budgetDocs, "dom", "id", "toks",
      Map("d0" -> 5000L), 1000L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  // ---- shuffleShards ------------------------------------------------------

  // The synthetic lineitem does NOT key uniquely on (orderkey, linenumber)
  // — shuffleShards' order contract requires unique ids, so the
  // permutation tests run on the distinct id set.
  private lazy val uli = li.select("id").distinct()

  private def shardPerm(df: org.apache.spark.sql.DataFrame, epoch: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("shuffle_key", "id")
    Sampling.shuffleShards(df, "id", 8, epoch)
      .withColumn("pos", row_number().over(w))
      .select("id", "shard", "pos").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
  }

  test("shuffleShards: permutation is a pure function of (id, epoch) — partition-invariant") {
    val base = shardPerm(uli, epoch = 3)
    assert(base === shardPerm(uli.repartition(13), epoch = 3))
    assert(base === shardPerm(uli.coalesce(1), epoch = 3))
    // total: every row exactly once, positions contiguous from 1 per shard
    assert(base.size === uli.count())
    base.groupBy(_._2._1).foreach { case (shard, rows) =>
      val ps = rows.values.map(_._2).toSeq.sorted
      assert(ps === (1 to ps.size), s"shard $shard positions not contiguous")
    }
  }

  test("shuffleShards: different epochs give different permutations, same row set") {
    val e0 = shardPerm(uli, epoch = 0)
    val e1 = shardPerm(uli, epoch = 1)
    assert(e0.keySet === e1.keySet)
    val moved = e0.count { case (id, sp) => e1(id) != sp }
    // md5 re-keys ~everything; require a strong majority to move
    assert(moved > e0.size * 3 / 4, s"only $moved of ${e0.size} rows moved between epochs")
  }

  test("shuffleShards: shards are balanced (uniform hash)") {
    val n = uli.count()
    val sizes = Sampling.shuffleShards(uli, "id", 8, epoch = 0)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length === 8)
    val expect = n.toDouble / 8
    sizes.foreach(s => assert(math.abs(s - expect) < expect * 0.2,
      s"shard size $s vs expected ~$expect"))
  }

  test("shuffleShards: pure projection — no exchange in the plan") {
    val plan = Sampling.shuffleShards(li, "id", 8, epoch = 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
  }

  test("shuffleShards: invalid arguments and column collisions are rejected") {
    intercept[IllegalArgumentException] { Sampling.shuffleShards(li, "id", 0, 0) }
    intercept[IllegalArgumentException] { Sampling.shuffleShards(li, "id", 8, -1) }
    intercept[IllegalArgumentException] {
      Sampling.shuffleShards(li.withColumn("shard", lit(1)), "id", 8, 0)
    }
  }

  // ---- sampleTemperature (q153's operator) ------------------------------

  private def skewedDocs = {
    import spark.implicits._
    // big domain 1600 tokens (16 docs), small domain 100 tokens (1 doc)
    ((0 until 16).map(i => (i.toLong, "big", 100L)) :+ (100L, "small", 100L))
      .toDF("id", "dom", "toks")
  }

  test("sampleTemperature flattens: the small domain's rate exceeds its natural share") {
    // α=0.5: w_big = 40/50, w_small = 10/50 of an 850-token budget →
    // big target 680 of 1600 (4250bp), small target 170 of 100 (capped
    // 10000bp). Natural (α=1) shares would give small 850/17 = 50 tokens
    // → 5000bp; flattening must push the small domain ABOVE that.
    val rates = Sampling.sampleTemperature(skewedDocs, "dom", "id", "toks",
      halvings = 1, budgetTokens = 850L)
      .select("dom", "rate_bp").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("small") === 10000L, s"small domain must cap at keep-all: $rates")
    assert(rates.get("big").forall(_ < 5000L),
      s"big domain must fall below its natural share: $rates")
  }

  test("sampleTemperature: survivor set is partition-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.sampleTemperature(df, "dom", "id", "toks", halvings = 2,
        budgetTokens = 600L).select("id").collect().map(_.getLong(0)).toSet
    val base = ids(skewedDocs)
    assert(base === ids(skewedDocs.repartition(7)))
    assert(base === ids(skewedDocs.coalesce(1)))
  }

  test("sampleTemperature: rejects bad arguments and rate-column collisions") {
    intercept[IllegalArgumentException] {
      Sampling.sampleTemperature(skewedDocs, "dom", "id", "toks", 0, 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleTemperature(skewedDocs, "dom", "id", "toks", 5, 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.sampleTemperature(skewedDocs.withColumn("rate_bp", lit(1L)),
        "dom", "id", "toks", 1, 100L)
    }
  }
}
