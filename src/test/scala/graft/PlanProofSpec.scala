package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable plan proofs: the Scaladoc scale claims ("the filter reaches
  * the scan", "this join broadcasts", "the rank window becomes a group
  * limit", "this aggregate is Expand-free") asserted against the actual
  * physical plans, so a Spark upgrade or a refactor cannot silently break
  * them (round-2 verdict, next-round #5). BucketedJoinSpec and
  * PartitionPruningSpec carry the remaining two proofs (zero-Exchange
  * bucketed join; partition-pruned scan).
  */
class PlanProofSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Final adaptive plan: AQE only settles broadcast-vs-shuffle at
    * runtime, so execute first, then render. */
  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed to the parquet scan and columns are pruned") {
    val qe = SparkEntry.queries("q01_scan_project")(spark, sf).queryExecution
    // sparkPlan (pre-AQE) — AdaptiveSparkPlanExec hides its input from collect
    val scan = qe.sparkPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scan.isDefined, qe.sparkPlan.toString.take(800))
    assert(scan.get.metadata("PushedFilters").contains("LessThan(l_shipdate"),
      scan.get.metadata("PushedFilters"))
    // projection needs 5 of lineitem's 16 columns — the scan must read only those
    assert(scan.get.requiredSchema.fieldNames.toSet ===
      Set("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"))
  }

  test("q23: the dimension side is broadcast (BroadcastHashJoin, no shuffle join)") {
    val plan = finalPlanOf("q23_join_broadcast")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q59: per-query top-k plans as WindowGroupLimit, not a full sort of candidates") {
    val plan = planOf("q59_ann_bruteforce")
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("q66: natural count+countDistinct term-frequency aggregate is Expand-free") {
    val plan = planOf("q66_term_frequency")
    assert(!plan.contains("Expand"), plan.take(800))
  }

  test("q82: events goldDaily (count+sum+countDistinct) is Expand-free") {
    val plan = planOf("q82_events_gold_daily")
    assert(!plan.contains("Expand"), plan.take(800))
  }

  test("q27: keep-latest dedup plans WindowGroupLimit (per-key top-1, no full window)") {
    val plan = planOf("q27_window_dedup")
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("q47: the star join's dimension hops broadcast; the fact-fact join shuffles on orderkey") {
    val plan = finalPlanOf("q47_star_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("both profile shapes are Expand-free; the packed exact agg is the counterexample") {
    import graft.operators.Profiler
    val docs = Td.load(spark, sf, "documents")
    val cols = Seq("doc_id", "lang", "source", "text")
    val approxPlan = Profiler.statsAgg(docs, cols, approx = true)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan.take(800))
    // the union-of-branches exact profile: no Expand anywhere, and each
    // branch's parquet scan reads ONLY its own column (pruned ReadSchema)
    val exactPlan = Profiler.profile(docs, cols)
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"), exactPlan.take(800))
    assert(exactPlan.contains("ReadSchema: struct<lang:string>"), exactPlan.take(1600))
    // the packed one-Aggregate spelling with 4 distinct groups is WHY
    // profile unions per-column branches instead
    val packedPlan = Profiler.statsAgg(docs, cols, approx = false)
      .queryExecution.executedPlan.toString
    assert(packedPlan.contains("Expand"), packedPlan.take(800))
  }

  test("q29: quartile bucketing has NO window at all (ntile replaced by boundary projection)") {
    // The round-4 perf-weak shape was ntile(4) over an unpartitioned
    // window — a single-reducer global sort. The replacement fetches
    // boundary tuples by range-partitioned selection in a side job, so
    // the query's own plan must contain no Window operator of any kind.
    val plan = planOf("q29_ntile_quartiles")
    assert(!plan.contains("Window"), plan.take(1200))
  }

  test("q71: IVF has no unpartitioned window and no window over the NxC expansion") {
    // Assignment must be the map-side-combinable min_by aggregate, not a
    // row_number window shuffling the NxC expanded relation on vec_id.
    // The only window allowed is the final per-query top-k rank
    // (partitioned by q_id), which plans as WindowGroupLimit.
    val df = SparkEntry.queries("q71_ann_ivf")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case g: org.apache.spark.sql.execution.window.WindowGroupLimitExec => g
    }
    windows.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        assert(w.partitionSpec.nonEmpty, "unpartitioned Window in q71:\n" + w)
        assert(w.partitionSpec.map(_.toString).mkString.contains("q_id"),
          "q71 window partitioned by something other than q_id:\n" + w)
      case g: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        assert(g.partitionSpec.nonEmpty, "unpartitioned WindowGroupLimit in q71:\n" + g)
    }
    // and the centroid-assignment argmax is an aggregate (partial mode
    // collapses the expansion before any exchange), visible as min_by
    assert(df.queryExecution.sparkPlan.toString.contains("min_by"),
      df.queryExecution.sparkPlan.toString.take(1200))
  }

  test("DV reads: clean tables scan join-free; DV tables broadcast the position list") {
    import spark.implicits._
    val root = graft.Scratch.dir("graft-dvplan").toString
    val dir = s"$root/t"
    graft.sources.TxLog.append(spark, dir,
      (0 until 5000).map(i => (i.toLong, s"v$i")).toDF("id", "s").repartition(1))
    // clean table: the read is a bare parquet scan — no join node at all
    val clean = graft.sources.TxLog.read(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!clean.contains("Join"), s"clean TxLog read grew a join:\n$clean")
    // DV table: the dead-position list joins as a BROADCAST anti-join
    // (AQE sees the tiny dv parquet and picks the broadcast build) —
    // never a shuffled join of the data side for a small DV
    graft.sources.TxLog.setProperties(dir,
      Map(graft.sources.TxLog.DeletionVectors.Enabled -> "true"))
    graft.sources.TxLog.delete(spark, dir, "id % 100 = 3")
    val df = graft.sources.TxLog.read(spark, dir)
    df.queryExecution.toRdd.count() // settle AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"DV read did not broadcast the position list:\n$plan")
    assert(df.count() === 4950L)
  }

  test("q106: global top-10 plans TakeOrderedAndProject, never a global sort") {
    val plan = planOf("q106_tpch_q3")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + driver merge, got:\n$plan")
    // limit(10) must not plan a full Sort of the grouped join output
    // (global sorts render as 'Sort [...], true, 0' — the 'true' is the
    // global flag)
    val globalSorts = plan.linesIterator.count(l =>
      l.contains("Sort [") && l.contains("], true,"))
    assert(globalSorts === 0, s"found a global Sort in:\n$plan")
  }

  test("q67: tf-idf df join has no forced broadcast; AQE broadcasts it at small scale") {
    // The logical plan must not carry a broadcast hint (a forced broadcast
    // of a web-scale vocabulary would OOM the driver)...
    val df = SparkEntry.queries("q67_tfidf")(spark, sf)
    assert(!df.queryExecution.logical.toString.contains("hint"),
      df.queryExecution.logical.toString.take(400))
    // ...but at this corpus size AQE should still pick the broadcast join
    // at runtime — proving we lose nothing on small vocabularies.
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("q109: the bloom probe is a scan-side Filter; definitely-new rows bypass every join") {
    // The union's first branch (bloom probe false/NULL) must contain no
    // join at all — that is the short-circuit the sketch buys. The
    // second branch carries the exactness anti-join.
    val df = SparkEntry.queries("q109_dedup_incremental")(spark, sf)
    val union = df.queryExecution.sparkPlan.collectFirst {
      case u: org.apache.spark.sql.execution.UnionExec => u
    }
    assert(union.isDefined, df.queryExecution.sparkPlan.toString.take(1200))
    // Catalyst flattens q109's nested unionAll (incoming is itself a
    // 2-way union) via CombineUnions AND distributes both the probe
    // filter and the left-anti join over the union legs, so the UnionExec
    // has one definitely-new and one confirm branch PER incoming leg.
    // Locate branches by content, not position, and assert the semantics:
    // every join-free branch short-circuits on a negative bloom probe,
    // and every anti-join is guarded by the positive probe (only
    // probe survivors pay the join).
    val branches = union.get.children.map(_.toString)
    val (joinBranches, newBranches) = branches.partition(_.contains("Join"))
    assert(joinBranches.nonEmpty, s"no confirm (anti-join) branch in:\n" +
      branches.map(_.take(400)).mkString("\n---\n"))
    assert(newBranches.nonEmpty, "no definitely-new branch survived planning")
    newBranches.foreach(b => assert(b.contains("bloom_contains"),
      s"a definitely-new branch does not probe the bloom filter:\n${b.take(800)}"))
    joinBranches.foreach(b => assert(b.contains("bloom_contains"),
      s"a confirm branch joins without the probe guard:\n${b.take(800)}"))
  }

  test("q116: span dedup has NO pairwise structure — every join equi, no nested loop") {
    val df = SparkEntry.queries("q116_substring_dedup")(spark, sf)
    df.queryExecution.sparkPlan.foreach {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        fail("q116 plans a cartesian product:\n" + j)
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        fail("q116 plans a nested-loop join:\n" + j)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        fail("q116 plans a window:\n" + w)
      case _ =>
    }
  }

  test("q119: encode is explode + equi-join + agg — no window, no nested loop over data") {
    // The learned merge pair rides a 1-row LOCAL relation cross-joined
    // into the word table (symbols as data, any charset) — a broadcast
    // nested-loop whose build side is a LocalTableScan of driver
    // literals is that idiom, not a pairwise-over-data hazard. Any
    // nested loop whose build side comes from a real scan still fails.
    val df = SparkEntry.queries("q119_bpe_encode")(spark, sf)
    df.queryExecution.sparkPlan.foreach {
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        fail("q119 plans a cartesian product:\n" + j)
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        val buildIsLocalLiteral = (if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight) j.right else j.left)
          .collectLeaves().forall(_.isInstanceOf[org.apache.spark.sql.execution.LocalTableScanExec])
        if (!buildIsLocalLiteral)
          fail("q119 plans a nested-loop join over scanned data:\n" + j)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        fail("q119 plans a window:\n" + w)
      case _ =>
    }
  }

  test("q113: scoring is a pure projection — no window, no join, no aggregate") {
    // Training runs as side jobs at build time; the returned plan is the
    // margin projection plus the oracle-ordering sort only.
    val df = SparkEntry.queries("q113_quality_classifier")(spark, sf)
    val plan = df.queryExecution.sparkPlan
    plan.foreach {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        fail("q113 scoring plans a join:\n" + j)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        fail("q113 scoring plans a window:\n" + w)
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        fail("q113 scoring plans an aggregate:\n" + a)
      case _ =>
    }
  }

  test("q114: chunking plans no exchange besides the oracle-ordering sort") {
    val df = SparkEntry.queries("q114_chunking")(spark, sf)
    val exchanges = df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // exactly one range exchange for the final orderBy; the chunker
    // itself is projection + Generate
    assert(exchanges.size <= 1, df.queryExecution.sparkPlan.toString.take(1200))
    assert(df.queryExecution.sparkPlan.toString.contains("Generate"),
      "chunker lost its explode")
  }

  test("q112/q115: every window is keyed (no unpartitioned window anywhere)") {
    Seq("q112_scd2", "q115_context_packing").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.queryExecution.sparkPlan.foreach {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          assert(w.partitionSpec.nonEmpty, s"unpartitioned Window in $q:\n" + w)
        case _ =>
      }
    }
  }

  test("q126: PQ encode collapses map-side (min_by agg); every data-side window keyed") {
    // The code assignment must be the assignCells discipline: a min_by
    // aggregate whose partial mode collapses the N×nCodes broadcast
    // expansion before any exchange — never a row_number window over it.
    // Windows are allowed only per-query (candidate cut + final rank) and
    // over the nCodes-scale codebook sample (the bounded row_number).
    val df = SparkEntry.queries("q126_ann_pq")(spark, sf)
    val plan = df.queryExecution.sparkPlan
    assert(plan.toString.contains("min_by"), plan.toString.take(1200))
    assert(!plan.toString.contains("CartesianProduct"), plan.toString.take(1200))
    // The codebook is collected once as a local relation (bounded nCodes
    // rows), so the DATA plan has no unpartitioned window at all: the
    // candidate cut and final rank are keyed on q_id.
    plan.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        assert(w.partitionSpec.nonEmpty, "unpartitioned Window in q126:\n" + w)
      case _ =>
    }
  }

  test("q130: the tercile composition has NO window at all (q29 discipline)") {
    // bigramLmScores is joins+aggregates; ntileBuckets replaces the
    // global ntile with collected boundaries + a CASE projection; the
    // sampler is arithmetic. Any WindowExec appearing here means the
    // single-reducer global sort crept back in.
    val df = SparkEntry.queries("q130_ccnet_buckets")(spark, sf)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, windows.mkString("\n"))
  }

  test("langId: the profile lookup is broadcast; per-doc windows keyed") {
    val df = SparkEntry.queries("q125_langid")(spark, sf)
    val plan = finalPlanOf("q125_langid")
    // The (langs × k)-row profile must ride broadcasts; nothing
    // corpus-global may shuffle-join.
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(1200))
    df.queryExecution.sparkPlan.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        assert(w.partitionSpec.nonEmpty, "unpartitioned Window in q125:\n" + w)
      case _ =>
    }
  }

  test("q146: DSIR histograms ride broadcasts; selection is TakeOrdered; no shuffle join") {
    val plan = finalPlanOf("q146_dsir_select")
    // the B-row log-ratio relation and the 1-row totals must broadcast;
    // a shuffle join on bucket would exchange the corpus-sized
    // (doc, bucket) relation for a 64-row build side
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // top-k selection must be heap-based, never a global sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1200))
  }

  test("partitioned staging is ONE exchange; readPartition scans join- and exchange-free") {
    import spark.implicits._
    import graft.sources.TxLog
    val dir = graft.Scratch.dir("graft-planpart").toString + "/t"
    val d = (0 until 300).map(i => (i.toLong, s"v$i", s"g${i % 3}"))
      .toDF("id", "s", "grp")
    TxLog.appendPartitioned(spark, dir, d, Seq("grp"))
    // the partition-pruned read: a metadata decision feeding a plain
    // parquet scan — no join, no exchange, no subquery machinery
    val scan = TxLog.readPartition(spark, dir, Map("grp" -> "g1"))
    val plan = scan.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1200))
    assert(!plan.contains("Join"), plan.take(1200))
    assert(scan.inputFiles.length === 1, "one file per partition value")
    // the partitioned WRITE paid exactly one shuffle (the value-routing
    // repartition) — verified by the file layout it produced: one file
    // per combination, each wholly owning its value
    val snap = TxLog.snapshot(dir)
    assert(snap.files.size === 3)
    assert(snap.files.map(_.pv("grp")).distinct.size === 3)
  }

}
