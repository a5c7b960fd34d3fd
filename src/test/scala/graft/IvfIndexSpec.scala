package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}
import graft.sources.TxLog

/** Incremental IVF maintenance: the posting table maintained from the
  * change feed must be BIT-IDENTICAL to one rebuilt from the corpus
  * snapshot, across updates (cell moves), deletes, late appends, and a
  * layout-only OPTIMIZE window consumed with zero data reads. */
class IvfIndexSpec extends AnyFunSuite with SparkTestBase {

  private def root(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString

  /** Deterministic 8-dim float embeddings: vec i, dim j →
    * ((i*31 + j*17) % 19 - 9) / 3.0f — varied signs, no zero vectors.
    * Element nullability is TRUE to match the table DDL round-trip
    * (StructType.fromDDL("ARRAY<FLOAT>") is containsNull=true). */
  private def vecs(ids: Seq[Long]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(ids.map { i =>
        Row(i, (0 until 8).map(j => ((i * 31 + j * 17) % 19 - 9) / 3.0f))
      }, 2), schema)
  }

  private def diff(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  test("maintained index ≡ rebuilt index across update / optimize / delete / append") {
    val r = root("ivfinc"); val src = s"$r/src"; val idx = s"$r/idx"
    val cents = vecs((0L until 40L).map(_ * 25L)).localCheckpoint(true)
    (0 until 3).foreach(b =>
      TxLog.append(spark, src, vecs((0L until 800L).filter(_ % 3 == b)).coalesce(1)))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    var at = IvfIndex.initialize(spark, src, idx, cents)
    assert(TxLog.read(spark, idx).count() === 800L)

    // UPDATE moves vectors to other cells (embedding negated)
    TxLog.update(spark, src, "vec_id % 11 = 3",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val rUpd = IvfIndex.maintain(spark, src, idx, at, cents); at = rUpd.srcVersion
    assert(rUpd.rowsApplied === (0L until 800L).count(_ % 11 == 3))
    assert(!rUpd.layoutOnlySkip)

    // OPTIMIZE rewrites every physical row — zero logical changes, so
    // the window must apply with ZERO data reads
    TxLog.optimize(spark, src)
    val rOpt = IvfIndex.maintain(spark, src, idx, at, cents); at = rOpt.srcVersion
    assert(rOpt.layoutOnlySkip && rOpt.rowsApplied === 0L)

    // merge-on-read DELETE drops postings by key
    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "vec_id % 5 = 2")
    val rDel = IvfIndex.maintain(spark, src, idx, at, cents); at = rDel.srcVersion
    assert(rDel.rowsApplied === (0L until 800L).count(_ % 5 == 2))

    // late batch inserts new postings (scored delta-sized)
    TxLog.append(spark, src, vecs(800L until 1000L))
    val rApp = IvfIndex.maintain(spark, src, idx, at, cents); at = rApp.srcVersion
    assert(rApp.rowsApplied === 200L)

    val got = TxLog.read(spark, idx)
      .select("_row_id", "vec_id", "cell", "embedding", "q_bp")
    val want = IvfIndex.recompute(spark, src, cents)
    assert(diff(got, want) === 0L, "maintained ≢ rebuilt")
    // sanity: the update really moved cells (the window wasn't a no-op)
    assert(got.where("vec_id % 11 = 3 AND vec_id % 5 <> 2 AND vec_id < 800")
      .join(IvfIndex.recompute(spark, src, cents).where("vec_id % 11 = 3")
        .select(col("vec_id"), col("cell").as("c2")), "vec_id")
      .where("cell <> c2").count() === 0L)
  }

  test("an upsert whose embedding became invalid leaves the index (MV predicate)") {
    val r = root("ivfinv"); val src = s"$r/src"; val idx = s"$r/idx"
    val cents = vecs(Seq(0L, 100L, 200L)).localCheckpoint(true)
    TxLog.append(spark, src, vecs(0L until 50L))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = IvfIndex.initialize(spark, src, idx, cents)
    // poison embeddings BOTH ways: NaN fails the validity predicate as
    // FALSE; NULL evaluates it to NULL — the coalesce-to-false rule is
    // what keeps the NULL rows from falling out of both merge branches
    // and leaving stale postings
    TxLog.update(spark, src, "vec_id IN (7, 13, 21)",
      Map("embedding" -> "transform(embedding, x -> CAST('NaN' AS FLOAT))"))
    TxLog.update(spark, src, "vec_id IN (8, 14)",
      Map("embedding" -> "CAST(NULL AS ARRAY<FLOAT>)"))
    val res = IvfIndex.maintain(spark, src, idx, at, cents)
    assert(res.rowsApplied === 5L)
    assert(TxLog.read(spark, idx).count() === 45L)
    assert(diff(TxLog.read(spark, idx).select("_row_id", "vec_id", "cell", "embedding", "q_bp"),
      IvfIndex.recompute(spark, src, cents)) === 0L)
  }

  test("driftReport: delta-accumulated staleness signal trips on drifted flow only") {
    val r = root("ivfdrift"); val src = s"$r/src"; val idx = s"$r/idx"
    val cents = vecs((0L until 25L).map(_ * 11L)).localCheckpoint(true)
    TxLog.append(spark, src, vecs(0L until 300L))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    var at = IvfIndex.initialize(spark, src, idx, cents)
    // a pre-flow report: no maintained vectors yet, nothing to trip
    val r0 = IvfIndex.driftReport(idx, bandBp = 500)
    assert(r0.flowN === 0L && !r0.tripped && r0.driftBp === 0L)

    // FRESH window: the same generator — the flow matches the frozen
    // quantizer as well as the baseline corpus did; no trip
    TxLog.append(spark, src, vecs(300L until 360L))
    val rA = IvfIndex.maintain(spark, src, idx, at, cents); at = rA.srcVersion
    val fresh = IvfIndex.driftReport(idx, bandBp = 500)
    assert(fresh.flowN === 60L)
    assert(!fresh.tripped,
      s"same-distribution flow tripped: drift ${fresh.driftBp} bp")

    // DRIFTED window: negated embeddings — best-cell cosine collapses,
    // the per-window ("last") signal must trip the band
    TxLog.update(spark, src, "vec_id % 4 = 1",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val rB = IvfIndex.maintain(spark, src, idx, at, cents); at = rB.srcVersion
    val drifted = IvfIndex.driftReport(idx, bandBp = 500)
    assert(drifted.flowN === rB.rowsApplied)
    assert(drifted.tripped,
      s"drifted flow did not trip: base ${drifted.baseAvgBp} flow ${drifted.flowAvgBp}")
    assert(drifted.flowAvgBp < fresh.flowAvgBp)

    // the cumulative window smooths across both flows and counts all of
    // them; the report itself reads ONLY the accumulator properties —
    // no corpus rescan, no kernels (driftReport's signature takes no
    // SparkSession: it is a driver-side property read by construction)
    val cum = IvfIndex.driftReport(idx, bandBp = 500, window = "cum")
    assert(cum.flowN === 60L + rB.rowsApplied)
    assert(cum.flowAvgBp > drifted.flowAvgBp && cum.flowAvgBp < fresh.flowAvgBp)

    // a recovered window (fresh data again) clears the per-window signal
    TxLog.append(spark, src, vecs(360L until 420L))
    IvfIndex.maintain(spark, src, idx, at, cents): Unit
    assert(!IvfIndex.driftReport(idx, bandBp = 500).tripped)
  }

  test("streaming maintenance: the index follows its source, replays are no-ops") {
    val r = root("ivfstream"); val src = s"$r/src"; val idx = s"$r/idx"
    val ckpt = s"$r/ckpt"
    val cents = vecs((0L until 30L).map(_ * 17L)).localCheckpoint(true)
    TxLog.append(spark, src, vecs(0L until 400L))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = IvfIndex.initialize(spark, src, idx, cents)
    val vInit = TxLog.latestVersion(idx) // append + drift-baseline props
    TxLog.update(spark, src, "vec_id % 9 = 4",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    TxLog.optimize(spark, src) // layout-only: empty batch, no index commit
    TxLog.delete(spark, src, "vec_id % 6 = 1")
    TxLog.append(spark, src, vecs(400L until 450L))
    IvfIndex.stream(spark, src, idx, ckpt, at, cents)
    assert(diff(TxLog.read(spark, idx).select("_row_id", "vec_id", "cell", "embedding", "q_bp"),
      IvfIndex.recompute(spark, src, cents)) === 0L)
    val v = TxLog.latestVersion(idx)
    assert(v - vInit === 3L, "exactly one index commit per DML window")
    // drift accumulators RIDE the merge commits (no extra versions —
    // the count above just pinned that): a fully stream-maintained
    // index drifts honestly. Cum = the two upsert-bearing windows
    // (the delete window adds no upserts); Last = the final append.
    val nUpd = (0L until 400L).count(_ % 9 == 4).toLong
    val cum0 = IvfIndex.driftReport(idx, bandBp = 500, window = "cum")
    assert(cum0.flowN === nUpd + 50L,
      s"streamed windows did not accumulate drift: flowN ${cum0.flowN}")
    assert(IvfIndex.driftReport(idx, bandBp = 500).flowN === 50L)
    IvfIndex.stream(spark, src, idx, ckpt, at, cents) // replay: no-op
    assert(TxLog.latestVersion(idx) === v)
    // the replayed pass skips data AND accumulators together —
    // exactly-once extends to the drift plane
    assert(IvfIndex.driftReport(idx, bandBp = 500, window = "cum")
      .flowN === nUpd + 50L, "replay double-accumulated drift")
  }

  test("searchTopK over the maintained index ≡ ivfTopK over the live corpus") {
    val r = root("ivfsearch"); val src = s"$r/src"; val idx = s"$r/idx"
    val cents = vecs((0L until 20L).map(_ * 13L)).localCheckpoint(true)
    TxLog.append(spark, src, vecs(0L until 300L))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = IvfIndex.initialize(spark, src, idx, cents)
    TxLog.append(spark, src, vecs(300L until 400L))
    IvfIndex.maintain(spark, src, idx, at, cents): Unit
    val live = TxLog.read(spark, src).select("vec_id", "embedding")
    val viaIndex = IvfIndex.searchTopK(TxLog.read(spark, idx),
      live.where("vec_id < 5"), cents, k = 3, nprobe = 2)
    val rebuilt = Similarity.ivfTopK(live, cents, "vec_id < 5", k = 3, nprobe = 2)
    assert(diff(viaIndex, rebuilt) === 0L)
  }
}
