package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PqIndex, Similarity}
import graft.sources.TxLog

/** Incremental PQ code maintenance: the packed code table maintained
  * from the change feed must be bit-identical to re-encoding the live
  * corpus, and ADC search over it must equal the rebuild-every-time
  * path. */
class PqIndexSpec extends AnyFunSuite with SparkTestBase {

  private val M = 4; private val SubDim = 2; private val NCodes = 8

  private def root(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString

  /** 8-dim floats, varied, deterministic (the IvfIndexSpec generator). */
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

  private def frozenCodebook(corpus: org.apache.spark.sql.DataFrame) = {
    val plan = Similarity.pqCodebook(corpus, "vec_id % 13 = 0 AND vec_id < 300", NCodes)
    spark.createDataFrame(
      java.util.Arrays.asList(plan.collect(): _*), plan.schema).localCheckpoint(true)
  }

  test("maintained codes ≡ re-encoded corpus across update / optimize / delete / append") {
    val r = root("pqinc"); val src = s"$r/src"; val idx = s"$r/idx"
    val base = vecs(0L until 300L)
    val cb = frozenCodebook(base)
    TxLog.append(spark, src, base)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    var at = PqIndex.initialize(spark, src, idx, cb, M, SubDim)
    assert(TxLog.read(spark, idx).count() === 300L)

    TxLog.update(spark, src, "vec_id % 11 = 3",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    val rUpd = PqIndex.maintain(spark, src, idx, at, cb, M, SubDim); at = rUpd.srcVersion
    assert(rUpd.rowsApplied === (0L until 300L).count(_ % 11 == 3))

    TxLog.optimize(spark, src)
    val rOpt = PqIndex.maintain(spark, src, idx, at, cb, M, SubDim); at = rOpt.srcVersion
    assert(rOpt.layoutOnlySkip && rOpt.rowsApplied === 0L)

    TxLog.setProperties(src, Map(TxLog.DeletionVectors.Enabled -> "true"))
    TxLog.delete(spark, src, "vec_id % 5 = 2")
    val rDel = PqIndex.maintain(spark, src, idx, at, cb, M, SubDim); at = rDel.srcVersion

    // poison one surviving row each way (neither is % 5 = 2 — those are
    // gone): NaN (valid=false) and NULL (the coalesce case)
    TxLog.update(spark, src, "vec_id = 8",
      Map("embedding" -> "transform(embedding, x -> CAST('NaN' AS FLOAT))"))
    TxLog.update(spark, src, "vec_id = 9",
      Map("embedding" -> "CAST(NULL AS ARRAY<FLOAT>)"))
    TxLog.append(spark, src, vecs(300L until 360L))
    val rApp = PqIndex.maintain(spark, src, idx, at, cb, M, SubDim)
    assert(rApp.rowsApplied === 62L) // 60 inserts + 2 poisoned drops

    assert(diff(TxLog.read(spark, idx).select("_row_id", "vec_id", "codes", "q_units"),
      PqIndex.recompute(spark, src, cb, M, SubDim)) === 0L,
      "maintained ≢ re-encoded")
  }

  test("streaming maintenance: the code table follows its source, replays are no-ops") {
    val r = root("pqstream"); val src = s"$r/src"; val idx = s"$r/idx"
    val ckpt = s"$r/ckpt"
    val base = vecs(0L until 300L)
    val cb = frozenCodebook(base)
    TxLog.append(spark, src, base)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = PqIndex.initialize(spark, src, idx, cb, M, SubDim)
    val vInit = TxLog.latestVersion(idx) // append + drift-baseline props
    TxLog.update(spark, src, "vec_id % 9 = 4",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    TxLog.optimize(spark, src) // layout-only: empty batch, no index commit
    TxLog.delete(spark, src, "vec_id % 6 = 1")
    TxLog.append(spark, src, vecs(300L until 350L))
    PqIndex.stream(spark, src, idx, ckpt, at, cb, M, SubDim)
    assert(diff(TxLog.read(spark, idx).select("_row_id", "vec_id", "codes", "q_units"),
      PqIndex.recompute(spark, src, cb, M, SubDim)) === 0L,
      "streamed ≢ re-encoded")
    val v = TxLog.latestVersion(idx)
    assert(v - vInit === 3L, "exactly one index commit per DML window")
    // drift accumulators ride the merge commits (the version count
    // above pins no extra commit exists): cum = the two upsert-bearing
    // windows, last = the final append — a fully stream-maintained
    // code table drifts honestly
    val nUpd = (0L until 300L).count(_ % 9 == 4).toLong
    assert(PqIndex.driftReport(idx, bandUnits = 1000, window = "cum")
      .flowN === nUpd + 50L, "streamed windows did not accumulate drift")
    assert(PqIndex.driftReport(idx, bandUnits = 1000).flowN === 50L)
    PqIndex.stream(spark, src, idx, ckpt, at, cb, M, SubDim) // replay: no-op
    assert(TxLog.latestVersion(idx) === v)
    assert(PqIndex.driftReport(idx, bandUnits = 1000, window = "cum")
      .flowN === nUpd + 50L, "replay double-accumulated drift")
  }

  test("driftReport: delta-accumulated staleness signal trips on drifted flow only") {
    val r = root("pqdrift"); val src = s"$r/src"; val idx = s"$r/idx"
    val base = vecs(0L until 300L)
    val cb = frozenCodebook(base)
    TxLog.append(spark, src, base)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    var at = PqIndex.initialize(spark, src, idx, cb, M, SubDim)
    val r0 = PqIndex.driftReport(idx, bandUnits = 500000)
    assert(r0.flowN === 0L && !r0.tripped && r0.driftUnits === 0L)
    // FRESH flow: same generator — quantization distance holds the band
    TxLog.append(spark, src, vecs(300L until 360L))
    val rA = PqIndex.maintain(spark, src, idx, at, cb, M, SubDim); at = rA.srcVersion
    val fresh = PqIndex.driftReport(idx, bandUnits = 500000)
    assert(fresh.flowN === 60L && !fresh.tripped,
      s"same-distribution flow tripped: drift ${fresh.driftUnits}")
    // DRIFTED flow: scaled embeddings — L2 distance to every codeword
    // grows (cosine would NOT see a pure scale-up; subL2 does)
    TxLog.update(spark, src, "vec_id % 4 = 1",
      Map("embedding" -> "transform(embedding, x -> CAST(x * 7 AS FLOAT))"))
    val rB = PqIndex.maintain(spark, src, idx, at, cb, M, SubDim)
    val drifted = PqIndex.driftReport(idx, bandUnits = 500000)
    assert(drifted.flowN === rB.rowsApplied)
    assert(drifted.tripped,
      s"drifted flow did not trip: base ${drifted.baseAvgUnits} flow ${drifted.flowAvgUnits}")
    // cumulative smooths; the report is a property read by construction
    val cum = PqIndex.driftReport(idx, bandUnits = 500000, window = "cum")
    assert(cum.flowN === 60L + rB.rowsApplied)
    assert(cum.flowAvgUnits < drifted.flowAvgUnits)
  }

  test("ADC search over the maintained table ≡ pqTopK over the live corpus") {
    val r = root("pqsearch"); val src = s"$r/src"; val idx = s"$r/idx"
    val base = vecs(0L until 250L)
    val cb = frozenCodebook(base)
    TxLog.append(spark, src, base)
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = PqIndex.initialize(spark, src, idx, cb, M, SubDim)
    TxLog.append(spark, src, vecs(300L until 330L)) // ids past the codebook filter
    PqIndex.maintain(spark, src, idx, at, cb, M, SubDim): Unit
    val live = TxLog.read(spark, src).select("vec_id", "embedding")
    val viaIndex = PqIndex.searchTopK(TxLog.read(spark, idx), live,
      live.where("vec_id < 5"), cb, M, SubDim, rerankDepth = 10, k = 3)
    val rebuilt = Similarity.pqTopK(live, live.where("vec_id < 5"),
      "vec_id % 13 = 0 AND vec_id < 300", M, SubDim, NCodes,
      rerankDepth = 10, k = 3)
    assert(diff(viaIndex, rebuilt) === 0L)
  }
}
