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
      .select("_row_id", "vec_id", "cell", "embedding")
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
    assert(diff(TxLog.read(spark, idx).select("_row_id", "vec_id", "cell", "embedding"),
      IvfIndex.recompute(spark, src, cents)) === 0L)
  }

  test("streaming maintenance: the index follows its source, replays are no-ops") {
    val r = root("ivfstream"); val src = s"$r/src"; val idx = s"$r/idx"
    val ckpt = s"$r/ckpt"
    val cents = vecs((0L until 30L).map(_ * 17L)).localCheckpoint(true)
    TxLog.append(spark, src, vecs(0L until 400L))
    TxLog.enableRowTracking(spark, src)
    TxLog.setProperties(src, Map(TxLog.Cdf.Enabled -> "true"))
    val at = IvfIndex.initialize(spark, src, idx, cents)
    TxLog.update(spark, src, "vec_id % 9 = 4",
      Map("embedding" -> "transform(embedding, x -> CAST(-x AS FLOAT))"))
    TxLog.optimize(spark, src) // layout-only: empty batch, no index commit
    TxLog.delete(spark, src, "vec_id % 6 = 1")
    TxLog.append(spark, src, vecs(400L until 450L))
    IvfIndex.stream(spark, src, idx, ckpt, at, cents)
    assert(diff(TxLog.read(spark, idx).select("_row_id", "vec_id", "cell", "embedding"),
      IvfIndex.recompute(spark, src, cents)) === 0L)
    val v = TxLog.latestVersion(idx)
    assert(v === 3L, "exactly one index commit per DML window")
    IvfIndex.stream(spark, src, idx, ckpt, at, cents) // replay: no-op
    assert(TxLog.latestVersion(idx) === v)
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
