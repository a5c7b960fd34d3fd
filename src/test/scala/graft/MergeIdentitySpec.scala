package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxLog
import graft.sources.TxLog.{WhenMatchedUpdate, WhenNotMatchedInsert}

/** MERGE × GENERATED ALWAYS AS IDENTITY: matched rows keep the
  * TARGET's engine-assigned ids, inserted rows allocate fresh ones
  * from the high-water, the commit advances the high-water property
  * (so later appends can never re-allocate a merged-in id), and every
  * path that would land a caller-chosen id is refused loudly. Before
  * this spec's round, mergeImpl/mergeClausesImpl accepted explicit
  * identity values and never advanced the high-water — silent
  * uniqueness corruption. */
class MergeIdentitySpec extends AnyFunSuite with SparkTestBase {

  private def tmp(name: String): String =
    graft.Scratch.dir(s"graft-$name").toString + "/t"

  /** (k STRING natural key, v STRING, row_id BIGINT identity). */
  private def mkTable(dir: String, n: Int = 5): Unit = {
    import spark.implicits._
    TxLog.create(dir, StructType(Seq(
      StructField("k", StringType),
      StructField("v", StringType),
      StructField("row_id", LongType))))
    TxLog.addIdentityColumn(spark, dir, "row_id")
    TxLog.append(spark, dir,
      (0 until n).map(i => (s"k$i", s"v$i")).toDF("k", "v"))
  }

  private def rows(dir: String): Map[String, (String, Long)] =
    TxLog.read(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap

  private def hw(dir: String): String =
    TxLog.snapshot(dir).props(TxLog.Identity.HighWater + "row_id")

  test("whole-row merge: matched keeps the target id, insert allocates, HW advances") {
    import spark.implicits._
    val dir = tmp("mid-merge")
    mkTable(dir)
    val before = rows(dir)
    // upsert: k1,k3 updated; k7,k8 inserted (row_id carried NULL)
    val src = Seq(("k1", "V1"), ("k3", "V3"), ("k7", "V7"), ("k8", "V8"))
      .toDF("k", "v").withColumn("row_id", lit(null).cast(LongType))
    TxLog.merge(spark, dir, src, "k")
    val after = rows(dir)
    assert(after("k1") === (("V1", before("k1")._2)), "matched row keeps its id")
    assert(after("k3") === (("V3", before("k3")._2)))
    assert(after("k0") === before("k0"), "untouched row unchanged")
    val ids = after.values.map(_._2).toSeq
    assert(ids.distinct.size === ids.size, "ids unique after merge")
    assert(Seq(after("k7")._2, after("k8")._2).forall(_ > 5L),
      "inserted ids allocated above the pre-merge high-water")
    assert(hw(dir) === "7", "HW advanced by the 2 inserts")
    // the ADVICE scenario: a later append must not collide
    TxLog.append(spark, dir, Seq(("k9", "v9")).toDF("k", "v"))
    val all = rows(dir).values.map(_._2).toSeq
    assert(all.distinct.size === all.size, "append after merge: still unique")
  }

  test("whole-row merge: explicit identity values and identity keys are refused") {
    import spark.implicits._
    val dir = tmp("mid-refuse")
    mkTable(dir)
    val bad = Seq(("kX", "vX", 999L)).toDF("k", "v", "row_id")
    val e1 = intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir, bad, "k")
    }
    assert(e1.getMessage.contains("GENERATED ALWAYS"))
    val e2 = intercept[IllegalArgumentException] {
      TxLog.merge(spark, dir,
        Seq((1L, "x", "y")).toDF("row_id", "k", "v"), "row_id")
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"))
  }

  test("whole-row merge under deletion vectors keeps ids and uniqueness") {
    import spark.implicits._
    val dir = tmp("mid-dv")
    mkTable(dir)
    TxLog.setProperties(dir, Map(TxLog.DeletionVectors.Enabled -> "true"))
    val before = rows(dir)
    val src = Seq(("k2", "V2"), ("k6", "V6")).toDF("k", "v")
      .withColumn("row_id", lit(null).cast(LongType))
    TxLog.merge(spark, dir, src, "k")
    val after = rows(dir)
    assert(after("k2") === (("V2", before("k2")._2)))
    assert(after("k6")._2 === 6L)
    assert(after.values.map(_._2).toSeq.distinct.size === after.size)
  }

  test("insert-only merge of purely-new keys (fully pruned candidates) allocates cleanly") {
    import spark.implicits._
    val dir = tmp("mid-newkeys")
    mkTable(dir)
    // every source key sorts ABOVE the table's stats range → candidate
    // discovery prunes to zero files; before the round-14 fix the
    // identity resolution crashed here on the missing __tid_ columns
    val src = Seq(("z1", "Z1"), ("z2", "Z2")).toDF("k", "v")
      .withColumn("row_id", lit(null).cast(LongType))
    TxLog.merge(spark, dir, src, "k")
    val after = rows(dir)
    assert(after.size === 7)
    assert(Seq(after("z1")._2, after("z2")._2).sorted === Seq(6L, 7L))
    assert(hw(dir) === "7")
  }

  test("mergeClauses: SET/INSERT of identity refused; star clauses refused") {
    import spark.implicits._
    val dir = tmp("mid-clause-refuse")
    mkTable(dir)
    val src = Seq(("k1", "V1")).toDF("k", "v")
    def fails(clauses: Seq[TxLog.MergeClause], needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        TxLog.mergeClauses(spark, dir, src, Seq("k"), clauses)
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    fails(Seq(WhenMatchedUpdate(set = Map("row_id" -> "5"))), "GENERATED ALWAYS")
    fails(Seq(WhenMatchedUpdate()), "list the columns explicitly")
    fails(Seq(WhenNotMatchedInsert(values = Map("k" -> "s.k", "row_id" -> "7"))),
      "GENERATED ALWAYS")
    fails(Seq(WhenNotMatchedInsert()), "list the columns explicitly")
  }

  test("mergeClauses: insert omitting identity allocates; matched update keeps id") {
    import spark.implicits._
    val dir = tmp("mid-clause")
    mkTable(dir)
    val before = rows(dir)
    val src = Seq(("k1", "U1"), ("knew", "N1")).toDF("k", "v")
    TxLog.mergeClauses(spark, dir, src, Seq("k"), Seq(
      WhenMatchedUpdate(set = Map("v" -> "s.v")),
      WhenNotMatchedInsert(values = Map("k" -> "s.k", "v" -> "s.v"))))
    val after = rows(dir)
    assert(after("k1") === (("U1", before("k1")._2)), "update keeps the id")
    assert(after("knew")._2 === 6L, "insert allocated from the high-water")
    assert(hw(dir) === "6")
    // uniqueness survives the next append (high-water was advanced)
    TxLog.append(spark, dir, Seq(("klast", "z")).toDF("k", "v"))
    val ids = rows(dir).values.map(_._2).toSeq
    assert(ids.distinct.size === ids.size)
  }

  test("mergeClauses: identity as the MERGE key is allowed for matched-only updates") {
    import spark.implicits._
    val dir = tmp("mid-idkey")
    mkTable(dir)
    // CDC keyed on the surrogate id: legal — nothing writes the id
    val src = Seq((1L, "patched")).toDF("row_id", "v")
    TxLog.mergeClauses(spark, dir, src, Seq("row_id"), Seq(
      WhenMatchedUpdate(set = Map("v" -> "s.v"))))
    val got = TxLog.read(spark, dir).where(col("row_id") === 1L)
      .select("v").head().getString(0)
    assert(got === "patched")
  }

  test("mergeClauses: reserved scan-internal source columns refused upfront") {
    import spark.implicits._
    val dir = tmp("mid-reserved")
    mkTable(dir)
    Seq("__i", "__dv_path", "__dv_idx").foreach { c =>
      val src = Seq(("k1", "V1", 0L)).toDF("k", "v", c)
      val e = intercept[IllegalArgumentException] {
        TxLog.mergeClauses(spark, dir, src, Seq("k"),
          Seq(WhenMatchedUpdate(set = Map("v" -> "s.v"))))
      }
      assert(e.getMessage.contains("reserved"), s"$c: ${e.getMessage}")
    }
  }

  test("a concurrent high-water advance ABORTS the merge instead of colliding ids") {
    import spark.implicits._
    val dir = tmp("mid-race")
    mkTable(dir) // hw = 5
    val readV = TxLog.latestVersion(dir)
    // the winner lands AFTER the merge pinned its read version and
    // advances the high-water to 6 — the loser's staged insert would
    // also claim id 6 if the rebase let it through
    TxLog.append(spark, dir, Seq(("kw", "vw")).toDF("k", "v"))
    val src = Seq(("kz", "vz")).toDF("k", "v")
      .withColumn("row_id", lit(null).cast(LongType))
    intercept[TxLog.ConcurrentWriteException] {
      TxLog.mergeAt(spark, dir, src, "k", readV)
    }
    val ids = rows(dir).values.map(_._2).toSeq
    assert(ids.distinct.size === ids.size, "no id collision after the race")
    assert(hw(dir) === "6", "only the winner advanced the high-water")
  }

  test("mergeClauses: SET on a generated column refused; SET of its base recomputes it") {
    import spark.implicits._
    val dir = tmp("mid-gen")
    TxLog.create(dir, StructType(Seq(
      StructField("k", StringType),
      StructField("ts", TimestampType),
      StructField("day", DateType))))
    TxLog.addGeneratedColumn(spark, dir, "day", "date(ts)")
    TxLog.append(spark, dir, Seq(("k0", java.sql.Timestamp.valueOf("2024-01-15 10:00:00")))
      .toDF("k", "ts"))
    val src = Seq(("k0", java.sql.Timestamp.valueOf("2024-03-02 09:30:00")))
      .toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      TxLog.mergeClauses(spark, dir, src, Seq("k"),
        Seq(WhenMatchedUpdate(set = Map("day" -> "DATE'2030-01-01'"))))
    }
    assert(e.getMessage.contains("generated column"))
    // SET ts → day recomputed from the NEW ts (the updateImpl rule)
    TxLog.mergeClauses(spark, dir, src, Seq("k"),
      Seq(WhenMatchedUpdate(set = Map("ts" -> "s.ts"))))
    val got = TxLog.read(spark, dir).select(col("day").cast(StringType))
      .head().getString(0)
    assert(got.startsWith("2024-03-02"))
  }
}
