package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnicodeNorm

/** Unicode normalization expressions (functions/NormalizeExprs): value
  * semantics against hand-derived UAX#15 cases, the allocation-free
  * ASCII fast path, codegen/interpreted agreement, and the dedup
  * integration the operators exist for. All non-ASCII content is spelled
  * as \u escapes so the combining-vs-precomposed distinction survives
  * every editor/VCS encoding layer.
  */
class NormalizeSpec extends AnyFunSuite with SparkTestBase {

  private val cafePre = "caf\u00e9" // precomposed e-acute
  private val cafeComb = "cafe\u0301" // e + combining acute: NFC-equal to cafePre
  private val cafeGrave = "caf\u00e8" // e-grave: distinct under any form

  private def u(s: String) = UTF8String.fromString(s)

  // -- value semantics ------------------------------------------------

  test("nfc composes a combining sequence; nfkc also folds compatibility forms") {
    assert(UnicodeNorm.nfc(u(cafeComb)).toString === cafePre)
    assert(UnicodeNorm.nfc(u(cafePre)).toString === cafePre) // already NFC
    // NFC preserves compatibility characters; NFKC folds them
    assert(UnicodeNorm.nfc(u("ﬁle")).toString === "ﬁle") // fi ligature stays
    assert(UnicodeNorm.nfkc(u("ﬁle")).toString === "file")
    assert(UnicodeNorm.nfkc(u("Ａ37")).toString === "A37") // fullwidth A
  }

  test("strip_accents folds Latin accents and leaves base letters") {
    assert(UnicodeNorm.stripAccents(u("Mühleisen niño ça")).toString
      === "Muhleisen nino ca")
    // combining form strips identically to precomposed
    assert(UnicodeNorm.stripAccents(u(cafePre)).toString === "cafe")
    assert(UnicodeNorm.stripAccents(u(cafeComb)).toString === "cafe")
  }

  test("ascii fast path returns the input instance unchanged (zero allocation)") {
    val s = u("plain ascii only")
    assert(UnicodeNorm.nfc(s) eq s)
    assert(UnicodeNorm.nfkc(s) eq s)
    assert(UnicodeNorm.stripAccents(s) eq s)
    // non-ASCII but already normalized: same instance too (quick check)
    val n = u(cafePre)
    assert(UnicodeNorm.nfc(n) eq n)
  }

  // -- expression layer -----------------------------------------------

  test("registered SQL functions evaluate; NULL propagates") {
    val r = spark.sql(
      s"SELECT nfc_normalize('$cafeComb') AS a, nfkc_normalize('ﬁle') AS b, " +
        "strip_accents('niño') AS c, nfc_normalize(CAST(NULL AS STRING)) AS d")
      .collect()(0)
    assert(r.getString(0) === cafePre)
    assert(r.getString(1) === "file")
    assert(r.getString(2) === "nino")
    assert(r.isNullAt(3))
  }

  test("codegen and interpreted paths agree over a generated corpus") {
    import spark.implicits._
    val rows = (0 until 64).map(i => s"w$i $cafeComb ﬁ niño é$i").toDF("t")
    def eval(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try rows.selectExpr("nfc_normalize(t) AS n", "nfkc_normalize(t) AS k",
        "strip_accents(t) AS s").collect().map(_.toSeq).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(eval("true") === eval("false"))
  }

  test("non-string input is rejected at analysis") {
    val e = intercept[Exception](spark.sql("SELECT nfc_normalize(42)").collect())
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  // -- the point: hash-keyed dedup sees through encoding variants -----

  test("exact dedup on the normalized column collapses NFC-equal variants only") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"the same doc $cafePre"),
      (2L, s"the same doc $cafeComb"), // NFC-equal to doc 1
      (3L, s"the same doc $cafeGrave") // genuinely different
    ).toDF("doc_id", "text")
    val rawDistinct = docs.select(md5(col("text"))).distinct().count()
    val normDistinct = docs.selectExpr("md5(nfc_normalize(text)) AS h").distinct().count()
    assert(rawDistinct === 3) // byte-level dedup misses the pair
    assert(normDistinct === 2) // normalization-aware dedup finds it
  }

  test("q141/q142 run and return the planted shapes at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val q141 = SparkEntry.queries("q141_nfc_dedup")(spark, sf).collect()
    assert(q141.length === 2)
    val byForms = q141.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // even docs collapse to 1 form saving exactly 1 byte each; odd stay 2
    assert(byForms(1L)._1 === byForms(1L)._2) // n_docs == bytes saved
    assert(byForms(2L)._2 === 0L)
    val q142 = SparkEntry.queries("q142_accent_fold")(spark, sf).collect()
    val terms = q142.map(_.getString(0)).toSeq
    assert(terms === Seq("cafe", "muhleisen", "nino"))
    // the fold is live: accented and plain spellings landed on one term
    val nRawForms = q142.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nRawForms("cafe") >= 2L && nRawForms("nino") >= 2L)
  }
}
