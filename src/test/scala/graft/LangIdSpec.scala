package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Cavnar-Trenkle rank-order langid: hand-computed out-of-place
  * arithmetic, real discrimination on separable languages, the missing-
  * gram max penalty, deterministic tie-breaks, and partition
  * invariance. */
class LangIdSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def run(rows: Seq[(Long, String, String, Boolean)], k: Int = 40) =
    TextAnalysis.langId(
      rows.toDF("doc_id", "text", "lang", "tr"),
      "doc_id", "text", "lang", trainPred = col("tr"), profileSize = k)
      .orderBy("doc_id")

  test("separable languages classify perfectly") {
    // Two mini-languages with disjoint character inventories.
    val de = "der die das und ist nicht von mit sich auf"
    val en = "the quick brown fox jumps over lazy dogs again"
    val rows = Seq(
      (1L, de, "de", true), (2L, de + " " + de, "de", true),
      (3L, en, "en", true), (4L, en + " " + en, "en", true),
      (10L, "der und das ist von", "de", false),
      (11L, "the fox jumps over dogs", "en", false))
    val out = run(rows).collect()
    assert(out.map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((10L, "de"), (11L, "en")))
    assert(out.forall(r => r.getString(1) === r.getString(2))) // all correct
  }

  test("out-of-place distance is the hand-computed integer") {
    // One language, one test doc, k large enough that no gram is cut.
    // Train text "aab": grams {aab}. rank: aab=1.
    // Test doc "aab aab": grams {aab, "ab ", "b a", " aa", aab} ->
    //   counts: aab=2, " aa"=1, "ab "=1, "b a"=1
    //   ranks (count DESC, gram ASC): aab=1, " aa"=2, "ab "=3, "b a"=4
    // vs lang profile {aab->1}: |1-1| + 3 missing * k(=10) = 30.
    val rows = Seq(
      (1L, "aab", "x", true),
      (2L, "aab aab", "x", false))
    val out = run(rows, k = 10).collect()
    assert(out.length === 1)
    assert(out.head.getString(2) === "x")
    assert(out.head.getLong(3) === 30L)
  }

  test("prediction tie breaks to the lexicographically first language") {
    // Both languages have identical profiles -> identical distances.
    val rows = Seq(
      (1L, "zzz", "b", true), (2L, "zzz", "a", true),
      (3L, "zzz", "?", false))
    val out = run(rows).collect()
    assert(out.head.getString(2) === "a")
  }

  test("docs shorter than one trigram are excluded from both sides") {
    val rows = Seq(
      (1L, "abcabc", "x", true),
      (2L, "ab", "x", false),  // too short to classify
      (3L, "abc", "x", false))
    val out = run(rows).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("profileSize caps the language profile (rank never exceeds k)") {
    // Train text with 5 distinct grams, k=2: only the top-2 survive, so
    // a test doc hitting ONLY dropped grams pays the max penalty per gram.
    val rows = Seq(
      (1L, "aaa aaa aaa bbb", "x", true), // aaa dominates; top-2 by count
      (2L, "bbb", "x", false))
    val out = run(rows, k = 2).collect()
    // Test doc "bbb" has 1 gram {bbb}; if bbb was cut from the profile
    // the distance is exactly k=2, else it's an in-profile rank diff < 2.
    assert(out.head.getLong(3) <= 2L)
  }

  test("partition invariance: repartitioned input yields identical rows") {
    val langs = Seq("aa", "bb", "cc")
    val rows = (0 until 120).map { i =>
      val l = langs(i % 3)
      val word = l match { case "aa" => "alpha beta"; case "bb" => "bravo delta"; case _ => "charlie echo" }
      (i.toLong, s"$word $word token$i", l, i % 4 != 0)
    }
    val df = rows.toDF("doc_id", "text", "lang", "tr")
    val a = TextAnalysis.langId(df.repartition(1), "doc_id", "text", "lang", col("tr"), 20)
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.langId(df.repartition(7, col("lang")), "doc_id", "text", "lang", col("tr"), 20)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
