package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Exact substring (span-level) dedup — q116's operator. The oracle hash
  * proves corpus-level agreement; these prove the SPAN algebra on planted
  * inputs: exactly the duplicated >= n-token runs are removed (not their
  * carrier docs), runs shorter than n survive, coverage unions overlap
  * correctly, and the result is partition-invariant. */
class SubstringDedupSpec extends AnyFunSuite with SparkTestBase {

  private def run(rows: Seq[(Long, String)], n: Int, parts: Int = 4) = {
    import spark.implicits._
    Dedup.dropDuplicateSpans(rows.toDF("doc_id", "text").repartition(parts),
      "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
  }

  // unique filler tokens so no accidental grams duplicate
  private def filler(tag: String, k: Int): String =
    (0 until k).map(i => s"$tag$i").mkString(" ")

  test("a planted mid-document span >= n is removed from BOTH carriers, rest kept") {
    val span = "alpha beta gamma delta epsilon" // 5 tokens, n = 3
    val a = s"${filler("a", 4)} $span ${filler("b", 4)}" // positions 5..9
    val b = s"${filler("c", 2)} $span ${filler("e", 3)}" // positions 3..7
    val got = run(Seq((1L, a), (2L, b)), n = 3)
    assert(got(1L) === ((13L, 5L, s"${filler("a", 4)} ${filler("b", 4)}")))
    assert(got(2L) === ((10L, 5L, s"${filler("c", 2)} ${filler("e", 3)}")))
  }

  test("duplicated runs SHORTER than n survive (the resolution limit)") {
    val short = "x y" // 2 shared tokens, n = 3: no duplicated 3-gram
    val got = run(Seq((1L, s"$short ${filler("p", 3)}"),
      (2L, s"$short ${filler("q", 3)}")), n = 3)
    assert(got(1L)._2 === 0L, s"removed tokens from a sub-threshold run: ${got(1L)}")
    assert(got(2L)._2 === 0L)
  }

  test("a doc that IS the duplicated span empties out; docs shorter than n untouched") {
    val span = "one two three four five six"
    val got = run(Seq(
      (1L, s"$span ${filler("t", 5)}"), // carrier
      (2L, span), //                       pure boilerplate -> empty
      (3L, "tiny doc")), //                2 tokens < n -> no grams, kept
      n = 4)
    assert(got(2L) === ((6L, 6L, "")))
    assert(got(1L) === ((11L, 6L, filler("t", 5))))
    assert(got(3L) === ((2L, 0L, "tiny doc")))
  }

  test("overlapping duplicated grams merge into one covered run (no double removal)") {
    // shared 6-token run with n=4 -> 3 overlapping duplicated 4-grams;
    // union must cover exactly tokens of the run, once
    val runTxt = "r1 r2 r3 r4 r5 r6"
    val got = run(Seq((1L, s"$runTxt ${filler("u", 2)}"),
      (2L, s"${filler("v", 3)} $runTxt")), n = 4)
    assert(got(1L) === ((8L, 6L, filler("u", 2))))
    assert(got(2L) === ((9L, 6L, filler("v", 3))))
  }

  test("a WITHIN-doc repeat counts toward minCount (both occurrences removed)") {
    val span = "s1 s2 s3"
    val got = run(Seq((1L, s"$span ${filler("m", 2)} $span")), n = 3)
    assert(got(1L) === ((8L, 6L, filler("m", 2))))
  }

  test("NULL-text docs keep their row, reported untouched") {
    import spark.implicits._
    val span = "n1 n2 n3"
    val got = Dedup.dropDuplicateSpans(
      Seq((1L, s"$span x1"), (2L, s"$span y1"), (3L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(3L) === ((1L, 0L, ""))) // '' splits to one empty token, no grams
    assert(got(1L) === ((4L, 3L, "x1")))
  }

  test("result is partition-invariant") {
    val span = "alpha beta gamma delta"
    val rows = (0L until 30L).map(i => (i, s"${filler(s"f${i}x", 3)} $span")) :+
      (99L, filler("solo", 6))
    val results = Seq(1, 3, 8).map(p => run(rows, n = 3, parts = p))
    assert(results.distinct.size === 1)
  }
}
