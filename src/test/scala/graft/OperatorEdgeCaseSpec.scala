package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Reshape, Similarity, TextAnalysis}

/** Degenerate-input behavior of the operators API: empty corpora, short
  * documents, and single-element inputs must yield empty/valid results,
  * never exceptions — the difference between a library and a demo. */
class OperatorEdgeCaseSpec extends AnyFunSuite with SparkTestBase {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dedup operators on an empty corpus return empty results") {
    val empty = docsOf()
    assert(Dedup.exactDuplicates(empty, "doc_id", "text").count() === 0)
    assert(Dedup.minhashLshPairs(empty, "doc_id", "text", 0.5).count() === 0)
    assert(Dedup.simhashPairs(empty, "doc_id", "text", 3).count() === 0)
    assert(Dedup.editDistancePairs(empty, "doc_id", "text", 10).count() === 0)
  }

  test("keepBestPerCluster works on STRING ids (no lossy numeric cast)") {
    import spark.implicits._
    // two near-identical docs (20 shared tokens, one extra on docB) and
    // one unrelated doc; ids are strings a numeric cast would NULL out
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      ("doc-a", base),
      ("doc-b", base + " extra"),
      ("doc-c", (1 to 20).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Dedup.keepBestPerCluster(docs, "doc_id", "text",
      "CAST(size(split(text, ' ')) AS BIGINT)", 0.6)
      .select("doc_id").collect().map(_.getString(0)).toSet
    // doc-b is longer -> it wins the cluster; doc-c is unpaired -> kept
    assert(kept === Set("doc-b", "doc-c"))
  }

  test("editDistancePairs fails loudly when a length band exceeds maxBandSize") {
    // 6 same-band docs against a cap of 5: the quadratic-verifier guard
    // must throw (pointing at the LSH path), not silently run or cap
    val docs = docsOf((1 to 6).map(i => (i.toLong, s"text number $i")): _*)
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(docs, "doc_id", "text", 10, maxBandSize = 5).count()
    }
    assert(e.getMessage.contains("dropNearDuplicates"))
    // at or under the cap the verifier runs normally
    assert(Dedup.editDistancePairs(docs, "doc_id", "text", 20, maxBandSize = 6)
      .count() === 15)
  }

  test("short documents (< 3 tokens) are excluded from shingle-based dedup, not fatal") {
    val docs = docsOf((1L, "one two"), (2L, "a"), (3L, "x y z same text here"),
      (4L, "x y z same text here"))
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 4L)))
  }

  test("exact dedup on identical single-token docs") {
    val docs = docsOf((5L, "same"), (9L, "same"), (7L, "other"))
    val out = Dedup.exactDuplicates(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(5L -> 2L, 7L -> 1L)) // keeper = min id
  }

  test("text analysis on empty and 1-char strings yields rows, not errors") {
    val docs = docsOf((1L, "a"), (2L, "ab cd"))
    assert(TextAnalysis.tokenCounts(docs, "doc_id", "text").count() === 2)
    assert(TextAnalysis.fingerprints(docs, "doc_id", "text").count() === 2)
    assert(TextAnalysis.termFrequencies(docs, "doc_id", "text").count() > 0)
  }

  test("similarity topK with k larger than the corpus returns all candidates ranked") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.topK(vecs, vecs.filter("vec_id = 0"), k = 10)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq === Seq((1L, 1), (2L, 2))) // 2 candidates, ranks contiguous
  }

  test("profiler: counts nulls/distincts correctly, rejects empty and duplicate column lists") {
    import spark.implicits._
    import graft.operators.Profiler
    val df = Seq((Some(1), "a"), (None, "b"), (Some(1), "b")).toDF("x", "s")
    val out = Profiler.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(out("x") === ((1L, 1L))) // one null, one distinct non-null value
    assert(out("s") === ((0L, 2L)))
    assertThrows[IllegalArgumentException](Profiler.profile(df, Seq.empty))
    assertThrows[IllegalArgumentException](Profiler.profile(df, Seq("x", "x")))
  }

  test("profileApprox: same output shape as exact; HLL distinct within rsd on real data") {
    import graft.operators.Profiler
    val docs = graft.Td.load(spark, "/root/testdata/sf0.001", "documents")
    val cols = Seq("doc_id", "lang", "source")
    val exact = Profiler.profile(docs, cols).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = Profiler.profileApprox(docs, cols).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(approx.keySet === exact.keySet)
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      // default rsd 5% — allow 3 standard errors, and exactness on tiny cards
      assert(math.abs(a - e) <= math.max(2.0, 0.15 * e),
        s"$c: approx $a vs exact $e")
    }
  }

  test("pivotDynamic: discovers sorted values, excludes NULLs, enforces the cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("g1", Some("b"), 1), ("g1", Some("a"), 2), ("g2", Some("a"), 3),
      ("g2", None, 99)).toDF("g", "p", "v")
    val wide = Reshape.pivotDynamic(df, Seq("g"), "p", sum(col("v")))
    // schema is deterministic (sorted values) and NULL produced no column
    assert(wide.columns.toSeq === Seq("g", "a", "b"))
    val byG = wide.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byG("g1") === (Some(2L), Some(1L)))
    assert(byG("g2") === (Some(3L), None))

    val many = (1 to 50).map(i => ("g", s"v$i", 1)).toDF("g", "p", "v")
    val ex = intercept[IllegalArgumentException](
      Reshape.pivotDynamic(many, Seq("g"), "p", sum(col("v")), maxValues = 10))
    assert(ex.getMessage.contains("more than 10 distinct values"))
  }
}
