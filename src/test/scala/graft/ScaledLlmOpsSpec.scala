package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale guardrail for the LLM-pipeline operators (round-2 verdict,
  * next-round #8): run the dedup/text operators on 10× and 40× blowups of
  * the sf0.001 documents corpus and assert the quantity that kills
  * 100 TB jobs — CANDIDATE-PAIR COUNT — grows linearly in corpus size,
  * not quadratically. A wall-clock sanity budget guards against an
  * accidental all-pairs plan sneaking in (generous bound: local[4] CI
  * box, not a perf benchmark).
  *
  * Replication here perturbs each copy's text with a copy-specific token
  * (a replica tail marker), so replicas are near-dups of their original —
  * the worst realistic case for LSH skew short of pure boilerplate (which
  * LshRecallSpec's hot-bucket test covers).
  */
class ScaledLlmOpsSpec extends AnyFunSuite with SparkTestBase {

  private def corpusTimes(n: Int): DataFrame = {
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    docs.crossJoin(spark.range(n).select(col("id").as("copy")))
      .select(
        (col("doc_id") + col("copy") * 100000L).as("doc_id"),
        when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" replica tail marker rt"), col("copy")))
          .as("text"))
  }

  test("minhash LSH candidate pairs grow ~linearly from 10x to 40x corpus") {
    val pairs10 = graft.operators.Dedup
      .minhashLshPairs(corpusTimes(10), "doc_id", "text", 0.6).count()
    val t0 = System.nanoTime()
    val pairs40 = graft.operators.Dedup
      .minhashLshPairs(corpusTimes(40), "doc_id", "text", 0.6).count()
    val secs40 = (System.nanoTime() - t0) / 1e9

    // Each original matches its replicas and replicas match each other
    // WITHIN a doc family (bounded family size) — pair count should scale
    // ~quadratically in replicas-per-doc but LINEARLY in #docs. Between
    // 10x and 40x, families grow 4×, so within-family pairs grow ≤16×;
    // a quadratic cross-corpus blowup would be 16× on TOP of that scale.
    assert(pairs10 > 0)
    assert(pairs40 < pairs10 * 20, s"pairs10=$pairs10 pairs40=$pairs40")
    assert(secs40 < 120, s"40x corpus took ${secs40}s — quadratic plan?")
  }

  test("simhash banded pairs at 10x stay bounded by base-pairs x replicas^2") {
    val n = 10
    val basePairs = graft.operators.Dedup
      .simhashPairs(corpusTimes(1), "doc_id", "text", 3).count()
    val pairs = graft.operators.Dedup
      .simhashPairs(corpusTimes(n), "doc_id", "text", 3).count()
    val docs = Td.load(spark, "/root/testdata/sf0.001", "documents").count()
    // Replication multiplies every base near-pair by ≤ n² (replica-replica
    // crossings) and adds ≤ C(n,2) within-family pairs per doc; a
    // corpus-quadratic blowup would instead approach C(n·docs, 2) ≈ 12.5M.
    val ceiling = (basePairs + docs) * n.toLong * n * 1.5
    assert(pairs > 0 && pairs <= ceiling, s"base=$basePairs pairs=$pairs ceiling=$ceiling")
  }

  test("large-star CC labels a 20x-corpus pair graph inside the round and time budget") {
    // end-to-end at scale: LSH pairs over 10k docs (dense replica
    // families) → star-alternation clustering. The budget guards the two
    // ways this dies at 100 TB: round blowup (log-diameter claim) and a
    // quadratic candidate step sneaking into pair generation.
    val c = corpusTimes(20)
    val pairs = graft.operators.Dedup.minhashLshPairs(c, "doc_id", "text", 0.6)
    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.clustersLargeStar(pairs, "doc_a", "doc_b")
    val nPaired = labels.count()
    val nClusters = labels.select("cluster_id").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    // replica families are ~21-member cliques: far fewer clusters than members
    assert(nPaired > 0 && nClusters < nPaired / 2,
      s"paired=$nPaired clusters=$nClusters")
    assert(secs < 120, s"20x clustering took ${secs}s")
  }

  test("substring-span dedup scales linearly: no candidate-pair structure at all") {
    // dropDuplicateSpans has NO pairwise step (dup grams fan out by
    // occurrence, not by occurrence²) — so 4× the corpus must give ~4×
    // the removed mass, exactly corpus-count output rows, and bounded
    // wall-clock. Replica families share their full original text, the
    // worst case: essentially every original token sits under a
    // duplicated 8-gram.
    def removedMass(c: DataFrame): (Long, Long) = {
      val out = graft.operators.Dedup.dropDuplicateSpans(c, "doc_id", "text", 8)
      val r = out.agg(count(lit(1)), sum("n_removed")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (rows10, rem10) = removedMass(corpusTimes(10))
    val t0 = System.nanoTime()
    val (rows40, rem40) = removedMass(corpusTimes(40))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows40 === rows10 * 4, "output is not one row per doc")
    assert(rem10 > 0 && rem40 <= rem10 * 5 && rem40 >= rem10 * 3,
      s"removed mass not ~linear: 10x=$rem10 40x=$rem40")
    assert(secs < 120, s"40x span dedup took ${secs}s — quadratic plan?")
  }

  test("term-frequency and tf-idf scale linearly in rows (no Expand, no forced broadcast)") {
    val c = corpusTimes(20)
    val t0 = System.nanoTime()
    val tf = graft.operators.TextAnalysis.termFrequencies(c, "doc_id", "text")
    assert(tf.count() > 0)
    val tfidf = graft.operators.TextAnalysis.tfidfTopTerms(c, "doc_id", "text", 3)
    assert(tfidf.count() > 0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120, s"20x corpus text ops took ${secs}s")
  }
}
