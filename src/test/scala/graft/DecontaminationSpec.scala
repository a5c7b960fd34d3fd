package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Decontamination

/** Semantics and plan shape of benchmark decontamination: exactly the
  * documents sharing a word n-gram with the eval set are flagged (with
  * the distinct-gram hit count), case-insensitively; docs shorter than n
  * words and NULL texts can never be flagged; and the eval side reaches
  * the corpus through a BROADCAST join — the property that keeps the
  * corpus's exploded n-grams unshuffled at 100 TB. */
class DecontaminationSpec extends AnyFunSuite with SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f"),  // shares "a b c d" and "b c d e" with eval
      (2L, "a b c x e f"),  // no 4-gram in common
      (3L, "q r s"),        // shorter than n
      (4L, null.asInstanceOf[String]),
      (5L, "A B C D zz"))   // case-insensitive hit on "a b c d"
      .toDF("doc_id", "text")
  }

  private def eval = {
    import spark.implicits._
    Seq((100L, "z z a b c d e z")).toDF("eid", "etext")
  }

  test("flags exactly the overlapping docs with distinct-gram hit counts") {
    val hits = Decontamination
      .contaminationHits(corpus, "doc_id", "text", eval, "etext", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits === Map(1L -> 2L, 5L -> 1L))
  }

  test("decontaminate keeps the complement, including short and NULL docs") {
    val kept = Decontamination
      .decontaminate(corpus, "doc_id", "text", eval, "etext", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L, 4L))
  }

  test("repeated n-grams within one doc count once (distinct per doc)") {
    import spark.implicits._
    val rep = Seq((1L, "a b c d a b c d a b c d")).toDF("doc_id", "text")
    val hits = Decontamination
      .contaminationHits(rep, "doc_id", "text", eval, "etext", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // grams of the repeated text include "a b c d" (once, distinct) and
    // wrap-around grams like "c d a b" — only "a b c d" is in eval
    assert(hits === Map(1L -> 1L))
  }

  test("the eval gram set reaches the corpus via a broadcast join") {
    val plan = Decontamination
      .contaminationHits(corpus, "doc_id", "text", eval, "etext", 4)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join for the eval grams, got:\n$plan")
  }

  test("an eval set with no usable grams flags nothing") {
    import spark.implicits._
    val tiny = Seq((1L, "a b")).toDF("eid", "etext") // shorter than n
    assert(Decontamination
      .contaminationHits(corpus, "doc_id", "text", tiny, "etext", 4).count() === 0L)
  }

  test("fuzzy: a perturbed leak invisible to exact 13-grams is caught by near-dup hits") {
    import spark.implicits._
    val evalDoc = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    // perturbation: drop the first word, change one mid word — every
    // 13-gram differs from eval, shingle Jaccard stays high
    val leaked = "w2 w3 w4 w5 w6 w7 zz w9 w10 w11 w12 w13 w14 w15 w16"
    val clean = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15 c16"
    val corpusF = Seq((1L, leaked), (2L, clean)).toDF("doc_id", "text")
    val evalF = Seq((100L, evalDoc)).toDF("eval_id", "text")
    // exact 13-gram scrub misses it...
    assert(Decontamination
      .contaminationHits(corpusF, "doc_id", "text", evalF, "text", 13).count() === 0L)
    // ...fuzzy flags exactly the leak
    val fuzzy = Decontamination.nearDupHits(corpusF, "doc_id", "text",
      evalF, "eval_id", "text", jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fuzzy.keySet === Set(1L))
    assert(fuzzy(1L) === 1L)
  }

  test("fuzzy: result is partition-invariant and self-matches score 1.0") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"d$i a$i b$i c$i e$i f$i g$i h$i")).toDF("doc_id", "text")
    val evalF = docs.where("doc_id % 10 = 0").selectExpr("doc_id AS eval_id", "text")
    val results = Seq(1, 3, 8).map { p =>
      Decontamination.nearDupHits(docs.repartition(p), "doc_id", "text",
        evalF, "eval_id", "text", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(results.distinct.size === 1)
    assert(results.head === Set((0L, 1L, 1.0), (10L, 1L, 1.0), (20L, 1L, 1.0), (30L, 1L, 1.0)))
  }
}
