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
}
