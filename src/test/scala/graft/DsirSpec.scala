package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

/** DSIR importance weighting: target-like documents must outrank
  * target-unlike ones, weights are partition-invariant (the fixed-order
  * fold), and selection is a total order. */
class DsirSpec extends AnyFunSuite with SparkTestBase {

  private def corpus(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // raw = 4 "alpha beta" docs + 4 "gamma delta" docs + 2 mixed;
  // target speaks only alpha-beta.
  private val raw = Seq[(Long, String)](
    (1L, "alpha beta alpha"), (2L, "beta alpha beta"), (3L, "alpha beta"),
    (4L, "beta beta alpha"), (5L, "gamma delta gamma"), (6L, "delta gamma"),
    (7L, "gamma gamma delta"), (8L, "delta delta"), (9L, "alpha delta"),
    (10L, "beta gamma"))
  private val target = Seq[(Long, String)](
    (100L, "alpha beta alpha beta"), (101L, "beta alpha"))

  test("target-vocabulary docs outweigh off-target docs; mixed in between") {
    val w = Dsir.importanceWeights(corpus(raw), corpus(target), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val alphaBeta = Seq(1L, 2L, 3L, 4L).map(w)
    val gammaDelta = Seq(5L, 6L, 7L, 8L).map(w)
    val mixed = Seq(9L, 10L).map(w)
    assert(alphaBeta.min > mixed.max,
      s"pure target-vocab must beat mixed: $alphaBeta vs $mixed")
    assert(mixed.min > gammaDelta.max,
      s"mixed must beat pure off-target: $mixed vs $gammaDelta")
  }

  test("weights are partition-invariant and deterministic across runs") {
    val a = Dsir.importanceWeights(corpus(raw).repartition(7), corpus(target), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val b = Dsir.importanceWeights(corpus(raw).repartition(1), corpus(target), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("selectTopK keeps exactly k docs in (weight desc, id) order") {
    val top = Dsir.selectTopK(corpus(raw), corpus(target), "doc_id", "text", k = 4)
      .select("doc_id", "weight").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.length === 4)
    assert(top.map(_._1).toSet === Set(1L, 2L, 3L, 4L),
      s"top-4 must be the pure target-vocab docs, got ${top.toSeq}")
    assert(top.sortBy(t => (-t._2, t._1)).toSeq === top.toSeq, "output order must be total")
  }

  test("NULL text scores exactly like empty text — no doc disappears") {
    val withNull = corpus(raw) // then append a NULL-text and an empty-text doc
      .unionByName(corpus(Seq((90L, ""))).selectExpr("doc_id", "text"))
      .unionByName(corpus(Seq((91L, ""))).selectExpr("doc_id", "CAST(NULL AS STRING) AS text"))
    val w = Dsir.importanceWeights(withNull, corpus(target), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(w.size === raw.size + 2, "every input doc must appear in the weight table")
    assert(w(91L) === w(90L), s"NULL must score as empty: ${w.get(90L)} vs ${w.get(91L)}")
  }

  test("n_toks counts whitespace tokens; rejects bad arguments") {
    val w = Dsir.importanceWeights(corpus(raw), corpus(target), "doc_id", "text")
      .where("doc_id = 1").head()
    assert(w.getLong(2) === 3L)
    assertThrows[IllegalArgumentException](
      Dsir.importanceWeights(corpus(raw), corpus(target), "doc_id", "text", buckets = 0))
    assertThrows[IllegalArgumentException](
      Dsir.selectTopK(corpus(raw), corpus(target), "doc_id", "text", k = 0))
  }
}
