package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LinearClassifier

/** Batch perceptron (q113's operator): hand-computed epoch arithmetic,
  * the convergence guarantee on separable data (updates become zero and
  * weights reach a fixpoint), bit-identical weights under any
  * partitioning, and scoring semantics. */
class LinearClassifierSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("hand-computed: epoch 1 sums y*x over everything (zero weights misclassify all)") {
    // rows: (x=(1, 2), y=+1), (x=(1, 5), y=-1)
    // epoch 1: w = (1*1 - 1*1, 1*2 - 1*5) = (0, -3)
    val docs = Seq((1L, 2L, 1L), (2L, 5L, -1L)).toDF("id", "f", "y")
    val w = LinearClassifier.fitBatchPerceptron(docs,
      Seq("CAST(1 AS BIGINT)", "f"), "y", epochs = 1)
    assert(w === Seq(0L, -3L))
  }

  test("dominant-indicator geometry (the q113 shape): separates, then reaches a fixpoint") {
    // x = (bias, 1000·indicator, noise bp): the rescaled indicator lets
    // the batch updates drive the noise weight to irrelevance — verified
    // dynamics: perfect separation by epoch 9, zero updates at epoch 10.
    // (Batch perceptron is NOT the online variant: without the dominant
    // feature, lr=1 batch updates can oscillate forever on separable
    // data — which stays deterministic, but never converges.)
    val docs = (0 until 450)
      .map(i => (i.toLong,
        if (i % 9 == 0) 1000L else 0L,
        ((i * 131) % 7001).toLong,
        if (i % 9 == 0) 1L else -1L))
      .toDF("id", "ind", "noise", "y")
    val feats = Seq("CAST(1 AS BIGINT)", "ind", "noise")
    val w10 = LinearClassifier.fitBatchPerceptron(docs, feats, "y", epochs = 10)
    val wrong = LinearClassifier.scoreLinear(docs, feats, w10)
      .where("pred != y").count()
    assert(wrong === 0, s"still $wrong misclassified, w=$w10")
    // the misclassified set is empty -> every later epoch is a no-op
    val w11 = LinearClassifier.fitBatchPerceptron(docs, feats, "y", epochs = 11)
    assert(w11 === w10)
  }

  test("fitted weights are bit-identical under any partitioning") {
    val docs = (0 until 300)
      .map(i => (i.toLong, (i * 7 % 23).toLong, (i * 3 % 17).toLong,
        if ((i * 7 % 23) + (i * 3 % 17) > 20) 1L else -1L))
      .toDF("id", "f1", "f2", "y")
    val feats = Seq("CAST(1 AS BIGINT)", "f1", "f2")
    val ws = Seq(1, 4, 13).map { p =>
      LinearClassifier.fitBatchPerceptron(docs.repartition(p), feats, "y", epochs = 4)
    }
    assert(ws.distinct.size === 1, s"partitioning changed the weights: $ws")
  }

  test("scoreLinear: margin arithmetic and the margin<=0 -> pred=-1 convention") {
    val docs = Seq((1L, 3L), (2L, 0L)).toDF("id", "f")
    val got = LinearClassifier
      .scoreLinear(docs, Seq("CAST(1 AS BIGINT)", "f"), Seq(-6L, 2L))
      .orderBy("id").collect()
      .map(r => (r.getLong(2), r.getInt(3)))
    assert(got === Array((0L, -1), (-6L, -1))) // margin 0 is NOT positive
  }

  test("empty input: fit returns the zero vector instead of crashing") {
    val docs = Seq.empty[(Long, Long)].toDF("id", "f")
    val w = LinearClassifier.fitBatchPerceptron(docs,
      Seq("CAST(1 AS BIGINT)", "f"), "CAST(1 AS BIGINT)", epochs = 3)
    assert(w === Seq(0L, 0L))
  }
}
