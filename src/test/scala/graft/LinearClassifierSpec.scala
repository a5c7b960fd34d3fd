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

  // ---- multi-class (q135's operator) ----------------------------------

  test("argmaxExpr: ties go to the LOWEST class index") {
    val docs = Seq((1L, 5L)).toDF("id", "f")
    // margins (5, 5, 0) -> 0;  (0, 5, 5) -> 1;  (0, 0, 5) -> 2
    def predFor(ws: Seq[Seq[Long]]): Int =
      LinearClassifier.scoreMulticlass(docs, Seq("f"), ws)
        .head().getAs[Int]("pred")
    assert(predFor(Seq(Seq(1L), Seq(1L), Seq(0L))) === 0)
    assert(predFor(Seq(Seq(0L), Seq(1L), Seq(1L))) === 1)
    assert(predFor(Seq(Seq(0L), Seq(0L), Seq(1L))) === 2)
  }

  test("hand-computed multiclass epoch 1: zero weights tie everywhere -> all pred 0") {
    // Collins update under all-pred-0: w0 -= sum of x over y!=0 rows,
    // w_c += sum of x over y=c rows (c>0); y=0 rows touch nothing.
    // rows: (x=(1,2), y=0), (x=(1,3), y=1), (x=(1,7), y=2)
    // w0 = -(1+1, 3+7) = (-2,-10); w1 = (1,3); w2 = (1,7)
    val docs = Seq((1L, 2L, 0), (2L, 3L, 1), (3L, 7L, 2)).toDF("id", "f", "y")
    val w = LinearClassifier.fitMulticlassPerceptron(docs,
      Seq("CAST(1 AS BIGINT)", "f"), "y", numClasses = 3, epochs = 1)
    assert(w === Seq(Seq(-2L, -10L), Seq(1L, 3L), Seq(1L, 7L)))
  }

  test("separable 3-class indicators: perfect held-in accuracy and a fixpoint") {
    // One dominant indicator per class (the q113 geometry, one tier up).
    val docs = (0 until 300).map { i =>
      val y = i % 3
      (i.toLong, if (y == 0) 1000L else 0L, if (y == 1) 1000L else 0L,
        if (y == 2) 1000L else 0L, ((i * 131) % 701).toLong, y)
    }.toDF("id", "i0", "i1", "i2", "noise", "y")
    val feats = Seq("CAST(1 AS BIGINT)", "i0", "i1", "i2", "noise")
    val w = LinearClassifier.fitMulticlassPerceptron(docs, feats, "y", 3, epochs = 8)
    val wrong = LinearClassifier.scoreMulticlass(docs, feats, w)
      .where("pred != y").count()
    assert(wrong === 0, s"still $wrong misclassified, w=$w")
    val w2 = LinearClassifier.fitMulticlassPerceptron(docs, feats, "y", 3, epochs = 9)
    assert(w2 === w, "zero-update fixpoint not reached")
  }

  test("multiclass fitted weights are bit-identical under any partitioning") {
    val docs = (0 until 300)
      .map(i => (i.toLong, (i * 7 % 23).toLong, (i * 3 % 17).toLong, i % 3))
      .toDF("id", "f1", "f2", "y")
    val feats = Seq("CAST(1 AS BIGINT)", "f1", "f2")
    val ws = Seq(1, 4, 13).map { p =>
      LinearClassifier.fitMulticlassPerceptron(docs.repartition(p), feats, "y", 3, epochs = 4)
    }
    assert(ws.distinct.size === 1, s"partitioning changed the weights: $ws")
  }

  test("scoreMulticlass margin = the WINNING class's w·x") {
    val docs = Seq((1L, 4L)).toDF("id", "f")
    val got = LinearClassifier
      .scoreMulticlass(docs, Seq("CAST(1 AS BIGINT)", "f"),
        Seq(Seq(0L, 1L), Seq(10L, -2L), Seq(0L, 0L)))
      .head()
    assert(got.getAs[Int]("pred") === 0)    // margins (4, 2, 0)
    assert(got.getAs[Long]("margin") === 4L)
  }

  test("empty multiclass input: zero weight matrix") {
    val docs = Seq.empty[(Long, Int)].toDF("f", "y")
    val w = LinearClassifier.fitMulticlassPerceptron(docs,
      Seq("CAST(1 AS BIGINT)", "f"), "y", 3, epochs = 2)
    assert(w === Seq(Seq(0L, 0L), Seq(0L, 0L), Seq(0L, 0L)))
  }

  test("trained hashed-trigram model beats the q52 marker heuristic when markers are absent") {
    // Languages distinguished by function words OUTSIDE every q52 marker
    // list: the heuristic scores 0-0-0-0 on every doc (tie -> always
    // 'en' ~ class 0), while the trained model must LEARN the hash
    // buckets that separate them. 240 train / 60 held-out docs.
    val deco = Seq(" zum ohne mir doch zum ohne", " avec chez tout rien avec chez",
      " pero sino cada vez pero sino")
    val docs = (0 until 300).map { i =>
      val y = i % 3
      (i.toLong, s"common words shared by all docs row $i" + deco(y), y)
    }.toDF("id", "text", "y")
    val nb = 12
    val bArr = s"transform(sequence(1, length(text) - 2), i -> md5_u32(substring(text, i, 3)) % $nb)"
    val withB = docs.selectExpr("id", "y", s"$bArr AS bs")
    val feats = "CAST(1 AS BIGINT)" +: (0 until nb).map(j =>
      s"CAST(size(filter(bs, b -> b = $j)) AS BIGINT)")
    // 15 epochs: this corpus IS separable (decorations are ~40% of the
    // text), and the batch loop reaches its zero-update fixpoint at 14
    val w = LinearClassifier.fitMulticlassPerceptron(
      withB.where("id % 5 <> 0"), feats, "y", 3, epochs = 15)
    val hold = withB.where("id % 5 = 0")
    val trainedAcc = LinearClassifier.scoreMulticlass(hold, feats, w)
      .where("pred = y").count().toDouble / hold.count()
    // the q52 heuristic on the same held-out docs: every marker count is
    // 0, every tie resolves to 'en', so accuracy is exactly the class-0 share
    val markers = Seq("the", "a", "of", "and", "der", "die", "das", "und",
      "el", "la", "de", "y", "le", "les", "et", "une")
    val hits = docs.where("id % 5 = 0")
      .selectExpr(s"size(filter(split(text, ' '), t -> array_contains(array(${markers.map("'" + _ + "'").mkString(",")}), t))) AS m")
      .where("m > 0").count()
    assert(hits === 0, "decorations leaked into the marker lists")
    val heuristicAcc = hold.where("y = 0").count().toDouble / hold.count()
    assert(trainedAcc >= 0.9, s"trained acc $trainedAcc")
    assert(trainedAcc > heuristicAcc, s"trained $trainedAcc <= heuristic $heuristicAcc")
  }

  // ---- nearest-centroid head (q135's trainer) -------------------------

  test("fitNearestCentroid: hand-computed floor-division centroids") {
    // class 0: x = (2, 9), (3, 10) -> sums (5, 19), n=2
    //   mu0 = (floor(10000*5/2), floor(10000*19/2)) = (25000, 95000)
    // class 1: x = (7, 1) -> mu1 = (70000, 10000)
    val docs = Seq((2L, 9L, 0), (3L, 10L, 0), (7L, 1L, 1)).toDF("f1", "f2", "y")
    val mu = LinearClassifier.fitNearestCentroid(docs, Seq("f1", "f2"), "y", 2)
    assert(mu === Seq(Seq(25000L, 95000L), Seq(70000L, 10000L)))
  }

  test("fitNearestCentroid: a class absent from the data gets the zero centroid") {
    val docs = Seq((4L, 0)).toDF("f", "y")
    val mu = LinearClassifier.fitNearestCentroid(docs, Seq("f"), "y", 3)
    assert(mu === Seq(Seq(40000L), Seq(0L), Seq(0L)))
  }

  test("scoreNearestCentroid: argmin distance, ties -> lowest class, margin = -d^2") {
    // centroids 30000 and 50000; x=3 -> distances (0, 20000^2) -> pred 0
    // x=4 -> equidistant (10000^2 both) -> tie -> pred 0
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L)).toDF("id", "f")
    val got = LinearClassifier
      .scoreNearestCentroid(docs, Seq("f"), Seq(Seq(30000L), Seq(50000L)))
      .orderBy("id").collect()
      .map(r => (r.getAs[Int]("pred"), r.getAs[Long]("margin")))
    assert(got === Array((0, 0L), (0, -100000000L), (1, 0L)))
  }

  test("centroids are bit-identical under any partitioning") {
    val docs = (0 until 300)
      .map(i => (i.toLong, (i * 7 % 23).toLong, (i * 3 % 17).toLong, i % 3))
      .toDF("id", "f1", "f2", "y")
    val mus = Seq(1, 4, 13).map { p =>
      LinearClassifier.fitNearestCentroid(docs.repartition(p), Seq("f1", "f2"), "y", 3)
    }
    assert(mus.distinct.size === 1, s"partitioning changed the centroids: $mus")
  }

  test("centroid head learns the noisy non-separable corpus the batch perceptron cannot") {
    // Decorations are only ~15% of each doc and lengths vary 3x — the
    // q135 regime in miniature. The perceptron oscillates at chance
    // here; the centroid head separates well.
    val deco = Seq(" zum ohne mir doch", " avec chez tout rien", " pero sino cada vez")
    val filler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (0 until 300).map { i =>
      val y = i % 3
      val body = (0 to (i % 5)).map(_ => filler).mkString(" ")
      (i.toLong, s"$body row $i" + deco(y), y)
    }.toDF("id", "text", "y")
    val nb = 32
    val bArr = s"transform(sequence(1, length(text) - 2), i -> md5_u32(substring(text, i, 3)) % $nb)"
    val withB = docs.selectExpr("id", "y", s"$bArr AS bs")
    val feats = (0 until nb).map(j =>
      s"CAST(size(filter(bs, b -> b = $j)) * 10000 DIV size(bs) AS BIGINT)")
    val mu = LinearClassifier.fitNearestCentroid(
      withB.where("id % 5 <> 0"), feats, "y", 3)
    val hold = withB.where("id % 5 = 0")
    val acc = LinearClassifier.scoreNearestCentroid(hold, feats, mu)
      .where("pred = y").count().toDouble / hold.count()
    assert(acc >= 0.8, s"centroid holdout acc $acc")
  }
}
