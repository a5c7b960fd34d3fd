package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE merge training (q117's operator): the Sennrich et al. worked
  * corpus with hand-computed merges, reference left-to-right application
  * semantics (the 'a a a' single-merge case), tie-breaking, degenerate
  * exhaustion, and partition invariance. */
class BpeSpec extends AnyFunSuite with SparkTestBase {

  // low x3, lower x2, newest x5, widest x3 — the classic worked example
  private def corpus = {
    import spark.implicits._
    Seq("low low low lower lower",
      "newest newest newest newest newest",
      "widest widest widest").toDF("text")
  }

  test("hand-computed merges on the Sennrich worked corpus, ties lexicographic") {
    // r1: (e,s)=8 ties (s,t)=8 -> 'e s' wins lexicographically
    // r2: (es,t)=8; r3: five pairs tie at 5 -> 'e w'; r4: 'ew est'
    val got = Bpe.fitMerges(corpus, "text", rounds = 4)
      .map(m => (m.round, m.pair, m.count))
    assert(got === Seq((1, "e s", 8L), (2, "es t", 8L),
      (3, "e w", 5L), (4, "ew est", 5L)))
  }

  test("merge application is left-to-right non-overlapping: 'a a a' merges ONCE") {
    import spark.implicits._
    val df = Seq(("x", "a a a"), ("y", "a a a a")).toDF("w", "syms")
    val applied = df.selectExpr("w",
        s"${Bpe.applyMergeExpr(graft.queries.SparkSql, "syms", "'a'", "'a'")} AS syms")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(applied("x") === "aa a") // NOT 'a aa' and NOT 'aa aa'-style rescan
    assert(applied("y") === "aa aa")
  }

  test("merged symbols never match inside longer symbols (boundary guard)") {
    import spark.implicits._
    // symbol 'xa' ends with 'a' but must not merge with a following 'b'
    val df = Seq(("w1", "xa b a b")).toDF("w", "syms")
    val applied = df.selectExpr(
        s"${Bpe.applyMergeExpr(graft.queries.SparkSql, "syms", "'a'", "'b'")} AS syms")
      .head().getString(0)
    assert(applied === "xa b ab")
  }

  test("training exhausts gracefully when every word is fully merged") {
    import spark.implicits._
    val tiny = Seq("ab ab ab").toDF("text") // one word, one pair
    val got = Bpe.fitMerges(tiny, "text", rounds = 5)
    // r1 merges (a,b); after that no adjacent pairs remain anywhere
    assert(got.map(m => (m.round, m.pair, m.count)) === Seq((1, "a b", 3L)))
  }

  test("merges are partition-invariant") {
    val runs = Seq(1, 3, 8).map { p =>
      Bpe.fitMerges(corpus.repartition(p), "text", rounds = 3).map(_.pair)
    }
    assert(runs.distinct.size === 1)
  }

  test("encode with the learned merges: hand-computed per-doc subword counts") {
    import spark.implicits._
    val docs = Seq((1L, "low low low lower lower"),
      (2L, "newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("doc_id", "text")
    val merges = Bpe.fitMerges(docs, "text", rounds = 4)
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // after (e s)(es t)(e w)(ew est): low=l o w(3), lower=l o w e r(5),
    // newest=n ewest(2 — merge 4 fires), widest=w i d est(4 — no 'ew')
    assert(got(1L) === ((5L, 19L, 38000L)))
    assert(got(2L) === ((5L, 10L, 20000L)))
    assert(got(3L) === ((3L, 12L, 40000L)))
  }

  test("encode with ZERO merges is plain character tokenization") {
    import spark.implicits._
    val docs = Seq((1L, "ab cde")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", Seq.empty)
      .head()
    assert((got.getLong(1), got.getLong(2)) === ((2L, 5L)))
  }

  test("real text survives training: apostrophes, digit-adjacent punctuation, non-ASCII") {
    import spark.implicits._
    // every winning pair contains a character outside [a-z0-9]: the
    // apostrophe corpus forces ('), the price corpus forces ($ .), the
    // accented corpus forces a non-ASCII letter. Symbols travel as
    // data, so none of this can touch SQL syntax.
    val docs = Seq(
      "don't don't don't don't",
      "$1.99 $1.99 $1.99",
      "café café café café café").toDF("text")
    val merges = Bpe.fitMerges(docs, "text", rounds = 6)
    assert(merges.size === 6)
    // café x5 dominates round 1: (c,a)=5 ties (a,f)(f,é) -> 'a f' loses
    // to 'c a' lexicographically? '$' < 'a f'... verify by property
    // instead of hand-trace: every merged pair's count is positive and
    // encode round-trips with no crash and full doc coverage.
    assert(merges.forall(_.count > 0))
    val enc = Bpe.encode(docs.withColumn("doc_id", monotonically_increasing_id()),
      "doc_id", "text", merges)
    assert(enc.count() === 3)
    assert(enc.where("n_words = 0").count() === 0)
    // a quote character in a symbol must not break the fold expression
    assert(merges.exists(m => m.pair.contains("'") || m.pair.contains("é")
      || m.pair.contains("$") || m.pair.contains(".")))
  }

  test("encode preserves NULL/empty/whitespace docs as zero-count rows, cr_bp NULL") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab"), (2L, null), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", Seq.empty).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(1L) === ((2L, 4L, 20000L)))
    assert(got(2L) === ((0L, 0L, -1L)))
    assert(got(3L) === ((0L, 0L, -1L)))
    assert(got(4L) === ((0L, 0L, -1L)))
  }

  test("fitMergesSql replays the identical loop (DuckDB dialect is exercised by q117)") {
    // Spark can execute the SparkSql-dialect rendering of the SAME
    // template the oracle uses — loop parity proven inside one engine,
    // cross-engine parity by q117's hash gate.
    corpus.createOrReplaceTempView("bpe_corpus")
    val sql = Bpe.fitMergesSql(graft.queries.SparkSql, "bpe_corpus", "text", 4)
      .replace("unnest(", "explode(")
    val got = spark.sql(sql).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1, "e s", 8L), (2, "es t", 8L),
      (3, "e w", 5L), (4, "ew est", 5L)))
  }
}
