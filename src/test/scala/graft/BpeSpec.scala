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
