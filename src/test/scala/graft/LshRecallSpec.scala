package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Quality bound for the MinHash-LSH near-dup operator: with 6 bands × 2
  * rows, candidate-recall at Jaccard ≥ 0.7 is 1-(1-0.49)^6 ≈ 0.98 in
  * expectation — this test pins it empirically at 100% on the sf0.001
  * corpus by comparing q55's output against the exact quadratic
  * all-pairs computation (the kind of check that CAN'T run at scale,
  * which is exactly why it lives in the test suite, not the engine). */
class LshRecallSpec extends AnyFunSuite with SparkTestBase {

  test("q55 finds every pair the exact all-pairs Jaccard ≥ 0.7 finds") {
    val sf = "/root/testdata/sf0.001"
    val docs = Td.load(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))

    val tk = corpus
      .where("size(split(text, ' ')) >= 3")
      .selectExpr("doc_id",
        """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
           i -> concat_ws(' ', slice(split(text, ' '), i, 3)))) AS sh""")
    val exact = tk.as("a").join(tk.as("b"), col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "CAST(size(array_intersect(a.sh, b.sh)) AS DOUBLE) / size(array_union(a.sh, b.sh)) AS j")
      .where("j >= 0.7")
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = SparkEntry.queries("q55_dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "corpus should contain high-similarity pairs")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed ${missed.size} of ${exact.size} pairs: ${missed.take(5)}")
  }

  test("simhash 4x8-bit bands find EVERY hamming<=3 pair the quadratic scan finds") {
    val sf = "/root/testdata/sf0.001"
    val docs = Td.load(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))

    // exact: all-pairs hamming over the same simhash32 signatures
    val sh = corpus.selectExpr("doc_id", "simhash32(split(text, ' ')) AS h")
    val exact = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b", "bit_count(a.h ^ b.h) AS hamming")
      .where("hamming <= 3")
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val banded = graft.operators.Dedup.simhashPairs(corpus, "doc_id", "text", 3)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "corpus should contain hamming<=3 pairs")
    // 4 bands over 32 bits: <=3 differing bits leave >=1 band identical —
    // recall is exactly 100%, not probabilistic (unlike minhash LSH).
    assert(banded === exact,
      s"banded missed ${(exact -- banded).size}, extra ${(banded -- exact).size}")
  }

  test("dropNearDuplicates keeps one representative per cluster and all unpaired docs") {
    val sf = "/root/testdata/sf0.001"
    val docs = Td.load(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))
    val kept = graft.operators.Dedup.dropNearDuplicates(corpus, "doc_id", "text", 0.6)
    val pairs = graft.operators.Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.6)
    val clusters = graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
    val nClusters = clusters.select("cluster_id").distinct().count()
    val nPaired = clusters.count()
    // kept = all docs minus non-representative cluster members
    assert(kept.count() === corpus.count() - (nPaired - nClusters))
    // no two kept docs are still a near-dup pair at the threshold
    assert(graft.operators.Dedup.minhashLshPairs(kept, "doc_id", "text", 0.6).count() === 0)
    // the star-clustering route must keep the exact same set
    val keptStars = graft.operators.Dedup
      .dropNearDuplicates(corpus, "doc_id", "text", 0.6, useStars = true)
    assert(kept.select("doc_id").exceptAll(keptStars.select("doc_id")).count() === 0)
    assert(keptStars.count() === kept.count())
  }

  test("keepBestPerCluster keeps the highest-quality member, not the min id") {
    val sf = "/root/testdata/sf0.001"
    val docs = Td.load(spark, sf, "documents").select("doc_id", "text")
    // perturbed copies carry a 4-token suffix -> they are strictly LONGER,
    // so under token-count quality every {i, i+10000} cluster keeps the
    // COPY — the exact opposite of dropNearDuplicates' min-id keeper
    val corpus = docs.unionAll(docs.filter(col("doc_id") < 100)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" near duplicate suffix marker")).as("text")))
    val q = "CAST(size(split(text, ' ')) AS BIGINT)"
    val kept = graft.operators.Dedup
      .keepBestPerCluster(corpus, "doc_id", "text", q, 0.6)
    val minId = graft.operators.Dedup
      .dropNearDuplicates(corpus, "doc_id", "text", 0.6)
    // same cardinality (one keeper per cluster + all unpaired docs)...
    assert(kept.count() === minId.count())
    // ...but the keeper SET differs: in every cluster that is EXACTLY
    // the {original, copy} pair (larger clusters exist — the corpus has
    // natural near-dups too, and their keeper is whichever member is
    // longest), the survivor is the longer copy
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = graft.operators.Dedup
      .minhashLshPairs(corpus, "doc_id", "text", 0.6)
    val members = graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).values.map(_.map(_._2).sorted.toList)
    val pureCopyPairs = members.filter(m =>
      m.size == 2 && m(1) == m(0) + 10000)
    assert(pureCopyPairs.nonEmpty, "no pure {orig, copy} clusters found")
    pureCopyPairs.foreach { case List(orig, copy) =>
      assert(keptIds.contains(copy) && !keptIds.contains(orig),
        s"cluster ($orig, $copy): expected the longer copy to survive")
    }
    // quality ties fall back to lowest id: constant quality ≡ min-id keeper
    val keptTie = graft.operators.Dedup
      .keepBestPerCluster(corpus, "doc_id", "text", "CAST(1 AS BIGINT)", 0.6)
    assert(keptTie.select("doc_id").exceptAll(minId.select("doc_id")).count() === 0)
    assert(keptTie.count() === minId.count())
  }

  test("paragraph dedup: shared leading windows dropped, divergent tails kept, keeper = min (doc, idx)") {
    import spark.implicits._
    // 40-word docs = two 20-word windows. Doc 2 repeats doc 1's first
    // window (boilerplate) with its own tail; doc 3 is fully distinct.
    val w = (1 to 20).map(i => s"tok$i").mkString(" ")
    val tail1 = (1 to 20).map(i => s"aa$i").mkString(" ")
    val tail2 = (1 to 20).map(i => s"bb$i").mkString(" ")
    val tail3 = (1 to 20).map(i => s"cc$i").mkString(" ")
    val docs = Seq((1L, s"$w $tail1"), (2L, s"$w $tail2"),
      (3L, s"${tail3.toUpperCase} $tail3")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup
      .dropDuplicateParagraphs(docs, "doc_id", "text", paraWords = 20,
        jaccardThreshold = 0.6)
      .select("doc_id", "para_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // doc 2's window 0 is the exact duplicate — dropped; the keeper is
    // doc 1's (min composite key); all tails survive
    assert(kept === Set((1L, 0), (1L, 1), (2L, 1), (3L, 0), (3L, 1)))
  }

  test("paragraphs: window construction, short tail, sub-shingle paragraphs survive") {
    import spark.implicits._
    // 7 words at paraWords=3 → windows of 3/3/1; the 1-word tail is
    // below the shingle minimum, so it can never pair — but it must
    // still SURVIVE the dedup (dropped-from-LSH ≠ dropped-from-corpus)
    val docs = Seq((5L, "a b c d e f g")).toDF("doc_id", "text")
    val paras = graft.operators.Dedup.paragraphs(docs, "doc_id", "text", 3)
      .orderBy("para_idx").collect()
      .map(r => (r.getInt(1), r.getString(2)))
    assert(paras.toSeq === Seq((0, "a b c"), (1, "d e f"), (2, "g")))
    val kept = graft.operators.Dedup
      .dropDuplicateParagraphs(docs, "doc_id", "text", 3, 0.6)
    assert(kept.count() === 3)
  }

  test("clusters: chains, cliques, and disjoint components all get min-id labels") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3, exercises multi-round propagation),
    // clique 10-11-12, isolated pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (11L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val out = graft.operators.Dedup.clusters(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("hot-bucket cap keeps candidate generation linear on a boilerplate-heavy corpus") {
    import spark.implicits._
    // 1000 near-identical docs (shared boilerplate, tiny unique tail):
    // every doc lands in the same LSH band buckets, so uncapped candidate
    // generation is ~1000^2/2 pairs. With the cap, those buckets drop and
    // the candidate join stays ~linear.
    val boiler = (0 until 1000)
      .map(i => (i.toLong, s"shared header boilerplate text repeated across the corpus body marker tail token$i"))
      .toDF("doc_id", "text")
    val bands = graft.operators.Dedup.minhashBands(boiler, "doc_id", "text")

    // The observability companion reports the oversized buckets...
    val hot = graft.operators.Dedup.hotBuckets(bands, 100)
    assert(hot.count() > 0, "expected oversized band buckets on the skewed corpus")

    // ...and the capped operator generates no quadratic candidate set:
    // every bucket holds all 1000 docs, so a cap of 100 drops them all.
    val capped = graft.operators.Dedup.minhashLshPairs(
      boiler, "doc_id", "text", 0.8, maxBucketSize = 100)
    assert(capped.count() === 0)

    // Sanity: uncapped (default cap is far above 1000) the same corpus
    // produces a quadratic-scale pair count — the thing the cap prevents.
    val uncapped = graft.operators.Dedup.minhashLshPairs(boiler, "doc_id", "text", 0.8)
    assert(uncapped.count() > 100000L)
  }
}
