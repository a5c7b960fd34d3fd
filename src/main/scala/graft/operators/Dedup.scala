package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.SparkSql

/** The engine's deduplication library — the reusable API behind parity
  * queries q54-q58/q76. Each function takes any DataFrame with an id and
  * a payload column and returns a deterministic result DataFrame; the
  * scale rationale for each shape lives in the corresponding query's
  * Scaladoc (bucket-join candidate generation, no all-pairs).
  *
  * Hashing uses the engine's native expressions (GraftExtensions must be
  * registered on the session, as every harness session does).
  */
object Dedup {

  private val d = SparkSql

  /** 3-token shingle set of a text column (lambda-bound tokenization). */
  def shingles(textCol: String): String =
    d.bind(d.splitSpace(textCol), "tk",
      d.adistinct(d.map(d.range1(s"${d.len("tk")} - 2"), "i", d.wordSlice("tk", "i", 3))))

  /** Exact content-hash dedup: one row per distinct payload with the
    * minimum id as keeper. */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-dup pairs with exact-Jaccard confirmation
    * (12 signature slots in 6 bands × 2 rows). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double): DataFrame = {
    val base = docs.where(s"${d.len(d.splitSpace(textCol))} >= 3")
    val tk = base.selectExpr(s"$idCol AS doc_id", s"${shingles(textCol)} AS shingles")
    val bands = base
      .selectExpr(s"$idCol AS doc_id", s"minhash_sigs(${shingles(textCol)}) AS sigs")
      .selectExpr("doc_id", "sigs", "explode(sequence(0, 5)) AS j")
      .selectExpr("doc_id",
        """concat(CAST(j AS STRING), ':',
                  CAST(element_at(sigs, 2*j+1) AS STRING), '|',
                  CAST(element_at(sigs, 2*j+2) AS STRING)) AS bucket""")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(tk.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(tk.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
      .selectExpr("doc_a", "doc_b",
        s"round(CAST(${d.interSize("sa", "sb")} AS DOUBLE) / CAST(${d.unionSize("sa", "sb")} AS DOUBLE), 6) AS jaccard")
      .where(s"jaccard >= $jaccardThreshold")
  }

  /** SimHash near-dup pairs: 32-bit signatures, candidates share the
    * top-16-bit prefix, hamming distance filter. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sh = docs
      .selectExpr(s"$idCol AS doc_id", s"simhash32(split($textCol, ' ')) AS simhash")
      .withColumn("bucket", expr(d.shiftr("simhash", "16")))
    sh.as("a").join(sh.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        s"bit_count(${d.bxor("a.simhash", "b.simhash")}) AS hamming")
      .where(s"hamming <= $maxHamming")
  }

  /** Embedding near-dup pairs: sign-pattern (first 16 dims) buckets,
    * native cosine confirmation. */
  def cosinePairs(vectors: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val sign = d.joinStr(d.map(d.range("1", "16"), "i",
      s"CASE WHEN ${d.elem(vecCol, "i")} >= 0 THEN '1' ELSE '0' END"), "")
    val withB = vectors.selectExpr(s"$idCol AS vec_id", s"$vecCol AS embedding",
      s"$sign AS bucket")
    withB.as("a").join(withB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b",
        "round(cosine_sim(a.embedding, b.embedding), 6) AS cosine")
      .where(s"cosine >= $minCosine")
  }

  /** Length-banded edit-distance near-dup pairs (high-precision verifier;
    * see q76 for the recall/cost trade). */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDistance: Int, bandWidth: Int = 100): DataFrame = {
    val slice = docs.selectExpr(s"$idCol AS doc_id", s"$textCol AS text",
      s"length($textCol) DIV $bandWidth AS len_band")
    slice.as("a").join(slice.as("b"),
        col("a.len_band") === col("b.len_band") && col("a.doc_id") < col("b.doc_id"))
      .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b",
        "levenshtein(a.text, b.text) AS edit_dist")
      .where(s"edit_dist <= $maxDistance")
  }
}
