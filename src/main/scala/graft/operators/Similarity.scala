package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's similarity-search library — the reusable API behind
  * parity queries q59/q60/q71. Inputs: a vector table and a query-vector
  * table, both (id, ARRAY<FLOAT>). Outputs: (q_id, vec_id, cosine, rank).
  * Cosine runs through the native codegen'd `cosine_sim`
  * (GraftExtensions). Scale rationale per variant in the query Scaladocs:
  * brute force = exactness baseline, hyperplane-LSH and IVF = the
  * bucket-restricted candidate paths. */
object Similarity {

  private def rank(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))))
      .where(col("rank") <= k)
      .selectExpr("q_id", "vec_id", "round(cosine, 6) AS cosine", "rank")

  /** Exact top-k: broadcast the query set over a full scan. */
  def topK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    rank(vectors.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", "cosine_sim(q_emb, embedding) AS cosine"), k)
  }

  /** ANN via a precomputed bucket column present on BOTH inputs (e.g.
    * q60's hyperplane buckets): candidates = same-bucket vectors only. */
  def bucketedTopK(vectors: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      col("bucket").as("q_bucket"))
    rank(vectors.join(broadcast(q),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", "cosine_sim(q_emb, embedding) AS cosine"), k)
  }

  /** IVF ANN: assign every vector to its max-cosine centroid; queries
    * probe their `nprobe` closest centroids' posting lists. */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queryFilter: String,
      k: Int, nprobe: Int): DataFrame = {
    val cents = centroids.select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
    val ranked = vectors.crossJoin(broadcast(cents))
      .selectExpr("vec_id", "embedding", "cent_id",
        "cosine_sim(embedding, cent_emb) AS c_cos")
      .withColumn("c_rank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cent_id"))))
    val assigned = ranked.where(col("c_rank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
    val probes = ranked.where(col("c_rank") <= nprobe).where(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("cent_id"))
    rank(assigned.join(broadcast(probes), Seq("cent_id"))
      .where(col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id", "cosine_sim(q_emb, embedding) AS cosine"), k)
  }
}
