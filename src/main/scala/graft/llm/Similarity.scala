package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity.cosineSim

/** Approximate-nearest-neighbor search over an embedding column
  * (extension phase, SURVEY.md §7.9 / BASELINE.json north_star).
  *
  * Baseline: brute-force cosine top-k (query set × corpus, ranked by a
  * keyed window). Scale path: sign-bucket LSH (random-hyperplane on fixed
  * axes) or IVF with deterministic centroids — both shrink the join from
  * |Q|×|N| to |Q|×|N|/buckets at the cost of recall near cell boundaries.
  *
  * Ranking is deterministic: (round(cosine,6) DESC, vec_id ASC) — the
  * rounding makes cross-engine rank stable under last-ulp differences.
  */
object Similarity {

  /** 3-bit sign bucket on fixed axes (dims 0/16/32): a degenerate but
    * deterministic random-hyperplane LSH. */
  def signBucket(emb: Column): Column =
    (when(element_at(emb, 1) > 0f, 4).otherwise(0) +
      when(element_at(emb, 17) > 0f, 2).otherwise(0) +
      when(element_at(emb, 33) > 0f, 1).otherwise(0))

  /** Brute-force cosine top-k neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineSim(col("qe"), col("ce")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH-bucketed top-k: only candidates in the query's sign bucket are
    * scored. Same output shape as bruteForceTopK; recall < 1 by design. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      signBucket(col("embedding")).as("bucket"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      signBucket(col("embedding")).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineSim(col("qe"), col("ce")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF top-k: corpus is partitioned into cells by nearest centroid
    * (centroids = the first `nCells` corpus vectors — deterministic);
    * queries probe their own nearest cell only. Broadcast centroids keep
    * assignment a map-side pass. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nCells: Int = 8): DataFrame = {
    val centroids = broadcast(
      corpus.orderBy("vec_id").limit(nCells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid")))
    def assign(df: DataFrame, idc: String, ec: String): DataFrame = {
      val w = Window.partitionBy(col(idc))
        .orderBy(round(cosineSim(col(ec), col("centroid")), 6).desc, col("cell_id").asc)
      df.join(centroids, lit(true))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") === 1)
        .drop("centroid", "crank")
    }
    val q = assign(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id", "qe")
    val c = assign(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce")), "neighbor_id", "ce")
    val scored = q.join(c, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineSim(col("qe"), col("ce")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }
}
