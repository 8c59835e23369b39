package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity.cosineSim
import graft.llm.Similarity

class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, "/root/testdata/sf0.01")

  /** mean best-centroid cosine over the corpus — the spherical k-means
    * objective the assignment maximizes */
  private def objective(cents: DataFrame): Double = {
    val assigned = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents.agg(
        collect_list(struct(col("cell_id"), col("centroid"))).as("cents"))))
      .select(aggregate(col("cents"), lit(-2.0),
        (acc, x) => greatest(acc, cosineSim(col("embedding"), x.getField("centroid"))))
        .as("best"))
    assigned.agg(avg(col("best"))).as[Double].head()
  }

  test("training is deterministic across partition layouts (decimal-exact means)") {
    val a = Similarity.kmeansCentroids(corpus.repartition(1), k = 8, iters = 3)
      .select(col("cell_id"), col("centroid")).as[(Long, Seq[Float])].collect().toMap
    val b = Similarity.kmeansCentroids(corpus.repartition(13), k = 8, iters = 3)
      .select(col("cell_id"), col("centroid")).as[(Long, Seq[Float])].collect().toMap
    assert(a == b)
  }

  test("trained centroids beat the first-k init on the clustering objective") {
    val init = corpus.orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
    val trained = Similarity.kmeansCentroids(corpus, k = 16, iters = 4)
    val (o0, o1) = (objective(init), objective(trained))
    assert(o1 > o0, s"training did not improve objective: init=$o0 trained=$o1")
  }

  test("trained centroids cut candidate cost while keeping recall; cells are balanced") {
    val queries = corpus.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(queries, corpus, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (got & truth).size.toDouble / truth.size
    }
    // candidate cost = the biggest cell's population: with first-k-vector
    // init most of the corpus piles into a few cells (probing them IS a
    // near-brute-force scan — recall looks great, cost is the pathology);
    // training spreads the corpus so a probe touches a real fraction
    def maxCell(cents: DataFrame): Long = {
      val one = broadcast(cents.agg(
        collect_list(struct(col("cell_id"), col("centroid"))).as("cents")))
      corpus.select(col("vec_id"), col("embedding")).crossJoin(one)
        .select(aggregate(col("cents"),
          struct(lit(-2.0).as("cos"), lit(Long.MaxValue).as("cell")),
          (acc, x) => {
            val cos = cosineSim(col("embedding"), x.getField("centroid"))
            when(cos > acc.getField("cos"),
              struct(cos.as("cos"), x.getField("cell_id").as("cell"))).otherwise(acc)
          }, acc => acc.getField("cell")).as("cell_id"))
        .groupBy("cell_id").count().agg(max("count")).as[Long].head()
    }
    val naiveInit = corpus.orderBy("vec_id").limit(16)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))
    val trained = Similarity.kmeansCentroids(corpus, k = 16, iters = 4)
    val (mcNaive, mcTrained) = (maxCell(naiveInit), maxCell(trained))
    assert(mcTrained < mcNaive,
      s"training did not balance cells: naive max=$mcNaive trained max=$mcTrained")
    val rTrained = recall(Similarity.ivfTopK(queries, corpus, 5, nProbe = 2,
      centroids = Some(trained)))
    assert(rTrained > 0.5, s"trained recall unexpectedly low: $rTrained")
  }
}
