package graft

import org.apache.spark.sql.graft.GraftFunctions

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim is callable from SQL text after registration") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT cosine_sim(a, b) AS c FROM vecs ORDER BY c")
      .as[Double].collect()
    assert(math.abs(out(0)) < 1e-12 && math.abs(out(1) - 1.0) < 1e-12)
  }
}
