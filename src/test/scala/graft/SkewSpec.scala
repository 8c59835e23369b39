package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key ('hot' = 80% of rows) + long tail
  private lazy val fact = ((1 to 800).map(i => ("hot", i.toLong, 1.0)) ++
    (1 to 200).map(i => (s"k${i % 20}", (1000 + i).toLong, 2.0)))
    .toDF("key", "row_id", "v")

  test("saltedAggregate equals the plain aggregation") {
    val salted = Skew.saltedAggregate(fact, Seq("key"), col("row_id"),
      sums = Map("total" -> "v"), countCol = Some("n"))
    val plain = fact.groupBy("key").agg(sum($"v").as("total"), count(lit(1)).as("n"))
    assert(salted.join(plain, Seq("key"))
      .filter(salted("total") =!= plain("total") || salted("n") =!= plain("n"))
      .isEmpty)
    assert(salted.count() == plain.count())
  }

  test("replicatedSaltedJoin equals the plain join and spreads the hot key") {
    val dim = Seq(("hot", "HOT"), ("k1", "K1"), ("k2", "K2")).toDF("key", "label")
    val salted = Skew.replicatedSaltedJoin(fact, dim, Seq("key"), col("row_id"))
      .orderBy("row_id").collect()
    val plain = fact.join(dim, Seq("key")).orderBy("row_id").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.getAs[String]("label")).toSeq == plain.map(_.getAs[String]("label")).toSeq)
    // salts actually spread: the hot key's rows land in >1 salt bucket
    val spread = fact.filter($"key" === "hot")
      .select(Skew.saltOf($"row_id", 16)).distinct().count()
    assert(spread > 1)
  }

  test("bucketed table join pre-shuffles (no exchange on the bucket side)") {
    import graft.sources.Sources
    Sources.writeBucketed(fact, "fact_bucketed", "key", 4, sortCol = Some("key"))
    val other = Seq(("hot", 1), ("k1", 2)).toDF("key", "x")
      .hint("shuffle_merge") // force a non-broadcast join so bucketing matters
    val joined = spark.table("fact_bucketed").join(other, Seq("key"))
    val plan = joined.queryExecution.executedPlan.toString
    // the bucketed side must not re-shuffle: exactly one hashpartitioning
    // exchange (the small unbucketed side)
    val exchanges = plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 1, plan)
    assert(joined.count() == 810)
  }

  test("skewReport surfaces the hot key with its share and skew ratio") {
    val r = graft.operators.Skew.skewReport(fact, Seq("key"), topK = 3).collect()
    assert(r.length == 3)
    val top = r.head
    assert(top.getAs[String]("key") == "hot")
    assert(top.getAs[Long]("key_rows") == 800L)
    assert(math.abs(top.getAs[Double]("share") - 0.8) < 1e-12)
    // 21 distinct keys, 1000 rows -> uniform = 1000/21; hot = 800
    assert(math.abs(top.getAs[Double]("skew_ratio") - 800.0 / (1000.0 / 21.0)) < 1e-9)
  }
}
