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

  test("AQE skew-join splits the hot partition at runtime (the conf-driven alternative to salting)") {
    // a genuinely skewed shuffle: one key holds ~100k rows, the tail is
    // tiny, thresholds lowered so local-scale bytes trip the optimizer
    // exactly as a hot partition would at cluster scale
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val bigFact = spark.range(100000)
        .select(lit("hot").as("key"), $"id".as("row_id"))
        .unionByName(spark.range(200)
          .select(concat(lit("k"), $"id" % 20).as("key"), ($"id" + 1000000L).as("row_id")))
      val dim = spark.range(50000)
        .select(lit("hot").as("key"), $"id".as("d_id"))
        .limit(1).unionByName(
          Seq(("k1", 1L), ("k2", 2L)).toDF("key", "d_id"))
      val joined = bigFact.join(dim, Seq("key"))
      // collect() executes THIS frame's own QueryExecution, so the
      // adaptive plan below is the final (post-reoptimization) one —
      // count() would plan a separate query and leave this one unrun
      val n = joined.collect().length
      assert(n == 100020) // 100k hot matches + 10 rows each for k1, k2
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
