package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MisraGries
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(terms: Seq[String], k: Int, parts: Int): Map[String, Long] =
    terms.toDF("t").repartition(parts)
      .agg(MisraGries(col("t"), k).as("cs"))
      .select(explode(col("cs")).as("c"))
      .select(col("c.term"), col("c.est"))
      .as[(String, Long)].collect().toMap

  test("guarantees hold across partition layouts: capture of >n/k terms, est in [true-n/k, true]") {
    val params = Gen.Parameters.default
    // skewed stream: one dominant term, a mid term, long tail
    val terms = Gen.listOfN(3000, Gen.frequency(
      40 -> Gen.const("whale"), 15 -> Gen.const("dolphin"),
      45 -> Gen.choose(0, 400).map("fish" + _))).apply(params, Seed(7)).get
    val n = terms.size
    val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(3, 5, 10); parts <- Seq(1, 4, 17)) {
      val mg = summarize(terms, k, parts)
      assert(mg.size <= k - 1, s"k=$k parts=$parts: ${mg.size} counters")
      truth.filter(_._2 * k > n).keys.foreach(t =>
        assert(mg.contains(t), s"k=$k parts=$parts: heavy '$t' missing"))
      mg.foreach { case (t, est) =>
        val c = truth.getOrElse(t, 0L)
        assert(est <= c && est * k + n >= c * k,
          s"k=$k parts=$parts: $t est=$est true=$c outside band")
      }
    }
  }

  test("single-partition stream reproduces the classic algorithm exactly") {
    // k=3 (2 counters) over a a b a c b a -> a:2 (decrement on c kills b's 1)
    val terms = Seq("a", "a", "b", "a", "c", "b", "a")
    val mg = summarize(terms, 3, 1)
    // classic trace: a=1,a=2,b=1,a=3,(c: dec-all -> a=2),(b=1),(a=3)
    assert(mg == Map("a" -> 3L, "b" -> 1L))
  }

  test("null inputs are ignored; empty input yields an empty summary") {
    val mg = Seq(Some("x"), None, Some("x"), None).toDF("t")
      .agg(MisraGries(col("t"), 4).as("cs"))
      .select(explode(col("cs")).as("c")).select(col("c.term"), col("c.est"))
      .as[(String, Long)].collect().toMap
    assert(mg == Map("x" -> 2L))
    val empty = Seq.empty[String].toDF("t")
      .agg(MisraGries(col("t"), 4).as("cs"))
      .select(size(col("cs"))).as[Int].collect()
    assert(empty.toSeq == Seq(0))
  }
}
