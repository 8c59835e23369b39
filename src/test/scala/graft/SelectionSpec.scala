package graft

import graft.operators.Selection

/** Selection (exact k-th / quantiles without total sort) vs a local sort. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def check(data: Seq[Double], ks: Seq[Long], cap: Int): Unit = {
    val df = data.toDF("v").repartition(7)
    val sorted = data.sorted
    ks.foreach { k =>
      val got = Selection.kthSmallest(df, "v", k, bins = 16, collectCap = cap)
      assert(got == sorted((k - 1).toInt), s"k=$k got=$got want=${sorted((k - 1).toInt)}")
    }
  }

  test("kthSmallest == local sort under forced refinement (tiny bins, tiny cap)") {
    val rnd = new scala.util.Random(42)
    // duplicates, negatives, wide magnitudes — and more rows than the cap
    val data = Seq.fill(5000)(math.floor(rnd.nextGaussian() * 1000) / 4) ++
      Seq.fill(300)(7.25) ++ Seq(-1e9, 1e9)
    check(data, Seq(1L, 2L, 1000L, 2650L, 5301L, 5302L), cap = 50)
  }

  test("kthSmallest: all-equal column short-circuits; two-value column") {
    check(Seq.fill(2000)(3.5), Seq(1L, 1000L, 2000L), cap = 10)
    check(Seq.fill(1000)(1.0) ++ Seq.fill(1000)(2.0), Seq(1L, 1000L, 1001L, 2000L), cap = 10)
  }

  test("kthSmallest: adjacent-ulp values stay separable") {
    val a = 1.0; val b = Math.nextUp(1.0)
    check(Seq.fill(600)(a) ++ Seq.fill(600)(b), Seq(600L, 601L), cap = 10)
  }

  test("quantileCont matches the interpolation formula on a local sort") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(4001)(rnd.nextDouble() * 500 - 250)
    val df = data.toDF("v")
    val sorted = data.sorted
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Selection.quantileCont(df, "v", qs, bins = 16, collectCap = 100)
    qs.zip(got).foreach { case (q, g) =>
      val rn = q * (data.length - 1)
      val frn = math.floor(rn)
      val want =
        if (rn == frn) sorted(frn.toInt)
        else sorted(frn.toInt) + (rn - frn) * (sorted(frn.toInt + 1) - sorted(frn.toInt))
      assert(g == want, s"q=$q got=$g want=$want")
    }
  }
}
