package graft

import org.scalacheck.Gen
import graft.sources.BandKeys

/** Property pins for the composite delete-key z-band
  * ([[BandKeys.zBand]]): everything `countRange`/fsck's
  * band-disjointness proof rests on. ScalaCheck generators sampled
  * directly (the scalatest bridge artifact is not in the offline
  * cache). No SparkSession needed — pure bit arithmetic. */
class ZBandSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val keyGen: Gen[Long] = Gen.frequency(
    (4, Gen.chooseNum(-1000L, 1000L)), // the small-key cluster real tables have
    (2, Gen.chooseNum(-5000000000L, 5000000000L)),
    (1, Gen.oneOf(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue)),
    (1, Gen.chooseNum(Long.MinValue, Long.MaxValue)))

  private def tuples(n: Int, count: Int): Seq[Seq[Long]] =
    Seq.fill(count)(Seq.fill(n)(keyGen.sample.getOrElse(0L)))

  test("dominance monotonicity: a <= b componentwise implies zBand(a) <= zBand(b)") {
    for (n <- 2 to 8) {
      tuples(n, 400).zip(tuples(n, 400)).foreach { case (x, y) =>
        val a = x.zip(y).map { case (p, q) => math.min(p, q) }
        val b = x.zip(y).map { case (p, q) => math.max(p, q) }
        assert(BandKeys.zBand(a) <= BandKeys.zBand(b),
          s"n=$n a=$a b=$b: ${BandKeys.zBand(a)} > ${BandKeys.zBand(b)}")
      }
    }
  }

  test("box cover: any key tuple inside a box lands inside the box's z interval") {
    for (n <- Seq(2, 3, 5, 8)) {
      tuples(n, 300).zip(tuples(n, 300)).zip(tuples(n, 300)).foreach {
        case ((x, y), p) =>
          val mins = x.zip(y).map { case (a, b) => math.min(a, b) }
          val maxs = x.zip(y).map { case (a, b) => math.max(a, b) }
          // clamp the probe point into the box
          val inBox = p.zipWithIndex.map { case (v, i) =>
            math.max(mins(i), math.min(maxs(i), v))
          }
          val z = BandKeys.zBand(inBox)
          assert(BandKeys.zBand(mins) <= z && z <= BandKeys.zBand(maxs),
            s"n=$n box=$mins..$maxs point=$inBox")
      }
    }
  }

  test("z values are non-negative (the sentinel bands stay distinguishable)") {
    for (n <- 2 to 8)
      tuples(n, 200).foreach { t =>
        assert(BandKeys.zBand(t) >= 0L, s"n=$n t=$t")
      }
  }

  test("small-key resolution: consecutive small keys do NOT collapse to one code") {
    // the reason for the exponent/mantissa compression — plain top-bit
    // truncation maps ALL of 1..30 to one z value, killing the very
    // pruning the band exists for at realistic key magnitudes
    val zs = (1L to 30L).map(k => BandKeys.zBand(Seq(k, 1000L - k)))
    assert(zs.distinct.length == 30, s"small keys collapsed: $zs")
  }
}
