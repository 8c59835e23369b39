package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal}

/** The perceptual-hash image-dedup family: integer-exact dHash over
  * decoded pixels (brightness-shift INVARIANT, content-sensitive) and
  * the chunk-LSH pair generation (complete for Hamming <= 7 by
  * pigeonhole — verified against the brute-force pair set). */
class MultimodalPhashSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic image: pixel (x, y) gray value from `f`. */
  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.max(0, math.min(255, f(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("dHash is brightness-shift invariant and content-sensitive") {
    def split(at: Int, lo: Int, hi: Int) =
      gray(72, 64)((x, _) => if (x < at * 8) lo else hi)
    val base = Multimodal.dHash64(split(4, 96, 160))
    // uniform shifts preserve every cell comparison
    assert(Multimodal.dHash64(split(4, 116, 180)) == base)
    assert(Multimodal.dHash64(split(4, 56, 120)) == base)
    // moving the step one cell flips a whole transition column (16 bits)
    val moved = Multimodal.dHash64(split(5, 96, 160))
    assert(java.lang.Long.bitCount(base ^ moved) == 16)
    // a flat image hashes to 0 (no comparisons fire)
    assert(Multimodal.dHash64(gray(72, 64)((_, _) => 128)) == 0L)
  }

  test("pixel noise is absorbed when cell contrasts exceed the noise margin") {
    // a 10-per-cell luma staircase: every adjacent-cell comparison has
    // margin 10, far above the <= ±2 average shift the scattered ±2
    // noise can induce — the hash is invariant. (Flat EQUAL-luma
    // neighbors sit on a knife edge by construction — equality is not
    // a robust state, which is why the fixtures use >= 20-luma steps.)
    val rnd = (x: Int, y: Int) => ((x * 31 + y * 17) % 5) - 2
    def stair(noise: Boolean) =
      gray(72, 64)((x, y) => 40 + 10 * (x / 8) + (if (noise) rnd(x, y) else 0))
    assert(Multimodal.dHash64(stair(noise = true)) ==
      Multimodal.dHash64(stair(noise = false)))
    // and the staircase hash is the all-ascending pattern (every bit set)
    assert(Multimodal.dHash64(stair(noise = false)) == -1L)
  }

  test("chunk-LSH pairs equal the brute-force pair set (completeness <= 7)") {
    // hashes crafted to cover distances 0, 1, 7, 8, 16: pairs at <= 7
    // must ALL surface (pigeonhole), the 8+ ones must not
    val h0 = 0x0102030405060708L
    val hashes = Seq(
      (0L, h0), (1L, h0), // distance 0
      (2L, h0 ^ 1L), // distance 1 from 0/1
      (3L, h0 ^ 0x7FL), // distance 7 from 0/1, 6 from 2
      (4L, h0 ^ 0xFFL), // distance 8 from 0/1
      (5L, h0 ^ 0xFFFF000000000000L) // distance 16 from 0/1
    ).toDF("media_id", "dhash")
    val got = Dedup.phashNearDupPairs(hashes, maxHamming = 7)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    val all = hashes.as[(Long, Long)].collect()
    val want = (for {
      (a, da) <- all; (b, db) <- all if a < b
      d = java.lang.Long.bitCount(da ^ db) if d <= 7
    } yield (a, b, d)).toSet
    assert(got == want, s"got $got want $want")
    assert(want.exists(_._3 == 7) && !got.exists(p => p._1 == 0L && p._2 == 4L),
      "the distance-7 pair must surface; the distance-8 one must not")
  }

  test("the committed fixtures group exactly as the generator intended") {
    val dir = new java.io.File("fixtures/media_phash")
    assume(dir.isDirectory)
    val media = graft.sources.Sources.readBinaryFiles(spark,
        dir.getAbsolutePath, "*.png")
      .select(regexp_extract(col("path"), "img_([0-9]+)\\.png$", 1)
        .cast("long").as("media_id"), col("content"))
    val pairs = Dedup.phashNearDupPairs(Multimodal.imageDHash(media))
      .as[(Long, Long, Int)].collect().toSet
    // 4 brightness-shift groups of 3 -> 12 pairs, all at distance 0
    val want = (for {
      g <- 0 until 4; i <- 0 until 3; j <- (i + 1) until 3
    } yield (g * 3L + i, g * 3L + j, 0)).toSet
    assert(pairs == want, s"got $pairs")
  }
}
