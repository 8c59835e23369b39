package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** REAL image codec path (javax.imageio): fixture PNGs decode to the
  * generator manifest's ground-truth dimensions; JPEG decodes through
  * the same entry point; resize re-encodes deterministically and
  * preserves solid-color pixels; garbage degrades, never throws. */
class MultimodalImageSpec extends SparkSpec {
  import spark.implicits._

  private val pngDir = new java.io.File("fixtures/media_png").getAbsolutePath

  private def pngMedia = graft.sources.Sources.readBinaryFiles(spark, pngDir, "*.png")
    .select(regexp_extract(col("path"), "img_([0-9]+)\\.png$", 1)
      .cast("long").as("media_id"), col("content"))

  private def manifest = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$pngDir/manifest.csv")

  test("decodeImages reports the manifest's true dimensions, channels and format") {
    val meta = Multimodal.decodeImages(pngMedia).collect().map(m => m.media_id -> m).toMap
    val truth = manifest.collect()
    assert(truth.length == 12 && meta.size == 12)
    truth.foreach { r =>
      val m = meta(r.getAs[Int]("media_id").toLong)
      assert(m.width == r.getAs[Int]("width") && m.height == r.getAs[Int]("height"),
        s"dims for ${m.media_id}: got ${m.width}x${m.height}, manifest $r")
      assert(m.channels == 3 && m.format == "png", s"$m")
      assert(m.byte_len > 0 && m.checksum.length == 32)
    }
  }

  test("JPEG decodes through the same entry point with real dimensions") {
    val img = new java.awt.image.BufferedImage(37, 23,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(200, 60, 30)); g.fillRect(0, 0, 37, 23); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val m = Multimodal.decodeImage(5L, bos.toByteArray)
    assert(m.width == 37 && m.height == 23 && m.format == "jpeg" && m.channels == 3, s"$m")
  }

  test("resizeImages: re-decoded box is exact, solid color survives, re-encode is deterministic") {
    val truth = manifest.collect()
      .map(r => r.getAs[Int]("media_id").toLong ->
        (r.getAs[Int]("r"), r.getAs[Int]("g"), r.getAs[Int]("b"))).toMap
    val once = Multimodal.resizeImages(pngMedia, 48, 32).collect()
    assert(once.length == 12)
    once.foreach { z =>
      assert(z.out_width == 48 && z.out_height == 32 && z.out_format == "png", s"$z")
      val (r, g, b) = truth(z.media_id)
      assert((z.px_r, z.px_g, z.px_b) == (r, g, b),
        s"center pixel drifted for ${z.media_id}: $z vs $truth")
      // the payload is a genuinely parseable PNG, solid at every corner
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(z.content))
      assert(img.getWidth == 48 && img.getHeight == 32)
      Seq((0, 0), (47, 0), (0, 31), (47, 31)).foreach { case (x, y) =>
        val px = img.getRGB(x, y)
        assert(((px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF) == (r, g, b),
          s"corner ($x,$y) of ${z.media_id} drifted")
      }
    }
    // a second independent run re-encodes to byte-identical payloads
    val twice = Multimodal.resizeImages(pngMedia, 48, 32).collect()
      .map(z => z.media_id -> z.checksum).toMap
    once.foreach(z => assert(twice(z.media_id) == z.checksum,
      s"re-encode nondeterministic for ${z.media_id}"))
  }

  test("undecodable payloads degrade to format=unknown instead of failing the partition") {
    val junk = Seq((1L, "definitely not an image".getBytes("UTF-8")),
        (2L, Array[Byte](0x50, 0x4B, 3, 4, 9, 9)))
      .toDF("media_id", "content")
    val metas = Multimodal.decodeImages(junk).collect().sortBy(_.media_id)
    assert(metas.forall(m => m.format == "unknown" && m.width == -1))
    val resized = Multimodal.resizeImages(junk, 8, 8).collect()
    assert(resized.forall(z => z.out_format == "unknown" && z.out_len == 0L))
  }
}
