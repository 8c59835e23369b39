package graft

import graft.llm.Multimodal

/** The hand-rolled YUV4MPEG2 codec: header parsing across colorspaces,
  * frame walking with per-frame params, exact frame extraction, and the
  * loud-failure contract for malformed streams (a video decode that
  * silently under-delivers frames poisons everything downstream). */
class MultimodalVideoSpec extends SparkSpec {
  import spark.implicits._

  /** Build a deterministic Y4M blob: header + n frames whose payload
    * byte j of frame f is (f * 7 + j) % 251. */
  private def clip(w: Int, h: Int, cs: String, frames: Int,
                   fps: String = "25:1",
                   frameParams: Int => String = _ => ""): Array[Byte] = {
    val ySize = w * h
    val chroma = cs match {
      case c if c.startsWith("C420") => 2 * ((w / 2) * (h / 2))
      case c if c.startsWith("C422") => 2 * ((w / 2) * h)
      case c if c.startsWith("C444") => 2 * ySize
      case _ => 0
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F$fps Ip A1:1 $cs\n".getBytes("US-ASCII"))
    (0 until frames).foreach { f =>
      out.write(s"FRAME${frameParams(f)}\n".getBytes("US-ASCII"))
      (0 until ySize + chroma).foreach(j => out.write((f * 7 + j) % 251))
    }
    out.toByteArray
  }

  test("header + frame count across colorspaces; fps rational exact") {
    val cases = Seq(
      ("C420jpeg", 8, 6, 4, 8 * 6 + 2 * (4 * 3)),
      ("C422", 8, 6, 3, 8 * 6 + 2 * (4 * 6)),
      ("C444", 4, 4, 5, 3 * 16),
      ("Cmono", 6, 4, 7, 24))
    cases.foreach { case (cs, w, h, n, frameLen) =>
      val media = Seq((1L, clip(w, h, cs, n, fps = "30000:1001")))
        .toDF("media_id", "content")
      val m = Multimodal.decodeVideo(media).collect().head
      assert((m.width, m.height, m.colorspace, m.frame_count) == (w, h, cs, n),
        s"$cs geometry/count")
      assert((m.fps_num, m.fps_den) == (30000, 1001))
      val frames = Multimodal.sampleVideoFrames(media, everyN = 1).collect()
      assert(frames.length == n && frames.forall(_.frame_len == frameLen),
        s"$cs frame length")
    }
  }

  test("sampled frames carry the EXACT payload bytes (checksum + y_sum)") {
    val w = 4; val h = 4
    val bytes = clip(w, h, "C420", frames = 11,
      frameParams = f => if (f % 2 == 0) " Xodd" else "")
    val media = Seq((9L, bytes)).toDF("media_id", "content")
    val frames = Multimodal.sampleVideoFrames(media, everyN = 5).collect()
      .sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 5, 10),
      "everyN sampling, frame params in headers notwithstanding")
    frames.foreach { fr =>
      val f = fr.frame_idx
      val payload = (0 until (w * h + 2 * 4)).map(j => ((f * 7 + j) % 251).toByte).toArray
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      assert(fr.frame_checksum == md5, s"frame $f bytes must be exact")
      assert(fr.y_sum == (0 until w * h).map(j => (f * 7 + j) % 251).sum.toLong,
        s"frame $f Y-plane sum")
    }
  }

  test("malformed streams fail loudly: truncation, bad magic, stray marker, unknown colorspace") {
    def decode(bytes: Array[Byte]) =
      Multimodal.decodeVideo(Seq((1L, bytes)).toDF("media_id", "content")).collect()
    val good = clip(4, 4, "C420", 3)
    // truncated mid-frame: must raise, not under-count
    val e1 = intercept[Exception](decode(good.dropRight(5)))
    assert(e1.getMessage.contains("truncated") ||
      Option(e1.getCause).exists(_.getMessage.contains("truncated")), s"$e1")
    // bad magic
    val e2 = intercept[Exception](decode("NOTY4M W4 H4\nFRAME\n".getBytes))
    assert(e2.getMessage.contains("magic") ||
      Option(e2.getCause).exists(_.getMessage.contains("magic")), s"$e2")
    // garbage between frames
    val stray = good ++ "JUNK".getBytes("US-ASCII")
    val e3 = intercept[Exception](decode(stray))
    assert(e3.getMessage.contains("FRAME") ||
      Option(e3.getCause).exists(_.getMessage.contains("FRAME")), s"$e3")
    // colorspace the layout math doesn't cover
    val e4 = intercept[Exception](decode(clip(4, 4, "C411", 1)))
    assert(e4.getMessage.contains("colorspace") ||
      Option(e4.getCause).exists(_.getMessage.contains("colorspace")), s"$e4")
  }

  test("committed fixtures decode to their manifest ground truth") {
    val dir = new java.io.File("fixtures/media_y4m")
    assume(dir.exists())
    val media = graft.sources.Sources.readBinaryFiles(spark,
      dir.getAbsolutePath, "*.y4m")
      .selectExpr("CAST(regexp_extract(path, 'clip_([0-9]+)\\\\.y4m$', 1) AS LONG) AS media_id",
        "content")
    val metas = Multimodal.decodeVideo(media).collect().sortBy(_.media_id)
    assert(metas.length == 10)
    val manifest = scala.io.Source.fromFile(new java.io.File(dir, "manifest.csv"))
      .getLines().drop(1).map(_.split(",")).toSeq
    manifest.foreach { m =>
      val meta = metas(m(0).toInt)
      assert((meta.width, meta.height, meta.colorspace, meta.frame_count) ==
        (m(1).toInt, m(2).toInt, m(5), m(6).toInt), s"clip ${m(0)}")
      assert(meta.checksum == m(8), s"clip ${m(0)} checksum")
    }
  }
}
