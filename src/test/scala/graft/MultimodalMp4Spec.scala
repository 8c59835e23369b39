package graft

import java.io.ByteArrayOutputStream

import graft.llm.Multimodal

/** The hand-rolled ISO-BMFF (MP4) box walk: brand/timescale/duration
  * across mvhd versions, track census by hdlr handler, tkhd 16.16
  * geometry, largesize and to-EOF box forms, and the loud-failure
  * contract for truncated trees (silently short metadata would
  * fabricate curation facts). */
class MultimodalMp4Spec extends SparkSpec {
  import spark.implicits._

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)

  private def box(typ: String, payload: Array[Byte],
                  form: String = "plain"): Array[Byte] = form match {
    case "large" =>
      be32(1) ++ typ.getBytes("US-ASCII") ++ be64(16L + payload.length) ++ payload
    case "tail" => be32(0) ++ typ.getBytes("US-ASCII") ++ payload
    case _ => be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
  }
  private def fullbox(typ: String, version: Int, payload: Array[Byte]): Array[Byte] =
    box(typ, Array(version.toByte, 0.toByte, 0.toByte, 0.toByte) ++ payload)

  private def mvhd(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    val times =
      if (version == 1) be64(7) ++ be64(11) ++ be32(timescale) ++ be64(duration)
      else be32(7) ++ be32(11) ++ be32(timescale) ++ be32(duration)
    fullbox("mvhd", version, times ++ be32(0x10000) ++ Array.fill(12)(0.toByte) ++
      Array.fill(36 + 24)(0.toByte) ++ be32(99))
  }

  private def trak(version: Int, w: Int, h: Int, handler: String): Array[Byte] = {
    val pre =
      if (version == 1) be64(7) ++ be64(11) ++ be32(3) ++ be32(0) ++ be64(100)
      else be32(7) ++ be32(11) ++ be32(3) ++ be32(0) ++ be32(100)
    val tkhd = fullbox("tkhd", version,
      pre ++ Array.fill(8 + 8)(0.toByte) ++ Array.fill(36)(0.toByte) ++
        be32(w.toLong << 16) ++ be32(h.toLong << 16))
    val hdlr = fullbox("hdlr", 0,
      be32(0) ++ handler.getBytes("US-ASCII") ++ Array.fill(12)(0.toByte) ++
        Array('g'.toByte, 0.toByte))
    tkhd ++ box("mdia", hdlr)
  }

  private def movie(brand: String, mvhdV: Int, timescale: Long, duration: Long,
                    tracks: Seq[(Int, Int, Int, String)],
                    mdatForm: String = "plain"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(box("ftyp", brand.getBytes("US-ASCII") ++ be32(512) ++
      "isom".getBytes("US-ASCII")))
    out.write(box("moov", mvhd(mvhdV, timescale, duration) ++
      tracks.flatMap { case (v, w, h, hd) => box("trak", trak(v, w, h, hd)) }.toArray))
    out.write(box("mdat", Array.fill(40)(7.toByte), mdatForm))
    out.toByteArray
  }

  test("mvhd v0/v1, tkhd v0/v1 geometry, track census, largesize + tail mdat") {
    val v0 = movie("isom", 0, 600, 3600,
      Seq((0, 320, 240, "vide"), (0, 0, 0, "soun")))
    val i0 = Multimodal.mp4InfoOf(v0)
    assert(i0 == Multimodal.Mp4Info("isom", 600, 3600, 2, 1, 1, 320, 240))
    // 64-bit mvhd duration + v1 tkhd offsets + largesize mdat
    val v1 = movie("mp42", 1, 90000, 5000000000L,
      Seq((1, 1920, 1080, "vide")), mdatForm = "large")
    val i1 = Multimodal.mp4InfoOf(v1)
    assert(i1 == Multimodal.Mp4Info("mp42", 90000, 5000000000L, 1, 1, 0, 1920, 1080))
    // to-EOF mdat (size == 0 last box)
    val vt = movie("M4V ", 0, 1000, 250, Seq((0, 64, 48, "vide")),
      mdatForm = "tail")
    assert(Multimodal.mp4InfoOf(vt) ==
      Multimodal.Mp4Info("M4V", 1000, 250, 1, 1, 0, 64, 48))
  }

  test("no video track: geometry stays -1 (nothing fabricated)") {
    val audioOnly = movie("isom", 0, 48000, 96000, Seq((0, 0, 0, "soun")))
    val i = Multimodal.mp4InfoOf(audioOnly)
    assert(i.nTracks == 1 && i.nVideo == 0 && i.nAudio == 1)
    assert(i.width == -1 && i.height == -1)
    // the sniffer mirrors: mp4 kind, NULL dimensions
    val meta = Multimodal.sniffDecode(5L, audioOnly)
    assert(meta.media_kind == "mp4" && meta.width.isEmpty && meta.height.isEmpty)
  }

  test("sniffer recognizes mp4 with video geometry; truncation fails loudly") {
    val ok = movie("isom", 0, 600, 1200, Seq((0, 426, 240, "vide")))
    val meta = Multimodal.sniffDecode(9L, ok)
    assert(meta.media_kind == "mp4" &&
      meta.width.contains(426) && meta.height.contains(240))
    // a moov cut mid-box must fail the decode path loudly...
    val cut = ok.take(ok.length - 45)
    intercept[IllegalArgumentException](Multimodal.mp4InfoOf(cut))
    // ...and degrade the SNIFFER to the proven-facts-only binary lane
    assert(Multimodal.sniffDecode(9L, cut).media_kind == "binary")
  }

  test("decodeMp4 over the committed fixtures matches the generator manifest") {
    val dir = new java.io.File("fixtures/media_mp4")
    assume(dir.isDirectory, "committed fixtures present")
    val media = graft.sources.Sources.readBinaryFiles(spark,
        dir.getAbsolutePath, "*.mp4")
      .select(org.apache.spark.sql.functions.regexp_extract(
          org.apache.spark.sql.functions.col("path"), "vid_([0-9]+)\\.mp4$", 1)
        .cast("long").as("media_id"),
        org.apache.spark.sql.functions.col("content"))
    val got = Multimodal.decodeMp4(media).collect()
      .map(m => m.media_id -> m).toMap
    val manifest = scala.io.Source.fromFile(
      new java.io.File(dir, "manifest.csv"))
    val lines = try manifest.getLines().drop(1).toVector finally manifest.close()
    assert(got.size == lines.size)
    lines.foreach { ln =>
      val f = ln.split(",")
      val m = got(f(0).toLong)
      assert(m.byte_len == f(1).toLong && m.checksum == f(2) &&
        m.major_brand == f(3) && m.timescale == f(4).toLong &&
        m.duration == f(5).toLong && m.duration_ms == f(6).toLong &&
        m.n_tracks == f(7).toInt && m.n_video == f(8).toInt &&
        m.n_audio == f(9).toInt && m.width == f(10).toInt &&
        m.height == f(11).toInt,
        s"manifest mismatch for media ${f(0)}: got $m, want $ln")
    }
  }
}
