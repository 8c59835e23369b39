package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A SNIFFED-media record ([[Multimodal.sniffDecode]]): identity facts
  * (length + checksum) plus whatever the container's own header PROVES —
  * `media_kind` names the recognized container (`png` | `wav` | `y4m`),
  * or `binary` for opaque payloads, in which case every dimensional
  * field is None: the generic-blob lane never fabricates geometry.
  * FULL decode (pixels, samples, frames) lives in [[ImageMeta]] /
  * [[AudioMeta]] / [[VideoMeta]]. */
case class MediaMeta(
    media_id: Long,
    byte_len: Long,
    checksum: String,
    media_kind: String,
    width: Option[Int],
    height: Option[Int],
    channels: Option[Int],
    frame_count: Option[Int])

/** Resized media item: opaque payload + verifiable metadata. */
case class ResizedMedia(
    media_id: Long,
    out_width: Int,
    out_height: Int,
    content: Array[Byte],
    out_len: Long,
    checksum: String)

/** REAL decoded-video metadata (hand-rolled YUV4MPEG2 container parser —
  * the uncompressed interchange format, no JDK codec needed): stream
  * geometry, frame rate as the exact rational, colorspace tag, and the
  * frame count from walking every FRAME marker (validated against the
  * payload length — a truncated stream fails loudly, it does not
  * under-count). */
case class VideoMeta(
    media_id: Long,
    byte_len: Long,
    checksum: String,
    width: Int,
    height: Int,
    fps_num: Int,
    fps_den: Int,
    colorspace: String,
    frame_count: Int)

/** One REAL sampled video frame: the raw planar YUV payload's length,
  * integer-exact Y-plane sum (the luma energy a filtering pass keys
  * on — black/white-frame detection), and md5 of the exact frame
  * bytes. */
case class VideoFrame(
    media_id: Long,
    frame_idx: Int,
    width: Int,
    height: Int,
    frame_len: Long,
    y_sum: Long,
    frame_checksum: String)

/** REAL MP4 / ISO-BMFF movie metadata (hand-rolled box walk over
  * ftyp/moov/mvhd/trak/tkhd/mdia/hdlr — public container structure, no
  * codec needed): brand, movie timescale + duration (and the exact
  * integer millisecond form), track census by hdlr handler type, and
  * the first VIDEO track's tkhd geometry (16.16 fixed point, integer
  * part). width/height are -1 when the movie carries no video track. */
case class Mp4Meta(
    media_id: Long,
    byte_len: Long,
    checksum: String,
    major_brand: String,
    timescale: Long,
    duration: Long,
    duration_ms: Long,
    n_tracks: Int,
    n_video: Int,
    n_audio: Int,
    width: Int,
    height: Int)

/** REAL decoded-image metadata (javax.imageio, JDK built-in codecs:
  * PNG/JPEG/GIF/BMP). `format` is the reader's lowercase format name;
  * undecodable payloads keep their byte-level fields and get
  * width/height/channels = -1, format = "unknown". */
case class ImageMeta(
    media_id: Long,
    byte_len: Long,
    checksum: String,
    width: Int,
    height: Int,
    channels: Int,
    format: String)

/** REAL resized image: pixels scaled (bilinear) and re-encoded to PNG.
  * out_width/out_height and the px_* center-pixel RGB come from
  * RE-DECODING the re-encoded payload, so they verify the full
  * decode→scale→encode→decode cycle, not the requested box. */
case class ResizedImage(
    media_id: Long,
    out_width: Int,
    out_height: Int,
    out_format: String,
    content: Array[Byte],
    out_len: Long,
    checksum: String,
    px_r: Int,
    px_g: Int,
    px_b: Int)

/** REAL decoded-audio metadata + integer-exact signal features
  * (javax.sound.sampled, JDK built-in: RIFF/WAVE PCM, AIFF, AU).
  * peak_abs = max |sample|, sumsq = Σ sample² (the RMS numerator, kept
  * as the exact BIGINT instead of a lossy float), zero_cross =
  * per-channel sign-change count summed over channels. Undecodable
  * payloads keep byte-level fields and get -1 / "unknown". */
case class AudioMeta(
    media_id: Long,
    byte_len: Long,
    checksum: String,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_frames: Long,
    peak_abs: Int,
    sumsq: Long,
    zero_cross: Long,
    encoding: String)

/** REAL trimmed audio clip: the first `ms` milliseconds re-encoded as
  * WAV. out_frames/sample_rate/channels/out_sumsq come from RE-DECODING
  * the re-encoded payload — the gate covers the full
  * decode→slice→encode→decode cycle (the audio twin of
  * [[ResizedImage]]'s pixel verification). */
case class TrimmedAudio(
    media_id: Long,
    out_frames: Long,
    sample_rate: Int,
    channels: Int,
    content: Array[Byte],
    out_len: Long,
    checksum: String,
    out_sumsq: Long)

/** Multimodal-column operators (extension phase, SURVEY.md §7.9): treat
  * image/audio/video as opaque BINARY columns with typed metadata;
  * decode / feature-extract runs partition-wise (mapPartitions — one
  * decoder init per partition, the Scala analog of a batched Pandas UDF
  * over mapInPandas), never row-at-a-time on the driver.
  *
  * Codec tiers, all REAL and dependency-free: [[decodeImages]]/
  * [[resizeImages]] (javax.imageio — PNG/JPEG/GIF/BMP),
  * [[decodeAudio]]/[[trimAudio]] (javax.sound.sampled — WAV/AIFF/AU
  * PCM), and [[decodeVideo]]/[[sampleVideoFrames]] (hand-rolled
  * YUV4MPEG2 container parser — uncompressed planar YUV; compressed
  * codecs would plug in at the same two functions).
  * [[decodeMetadata]] is the generic-blob lane: a magic-byte SNIFFER
  * ([[sniffDecode]]) that reports real header-proven geometry for
  * recognized containers and identity facts ONLY (length/checksum,
  * null dimensions) for opaque payloads. [[resize]] keeps a clearly
  * labeled deterministic stub payload for plumbing tests; the real
  * pixel path is [[resizeImages]]. */
object Multimodal {

  /** MAGIC-BYTE sniffer for the generic-blob lane: identity facts
    * (length + md5) are computed for every payload; dimensional facts
    * come ONLY from a recognized container's own header — a real PNG
    * IHDR parse, the canonical RIFF/WAVE chunk walk, or the Y4M stream
    * header + FRAME-marker walk (the same parsers the full codecs use).
    * Anything unrecognized (or truncated/corrupt) is `binary` with all
    * dimensions None: an opaque payload never carries fabricated
    * geometry. Header-only cost — no pixel/sample decode. */
  def sniffDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val checksum = md5hex(bytes)
    val base = MediaMeta(id, bytes.length.toLong, checksum, "binary",
      None, None, None, None)
    def be32(o: Int): Int =
      ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
        ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
    def le16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def le32(o: Int): Long =
      (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    def ascii(o: Int, n: Int): String =
      if (o + n <= bytes.length) new String(bytes, o, n, "US-ASCII") else ""

    val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    scala.util.Try {
      if (bytes.length >= 33 && bytes.take(8).sameElements(pngSig) &&
          ascii(12, 4) == "IHDR") {
        // PNG: IHDR is mandated first — width/height big-endian at
        // 16/20, color type at 25 maps to the sample channel count
        val channels = bytes(25) match {
          case 0 => 1 // greyscale
          case 2 => 3 // truecolor
          case 3 => 1 // indexed (one sample per pixel)
          case 4 => 2 // grey + alpha
          case 6 => 4 // truecolor + alpha
          case other => sys.error(s"png: unknown color type $other")
        }
        base.copy(media_kind = "png", width = Some(be32(16)),
          height = Some(be32(20)), channels = Some(channels),
          frame_count = Some(1))
      } else if (bytes.length >= 44 && ascii(0, 4) == "RIFF" &&
          ascii(8, 4) == "WAVE") {
        // RIFF/WAVE: walk the chunk list for fmt (channels, block
        // align) and data (payload size); frames = data / blockAlign
        var pos = 12
        var channels = -1; var blockAlign = -1; var dataLen = -1L
        while (pos + 8 <= bytes.length && (channels < 0 || dataLen < 0)) {
          val cid = ascii(pos, 4)
          val sz = le32(pos + 4)
          if (cid == "fmt " && sz >= 16) {
            channels = le16(pos + 10)
            blockAlign = le16(pos + 20)
          } else if (cid == "data") dataLen = sz
          pos += 8 + sz.toInt + (sz.toInt & 1)
        }
        require(channels > 0 && blockAlign > 0 && dataLen >= 0,
          "wav: missing fmt/data chunk")
        base.copy(media_kind = "wav", channels = Some(channels),
          frame_count = Some((dataLen / blockAlign).toInt))
      } else if (ascii(0, 9) == "YUV4MPEG2") {
        val hd = y4mHeaderOf(bytes)
        base.copy(media_kind = "y4m", width = Some(hd.width),
          height = Some(hd.height),
          channels = Some(if (hd.colorspace.startsWith("Cmono")) 1 else 3),
          frame_count = Some(y4mFrameOffsets(bytes, hd).length))
      } else if (bytes.length >= 12 && ascii(4, 4) == "ftyp") {
        // ISO-BMFF: the box walk proves brand + geometry; a movie with
        // no video track keeps NULL dimensions (nothing fabricated)
        val info = mp4InfoOf(bytes)
        base.copy(media_kind = "mp4",
          width = if (info.width >= 0) Some(info.width) else None,
          height = if (info.height >= 0) Some(info.height) else None,
          channels = None, frame_count = None)
      } else base
    }.getOrElse(base) // corrupt/truncated header: proven facts only
  }

  /** Partition-wise SNIFF of a (id, content: binary) DataFrame into
    * typed metadata ([[sniffDecode]] — header-only container
    * recognition, identity facts for everything else). The per-partition
    * prologue is where a full codec would set up its context. */
  def decodeMetadata(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (JNI context, model, …)
        it.map { case (id, bytes) => sniffDecode(id, bytes) }
      }
  }

  /** Fixed-size feature vector per media item (stub: deterministic floats
    * from the checksum bytes — stands in for an embedding model). */
  def features(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val digest = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          val vec = (0 until dim).map(i => (digest(i % 16) & 0xFF) / 255.0f).toArray
          (id, vec)
        }
      }
      .toDF("media_id", "feature")
  }

  /** STUB resize — a real implementation decodes, scales pixels, and
    * re-encodes; the stub emits a deterministic 16-byte payload derived
    * from (content, target box) so schema, checksums, and partition-wise
    * plumbing are testable end-to-end. Swap this one function for a real
    * codec; everything around it is unchanged. */
  def stubResize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
    resizePayload(java.security.MessageDigest.getInstance("MD5"), bytes, width, height)

  private def resizePayload(md: java.security.MessageDigest, bytes: Array[Byte],
                            width: Int, height: Int): Array[Byte] =
    md.digest(bytes ++ s":${width}x$height".getBytes("UTF-8"))

  /** Resize every media item to a target box, partition-wise (one codec
    * init per partition). Output keeps the binary opaque and carries the
    * payload checksum + dimensions as verifiable metadata. */
  def resize(media: DataFrame, width: Int, height: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: one digest (stand-in for a scaler
        // context) reused across the partition's rows
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val out = resizePayload(md, bytes, width, height)
          ResizedMedia(id, width, height, out, out.length.toLong,
            out.map("%02x".format(_)).mkString)
        }
      }
  }

  // ---- REAL video codec (hand-rolled YUV4MPEG2 — uncompressed planar
  // YUV in a plain-text-framed container; the WAV of video) ----

  /** Parsed Y4M stream header. `frameBytes` is the per-frame payload
    * size the colorspace dictates; `ySize` the luma plane's prefix. */
  private[llm] case class Y4mHeader(width: Int, height: Int,
                                    fpsNum: Int, fpsDen: Int,
                                    colorspace: String, dataStart: Int,
                                    frameBytes: Int, ySize: Int)

  /** Parse the YUV4MPEG2 stream header (space-separated tagged params on
    * the first line). Unknown tags (I, A, X…) are skipped — they don't
    * affect the payload layout; an unsupported COLORSPACE fails loudly
    * because it does. */
  private[llm] def y4mHeaderOf(bytes: Array[Byte]): Y4mHeader = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "y4m: no stream-header newline")
    val toks = new String(bytes, 0, nl, "US-ASCII").split(" ")
    require(toks.head == "YUV4MPEG2", s"y4m: bad magic '${toks.head}'")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "C420"
    toks.tail.filter(_.nonEmpty).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val p = t.substring(1).split(":")
          fn = p(0).toInt; fd = p(1).toInt
        case 'C' => cs = t
        case _ => () // interlace / aspect / extensions: layout-neutral
      }
    }
    require(w > 0 && h > 0, s"y4m: missing W/H in header")
    val ySize = w * h
    val chroma =
      if (cs.startsWith("C420")) 2 * ((w / 2) * (h / 2))
      else if (cs.startsWith("C422")) 2 * ((w / 2) * h)
      else if (cs.startsWith("C444")) 2 * ySize
      else if (cs.startsWith("Cmono")) 0
      else throw new IllegalArgumentException(s"y4m: unsupported colorspace $cs")
    Y4mHeader(w, h, fn, fd, cs, nl + 1, ySize + chroma, ySize)
  }

  /** Payload offsets of every frame, by walking the FRAME markers (each
    * may carry its own params — the offset is wherever ITS newline
    * lands). A truncated frame or a stray marker fails loudly: a video
    * decode that silently under-delivers frames poisons everything
    * downstream. */
  private[llm] def y4mFrameOffsets(bytes: Array[Byte], hd: Y4mHeader): Seq[Int] = {
    val marker = "FRAME".getBytes("US-ASCII")
    val out = Seq.newBuilder[Int]
    var pos = hd.dataStart
    while (pos < bytes.length) {
      require(pos + marker.length <= bytes.length &&
        marker.indices.forall(j => bytes(pos + j) == marker(j)),
        s"y4m: expected FRAME marker at offset $pos")
      var nl = pos + marker.length
      while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
      require(nl < bytes.length, s"y4m: unterminated FRAME header at $pos")
      require(nl + 1 + hd.frameBytes <= bytes.length,
        s"y4m: truncated frame payload at ${nl + 1} " +
          s"(need ${hd.frameBytes} bytes, have ${bytes.length - nl - 1})")
      out += nl + 1
      pos = nl + 1 + hd.frameBytes
    }
    out.result()
  }

  /** Partition-wise REAL video decode: stream geometry + exact frame
    * count from the container itself. */
  def decodeVideo(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val hd = y4mHeaderOf(bytes)
        VideoMeta(id, bytes.length.toLong, md5hex(bytes), hd.width, hd.height,
          hd.fpsNum, hd.fpsDen, hd.colorspace, y4mFrameOffsets(bytes, hd).length)
      })
  }

  /** Sample every `everyN`-th frame of each clip — REAL frame bytes out
    * of the container: per sampled frame the payload length, the
    * integer-exact Y-plane sum, and md5 of the exact planar bytes. One
    * input row fans out to its sampled frames inside mapPartitions — no
    * driver involvement, no shuffle; cost O(clip bytes) per row with
    * unsampled frames SKIPPED by offset arithmetic, never hashed. */
  def sampleVideoFrames(media: DataFrame, everyN: Int = 5): Dataset[VideoFrame] = {
    require(everyN > 0, s"everyN must be positive: $everyN")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val hd = y4mHeaderOf(bytes)
          val offsets = y4mFrameOffsets(bytes, hd)
          offsets.indices.by(everyN).map { i =>
            val off = offsets(i)
            var ySum = 0L
            var j = 0
            while (j < hd.ySize) { ySum += bytes(off + j) & 0xFF; j += 1 }
            md.reset()
            md.update(bytes, off, hd.frameBytes)
            VideoFrame(id, i, hd.width, hd.height, hd.frameBytes.toLong,
              ySum, md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
  }

  // ---- REAL MP4 / ISO-BMFF metadata (hand-rolled box walk — ftyp /
  // moov / mvhd / trak / tkhd / mdia / hdlr are pure public-format
  // structure, ISO/IEC 14496-12; no codec is needed for duration,
  // geometry, or the track census) ----

  /** Parsed ISO-BMFF movie facts (metadata only, no sample decode). */
  private[graft] case class Mp4Info(majorBrand: String, timescale: Long,
                                  duration: Long, nTracks: Int,
                                  nVideo: Int, nAudio: Int,
                                  width: Int, height: Int)

  /** Walk the ISO-BMFF box tree: every box is a 32-bit big-endian size +
    * 4-char type; size==1 carries a 64-bit largesize after the type;
    * size==0 means "to the end of the enclosing space" (legal only for
    * the last box). Truncation fails loudly — a silently short moov
    * would fabricate metadata. */
  private[graft] def mp4InfoOf(bytes: Array[Byte]): Mp4Info = {
    def be32(o: Int): Long =
      ((bytes(o) & 0xFFL) << 24) | ((bytes(o + 1) & 0xFFL) << 16) |
        ((bytes(o + 2) & 0xFFL) << 8) | (bytes(o + 3) & 0xFFL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def ascii(o: Int, n: Int): String = new String(bytes, o, n, "US-ASCII")
    def walk(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit = {
      var pos = from
      while (pos < until) {
        require(pos + 8 <= until, s"mp4: truncated box header at $pos")
        val sz32 = be32(pos)
        val typ = ascii(pos + 4, 4)
        val (payload, end) =
          if (sz32 == 1L) {
            require(pos + 16 <= until, s"mp4: truncated largesize at $pos")
            val sz = be64(pos + 8)
            require(sz >= 16, s"mp4: bad largesize $sz at $pos")
            (pos + 16, pos + sz)
          } else if (sz32 == 0L) (pos + 8, until.toLong)
          else {
            require(sz32 >= 8, s"mp4: bad box size $sz32 at $pos")
            (pos + 8, pos + sz32)
          }
        require(end <= until, s"mp4: box '$typ' at $pos overruns by ${end - until}")
        f(typ, payload, end.toInt)
        pos = end.toInt
      }
    }
    require(bytes.length >= 12 && ascii(4, 4) == "ftyp",
      "mp4: no ftyp box at offset 0")
    var brand = ""
    var timescale = 0L; var duration = 0L
    var nTracks = 0; var nVideo = 0; var nAudio = 0
    var width = -1; var height = -1
    walk(0, bytes.length) {
      case ("ftyp", s, _) => brand = ascii(s, 4).trim
      case ("moov", ms, me) => walk(ms, me) {
        case ("mvhd", s, _) =>
          val v = bytes(s) & 0xFF // FullBox: version + 24-bit flags
          if (v == 1) { timescale = be32(s + 20); duration = be64(s + 24) }
          else { timescale = be32(s + 12); duration = be32(s + 16) }
        case ("trak", ts, te) =>
          nTracks += 1
          var tw = -1; var th = -1; var handler = ""
          walk(ts, te) {
            case ("tkhd", s, _) =>
              val v = bytes(s) & 0xFF
              // width/height are 16.16 fixed point at the tail of tkhd
              // (after matrix); v1 widens the three time fields by 12
              val wOff = s + (if (v == 1) 88 else 76)
              tw = (be32(wOff) >> 16).toInt
              th = (be32(wOff + 4) >> 16).toInt
            case ("mdia", ds, de) => walk(ds, de) {
              case ("hdlr", s, _) => handler = ascii(s + 8, 4)
              case _ => ()
            }
            case _ => ()
          }
          if (handler == "vide") {
            nVideo += 1
            if (width < 0) { width = tw; height = th }
          } else if (handler == "soun") nAudio += 1
        case _ => ()
      }
      case _ => () // free / mdat / skip / uuid: layout-neutral here
    }
    require(timescale > 0, "mp4: no mvhd timescale")
    Mp4Info(brand, timescale, duration, nTracks, nVideo, nAudio, width, height)
  }

  /** Partition-wise REAL MP4 metadata decode: brand, movie duration
    * (exact integer milliseconds: duration·1000 div timescale), track
    * census, and the first video track's tkhd geometry — the
    * duration/resolution curation gate for a video corpus, answered
    * from the container's own structure without touching a sample. */
  def decodeMp4(media: DataFrame): Dataset[Mp4Meta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val info = mp4InfoOf(bytes)
        Mp4Meta(id, bytes.length.toLong, md5hex(bytes), info.majorBrand,
          info.timescale, info.duration,
          info.duration * 1000L / info.timescale,
          info.nTracks, info.nVideo, info.nAudio, info.width, info.height)
      })
  }

  // ---- REAL perceptual hash (dHash over decoded pixels) — the image
  // near-dup signature of the training-data pipelines: uniform
  // brightness/contrast shifts preserve every cell comparison, so
  // shifted copies hash IDENTICALLY while different content diverges ----

  /** 64-bit difference hash of decoded image pixels, integer-exact:
    * per-pixel luma = (299r + 587g + 114b) div 1000, average-pooled to
    * a 9×8 grid (block = w div 9 × h div 8 pixels, truncated
    * remainders ignored — deterministic at any geometry), bit
    * (row*8 + col) set iff cell[row][col] < cell[row][col+1]. Every
    * step is integer division, so any decoder producing the same
    * pixels produces the same hash (PNG is lossless — the generator's
    * ground truth replays exactly). */
  private[graft] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val (bw, bh) = (w / 9, h / 8)
    require(bw > 0 && bh > 0, s"dHash needs at least 9x8 pixels; got ${w}x$h")
    val cells = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        var sum = 0L
        var y = r * bh
        while (y < (r + 1) * bh) {
          var x = c * bw
          while (x < (c + 1) * bw) {
            val p = img.getRGB(x, y)
            sum += (299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) +
              114L * (p & 0xFF)) / 1000L
            x += 1
          }
          y += 1
        }
        cells(r)(c) = sum / (bw.toLong * bh)
        c += 1
      }
      r += 1
    }
    var d = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r)(c) < cells(r)(c + 1)) d |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    d
  }

  /** Partition-wise perceptual hash over an image column: (media_id,
    * width, height, dhash). Undecodable payloads fail loudly — a
    * silently wrong hash poisons the dedup downstream. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"media $id: undecodable image payload")
        (id, img.getWidth, img.getHeight, dHash64(img))
      })
      .toDF("media_id", "width", "height", "dhash")
  }

  /** Adapter: wrap a text corpus as opaque binary media (UTF-8 bytes) —
    * the harness has no true binary tables, so documents stand in. */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      col("text").cast(org.apache.spark.sql.types.BinaryType).as("content"))

  // ---- REAL codecs (javax.imageio — in the JDK, no external libs) ----

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** Decode one image payload with the JDK's ImageIO readers. Total:
    * any undecodable payload degrades to format "unknown" instead of
    * failing the partition. */
  def decodeImage(id: Long, bytes: Array[Byte]): ImageMeta = {
    val checksum = md5hex(bytes)
    val fallback = ImageMeta(id, bytes.length.toLong, checksum, -1, -1, -1, "unknown")
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) fallback
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val fmt = r.getFormatName.toLowerCase(java.util.Locale.ROOT)
          val img = r.read(0)
          ImageMeta(id, bytes.length.toLong, checksum, img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, fmt)
        } catch { case _: java.io.IOException => fallback }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Partition-wise REAL image decode — the production replacement of
    * [[decodeMetadata]]'s stub: one ImageIO configuration per partition
    * (in-memory streams, no disk cache), actual pixel dimensions,
    * channel count from the color model, and the reader's format name. */
  def decodeImages(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: keep ImageIO off the executor's disk
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => decodeImage(id, bytes) }
      }
  }

  /** Decode → bilinear scale to (w, h) → re-encode PNG → RE-decode the
    * output to report its actual dimensions and center pixel. */
  def resizeImage(id: Long, bytes: Array[Byte], w: Int, h: Int): ResizedImage = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (src == null)
      return ResizedImage(id, -1, -1, "unknown", Array.emptyByteArray, 0L,
        md5hex(bytes), -1, -1, -1)
    val dst = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    val out = bos.toByteArray
    val verify = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    val rgb = verify.getRGB(verify.getWidth / 2, verify.getHeight / 2)
    ResizedImage(id, verify.getWidth, verify.getHeight, "png", out,
      out.length.toLong, md5hex(out),
      (rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
  }

  /** Partition-wise REAL resize (the [[resize]] stub's production twin):
    * every image scaled to the target box and re-encoded as PNG, with
    * re-decoded dimensions + center pixel as the verifiable metadata. */
  def resizeImages(media: DataFrame, width: Int, height: Int): Dataset[ResizedImage] = {
    require(width > 0 && height > 0, s"target box must be positive: ${width}x$height")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) => resizeImage(id, bytes, width, height) }
      }
  }

  // ---- REAL audio codec (javax.sound.sampled — in the JDK) ----

  /** Parse a decoded PCM byte payload into int16 samples and fold the
    * integer-exact features. Only 16-bit PCM_SIGNED is featurized (the
    * interchange norm); other widths report byte-true metadata with -1
    * features rather than a lossy reinterpretation. */
  private def pcm16Features(data: Array[Byte], channels: Int,
                            bigEndian: Boolean): (Int, Long, Long) = {
    var peak = 0
    var sumsq = 0L
    var zc = 0L
    // per-channel previous-sample sign: -1 unset, 0 non-negative, 1 negative
    val prevNeg = Array.fill(channels)(-1)
    val n = data.length / 2
    var k = 0
    while (k < n) {
      val lo = data(2 * k + (if (bigEndian) 1 else 0)) & 0xFF
      val hi = data(2 * k + (if (bigEndian) 0 else 1))
      val v = (hi << 8) | lo
      val a = math.abs(v)
      if (a > peak) peak = a
      sumsq += v.toLong * v.toLong
      val neg = if (v < 0) 1 else 0
      val c = k % channels
      if (prevNeg(c) >= 0 && prevNeg(c) != neg) zc += 1
      prevNeg(c) = neg
      k += 1
    }
    (peak, sumsq, zc)
  }

  /** Decode one audio payload with the JDK's sampled-audio readers.
    * Total: undecodable payloads degrade to encoding "unknown". */
  def decodeAudioClip(id: Long, bytes: Array[Byte]): AudioMeta = {
    val checksum = md5hex(bytes)
    val fallback = AudioMeta(id, bytes.length.toLong, checksum,
      -1, -1, -1, -1L, -1, -1L, -1L, "unknown")
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding.toString.toLowerCase(java.util.Locale.ROOT)
        val base = AudioMeta(id, bytes.length.toLong, checksum,
          fmt.getSampleRate.toInt, fmt.getChannels, fmt.getSampleSizeInBits,
          ais.getFrameLength, -1, -1L, -1L, enc)
        if (fmt.getSampleSizeInBits == 16 &&
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
          val (peak, sumsq, zc) =
            pcm16Features(ais.readAllBytes(), fmt.getChannels, fmt.isBigEndian)
          base.copy(peak_abs = peak, sumsq = sumsq, zero_cross = zc)
        } else base
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => fallback
      case _: java.io.IOException => fallback
    }
  }

  /** Partition-wise REAL audio decode: format metadata (rate, channels,
    * width, frame count) plus exact integer signal features — the
    * filter-grade stats an audio-corpus curation pass keys on (silence =
    * sumsq ≈ 0, clipping = peak at full scale, tone vs noise =
    * zero-crossing rate), with no float in any of them. */
  def decodeAudio(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudioClip(id, bytes) })
  }

  /** Decode → keep the first `ms` milliseconds → re-encode WAV →
    * RE-decode the output for its reported frames/rate/channels/Σv². */
  def trimAudioClip(id: Long, bytes: Array[Byte], ms: Int): TrimmedAudio = {
    val fallback = TrimmedAudio(id, -1L, -1, -1, Array.emptyByteArray, 0L,
      md5hex(bytes), -1L)
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        // getFrameLength is NOT_SPECIFIED (-1) for some containers; a
        // negative keepFrames would make Arrays.copyOf throw instead of
        // degrading — unknown-length payloads take the fallback
        if (ais.getFrameLength < 0 || fmt.getFrameSize <= 0) return fallback
        val keepFrames = math.min(ais.getFrameLength,
          fmt.getSampleRate.toLong * ms / 1000L)
        // exact conversion: a >2 GB slice must fail loudly into the
        // fallback, not truncate via toInt and corrupt the clip
        val keepBytes = Math.toIntExact(keepFrames * fmt.getFrameSize)
        val data = java.util.Arrays.copyOf(ais.readAllBytes(), keepBytes)
        val trimmed = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, keepFrames)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(trimmed,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val out = bos.toByteArray
        // verification decode: every reported field comes from the bytes
        // we are about to hand downstream, not from the inputs
        val verify = decodeAudioClip(id, out)
        TrimmedAudio(id, verify.n_frames, verify.sample_rate, verify.channels,
          out, out.length.toLong, md5hex(out), verify.sumsq)
      } finally ais.close()
    } catch {
      // NonFatal, not just the two decode exceptions: one odd payload
      // (ArithmeticException from toIntExact, a codec's runtime throw)
      // must degrade to the fallback row, never fail the whole task
      case scala.util.control.NonFatal(_) => fallback
    }
  }

  /** Partition-wise REAL audio trim (the segmenting/windowing shape an
    * audio training-data pipeline runs before feature extraction). */
  def trimAudio(media: DataFrame, ms: Int): Dataset[TrimmedAudio] = {
    require(ms > 0, s"trim window must be positive: $ms ms")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => trimAudioClip(id, bytes, ms) })
  }
}
