package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** REAL audio codec path (javax.sound.sampled): fixture WAVs decode to
  * the generator manifest's ground-truth format and integer-exact
  * signal features; trim re-encodes deterministically and its re-decoded
  * prefix stats match the manifest; garbage degrades, never throws. */
class MultimodalAudioSpec extends SparkSpec {
  import spark.implicits._

  private val wavDir = new java.io.File("fixtures/media_wav").getAbsolutePath

  private def wavMedia = graft.sources.Sources.readBinaryFiles(spark, wavDir, "*.wav")
    .select(regexp_extract(col("path"), "clip_([0-9]+)\\.wav$", 1)
      .cast("long").as("media_id"), col("content"))

  private def manifest = spark.read.option("header", "true")
    .option("inferSchema", "true").csv(s"$wavDir/manifest.csv")

  test("decodeAudio reports the manifest's format and exact integer features") {
    val meta = Multimodal.decodeAudio(wavMedia).collect().map(m => m.media_id -> m).toMap
    val truth = manifest.collect()
    assert(truth.length == 12 && meta.size == 12)
    truth.foreach { r =>
      val m = meta(r.getAs[Int]("media_id").toLong)
      assert(m.sample_rate == r.getAs[Int]("sample_rate") &&
        m.channels == r.getAs[Int]("channels") && m.bits == 16, s"format for $m vs $r")
      assert(m.n_frames == r.getAs[Int]("n_frames").toLong, s"frames for $m vs $r")
      assert(m.peak_abs == r.getAs[Int]("peak_abs"), s"peak for $m vs $r")
      assert(m.sumsq == r.getAs[Long]("sumsq"), s"sumsq for $m vs $r")
      assert(m.zero_cross == r.getAs[Int]("zero_cross").toLong, s"zc for $m vs $r")
      assert(m.encoding == "pcm_signed" && m.checksum.length == 32)
    }
  }

  test("trimAudio: re-decoded prefix matches the manifest, re-encode is deterministic") {
    val truth = manifest.collect().map(r => r.getAs[Int]("media_id").toLong ->
      (r.getAs[Int]("trim_frames").toLong, r.getAs[Long]("trim_sumsq"))).toMap
    val once = Multimodal.trimAudio(wavMedia, 200).collect()
    assert(once.length == 12)
    once.foreach { t =>
      val (frames, sumsq) = truth(t.media_id)
      assert(t.out_frames == frames && t.out_sumsq == sumsq,
        s"trim drifted for ${t.media_id}: $t vs ($frames, $sumsq)")
      // the payload is a genuinely parseable WAV
      val re = Multimodal.decodeAudioClip(t.media_id, t.content)
      assert(re.encoding == "pcm_signed" && re.n_frames == frames)
    }
    val twice = Multimodal.trimAudio(wavMedia, 200).collect()
      .map(t => t.media_id -> t.checksum).toMap
    once.foreach(t => assert(twice(t.media_id) == t.checksum,
      s"re-encode nondeterministic for ${t.media_id}"))
  }

  test("trim beyond the clip length keeps the whole clip") {
    val full = manifest.collect().map(r => r.getAs[Int]("media_id").toLong ->
      (r.getAs[Int]("n_frames").toLong, r.getAs[Long]("sumsq"))).toMap
    Multimodal.trimAudio(wavMedia, 3600 * 1000).collect().foreach { t =>
      val (frames, sumsq) = full(t.media_id)
      assert(t.out_frames == frames && t.out_sumsq == sumsq, s"$t")
    }
  }

  test("undecodable payloads degrade to encoding=unknown instead of failing the partition") {
    val junk = Seq((1L, "definitely not audio".getBytes("UTF-8")),
        (2L, Array[Byte](0x52, 0x49, 0x46, 0x46, 9, 9)))
      .toDF("media_id", "content")
    val metas = Multimodal.decodeAudio(junk).collect()
    assert(metas.forall(m => m.encoding == "unknown" && m.sample_rate == -1))
    val trimmed = Multimodal.trimAudio(junk, 200).collect()
    assert(trimmed.forall(t => t.out_frames == -1L && t.out_len == 0L))
  }
}
