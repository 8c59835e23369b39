package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 1000L).map(i => (i, if (i % 3 == 0) "web" else "curated"))
    .toDF("id", "source")

  test("hashSample is deterministic, key-driven, and ~ppm sized") {
    val a = Sampling.hashSample(rows, "id", 250000).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows.repartition(7), "id", 250000)
      .select("id").as[Long].collect().toSet
    assert(a == b) // partition-independent
    assert(a.size > 150 && a.size < 350) // ~25% of 1000
    // monotone: a smaller rate yields a subset (same hash, lower gate)
    val small = Sampling.hashSample(rows, "id", 100000).select("id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val out = Sampling.stratifiedHashSample(rows, "id", "source",
      Map("web" -> 0), defaultPpm = 1000000)
    val srcs = out.select("source").distinct().as[String].collect().toSet
    assert(srcs == Set("curated")) // web sampled out entirely, curated kept fully
    assert(out.count() == rows.filter($"source" === "curated").count())
  }

  test("multimodal resize: partition-wise stub plumbing") {
    import graft.llm.Multimodal
    val media = Seq((1L, "x".getBytes("UTF-8")), (2L, ("y" * 37).getBytes("UTF-8")))
      .toDF("media_id", "content")
    val resized = Multimodal.resize(media, 256, 256).collect()
    assert(resized.length == 2 && resized.forall(r => r.content.length == 16))
    assert(resized.map(_.checksum).distinct.length == 2) // payload-dependent
  }

  test("perGroupSample: exactly k per group, short groups whole, partition-layout-independent") {
    import graft.operators.Sampling
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
      .union(Seq((1000L, "tiny")).toDF("id", "g")) // 1-row group
    val s = Sampling.perGroupSample(df, "g", "id", 7)
    val byGroup = s.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup == Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L, "tiny" -> 1L))
    // identical sample from a different physical layout
    val s2 = Sampling.perGroupSample(df.repartition(13), "g", "id", 7)
    assert(s.exceptAll(s2).count() == 0 && s2.exceptAll(s).count() == 0)
  }

  test("decontaminate flags docs overlapping the benchmark by >= minHits shingles") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares 4+ distinct 3-grams with the benchmark sentence
      (1L, "a copy of the quick brown fox jumps over it"),
      // shares none
      (2L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val flagged = Dedup.decontaminate(corpus, bench, n = 3, minHits = 3).collect()
    assert(flagged.map(_.getLong(0)).toSeq == Seq(1L))
    assert(flagged(0).getAs[Long]("bench_hits") >= 3)
  }
}
