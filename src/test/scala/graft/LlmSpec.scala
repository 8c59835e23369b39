package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity, TextStats}

class LlmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "completely different words entirely here now today"),
    (4L, "the quick brown fox jumps over the lazy dog")   // exact dup of 1
  ).toDF("doc_id", "text")

  test("bpeTrain learns greedy merges with exact left-to-right overlap semantics") {
    // corpus: "aaab" x3, "aaa" x2 — round 1 must merge (a,a) with count
    // 3*2 + 2*2 = 10 (each "aaa*" contributes TWO adjacent (a,a) pairs)
    val docs = Seq((1L, "aaab aaab aaab aaa aaa")).toDF("doc_id", "text")
    val m = TextStats.bpeTrain(docs, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(3), r.getLong(4)))
    assert(m(0) == ((1, "aa", 10L)), s"round 1: ${m(0)}")
    // after merging (a,a) LEFT-TO-RIGHT: "aaab" -> [aa, a, b] (NOT
    // [a, aa, b]); "aaa" -> [aa, a]. Round 2 pairs: (aa,a) 3+2=5,
    // (a,b) 3 -> merge (aa, a) = "aaa" with 5
    assert(m(1) == ((2, "aaa", 5L)), s"round 2: ${m(1)}")
    // round 3: "aaab" = [aaa, b] -> merge (aaa, b) with 3
    assert(m(2) == ((3, "aaab", 3L)), s"round 3: ${m(2)}")
  }

  test("bpeTrainLocal (driver merge loop) is bit-identical to the distributed trainer") {
    // the real testdata corpus at sf0.001: tie-breaks, code-point
    // splitting and left-to-right application must all agree
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = TextStats.bpeTrain(corpus, rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val local = TextStats.bpeTrainLocal(corpus, rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(local == dist, s"driver loop diverged:\nlocal=$local\ndist =$dist")
    // minFreq gates the collect, maxVocab refuses rather than OOMs
    val e = intercept[IllegalArgumentException](
      TextStats.bpeTrainLocal(corpus, rounds = 1, minFreq = 1L, maxVocab = 3))
    assert(e.getMessage.contains("minFreq"))
  }

  test("SEP-containing words are DROPPED by both BPE trainers, not silently corrupted") {
    // a word carrying the U+0001 control byte would break the
    // boundary-safe replace; the word-frequency filter excludes it on
    // trainer and encoder alike, so the merge table sees only clean words
    val tainted = Seq((1L, "aaab aaab aaab aaa aaa"),
      (2L, Seq.fill(6)("aa\u0001ab").mkString(" ")))
      .toDF("doc_id", "text")
    val m = TextStats.bpeTrain(tainted, rounds = 1)
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(m.head == (("aa", 10L)),
      s"the tainted word's pairs must not dominate round 1: ${m.head}")
    val l = TextStats.bpeTrainLocal(tainted, rounds = 1)
      .collect().map(r => (r.getString(3), r.getLong(4)))
    assert(l.head == (("aa", 10L)))
  }

  test("exact dedup keeps min doc_id per text") {
    val groups = Dedup.exactDupGroups(docs).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("canonical_id") == 1L
      && groups(0).getAs[Long]("dup_count") == 2L)
    val kept = Dedup.exactDedup(docs).as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("shingles are distinct word n-grams") {
    val sh = Dedup.shingles(docs.filter($"doc_id" === 1), 3).as[(Long, String)].collect()
    assert(sh.length == 7) // 9 words -> 7 trigrams, all distinct here
    assert(sh.map(_._2).contains("the quick brown"))
  }

  test("ngramJaccardPairs finds near-dups above threshold, exact dups at 1.0") {
    val asMap = Dedup.ngramJaccardPairs(docs, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(asMap((1L, 4L)) == 1.0)
    assert(asMap.contains((1L, 2L)) && asMap((1L, 2L)) > 0.5 && asMap((1L, 2L)) < 1.0)
    assert(!asMap.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhashLshPairs surfaces the same near-dup structure") {
    val pairs = Dedup.minhashLshPairs(docs, 3, 16, 4, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("incrementalNearDupPairs == full-corpus LSH restricted to batch×corpus") {
    // the exactness claim: probing the corpus band index with the batch's
    // signatures yields exactly the cross pairs the full self-join finds
    // (identical signatures, identical verify) — nothing extra, nothing
    // missed. Wider corpus so buckets actually collide across the split.
    val many = (1L to 30L).map { i =>
      (i, s"shared prefix words here w${i % 4} middle part w${i % 3} tail w${i % 2}")
    }.toDF("doc_id", "text")
    val batch = many.filter($"doc_id" % 5 === 0)
    val corpus = many.filter($"doc_id" % 5 =!= 0)
    val inc = Dedup.incrementalNearDupPairs(corpus, batch).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = Dedup.minhashLshPairs(many).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val crossFromFull = full.collect {
      case ((a, b), j) if a % 5 == 0 && b % 5 != 0 => (a, b) -> j
      case ((a, b), j) if b % 5 == 0 && a % 5 != 0 => (b, a) -> j
    }.toMap
    assert(inc == crossFromFull, s"inc=$inc full-cross=$crossFromFull")
    assert(inc.nonEmpty, "fixture produced no cross pairs — weak test")
  }

  test("simhash: identical docs identical fingerprints; near-dups small hamming") {
    val fps = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(4L))
    val ham12 = java.lang.Long.bitCount(fps(1L) ^ fps(2L))
    val ham13 = java.lang.Long.bitCount(fps(1L) ^ fps(3L))
    assert(ham12 < ham13)
    val pairs = Dedup.simhashPairs(docs, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simhashPairs candidate generation is complete vs brute force (pigeonhole)") {
    // wider corpus: every hamming<=8 pair found by exhaustive comparison
    // must be produced by the chunked LSH
    val many = (1L to 40L).map(i => (i, s"w${i % 5} common words here plus w${i % 7} and w${i % 3}"))
      .toDF("doc_id", "text")
    val fps = Dedup.simhash(many).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      if java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 8
    } yield (a, b)).toSet
    val lsh = Dedup.simhashPairs(many, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"missed: ${brute -- lsh}; extra: ${lsh -- brute}")
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f))   // opposite of 0
  ).toDF("vec_id", "embedding")

  test("native CosineSimilarity expression computes correct values") {
    import org.apache.spark.sql.graft.CosineSimilarity.cosineSim
    val sim = vecs.as("a").join(vecs.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("x"), $"b.vec_id".as("y"),
        cosineSim($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sim((0L, 2L))) < 1e-12)
    assert(math.abs(sim((0L, 3L)) + 1.0) < 1e-12)
    assert(sim((0L, 1L)) > 0.99)
  }

  test("bruteForceTopK ranks by cosine with deterministic ties") {
    val out = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // nearest first
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2))
  }

  test("ivfPqTopK: partition-layout-independent, recall-sane, finds planted dups") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val out = Similarity.ivfPqTopK(q, e, 5).collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size == 50)
    // integer ADC + rounded elections: any partitioning yields the
    // identical result, bit for bit
    val relaid = Similarity.ivfPqTopK(q.repartition(7), e.repartition(13), 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out == relaid)
    // the exact re-rank bounds damage: rank-1 PQ neighbors must be real
    // neighbors (within the brute-force top-20 ground truth)
    val truth = Similarity.bruteForceTopK(q, e, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rank1Hits = (0L until 10L).count(qid => truth((qid, out((qid, 1))._1)))
    assert(rank1Hits >= 7, s"only $rank1Hits/10 PQ rank-1 results in the exact top-20")
    // a planted exact duplicate shares the query's cell and identical
    // codes: it must surface at rank 1 with cosine 1.0
    val dup = e.filter($"vec_id" === 3).select(lit(9999L).as("vec_id"), $"embedding")
    val withDup = Similarity.ivfPqTopK(
      e.filter($"vec_id" === 3), e.unionByName(dup.withColumn("label", lit(0))
        .select(e.columns.map(col): _*)), 5).collect()
    val first = withDup.find(_.getInt(4) == 1).get
    assert(first.getLong(1) == 9999L && first.getDouble(3) == 1.0)
  }

  test("trained PQ codebooks cut quantization distortion and hold recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val trained = Similarity.trainedPqCodebook(e, m = 8, ksub = 16, iters = 3)
    // Lloyd must improve the objective it minimizes vs the first-ksub
    // default (each subspace independently)
    val dim = 64; val m = 8; val dsub = dim / m
    val default = e.orderBy("vec_id").limit(16)
      .select(col("vec_id").as("code"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("embedding"))
      .select(col("sub"), col("code"),
        slice(col("embedding"), col("sub") * lit(dsub) + lit(1), lit(dsub)).as("cw"))
      .agg(collect_list(struct(col("sub"), col("code"), col("cw"))).as("cbs"))
    val dTrained = Similarity.pqDistortion(e, org.apache.spark.sql.functions.broadcast(trained), m, dsub)
    val dDefault = Similarity.pqDistortion(e, org.apache.spark.sql.functions.broadcast(default), m, dsub)
    assert(dTrained < dDefault,
      s"training did not reduce distortion: $dTrained >= $dDefault")
    // trained determinism across layouts
    val t2 = Similarity.trainedPqCodebook(e.repartition(7), m = 8, ksub = 16, iters = 3)
    assert(trained.select(explode(col("cbs"))).collect().toSet ==
      t2.select(explode(col("cbs"))).collect().toSet)
    // end-to-end with the trained codebook: rank-1 stays inside the
    // exact top-20 at least as often as the untrained path
    val q = e.filter($"vec_id" < 10)
    val truth = Similarity.bruteForceTopK(q, e, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def rank1Hits(cb: Option[org.apache.spark.sql.DataFrame]): Int =
      Similarity.ivfPqTopK(q, e, 5, codebook = cb).collect()
        .filter(_.getInt(4) == 1)
        .count(r => truth((r.getLong(0), r.getLong(1))))
    assert(rank1Hits(Some(trained)) >= rank1Hits(None) - 1)
  }

  test("ivfPqTopK rejects an indivisible subspace split") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(e.filter($"vec_id" < 2), e, 3, m = 7)
    }
  }

  test("embeddingNearDupPairs respects the threshold") {
    val pairs = Dedup.embeddingNearDupPairs(vecs, 0.9).collect()
    assert(pairs.length == 1)
    assert((pairs(0).getLong(0), pairs(0).getLong(1)) == (0L, 1L))
  }

  test("bucketed near-dup variant finds same-bucket pairs only (scale path)") {
    // 64-dim vectors matching the harness embedding shape (hyperplane
    // bucket bit 0 compares dims 0 vs 1)
    val base = Array.fill(64)(0.0f)
    val mk = (v: Float) => { val a = base.clone(); a(0) = v; a(1) = 0.5f; a }
    val big = Seq((0L, mk(1.0f)), (1L, mk(0.99f)), (2L, { val a = base.clone(); a(0) = -1.0f; a }))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(big, 0.9, exhaustive = false).collect()
    assert(pairs.length == 1 && pairs(0).getLong(0) == 0L && pairs(0).getLong(1) == 1L)
  }

  test("text stats: langId, quality, tokens, fingerprint") {
    val t = Seq((1L, "the cat and the dog of the house"),
      (2L, "der hund und die katze ist da")).toDF("doc_id", "text")
    val langs = t.select($"doc_id", TextStats.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(langs(1L) == "en" && langs(2L) == "de")

    val q = TextStats.qualityMetrics(t).where($"doc_id" === 1).collect()(0)
    assert(q.getAs[Long]("n_words") == 8)
    assert(q.getAs[Boolean]("quality_keep"))

    val tok = t.where($"doc_id" === 1)
      .select(TextStats.tokenCount($"text")).as[Long].collect()(0)
    assert(tok == 8)

    // fingerprint is order- and duplicate-insensitive
    val fp = Seq((1L, "b a a c"), (2L, "c b a")).toDF("doc_id", "text")
      .select(TextStats.fingerprint($"text")).as[String].collect()
    assert(fp(0) == fp(1))
  }

  test("chunkDocuments windows with overlap, clamps the tail, whole-doc for short texts") {
    val t = Seq((1L, (1 to 50).map(i => s"w$i").mkString(" ")), // 50 words
      (2L, "a b c")).toDF("doc_id", "text")
    val out = TextStats.chunkDocuments(t, size = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: stride 24 -> chunks at 0 (32 words) and 24 (26 words)
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.length == 2)
    assert(d1(0).getAs[Long]("n_tokens") == 32 && d1(1).getAs[Long]("n_tokens") == 26)
    assert(d1(1).getAs[String]("chunk_text").startsWith("w25 "))
    // doc 2: one whole-document chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk_text") == "a b c")
  }

  test("multimodal: sniff decode reports identity facts only for opaque payloads") {
    val media = Multimodal.documentsAsMedia(docs)
    val meta = Multimodal.decodeMetadata(media).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).checksum == meta(4L).checksum) // same bytes, same decode
    assert(meta(1L).byte_len == 43L)
    // text bytes are no container: kind=binary, NO fabricated geometry
    assert(meta(1L).media_kind == "binary")
    assert(meta(1L).width.isEmpty && meta(1L).height.isEmpty &&
      meta(1L).channels.isEmpty && meta(1L).frame_count.isEmpty)
    val feats = Multimodal.features(media).collect()
    assert(feats.forall(_.getSeq[Float](1).length == 8))
  }

  test("multimodal: sniff decode proves real container headers") {
    import spark.implicits._
    val png = java.nio.file.Files.readAllBytes(
      new java.io.File("fixtures/media_png/img_000.png").toPath)
    val wav = java.nio.file.Files.readAllBytes(
      new java.io.File("fixtures/media_wav/clip_000.wav").toPath)
    val y4m = java.nio.file.Files.readAllBytes(
      new java.io.File("fixtures/media_y4m/clip_000.y4m").toPath)
    val media = Seq((1L, png), (2L, wav), (3L, y4m), (4L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "content")
    val m = Multimodal.decodeMetadata(media).collect().map(x => x.media_id -> x).toMap
    // manifest ground truth: img_000 is 16x16 truecolor; clip_000.wav is
    // mono 400 frames; clip_000.y4m is 8x8 C420jpeg with 7 frames
    assert(m(1L).media_kind == "png" && m(1L).width.contains(16) &&
      m(1L).height.contains(16) && m(1L).channels.contains(3) &&
      m(1L).frame_count.contains(1))
    assert(m(2L).media_kind == "wav" && m(2L).channels.contains(1) &&
      m(2L).frame_count.contains(400) && m(2L).width.isEmpty)
    assert(m(3L).media_kind == "y4m" && m(3L).width.contains(8) &&
      m(3L).height.contains(8) && m(3L).frame_count.contains(7) &&
      m(3L).channels.contains(3))
    assert(m(4L).media_kind == "binary" && m(4L).width.isEmpty)
    // a truncated container header falls back to proven facts only
    val trunc = Seq((9L, png.take(20))).toDF("media_id", "content")
    val t = Multimodal.decodeMetadata(trunc).collect().head
    assert(t.media_kind == "binary" && t.width.isEmpty && t.byte_len == 20L)
  }

  test("repeatedSpanCoverage: positional 5-gram coverage counts cross-doc shares only") {
    val t = Seq(
      (1L, "a b c d e f"),   // grams: "a b c d e", "b c d e f"
      (2L, "x a b c d e"),   // grams: "x a b c d", "a b c d e" (shared with doc 1)
      (3L, "p q r s t"),     // one unique gram
      (4L, "too short")      // < 5 words: excluded
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpanCoverage(t, n = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)), s"got ${got.mkString(",")}")
  }

  test("paragraphDedup: first (doc_id, pos) occurrence survives; docs reassemble in position order") {
    def blk(p: String) = (1 to 16).map(i => s"$p$i").mkString(" ")
    val (a, b, c, d) = (blk("a"), blk("b"), blk("c"), blk("d"))
    val docs = Seq(
      (1L, s"$a $b"),  // defines A and B
      (2L, s"$b $c"),  // B lost to doc 1; C survives
      (3L, a),         // A lost to doc 1 → reassembles to ""
      (4L, s"$d $d")   // within-doc repeat: only the first D survives
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 2L, s"$a $b"), (2L, 2L, 1L, c),
      (3L, 1L, 0L, ""), (4L, 2L, 1L, d)), s"got $got")
  }
}
