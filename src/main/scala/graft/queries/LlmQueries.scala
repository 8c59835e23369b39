package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.llm.{Dedup, Multimodal, Similarity, TextStats}

/** LLM-data-pipeline operator queries (extension phase, SURVEY.md §7.9):
  * dedup family, similarity search, text analysis, multimodal plumbing.
  * Oracle SQL is generated where the operator is wide (minhash signatures,
  * simhash bit votes) — hashing is md5-based specifically so DuckDB's
  * md5_number_lower reproduces it bit-for-bit. */
object LlmQueries {

  /** Committed deterministic binary fixtures (tools/gen_media_fixtures.py)
    * — the real-bytes input both sides of llm_multimodal_binary read.
    * Resolved relative to the checkout (overridable via env) and
    * absolutized once, so the SAME path is interpolated into both the
    * Spark reader and the dumped oracle SQL regardless of checkout
    * location. */
  private val mediaFixturesDir = sys.env.getOrElse("GRAFT_MEDIA_FIXTURES",
    new java.io.File("fixtures/media").getAbsolutePath)

  /** Committed REAL PNG fixtures (tools/gen_media_fixtures.py writes the
    * images AND manifest.csv with each one's true width/height/format/
    * solid RGB) — the input of the llm_multimodal_meta / _resize gates,
    * which check genuine ImageIO decode output against that manifest. */
  private val pngFixturesDir = sys.env.getOrElse("GRAFT_MEDIA_PNG_FIXTURES",
    new java.io.File("fixtures/media_png").getAbsolutePath)

  /** The PNG fixture dir as (media_id, content) — the fixture's numeric
    * id (the manifest join key) replaces the reader's path-hash id. */
  private def pngMedia(s: SparkSession): DataFrame =
    graft.sources.Sources.readBinaryFiles(s, pngFixturesDir, "*.png")
      .select(regexp_extract(col("path"), "img_([0-9]+)\\.png$", 1)
        .cast(LongType).as("media_id"), col("content"))

  /** Committed REAL RIFF/WAVE PCM fixtures (tools/gen_media_fixtures.py
    * writes the clips AND manifest.csv with true rate/channels/frames +
    * integer-exact peak/Σv²/zero-crossing/trim-prefix features) — the
    * input of the llm_audio_meta / llm_audio_trim gates, which check
    * genuine javax.sound.sampled decode output against that manifest. */
  private val wavFixturesDir = sys.env.getOrElse("GRAFT_MEDIA_WAV_FIXTURES",
    new java.io.File("fixtures/media_wav").getAbsolutePath)

  private def wavMedia(s: SparkSession): DataFrame =
    graft.sources.Sources.readBinaryFiles(s, wavFixturesDir, "*.wav")
      .select(regexp_extract(col("path"), "clip_([0-9]+)\\.wav$", 1)
        .cast(LongType).as("media_id"), col("content"))

  /** Committed REAL YUV4MPEG2 video fixtures (same generator; manifest
    * .csv = clip geometry/rate/colorspace/frame count, manifest_frames
    * .csv = every 5th frame's length, exact Y-plane sum, and md5 of the
    * raw planar bytes) — the llm_video_meta / llm_multimodal_frames
    * gates check the engine's own container parse + frame extraction
    * against that ground truth. */
  private val y4mFixturesDir = sys.env.getOrElse("GRAFT_MEDIA_Y4M_FIXTURES",
    new java.io.File("fixtures/media_y4m").getAbsolutePath)

  private def y4mMedia(s: SparkSession): DataFrame =
    graft.sources.Sources.readBinaryFiles(s, y4mFixturesDir, "*.y4m")
      .select(regexp_extract(col("path"), "clip_([0-9]+)\\.y4m$", 1)
        .cast(LongType).as("media_id"), col("content"))

  /** Committed REAL MP4 / ISO-BMFF fixtures (same generator; hand-rolled
    * ftyp/moov/mvhd/trak/tkhd/mdia/hdlr box trees across brands, mvhd
    * versions 0 and 1, largesize and to-EOF mdat forms; manifest.csv =
    * each movie's true brand/timescale/duration/track census/geometry) —
    * the llm_mp4_meta gate checks the engine's own box walk against
    * that ground truth. */
  private val mp4FixturesDir = sys.env.getOrElse("GRAFT_MEDIA_MP4_FIXTURES",
    new java.io.File("fixtures/media_mp4").getAbsolutePath)

  private def mp4Media(s: SparkSession): DataFrame =
    graft.sources.Sources.readBinaryFiles(s, mp4FixturesDir, "*.mp4")
      .select(regexp_extract(col("path"), "vid_([0-9]+)\\.mp4$", 1)
        .cast(LongType).as("media_id"), col("content"))

  /** Committed perceptual-hash fixtures (same generator): 72x64 gray
    * PNGs with a vertical brightness step — groups share a split with
    * brightness-SHIFTED members (dHash-identical), singletons differ by
    * whole transition columns; manifest.csv carries each image's exact
    * integer dHash ground truth. */
  private val phashFixturesDir = sys.env.getOrElse("GRAFT_MEDIA_PHASH_FIXTURES",
    new java.io.File("fixtures/media_phash").getAbsolutePath)

  private def phashMedia(s: SparkSession): DataFrame =
    graft.sources.Sources.readBinaryFiles(s, phashFixturesDir, "*.png")
      .select(regexp_extract(col("path"), "img_([0-9]+)\\.png$", 1)
        .cast(LongType).as("media_id"), col("content"))

  /** Near-dup candidate edges (minhash ∪ simhash), shared by the six
    * cluster-family queries. The two pair frames are plain `.cache()` —
    * their plans are declarative and identical across builders, so the
    * cache manager plan-matches them to ONE materialization per session
    * (the retail raw/fct pattern); id-pairs only, never text. */
  private def mhPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(s, d))
      .select(col("a"), col("b")).cache()
  private def dupEdges(s: SparkSession, d: String): DataFrame =
    mhPairs(s, d).unionByName(
      Dedup.simhashPairs(Tables.documents(s, d))
        .select(col("a"), col("b")).cache())

  /** Transitive closure of [[dupEdges]] — memoized per session+dir (see
    * QueryCaches.shared): connected components runs a checkpointed
    * driver-side loop, so without the memo each of its five consumer
    * queries pays a full CC run (~6 runs per bench session at r8). */
  private def dupComponents(s: SparkSession, d: String): DataFrame =
    graft.QueryCaches.shared(s, s"llm_dup_components:$d") {
      graft.operators.ConnectedComponents
        .connectedComponents(dupEdges(s, d), "a", "b")
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_exact_dup_groups" -> ((s, d) => Dedup.exactDupGroups(Tables.documents(s, d))),
    "llm_exact_dedup" -> ((s, d) => Dedup.exactDedup(Tables.documents(s, d))),
    "llm_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d))),
    "llm_minhash_lsh" -> ((s, d) => Dedup.minhashLshPairs(Tables.documents(s, d))),
    "llm_simhash" -> ((s, d) => Dedup.simhash(Tables.documents(s, d))),
    "llm_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    // Near-dup CLUSTERING: LSH pairs (minhash ∪ simhash) are only
    // candidate edges — the dedup policy acts on their transitive
    // closure. Components via alternating large-star/small-star
    // (O(log n) rounds); canonical doc = component min.
    "llm_dup_clusters" -> ((s, d) => {
      val comp = dupComponents(s, d)
      val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select(col("node").as("doc_id"), col("component").as("cluster_id"),
          col("cluster_size"), (col("node") === col("component")).as("is_canonical"))
    }),
    // Cluster-aware split: near-dup CLUSTERS are the atomic unit of
    // split assignment. llm_train_val_test hashes doc_id, which can put
    // two near-identical docs in train and test — leakage no per-doc
    // gate can see. Hashing the CLUSTER id (component for clustered
    // docs, own id for singletons) keeps every cluster in one split;
    // the same 58-bit md5 gate keeps it deterministic across engines,
    // runs and partitionings. Per-doc output so the oracle checks the
    // complete assignment, not a summary.
    "llm_cluster_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val comp = dupComponents(s, d)
      val base = docs.select(col("doc_id"))
      val gid = base.join(comp, base("doc_id") === comp("node"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
      val h = graft.functions.Fns.md5lo58(col("group_id").cast("string")) % 1000000L
      gid.withColumn("split",
        when(h < 900000L, "train").when(h < 950000L, "val").otherwise("test"))
    }),

    // The north-star COMPOSITION: the curation funnel a training-data
    // pipeline actually runs, as one query — normalize → exact dedup on
    // the normalized key → near-dup clustering (minhash ∪ simhash
    // candidates → connected components, canonical-only survives) →
    // quality gate → token budget of the surviving corpus. Output is the
    // per-stage funnel (counts + kept tokens), so the oracle re-derives
    // the ENTIRE chain in SQL. Every stage is an operator already gated
    // on its own; this row proves they compose.
    "llm_curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // the stage frames are doc_id-only (corpus-count rows × 8 bytes) and
      // each feeds BOTH the next stage and its own funnel count — cache
      // them or the md5-normalize scan and the CC anti join re-run per
      // consumer. IDs, never text: cheap even at full corpus scale.
      val exact = graft.QueryCaches.scoped(docs
        .groupBy(md5(TextStats.normalizeText(col("text"))).as("h"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id"))
      val nonCanonical = dupComponents(s, d)
        .filter(col("node") =!= col("component"))
        .select(col("node").as("doc_id"))
      val afterNear = graft.QueryCaches.scoped(
        exact.join(nonCanonical, Seq("doc_id"), "left_anti"))
      val quality = TextStats.qualityMetrics(docs)
        .filter(col("quality_keep")).select("doc_id")
      val kept = docs
        .join(afterNear, Seq("doc_id"), "left_semi")
        .join(quality, Seq("doc_id"), "left_semi")
      val tails = kept.agg(count(lit(1)).as("n_quality_kept"),
        sum(TextStats.tokenCount(col("text"))).as("tokens_kept"))
      docs.agg(count(lit(1)).as("n_raw"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact_kept")))
        .crossJoin(afterNear.agg(count(lit(1)).as("n_neardup_kept")))
        .crossJoin(tails)
        .select("n_raw", "n_exact_kept", "n_neardup_kept",
          "n_quality_kept", "tokens_kept")
    }),

    // Keep-best dedup policy: within each near-dup cluster, survive the
    // single best document (longest text, doc_id tie-break) instead of
    // the arbitrary canonical-min — the selection a real curation run
    // uses. The argmax is a keyed window over CLUSTER cardinality (never
    // the corpus), singletons bypass the window entirely via anti join.
    "llm_dedup_keep_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).cast(LongType).as("n_chars_kept"))
      val comp = dupComponents(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("n_chars_kept").desc, col("doc_id").asc)
      val best = comp
        .join(docs, comp("node") === docs("doc_id"))
        .select(col("doc_id"), col("component").as("cluster_id"), col("n_chars_kept"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
      val singles = docs
        .join(comp.select(col("node")), docs("doc_id") === col("node"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id"), col("n_chars_kept"))
      best.unionByName(singles)
    }),
    // Corpus n-gram table: the statistics every data-mixing /
    // contamination audit starts from — explode word bigrams, count
    // occurrences and document frequency, keep the >= 5 tail. Explode +
    // partial-agg combine map-side; nothing shuffles document text.
    "llm_ngram_table" -> ((s, d) => {
      // split() MATERIALIZED as a column before the higher-order
      // function: transform()'s lambda body re-evaluates any non-leaf
      // outer expression per array element (HOFs are interpreted — no
      // cross-invocation subexpression elimination), so an inline
      // split(text) makes bigram extraction O(words²) per document.
      // Bound to an attribute it is O(1) per element. r20 measurement:
      // 2.53 s -> see OPTIMIZATION_r20.md.
      val ws = col("__ws")
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__ws"))
        .filter(size(ws) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occurrences") >= 5L)
    }),
    // Span-level repetition coverage (Lee et al., ACL 2022): per doc, the
    // fraction of word-5-gram POSITIONS whose gram also occurs in another
    // document — the boilerplate signal whole-doc dedup can't see. Only
    // shared grams survive the semi-join back; per-doc rollup shuffles
    // (doc_id, count) longs.
    "llm_span_dedup" -> ((s, d) =>
      Dedup.repeatedSpanCoverage(Tables.documents(s, d), n = 5)),

    // Paragraph-grain dedup + doc REASSEMBLY (the CCNet/Dolma cleaning
    // shape): first global occurrence of each 16-word block survives,
    // docs are stitched back from survivors. The gated output is the
    // cleaned corpus itself — text, not just counts.
    "llm_paragraph_dedup" -> ((s, d) =>
      Dedup.paragraphDedup(Tables.documents(s, d))),

    // Temperature-reweighted mixture (α = 0.5): sampling weights
    // w_s = T_s^α / Σ T^α — the standard multilingual/multi-source
    // rebalancing (sqrt flattens the head, lifts the tail) from the
    // multilingual-pretraining literature. α = 0.5 keeps it engine-exact:
    // sqrt is IEEE correctly-rounded, and the normalizer Z sums the
    // per-source terms by an ASCENDING-sorted left fold on BOTH engines
    // (array_sort+aggregate here, list_sort+list_reduce in the oracle),
    // so even the double summation order is pinned. Per-source output:
    // weight and the token allocation from a 1M-token budget.
    "llm_mixture_temperature" -> ((s, d) => {
      val dbl = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DoubleType)
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(TextStats.tokenCount(col("text"))).as("total_tok"))
        .withColumn("w", sqrt(dbl(col("total_tok"))))
      val z = broadcast(per.agg(
        aggregate(array_sort(collect_list(col("w"))), lit(0.0), (a, x) => a + x)
          .as("z")))
      per.crossJoin(z)
        .select(col("source"), col("total_tok"),
          round(col("w") / col("z"), 6).as("weight"),
          floor(col("w") / col("z") * lit(1000000.0))
            .cast(org.apache.spark.sql.types.LongType).as("alloc_tokens"))
    }),

    // Mixture sampling: downsample each source to a TOKEN budget — the
    // data-mixing step that turns "what we crawled" into "what we
    // train on". Per-source rates derive from the data (integer-exact
    // ppm = budget*1e6 div total, capped at 1e6), broadcast-join back,
    // and gate rows with the same deterministic md5 gate as llm_sample.
    // Output is the per-source mixing report; sources whose sample came
    // up empty still report (left join from the rate table).
    "llm_mixture_sample" -> ((s, d) => {
      val budget = 800L // tokens per source
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextStats.tokenCount(col("text")).as("n_tok"))
      val rates = toks.groupBy(col("source"))
        .agg(sum(col("n_tok")).as("total_tok"))
        .withColumn("rate_ppm",
          least(lit(1000000L), expr(s"(${budget} * 1000000) div total_tok")))
      val kept = toks
        .join(broadcast(rates.select(col("source"), col("rate_ppm"))), Seq("source"))
        .filter(graft.operators.Sampling.hashSampleGateCol(col("doc_id"), col("rate_ppm")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tokens_kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("total_tok"), col("rate_ppm"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
    }),

    // Deterministic train/val/test split: the same md5 gate as the
    // samplers partitions the corpus 90/5/5 by doc_id hash — stable
    // across runs, partitionings and engines, so a document can never
    // leak between splits when the pipeline re-runs. Output is the split
    // report (counts + token mass per split).
    "llm_train_val_test" -> ((s, d) => {
      val h = graft.functions.Fns.md5lo58(coalesce(col("doc_id").cast("string"), lit(""))) % 1000000L
      Tables.documents(s, d)
        .withColumn("split",
          when(h < 900000L, "train").when(h < 950000L, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextStats.tokenCount(col("text"))).as("n_tokens"))
    }),

    // Dataset-card rollup: the per-source summary every corpus release
    // ships — doc/language/char/token counts in ONE aggregation pass
    // (all sums map-side combinable; the lone distinct is over the tiny
    // lang domain). Mean doc length divides two exact integers.
    "llm_doc_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(length(col("text")).cast(LongType)).as("total_chars"),
          sum(TextStats.tokenCount(col("text"))).as("total_tokens"))
        .withColumn("mean_chars",
          col("total_chars").cast(org.apache.spark.sql.types.DoubleType) /
            col("n_docs").cast(org.apache.spark.sql.types.DoubleType))),

    // Edit-distance verify pass: exact Levenshtein over the LSH candidate
    // pairs ONLY (never all-pairs — the quadratic stays bounded by the
    // banding). Text shuffles just for the surviving candidates; the
    // near-identical flag is an integer cross-multiplication
    // (dist*5 <= max_len ⇔ similarity >= 0.8), no float threshold.
    "llm_edit_verify" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cands = Dedup.minhashLshPairs(docs).select(col("a"), col("b"))
      cands
        .join(docs.select(col("doc_id").as("a"), col("text").as("text_a")), Seq("a"))
        .join(docs.select(col("doc_id").as("b"), col("text").as("text_b")), Seq("b"))
        .select(col("a"), col("b"),
          levenshtein(col("text_a"), col("text_b")).cast(LongType).as("edit_dist"),
          greatest(length(col("text_a")), length(col("text_b"))).cast(LongType).as("max_len"))
        .withColumn("near_identical", col("edit_dist") * lit(5L) <= col("max_len"))
    }),
    // Incremental dedup: the arrival-time path — a NEW batch (doc_id%10
    // stands in for today's crawl) checked against the standing corpus by
    // normalized content digest. Only digests join; at 100 TB the corpus
    // side is a pre-materialized digest index, not a re-scan.
    "llm_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val key = md5(TextStats.normalizeText(col("text")))
      val batch = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), key.as("h"))
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
        .select(key.as("h")).distinct()
      batch
        .join(corpus.withColumn("hit", lit(true)), Seq("h"), "left")
        .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("is_dup"))
    }),
    // Incremental NEAR-dup: the %10==0 slice as the new crawl batch
    // probed against the rest as the standing corpus — batch band
    // signatures equi-join the corpus band index, exact-Jaccard verify;
    // the corpus never self-pairs (cost scales with the batch).
    "llm_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalNearDupPairs(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0))
    }),

    // 4 bits × 8 bands: the low-threshold tuning (harness τ=0.5 sits at
    // θ≈60° where 6-bit bands recall ~20%; see Dedup scaladoc)
    "llm_embedding_neardup" -> ((s, d) =>
      Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), nBits = 4, nBands = 8)),

    // SemDeDup (Abbas et al. 2023): √n cells, within-cell cosine ≥ τ,
    // transitive closure, keep min vec_id per duplicate cluster. τ=0.30
    // picks ~200 within-cell edges at sf0.01 — real cluster structure
    // without trivializing the keep set.
    "llm_semdedup" -> ((s, d) =>
      Similarity.semDedup(Tables.embeddings(s, d), tau = 0.30)),
    "llm_ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, 5)
    }),
    "llm_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopK(e.filter(col("vec_id") < 10), e, 5)
    }),
    "llm_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e.filter(col("vec_id") < 10), e, 5, nProbe = 2)
    }),
    // Decontamination: docs sharing >= 3 shingles with the pseudo
    // benchmark slice (doc_id % 97 == 0 stands in for an eval set).
    "llm_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0), minHits = 3)
    }),

    // Contamination REPORT: the decontamination flags rolled up per
    // source — what a data audit actually publishes (which slices of the
    // corpus leak benchmark content, and how badly). Counts are exact
    // integers; the rate divides them as doubles.
    "llm_contamination_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 97 =!= 0)
      val flagged = Dedup.decontaminate(
        corpus, docs.filter(col("doc_id") % 97 === 0), minHits = 3)
        .withColumn("is_contaminated", lit(true))
      corpus.join(flagged.select(col("doc_id"), col("is_contaminated")), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_contaminated"), 1L).otherwise(0L)).as("n_contaminated"))
        .withColumn("contamination_rate",
          col("n_contaminated").cast(org.apache.spark.sql.types.DoubleType) /
            col("n_docs").cast(org.apache.spark.sql.types.DoubleType))
    }),

    // Deterministic 25% hash sample keyed on doc_id (reproducible,
    // partition-independent, pure pushed-down filter).
    "llm_sample" -> ((s, d) =>
      graft.operators.Sampling.hashSample(Tables.documents(s, d), "doc_id", 250000)
        .select(col("doc_id"), col("lang"), col("source"))),

    // Source-weighted corpus mixing: src0 upsampled to 90%, src1 dropped,
    // everything else at the 30% default — one codegen'd CASE gate.
    "llm_sample_stratified" -> ((s, d) =>
      graft.operators.Sampling.stratifiedHashSample(Tables.documents(s, d),
          "doc_id", "source", Map("src0" -> 900000, "src1" -> 0), defaultPpm = 300000)
        .select(col("doc_id"), col("source"))),

    // Exact 5-per-source deterministic reservoir (hash-ordered window) —
    // the "n examples per source" curation sample.
    "llm_sample_per_source" -> ((s, d) =>
      graft.operators.Sampling.perGroupSample(Tables.documents(s, d), "source", "doc_id", 5)
        .select(col("doc_id"), col("source"))),

    // Canonical normalization (pre-dedup key): harness docs are already
    // lowercase [a-z ], so the is_changed flag doubles as a data-shape
    // assertion the oracle checks.
    "llm_normalize" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextStats.normalizeText(col("text")).as("norm_text"),
        (TextStats.normalizeText(col("text")) =!= col("text")).as("is_changed"))),

    "llm_lang_id" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred"))),
    "llm_quality" -> ((s, d) =>
      TextStats.qualityMetrics(Tables.documents(s, d))
        .select("doc_id", "n_words", "n_chars_measured", "avg_word_len",
          "stopword_ratio", "alpha_ratio", "quality_keep")),
    // Exact integer budget allocation by the largest-remainder
    // (Hamilton) method: 1M training tokens split across sources
    // proportional to their token mass, summing to EXACTLY the budget —
    // where llm_mixture_sample's per-row ppm gates are approximate by
    // construction. Pure integer arithmetic; the remainder-rank window
    // runs over the per-source CONFIG frame (mixture-spec cardinality,
    // not data volume), so the unpartitioned window is dim-sized by
    // contract.
    "llm_exact_allocation" -> ((s, d) => {
      val budget = 1000000L
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("n_tokens"))
      val tot = broadcast(per.agg(sum(col("n_tokens")).as("t")))
      val based = graft.QueryCaches.scoped(per.crossJoin(tot)
        .withColumn("base", expr(s"$budget * n_tokens DIV t"))
        .withColumn("rem", expr(s"($budget * n_tokens) % t")))
      val left = broadcast(based.agg((lit(budget) - sum(col("base"))).as("leftover")))
      based
        .withColumn("rr", row_number()
          .over(Window.orderBy(col("rem").desc, col("source").asc))
          .cast(org.apache.spark.sql.types.IntegerType))
        .crossJoin(left)
        .select(col("source"), col("n_tokens"), col("base"), col("rr"),
          (col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc"))
    }),

    // Character-distribution Shannon entropy per source — the
    // cheap-and-sharp encoding/garbage detector (mojibake, base64 blobs,
    // and binary spill all shift char entropy). Per-char terms are
    // rounded once to scaled BIGINTs, so per-source sums are
    // order-independent; the char histogram is alphabet-sized, never
    // corpus-sized, after one map-side-combinable count.
    "llm_char_entropy" -> ((s, d) => {
      val dbl = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DoubleType)
      val cc = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) > 0)
        .groupBy(col("source"), col("ch")).agg(count(lit(1)).as("c"))
      val tot = cc.groupBy(col("source")).agg(sum(col("c")).as("t"),
        count(lit(1)).as("n_distinct_chars"))
      cc.join(tot, "source")
        .withColumn("term_e9",
          round(-(dbl(col("c")) / dbl(col("t"))) * log(dbl(col("c")) / dbl(col("t"))) * 1e9)
            .cast(LongType))
        .groupBy(col("source"))
        .agg(min(col("t")).as("n_chars"), min(col("n_distinct_chars")).as("n_distinct_chars"),
          sum(col("term_e9")).as("entropy_e9"))
        .select(col("source"), col("n_chars"), col("n_distinct_chars"),
          col("entropy_e9"), (dbl(col("entropy_e9")) / lit(1e9)).as("entropy"))
    }),

    // Out-of-vocabulary rate per source against the corpus top-1000
    // vocabulary — the tokenizer-coverage statistic (how much of each
    // source a fixed vocab explains). Vocab selection is a top-k
    // (count desc, word asc — total order), membership is a broadcast
    // hash join on the 1000-row vocab; integer-ppm rates.
    "llm_oov_rate" -> ((s, d) => {
      val w = graft.QueryCaches.scoped(
        Tables.documents(s, d).select(col("source"),
          explode(TextStats.words(col("text"))).as("word"))
          .filter(length(col("word")) > 0))
      val vocab = w.groupBy(col("word")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word").asc).limit(1000)
        .select(col("word"), lit(1L).as("iv"))
      w.join(broadcast(vocab), Seq("word"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          expr("n_oov * 1000000 DIV n_tokens").as("oov_ppm"))
    }),

    // Per-source dataset card — the corpus report a curation run ships
    // with (datasheet/data-statement practice): docs, tokens, exact-dup
    // count, quality keep count, dominant predicted language with its
    // integer-ppm share. One cached per-doc frame feeds both the
    // per-source rollup and the language-mode argmax; every statistic is
    // integer-exact.
    "llm_dataset_card" -> ((s, d) => {
      val q = TextStats.qualityMetrics(Tables.documents(s, d))
      val base = graft.QueryCaches.scoped(q.select(
        col("doc_id"), col("source"),
        size(TextStats.words(col("text"))).cast(LongType).as("n_ws_tokens"),
        md5(col("text")).as("h"),
        TextStats.langId(col("text")).as("lang_pred"),
        col("quality_keep")))
      val perSrc = base.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws_tokens")).as("n_tokens"),
        countDistinct(col("h")).as("n_distinct_texts"),
        sum(col("quality_keep").cast(LongType)).as("n_quality_keep"))
      val langTop = base.groupBy(col("source"), col("lang_pred"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(min(struct((-col("c")).as("nc"), col("lang_pred").as("l"),
          col("c").as("cc"))).as("best"))
        .select(col("source"), col("best.l").as("top_lang"),
          col("best.cc").as("top_lang_docs"))
      perSrc.join(langTop, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          (col("n_docs") - col("n_distinct_texts")).as("n_exact_dups"),
          col("n_quality_keep"), col("top_lang"), col("top_lang_docs"),
          expr("top_lang_docs * 1000000 DIV n_docs").as("top_lang_ppm"))
    }),

    // BPE first-merge statistics: adjacent symbol pairs inside words,
    // weighted by word frequency, over the VOCABULARY (never corpus
    // volume) — tokenizer induction's opening aggregation.
    "llm_bpe_pairs" -> ((s, d) =>
      TextStats.bpePairCounts(Tables.documents(s, d), minCount = 50)),

    // The full iterative BPE TRAINER, 6 unrolled merge rounds: per round
    // count pairs over the vocabulary, broadcast the winning merge (one
    // 1-row collect), apply it with boundary-safe left-to-right replace
    // (exact greedy-BPE semantics). The oracle replays the same 6 rounds
    // as unrolled DuckDB CTEs — merge choices AND counts must agree
    // bit-for-bit, so a tiebreak or boundary divergence hash-fails.
    "llm_bpe_train" -> ((s, d) =>
      TextStats.bpeTrain(Tables.documents(s, d), rounds = 6)),

    // The DRIVER-LOOP trainer for real vocabularies: one distributed
    // word count + one bounded collect, then the greedy merge loop runs
    // locally — rounds=32000 costs one job instead of 32k barriers. At
    // minFreq=1 it is bit-identical to the distributed trainer (same
    // pair counts, UTF-8-byte tiebreak, left-to-right merge), so it
    // shares llm_bpe_train's oracle; the equivalence is also pinned
    // head-to-head in LlmSpec.
    "llm_bpe_train_fast" -> ((s, d) =>
      TextStats.bpeTrainLocal(Tables.documents(s, d), rounds = 6)),

    // The tokenizer's ENCODE half: the 6 learned merges applied
    // corpus-wide as pure column expressions (per word: SEP-encode +
    // one boundary-safe replace per merge, in learned order) — no UDF,
    // no shuffle beyond the final per-lang aggregate; fertility
    // (tokens/word) is the tokenizer-quality metric per language.
    "llm_bpe_encode" -> ((s, d) =>
      TextStats.bpeEncode(Tables.documents(s, d), rounds = 6)),

    // Efraimidis–Spirakis weighted sample: top-100 by ln(u)/w with
    // md5-deterministic u and token-count weights — longer docs
    // proportionally likelier, the draw fully reproducible.
    "llm_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      graft.operators.Sampling.weightedSampleTopK(docs, "doc_id", "n_tokens", 100)
        .select(col("doc_id"), col("n_tokens"), round(col("es_key"), 6).as("es_key"))
    }),

    // Unigram-LM surprisal (perplexity proxy): mean -ln p(w) per doc
    // with p from corpus unigram counts — the CCNet-style quality
    // signal. Scaled-int lp9 sums make the totals engine-exact.
    "llm_unigram_logprob" -> ((s, d) =>
      TextStats.unigramLogprob(Tables.documents(s, d))),

    // Gopher-style quality rule gate (Rae et al. 2021 §A1.1 shape): word
    // count bounds, mean-word-length bounds, stopword presence, distinct
    // ratio — each rule an EXACT integer comparison (2·Σlen ≥ 5·n avoids
    // the float mean), composed into a keep flag. Pure per-row map —
    // no shuffle at any scale; mean emitted once as a rounded double.
    "llm_quality_gopher" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("n_words",
          expr("CAST(size(filter(split(text, ' '), w -> length(w) > 0)) AS BIGINT)"))
        .withColumn("sum_len",
          expr("CAST(length(replace(text, ' ', '')) AS BIGINT)"))
        .withColumn("n_distinct",
          expr("CAST(size(array_distinct(filter(split(text, ' '), w -> length(w) > 0))) AS BIGINT)"))
        .withColumn("n_stop",
          expr("CAST(size(filter(split(text, ' '), w -> w = 'a' OR w = 'the')) AS BIGINT)"))
        .select(col("doc_id"), col("n_words"), col("sum_len"), col("n_distinct"),
          col("n_stop"),
          expr("round(CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE), 6)")
            .as("mean_word_len"),
          (col("n_words") >= 15L && col("n_words") <= 90L).as("pass_len"),
          (col("sum_len") * 2 >= col("n_words") * 5 &&
            col("sum_len") <= col("n_words") * 8).as("pass_word_len"),
          (col("n_stop") >= 1L).as("pass_stop"),
          (col("n_distinct") * 10 >= col("n_words") * 3).as("pass_distinct"))
        .withColumn("keep", col("pass_len") && col("pass_word_len") &&
          col("pass_stop") && col("pass_distinct"))),

    // Tokenizer fertility per language — the compression-rate readout
    // (chars per BPE token, tokens per word) that decides whether a
    // tokenizer punishes a language in the mixture. Integer sums per
    // lang (map-combinable), two ratio doubles rounded once.
    "llm_fertility" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast(LongType)).as("sum_chars"),
          sum(TextStats.tokenCount(col("text"))).as("sum_bpe"),
          sum(size(split(col("text"), " ")).cast(LongType)).as("sum_ws"))
        .select(col("lang"), col("n_docs"), col("sum_chars"), col("sum_bpe"),
          col("sum_ws"),
          expr("round(CAST(sum_chars AS DOUBLE) / CAST(sum_bpe AS DOUBLE), 6)")
            .as("chars_per_token"),
          expr("round(CAST(sum_bpe AS DOUBLE) / CAST(sum_ws AS DOUBLE), 6)")
            .as("tokens_per_word"))),

    // Bigram-LM surprisal with add-one smoothing — the context-aware
    // fluency signal (common words in impossible orders score high here
    // but low on unigram surprisal). Scaled-int lp9, integer doc sums.
    "llm_bigram_surprisal" -> ((s, d) =>
      TextStats.bigramSurprisal(Tables.documents(s, d))),

    // Cross-source duplication matrix — WHO copies WHOM: near-dup pairs
    // (minhash-verified) rolled up by the source pair of their
    // endpoints, canonical (min, max) source order. The provenance
    // audit that decides which feeds to dedup against each other; the
    // matrix is |sources|² tiny, the heavy part is the pair generation
    // the dedup path already prices.
    "llm_source_dedup_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val src = docs.select(col("doc_id"), col("source"))
      mhPairs(s, d)
        .join(src.select(col("doc_id").as("a"), col("source").as("src_a")), "a")
        .join(src.select(col("doc_id").as("b"), col("source").as("src_b")), "b")
        .groupBy(least(col("src_a"), col("src_b")).as("source_x"),
          greatest(col("src_a"), col("src_b")).as("source_y"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cross_source", col("source_x") =!= col("source_y"))
    }),

    // Asymmetric shingle containment (|A∩B|/|A|) over the minhash band
    // candidates — catches the quotation/wrapper near-dups symmetric
    // Jaccard structurally misses (short doc inside long ⇒ j tiny,
    // containment ≈ 1). Exact integer ppm both directions.
    "llm_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d))),

    // Cross-split leakage audit — WHY cluster-aware splitting exists:
    // for every near-dup pair (the minhash ∪ simhash edge set), do its
    // endpoints straddle train/val/test? Scored for BOTH policies in one
    // pass: naive per-doc hashing leaks (counted in exact ppm), the
    // component-hash policy is structurally leak-free — pinned as a
    // boolean the oracle recomputes, so a split-policy regression
    // hash-fails the round.
    "llm_cross_split_leakage" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = graft.QueryCaches.scoped(dupEdges(s, d).distinct())
      val comp = dupComponents(s, d)
      val base = docs.select(col("doc_id"))
      def gate(c: org.apache.spark.sql.Column) =
        graft.functions.Fns.md5lo58(c.cast("string")) % 1000000L
      def bucket(h: org.apache.spark.sql.Column) =
        when(h < 900000L, "train").when(h < 950000L, "val").otherwise("test")
      val assign = graft.QueryCaches.scoped(
        base.join(comp, base("doc_id") === comp("node"), "left")
          .select(col("doc_id"),
            coalesce(col("component"), col("doc_id")).as("group_id"))
          .withColumn("doc_split", bucket(gate(col("doc_id"))))
          .withColumn("cluster_split", bucket(gate(col("group_id")))))
      edges
        .join(assign.select(col("doc_id").as("a"), col("doc_split").as("dsa"),
          col("cluster_split").as("csa")), "a")
        .join(assign.select(col("doc_id").as("b"), col("doc_split").as("dsb"),
          col("cluster_split").as("csb")), "b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("dsa") =!= col("dsb"), 1L).otherwise(0L)).as("leak_doc"),
          sum(when(col("csa") =!= col("csb"), 1L).otherwise(0L)).as("leak_cluster"))
        .select(col("n_pairs"), col("leak_doc"),
          expr("leak_doc * 1000000 DIV n_pairs").as("leak_doc_ppm"),
          col("leak_cluster"), (col("leak_cluster") === 0L).as("cluster_leak_free"))
    }),

    // N-gram novelty decay: the fraction of each doc's bigram POSITIONS
    // whose bigram first appears in that doc (first-occurrence by min
    // doc_id) — the corpus-freshness curve that falls as scraping
    // saturates a domain. First-occurrence election shuffles only
    // (bigram → min doc_id); integer ppm per doc.
    "llm_ngram_novelty" -> ((s, d) => {
      // split materialized before the lambda — see Dedup.shingleArrayOf
      val ws = col("__ws")
      val bf = graft.QueryCaches.scoped(Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__ws"))
        .filter(size(ws) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(ws) - 1),
          i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
          .as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt")))
      val first = bf.groupBy(col("w1"), col("w2"))
        .agg(min(col("doc_id")).as("first_doc"))
      bf.join(first, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_bigrams"),
          sum(when(col("first_doc") === col("doc_id"), col("cnt")).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_bigrams"), col("n_novel"),
          expr("n_novel * 1000000 DIV n_bigrams").as("novelty_ppm"))
    }),

    // Dedup-recall audit — llm_ann_recall's sibling for the DEDUP
    // indexes: of the exact-verified near-dup pairs (n-gram Jaccard ≥
    // 0.6, the truth set), what fraction does each approximate candidate
    // generator surface (minhash banding at its 0.5 operating point;
    // simhash Hamming ≤ 8)? A banding/fingerprint regression moves these
    // exact integer-over-integer ratios and hash-fails the round.
    "llm_dedup_recall" -> ((s, d) => {
      val dbl = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DoubleType)
      val docs = Tables.documents(s, d)
      val truth = Dedup.ngramJaccardPairs(docs).select(col("a"), col("b"))
      val mh = Dedup.minhashLshPairs(docs)
        .select(col("a"), col("b"), lit(1).as("m_mh"))
      val sp = Dedup.simhashPairs(docs)
        .select(col("a"), col("b"), lit(1).as("m_sh"))
      truth.join(mh, Seq("a", "b"), "left").join(sp, Seq("a", "b"), "left")
        .agg(count(lit(1)).as("n_true"),
          count(col("m_mh")).as("hits_minhash"),
          count(col("m_sh")).as("hits_simhash"))
        .select(col("n_true"),
          col("hits_minhash"),
          (dbl(col("hits_minhash")) / dbl(col("n_true"))).as("recall_minhash"),
          col("hits_simhash"),
          (dbl(col("hits_simhash")) / dbl(col("n_true"))).as("recall_simhash"))
    }),

    // Per-label embedding centroid drift between corpus halves — the
    // embedding-space distribution-shift monitor (did a re-embed or a
    // new batch move a class?). Vector components quantize ONCE to
    // scaled BIGINT, so the per-(label, dim) sums over ROWS are integer
    // (group aggregation order never matters); each dim's squared mean
    // difference uses the integer identity sa·nb − sb·na (no float mean
    // subtraction), rounds once to e12, and integer-sums across dims.
    // One sqrt at the boundary.
    "llm_centroid_drift" -> ((s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("label"), (col("vec_id") % 2 === 0).as("in_a"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("in_a"), col("dim"),
          expr("CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT)").as("q"))
      val byDim = ex.groupBy(col("label"), col("dim"))
        .agg(sum(when(col("in_a"), col("q")).otherwise(0L)).as("sa"),
          sum(when(!col("in_a"), col("q")).otherwise(0L)).as("sb"),
          sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"))
      byDim.withColumn("term_e12", expr(
          """CAST(round((CAST(sa * nb - sb * na AS DOUBLE) / CAST(na * nb AS DOUBLE) / 1e6)
            | * (CAST(sa * nb - sb * na AS DOUBLE) / CAST(na * nb AS DOUBLE) / 1e6) * 1e12) AS BIGINT)"""
            .stripMargin))
        .groupBy(col("label"))
        .agg(min(col("na")).as("n_a"), min(col("nb")).as("n_b"),
          sum(col("term_e12")).as("sum_sq_e12"))
        .select(col("label"), col("n_a"), col("n_b"), col("sum_sq_e12"),
          expr("round(sqrt(CAST(sum_sq_e12 AS DOUBLE) / 1e12), 6)").as("drift_l2"))
    }),

    // DSIR-style importance weights (Xie et al. 2023, word-level): log
    // likelihood ratio of target (lang='en') vs raw word distributions
    // per doc — the domain-matched resampling signal. Integer llr9 sums.
    "llm_dsir_weights" -> ((s, d) =>
      TextStats.dsirWeights(Tables.documents(s, d), col("lang") === "en")),

    // Trained quality-filter classifier (multinomial Naive Bayes, the
    // GPT-3/CCNet classifier-filtering stage): heuristic positive
    // labels (a "curated" source subset), add-one class-conditional
    // word likelihoods + class prior, per-doc log-odds decision — all
    // exact integer sums, replayed bit-identically by DuckDB.
    "llm_nb_quality" -> ((s, d) =>
      TextStats.nbClassifierScores(Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4"))),

    // Classifier CALIBRATION (reliability bins): the trained filter is
    // only trustworthy if its scores mean what they claim — bucket the
    // per-doc NB log-odds into 5 FIXED integer bands (scaled-int
    // thresholds, exact in both engines; quantile bins would tie-break
    // engine-dependently) and report each band's empirical positive
    // rate in ppm (integer cross-multiplication, no doubles). The
    // monotone-rate table IS the calibration curve a pipeline operator
    // reads before trusting the filter's threshold.
    "llm_nb_calibration" -> ((s, d) => {
      val scored = TextStats.nbClassifierScores(Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4"))
      // band on the PER-TOKEN mean log-odds (raw totals scale with doc
      // length — every long doc lands in an extreme band and the curve
      // degenerates). The ratio is one IEEE double division of the same
      // two exact integers in both engines — bit-identical, so the
      // band comparisons can never disagree.
      val r = col("total9") / col("n_tokens") // 1e9 fixed-point per token
      val band = when(r < -2e7, lit(-2))
        .when(r < -0.75e7, lit(-1))
        .when(r <= 0.75e7, lit(0))
        .when(r <= 2e7, lit(1))
        .otherwise(lit(2))
      scored.groupBy(band.cast("bigint").as("band"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"))
        .select(col("band"), col("n_docs"), col("n_pos"),
          expr("n_pos * 1000000L DIV n_docs").as("pos_ppm"))
    }),

    // Top-50 PMI collocations (min pair count 5): the phrase-mining /
    // tokenizer-merge-candidate statistic. Counts are exact integers;
    // the single pmi double formula is textually mirrored by the oracle
    // and computed once; TakeOrderedAndProject top-k, no global sort.
    "llm_pmi_collocations" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // split materialized before the lambda — see Dedup.shingleArrayOf
      val ws = col("__ws")
      val bg = docs.select(split(col("text"), " ").as("__ws"))
        .filter(size(ws) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(ws) - 1),
          i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
          .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      val pairsAll = graft.QueryCaches.scoped(
        bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
      val m = broadcast(pairsAll.agg(sum(col("c12")).as("m")))
      val uni = graft.QueryCaches.scoped(
        docs.select(explode(split(col("text"), " ")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy(col("word")).agg(count(lit(1)).as("c")))
      val n = broadcast(uni.agg(sum(col("c")).as("n")))
      pairsAll.filter(col("c12") >= 5L)
        .join(uni.select(col("word").as("w1"), col("c").as("c1")), "w1")
        .join(uni.select(col("word").as("w2"), col("c").as("c2")), "w2")
        .crossJoin(m).crossJoin(n)
        .withColumn("pmi", expr(
          """round(ln(CAST(c12 AS DOUBLE) / CAST(m AS DOUBLE)
            | * (CAST(n AS DOUBLE) / CAST(c1 AS DOUBLE))
            | * (CAST(n AS DOUBLE) / CAST(c2 AS DOUBLE))), 6)""".stripMargin))
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"), col("pmi"))
        .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
        .limit(50)
    }),
    "llm_token_count" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_ws_tokens"),
        TextStats.tokenCount(col("text")).as("n_bpe_tokens"))),
    "llm_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextStats.fingerprint(col("text")).as("fingerprint"))),
    // REAL ImageIO decode over the committed PNG fixtures: actual pixel
    // dimensions, channel count, and reader format name, gated against
    // the generator's manifest ground truth; the byte identity is gated
    // via md5(hex(content)) — computable on BOTH engines over real
    // binary (DuckDB 1.0 has no md5(BLOB)).
    "llm_multimodal_meta" -> ((s, d) => {
      val bin = pngMedia(s)
      Multimodal.decodeImages(bin).toDF()
        .join(bin.select(col("media_id"),
          md5(hex(col("content"))).as("bytes_md5hex")), Seq("media_id"))
        .select(col("media_id"), col("byte_len"), col("bytes_md5hex"),
          col("width"), col("height"), col("channels"), col("format"))
    }),
    // Feature vector flattened to scalar columns f0..f7: driver-side
    // comparers sort/hash rows and cannot handle raw array cells; the
    // array-valued form stays available via Multimodal.features directly.
    "llm_multimodal_features" -> ((s, d) => {
      val f = Multimodal.features(Multimodal.documentsAsMedia(Tables.documents(s, d)))
      f.select(col("media_id") +:
        (0 until 8).map(i => element_at(col("feature"), i + 1).as(s"f$i")): _*)
    }),
    // REAL resize: decode → bilinear scale to 64×64 → re-encode PNG →
    // RE-decode the payload. Output dims/format come from the re-decoded
    // bytes and the center pixel must equal the manifest's solid color
    // (solid fixtures make the pixel exact under any interpolation), so
    // the row gates the full decode→scale→encode→decode cycle. The
    // re-encoded checksum itself is encoder-specific — its determinism
    // is pinned in MultimodalImageSpec, not cross-engine.
    "llm_multimodal_resize" -> ((s, d) =>
      Multimodal.resizeImages(pngMedia(s), 64, 64).toDF()
        .select(col("media_id"), col("out_width"), col("out_height"),
          col("out_format"), (col("out_len") > 0L).as("has_payload"),
          col("px_r"), col("px_g"), col("px_b"))),
    // REAL javax.sound.sampled decode over the committed WAV fixtures:
    // format metadata plus INTEGER-EXACT signal features (peak |v|, Σv²,
    // per-channel zero crossings) gated against the generator's manifest
    // ground truth — no float tolerance anywhere in the row.
    "llm_audio_meta" -> ((s, d) => {
      val bin = wavMedia(s)
      Multimodal.decodeAudio(bin).toDF()
        .join(bin.select(col("media_id"),
          md5(hex(col("content"))).as("bytes_md5hex")), Seq("media_id"))
        .select(col("media_id"), col("byte_len"), col("bytes_md5hex"),
          col("sample_rate"), col("channels"), col("bits"), col("n_frames"),
          col("peak_abs"), col("sumsq"), col("zero_cross"), col("encoding"))
    }),
    // REAL trim: decode → first 200 ms → re-encode WAV → RE-decode the
    // payload. Reported frames/rate/channels/Σv² come from the re-decoded
    // bytes and must equal the manifest's trim-prefix ground truth, so the
    // row gates the full decode→slice→encode→decode cycle (the audio twin
    // of llm_multimodal_resize). Re-encoded checksum determinism is pinned
    // in MultimodalAudioSpec, not cross-engine.
    "llm_audio_trim" -> ((s, d) =>
      Multimodal.trimAudio(wavMedia(s), 200).toDF()
        .select(col("media_id"), col("out_frames"), col("sample_rate"),
          col("channels"), (col("out_len") > 0L).as("has_payload"),
          col("out_sumsq"))),
    // Audio curation gate (the Gopher-rule analog for audio corpora):
    // per-clip duration / mean-square energy / zero-crossing rate, then
    // silence + clipping + too-short rules as EXACT integer comparisons
    // — every derived value is integer DIV arithmetic on the decoder's
    // exact features, so the gate replays bit-for-bit in the oracle.
    "llm_audio_quality" -> ((s, d) =>
      Multimodal.decodeAudio(wavMedia(s)).toDF()
        .select(col("media_id"),
          expr("n_frames * 1000 DIV sample_rate").as("duration_ms"),
          expr("sumsq DIV (n_frames * channels)").as("mean_square"),
          expr("zero_cross * 1000000 DIV (channels * (n_frames - 1))").as("zcr_ppm"),
          expr("sumsq DIV (n_frames * channels) < 1000000").as("is_silent"),
          (col("peak_abs") >= 32700).as("is_clipped"))
        .withColumn("pass_gate",
          !col("is_silent") && !col("is_clipped") && col("duration_ms") >= 50L)),
    // REAL video-frame sampling over the committed Y4M clips: every 5th
    // frame's RAW planar bytes out of the container — length, exact
    // Y-plane sum, and md5 of the exact frame payload, gated against
    // the generator's per-frame manifest. Partition-wise fan-out, one
    // parse per clip, unsampled frames skipped by offset arithmetic.
    "llm_multimodal_frames" -> ((s, d) =>
      Multimodal.sampleVideoFrames(y4mMedia(s), everyN = 5).toDF()),
    // REAL video metadata: geometry, exact rational frame rate,
    // colorspace tag, and the frame count from walking every FRAME
    // marker (truncation fails loudly) — all against the manifest.
    "llm_video_meta" -> ((s, d) =>
      Multimodal.decodeVideo(y4mMedia(s)).toDF()
        .select(col("media_id"), col("byte_len"), col("checksum"),
          col("width"), col("height"), col("fps_num"), col("fps_den"),
          col("colorspace"), col("frame_count"))),
    // REAL MP4 / ISO-BMFF metadata: the box walk (ftyp/moov/mvhd/trak/
    // tkhd/mdia/hdlr — pure public container structure, no codec)
    // proves brand, movie duration (exact integer ms), the track census
    // by handler type, and the video track's tkhd geometry — the
    // duration/resolution curation gate a video-corpus pipeline runs
    // without touching a single encoded sample. Gated against the
    // committed generator manifest; mvhd v0/v1, 64-bit largesize, and
    // to-EOF (size==0) boxes are all in the fixture set.
    "llm_mp4_meta" -> ((s, d) =>
      Multimodal.decodeMp4(mp4Media(s)).toDF()
        .select(col("media_id"), col("byte_len"), col("checksum"),
          col("major_brand"), col("timescale"), col("duration"),
          col("duration_ms"), col("n_tracks"), col("n_video"),
          col("n_audio"), col("width"), col("height"))),
    // REAL perceptual hash over decoded pixels (dHash, integer-exact:
    // luma DIV + 8x8 average pooling + 9x8 cell comparisons) — the
    // image near-dup signature: brightness-shifted copies hash
    // IDENTICALLY. Gated bit-for-bit against the generator manifest.
    "llm_image_phash" -> ((s, d) =>
      Multimodal.imageDHash(phashMedia(s))),
    // Image near-dup PAIRS via chunk LSH over the dHash (8 disjoint
    // 8-bit bands — COMPLETE for Hamming <= 7 by pigeonhole, never an
    // all-pairs join): the shifted-copy groups pair at distance 0;
    // different splits sit >= 8 bits apart and stay out. The oracle
    // replays the exact pair set from the manifest hashes with
    // xor + bit_count.
    "llm_image_neardup" -> ((s, d) =>
      Dedup.phashNearDupPairs(Multimodal.imageDHash(phashMedia(s)))
        .orderBy(col("a"), col("b"))),
    // REAL-bytes multimodal path: spark.read.format("binaryFile") over
    // committed deterministic fixture files (see
    // tools/gen_media_fixtures.py) — the production ingestion shape for
    // a MIXED media drop (one row per object, content + length + path
    // metadata), not a generated column. The four fixture families
    // (opaque .bin, PNG, RIFF/WAVE, YUV4MPEG2) flow through ONE
    // generic-blob lane: decodeMetadata magic-byte-SNIFFS each payload
    // and reports only header-proven geometry — recognized containers
    // carry their real width/height/channels/frame count (pinned
    // against the committed generator manifests), opaque payloads carry
    // NULL dimensions and identity facts only (nothing fabricated). The
    // gate also checks byte length against the listing's own metadata
    // and byte identity via md5 over the hex encoding (DuckDB's md5 is
    // VARCHAR-only; both engines hex uppercase — the
    // llm_multimodal_meta discipline). At scale the same reader fans
    // out over an object store listing; only the fixture dirs are
    // harness-local.
    "llm_multimodal_binary" -> ((s, d) => {
      // the fixture's numeric id (oracle joins on it) replaces the
      // reader's path-hash media_id; ids offset per family so the four
      // globs union into one keyspace
      def family(dir: String, glob: String, rx: String, offset: Long) =
        graft.sources.Sources.readBinaryFiles(s, dir, glob)
          .select((regexp_extract(col("path"), rx, 1).cast(LongType) + offset)
            .as("media_id"), col("byte_len").as("src_len"), col("content"))
      val all =
        family(mediaFixturesDir, "*.bin", "media_([0-9]+)\\.bin$", 0L)
          .unionByName(family(pngFixturesDir, "*.png", "img_([0-9]+)\\.png$", 1000L))
          .unionByName(family(wavFixturesDir, "*.wav", "clip_([0-9]+)\\.wav$", 2000L))
          .unionByName(family(y4mFixturesDir, "*.y4m", "clip_([0-9]+)\\.y4m$", 3000L))
          .unionByName(family(mp4FixturesDir, "*.mp4", "vid_([0-9]+)\\.mp4$", 4000L))
      val meta = Multimodal.decodeMetadata(all).toDF()
      meta.join(all.select(col("media_id"), col("src_len"),
          md5(hex(col("content"))).as("bytes_md5hex")), Seq("media_id"))
        .select(col("media_id"), col("byte_len"),
          (col("byte_len") === col("src_len")).as("len_matches_source"),
          col("bytes_md5hex"), col("media_kind"), col("width"), col("height"),
          col("channels"), col("frame_count"))
    }),

    // BM25 ranked retrieval (Robertson-Sparck Jones, k1=1.2 b=0.75): the
    // full-text-search capability over the corpus — one term explode,
    // one per-doc conditional aggregate, corpus stats as two 1-row
    // broadcasts, TakeOrderedAndProject top-20 (no global sort). The
    // per-term scores add in FIXED textual order and every double step
    // is mirrored by the oracle, so ln() + round(6) is engine-identical
    // (the llm_tfidf discipline).
    "llm_bm25_search" -> ((s, d) => bm25Top20(s, d)),

    // Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    // Buettcher, SIGIR 2009) — the RAG-era retrieval stack in one
    // operator: the SAME information need expressed lexically (the BM25
    // top-20 for the fixed query terms) and semantically (brute-force
    // cosine top-20 around the query doc's embedding, vec_id 0) is fused
    // by rrf(d) = Σ 1/(60+rank_list(d)). Both input rankings are already
    // deterministically gated; the fusion itself uses INTEGER 1e9-scaled
    // reciprocals (1e9 DIV (60+rank)) — no float anywhere, so ties and
    // order are engine-exact. Every window here runs over a ≤20-row
    // frame (post-limit), so the "no global window" rule is respected at
    // any corpus size; the fusion join touches 40 rows regardless of
    // scale.
    "llm_hybrid_rrf" -> ((s, d) => {
      val lexW = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id").asc)
      val lex = bm25Top20(s, d)
        .select(col("doc_id"), col("score"))
        .withColumn("rank_lex", row_number().over(lexW).cast("long"))
        .select(col("doc_id"), col("rank_lex"))
      val e = Tables.embeddings(s, d)
      val sem = Similarity.bruteForceTopK(e.filter(col("vec_id") === 0L), e, 20)
        .select(col("neighbor_id").as("doc_id"), col("rank").cast("long").as("rank_sem"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .withColumn("rrf_ppb",
          coalesce(expr("1000000000 DIV (60 + rank_lex)"), lit(0L)) +
            coalesce(expr("1000000000 DIV (60 + rank_sem)"), lit(0L)))
        .orderBy(col("rrf_ppb").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), col("rank_lex"), col("rank_sem"), col("rrf_ppb"))
    }),

    // Characteristic-term extraction: top-3 terms per doc by tf-idf.
    "llm_tfidf" -> ((s, d) =>
      TextStats.tfIdfTopK(Tables.documents(s, d), k = 3)),

    "llm_chunking" -> ((s, d) =>
      TextStats.chunkDocuments(Tables.documents(s, d), size = 32, overlap = 8)),
    "llm_repetition" -> ((s, d) =>
      TextStats.repetitionMetrics(Tables.documents(s, d))),
    "llm_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val chunks = TextStats.chunkDocuments(docs, size = 32, overlap = 8)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      TextStats.packChunks(chunks, budget = 256)
    }),
    // Balanced output sharding via the distributed two-pass prefix sum
    // (PrefixSum.withGlobalPrefixSum — NO global window): shard boundary
    // = truncating div of the exclusive token prefix by the total, so
    // shard token sums differ by at most one document. The oracle
    // replays the same running sum as a plain global window (DuckDB can
    // afford it at sf0.01) and must land on identical shards.
    "llm_token_shards" -> ((s, d) => {
      import org.apache.spark.sql.types.LongType
      val toks = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      val cum = graft.operators.PrefixSum.withGlobalPrefixSum(
        toks, "doc_id", "n_tokens", "cum_tokens")
      val total = broadcast(toks.agg(sum(col("n_tokens")).as("__total")))
      cum.crossJoin(total)
        .withColumn("shard_id",
          expr("((cum_tokens - n_tokens) * 8) div __total"))
        .groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
    }),

    // FFD packing: same chunk stream as llm_packing, but first-fit-
    // decreasing instead of running-sum next-fit.
    "llm_packing_ffd" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val chunks = TextStats.chunkDocuments(docs, size = 32, overlap = 8)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      TextStats.packChunksFfd(chunks, budget = 256)
    }),

    // Packing-efficiency audit over the FFD result: bins used vs the
    // ⌈Σtokens/budget⌉ lower bound and the mean fill — the "are we
    // wasting sequence budget" readout. All integer (ceil via
    // (Σ+255) DIV 256); rolls up the packed rows in one agg.
    "llm_packing_efficiency" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val chunks = TextStats.chunkDocuments(docs, size = 32, overlap = 8)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      TextStats.packChunksFfd(chunks, budget = 256)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("sum_tokens"),
          countDistinct(col("bin_idx")).as("n_bins"))
        .select(col("source"), col("n_chunks"), col("sum_tokens"), col("n_bins"),
          expr("(sum_tokens + 255) DIV 256").as("lb_bins"),
          expr("(sum_tokens * 1000000) DIV (n_bins * 256)").as("fill_ppm"),
          expr("(((sum_tokens + 255) DIV 256) * 1000000) DIV n_bins")
            .as("efficiency_ppm"))
    }),

    // Language-ID confusion matrix: the langId heuristic scored against
    // the ground-truth lang column — per-cell counts, integer-ppm row
    // shares, and the diagonal flag. The matrix is |langs|² tiny at any
    // corpus scale; one agg over docs feeds it.
    "llm_langid_confusion" -> ((s, d) => {
      val cm = Tables.documents(s, d)
        .select(col("lang"), TextStats.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
      cm.withColumn("n_lang", sum(col("n")).over(Window.partitionBy(col("lang"))))
        .select(col("lang"), col("lang_pred"), col("n"),
          expr("(n * 1000000) DIV n_lang").as("share_ppm"),
          (col("lang") === col("lang_pred")).as("correct"))
    }),
    // Banded-LSH top-k: the OR-over-bands candidate family that keeps
    // recall at LOW similarity thresholds where single-bucket LSH
    // (p^6 agreement + Hamming-1 probes) collapses — the scale path the
    // near-dup tuning already uses, now as a top-k search operator.
    "llm_ann_banded" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.lshTopKBanded(e.filter(col("vec_id") < 10), e, 5)
    }),

    // Hard-negative mining: top-5 most-similar DIFFERENT-label vectors
    // per anchor — the contrastive-training pair generator. Same banded
    // candidate family as llm_ann_banded; the label prune runs on the
    // collision join before any cosine.
    "llm_hard_negatives" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.hardNegatives(e.filter(col("vec_id") < 50), e, 5)
    }),

    // Compressed-corpus search: banded candidates scored on int8 CODES
    // (4× smaller than float32 — the 100 TB embedding-store shape), the
    // float cosine re-attached per survivor as the quantization audit.
    // Integer code arithmetic makes the whole path engine-exact.
    "llm_ann_int8" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.int8TopK(e.filter(col("vec_id") < 10), e, 5)
    }),

    // IVF-PQ (the billion-vector IVFADC layout): probed IVF cells prune,
    // PQ codes (m=8 × 16 codewords) compress scoring to integer
    // table-lookup adds — the candidate join moves ids + 8 small codes,
    // never float embeddings — and the top-refine·k re-rank exactly.
    // approx_dot is the scaled-int ADC score kept as the quantization
    // audit next to the exact cosine.
    "llm_ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(e.filter(col("vec_id") < 10), e, 5)
    }),

    // Driver-verified ANN recall: every approximate index (single-bucket
    // LSH, banded LSH, trained-cells IVF) scored against the brute-force
    // ground truth per query — the measured-recall claims as checked
    // columns instead of comments. Exact doubles: hits/n_true is
    // integer-over-integer division.
    "llm_ann_recall" -> ((s, d) => {
      val dbl = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DoubleType)
      annRecallMarks(s, d)
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_true"),
          count(col("m_lsh")).as("hits_lsh"),
          count(col("m_banded")).as("hits_banded"),
          count(col("m_ivf")).as("hits_ivf"))
        .select(col("query_id"), col("n_true"),
          col("hits_lsh"), (dbl(col("hits_lsh")) / dbl(col("n_true"))).as("recall_lsh"),
          col("hits_banded"), (dbl(col("hits_banded")) / dbl(col("n_true"))).as("recall_banded"),
          col("hits_ivf"), (dbl(col("hits_ivf")) / dbl(col("n_true"))).as("recall_ivf"))
    }),

    // Recall FLOORS as a driver gate: the same hit marks aggregated over
    // all queries, with boolean floor columns whose ORACLE side is the
    // literal TRUE — so a recall regression (a broken probe ring, a
    // degraded index default) flips the computed boolean against the
    // oracle's expectation and hash-fails the round. The recall doubles
    // themselves are cross-checked as exact integer-over-integer
    // divisions, like llm_ann_recall.
    "llm_ann_recall_floor" -> ((s, d) => {
      val dbl = (c: org.apache.spark.sql.Column) =>
        c.cast(org.apache.spark.sql.types.DoubleType)
      annRecallMarks(s, d)
        .agg(count(lit(1)).as("n_true"),
          count(col("m_lsh")).as("hits_lsh"),
          count(col("m_banded")).as("hits_banded"),
          count(col("m_ivf")).as("hits_ivf"))
        .select(col("n_true"),
          (dbl(col("hits_lsh")) / dbl(col("n_true"))).as("recall_lsh"),
          (dbl(col("hits_banded")) / dbl(col("n_true"))).as("recall_banded"),
          (dbl(col("hits_ivf")) / dbl(col("n_true"))).as("recall_ivf"))
        .select(col("n_true"), col("recall_lsh"), col("recall_banded"), col("recall_ivf"),
          (col("recall_lsh") >= AnnRecallFloors.lsh).as("lsh_floor_ok"),
          (col("recall_banded") >= AnnRecallFloors.banded).as("banded_floor_ok"),
          (col("recall_ivf") >= AnnRecallFloors.ivf).as("ivf_floor_ok"))
    }),

    // Incremental top-k maintenance == full recompute: fold the %5==0
    // batch into the top-k over the %5!=0 corpus and check against the
    // full-corpus oracle — the exactness claim of incrementalTopK
    // (a true top-k row is in the old top-k or in the batch), driver-
    // verified. Cost scales with the batch, not the corpus.
    "llm_ann_incremental" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 10)
      val existing = Similarity.bruteForceTopK(q, e.filter(col("vec_id") % 5 =!= 0), 5)
      Similarity.incrementalTopK(existing, q, e.filter(col("vec_id") % 5 === 0), 5)
    }),

    "llm_pii_redact" -> ((s, d) => {
      // harness text carries no PII — inject deterministic markers so the
      // redaction path actually fires, then scrub them back out
      val withPii = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("pii_text"))
      val (emails, phones) = TextStats.piiCounts(col("pii_text"))
      withPii.select(col("doc_id"),
        TextStats.redactPii(col("pii_text")).as("clean_text"),
        emails.as("emails_found"), phones.as("phones_found"))
    })
  )

  // ---------------------------------------------------------------- oracle

  /** DuckDB: (doc_id, lo, hi) distinct hashed word 3-grams (twin of
    * Dedup.hashedShingles — 58-bit folds of md5_number_lower/upper). */
  private val shinglesCte = s"""
sh AS (
  SELECT doc_id,
    CAST(CAST(md5_number_lower(shingle) AS HUGEINT) % ${1L << 58} AS BIGINT) AS lo,
    CAST(CAST(md5_number_upper(shingle) AS HUGEINT) % ${1L << 58} AS BIGINT) AS hi
  FROM (
    SELECT DISTINCT doc_id, array_to_string(words[i:i+2], ' ') AS shingle
    FROM (SELECT doc_id, string_split(text, ' ') AS words,
                 unnest(generate_series(1, len(string_split(text, ' ')) - 2)) AS i
          FROM documents)
  )
)"""

  /** DuckDB twin of Fns.md5u64: md5_number_lower as DECIMAL(20,0). */
  private def dsk(expr: String): String = s"CAST(md5_number_lower($expr) AS DECIMAL(20,0))"

  /** DuckDB double-accumulation cosine over list_zip (field names list_1/2). */
  /** Asserted minimum recalls for the approximate ANN paths (gated by
    * llm_ann_recall_floor against oracle-side literal TRUE). Measured on
    * the harness embeddings at sf0.01: lsh 0.64 (radius-2 probes; was
    * 0.36 at radius 1), banded 0.72, ivf 0.90 — floors sit under the
    * measurement with a small margin so data-drift noise doesn't flap
    * the gate, but any structural regression fails it. */
  private object AnnRecallFloors {
    val lsh = 0.55
    val banded = 0.70
    val ivf = 0.85
  }

  /** Shared core of the two ANN-recall gates: brute-force ground-truth
    * pairs LEFT-joined with a presence mark per approximate index. */
  private def annRecallMarks(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(q, e, 5)
      .select(col("query_id"), col("neighbor_id"))
    def pairs(df: DataFrame, mark: String): DataFrame =
      df.select(col("query_id"), col("neighbor_id"), lit(1L).as(mark))
    truth
      .join(pairs(Similarity.lshTopK(q, e, 5), "m_lsh"),
        Seq("query_id", "neighbor_id"), "left")
      .join(pairs(Similarity.lshTopKBanded(q, e, 5), "m_banded"),
        Seq("query_id", "neighbor_id"), "left")
      .join(pairs(Similarity.ivfTopK(q, e, 5, nProbe = 2), "m_ivf"),
        Seq("query_id", "neighbor_id"), "left")
  }

  private def cosSql(a: String, b: String): String =
    s"""(SELECT sum(CAST(z.l1 AS DOUBLE) * CAST(z.l2 AS DOUBLE)) /
        (sqrt(sum(CAST(z.l1 AS DOUBLE) * CAST(z.l1 AS DOUBLE))) *
         sqrt(sum(CAST(z.l2 AS DOUBLE) * CAST(z.l2 AS DOUBLE))))
        FROM (SELECT unnest($a) AS l1, unnest($b) AS l2) z)"""

  /** DuckDB twin of Similarity.hyperplaneBucket(_, 6, start): bit i set
    * iff embedding[start + 2i] > embedding[start + 2i + 1] (0-based;
    * DuckDB lists are 1-based). Comparison-only — bit-identical across
    * engines. */
  private def hyperplaneBucketSqlAt(start: Int, nBits: Int = 6): String =
    (0 until nBits).map { i =>
      val a = start + 2 * i
      s"(CASE WHEN embedding[${a + 1}] > embedding[${a + 2}] THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private val hyperplaneBucketSql: String = hyperplaneBucketSqlAt(0)

  /** DuckDB twin of lshTopK's multi-probe ring — built from the SAME
    * Similarity.probeMasks(6, 2) the Spark side uses, so the probe sets
    * cannot drift. */
  private val lshProbeListSql: String =
    Similarity.probeMasks(6, 2)
      .map(m => if (m == 0) "bucket" else s"xor(bucket, $m)").mkString(", ")

  /** Shared CTE chain of the two ANN-recall oracles: brute-force ground
    * truth plus the lsh / banded / ivf top-5 replays. */
  private def annRecallCtesSql: String = s"""bf AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM bf) WHERE rank <= 5
), lbucketed AS (
  SELECT vec_id, embedding, $hyperplaneBucketSql AS bucket FROM embeddings
), lprobes AS (
  SELECT vec_id, embedding,
         unnest([$lshProbeListSql]) AS bucket
  FROM lbucketed WHERE vec_id < 10
), lscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM lprobes q JOIN lbucketed c
    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
), lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM lscored) WHERE rank <= 5
), bbucketed AS (
  SELECT vec_id, embedding,
         ${(0 until 8).map(t => s"${hyperplaneBucketSqlAt(8 * t, 4)} AS bk$t").mkString(",\n         ")}
  FROM embeddings
), bcand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bbucketed q JOIN bbucketed c
    ON q.vec_id < 10 AND q.vec_id <> c.vec_id
   AND (${(0 until 8).map(t => s"q.bk$t = c.bk$t").mkString(" OR ")})
), bscored AS (
  SELECT cd.query_id, cd.neighbor_id,
         round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
  FROM bcand cd JOIN embeddings x ON cd.query_id = x.vec_id
                JOIN embeddings y ON cd.neighbor_id = y.vec_id
), banded AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM bscored) WHERE rank <= 5
), cents AS (
  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings
  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)
), assigned AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(${cosSql("e.embedding", "c.centroid")}, 6) DESC, c.cell_id ASC) AS crank
  FROM embeddings e, cents c
), cells AS (SELECT vec_id, embedding, cell_id FROM assigned WHERE crank = 1),
qprobes AS (
  SELECT vec_id, embedding, cell_id FROM assigned WHERE vec_id < 10 AND crank <= 2
), iscored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM qprobes q JOIN cells c
    ON q.cell_id = c.cell_id AND q.vec_id <> c.vec_id
), ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM iscored) WHERE rank <= 5
)"""

  /** Recursive-CTE replay of packChunksFfd(budget=256) over the
    * chunkDocuments(32, 24-step) chunks — per source, one item placed per
    * recursion step (seq from a total order: n_tokens DESC, doc_id,
    * chunk_idx); `loads` carries bin fill levels, first fitting bin via a
    * filtered index list, else a new bin is appended. Shared by
    * llm_packing_ffd and the llm_packing_efficiency rollup. */
  private val ffdReplaySql: String = """
WITH RECURSIVE base AS (
  SELECT d.source, c.doc_id, c.chunk_idx, c.n_tokens FROM (
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           CAST(len(words[i*24+1 : i*24+32]) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS words,
                 unnest(generate_series(0,
                   CASE WHEN len(string_split(text, ' ')) <= 32 THEN 1
                        ELSE (len(string_split(text, ' ')) - 32 + 23) // 24 + 1 END - 1)) AS i
          FROM documents)
  ) c JOIN documents d ON c.doc_id = d.doc_id
), ordered AS (
  SELECT source, doc_id, chunk_idx, n_tokens,
         CAST(row_number() OVER (PARTITION BY source
           ORDER BY n_tokens DESC, doc_id ASC, chunk_idx ASC) AS BIGINT) AS seq
  FROM base
), ffd(source, seq, doc_id, chunk_idx, n_tokens, bin_idx, loads) AS (
  SELECT source, CAST(0 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST([] AS BIGINT[])
  FROM (SELECT DISTINCT source FROM ordered)
  UNION ALL
  SELECT o.source, o.seq, o.doc_id, o.chunk_idx, o.n_tokens,
         CASE WHEN fit.fi IS NULL THEN len(f.loads) + 1 ELSE fit.fi END,
         CASE WHEN fit.fi IS NULL THEN list_append(f.loads, o.n_tokens)
              ELSE f.loads[:fit.fi-1] || [f.loads[fit.fi] + o.n_tokens] || f.loads[fit.fi+1:] END
  FROM ffd f
  JOIN ordered o ON o.source = f.source AND o.seq = f.seq + 1
  LEFT JOIN LATERAL (
    SELECT list_filter(generate_series(1, len(f.loads)),
                       x -> f.loads[x] + o.n_tokens <= 256)[1] AS fi
  ) fit ON true
)
SELECT source, doc_id, chunk_idx, n_tokens, bin_idx
FROM ffd WHERE seq > 0"""

  private val jaccardVerify = """
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
verified AS (
  SELECT i.a, i.b, i.inter, sa.sz + sb.sz - i.inter AS uni
  FROM inter i
  JOIN sizes sa ON i.a = sa.doc_id
  JOIN sizes sb ON i.b = sb.doc_id
)"""

  private val simhashVotes: String = {
    val h = "CAST(CAST(md5_number_lower(word) AS HUGEINT) % CAST(9223372036854775808 AS HUGEINT) AS BIGINT)"
    val votes = (0 until 63).map(j =>
      s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN cnt ELSE -cnt END) AS BIGINT) AS v$j").mkString(",\n    ")
    val fp = (0 until 63).map(j =>
      s"CASE WHEN v$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END").mkString(" + ")
    s"""
wc AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
), hashed AS (SELECT doc_id, $h AS h, cnt FROM wc),
voted AS (
  SELECT doc_id,
    $votes
  FROM hashed GROUP BY doc_id
), fps AS (SELECT doc_id, $fp AS simhash FROM voted)"""
  }

  /** sig + banded: the minhash band-signature index (shared by the
    * self-join pair oracles AND the incremental batch-vs-corpus one). */
  private val minhashSigBandedCtes: String = {
    val k = 16; val bands = 4; val rows = 4
    val mins = (0 until k).map(i =>
      s"min(lo + $i * hi) AS mh$i").mkString(",\n    ")
    val bandRows = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => s"CAST(mh${b * rows + r} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""
sig AS (
  SELECT doc_id,
    $mins
  FROM sh GROUP BY doc_id
), banded AS (
  $bandRows
)"""
  }

  private val minhashCtes: String = s"""$minhashSigBandedCtes, cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
), inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN sh p ON p.doc_id = c.a
  JOIN sh q ON q.doc_id = c.b AND q.lo = p.lo AND q.hi = p.hi
  GROUP BY c.a, c.b
)"""

  /** Language-ID argmax fold, mirrored exactly (earlier language wins ties). */
  private val langScoresSql: String = TextStats.langMarkers.map { case (lang, ms) =>
    val inList = ms.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), w -> w IN ($inList))) AS s_$lang"
  }.mkString(",\n    ")

  private val langFoldedSql: String = TextStats.langMarkers.tail.foldLeft(
    (s"'${TextStats.langMarkers.head._1}'", s"s_${TextStats.langMarkers.head._1}")) {
    case ((bl, bs), (lang, _)) =>
      (s"CASE WHEN s_$lang > $bs THEN '$lang' ELSE $bl END",
        s"CASE WHEN s_$lang > $bs THEN s_$lang ELSE $bs END")
  }._1

  private val langIdSql: String = s"""
WITH scored AS (
  SELECT doc_id, lang,
    $langScoresSql
  FROM documents
)
SELECT doc_id, lang, $langFoldedSql AS lang_pred FROM scored"""

  private val stopList =
    TextStats.langMarkers.flatMap(_._2).distinct.map(m => s"'$m'").mkString(", ")

  /** brute-force cosine top-5 for queries vec_id < 10 over the FULL
    * corpus — the oracle for llm_ann_topk and (because the incremental
    * fold is exact) llm_ann_incremental */
  private def annTopkSql: String = s"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5"""

  /** BM25 top-20 for the fixed query terms (k1=1.2 b=0.75) — shared by
    * llm_bm25_search and the lexical leg of llm_hybrid_rrf. One term
    * explode, one per-doc conditional aggregate, corpus stats as two
    * 1-row broadcasts, TakeOrderedAndProject top-20 (no global sort). */
  private def bm25Top20(s: SparkSession, d: String): DataFrame = {
    val dbl = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DoubleType)
    val qterms = Seq("join", "hash", "stream")
    val ws = split(col("text"), " ")
    val base = Tables.documents(s, d).select(col("doc_id"),
      org.apache.spark.sql.functions.size(ws)
        .cast(org.apache.spark.sql.types.LongType).as("dl"), ws.as("w"))
    val tfAggs = qterms.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val tfs = base.select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    val dfAggs = qterms.map(t =>
      count(when(col("term") === t, true)).as(s"df_$t"))
    val dfr = broadcast(
      base.select(col("doc_id"), explode(array_distinct(col("w"))).as("term"))
        .agg(dfAggs.head, dfAggs.tail: _*))
    val stats = broadcast(base
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"),
        (dbl(col("sum_dl")) / dbl(col("n_docs"))).as("avgdl")))
    def termScore(t: String) =
      log(((dbl(col("n_docs")) - dbl(col(s"df_$t")) + lit(0.5)) /
        (dbl(col(s"df_$t")) + lit(0.5))) + lit(1.0)) *
        ((dbl(col(s"tf_$t")) * lit(2.2)) /
          (dbl(col(s"tf_$t")) + lit(1.2) *
            (lit(0.25) + lit(0.75) * (dbl(col("dl")) / col("avgdl")))))
    tfs.crossJoin(stats).crossJoin(dfr)
      .withColumn("score",
        round(termScore("join") + termScore("hash") + termScore("stream"), 6))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
      .select(col("doc_id"), col("dl"), col("tf_join"), col("tf_hash"),
        col("tf_stream"), col("score"))
  }

  /** One BM25 term's score contribution (DuckDB replay, k1=1.2 b=0.75) —
    * textually mirrors the Spark termScore: same parenthesization, same
    * literal constants, so every double step is engine-identical. */
  private def bm25TermSql(t: String): String =
    s"ln(((CAST(n_docs AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / " +
      s"(CAST(df_$t AS DOUBLE) + 0.5)) + 1.0) * " +
      s"((CAST(tf_$t AS DOUBLE) * 2.2) / (CAST(tf_$t AS DOUBLE) + 1.2 * " +
      s"(0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))"

  /** BM25 replay CTE prefix (bw/bstats/bdf/btf) — shared by the
    * llm_bm25_search oracle and the lexical leg of llm_hybrid_rrf. */
  private val bm25Ctes: String = """bw AS (SELECT doc_id, string_split(text, ' ') AS w,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
bstats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS avgdl
           FROM bw),
bdf AS (SELECT CAST(count(CASE WHEN term = 'join' THEN 1 END) AS BIGINT) AS df_join,
               CAST(count(CASE WHEN term = 'hash' THEN 1 END) AS BIGINT) AS df_hash,
               CAST(count(CASE WHEN term = 'stream' THEN 1 END) AS BIGINT) AS df_stream
        FROM (SELECT doc_id, unnest(list_distinct(w)) AS term FROM bw)),
btf AS (SELECT doc_id, dl,
               CAST(sum(CASE WHEN term = 'join' THEN 1 ELSE 0 END) AS BIGINT) AS tf_join,
               CAST(sum(CASE WHEN term = 'hash' THEN 1 ELSE 0 END) AS BIGINT) AS tf_hash,
               CAST(sum(CASE WHEN term = 'stream' THEN 1 ELSE 0 END) AS BIGINT) AS tf_stream
        FROM (SELECT doc_id, dl, unnest(w) AS term FROM bw) GROUP BY doc_id, dl)"""

  /** The shared CTE chain replaying [[TextStats.bpeTrain]]'s merge
    * rounds: s0 = SEP-prefixed symbol strings over the word-frequency
    * table; each round k counts adjacent pairs (pK), picks the winner
    * with the identical tiebreak (wK), and applies the merge with the
    * identical boundary-safe replace (sK). */
  private def bpeCtes(rounds: Int): String = {
    val body = (1 to rounds).map { k =>
      s"""p$k AS (
  SELECT a[i] AS l, a[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT a, freq, unnest(generate_series(1, len(a) - 1)) AS i
        FROM (SELECT list_filter(string_split(s, chr(1)), x -> x <> '') AS a, freq
              FROM s${k - 1})
        WHERE len(a) >= 2)
  GROUP BY 1, 2),
w$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
s$k AS (SELECT replace(s, chr(1) || w.l || chr(1) || w.r, chr(1) || w.l || w.r) AS s, freq
        FROM s${k - 1}, w$k w)"""
    }.mkString(",\n")
    s"""WITH wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0 AND NOT contains(word, chr(1)) GROUP BY word),
s0 AS (SELECT regexp_replace(word, '(.)', chr(1) || '\\1', 'g') AS s, freq FROM wf),
$body"""
  }

  /** The merge TABLE (the union of the wK winner rows). */
  private def bpeTrainOracle(rounds: Int): String = {
    val sel = (1 to rounds).map(k =>
      s"SELECT CAST($k AS INTEGER) AS round, l AS left_sym, r AS right_sym, " +
        s"l || r AS merged, cnt AS pair_count FROM w$k").mkString("\nUNION ALL\n")
    s"${bpeCtes(rounds)}\n$sel"
  }

  /** ENCODE replay: every document's words run through the same
    * SEP-encode + in-order merge replaces (the winner CTEs cross-joined
    * in so the lambda can reference them), then per-lang token totals
    * and fertility — bit-identical to [[TextStats.bpeEncode]]. */
  private def bpeEncodeOracle(rounds: Int): String = {
    val enc = (1 to rounds).foldLeft(
      "regexp_replace(w, '(.)', chr(1) || '\\1', 'g')") { (acc, k) =>
      s"replace($acc, chr(1) || w$k.l || chr(1) || w$k.r, chr(1) || w$k.l || w$k.r)"
    }
    val winners = (1 to rounds).map(k => s"w$k").mkString(", ")
    s"""${bpeCtes(rounds)},
per_doc AS (
  SELECT lang,
         CAST(len(list_filter(string_split(text, ' '),
           w -> w <> '' AND NOT contains(w, chr(1)))) AS BIGINT)
           AS n_words,
         CAST(coalesce(list_sum(list_transform(
           list_filter(string_split(text, ' '),
             w -> w <> '' AND NOT contains(w, chr(1))),
           w -> len(string_split($enc, chr(1))) - 1)), 0) AS BIGINT) AS n_tokens
  FROM documents, $winners)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility
FROM per_doc GROUP BY lang"""
  }

  val oracle: Map[String, String] = Map(
    "llm_bm25_search" -> s"""
WITH $bm25Ctes
SELECT doc_id, dl, tf_join, tf_hash, tf_stream, score
FROM (SELECT t.doc_id, t.dl, t.tf_join, t.tf_hash, t.tf_stream,
             round(${bm25TermSql("join")} + ${bm25TermSql("hash")} + ${bm25TermSql("stream")}, 6) AS score
      FROM btf t CROSS JOIN bstats CROSS JOIN bdf)
WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT 20""",

    // BM25 replay top-20 fused with the brute-force cosine top-20 around
    // vec_id 0 via integer-scaled reciprocal ranks — no float in the
    // fusion, ties broken by doc_id on both engines
    "llm_hybrid_rrf" -> s"""
WITH $bm25Ctes,
btop AS (
  SELECT doc_id, score
  FROM (SELECT t.doc_id,
               round(${bm25TermSql("join")} + ${bm25TermSql("hash")} + ${bm25TermSql("stream")}, 6) AS score
        FROM btf t CROSS JOIN bstats CROSS JOIN bdf)
  WHERE score > 0
  ORDER BY score DESC, doc_id ASC LIMIT 20),
lex AS (SELECT doc_id,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank_lex
        FROM btop),
sem0 AS (
  SELECT c.vec_id AS doc_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id = 0 AND c.vec_id <> 0),
sem AS (SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rank_sem
        FROM sem0 QUALIFY rank_sem <= 20)
SELECT coalesce(l.doc_id, s.doc_id) AS doc_id, l.rank_lex, s.rank_sem,
       CAST(coalesce(1000000000 // (60 + l.rank_lex), 0) +
            coalesce(1000000000 // (60 + s.rank_sem), 0) AS BIGINT) AS rrf_ppb
FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
ORDER BY rrf_ppb DESC, doc_id ASC LIMIT 10""",

    "llm_exact_dup_groups" -> """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id, count(*) AS dup_count
FROM documents GROUP BY md5(text) HAVING count(*) > 1""",

    "llm_exact_dedup" -> """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)""",

    "llm_ngram_jaccard" -> s"""
WITH $shinglesCte,
hot AS (SELECT lo, hi FROM (SELECT lo, hi, count(*) AS df FROM sh GROUP BY lo, hi) WHERE df > 1000),
pruned AS (SELECT doc_id, lo, hi FROM sh WHERE NOT EXISTS
             (SELECT 1 FROM hot WHERE hot.lo = sh.lo AND hot.hi = sh.hi)),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM pruned x JOIN pruned y ON x.lo = y.lo AND x.hi = y.hi AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM pruned GROUP BY doc_id),
verified AS (
  SELECT i.a, i.b, i.inter, sa.sz + sb.sz - i.inter AS uni
  FROM inter i
  JOIN sizes sa ON i.a = sa.doc_id
  JOIN sizes sb ON i.b = sb.doc_id
)
SELECT a, b, CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
FROM verified WHERE inter * 1000000 >= uni * 600000""",

    "llm_minhash_lsh" -> s"""
WITH $shinglesCte,
$minhashCtes,
$jaccardVerify
SELECT a, b, CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
FROM verified WHERE inter * 1000000 >= uni * 500000""",

    "llm_simhash" -> s"""
WITH $simhashVotes
SELECT doc_id, simhash FROM fps""",

    "llm_simhash_pairs" -> s"""
WITH $simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 8""",

    "llm_tfidf" -> """
WITH terms AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE len(term) > 0
), tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
  FROM tf t JOIN dfreq d USING (term), n
)
SELECT doc_id, term, tf, df, tfidf, rnk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS INTEGER) AS rnk
  FROM scored)
WHERE rnk <= 3""",

    // same edge set as llm_minhash_lsh ∪ llm_simhash_pairs, then
    // transitive closure as a recursive CTE: labels spread along edges,
    // pruned to lbl < target (a label ≥ the node loses to the node's own
    // seed anyway), min per node = component id.
    "llm_dup_clusters" -> s"""
WITH RECURSIVE $shinglesCte,
$minhashCtes,
$jaccardVerify,
$simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)
),
mh_pairs AS (
  SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000),
sh_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8),
edges AS (SELECT a, b FROM mh_pairs UNION SELECT a, b FROM sh_pairs),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT c.node AS doc_id, c.cluster_id, s.cluster_size,
       c.node = c.cluster_id AS is_canonical
FROM comp c
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id) s
  USING (cluster_id)""",

    "llm_cluster_split" -> s"""
WITH RECURSIVE $shinglesCte,
$minhashCtes,
$jaccardVerify,
$simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)
),
mh_pairs AS (
  SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000),
sh_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8),
edges AS (SELECT a, b FROM mh_pairs UNION SELECT a, b FROM sh_pairs),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
g AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
SELECT doc_id, group_id,
       CASE WHEN h < 900000 THEN 'train' WHEN h < 950000 THEN 'val' ELSE 'test' END AS split
FROM (SELECT doc_id, group_id,
             CAST(CAST(md5_number_lower(CAST(group_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT)
               % 1000000 AS h
      FROM g)""",

    "llm_train_val_test" -> s"""
SELECT CASE WHEN h < 900000 THEN 'train' WHEN h < 950000 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM (
  SELECT CAST(CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT)
           % 1000000 AS h,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tok
  FROM documents)
GROUP BY 1""",

    // sqrt-temperature weights; Z summed by sorted left fold both sides
    "llm_mixture_temperature" -> """
WITH per AS (
  SELECT source,
         CAST(sum(CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT)) AS BIGINT) AS total_tok
  FROM documents GROUP BY source),
pw AS (SELECT source, total_tok, sqrt(CAST(total_tok AS DOUBLE)) AS w FROM per),
z AS (SELECT list_reduce(list_sort(list(w)), (a, x) -> a + x) AS z FROM pw)
SELECT source, total_tok, round(w / z, 6) AS weight,
       CAST(floor((w / z) * 1000000.0) AS BIGINT) AS alloc_tokens
FROM pw, z""",

    "llm_mixture_sample" -> s"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tok
  FROM documents),
rates AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS total_tok,
         least(1000000, (800 * 1000000) // CAST(sum(n_tok) AS BIGINT)) AS rate_ppm
  FROM toks GROUP BY source),
kept AS (
  SELECT t.source, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(t.n_tok) AS BIGINT) AS tokens_kept
  FROM toks t JOIN rates r USING (source)
  WHERE CAST(CAST(md5_number_lower(CAST(t.doc_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT)
          % 1000000 < r.rate_ppm
  GROUP BY t.source)
SELECT r.source, r.total_tok, CAST(r.rate_ppm AS BIGINT) AS rate_ppm,
       coalesce(k.n_kept, 0) AS n_kept, coalesce(k.tokens_kept, 0) AS tokens_kept
FROM rates r LEFT JOIN kept k USING (source)""",

    "llm_doc_stats" -> """
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_chars
FROM documents
GROUP BY source""",

    "llm_edit_verify" -> s"""
WITH $shinglesCte,
$minhashCtes,
$jaccardVerify,
pairs AS (
  SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000)
SELECT p.a, p.b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       CAST(greatest(length(da.text), length(db.text)) AS BIGINT) AS max_len,
       levenshtein(da.text, db.text) * 5 <= greatest(length(da.text), length(db.text)) AS near_identical
FROM pairs p
JOIN documents da ON da.doc_id = p.a
JOIN documents db ON db.doc_id = p.b""",

    "llm_incremental_dedup" -> """
WITH keyed AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
  FROM documents)
SELECT b.doc_id,
       b.h IN (SELECT h FROM keyed WHERE doc_id % 10 <> 0) AS is_dup
FROM keyed b WHERE b.doc_id % 10 = 0""",

    // batch (doc_id%10=0) band signatures vs corpus band index; the
    // Jaccard verify reads each side's own shingle set — identical to
    // the Spark split since every doc lives on exactly one side
    "llm_incremental_neardup" -> s"""
WITH $shinglesCte,
$minhashSigBandedCtes,
icand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh
  WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0
), iinter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM icand c
  JOIN sh p ON p.doc_id = c.a
  JOIN sh q ON q.doc_id = c.b AND q.lo = p.lo AND q.hi = p.hi
  GROUP BY c.a, c.b
), isizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
SELECT i.a, i.b,
       CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
FROM iinter i
JOIN isizes sa ON i.a = sa.doc_id
JOIN isizes sb ON i.b = sb.doc_id
WHERE i.inter * 1000000 >= (sa.sz + sb.sz - i.inter) * 500000""",

    "llm_dedup_keep_best" -> s"""
WITH RECURSIVE $shinglesCte,
$minhashCtes,
$jaccardVerify,
$simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)
),
mh_pairs AS (
  SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000),
sh_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8),
edges AS (SELECT a, b FROM mh_pairs UNION SELECT a, b FROM sh_pairs),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
meas AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_kept FROM documents),
ranked AS (
  SELECT c.node AS doc_id, c.cluster_id, m.n_chars_kept,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY m.n_chars_kept DESC, c.node ASC) AS rn
  FROM comp c JOIN meas m ON m.doc_id = c.node)
SELECT doc_id, cluster_id, n_chars_kept FROM ranked WHERE rn = 1
UNION ALL
SELECT m.doc_id, m.doc_id AS cluster_id, m.n_chars_kept
FROM meas m WHERE m.doc_id NOT IN (SELECT node FROM comp)""",

    "llm_ngram_table" -> """
SELECT bigram, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (SELECT doc_id, array_to_string(words[i:i+1], ' ') AS bigram
      FROM (SELECT doc_id, string_split(text, ' ') AS words,
                   unnest(generate_series(1, len(string_split(text, ' ')) - 1)) AS i
            FROM documents))
GROUP BY bigram
HAVING count(*) >= 5""",

    // block segmentation mirrors chunkDocuments(size=16, overlap=0);
    // keeper election and position-ordered reassembly replayed exactly
    "llm_paragraph_dedup" -> """
WITH pw AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
pb AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(words, i*16+1, i*16+16), ' ') AS blk
  FROM (SELECT doc_id, words,
               unnest(generate_series(0, greatest(CAST(ceil(len(words)/16.0) AS BIGINT), 1) - 1)) AS i
        FROM pw) t),
pk AS (SELECT h, doc_id AS kd, pos AS kp FROM (
         SELECT md5(blk) AS h, doc_id, pos,
                row_number() OVER (PARTITION BY md5(blk) ORDER BY doc_id, pos) AS rn
         FROM pb) WHERE rn = 1),
pm AS (SELECT b.doc_id, b.pos, b.blk,
              (b.doc_id = k.kd AND b.pos = k.kp) AS kept
       FROM pb b JOIN pk k ON md5(b.blk) = k.h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN kept THEN blk END, ' ' ORDER BY pos), '') AS kept_text
FROM pm GROUP BY doc_id""",

    "llm_span_dedup" -> """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
e AS (SELECT doc_id, w FROM t WHERE len(w) >= 5),
g AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i FROM e)),
shared AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
rep AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_repeated
        FROM g WHERE gram IN (SELECT gram FROM shared) GROUP BY doc_id)
SELECT e.doc_id, CAST(len(e.w) - 4 AS BIGINT) AS n_grams,
       CAST(coalesce(r.n_repeated, 0) AS BIGINT) AS n_repeated,
       CAST(coalesce(r.n_repeated, 0) AS DOUBLE) / CAST(len(e.w) - 4 AS DOUBLE) AS dup_frac
FROM e LEFT JOIN rep r ON r.doc_id = e.doc_id""",

    "llm_curation_pipeline" -> s"""
WITH RECURSIVE $shinglesCte,
$minhashCtes,
$jaccardVerify,
$simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)
),
mh_pairs AS (
  SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000),
sh_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8),
edges AS (SELECT a, b FROM mh_pairs UNION SELECT a, b FROM sh_pairs),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
noncanon AS (SELECT node AS doc_id FROM comp WHERE node <> cluster_id),
exact AS (
  SELECT min(doc_id) AS doc_id FROM (
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
    FROM documents) GROUP BY h),
afternear AS (
  SELECT doc_id FROM exact
  WHERE doc_id NOT IN (SELECT doc_id FROM noncanon)),
quality AS (
  SELECT doc_id FROM (
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      CAST(length(text) AS BIGINT) AS n_chars_measured,
      CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS stop_hits,
      CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars
    FROM documents)
  WHERE n_words >= 5 AND n_words <= 10000 AND stop_hits * 100 >= n_words
    AND alpha_chars * 10 >= n_chars_measured * 6),
kept AS (
  SELECT d.doc_id, d.text FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM afternear)
    AND d.doc_id IN (SELECT doc_id FROM quality))
SELECT (SELECT count(*) FROM documents) AS n_raw,
       (SELECT count(*) FROM exact) AS n_exact_kept,
       (SELECT count(*) FROM afternear) AS n_neardup_kept,
       count(*) AS n_quality_kept,
       CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT) AS tokens_kept
FROM kept""",

    "llm_embedding_neardup" -> s"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         ${(0 until 8).map(t => s"${hyperplaneBucketSqlAt(8 * t, 4)} AS bk$t").mkString(",\n         ")}
  FROM embeddings
), cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM bucketed x JOIN bucketed y
    ON x.vec_id < y.vec_id
   AND (${(0 until 8).map(t => s"x.bk$t = y.bk$t").mkString(" OR ")})
), pairs AS (
  SELECT c.a, c.b, round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
  FROM cand c JOIN embeddings x ON c.a = x.vec_id JOIN embeddings y ON c.b = y.vec_id
)
SELECT a, b, cosine FROM pairs WHERE cosine >= 0.5""",

    // first-√n-vectors centroids + argmax-cosine cell assignment (the
    // llm_ann_ivf replay), within-cell pairs at τ, min-label reachability
    // closure (the llm_dup_clusters replay), singletons self-clustered
    "llm_semdedup" -> s"""
WITH RECURSIVE cents AS (
  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings
  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)
), assigned AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(${cosSql("e.embedding", "c.centroid")}, 6) DESC, c.cell_id ASC) AS crank
  FROM embeddings e, cents c
), cells AS MATERIALIZED (
  SELECT vec_id, embedding, cell_id FROM assigned WHERE crank = 1
), pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM cells x JOIN cells y ON x.cell_id = y.cell_id AND x.vec_id < y.vec_id
  WHERE round(${cosSql("x.embedding", "y.embedding")}, 6) >= 0.30
), sym AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
clus AS MATERIALIZED (
  SELECT c.vec_id, c.cell_id, coalesce(k.cluster_id, c.vec_id) AS cluster_id
  FROM cells c LEFT JOIN comp k ON k.node = c.vec_id)
SELECT u.vec_id, u.cell_id, u.cluster_id,
       CAST(s.n AS BIGINT) AS cluster_size,
       u.vec_id = u.cluster_id AS is_kept
FROM clus u
JOIN (SELECT cluster_id, count(*) AS n FROM clus GROUP BY cluster_id) s
  USING (cluster_id)""",

    "llm_ann_topk" -> annTopkSql,

    // full recompute over the whole corpus — green proves the
    // incremental fold (old top-k + fresh batch scores) is EXACT
    "llm_ann_incremental" -> annTopkSql,

    "llm_ann_banded" -> s"""
WITH bucketed AS (
  SELECT vec_id, embedding,
         ${(0 until 8).map(t => s"${hyperplaneBucketSqlAt(8 * t, 4)} AS bk$t").mkString(",\n         ")}
  FROM embeddings
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bucketed q JOIN bucketed c
    ON q.vec_id < 10 AND q.vec_id <> c.vec_id
   AND (${(0 until 8).map(t => s"q.bk$t = c.bk$t").mkString(" OR ")})
), scored AS (
  SELECT cd.query_id, cd.neighbor_id,
         round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
  FROM cand cd JOIN embeddings x ON cd.query_id = x.vec_id
               JOIN embeddings y ON cd.neighbor_id = y.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",

    // banded-bucket replay + integer-code scoring; rank on the ROUNDED
    // quantized cosine, float cosine re-derived per survivor
    "llm_ann_int8" -> s"""
WITH bucketed AS (
  SELECT vec_id,
         ${(0 until 8).map(t => s"${hyperplaneBucketSqlAt(8 * t, 4)} AS bk$t").mkString(",\n         ")}
  FROM embeddings
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM bucketed q JOIN bucketed c
    ON q.vec_id < 10 AND q.vec_id <> c.vec_id
   AND (${(0 until 8).map(t => s"q.bk$t = c.bk$t").mkString(" OR ")})
), qd AS (
  SELECT vec_id, g.i AS pos, CAST(embedding[g.i + 1] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS i) g
), qs AS (SELECT pos, max(abs(x)) AS s FROM qd GROUP BY pos),
qc AS (
  SELECT vec_id, pos,
         CASE WHEN s > 0 THEN CAST(round(x / s * 127) AS BIGINT) ELSE 0 END AS code
  FROM qd JOIN qs USING (pos)
), sc AS (
  SELECT c.query_id, c.neighbor_id,
         CAST(sum(qa.code * qb.code) AS BIGINT) AS dot,
         CAST(sum(qa.code * qa.code) AS BIGINT) AS na,
         CAST(sum(qb.code * qb.code) AS BIGINT) AS nb
  FROM cand c
  JOIN qc qa ON qa.vec_id = c.query_id
  JOIN qc qb ON qb.vec_id = c.neighbor_id AND qb.pos = qa.pos
  GROUP BY c.query_id, c.neighbor_id
), r AS (
  SELECT query_id, neighbor_id,
         round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) AS cos_int8,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY round(CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) DESC,
                    neighbor_id ASC) AS INTEGER) AS rank
  FROM sc WHERE na > 0 AND nb > 0
)
SELECT r.query_id, r.neighbor_id, r.cos_int8,
       round(${cosSql("x.embedding", "y.embedding")}, 6) AS cos_float, r.rank
FROM r JOIN embeddings x ON r.query_id = x.vec_id
       JOIN embeddings y ON r.neighbor_id = y.vec_id
WHERE r.rank <= 5""",

    // full IVFADC replay: IVF cell assignment (shared with llm_ann_ivf),
    // per-subspace argmin codeword election, scaled-BIGINT ADC lookup
    // table, integer candidate scoring, top-20 shortlist, exact re-rank
    "llm_ann_pq" -> s"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings
  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)
), assigned AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(${cosSql("e.embedding", "c.centroid")}, 6) DESC, c.cell_id ASC) AS crank
  FROM embeddings e, cents c
), cells AS (SELECT vec_id, cell_id FROM assigned WHERE crank = 1),
qprobes AS (
  SELECT vec_id AS query_id, cell_id FROM assigned WHERE vec_id < 10 AND crank <= 2
),
cb AS (
  SELECT s.s AS sub, e.vec_id AS code,
         e.embedding[s.s*8+1 : s.s*8+8] AS cw
  FROM embeddings e, range(8) s(s) WHERE e.vec_id < 16
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
      row_number() OVER (PARTITION BY e.vec_id, c.sub
        ORDER BY round((SELECT sum((CAST(z.a AS DOUBLE) - CAST(z.b AS DOUBLE)) * (CAST(z.a AS DOUBLE) - CAST(z.b AS DOUBLE)))
                        FROM (SELECT unnest(e.embedding[c.sub*8+1 : c.sub*8+8]) AS a,
                                     unnest(c.cw) AS b) z), 6) ASC, c.code ASC) AS rn
    FROM embeddings e CROSS JOIN cb c) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.sub, c.code,
    CAST(round((SELECT sum(CAST(z.a AS DOUBLE) * CAST(z.b AS DOUBLE))
                FROM (SELECT unnest(q.embedding[c.sub*8+1 : c.sub*8+8]) AS a,
                             unnest(c.cw) AS b) z) * 1e6) AS BIGINT) AS term
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q CROSS JOIN cb c
),
approx AS (
  SELECT p.query_id, en.vec_id AS neighbor_id, CAST(sum(l.term) AS BIGINT) AS approx_dot
  FROM qprobes p
  JOIN cells cl ON cl.cell_id = p.cell_id AND cl.vec_id <> p.query_id
  JOIN enc en ON en.vec_id = cl.vec_id
  JOIN lut l ON l.query_id = p.query_id AND l.sub = en.sub AND l.code = en.code
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id, approx_dot,
    row_number() OVER (PARTITION BY query_id
      ORDER BY approx_dot DESC, neighbor_id ASC) AS arn
  FROM approx
),
rescored AS (
  SELECT s.query_id, s.neighbor_id, s.approx_dot,
    round(${cosSql("q.embedding", "v.embedding")}, 6) AS cosine
  FROM short s
  JOIN embeddings q ON q.vec_id = s.query_id
  JOIN embeddings v ON v.vec_id = s.neighbor_id
  WHERE s.arn <= 20
)
SELECT query_id, neighbor_id, approx_dot, cosine,
  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM rescored QUALIFY rank <= 5""",

    // banded-bucket replay + label-inequality prune + windowed top-5
    "llm_hard_negatives" -> s"""
WITH bucketed AS (
  SELECT vec_id, embedding, label,
         ${(0 until 8).map(t => s"${hyperplaneBucketSqlAt(8 * t, 4)} AS bk$t").mkString(",\n         ")}
  FROM embeddings
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, q.label AS anchor_label,
                  c.vec_id AS neighbor_id, c.label AS neighbor_label
  FROM bucketed q JOIN bucketed c
    ON q.vec_id < 50 AND q.vec_id <> c.vec_id AND q.label <> c.label
   AND (${(0 until 8).map(t => s"q.bk$t = c.bk$t").mkString(" OR ")})
), scored AS (
  SELECT cd.query_id, cd.anchor_label, cd.neighbor_id, cd.neighbor_label,
         round(${cosSql("x.embedding", "y.embedding")}, 6) AS cosine
  FROM cand cd JOIN embeddings x ON cd.query_id = x.vec_id
               JOIN embeddings y ON cd.neighbor_id = y.vec_id
)
SELECT query_id, anchor_label, neighbor_id, neighbor_label, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",

    "llm_ann_recall" -> s"""
WITH $annRecallCtesSql
SELECT t.query_id, count(*) AS n_true,
       count(l.neighbor_id) AS hits_lsh,
       CAST(count(l.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_lsh,
       count(b.neighbor_id) AS hits_banded,
       CAST(count(b.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_banded,
       count(i.neighbor_id) AS hits_ivf,
       CAST(count(i.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_ivf
FROM truth t
LEFT JOIN lsh l ON t.query_id = l.query_id AND t.neighbor_id = l.neighbor_id
LEFT JOIN banded b ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
LEFT JOIN ivf i ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id
GROUP BY t.query_id""",

    // the floor booleans are LITERAL TRUE on the oracle side — the gate
    // asserts the Spark-computed recall clears the floor, it does not
    // recompute the comparison (recomputing would make the gate vacuous)
    "llm_ann_recall_floor" -> s"""
WITH $annRecallCtesSql
SELECT count(*) AS n_true,
       CAST(count(l.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_lsh,
       CAST(count(b.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_banded,
       CAST(count(i.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_ivf,
       TRUE AS lsh_floor_ok, TRUE AS banded_floor_ok, TRUE AS ivf_floor_ok
FROM truth t
LEFT JOIN lsh l ON t.query_id = l.query_id AND t.neighbor_id = l.neighbor_id
LEFT JOIN banded b ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
LEFT JOIN ivf i ON t.query_id = i.query_id AND t.neighbor_id = i.neighbor_id""",

    "llm_ann_lsh" -> s"""
WITH bucketed AS (
  SELECT vec_id, embedding, $hyperplaneBucketSql AS bucket FROM embeddings
), probes AS (
  SELECT vec_id, embedding,
         unnest([$lshProbeListSql]) AS bucket
  FROM bucketed WHERE vec_id < 10
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM probes q JOIN bucketed c
    ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",

    "llm_ann_ivf" -> s"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings
  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM embeddings)
), assigned AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         row_number() OVER (PARTITION BY e.vec_id
           ORDER BY round(${cosSql("e.embedding", "c.centroid")}, 6) DESC, c.cell_id ASC) AS crank
  FROM embeddings e, cents c
), cells AS (SELECT vec_id, embedding, cell_id FROM assigned WHERE crank = 1),
qprobes AS (
  SELECT vec_id, embedding, cell_id FROM assigned WHERE vec_id < 10 AND crank <= 2
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(${cosSql("q.embedding", "c.embedding")}, 6) AS cosine
  FROM qprobes q JOIN cells c
    ON q.cell_id = c.cell_id AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5""",

    "llm_decontaminate" -> s"""
WITH $shinglesCte,
bench AS (SELECT DISTINCT lo, hi FROM sh WHERE doc_id % 97 = 0),
corp AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
SELECT c.doc_id, count(*) AS bench_hits
FROM corp c JOIN bench b ON c.lo = b.lo AND c.hi = b.hi
GROUP BY c.doc_id
HAVING count(*) >= 3""",

    "llm_contamination_report" -> s"""
WITH $shinglesCte,
bench AS (SELECT DISTINCT lo, hi FROM sh WHERE doc_id % 97 = 0),
corp AS (SELECT * FROM sh WHERE doc_id % 97 <> 0),
flagged AS (
  SELECT c.doc_id FROM corp c JOIN bench b ON c.lo = b.lo AND c.hi = b.hi
  GROUP BY c.doc_id HAVING count(*) >= 3)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS contamination_rate
FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
WHERE d.doc_id % 97 <> 0
GROUP BY d.source""",

    "llm_sample" -> s"""
SELECT doc_id, lang, source FROM documents
WHERE CAST(CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT)
        % 1000000 < 250000""",

    "llm_sample_stratified" -> s"""
SELECT doc_id, source FROM documents
WHERE CAST(CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT)
        % 1000000 <
      CASE source WHEN 'src0' THEN 900000 WHEN 'src1' THEN 0 ELSE 300000 END""",

    "llm_sample_per_source" -> """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
           ORDER BY md5(concat('pg-', CAST(doc_id AS VARCHAR))) ASC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 5""",

    "llm_normalize" -> """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) <> text AS is_changed
FROM documents""",

    "llm_lang_id" -> langIdSql,

    "llm_quality" -> s"""
WITH m AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
    CAST(length(text) AS BIGINT) AS n_chars_measured,
    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS BIGINT) AS stop_hits,
    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS alpha_chars
  FROM documents
)
SELECT doc_id, n_words, n_chars_measured,
  CAST(n_chars_measured - (n_words - 1) AS DOUBLE) / CAST(n_words AS DOUBLE) AS avg_word_len,
  CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE) AS stopword_ratio,
  CAST(alpha_chars AS DOUBLE) / CAST(n_chars_measured AS DOUBLE) AS alpha_ratio,
  (n_words >= 5 AND n_words <= 10000 AND stop_hits * 100 >= n_words
   AND alpha_chars * 10 >= n_chars_measured * 6) AS quality_keep
FROM m""",

    // Hamilton allocation: integer base + remainder-ranked top-up
    "llm_exact_allocation" -> """
WITH per AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
             FROM documents GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
b AS (SELECT source, n_tokens,
             CAST(1000000 * n_tokens // t AS BIGINT) AS base,
             CAST((1000000 * n_tokens) % t AS BIGINT) AS rem
      FROM per, tot),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS INTEGER) AS rr FROM b),
l AS (SELECT CAST(1000000 - sum(base) AS BIGINT) AS leftover FROM b)
SELECT source, n_tokens, base, rr,
       CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r, l""",

    // alphabet-sized char histogram; scaled-int -p·ln p terms
    "llm_char_entropy" -> """
WITH cc AS (
  SELECT source, ch, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, '')) AS ch FROM documents)
  WHERE len(ch) > 0 GROUP BY source, ch),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_distinct_chars
        FROM cc GROUP BY source),
terms AS (
  SELECT cc.source, t.t, t.n_distinct_chars,
         CAST(round(-(CAST(cc.c AS DOUBLE) / CAST(t.t AS DOUBLE))
                    * ln(CAST(cc.c AS DOUBLE) / CAST(t.t AS DOUBLE)) * 1e9) AS BIGINT) AS term_e9
  FROM cc JOIN tot t ON t.source = cc.source)
SELECT source, min(t) AS n_chars, min(n_distinct_chars) AS n_distinct_chars,
       CAST(sum(term_e9) AS BIGINT) AS entropy_e9,
       CAST(sum(term_e9) AS DOUBLE) / 1e9 AS entropy
FROM terms GROUP BY source""",

    // top-1000 vocab by (count desc, word asc); left join for OOV marks
    "llm_oov_rate" -> """
WITH w AS (
  SELECT source, word
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0),
vocab AS (
  SELECT word FROM (
    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word ASC) AS rn
    FROM w GROUP BY word) WHERE rn <= 1000)
SELECT w.source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS oov_ppm
FROM w LEFT JOIN vocab v ON v.word = w.word
GROUP BY w.source""",

    // the llm_quality + llm_lang_id expressions composed per source
    "llm_dataset_card" -> s"""
WITH s1 AS (
  SELECT doc_id, source, text,
    $langScoresSql
  FROM documents),
base AS MATERIALIZED (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
    md5(text) AS h,
    $langFoldedSql AS lang_pred,
    (len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 10000
     AND len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) * 100
         >= len(string_split(text, ' '))
     AND length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 10
         >= length(text) * 6) AS quality_keep
  FROM s1),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_ws_tokens) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
         CAST(sum(CASE WHEN quality_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_keep
  FROM base GROUP BY source),
lt AS (
  SELECT source, lang_pred AS top_lang, c AS top_lang_docs FROM (
    SELECT source, lang_pred, CAST(count(*) AS BIGINT) AS c,
           row_number() OVER (PARTITION BY source
             ORDER BY count(*) DESC, lang_pred ASC) AS rn
    FROM base GROUP BY source, lang_pred) WHERE rn = 1)
SELECT p.source, p.n_docs, p.n_tokens,
       p.n_docs - p.n_distinct AS n_exact_dups,
       p.n_quality_keep, l.top_lang, l.top_lang_docs,
       CAST(l.top_lang_docs * 1000000 // p.n_docs AS BIGINT) AS top_lang_ppm
FROM per p JOIN lt l ON l.source = p.source""",

    // word-frequency table first, char pairs over the vocabulary only;
    // the trainer replays 6 merge rounds as unrolled CTEs (same SEP
    // encoding, same count-desc/pair-asc tiebreak, same left-to-right
    // replace) — generated by bpeTrainOracle below
    "llm_bpe_train" -> bpeTrainOracle(6),

    // driver-loop trainer: same merge table, same oracle replay
    "llm_bpe_train_fast" -> bpeTrainOracle(6),

    "llm_bpe_encode" -> bpeEncodeOracle(6),

    "llm_bpe_pairs" -> """
WITH wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE len(word) > 0 GROUP BY word),
pairs AS (
  SELECT substr(word, i, 1) AS left_sym, substr(word, i + 1, 1) AS right_sym, freq
  FROM (SELECT word, freq, unnest(generate_series(1, length(word) - 1)) AS i
        FROM wf WHERE length(word) >= 2))
SELECT left_sym, right_sym, left_sym || right_sym AS merged,
       CAST(sum(freq) AS BIGINT) AS pair_count
FROM pairs GROUP BY 1, 2, 3 HAVING sum(freq) >= 50""",

    // ln(u)/w exponential keys with the md5-fold uniform; windowed top-100
    "llm_weighted_sample" -> s"""
WITH w AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         ln(CAST(CAST(CAST(md5_number_lower(concat('ws-', CAST(doc_id AS VARCHAR))) AS HUGEINT)
                      % ${1L << 58} AS BIGINT) + 1 AS DOUBLE) / ${(1L << 58).toDouble})
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS es_key
  FROM documents)
SELECT doc_id, n_tokens, round(es_key, 6) AS es_key FROM (
  SELECT doc_id, n_tokens, es_key,
         row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS rn
  FROM w) WHERE rn <= 100""",

    // lp9 = round(ln(c/T)·1e9) per distinct word, BIGINT-summed per doc
    // integer rule comparisons; one rounded mean double
    "llm_quality_gopher" -> """
WITH f AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) AS BIGINT) AS n_words,
         CAST(len(replace(text, ' ', '')) AS BIGINT) AS sum_len,
         CAST(len(list_distinct(list_filter(string_split(text, ' '), w -> len(w) > 0))) AS BIGINT) AS n_distinct,
         CAST(len(list_filter(string_split(text, ' '), w -> w = 'a' OR w = 'the')) AS BIGINT) AS n_stop
  FROM documents)
SELECT doc_id, n_words, sum_len, n_distinct, n_stop,
       round(CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
       n_words >= 15 AND n_words <= 90 AS pass_len,
       sum_len * 2 >= n_words * 5 AND sum_len <= n_words * 8 AS pass_word_len,
       n_stop >= 1 AS pass_stop,
       n_distinct * 10 >= n_words * 3 AS pass_distinct,
       (n_words >= 15 AND n_words <= 90)
         AND (sum_len * 2 >= n_words * 5 AND sum_len <= n_words * 8)
         AND n_stop >= 1 AND n_distinct * 10 >= n_words * 3 AS keep
FROM f""",

    // integer per-lang sums; ratios rounded once
    "llm_fertility" -> """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(text)) AS BIGINT) AS sum_chars,
       CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS sum_bpe,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_ws,
       round(CAST(sum(len(text)) AS DOUBLE)
             / CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS DOUBLE), 6) AS chars_per_token,
       round(CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS DOUBLE)
             / CAST(sum(len(string_split(text, ' '))) AS DOUBLE), 6) AS tokens_per_word
FROM documents GROUP BY lang""",

    // minhash-verified pairs rolled up by canonical source pair
    "llm_source_dedup_matrix" -> s"""
WITH $shinglesCte,
$minhashCtes,
$jaccardVerify,
mh AS (SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000)
SELECT least(sa.source, sb.source) AS source_x,
       greatest(sa.source, sb.source) AS source_y,
       CAST(count(*) AS BIGINT) AS n_pairs,
       least(sa.source, sb.source) <> greatest(sa.source, sb.source) AS cross_source
FROM mh
JOIN documents sa ON sa.doc_id = mh.a
JOIN documents sb ON sb.doc_id = mh.b
GROUP BY 1, 2""",

    // band candidates + exact intersection; truncating-ppm containments
    "llm_containment" -> s"""
WITH $shinglesCte,
$minhashCtes,
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
SELECT i.a, i.b, CAST(i.inter AS BIGINT) AS inter,
       CAST(sa.sz AS BIGINT) AS sz_a, CAST(sb.sz AS BIGINT) AS sz_b,
       CAST(i.inter * 1000000 // sa.sz AS BIGINT) AS cont_ab_ppm,
       CAST(i.inter * 1000000 // sb.sz AS BIGINT) AS cont_ba_ppm
FROM inter i
JOIN sizes sa ON i.a = sa.doc_id
JOIN sizes sb ON i.b = sb.doc_id
WHERE CAST(i.inter * 1000000 // sa.sz AS BIGINT) >= 700000
   OR CAST(i.inter * 1000000 // sb.sz AS BIGINT) >= 700000""",

    // same component replay as llm_cluster_split; both gates recomputed
    "llm_cross_split_leakage" -> s"""
WITH RECURSIVE $shinglesCte,
$minhashCtes,
$jaccardVerify,
$simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)
),
mh_pairs AS (
  SELECT a, b FROM verified WHERE inter * 1000000 >= uni * 500000),
sh_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8),
edges AS (SELECT DISTINCT a, b FROM
  (SELECT a, b FROM mh_pairs UNION ALL SELECT a, b FROM sh_pairs)),
sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node WHERE r.lbl < s.b
),
comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
g AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_id
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
sp AS (SELECT doc_id,
         CASE WHEN hd < 900000 THEN 'train' WHEN hd < 950000 THEN 'val' ELSE 'test' END AS doc_split,
         CASE WHEN hg < 900000 THEN 'train' WHEN hg < 950000 THEN 'val' ELSE 'test' END AS cluster_split
       FROM (SELECT doc_id,
               CAST(CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT) % 1000000 AS hd,
               CAST(CAST(md5_number_lower(CAST(group_id AS VARCHAR)) AS HUGEINT) % ${1L << 58} AS BIGINT) % 1000000 AS hg
             FROM g)),
pr AS (SELECT sa.doc_split AS dsa, sb.doc_split AS dsb,
              sa.cluster_split AS csa, sb.cluster_split AS csb
       FROM edges e JOIN sp sa ON sa.doc_id = e.a JOIN sp sb ON sb.doc_id = e.b)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN dsa <> dsb THEN 1 ELSE 0 END) AS BIGINT) AS leak_doc,
       CAST(sum(CASE WHEN dsa <> dsb THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS leak_doc_ppm,
       CAST(sum(CASE WHEN csa <> csb THEN 1 ELSE 0 END) AS BIGINT) AS leak_cluster,
       sum(CASE WHEN csa <> csb THEN 1 ELSE 0 END) = 0 AS cluster_leak_free
FROM pr""",

    // first-occurrence by min doc_id; positional counts; integer ppm
    "llm_ngram_novelty" -> """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
bgp AS (SELECT doc_id, words[i] AS w1, words[i+1] AS w2
        FROM (SELECT doc_id, words,
                     unnest(generate_series(1, len(words) - 1)) AS i FROM w)
        WHERE len(words[i]) > 0 AND len(words[i+1]) > 0),
bf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
       FROM bgp GROUP BY 1, 2, 3),
fo AS (SELECT w1, w2, CAST(min(doc_id) AS BIGINT) AS first_doc FROM bf GROUP BY 1, 2)
SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN fo.first_doc = f.doc_id THEN f.cnt ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(sum(CASE WHEN fo.first_doc = f.doc_id THEN f.cnt ELSE 0 END) * 1000000
            // sum(f.cnt) AS BIGINT) AS novelty_ppm
FROM bf f JOIN fo ON fo.w1 = f.w1 AND fo.w2 = f.w2
GROUP BY f.doc_id""",

    // truth = exact-verified ngram pairs; candidates = band/fingerprint
    // collision sets (a truth pair always passes the 0.5 verify, so
    // membership == banding hit)
    "llm_dedup_recall" -> s"""
WITH $shinglesCte,
hot AS (SELECT lo, hi FROM (SELECT lo, hi, count(*) AS df FROM sh GROUP BY lo, hi) WHERE df > 1000),
pruned AS (SELECT doc_id, lo, hi FROM sh WHERE NOT EXISTS
             (SELECT 1 FROM hot WHERE hot.lo = sh.lo AND hot.hi = sh.hi)),
t_inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS inter
  FROM pruned x JOIN pruned y ON x.lo = y.lo AND x.hi = y.hi AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id),
t_sizes AS (SELECT doc_id, count(*) AS sz FROM pruned GROUP BY doc_id),
truth AS (
  SELECT i.a, i.b
  FROM t_inter i JOIN t_sizes sa ON i.a = sa.doc_id JOIN t_sizes sb ON i.b = sb.doc_id
  WHERE i.inter * 1000000 >= (sa.sz + sb.sz - i.inter) * 600000),
$minhashSigBandedCtes,
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
$simhashVotes,
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 7)) & 127 AS key
  FROM fps, (SELECT unnest(generate_series(0, 8)) AS c)),
spairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM chunks x JOIN chunks y ON x.chunk = y.chunk AND x.key = y.key AND x.doc_id < y.doc_id
  WHERE bit_count(xor(x.simhash, y.simhash)) <= 8)
SELECT CAST(count(*) AS BIGINT) AS n_true,
       CAST(count(c.a) AS BIGINT) AS hits_minhash,
       CAST(count(c.a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_minhash,
       CAST(count(sp.a) AS BIGINT) AS hits_simhash,
       CAST(count(sp.a) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall_simhash
FROM truth t
LEFT JOIN cand c ON c.a = t.a AND c.b = t.b
LEFT JOIN spairs sp ON sp.a = t.a AND sp.b = t.b""",

    // quantized per-dim integer sums; sa·nb − sb·na identity; e12 terms
    "llm_centroid_drift" -> """
WITH x AS (
  SELECT label, in_a, dim, CAST(round(CAST(v AS DOUBLE) * 1e6) AS BIGINT) AS q
  FROM (SELECT label, vec_id % 2 = 0 AS in_a,
               unnest(generate_series(1, len(embedding))) AS dim,
               unnest(embedding) AS v
        FROM embeddings)),
bd AS (SELECT label, dim,
         CAST(sum(CASE WHEN in_a THEN q ELSE 0 END) AS BIGINT) AS sa,
         CAST(sum(CASE WHEN NOT in_a THEN q ELSE 0 END) AS BIGINT) AS sb,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
       FROM x GROUP BY 1, 2),
t AS (SELECT label, na, nb,
        CAST(round((CAST(sa * nb - sb * na AS DOUBLE) / CAST(na * nb AS DOUBLE) / 1e6)
                   * (CAST(sa * nb - sb * na AS DOUBLE) / CAST(na * nb AS DOUBLE) / 1e6) * 1e12) AS BIGINT) AS term_e12
      FROM bd)
SELECT label, CAST(min(na) AS BIGINT) AS n_a, CAST(min(nb) AS BIGINT) AS n_b,
       CAST(sum(term_e12) AS BIGINT) AS sum_sq_e12,
       round(sqrt(CAST(sum(term_e12) AS DOUBLE) / 1e12), 6) AS drift_l2
FROM t GROUP BY label""",

    // add-one smoothed bigram model; scaled-int lp9, integer doc sums
    "llm_bigram_surprisal" -> """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
bgp AS (SELECT doc_id, words[i] AS w1, words[i+1] AS w2
        FROM (SELECT doc_id, words,
                     unnest(generate_series(1, len(words) - 1)) AS i FROM w)
        WHERE len(words[i]) > 0 AND len(words[i+1]) > 0),
bf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS cnt
       FROM bgp GROUP BY 1, 2, 3),
pair AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS c12 FROM bf GROUP BY 1, 2),
uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE len(word) > 0 GROUP BY 1),
v AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
sc AS (SELECT p.w1, p.w2,
              CAST(round(ln((CAST(c12 AS DOUBLE) + 1.0)
                            / (CAST(u.c1 AS DOUBLE) + CAST(v.v AS DOUBLE))) * 1e9) AS BIGINT) AS lp9
       FROM pair p JOIN uni u ON u.word = p.w1, v)
SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_bigrams,
       CAST(sum(f.cnt * s.lp9) AS BIGINT) AS sum_lp9,
       -(CAST(sum(f.cnt * s.lp9) AS DOUBLE)) / (1e9 * CAST(sum(f.cnt) AS DOUBLE)) AS avg_neg_logprob
FROM bf f JOIN sc s ON s.w1 = f.w1 AND s.w2 = f.w2
GROUP BY f.doc_id""",

    // target-vs-raw add-one smoothed log likelihood ratio per word
    "llm_dsir_weights" -> """
WITH wf AS (SELECT doc_id, is_target, word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id, lang = 'en' AS is_target,
                         unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE len(word) > 0 GROUP BY 1, 2, 3),
bw AS (SELECT word,
              CAST(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS BIGINT) AS ct,
              CAST(sum(cnt) AS BIGINT) AS cr
       FROM wf GROUP BY word),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t, CAST(sum(cr) AS BIGINT) AS r,
               CAST(count(*) AS BIGINT) AS v FROM bw),
sc AS (SELECT word,
              CAST(round((ln((CAST(ct AS DOUBLE) + 1.0) / (CAST(t AS DOUBLE) + CAST(v AS DOUBLE)))
                          - ln((CAST(cr AS DOUBLE) + 1.0) / (CAST(r AS DOUBLE) + CAST(v AS DOUBLE)))) * 1e9) AS BIGINT) AS llr9
       FROM bw, tot)
SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_tokens,
       CAST(sum(f.cnt * s.llr9) AS BIGINT) AS sum_llr9,
       CAST(sum(f.cnt * s.llr9) AS DOUBLE) / (1e9 * CAST(sum(f.cnt) AS DOUBLE)) AS avg_log_ratio,
       CAST(sum(f.cnt * s.llr9) AS BIGINT) > 0 AS target_like
FROM wf f JOIN sc s ON s.word = f.word
GROUP BY f.doc_id""",

    // same scaled-integer replay as dsir: per-word lodds9 rounded once,
    // integer per-doc sums, one boundary division
    "llm_nb_quality" -> """
WITH wf AS (SELECT doc_id, is_pos, word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id,
                         source IN ('src0','src1','src2','src3','src4') AS is_pos,
                         unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE len(word) > 0 GROUP BY 1, 2, 3),
bw AS (SELECT word,
              CAST(sum(CASE WHEN is_pos THEN cnt ELSE 0 END) AS BIGINT) AS cp,
              CAST(sum(CASE WHEN NOT is_pos THEN cnt ELSE 0 END) AS BIGINT) AS cn
       FROM wf GROUP BY word),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS v FROM bw),
sc AS (SELECT word,
              CAST(round((ln((CAST(cp AS DOUBLE) + 1.0) / (CAST(np AS DOUBLE) + CAST(v AS DOUBLE)))
                          - ln((CAST(cn AS DOUBLE) + 1.0) / (CAST(nn AS DOUBLE) + CAST(v AS DOUBLE)))) * 1e9) AS BIGINT) AS lodds9
       FROM bw, tot),
pr AS (SELECT CAST(round(ln((CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
                          / (CAST(count(*) AS DOUBLE) - CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)) * 1e9) AS BIGINT) AS prior9
       FROM documents)
SELECT f.doc_id, bool_or(f.is_pos) AS is_pos,
       CAST(sum(f.cnt) AS BIGINT) AS n_tokens,
       CAST(sum(f.cnt * s.lodds9) + any_value(pr.prior9) AS BIGINT) AS total9,
       CAST(CAST(sum(f.cnt * s.lodds9) + any_value(pr.prior9) AS DOUBLE) / 1e9 AS DOUBLE) AS log_odds,
       (sum(f.cnt * s.lodds9) + any_value(pr.prior9)) > 0 AS predicted_pos
FROM wf f JOIN sc s ON s.word = f.word, pr
GROUP BY f.doc_id""",

    // same NB replica, bucketed into 5 fixed scaled-int log-odds bands;
    // empirical positive rate as integer ppm (floor division, all
    // operands positive — both engines agree exactly)
    "llm_nb_calibration" -> """
WITH wf AS (SELECT doc_id, is_pos, word, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id,
                         source IN ('src0','src1','src2','src3','src4') AS is_pos,
                         unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE len(word) > 0 GROUP BY 1, 2, 3),
bw AS (SELECT word,
              CAST(sum(CASE WHEN is_pos THEN cnt ELSE 0 END) AS BIGINT) AS cp,
              CAST(sum(CASE WHEN NOT is_pos THEN cnt ELSE 0 END) AS BIGINT) AS cn
       FROM wf GROUP BY word),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn,
               CAST(count(*) AS BIGINT) AS v FROM bw),
sc AS (SELECT word,
              CAST(round((ln((CAST(cp AS DOUBLE) + 1.0) / (CAST(np AS DOUBLE) + CAST(v AS DOUBLE)))
                          - ln((CAST(cn AS DOUBLE) + 1.0) / (CAST(nn AS DOUBLE) + CAST(v AS DOUBLE)))) * 1e9) AS BIGINT) AS lodds9
       FROM bw, tot),
pr AS (SELECT CAST(round(ln((CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
                          / (CAST(count(*) AS DOUBLE) - CAST(sum(CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)) * 1e9) AS BIGINT) AS prior9
       FROM documents),
scored AS (
  SELECT f.doc_id, bool_or(f.is_pos) AS is_pos,
         CAST(sum(f.cnt) AS BIGINT) AS n_tokens,
         CAST(sum(f.cnt * s.lodds9) + any_value(pr.prior9) AS BIGINT) AS total9
  FROM wf f JOIN sc s ON s.word = f.word, pr
  GROUP BY f.doc_id)
SELECT CAST(CASE WHEN CAST(total9 AS DOUBLE) / CAST(n_tokens AS DOUBLE) < -2e7 THEN -2
                 WHEN CAST(total9 AS DOUBLE) / CAST(n_tokens AS DOUBLE) < -0.75e7 THEN -1
                 WHEN CAST(total9 AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 0.75e7 THEN 0
                 WHEN CAST(total9 AS DOUBLE) / CAST(n_tokens AS DOUBLE) <= 2e7 THEN 1
                 ELSE 2 END AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS pos_ppm
FROM scored GROUP BY 1""",

    // exact counts; one pmi double formula, text-mirrored; top-50
    "llm_pmi_collocations" -> """
WITH w AS (SELECT string_split(text, ' ') AS words FROM documents),
bg AS (SELECT words[i] AS w1, words[i+1] AS w2
       FROM (SELECT words, unnest(generate_series(1, len(words) - 1)) AS i FROM w)
       WHERE len(words[i]) > 0 AND len(words[i+1]) > 0),
pa AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
m AS (SELECT CAST(sum(c12) AS BIGINT) AS m FROM pa),
uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE len(word) > 0 GROUP BY 1),
n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni)
SELECT pa.w1, pa.w2, pa.c12, u1.c AS c1, u2.c AS c2,
       round(ln(CAST(c12 AS DOUBLE) / CAST(m AS DOUBLE)
 * (CAST(n AS DOUBLE) / CAST(u1.c AS DOUBLE))
 * (CAST(n AS DOUBLE) / CAST(u2.c AS DOUBLE))), 6) AS pmi
FROM pa JOIN uni u1 ON u1.word = pa.w1 JOIN uni u2 ON u2.word = pa.w2, m, n
WHERE c12 >= 5
ORDER BY pmi DESC, pa.w1 ASC, pa.w2 ASC LIMIT 50""",

    "llm_unigram_logprob" -> """
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
wf AS (SELECT doc_id, word, count(*) AS cnt FROM w WHERE len(word) > 0
       GROUP BY doc_id, word),
wc AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS c FROM wf GROUP BY word),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM wc),
sc AS (SELECT word, CAST(round(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9) AS BIGINT) AS lp9
       FROM wc, tot)
SELECT f.doc_id, CAST(sum(f.cnt) AS BIGINT) AS n_tokens,
       CAST(sum(f.cnt * s.lp9) AS BIGINT) AS sum_lp9,
       -(CAST(sum(f.cnt * s.lp9) AS DOUBLE)) / (1e9 * CAST(sum(f.cnt) AS DOUBLE)) AS avg_neg_logprob
FROM wf f JOIN sc s ON s.word = f.word
GROUP BY f.doc_id""",

    "llm_token_count" -> """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe_tokens
FROM documents""",

    "llm_fingerprint" -> """
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents""",

    "llm_token_shards" -> """
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM toks),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM toks)
SELECT CAST(((cum_tokens - n_tokens) * 8) // total AS BIGINT) AS shard_id,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
FROM cum, tot GROUP BY 1""",

    // real-bytes twin: DuckDB reads the same fixture files (read_text —
    // the fixtures are printable ASCII by construction, so the bytes are
    // simultaneously a binary payload and valid UTF-8). feat_b0 (first
    // md5-digest byte) is recovered via a 256-row hex→int lookup join.
    // the mixed-media drop: opaque .bin rows carry NULL geometry (the
    // sniffer fabricates nothing); recognized containers carry the
    // generator manifests' ground truth (png color type 2 → 3 channels,
    // single frame; wav has no pixel geometry; y4m fixture colorspaces
    // are all chroma-carrying → 3 channels)
    "llm_multimodal_binary" -> s"""
SELECT CAST(regexp_extract(filename, 'media_([0-9]+)\\.bin', 1) AS BIGINT) AS media_id,
       CAST(size AS BIGINT) AS byte_len, TRUE AS len_matches_source,
       md5(hex(content)) AS bytes_md5hex, 'binary' AS media_kind,
       CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
       CAST(NULL AS INTEGER) AS channels, CAST(NULL AS INTEGER) AS frame_count
FROM read_blob('$mediaFixturesDir/*.bin')
UNION ALL
SELECT 1000 + CAST(regexp_extract(b.filename, 'img_([0-9]+)\\.png', 1) AS BIGINT),
       CAST(b.size AS BIGINT), TRUE, md5(hex(b.content)), 'png',
       CAST(m.width AS INTEGER), CAST(m.height AS INTEGER),
       CAST(3 AS INTEGER), CAST(1 AS INTEGER)
FROM read_blob('$pngFixturesDir/*.png') b
JOIN read_csv('$pngFixturesDir/manifest.csv') m
  ON m.media_id = CAST(regexp_extract(b.filename, 'img_([0-9]+)\\.png', 1) AS BIGINT)
UNION ALL
SELECT 2000 + CAST(regexp_extract(b.filename, 'clip_([0-9]+)\\.wav', 1) AS BIGINT),
       CAST(b.size AS BIGINT), TRUE, md5(hex(b.content)), 'wav',
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
       CAST(m.channels AS INTEGER), CAST(m.n_frames AS INTEGER)
FROM read_blob('$wavFixturesDir/*.wav') b
JOIN read_csv('$wavFixturesDir/manifest.csv') m
  ON m.media_id = CAST(regexp_extract(b.filename, 'clip_([0-9]+)\\.wav', 1) AS BIGINT)
UNION ALL
SELECT 3000 + CAST(regexp_extract(b.filename, 'clip_([0-9]+)\\.y4m', 1) AS BIGINT),
       CAST(b.size AS BIGINT), TRUE, md5(hex(b.content)), 'y4m',
       CAST(m.width AS INTEGER), CAST(m.height AS INTEGER),
       CAST(CASE WHEN m.colorspace LIKE 'Cmono%' THEN 1 ELSE 3 END AS INTEGER),
       CAST(m.frame_count AS INTEGER)
FROM read_blob('$y4mFixturesDir/*.y4m') b
JOIN read_csv('$y4mFixturesDir/manifest.csv') m
  ON m.media_id = CAST(regexp_extract(b.filename, 'clip_([0-9]+)\\.y4m', 1) AS BIGINT)
UNION ALL
SELECT 4000 + CAST(regexp_extract(b.filename, 'vid_([0-9]+)\\.mp4', 1) AS BIGINT),
       CAST(b.size AS BIGINT), TRUE, md5(hex(b.content)), 'mp4',
       CAST(m.width AS INTEGER), CAST(m.height AS INTEGER),
       CAST(NULL AS INTEGER), CAST(NULL AS INTEGER)
FROM read_blob('$mp4FixturesDir/*.mp4') b
JOIN read_csv('$mp4FixturesDir/manifest.csv') m
  ON m.media_id = CAST(regexp_extract(b.filename, 'vid_([0-9]+)\\.mp4', 1) AS BIGINT)""",

    // the manifest is the generator's ground truth for what the PNG
    // encoder wrote; byte identity via md5 over the hex encoding (both
    // engines hex uppercase)
    "llm_multimodal_meta" -> s"""
WITH raw AS (
  SELECT CAST(regexp_extract(filename, 'img_([0-9]+)\\.png', 1) AS BIGINT) AS media_id,
         CAST(size AS BIGINT) AS byte_len, md5(hex(content)) AS bytes_md5hex
  FROM read_blob('$pngFixturesDir/*.png'))
SELECT r.media_id, r.byte_len, r.bytes_md5hex,
       CAST(m.width AS INTEGER) AS width, CAST(m.height AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels, m.format
FROM raw r JOIN read_csv('$pngFixturesDir/manifest.csv') m ON m.media_id = r.media_id""",

    // the WAV manifest is the generator's ground truth for what the PCM
    // encoder wrote — every feature is integer arithmetic on int16
    // samples, so equality is exact, not tolerance-based
    "llm_audio_meta" -> s"""
WITH raw AS (
  SELECT CAST(regexp_extract(filename, 'clip_([0-9]+)\\.wav', 1) AS BIGINT) AS media_id,
         CAST(size AS BIGINT) AS byte_len, md5(hex(content)) AS bytes_md5hex
  FROM read_blob('$wavFixturesDir/*.wav'))
SELECT r.media_id, r.byte_len, r.bytes_md5hex,
       CAST(m.sample_rate AS INTEGER) AS sample_rate,
       CAST(m.channels AS INTEGER) AS channels,
       CAST(m.bits AS INTEGER) AS bits,
       CAST(m.n_frames AS BIGINT) AS n_frames,
       CAST(m.peak_abs AS INTEGER) AS peak_abs,
       CAST(m.sumsq AS BIGINT) AS sumsq,
       CAST(m.zero_cross AS BIGINT) AS zero_cross,
       'pcm_signed' AS encoding
FROM raw r JOIN read_csv('$wavFixturesDir/manifest.csv') m ON m.media_id = r.media_id""",

    // same integer-DIV gate formulas over the manifest ground truth
    "llm_audio_quality" -> s"""
SELECT media_id,
       CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms,
       CAST(sumsq // (n_frames * channels) AS BIGINT) AS mean_square,
       CAST(zero_cross * 1000000 // (channels * (n_frames - 1)) AS BIGINT) AS zcr_ppm,
       (sumsq // (n_frames * channels)) < 1000000 AS is_silent,
       peak_abs >= 32700 AS is_clipped,
       (NOT ((sumsq // (n_frames * channels)) < 1000000))
         AND (NOT (peak_abs >= 32700))
         AND ((n_frames * 1000 // sample_rate) >= 50) AS pass_gate
FROM read_csv('$wavFixturesDir/manifest.csv')""",

    // trim-prefix ground truth: frames = min(n_frames, rate/5), Σv² over
    // exactly those frames — computed by the generator from the samples
    // it wrote, reproduced by the engine from the bytes alone
    "llm_audio_trim" -> s"""
SELECT media_id, CAST(trim_frames AS BIGINT) AS out_frames,
       CAST(sample_rate AS INTEGER) AS sample_rate,
       CAST(channels AS INTEGER) AS channels, TRUE AS has_payload,
       CAST(trim_sumsq AS BIGINT) AS out_sumsq
FROM read_csv('$wavFixturesDir/manifest.csv')""",

    // a solid-color source resized by ANY interpolation stays solid:
    // the decoded center pixel must equal the manifest color exactly
    "llm_multimodal_resize" -> s"""
SELECT media_id, CAST(64 AS INTEGER) AS out_width, CAST(64 AS INTEGER) AS out_height,
       'png' AS out_format, TRUE AS has_payload,
       CAST(r AS INTEGER) AS px_r, CAST(g AS INTEGER) AS px_g, CAST(b AS INTEGER) AS px_b
FROM read_csv('$pngFixturesDir/manifest.csv')""",

    // the generator's per-frame ground truth: real bytes out of a real
    // container, every value integer/checksum-exact
    "llm_multimodal_frames" -> s"""
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       CAST(frame_len AS BIGINT) AS frame_len, CAST(y_sum AS BIGINT) AS y_sum,
       frame_checksum
FROM read_csv('$y4mFixturesDir/manifest_frames.csv')""",

    "llm_video_meta" -> s"""
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(byte_len AS BIGINT) AS byte_len, checksum,
       CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       CAST(fps_num AS INTEGER) AS fps_num, CAST(fps_den AS INTEGER) AS fps_den,
       colorspace, CAST(frame_count AS INTEGER) AS frame_count
FROM read_csv('$y4mFixturesDir/manifest.csv')""",

    // the generator's box-level ground truth: brand/timescale/duration/
    // track census/geometry out of hand-rolled ISO-BMFF trees
    "llm_mp4_meta" -> s"""
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(byte_len AS BIGINT) AS byte_len, checksum,
       major_brand, CAST(timescale AS BIGINT) AS timescale,
       CAST(duration AS BIGINT) AS duration, CAST(duration_ms AS BIGINT) AS duration_ms,
       CAST(n_tracks AS INTEGER) AS n_tracks, CAST(n_video AS INTEGER) AS n_video,
       CAST(n_audio AS INTEGER) AS n_audio,
       CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height
FROM read_csv('$mp4FixturesDir/manifest.csv')""",

    // exact integer dHash ground truth from the generator
    "llm_image_phash" -> s"""
SELECT CAST(media_id AS BIGINT) AS media_id,
       CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
       CAST(dhash AS BIGINT) AS dhash
FROM read_csv('$phashFixturesDir/manifest.csv')""",

    // the exact pair set replayed from the manifest hashes
    "llm_image_neardup" -> s"""
WITH h AS (SELECT CAST(media_id AS BIGINT) AS id, CAST(dhash AS BIGINT) AS d
           FROM read_csv('$phashFixturesDir/manifest.csv'))
SELECT a.id AS a, b.id AS b,
       CAST(bit_count(xor(a.d, b.d)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.id < b.id
WHERE bit_count(xor(a.d, b.d)) <= 7
ORDER BY a, b""",

    "llm_chunking" -> """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM documents
), chunked AS (
  SELECT doc_id, words, n,
         unnest(generate_series(0,
           CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 23) // 24 + 1 END - 1)) AS i
  FROM base
)
SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
       array_to_string(words[i*24+1 : i*24+32], ' ') AS chunk_text,
       CAST(len(words[i*24+1 : i*24+32]) AS BIGINT) AS n_tokens
FROM chunked""",

    "llm_repetition" -> """
WITH wc AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
), agg AS (
  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(sum(cnt) AS BIGINT) AS n_tokens
  FROM wc GROUP BY doc_id
)
SELECT doc_id, CAST(max_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_token_ratio,
       max_cnt * 5 >= n_tokens AS repetitive
FROM agg""",

    "llm_packing" -> """
WITH base AS (
  SELECT d.source, c.doc_id, c.chunk_idx, c.n_tokens FROM (
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           CAST(len(words[i*24+1 : i*24+32]) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS words,
                 unnest(generate_series(0,
                   CASE WHEN len(string_split(text, ' ')) <= 32 THEN 1
                        ELSE (len(string_split(text, ' ')) - 32 + 23) // 24 + 1 END - 1)) AS i
          FROM documents)
  ) c JOIN documents d ON c.doc_id = d.doc_id
), packed AS (
  SELECT source, doc_id, chunk_idx, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC, chunk_idx ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM base
)
SELECT source, doc_id, chunk_idx, n_tokens,
       CAST((running - n_tokens) // 256 AS BIGINT) AS pack_id
FROM packed""",

    // exact FFD replay: one recursion step consumes one item per source
    // (seq from a total order: n_tokens DESC, doc_id, chunk_idx); `loads`
    // carries each source's bin fill levels, first fitting bin via a
    // filtered index list, else a new bin is appended.
    "llm_packing_ffd" -> ffdReplaySql,

    // FFD replay wrapped; integer lower bound and fills
    "llm_packing_efficiency" -> s"""
WITH pk AS ($ffdReplaySql)
SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(count(DISTINCT bin_idx) AS BIGINT) AS n_bins,
       CAST((sum(n_tokens) + 255) // 256 AS BIGINT) AS lb_bins,
       CAST((sum(n_tokens) * 1000000) // (count(DISTINCT bin_idx) * 256) AS BIGINT) AS fill_ppm,
       CAST((((sum(n_tokens) + 255) // 256) * 1000000) // count(DISTINCT bin_idx) AS BIGINT) AS efficiency_ppm
FROM pk GROUP BY source""",

    // langId replay wrapped; integer-ppm rows of the confusion matrix
    "llm_langid_confusion" -> s"""
WITH p AS ($langIdSql),
cm AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM cm GROUP BY 1)
SELECT cm.lang, cm.lang_pred, cm.n,
       CAST((cm.n * 1000000) // t.n_lang AS BIGINT) AS share_ppm,
       cm.lang = cm.lang_pred AS correct
FROM cm JOIN t ON t.lang = cm.lang""",

    "llm_pii_redact" -> """
WITH pii AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com or +1-555-',
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS pii_text
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(pii_text, '[a-zA-Z0-9]+@[a-zA-Z0-9.]+[a-zA-Z]', '<EMAIL>', 'g'),
                 '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text,
  CAST(len(regexp_extract_all(pii_text, '[a-zA-Z0-9]+@[a-zA-Z0-9.]+[a-zA-Z]')) AS BIGINT) AS emails_found,
  CAST(len(regexp_extract_all(pii_text, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS phones_found
FROM pii""",

    "llm_multimodal_features" -> s"""
SELECT doc_id AS media_id,
  ${(0 until 8).map(i =>
        s"CAST(CAST((md5_number_upper(text) >> ${8 * i}) & 255 AS FLOAT) / CAST(255 AS FLOAT) AS FLOAT) AS f$i")
        .mkString(",\n  ")}
FROM documents"""
  )
}
