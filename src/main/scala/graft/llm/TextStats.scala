package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM training-data pipelines (extension
  * phase, SURVEY.md §7.9 / BASELINE.json north_star): language-ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All operators are pure column expressions over a `text` column — they
  * run inside whole-stage codegen, shuffle nothing, and scale linearly
  * with the scan. Ratios are emitted as exact integer-over-integer double
  * divisions (engine-stable — no rounding step needed for oracle compare).
  */
object TextStats {

  /** Whitespace tokenization (split on single spaces; the corpus shape). */
  def words(text: Column): Column = split(text, " ")

  /** Canonical normalization for dedup keys: lowercase, map everything
    * outside [a-z0-9 ] to a space, collapse whitespace runs, trim — the
    * first step before exact/minhash dedup, so casing and punctuation
    * variants of the same text collapse to one key. Pure codegen'd
    * column ops (two regexp passes), no shuffle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** BPE-ish token count: runs of letters, runs of digits, or any single
    * non-space symbol — the standard pre-tokenizer regex family. */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0))).cast(LongType)

  /** Per-language marker words for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  /** Marker hit count for one language over the word array. */
  private def markerHits(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => markers.map(m => w === m).reduce(_ || _))).cast(LongType)

  /** Language-ID: argmax marker-hit count with deterministic tie-break on
    * declaration order (greatest-so-far keeps the earlier language). */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scored = langMarkers.map { case (lang, ms) => (lang, markerHits(ws, ms)) }
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Quality metrics: word/char counts, average word length, stopword
    * ratio, alpha ratio, plus a composite keep/drop flag with the usual
    * web-corpus thresholds. Ratios are exact integer-over-integer double
    * divisions. */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val nWords = size(ws).cast(LongType)
    val nChars = length(t).cast(LongType)
    val stopHits = markerHits(ws, langMarkers.flatMap(_._2).distinct)
    val alphaChars = length(regexp_replace(t, "[^a-zA-Z]", "")).cast(LongType)
    df.withColumn("n_words", nWords)
      .withColumn("n_chars_measured", nChars)
      .withColumn("avg_word_len",
        (nChars - (nWords - lit(1L))).cast(DoubleType) / nWords.cast(DoubleType))
      .withColumn("stopword_ratio", stopHits.cast(DoubleType) / nWords.cast(DoubleType))
      .withColumn("alpha_ratio", alphaChars.cast(DoubleType) / nChars.cast(DoubleType))
      .withColumn("quality_keep",
        nWords >= 5 && nWords <= 10000 &&
          (stopHits * lit(100L)) >= nWords && // stopword_ratio >= 0.01, integer-exact
          (alphaChars * lit(10L)) >= (nChars * lit(6L))) // alpha_ratio >= 0.6
  }

  /** OpenRefine-style fingerprint: sorted distinct words, md5'd — plus a
    * 64-bit rolling variant for joinable keys. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** Repetition detection: the classic quality signal — share of the most
    * frequent token. One keyed aggregation; ratios exact-division doubles,
    * the flag an integer cross-multiplication. */
  def repetitionMetrics(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), explode(words(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        max(col("cnt")).as("max_cnt"),
        sum(col("cnt")).as("n_tokens"))
      .select(col("doc_id"),
        col("max_cnt").cast(DoubleType)./(col("n_tokens").cast(DoubleType)).as("top_token_ratio"),
        (col("max_cnt") * lit(5L) >= col("n_tokens")).as("repetitive")) // ratio >= 0.2

  /** Token-stream packing (LLM pretraining style): chunks are concatenated
    * in a deterministic order within each `partitionCol` group and cut into
    * packs of `budget` tokens — pack_id = tokens-before div budget. The
    * running sum is a keyed window, so packing parallelizes per group
    * (the per-source shard is the unit of work at scale). */
  def packChunks(chunks: DataFrame, budget: Int, partitionCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col("doc_id").asc, col("chunk_idx").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("running", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        ((col("running") - col("n_tokens")).cast(DoubleType) / budget).cast(LongType))
      .select(col(partitionCol), col("doc_id"), col("chunk_idx"),
        col("n_tokens"), col("pack_id"))
  }

  /** PII scrubbing: email/phone redaction + found counts. Patterns stay in
    * the RE2 ∩ Java-regex common subset so oracles replicate exactly. */
  val emailRe = "[a-zA-Z0-9]+@[a-zA-Z0-9.]+[a-zA-Z]"
  val phoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text, lit(emailRe), lit(0))).cast(LongType),
    size(regexp_extract_all(text, lit(phoneRe), lit(0))).cast(LongType))

  /** Training-sequence chunking: fixed-size word windows with overlap
    * (stride = size - overlap). Chunk starts at i*stride; short documents
    * yield one whole-document chunk; the final window clamps at the end.
    * Pure per-row array work — no shuffle, scales with the scan. */
  def chunkDocuments(df: DataFrame, size: Int = 32, overlap: Int = 8,
                     textCol: String = "text"): DataFrame = {
    require(overlap < size, "overlap must be smaller than chunk size")
    val stride = size - overlap
    // split materialized before the lambda (Dedup.shingleArrayOf rule):
    // an inline words(text) inside the per-chunk slices re-splits the
    // document once per chunk — O(words²/stride) per doc
    val ws = col("__ws")
    val len = org.apache.spark.sql.functions.size(ws)
    // nChunks = 1 if len <= size else ceil((len-size)/stride) + 1
    val nChunks = when(len <= size, lit(1))
      .otherwise(((len - size + stride - 1).cast(DoubleType) / stride).cast(IntegerType) + 1)
    df.select(col("doc_id"), words(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nChunks - 1), i => struct(
          i.as("chunk_idx"),
          array_join(slice(ws, i * stride + 1, lit(size)), " ").as("chunk_text"),
          org.apache.spark.sql.functions.size(slice(ws, i * stride + 1, lit(size))).cast(LongType).as("n_tokens")
        ))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"), col("c.n_tokens"))
  }

  /** First-fit-decreasing bin packing of chunks into token-budget bins,
    * independently per `partitionCol` (source) group — tighter packing
    * than `packChunks`'s running-sum next-fit (FFD wastes ≤ ~22% in the
    * worst case vs next-fit's ~50%). FFD is inherently sequential per
    * group: the group's items are buffered and sorted in-task
    * (n_tokens DESC, doc_id ASC, chunk_idx ASC — a total order, so the
    * result is deterministic and partition-count-independent). Groups are
    * processed in parallel across sources; a single giant source is one
    * task's memory — at real scale you'd salt such a source into
    * sub-groups, trading a little packing quality for parallelism, the
    * same caveat `packChunks` documents. Returns 1-based `bin_idx`. */
  def packChunksFfd(chunks: DataFrame, budget: Int,
                    partitionCol: String = "source"): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.select(col(partitionCol).cast(StringType).as("src"),
        col("doc_id").cast(LongType), col("chunk_idx").cast(IntegerType),
        col("n_tokens").cast(LongType))
      .as[(String, Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (src, it) =>
        val items = it.toArray.sortBy(t => (-t._4, t._2, t._3))
        val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
        items.iterator.map { case (_, docId, chunkIdx, n) =>
          var i = 0
          while (i < loads.length && loads(i) + n > budget) i += 1
          if (i == loads.length) loads += n else loads(i) += n
          (src, docId, chunkIdx, n, (i + 1).toLong)
        }
      }
      .toDF(partitionCol, "doc_id", "chunk_idx", "n_tokens", "bin_idx")
  }

  /** Top-k characteristic terms per document by tf-idf
    * (tf × ln(N/df)). Two keyed aggregations (both map-side-combinable:
    * per-(doc,term) counts, then per-term document frequency), one
    * broadcast of the single-row corpus count, and a per-doc top-k
    * window — nothing driver-side, nothing quadratic. Scores are rounded
    * to 6 decimals BEFORE ranking (ties then break on the term) so the
    * ranking is stable across engines' last-ulp log differences. */
  /** BPE first-merge statistics — the opening move of byte-pair-encoding
    * tokenizer induction (Sennrich et al. 2016) at corpus scale: count
    * adjacent symbol pairs inside words, weighted by word frequency; the
    * highest-count pair is BPE's first merge. The corpus-scale work is
    * ONE word-frequency aggregation (map-side combinable); pair
    * generation then runs over the VOCABULARY (distinct words), so the
    * char-level explode never touches corpus volume — the reason real
    * BPE trainers operate on a word-count table. Output: (left_sym,
    * right_sym, merged, pair_count) above `minCount`. */
  def bpePairCounts(docs: DataFrame, minCount: Long = 50): DataFrame = {
    val wf = docs.select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    wf.filter(length(col("word")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word) - 1), i -> " +
          "struct(substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r))"))
        .as("p"))
      .select(col("freq"), col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .groupBy(col("left_sym"), col("right_sym"))
      .agg(sum(col("freq")).as("pair_count"))
      .filter(col("pair_count") >= minCount)
      .select(col("left_sym"), col("right_sym"),
        concat(col("left_sym"), col("right_sym")).as("merged"), col("pair_count"))
  }

  /** Iterative BPE merge TRAINING — the real tokenizer-induction loop
    * (Sennrich et al. 2016), not just the first-merge count: each round
    * counts adjacent symbol pairs over the word-frequency table (freq-
    * weighted, map-side combinable), picks the winner (count desc, then
    * pair lexicographic — deterministic across engines), BROADCASTS that
    * one merge back (a 1-row collect per round, the A6-watermark shape),
    * and applies it to every word's symbol string. Symbols are encoded
    * SEP-prefixed (one control byte before each symbol) so a plain left-to-right
    * `replace(s, SEP+l+SEP+r, SEP+l+r)` applies the merge with exact
    * greedy-BPE semantics: every symbol occurrence is preceded by
    * exactly one SEP and symbols never contain SEP, so matches can
    * neither straddle a symbol boundary nor overlap ("aaa" merges to
    * [aa, a], the standard rule). Corpus cost: ONE word-count
    * aggregation; all `rounds` iterations run over the VOCABULARY —
    * at 100 TB the vocab table is a few million rows, so the loop's
    * per-round cost is independent of corpus bytes. Output: the merge
    * table (round, left_sym, right_sym, merged, pair_count). */
  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    val Sep = "\u0001" // kept out of words by bpeWordFreq's filter
    val spark = docs.sparkSession
    val wf = graft.QueryCaches.scoped(
      bpeWordFreq(docs)
        .select(regexp_replace(col("word"), "(.)", Sep + "$1").as("s"),
          col("freq")))
    var syms = wf
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    while (r <= rounds) {
      val winner = syms
        .select(col("freq"),
          filter(split(col("s"), Sep), x => x =!= lit("")).as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> " +
            "struct(element_at(a, i) AS l, element_at(a, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect() // exactly one row per round — the merge being learned
      require(winner.nonEmpty, s"BPE round $r: no pair left to merge")
      val (l, rt, cnt) =
        (winner.head.getString(0), winner.head.getString(1), winner.head.getLong(2))
      merges += ((r, l, rt, l + rt, cnt))
      syms = syms.withColumn("s",
        replace(col("s"), lit(Sep + l + Sep + rt), lit(Sep + l + rt)))
      r += 1
    }
    import spark.implicits._
    merges.result()
      .toDF("round", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** The word-frequency table both BPE trainers iterate over. Words
    * containing the U+0001 SEP byte are DROPPED (enforced, not assumed):
    * the SEP-prefixed symbol encoding is only boundary-safe when no
    * symbol can contain SEP, and a corpus byte that collided with it
    * would silently corrupt symbol boundaries in a way the oracle —
    * which mirrors this filter — could never detect. */
  private def bpeWordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(words(col("text"))).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains("\u0001"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** [[bpeTrain]] with the greedy merge loop on the DRIVER — the path
    * for REAL vocabularies: the distributed trainer pays one Spark job
    * barrier per merge round (fine at an oracle's 6 rounds, hopeless at
    * a tokenizer's 32k), but the table the rounds iterate over is only
    * VOCABULARY-sized. So: ONE distributed word-count job, ONE bounded
    * collect (`minFreq` cuts the long tail; `maxVocab` is the hard
    * memory gate — raise `minFreq` rather than it), then the merge loop
    * runs locally with semantics IDENTICAL to the distributed rounds —
    * same pair counting over freq-weighted adjacent symbols, same
    * winner tiebreak (count desc, then left/right symbol in UTF-8
    * BYTE order, exactly Spark's string ordering), same left-to-right
    * non-overlapping merge application ("aaa" → [aa, a]). At
    * `minFreq = 1` the output is bit-identical to [[bpeTrain]]
    * (equivalence pinned by spec); a higher cutoff is the standard
    * trainer approximation that also bounds driver memory at 100 TB
    * (a few million distinct frequent words, not corpus bytes). */
  def bpeTrainLocal(docs: DataFrame, rounds: Int, minFreq: Long = 1L,
                    maxVocab: Int = 4000000): DataFrame = {
    val spark = docs.sparkSession
    val vocab: Array[(Array[String], Long)] = bpeWordFreq(docs)
      .filter(col("freq") >= minFreq)
      .collect() // vocabulary-sized by construction (minFreq-bounded)
      .map { r =>
        val w = r.getString(0)
        // initial symbols are CODE POINTS — regexp_replace's "(.)" in
        // the distributed trainer splits the same way
        val syms = w.codePoints().toArray.map(Character.toString)
        (syms, r.getLong(1))
      }
    require(vocab.length <= maxVocab,
      s"bpeTrainLocal: ${vocab.length} distinct words exceed maxVocab=" +
        s"$maxVocab — raise minFreq (frequency cutoff) instead of the cap")
    // UTF-8 byte order = UTF8String.compareTo = the distributed orderBy
    def byteLt(a: String, b: String): Boolean =
      graft.sources.TypedBounds.compareBytes(
        a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0
    val words = vocab.map(_._1.toBuffer)
    val freqs = vocab.map(_._2)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    while (r <= rounds) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var j = 0
        while (j < w.length - 1) {
          val k = (w(j), w(j + 1))
          counts.merge(k, freqs(i), (a, b) => a + b)
          j += 1
        }
        i += 1
      }
      require(!counts.isEmpty, s"BPE round $r: no pair left to merge")
      var best: ((String, String), Long) = null
      counts.forEach { (k, v) =>
        if (best == null || v > best._2 ||
            (v == best._2 && (byteLt(k._1, best._1._1) ||
              (k._1 == best._1._1 && byteLt(k._2, best._1._2)))))
          best = (k, v)
      }
      val ((l, rt), cnt) = best
      merges += ((r, l, rt, l + rt, cnt))
      // left-to-right non-overlapping application — the SEP-replace rule
      i = 0
      while (i < words.length) {
        val w = words(i)
        if (w.length >= 2) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < w.length) {
            if (j < w.length - 1 && w(j) == l && w(j + 1) == rt) {
              out += l + rt; j += 2
            } else { out += w(j); j += 1 }
          }
          if (out.length != w.length) { w.clear(); w ++= out }
        }
        i += 1
      }
      r += 1
    }
    import spark.implicits._
    merges.result()
      .toDF("round", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** Apply learned BPE merges corpus-wide — the tokenizer's ENCODE half:
    * [[bpeTrain]] learns the merge table (vocabulary-sized loop), this
    * applies it to every document as PURE column expressions (per word:
    * SEP-encode, then one boundary-safe replace per merge, in learned
    * order — the same greedy semantics the trainer used), so encoding
    * scales with the scan inside whole-stage codegen: no UDF, no
    * shuffle, the merge table rides the plan as literals. Output per
    * (lang): docs, whitespace words, BPE tokens, and fertility
    * (tokens per word — the tokenizer-quality metric), with the exact
    * integer-over-integer division discipline. */
  def bpeEncode(docs: DataFrame, rounds: Int): DataFrame = {
    val Sep = "\u0001"
    val merges = bpeTrain(docs, rounds)
      .select("left_sym", "right_sym").collect() // `rounds` rows — bounded
      .map(r => (r.getString(0), r.getString(1)))
    val encodeWord = (w: Column) =>
      merges.foldLeft(regexp_replace(w, "(.)", Sep + "$1")) {
        case (acc, (l, r)) => replace(acc, lit(Sep + l + Sep + r), lit(Sep + l + r))
      }
    // SEP-containing words are excluded exactly as the trainer excludes
    // them (bpeWordFreq) — the boundary-safe replace is undefined on them
    val ws = filter(words(col("text")),
      w => length(w) > 0 && !w.contains(Sep))
    val tokensPerWord = transform(ws, w =>
      size(split(encodeWord(w), Sep)) - 1)
    docs
      .select(col("lang"),
        size(ws).cast(LongType).as("n_words"),
        aggregate(tokensPerWord, lit(0L), (a, t) => a + t.cast(LongType))
          .as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_words"), col("total_tokens"),
        (col("total_tokens").cast(DoubleType) /
          col("total_words").cast(DoubleType)).as("fertility"))
  }

  /** Unigram language-model surprisal per document — the KenLM-style
    * perplexity proxy of the quality-filtering literature (CCNet,
    * Gopher/MassiveText rules) reduced to the model a SQL engine can fit
    * in one pass: p(w) = corpus_count(w) / total_tokens, and a document
    * scores the mean negative log-probability of its tokens. High
    * surprisal = rare-word soup (gibberish, boilerplate explosions);
    * low = repetitive filler. ENGINE-EXACT by the scaled-integer trick:
    * each distinct word's ln p is rounded once to 9 decimals and carried
    * as a BIGINT (lp9 = round(ln(p)·1e9)); per-document totals are then
    * INTEGER sums — order-independent, partitioning-independent — and
    * the final mean divides once in double with the textually-mirrored
    * shape. Two keyed aggregations ((doc,word) then word), a broadcast
    * 1-row total, and a vocabulary join: nothing shuffles text, and the
    * vocabulary side scales with distinct words, not corpus bytes. */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val wf = graft.QueryCaches.scoped(
      docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("word"))
        .agg(count(lit(1)).as("cnt")))
    val wc = wf.groupBy(col("word")).agg(sum(col("cnt")).as("c"))
    val tot = broadcast(wc.agg(sum(col("c")).as("t")))
    val scored = wc.crossJoin(tot)
      .select(col("word"),
        round(log(dbl(col("c")) / dbl(col("t"))) * 1e9)
          .cast(LongType).as("lp9"))
    wf.join(scored, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("lp9")).as("sum_lp9"))
      .select(col("doc_id"), col("n_tokens"), col("sum_lp9"),
        (-dbl(col("sum_lp9")) / (lit(1e9) * dbl(col("n_tokens"))))
          .as("avg_neg_logprob"))
  }

  /** Bigram-LM surprisal with add-one smoothing — unigramLogprob's
    * context-aware sibling (the fluency signal: a doc of common words in
    * impossible orders scores high here but low on unigram surprisal).
    * p(w2|w1) = (c(w1 w2)+1) / (c(w1)+V); each distinct bigram's ln p is
    * rounded ONCE to a scaled BIGINT, per-doc totals are integer sums
    * (order/partitioning-independent), and the mean divides once in
    * double. The model side scales with DISTINCT bigrams, not corpus
    * bytes, and text never shuffles — only (doc, bigram) counts. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    // split materialized before the lambda — see Dedup.shingleArrayOf
    val ws = col("__ws")
    // positional bigrams over non-empty adjacent tokens
    val bg = graft.QueryCaches.scoped(
      docs.select(col("doc_id"), words(col("text")).as("__ws"))
        .filter(size(ws) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(ws) - 1),
          i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
          .as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt")))
    val pair = bg.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("c12"))
    val uni = graft.QueryCaches.scoped(
      docs.select(explode(words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("c1")))
    val vocab = broadcast(uni.agg(count(lit(1)).as("v")))
    val scored = pair
      .join(uni.select(col("word").as("w1"), col("c1")), "w1")
      .crossJoin(vocab)
      .select(col("w1"), col("w2"),
        round(log((dbl(col("c12")) + lit(1.0)) / (dbl(col("c1")) + dbl(col("v")))) * 1e9)
          .cast(LongType).as("lp9"))
    bg.join(scored, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt") * col("lp9")).as("sum_lp9"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp9"),
        (-dbl(col("sum_lp9")) / (lit(1e9) * dbl(col("n_bigrams"))))
          .as("avg_neg_logprob"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, word-level
    * simplification): per-doc log likelihood ratio between a TARGET
    * word distribution (docs matching `targetFilter`) and the RAW
    * corpus distribution, both add-one smoothed over the shared
    * vocabulary. Docs whose words look target-like get positive
    * weights — the importance-resampling signal for domain-matched
    * pretraining mixtures. Same scaled-integer discipline as
    * unigramLogprob: per-word llr9 rounded once, per-doc INTEGER sums,
    * one double division at the boundary. */
  def dsirWeights(docs: DataFrame, targetFilter: Column): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val wf = graft.QueryCaches.scoped(
      docs.select(col("doc_id"), targetFilter.as("is_target"),
          explode(words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("is_target"), col("word"))
        .agg(count(lit(1)).as("cnt")))
    val byWord = wf.groupBy(col("word"))
      .agg(sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("ct"),
        sum(col("cnt")).as("cr"))
    val tot = broadcast(byWord.agg(sum(col("ct")).as("t"), sum(col("cr")).as("r"),
      count(lit(1)).as("v")))
    val scored = byWord.crossJoin(tot)
      .select(col("word"),
        round((log((dbl(col("ct")) + lit(1.0)) / (dbl(col("t")) + dbl(col("v"))))
          - log((dbl(col("cr")) + lit(1.0)) / (dbl(col("r")) + dbl(col("v"))))) * 1e9)
          .cast(LongType).as("llr9"))
    wf.join(scored, "word")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("llr9")).as("sum_llr9"))
      .select(col("doc_id"), col("n_tokens"), col("sum_llr9"),
        (dbl(col("sum_llr9")) / (lit(1e9) * dbl(col("n_tokens"))))
          .as("avg_log_ratio"),
        (col("sum_llr9") > 0L).as("target_like"))
  }

  /** Multinomial Naive Bayes classifier over document words — the
    * TRAINED quality-filter stage of the public pretraining pipelines
    * (GPT-3/CCNet-style classifier filtering: label a curated positive
    * set, train a cheap text classifier, keep what scores positive),
    * with `positive` as the labeling rule (a heuristic or a curated
    * flag). Train and score in one pass over the same corpus (labels
    * are heuristic — self-scoring is the standard filtering setup):
    * add-one-smoothed class-conditional word likelihoods over the
    * shared vocabulary, class priors from the label counts, per-doc
    * decision = sign of the log-odds. Same scaled-integer discipline
    * as [[dsirWeights]]: per-word log-odds rounded once to lodds9,
    * per-doc INTEGER sums (order-independent), one double division at
    * the boundary. Docs with no words carry no evidence and are not
    * scored (the join drops them). */
  def nbClassifierScores(docs: DataFrame, positive: Column): DataFrame = {
    val dbl = (c: Column) => c.cast(DoubleType)
    val wf = graft.QueryCaches.scoped(
      docs.select(col("doc_id"), positive.as("is_pos"),
          explode(words(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("doc_id"), col("is_pos"), col("word"))
        .agg(count(lit(1)).as("cnt")))
    val byWord = wf.groupBy(col("word"))
      .agg(sum(when(col("is_pos"), col("cnt")).otherwise(0L)).as("cp"),
        sum(when(!col("is_pos"), col("cnt")).otherwise(0L)).as("cn"))
    val tot = broadcast(byWord.agg(sum(col("cp")).as("np"),
      sum(col("cn")).as("nn"), count(lit(1)).as("v")))
    val lodds = byWord.crossJoin(tot)
      .select(col("word"),
        round((log((dbl(col("cp")) + lit(1.0)) / (dbl(col("np")) + dbl(col("v"))))
          - log((dbl(col("cn")) + lit(1.0)) / (dbl(col("nn")) + dbl(col("v"))))) * 1e9)
          .cast(LongType).as("lodds9"))
    // Add-one-smoothed prior, matching the likelihoods' smoothing: an
    // all-positive (or all-negative) labeling would otherwise yield a
    // ±Inf prior, and Spark's Long cast clamps infinities where DuckDB
    // errors — the smoothed form stays finite for every labeling.
    val priors = broadcast(docs.agg(
      sum(when(positive, lit(1L)).otherwise(lit(0L))).as("dp"),
      count(lit(1)).as("d"))
      .select(round(log((dbl(col("dp")) + lit(1.0)) /
          (dbl(col("d")) - dbl(col("dp")) + lit(1.0))) * 1e9)
        .cast(LongType).as("prior9")))
    wf.join(lodds, "word")
      .groupBy(col("doc_id"))
      .agg(max(col("is_pos")).as("is_pos"),
        sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("lodds9")).as("sum_lodds9"))
      .crossJoin(priors)
      .select(col("doc_id"), col("is_pos"), col("n_tokens"),
        (col("sum_lodds9") + col("prior9")).as("total9"),
        (dbl(col("sum_lodds9") + col("prior9")) / lit(1e9)).as("log_odds"),
        ((col("sum_lodds9") + col("prior9")) > 0L).as("predicted_pos"))
  }

  def tfIdfTopK(docs: DataFrame, k: Int = 3, textCol: String = "text"): DataFrame = {
    val terms = docs.select(col("doc_id"),
        explode(words(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"), col("rnk"))
  }
}
