package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.functions.Fns.md5lo58

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based `df.sample` is neither reproducible across runs/partitionings
  * nor expressible in a cross-engine oracle; hash-gating on a stable key
  * is both, and is the idiom web-scale corpus pipelines use: the decision
  * for a row depends only on its key, so re-runs, retries, and re-
  * partitions keep the identical sample, and the gate is a pure codegen'd
  * filter that pushes down to the scan (no shuffle, no state).
  *
  * Rates are parts-per-million integers — integer comparison, no float
  * thresholds to drift between engines.
  */
object Sampling {

  /** The shared gate: md5-fold of the (null-coalesced) key under a ppm
    * Column. NULL keys hash as the empty string so a ppm=1000000 sample
    * is the identity — a NULL gate would silently drop those rows. */
  private def gate(key: Column, ppm: Column): Column =
    md5lo58(coalesce(key.cast(StringType), lit(""))) % 1000000L < ppm.cast("long")

  /** Keep rows where md5-fold(key) lands under `ppm` of the 1e6 gate. */
  def hashSampleGate(key: Column, ppm: Int): Column = {
    require(ppm >= 0 && ppm <= 1000000, s"ppm out of range: $ppm")
    gate(key, lit(ppm))
  }

  /** Deterministic `ppm`/1e6 sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, ppm: Int): DataFrame =
    df.filter(hashSampleGate(col(keyCol), ppm))

  /** The gate with a COLUMN rate: each row carries its own ppm (e.g. a
    * per-source rate joined in) — the primitive behind quota/mixture
    * sampling where rates are computed from the data. The rate is
    * clamped to [0, 1e6] (the scalar twin's require, applied per row):
    * a computed rate that overflows or goes negative degrades to
    * keep-nothing/keep-all instead of an undefined modular compare. */
  def hashSampleGateCol(key: Column, ppmCol: Column): Column =
    gate(key, greatest(lit(0L), least(lit(1000000L), ppmCol.cast("long"))))

  /** Exact k-per-group deterministic sample (a reservoir with a hash
    * order): rank rows inside each group by the md5 of their key and
    * keep the first `k`. Reproducible across runs and partitionings
    * (the order depends only on the key), independent of any data
    * ordering, and exactly k rows per group (fewer only when the group
    * is smaller). One shuffle (hash by group) + an in-partition sort —
    * the per-group twin of hashSample's fixed-rate gate, for the
    * "n examples per source/language" curation shape. */
  def perGroupSample(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(md5(concat(lit("pg-"), col(keyCol).cast(StringType))).asc,
        col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Weighted sampling WITHOUT replacement via exponential keys
    * (Efraimidis & Spirakis 2006): row i draws a deterministic
    * md5-uniform u_i in (0, 1] and the k rows with the LARGEST key
    * ln(u_i)/w_i win — equivalent to ranking by u^(1/w), so inclusion
    * probability tracks the weight while the whole draw stays
    * reproducible across runs and partitionings (the randomness is a
    * pure function of the row key). Selection is orderBy+limit, which
    * Spark plans as TakeOrderedAndProject: per-partition k-heaps and a
    * k-row driver merge, never a global sort — the same top-k shape at
    * 100 TB. Weights must be positive; a zero weight yields -Inf (never
    * sampled) rather than an error. The returned frame carries the
    * `es_key` column for auditability. */
  def weightedSampleTopK(df: DataFrame, keyCol: String, weightCol: String,
                         k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val u = (md5lo58(concat(lit("ws-"), col(keyCol).cast(StringType))) + 1L)
      .cast(DoubleType) / lit((1L << 58).toDouble)
    df.withColumn("es_key", log(u) / col(weightCol).cast(DoubleType))
      .orderBy(col("es_key").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Stratified deterministic sample: per-stratum rates in ppm, with a
    * default for unlisted strata. One codegen'd CASE — no per-stratum
    * jobs, no shuffle; the standard shape for source-weighted corpus
    * mixing (upsample curated sources, downsample crawl). */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           ratesPpm: Map[String, Int], defaultPpm: Int): DataFrame = {
    (ratesPpm.values.toSeq :+ defaultPpm).foreach(p =>
      require(p >= 0 && p <= 1000000, s"ppm out of range: $p"))
    val rate = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (stratum, ppm)) =>
      when(col(strataCol) === stratum, lit(ppm)).otherwise(acc)
    }
    df.filter(gate(col(keyCol), rate))
  }
}
