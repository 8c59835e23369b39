package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
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
