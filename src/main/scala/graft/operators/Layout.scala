package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout tooling: Z-order (Morton) clustering for multi-column scan
  * pruning.
  *
  * Parquet keeps min/max stats per row group; Spark pushes comparison
  * filters into the reader, which skips row groups whose stats exclude
  * the predicate. A sort on column A makes A's stats tight but leaves a
  * filter on B reading everything; interleaving the BITS of A and B into
  * one sort key (the Z-value / Morton code) makes row groups cover small
  * rectangles of the (A, B) space, so selective filters on EITHER column
  * (or both) skip most row groups. This is the layout story behind
  * "OPTIMIZE ZORDER BY" in lakehouse engines, built here from plain
  * column expressions (shift/mask spreads — constant-folded,
  * codegen-friendly) plus repartitionByRange + sortWithinPartitions.
  *
  * At cluster scale the same call shapes a 100 TB table: the range
  * repartition samples the z-key distribution, each task writes one
  * z-contiguous file, and every file/row group covers a tight rectangle.
  */
object Layout {

  /** classic Morton bit-spread: the low 31 bits of `c` spaced out to even
    * bit positions (5 shift-or-mask rounds) */
  private def spread(c: Column): Column = {
    var v = c.cast(LongType).bitwiseAND(lit(0x7FFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Z-value (Morton code) of two NON-NEGATIVE integral columns, each
    * truncated to its low 31 bits; callers with signed/continuous domains
    * quantize first (e.g. `floor(value / step)`). */
  def zValue2(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** N-column Z-value: each column contributes its low 62/n bits,
    * bit-interleaved round-robin (column j owns bit positions i*n + j).
    * Built as a flat OR of shift/mask terms — all constant-shift column
    * expressions, codegen'd like the 2-column fast path. For n == 2 the
    * layout matches [[zValue2]] bit-for-bit (column 0 on even bits).
    * Same contract: non-negative integral columns, quantize first. */
  def zValueN(cols: Seq[Column]): Column = {
    require(cols.size >= 2 && cols.size <= 8, s"zValueN takes 2-8 columns, got ${cols.size}")
    val n = cols.size
    val b = 62 / n
    val masked = cols.map(_.cast(LongType).bitwiseAND(lit((1L << b) - 1L)))
    val terms = for { i <- 0 until b; j <- 0 until n } yield
      shiftleft(shiftright(masked(j), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** [[writeZOrdered]] for 2+ clustering columns. */
  def writeZOrderedN(df: DataFrame, path: String, zCols: Seq[String],
                     numFiles: Int): Unit =
    df.withColumn("__z", zValueN(zCols.map(col)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` parquet clustered by the Z-order of (xCol, yCol):
    * range-partitioned by z-key (one z-contiguous file per task), sorted
    * within partitions so row-group stats are tight on both columns. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int): Unit =
    df.withColumn("__z", zValue2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
