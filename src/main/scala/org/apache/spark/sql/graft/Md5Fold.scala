package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-fold: one of the two 64-bit little-endian halves of the md5
  * digest, masked to the low `bits` bits, as a Long.
  *
  * Replaces the composed chain md5 → hex substrings → byte-pair reversal →
  * conv(16,10) → DECIMAL(20,0) → % 2^bits → Long (see Fns.md5u64): one
  * digest + integer ops instead of string/decimal churn — this runs per
  * shingle/token in the dedup family, so it is the hot scalar of the
  * MinHash/SimHash path. Bit-identical to the composed chain and to
  * DuckDB's md5_number_lower/upper % 2^bits (mod of a power of two ==
  * low-bits mask on the unsigned value).
  */
case class Md5Fold(child: Expression, upperHalf: Boolean, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  private val offset = if (upperHalf) 0 else 8
  private val mask = (1L << bits) - 1

  override protected def nullSafeEval(input: Any): Any = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(
      input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(offset + i) & 0xffL); i -= 1 }
    v & mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Md5Fold.fold($c.getBytes(), $offset, ${mask}L)")

  override protected def withNewChildInternal(newChild: Expression): Md5Fold =
    copy(child = newChild)
}

object Md5Fold {
  /** Shared by interpreted and generated code paths. */
  def fold(bytes: Array[Byte], offset: Int, mask: Long): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(bytes)
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (d(offset + i) & 0xffL); i -= 1 }
    v & mask
  }

  def lo(c: Column, bits: Int): Column =
    bridge.column(Md5Fold(bridge.expression(c), upperHalf = false, bits))
  def hi(c: Column, bits: Int): Column =
    bridge.column(Md5Fold(bridge.expression(c), upperHalf = true, bits))
}
