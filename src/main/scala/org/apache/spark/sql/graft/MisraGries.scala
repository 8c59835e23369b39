package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native imperative aggregate —
  * the constant-memory answer to "which keys dominate this column"
  * (skew diagnosis, hot-key detection) when an exact group-by of the
  * full key domain is not affordable.
  *
  * The summary holds at most k-1 (term, count) counters per partition
  * (update: increment a held term, admit into a free slot, else decrement
  * all) and merges by adding summaries then subtracting the k-th largest
  * count (Agrawal/Cormode "mergeable summaries" reduction), so the
  * end-to-end guarantee survives arbitrary partitioning and merge order:
  * every term with true frequency > n/k is present, and each reported
  * estimate sits in [true - n/k, true]. Exact per-candidate counts —
  * WHICH sub-heavy terms appear may vary with partition layout — are the
  * caller's second cheap pass over the candidate set if needed.
  *
  * eval returns array<struct<term,est>> ordered by (est desc, term asc).
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {
  require(k >= 2, s"k must be >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val term = v.asInstanceOf[UTF8String].toString
      buf.get(term) match {
        case Some(c) => buf.update(term, c + 1)
        case None if buf.size < k - 1 => buf.update(term, 1L)
        case None =>
          // decrement-all; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (t, c) => if (c == 1) dead += t else buf.update(t, c - 1) }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k - 1) {
      // subtract the k-th largest count from everything, keep positives:
      // the mergeable-summaries reduction back to k-1 counters
      val kth = buf.values.toArray.sortBy(-_).apply(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (t, c) => if (c - kth <= 0) dead += t else buf.update(t, c - kth) }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.asInstanceOf[Array[Any]])
  }

  // length-prefixed raw UTF-8, not writeUTF — writeUTF throws on terms
  // over 64 KiB, and a sketch over an arbitrary string column (long text
  // values are exactly where skew diagnosis runs) must not care
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column-API entry: heavy-hitter candidates of `c` with k counters. */
  def apply(c: Column, k: Int): Column =
    bridge.column(new MisraGries(bridge.expression(c), k).toAggregateExpression())
}
