package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact per-group top-k as a native mergeable aggregate — the scale
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY s) <= k`
  * idiom. The window form shuffles and SORTS every row of every group;
  * this aggregate keeps a k-element bounded heap per group, combines
  * map-side, and merges heaps at reduce time, so the shuffle carries at
  * most k entries per group per map partition and nothing ever sorts the
  * full group. Exactness (unlike Misra-Gries) comes from top-k being
  * decomposable: the global top-k is contained in the union of per-
  * partition top-ks.
  *
  * Ranking is (score DESC, payload ASC) — the payload tiebreak makes the
  * result deterministic under any partitioning. eval returns
  * array<struct<score,payload>> in rank order; callers posexplode to rows.
  */
case class TopKAgg(scoreChild: Expression, payloadChild: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] with ExpectsInputTypes {
  require(k >= 1, s"k must be >= 1, got $k")

  override def left: Expression = scoreChild
  override def right: Expression = payloadChild
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  /** head = the WORST kept entry (lowest score, then largest payload), so
    * admission is an O(1) peek + O(log k) replace */
  private def heapOrder: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(b._2, a._2)
      }
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    // initial capacity grows on demand — an eager k-slot array per GROUP
    // buffer would pin O(k) memory for every group regardless of size
    new java.util.PriorityQueue[(Double, Long)](math.min(k, 16), heapOrder)

  private def admit(buf: java.util.PriorityQueue[(Double, Long)],
                    score: Double, payload: Long): Unit =
    if (buf.size < k) buf.add((score, payload))
    else {
      val worst = buf.peek()
      // Double.compare, not primitive > : the admission test must use the
      // SAME total order as heapOrder, or a NaN score (sorted greatest,
      // like Spark's window ordering) is kept when it arrives before the
      // heap fills but rejected after — making results arrival-order
      // dependent (cosineSim yields NaN for zero-norm vectors)
      val c = java.lang.Double.compare(score, worst._1)
      val better = c > 0 || (c == 0 && payload < worst._2)
      if (better) { buf.poll(); buf.add((score, payload)) }
    }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = scoreChild.eval(input)
    val p = payloadChild.eval(input)
    if (s != null && p != null)
      admit(buf, s.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.PriorityQueue[(Double, Long)],
                     other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val e = it.next(); admit(buf, e._1, e._2) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size))
    java.util.Arrays.sort(arr, heapOrder.reversed())
    new GenericArrayData(arr.map { case (s, p) =>
      InternalRow(s, p)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); out.writeDouble(e._1); out.writeLong(e._2) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKAgg =
    copy(scoreChild = newLeft, payloadChild = newRight)
}

object TopKAgg {
  /** Column-API entry: top `k` (score, payload) pairs by
    * (score DESC, payload ASC). */
  def apply(score: Column, payload: Column, k: Int): Column =
    bridge.column(new TopKAgg(
      bridge.expression(score), bridge.expression(payload), k).toAggregateExpression())
}
