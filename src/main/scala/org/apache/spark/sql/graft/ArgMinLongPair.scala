package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Argmin over a lexicographic (key, value) pair of LONGs, returning the
  * value — the deterministic-argmax idiom `min(struct(key, value)).value`
  * with a FLAT aggregation buffer.
  *
  * Why it exists (r20 measurement): `min(struct(...))` carries a
  * struct-typed buffer, which HashAggregateExec cannot hold in its
  * UnsafeRow hash map, so Spark plans a SortAggregate — a Sort on BOTH
  * sides of the exchange for what is conceptually a two-long comparison
  * (misc_label_propagation paid 2 Sorts per propagation round). The
  * measured workarounds were worse: a max-then-min two-phase rewrite
  * costs an extra checkpoint + join per round (3.37 → 4.54 s), and
  * packing (-count, label) into one long caps the label range. This
  * DeclarativeAggregate keeps (bestKey, bestValue, seen) as three
  * mutable primitive slots — hash-aggregable, whole-stage-codegen'd,
  * map-side combinable — and reproduces min(struct) semantics exactly:
  * rows with a NULL key or value are ignored; ties on key resolve to
  * the smaller value; empty/all-null groups evaluate to NULL.
  */
case class ArgMinLongPair(key: Expression, value: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression]
    with ExpectsInputTypes {

  override def left: Expression = key
  override def right: Expression = value
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val bk = AttributeReference("bk", LongType, nullable = false)()
  private lazy val bv = AttributeReference("bv", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bk, bv, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = IsNotNull(key) && IsNotNull(value)
    val better = !seen || key < bk || (key === bk && value < bv)
    val take = valid && better
    Seq(If(take, key, bk), If(take, value, bv), seen || valid)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val rBetter = seen.right && (!seen.left ||
      bk.right < bk.left || (bk.right === bk.left && bv.right < bv.left))
    Seq(If(rBetter, bk.right, bk.left),
      If(rBetter, bv.right, bv.left),
      seen.left || seen.right)
  }

  override lazy val evaluateExpression: Expression =
    If(seen, bv, Literal(null, LongType))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinLongPair =
    copy(key = newLeft, value = newRight)
}

object ArgMinLongPair {
  /** The value of the row minimizing (key, value) lexicographic. */
  def argminValue(key: Column, value: Column): Column =
    bridge.column(ArgMinLongPair(
      bridge.expression(key), bridge.expression(value)).toAggregateExpression())
}
