package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a non-equi inner join whose condition contains
  * a `p >= lo AND p <= hi` band (point on one side, bounds on the other)
  * into the bin-bucketed equi-join `graft.operators.RangeJoin` builds by
  * hand — Spark otherwise plans these as BroadcastNestedLoopJoin (range
  * side must fit in memory) or a cartesian product (it doesn't).
  *
  * The rewrite projects `floorDiv(p, w)` onto the point side, explodes
  * `sequence(floorDiv(lo, w), floorDiv(hi, w))` on the range side, joins
  * on bin equality and keeps the original band predicate as the exactness
  * re-check. Each point row carries exactly one bin, so no dedup is
  * needed. floorDiv is the exact integer form `(x - pmod(x, w)) div w` —
  * correct on negatives, no double rounding at any magnitude.
  *
  * Conf-gated: fires only when `spark.graft.rangeJoin.binWidth` is set
  * (the width is workload knowledge — pick it near the typical range
  * length). Self-limiting: the rewritten join has an equi-conjunct, so
  * the rule's eligibility check refuses it on the next pass. Eligibility
  * is deliberately narrow: INNER join, integral band columns, and no
  * existing equi-conjunct (with one, Spark already hash-joins and the
  * band is a cheap post-filter).
  */
object RangeBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  val WidthConf = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "").trim
    if (width.isEmpty) plan
    else width.toLongOption.filter(_ > 0) match {
      case None =>
        // a malformed width must not fail every query in the session —
        // the rule is an optimization, warn and stand down
        logWarning(s"ignoring invalid $WidthConf='$width' (need a positive long)")
        plan
      case Some(w) =>
        plan.transformUp {
          case j: Join => rewrite(j, w).getOrElse(j)
        }
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** exact floor division on longs: (x - pmod(x, w)) div w */
  private def floorDiv(x: Expression, w: Long): Expression = {
    val lx = asLong(x)
    IntegralDivide(Subtract(lx, Pmod(lx, Literal(w)), evalMode = EvalMode.LEGACY),
      Literal(w), evalMode = EvalMode.LEGACY)
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = j match {
    case Join(left, right, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
        if (e.references.isEmpty) None
        else if (e.references.subsetOf(left.outputSet)) Some(true)
        else if (e.references.subsetOf(right.outputSet)) Some(false)
        else None
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
        case _ => false
      }
      if (hasEqui) return None
      // normalize bounds to (point, bound, isLower). Each comparison has
      // TWO readings — `a >= b` is a lower bound if a is the point, an
      // upper bound if b is — so emit both and let the pairing pick the
      // consistent one (a single overlapping pattern here silently
      // shadows the upper-bound case).
      val bounds = conjuncts.flatMap {
        case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
        case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
        case _ => Nil
      }.filter { case (p, b, _) =>
        integral(p) && integral(b) && p.deterministic && b.deterministic &&
          (for (ps <- sideOf(p); bs <- sideOf(b)) yield ps != bs).getOrElse(false)
      }
      val band = (for {
        (p, lo, true) <- bounds.view
        (p2, hi, false) <- bounds
        if p.semanticEquals(p2)
      } yield (p, lo, hi)).headOption
      band.map { case (p, lo, hi) =>
        val pointIsLeft = sideOf(p).get
        val (pointSide, rangeSide) = if (pointIsLeft) (left, right) else (right, left)
        val pBin = Alias(floorDiv(p, w), "__graft_bin_p")()
        val newPoint = Project(pointSide.output :+ pBin, pointSide)
        val rBinAttr = AttributeReference("__graft_bin_r", LongType, nullable = false)()
        // inverted (lo > hi) or null-bounded ranges match nothing under
        // the band predicate — filter them out BEFORE the explode, where
        // Sequence(start, stop) would otherwise count DOWNWARD and blow
        // up on a single dirty row
        val sane = Filter(LessThanOrEqual(lo, hi), rangeSide)
        val gen = Generate(
          // explicit timeZoneId: optimizer-introduced expressions never
          // pass through ResolveTimeZone, and Sequence is timezone-aware
          Explode(Sequence(floorDiv(lo, w), floorDiv(hi, w), None,
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(rBinAttr), child = sane)
        val newCond = And(EqualTo(pBin.toAttribute, rBinAttr), cond)
        val (nl, nr) = if (pointIsLeft) (newPoint, gen) else (gen, newPoint)
        Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
      }
    case _ => None
  }
}
