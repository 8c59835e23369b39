package org.apache.spark.sql.graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, V1ScanWrapper}
import graft.sources.GraftSnapshotScan

/** Automatic join-driven FILE skipping for snapshot-table scans — the
  * optimizer-integrated form of [[graft.operators.JoinSkipping]]: when a
  * plain `spark.sql` query joins a `graft-snapshot` scan to a
  * broadcast-sized dimension on a band-indexed column, resolve the dim
  * side's distinct join keys at planning time and fold them into the
  * scan as a point-pruning lane, so fact files provably holding no dim
  * key are never opened. Spark's own DPP and runtime bloom filters
  * cannot do this: the scan compiles through the V1 delegate (no
  * `BatchScanExec` runtime-filter path) and the manifest's bands and
  * blooms are invisible to the optimizer.
  *
  * Soundness. Equi-joins are null-rejecting, and the manifest admits
  * every file whose band (and bloom, when indexed) might hold SOME dim
  * key — pruned fact rows match no dim key, so they are exactly the rows
  * the join itself would drop. That makes the rewrite sound only for
  * join sides whose non-matching rows cannot reach the output:
  *  - prune LEFT for Inner / LeftSemi / RightOuter,
  *  - prune RIGHT for Inner / LeftSemi / LeftOuter / LeftAnti
  * (LeftAnti's right side only ever disqualifies left rows it matches;
  * a pruned right row matches nothing). The scan is located through
  * per-row passthrough operators only (Project / Filter / repartition,
  * and intermediate joins on the non-null-extended side), so removing a
  * scan row removes exactly that row's descendants — never an
  * aggregate, window, or limit result another row depends on.
  *
  * The dim side executes EAGERLY at planning (the same bounded collect
  * a broadcast join ships cluster-wide, paid once more). Guards: dim
  * stats under the broadcast threshold, no Limit/Sample/nondeterminism
  * anywhere in the dim plan (a re-execution must yield the same key
  * set). Past `spark.graft.joinSkipping.maxKeys` distinct keys — or
  * when a key value derives no band key — the lane degrades to the
  * dim's [min, max] HULL band (one distributed aggregate, no unbounded
  * collect), which still prunes a fact clustered on the join key; an
  * underivable hull stands the lane down entirely.
  * `spark.graft.joinSkipping.enabled=false` disables the rule.
  *
  * Cast handling (the int-fact⋈bigint-dim shape Spark itself produces
  * via implicit widening): the DIM operand may be any deterministic
  * expression — its actual values are what the lane evaluates; the
  * FACT operand unwraps `Cast(attr)` when the cast is an integral
  * widening (injective + order-preserving), narrowing dim keys back
  * into the fact column's own type, with out-of-range keys dropping
  * (they match no fact row) and the hull clamping to the type range.
  *
  * Registered post-pushdown (preCBO / extraOptimizations — the scan
  * exists only after `V2ScanRelationPushDown`). Idempotent: a rewritten
  * scan remembers its join-pruned columns and refuses a second lane. */
object JoinSkippingRule extends Rule[LogicalPlan] with PredicateHelper {
  val EnabledConf = "spark.graft.joinSkipping.enabled"
  val MaxKeysConf = "spark.graft.joinSkipping.maxKeys"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledConf, "true") != "true") return plan
    if (plan.isStreaming) return plan
    val maxKeys = conf.getConfString(MaxKeysConf, "1000").toIntOption
      .filter(_ > 0).getOrElse(1000)
    plan.transformUp {
      case j: Join => rewrite(j, maxKeys).getOrElse(j)
    }
  }

  /** Dropping never-matching rows from the given side is a no-op. */
  private def canPrune(joinType: JoinType, pruneLeft: Boolean): Boolean =
    joinType match {
      case Inner | LeftSemi => true
      case RightOuter => pruneLeft
      case LeftOuter | LeftAnti => !pruneLeft
      case _ => false
    }

  /** The snapshot scan relation producing `key`, reached through
    * per-row passthrough operators only. Intermediate joins are walked
    * into the side holding the attribute when that side is never
    * null-extended (its rows appear in the join output as themselves,
    * possibly duplicated — removal stays per-row). */
  private def findScan(p: LogicalPlan, key: Attribute)
      : Option[DataSourceV2ScanRelation] = p match {
    case r: DataSourceV2ScanRelation if r.outputSet.contains(key) =>
      r.scan match {
        case w: V1ScanWrapper if w.v1Scan.isInstanceOf[GraftSnapshotScan] => Some(r)
        case _ => None
      }
    case pr: Project if pr.outputSet.contains(key) => findScan(pr.child, key)
    case f: Filter => findScan(f.child, key)
    case r: RepartitionOperation => findScan(r.child, key)
    case jn @ Join(l, r, jt, _, _) if jn.outputSet.contains(key) =>
      if (l.outputSet.contains(key) &&
          (jt == Inner || jt == Cross || jt == LeftOuter || jt == LeftSemi ||
            jt == LeftAnti))
        findScan(l, key)
      else if (r.outputSet.contains(key) && (jt == Inner || jt == Cross ||
          jt == RightOuter))
        findScan(r, key)
      else None
    case _ => None
  }

  /** A plan-time key collect must equal what the runtime join will see:
    * refuse nondeterministic expressions and row-set-unstable operators
    * anywhere in the dim plan. */
  private def stableDim(p: LogicalPlan): Boolean =
    p.collectFirst {
      case _: LocalLimit => ()
      case _: GlobalLimit => ()
      case _: Sample => ()
      case q if q.expressions.exists(e => !e.deterministic) => ()
    }.isEmpty

  private def smallEnough(p: LogicalPlan): Boolean = {
    val threshold = conf.autoBroadcastJoinThreshold
    val limit = if (threshold > 0) threshold else 10L * 1024 * 1024
    try p.stats.sizeInBytes <= BigInt(limit)
    catch { case NonFatal(_) => false }
  }

  /** The fact-side key reading of one equi-operand: a bare scan
    * attribute, or `Cast(attr)` when the cast is an integral WIDENING
    * (byte→short→int→long). Widening casts are injective and
    * order-preserving, so `cast(fact.k) = dim.j` matches exactly the
    * fact rows whose key equals a dim value NARROWED back into the
    * fact column's own type — dim values outside that type's range
    * match nothing and simply drop from the pruning lane. Non-widening
    * casts (narrowing, string, decimal) are not invertible per-value
    * and stand the lane down. */
  private def factKeyOf(e: Expression): Option[(Attribute, Boolean)] =
    e match {
      case a: AttributeReference => Some((a, false))
      case Cast(a: AttributeReference, dt, _, _)
          if injectiveWidening(a.dataType, dt) => Some((a, true))
      case _ => None
    }

  private def integralRank(dt: org.apache.spark.sql.types.DataType)
      : Option[Int] = dt match {
    case org.apache.spark.sql.types.ByteType => Some(0)
    case org.apache.spark.sql.types.ShortType => Some(1)
    case org.apache.spark.sql.types.IntegerType => Some(2)
    case org.apache.spark.sql.types.LongType => Some(3)
    case _ => None
  }

  private def injectiveWidening(from: org.apache.spark.sql.types.DataType,
                                to: org.apache.spark.sql.types.DataType)
      : Boolean =
    (integralRank(from), integralRank(to)) match {
      case (Some(f), Some(t)) => f <= t
      case _ => false
    }

  /** A collected wide-side value narrowed into the fact column's own
    * integral type; None when out of range (such a dim key can match
    * no fact row). */
  private def narrowTo(v: Any, to: org.apache.spark.sql.types.DataType)
      : Option[Any] = v match {
    case n: java.lang.Number =>
      val l = n.longValue
      to match {
        case org.apache.spark.sql.types.LongType => Some(l)
        case org.apache.spark.sql.types.IntegerType =>
          if (l >= Int.MinValue && l <= Int.MaxValue) Some(l.toInt) else None
        case org.apache.spark.sql.types.ShortType =>
          if (l >= Short.MinValue && l <= Short.MaxValue) Some(l.toShort)
          else None
        case org.apache.spark.sql.types.ByteType =>
          if (l >= Byte.MinValue && l <= Byte.MaxValue) Some(l.toByte)
          else None
        case _ => None
      }
    case _ => None
  }

  /** The dim hull [lo, hi] CLAMPED into the fact type's range (sound
    * for order-preserving casts: out-of-range ends move to the type
    * bound, since values beyond it match nothing). None when the
    * clamped range is empty — no dim value is representable, the lane
    * stands down. */
  private def narrowRange(loV: Any, hiV: Any,
                          to: org.apache.spark.sql.types.DataType)
      : Option[(Any, Any)] = (loV, hiV) match {
    case (a: java.lang.Number, b: java.lang.Number) =>
      val (mn, mx) = to match {
        case org.apache.spark.sql.types.LongType =>
          (Long.MinValue, Long.MaxValue)
        case org.apache.spark.sql.types.IntegerType =>
          (Int.MinValue.toLong, Int.MaxValue.toLong)
        case org.apache.spark.sql.types.ShortType =>
          (Short.MinValue.toLong, Short.MaxValue.toLong)
        case org.apache.spark.sql.types.ByteType =>
          (Byte.MinValue.toLong, Byte.MaxValue.toLong)
        case _ => return None
      }
      val lo = math.max(a.longValue, mn)
      val hi = math.min(b.longValue, mx)
      if (lo > hi) None
      else for { l <- narrowTo(lo, to); h <- narrowTo(hi, to) } yield (l, h)
    case _ => None
  }

  private def rewrite(j: Join, maxKeys: Int): Option[LogicalPlan] = j match {
    case Join(left, right, jt, Some(cond), _) if j.resolved =>
      val equi = splitConjunctivePredicates(cond).collect {
        case EqualTo(a, b) => (a, b)
      }
      // every (factSide, factKey, dimSide, dimExpr) reading of each
      // equi-conjunct; first applicable one rewrites (transformUp's
      // fixed visit order keeps this deterministic), the rest land on
      // later rule passes via the per-column idempotence flag. The dim
      // operand may be ANY deterministic expression over the dim side
      // (a bare attribute, `cast(dim.k as bigint)`, an arithmetic
      // derivation): the lane evaluates the actual expression values,
      // so no invertibility is needed on that side.
      val candidates = equi.flatMap { case (a, b) =>
        Seq((a, b, true), (b, a, false)).flatMap { case (fe, de, factIsLeft) =>
          val factSide = if (factIsLeft) left else right
          val dimSide = if (factIsLeft) right else left
          factKeyOf(fe).collect {
            case (fk, fcast)
                if factSide.outputSet.contains(fk) &&
                  de.references.nonEmpty &&
                  de.references.subsetOf(dimSide.outputSet) &&
                  de.deterministic &&
                  canPrune(jt, factIsLeft) =>
              (fk, fcast, de, factIsLeft)
          }
        }
      }
      candidates.view.flatMap { case (factKey, castWrapped, dimExpr, factIsLeft) =>
        applyOne(j, factKey, castWrapped, dimExpr, factIsLeft, maxKeys)
      }.headOption
    case _ => None
  }

  private def applyOne(j: Join, factKey: Attribute, castWrapped: Boolean,
                       dimExpr: Expression, factIsLeft: Boolean,
                       maxKeys: Int): Option[LogicalPlan] =
    try {
      val factSide = if (factIsLeft) j.left else j.right
      val dimSide = if (factIsLeft) j.right else j.left
      val rel = findScan(factSide, factKey).getOrElse(return None)
      val scan = rel.scan.asInstanceOf[V1ScanWrapper].v1Scan
        .asInstanceOf[GraftSnapshotScan]
      if (!scan.joinSkippingCandidate(factKey.name)) return None
      if (!stableDim(dimSide) || !smallEnough(dimSide)) return None
      // the dim's distinct non-null keys, collected BOUNDED — past the
      // cap (or when a value derives no band key) the lane degrades to
      // the dim's [min, max] HULL band: one distributed aggregate, zero
      // unbounded collects, still pruning a key-clustered fact
      val spark = SparkSession.active
      val keysPlan = Project(Seq(Alias(dimExpr, "graft_join_key")()), dimSide)
      val keysDf = bridge.ofRows(spark, keysPlan).na.drop()
      val sample = keysDf.distinct().limit(maxKeys + 1).collect()
      if (sample.isEmpty) return None
      def hull(): Option[GraftSnapshotScan] = {
        val row = keysDf.agg(
          org.apache.spark.sql.functions.min(keysDf.columns.head),
          org.apache.spark.sql.functions.max(keysDf.columns.head)).head()
        if (row.isNullAt(0) || row.isNullAt(1)) None
        else if (!castWrapped)
          scan.withJoinBand(factKey.name, row.get(0), row.get(1))
        else narrowRange(row.get(0), row.get(1), factKey.dataType).flatMap {
          case (lo, hi) => scan.withJoinBand(factKey.name, lo, hi)
        }
      }
      // under a fact-side cast, keys narrow into the fact column's own
      // type (band keys derive in that type); out-of-range dim values
      // match no fact row and drop — an all-dropped set admits no files,
      // which is exactly the join's result for those keys
      val keyVals =
        if (!castWrapped) sample.toSeq.map(_.get(0))
        else sample.toSeq.flatMap(r => narrowTo(r.get(0), factKey.dataType))
      val pruned =
        (if (sample.length > maxKeys) hull()
         else scan.withJoinKeys(factKey.name, keyVals)
           .orElse(hull()))
          .getOrElse(return None)
      val wrapper = rel.scan.asInstanceOf[V1ScanWrapper]
      val newRel = rel.copy(scan = new StatsV1ScanWrapper(pruned,
        wrapper.handledFilters, wrapper.pushedDownOperators))
      val newFact = factSide.transformUp {
        case r: DataSourceV2ScanRelation if r.eq(rel) => newRel
      }
      Some(if (factIsLeft) j.copy(left = newFact) else j.copy(right = newFact))
    } catch { case NonFatal(_) => None }
}
