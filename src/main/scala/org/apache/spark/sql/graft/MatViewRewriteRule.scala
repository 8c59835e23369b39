package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType}

/** Optimizer rule: rewrite an aggregate over a registered FACT scan onto
  * its materialized summary table — the classic summary-table rewrite
  * (Goldstein & Larson, SIGMOD 2001), the optimization that turns a
  * 100 TB fact rollup into a scan of a dims-cardinality parquet file.
  *
  * A registered MV (see [[graft.operators.MatViews]]) stores, per
  * grouping over `dims`: `__cnt` = count(*) and, per measure m,
  * `__sum_m` / `__min_m` / `__max_m` partials. An eligible query
  * aggregate re-aggregates those partials (sum of sums, min of mins —
  * each partial is self-mergeable), so ANY group-by over a SUBSET of
  * the dims rolls up from the MV with identical results.
  *
  * Eligibility is deliberately strict — the rewrite must be exact:
  *  - the aggregate's child is the registered fact relation under
  *    attribute-only Projects and at most one deterministic Filter whose
  *    references are all dims (the filter then applies on the MV, where
  *    those dims survive ungrouped);
  *  - every grouping expression is a bare dim column;
  *  - every aggregate is `sum(measure)`, `min(measure)`, `max(measure)`,
  *    `count(measure)` (rolls up the stored per-measure NON-NULL count),
  *    `avg(measure)` (= rolled-up sum / non-null count, non-decimal
  *    numerics), `count(literal)` / `count(*)`, or
  *    `count(DISTINCT dim[, dim...])` (exact: the MV groups by ALL dims,
  *    so it preserves the fact's distinct dim combinations) — no other
  *    DISTINCT aggregate, no FILTER clause, no count/avg over dims;
  *  - GROUP BY must be non-empty (a global aggregate over an EMPTY fact
  *    returns one row; the empty MV would return none — refuse rather
  *    than be wrong on the corner).
  *
  * Output attribute ids are preserved (each rewritten column is aliased
  * under the original exprId), so parent operators resolve untouched.
  * Sum-of-sums may widen (DECIMAL): the rollup is cast back to the
  * original aggregate's dataType. Staleness is the registrar's contract:
  * rebuild (or IVM-maintain via Meta.incrementalAggMerge — the partial
  * layout is exactly its mergeable form) when the fact changes. */
object MatViewRewriteRule extends Rule[LogicalPlan] {

  /** One registered summary: `mvPlan` is the analyzed scan of the summary
    * parquet, instantiated fresh (new expr ids) per rewrite. */
  case class MvDef(factPath: String, mvPath: String,
                   dims: Seq[String], measures: Seq[String],
                   mvPlan: LogicalPlan)

  private val registry = scala.collection.concurrent.TrieMap.empty[String, MvDef]

  private[graft] def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def register(spark: SparkSession, factPath: String, mvPath: String,
               dims: Seq[String], measures: Seq[String]): Unit = {
    val plan = spark.read.parquet(mvPath).queryExecution.analyzed
    registry.put(normalize(factPath),
      MvDef(factPath, mvPath, dims, measures, plan))
  }
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformDown {
      case agg: Aggregate if agg.resolved && agg.groupingExpressions.nonEmpty =>
        tryRewrite(agg).getOrElse(agg)
    }

  private def factPathsOf(rel: LogicalRelation): Seq[String] = rel.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toString))
    case _ => Seq.empty
  }

  /** Strip attr-only Projects and at most one deterministic Filter down
    * to the relation scan. */
  private def unwrap(p: LogicalPlan): Option[(LogicalRelation, Option[Expression])] =
    p match {
      case r: LogicalRelation => Some((r, None))
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child)
      case Filter(cond, child) if cond.deterministic =>
        unwrap(child) match {
          case Some((r, None)) => Some((r, Some(cond)))
          case _ => None // two filters: stand down
        }
      case _ => None
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    unwrap(agg.child).flatMap { case (rel, filterOpt) =>
      // the scan must cover EXACTLY the registered fact path: a
      // multi-path scan (read.parquet(fact, other)) holds rows the MV
      // never saw — rewriting it to the MV alone would drop them
      factPathsOf(rel) match {
        case Seq(single) =>
          registry.get(single).flatMap(mv => rewriteWith(agg, rel, filterOpt, mv))
        case _ => None
      }
    }

  private def rewriteWith(agg: Aggregate, rel: LogicalRelation,
                          filterOpt: Option[Expression],
                          mv: MvDef): Option[LogicalPlan] = {
    val dimSet = mv.dims.toSet
    val measureSet = mv.measures.toSet
    def isDim(a: Attribute): Boolean =
      dimSet.contains(a.name) && rel.outputSet.contains(a)

    val groupOk = agg.groupingExpressions.forall {
      case a: AttributeReference => isDim(a)
      case _ => false
    }
    val filterOk = filterOpt.forall(_.references.forall(isDim))
    if (!groupOk || !filterOk) return None

    // fresh MV attribute ids per rewrite (two rewritten aggregates in one
    // tree must not share ids)
    val mvScan = mv.mvPlan match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val mvAttr: Map[String, Attribute] = mvScan.output.map(a => a.name -> a).toMap
    def mvDim(name: String): Attribute = mvAttr(name)

    // each result expression maps, or the whole rewrite stands down
    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if isDim(a) =>
        Some(Alias(mvDim(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name) if isDim(a) =>
        Some(Alias(mvDim(a.name), name)(exprId = al.exprId))
      // count(DISTINCT dim[, dim...]): the MV groups by ALL dims, so it
      // preserves exactly the distinct dim combinations present in the
      // fact — the same distinct count over the MV's dim columns is
      // identical (including NULL-skip semantics, which both sides share)
      case al @ Alias(ae: AggregateExpression, name)
          if ae.filter.isEmpty && ae.isDistinct =>
        ae.aggregateFunction match {
          case Count(children) if children.nonEmpty && children.forall {
              case a: AttributeReference => isDim(a)
              case _ => false } =>
            val mapped = children.map { case a: AttributeReference => mvDim(a.name) }
            Some(Alias(Count(mapped).toAggregateExpression(isDistinct = true),
              name)(exprId = al.exprId))
          case _ => None // any other DISTINCT aggregate: stand down
        }
      case al @ Alias(ae: AggregateExpression, name)
          if ae.filter.isEmpty && !ae.isDistinct =>
        val rollup: Option[Expression] = ae.aggregateFunction match {
          case s @ Sum(e: AttributeReference, _) if measureSet.contains(e.name) =>
            Some(s.copy(child = mvAttr(s"__sum_${e.name}")).toAggregateExpression())
          case m @ Min(e: AttributeReference) if measureSet.contains(e.name) =>
            Some(m.copy(child = mvAttr(s"__min_${e.name}")).toAggregateExpression())
          case m @ Max(e: AttributeReference) if measureSet.contains(e.name) =>
            Some(m.copy(child = mvAttr(s"__max_${e.name}")).toAggregateExpression())
          // count(*) / count(lit): only when every child is foldable AND
          // non-nullable — count(NULL) is foldable but must return 0 per
          // group, not the row count
          case Count(children) if children.forall(c => c.foldable && !c.nullable) =>
            Some(Sum(mvAttr("__cnt")).toAggregateExpression())
          // count(m): the stored NON-NULL count rolls up by sum. Guarded
          // on the column existing so pre-__cntn summaries registered via
          // register() still work (those shapes just stand down).
          case Count(Seq(e: AttributeReference))
              if measureSet.contains(e.name) && mvAttr.contains(s"__cntn_${e.name}") =>
            Some(Sum(mvAttr(s"__cntn_${e.name}")).toAggregateExpression())
          // avg(m) = sum(__sum_m) / sum(__cntn_m) — exact for the same
          // reason avg itself is sum/count. Restricted to non-decimal
          // numerics (DECIMAL avg has its own precision/scale rules).
          // Double avgs can differ in the last ulp from the direct plan
          // (different summation grouping) — the same reassociation
          // nondeterminism Spark's own partition order already has.
          case Average(e: AttributeReference, _)
              if measureSet.contains(e.name) && mvAttr.contains(s"__cntn_${e.name}") &&
                 (e.dataType == DoubleType || e.dataType == FloatType ||
                  e.dataType == LongType || e.dataType == IntegerType) =>
            Some(Divide(
              Cast(Sum(mvAttr(s"__sum_${e.name}")).toAggregateExpression(), DoubleType),
              Cast(Sum(mvAttr(s"__cntn_${e.name}")).toAggregateExpression(), DoubleType)))
          case _ => None
        }
        rollup.map { r =>
          val cast = if (r.dataType == al.dataType) r else Cast(r, al.dataType)
          Alias(cast, name)(exprId = al.exprId)
        }
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None

    val newChild = filterOpt match {
      case Some(cond) =>
        val dimMap: Map[ExprId, Attribute] =
          rel.output.filter(isDim).map(a => a.exprId -> mvDim(a.name)).toMap
        Filter(cond.transform {
          case a: AttributeReference if dimMap.contains(a.exprId) => dimMap(a.exprId)
        }, mvScan)
      case None => mvScan
    }
    val newGroups = agg.groupingExpressions.map {
      case a: AttributeReference => mvDim(a.name)
    }
    Some(Aggregate(newGroups, rewritten.map(_.get), newChild))
  }
}
