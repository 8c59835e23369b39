package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import graft.operators.SkylineCore

/** Skyline as a FIRST-CLASS Catalyst operator — the full custom-operator
  * extension path (logical node → planner strategy → physical operator,
  * SURVEY.md §7's tier (c)), for the semantics `graft.operators.Skyline`
  * also provides through mapPartitions (same [[SkylineCore]] frontier
  * logic, so the paths cannot diverge). The logical node composes with
  * the rest of the plan and explains like any operator; the physical
  * operator runs the two-phase distributed frontier directly over
  * InternalRows — no row conversion, no encoder.
  *
  * Registration: the config path
  * (`spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`)
  * injects [[SkylineStrategy]] at session build; [[GraftFunctions.register]]
  * installs it into a running session; [[SkylinePlan.of]] self-registers
  * if neither has.
  */
case class SkylineNode(minimize: Seq[Expression], child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): SkylineNode =
    copy(child = newChild)
}

case class SkylineExec(minimize: Seq[Expression], child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    // everything the task closures capture is local: two bound
    // expressions and SkylineCore's static functions — NOT `this` (which
    // would drag the whole physical plan tree into every closure)
    val bound = minimize.map(BindReferences.bindReference(_, child.output))
    val vals = (r: InternalRow) => bound.map(_.eval(r) match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"skyline minimize expression must be numeric and non-null, got $other")
    }).toArray
    // values are materialized to doubles BEFORE the dominance check, so
    // the reused row buffer is only copied when a row enters the frontier
    val retain = (r: InternalRow) => r.copy()
    val pass = (it: Iterator[InternalRow]) =>
      SkylineCore.frontierPass[InternalRow](it, vals, retain)
    child.execute().mapPartitions(pass)
      // real shuffle boundary: coalesce(1) would be a narrow dependency
      // and serialize phase 1 onto the single global task
      .repartition(1)
      .mapPartitions(pass)
  }
}

object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylineNode(minimize, child) => SkylineExec(minimize, planLater(child)) :: Nil
    case _ => Nil
  }
}

object SkylinePlan {

  /** Install [[SkylineStrategy]] into a running session (idempotent;
    * sessions built with the GraftExtensions config already have it). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val present = cs.sessionState.planner.strategies.contains(SkylineStrategy) ||
      cs.experimental.extraStrategies.contains(SkylineStrategy)
    if (!present)
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ SkylineStrategy
  }

  /** Wrap `df` in a SkylineNode minimizing the named (numeric, non-null)
    * columns. */
  def of(df: DataFrame, minimize: Seq[String]): DataFrame = {
    require(minimize.nonEmpty, "skyline needs at least one minimize column")
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    install(spark)
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    val exprs: Seq[Expression] = minimize.map { name =>
      analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"skyline column '$name' not in ${analyzed.output.map(_.name)}"))
    }
    org.apache.spark.sql.classic.Dataset.ofRows(spark, SkylineNode(exprs, analyzed))
  }
}
