package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import scala.collection.mutable.ArrayBuffer

/** Skyline as a FIRST-CLASS Catalyst operator — the full custom-operator
  * extension path (logical node → planner strategy → physical operator,
  * SURVEY.md §7's tier (c)), for the semantics `graft.operators.Skyline`
  * also provides through mapPartitions. The logical node composes with
  * the rest of the plan (Catalyst still pushes filters below it via its
  * child, prunes columns it outputs, and explains it like any operator),
  * and the physical operator implements the two-phase distributed
  * frontier directly over InternalRows — no row conversion, no encoder.
  *
  * Registered by [[GraftExtensions]] (config path) or
  * [[GraftFunctions.register]] (running session).
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
    val bound = minimize.map(BindReferences.bindReference(_, child.output))
    def frontierPass(it: Iterator[InternalRow]): Iterator[InternalRow] = {
      val frontier = ArrayBuffer.empty[(InternalRow, Array[Double])]
      it.foreach { row =>
        val r = row.copy() // iterator rows are reused buffers
        val v = bound.map(_.eval(r) match {
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"skyline minimize expression must be numeric and non-null, got $other")
        }).toArray
        if (!frontier.exists { case (_, w) => dominates(w, v) }) {
          frontier.filterInPlace { case (_, w) => !dominates(v, w) }
          frontier += ((r, v))
        }
      }
      frontier.iterator.map(_._1)
    }
    val local = child.execute().mapPartitions(frontierPass)
    // global pass over the union of local frontiers (small by construction)
    local.coalesce(1).mapPartitions(frontierPass)
  }

  private def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var allLe = true; var oneLt = false; var i = 0
    while (i < a.length && allLe) {
      if (a(i) > b(i)) allLe = false
      else if (a(i) < b(i)) oneLt = true
      i += 1
    }
    allLe && oneLt
  }
}

object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylineNode(minimize, child) => SkylineExec(minimize, planLater(child)) :: Nil
    case _ => Nil
  }
}

object SkylinePlan {

  /** Wrap `df` in a SkylineNode minimizing the named (numeric, non-null)
    * columns. Injects [[SkylineStrategy]] into the session's planner if
    * the extensions path has not already. */
  def of(df: DataFrame, minimize: Seq[String]): DataFrame = {
    require(minimize.nonEmpty, "skyline needs at least one minimize column")
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(SkylineStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SkylineStrategy
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
