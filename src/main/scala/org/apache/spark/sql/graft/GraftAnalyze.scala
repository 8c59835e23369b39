package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

/** The `ANALYZE TABLE` bridge: Spark refuses the command outright for
  * DSv2 tables (`NOT_SUPPORTED_COMMAND_FOR_V2_TABLE`, thrown during
  * resolution — before any extension resolution rule can see the plan),
  * yet a graft-snapshot table can answer every ANALYZE-shaped question
  * from ONE manifest parse: exact row count, recorded byte lengths,
  * per-column band bounds / null census / HLL NDV estimates. So the
  * interception happens one stage earlier, at the PARSER: a delegating
  * parser recognizes `ANALYZE TABLE <t> COMPUTE STATISTICS [NOSCAN |
  * FOR COLUMNS … | FOR ALL COLUMNS]` aimed at a graft catalog and
  * emits [[GraftAnalyzeTableCommand]]; every other statement — and
  * every ANALYZE aimed elsewhere — parses through the delegate
  * untouched (same pattern as the public formats' SQL extensions,
  * e.g. Delta's DeltaSqlParser).
  *
  * The command never opens a data file (zero scan jobs — the spec
  * deletes the data files and ANALYZE still succeeds): rows/bytes come
  * from the manifest, column statistics from [[graft.sources
  * .SnapshotTable.statsSummary]] (band bounds + null census + NDV
  * sketches folded at commit time). Results persist into the table's
  * properties sidecar (`stats.rows`, `stats.bytes`,
  * `stats.analyzed_version`, `stats.col.<c>.{ndv,nulls,min_key,
  * max_key}`) where SHOW TBLPROPERTIES surfaces them; the CBO consumes
  * the SAME manifest numbers through the connector's
  * SupportsReportStatistics + per-column DSv2 statistics on every scan,
  * so plans are right even for tables never ANALYZEd — the command is
  * the SQL-parity surface, not a new stats source. */
object GraftAnalyze {
  private val AnalyzeRe =
    ("""(?is)^\s*ANALYZE\s+TABLE\s+((?:`[^`]+`|[\w$]+)(?:\s*\.\s*""" +
      """(?:`[^`]+`|[\w$]+))*)\s+COMPUTE\s+STATISTICS\s*(.*?)\s*;?\s*$""").r
  private val ForColsRe = """(?is)^FOR\s+COLUMNS\s+(.+)$""".r

  /** Some(command) when `sqlText` is an ANALYZE aimed at a graft
    * catalog; None = let the delegate parse (including malformed
    * ANALYZE text — the delegate's error is the authoritative one). */
  def intercept(sqlText: String, delegate: ParserInterface)
      : Option[LogicalPlan] = sqlText match {
    case AnalyzeRe(identText, tail) =>
      val session = SparkSession.getActiveSession.getOrElse(return None)
      val parts =
        try delegate.parseMultipartIdentifier(identText)
        catch { case scala.util.control.NonFatal(_) => return None }
      def isGraft(cat: String): Boolean =
        try session.conf.get(s"spark.sql.catalog.$cat") ==
          "graft.sources.GraftCatalog"
        catch { case scala.util.control.NonFatal(_) => false }
      val (catName, qualified) =
        if (parts.length >= 2 && isGraft(parts.head))
          (parts.head, parts.tail.mkString("."))
        else {
          val cur = session.sessionState.catalogManager.currentCatalog.name
          if (isGraft(cur)) (cur, parts.mkString(".")) else return None
        }
      val t = tail.trim
      val (cols, all) = t match {
        case "" => (Seq.empty[String], false)
        case x if x.equalsIgnoreCase("NOSCAN") => (Seq.empty[String], false)
        case x if x.matches("(?is)FOR\\s+ALL\\s+COLUMNS") =>
          (Seq.empty[String], true)
        case ForColsRe(list) =>
          (list.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq, false)
        case _ => return None // partition specs etc.: delegate decides
      }
      Some(GraftAnalyzeTableCommand(catName, qualified, cols, all))
    case _ => None
  }
}

/** Metadata-served ANALYZE for one graft catalog table — see
  * [[GraftAnalyze]]. Runs driver-side with zero Spark jobs. */
case class GraftAnalyzeTableCommand(catalogName: String, qualified: String,
                                    columns: Seq[String],
                                    allColumns: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[graft.sources.GraftCatalog]
    val t = cat.snapshotHandleFor(qualified)
    val v = t.latestVersion()
    require(v > 0, s"ANALYZE TABLE: table '$qualified' is empty")
    val snap = t.snapshot(v)
    val statsCols = t.tipStatsCols
    val wanted = if (allColumns) statsCols else columns
    val missing = wanted.filterNot(statsCols.contains)
    require(missing.isEmpty,
      s"ANALYZE TABLE $qualified FOR COLUMNS: no manifest statistics " +
        s"for (${missing.mkString(", ")}) — a metadata-served ANALYZE " +
        s"covers the table's stats_cols (${statsCols.mkString(", ")}); " +
        "add the column there (and rewrite once) to index it")
    val colProps = t.statsSummary(v)
      .filter(c => wanted.contains(c.column))
      .flatMap { c =>
        Seq(c.ndvEst.map(x => s"stats.col.${c.column}.ndv" -> x.toString),
          c.nullCount.map(x => s"stats.col.${c.column}.nulls" -> x.toString),
          c.minKey.map(x => s"stats.col.${c.column}.min_key" -> x.toString),
          c.maxKey.map(x => s"stats.col.${c.column}.max_key" -> x.toString))
          .flatten
      }
    t.setTableProperties(t.tableProperties ++ Map(
      "stats.rows" -> snap.rows.toString,
      "stats.bytes" -> t.dataBytes(v).toString,
      "stats.analyzed_version" -> v.toString) ++ colProps)
    Seq.empty
  }
}

/** Delegating parser: [[GraftAnalyze.intercept]] on parsePlan, the
  * delegate for everything else. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftAnalyze.intercept(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    GraftAnalyze.intercept(sqlText, delegate)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, ctx))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
