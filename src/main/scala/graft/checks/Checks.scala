package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's three data-quality layers (SURVEY.md §2.10: Python
  * validators Q1-Q9, Soda YAML Q10-Q11, dbt schema tests Q12) unified into
  * one declarative check library.
  *
  * Design for scale: all row-level checks compile into ONE aggregation pass
  * (`sum(when(violation,1))` columns) — N checks cost a single scan +
  * partial/final agg, not N jobs. Schema/metadata checks cost no job at all.
  * The reference pulled whole tables into pandas for these
  * (validate_extracted_data.py:63-64); here they stay distributed.
  */
sealed trait Check {
  def name: String
}

/** Q1 (validate_table_schema): expected ⊆ actual column set. */
final case class SchemaSuperset(expected: Seq[String], name: String = "schema_superset") extends Check
/** Q5 (validate_schema): exact column-set equality. */
final case class SchemaExact(expected: Seq[String], name: String = "schema_exact") extends Check
/** Q9 dtype asserts (validate_staging_data.py:32-38). */
final case class TypedColumns(types: Map[String, DataType], name: String = "typed_columns") extends Check
/** Q10 soda `schema:` item carrying both facets (required columns + column
  * types) under a single check name (soda checks/transform YAMLs). */
final case class SchemaAndTypes(required: Seq[String], types: Map[String, DataType],
                                name: String = "schema") extends Check
/** Q2/A7 (validate_row_count): df.count >= min (MIN_ROWS=100, config.py:115). */
final case class RowCountMin(min: Long, name: String = "row_count_min") extends Check
/** Q3/Q6 (validate_null_values / validate_non_null): no nulls in critical cols. */
final case class NonNull(cols: Seq[String], name: String = "non_null") extends Check
/** Q4 (validate_duplicates): full-row duplicates when cols empty; else Q7/A8
  * composite-key duplicates (duplicate rows beyond the first per key). */
final case class UniqueKey(cols: Seq[String], name: String = "unique_key") extends Check
/** Q9/A9/Q12: value >= min (covers soda `min(c) fail when < 0` and the
  * reference's malformed accepted_values-as-range, schema.yml:24-28). */
final case class RangeMin(col: String, min: Double, name: String = "range_min") extends Check
/** Q9 consistency: col >= other columnwise (media_cost_eur >= cpc,
  * revenue >= media_cost_eur; validate_staging_data.py:47-59). */
final case class ColumnGte(col: String, other: String, name: String = "column_gte") extends Check
/** A9/Q12 (soda invalid_count / dbt accepted_values): values ∈ allowed. */
final case class AcceptedValues(col: String, allowed: Seq[String], name: String = "accepted_values") extends Check
/** Q11 (soda failed-rows query): arbitrary violation predicate. */
final case class FailedRowsWhere(predicate: Column, name: String = "failed_rows") extends Check

final case class CheckResult(check_name: String, violations: Long, passed: Boolean)

object Checks {

  /** Violation-count column for a row-level check (null ⇒ no violation). */
  private def violationCond(c: Check): Option[Column] = c match {
    case NonNull(cols, _) => Some(cols.map(col(_).isNull).reduce(_ || _))
    case RangeMin(cl, mn, _) => Some(col(cl) < mn)
    case ColumnGte(a, b, _) => Some(col(a) < col(b))
    case AcceptedValues(cl, allowed, _) => Some(!col(cl).isin(allowed: _*))
    case FailedRowsWhere(p, _) => Some(p)
    case _ => None
  }

  /** Evaluate a suite in AT MOST ONE job: row-level violation counts,
    * the row count, and every UniqueKey's distinct-key count all fold into
    * a single aggregation (multiple count_distincts expand in one pass).
    * Schema checks are metadata-only. Returns one CheckResult per check. */
  def evaluate(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] = {
    val dupNames = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dupNames.isEmpty,
      s"check names must be unique (they key the aggregation columns); duplicated: ${dupNames.mkString(", ")}")
    val rowLevel = checks.flatMap(c => violationCond(c).map(c.name -> _))
    val uniques = checks.collect { case u: UniqueKey => u }
    val needsCount = checks.exists(_.isInstanceOf[RowCountMin]) ||
      rowLevel.nonEmpty || uniques.nonEmpty

    val aggCols =
      (if (needsCount) Seq(count(lit(1)).as("__n")) else Seq.empty) ++
        rowLevel.map { case (n, cond) =>
          sum(when(cond, 1L).otherwise(0L)).as(s"__v_$n")
        } ++
        uniques.map { u =>
          val keyCols = if (u.cols.isEmpty) df.columns.toSeq else u.cols
          count_distinct(struct(keyCols.map(col): _*)).as(s"__d_${u.name}")
        }
    val aggRow = if (aggCols.nonEmpty) Some(df.agg(aggCols.head, aggCols.tail: _*).collect()(0)) else None
    def aggVal(name: String): Long =
      aggRow.map(r => if (r.isNullAt(r.fieldIndex(name))) 0L else r.getLong(r.fieldIndex(name))).getOrElse(0L)

    checks.map {
      case c @ SchemaSuperset(expected, _) =>
        val missing = expected.toSet -- df.columns.toSet
        CheckResult(c.name, missing.size.toLong, missing.isEmpty)
      case c @ SchemaExact(expected, _) =>
        val diff = (expected.toSet diff df.columns.toSet) ++ (df.columns.toSet diff expected.toSet)
        CheckResult(c.name, diff.size.toLong, diff.isEmpty)
      case c @ TypedColumns(types, _) =>
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
        val bad = types.count { case (n, t) => !actual.get(n).contains(t) }
        CheckResult(c.name, bad.toLong, bad == 0)
      case c @ SchemaAndTypes(required, types, _) =>
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
        val missing = required.count(r => !actual.contains(r))
        val badTypes = types.count { case (n, t) => !actual.get(n).contains(t) }
        CheckResult(c.name, (missing + badTypes).toLong, missing + badTypes == 0)
      case c @ RowCountMin(min, _) =>
        val n = aggVal("__n")
        CheckResult(c.name, if (n >= min) 0L else min - n, n >= min)
      case c: UniqueKey =>
        val dups = aggVal("__n") - aggVal(s"__d_${c.name}")
        CheckResult(c.name, dups, dups == 0L)
      case c =>
        val v = aggVal(s"__v_${c.name}")
        CheckResult(c.name, v, v == 0L)
    }
  }

  /** In-flight suite evaluation: the suite's aggregates attach to the
    * frame as a `CollectMetrics` observation, so whatever job already
    * materializes the frame (the sink write, the count) computes the
    * metrics AS IT STREAMS PAST — zero additional scans. That is the
    * 100 TB difference from [[evaluate]], which runs its own aggregation
    * job: fine when the table is being checked standalone, a second full
    * pass over the lake when the check rides a pipeline stage that was
    * scanning anyway.
    *
    * Semantics in flight: row-level checks and RowCountMin are EXACT
    * (same one-pass sums as [[evaluate]]); UniqueKey rides along as
    * `approx_count_distinct`, because CollectMetrics cannot carry exact
    * DISTINCT — its in-flight result is advisory (exact at small
    * cardinalities where HLL++ stays sparse; ±rsd beyond), so a failed
    * in-flight UniqueKey should be confirmed with [[evaluate]]. Schema
    * checks are metadata-only and resolve immediately at attach time.
    *
    * Returns the frame to run (use it IN PLACE of the input) and a
    * handle whose `results()` blocks until the first action completes. */
  def observedChecks(df: DataFrame, checks: Seq[Check],
                     name: String = "graft_checks"): (DataFrame, ObservedChecks) = {
    val aggCols = suiteAggCols(df, checks)
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, aggCols.head, aggCols.tail: _*),
      new ObservedChecks(obs, checks, df.schema))
  }

  /** Streaming twin of [[observedChecks]]: attaches the same aggregates
    * under a NAMED observation (streaming frames cannot use the
    * `Observation` handle), and each micro-batch's suite verdict surfaces
    * in `StreamingQueryProgress.observedMetrics(name)` — per-batch DQ on
    * an unbounded feed with zero extra passes. Feed the progress row to
    * [[resultsFromMetrics]]. */
  def observedChecksStreaming(df: DataFrame, checks: Seq[Check],
                              name: String = "graft_checks"): DataFrame = {
    val aggCols = suiteAggCols(df, checks)
    df.observe(name, aggCols.head, aggCols.tail: _*)
  }

  /** Map one observed-metrics row (from a streaming progress event) back
    * onto the suite. `schema` is the OBSERVED frame's schema (metadata
    * checks resolve against it). */
  def resultsFromMetrics(metrics: org.apache.spark.sql.Row, checks: Seq[Check],
                         schema: StructType): Seq[CheckResult] =
    ObservedChecks.map(checks, schema,
      k => if (metrics.schema.fieldNames.contains(k)) Option(metrics.getAs[Any](k)) else None)

  /** Split a frame on the suite's row-level predicates:
    * (clean, quarantined), where each quarantined row carries the
    * comma-joined names of the checks it violates — the dead-letter-lane
    * primitive ([[graft.sources.Sources.readCsvAudited]]'s corrupt-record
    * lane generalized from parse errors to semantic checks). One
    * map-side predicate pass; checks with no row-level predicate (schema,
    * row count, unique key) do not route rows and are ignored here. */
  def quarantineSplit(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    val flags = checks.flatMap(c => violationCond(c).map(c.name -> _))
    require(flags.nonEmpty, "quarantineSplit needs at least one row-level check")
    val flagged = df.withColumn("failed_checks",
      concat_ws(",", flags.map { case (n, cond) => when(cond, lit(n)) }: _*))
    (flagged.filter(col("failed_checks") === "").drop("failed_checks"),
      flagged.filter(col("failed_checks") =!= ""))
  }

  private[checks] def suiteAggCols(df: DataFrame, checks: Seq[Check]): Seq[Column] = {
    val dupNames = checks.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dupNames.isEmpty,
      s"check names must be unique; duplicated: ${dupNames.mkString(", ")}")
    val rowLevel = checks.flatMap(c => violationCond(c).map(c.name -> _))
    val uniques = checks.collect { case u: UniqueKey => u }
    Seq(count(lit(1)).as("__n")) ++
      rowLevel.map { case (n, cond) =>
        sum(when(cond, 1L).otherwise(0L)).as(s"__v_$n")
      } ++
      uniques.map { u =>
        val keyCols = if (u.cols.isEmpty) df.columns.toSeq else u.cols
        approx_count_distinct(struct(keyCols.map(col): _*)).as(s"__d_${u.name}")
      }
  }

  /** Evaluate and return the results as a DataFrame (for pipelines/oracles). */
  def evaluateDf(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    evaluate(df, checks).toDF()
  }

  /** Violating rows for a row-level check (soda failed-rows semantics, Q11). */
  def failedRows(df: DataFrame, c: Check): DataFrame =
    violationCond(c).map(df.filter).getOrElse(df.limit(0))

  /** Q8/U2 (validate_sync): symmetric difference of two key sets, tagged by
    * direction — `missing` = in source, absent from target; `extra` = in
    * target, absent from source. Both sides are distinct-projected first, so
    * the anti joins run on pre-shrunk inputs. */
  def setSyncDiff(source: DataFrame, sourceCol: String,
                  target: DataFrame, targetCol: String): DataFrame = {
    val s = source.select(col(sourceCol).as("value")).distinct()
    val t = target.select(col(targetCol).as("value")).distinct()
    s.join(t, Seq("value"), "left_anti").withColumn("direction", lit("missing_in_target"))
      .unionByName(
        t.join(s, Seq("value"), "left_anti").withColumn("direction", lit("extra_in_target")))
  }

  /** Q9 preset — the staging-data composite validator
    * (validate_staging_data.py:7-62) for main_taico-shaped tables. */
  def stagingDataChecks(idCol: String = "id"): Seq[Check] = Seq(
    UniqueKey(Seq.empty, name = "dup_rows"),
    RowCountMin(100, name = "min_rows"),
    UniqueKey(Seq(idCol), name = "unique_id"),
    NonNull(Seq(idCol, "date", "channel", "campaign", "clicks", "impressions", "media_cost_eur"),
      name = "non_null_critical"),
    RangeMin("clicks", 0, name = "clicks_gte_0"),
    RangeMin("media_cost_eur", 0, name = "cost_gte_0"),
    ColumnGte("media_cost_eur", "cpc", name = "cost_gte_cpc"),
    ColumnGte("revenue", "media_cost_eur", name = "revenue_gte_cost"))
}

/** Handle returned by [[Checks.observedChecks]]: `results()` blocks until
  * the first action on the observed frame completes, then maps the
  * collected metrics row back onto the suite. Schema checks were resolved
  * from metadata at attach time; UniqueKey results are advisory (HLL++
  * estimate — see observedChecks). */
final class ObservedChecks(obs: org.apache.spark.sql.Observation,
                           checks: Seq[Check], schema: StructType) {
  def results(): Seq[CheckResult] =
    ObservedChecks.map(checks, schema, obs.get.get)
}

object ObservedChecks {
  /** shared metrics→suite mapping for the batch handle and the streaming
    * progress-row path */
  private[checks] def map(checks: Seq[Check], schema: StructType,
                          lookup: String => Option[Any]): Seq[CheckResult] = {
    val columns = schema.fields.map(_.name).toSet
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    def num(k: String): Long = lookup(k) match {
      case Some(null) | None => 0L
      case Some(v: Number) => v.longValue()
      case Some(other) => sys.error(s"unexpected metric type for $k: $other")
    }
    checks.map {
      case c @ SchemaSuperset(expected, _) =>
        val missing = expected.toSet -- columns
        CheckResult(c.name, missing.size.toLong, missing.isEmpty)
      case c @ SchemaExact(expected, _) =>
        val diff = (expected.toSet diff columns) ++ (columns diff expected.toSet)
        CheckResult(c.name, diff.size.toLong, diff.isEmpty)
      case c @ TypedColumns(ts, _) =>
        val bad = ts.count { case (n, t) => !types.get(n).contains(t) }
        CheckResult(c.name, bad.toLong, bad == 0)
      case c @ SchemaAndTypes(required, ts, _) =>
        val missing = required.count(r => !columns.contains(r))
        val badTypes = ts.count { case (n, t) => !types.get(n).contains(t) }
        CheckResult(c.name, (missing + badTypes).toLong, missing + badTypes == 0)
      case c @ RowCountMin(min, _) =>
        val n = num("__n")
        CheckResult(c.name, if (n >= min) 0L else min - n, n >= min)
      case c: UniqueKey =>
        val dups = math.max(0L, num("__n") - num(s"__d_${c.name}"))
        CheckResult(c.name, dups, dups == 0L)
      case c =>
        val v = num(s"__v_${c.name}")
        CheckResult(c.name, v, v == 0L)
    }
  }
}
