package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Coalesce, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions.{assert_true, coalesce, expr, isnull, lit}
import org.apache.spark.sql.types.StructType

/** Write-time CHECK constraints — `TBLPROPERTIES('constraint.<name>' =
  * '<boolean SQL predicate>')`, the lakehouse invariant idea: schema
  * governance enforced at INGEST, where a violation costs one failed
  * write, instead of downstream where it costs a debugging session over
  * 100 TB of mixed-validity data.
  *
  * Semantics are SQL CHECK: a predicate evaluating to NULL PASSES
  * (unknown is not a violation), FALSE fails the write loudly and
  * commits nothing — enforcement happens before any manifest publishes,
  * so a rejected batch leaves the table untouched. Validation is
  * fail-at-DDL (parse + resolve + boolean-type against the table
  * schema; adding a constraint over existing data scans for violations
  * once), enforcement is per-row with zero extra jobs:
  *
  *  - driver-written commits (commitAppend/Overwrite/Upsert/Rewrite)
  *    ride a plan-side guard ([[guard]]): `assert_true` inside the
  *    write plan, codegen'd with the scan;
  *  - executor writers (DSv2 INSERT, streaming epochs, merge-on-read
  *    re-inserted rows) evaluate a BOUND predicate per row
  *    ([[bind]] → [[SnapshotParquetWriter]]), compiled once per task.
  *
  * A batch that does not carry a constraint's column skips that
  * constraint: the absent column null-fills on read, and NULL passes
  * CHECK — the guard agrees with what the table will actually hold. */
object TableConstraints {
  val Prefix = "constraint."

  /** (name, predicate SQL) pairs from a table-properties map, name-sorted. */
  def of(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.collect { case (k, v) if k.startsWith(Prefix) =>
      k.stripPrefix(Prefix) -> v
    }.sortBy(_._1)

  /** The analyzed (resolved + type-coerced) Filter for one constraint
    * against `schema` — the single analysis both DDL validation and
    * executor binding run, so they can never disagree. */
  private def analyzedFilter(spark: SparkSession, schema: StructType,
                             name: String, sql: String): LFilter = {
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '_' || c == '-'),
      s"constraint name must be [A-Za-z0-9_-]+, got '$name'")
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val analyzed =
      try empty.filter(expr(sql)).queryExecution.analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"constraint.$name: predicate '$sql' does not resolve against " +
              s"the table schema (${schema.fieldNames.mkString(", ")}): " +
              e.getMessage)
      }
    analyzed.collectFirst { case f: LFilter => f }.getOrElse(sys.error(
      s"constraint.$name: unexpected analyzed plan shape for '$sql'"))
  }

  /** Fail-at-DDL validation: must parse, resolve, and be BOOLEAN. */
  def validate(spark: SparkSession, schema: StructType,
               name: String, sql: String): Unit = {
    analyzedFilter(spark, schema, name, sql)
    ()
  }

  /** Column names a constraint references (for presence checks on
    * narrower evolved batches). */
  def referencedColumns(spark: SparkSession, schema: StructType,
                        name: String, sql: String): Set[String] =
    analyzedFilter(spark, schema, name, sql)
      .condition.references.map(_.name).toSet

  /** Bound per-row predicates for executor-side enforcement. NULL
    * passes (SQL CHECK), encoded as `coalesce(cond, true)`. Binding is
    * POSITIONAL against `schema`'s field order, so a column-mapped
    * writer's PHYSICAL rows evaluate correctly — a rename preserves
    * field positions. */
  def bind(spark: SparkSession, schema: StructType,
           constraints: Seq[(String, String)]): Seq[(String, Expression)] =
    constraints.map { case (name, sql) =>
      val f = analyzedFilter(spark, schema, name, sql)
      name -> BindReferences.bindReference(
        Coalesce(Seq(f.condition, Literal(true))): Expression,
        org.apache.spark.sql.catalyst.expressions.AttributeSeq(f.child.output))
    }

  /** Plan-side guard for driver-written commits: identity on every
    * conforming row, throws naming the constraint on the first
    * violation — `assert_true` rides the write plan inside codegen, so
    * enforcement costs no extra job and no extra pass. Constraints
    * whose columns the batch does not carry are skipped (the column
    * null-fills on read; NULL passes CHECK). */
  def guard(spark: SparkSession, df: DataFrame, tableSchema: StructType,
            constraints: Seq[(String, String)]): DataFrame =
    constraints.foldLeft(df) { case (d, (name, sql)) =>
      // references resolve against the TABLE schema (the batch may be an
      // additively-narrower evolution of it)
      val refs = referencedColumns(spark, tableSchema, name, sql)
      if (!refs.subsetOf(d.columns.toSet)) d
      else d.filter(isnull(assert_true(coalesce(expr(sql), lit(true)),
        lit(s"CHECK constraint '$name' ($sql) violated"))))
    }
}
