package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's custom Catalyst expressions as SQL functions.
  *
  * Two entry points:
  *  - config: `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`
  *    applies at session build (the standard extension-library path);
  *  - [[GraftFunctions.register]] injects into an already-running session
  *    (tests, notebooks).
  *
  * After either, `SELECT cosine_sim(a.embedding, b.embedding)` works in
  * SQL text, keeping the codegen'd primitive loop.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    GraftFunctions.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectPlannerStrategy(_ => SkylineStrategy)
    ext.injectOptimizerRule(_ => RangeBinJoinRule)
    ext.injectOptimizerRule(_ => MatViewRewriteRule)
    // POST-PUSHDOWN rules (scan-stats restore, join-driven file
    // skipping) need the DataSourceV2ScanRelation to exist — but
    // Spark 4 runs the "Pre CBO Rules" batch BEFORE "Early Filter and
    // Projection Push-Down" (batch 15 vs 16 in SparkOptimizer), so
    // injectPreCBORule never sees a scan and silently no-ops. The only
    // post-pushdown logical batch an extension can reach is "User
    // Provided Optimizers" (experimental.extraOptimizations, the last
    // batch — where GraftFunctions.register has always put these for
    // running sessions); this builder is the one extension hook that
    // receives the session, so it installs them there once.
    ext.injectOptimizerRule { session =>
      GraftFunctions.installPostPushdownRules(session)
      PostPushdownInstallMarker
    }
    // ANALYZE TABLE on graft catalog tables, metadata-served — Spark
    // refuses the command for v2 tables during resolution, so the
    // interception must happen at the parser (see GraftAnalyze.scala)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}

/** Identity rule returned by the extensions' post-pushdown installer
  * hook — the hook's value is its SIDE EFFECT (registering the real
  * rules into "User Provided Optimizers"); this marker keeps the
  * builder contract honest and visible in the batch listing. */
object PostPushdownInstallMarker
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan
}

object GraftFunctions {
  private type Descriptor = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val cosineSimDescriptor: Descriptor = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "cosine_sim expects exactly 2 array<float> arguments")
      CosineSimilarity(exprs.head, exprs(1))
    })

  /** Scalar helpers as concrete Catalyst trees (builders must return
    * resolved nodes — the Column bridge would hand the registry an
    * unresolved ColumnNodeExpression). Semantics mirror graft.functions.Fns. */
  import org.apache.spark.sql.catalyst.expressions.{Cast, Coalesce, ConcatWs, Literal, Lower, Md5, RegExpReplace}
  import org.apache.spark.sql.types.StringType

  private def descriptor(name: String)(builder: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo(graft.functions.Fns.getClass.getName, name),
      builder)

  val topkDescriptor: Descriptor = (
    FunctionIdentifier("topk_agg"),
    new ExpressionInfo(classOf[TopKAgg].getName, "topk_agg"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3, "topk_agg expects (score DOUBLE, payload BIGINT, k literal INT)")
      val k = exprs(2) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"topk_agg k must be an integer literal, got $other")
      }
      TopKAgg(exprs.head, exprs(1), k).toAggregateExpression()
    })

  val all: Seq[Descriptor] = Seq(
    cosineSimDescriptor,
    topkDescriptor,
    descriptor("surrogate_key") { exprs =>
      Md5(Cast(ConcatWs(Literal("-") +: exprs.map(e =>
        Coalesce(Seq(Cast(e, StringType), Literal(""))))), org.apache.spark.sql.types.BinaryType))
    },
    descriptor("norm_name") { exprs =>
      Lower(RegExpReplace(exprs.head, Literal("[^a-zA-Z0-9]"), Literal("")))
    },
    descriptor("comma_decimal") { exprs =>
      // DOUBLE, mirroring Fns.commaDecimal (round-3 output-type policy:
      // DECIMAL is banned from oracle-facing outputs)
      Cast(RegExpReplace(exprs.head, Literal(","), Literal(".")), org.apache.spark.sql.types.DoubleType)
    })

  /** SQL TABLE functions (`SELECT * FROM date_spine(...)`) — the
    * injectTableFunction extension point. `date_spine(start, end)` is
    * dbt_utils' date-spine macro (the reference ships dbt_utils,
    * `packages.yml:3-4`) as a native TVF: one row per day, both ends
    * inclusive, planned as a Catalyst Range + Project — a generated
    * relation, parallel and codegen'd, never a driver-built list. */
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range => LRange}
  import org.apache.spark.sql.catalyst.expressions.{Alias, DateAdd}
  import org.apache.spark.sql.types.{DateType, IntegerType}

  private type TableDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  val dateSpineDescriptor: TableDescriptor = (
    FunctionIdentifier("date_spine"),
    new ExpressionInfo(graft.functions.Fns.getClass.getName, "date_spine"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2 && exprs.forall(_.foldable),
        "date_spine expects two foldable DATE (or date-string) arguments")
      def days(e: Expression): Int = Cast(e, DateType, Some("UTC")).eval() match {
        case i: Int => i
        case _ => throw new IllegalArgumentException(s"date_spine: not a date: $e")
      }
      val start = days(exprs.head)
      val end = days(exprs(1))
      require(end >= start, s"date_spine: end before start ($start..$end)")
      val range = LRange(0L, (end - start + 1).toLong, 1L, None)
      Project(Seq(Alias(
        DateAdd(Literal(start, DateType), Cast(range.output.head, IntegerType)),
        "day_date")()), range)
    })

  /** `snapshot_at(root [, version])` — SQL time travel over the snapshot
    * table format: resolves to the table's MOR-aware read plan at the
    * requested (default: latest) version, so SQL users join/filter a
    * historical snapshot like any relation, with the manifest doing the
    * file planning (`SELECT * FROM snapshot_at('/w/fact', 42)` — the
    * public formats' `VERSION AS OF` clause as a TVF). */
  val snapshotAtDescriptor: TableDescriptor = (
    FunctionIdentifier("snapshot_at"),
    new ExpressionInfo(classOf[graft.sources.SnapshotTable].getName, "snapshot_at"),
    (exprs: Seq[Expression]) => {
      require(exprs.nonEmpty && exprs.length <= 2 && exprs.forall(_.foldable),
        "snapshot_at expects (table_root_literal [, version_literal])")
      val root = exprs.head.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_at: table root must be a string literal, got $other")
      }
      val version = if (exprs.length < 2) -1L else exprs(1).eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"snapshot_at: version must be an integer literal, got $other")
      }
      new graft.sources.SnapshotTable(SparkSession.active, root)
        .read(version).queryExecution.analyzed
    })

  /** `snapshot_refs(root)` — the named-refs listing as a TVF: one row
    * per tag (kind='tag', version = the pinned MAIN version) and per
    * branch (kind='branch', version = the branch TIP, fork_version =
    * where it forked off main). Metadata-only, driver-built. */
  val snapshotRefsDescriptor: TableDescriptor = (
    FunctionIdentifier("snapshot_refs"),
    new ExpressionInfo(classOf[graft.sources.SnapshotTable].getName, "snapshot_refs"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1 && exprs.head.foldable,
        "snapshot_refs expects (table_root_literal)")
      val root = exprs.head.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_refs: table root must be a string literal, got $other")
      }
      val t = new graft.sources.SnapshotTable(SparkSession.active, root)
      val rows =
        t.tags().toSeq.sortBy(_._1).map { case (name, v) =>
          org.apache.spark.sql.Row("tag", name, v, null) } ++
        t.branches().sorted.map { b =>
          org.apache.spark.sql.Row("branch", b,
            t.branch(b).latestVersion(), t.forkVersion(b)) }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("kind", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("name", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("version", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("fork_version", org.apache.spark.sql.types.LongType, nullable = true)))
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation.fromExternalRows(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        rows)
    })

  /** `snapshot_changes(root, from [, to])` — the change feed as a TVF
    * (Delta's `table_changes`): every row the versions in
    * `(from, to]` (default: the tip) inserted or deleted, tagged with
    * `_change_type` / `_commit_version`, resolved to the engine's
    * readChangeFeed plan — SQL consumers replay a table's history
    * without the streaming source. */
  val snapshotChangesDescriptor: TableDescriptor = (
    FunctionIdentifier("snapshot_changes"),
    new ExpressionInfo(classOf[graft.sources.SnapshotTable].getName, "snapshot_changes"),
    (exprs: Seq[Expression]) => {
      require(exprs.length >= 2 && exprs.length <= 3 && exprs.forall(_.foldable),
        "snapshot_changes expects (table_root_literal, from_version [, to_version])")
      val root = exprs.head.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_changes: table root must be a string literal, got $other")
      }
      def longAt(i: Int, what: String): Long = exprs(i).eval() match {
        case x: Int => x.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"snapshot_changes: $what must be an integer literal, got $other")
      }
      val t = new graft.sources.SnapshotTable(SparkSession.active, root)
      val from = longAt(1, "from_version")
      val to = if (exprs.length == 3) longAt(2, "to_version") else t.latestVersion()
      t.readChangeFeed(from, to).queryExecution.analyzed
    })

  /** `snapshot_history(root)` — DESCRIBE HISTORY as a TVF: one row per
    * RETAINED version (version, action, n_rows, data_change, batch_id).
    * Metadata-only, driver-built (bounded by the vacuum retention, the
    * same shape as the public formats' history command) — commit
    * timestamps are deliberately not exposed here; time travel by clock
    * goes through `SnapshotTable.readAsOf`. */
  val snapshotHistoryDescriptor: TableDescriptor = (
    FunctionIdentifier("snapshot_history"),
    new ExpressionInfo(classOf[graft.sources.SnapshotTable].getName, "snapshot_history"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1 && exprs.head.foldable,
        "snapshot_history expects (table_root_literal)")
      val root = exprs.head.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_history: table root must be a string literal, got $other")
      }
      val h = new graft.sources.SnapshotTable(SparkSession.active, root).history()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("version", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("action", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("data_change", org.apache.spark.sql.types.BooleanType, nullable = false),
        org.apache.spark.sql.types.StructField("batch_id", org.apache.spark.sql.types.LongType, nullable = false)))
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation.fromExternalRows(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        h.map(s => org.apache.spark.sql.Row(s.version, s.action, s.rows,
          s.dataChange, s.batchId)))
    })

  /** `snapshot_files(root [, version])` — the format's files metadata
    * table as a TVF (Iceberg's `db.tbl.files` idea): one row per live
    * data file and per merge-on-read delete file at the version, with
    * the manifest-recorded commit sequence, byte length, per-stats-column
    * band-key bounds / null counts (maps keyed by column; absent =
    * unknown), and bloom coverage. Metadata-only and driver-built —
    * "how much small-file debris", "which files would this band keep",
    * "how many delete files since the last fold" become SQL. */
  val snapshotFilesDescriptor: TableDescriptor = (
    FunctionIdentifier("snapshot_files"),
    new ExpressionInfo(classOf[graft.sources.SnapshotTable].getName, "snapshot_files"),
    (exprs: Seq[Expression]) => {
      require(exprs.nonEmpty && exprs.length <= 2 && exprs.forall(_.foldable),
        "snapshot_files expects (table_root_literal [, version_literal])")
      val root = exprs.head.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_files: table root must be a string literal, got $other")
      }
      val version = if (exprs.length < 2) -1L else exprs(1).eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"snapshot_files: version must be an integer literal, got $other")
      }
      val spark = SparkSession.active
      val probe = new graft.sources.SnapshotTable(spark, root)
      val metas = new graft.sources.SnapshotTable(spark, root,
        statsCols = probe.tipStatsCols).filesMetadata(version)
      import org.apache.spark.sql.types.{LongType, MapType, ArrayType, BooleanType}
      val keyMap = MapType(StringType, LongType, valueContainsNull = false)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("content", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("file", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("commit_seq", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bytes", LongType, nullable = true),
        org.apache.spark.sql.types.StructField("rows", LongType, nullable = true),
        org.apache.spark.sql.types.StructField("min_key", keyMap, nullable = false),
        org.apache.spark.sql.types.StructField("max_key", keyMap, nullable = false),
        org.apache.spark.sql.types.StructField("null_count", keyMap, nullable = false),
        org.apache.spark.sql.types.StructField("bloom_cols", ArrayType(StringType, containsNull = false), nullable = false),
        // per-column DISTINCT estimate from the file's own NDV sketch
        // (see FileNdv; absent = no sketch recorded)
        org.apache.spark.sql.types.StructField("ndv_est", keyMap, nullable = false)))
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation.fromExternalRows(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        metas.map(m => org.apache.spark.sql.Row(m.content, m.file, m.commitSeq,
          if (m.bytes >= 0L) m.bytes else null,
          if (m.rows >= 0L) m.rows else null,
          m.minKey, m.maxKey, m.nullCount, m.bloomCols, m.ndvEst)))
    })

  /** `snapshot_stats(root [, version])` — per-stats-column table
    * statistics as a TVF (ANALYZE without a scan, served from one
    * manifest parse): the table's rows/files plus, per column, exact
    * band-key bounds and null census where every live file's vector is
    * known (NULL otherwise — never a guess) and the NDV-sketch distinct
    * estimate. Band keys are the value for integrals/bool,
    * days-since-epoch for DATE, epoch micros for TIMESTAMP (bandsV>=2),
    * the lossy 8-byte prefix for STRING. */
  val snapshotStatsDescriptor: TableDescriptor = (
    FunctionIdentifier("snapshot_stats"),
    new ExpressionInfo(classOf[graft.sources.SnapshotTable].getName, "snapshot_stats"),
    (exprs: Seq[Expression]) => {
      require(exprs.nonEmpty && exprs.length <= 2 && exprs.forall(_.foldable),
        "snapshot_stats expects (table_root_literal [, version_literal])")
      val root = exprs.head.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => throw new IllegalArgumentException(
          s"snapshot_stats: table root must be a string literal, got $other")
      }
      val version = if (exprs.length < 2) -1L else exprs(1).eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"snapshot_stats: version must be an integer literal, got $other")
      }
      val spark = SparkSession.active
      val probe = new graft.sources.SnapshotTable(spark, root)
      val t = new graft.sources.SnapshotTable(spark, root,
        statsCols = probe.tipStatsCols)
      val v = if (version < 0) t.latestVersion() else version
      val snap = t.snapshot(v)
      val summary = t.statsSummary(v)
      import org.apache.spark.sql.types.LongType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("column", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_files", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("min_key", LongType, nullable = true),
        org.apache.spark.sql.types.StructField("max_key", LongType, nullable = true),
        // exact typed VALUE bounds where recorded (STRING columns —
        // the lossy-key case); NULL elsewhere
        org.apache.spark.sql.types.StructField("min_value", StringType, nullable = true),
        org.apache.spark.sql.types.StructField("max_value", StringType, nullable = true),
        org.apache.spark.sql.types.StructField("null_count", LongType, nullable = true),
        org.apache.spark.sql.types.StructField("ndv_est", LongType, nullable = true)))
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation.fromExternalRows(
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema),
        summary.map(c => org.apache.spark.sql.Row(c.column, snap.rows,
          snap.files.length.toLong, c.minKey.orNull, c.maxKey.orNull,
          c.minValue.orNull, c.maxValue.orNull,
          c.nullCount.orNull, c.ndvEst.orNull)))
    })

  val tableFunctions: Seq[TableDescriptor] =
    Seq(dateSpineDescriptor, snapshotAtDescriptor, snapshotHistoryDescriptor,
      snapshotFilesDescriptor, snapshotChangesDescriptor,
      snapshotRefsDescriptor, snapshotStatsDescriptor)

  /** Register into an existing session: SQL functions + the Skyline
    * planner strategy (so SkylineNode plans without the config path). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    tableFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
    SkylinePlan.install(spark)
    if (!spark.experimental.extraOptimizations.contains(RangeBinJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeBinJoinRule
    if (!spark.experimental.extraOptimizations.contains(MatViewRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MatViewRewriteRule
    installPostPushdownRules(spark)
  }

  /** The post-pushdown rules, into the ONE logical batch that runs
    * after `V2ScanRelationPushDown` and is reachable from outside
    * ("User Provided Optimizers"). Idempotent; shared by [[register]]
    * (running sessions) and [[GraftExtensions]] (configured sessions —
    * whose injectPreCBORule hook runs BEFORE pushdown in Spark 4 and
    * therefore cannot host these). */
  private[graft] def installPostPushdownRules(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(V1ScanStatsRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ V1ScanStatsRule
    if (!spark.experimental.extraOptimizations.contains(JoinSkippingRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JoinSkippingRule
  }
}
