package graft.sync

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The BigQuery→PostgreSQL dimension-sync engine re-expressed as set
  * operations (reference: include/scripts/sync_data.py, orchestrated by
  * dags/etl.py — SURVEY.md §2.3 J5-J7, §2.4 A1-A4, §3.2).
  *
  * The reference loops row-at-a-time `INSERT WHERE NOT EXISTS` / `DELETE`
  * statements (sync_data.py:250-252,185-187) — its scalability bottleneck.
  * Here every step is a distributed anti/semi join, so the same algebra
  * holds at 100 TB: distinct-project first (shrinks to key cardinality),
  * then broadcast the small side.
  */
object DimSync {

  /** A1 — `SELECT DISTINCT <dim> WHERE <dim> IS NOT NULL` (sync_data.py:206-218);
    * the null drop is P6 (`df.dropna(subset=['name'])`,
    * bigquery_to_postgres_dbt_pipeline.py:56). */
  def distinctValues(source: DataFrame, valueCol: String): DataFrame =
    source.select(col(valueCol).as("name")).na.drop(Seq("name")).distinct()

  /** J6 — idempotent insert set: source values not yet in the dimension
    * (`INSERT … WHERE NOT EXISTS`, sync_data.py:242-252). */
  def insertMissing(source: DataFrame, sourceCol: String,
                    dim: DataFrame, dimNameCol: String = "name"): DataFrame =
    distinctValues(source, sourceCol)
      .join(dim.select(col(dimNameCol).as("name")), Seq("name"), "left_anti")

  /** J7 — stale deletion set: dimension values absent from the source
    * (`existing[~existing.name.isin(...)]` → DELETE, sync_data.py:254-269). */
  def deleteStale(dim: DataFrame, source: DataFrame, sourceCol: String,
                  dimNameCol: String = "name"): DataFrame =
    dim.join(distinctValues(source, sourceCol)
        .withColumnRenamed("name", dimNameCol), Seq(dimNameCol), "left_anti")

  /** A2+J5+P2+A4 — media-combination resolution: distinct combination tuple
    * from the wide table, inner-merged through each dimension to map names
    * → ids (unmatched names drop, as pandas inner merge does,
    * sync_data.py:118-153). `dims` maps combination column → (id, name)
    * dimension; each dim is broadcast. */
  def resolveCombinations(main: DataFrame, combinationCols: Seq[String],
                          dims: Map[String, DataFrame]): DataFrame = {
    val distinctCombos = main.select(combinationCols.map(col): _*).distinct()
    val resolved = combinationCols.foldLeft(distinctCombos) { (acc, c) =>
      dims.get(c) match {
        case Some(dim) =>
          val d = broadcast(dim.select(col("id").as(s"${c}_id"), col("name").as(c)))
          acc.join(d, Seq(c), "inner")
        case None => acc
      }
    }
    resolved.select(combinationCols.flatMap(c =>
      if (dims.contains(c)) Seq(col(s"${c}_id")) else Seq(col(c))): _*)
      .dropDuplicates()
  }

  /** S8+S9+J6+J7 — the full dimension sync over JDBC, the reference's
    * actual deployment shape (BigQuery source → PostgreSQL dimension,
    * sync_data.py:126-134 read / :242-268 write-back): read the dimension,
    * append the missing names (ids continue from max(id), mirroring the
    * target's sequence semantics), and delete stale rows set-based — one
    * batched DELETE…IN instead of the reference's per-row loop. Returns
    * (inserted, deleted) counts.
    *
    * Scale notes: the id window runs over the INSERT DELTA only (dimension
    * cardinality, not fact volume) — a deliberate single-task pass over a
    * small set; the stale keys are collected for the DELETE because a JDBC
    * DELETE is driver-side by nature (same contract as the reference,
    * minus the row-at-a-time loop). */
  def syncDimensionJdbc(spark: SparkSession, source: DataFrame, sourceCol: String,
                        url: String, table: String,
                        props: java.util.Properties): (Long, Long) = {
    import graft.sources.Sources
    // one JDBC scan: the cached snapshot feeds max(id), the insert delta,
    // AND the stale set — all computed BEFORE the write-back, so nothing
    // depends on re-reading a table we just mutated
    val dim = Sources.readJdbc(spark, url, table, props).cache()
    try {
      val inserts = insertMissing(source, sourceCol, dim).cache()
      try {
        val base = dim.agg(coalesce(max(col("id")), lit(0L)).as("m")).collect()(0).getLong(0)
        val stale = deleteStale(dim, source, sourceCol)
          .select(col("name")).collect().map(_.getString(0))
        // name-ordered dense ids as a prefix sum of 1s — the distributed
        // two-pass scheme (range-partition + broadcast offsets), so id
        // assignment stays parallel even if a backfill delta is
        // fact-sized; no global single-task window anywhere in the sync
        val numbered = graft.operators.PrefixSum.withGlobalPrefixSum(
          inserts.withColumn("__one", lit(1L)), "name", "__one", "__rn",
          numPartitions = inserts.sparkSession.sessionState.conf.numShufflePartitions)
        val withIds = numbered.select((col("__rn") + base).as("id"), col("name"))
        Sources.writeJdbc(withIds, url, table, props)
        val nInserted = inserts.count()
        if (stale.nonEmpty) {
          // `table` is interpolated unquoted on purpose: it then resolves
          // under the same identifier rules as the read/write above
          val conn = java.sql.DriverManager.getConnection(url, props)
          try {
            val st = conn.createStatement()
            try stale.grouped(1000).foreach { batch =>
              val in = batch.map(n => s"'${n.replace("'", "''")}'").mkString(", ")
              st.executeUpdate(s"DELETE FROM $table WHERE name IN ($in)")
            } finally st.close()
          } finally conn.close()
        }
        (nInserted, stale.length.toLong)
      } finally inserts.unpersist()
    } finally dim.unpersist()
  }

  /** SCD Type-2 APPLY: fold a full snapshot into a versioned history —
    * the incremental maintenance step behind every slowly-changing
    * dimension (the from-scratch history BUILD is `stream_scd2_history`;
    * this is the per-load twin). One full-outer hash join of the OPEN
    * rows against the snapshot classifies every key:
    *   - attrs equal          → the open row stays open (pass-through);
    *   - attrs differ         → the open row closes at `asOf`, a new
    *                            version opens at `asOf`;
    *   - key only in history  → deleted upstream: the open row closes;
    *   - key only in snapshot → new entity: a version opens at `asOf`.
    * Already-closed rows pass through untouched. Attr comparison is
    * null-safe (`<=>`), so NULL→value and value→NULL both count as
    * changes. Scale shape: closed-history pass-through never joins;
    * the single join hashes on the key. */
  def scd2Apply(history: DataFrame, snapshot: DataFrame,
                keyCols: Seq[String], attrCols: Seq[String], asOf: Long,
                validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    require(attrCols.nonEmpty, "scd2Apply needs at least one tracked attribute column")
    val outCols = (keyCols ++ attrCols).map(col) :+ col(validFrom) :+ col(validTo)
    val closed = history.filter(col(validTo).isNotNull).select(outCols: _*)
    // presence flags on BOTH sides: inferring history presence from a
    // data column (e.g. valid_from IS NOT NULL) would silently drop an
    // open row whose valid_from is legitimately NULL
    val open = history.filter(col(validTo).isNull).withColumn("__in_hist", lit(true))
    val snap = snapshot.select(
      keyCols.map(col) ++ attrCols.map(a => col(a).as(s"__s_$a")): _*)
      .withColumn("__in_snap", lit(true))
    val j = open.join(snap, keyCols, "full_outer")
    val inHist = col("__in_hist").isNotNull
    val inSnap = col("__in_snap").isNotNull
    val attrsDiffer = attrCols.map(a => !(col(a) <=> col(s"__s_$a"))).reduce(_ || _)
    val stillOpen = j.filter(inHist && inSnap && !attrsDiffer).select(outCols: _*)
    val nowClosed = j.filter(inHist && (!inSnap || attrsDiffer))
      .withColumn(validTo, lit(asOf)).select(outCols: _*)
    val newVersions = j.filter(inSnap && (!inHist || attrsDiffer))
      .select((keyCols.map(col) ++ attrCols.map(a => col(s"__s_$a").as(a)) :+
        lit(asOf).as(validFrom) :+
        lit(null).cast(history.schema(validTo).dataType).as(validTo)): _*)
    closed.unionByName(stillOpen).unionByName(nowClosed).unionByName(newVersions)
  }

  /** CDC snapshot diff: derive the change feed between two snapshots of
    * a keyed table — the set-based form of "what would a CDC connector
    * have emitted" when the upstream offers no log (the reference syncs
    * full dimension snapshots, sync_data.py:126-153; diffing them is how
    * an incremental consumer avoids re-applying the whole dimension).
    * Emits one row per changed key: op I (key only in `newSnap`),
    * D (only in `oldSnap`), U (present in both with any compared column
    * differing, null-safely), plus `changed_cols` — a comma-joined list
    * of the differing columns (empty for I/D). Unchanged keys are
    * filtered before anything wide is materialized, so the output scales
    * with the delta, not the table; the single full-outer join hashes on
    * the key. */
  def cdcDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
              compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "cdcDiff needs at least one compared column")
    val o = oldSnap.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"__o_$c")): _*).withColumn("__in_old", lit(true))
    val n = newSnap.select(col(keyCol) +:
      compareCols.map(c => col(c).as(s"__n_$c")): _*).withColumn("__in_new", lit(true))
    val differs = compareCols.map(c => !(col(s"__o_$c") <=> col(s"__n_$c"))).reduce(_ || _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("__in_old").isNull, lit("I"))
          .when(col("__in_new").isNull, lit("D"))
          .when(differs, lit("U")))
      .filter(col("op").isNotNull)
      .withColumn("changed_cols",
        when(col("op") === "U", concat_ws(",",
          compareCols.map(c =>
            when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c))): _*))
          .otherwise(lit("")))
      .select(col(keyCol), col("op"), col("changed_cols"))
  }

  /** Bucketed content fingerprint of a table: rows hash to a 63-bit
    * md5 fold of their '|'-joined string form and land in `buckets`
    * buckets by hash; each bucket aggregates (row count, XOR of row
    * hashes). XOR is order- and partition-independent and detects any
    * single changed/added/removed row, so two tables compare by their
    * `buckets`-row fingerprints — ONE scan per table and a shuffle of
    * `buckets` rows, never a row-level join. This is how a 100 TB sync
    * is validated hourly: the full-join alternative (dq_set_sync /
    * cdcDiff) shuffles both tables; this shuffles 64 longs and then
    * cdcDiff runs only on the buckets that mismatch. */
  def bucketChecksum(df: DataFrame, cols: Seq[String], buckets: Int = 64): DataFrame = {
    require(cols.nonEmpty, "bucketChecksum needs at least one column")
    val rowStr = concat_ws("|",
      cols.map(c => coalesce(col(c).cast(org.apache.spark.sql.types.StringType), lit(""))): _*)
    df.select(graft.functions.Fns.md5long63(rowStr).as("rh"))
      .withColumn("bucket", col("rh") % buckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(rh)").as("xor_hash"))
  }

  /** Fingerprint diff of two tables: full-outer join of the two
    * `bucketChecksum` outputs (tiny — `buckets` rows) with per-bucket row
    * counts, hashes, and an `in_sync` verdict. Empty buckets coalesce to
    * (0, 0) so a bucket present on one side only still compares. */
  def checksumCompare(src: DataFrame, dst: DataFrame, cols: Seq[String],
                      buckets: Int = 64): DataFrame = {
    val a = bucketChecksum(src, cols, buckets)
      .select(col("bucket"), col("n_rows").as("src_rows"), col("xor_hash").as("src_xor"))
    val b = bucketChecksum(dst, cols, buckets)
      .select(col("bucket"), col("n_rows").as("dst_rows"), col("xor_hash").as("dst_xor"))
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        coalesce(col("dst_rows"), lit(0L)).as("dst_rows"),
        coalesce(col("src_xor"), lit(0L)).as("src_xor"),
        coalesce(col("dst_xor"), lit(0L)).as("dst_xor"))
      .withColumn("in_sync",
        col("src_rows") === col("dst_rows") && col("src_xor") === col("dst_xor"))
  }

  /** S14 — staging-table clone (DDL clone + `INSERT INTO staging SELECT *
    * FROM production`, sync_data.py:34-104) as parquet path overwrite. */
  def stagingClone(spark: SparkSession, productionPath: String, stagingPath: String): Unit =
    spark.read.parquet(productionPath).write.mode(SaveMode.Overwrite).parquet(stagingPath)

  /** C5/S10-S13 — blue-green promote: backup → overwrite production from
    * staging → validate → restore backup on failure (the flagship DAG's
    * switch_to_production + rollback_production_table,
    * taico_facebook_data_etl_dag.py:136-222; backup/restore macros are
    * invoked but undefined in the reference — reconstructed intent).
    * `validate` receives the promoted table; any exception (or `false`)
    * triggers rollback. Returns true when the promote stuck. */
  def promote(spark: SparkSession, stagingPath: String, productionPath: String,
              backupPath: String, validate: DataFrame => Boolean): Boolean = {
    spark.read.parquet(productionPath).write.mode(SaveMode.Overwrite).parquet(backupPath)
    spark.read.parquet(stagingPath).write.mode(SaveMode.Overwrite).parquet(productionPath)
    val ok =
      try validate(spark.read.parquet(productionPath))
      catch { case _: Exception => false }
    if (!ok) // rollback (ONE_FAILED trigger rule)
      spark.read.parquet(backupPath).write.mode(SaveMode.Overwrite).parquet(productionPath)
    ok
  }
}
