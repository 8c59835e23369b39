package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A snapshot descriptor parsed back from a published manifest.
  * `batchId` is -1 for plain commits; streaming appends record their
  * micro-batch epoch here (the idempotent-retry dedup key).
  * `mins`/`maxs` are per-file min/max of the table's stats column
  * (aligned with `files`; empty when the table collects no stats) — the
  * data-skipping index [[SnapshotTable.readRange]] prunes on.
  * `dataChange=false` marks versions that reorganize files without
  * changing table contents (compaction) — change-feed consumers skip
  * them.
  *
  * Merge-on-read deletes (the scalable DELETE the public log-structured
  * formats converged on): `deletes` lists small parquet files of delete
  * KEYS; a reader anti-joins them instead of the table being rewritten.
  * `seqs` (aligned with `files`) and `deleteSeqs` (aligned with
  * `deletes`) record the version each file was first committed in — a
  * delete file applies only to data files with a STRICTLY SMALLER
  * sequence, so a key re-inserted after its deletion survives (the
  * Iceberg v2 equality-delete sequencing rule). `deleteKey` names the
  * equality columns. Empty seqs (pre-MOR manifests) read as all-zero:
  * oldest, so every delete applies — consistent, since such manifests
  * carry no deletes either. */
case class Snapshot(version: Long, action: String, baseVersion: Long,
                    rows: Long, files: Seq[String], batchId: Long = -1L,
                    mins: Seq[Long] = Seq.empty, maxs: Seq[Long] = Seq.empty,
                    dataChange: Boolean = true,
                    seqs: Seq[Long] = Seq.empty,
                    deletes: Seq[String] = Seq.empty,
                    deleteSeqs: Seq[Long] = Seq.empty,
                    deleteKey: Seq[String] = Seq.empty,
                    ts: Long = 0L)

/** Minimal snapshot-versioned table format: immutable parquet data files
  * plus a linear chain of JSON manifests, one per committed version —
  * the miniature of the public log-structured table-format idea
  * (Delta/Iceberg) that turns the reference's backup/restore + blue-green
  * promote (SURVEY.md §2.1 S13, §2.11 C5; `taico_facebook_data_etl_dag.py:
  * 136-222`) into atomic, time-travelable versioned commits.
  *
  * Layout under `root`:
  * {{{
  *   data/<commitUuid>/part-*.parquet   — immutable; never rewritten
  *   _snapshots/v<%020d>.json           — manifest: file list + lineage
  * }}}
  *
  * Commit protocol (scale posture):
  *  1. write the batch's parquet files under a fresh `data/<uuid>/` dir —
  *     distributed write, no coordination;
  *  2. publish the manifest create-exclusively (java.nio `CREATE_NEW`
  *     on local roots — Hadoop's local `create(overwrite=false)` is
  *     check-then-act; `fs.create(overwrite=false)` on HDFS/stores with
  *     server-side atomicity) — the single atomic point: exactly one
  *     writer wins a version number, the loser sees the collision and
  *     retries the (cheap, manifest-only) publish on top of the new tip.
  *     Data files written by the loser stay reachable from ITS retried
  *     manifest, so no work is discarded.
  *
  * An APPEND is therefore manifest-only on top of existing data (no data
  * rewrite — the only way a daily append to a 3,000-partition fact stays
  * O(batch)); OVERWRITE publishes a manifest listing only the new files;
  * ROLLBACK is roll-forward (a new version re-listing an old version's
  * files — history is never mutated, [[read]] of any version stays
  * stable); [[vacuum]] deletes data files unreachable from the retained
  * manifest suffix. Reads plan from the manifest's explicit file list, so
  * they never depend on directory listing of `data/` (uncommitted or
  * vacuum-pending files are invisible).
  */
class SnapshotTable(spark: SparkSession, root: String,
                    statsCol: Option[String] = None) {
  private val snapsDir = new Path(root, "_snapshots")
  private val dataDir = new Path(root, "data")
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-file (min, max) of `statsCol` aligned with a manifest's file
    * list, plus the MOR bookkeeping (per-file commit sequence, delete
    * files and their sequences, equality-key columns). Files whose stats
    * are unknown (empty file, stats-less older commit) carry the
    * full-range sentinel — conservatively never pruned. */
  private case class FileSet(files: Seq[String], mins: Seq[Long], maxs: Seq[Long],
                             seqs: Seq[Long] = Seq.empty,
                             deletes: Seq[String] = Seq.empty,
                             deleteSeqs: Seq[Long] = Seq.empty,
                             deleteKey: Seq[String] = Seq.empty)
  private val UnknownMin = Long.MinValue
  private val UnknownMax = Long.MaxValue

  private def fileSetOf(s: Snapshot): FileSet = {
    val mins = if (s.mins.length == s.files.length) s.mins
               else Seq.fill(s.files.length)(UnknownMin)
    val maxs = if (s.maxs.length == s.files.length) s.maxs
               else Seq.fill(s.files.length)(UnknownMax)
    val seqs = if (s.seqs.length == s.files.length) s.seqs
               else Seq.fill(s.files.length)(0L)
    FileSet(s.files, mins, maxs, seqs, s.deletes, s.deleteSeqs, s.deleteKey)
  }

  private def manifestPath(v: Long) = new Path(snapsDir, f"v$v%020d.json")

  /** Latest committed version, 0 if the table is empty. */
  def latestVersion(): Long = {
    if (!fs.exists(snapsDir)) return 0L
    fs.listStatus(snapsDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Parse one manifest. Hand-rolled fixed-shape JSON (no library dep);
    * file names are uuid/part names — no escapes needed.
    *
    * The create-exclusive publish atomically ELECTS the version's
    * writer, but content becomes visible progressively on local/HDFS
    * filesystems — a reader racing the winner's single write()+close()
    * can see a truncated manifest for a few microseconds. Parse failures
    * therefore retry with bounded backoff; a manifest that still fails
    * after ~1 s is genuinely corrupt (crash mid-publish) and raises.
    * Missing manifests (vacuumed/never existed) raise immediately. */
  def snapshot(version: Long): Snapshot = {
    var delayMs = 2L
    var last: Throwable = null
    var attempt = 0
    while (attempt < 9) {
      try { return parseSnapshot(version) }
      catch {
        case e: java.io.FileNotFoundException => throw e
        case scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt < 9) { Thread.sleep(delayMs); delayMs = math.min(200L, delayMs * 2) }
      }
    }
    throw new IllegalStateException(
      s"manifest v$version at $root unreadable after retries (partial publish?)", last)
  }

  private def parseSnapshot(version: Long): Snapshot = {
    val in = fs.open(manifestPath(version))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def longField(k: String): Long =
      s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(txt)
        .getOrElse(sys.error(s"manifest v$version: missing $k")).group(1).toLong
    def strField(k: String): String =
      s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(txt)
        .getOrElse(sys.error(s"manifest v$version: missing $k")).group(1)
    val files = """"files"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt)
      .getOrElse(sys.error(s"manifest v$version: missing files")).group(1)
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    val batchId = """"batchId"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(-1L)
    def longArray(k: String): Seq[Long] =
      s""""$k"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
        .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq)
        .getOrElse(Seq.empty)
    val dataChange = """"dataChange"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
      .forall(_.group(1) == "true")
    def strArray(k: String): Seq[String] =
      s""""$k"\\s*:\\s*\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
    val ts = """"ts"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(0L)
    Snapshot(longField("version"), strField("action"), longField("baseVersion"),
      longField("rows"), files, batchId, longArray("mins"), longArray("maxs"),
      dataChange, longArray("seqs"), strArray("deletes"),
      longArray("deleteSeqs"), strArray("deleteKey"), ts)
  }

  /** Plan the data files at indices `keep` of `s` with MOR deletes
    * applied. Data files group by their applicable-delete set — a delete
    * applies iff its sequence is STRICTLY GREATER than the file's, and
    * since applicable sets are suffixes of the sorted delete sequences,
    * the group key is just the count of applicable deletes. Each group
    * anti-joins the union of its delete-key files; group count is bounded
    * by the delete commits since the last compaction (which absorbs
    * them), so the plan stays small on a maintained table. Delete-key
    * files are commit-sized parquet — the anti-join's build side
    * auto-broadcasts off file-size stats. */
  private def morPlan(s: Snapshot, keep: Seq[Int], mergeSchema: Boolean): DataFrame = {
    def rd(names: Seq[String]): DataFrame = {
      val r = if (mergeSchema) spark.read.option("mergeSchema", "true") else spark.read
      r.parquet(names.map(f => new Path(dataDir, f).toString): _*)
    }
    val all = fileSetOf(s)
    if (all.deletes.isEmpty) rd(keep.map(all.files))
    else keep.groupBy(i => all.deleteSeqs.count(_ > all.seqs(i)))
      .toSeq.sortBy(_._1) // deterministic group (and thus column) order
      .map { case (nAppl, idxs) =>
        // groups with applicable deletes read footer-merged: a plain read
        // of a mixed-schema group infers the schema from an ARBITRARY
        // footer, so whether the delete-key column is visible — and thus
        // whether the anti-join applies — would be nondeterministic
        val df = if (nAppl == 0) rd(idxs.map(all.files))
          else spark.read.option("mergeSchema", "true")
            .parquet(idxs.map(i => new Path(dataDir, all.files(i)).toString): _*)
        // NULL equality keys match nothing, so groups where NO file has
        // the key column (it postdates them all) legitimately skip
        if (nAppl == 0 || !all.deleteKey.forall(df.columns.contains)) df
        else {
          val appl = all.deletes.indices
            .filter(j => all.deleteSeqs(j) > all.seqs(idxs.head)).map(all.deletes)
          import org.apache.spark.sql.functions.col
          df.join(rd(appl).select(all.deleteKey.map(col): _*).distinct(),
            all.deleteKey, "left_anti")
        }
      // groups may straddle an evolved-schema boundary even on a plain
      // read — missing columns null-fill, parquet's own semantics
      }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** Read the table at `version` (default: latest). Planning comes from
    * the manifest's explicit file list — never a directory listing. Any
    * merge-on-read deletes in the manifest are applied here, so readers
    * always see DELETE results without the table having been rewritten. */
  def read(version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion() else version
    require(v > 0, s"no committed snapshot to read at $root")
    val snap = snapshot(v)
    require(snap.files.nonEmpty,
      s"manifest v$v at $root lists no files — corrupt manifest " +
        "(writeDataFiles guarantees at least one schema-bearing file)")
    morPlan(snap, snap.files.indices, mergeSchema = false)
  }

  /** `TIMESTAMP AS OF`: the latest retained version whose commit
    * timestamp is <= `tsMillis`. Writer clocks can skew, so the
    * effective timestamp is monotonically adjusted (running max over
    * the chain — the public formats' same normalization): a version
    * never reads as older than its predecessor. Raises if every
    * retained version is newer than the asked time (history before the
    * vacuum horizon is gone — time-travel there is unanswerable). */
  def versionAsOf(tsMillis: Long): Long = {
    val h = history()
    require(h.nonEmpty, s"no committed snapshot at $root")
    var running = Long.MinValue
    val eligible = h.flatMap { s =>
      running = math.max(running, s.ts)
      if (running <= tsMillis) Some(s.version) else None
    }
    require(eligible.nonEmpty,
      s"no retained version at $root as of ts=$tsMillis " +
        s"(earliest retained commit ts=${h.head.ts})")
    eligible.max
  }

  /** Read the table as of a wall-clock time ([[versionAsOf]] + [[read]]). */
  def readAsOf(tsMillis: Long): DataFrame = read(versionAsOf(tsMillis))

  /** Schema-evolution read of `version`: parquet footer merging unions
    * the column sets of every listed file, so rows from commits that
    * predate a column read it as null. Separate from [[read]] because
    * merging reads every file's footer at planning time — pay it only on
    * tables whose commits actually evolved (`read` keeps the
    * single-footer fast path). */
  def readEvolved(version: Long = -1L): DataFrame = {
    val v = if (version < 0) latestVersion() else version
    require(v > 0, s"no committed snapshot to read at $root")
    val snap = snapshot(v)
    morPlan(snap, snap.files.indices, mergeSchema = true)
  }

  /** Write the batch's data files under a fresh commit dir, return the
    * manifest-relative file names (+ per-file stats when the table
    * collects them) + exact row count — all from the WRITTEN files, not
    * a second scan of the input. Stats cost one aggregate pass grouped
    * by `input_file_name()` over the freshly written commit dir only. */
  private def writeDataFiles(df: DataFrame): (FileSet, Long) = {
    val commitId = java.util.UUID.randomUUID().toString
    val dir = new Path(dataDir, commitId)
    df.write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
    var parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(p => s"$commitId/${p.getName}").toSeq
    if (parts.isEmpty) {
      // zero-task plan (empty batch through AQE can drop every partition):
      // force one writer task so the commit carries a schema-bearing file —
      // a file-less manifest would make read() of this version unplannable.
      fs.delete(dir, true)
      df.repartition(1).write.mode(SaveMode.ErrorIfExists).parquet(dir.toString)
      parts = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(p => s"$commitId/${p.getName}").toSeq
    }
    val written = spark.read.parquet(dir.toString)
    val rows = written.count()
    // stats only when the written frame carries the column (delete-key
    // files may not) — absent stats read as the never-pruned sentinel
    val fileSet = statsCol.filter(written.columns.contains) match {
      case Some(c) =>
        import org.apache.spark.sql.functions.{col, input_file_name, max, min}
        val byFile = written
          .groupBy(input_file_name().as("__f"))
          .agg(min(col(c).cast("long")).as("__mn"), max(col(c).cast("long")).as("__mx"))
          .collect() // ≤ one row per written file — commit-sized, bounded
          .map(r => (r.getString(0),
            (Option(r.get(1)).fold(UnknownMin)(_.asInstanceOf[Long]),
             Option(r.get(2)).fold(UnknownMax)(_.asInstanceOf[Long])))).toMap
        def statsFor(rel: String): (Long, Long) =
          byFile.collectFirst { case (uri, mm) if uri.endsWith(rel.split('/').last) => mm }
            .getOrElse((UnknownMin, UnknownMax))
        val mm = parts.map(statsFor)
        FileSet(parts, mm.map(_._1), mm.map(_._2))
      case None => FileSet(parts, parts.map(_ => UnknownMin), parts.map(_ => UnknownMax))
    }
    (fileSet, rows)
  }

  /** Create-exclusive manifest write — the commit protocol's single
    * atomic point. On HDFS `fs.create(p, overwrite=false)` is atomic
    * server-side, but Hadoop's LOCAL filesystem implements it as a
    * check-then-act (exists? then create) — two racing writers can both
    * "win" and one clobbers the other: a lost commit. For file:// roots
    * we therefore go through java.nio `CREATE_NEW` (O_CREAT|O_EXCL, a
    * single atomic syscall). Collisions surface as IOException
    * (FileAlreadyExistsException is one) for the callers' retry loops. */
  private def writeExclusive(p: Path, body: Array[Byte]): Unit = {
    fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem |
           _: org.apache.hadoop.fs.LocalFileSystem =>
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        val out = java.nio.file.Files.newOutputStream(local,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        try out.write(body) finally out.close()
      case _ =>
        val out = fs.create(p, /* overwrite = */ false)
        try out.write(body) finally out.close()
    }
  }

  private def manifestBody(v: Long, action: String, base: Long, rowCount: Long,
                           fls: FileSet, batchId: Long, dataChange: Boolean): String = {
    val statsPart =
      if (statsCol.isEmpty) ""
      else s""","mins":[${fls.mins.mkString(",")}],"maxs":[${fls.maxs.mkString(",")}]"""
    val seqsPart =
      if (fls.seqs.isEmpty) "" else s""","seqs":[${fls.seqs.mkString(",")}]"""
    val delPart =
      if (fls.deletes.isEmpty) ""
      else s""","deletes":[${fls.deletes.map(f => s""""$f"""").mkString(",")}]""" +
        s""","deleteSeqs":[${fls.deleteSeqs.mkString(",")}]""" +
        s""","deleteKey":[${fls.deleteKey.map(c => s""""$c"""").mkString(",")}]"""
    s"""{"version":$v,"action":"$action","baseVersion":$base,
       |"ts":${System.currentTimeMillis()},
       |"rows":$rowCount,"batchId":$batchId,"dataChange":$dataChange$statsPart$seqsPart$delPart,
       |"files":[${fls.files.map(f => s""""$f"""").mkString(",")}]}""".stripMargin
  }

  /** Publish a manifest at the next version; on a create-exclusive
    * collision (another writer won the version) retry on the new tip.
    * Returns the committed version. */
  private def publish(action: String, files: Long => FileSet,
                      rows: Long => Long, batchId: Long = -1L,
                      dataChange: Boolean = true): Long = {
    var attempts = 0
    while (attempts < 50) {
      val base = latestVersion()
      val v = base + 1
      val fls = files(base)
      val body = manifestBody(v, action, base, rows(base), fls, batchId, dataChange)
      fs.mkdirs(snapsDir)
      try {
        writeExclusive(manifestPath(v), body.getBytes("UTF-8"))
        return v
      } catch {
        case _: java.io.IOException => attempts += 1 // lost the race; re-read tip
      }
    }
    sys.error(s"snapshot commit at $root: gave up after $attempts collisions")
  }

  /** Tip's content plus the batch's new files (stamped with the
    * candidate version `base + 1` as their commit sequence). Existing
    * MOR deletes carry forward unchanged — they apply only to files with
    * smaller sequences, so the fresh files are untouched by them. */
  private def appendedFileSet(base: Long, nw: FileSet): FileSet = {
    val prev = if (base == 0) FileSet(Seq.empty, Seq.empty, Seq.empty)
               else fileSetOf(snapshot(base))
    FileSet(prev.files ++ nw.files, prev.mins ++ nw.mins, prev.maxs ++ nw.maxs,
      prev.seqs ++ Seq.fill(nw.files.length)(base + 1),
      prev.deletes, prev.deleteSeqs, prev.deleteKey)
  }

  /** Append `df` as a new snapshot: new files + everything the current
    * tip lists. Manifest-only on top of existing data — O(batch). */
  def commitAppend(df: DataFrame): Long = {
    val (newFiles, newRows) = writeDataFiles(df)
    publish("append",
      base => appendedFileSet(base, newFiles),
      base => (if (base == 0) 0L else snapshot(base).rows) + newRows)
  }

  /** Epoch-idempotent append — the foreachBatch streaming-sink contract
    * (the GraftSink exactly-once shape, on the table format): a re-run of
    * an already-committed micro-batch (failure replay, driver restart)
    * finds its `batchId` in the retained history and returns that version
    * instead of double-appending. Spark re-runs a failed epoch only after
    * the previous attempt is dead, so the check-then-publish pair is not
    * raced by its own retries. */
  def commitAppendOnce(batchId: Long, df: DataFrame): Long = {
    require(batchId >= 0, s"streaming epoch must be non-negative: $batchId")
    // Epochs commit in increasing order, so the dedup probe walks BACK
    // from the tip and stops at the first strictly-older epoch — O(versions
    // since that epoch), not O(history) per micro-batch (which would make a
    // long-lived stream's ingest quadratic in its own epoch count). Vacuumed
    // manifest prefixes end the walk the same way: older epochs are settled.
    var v = latestVersion()
    var dup = -1L
    while (v > 0 && dup < 0 && fs.exists(manifestPath(v))) {
      val s = snapshot(v)
      if (s.batchId == batchId && s.action == "append") dup = s.version
      else if (s.batchId >= 0 && s.batchId < batchId && s.action == "append") v = 0
      else v -= 1
    }
    if (dup >= 0) dup
    else {
      val (newFiles, newRows) = writeDataFiles(df)
      publish("append",
        base => appendedFileSet(base, newFiles),
        base => (if (base == 0) 0L else snapshot(base).rows) + newRows,
        batchId)
    }
  }

  /** DQ-gated append — the write-audit contract at the TABLE boundary
    * (the reference gates every pipeline stage with validators,
    * SURVEY.md §2.10; this moves the gate into the commit protocol
    * itself): the batch's check suite runs in ONE aggregation pass
    * BEFORE any data file is written, and a failing suite raises with
    * the per-check violation counts — no manifest, no orphan files, the
    * table never holds an invalid version. */
  def commitAppendChecked(df: DataFrame,
                          suite: Seq[graft.checks.Check]): Long = {
    val results = graft.checks.Checks.evaluate(df, suite)
    val failed = results.filterNot(_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"commit rejected by ${failed.length}/${results.length} checks: " +
          failed.map(r => s"${r.check_name}(${r.violations})").mkString(", "))
    commitAppend(df)
  }

  /** Replace the table contents with `df` as a new snapshot. Old files
    * stay on disk (time travel) until [[vacuum]]. */
  def commitOverwrite(df: DataFrame): Long = {
    val (newFiles, newRows) = writeDataFiles(df)
    publish("overwrite",
      base => newFiles.copy(seqs = Seq.fill(newFiles.files.length)(base + 1)),
      _ => newRows)
  }

  /** Data-skipping read: only files whose [min, max] stats band overlaps
    * `[lo, hi]` on the table's stats column are PLANNED at all — the
    * manifest is the skipping index, so a point/range lookup on a
    * 100 TB fact opens the handful of files that can match instead of
    * every footer. Files with unknown stats are read conservatively; the
    * residual predicate is applied either way, so the result equals
    * `read().filter(...)` exactly. */
  def readRange(lo: Long, hi: Long, version: Long = -1L): DataFrame = {
    val c = statsCol.getOrElse(
      sys.error(s"readRange on $root: table collects no stats column"))
    val v = if (version < 0) latestVersion() else version
    require(v > 0, s"no committed snapshot to read at $root")
    val snap = snapshot(v)
    val setAll = fileSetOf(snap)
    val keep = setAll.files.indices
      .filter(i => setAll.maxs(i) >= lo && setAll.mins(i) <= hi)
    import org.apache.spark.sql.functions.col
    val base =
      if (keep.isEmpty) read(v).limit(0)
      else morPlan(snap, keep, mergeSchema = false)
    base.filter(col(c).cast("long").between(lo, hi))
  }

  /** Publish exactly at `base + 1`; None when another writer got there
    * first. Unlike [[publish]] this does NOT retry — the caller re-derives
    * its content from the new tip (snapshot-isolation validation for
    * read-modify-write commits, where a blind retry would lose the
    * concurrent writer's rows). */
  private def publishAtBase(base: Long, action: String, fls: FileSet,
                            rowCount: Long,
                            dataChange: Boolean = true): Option[Long] = {
    val v = base + 1
    val body = manifestBody(v, action, base, rowCount, fls,
      batchId = -1L, dataChange = dataChange)
    fs.mkdirs(snapsDir)
    try {
      writeExclusive(manifestPath(v), body.getBytes("UTF-8"))
      Some(v)
    } catch { case _: java.io.IOException => None }
  }

  /** Read-modify-write commit with snapshot-isolation validation: derive
    * the new table contents from the tip via `transform`, rewrite, and
    * publish ONLY if the tip is still the version we read — a concurrent
    * commit in the window forces a re-derive from the new tip instead of
    * silently losing its rows (the write-skew hazard a blind
    * read-then-overwrite carries; the upsert/IVM streaming jobs document
    * exactly this gap, closed here). Copy-on-write: cost is O(table
    * rewrite) per attempt, the price of row-level semantics on immutable
    * files. */
  def commitRewrite(action: String)
                   (transform: Option[DataFrame] => DataFrame): Long = {
    var attempts = 0
    while (attempts < 50) {
      val base = latestVersion()
      val cur = if (base == 0) None else Some(read(base))
      val next = transform(cur)
      val (raw, rows) = writeDataFiles(next)
      // full rewrite: fresh sequences, MOR deletes absorbed into the data
      val fls = raw.copy(seqs = Seq.fill(raw.files.length)(base + 1))
      publishAtBase(base, action, fls, rows) match {
        case Some(v) => return v
        case None => // lost the race: drop this attempt's files, re-derive
          fls.files.map(_.split('/').head).distinct.foreach(uuid =>
            fs.delete(new Path(dataDir, uuid), true))
          attempts += 1
      }
    }
    sys.error(s"commitRewrite at $root: gave up after $attempts conflicts")
  }

  /** MERGE INTO (upsert by key, last-writer-wins on the watermark):
    * [[commitRewrite]] around the engine's merge operator. */
  def commitUpsert(batch: DataFrame, uniqueKey: Seq[String],
                   watermarkCol: String, tieBreak: Seq[String] = Seq.empty): Long =
    commitRewrite("upsert")(cur =>
      graft.models.Meta.mergeUpsert(cur.getOrElse(batch.limit(0)), batch,
        uniqueKey, watermarkCol, tieBreak))

  /** Row-level DELETE WHERE: keep everything the predicate does not
    * match. Same copy-on-write + validation discipline — O(table rewrite)
    * per call; see [[commitDeleteByKey]] for the O(batch) path. */
  def commitDelete(predicate: org.apache.spark.sql.Column): Long =
    commitRewrite("delete")(cur =>
      cur.getOrElse(sys.error(s"DELETE on empty table at $root"))
        .filter(!predicate))

  /** Merge-on-read DELETE by equality key — the commit writes ONLY the
    * key set as a small parquet file and re-lists the tip's data files;
    * readers anti-join it and the next [[compact]] materializes it. This
    * is the DELETE that survives 100 TB: copy-on-write ([[commitDelete]])
    * rewrites the whole table per call, this is O(keys) write + one
    * table scan for the exact row count. Sequencing: the delete applies
    * only to files committed BEFORE it, so re-appending a deleted key
    * later resurrects it (the Iceberg v2 equality-delete rule). `keyCols`
    * must match any earlier MOR delete on the table (one equality schema
    * per table between compactions). */
  def commitDeleteByKey(keys: DataFrame, keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "MOR delete needs at least one key column")
    import org.apache.spark.sql.functions.col
    val (keyFiles, _) = writeDataFiles(keys.select(keyCols.map(col): _*).distinct())
    var attempts = 0
    while (attempts < 50) {
      val base = latestVersion()
      require(base > 0, s"DELETE on empty table at $root")
      val snapBase = snapshot(base)
      val prev = fileSetOf(snapBase)
      require(prev.deleteKey.isEmpty || prev.deleteKey == keyCols,
        s"table at $root already carries MOR deletes keyed by " +
          s"(${prev.deleteKey.mkString(",")}); got (${keyCols.mkString(",")})")
      // exact surviving-row count: scan-only (no rewrite), and re-derived
      // per attempt so a lost race never publishes a stale count
      val deleted = read(base).join(
        spark.read.parquet(keyFiles.files.map(f => new Path(dataDir, f).toString): _*),
        keyCols, "left_semi").count()
      val fls = prev.copy(
        deletes = prev.deletes ++ keyFiles.files,
        deleteSeqs = prev.deleteSeqs ++ Seq.fill(keyFiles.files.length)(base + 1),
        deleteKey = keyCols)
      publishAtBase(base, "delete_mor", fls, snapBase.rows - deleted) match {
        case Some(v) => return v
        case None => attempts += 1
      }
    }
    sys.error(s"commitDeleteByKey at $root: gave up after $attempts conflicts")
  }

  /** Atomic range replacement — the daily-partition-reload shape
    * (Delta's `replaceWhere`): delete every row with `statsCol` in
    * `[lo, hi]` and insert `batch` (validated to lie inside the range)
    * in ONE version. File-surgical via the manifest stats: files fully
    * outside the range are kept untouched (manifest re-list), files
    * fully inside are dropped, and only STRADDLING files are rewritten
    * (reading them through any MOR deletes, which the rewrite absorbs
    * for those files) — cost O(straddling files + batch), never
    * O(table). With range-clustered layout (each file one day/partition)
    * the straddle set is empty and the reload is manifest-only + batch
    * write. Optimistic concurrency: same revalidate-on-collision loop as
    * [[commitRewrite]]. */
  def commitReplaceWhere(batch: DataFrame, lo: Long, hi: Long): Long = {
    import org.apache.spark.sql.functions.col
    val c = statsCol.getOrElse(
      sys.error(s"commitReplaceWhere on $root: table collects no stats column"))
    // NULL keys count as outside (they can't be range-validated); the
    // null-safe <=> keeps them from slipping through a three-valued NOT
    val outside = batch.filter(
      !(col(c).cast("long").between(lo, hi) <=> true)).count()
    require(outside == 0,
      s"replaceWhere batch has $outside rows outside [$lo, $hi] on $c (NULLs count as outside)")
    val (batchFiles, batchRows) = writeDataFiles(batch)
    var attempts = 0
    while (attempts < 50) {
      val base = latestVersion()
      require(base > 0, s"replaceWhere on empty table at $root")
      val snap = snapshot(base)
      val prev = fileSetOf(snap)
      val keepIdx = prev.files.indices
        .filter(i => prev.maxs(i) < lo || prev.mins(i) > hi)
      val straddleIdx = prev.files.indices
        .filter(i => !(prev.maxs(i) < lo || prev.mins(i) > hi) &&
          !(prev.mins(i) >= lo && prev.maxs(i) <= hi))
      // unknown-stats files land in straddle: rewritten, conservatively
      // keep = NOT in range, null-safely: a NULL-keyed row is outside
      // every range and must SURVIVE the rewrite (a three-valued
      // !between would silently drop it and overstate the row count)
      val (rewrite, rewriteRows) =
        if (straddleIdx.isEmpty) (FileSet(Seq.empty, Seq.empty, Seq.empty), 0L)
        else writeDataFiles(morPlan(snap, straddleIdx, mergeSchema = false)
          .filter(!(col(c).cast("long").between(lo, hi) <=> true)))
      val affectedIdx = prev.files.indices.diff(keepIdx)
      val removed =
        if (affectedIdx.isEmpty) 0L
        else morPlan(snap, affectedIdx, mergeSchema = false)
          .filter(col(c).cast("long").between(lo, hi)).count()
      // kept rows outside the range in straddlers move to the rewrite;
      // net row delta = batch - rows removed from the range
      val fls = FileSet(
        keepIdx.map(prev.files) ++ rewrite.files ++ batchFiles.files,
        keepIdx.map(prev.mins) ++ rewrite.mins ++ batchFiles.mins,
        keepIdx.map(prev.maxs) ++ rewrite.maxs ++ batchFiles.maxs,
        keepIdx.map(prev.seqs) ++
          Seq.fill(rewrite.files.length + batchFiles.files.length)(base + 1),
        prev.deletes, prev.deleteSeqs, prev.deleteKey)
      publishAtBase(base, "replace_where", fls, snap.rows - removed + batchRows) match {
        case Some(v) => return v
        case None => // lost the race: drop this attempt's rewrite files only
          rewrite.files.map(_.split('/').head).distinct.foreach(uuid =>
            fs.delete(new Path(dataDir, uuid), true))
          attempts += 1
      }
    }
    sys.error(s"commitReplaceWhere at $root: gave up after $attempts conflicts")
  }

  /** Roll-forward rollback: publish a NEW version re-listing `version`'s
    * files. History stays intact — reads of intermediate versions still
    * resolve (the blue-green restore, minus the mutation). */
  def rollbackTo(version: Long): Long = {
    val snap = snapshot(version)
    publish("rollback", _ => fileSetOf(snap), _ => snap.rows)
  }

  /** Incremental read: only the rows ADDED between `fromVersion`
    * (exclusive) and `toVersion` (inclusive) — the file-set difference of
    * the two manifests. This is how a downstream incremental consumer
    * (the reference's watermark merge, `main_taico_staging.sql:68-70`,
    * generalized to layout) processes a day's commits without rescanning
    * the table: cost scales with the delta's files, never the table.
    * Overwrite/rollback versions in the range contribute their files only
    * if those files are new relative to `fromVersion` — a file re-listed
    * by a rollback is NOT re-delivered if `fromVersion` already saw it. */
  def readAppendedBetween(fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"empty version range: ($fromVersion, $toVersion]")
    // walk the versions: a file counts as delivered-new only the first
    // time a DATA-CHANGING version lists it. Compaction versions
    // (dataChange=false) re-list content in new files — skipping them is
    // what keeps a change-feed consumer from re-receiving the whole
    // table after maintenance (the dataChange contract of the public
    // log-structured formats). Requires the range's manifests to be
    // retained (vacuum drops old ones — bootstrap a fresh consumer from
    // read(tip) instead of version 0 on a vacuumed table).
    val seen = scala.collection.mutable.Set[String]()
    if (fromVersion > 0) seen ++= snapshot(fromVersion).files
    val added = Seq.newBuilder[String]
    ((fromVersion + 1) to toVersion).foreach { v =>
      val s = snapshot(v)
      if (s.dataChange) s.files.foreach { f => if (seen.add(f)) added += f }
      else seen ++= s.files // reorganized files never deliver
    }
    val adds = added.result()
    if (adds.isEmpty) read(toVersion).limit(0)
    else spark.read.parquet(adds.map(f => new Path(dataDir, f).toString): _*)
  }

  /** Change data feed over `(fromVersion, toVersion]`: every row-level
    * change with `_change_type` ('insert' | 'delete') and
    * `_commit_version` — the public CDF shape (an update = delete +
    * insert). Unlike [[readAppendedBetween]] (the append feed), this
    * RETRACTS: a MOR delete emits its pre-image rows as deletes.
    * Per-version cost:
    *  - `dataChange=false` (compaction): nothing — free;
    *  - appends: the version's new files (`seq == v`, manifest-only
    *    detection) as inserts — O(delta files);
    *  - `delete_mor`: pre-image = the prior version's read semi-joined
    *    with the commit's key files — one pruned scan, keys broadcast;
    *  - rewrite actions (overwrite/rollback/upsert/delete): multiset
    *    diff via `exceptAll` both ways — two scans + a shuffle, the
    *    honest cost of deriving changes a copy-on-write commit didn't
    *    record (the reason MOR is the scalable row-level path).
    */
  def readChangeFeed(fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"empty version range: ($fromVersion, $toVersion]")
    import org.apache.spark.sql.functions.{col, lit}
    def tagged(df: DataFrame, tpe: String, v: Long): DataFrame =
      df.select(col("*"), lit(tpe).as("_change_type"),
        lit(v).as("_commit_version"))
    val parts = ((fromVersion + 1) to toVersion).flatMap { v =>
      val s = snapshot(v)
      if (!s.dataChange) Seq.empty
      else s.action match {
        case "append" =>
          val fl = fileSetOf(s)
          val fresh = fl.files.indices.filter(i => fl.seqs(i) == v)
          if (fresh.isEmpty) Seq.empty
          else Seq(tagged(morPlan(s, fresh, mergeSchema = false), "insert", v))
        case "delete_mor" =>
          val fl = fileSetOf(s)
          val keyFiles = fl.deletes.indices
            .filter(j => fl.deleteSeqs(j) == v).map(fl.deletes)
          val keys = spark.read
            .parquet(keyFiles.map(f => new Path(dataDir, f).toString): _*)
          Seq(tagged(read(v - 1).join(keys, fl.deleteKey, "left_semi"),
            "delete", v))
        case _ =>
          val prev = if (v - 1 == 0) read(v).limit(0) else read(v - 1)
          val cur = read(v)
          Seq(tagged(cur.exceptAll(prev), "insert", v),
              tagged(prev.exceptAll(cur), "delete", v))
      }
    }
    if (parts.isEmpty) tagged(read(toVersion).limit(0), "insert", 0L).limit(0)
    else parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  /** The pure append feed's file list over `(fromVersion, toVersion]`:
    * new files (`seq == v`) of APPEND versions only. Unlike
    * [[readAppendedBetween]] (which delivers any first-listed file, so a
    * rewrite's files — carrying mostly OLD rows — would be re-delivered
    * as new), this is the list a streaming consumer can treat as
    * insert-only; the caller decides what non-append data changes in the
    * range mean (error, skip, or switch to [[readChangeFeed]]). */
  def appendFilesBetween(fromVersion: Long, toVersion: Long): Seq[String] =
    appendDelta(fromVersion, toVersion)._1

  /** Actions in `(fromVersion, toVersion]` that change data but are NOT
    * plain appends — the versions an insert-only consumer must be told
    * about ((version, action) pairs; compaction is excluded, it changes
    * nothing). */
  def nonAppendChangesBetween(fromVersion: Long, toVersion: Long): Seq[(Long, String)] =
    appendDelta(fromVersion, toVersion)._2

  /** One manifest walk serving both feed questions: (append files to
    * deliver, non-append data changes to warn about). Feed consumers
    * need both per batch — parsing each manifest once instead of twice
    * halves the metadata I/O on the path advertised as O(delta files). */
  def appendDelta(fromVersion: Long, toVersion: Long)
      : (Seq[String], Seq[(Long, String)]) = {
    val files = Seq.newBuilder[String]
    val changes = Seq.newBuilder[(Long, String)]
    ((fromVersion + 1) to toVersion).foreach { v =>
      val s = snapshot(v)
      if (s.dataChange) {
        if (s.action == "append") {
          val fl = fileSetOf(s)
          fl.files.indices.filter(i => fl.seqs(i) == v).foreach(i => files += fl.files(i))
        } else changes += ((v, s.action))
      }
    }
    (files.result(), changes.result())
  }

  /** Read a manifest-relative file list as a DataFrame (empty list →
    * empty frame with the tip's schema). */
  private[sources] def readFiles(files: Seq[String]): DataFrame =
    if (files.isEmpty) read().limit(0)
    else spark.read.parquet(files.map(f => new Path(dataDir, f).toString): _*)

  /** Compaction as a COMMIT: rewrite the tip at ~`targetRowsPerFile`
    * rows per file and publish it as a `dataChange=false` version — same
    * contents, fewer/bigger files, atomically switched, time travel to
    * the small-file versions intact, and change-feed consumers skip it
    * entirely. The streaming-sink small-file problem ([[Sources
    * .compactTable]]'s in-place rewrite) solved the transactional way. */
  def compact(targetRowsPerFile: Long): Long =
    compact(targetRowsPerFile, clusterBy = None)

  /** Compaction with optional RANGE CLUSTERING (`OPTIMIZE ... ZORDER`'s
    * single-column shape): `clusterBy = Some(col)` routes the rewrite
    * through `repartitionByRange(col)`, so each compacted file covers a
    * tight, near-disjoint band of the column — the manifest's min/max
    * stats then make [[readRange]] plan O(matching files) and
    * [[commitReplaceWhere]] manifest-only (no straddlers). Maintenance
    * chooses layout; readers and writers are unchanged. */
  def compact(targetRowsPerFile: Long,
              clusterBy: Option[String]): Long = {
    var attempts = 0
    while (attempts < 50) {
      val base = latestVersion()
      require(base > 0, s"nothing to compact at $root")
      val snapBase = snapshot(base)
      val cur = read(base)
      val n = math.max(1L, math.ceil(
        snapBase.rows.toDouble / targetRowsPerFile).toLong).toInt
      val arranged = clusterBy match {
        case Some(c) =>
          import org.apache.spark.sql.functions.col
          cur.repartitionByRange(n, col(c))
        case None => cur.repartition(n)
      }
      // cur reads THROUGH any MOR deletes, so the rewrite materializes
      // them: the compacted version lists no delete files. Publish is
      // pinned to the base we READ (snapshot-isolation validation, same
      // as commitRewrite): a blind retry at a new base would re-list the
      // stale compacted content and erase a concurrent commit's rows —
      // worse here, tagged dataChange=false so no feed ever corrects it.
      val (raw, rows) = writeDataFiles(arranged)
      val fls = raw.copy(seqs = Seq.fill(raw.files.length)(base + 1))
      publishAtBase(base, "compact", fls, rows, dataChange = false) match {
        case Some(v) => return v
        case None => // lost the race: drop this attempt's files, re-read tip
          raw.files.map(_.split('/').head).distinct.foreach(uuid =>
            fs.delete(new Path(dataDir, uuid), true))
          attempts += 1
      }
    }
    sys.error(s"compact at $root: gave up after $attempts conflicts")
  }

  /** All RETAINED snapshots, oldest first (the table's audit history;
    * [[vacuum]] may have dropped a prefix). */
  def history(): Seq[Snapshot] = {
    if (!fs.exists(snapsDir)) return Seq.empty
    fs.listStatus(snapsDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted.toSeq.map(snapshot)
  }

  private[sources] def hadoopFs: FileSystem = fs

  /** Delete data files unreachable from the last `keepLast` manifests and
    * drop the older manifests. Bounded metadata scan — cost scales with
    * history length and file count, never data volume. */
  def vacuum(keepLast: Int = 1): Unit = {
    require(keepLast >= 1, "must keep at least the tip")
    val tip = latestVersion()
    if (tip == 0) return
    val keepFrom = math.max(1L, tip - keepLast + 1)
    val live = (keepFrom to tip)
      .flatMap(v => { val s = snapshot(v); s.files ++ s.deletes }).toSet
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).map(_.getPath).foreach { commitDir =>
        if (fs.getFileStatus(commitDir).isDirectory) {
          fs.listStatus(commitDir).map(_.getPath)
            .filter(p => p.getName.endsWith(".parquet") &&
              !live.contains(s"${commitDir.getName}/${p.getName}"))
            .foreach(fs.delete(_, false))
          if (fs.listStatus(commitDir).isEmpty) fs.delete(commitDir, true)
        }
      }
    }
    (1L until keepFrom).foreach(v => fs.delete(manifestPath(v), false))
  }
}

/** Checkpointed incremental consumer over a [[SnapshotTable]]'s version
  * chain — the batch-incremental "table as a change feed" shape (the
  * reference's scheduled incremental rerun, SURVEY.md §2.9 I2, driven by
  * snapshot versions instead of a timestamp watermark).
  *
  * Offsets are files under `checkpointDir/offsets/` whose NAME is the
  * consumed tip version, published create-exclusive like table manifests:
  * a poll that dies mid-process leaves no offset, so the next poll
  * re-delivers the same delta — at-least-once, which an idempotent
  * `process` (overwrite-by-version, merge-by-key) upgrades to
  * exactly-once: the foreachBatch contract. Restart = construct a new
  * follower on the same checkpointDir; it resumes from the max offset.
  */
class SnapshotFollower(table: SnapshotTable, checkpointDir: String,
                       skipChangeCommits: Boolean = false) {
  private val offsetsDir = new Path(checkpointDir, "offsets")
  private def fs: FileSystem = table.hadoopFs

  /** Highest version a completed poll has committed, 0 if none. */
  def lastConsumed(): Long = {
    if (!fs.exists(offsetsDir)) return 0L
    fs.listStatus(offsetsDir).map(_.getPath.getName)
      .filter(_.startsWith("o")).map(_.stripPrefix("o").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Process everything committed since the last completed poll. Returns
    * the (fromExclusive, toInclusive) version range processed, or None if
    * the table has nothing new. The offset advances ONLY after `process`
    * returns — a throw re-delivers the delta on the next poll. */
  def poll(process: org.apache.spark.sql.DataFrame => Unit): Option[(Long, Long)] = {
    val from = lastConsumed()
    val tip = table.latestVersion()
    if (tip <= from) return None
    // same insert-only contract as the streaming source (one manifest
    // walk for both questions): a rewrite or delete in the range is an
    // error unless the consumer opted into appends-only (rewrite files
    // would replay old rows as new)
    val (appendFiles, changed) = table.appendDelta(from, tip)
    if (changed.nonEmpty && !skipChangeCommits)
      throw new IllegalStateException(
        "SnapshotFollower: non-append data change " +
          changed.map { case (v, a) => s"$a@v$v" }.mkString(", ") +
          " in the poll range; construct with skipChangeCommits=true to " +
          "stream appends only, or consume readChangeFeed for retractions")
    process(table.readFiles(appendFiles))
    fs.mkdirs(offsetsDir)
    // Create-exclusive like manifests, but a COLLISION here is NOT a
    // failure: processing already succeeded, and the existing offset means
    // a concurrent poll of the same checkpoint committed the same tip.
    // Only the already-exists case is benign — any other IO failure must
    // surface, or a persistently unwritable offsets dir would silently
    // degrade into unbounded full re-delivery on every poll.
    val offsetPath = new Path(offsetsDir, f"o$tip%020d")
    try {
      val out = fs.create(offsetPath, false)
      out.close()
    } catch {
      case e: java.io.IOException =>
        if (!fs.exists(offsetPath)) throw e // genuine failure, not a race
    }
    Some((from, tip))
  }
}
