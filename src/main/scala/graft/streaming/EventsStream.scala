package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming-shaped capability (SURVEY.md §2.9): the reference's
  * incremental materialization re-expressed as Structured Streaming, plus
  * the windowed aggregations a streaming events feed needs.
  * `hourlyByType` works on batch and streaming frames alike;
  * `dedupWithinWatermark` is streaming-only (Spark rejects it on batch
  * datasets) — its batch twin is the earliest-wins keyed dedup in
  * StreamQueries, which is what the oracle checks. The streaming paths
  * are exercised end-to-end in EventsStreamSpec.
  */
object EventsStream {

  /** Tumbling 1-hour windowed counts/sums per event type, 2-hour
    * watermark for late data (I1's streaming flavor). On a stream this
    * emits append-mode finalized windows; on a batch frame it is a plain
    * group-by. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // exact decimal aggregation (order-independent), DOUBLE at the
        // output boundary (engine-stable decimal→double cast)
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("total_value"))

  /** CHAINED stateful aggregations in one streaming query: hourly
    * per-type counts (stateful agg #1) re-aggregated to the hour's top
    * type (stateful agg #2, grouped on the same event-time window so
    * the watermark propagates through both states — Spark's chained
    * time-window aggregation support). The argmax is max(struct(n,
    * type)): deterministic under count ties (type string breaks them),
    * and the second state holds one struct per open window, not the
    * type domain. Works identically on batch frames. */
  def trendingType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window"))
      .agg(max(struct(col("n"), col("event_type"))).as("top"))
      .select(col("window.start").as("hour_ts"),
        col("top.event_type").as("top_type"), col("top.n").as("top_n"))

  /** Streaming dedup on a business key within the watermark horizon —
    * the streaming analog of the incremental unique_key merge (I1).
    * Batch equivalent: earliest-event-wins keyed dedup (StreamQueries
    * pins the deterministic tie-break). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** File-based streaming reader for an events-shaped directory — the
    * productionized entry: readStream → transform → writeStream with
    * checkpointing is the deployment shape at scale. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
      .parquet(dir)

  /** End-to-end streaming dedup job: file source → watermark dedup →
    * parquet sink, one Trigger.AvailableNow pass, exactly-once via the
    * checkpoint (a restart with the same checkpoint reprocesses nothing).
    * Blocks until the micro-batches drain; returns the streaming query's
    * run id. */
  def runDedupJob(spark: SparkSession, inDir: String, outDir: String,
                  checkpointDir: String): String =
    runJob(dedupWithinWatermark(readEventsStream(spark, inDir)), outDir, checkpointDir)

  /** End-to-end incremental materialization of the hourly rollup: file
    * source → watermark → tumbling-window agg → parquet sink (append mode
    * emits only FINALIZED windows — the streaming twin of the
    * `stream_hourly_by_type` batch query, and the deployment shape of the
    * reference's scheduled incremental models: new files land, the next
    * AvailableNow pass folds exactly the unseen data in). */
  def runHourlyJob(spark: SparkSession, inDir: String, outDir: String,
                   checkpointDir: String): String =
    runJob(hourlyByType(readEventsStream(spark, inDir)), outDir, checkpointDir)

  /** End-to-end streaming UPSERT job: file source → `foreachBatch` MERGE
    * into a parquet target maintained as latest-row-per-(user, type) —
    * the streaming deployment shape of the incremental model when the
    * sink must be updated IN PLACE rather than appended (the dedup job's
    * append-mode sibling). Each micro-batch applies `Meta.mergeUpsert`
    * (source wins on match) against the current target, so a
    * re-delivered key overwrites its target row — true MERGE semantics,
    * batch by batch, with the checkpoint guaranteeing restarts
    * reprocess nothing.
    *
    * The merged frame is materialized (`localCheckpoint`) before the
    * overwrite — the read-then-overwrite hazard of a plain parquet
    * target; a transactional table format's MERGE INTO replaces this
    * two-step at production scale, with `foreachBatch` staying the
    * integration point. Local-path target by design (the demo sink). */
  def runUpsertJob(spark: SparkSession, inDir: String, targetDir: String,
                   checkpointDir: String): String = {
    val q = readEventsStream(spark, inDir).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // Hadoop FileSystem probe, not java.io.File — the target dir may
        // live on HDFS/S3 where a local-file check always reads empty
        val targetPath = new org.apache.hadoop.fs.Path(targetDir)
        val tfs = targetPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cur =
          if (tfs.exists(targetPath)) spark.read.parquet(targetDir)
          else batch.limit(0).toDF()
        val merged = graft.models.Meta.mergeUpsert(cur, batch.toDF(),
            uniqueKey = Seq("user_id", "event_type"), watermarkCol = "ts",
            tieBreak = Seq("event_id"))
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(targetDir)
        graft.operators.Checkpoints.release(merged)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }

  /** End-to-end streaming IVM job: file source → `foreachBatch` folding
    * each micro-batch's PARTIAL aggregates into a parquet aggregate-state
    * table via `Meta.incrementalAggMerge` — the streaming deployment of
    * incremental aggregate maintenance (the upsert job's aggregate
    * sibling). Per micro-batch the work is one partial agg over the
    * batch plus a group-cardinality merge with the state; raw history is
    * never rescanned, so the state table stays current over an unbounded
    * feed at per-batch cost. Same read-then-overwrite staging caveat as
    * `runUpsertJob` (a transactional format's MERGE replaces the
    * two-step at production scale). At-least-once: if a batch retries
    * after the state overwrite but before the checkpoint commits, the
    * delta is applied twice — stamping the state with the batchId (and
    * skipping an already-applied id) makes the retry detectable; a
    * transactional sink removes the window entirely. */
  def runIvmAggJob(spark: SparkSession, inDir: String, stateDir: String,
                   checkpointDir: String): String = {
    val keys = Seq("event_type")
    val partialCols = Seq("n", "sv")
    def partials(df: DataFrame): DataFrame =
      graft.models.Meta.toPartials(df, keys,
        Seq("n" -> count(lit(1)), "sv" -> sum(col("value").cast(DecimalType(18, 2)))))
    val q = readEventsStream(spark, inDir).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val delta = partials(batch.toDF())
        // Hadoop FileSystem probe, not java.io.File — the state dir may
        // live on HDFS/S3 where a local-file check always reads empty
        val statePath = new org.apache.hadoop.fs.Path(stateDir)
        val fs = statePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cur =
          if (fs.exists(statePath)) spark.read.parquet(stateDir)
          else delta.limit(0)
        val merged = graft.models.Meta
          .incrementalAggMerge(cur, delta, keys, partialCols)
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(stateDir)
        graft.operators.Checkpoints.release(merged)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }

  /** Streaming ingest into the transactional table format — the job the
    * `runUpsertJob`/`runIvmAggJob` scaladocs point at: each micro-batch
    * lands as ONE [[graft.sources.SnapshotTable]] append via
    * `commitAppendOnce(batchId, …)`, so an epoch replayed after a failure
    * finds its batchId in the manifest history and no-ops — EXACTLY-ONCE
    * table contents with no read-then-overwrite window at all (the
    * create-exclusive manifest put is the only commit point, and appends
    * never touch existing files). Downstream, a
    * [[graft.sources.SnapshotFollower]] consumes the same table
    * incrementally by version — the full streaming-lakehouse loop. */
  def runSnapshotIngestJob(spark: SparkSession, inDir: String,
                           tableRoot: String, checkpointDir: String): String = {
    val table = new graft.sources.SnapshotTable(spark, tableRoot)
    val q = readEventsStream(spark, inDir).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        table.commitAppendOnce(batchId, batch.toDF())
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }

  /** Streaming MV maintenance: `runIvmAggJob`'s registered-summary
    * sibling — each micro-batch of appended fact rows folds into a
    * [[graft.operators.MatViews]] summary via `MatViews.maintain`
    * (partial agg over the batch + group-cardinality merge; min/max
    * merge by min/max, everything else by sum), and the rewrite rule's
    * registration is refreshed per batch, so eligible aggregates over
    * the FACT path keep rewriting to a summary that is exact over
    * everything appended so far. The fact history is never rescanned.
    * Same at-least-once caveat as `runIvmAggJob` (overwrite-then-commit
    * window; a transactional table format closes it). */
  def runMvMaintainJob(spark: SparkSession, inDir: String, factPath: String,
                       mvPath: String, checkpointDir: String,
                       dims: Seq[String], measures: Seq[String]): String = {
    val q = readEventsStream(spark, inDir).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.MatViews.maintain(spark, factPath, mvPath,
          dims, measures, batch.toDF())
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }

  /** Streaming quarantine-lane ingest: each micro-batch splits on the
    * suite's row-level predicates ([[graft.checks.Checks.quarantineSplit]])
    * — clean rows append to the target, violating rows to the dead-letter
    * dir with the names of the checks they failed — while the batch's
    * full suite VERDICT is computed in flight by the clean-side write
    * itself (the observation sits under the split filter, so the one
    * pass that writes clean rows also aggregates over every batch row;
    * no separate DQ scan). Per-batch verdicts go to `onBatch` — the
    * alert-routing hook a production ingest wires to its pager.
    * At-least-once on batch retry (parquet appends re-land); the DSv2
    * graft-sink's epoch-idempotent commit or a transactional format
    * closes that, orthogonally to the DQ routing shown here. */
  def runQuarantineIngestJob(spark: SparkSession, inDir: String,
                             targetDir: String, quarantineDir: String,
                             checkpointDir: String,
                             checks: Seq[graft.checks.Check],
                             onBatch: (Long, Seq[graft.checks.CheckResult]) => Unit =
                               (_, _) => ()): String = {
    val q = readEventsStream(spark, inDir).writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val (observed, handle) = graft.checks.Checks.observedChecks(
          batch.toDF(), checks, s"dq_batch_$batchId")
        val (clean, bad) = graft.checks.Checks.quarantineSplit(observed, checks)
        clean.write.mode("append").parquet(targetDir)
        bad.write.mode("append").parquet(quarantineDir)
        onBatch(batchId, handle.results())
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }

  /** Stream-stream interval join: each click joined to the same user's
    * purchases landing within `withinSeconds` after it — attribution, the
    * canonical two-stream join. Both sides carry watermarks and the join
    * condition bounds event time in BOTH directions, so Spark can size
    * the join state and evict expired rows (an unbounded-interval
    * stream-stream join would hold state forever). Works identically on
    * batch frames (the condition is a plain interval predicate there). */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       withinSeconds: Long): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinSeconds SECONDS"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Left-outer variant of the interval join: every click emits, matched
    * or not — unmatched clicks surface with NULL purchase columns once
    * the watermark proves no purchase can still arrive in the window.
    * This is the funnel-loss stream (clicks that never converted), which
    * an inner join silently drops. Same bounded state as the inner
    * variant; the outer rows are emitted at state eviction time, so
    * results are complete only after the watermark passes — identical
    * end-state to the batch left join on the same frames. */
  def clickAttributionLeftOuter(clicks: DataFrame, purchases: DataFrame,
                                withinSeconds: Long): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinSeconds SECONDS"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** one event for the stateful sessionizer (ts kept as TIMESTAMP for the
    * watermark, micros for the gap arithmetic) */
  case class SessEvent(event_id: Long, ts: java.sql.Timestamp, ts_us: Long, user_id: Long)
  /** per-user open-session state: running session counter + the open
    * session's bounds */
  case class SessAccum(seq: Long, startUs: Long, endUs: Long, n: Long)
  /** a finalized session */
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
                        start_us: Long, end_us: Long)

  /** Stateful streaming sessionization: per-user sessions closed by an
    * inactivity gap, emitted ONLY when finalized — either a later event
    * opens the next session, or the event-time watermark passes the open
    * session's gap horizon (GroupStateTimeout.EventTimeTimeout). This is
    * the `KeyValueGroupedDataset.flatMapGroupsWithState` surface: state is
    * a 4-field accumulator per user, not the user's events, so state size
    * is O(active users) regardless of event volume.
    *
    * Within a micro-batch the group's events are sorted by (ts, event_id)
    * before folding; cross-batch reordering inside the watermark folds
    * late events into the open session (bounded staleness — exact late
    * re-sessionization would need per-event state). The batch twin with
    * identical semantics on ordered input is Temporal.sessionize.
    *
    * After a timeout finalizes a session, the per-user SEQ COUNTER is
    * retained (state with n=0) for `retainSeconds` more, so the next
    * session numbers seq+1 instead of restarting at 1 — otherwise
    * (user_id, session_seq) keys would collide across timeout boundaries.
    * A user idle past the retention horizon is dropped entirely and their
    * numbering restarts at 1 (the documented state-size/uniqueness
    * trade). */
  def sessionizeStream(events: DataFrame, gapSeconds: Long,
                       retainSeconds: Long = 30L * 86400L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapSeconds * 1000000L
    events.select(col("event_id").cast(LongType), col("ts").cast(TimestampType),
        unix_micros(col("ts")).as("ts_us"), col("user_id").cast(LongType))
      .withWatermark("ts", "2 hours")
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessAccum, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessEvent], state: GroupState[SessAccum]) =>
          if (state.hasTimedOut) {
            val a = state.get
            if (a.n == 0) {
              // retention horizon passed with no new session: finally
              // drop the counter
              state.remove()
              Iterator.empty
            } else {
              // finalize the open session but KEEP the seq counter
              // (n=0 marker) so the user's next session numbers seq+1
              state.update(a.copy(n = 0L))
              state.setTimeoutTimestamp(math.max(
                a.endUs / 1000L + retainSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
              Iterator.single(SessionOut(user, a.seq, a.n, a.startUs, a.endUs))
            }
          } else {
            val evs = it.toArray.sortBy(e => (e.ts_us, e.event_id))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption.orNull
            evs.foreach { e =>
              if (cur == null) cur = SessAccum(1L, e.ts_us, e.ts_us, 1L)
              else if (cur.n == 0) // closed-by-timeout marker: next session
                cur = SessAccum(cur.seq + 1, e.ts_us, e.ts_us, 1L)
              else if (e.ts_us - cur.endUs > gapUs) {
                closed += SessionOut(user, cur.seq, cur.n, cur.startUs, cur.endUs)
                cur = SessAccum(cur.seq + 1, e.ts_us, e.ts_us, 1L)
              } else cur = cur.copy(
                startUs = math.min(cur.startUs, e.ts_us),
                endUs = math.max(cur.endUs, e.ts_us), n = cur.n + 1)
            }
            if (cur == null) closed.iterator // spurious empty invocation
            else {
              state.update(cur)
              // timeout must sit above the current watermark (Spark
              // rejects a timeout at/below it — possible when the open
              // session's horizon is already inside the watermark delay)
              // open session times out after the gap; a bare counter
              // marker (possible when an invocation carried no events)
              // times out after the retention horizon
              state.setTimeoutTimestamp(math.max(
                cur.endUs / 1000L +
                  (if (cur.n == 0) retainSeconds else gapSeconds) * 1000L,
                state.getCurrentWatermarkMs() + 1L))
              closed.iterator
            }
          }
      }
  }

  /** Declarative twin of [[sessionizeStream]]: Spark's NATIVE session
    * window (`session_window(ts, gap)`) — gap-merged per-user sessions as
    * a grouping expression, so Catalyst owns the state store (merging
    * session state, watermark eviction) instead of user code. Merge rule
    * (measured, pinned by spec + oracle): an event extends a session
    * while `diff <= gap` — two events exactly `gap` apart still merge,
    * the SAME rule as the flatMapGroupsWithState path and
    * Temporal.sessionize (`diff > gap` opens). Works identically
    * on batch frames, where it is a plain aggregate (the oracle replays
    * it as a lag/cumsum gap split); on a stream, append mode emits only
    * watermark-finalized sessions. Output end_us is the gap-EXTENDED end
    * (Spark's window.end = last event + gap). */
  def sessionWindowAgg(events: DataFrame, gapSeconds: Long): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  /** input row for the streaming SCD2 maintainer */
  case class Scd2In(user_id: Long, event_id: Long, event_type: String, ts_us: Long)
  /** the per-key open version held in state */
  case class Scd2Cur(event_type: String, valid_from_us: Long)
  /** a version CLOSED by a change — matches stream_scd2_history's closed
    * rows (valid_to_us non-null) */
  case class Scd2Closed(user_id: Long, event_type: String,
                        valid_from_us: Long, valid_to_us: Long)

  /** SCD Type-2 maintenance as a `transformWithState` StatefulProcessor
    * (Spark 4's arbitrary-state API, the successor of
    * flatMapGroupsWithState): per-key `ValueState` holds the OPEN
    * version; an input row with a different attribute value closes it —
    * emitting the finalized (valid_from, valid_to) interval — and opens
    * the next. Consecutive repeats collapse, exactly the batch
    * `stream_scd2_history` rule, whose closed rows are this stream's
    * complete output (the open versions live in state, not the sink).
    * State is one small case class per key — O(active keys), never
    * history-sized; TTL (`TTLConfig`) is the knob a production deploy
    * sets to bound key cardinality. Requires the RocksDB state store
    * provider (transformWithState's backing store in Spark 4). */
  class Scd2Processor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, Scd2In, Scd2Closed] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var cur: ValueState[Scd2Cur] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[Scd2Cur]("cur",
        org.apache.spark.sql.Encoders.product[Scd2Cur], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Scd2In],
                                 tv: TimerValues): Iterator[Scd2Closed] = {
      // micro-batch rows arrive unordered; sort this key's slice (bounded
      // by the batch, not the history)
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
      var c = if (cur.exists()) cur.get() else null
      sorted.foreach { r =>
        if (c == null) c = Scd2Cur(r.event_type, r.ts_us)
        else if (r.ts_us < c.valid_from_us) {
          // late beyond the open version: already-emitted intervals can't
          // be rewritten, so folding this row in would produce an inverted
          // (valid_to < valid_from) interval. Dropped — cross-batch order
          // is only guaranteed up to the open version's start.
        } else if (c.event_type != r.event_type) {
          out += Scd2Closed(key, c.event_type, c.valid_from_us, r.ts_us)
          c = Scd2Cur(r.event_type, r.ts_us)
        } // same value: consecutive repeat, collapses
      }
      if (c != null) cur.update(c)
      out.iterator
    }
  }

  /** Streaming SCD2 history: emits closed versions as changes arrive.
    * Rows are ordered within each micro-batch; across batches a row with
    * ts earlier than the open version's start is dropped (see
    * [[Scd2Processor.handleInputRows]]) — feed in event-time order (or
    * behind a watermark-sorted stage) for exact batch parity. */
  def scd2Stream(events: DataFrame): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type").isNotNull)
      .select(col("user_id").cast(LongType), col("event_id").cast(LongType),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[Scd2In]
      .groupByKey(_.user_id)
      .transformWithState(new Scd2Processor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  /** input row for the abandoned-flow detector */
  case class FlowEvent(user_id: Long, event_type: String, ts_us: Long)
  /** per-key flow state: the open funnel entry (`start_us >= 0`, with its
    * registered timer's deadline for exact-match expiry and deleteTimer),
    * plus whether the current purchase segment has already armed a flow —
    * the batch twin opens only the FIRST view per segment, so once a flow
    * opens (and even after it expires) later views must not re-arm until
    * a `convertType` event starts the next segment. */
  case class FlowState(start_us: Long, deadline_ms: Long, seg_consumed: Boolean)
  /** a funnel entry that expired unconverted */
  case class Abandonment(user_id: Long, start_us: Long, deadline_us: Long)

  /** Abandoned-flow detection — the TIMER half of the transformWithState
    * API (the SCD2 maintainer covers keyed ValueState; this covers
    * `registerTimer` + `handleExpiredTimer` with event-time timers): a
    * `startType` event opens a pending entry and registers an event-time
    * timer at start + timeout; a `convertType` event clears it; if the
    * WATERMARK passes the deadline first, the expired-timer callback
    * emits the abandonment. This is the push-based alternative to
    * re-scanning for "started but never finished" rows — output appears
    * the moment lateness is PROVEN (by the watermark passing the
    * deadline, or by a conversion arriving after it), with
    * O(open flows) state. Exactly the batch `stream_abandoned_flows`
    * rule: one flow per purchase segment (the FIRST view after each
    * conversion arms; later views never re-arm), ties sort conversion
    * before start, and a conversion outside (start, start+T] does NOT
    * rescue the flow. */
  class AbandonmentProcessor(startType: String, convertType: String, timeoutSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, FlowEvent, Abandonment] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ExpiredTimerInfo, TTLConfig, ValueState}
    private val timeoutUs = timeoutSeconds * 1000000L
    @transient private var state: ValueState[FlowState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FlowState]("flow",
        org.apache.spark.sql.Encoders.product[FlowState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[FlowEvent],
                                 tv: TimerValues): Iterator[Abandonment] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Abandonment]
      var st = if (state.exists()) state.get() else FlowState(-1L, -1L, seg_consumed = false)
      // ts tie-break: convertType sorts before startType at the same
      // instant ("purchase" < "view"), matching the batch twin's
      // (ts_us, event_type) ordering — a same-ts purchase closes the
      // OLD segment before the view opens the next one.
      rows.toArray.sortBy(e => (e.ts_us, e.event_type)).foreach { e =>
        if (e.event_type == startType) {
          if (st.start_us < 0 && !st.seg_consumed) {
            val deadlineMs = e.ts_us / 1000L + timeoutSeconds * 1000L
            st = FlowState(e.ts_us, deadlineMs, seg_consumed = true)
            getHandle.registerTimer(deadlineMs)
          } // a later view in an armed/consumed segment never re-arms
        } else if (e.event_type == convertType) {
          if (st.start_us >= 0) {
            getHandle.deleteTimer(st.deadline_ms) // no stale timer survives the flow
            if (e.ts_us > st.start_us + timeoutUs)
              // the conversion itself PROVES the deadline passed unconverted —
              // batch abandons this flow (purchase outside (start, start+T]);
              // emit now rather than waiting for the watermark
              out += Abandonment(key, st.start_us, st.start_us + timeoutUs)
          }
          st = FlowState(-1L, -1L, seg_consumed = false) // conversion opens a new segment
        }
      }
      state.update(st)
      out.iterator
    }
    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Abandonment] = {
      val st = if (state.exists()) state.get() else FlowState(-1L, -1L, seg_consumed = false)
      if (st.start_us >= 0 && info.getExpiryTimeInMs == st.deadline_ms) {
        // segment stays consumed: the batch twin opens one flow per
        // segment, so post-expiry views must not re-arm
        state.update(FlowState(-1L, -1L, seg_consumed = true))
        Iterator.single(Abandonment(key, st.start_us, st.start_us + timeoutUs))
      } else Iterator.empty // stale timer from a converted flow: ignore
    }
  }

  /** Streaming abandoned-flow feed: `startType` events never followed by
    * a `convertType` within `timeoutSeconds` (event time), emitted once
    * the watermark proves it. */
  def abandonedFlows(events: DataFrame, startType: String, convertType: String,
                     timeoutSeconds: Long): Dataset[Abandonment] = {
    import events.sparkSession.implicits._
    events.filter(col("event_type").isin(startType, convertType))
      .select(col("ts").cast(TimestampType), col("user_id").cast(LongType),
        col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_type"), col("ts_us"))
      .as[FlowEvent]
      .groupByKey(_.user_id)
      .transformWithState(new AbandonmentProcessor(startType, convertType, timeoutSeconds),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  private def runJob(df: DataFrame, outDir: String, checkpointDir: String): String = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.runId.toString
  }
}
