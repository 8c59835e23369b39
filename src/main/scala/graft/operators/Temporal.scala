package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators Spark lacks as built-ins, composed from keyed
  * windows (preference order (a) of the build brief: compose existing ops
  * before reaching for a custom plan node).
  *
  * Both operators cost exactly ONE shuffle (hash by key) + an in-partition
  * sort — the minimal possible for temporally-ordered per-key semantics,
  * and the shape that scales: no self-join, no range cross product.
  */
object Temporal {

  /** As-of join: for each left row, the single right row with the greatest
    * `tsCol` ≤ the left row's (per `key`) — DuckDB/kdb ASOF semantics.
    *
    * Implementation: tag + union both sides, one window per key ordered by
    * (ts, side, seq) with rights sorted before lefts at equal ts (so
    * ts-equal rights match, = the `>=` convention), then carry the last
    * non-null right payload forward (`last(..., ignoreNulls)` over an
    * unbounded-preceding frame). Left rows with no prior right keep nulls
    * (left-outer semantics).
    *
    * `rightCols` name the right-side payload columns to surface; they must
    * not collide with left column names. `seqCol` breaks ordering ties
    * deterministically (a unique id present on both sides). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               seqCol: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val r = right.select(col(key), col(tsCol), col(seqCol), payload.as("__rp"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__rp", lit(null).cast(r.schema("__rp").dataType))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc, col(seqCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(col)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__matched", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols ++ rightCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** Forward as-of: each left row takes the EARLIEST right row at or
    * after its timestamp (the "next event" join — next click after a
    * purchase, next reading after an alarm). Same union + keyed-window
    * machinery as [[asofJoin]] mirrored forward: one shuffle, no range
    * join. At equal timestamps the right row is eligible (inclusive),
    * matching an ASOF `l.ts <= r.ts`. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
                      seqCol: String, rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val r = right.select(col(key), col(tsCol), col(seqCol), payload.as("__rp"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__rp", lit(null).cast(r.schema("__rp").dataType))
      .withColumn("__side", lit(1))
    // DESCENDING time with a running [unboundedPreceding, currentRow]
    // frame: Spark evaluates running frames incrementally (O(n) per key),
    // while a [currentRow, unboundedFollowing] frame re-aggregates the
    // partition tail PER ROW (aggregates can't be un-applied — O(n²)).
    // In DESC order, `last` non-null before the left row = the smallest
    // right ts >= left ts; side 0 < 1 keeps equal-ts rights eligible and
    // seq DESC makes the nearest equal-ts right the smallest seq —
    // identical semantics to a forward scan, linear cost.
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).desc, col("__side").asc, col(seqCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(col)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__matched", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols ++ rightCols.map(c => col(s"__matched.$c").as(c)): _*)
  }

  /** Valid-time (SCD-2) lookup: join each fact to the dimension row
    * whose `[valid_from, valid_to)` interval contains the fact's own
    * timestamp — the slowly-changing-dimension point lookup every
    * warehouse asks for. A NULL `valid_to` is the open (current)
    * interval. Left-outer: facts valid in no interval keep nulls.
    *
    * Composed with the snapshot format's TIME TRAVEL this is the full
    * BI-TEMPORAL join: `scd2Lookup(facts, table.read(txVersion), …)`
    * answers "as the database knew it at transaction time T_tx, which
    * dimension attributes were valid at each fact's business time?" —
    * transaction time comes from the manifest chain (`read(v)` /
    * `readAsOf(ts)`), valid time from the interval columns; neither
    * axis needs bespoke machinery.
    *
    * Physical shape: ONE equi-join (hash shuffle on `key`, or broadcast
    * when the dimension is small — the planner's choice off the
    * snapshot relation's exact manifest row count) with the interval
    * predicate as its residual: cost O(facts + dim versions-per-key),
    * never a range cross product. An SCD-2 dimension has few intervals
    * per key by construction, so the residual scans a handful of rows
    * per fact — the shape that survives a 100× fact table. */
  def scd2Lookup(facts: DataFrame, dim: DataFrame, key: String, tsCol: String,
                 dimCols: Seq[String],
                 validFrom: String = "valid_from",
                 validTo: String = "valid_to"): DataFrame = {
    val f = facts.alias("__f")
    val m = dim.alias("__d")
    val fk = col(s"__f.$key"); val ts = col(s"__f.$tsCol")
    val cond = fk === col(s"__d.$key") &&
      ts >= col(s"__d.$validFrom") &&
      (col(s"__d.$validTo").isNull || ts < col(s"__d.$validTo"))
    f.join(m, cond, "left")
      .select(facts.columns.map(c => col(s"__f.$c")) ++
        dimCols.map(c => col(s"__d.$c")): _*)
  }

  /** SCD-2 BUILD — the dbt `snapshot` materialization (check_cols
    * strategy) as one distributed transform: collapse an append-only
    * change feed into `[valid_from, valid_to)` attribute intervals per
    * key, newest interval open (`valid_to` NULL, `is_current` true). A
    * row opens a new interval iff any tracked column IS DISTINCT FROM
    * its predecessor (null-safe — a NULL→value flip is a change);
    * consecutive duplicates collapse into their interval.
    *
    * Physical shape: two window passes over the SAME (key, order)
    * partitioning — Catalyst plans ONE shuffle+sort and reuses it for
    * both — so cost is a single exchange of the feed, no self-join, no
    * global window. Keys partition the work: the shape survives 100×
    * feeds as long as no single key carries an unbounded share of the
    * feed (an SCD dimension key has bounded change history by
    * construction; a hot key is a modeling bug upstream).
    * `tieBreak` pins ordering among equal timestamps so the output is
    * deterministic (oracle-comparable) under any partitioning. */
  def scd2Build(changes: DataFrame, key: Seq[String], tsCol: String,
                tracked: Seq[String], tieBreak: Seq[String] = Seq.empty): DataFrame = {
    require(key.nonEmpty && tracked.nonEmpty, "scd2Build needs key + tracked columns")
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key.map(col): _*).orderBy(ord: _*)
    val opens = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) // first row per key: lag is NULL on every tracked
                      // col, <=> is false unless the value is ALSO null —
                      // so an all-NULL first row still opens via lag(ts)
    val firstRow = lag(col(tsCol), 1).over(w).isNull
    val opened = changes
      .withColumn("__opens", firstRow || opens)
      .filter(col("__opens"))
    val w2 = Window.partitionBy(key.map(col): _*).orderBy(ord: _*)
    opened
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", lead(col(tsCol), 1).over(w2).isNull)
      .drop("__opens")
  }

  /** Sessionization: per-key session numbering with an inactivity gap —
    * a new session starts when the time since the previous event exceeds
    * `gapSeconds` (or at the first event). Returns the input plus
    * `session_seq` (1-based per key). */
  def sessionize(events: DataFrame, key: String, tsCol: String, seqCol: String,
                 gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(key)).orderBy(col(tsCol).asc, col(seqCol).asc)
    val prev = lag(col(tsCol), 1).over(order)
    val isNew = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_seq",
        sum(col("__new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }
}
