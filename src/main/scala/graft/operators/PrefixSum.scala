package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GLOBAL running sum without a global window — the distributed two-pass
  * prefix sum. A `sum(...) over (order by k)` window puts the entire
  * dataset through ONE task (the exact global-window scale hazard the
  * plan audits gate elsewhere); the classic fix is:
  *
  *   1. range-partition by the order key, sort within partitions —
  *      partition boundaries now respect the global order;
  *   2. one cheap aggregate computes each partition's total; the
  *      EXCLUSIVE per-partition offsets (a scan over #partitions values,
  *      driver-side by design — partition counts are cluster-sized, not
  *      data-sized) are broadcast;
  *   3. a single `mapPartitions` pass adds offset + running local sum.
  *
  * Pass 3 is deliberately `mapPartitions`: the rows are already
  * range-partitioned and sorted, so a declarative
  * `Window.partitionBy(partition id)` would re-shuffle the whole dataset
  * by pid just to regroup what is already grouped. Per-partition
  * imperative accumulation over pre-sorted rows is the documented
  * legitimate use of the escape hatch.
  *
  * The partitioned frame is cache-scoped because passes 2 and 3 must see
  * the SAME partitioning: re-evaluating `repartitionByRange` from lineage
  * can resample boundaries, and a row that switched partitions between
  * passes would carry the wrong offset. */
object PrefixSum {

  /** Conf-following variant: partition count = `spark.sql.shuffle.partitions`
    * (cores-sized locally, cluster-sized on a real deployment) instead of a
    * caller-hardcoded literal. */
  def withGlobalPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                          outCol: String): DataFrame =
    withGlobalPrefixSum(df, orderCol, valueCol, outCol,
      df.sparkSession.sessionState.conf.numShufflePartitions)

  /** Appends `outCol` = inclusive global running sum of `valueCol`
    * (BIGINT) in `orderCol` order. `orderCol` must be globally unique
    * (it defines the total order). */
  def withGlobalPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
                          outCol: String, numPartitions: Int): DataFrame = {
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be BIGINT (cast first — exact integer running sums only)")
    val part = graft.QueryCaches.scoped(
      df.repartitionByRange(numPartitions, col(orderCol))
        .sortWithinPartitions(orderCol))
    // pass 2: per-partition totals → exclusive offsets (partition-count
    // rows; the scan is a driver-side fold over ≤ numPartitions longs)
    val sums = part
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col(valueCol)).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until numPartitions).map { pid =>
        val o = pid -> acc; acc += sums.getOrElse(pid, 0L); o
      }.toMap
    }
    val bOffsets = part.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = part.schema.add(outCol, LongType, nullable = false)
    val vIdx = part.schema.fieldIndex(valueCol)
    // pass 3: offset + local running sum, one sequential sweep per
    // partition over the already-sorted rows
    part.mapPartitions { rows =>
      var acc = bOffsets.value.getOrElse(
        org.apache.spark.TaskContext.getPartitionId(), 0L)
      rows.map { r =>
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
