package graft.operators

import org.apache.spark.sql.DataFrame

/** Block hygiene for `localCheckpoint`-materialized frames.
  *
  * `Dataset.unpersist` is a no-op for a localCheckpoint'd frame: the
  * blocks live on the raw checkpoint RDD, which the session's
  * CacheManager never saw. Iterative operators (connected components,
  * k-means) and multi-consumer queries that materialize an intermediate
  * would otherwise pile superseded block sets into executor storage until
  * a driver GC — release them by unpersisting the LogicalRDD's underlying
  * RDD directly.
  */
object Checkpoints {

  /** Free the storage blocks behind a localCheckpoint'd frame. Safe on
    * any frame: a plan without a LogicalRDD leaf is left untouched. */
  def release(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
