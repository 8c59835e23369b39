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

  /** Free the storage blocks behind a localCheckpoint'd frame. Only acts
    * when the frame IS the checkpoint — i.e. its analyzed plan's root is
    * the LogicalRDD the checkpoint produced. A frame merely DERIVED from
    * a checkpoint is left untouched: collecting a LogicalRDD from
    * anywhere inside such a plan could free a still-live upstream
    * checkpoint whose lineage is truncated, making every later use fail
    * unrecoverably ("checkpoint block not found"). */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
