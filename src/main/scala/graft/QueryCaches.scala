package graft

import org.apache.spark.sql.DataFrame

/** Registry for caches whose useful lifetime is ONE registered query.
  *
  * A `.cache()` inside a query function cannot be unpersisted there —
  * the returned (lazy) plan still references it and the consuming action
  * runs in the caller (Verify's parquet dump, Bench's count). Left
  * alone, those cached blocks accumulate across a 126-query registry run
  * and pressure executor storage for the queries that come later. The
  * contract here: query builders register per-query caches via
  * [[scoped]]; the harness mains call [[releaseAll]] after each query's
  * final consuming action.
  *
  * Caches that are DELIBERATELY shared across queries (the retail
  * raw/fct plan-matched materializations) stay plain `.cache()` and are
  * not registered — releaseAll must not evict them between the queries
  * that share them.
  */
object QueryCaches {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and register it for the next [[releaseAll]]. */
  def scoped(df: DataFrame): DataFrame = synchronized {
    val c = df.cache()
    live += c
    c
  }

  /** Unpersist every scoped cache registered since the last call. */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
  }
}
