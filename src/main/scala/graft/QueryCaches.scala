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
  private val sharedMemo =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), DataFrame]

  /** Session-lifetime shared materialization for frames the cache manager
    * CANNOT plan-match across builders — anything whose construction runs a
    * driver-side loop with `localCheckpoint` (connected components): each
    * call yields a fresh checkpointed plan, so plain `.cache()` dedupes
    * nothing and N consumer queries pay N full runs. The memo returns the
    * SAME DataFrame instance per (session, key); like the retail raw/fct
    * caches it survives [[releaseAll]] by design. Keep memoized frames
    * id-sized (longs, never text) — they live for the whole registry run.
    * Keyed by session so tests / Verify / Bench JVMs never cross wires. */
  def shared(s: org.apache.spark.sql.SparkSession, key: String)
            (build: => DataFrame): DataFrame =
    sharedMemo.getOrElseUpdate((s, key), build.cache())

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
