package graft.operators

import scala.collection.mutable.ArrayBuffer

/** The dominance predicate and block-nested-loop frontier pass shared by
  * BOTH skyline execution paths (the portable Row-based mapPartitions in
  * [[Skyline]] and the Catalyst-native InternalRow operator in
  * org.apache.spark.sql.graft.SkylineExec) — one definition, so tie/NaN
  * semantics cannot silently diverge between the paths that SkylineSpec
  * asserts identical. A standalone object: task closures capture nothing
  * but the function references.
  */
object SkylineCore {

  /** y dominates x iff y ≤ x on every minimize value and y < x on one. */
  def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var allLe = true; var oneLt = false; var i = 0
    while (i < a.length && allLe) {
      if (a(i) > b(i)) allLe = false
      else if (a(i) < b(i)) oneLt = true
      i += 1
    }
    allLe && oneLt
  }

  /** One frontier pass. `vals` extracts the minimize vector from the
    * (possibly buffer-reused) row; `retain` materializes a row ONLY when
    * it enters the frontier — dominated rows (the overwhelming majority
    * by design) never pay a copy. */
  def frontierPass[R](it: Iterator[R], vals: R => Array[Double],
                      retain: R => R): Iterator[R] = {
    val frontier = ArrayBuffer.empty[(R, Array[Double])]
    it.foreach { r =>
      val v = vals(r)
      if (!frontier.exists { case (_, w) => dominates(w, v) }) {
        frontier.filterInPlace { case (_, w) => !dominates(v, w) }
        frontier += ((retain(r), v))
      }
    }
    frontier.iterator.map(_._1)
  }
}
