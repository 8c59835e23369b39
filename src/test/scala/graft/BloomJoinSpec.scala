package graft

import graft.operators.BloomJoin

/** The bloom pre-join's two contractual properties: no false negatives
  * (the filtered fact is a superset of the true semi-join) and real
  * pruning (the non-matching majority is dropped map-side). Exactness of
  * bloom + join vs the plain join is the driver-gated
  * `misc_bloom_prejoin` oracle; this spec covers the operator directly.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomFiltered admits every true match and prunes most non-matches") {
    // 10k fact rows over 1000 keys; dim holds 50 of those keys
    val fact = (0L until 10000L).map(i => (i % 1000L, i)).toDF("k", "v")
    val dim = (0L until 50L).map(i => i * 20L).toDF("dk")
    val filtered = BloomJoin.bloomFiltered(fact, "k", dim, "dk", expectedItems = 100L)
    val trueSemi = fact.join(dim, fact("k") === dim("dk"), "left_semi")
    // no false negatives: every semi-join row survives the bloom
    assert(trueSemi.exceptAll(filtered).count() == 0)
    // pruning: 50/1000 keys match (500 rows); ~2% FP rate on the other
    // 9500 keeps the filtered set far below the input
    val kept = filtered.count()
    val matches = trueSemi.count()
    assert(matches == 500)
    assert(kept >= matches, "bloom dropped a true match")
    assert(kept < 2000, s"bloom pruned too little: kept $kept of 10000")
  }

  test("bloom + real join equals the plain join exactly") {
    val fact = (0L until 5000L).map(i => (i % 300L, i)).toDF("k", "v")
    val dim = (0L until 30L).map(i => (i * 10L, s"d$i")).toDF("dk", "payload")
    val viaBloom = BloomJoin.bloomFiltered(fact, "k", dim, "dk", expectedItems = 50L)
      .join(dim, $"k" === $"dk")
    val plain = fact.join(dim, $"k" === $"dk")
    assert(viaBloom.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(viaBloom).count() == 0)
  }
}
