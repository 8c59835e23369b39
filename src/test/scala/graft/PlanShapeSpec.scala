package graft

/** Scale-posture regression gate: the physical plan of every registered
  * query is checked for the two shapes that do not survive a 100x fact —
  * CartesianProduct (never acceptable) and BroadcastNestedLoopJoin
  * (acceptable ONLY where the build side is a deliberate tiny broadcast:
  * a one-row corpus count, the collected centroid array, or the
  * brute-force ANN baseline that is exhaustive by definition).
  *
  * A new query that accidentally plans a nested loop (a typo'd join key,
  * a non-equi condition Catalyst can't hash) fails here, not in a 100 TB
  * run. */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** queries whose BroadcastNestedLoopJoin is a documented tiny-broadcast
    * (1-row frames or the exhaustive baseline), not an accident */
  private val bnljAllowed = Set(
    "llm_ann_topk",        // brute-force baseline: exhaustive by definition
    "llm_ann_ivf",         // 1-row collected-centroids broadcast
    "llm_ann_pq",          // 1-row collected-centroids + 1-row codebook broadcasts
    "llm_semdedup",        // 1-row collected-centroids broadcast (cell assignment)
    "llm_ann_recall",      // brute-force ground-truth side of the recall check
    "llm_ann_recall_floor", // same marks frame as llm_ann_recall, aggregated
    "llm_ann_incremental", // query-set × batch scoring: exhaustive over the BATCH by design
    "llm_tfidf",           // 1-row corpus-count broadcast
    "llm_unigram_logprob", // 1-row total-tokens broadcast
    "llm_nb_quality",      // 1-row vocab-total + 1-row class-prior broadcasts
    "misc_hits",           // 1-row L1-normalization-total broadcasts per round
    "llm_curation_pipeline", // 1-row per-stage funnel counts crossed into one row
    "misc_heavy_hitters",  // 1-row total + 1-row sketch broadcast
    "misc_zorder_pruning", // 1-row predicate-bounds broadcast onto 128 stat rows
    "tpch_sales_opportunity", // 1-row mean-balance threshold broadcast
    "tpch_important_parts",   // 1-row group-total threshold broadcast
    "tpch_top_supplier",      // 1-row max-revenue threshold broadcast
    "llm_token_shards",       // 1-row total-tokens broadcast
    "llm_bm25_search",        // 1-row corpus-stats + 1-row per-term-df broadcasts
    "llm_hybrid_rrf",         // BM25's 1-row broadcasts + the exhaustive 1-query cosine leg
    "llm_mixture_temperature", // 1-row normalizer broadcast
    "llm_exact_allocation",   // 1-row total + 1-row leftover broadcasts
    "dq_benford",             // 1-row digit-total broadcast
    "dq_ks_test",             // 1-row (N1,N2) totals broadcast, crossed twice
    "dq_column_entropy",      // 1-row per-column total broadcast
    "dq_fk_orphans",          // 1-row child-count × 1-row orphan-count per relation
    "llm_nb_calibration",     // NB's 1-row vocab-total + class-prior broadcasts
    "misc_history_anomaly",   // 1-row (Σadded, n) totals broadcast onto 6 rows
    "llm_bigram_surprisal",   // 1-row vocabulary-size broadcast
    "llm_dsir_weights",       // 1-row target/raw totals broadcast
    "llm_pmi_collocations",   // 1-row bigram-total + 1-row token-total broadcasts
    "misc_abc_analysis",      // 1-row revenue-total broadcast onto the part dim
    "misc_basket_rules",      // 1-row order-count broadcast onto the pair grid
    "misc_changepoint",       // 1-row total/argmax broadcasts onto the day frame
    "misc_decayed_revenue",   // 1-row anchor-date broadcast
    "misc_gini_lift",         // 1-row Gini-moments broadcast onto 10 decile rows
    "misc_histogram",         // 1-row (min,max) broadcast
    "misc_rfm"                // 1-row anchor-date broadcast onto the customer dim
  )

  /** Pinned shuffle-exchange counts for the most expensive registered
    * queries (the r6 bench top-5): a future edit that silently adds a
    * shuffle — a lost broadcast hint, a misaligned partitioning, an
    * accidental repartition — fails here instead of surfacing as a
    * throughput regression at scale. Counts are of the FINAL returned
    * plan (loops like connected components materialize LogicalRDDs
    * internally; their per-round shuffles are the operators' own specs'
    * business). BroadcastExchange is deliberately NOT counted — turning
    * a shuffle join into a broadcast join is an improvement and may
    * change freely. */
  private val pinnedShuffles = Map(
    // r9: the CC-family counts dropped (11→9, 4→3) when the shared
    // candidate-edge caches + the connected-components memo landed
    // (LlmQueries.dupComponents) — consumers now scan the cached edge
    // frames instead of re-running the minhash/simhash pipelines.
    "llm_curation_pipeline" -> 9,
    "llm_ngram_table" -> 2,
    "llm_dedup_keep_best" -> 3,
    "llm_dup_clusters" -> 3,
    "llm_decontaminate" -> 2,
    // r13: the video codec queries are pure mapPartitions fan-out over
    // the fixture files — ZERO shuffles is the scale contract (per-clip
    // cost, no data movement); the manifest-count query's single
    // exchange is the two 1-row legs' union aggregation
    "llm_multimodal_frames" -> 0,
    "llm_video_meta" -> 0,
    "misc_snapshot_count" -> 1
  )

  test("headline queries keep their pinned shuffle-exchange counts") {
    val shuffleRe = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
    val offenders = pinnedShuffles.toSeq.sortBy(_._1).flatMap { case (name, expected) =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      val actual = shuffleRe.findAllIn(plan).size
      if (actual != expected) Some(s"$name: expected $expected shuffle exchanges, plan has $actual")
      else None
    }
    assert(offenders.isEmpty, s"shuffle-count drift:\n${offenders.mkString("\n")}")
  }

  test("no cartesian products; nested-loop joins only where a tiny broadcast is deliberate") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name)
      if (cartesian || bnlj)
        Some(s"$name: ${if (cartesian) "CartesianProduct " else ""}${if (bnlj) "BroadcastNestedLoopJoin" else ""}")
      else None
    }
    assert(offenders.isEmpty, s"scale-hostile plans:\n${offenders.mkString("\n")}")
  }
}
