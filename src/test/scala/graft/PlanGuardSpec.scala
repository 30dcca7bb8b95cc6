package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression guard over the PlanDump audit set — turns the
  * per-round manual PLANS.md review into an assertion: the scale-killer
  * join shapes cannot reappear silently.
  *
  *  - `CartesianProduct` is banned OUTRIGHT (zero in the audited tree:
  *    every intended cross join rides a broadcast, so an unconstrained
  *    cartesian can only mean a dropped join key);
  *  - `BroadcastNestedLoopJoin` is allowed ONLY on the allowlist below —
  *    each entry is a documented ≤1-row scalar broadcast (corpus
  *    totals, argmax winners, fitted coefficients) or the intended
  *    bounded brute-force tier — so a new BNLJ (the planner's fallback
  *    when an equi-join loses its keys) fails THIS spec instead of
  *    surfacing as a 100× blowup;
  *  - column pruning is pinned on the baseline aggregate (q1_agg must
  *    not read the 16-column lineitem row for a 5-column question).
  *
  * Plans are built at sf0.001 (plan shapes are size-independent; AQE
  * re-plans sizes at runtime). Queries whose operators materialize
  * intermediates on construction execute those tiny jobs here — that
  * is the price of auditing the real plan, and it is why this suite
  * reuses the PlanDump selection rather than all queries. */
class PlanGuardSpec extends SparkFunSuite {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Documented 1-row-broadcast / intended-bounded BNLJ sites. */
  private val bnljAllowed: Set[String] = Set(
    "q_rrf_fusion", "q_kmeans_step", "q_token_budget_mix",
    "q_curation_pipeline", "q_similarity_bruteforce", "q_tfidf",
    "q_semdedup", "q_sessionize_incremental", "q_bm25", "q_pagerank",
    "q_market_basket", "q_auc", "q_join_size_est", "q_jonckheere",
    "q_gram_covariance", "q_conformal", "q_modularity", "q_bh_fdr",
    "q_pca_power", "q_lorenz", "q_hits", "q_jsd", "q_platt", "q_cox",
    "q_dsir_weights", "q_conover", "q_hard_negatives", "q_kneser_ney",
    // round-13b documented 1-row/bounded broadcast sites
    "q_eigen_centrality", "q_matrix_profile", "q_kmeans_lloyd",
    "q_target_encode", "q_removal_effect", "q_doubly_robust",
    "q_extractive_chunks", "q_mis", "q_boosted_stumps",
    "q_burrows_delta",
    // round-14: DTW pair grid — maxKeys-valved (≤4096 keys × m longs)
    // broadcast of the PAA-array table; the intended bounded
    // brute-force tier, same class as q_similarity_bruteforce
    "q_dtw",
    // round-14 documented 1-row/bounded broadcast sites:
    // unigram piece-map (singles + 64 multis, ONE row), kalman min-date
    // (1 row), ks_users partition-offset broadcast (bounded prefix)
    "q_unigram_segment", "q_kalman_level", "q_ks_users",
    // round-15 documented bounded broadcast sites: the spectral-entropy
    // k-range (n/2 = 16 static rows) crossed into the series, and the
    // DBSCAN/LOF fixed-point pair tiers — the intended bounded
    // brute-force class, same as q_similarity_bruteforce
    "q_spectral_entropy", "q_dbscan", "q_lof",
    // diameter sweep: three 1-row crosses (sweep-2 source, peripheral
    // argmax, reached count) assembling the single output row
    "q_diameter_sweep")

  test("no audited plan contains a CartesianProduct, and " +
      "BroadcastNestedLoopJoin appears only at documented 1-row/" +
      "bounded sites") {
    val offenders = graft.tools.PlanDump.Selected.flatMap { n =>
      val p = planOf(n)
      val cart = if (p.contains("CartesianProduct")) Some(s"$n: CartesianProduct") else None
      val bnlj = if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(n))
        Some(s"$n: unallowlisted BroadcastNestedLoopJoin") else None
      cart ++ bnlj
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q1_agg column pruning reaches the scan (no 16-column lineitem " +
      "read for a 5-column aggregate)") {
    val p = planOf("q1_agg")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.nonEmpty && !read.contains("l_comment") &&
      read.count(_ == ':') <= 7, read)
  }
}
