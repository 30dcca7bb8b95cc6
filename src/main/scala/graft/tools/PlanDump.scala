package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `explain formatted` for a curated set of heavy/representative batch
  * queries into PLANS.md — the plan-audit artifact backing the scale claims
  * in README/BASELINE (pushdown reaching the scan, no unintended
  * broadcasts/cartesians, ReusedExchange where pipelines self-join).
  *
  * usage: runMain graft.tools.PlanDump [outFile]
  */
object PlanDump {
  // heaviest + one per plan family; streaming queries excluded (their
  // "plan" is per-microbatch and they execute on construction)
  val Selected: Seq[String] = Seq(
    "q_dedup_minhash",       // MinHash LSH: bounded buckets, ReusedExchange
    "q_dedup_apply",         // + components + anti join
    "q_dedup_keep_best",     // + score window
    "q_split_leakage_safe",  // components left-joined to corpus, narrow split map
    "q_corpus_overlap",      // pairwise default: one shingle agg reused by sizes+pairs branches
    "q_boilerplate",         // shared exploded exchange: agg + join-back, kernel once
    "q_vocab_growth",        // explode -> shingle-keyed min (map-side combine) -> tiny bucket agg
    "q_rrf_fusion",          // two top-k rankers union into one tiny agg + ranking window
    "q_image_neardup_dhash", // synth+decode -> tile self-join -> band buckets -> verify
    "q_kmeans_step",         // broadcast centroids -> narrow assignment -> (cell,dim) agg
    "q_token_budget_mix",    // distributed prefix sum: one range exchange, tiny offset broadcast
    "q_curation_pipeline",   // gate -> boilerplate gate -> budget mix composition
    "q_embedding_neardup_srp", // SRP bands + codegen dot product
    "q_embedding_neardup_srp_mp", // + Hamming-1 probe explode, same equi-join shape
    "q_similarity_bruteforce", // intended cross join tier
    "q_bloom_join",          // bloom prefilter + semi join
    "q_tfidf",               // vocabulary window, no broadcast
    "q_bigram_logprob",      // one-tokenization + vocab windows
    "q_cdc_chunk",           // one Generate + one exchange
    "q_repeated_spans",      // window-hash + run-length merge
    "q_salted_join",         // explicit salt fan-out
    "q_topk_orders",         // TakeOrderedAndProject
    "q_global_sort",         // range partitioning
    "q1_agg",                // partial agg + pushdown/pruning baseline
    "q_semdedup",            // in-cell pairs only + anti join back
    "q_minhash_estimate",    // fused kernel, one adjacent-id self-join
    "q_linear_classifier",   // explode + hash agg, NO vocabulary join
    "q_profile_table",       // per-column scans each pruned to one column
    "q_url_normalize",       // pure narrow map, no exchange
    "q_sessionize_incremental", // per-increment window + state stitch join
    "q_asof_nearest",        // ONE key shuffle, two window directions
    "q_overlap_join",        // double-sided binning, no BNLJ
    "q_bm25",                // one doc-keyed agg; query-width broadcasts only
    "q_prefix_jaccard",      // prefix candidates + array_intersect verify
    "q_pagerank",            // per-iteration join/agg, materialized invariants
    "q_asof_merge",          // custom AsOfJoinExec: two clustered sorts, no union/window
    "q_bfs_hops",            // per-level frontier join+agg, materialized edges
    "q_market_basket",       // self-join reuses ONE distinct exchange; 1-row total broadcast
    "q_jaro_winkler",        // brand-blocked fuzzy join, codegen'd kernel, fanned probe side
    "q_triangle_count",      // degree-ordered wedges: two equi-joins, no BNLJ
    "q_graph_features",      // ONE canonical-edge subtree feeds deg + triangle kernel
    "q_cusum",               // one agg + one window + one repartition, object fold at the top
    "q_interval_union",      // ONE user-hashed exchange drives both windows + both aggs
    "q_sssp",                // src-partitioned checkpointed edges; per-round dist-side shuffle only
    "q_auc",                 // materialized-once ranged prefix sum (checkpoint scan feeds both branches)
    "q_minimizer_sketch",    // per-doc window min over exploded shingle hashes + distinct
    "q_bootstrap_ci",        // ×32 replicate explode combines map-side into g×32 cells
    "q_join_size_est",       // two d×w sketch builds + per-key-count exact side; no wide join
    "q_link_prediction",     // wedge self-join on checkpointed sparse edges + TakeOrdered
    "q_link_predictors",     // same wedge kernel + two degree joins feeding four scores
    "q_harmonic_centrality", // 3 materialized BFS levels from 8 landmarks + TakeOrdered
    "q_jonckheere",          // zero-filled value×group grid + per-group ranged cumsum + k² pair join
    "q_fisher_ratio",        // (dim,label) fixed-point moment agg + k·d-row scatter finish
    "q_gram_covariance",     // mapPartitions Gramian: P·d² triples, checkpoint-fed 3-branch assembly
    "q_conformal",           // checkpointed split + broadcast betas + prefix-sum order statistic
    "q_ohlc_bars",           // two windows + agg share ONE (key,bar) exchange
    "q_modularity",          // checkpointed CC labels + two vertex-keyed joins
    "q_bh_fdr",              // m-row ranking windows AFTER the per-segment collapse
    "q_pca_power",           // Gramian once; 12 tiny join+agg iterations
    "q_lorenz",              // distinct-value prefix sum -> decile agg
    "q_changepoint",         // one per-group prefix window, argmax pick
    "q_hits",                // per-half-step checkpoint BEFORE the broadcast max action
    "q_jsd",                 // per-source entropies off one count pass; pair expansion only for H(M)
    "q_kaplan_meier",        // two ranged prefix sums on the step table, broadcast group totals
    "q_rake",                // one island window + two corpus-keyed aggs + bounded top-k
    "q_platt",               // checkpointed z table scanned once per Newton step
    "q_reach_profile",       // ONE checkpointed co-purchase subtree feeds seeds + BFS
    "q_tpch_q3",             // broadcast dim filter + fact-fact equi-join + TakeOrdered
    "q_tpch_q5",             // all dims broadcast; facts join once on the order key
    "q_cox",                 // checkpointed z; per-step agg + ranged suffix sum
    "q_macd",                // two collected windows + lag share ONE key-hashed sort
    "q_pq_adc",              // codes scan + broadcast ADC table join + per-query TakeOrdered
    "q_dsir_weights",        // token window exchange + 3-scalar totals broadcast, no vocab broadcast
    "q_seasonal_decompose",  // two rolling sums on one sort + (key,phase) agg/join-back
    "q_local_clustering",    // one checkpointed canonical edge frame feeds degrees + triangles
    "q_betweenness",         // 3 fwd + 3 bwd materialized Brandes rounds, (lm,v)-keyed joins
    "q_conover",             // value-domain frame + global distinct-deviation ranged rank
    "q_pq_rerank",           // trained codes shortlist 400 -> exact rerank on candidates only
    "q_cum_incidence",       // KM nano-log prefix reused exclusively; two ranged passes
    "q_max_cover",           // 5 anti-join argmax rounds over one materialized gram table
    "q_shapley",             // one signature agg; coalition algebra on broadcast constants
    "q_hard_negatives",      // one tokenization; query-width broadcasts; per-query rank window
    "q_kneser_ney",          // one bigram exchange feeds left/right/total aggs joined back
    "q_sax",                 // per-key rank window + two key-hashed aggs + word concat
    "q_kcenter",             // 6 argmax rounds, 1-row broadcast refresh over materialized state
    "q_dtw",                 // bounded broadcast pair grid; DP = ONE map-side fold per pair (r14)
    "q_eigen_centrality",    // 4 linear join+agg rounds, ONE final 1-row max broadcast
    "q_viterbi",             // capped window + pivot agg, DP = per-row columnar codegen
    "q_matrix_profile",      // bounded delta broadcast + per-offset rolling window + argmin agg
    "q_ar_forecast",         // two lag aggs + last-two pivot, unrolled per-row forecast columns
    "q_kmeans_lloyd",        // 3 chained broadcast-assign + (cell,dim) fixed-point agg rounds
    "q_target_encode",       // one category window + 1-row global prior broadcast
    "q_removal_effect",      // all removal scenarios in ONE recursion frame (scenario column)
    // round-14 additions
    "q_four_cliques",        // adjacency-intersection K4: 3 edge-keyed joins, arrays bounded by DAG out-degree
    "q_louvain",             // per-round edge-keyed count + degree agg + hash argmax; 1-row 2m broadcast
    "q_lcs_pairs",           // consecutive-pair join + explicit-width repartition + map-side DP fold
    "q_sw_align",            // same shape, running-max window fold
    "q_unigram_segment",     // bounded piece-map broadcast (singles+64) + map-side Viterbi fold
    "q_kalman_level",        // conditional-aggregate pivot + unrolled named step columns
    "q_binary_segmentation", // two window passes per level over (group,segment)-labeled rows
    "q_ks_users",            // distributed prefix-sum CDF: range exchange + offset broadcast
    "q_doubly_robust",       // IRLS aggregates + two arm OLS fits, 3 coefficient-row broadcasts
    "q_extractive_chunks",   // token-keyed vocab join (never broadcast) + doc-keyed argmin/argmax
    "q_mis",                 // per-round tagged-state job over static edges + driver tail finisher
    "q_four_cliques",        // triangle enum + 3 edge-keyed extension joins, one reused edge frame
    "q_boosted_stumps",      // per-round distinct-value prefix scans + 1-row argmax broadcast
    "q_burrows_delta",       // word-keyed moment windows, |sources|^2 pair join at the top
    "q_fd_check",            // one pruned 2-column aggregate per candidate, unioned
    // round-15 additions
    "q_mst",                 // Boruvka: contracted-graph components per round, fresh-stats state
    "q_greedy_matching",     // handshake rounds: 2 edge joins + min-struct + mutual self-join
    "q_diameter_sweep",      // two frontier BFS runs + top-1 TakeOrdered picks
    "q_dbscan",              // fp-exact eps pairs (documented O(n^2) tier) + components + min border
    "q_lof",                 // (d2,id)-kNN window + quantized reach/lrd aggregates
    "q_croston",             // one part-keyed agg + bounded last-64 aggregate() fold
    "q_sample_entropy",      // key-local template self-join, bounded per-entity series
    "q_perm_entropy",        // two LEADs + two key aggs, no joins
    "q_spectral_entropy",    // small static k-range broadcast cross + (key,k) agg
    "q_cvar",                // one key window rank + one agg
    "q_image_sobel",         // separable Sobel: two window passes over pixel decode, no joins
    "q_exact_jaccard")       // prefix posting valve: checkpointed index + 1-row stats agg

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "PLANS.md"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — `explain formatted` for representative queries\n\n")
    sb.append(s"Generated by `graft.tools.PlanDump` at `$sfDir` (plan shapes are\n")
    sb.append("data-size-independent; AQE re-plans sizes at runtime). Regenerate:\n")
    sb.append("`sbt \"runMain graft.tools.PlanDump\"`.\n")
    Selected.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plandump] wrote ${Selected.size} plans to $out")
    spark.stop()
  }
}
