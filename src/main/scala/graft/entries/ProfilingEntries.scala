package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Profiling-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object ProfilingEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_benford" -> ((s, dir) => {
      // Benford leading-digit audit of spend cents per event type: digit
      // histogram, observed vs log10(1+1/d) expectation, chi2 contribution.
      val v = table(s, dir, "events").select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
      graft.operators.Profiling.benfordProfile(v, "event_type", "cents")
    }),
    "q_psi_drift" -> ((s, dir) => {
      // Feature-drift monitor: PSI of the value distribution between the
      // even-user baseline and odd-user current sample over the baseline's
      // decile buckets — each side scanned once, counts joined on a
      // 10-row spine (Profiling.psiDrift).
      val ev = table(s, dir, "events")
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      Profiling.psiDrift(
        ev.filter(pmod(col("user_id"), lit(2L)) === 0L).select(col("cents")),
        ev.filter(pmod(col("user_id"), lit(2L)) =!= 0L).select(col("cents")),
        "cents")
    }),
    "q_chi2_independence" -> ((s, dir) => {
      // Is event-type mix independent of the user-parity cohort? One
      // contingency aggregate + tiny broadcast marginals (Profiling).
      val ev = table(s, dir, "events").select(col("event_type"),
        concat(lit("arm_"), pmod(col("user_id"), lit(2L))).as("arm"))
      Profiling.chi2Independence(ev, "event_type", "arm")
    }),
    "q_ks_users" -> ((s, dir) => {
      // Exact two-sample KS statistic between the even/odd-user value
      // samples — the global CDF cumsum runs as the distributed prefix sum
      // (range partition + offset broadcast), never one partition.
      // (Revived round-14: this entry was silently SHADOWED by a later
      // duplicate "q_ks_test" key — Map keeps the last binding — so it
      // had never reached the driver; it exercises Profiling.ksTest,
      // a different kernel than q_ks_test's ksTwoSample.)
      val ev = table(s, dir, "events")
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      Profiling.ksTest(
        ev.filter(pmod(col("user_id"), lit(2L)) === 0L).select(col("cents")),
        ev.filter(pmod(col("user_id"), lit(2L)) =!= 0L).select(col("cents")),
        "cents")
    }),
    "q_skew_profile" -> ((s, dir) =>
      // Join-key skew diagnostics: per event_type, user_id key counts and
      // the max/mean skew ratio — the pre-join measurement that decides
      // broadcast vs salt vs AQE skew-split.
      Profiling.keySkew(table(s, dir, "events"), "event_type", "user_id")),
    "q_profile_table" -> ((s, dir) =>
      // Per-column quality audit of orders (nulls, exact distinct, min/max)
      // — long/string/timestamp columns only; double min/max stringification
      // differs across engines so doubles profile through typed queries.
      Profiling.profile(table(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))),
    "q_sprt" -> ((s, dir) => {
      // Wald sequential A/B monitor: per-arm LLR walk over the event
      // stream in (ts, event_id) order, stopping at the first Wald-bound
      // crossing — integer micro-nat arithmetic on the materialized-once
      // ranged prefix sum (never a per-arm single-partition window).
      val ev = table(s, dir, "events").select(
        concat(lit("arm_"), pmod(col("user_id"), lit(2L))).as("arm"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        (col("event_type") === "purchase").as("converted"))
      Profiling.sprt(ev, "arm", Seq("ms", "event_id"), "converted",
        p0 = 0.15, p1 = 0.25)
    }),
    "q_mutual_info" -> ((s, dir) =>
      // Feature-selection scorer: per-cell MI contributions between doc
      // language and source (Σ = MI in nats) — the information-theoretic
      // companion to q_chi2_independence, same contingency plan.
      Profiling.mutualInformation(table(s, dir, "documents"), "lang", "source")),
    "q_kmv_distinct" -> ((s, dir) =>
      // K-minimum-values distinct sketch over order keys: 256 smallest
      // 60-bit md5 hashes → unbiased estimate (k−1)·2^60/h_k, checked
      // against the exact count in the same row. TakeOrderedAndProject
      // keeps the k-smallest step a per-partition heap, never a sort.
      Profiling.kmvDistinct(table(s, dir, "orders"), "o_orderkey", k = 256)),
    "q_k_anonymity" -> ((s, dir) =>
      // Re-identification audit before a data release: every
      // (segment, nation) quasi-identifier cell with its population and
      // prosecutor-model risk 1/n; cells under k=10 are flagged.
      Profiling.kAnonymity(
        table(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey")),
        Seq("c_mktsegment", "c_nationkey"), k = 10L)),
    "q_join_size_est" -> ((s, dir) =>
      // Planner-style join cardinality probe: |orders ⋈ lineitem| from
      // count-min inner products (d=4 × w=1024 cells per side) vs the
      // exact size from per-key counts — one-sided error checked in-row.
      Profiling.cmJoinSizeEstimate(
        table(s, dir, "orders"), "o_orderkey",
        table(s, dir, "lineitem"), "l_orderkey")),
    "q_table_fingerprint" -> ((s, dir) => {
      // Cross-engine content checksum of lineitem per return flag:
      // 60-bit row hashes over a canonical integer/date rendering,
      // commutative reducers — migration validation without a diff.
      val li = table(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_shipdate").cast("date").as("ship"))
      Profiling.tableFingerprint(li, "l_returnflag",
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "cents", "ship"))
    }),
    "q_l_diversity" -> ((s, dir) =>
      // Homogeneity-attack audit: per (segment, nation) QI cell, distinct
      // account-balance buckets + exact micro-nat entropy; l=3 flag.
      Profiling.lDiversity(
        table(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bucket")),
        Seq("c_mktsegment", "c_nationkey"), "bal_bucket", l = 3L)),
    "q_t_closeness" -> ((s, dir) =>
      // Skewness-attack audit completing the k-anon/l-div ladder: per
      // QI cell, the exact ordered EMD between its balance-bucket
      // distribution and the table's; t = 0.2.
      Profiling.tCloseness(
        table(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bucket")),
        Seq("c_mktsegment", "c_nationkey"), "bal_bucket", t = 0.2)),
    "q_kmv_set_ops" -> ((s, dir) => {
      // Sketch set algebra: click-audience ∩/∪ purchase-audience from two
      // KMV sketches (k-min union sample → Jaccard → intersection), with
      // the exact distinct-hash answers side by side in the same row.
      val ev = table(s, dir, "events")
      Profiling.kmvSetOps(
        ev.filter(col("event_type") === "click"), "user_id",
        ev.filter(col("event_type") === "purchase"), "user_id", k = 64)
    }),
    "q_srm" -> ((s, dir) =>
      // Sample-ratio-mismatch gate over the experiment population:
      // distinct users per arm vs the fair-coin expectation — the check
      // that runs BEFORE any metric delta is read.
      Profiling.srmCheck(
        table(s, dir, "events").select(col("user_id")).distinct()
          .withColumn("treat", pmod(col("user_id"), lit(2L)) === 1L),
        "treat")),
    "q_wilson_ci" -> ((s, dir) =>
      // Wilson 95% interval on the high-value-event rate per type — the
      // binomial CI that stays in [0,1]; exact counts, closed-form
      // shared-SQL endpoints.
      Profiling.wilsonCi(
        table(s, dir, "events").select(col("event_type"),
          (col("value") > 100).as("success")),
        "event_type", "success")),
    "q_bh_fdr" -> ((s, dir) => {
      // Multiple-testing control over 150 per-user rate-change tests:
      // Skellam-normal z per user, two-sided p via the SHARED
      // Abramowitz–Stegun tail (the approximation IS the cross-engine
      // contract), Benjamini–Hochberg at q = 0.10.
      val perUser = table(s, dir, "events").groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2"))
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      Profiling.bhFdr(perUser, Seq("user_id"), "p", qPpm = 100000L)
    }),
    "q_ecod_outliers" -> ((s, dir) =>
      // ECOD-style parameterless outlier top-20 over (spend, time-of-day):
      // exact per-dim ECDF tails via the ranged prefix sum, −ln(tail)
      // micro-summed across dims, value-keyed joins (never broadcast).
      Profiling.ecodOutliers(
        table(s, dir, "events").select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          expr("unix_millis(ts) % 86400000L").as("ms_of_day")),
        "event_id", Seq("cents", "ms_of_day"), topK = 20)),
    "q_kendall_tau" -> ((s, dir) => {
      // Nonparametric spend↔purchases association per user: exact
      // concordant/discordant/tie pair counts over the 150-user table,
      // tie-corrected τ-b as one shared-SQL row.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
      Profiling.kendallTau(users, "spend", "n_purch")
    }),
    "q_cramers_v" -> ((s, dir) =>
      // Effect size for the lang×source contingency — the in-[0,1]
      // companion to q_chi2_independence; micro-quantized cell sums.
      Profiling.cramersV(table(s, dir, "documents"), "lang", "source")),
    "q_spearman" -> ((s, dir) => {
      // Monotone spend↔purchases association per user WITHOUT O(n²)
      // pairs: doubled midranks off two prefix sums, exact integer
      // moments, shared-SQL Pearson — the scale path next to τ-b.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
      Profiling.spearman(users, "spend", "n_purch")
    }),
    "q_cochran_armitage" -> ((s, dir) => {
      // Ordered dose-response: does the heavy-purchaser rate RISE with
      // click-activity tier (0/1/2)? The 1-df trend chi-square from one
      // exact moment row.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
        .select(
          when(col("n_click") >= 25L, 2L).when(col("n_click") >= 18L, 1L)
            .otherwise(0L).as("dose"),
          (col("n_purch") >= 15L).as("heavy"))
      Profiling.cochranArmitage(users, "dose", "heavy")
    }),
    "q_mann_whitney" -> ((s, dir) => {
      // Distribution-free spend shift: do high-clickers spend
      // differently? Combined midranks off one prefix sum; exact
      // 2*U1 integer, tie-corrected z + Cliff's delta effect size.
      // (Split on the click rate, balanced ~71/79 at sf0.01 — the
      // original had_error flag is TRUE for every sf0.01 user, which
      // left the test silently degenerate, caught in round 10.)
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"))
      Profiling.mannWhitney(users, "clicker", "spend")
    }),
    "q_kruskal_wallis" -> ((s, dir) =>
      // k-group rank ANOVA: is document length distribution the same
      // across sources? Micro-quantized per-group R^2/n terms, tie
      // correction, df-indexed chi-square critical value.
      Profiling.kruskalWallis(
        table(s, dir, "documents"), "source", "n_chars")),
    "q_emd" -> ((s, dir) => {
      // HOW FAR apart are the parity cohorts' spend distributions, in
      // cents (Wasserstein-1) — the magnitude companion to q_ks_test's
      // yes/no; micro-quantized CDF-gap rectangles, exact sums.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("even", pmod(col("user_id"), lit(2L)) === 0L)
      Profiling.emd1d(
        users.filter(col("even")).select(col("spend")),
        users.filter(!col("even")).select(col("spend")), "spend")
    }),
    "q_cochran_q" -> ((s, dir) => {
      // Do ANY of three heavy-purchaser rules (spend/clicks/views)
      // differ on the same users? Cochran's Q — the k-treatment
      // McNemar, exact integer sums, df-indexed critical value.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("np"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("nc"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("nv"))
        .withColumn("heavy", col("np") >= 15L)
      val long = users.selectExpr("user_id",
        "stack(3, 'a', (spend > 330000) = heavy, " +
          "'b', (nc >= 20) = heavy, 'c', (nv >= 20) = heavy) AS (rule, ok)")
      Profiling.cochranQ(long, "user_id", "rule", "ok")
    }),
    "q_friedman" -> ((s, dir) => {
      // Rank-based k-paired test: do the five event types draw
      // different spend from the SAME users? Doubled midranks within
      // each complete user, exact-integer tie-robust chi-square.
      val ut = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      Profiling.friedman(ut, "user_id", "event_type", "cents")
    }),
    "q_mood_median" -> ((s, dir) => {
      // Mood's median test by composition: above/below the GRAND
      // median per type -> the existing chi2 independence kernel.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val med = broadcast(ev.agg(
        expr("percentile(cents, 0.5)").as("med")))
      Profiling.chi2Independence(
        ev.crossJoin(med).select(col("event_type"),
          when(col("cents") > col("med"), "above")
            .otherwise("at_or_below").as("side")),
        "event_type", "side")
    }),
    "q_ordinal_assoc" -> ((s, dir) => {
      // Gamma + both Somers' D next to tau-b — the full ordinal
      // association readout off ONE exact pair-count row (the kendall
      // O(n^2)-on-units kernel).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
      Profiling.kendallTau(users, "spend", "n_purch")
        .withColumn("gamma", expr(Profiling.gammaSql))
        .withColumn("somers_d_yx", expr(Profiling.somersDyxSql))
        .withColumn("somers_d_xy", expr(Profiling.somersDxySql))
    }),
    "q_weighted_kappa" -> ((s, dir) => {
      // Ordinal rater agreement: spend tier vs click tier per user,
      // linear weights — one-off disagreements cost less; every term
      // exact integer over the full grid.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"))
        .select(
          when(col("spend") >= 360000L, 3L).when(col("spend") >= 330000L, 2L)
            .when(col("spend") >= 300000L, 1L).otherwise(0L).as("tier_a"),
          when(col("n_click") >= 25L, 3L).when(col("n_click") >= 20L, 2L)
            .when(col("n_click") >= 15L, 1L).otherwise(0L).as("tier_b"))
      Profiling.weightedKappa(users, "tier_a", "tier_b")
    }),
    "q_kendalls_w" -> ((s, dir) => {
      // HOW MUCH do the five event types agree on user ranking (not
      // just whether they differ): Kendall's W = chi2_F/(n(k-1)) on
      // the friedman kernel — 0 = no concordance, 1 = identical
      // rankings.
      val ut = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      Profiling.friedman(ut, "user_id", "event_type", "cents")
        .select(col("k"), col("n_items"), col("chi2"),
          expr("CASE WHEN chi2 IS NOT NULL AND n_items > 0 AND k > 1 " +
            "THEN round(chi2 / (n_items * (k - 1)), 6) END")
            .as("kendalls_w"))
    }),
    "q_dunn" -> ((s, dir) =>
      // WHICH sources differ in doc-length distribution (after
      // q_kruskal_wallis's omnibus): pairwise Dunn z on the shared
      // midrank kernel, A-S two-sided p, Bonferroni across pairs.
      Profiling.dunnTest(
        table(s, dir, "documents"), "source", "n_chars")),
    "q_mahalanobis" -> ((s, dir) => {
      // Users off the spend~activity correlation ridge: 2-D Mahalanobis
      // top-20 — exact moment covariance, closed-form inverse, rounded
      // distances with id tie-break.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          count(lit(1)).cast("long").as("n_events"))
      Profiling.mahalanobis2d(users, "user_id", "spend", "n_events")
    }),
    "q_partial_corr" -> ((s, dir) => {
      // Does spend~purchases survive controlling for raw activity?
      // Three pairwise Pearsons off ONE exact moment row, partial via
      // the shared chain over the rounded r's.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("y"),
          count(lit(1)).cast("long").as("z"))
      Profiling.partialCorr(users, "x", "y", "z")
    }),
    "q_mcnemar" -> ((s, dir) => {
      // Paired model comparison on the SAME users: rule A (spend) vs
      // rule B (clicks) predicting the heavy-purchaser label — only the
      // discordant cells drive the continuity-corrected chi-square.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"))
        .withColumn("heavy", col("n_purch") >= 15L)
        .withColumn("ok_a", (col("spend") > 330000L) === col("heavy"))
        .withColumn("ok_b", (col("n_click") >= 20L) === col("heavy"))
      Profiling.mcnemar(users, "ok_a", "ok_b")
    }),
    "q_mcc" -> ((s, dir) => {
      // Matthews correlation of the spend>threshold rule against the
      // heavy-purchaser label — the imbalance-honest single score from
      // four exact confusion cells in one aggregate.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
        .withColumn("pred", col("spend") > 330000L) // ≈ median user spend
      Profiling.mcc(users, "pred", "heavy")
    }),
    "q_sign_test" -> ((s, dir) => {
      // Paired sign test: does each user spend more on even or odd
      // days? Ties drop; exact win counts, one z chain — the
      // weakest-assumption paired test next to the signed-rank tier.
      val users = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("spend_even"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("spend_odd"))
      Profiling.signTest(users, "spend_even", "spend_odd")
    }),
    "q_g_test" -> ((s, dir) =>
      // Likelihood-ratio independence of lang × length tier — the G
      // twin of q_chi2_independence; micro-quantized O·ln(O·N/NrNc)
      // cell terms. (Length tier, not source: lang × 20 sources puts
      // df at 76, past the critical table, NULLing the flag — the
      // degenerate-output sweep's r10 find.)
      Profiling.gTest(
        table(s, dir, "documents").select(col("lang"),
          when(col("n_chars") >= 380L, "long")
            .when(col("n_chars") >= 220L, "mid").otherwise("short")
            .as("len_tier")),
        "lang", "len_tier")),
    "q_risk_ratio" -> ((s, dir) => {
      // Does heavy clicking associate with heavy purchasing? RR + OR
      // with Wald log-scale CIs off four exact 2x2 cells (balanced
      // 53/26/47/24 table at sf0.01; the original had_error exposure
      // was TRUE for every user — all four estimates NULLed).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
      Profiling.riskRatio(users, "clicker", "heavy")
    }),
    "q_cmh" -> ((s, dir) => {
      // The clicker→heavy association CONTROLLED for spend tier:
      // Mantel-Haenszel pooled OR vs the crude OR, CMH chi2, and the
      // Simpson's-paradox flag — per-stratum nano terms, exact sums
      // (same balanced clicker exposure as q_risk_ratio).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
        .withColumn("tier",
          when(col("spend") >= 360000L, "high")
            .when(col("spend") >= 300000L, "mid").otherwise("low"))
      Profiling.cmh(users, "tier", "clicker", "heavy")
    }),
    "q_wilcoxon_signed" -> ((s, dir) => {
      // Magnitude-aware paired twin of q_sign_test on the SAME pairing
      // (even-day vs odd-day spend per user): doubled midranks of |d|
      // off the prefix-sum kernel, tie-corrected z.
      val users = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("spend_even"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("spend_odd"))
      Profiling.wilcoxonSignedRank(users, "spend_even", "spend_odd")
    }),
    "q_page_trend" -> ((s, dir) =>
      // Ordered-alternative sharpening of q_friedman on the same
      // user × event-type spend layout: Page's L with the treatment
      // order = sorted type labels, exact doubled-rank L2.
      Profiling.pageTrend(
        table(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "user_id", "event_type", "v")),
    "q_cvm" -> ((s, dir) => {
      // Whole-distribution spend comparison (high-clickers vs the
      // rest) — the integrated-ECDF-gap companion to q_mann_whitney
      // (location) and q_ks_test (max gap): exact decimal numerator
      // over one value-domain prefix sum. Same balanced clicker split
      // as q_mann_whitney (had_error degenerates at sf0.01).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"))
      Profiling.cramerVonMises(users, "clicker", "spend")
    }),
    "q_jonckheere" -> ((s, dir) => {
      // Does spend INCREASE along purchase-count tiers? The ordered
      // alternative over independent groups (the q_page_trend twin):
      // exact doubled J off the zero-filled grid prefix sums.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
        .withColumn("tier",
          when(col("n_purch") >= 20L, "3_high")
            .when(col("n_purch") >= 12L, "2_mid").otherwise("1_low"))
      Profiling.jonckheere(users, "tier", "spend")
    }),
    "q_gof_dow" -> ((s, dir) =>
      // Is each type's traffic uniform across the 7-day cycle? Per-key
      // GOF chi2 with the zero-cell correction in the algebra — the
      // calendar-structure alarm next to q_forecast_skill.
      Profiling.gofUniform(
        table(s, dir, "events").select(col("event_type"),
          expr("(unix_millis(ts) div 86400000) % 7").as("dow")),
        "event_type", "dow")),
    "q_shift_function" -> ((s, dir) => {
      // WHERE does heavy purchasers' spend differ from the rest? Nine
      // decile quantiles side by side with their gap — the location
      // readout after q_cvm's whole-distribution yes/no. (Split on the
      // heavy flag, not had_error: every sf0.01 user touches an error,
      // which would empty one side.)
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
      Profiling.shiftFunction(users, "heavy", "spend")
    }),
    "q_bowker" -> ((s, dir) => {
      // Do users' spend tiers MOVE symmetrically between even and odd
      // days? The kxk McNemar: per-pair micro terms, df = informative
      // pairs only.
      def tier(c: org.apache.spark.sql.Column) =
        when(c >= 180000L, "h").when(c >= 150000L, "m").otherwise("l")
      val users = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("y"))
        .select(tier(col("x")).as("tier_even"), tier(col("y")).as("tier_odd"))
      Profiling.bowkerSymmetry(users, "tier_even", "tier_odd")
    }),
    "q_risk_diff" -> ((s, dir) => {
      // The absolute-scale 2x2 readout (RD + Wald CI + z + NNT) on the
      // same balanced clicker→heavy table as q_risk_ratio.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
      Profiling.riskDiff(users, "clicker", "heavy")
    }),
    "q_woolf" -> ((s, dir) => {
      // Is the clicker→heavy OR HOMOGENEOUS across the spend tiers
      // q_cmh pools over? Woolf chi2 with inverse-variance weights;
      // empty-cell strata drop and are reported.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
        .withColumn("tier",
          when(col("spend") >= 360000L, "high")
            .when(col("spend") >= 300000L, "mid").otherwise("low"))
      Profiling.woolf(users, "tier", "clicker", "heavy")
    }),
    "q_cronbach_alpha" -> ((s, dir) =>
      // Do the per-type spends hang together as ONE engagement scale?
      // Cronbach's alpha over the user x type layout — exact moments,
      // nano item variances.
      Profiling.cronbachAlpha(
        table(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "user_id", "event_type", "v")),
    "q_hodges_lehmann" -> ((s, dir) => {
      // Robust shift between even- and odd-id users' total spend:
      // the median pairwise difference in cents — outlier-immune where
      // a mean difference isn't, in the metric's own units.
      val users = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      graft.operators.Profiling.hodgesLehmann(
        users.filter(pmod(col("user_id"), lit(2L)) === 0L),
        users.filter(pmod(col("user_id"), lit(2L)) === 1L),
        "cents")
    }),
    "q_dist_distance" -> ((s, dir) => {
      // How far apart are click and purchase value distributions?
      // The full histogram-distance panel (TV / Bhattacharyya /
      // Hellinger / overlap) over 10 pooled-span bins.
      val e = table(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("c"))
      graft.operators.Profiling.distDistances(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"),
        "c", nBins = 10)
    }),
    "q_fleiss_kappa" -> ((s, dir) => {
      // Three deterministic tier rules as raters over users: does the
      // spend rule agree with the click and view rules beyond chance?
      def tier(c: org.apache.spark.sql.Column, t3: Long, t2: Long, t1: Long) =
        when(c >= t3, 3L).when(c >= t2, 2L).when(c >= t1, 1L).otherwise(0L)
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("n_view"))
        .materialize
      val long = users.select(col("user_id"), lit("r_spend").as("rater"),
          tier(col("spend"), 360000L, 330000L, 300000L).as("cat"))
        .unionByName(users.select(col("user_id"), lit("r_click").as("rater"),
          tier(col("n_click"), 25L, 20L, 15L).as("cat")))
        .unionByName(users.select(col("user_id"), lit("r_view").as("rater"),
          tier(col("n_view"), 25L, 20L, 15L).as("cat")))
      Profiling.fleissKappa(long, "user_id", "rater", "cat")
    }),
    "q_binomial_test" -> ((s, dir) =>
      // Do even-id users really generate half of each event type's
      // traffic? Exact-rational null 1/2, continuity-corrected z.
      graft.operators.Profiling.binomialTest(
        table(s, dir, "events")
          .withColumn("even_user", pmod(col("user_id"), lit(2L)) === 0L),
        "event_type", "even_user", p0Num = 1L, p0Den = 2L)),
    "q_poisson_rates" -> ((s, dir) =>
      // Did each event type's arrival RATE change after the first
      // week? Conditional-binomial two-rate test: week-1 events vs the
      // rest, exposures 7 and 24 days.
      graft.operators.Profiling.poissonTwoRate(
        table(s, dir, "events")
          .withColumn("in_week1", dayofmonth(col("ts")) <= 7),
        "event_type", "in_week1", tA = 7L, tB = 24L)),
    "q_ks_test" -> ((s, dir) => {
      // Exact two-sample Kolmogorov-Smirnov on purchase vs click spend
      // distributions: the D supremum and its location decided in
      // exact integers over the distinct-value prefix frame.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Profiling.ksTwoSample(
        ev.filter(col("event_type") === "purchase").select(col("cents")),
        ev.filter(col("event_type") === "click").select(col("cents")),
        "cents")
    }),
    "q_enrichment" -> ((s, dir) => {
      // Over-representation analysis: is the high-value flag (spend
      // >= $80) enriched in each event type? Hypergeometric z with the
      // finite-population correction, continuity-corrected.
      val ev = table(s, dir, "events").select(col("event_type"),
        (round(col("value") * 100, 0).cast("long") >= 8000L).as("hi"))
      graft.operators.Profiling.enrichment(ev, "event_type", "hi")
    }),
    "q_tukey_fences" -> ((s, dir) => {
      // Boxplot-rule outlier screen per event type: exact type-1
      // quartiles via the ranged prefix-sum kernel, fence membership
      // decided in integer QUARTERS (no double ever flips a flag).
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Profiling.tukeyFences(ev, "event_type", "cents")
    }),
    "q_equidepth_hist" -> ((s, dir) => {
      // ANALYZE-style equi-depth histogram (8 buckets) per event type:
      // each distinct value assigned whole by its end rank — exact
      // counts, optimizer/drift-monitor food.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Profiling.equiDepthHistogram(
        ev, "event_type", "cents", nBuckets = 8)
    }),
    "q_by_fdr" -> ((s, dir) => {
      // The same 150 per-user rate-change tests as q_bh_fdr, but
      // Benjamini-Yekutieli corrected — valid under ARBITRARY test
      // dependence (the H_m-penalized threshold).
      val perUser = table(s, dir, "events").groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2"))
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      Profiling.byFdr(perUser, Seq("user_id"), "p", qPpm = 100000L)
    }),
    "q_dp_counts" -> ((s, dir) => {
      // epsilon-DP Laplace release of (event_type, day-of-month)
      // counts: deterministic seeded noise (engine-parity + testable
      // plumbing; production swaps the seed for a CSPRNG — documented
      // on the operator), eps = 1, sensitivity 1.
      val ev = table(s, dir, "events")
        .select(col("event_type"),
          expr("CAST(day(ts) AS BIGINT)").as("dom"))
      graft.operators.Profiling.dpNoisyCounts(
        ev, Seq("event_type", "dom"))
    }),
    "q_krippendorff" -> ((s, dir) => {
      // Krippendorff's alpha (nominal) treating each event_type channel
      // as a rater assigning the user a spend tier: the
      // missing-tolerant reliability coefficient (users rated by >= 2
      // channels contribute; fleiss/cohen require complete panels).
      val ratings = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
          .cast("long").as("spend"))
        .select(col("user_id"), col("event_type"),
          least(expr("spend div 25000"), lit(3L)).as("tier"))
      graft.operators.Profiling.krippendorffAlpha(
        ratings, "user_id", "event_type", "tier")
    }),
    "q_fd_check" -> ((s, dir) => {
      // Functional-dependency audit over four candidate pairs of the
      // orders table: key-like columns hold, the reverse directions
      // leak (exact violation mass per determinant).
      graft.operators.Profiling.fdCheck(table(s, dir, "orders"), Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderkey", "o_orderpriority")))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_emd" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend
         |  FROM events GROUP BY 1),
         |u AS (SELECT spend AS v,
         |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
         |    CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS ib FROM users),
         |per AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
         |    CAST(SUM(ib) AS BIGINT) AS cb FROM u GROUP BY 1),
         |c AS (SELECT v, ca, cb,
         |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
         |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb,
         |    LEAD(v) OVER (ORDER BY v) AS next_v FROM per),
         |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         |    CAST(SUM(cb) AS BIGINT) AS n_b FROM per),
         |g AS (SELECT n_a, n_b,
         |    ${graft.operators.Profiling.emdGapMicroSql} AS gap_micro
         |  FROM c, t WHERE next_v IS NOT NULL),
         |agg AS (SELECT n_a, n_b,
         |    CAST(SUM(gap_micro) AS BIGINT) AS emd_micro
         |  FROM g GROUP BY 1, 2)
         |SELECT n_a, n_b, emd_micro,
         |  round(CAST(emd_micro AS DOUBLE) / 1000000, 6) AS emd
         |FROM agg""".stripMargin,
    "q_cochran_q" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS np,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nc,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nv
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT user_id, spend, nc, nv, np >= 15 AS heavy
         |  FROM users),
         |lng AS (
         |  SELECT user_id, 'a' AS rule, (spend > 330000) = heavy AS ok
         |    FROM u2
         |  UNION ALL SELECT user_id, 'b', (nc >= 20) = heavy FROM u2
         |  UNION ALL SELECT user_id, 'c', (nv >= 20) = heavy FROM u2),
         |sf AS (SELECT user_id, rule,
         |    CASE WHEN ok THEN 1 ELSE 0 END AS sflag FROM lng),
         |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(gj) AS BIGINT) AS sum_g,
         |    CAST(SUM(CAST(gj AS DECIMAL(38,0)) * gj) AS DECIMAL(38,0))
         |      AS sum_g2
         |  FROM (SELECT rule, CAST(SUM(sflag) AS BIGINT) AS gj
         |    FROM sf GROUP BY 1)),
         |bi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         |    CAST(SUM(li) AS BIGINT) AS sum_l,
         |    CAST(SUM(li * li) AS BIGINT) AS sum_l2
         |  FROM (SELECT user_id, CAST(SUM(sflag) AS BIGINT) AS li
         |    FROM sf GROUP BY 1)),
         |f AS (SELECT * FROM bt, bi)
         |SELECT k, sum_g, CAST(sum_g2 AS VARCHAR) AS sum_g2,
         |  n_items, sum_l, sum_l2,
         |  ${graft.operators.Profiling.cochranQSql} AS q,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")} AS chi2_crit,
         |  ${graft.operators.Profiling.cochranQSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM f""".stripMargin,
    "q_friedman" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |rk AS (SELECT user_id, event_type, k,
         |    CAST(2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY v
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS BIGINT)
         |      AS r2
         |  FROM comp),
         |bt AS (SELECT k,
         |    CAST(SUM(CAST(r2j AS DECIMAL(38,0)) * r2j) AS DECIMAL(38,0))
         |      AS b4n
         |  FROM (SELECT k, event_type, CAST(SUM(r2) AS BIGINT) AS r2j
         |    FROM rk GROUP BY 1, 2) GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items
         |  FROM rk),
         |aa AS (SELECT
         |    CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0))
         |      AS a4 FROM rk),
         |f AS (SELECT * FROM bt, tt, aa)
         |SELECT k, CAST(b4n AS VARCHAR) AS b4n, n_items,
         |  CAST(a4 AS VARCHAR) AS a4,
         |  ${graft.operators.Profiling.friedmanSql} AS chi2,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")} AS chi2_crit,
         |  ${graft.operators.Profiling.friedmanSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM f""".stripMargin,
    "q_mood_median" ->
      """WITH e AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
        |m AS (SELECT median(cents) AS med FROM e),
        |ev AS (SELECT event_type,
        |    CASE WHEN cents > med THEN 'above' ELSE 'at_or_below' END
        |      AS side FROM e, m),
        |cells AS (SELECT event_type, side, CAST(COUNT(*) AS BIGINT)
        |    AS obs FROM ev GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS nr
        |  FROM cells GROUP BY 1),
        |c AS (SELECT side, CAST(SUM(obs) AS BIGINT) AS nc
        |  FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
        |SELECT cells.event_type, cells.side, obs,
        |  round(CAST(nr AS DOUBLE) * nc / n, 6) AS expected,
        |  round((CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) *
        |        (CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) /
        |        (CAST(nr AS DOUBLE) * nc / n), 6) AS chi2_contrib
        |FROM cells JOIN r ON r.event_type = cells.event_type
        |  JOIN c ON c.side = cells.side CROSS JOIN t""".stripMargin,
    "q_ordinal_assoc" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |idd AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i
         |  FROM users),
         |pp AS (SELECT
         |    CAST(sign(b.x - a.x) * sign(b.y - a.y) AS BIGINT) AS cd,
         |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
         |  FROM idd a JOIN idd b ON a.i < b.i),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS concordant,
         |    CAST(SUM(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS discordant,
         |    CAST(SUM(tx) AS BIGINT) AS ties_x,
         |    CAST(SUM(ty) AS BIGINT) AS ties_y FROM pp)
         |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
         |  ${graft.operators.Profiling.tauBSql} AS tau_b,
         |  ${graft.operators.Profiling.gammaSql} AS gamma,
         |  ${graft.operators.Profiling.somersDyxSql} AS somers_d_yx,
         |  ${graft.operators.Profiling.somersDxySql} AS somers_d_xy
         |FROM agg""".stripMargin,
    "q_weighted_kappa" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click
         |  FROM events GROUP BY 1),
         |t AS (SELECT
         |    CASE WHEN spend >= 360000 THEN 3 WHEN spend >= 330000 THEN 2
         |      WHEN spend >= 300000 THEN 1 ELSE 0 END AS i,
         |    CASE WHEN n_click >= 25 THEN 3 WHEN n_click >= 20 THEN 2
         |      WHEN n_click >= 15 THEN 1 ELSE 0 END AS j
         |  FROM users),
         |cells AS (SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         |    CAST(COUNT(*) AS BIGINT) AS obs FROM t GROUP BY 1, 2),
         |r AS (SELECT i, CAST(SUM(obs) AS BIGINT) AS ri
         |  FROM cells GROUP BY 1),
         |cc AS (SELECT j, CAST(SUM(obs) AS BIGINT) AS cj
         |  FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
         |grid AS (SELECT r.i, cc.j, r.ri, cc.cj,
         |    COALESCE(cells.obs, 0) AS obs
         |  FROM r CROSS JOIN cc LEFT JOIN cells USING (i, j)),
         |a AS (SELECT CAST(SUM(ABS(i - j) * obs) AS BIGINT) AS swo,
         |    CAST(SUM(CAST(ABS(i - j) * ri AS DECIMAL(38,0)) * cj)
         |      AS DECIMAL(38,0)) AS swe
         |  FROM grid),
         |f AS (SELECT swo, swe, n FROM a, nn)
         |SELECT swo, CAST(swe AS VARCHAR) AS swe, n,
         |  ${graft.operators.Profiling.weightedKappaSql} AS kappa_w
         |FROM f""".stripMargin,
    "q_kendalls_w" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |rk AS (SELECT user_id, event_type, k,
         |    CAST(2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY v
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS BIGINT)
         |      AS r2
         |  FROM comp),
         |bt AS (SELECT k,
         |    CAST(SUM(CAST(r2j AS DECIMAL(38,0)) * r2j) AS DECIMAL(38,0))
         |      AS b4n
         |  FROM (SELECT k, event_type, CAST(SUM(r2) AS BIGINT) AS r2j
         |    FROM rk GROUP BY 1, 2) GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items
         |  FROM rk),
         |aa AS (SELECT
         |    CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0))
         |      AS a4 FROM rk),
         |f AS (SELECT * FROM bt, tt, aa),
         |g AS (SELECT k, n_items,
         |    ${graft.operators.Profiling.friedmanSql} AS chi2 FROM f)
         |SELECT k, n_items, chi2,
         |  CASE WHEN chi2 IS NOT NULL AND n_items > 0 AND k > 1
         |    THEN round(chi2 / (n_items * (k - 1)), 6) END AS kendalls_w
         |FROM g""".stripMargin,
    "q_dunn" ->
      s"""WITH d AS (SELECT source AS grp, n_chars AS v FROM documents),
         |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM d GROUP BY 1),
         |rk AS (SELECT v,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(r2) AS BIGINT) AS rg2
         |  FROM d JOIN rk USING (v) GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS k FROM g),
         |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
         |    a.ng AS n_a, b.ng AS n_b, a.rg2 AS rg2_a, b.rg2 AS rg2_b,
         |    n, k, t3t
         |  FROM g a JOIN g b ON a.grp < b.grp, tot, tie)
         |SELECT grp_a, grp_b, n_a, n_b,
         |  ${graft.operators.Profiling.dunnZSql} AS z,
         |  round(${graft.operators.Profiling.normalPSql(
                graft.operators.Profiling.dunnZSql)}, 6) AS p,
         |  round(${graft.operators.Profiling.normalPSql(
                graft.operators.Profiling.dunnZSql)}, 6)
         |    < 0.05 / (k * (k - 1) / 2) AS significant
         |FROM pairs""".stripMargin,
    "q_mahalanobis" ->
      s"""WITH u AS (SELECT user_id AS id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS x,
         |    CAST(COUNT(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy FROM u),
         |d AS (SELECT id, x, y,
         |    ${graft.operators.Profiling.mahalanobis2Sql} AS d2
         |  FROM u, mm),
         |r AS (SELECT id, x, y, d2, ROW_NUMBER() OVER (
         |    ORDER BY d2 DESC, id ASC) AS rn
         |  FROM d WHERE d2 IS NOT NULL)
         |SELECT CAST(rn AS BIGINT) AS rnk, id, x, y, d2
         |FROM r WHERE rn <= 20""".stripMargin,
    "q_partial_corr" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y,
         |    CAST(COUNT(*) AS BIGINT) AS z
         |  FROM events GROUP BY 1),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(z) AS BIGINT) AS sz,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy,
         |    CAST(SUM(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))
         |      AS szz,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))
         |      AS sxz,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))
         |      AS syz FROM u),
         |rr AS (SELECT n,
         |    ${graft.operators.Profiling.rPairSql("x", "y")} AS r_xy,
         |    ${graft.operators.Profiling.rPairSql("x", "z")} AS r_xz,
         |    ${graft.operators.Profiling.rPairSql("y", "z")} AS r_yz
         |  FROM m)
         |SELECT n, r_xy, r_xz, r_yz,
         |  ${graft.operators.Profiling.partialCorrSql} AS r_xy_z
         |FROM rr""".stripMargin,
    "q_benford" ->
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
        |  FROM events),
        |h AS (
        |  SELECT event_type,
        |    CAST(substr(CAST(abs(c) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    COUNT(*) AS n
        |  FROM v WHERE c IS NOT NULL AND abs(c) > 0 GROUP BY 1, 2),
        |t AS (SELECT event_type, SUM(n) AS n_group FROM h GROUP BY 1)
        |SELECT h.event_type, digit, CAST(n AS BIGINT) AS n,
        |  round(n / CAST(n_group AS DOUBLE), 6) AS obs_freq,
        |  round(log10(1 + 1.0 / digit), 6) AS benford_freq,
        |  round(n_group *
        |    pow(n / CAST(n_group AS DOUBLE) - log10(1 + 1.0 / digit), 2)
        |    / log10(1 + 1.0 / digit), 6) AS chi2_contrib
        |FROM h JOIN t USING (event_type)""".stripMargin,
    "q_psi_drift" -> psiDriftOracle,
    "q_chi2_independence" ->
      // expected = row-marginal · col-marginal / total, mirrored
      // term-for-term (CAST(nr AS DOUBLE) * nc / n)
      """WITH ev AS (SELECT event_type,
        |    'arm_' || CAST(user_id % 2 AS VARCHAR) AS arm FROM events),
        |cells AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM ev GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS nr
        |  FROM cells GROUP BY 1),
        |c AS (SELECT arm, CAST(SUM(obs) AS BIGINT) AS nc FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
        |SELECT cells.event_type, cells.arm, obs,
        |  round(CAST(nr AS DOUBLE) * nc / n, 6) AS expected,
        |  round((CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) *
        |        (CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) /
        |        (CAST(nr AS DOUBLE) * nc / n), 6) AS chi2_contrib
        |FROM cells JOIN r ON r.event_type = cells.event_type
        |  JOIN c ON c.arm = cells.arm CROSS JOIN t""".stripMargin,
    "q_ks_users" ->
      // naive single-window cumsum is fine AS AN ORACLE; the engine's
      // distributed prefix sum must produce the identical D
      """WITH a AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        |  FROM events WHERE user_id % 2 = 0),
        |b AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        |  FROM events WHERE user_id % 2 != 0),
        |per AS (SELECT v, CAST(SUM(ca) AS BIGINT) AS ca,
        |    CAST(SUM(cb) AS BIGINT) AS cb
        |  FROM (SELECT v, 1 AS ca, 0 AS cb FROM a
        |        UNION ALL SELECT v, 0, 1 FROM b) GROUP BY 1),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b FROM per),
        |c AS (SELECT
        |    CAST(SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM per)
        |SELECT n_a, n_b,
        |  round(MAX(abs(CAST(cuma AS DOUBLE) / n_a - CAST(cumb AS DOUBLE) / n_b)), 6) AS d
        |FROM c, t GROUP BY n_a, n_b""".stripMargin,
    "q_skew_profile" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(MAX(c) AS BIGINT) AS max_rows, round(AVG(c), 6) AS avg_rows,
        |  round(MAX(c) / AVG(c), 6) AS skew_ratio
        |FROM (SELECT event_type, user_id, COUNT(*) AS c
        |      FROM events GROUP BY event_type, user_id)
        |GROUP BY event_type""".stripMargin,
    "q_profile_table" ->
      """SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_val, CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |  MIN(o_orderstatus), MAX(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        |  MIN(o_orderpriority), MAX(o_orderpriority)
        |FROM orders""".stripMargin,
    "q_sprt" -> {
      val (incPos, incNeg, upper, lower) =
        Profiling.sprtConstants(0.15, 0.25, 0.05, 0.05)
      s"""WITH e AS (SELECT 'arm_' || CAST(user_id % 2 AS VARCHAR) AS arm,
         |    epoch_ms(ts) AS ms, event_id,
         |    CASE WHEN event_type = 'purchase' THEN ${incPos}
         |         ELSE ${incNeg} END AS llr
         |  FROM events),
         |c AS (SELECT arm, llr,
         |    CAST(SUM(llr) OVER w AS BIGINT) AS cum,
         |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS n_obs
         |  FROM e WINDOW w AS (PARTITION BY arm ORDER BY ms, event_id)),
         |f AS (SELECT arm, CAST(MIN(n_obs) AS BIGINT) AS cn,
         |    CAST(arg_min(cum, n_obs) AS BIGINT) AS cllr
         |  FROM c WHERE cum >= ${upper} OR cum <= ${lower} GROUP BY arm),
         |t AS (SELECT arm, CAST(SUM(llr) AS BIGINT) AS fllr,
         |    CAST(COUNT(*) AS BIGINT) AS nt FROM e GROUP BY arm)
         |SELECT t.arm,
         |  CASE WHEN cn IS NULL THEN 'continue'
         |       WHEN cllr >= ${upper} THEN 'accept_h1'
         |       ELSE 'accept_h0' END AS decision,
         |  COALESCE(cn, nt) AS n_obs, COALESCE(cllr, fllr) AS llr_micro,
         |  CAST(${upper} AS BIGINT) AS upper_micro,
         |  CAST(${lower} AS BIGINT) AS lower_micro
         |FROM t LEFT JOIN f ON t.arm = f.arm""".stripMargin
    },
    "q_mutual_info" ->
      """WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM documents GROUP BY 1, 2),
        |xs AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS n_x FROM cells GROUP BY 1),
        |ys AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS n_y FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
        |SELECT lang, source, obs, n_x, n_y,
        |  round((CAST(obs AS DOUBLE) / n) *
        |    ln((CAST(obs AS DOUBLE) * n) /
        |      (CAST(n_x AS DOUBLE) * n_y)), 6) AS mi_contrib
        |FROM cells JOIN xs USING (lang) JOIN ys USING (source) CROSS JOIN t""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT CAST('0x' ||
        |    substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM orders),
        |k AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_k, max(h) AS h_k FROM k),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM h),
        |est AS (SELECT n_k, h_k, exact_distinct, (n_k = 256) AS saturated,
        |    CASE WHEN n_k = 256
        |      THEN round(CAST(n_k - 1 AS DOUBLE) * power(2, 60) / h_k, 6)
        |      ELSE CAST(n_k AS DOUBLE) END AS est_distinct
        |  FROM kk, ex)
        |SELECT n_k, h_k, exact_distinct, saturated, est_distinct,
        |  round(abs(est_distinct / exact_distinct - 1), 6) AS rel_err
        |FROM est""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n, (COUNT(*) >= 10) AS anonymous,
        |  round(1.0 / COUNT(*), 6) AS risk
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q_join_size_est" ->
      """WITH ka AS (SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders),
        |kb AS (SELECT CAST(l_orderkey AS VARCHAR) AS key FROM lineitem),
        |ca AS (SELECT r, h % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS ca
        |  FROM (SELECT key, r, CAST('0x' || substr(md5('cm' ||
        |      CAST(r AS VARCHAR) || ':' || key), 1, 15) AS BIGINT) AS h
        |    FROM ka, (SELECT unnest(range(0, 4)) AS r)) GROUP BY 1, 2),
        |cb AS (SELECT r, h % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM (SELECT key, r, CAST('0x' || substr(md5('cm' ||
        |      CAST(r AS VARCHAR) || ':' || key), 1, 15) AS BIGINT) AS h
        |    FROM kb, (SELECT unnest(range(0, 4)) AS r)) GROUP BY 1, 2),
        |ip AS (SELECT ca.r, CAST(SUM(ca.ca * cb.cb) AS BIGINT) AS ip
        |  FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket GROUP BY 1),
        |est AS (SELECT min(ip) AS cm_est FROM ip),
        |exact AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS exact_size
        |  FROM (SELECT key, CAST(COUNT(*) AS BIGINT) AS na FROM ka GROUP BY 1) a
        |  JOIN (SELECT key, CAST(COUNT(*) AS BIGINT) AS nb FROM kb GROUP BY 1) b
        |    USING (key))
        |SELECT exact_size, cm_est, (cm_est >= exact_size) AS is_over
        |FROM est, exact""".stripMargin,
    "q_table_fingerprint" ->
      """WITH h AS (SELECT l_returnflag, CAST('0x' || substr(md5(
        |    COALESCE(CAST(l_orderkey AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(l_partkey AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(l_suppkey AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(l_linenumber AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
        |      AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), '<NUL>')),
        |    1, 15) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(h % 1099511627776) AS BIGINT) AS hash_sum,
        |  MIN(h) AS hash_min, MAX(h) AS hash_max
        |FROM h GROUP BY 1""".stripMargin,
    "q_l_diversity" ->
      s"""WITH c0 AS (SELECT c_mktsegment, CAST(c_nationkey AS BIGINT)
         |    AS c_nationkey,
         |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bucket
         |  FROM customer),
         |cells AS (SELECT c_mktsegment, c_nationkey, bal_bucket,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM c0 GROUP BY 1, 2, 3),
         |tot AS (SELECT c_mktsegment, c_nationkey,
         |    CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
         |j AS (SELECT cells.c_mktsegment, cells.c_nationkey, n, c,
         |    ${graft.operators.Profiling.entropyCellSql} AS ent_c
         |  FROM cells JOIN tot USING (c_mktsegment, c_nationkey))
         |SELECT c_mktsegment, c_nationkey, n,
         |  CAST(COUNT(*) AS BIGINT) AS distinct_sensitive,
         |  CAST(SUM(ent_c) AS BIGINT) AS entropy_micro,
         |  (COUNT(*) >= 3) AS l_diverse
         |FROM j GROUP BY 1, 2, 3""".stripMargin,
    "q_kmv_set_ops" ->
      """WITH ha AS MATERIALIZED (SELECT DISTINCT CAST('0x' ||
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events WHERE event_type = 'click'),
        |hb AS MATERIALIZED (SELECT DISTINCT CAST('0x' ||
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events WHERE event_type = 'purchase'),
        |u AS MATERIALIZED (SELECT h FROM ha UNION SELECT h FROM hb),
        |uk AS (SELECT t.h, (ha.h IS NOT NULL) AS ina, (hb.h IS NOT NULL) AS inb
        |  FROM (SELECT h FROM u ORDER BY h LIMIT 64) t
        |  LEFT JOIN ha ON t.h = ha.h LEFT JOIN hb ON t.h = hb.h),
        |sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_k, MAX(h) AS h_k,
        |    CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS j_common FROM uk),
        |ex AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS exact_union,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ha JOIN hb USING (h))
        |      AS exact_intersection),
        |est AS (SELECT n_k, h_k, j_common, exact_union, exact_intersection,
        |    CASE WHEN n_k = 64
        |      THEN round(CAST(n_k - 1 AS DOUBLE) * power(2, 60) / h_k, 6)
        |      ELSE CAST(n_k AS DOUBLE) END AS est_union,
        |    round(CAST(j_common AS DOUBLE) / n_k, 6) AS est_jaccard
        |  FROM sk, ex)
        |SELECT n_k, h_k, j_common, exact_union, exact_intersection,
        |  est_union, est_jaccard,
        |  round(est_jaccard * est_union, 6) AS est_intersection
        |FROM est""".stripMargin,
    "q_srm" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |t AS (SELECT
         |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_t,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_c FROM u)
         |SELECT n_t, n_c, ${graft.operators.Profiling.srmChi2Sql} AS chi2,
         |  ${graft.operators.Profiling.srmChi2Sql} > 3.841459 AS srm
         |FROM t""".stripMargin,
    "q_wilson_ci" -> wilsonOracleSql,
    "q_bh_fdr" -> bhFdrOracleSql,
    "q_ecod_outliers" -> {
      val cell = graft.operators.Profiling.ecodCellSql
      s"""WITH ev AS (SELECT event_id,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents,
         |    epoch_ms(ts) % 86400000 AS ms_of_day FROM events),
         |p1 AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM ev GROUP BY 1),
         |c1 AS (SELECT v, nv,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum_nv FROM p1),
         |n1 AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM p1),
         |s1 AS (SELECT v, $cell AS sc FROM c1, n1),
         |p2 AS (SELECT ms_of_day AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM ev GROUP BY 1),
         |c2 AS (SELECT v, nv,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum_nv FROM p2),
         |n2 AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM p2),
         |s2 AS (SELECT v, $cell AS sc FROM c2, n2)
         |SELECT ev.event_id, ev.cents, ev.ms_of_day,
         |  s1.sc AS sc_cents, s2.sc AS sc_ms_of_day,
         |  s1.sc + s2.sc AS score_micro
         |FROM ev JOIN s1 ON ev.cents = s1.v JOIN s2 ON ev.ms_of_day = s2.v
         |ORDER BY score_micro DESC, event_id LIMIT 20""".stripMargin
    },
    "q_kendall_tau" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |idd AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i
         |  FROM users),
         |pp AS (SELECT
         |    CAST(sign(b.x - a.x) * sign(b.y - a.y) AS BIGINT) AS cd,
         |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
         |  FROM idd a JOIN idd b ON a.i < b.i),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS concordant,
         |    CAST(SUM(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS discordant,
         |    CAST(SUM(tx) AS BIGINT) AS ties_x,
         |    CAST(SUM(ty) AS BIGINT) AS ties_y FROM pp)
         |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
         |  ${graft.operators.Profiling.tauBSql} AS tau_b
         |FROM agg""".stripMargin,
    "q_cramers_v" ->
      s"""WITH cells AS (SELECT lang AS x, source AS y,
         |    CAST(COUNT(*) AS BIGINT) AS obs FROM documents GROUP BY 1, 2),
         |r AS (SELECT x, CAST(SUM(obs) AS BIGINT) AS rx
         |  FROM cells GROUP BY 1),
         |cc AS (SELECT y, CAST(SUM(obs) AS BIGINT) AS cy
         |  FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
         |    CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y FROM cells),
         |grid AS (SELECT r.x, cc.y, r.rx, cc.cy,
         |    COALESCE(cells.obs, 0) AS obs
         |  FROM r CROSS JOIN cc LEFT JOIN cells USING (x, y)),
         |j AS (SELECT grid.obs, grid.rx, grid.cy, nn.n, nn.n_x, nn.n_y,
         |    ${graft.operators.Profiling.chi2CellMicroSql} AS contrib_micro
         |  FROM grid, nn),
         |t AS (SELECT n, n_x, n_y,
         |    CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
         |  FROM j GROUP BY 1, 2, 3)
         |SELECT n, n_x, n_y, chi2_micro,
         |  ${graft.operators.Profiling.cramersVSql} AS cramers_v
         |FROM t""".stripMargin,
    "q_spearman" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch
         |  FROM events GROUP BY 1),
         |px AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM users GROUP BY 1),
         |cx AS (SELECT v AS spend,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS rx2
         |  FROM px),
         |py AS (SELECT n_purch AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM users GROUP BY 1),
         |cy AS (SELECT v AS n_purch,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS ry2
         |  FROM py),
         |j AS (SELECT rx2, ry2 FROM users
         |  JOIN cx USING (spend) JOIN cy USING (n_purch)),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
         |    CAST(SUM(rx2*rx2) AS DECIMAL(38,0)) AS sxx,
         |    CAST(SUM(ry2*ry2) AS DECIMAL(38,0)) AS syy,
         |    CAST(SUM(rx2*ry2) AS DECIMAL(38,0)) AS sxy FROM j)
         |SELECT n, sx, sy,
         |  CAST(sxx AS VARCHAR) AS sxx, CAST(syy AS VARCHAR) AS syy,
         |  CAST(sxy AS VARCHAR) AS sxy,
         |  ${graft.operators.Profiling.pearsonMomentsSql} AS spearman_rho
         |FROM m""".stripMargin,
    "q_cochran_armitage" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch
         |  FROM events GROUP BY 1),
         |d AS (SELECT CASE WHEN n_click >= 25 THEN 2
         |      WHEN n_click >= 18 THEN 1 ELSE 0 END AS w,
         |    CASE WHEN n_purch >= 15 THEN 1 ELSE 0 END AS y FROM users),
         |per AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(y) AS BIGINT) AS rg FROM d GROUP BY 1),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(rg) AS BIGINT) AS r,
         |    CAST(SUM(w * ng) AS BIGINT) AS swn,
         |    CAST(SUM(w * rg) AS BIGINT) AS swr,
         |    CAST(SUM(w * w * ng) AS BIGINT) AS sw2n FROM per)
         |SELECT g, n, r, swn, swr, sw2n,
         |  ${graft.operators.Profiling.caChi2Sql} AS chi2_trend,
         |  ${graft.operators.Profiling.caChi2Sql} > 3.841459 AS significant
         |FROM agg""".stripMargin,
    "q_mann_whitney" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS had_error
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM users GROUP BY 1),
         |rk AS (SELECT v,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |m AS (SELECT
         |    CAST(SUM(CASE WHEN had_error THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(SUM(CASE WHEN had_error THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n2,
         |    CAST(SUM(CASE WHEN had_error THEN r2 ELSE 0 END) AS BIGINT)
         |      AS r1x2
         |  FROM users JOIN rk ON users.spend = rk.v),
         |a AS (SELECT n1, n2, CAST(r1x2 - n1*(n1+1) AS BIGINT) AS u1x2,
         |    t3t FROM m, tie)
         |SELECT n1, n2, u1x2, CAST(t3t AS VARCHAR) AS t3t,
         |  ${graft.operators.Profiling.mwZSql} AS z,
         |  ${graft.operators.Profiling.cliffsDeltaSql} AS cliffs_delta,
         |  abs(${graft.operators.Profiling.mwZSql}) > 1.959964 AS significant
         |FROM a""".stripMargin,
    "q_kruskal_wallis" ->
      s"""WITH d AS (SELECT source AS grp, n_chars AS v FROM documents),
         |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM d GROUP BY 1),
         |rk AS (SELECT v,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |pg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(r2) AS BIGINT) AS rgx2
         |  FROM d JOIN rk USING (v) GROUP BY 1),
         |pc AS (SELECT ng,
         |    ${graft.operators.Profiling.kwCellMicroSql} AS s_micro FROM pg),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(s_micro) AS DECIMAL(38,0)) AS s_micro FROM pc),
         |t AS (SELECT g, n, s_micro, t3t FROM a, tie)
         |SELECT g, n, CAST(s_micro AS VARCHAR) AS s_micro,
         |  CAST(t3t AS VARCHAR) AS t3t,
         |  ${graft.operators.Profiling.kwHSql} AS h,
         |  CAST(g - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("g - 1")} AS chi2_crit,
         |  ${graft.operators.Profiling.kwHSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("g - 1")} AS significant
         |FROM t""".stripMargin,
    "q_mcnemar" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click
         |  FROM events GROUP BY 1),
         |p AS (SELECT (spend > 330000) = (n_purch >= 15) AS ok_a,
         |    (n_click >= 20) = (n_purch >= 15) AS ok_b FROM users),
         |agg AS (SELECT
         |    CAST(SUM(CASE WHEN ok_a AND NOT ok_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b_only_a,
         |    CAST(SUM(CASE WHEN NOT ok_a AND ok_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c_only_b,
         |    CAST(SUM(CASE WHEN ok_a = ok_b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_concordant
         |  FROM p)
         |SELECT b_only_a, c_only_b, n_concordant,
         |  ${graft.operators.Profiling.mcnemarSql} AS chi2,
         |  ${graft.operators.Profiling.mcnemarSql} > 3.841459 AS significant
         |FROM agg""".stripMargin,
    "q_mcc" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |p AS (SELECT (spend > 330000) AS pred, heavy FROM users),
         |c AS (SELECT
         |    CAST(SUM(CASE WHEN pred AND heavy THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tp,
         |    CAST(SUM(CASE WHEN pred AND NOT heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN NOT pred AND NOT heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tn,
         |    CAST(SUM(CASE WHEN NOT pred AND heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn FROM p)
         |SELECT tp, fp, tn, fn, ${graft.operators.Profiling.mccSql} AS mcc
         |FROM c""".stripMargin,
    "q_sign_test" -> signTestOracleSql,
    // the streaming tier drains to the identical per-user paired table —
    // ONE oracle text serves both (the q_stream_wilson pattern)
    "q_g_test" ->
      s"""WITH d AS (SELECT lang,
         |    CASE WHEN n_chars >= 380 THEN 'long'
         |      WHEN n_chars >= 220 THEN 'mid' ELSE 'short' END
         |      AS len_tier FROM documents),
         |cells AS (SELECT lang, len_tier,
         |    CAST(COUNT(*) AS BIGINT) AS obs FROM d GROUP BY 1, 2),
         |rr AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS nr
         |  FROM cells GROUP BY 1),
         |cc AS (SELECT len_tier, CAST(SUM(obs) AS BIGINT) AS nc
         |  FROM cells GROUP BY 1),
         |tt AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
         |j AS (SELECT obs, nr, nc, n
         |  FROM cells JOIN rr USING (lang) JOIN cc USING (len_tier), tt),
         |w AS (SELECT n, ${graft.operators.Profiling.gCellMicroSql}
         |    AS term_micro FROM j),
         |a AS (SELECT
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM rr) AS r,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cc) AS c,
         |    MAX(n) AS n,
         |    CAST(SUM(term_micro) AS BIGINT) AS g_micro FROM w)
         |SELECT r, c, n, g_micro,
         |  ${graft.operators.Profiling.gSql} AS g,
         |  CAST((r - 1) * (c - 1) AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("(r - 1) * (c - 1)")}
         |    AS chi2_crit,
         |  ${graft.operators.Profiling.gSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("(r - 1) * (c - 1)")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_risk_ratio" -> riskRatioOracleSql,
    // the streaming tier drains to the identical per-user table —
    // ONE oracle text serves both (the q_stream_wilson pattern)
    "q_cmh" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 15 AS heavy
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT CASE WHEN spend >= 360000 THEN 'high'
         |      WHEN spend >= 300000 THEN 'mid' ELSE 'low' END AS s,
         |    clicker AS e0, heavy AS o0 FROM users),
         |st AS (SELECT s,
         |    CAST(SUM(CASE WHEN e0 AND o0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(SUM(CASE WHEN e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN NOT e0 AND o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN NOT e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS nk
         |  FROM u2 GROUP BY 1 HAVING COUNT(*) > 1),
         |t AS (SELECT a, b, c, d, nk,
         |    ${graft.operators.Profiling.cmhENanoSql} AS e_nano,
         |    ${graft.operators.Profiling.cmhVNanoSql} AS v_nano,
         |    ${graft.operators.Profiling.cmhAdNanoSql} AS adn_nano,
         |    ${graft.operators.Profiling.cmhBcNanoSql} AS bcn_nano
         |  FROM st),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd,
         |    CAST(SUM(e_nano) AS BIGINT) AS se_nano,
         |    CAST(SUM(v_nano) AS BIGINT) AS sv_nano,
         |    CAST(SUM(adn_nano) AS BIGINT) AS sadn_nano,
         |    CAST(SUM(bcn_nano) AS BIGINT) AS sbcn_nano
         |  FROM t)
         |SELECT k, sa, sb, sc, sd, se_nano, sv_nano, sadn_nano, sbcn_nano,
         |  ${graft.operators.Profiling.cmhChi2Sql} AS chi2_mh,
         |  ${graft.operators.Profiling.cmhChi2Sql} > 3.841459
         |    AS significant,
         |  ${graft.operators.Profiling.cmhOrSql} AS or_mh,
         |  ${graft.operators.Profiling.cmhCrudeOrSql} AS or_crude,
         |  ${graft.operators.Profiling.cmhFlipSql} AS simpson_flip
         |FROM agg""".stripMargin,
    "q_wilcoxon_signed" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |u AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN day % 2 = 0 THEN cents ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN day % 2 = 1 THEN cents ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM e GROUP BY 1),
         |d AS (SELECT ABS(x - y) AS ad, x > y AS pos FROM u
         |  WHERE x <> y),
         |per AS (SELECT ad, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM d GROUP BY 1),
         |rk AS (SELECT ad,
         |    CAST(SUM(nv) OVER (ORDER BY ad) AS BIGINT) * 2 - nv + 1
         |      AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |m0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(CASE WHEN pos THEN r2 ELSE 0 END) AS BIGINT)
         |      AS wpos2
         |  FROM d JOIN rk USING (ad)),
         |f AS (SELECT m, wpos2, t3t FROM m0, tie)
         |SELECT m, wpos2, CAST(t3t AS VARCHAR) AS t3t,
         |  ${graft.operators.Profiling.wsrZSql} AS z,
         |  abs(${graft.operators.Profiling.wsrZSql}) > 1.959964
         |    AS significant
         |FROM f""".stripMargin,
    "q_page_trend" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |rk AS (SELECT user_id, event_type, k,
         |    CAST(2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY v
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS BIGINT)
         |      AS r2
         |  FROM comp),
         |rs AS (SELECT k, event_type, CAST(SUM(r2) AS BIGINT) AS r2j
         |  FROM rk GROUP BY 1, 2),
         |ord AS (SELECT event_type,
         |    CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS cj
         |  FROM (SELECT DISTINCT event_type FROM rs) q),
         |bt AS (SELECT k, CAST(SUM(cj * r2j) AS BIGINT) AS l2
         |  FROM rs JOIN ord USING (event_type) GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items
         |  FROM rk),
         |f AS (SELECT * FROM bt, tt)
         |SELECT k, l2, n_items,
         |  ${graft.operators.Profiling.pageZSql} AS z,
         |  abs(${graft.operators.Profiling.pageZSql}) > 1.959964
         |    AS significant
         |FROM f""".stripMargin,
    "q_cvm" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v,
         |    CAST(SUM(CASE WHEN clicker THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c1,
         |    CAST(SUM(CASE WHEN clicker THEN 0 ELSE 1 END) AS BIGINT)
         |      AS c2
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, c1, c2,
         |    CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
         |    CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cum2 FROM per),
         |tt AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2 FROM per),
         |w AS (SELECT n1, n2,
         |    CAST(c1 + c2 AS DECIMAL(38,0)) *
         |      (CAST(cum1 AS DECIMAL(38,0)) * n2
         |        - CAST(cum2 AS DECIMAL(38,0)) * n1) *
         |      (CAST(cum1 AS DECIMAL(38,0)) * n2
         |        - CAST(cum2 AS DECIMAL(38,0)) * n1) AS term
         |  FROM c, tt),
         |a AS (SELECT n1, n2, CAST(SUM(term) AS DECIMAL(38,0)) AS num
         |  FROM w GROUP BY 1, 2)
         |SELECT n1, n2, CAST(num AS VARCHAR) AS num,
         |  ${graft.operators.Profiling.cvmTSql} AS t,
         |  ${graft.operators.Profiling.cvmTSql} > 0.461249 AS significant
         |FROM a""".stripMargin,
    "q_jonckheere" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT CASE WHEN n_purch >= 20 THEN '3_high'
         |      WHEN n_purch >= 12 THEN '2_mid' ELSE '1_low' END AS g,
         |    spend AS v FROM users),
         |per AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM u2 GROUP BY 1, 2),
         |vals AS (SELECT DISTINCT v FROM per),
         |grps AS (SELECT DISTINCT g FROM per),
         |grid AS (SELECT grps.g, vals.v, COALESCE(per.nv, 0) AS nv
         |  FROM vals CROSS JOIN grps
         |  LEFT JOIN per ON per.g = grps.g AND per.v = vals.v),
         |c AS (SELECT g, v, nv,
         |    CAST(SUM(nv) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
         |      AS cum FROM grid),
         |jj AS (SELECT CAST(SUM(CAST(y.nv AS DECIMAL(38,0)) *
         |      (x.cum * 2 - x.nv)) AS DECIMAL(38,0)) AS j2
         |  FROM c x JOIN c y ON x.v = y.v AND x.g < y.g),
         |sz AS (SELECT g, CAST(SUM(nv) AS BIGINT) AS ng
         |  FROM per GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(CAST(ng AS DECIMAL(38,0)) * ng) AS DECIMAL(38,0))
         |      AS sg2,
         |    CAST(SUM(CAST(ng AS DECIMAL(38,0)) * ng * (ng * 2 + 3))
         |      AS DECIMAL(38,0)) AS sg23 FROM sz),
         |f AS (SELECT * FROM jj, mm)
         |SELECT CAST(j2 AS VARCHAR) AS j2, k, n,
         |  CAST(sg2 AS VARCHAR) AS sg2, CAST(sg23 AS VARCHAR) AS sg23,
         |  ${graft.operators.Profiling.jtZSql} AS z,
         |  abs(${graft.operators.Profiling.jtZSql}) > 1.959964
         |    AS significant
         |FROM f""".stripMargin,
    "q_gof_dow" ->
      s"""WITH e AS (SELECT event_type,
         |    (epoch_ms(ts) // 86400000) % 7 AS dow FROM events),
         |cells AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM e GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT dow) AS BIGINT) AS k
         |  FROM cells),
         |tot AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
         |  FROM cells GROUP BY 1),
         |d AS (SELECT c.event_type, k, n,
         |    CAST(o AS DECIMAL(38,0)) * k - n AS dev
         |  FROM cells c JOIN tot USING (event_type), kk),
         |a AS (SELECT event_type, k, n,
         |    CAST(COUNT(*) AS BIGINT) AS k_obs,
         |    CAST(SUM(dev * dev) AS DECIMAL(38,0)) AS sdev2
         |  FROM d GROUP BY 1, 2, 3)
         |SELECT event_type, k, n, k_obs,
         |  CAST(sdev2 AS VARCHAR) AS sdev2,
         |  ${graft.operators.Profiling.gofChi2Sql} AS chi2,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS chi2_crit,
         |  ${graft.operators.Profiling.gofChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_shift_function" ->
      """WITH users AS (SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
        |      AS spend,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) >= 15 AS heavy
        |  FROM events GROUP BY 1),
        |qa AS (SELECT quantile_cont(spend,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM users WHERE heavy),
        |qb AS (SELECT quantile_cont(spend,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM users WHERE NOT heavy),
        |ea AS (SELECT generate_subscripts(q, 1) AS i, unnest(q) AS v
        |  FROM qa),
        |eb AS (SELECT generate_subscripts(q, 1) AS i, unnest(q) AS v
        |  FROM qb)
        |SELECT CAST(ea.i * 10 AS BIGINT) AS decile,
        |  round(ea.v, 6) AS q_a, round(eb.v, 6) AS q_b,
        |  round(ea.v - eb.v, 6) AS shift
        |FROM ea JOIN eb ON ea.i = eb.i""".stripMargin,
    "q_bowker" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |u AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN day % 2 = 0 THEN cents ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN day % 2 = 1 THEN cents ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM e GROUP BY 1),
         |t AS (SELECT
         |    CASE WHEN x >= 180000 THEN 'h' WHEN x >= 150000 THEN 'm'
         |      ELSE 'l' END AS i,
         |    CASE WHEN y >= 180000 THEN 'h' WHEN y >= 150000 THEN 'm'
         |      ELSE 'l' END AS j
         |  FROM u),
         |cells AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM t
         |  WHERE i <> j GROUP BY 1, 2),
         |pairs AS (SELECT least(i, j) AS lo, greatest(i, j) AS hi,
         |    CAST(SUM(CASE WHEN i < j THEN n ELSE 0 END) AS BIGINT)
         |      AS nij,
         |    CAST(SUM(CASE WHEN i > j THEN n ELSE 0 END) AS BIGINT)
         |      AS nji
         |  FROM cells GROUP BY 1, 2),
         |w AS (SELECT ${graft.operators.Profiling.bowkerTermMicroSql}
         |    AS term_micro FROM pairs),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(term_micro) AS BIGINT) AS chi2_micro FROM w)
         |SELECT m, chi2_micro,
         |  ${graft.operators.Profiling.bowkerChi2Sql} AS chi2,
         |  m AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("m")} AS chi2_crit,
         |  ${graft.operators.Profiling.bowkerChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("m")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_risk_diff" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 15 AS heavy
         |  FROM events GROUP BY 1),
         |x AS (SELECT
         |    CAST(SUM(CASE WHEN clicker AND heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN clicker AND NOT heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN NOT clicker AND heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN NOT clicker AND NOT heavy THEN 1 ELSE 0
         |      END) AS BIGINT) AS d
         |  FROM users)
         |SELECT a, b, c, d,
         |  ${graft.operators.Profiling.rdSql} AS risk_diff,
         |  ${graft.operators.Profiling.rdCiSql("-")} AS rd_lo,
         |  ${graft.operators.Profiling.rdCiSql("+")} AS rd_hi,
         |  ${graft.operators.Profiling.rdZSql} AS z,
         |  ${graft.operators.Profiling.nntSql} AS nnt
         |FROM x""".stripMargin,
    "q_woolf" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 15 AS heavy
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT CASE WHEN spend >= 360000 THEN 'high'
         |      WHEN spend >= 300000 THEN 'mid' ELSE 'low' END AS s,
         |    clicker AS e0, heavy AS o0 FROM users),
         |st AS (SELECT s,
         |    CAST(SUM(CASE WHEN e0 AND o0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(SUM(CASE WHEN e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN NOT e0 AND o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN NOT e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM u2 GROUP BY 1),
         |ok0 AS (SELECT *,
         |    (a > 0 AND b > 0 AND c > 0 AND d > 0) AS ok FROM st),
         |t AS (SELECT ok,
         |    ${graft.operators.Profiling.woolfWMicroSql} AS w_micro,
         |    ${graft.operators.Profiling.woolfWlMicroSql} AS wl_micro,
         |    ${graft.operators.Profiling.woolfWl2MicroSql} AS wl2_micro
         |  FROM ok0),
         |agg AS (SELECT
         |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
         |      AS k_used,
         |    CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
         |      AS k_dropped,
         |    CAST(SUM(w_micro) AS BIGINT) AS sw_micro,
         |    CAST(SUM(wl_micro) AS BIGINT) AS swl_micro,
         |    CAST(SUM(wl2_micro) AS BIGINT) AS swl2_micro
         |  FROM t)
         |SELECT k_used, k_dropped, sw_micro, swl_micro, swl2_micro,
         |  ${graft.operators.Profiling.woolfChi2Sql} AS chi2,
         |  CAST(greatest(k_used - 1, 0) AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k_used - 1")}
         |    AS chi2_crit,
         |  ${graft.operators.Profiling.woolfChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k_used - 1")}
         |    AS significant
         |FROM agg""".stripMargin,
    "q_cronbach_alpha" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |it AS (SELECT k, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(v) AS BIGINT) AS s,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
         |      AS sq
         |  FROM comp GROUP BY 1, 2),
         |iv AS (SELECT k, n,
         |    ${graft.operators.Profiling.cronbachItemVarMilliSql}
         |      AS var_milli FROM it),
         |ia AS (SELECT k, CAST(MAX(n) AS BIGINT) AS n_units,
         |    CAST(SUM(var_milli) AS BIGINT) AS sum_var_milli
         |  FROM iv GROUP BY 1),
         |tt AS (SELECT user_id, CAST(SUM(v) AS BIGINT) AS t FROM comp
         |  GROUP BY 1),
         |ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
         |    CAST(SUM(t) AS BIGINT) AS st,
         |    CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0))
         |      AS stq FROM tt),
         |f AS (SELECT * FROM ia, ta)
         |SELECT k, n_units, sum_var_milli,
         |  ${graft.operators.Profiling.cronbachAlphaSql} AS alpha
         |FROM f""".stripMargin,
    "q_hodges_lehmann" ->
      """WITH users AS (SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |pairs AS (SELECT a.cents - b.cents AS d
        |  FROM (SELECT cents FROM users WHERE user_id % 2 = 0) a
        |  CROSS JOIN (SELECT cents FROM users WHERE user_id % 2 = 1) b),
        |per AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM pairs GROUP BY 1),
        |c AS (SELECT d, SUM(nd) OVER (ORDER BY d
        |    ROWS UNBOUNDED PRECEDING) AS cum_nd FROM per),
        |tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS np FROM per),
        |lo AS (SELECT MIN(d) AS d_lo FROM c, tot
        |  WHERE cum_nd >= (np + 1) // 2),
        |hi AS (SELECT MIN(d) AS d_hi FROM c, tot
        |  WHERE cum_nd >= (np + 2) // 2)
        |SELECT np AS n_pairs, CAST(d_lo + d_hi AS BIGINT) AS hl_x2,
        |  round(CAST(d_lo + d_hi AS DOUBLE) / 2, 6) AS hl
        |FROM lo, hi, tot""".stripMargin,
    "q_dist_distance" ->
      s"""WITH u AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS __ca,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |      AS __cb
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |ext AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM u),
         |bins AS (SELECT CASE WHEN hi > lo THEN
         |      least(CAST(9 AS BIGINT), (v - lo) * 10 // (hi - lo))
         |    ELSE CAST(0 AS BIGINT) END AS bin,
         |    CAST(SUM(__ca) AS BIGINT) AS ca,
         |    CAST(SUM(__cb) AS BIGINT) AS cb
         |  FROM u, ext GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         |    CAST(SUM(cb) AS BIGINT) AS n_b FROM bins),
         |t AS (SELECT bin, ca, cb, n_a, n_b,
         |    ${graft.operators.Profiling.ddTvNanoSql} AS tv_nano,
         |    ${graft.operators.Profiling.ddBcNanoSql} AS bc_nano,
         |    ${graft.operators.Profiling.ddOvNanoSql} AS ov_nano
         |  FROM bins, tot),
         |f AS (SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_bins,
         |    CAST(SUM(tv_nano) AS BIGINT) AS tv_sum,
         |    CAST(SUM(bc_nano) AS BIGINT) AS bc_sum,
         |    CAST(SUM(ov_nano) AS BIGINT) AS ov_sum
         |  FROM t GROUP BY 1, 2)
         |SELECT n_a, n_b, n_bins,
         |  round(CAST(tv_sum AS DOUBLE) / 1000000000 / 2, 6)
         |    AS total_variation,
         |  round(CAST(bc_sum AS DOUBLE) / 1000000000, 6)
         |    AS bhattacharyya_coef,
         |  CASE WHEN bc_sum > 0 THEN
         |    round(-LN(CAST(bc_sum AS DOUBLE) / 1000000000), 6) END
         |    AS bhattacharyya_dist,
         |  round(sqrt(greatest(CAST(0 AS DOUBLE),
         |    1 - CAST(bc_sum AS DOUBLE) / 1000000000)), 6) AS hellinger,
         |  round(CAST(ov_sum AS DOUBLE) / 1000000000, 6)
         |    AS overlap_coef
         |FROM f""".stripMargin,
    "q_fleiss_kappa" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_view
         |  FROM events GROUP BY 1),
         |lng AS (
         |  SELECT user_id, 'r_spend' AS rater,
         |      CASE WHEN spend >= 360000 THEN 3 WHEN spend >= 330000
         |        THEN 2 WHEN spend >= 300000 THEN 1 ELSE 0 END AS cat
         |    FROM users
         |  UNION ALL SELECT user_id, 'r_click',
         |      CASE WHEN n_click >= 25 THEN 3 WHEN n_click >= 20 THEN 2
         |        WHEN n_click >= 15 THEN 1 ELSE 0 END FROM users
         |  UNION ALL SELECT user_id, 'r_view',
         |      CASE WHEN n_view >= 25 THEN 3 WHEN n_view >= 20 THEN 2
         |        WHEN n_view >= 15 THEN 1 ELSE 0 END FROM users),
         |nr AS (SELECT CAST(COUNT(DISTINCT rater) AS BIGINT) AS n_raters
         |  FROM lng),
         |comp AS (SELECT lng.user_id, CAST(lng.cat AS VARCHAR) AS cat,
         |    n_raters FROM lng, nr
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = n_raters),
         |cells AS (SELECT n_raters, user_id, cat,
         |    CAST(COUNT(*) AS BIGINT) AS nic FROM comp GROUP BY 1, 2, 3),
         |pi AS (SELECT n_raters,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items,
         |    CAST(SUM(CAST(nic AS DECIMAL(38,0)) * nic) AS DECIMAL(38,0))
         |      AS s_nic2
         |  FROM cells GROUP BY 1),
         |pc AS (SELECT CAST(SUM(CAST(colsum AS DECIMAL(38,0)) * colsum)
         |      AS DECIMAL(38,0)) AS s_col2
         |  FROM (SELECT cat, CAST(SUM(nic) AS BIGINT) AS colsum
         |    FROM cells GROUP BY 1)),
         |f AS (SELECT * FROM pi, pc)
         |SELECT n_raters, n_items,
         |  ${graft.operators.Profiling.fleissKappaSql} AS kappa,
         |  CAST(s_nic2 AS VARCHAR) AS s_nic2,
         |  CAST(s_col2 AS VARCHAR) AS s_col2
         |FROM f""".stripMargin,
    "q_binomial_test" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |z AS (SELECT event_type, n, x,
         |    ${graft.operators.Profiling.binomialZSql("1", "2")} AS z
         |  FROM g)
         |SELECT event_type, n, x, z,
         |  round(${graft.operators.Profiling.normalPSql("z")}, 6)
         |    AS p_normal,
         |  abs(z) > 1.959964 AS significant
         |FROM z""".stripMargin,
    "q_poisson_rates" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN day(ts) <= 7 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |z AS (SELECT event_type, n, x,
         |    round(CAST(x AS DOUBLE) / 7, 6) AS rate_a,
         |    round(CAST(n - x AS DOUBLE) / 24, 6) AS rate_b,
         |    ${graft.operators.Profiling.binomialZSql("7", "31")} AS z
         |  FROM g)
         |SELECT event_type, n, x, rate_a, rate_b, z,
         |  round(${graft.operators.Profiling.normalPSql("z")}, 6)
         |    AS p_normal,
         |  abs(z) > 1.959964 AS significant
         |FROM z""".stripMargin,
    "q_t_closeness" ->
      s"""WITH base AS (SELECT c_mktsegment,
         |    CAST(c_nationkey AS BIGINT) AS c_nationkey,
         |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS v FROM customer),
         |cells AS (SELECT c_mktsegment, c_nationkey, v,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2, 3),
         |grp AS (SELECT c_mktsegment, c_nationkey,
         |    CAST(SUM(c) AS BIGINT) AS n_cell FROM cells GROUP BY 1, 2),
         |gv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cg
         |  FROM base GROUP BY 1),
         |gv2 AS (SELECT v,
         |    CAST(SUM(cg) OVER (ORDER BY v) AS BIGINT) AS cum_g,
         |    CAST(SUM(cg) OVER () AS BIGINT) AS n_tot,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS m_vals
         |  FROM gv),
         |grid AS (SELECT g.c_mktsegment, g.c_nationkey, g.n_cell, z.v,
         |    z.cum_g, z.n_tot, z.m_vals, COALESCE(cells.c, 0) AS c
         |  FROM grp g CROSS JOIN gv2 z
         |  LEFT JOIN cells ON cells.c_mktsegment = g.c_mktsegment
         |    AND cells.c_nationkey = g.c_nationkey AND cells.v = z.v),
         |cum AS (SELECT *, CAST(SUM(c) OVER (PARTITION BY c_mktsegment,
         |      c_nationkey ORDER BY v) AS BIGINT) AS cum_c FROM grid),
         |agg AS (SELECT c_mktsegment, c_nationkey, n_cell, n_tot, m_vals,
         |    CAST(SUM(ABS(cum_c * n_tot - cum_g * n_cell)) AS BIGINT)
         |      AS s_num
         |  FROM cum GROUP BY 1, 2, 3, 4, 5)
         |SELECT c_mktsegment, c_nationkey, n_cell, s_num,
         |  ${graft.operators.Profiling.tCloseEmdSql} AS emd,
         |  coalesce(${graft.operators.Profiling.tCloseEmdSql} <= 0.2, true)
         |    AS t_close
         |FROM agg""".stripMargin,
    "q_ks_test" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events
         |  WHERE event_type IN ('purchase', 'click')),
         |u AS (SELECT v,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS ca,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
         |      END) AS BIGINT) AS cb
         |  FROM e GROUP BY 1),
         |c AS (SELECT v, ca, cb,
         |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
         |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb,
         |    CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
         |    CAST(SUM(cb) OVER () AS BIGINT) AS n_b
         |  FROM u),
         |g AS (SELECT *, ABS(cum_ca * n_b - cum_cb * n_a) AS gap
         |  FROM c),
         |m AS (SELECT CAST(MAX(gap) AS BIGINT) AS d_num FROM g)
         |SELECT n_a, n_b, d_num, CAST(MIN(v) AS BIGINT) AS d_at,
         |  ${graft.operators.Profiling.ksDSql} AS d,
         |  ${graft.operators.Profiling.ksSigSql} AS significant
         |FROM g, m WHERE gap = d_num GROUP BY 1, 2, 3""".stripMargin,
    "q_enrichment" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) >= 8000 AS hi
         |  FROM events),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
         |    CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT)
         |      AS k_tot FROM e),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM e GROUP BY 1),
         |j AS (SELECT * FROM g, tot)
         |SELECT event_type, n, k, n_tot, k_tot,
         |  round(CAST(n AS DOUBLE) * k_tot / n_tot, 6) AS expected,
         |  ${graft.operators.Profiling.enrichRatioSql} AS ratio,
         |  ${graft.operators.Profiling.enrichZSql} AS z,
         |  round(${graft.operators.Profiling.normalPSql(
            graft.operators.Profiling.enrichZSql)}, 6) AS p_normal,
         |  coalesce(abs(${graft.operators.Profiling.enrichZSql})
         |    > 1.959964, false) AS significant
         |FROM j""".stripMargin,
    "q_tukey_fences" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM per),
         |qa AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS q1
         |  FROM c WHERE cum >= (n + 3) // 4 GROUP BY 1),
         |qb AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS q3
         |  FROM c WHERE cum >= (3 * n + 3) // 4 GROUP BY 1),
         |f AS (SELECT qa.event_type, q1, q3,
         |    4 * q1 - 6 * (q3 - q1) AS lo4,
         |    4 * q3 + 6 * (q3 - q1) AS hi4
         |  FROM qa JOIN qb USING (event_type))
         |SELECT c.event_type, CAST(MAX(n) AS BIGINT) AS n, q1, q3,
         |  q3 - q1 AS iqr,
         |  round(CAST(lo4 AS DOUBLE) / 4, 6) AS fence_lo,
         |  round(CAST(hi4 AS DOUBLE) / 4, 6) AS fence_hi,
         |  CAST(SUM(CASE WHEN 4 * v < lo4 THEN cnt ELSE 0 END)
         |    AS BIGINT) AS n_low,
         |  CAST(SUM(CASE WHEN 4 * v > hi4 THEN cnt ELSE 0 END)
         |    AS BIGINT) AS n_high
         |FROM c JOIN f USING (event_type)
         |GROUP BY 1, 3, 4, 5, 6, 7""".stripMargin,
    "q_equidepth_hist" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM per)
         |SELECT event_type, (cum * 8 + n - 1) // n AS bucket,
         |  CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi,
         |  CAST(SUM(cnt) AS BIGINT) AS cnt,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct
         |FROM c GROUP BY 1, 2""".stripMargin,
    "q_by_fdr" ->
      s"""WITH pu AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN day(ts) < 16 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(SUM(CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2 FROM events GROUP BY 1),
         |zt AS (SELECT user_id, n1, n2,
         |    round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)
         |      AS z FROM pu),
         |pt AS (SELECT *, round(${graft.operators.Profiling.normalPSql("z")}, 6)
         |    AS p FROM zt),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p, user_id)
         |      AS BIGINT) AS p_rank,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS m_tests FROM pt),
         |r2 AS (SELECT *, CAST(SUM(CAST(round(1000000.0 / p_rank, 0)
         |      AS BIGINT)) OVER () AS BIGINT) AS hm_micro FROM r),
         |ks AS (SELECT CAST(COALESCE(MAX(CASE WHEN p * m_tests * hm_micro
         |      <= p_rank * 100000 THEN p_rank END), 0) AS BIGINT) AS k_star
         |  FROM r2)
         |SELECT user_id, n1, n2, z, p, p_rank, m_tests, hm_micro, k_star,
         |  (p_rank <= k_star) AS rejected
         |FROM r2, ks""".stripMargin,
    "q_dp_counts" -> {
      import graft.operators.Profiling.{dpUniformSql, dpLaplaceNoiseSql}
      s"""WITH g AS (SELECT event_type, CAST(day(ts) AS BIGINT) AS dom,
         |    CAST(COUNT(*) AS BIGINT) AS n_true FROM events GROUP BY 1, 2),
         |h AS (SELECT *, CAST('0x' || substr(md5('dp:' ||
         |      CONCAT_WS('|', CAST(event_type AS VARCHAR),
         |        CAST(dom AS VARCHAR))), 1, 15) AS BIGINT)
         |    % 1073741824 AS hh FROM g),
         |u AS (SELECT *, ${dpUniformSql("hh")} AS uu FROM h)
         |SELECT event_type, dom, n_true,
         |  ${graft.operators.Profiling.dpEpsilonSql(1000000L)} AS epsilon,
         |  round(CAST(n_true AS DOUBLE) +
         |    ${dpLaplaceNoiseSql("uu", 1000000L)}, 6) AS noisy_count
         |FROM u""".stripMargin
    },
    "q_krippendorff" ->
      """WITH r AS (SELECT user_id AS u, event_type AS rater,
        |    LEAST(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
        |      AS BIGINT) // 25000, 3) AS c
        |  FROM events GROUP BY 1, 2),
        |uc AS (SELECT u, c, CAST(COUNT(*) AS BIGINT) AS nuc
        |  FROM r GROUP BY 1, 2),
        |pu AS (SELECT u, CAST(SUM(nuc) AS BIGINT) AS m,
        |    CAST(SUM(nuc * nuc) AS BIGINT) AS s2
        |  FROM uc GROUP BY 1 HAVING SUM(nuc) >= 2),
        |ua AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
        |    CAST(SUM(m) AS BIGINT) AS n_values,
        |    CAST(SUM((2520 // (m - 1)) * (m * m - s2)) AS BIGINT)
        |      AS d_o_scaled FROM pu),
        |ca AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
        |    CAST(SUM(nc * nc) AS BIGINT) AS snc2 FROM (
        |      SELECT uc.c, CAST(SUM(uc.nuc) AS BIGINT) AS nc
        |      FROM uc JOIN pu USING (u) GROUP BY 1))
        |SELECT n_units, n_values, n_categories, d_o_scaled,
        |  n_values * n_values - snc2 AS d_e_raw,
        |  round(1.0 - (CAST(d_o_scaled AS DOUBLE) *
        |    CAST(n_values - 1 AS DOUBLE)) /
        |    (2520.0 * CAST(n_values * n_values - snc2 AS DOUBLE)), 6)
        |    AS alpha
        |FROM ua, ca""".stripMargin,
    "q_fd_check" -> Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderkey", "o_orderpriority"))
      .map { case (det, dep) =>
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
           |  CAST(COUNT(*) AS BIGINT) AS n_det_values,
           |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating_det,
           |  CAST(SUM(nd - 1) AS BIGINT) AS n_extra_dep,
           |  SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $det,
           |    COUNT(DISTINCT ROW($dep IS NULL, CAST($dep AS VARCHAR)))
           |      AS nd
           |  FROM orders GROUP BY 1)""".stripMargin
      }.mkString("\nUNION ALL "),
  )
}
