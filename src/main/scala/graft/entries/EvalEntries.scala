package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Eval-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object EvalEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_auc" -> ((s, dir) => {
      // Exact ROC AUC of spend as a purchase ranker — Mann–Whitney with
      // midrank ties, integer-exact. The distinct-cents table takes the
      // ranged prefix sum (Eval.rangedCumsum); the events never sort
      // through one partition.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.auc(ev, "cents", "is_pos")
    }),
    "q_calibration_bins" -> ((s, dir) => {
      // Calibration/reliability table: does spend-decile membership track
      // purchase rate? Equal-width integer bins over the observed span
      // (one min/max broadcast + one hash aggregate).
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.calibrationBins(ev, "cents", "is_pos")
    }),
    "q_gini" -> ((s, dir) => {
      // Spend-concentration Gini per market segment (order totals in
      // cents) — a rank statistic with NO global sort: ties collapse into
      // the distinct-(segment, cents) table, which takes the ranged
      // prefix sum; numerator/denominator emitted as exact BIGINTs.
      val o = table(s, dir, "orders").join(
        table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      Eval.gini(o, "c_mktsegment", "cents")
    }),
    "q_order_stats" -> ((s, dir) => {
      // EXACT p25/p50/p75/p99 of spend in ONE pass off the prefix table
      // (tiny broadcast of position marks) — vs q_percentile's exact
      // aggregate that sorts each group through one reducer.
      val ev = table(s, dir, "events")
        .select(round(col("value") * 100, 0).cast("long").as("cents"))
      Eval.orderStatistics(ev, "cents",
        Seq((1, 4), (1, 2), (3, 4), (99, 100)))
    }),
    "q_percentile_rank" -> ((s, dir) => {
      // Rank-normalization transform: exact midrank percentile of every
      // distinct spend value per event type — distinct-value table +
      // ranged prefix sum, never a global sort.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      Eval.percentileRank(ev, "event_type", "cents")
    }),
    "q_weighted_median" -> ((s, dir) => {
      // Exact quantity-weighted lower median unit price per return flag —
      // smallest price whose cumulative weight reaches half the total
      // (2·cumw ≥ W, integer compare), same distinct-value prefix-sum
      // shape as q_gini.
      val li = table(s, dir, "lineitem").select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      Eval.weightedMedian(li, "l_returnflag", "cents", "qty")
    }),
    "q_ols2" -> ((s, dir) => {
      // Distributed regression as ONE Gram aggregate: price (whole
      // dollars) on quantity and discount-% via normal equations — nine
      // exact integer moments, closed-form Cramer solve + R², the
      // shared-SQL double arithmetic evaluated by both engines.
      val li = table(s, dir, "lineitem").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      Eval.ols2(li, "y", "x1", "x2")
    }),
    "q_conformal" -> ((s, dir) => {
      // Split-conformal 90% interval on the OLS price fit: md5-split,
      // fit half 0, exact ceil(0.9n) residual order statistic on half 1,
      // calibration coverage emitted as the in-row sanity check.
      val li = table(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      Eval.conformalOls2(li, "id", "y", "x1", "x2")
    }),
    "q_did" -> ((s, dir) =>
      // Difference-in-differences on event spend: odd users "treated",
      // period split at day 16 — four exact (sum, n) cells in one
      // aggregate, effect = shared-SQL double over the cell row.
      Eval.diffInDiff(
        table(s, dir, "events").select(
          (pmod(col("user_id"), lit(2L)) === 1L).as("treat"),
          (dayofmonth(col("ts")) >= 16).as("post"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "treat", "post", "cents")),
    "q_cuped" -> ((s, dir) => {
      // CUPED variance-reduced A/B readout: per-user pre (days 1–15) and
      // post (16–30) spend, θ from exact moments, adjusted effect +
      // ρ² (variance removed) in one shared-SQL row.
      val pu = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(dayofmonth(col("ts")) < 16,
            round(col("value") * 100, 0).cast("long"))), lit(0L)).as("pre"),
          coalesce(sum(when(dayofmonth(col("ts")) >= 16,
            round(col("value") * 100, 0).cast("long"))), lit(0L)).as("post"))
        .withColumn("treat", pmod(col("user_id"), lit(2L)) === 1L)
      Eval.cuped(pu, "treat", "pre", "post")
    }),
    "q_lorenz" -> ((s, dir) => {
      // Lorenz curve of customer order spend: cumulative population vs
      // spend share per decile in exact ppm — gini's plottable companion
      // on the same distinct-value prefix-sum kernel.
      val spend = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      Eval.lorenzCurve(spend, "cents")
    }),
    "q_decile_lift" -> ((s, dir) => {
      // Gains table for a spend-as-score targeting model against the
      // heavy-purchaser label: per-decile lift over the base rate +
      // cumulative positives captured, all exact integer micro/ppm.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
      Eval.decileLift(users, "spend", "heavy")
    }),
    "q_decision_stump" -> ((s, dir) => {
      // One exact tree-split search: every distinct spend value is a
      // candidate threshold for the heavy-purchaser label; ONE ranged
      // prefix-sum scan scores all splits by weighted Gini.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
      Eval.decisionStump(users, "spend", "heavy")
    }),
    "q_woe_iv" -> ((s, dir) => {
      // Scorecard feature report: spend deciles vs the heavy-purchaser
      // label — per-bin Weight of Evidence + Information Value
      // contributions in exact micro units on the decile kernel.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
      Eval.woeBins(users, "spend", "heavy")
    }),
    "q_retrieval_eval" -> ((s, dir) => {
      // Search/RAG eval triple per customer: parts RANKED by spend are
      // the retrieved list, graded relevance from bought quantity
      // (>=60 -> 2, >=30 -> 1); NDCG@10, reciprocal rank, AP@10 from
      // per-element micro-quantized terms — exact integer sums, one
      // double division each.
      val li = table(s, dir, "lineitem").join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").cast("long").as("cust"), col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("spend"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val ranked = li
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("cust"))
            .orderBy(col("spend").desc, col("l_partkey"))).cast("long"))
        .withColumn("rel",
          when(col("qty") >= 60L, 2L).when(col("qty") >= 30L, 1L)
            .otherwise(0L))
      Eval.retrievalMetrics(ranked, "cust", "rank", "rel", k = 10)
    }),
    "q_anova_effects" -> ((s, dir) =>
      // q_anova's F with the effect sizes reviewers actually ask for:
      // eta-squared (variance explained) and the less-biased
      // omega-squared, both off the same exact SS assembly.
      Eval.anovaF(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")
        .withColumn("eta_sq", expr(Eval.anovaEtaSqSql))
        .withColumn("omega_sq", expr(Eval.anovaOmegaSqSql))
        .select(col("g"), col("n"), col("f_stat"), col("eta_sq"),
          col("omega_sq"))),
    "q_anova" -> ((s, dir) =>
      // One-way ANOVA F across event types on per-event cents: exact
      // per-group moment longs, milli-floored between/within sums via
      // pure-BIGINT division splitting, single shared-SQL double finish.
      Eval.anovaF(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_bradley_terry" -> ((s, dir) => {
      // Arena-style preference ranking of event types: each user's
      // pairwise spend comparisons are "games" (higher spend wins, ties
      // skipped); 10 integer MM iterations on the aggregated pair table
      // give preference shares in ppb — bit-identical across engines.
      val spend = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      val games = spend.as("x").join(spend.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .filter(col("x.cents") =!= col("y.cents"))
        .select(
          when(col("x.cents") > col("y.cents"), col("x.event_type"))
            .otherwise(col("y.event_type")).as("winner"),
          when(col("x.cents") > col("y.cents"), col("y.event_type"))
            .otherwise(col("x.event_type")).as("loser"))
      Eval.bradleyTerry(games, "winner", "loser", iters = 10)
    }),
    "q_markov_stationary" -> ((s, dir) => {
      // Where does user behavior settle: empirical event-type transition
      // chain (per-user (ts, event_id)-ordered pairs), micro-quantized
      // row-stochastic P, 12 integer power-method rounds to the
      // stationary distribution in ppb — bit-identical across engines.
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_millis(ts)").as("ms"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val trans = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      Eval.markovStationary(trans, "event_type", "next_type", iters = 12)
    }),
    "q_isotonic" -> ((s, dir) => {
      // Monotone (PAV) calibration of purchase rate vs spend bins via
      // the minimax identity on the B-row bin table — the fitted curve
      // a threshold picker can actually consume.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.isotonicCalibration(ev, "cents", "is_pos")
    }),
    "q_pr_auc" -> ((s, dir) => {
      // Imbalance-honest ranking quality of the spend score for
      // purchase: average precision over descending thresholds —
      // exact rational terms on the auc prefix-sum kernel.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.prAuc(ev, "cents", "is_pos")
    }),
    "q_brier" -> ((s, dir) => {
      // Per-row calibration loss of the spend score vs purchase, plus
      // skill vs the base-rate forecast — next to q_ece's binned gap.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.brier(ev, "cents", "is_pos")
    }),
    "q_eb_shrinkage" -> ((s, dir) => {
      // Honest per-user purchase rates: Beta prior fit by method of
      // moments on the rate distribution, posterior-mean shrinkage —
      // thin keys pull toward the prior, thick keys barely move.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"),
          count(lit(1)).cast("long").as("n_events"))
      Eval.ebShrink(users, "user_id", "n_purch", "n_events")
    }),
    "q_trimmed_mean" -> ((s, dir) =>
      // Robust per-type cents location: exact 5%-trimmed mean off the
      // distinct-value prefix sum — tie blocks split exactly at cuts.
      Eval.trimmedMean(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_platt" -> ((s, dir) => {
      // Turn the spend score into a PROBABILITY of purchase: Platt
      // sigmoid fit on the standardized score, 4 fixed Newton steps
      // with micro-quantized gradient/Hessian sums; final log-loss.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.plattScale(ev, "cents", "is_pos")
    }),
    "q_youden" -> ((s, dir) => {
      // WHERE to cut the spend score for the heavy-purchase screen:
      // Youden-J argmax over the exact integer (TPR-FPR) numerator on
      // the auc prefix-sum kernel; smallest-threshold tie-break.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.youdenThreshold(ev, "cents", "is_pos")
    }),
    "q_ece" -> ((s, dir) => {
      // One-number calibration check for the spend score: expected
      // calibration error over the 10-bin reliability table,
      // micro-quantized per-bin gaps, exact weighted sum.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.ece(ev, "cents", "is_pos")
    }),
    "q_brown_forsythe" -> ((s, dir) =>
      // Homogeneity-of-variance gate for q_anova: ANOVA F on |cents −
      // group median| with medians off the prefix-sum kernel — the
      // robust Levene variant, exact integer deviations throughout.
      Eval.brownForsythe(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_atkinson" -> ((s, dir) =>
      // Welfare-weighted spend inequality per type (epsilon = 1) —
      // the log-utility companion to q_gini; exact nano ln sums.
      Eval.atkinson(
        table(s, dir, "events").groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents")),
        "event_type", "cents")),
    "q_theil_index" -> ((s, dir) =>
      // The decomposable third of the inequality trio on the same
      // per-type user-spend layout — exact milli x·ln x sums.
      Eval.theilIndex(
        table(s, dir, "events").groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents")),
        "event_type", "cents")),
    "q_rank_tau" -> ((s, dir) => {
      // Exact tau + footrule over the shared top-100 of the revenue
      // and quantity rankers — the unweighted companion to q_rbo.
      val parts = table(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("revenue"),
          sum(col("l_quantity").cast("long")).as("qty"))
      Eval.rankAgreement(parts, "l_partkey", "revenue", "qty", k = 100)
    }),
    "q_rbo" -> ((s, dir) => {
      // Do the revenue ranker and the quantity ranker surface the same
      // top parts? Truncated RBO@100, top-weighted via p=0.9 — exact
      // micro terms off one k-row cumulative.
      val parts = table(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("revenue"),
          sum(col("l_quantity").cast("long")).as("qty"))
      Eval.rboTopK(parts, "l_partkey", "revenue", "qty", k = 100)
    }),
    "q_spiegelhalter" -> ((s, dir) => {
      // Unbinned calibration z of the spend score vs purchase — the
      // bin-free companion to q_ece/q_brier on the same conf mapping.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.spiegelhalterZ(ev, "cents", "is_pos")
    }),
    "q_hosmer_lemeshow" -> ((s, dir) => {
      // The classical binned calibration chi2 (10 fixed-width bins,
      // degenerate bins dropped AND reported) on the brier conf map.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.hosmerLemeshow(ev, "cents", "is_pos")
    }),
    "q_breusch_pagan" -> ((s, dir) =>
      // Does price-residual variance grow with quantity? (It must:
      // extendedprice ~ qty x unit price, so the spread fans out.)
      // LM = n.R^2 of squared OLS residuals regressed back on qty.
      graft.operators.Eval.breuschPagan(
        table(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            round(col("l_extendedprice") * 100, 0).cast("long").as("p")),
        "q", "p")),
    "q_cooks_distance" -> ((s, dir) =>
      // WHICH parts bend the retail-price ~ size fit: top-20 by
      // Cook's D — the rows a pricing audit deletes and refits.
      graft.operators.Eval.cooksDistance(
        table(s, dir, "part")
          .select(col("p_partkey"), col("p_size").cast("long").as("sz"),
            round(col("p_retailprice") * 100, 0).cast("long").as("rc")),
        "p_partkey", "sz", "rc", topK = 20)),
    "q_power_proportion" -> ((s, dir) => {
      // Experiment design for BINARY metrics: per user-cohort, the
      // per-arm n to detect a 2pp conversion lift and the MDE now.
      // "Converted" = 12+ purchase events — the any-purchase predicate
      // saturates to p = 1.0 at every SF (all-NULL guarded outputs;
      // the r11 degenerate sweep's find), this threshold is interior
      // (~0.55-0.8) at sf0.01 and sf0.1 both.
      val users = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
        .select(pmod(col("user_id"), lit(4L)).as("cohort"),
          (col("np") >= 12L).as("converted"))
      Eval.powerProportion(users, "cohort", "converted",
        deltaPpm = 20000L)
    }),
    "q_qini" -> ((s, dir) => {
      // Qini uplift deciles: users ranked by total spend, synthetic
      // treatment = even user_id, conversion = 12+ purchases (the
      // interior predicate — any-purchase saturates to 100% at every
      // SF, the q_power_proportion lesson); q per decile + the Qini
      // coefficient vs the random diagonal.
      val u = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .select(col("user_id"), col("spend"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("treated"),
          (col("np") >= 12L).as("converted"))
      Eval.qiniDeciles(u, "spend", "treated", "converted", "user_id")
    }),
    "q_auc_ci" -> ((s, dir) => {
      // q_auc's point estimate with the DeLong confidence interval:
      // exact integer placement values off the same distinct-score
      // prefix frame, variance from their exact moments.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.aucDeLongCi(ev, "cents", "is_pos")
    }),
    "q_power_analysis" -> ((s, dir) => {
      // Experiment design: per event type, the per-arm n needed to
      // detect a $50 lift in user-day spend at alpha=.05 / 80% power,
      // and the minimum detectable effect at the current n.
      val ud = table(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      Eval.powerAnalysis(ud, "event_type", "cents", delta = 5000L)
    }),
    "q_hhi" -> ((s, dir) =>
      // How concentrated is spend within each event type across users?
      // Herfindahl index + dominant share — the mix-concentration twin
      // of q_gini's inequality curve.
      graft.operators.Eval.hhi(
        table(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "user_id", "cents")),
    "q_ridge_path" -> ((s, dir) => {
      // Ridge path over the q_ols2 regression (price on quantity and
      // discount-%): one Gram aggregate, five lambdas fanned over the
      // moment row, closed-form Cramer solve per lambda. lambda = 0
      // reproduces q_ols2's coefficients (spec-pinned).
      val li = table(s, dir, "lineitem").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      graft.operators.Eval.ridge2Path(li, "y", "x1", "x2",
        Seq(0L, 1000000L, 10000000L, 100000000L, 1000000000L))
    }),
    "q_target_encode" -> ((s, dir) => {
      // Leave-one-out smoothed target encoding of order priority
      // against a "returned order" label (any R lineitem) — the
      // leakage-safe categorical feature derivation (one category-keyed
      // window + a 1-row global prior).
      val lab = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(max((col("l_returnflag") === "R").cast("int")).as("ret"))
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .join(lab, Seq("o_orderkey"))
      graft.operators.Eval.targetEncodeLoo(o, "o_orderpriority", "ret",
        Seq("o_orderkey"), m = 10L)
    }),
    "q_logistic_irls" -> ((s, dir) => {
      // Logistic regression of order fulfillment on price ($k) and
      // priority digit — fixed-count IRLS, one coefficient row per
      // iteration, the exact-moment ols2Solve machinery per round.
      // Label probed interior (33% F at both SFs).
      val o = table(s, dir, "orders").select(
        (col("o_orderstatus") === "F").cast("int").as("y"),
        round(col("o_totalprice") / 1000, 0).cast("long").as("x1"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("x2"))
      graft.operators.Eval.logisticIrls2(o, "y", "x1", "x2", iters = 4)
    }),
    "q_ipw_ate" -> ((s, dir) => {
      // Hajek IPW average treatment effect of high order priority on
      // order value: logistic propensity on (lineitem count,
      // custkey-bucket), clipped [0.01, 0.99], milli-quantized
      // reweighted sums; the naive mean difference rides along so the
      // output shows what the reweighting moved.
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.ipwAte(o, "t", "yo", "x1", "x2", iters = 4)
    }),
    "q_doubly_robust" -> ((s, dir) => {
      // AIPW on the q_ipw_ate design: logistic propensity + per-arm
      // OLS outcome models, milli-quantized influence sums — the
      // doubly-robust completion of the causal trio (naive/IPW/AIPW).
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.aipwAte(o, "t", "yo", "x1", "x2", iters = 4)
    }),
    "q_cem_att" -> ((s, dir) => {
      // Coarsened-exact-matching ATT on the same causal design —
      // exact (x1, x2) strata, both-arm cells only, treated-weighted
      // mean differences; reports the unmatched-treated overlap
      // diagnostic.
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.cemAtt(o, "t", "yo", "x1", "x2")
    }),
    "q_simpson_check" -> ((s, dir) => {
      // Simpson's-paradox audit on the causal design: does the
      // aggregate high-priority price difference reverse inside the
      // lineitem-count strata? Exact cross-multiplied sign tests, no
      // division anywhere near the verdict.
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.simpsonCheck(o, "t", "yo", "x1")
    }),
    "q_boosted_stumps" -> ((s, dir) => {
      // Gradient-boosted depth-1 trees (L2 loss, lr 1/2, 3 rounds) on
      // price vs quantity/discount: exact milli residuals, threshold
      // scans over distinct-value prefix sums, 1-row argmax broadcast
      // per round — the model rows pin the whole boosting trajectory.
      val li = table(s, dir, "lineitem").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      graft.operators.Eval.boostedStumps(li, "y", Seq("x1", "x2"),
        rounds = 3)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_isotonic" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM e),
        |b AS (SELECT CAST((s - lo) * 10 // (hi - lo + 1) AS BIGINT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    round(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS frac_pos
        |  FROM e, mm GROUP BY 1),
        |cum AS (SELECT bin, CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp FROM b),
        |ks AS (SELECT bin AS k, cn AS cnk, cp AS cpk FROM cum),
        |pairs AS (
        |  SELECT k, CAST(0 AS BIGINT) AS j, cnk AS nn, cpk AS np FROM ks
        |  UNION ALL
        |  SELECT k, jm.bin + 1 AS j, cnk - jm.cn AS nn, cpk - jm.cp AS np
        |  FROM ks JOIN cum jm ON jm.bin < k),
        |pm AS (SELECT k, j, CAST(np AS DOUBLE) / nn AS mean_jk
        |  FROM pairs WHERE nn > 0),
        |im AS (SELECT i.bin AS i, pm.j, MIN(mean_jk) AS inner_min
        |  FROM b i JOIN pm ON pm.j <= i.bin AND i.bin <= pm.k
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, round(MAX(inner_min), 6) AS fitted
        |  FROM im GROUP BY 1)
        |SELECT b.bin, b.n, b.n_pos, b.frac_pos, fit.fitted
        |FROM b JOIN fit ON fit.i = b.bin""".stripMargin,
    "q_pr_auc" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
         |  FROM events),
         |per AS (SELECT v, CAST(SUM(p) AS BIGINT) AS cp,
         |    CAST(SUM(1 - p) AS BIGINT) AS cn FROM e GROUP BY 1),
         |c AS (SELECT v, cp, cn,
         |    CAST(SUM(cp) OVER (ORDER BY v) AS BIGINT) AS cum_cp,
         |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn
         |  FROM per),
         |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per),
         |d AS (SELECT cp, n_pos, n_neg,
         |    n_pos - cum_cp + cp AS dp, n_neg - cum_cn + cn AS dn
         |  FROM c, t),
         |w AS (SELECT n_pos, n_neg,
         |    ${graft.operators.Eval.prAucTermMicroSql} AS term_micro
         |  FROM d),
         |a AS (SELECT n_pos, n_neg,
         |    CAST(SUM(term_micro) AS BIGINT) AS ap_micro
         |  FROM w GROUP BY 1, 2)
         |SELECT n_pos, n_neg, ap_micro,
         |  CASE WHEN n_pos > 0 THEN
         |    round(CAST(ap_micro AS DOUBLE) / 1000000, 6) END AS pr_auc
         |FROM a""".stripMargin,
    "q_brier" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mm AS (SELECT MIN(__s) AS lo, MAX(__s) AS hi FROM e),
         |t AS (SELECT lo, hi, y,
         |    ${graft.operators.Eval.brierTermMicroSql} AS term_micro
         |  FROM e, mm),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(y) AS BIGINT) AS n_pos,
         |    CAST(SUM(term_micro) AS BIGINT) AS brier_micro FROM t)
         |SELECT n, n_pos, brier_micro,
         |  round(CAST(brier_micro AS DOUBLE) / n / 1000000, 6) AS brier,
         |  ${graft.operators.Eval.brierSkillSql} AS brier_skill
         |FROM a""".stripMargin,
    "q_eb_shrinkage" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(COUNT(*) AS BIGINT) AS nt
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT * FROM u WHERE nt > 0),
         |q AS (SELECT user_id, x, nt,
         |    CAST(ROUND(CAST(x AS DOUBLE) / nt * 1000000, 0) AS BIGINT)
         |      AS p_micro,
         |    CAST(ROUND((CAST(x AS DOUBLE) / nt) * (CAST(x AS DOUBLE) / nt)
         |      * 1000000000, 0) AS BIGINT) AS p2_nano
         |  FROM u2),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk,
         |    CAST(SUM(p_micro) AS BIGINT) AS sp_micro,
         |    CAST(SUM(p2_nano) AS BIGINT) AS sp2_nano FROM q),
         |w AS (SELECT u2.user_id, u2.x, u2.nt,
         |    ${graft.operators.Eval.ebAlphaSql} AS alpha_raw,
         |    ${graft.operators.Eval.ebBetaSql} AS beta_raw
         |  FROM u2, m)
         |SELECT user_id, x, nt AS n,
         |  round(CAST(x AS DOUBLE) / nt, 6) AS raw_rate,
         |  round(alpha_raw, 6) AS alpha, round(beta_raw, 6) AS beta,
         |  ${graft.operators.Eval.ebShrunkSql} AS shrunk_rate
         |FROM w""".stripMargin,
    "q_trimmed_mean" ->
      """WITH e AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY event_type ORDER BY v)
        |      AS BIGINT) AS cum_nv FROM per),
        |t AS (SELECT event_type, CAST(SUM(nv) AS BIGINT) AS n
        |  FROM per GROUP BY 1),
        |w AS (SELECT c.event_type, v, nv, cum_nv, n, n * 5 // 100 AS k
        |  FROM c JOIN t USING (event_type)),
        |inc AS (SELECT event_type, v, n, k,
        |    GREATEST(CAST(0 AS BIGINT),
        |      LEAST(cum_nv, n - k) - GREATEST(cum_nv - nv, k))
        |      AS included
        |  FROM w),
        |a AS (SELECT event_type, n, k,
        |    CAST(SUM(v * included) AS BIGINT) AS s_kept,
        |    CAST(SUM(included) AS BIGINT) AS n_kept
        |  FROM inc WHERE included > 0 GROUP BY 1, 2, 3)
        |SELECT event_type, n, k, s_kept, n_kept,
        |  round(CAST(s_kept AS DOUBLE) / n_kept, 6) AS trimmed_mean
        |FROM a""".stripMargin,
    "q_platt" -> {
      import graft.operators.Eval.{plattTermSql, plattStepASql, plattStepBSql, plattZSql, plattSdSql}
      val steps = (1 to 4).map { i =>
        s"""m$i AS (SELECT a, b,
           |    CAST(SUM(${plattTermSql("(p - y) * z")}) AS BIGINT) AS g1m,
           |    CAST(SUM(${plattTermSql("(p - y)")}) AS BIGINT) AS g0m,
           |    CAST(SUM(${plattTermSql("p * (1 - p) * z * z")}) AS BIGINT)
           |      AS h11m,
           |    CAST(SUM(${plattTermSql("p * (1 - p) * z")}) AS BIGINT)
           |      AS h01m,
           |    CAST(SUM(${plattTermSql("p * (1 - p)")}) AS BIGINT) AS h00m
           |  FROM z CROSS JOIN it${i - 1} GROUP BY a, b),
           |it$i AS (SELECT $plattStepASql AS a, $plattStepBSql AS b
           |  FROM m$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS __y
         |  FROM events),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__s) AS BIGINT) AS ss,
         |    CAST(SUM(__s*__s) AS BIGINT) AS ssq FROM e),
         |z0 AS (SELECT $plattZSql AS z, __y AS y FROM e, mm),
         |z AS MATERIALIZED (SELECT z, y FROM z0 WHERE z IS NOT NULL),
         |it0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b),
         |$steps,
         |ll AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_fit,
         |    CAST(SUM(${plattTermSql(
                "-(y * LN(p) + (1 - y) * LN(1 - p))")}) AS BIGINT)
         |      AS ll_micro
         |  FROM z CROSS JOIN it4 GROUP BY a, b)
         |SELECT n, round(CAST(ss AS DOUBLE) / n, 6) AS mean_s,
         |  round($plattSdSql, 6) AS sd_s, round(a, 6) AS a,
         |  round(b, 6) AS b,
         |  round(CAST(ll_micro AS DOUBLE) / n_fit / 1000000, 6) AS logloss
         |FROM ll, mm""".stripMargin
    },
    "q_youden" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
         |  FROM events),
         |per AS (SELECT v, CAST(SUM(p) AS BIGINT) AS cp,
         |    CAST(SUM(1 - p) AS BIGINT) AS cn FROM e GROUP BY 1),
         |c AS (SELECT v,
         |    CAST(SUM(cp) OVER (ORDER BY v) AS BIGINT) AS cum_cp,
         |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn
         |  FROM per),
         |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per),
         |j AS (SELECT v, n_pos, n_neg, cum_cp, cum_cn,
         |    (n_pos - cum_cp) * n_neg - (n_neg - cum_cn) * n_pos AS j_num
         |  FROM c, t),
         |sel AS (SELECT *, ROW_NUMBER() OVER (ORDER BY j_num DESC, v ASC)
         |    AS rn FROM j),
         |f AS (SELECT n_pos, n_neg, v AS threshold,
         |    CAST(j_num AS BIGINT) AS j_num, cum_cp, cum_cn
         |  FROM sel WHERE rn = 1)
         |SELECT n_pos, n_neg, threshold, j_num, cum_cp, cum_cn,
         |  CASE WHEN n_pos > 0 THEN
         |    round(CAST(n_pos - cum_cp AS DOUBLE) / n_pos, 6) END AS tpr,
         |  CASE WHEN n_neg > 0 THEN
         |    round(CAST(n_neg - cum_cn AS DOUBLE) / n_neg, 6) END AS fpr,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    round(CAST(j_num AS DOUBLE) /
         |      (CAST(n_pos AS DOUBLE) * n_neg), 6) END AS j
         |FROM f""".stripMargin,
    "q_ece" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
         |  FROM events),
         |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM e),
         |b AS (SELECT CAST((s - lo) * 10 // (hi - lo + 1) AS BIGINT)
         |      AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT)
         |      AS n_pos,
         |    CAST(SUM(s) AS BIGINT) AS sum_score
         |  FROM e, mm GROUP BY 1),
         |w AS (SELECT b.*, lo, hi FROM b, mm),
         |t AS (SELECT lo, hi, n,
         |    ${graft.operators.Eval.eceTermMicroSql} AS term_micro FROM w),
         |a AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         |    CAST(COUNT(*) AS BIGINT) AS n_bins,
         |    CAST(SUM(term_micro) AS BIGINT) AS ece_micro FROM t)
         |SELECT n_total, n_bins, ece_micro,
         |  round(CAST(ece_micro AS DOUBLE) / n_total / 1000000, 6) AS ece
         |FROM a""".stripMargin,
    "q_auc" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos FROM events),
        |per AS (SELECT v, CAST(SUM(pos) AS BIGINT) AS cp,
        |    CAST(SUM(1 - pos) AS BIGINT) AS cn FROM e GROUP BY v),
        |c AS (SELECT v, cp, cn,
        |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn FROM per),
        |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per)
        |SELECT n_pos, n_neg,
        |  CAST(SUM(cp * (2*(cum_cn - cn) + cn)) AS BIGINT) AS num,
        |  CAST(2 * n_pos * n_neg AS BIGINT) AS den,
        |  round(CAST(SUM(cp * (2*(cum_cn - cn) + cn)) AS DOUBLE)
        |    / (2.0 * n_pos * n_neg), 6) AS auc
        |FROM c, tot GROUP BY n_pos, n_neg""".stripMargin,
    "q_calibration_bins" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos FROM events),
        |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM e)
        |SELECT CAST((s - lo) * 10 // (hi - lo + 1) AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(s) AS BIGINT) AS sum_score,
        |  round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_score,
        |  round(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS frac_pos
        |FROM e, mm GROUP BY 1""".stripMargin,
    "q_gini" ->
      """WITH o AS (SELECT c_mktsegment AS seg,
        |    CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS nv FROM o GROUP BY 1, 2),
        |c AS (SELECT seg, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY seg ORDER BY v) AS BIGINT) AS cum FROM per),
        |g AS (SELECT seg, CAST(SUM(nv) AS BIGINT) AS n,
        |    CAST(SUM(v * nv) AS BIGINT) AS sum_val,
        |    CAST(SUM(v * nv * (2*(cum - nv) + nv + 1)) AS BIGINT) AS twice
        |  FROM c GROUP BY seg)
        |SELECT seg AS c_mktsegment, n, sum_val,
        |  CAST(twice - (n + 1) * sum_val AS BIGINT) AS num,
        |  CAST(n * sum_val AS BIGINT) AS den,
        |  round(CAST(twice - (n + 1) * sum_val AS DOUBLE) / (n * sum_val), 6) AS gini
        |FROM g""".stripMargin,
    "q_order_stats" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv FROM e GROUP BY v),
        |c AS (SELECT v, nv, CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum FROM per),
        |t AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM per),
        |fr AS (SELECT CAST(f_num AS BIGINT) AS f_num, CAST(f_den AS BIGINT) AS f_den
        |  FROM (VALUES (1, 4), (1, 2), (3, 4), (99, 100)) AS f(f_num, f_den)),
        |m AS (SELECT f_num, f_den, n,
        |    greatest((f_num * n + f_den - 1) // f_den, 1) AS pos FROM fr, t)
        |SELECT f_num, f_den, n, CAST(pos AS BIGINT) AS pos, v AS value
        |FROM c, m WHERE cum >= pos AND cum - nv < pos""".stripMargin,
    "q_percentile_rank" ->
      """WITH e AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum
        |  FROM per),
        |t AS (SELECT event_type, CAST(SUM(nv) AS BIGINT) AS n FROM per GROUP BY 1)
        |SELECT c.event_type, v, nv, n,
        |  round(CAST(2*cum - nv + 1 AS DOUBLE) / (2*n), 6) AS pct_rank
        |FROM c JOIN t ON c.event_type = t.event_type""".stripMargin,
    "q_weighted_median" ->
      """WITH li AS (SELECT l_returnflag AS g,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |per AS (SELECT g, v, CAST(SUM(q) AS BIGINT) AS w FROM li GROUP BY 1, 2),
        |c AS (SELECT g, v, w,
        |    CAST(SUM(w) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cw FROM per),
        |tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS w_total FROM per GROUP BY g)
        |SELECT c.g AS l_returnflag, tot.w_total, CAST(MIN(v) AS BIGINT) AS w_median
        |FROM c JOIN tot ON c.g = tot.g
        |WHERE 2 * cw >= w_total GROUP BY c.g, tot.w_total""".stripMargin,
    "q_ols2" -> {
      val solve = graft.operators.Eval.ols2Solve
        .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n  ")
      s"""WITH li AS (SELECT CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y,
         |    CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2 FROM lineitem),
         |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |    CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |    CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |    CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |    CAST(SUM(x2*y) AS BIGINT) AS s2y,
         |    CAST(SUM(y*y) AS BIGINT) AS syy FROM li)
         |SELECT n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
         |  $solve
         |FROM sums""".stripMargin
    },
    "q_conformal" -> {
      val solve = graft.operators.Eval.ols2Solve.toMap
      s"""WITH li AS (SELECT l_orderkey * 10 + l_linenumber AS id,
         |    CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y,
         |    CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2 FROM lineitem),
         |tagged AS MATERIALIZED (SELECT *, CAST('0x' ||
         |    substr(md5('cf:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 2
         |    AS half FROM li),
         |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |    CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |    CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |    CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |    CAST(SUM(x2*y) AS BIGINT) AS s2y,
         |    CAST(SUM(y*y) AS BIGINT) AS syy
         |  FROM tagged WHERE half = 0),
         |fit AS MATERIALIZED (SELECT n AS n_train, ${solve("b0")} AS b0,
         |    ${solve("b1")} AS b1, ${solve("b2")} AS b2 FROM sums),
         |resid AS MATERIALIZED (SELECT n_train, CAST(ROUND(abs(
         |      CAST(y AS DOUBLE) - (b0 + b1 * CAST(x1 AS DOUBLE) +
         |        b2 * CAST(x2 AS DOUBLE))) * 1000000.0, 0) AS BIGINT) AS r
         |  FROM tagged, fit WHERE half = 1),
         |per AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nv FROM resid GROUP BY r),
         |c AS (SELECT r, nv,
         |    CAST(SUM(nv) OVER (ORDER BY r) AS BIGINT) AS cum FROM per),
         |t AS (SELECT CAST(SUM(nv) AS BIGINT) AS n_calib FROM per),
         |m AS (SELECT n_calib,
         |    greatest((9 * n_calib + 9) // 10, 1) AS pos FROM t),
         |q AS (SELECT n_calib, CAST(pos AS BIGINT) AS pos, r AS q90_micro
         |  FROM c, m WHERE cum >= pos AND cum - nv < pos),
         |cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_covered
         |  FROM resid, q WHERE resid.r <= q.q90_micro)
         |SELECT f.n_train, q.n_calib, q.pos, q.q90_micro, cov.n_covered,
         |  round(CAST(cov.n_covered AS DOUBLE) / q.n_calib, 6) AS coverage
         |FROM fit f, q, cov""".stripMargin
    },
    "q_did" ->
      s"""WITH e AS (SELECT (user_id % 2 = 1) AS treat,
         |    (day(ts) >= 16) AS post,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |cells AS (SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS s FROM e GROUP BY 1, 2),
         |w AS (SELECT
         |    max(CASE WHEN treat AND post THEN s END) AS s_t1,
         |    max(CASE WHEN treat AND post THEN n END) AS n_t1,
         |    max(CASE WHEN treat AND NOT post THEN s END) AS s_t0,
         |    max(CASE WHEN treat AND NOT post THEN n END) AS n_t0,
         |    max(CASE WHEN NOT treat AND post THEN s END) AS s_c1,
         |    max(CASE WHEN NOT treat AND post THEN n END) AS n_c1,
         |    max(CASE WHEN NOT treat AND NOT post THEN s END) AS s_c0,
         |    max(CASE WHEN NOT treat AND NOT post THEN n END) AS n_c0
         |  FROM cells)
         |SELECT s_t1, n_t1, s_t0, n_t0, s_c1, n_c1, s_c0, n_c0,
         |  ${graft.operators.Eval.didSql} AS dd_effect FROM w""".stripMargin,
    "q_cuped" -> {
      val (th, rho) = (graft.operators.Eval.cupedThetaSql,
        graft.operators.Eval.cupedRho2Sql)
      s"""WITH pu AS (SELECT user_id,
         |    CAST(COALESCE(SUM(CASE WHEN day(ts) < 16
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) END), 0) AS BIGINT)
         |      AS pre,
         |    CAST(COALESCE(SUM(CASE WHEN day(ts) >= 16
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) END), 0) AS BIGINT)
         |      AS post,
         |    (user_id % 2 = 1) AS treat
         |  FROM events GROUP BY user_id),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(pre) AS BIGINT) AS sx, CAST(SUM(post) AS BIGINT) AS sy,
         |    CAST(SUM(pre*pre) AS BIGINT) AS sxx,
         |    CAST(SUM(post*post) AS BIGINT) AS syy,
         |    CAST(SUM(pre*post) AS BIGINT) AS sxy FROM pu),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         |    CAST(SUM(CASE WHEN treat THEN post END) AS BIGINT) AS sy_t,
         |    CAST(SUM(CASE WHEN treat THEN pre END) AS BIGINT) AS sx_t,
         |    CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         |    CAST(SUM(CASE WHEN NOT treat THEN post END) AS BIGINT) AS sy_c,
         |    CAST(SUM(CASE WHEN NOT treat THEN pre END) AS BIGINT) AS sx_c
         |  FROM pu)
         |SELECT n, sx, sy, sxx, syy, sxy, n_t, sy_t, sx_t, n_c, sy_c, sx_c,
         |  round($th, 6) AS theta, $rho AS rho2,
         |  round(CAST(sy_t AS DOUBLE)/n_t - CAST(sy_c AS DOUBLE)/n_c, 6)
         |    AS raw_diff,
         |  round((CAST(sy_t AS DOUBLE)/n_t - CAST(sy_c AS DOUBLE)/n_c) -
         |    $th * (CAST(sx_t AS DOUBLE)/n_t - CAST(sx_c AS DOUBLE)/n_c), 6)
         |    AS adj_diff
         |FROM g, a""".stripMargin
    },
    "q_lorenz" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |per AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS nu,
        |    CAST(SUM(cents) AS BIGINT) AS sv FROM spend GROUP BY 1),
        |c AS (SELECT v, nu, sv,
        |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
        |    CAST(SUM(sv) OVER (ORDER BY v) AS BIGINT) AS cum_sv FROM per),
        |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_users,
        |    CAST(SUM(sv) AS BIGINT) AS total_spend FROM per),
        |dec AS (SELECT ((cum_nu - 1) * 10) // n_users AS decile,
        |    CAST(SUM(nu) AS BIGINT) AS n_users_in,
        |    MAX(cum_nu) AS cum_users, MAX(cum_sv) AS cum_spend
        |  FROM c, tot GROUP BY 1)
        |SELECT decile, n_users_in,
        |  (cum_users * 1000000) // n_users AS cum_user_ppm,
        |  (cum_spend * 1000000) // total_spend AS cum_spend_ppm
        |FROM dec, tot""".stripMargin,
    "q_decile_lift" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |per AS (SELECT -spend AS v, CAST(COUNT(*) AS BIGINT) AS nu,
         |    CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, nu, np,
         |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
         |    CAST(SUM(np) OVER (ORDER BY v) AS BIGINT) AS cum_np FROM per),
         |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_units,
         |    CAST(SUM(np) AS BIGINT) AS n_pos_total FROM per),
         |dec AS (SELECT ((cum_nu - 1) * 10) // n_units AS decile,
         |    n_units, n_pos_total,
         |    CAST(SUM(nu) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos,
         |    MAX(cum_np) AS cum_pos
         |  FROM c, tot GROUP BY 1, 2, 3)
         |SELECT decile, n, n_pos, ${graft.operators.Eval.liftSql}
         |    AS lift_micro,
         |  (cum_pos * 1000000) // n_pos_total AS cum_gain_ppm
         |FROM dec""".stripMargin,
    "q_decision_stump" -> {
      val (split, parent) = (graft.operators.Eval.giniSplitSql,
        graft.operators.Eval.giniParentSql)
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nu,
         |    CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, nu, np,
         |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
         |    CAST(SUM(np) OVER (ORDER BY v) AS BIGINT) AS cum_np FROM per),
         |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_total,
         |    CAST(SUM(np) AS BIGINT) AS p_total FROM per),
         |sc AS (SELECT *, $split AS gini_split_micro
         |  FROM c, tot WHERE cum_nu < n_total),
         |b AS (SELECT * FROM sc ORDER BY gini_split_micro, v LIMIT 1)
         |SELECT v AS split_value, cum_nu AS n_left, cum_np AS pos_left,
         |  n_total - cum_nu AS n_right, p_total - cum_np AS pos_right,
         |  n_total, p_total, $parent AS gini_parent_micro, gini_split_micro,
         |  $parent - gini_split_micro AS gain_micro
         |FROM b""".stripMargin
    },
    "q_woe_iv" -> {
      val (woe, iv) = (graft.operators.Eval.woeSql, graft.operators.Eval.ivSql)
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nu,
         |    CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, nu, np,
         |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
         |    CAST(SUM(np) OVER (ORDER BY v) AS BIGINT) AS cum_np FROM per),
         |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_units,
         |    CAST(SUM(np) AS BIGINT) AS p_total FROM per),
         |dec AS (SELECT ((cum_nu - 1) * 10) // n_units AS decile,
         |    n_units, p_total,
         |    CAST(SUM(nu) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS pos
         |  FROM c, tot GROUP BY 1, 2, 3),
         |f AS (SELECT decile, n_units, p_total, n, pos, n - pos AS neg
         |  FROM dec)
         |SELECT decile, n, pos, neg, $woe AS woe_micro, $iv AS iv_micro
         |FROM f""".stripMargin
    },
    "q_retrieval_eval" ->
      s"""WITH li AS (SELECT CAST(o.o_custkey AS BIGINT) AS cust, l.l_partkey,
         |    CAST(SUM(CAST(ROUND(l.l_extendedprice*100, 0) AS BIGINT))
         |      AS BIGINT) AS spend,
         |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2),
         |rk AS (SELECT cust, spend,
         |    CASE WHEN qty >= 60 THEN 2 WHEN qty >= 30 THEN 1 ELSE 0 END
         |      AS rel,
         |    CAST(row_number() OVER (PARTITION BY cust
         |      ORDER BY spend DESC, l_partkey) AS BIGINT) AS r
         |  FROM li),
         |h AS (SELECT cust, r, rel,
         |    CAST(row_number() OVER (PARTITION BY cust ORDER BY rel DESC, r)
         |      AS BIGINT) AS ideal_r,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY cust ORDER BY r ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS hits_at_r
         |  FROM rk),
         |agg AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS n_cand,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rel,
         |    CAST(SUM(CASE WHEN r <= 10 THEN CAST(round(
         |      rel*1000000.0/log2(r+1), 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS dcg_micro,
         |    CAST(SUM(CASE WHEN ideal_r <= 10 THEN CAST(round(
         |      rel*1000000.0/log2(ideal_r+1), 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS idcg_micro,
         |    CAST(MAX(CASE WHEN rel > 0 THEN CAST(round(1000000.0/r, 0)
         |      AS BIGINT) END) AS BIGINT) AS rr_micro,
         |    CAST(SUM(CASE WHEN rel > 0 AND r <= 10 THEN CAST(round(
         |      hits_at_r*1000000.0/r, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS ap_sum_micro
         |  FROM h GROUP BY 1)
         |SELECT cust, n_cand, n_rel, dcg_micro, idcg_micro, rr_micro,
         |  ap_sum_micro, ${graft.operators.Eval.ndcgSql} AS ndcg,
         |  ${graft.operators.Eval.apSql(10)} AS ap
         |FROM agg""".stripMargin,
    "q_anova" ->
      s"""WITH per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT) *
         |      CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS ssg
         |  FROM events GROUP BY 1),
         |t AS (SELECT ng, sg, ssg,
         |    CAST(${graft.operators.Eval.sqOverNWhole("sg", "ng", "//")}
         |      AS BIGINT) AS tg_whole,
         |    CAST(${graft.operators.Eval.sqOverNFracMilli("sg", "ng", "//")}
         |      AS BIGINT) AS tg_frac FROM per),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
         |    CAST(SUM(ssg) AS BIGINT) AS ss,
         |    CAST(SUM(tg_whole) AS BIGINT) AS t_whole,
         |    CAST(SUM(tg_frac) AS BIGINT) AS t_frac FROM t)
         |SELECT g, n, s, ss, t_whole, t_frac,
         |  ${graft.operators.Eval.anovaSsbSql("//")} AS ssb,
         |  ${graft.operators.Eval.anovaSswSql} AS ssw,
         |  ${graft.operators.Eval.anovaFSql("//")} AS f_stat
         |FROM agg""".stripMargin,
    "q_anova_effects" ->
      s"""WITH per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT) *
         |      CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS ssg
         |  FROM events GROUP BY 1),
         |t AS (SELECT ng, sg, ssg,
         |    CAST(${graft.operators.Eval.sqOverNWhole("sg", "ng", "//")}
         |      AS BIGINT) AS tg_whole,
         |    CAST(${graft.operators.Eval.sqOverNFracMilli("sg", "ng", "//")}
         |      AS BIGINT) AS tg_frac FROM per),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
         |    CAST(SUM(ssg) AS BIGINT) AS ss,
         |    CAST(SUM(tg_whole) AS BIGINT) AS t_whole,
         |    CAST(SUM(tg_frac) AS BIGINT) AS t_frac FROM t),
         |f AS (SELECT g, n,
         |    ${graft.operators.Eval.anovaSsbSql("//")} AS ssb,
         |    ${graft.operators.Eval.anovaSswSql} AS ssw,
         |    ${graft.operators.Eval.anovaFSql("//")} AS f_stat
         |  FROM agg)
         |SELECT g, n, f_stat,
         |  ${graft.operators.Eval.anovaEtaSqSql} AS eta_sq,
         |  ${graft.operators.Eval.anovaOmegaSqSql} AS omega_sq
         |FROM f""".stripMargin,
    "q_bradley_terry" -> {
      val iterCtes = (1 to 10).map { i =>
        val p = s"t${i - 1}"
        s"""d$i AS MATERIALIZED (SELECT item, CAST(SUM(term) AS BIGINT) AS d
           |  FROM (SELECT np.a AS item,
           |      n_games * 1000000000000 // (ta.theta + tb.theta) AS term
           |    FROM np JOIN $p ta ON np.a = ta.item
           |      JOIN $p tb ON np.b = tb.item
           |    UNION ALL
           |    SELECT np.b AS item,
           |      n_games * 1000000000000 // (ta.theta + tb.theta) AS term
           |    FROM np JOIN $p ta ON np.a = ta.item
           |      JOIN $p tb ON np.b = tb.item) z GROUP BY 1),
           |r$i AS (SELECT items.item, items.n_wins,
           |    CASE WHEN d > 0 THEN n_wins * 1000000000000 // d ELSE 0 END
           |      AS raw
           |  FROM items JOIN d$i USING (item)),
           |tt$i AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM r$i),
           |t$i AS MATERIALIZED (SELECT item,
           |    CAST(CASE WHEN t > 0 THEN greatest(raw * 1000000000 // t, 1)
           |      ELSE 1 END AS BIGINT) AS theta
           |  FROM r$i, tt$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH sp AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |g AS (SELECT
         |    CASE WHEN x.cents > y.cents THEN x.event_type
         |      ELSE y.event_type END AS w,
         |    CASE WHEN x.cents > y.cents THEN y.event_type
         |      ELSE x.event_type END AS l
         |  FROM sp x JOIN sp y ON x.user_id = y.user_id
         |    AND x.event_type < y.event_type
         |  WHERE x.cents <> y.cents),
         |np AS MATERIALIZED (SELECT least(w, l) AS a, greatest(w, l) AS b,
         |    CAST(COUNT(*) AS BIGINT) AS n_games FROM g GROUP BY 1, 2),
         |wi AS (SELECT w AS item, CAST(COUNT(*) AS BIGINT) AS n_wins
         |  FROM g GROUP BY 1),
         |items AS MATERIALIZED (SELECT u.item,
         |    CAST(COALESCE(wi.n_wins, 0) AS BIGINT) AS n_wins
         |  FROM (SELECT a AS item FROM np UNION SELECT b FROM np) u
         |  LEFT JOIN wi USING (item)),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM items),
         |t0 AS MATERIALIZED (SELECT item,
         |    CAST(1000000000 // k AS BIGINT) AS theta FROM items, kk),
         |$iterCtes
         |SELECT items.item, items.n_wins, theta AS bt_share_ppb
         |FROM items JOIN t10 USING (item)""".stripMargin
    },
    "q_markov_stationary" -> {
      val iterCtes = (1 to 12).map { i =>
        val p = s"t${i - 1}"
        s"""f$i AS MATERIALIZED (SELECT pp.dst AS state,
           |    CAST(SUM(x.x * p_micro // 1000000) AS BIGINT) AS inflow
           |  FROM pp JOIN $p x ON pp.src = x.state GROUP BY 1),
           |s$i AS (SELECT st.state,
           |    (CASE WHEN outs.state IS NULL THEN x.x ELSE 0 END) +
           |      COALESCE(f.inflow, 0) AS raw
           |  FROM states st JOIN $p x USING (state)
           |  LEFT JOIN outs USING (state) LEFT JOIN f$i f USING (state)),
           |tt$i AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM s$i),
           |t$i AS MATERIALIZED (SELECT state,
           |    CAST(CASE WHEN t > 0 THEN raw * 1000000000 // t ELSE 0 END
           |      AS BIGINT) AS x
           |  FROM s$i, tt$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
         |    event_id FROM events),
         |tr AS (SELECT event_type AS src,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ms, event_id) AS dst
         |  FROM ev),
         |pairs AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
         |outtot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_out
         |  FROM pairs GROUP BY 1),
         |pp AS MATERIALIZED (SELECT pairs.src, pairs.dst,
         |    CAST(n * 1000000 // n_out AS BIGINT) AS p_micro
         |  FROM pairs JOIN outtot USING (src)),
         |states AS MATERIALIZED (SELECT src AS state FROM pp
         |  UNION SELECT dst FROM pp),
         |outs AS MATERIALIZED (SELECT DISTINCT src AS state FROM pp),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
         |t0 AS MATERIALIZED (SELECT state,
         |    CAST(1000000000 // k AS BIGINT) AS x FROM states, kk),
         |$iterCtes
         |SELECT states.state, t12.x AS stationary_ppb
         |FROM states JOIN t12 USING (state)""".stripMargin
    },
    "q_brown_forsythe" ->
      s"""WITH u AS (SELECT event_type AS g,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM u GROUP BY 1, 2),
         |c AS (SELECT g, v, w, CAST(SUM(w) OVER (PARTITION BY g
         |    ORDER BY v) AS BIGINT) AS cum_w FROM per),
         |tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS w_total
         |  FROM per GROUP BY 1),
         |med AS (SELECT c.g, MIN(v) AS med FROM c JOIN tot USING (g)
         |  WHERE 2*cum_w >= w_total GROUP BY 1),
         |dev AS (SELECT u.g, abs(u.v - med.med) AS z
         |  FROM u JOIN med USING (g)),
         |perg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(z) AS BIGINT) AS sg,
         |    CAST(SUM(z*z) AS BIGINT) AS ssg FROM dev GROUP BY 1),
         |t AS (SELECT ng, sg, ssg,
         |    CAST(${graft.operators.Eval.sqOverNWhole("sg", "ng", "//")}
         |      AS BIGINT) AS tg_whole,
         |    CAST(${graft.operators.Eval.sqOverNFracMilli("sg", "ng", "//")}
         |      AS BIGINT) AS tg_frac FROM perg),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
         |    CAST(SUM(ssg) AS BIGINT) AS ss,
         |    CAST(SUM(tg_whole) AS BIGINT) AS t_whole,
         |    CAST(SUM(tg_frac) AS BIGINT) AS t_frac FROM t)
         |SELECT g, n, s, ss, t_whole, t_frac,
         |  ${graft.operators.Eval.anovaSsbSql("//")} AS ssb,
         |  ${graft.operators.Eval.anovaSswSql} AS ssw,
         |  ${graft.operators.Eval.anovaFSql("//")} AS f_stat
         |FROM agg""".stripMargin,
    "q_atkinson" ->
      s"""WITH u AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(ROUND(LN(CAST(cents AS DOUBLE)) * 1000000000,
         |      0) AS BIGINT)) AS BIGINT) AS sln_nano
         |  FROM u WHERE cents > 0 GROUP BY 1)
         |SELECT event_type, n, sx, sln_nano,
         |  ${graft.operators.Eval.atkinsonSql} AS atkinson
         |FROM a""".stripMargin,
    "q_theil_index" ->
      s"""WITH u AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(ROUND(cents * LN(CAST(cents AS DOUBLE)) *
         |      1000, 0) AS BIGINT)) AS BIGINT) AS sxlx_milli
         |  FROM u WHERE cents > 0 GROUP BY 1)
         |SELECT event_type, n, sx, sxlx_milli,
         |  ${graft.operators.Eval.theilSql} AS theil
         |FROM a""".stripMargin,
    "q_rank_tau" ->
      s"""WITH parts AS (SELECT l_partkey,
         |    CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))
         |      AS BIGINT) AS revenue,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem GROUP BY 1),
         |ta AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey)
         |      AS BIGINT) AS ra
         |  FROM parts QUALIFY ra <= 100),
         |tb AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey)
         |      AS BIGINT) AS rb
         |  FROM parts QUALIFY rb <= 100),
         |sh AS (SELECT id, ra, rb FROM ta JOIN tb USING (id)),
         |pr AS (SELECT
         |    CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_con,
         |    CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
         |  FROM sh x JOIN sh y ON x.id < y.id),
         |ft AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(ABS(ra - rb)) AS BIGINT) AS footrule FROM sh),
         |f AS (SELECT CAST(100 AS BIGINT) AS k, m, n_con, n_dis,
         |    footrule FROM pr, ft)
         |SELECT k, m, n_con, n_dis, footrule,
         |  ${graft.operators.Eval.rankTauSql} AS tau
         |FROM f""".stripMargin,
    "q_rbo" ->
      s"""WITH parts AS (SELECT l_partkey,
         |    CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))
         |      AS BIGINT) AS revenue,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem GROUP BY 1),
         |ta AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey)
         |      AS BIGINT) AS ra
         |  FROM parts QUALIFY ra <= 100),
         |tb AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey)
         |      AS BIGINT) AS rb
         |  FROM parts QUALIFY rb <= 100),
         |j AS (SELECT greatest(ra, rb) AS maxr FROM ta JOIN tb USING (id)),
         |cnt AS (SELECT maxr, CAST(COUNT(*) AS BIGINT) AS c FROM j
         |  GROUP BY 1),
         |spine AS (SELECT CAST(gs.generate_series AS BIGINT) AS d
         |  FROM generate_series(1, 100) gs),
         |cum AS (SELECT d, CAST(SUM(COALESCE(c, 0)) OVER (ORDER BY d)
         |      AS BIGINT) AS agree
         |  FROM spine LEFT JOIN cnt ON cnt.maxr = spine.d),
         |t AS (SELECT d, agree,
         |    ${graft.operators.Eval.rboTermMicroSql} AS term_micro
         |  FROM cum),
         |a AS (SELECT CAST(MAX(d) AS BIGINT) AS k,
         |    CAST(MAX(agree) AS BIGINT) AS n_both,
         |    CAST(SUM(term_micro) AS BIGINT) AS rbo_micro FROM t)
         |SELECT k, n_both, rbo_micro,
         |  ${graft.operators.Eval.rboSql} AS rbo
         |FROM a""".stripMargin,
    "q_spiegelhalter" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mm AS (SELECT MIN(__s) AS lo, MAX(__s) AS hi FROM e),
         |t AS (SELECT
         |    ${graft.operators.Eval.spiegelNumMicroSql} AS num_micro,
         |    ${graft.operators.Eval.spiegelDenMicroSql} AS den_micro
         |  FROM e, mm),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(num_micro) AS BIGINT) AS snum_micro,
         |    CAST(SUM(den_micro) AS BIGINT) AS sden_micro FROM t)
         |SELECT n, snum_micro, sden_micro,
         |  ${graft.operators.Eval.spiegelZSql} AS z,
         |  abs(${graft.operators.Eval.spiegelZSql}) > 1.959964
         |    AS significant
         |FROM a""".stripMargin,
    "q_hosmer_lemeshow" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mm AS (SELECT MIN(__s) AS lo, MAX(__s) AS hi FROM e),
         |b AS (SELECT y,
         |    CASE WHEN hi > lo THEN least(CAST(9 AS BIGINT),
         |      (__s - lo) * 10 // (hi - lo)) ELSE CAST(0 AS BIGINT) END
         |      AS bin,
         |    CAST(ROUND((CASE WHEN hi > lo THEN
         |      CAST(__s - lo AS DOUBLE) / (hi - lo) ELSE
         |      CAST(0 AS DOUBLE) END) * 1000000, 0) AS BIGINT) AS e_micro
         |  FROM e, mm),
         |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(y) AS BIGINT) AS o1,
         |    CAST(SUM(e_micro) AS BIGINT) AS e1_micro
         |  FROM b GROUP BY 1),
         |t AS (SELECT nb, e1_micro,
         |    (e1_micro > 0 AND e1_micro < nb * 1000000) AS usable,
         |    ${graft.operators.Eval.hlTermMicroSql} AS term_micro
         |  FROM g),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS BIGINT)
         |      AS bins_used,
         |    CAST(SUM(CASE WHEN usable THEN 0 ELSE 1 END) AS BIGINT)
         |      AS bins_dropped,
         |    CAST(SUM(CASE WHEN usable THEN term_micro ELSE 0 END)
         |      AS BIGINT) AS hl_micro
         |  FROM t)
         |SELECT bins_used, bins_dropped, hl_micro,
         |  ${graft.operators.Eval.hlChi2Sql} AS hl_chi2,
         |  CAST(greatest(bins_used - 2, 0) AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("bins_used - 2")}
         |    AS chi2_crit,
         |  ${graft.operators.Eval.hlChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("bins_used - 2")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_breusch_pagan" ->
      s"""WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS __x,
         |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS __y
         |  FROM lineitem),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__x) AS BIGINT) AS sx,
         |    CAST(SUM(__y) AS BIGINT) AS sy,
         |    CAST(SUM(__x*__x) AS BIGINT) AS sxx,
         |    CAST(SUM(__x*__y) AS BIGINT) AS sxy
         |  FROM pts),
         |r AS (SELECT __x, n, sx, sxx,
         |    ${graft.operators.Eval.bpResid2Sql} AS g FROM pts, mm),
         |a AS (SELECT n, sx, sxx,
         |    CAST(SUM(g) AS DECIMAL(38,0)) AS sg,
         |    CAST(SUM(CAST(g AS DECIMAL(38,0)) * __x) AS DECIMAL(38,0))
         |      AS sgx,
         |    CAST(SUM(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0))
         |      AS sgg
         |  FROM r GROUP BY 1, 2, 3)
         |SELECT n, ${graft.operators.Eval.bpLmSql} AS lm,
         |  ${graft.operators.Eval.bpLmSql} > 3.841459 AS significant
         |FROM a""".stripMargin,
    "q_cooks_distance" ->
      s"""WITH pts AS (SELECT p_partkey AS id,
         |    CAST(p_size AS BIGINT) AS __x,
         |    CAST(ROUND(p_retailprice*100, 0) AS BIGINT) AS __y
         |  FROM part),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__x) AS BIGINT) AS sx,
         |    CAST(SUM(__y) AS BIGINT) AS sy,
         |    CAST(SUM(__x*__x) AS BIGINT) AS sxx,
         |    CAST(SUM(__x*__y) AS BIGINT) AS sxy,
         |    CAST(SUM(CAST(__y*__y AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS syy
         |  FROM pts),
         |d AS (SELECT id, __x, __y,
         |    ${graft.operators.Eval.cooksDSql} AS d FROM pts, mm),
         |top AS (SELECT * FROM d WHERE d IS NOT NULL
         |  ORDER BY d DESC, id LIMIT 20)
         |SELECT CAST(row_number() OVER (ORDER BY d DESC, id) AS BIGINT)
         |    AS rnk, id, __x AS x, __y AS y, d
         |FROM top""".stripMargin,
    "q_power_proportion" ->
      s"""WITH u AS (SELECT user_id % 4 AS cohort,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 12
         |      AS converted
         |  FROM events GROUP BY user_id),
         |g AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
         |      AS x
         |  FROM u GROUP BY 1)
         |SELECT cohort, n, x, round(CAST(x AS DOUBLE) / n, 6) AS p,
         |  ${graft.operators.Eval.powerPropNReqSql(20000L)} AS n_required,
         |  ${graft.operators.Eval.powerPropMdeSql} AS mde
         |FROM g""".stripMargin,
    "q_qini" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS cv
         |  FROM events GROUP BY 1),
         |r AS (SELECT user_id, spend, user_id % 2 = 0 AS treated,
         |    cv >= 12 AS converted,
         |    CAST(row_number() OVER (ORDER BY spend DESC, user_id)
         |      AS BIGINT) AS rk,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM u),
         |c AS (SELECT (rk * 10 + n - 1) // n AS decile, rk,
         |    CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END)
         |      OVER pw AS BIGINT) AS c_t,
         |    CAST(SUM(CASE WHEN treated AND converted THEN 1 ELSE 0 END)
         |      OVER pw AS BIGINT) AS c_ct,
         |    CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
         |      OVER pw AS BIGINT) AS c_c,
         |    CAST(SUM(CASE WHEN NOT treated AND converted THEN 1
         |      ELSE 0 END) OVER pw AS BIGINT) AS c_cc
         |  FROM r WINDOW pw AS (ORDER BY rk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |d AS (SELECT decile, CAST(MAX(rk) AS BIGINT) AS depth,
         |    CAST(MAX(c_t) AS BIGINT) AS n_t,
         |    CAST(MAX(c_ct) AS BIGINT) AS conv_t,
         |    CAST(MAX(c_c) AS BIGINT) AS n_c,
         |    CAST(MAX(c_cc) AS BIGINT) AS conv_c
         |  FROM c GROUP BY 1),
         |qd AS (SELECT *, ${graft.operators.Eval.qiniQMicroSql}
         |    AS q_micro FROM d),
         |tr AS (SELECT *, CAST(q_micro +
         |      lag(q_micro, 1, 0) OVER (ORDER BY decile)
         |    AS BIGINT) AS __trap
         |  FROM qd)
         |SELECT decile, depth, n_t, conv_t, n_c, conv_c,
         |  CASE WHEN q_micro IS NOT NULL THEN
         |    round(q_micro / 1e6, 6) END AS q,
         |  ${graft.operators.Eval.qiniCoefSql(10)} AS qini_coef
         |FROM tr""".stripMargin,
    "q_auc_ci" ->
      s"""WITH per AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cp,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
         |      AS BIGINT) AS cn
         |  FROM events GROUP BY 1),
         |c AS (SELECT *,
         |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn,
         |    CAST(SUM(cp) OVER (ORDER BY v) AS BIGINT) AS cum_cp
         |  FROM per),
         |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per),
         |t AS (SELECT c.*, n_pos, n_neg,
         |    2*(cum_cn - cn) + cn AS vpos,
         |    2*(n_pos - cum_cp) + cp AS wneg
         |  FROM c, tot),
         |g AS (SELECT n_pos, n_neg,
         |    CAST(SUM(cp * vpos) AS BIGINT) AS sv,
         |    CAST(SUM(CAST(cp AS DECIMAL(38,0)) * vpos * vpos)
         |      AS DECIMAL(38,0)) AS svv,
         |    CAST(SUM(cn * wneg) AS BIGINT) AS sw,
         |    CAST(SUM(CAST(cn AS DECIMAL(38,0)) * wneg * wneg)
         |      AS DECIMAL(38,0)) AS sww
         |  FROM t GROUP BY 1, 2),
         |a AS (SELECT n_pos, n_neg, sv, sw,
         |    ${graft.operators.Eval.aucPointSql} AS auc,
         |    ${graft.operators.Eval.aucSeSql} AS se FROM g)
         |SELECT n_pos, n_neg, sv, sw, auc, se,
         |  round(auc - 1.959964 * se, 6) AS ci_lo,
         |  round(auc + 1.959964 * se, 6) AS ci_hi
         |FROM a""".stripMargin,
    "q_power_analysis" ->
      s"""WITH ud AS (SELECT event_type, user_id,
         |    epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2, 3),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
         |      AS DECIMAL(38,0)) AS sxx
         |  FROM ud GROUP BY 1)
         |SELECT event_type, n,
         |  ${graft.operators.Eval.powerVarSql} AS variance,
         |  ${graft.operators.Eval.powerNReqSql(5000L)} AS n_required,
         |  ${graft.operators.Eval.powerMdeSql} AS mde
         |FROM g""".stripMargin,
    "q_hhi" -> hhiOracleSql,
    "q_boosted_stumps" -> boostedStumpsOracle,
    "q_simpson_check" ->
      s"""WITH nli AS (SELECT l_orderkey AS o_orderkey,
         |    CAST(COUNT(*) AS BIGINT) AS x1 FROM lineitem GROUP BY 1),
         |base AS (SELECT
         |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
         |      THEN 1 ELSE 0 END AS t,
         |    CAST(ROUND(o_totalprice, 0) AS BIGINT) AS yo, x1
         |  FROM orders o JOIN nli USING (o_orderkey)),
         |cells AS (SELECT x1 AS g, CAST(SUM(t) AS BIGINT) AS nt,
         |    CAST(SUM(1 - t) AS BIGINT) AS nc,
         |    CAST(SUM(t * yo) AS BIGINT) AS syt,
         |    CAST(SUM((1 - t) * yo) AS BIGINT) AS syc
         |  FROM base GROUP BY 1),
         |a AS (SELECT CAST(SUM(nt) AS BIGINT) AS snt,
         |    CAST(SUM(nc) AS BIGINT) AS snc,
         |    CAST(SUM(syt) AS BIGINT) AS ssyt,
         |    CAST(SUM(syc) AS BIGINT) AS ssyc,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_both,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0
         |      THEN CAST(sign(syt * nc - syc * nt) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS sign_sum,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0
         |        AND syt * nc - syc * nt = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_tied
         |  FROM cells),
         |b AS (SELECT a.*,
         |    CAST(sign(ssyt * snc - ssyc * snt) AS BIGINT) AS overall_sign
         |  FROM a),
         |c AS (SELECT b.*,
         |    ${graft.operators.Eval.simpsonOppositeSql} AS n_opposite
         |  FROM b)
         |SELECT round(CAST(ssyt AS DOUBLE) / snt -
         |    CAST(ssyc AS DOUBLE) / snc, 6) AS diff_overall,
         |  n_both AS n_strata,
         |  n_both - n_tied - n_opposite AS n_agreeing,
         |  n_opposite, n_tied,
         |  overall_sign <> 0 AND n_opposite = n_both AND n_both > 0
         |    AS full_reversal
         |FROM c""".stripMargin,
    "q_ridge_path" -> ridgePathOracle,
    "q_doubly_robust" -> doublyRobustOracle,
    "q_cem_att" ->
      s"""WITH nli AS (SELECT l_orderkey AS o_orderkey,
         |    CAST(COUNT(*) AS BIGINT) AS x1 FROM lineitem GROUP BY 1),
         |base AS (SELECT
         |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
         |      THEN 1 ELSE 0 END AS t,
         |    CAST(ROUND(o_totalprice, 0) AS BIGINT) AS yo,
         |    o_custkey % 7 AS x2, x1
         |  FROM orders o JOIN nli USING (o_orderkey)),
         |cells AS (SELECT x1, x2, CAST(SUM(t) AS BIGINT) AS nt,
         |    CAST(SUM(1 - t) AS BIGINT) AS nc,
         |    CAST(SUM(t * yo) AS BIGINT) AS syt,
         |    CAST(SUM((1 - t) * yo) AS BIGINT) AS syc
         |  FROM base GROUP BY 1, 2),
         |a AS (SELECT
         |    CAST(COUNT(CASE WHEN nt > 0 AND nc > 0 THEN 1 END) AS BIGINT)
         |      AS n_strata_matched,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END)
         |      AS BIGINT) AS n_treated_matched,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc = 0 THEN nt ELSE 0 END)
         |      AS BIGINT) AS n_treated_unmatched,
         |    CAST(SUM(${graft.operators.Eval.cemCellSql}) AS BIGINT) AS sw
         |  FROM cells)
         |SELECT n_strata_matched, n_treated_matched, n_treated_unmatched,
         |  CASE WHEN n_treated_matched > 0 THEN
         |    round(CAST(sw AS DOUBLE) / 1000 / n_treated_matched, 6)
         |  ELSE NULL END AS att_cem
         |FROM a""".stripMargin,
    "q_logistic_irls" -> {
      val out = (1 to 4).map(i =>
        s"SELECT CAST($i AS BIGINT) AS iter, b0, b1, b2 FROM i$i")
        .mkString("\nUNION ALL ")
      s"""WITH s AS (SELECT
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         |    CAST(ROUND(o_totalprice / 1000, 0) AS BIGINT) AS x1,
         |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x2
         |  FROM orders),
         |${logisticIrlsCtes(4)}
         |$out""".stripMargin
    },
    "q_ipw_ate" -> {
      def ml(e: String) =
        s"CAST(SUM(CAST(ROUND(($e) * 1000, 0) AS BIGINT)) AS BIGINT)"
      s"""WITH nli AS (SELECT l_orderkey AS o_orderkey,
         |    CAST(COUNT(*) AS BIGINT) AS x1 FROM lineitem GROUP BY 1),
         |base AS (SELECT o.o_orderkey,
         |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
         |      THEN 1 ELSE 0 END AS t,
         |    CAST(ROUND(o_totalprice, 0) AS BIGINT) AS yo,
         |    o_custkey % 7 AS x2, x1
         |  FROM orders o JOIN nli USING (o_orderkey)),
         |s AS (SELECT t AS y, x1, x2 FROM base),
         |${logisticIrlsCtes(4)},
         |f AS (SELECT base.*, ${graft.operators.Eval.ipwEhSql(0.01)} AS eh
         |  FROM base, i4),
         |a AS (SELECT CAST(SUM(t) AS BIGINT) AS n_treated,
         |    CAST(SUM(1 - t) AS BIGINT) AS n_control,
         |    ${ml("t * yo / eh")} AS ty,
         |    ${ml("t / eh")} AS tw,
         |    ${ml("(1 - t) * yo / (1.0 - eh)")} AS cy,
         |    ${ml("(1 - t) / (1.0 - eh)")} AS cw,
         |    CAST(SUM(t * yo) AS BIGINT) AS sty,
         |    CAST(SUM((1 - t) * yo) AS BIGINT) AS scy
         |  FROM f)
         |SELECT n_treated, n_control,
         |  ${graft.operators.Eval.ipwAteSql} AS ate_ipw,
         |  ${graft.operators.Eval.naiveDiffSql} AS diff_naive
         |FROM a""".stripMargin
    },
    "q_target_encode" -> {
      val enc = graft.operators.Eval.targetEncodeSql(10L)
      s"""WITH lab AS (SELECT l_orderkey AS o_orderkey,
         |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS __y
         |  FROM lineitem GROUP BY 1),
         |b AS (SELECT o.o_orderkey, o_orderpriority, __y
         |  FROM orders o JOIN lab USING (o_orderkey)),
         |w AS (SELECT *,
         |    CAST(SUM(__y) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         |      AS __sc,
         |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         |      AS __nc
         |  FROM b),
         |g AS (SELECT CAST(SUM(__y) AS BIGINT) AS __sg,
         |    CAST(COUNT(*) AS BIGINT) AS __ng FROM b)
         |SELECT o_orderkey, o_orderpriority,
         |  CAST(__y AS BIGINT) AS label, $enc AS enc
         |FROM w, g""".stripMargin
    },
  )
}
