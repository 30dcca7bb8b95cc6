package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** TimeSeries-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object TimeSeriesEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sax" -> ((s, dir) => {
      // SAX shape fingerprint: each nation's monthly shipped-quantity
      // series -> 8-segment PAA -> z-normalized quartile letters -> one
      // word per nation (equal words = similar demand shapes).
      val li = table(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
      val sup = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val series = li
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("nation"),
          expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")
            .as("m"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
      graft.operators.TimeSeries.saxWords(
        series, "nation", "m", "qty", segments = 8)
    }),
    "q_dtw" -> ((s, dir) => {
      // Exact DTW on PAA-8 sketches of the per-nation monthly-quantity
      // series: 15 wavefront-parallel integer DP rounds over the 300
      // nation pairs; 20 closest alignments.
      val li = table(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
      val sup = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val series = li
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("nation"),
          expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")
            .as("m"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
      graft.operators.TimeSeries.dtwPaaDistances(
          series, "nation", "m", "qty", segments = 8)
        .orderBy(col("dtw_micro"), col("ka"), col("kb")).limit(20)
    }),
    "q_asof_join" -> ((s, dir) => {
      // As-of join: each purchase attributed to the user's latest click
      // at-or-before it. Union+window algorithm (Temporal.asofJoin) — one
      // shuffle, no per-key loops. Unmatched -> -1 (null-free compare).
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      graft.operators.Temporal
        .asofJoin(purchases, clicks, "user_id", "ts_ms", "event_id",
          payload = Seq("event_id", "ts_ms"))
        .select(
          col("event_id"), col("user_id"), col("ts_ms"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(expr("ts_ms div 1000 - asof_ts_ms div 1000"), lit(-1L)).as("gap_s"))
    }),
    "q_range_join" -> ((s, dir) => {
      // Range join: event values (cents) into half-open price tiers via the
      // binned equi-join path (no BroadcastNestedLoopJoin).
      import s.implicits._
      val tiers = Seq(
        ("t0", 0L, 10000L), ("t1", 10000L, 20000L), ("t2", 20000L, 30000L),
        ("t3", 30000L, 40000L), ("t4", 40000L, 50000L)).toDF("tier", "lo", "hi")
      val v = table(s, dir, "events")
        .select(col("event_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Temporal.rangeJoinBinned(v, "cents", tiers, binSize = 10000L)
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    }),
    "q_gap_fill" -> ((s, dir) => {
      // Calendar-spine gap fill: per-user daily event counts with missing
      // days zero-filled between each user's first and last active day.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val perDay = ev
        .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("v"))
      graft.operators.TimeSeries.fillBucketGaps(perDay, "user_id", "day", "v")
    }),
    "q_interpolate" -> ((s, dir) => {
      // Linear interpolation of missing per-user daily value sums across
      // each user's active-day span — the sensor-series repair twin of
      // q_gap_fill's zero-fill.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.interpolateLinear(perDay, "user_id", "day", "v")
        .select(col("user_id"), col("day"), col("v"),
          col("observed").cast("int").as("observed"))
    }),
    "q_seasonal_dow" -> ((s, dir) => {
      // Weekly seasonal profile + residual over the daily per-type series:
      // (key, dow) means from exact BIGINT sums, broadcast back onto the
      // unshuffled series (TimeSeries.seasonalByPhase).
      val pd = table(s, dir, "events")
        .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      graft.operators.TimeSeries.seasonalByPhase(pd, "event_type", "day", "v", period = 7)
    }),
    "q_kalman_level" -> ((s, dir) => {
      // Local-level Kalman filter over the first 8 days of per-type
      // event counts - the adaptive-gain level tracker completing the
      // TS smoothing family (EWMA = fixed alpha, Holt = trend; this
      // one's gain decays as the state converges). Exact milli state,
      // every float op rounded per step, unrolled named columns.
      val ev = table(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"))
      val d0 = broadcast(ev.agg(min(col("d")).as("d0")))
      val daily = ev.crossJoin(d0)
        .select(col("event_type"),
          datediff(col("d"), col("d0")).cast("long").as("idx"))
        .filter(col("idx") >= 0L && col("idx") < 8L)
        .groupBy(col("event_type"), col("idx"))
        .agg((count(lit(1)) * 1000L).cast("long").as("ym"))
      graft.operators.TimeSeries.kalmanLocalLevel(
        daily, "event_type", "idx", "ym", steps = 8)
    }),
    "q_ewma" -> ((s, dir) => {
      // Exponentially-weighted moving average (α=0.3, 30-row lookback) of
      // per-user daily value sums — the smoothing twin of q_interpolate.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.ewma(perDay, "user_id", "day", "v",
        alpha = 0.3, lookback = 30)
    }),
    "q_rolling_median" -> ((s, dir) => {
      // Exact 7-row rolling median of per-user daily value sums — the
      // robust-trend counterpart of q_ewma (no percentile window function
      // in Spark; bounded frame sort inside codegen).
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.rollingMedian(perDay, "user_id", "day", "v",
        windowRows = 7)
    }),
    "q_anomaly_mad" -> ((s, dir) => {
      // Robust volume-anomaly detection: per event_type, exact median and
      // MAD of per-minute event counts; the 20 most deviant minutes in
      // stable (dev desc, type, minute) order.
      val perMin = table(s, dir, "events")
        .select(col("event_type"), expr("unix_millis(ts) div 60000").as("minute"))
        .groupBy(col("event_type"), col("minute"))
        .agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.madOutliers(perMin, "event_type", "minute", "n")
        .orderBy(col("dev").desc, col("event_type"), col("minute"))
        .limit(20)
    }),
    "q_ransac" -> ((s, dir) => {
      // RANSAC consensus line over (quantity, extended price cents):
      // 16 md5-seeded two-point candidates, exact integer inlier votes
      // at eps = $2000.00, OLS refit on the winner's inliers. On this
      // part-price-dispersed data the headline is the CONSENSUS
      // FRACTION (~4%): the robust "is there a dominant linear band,
      // and what is it" diagnostic plain OLS can't give — the spec
      // pins the planted-line case where RANSAC recovers slope exactly
      // while OLS is dragged by outliers.
      graft.operators.TimeSeries.ransacLine(
        table(s, dir, "lineitem").select(
          (col("l_orderkey").cast("long") * 10L +
            col("l_linenumber").cast("long")).as("lid"),
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        "lid", "qty", "cents", nCand = 16, epsilon = 200000L)
    }),
    "q_trend_ols" -> ((s, dir) => {
      // Per-user spend trend line (slope cents/day, intercept, r2) from
      // exact BIGINT moment sums — the acf pattern applied to regression.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
        // re-origin x so moment products stay far from 2^63 (day ~ 20k)
        .withColumn("day0", col("day") - min(col("day")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      graft.operators.TimeSeries.trendOls(perDay, "user_id", "day0", "v")
    }),
    "q_acf" -> ((s, dir) => {
      // Lag-1 autocorrelation of per-user daily spend — seasonality/trend
      // diagnostic. Exact BIGINT moment sums, one double step at the end
      // (engine-portable Pearson; see TimeSeries.autocorr contract).
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.autocorr(perDay, "user_id", "day", "v", lag = 1)
    }),
    "q_holt_winters" -> ((s, dir) => {
      // Additive Holt-Winters (weekly seasonality, dyadic weights
      // alpha=1/2 beta=gamma=1/4) over each type's first 14 daily-cents
      // totals: textbook two-season init + 7 exact-integer smoothing
      // steps + the h=1/h=7 forecasts - the seasonal FORECASTING member
      // q_holt (trend) and q_seasonal_decompose (retrospective) lack.
      val ev = table(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      val d0 = broadcast(ev.agg(min(col("d")).as("d0")))
      val daily = ev.crossJoin(d0)
        .select(col("event_type"),
          datediff(col("d"), col("d0")).cast("long").as("idx"),
          col("cents"))
        .filter(col("idx") >= 0L && col("idx") < 14L)
        .groupBy(col("event_type"), col("idx"))
        .agg(sum(col("cents")).cast("long").as("y"))
      graft.operators.TimeSeries.holtWintersInt(
        daily, "event_type", "idx", "y")
    }),
    "q_sample_entropy" -> ((s, dir) => {
      // SampEn (m=2, r=3000 cents) of each user's daily spend:
      // amplitude-regularity — the Chebyshev-tolerance complement of
      // q_perm_entropy's ordinal complexity. Exact pair counts;
      // -ln(A/B) the one double.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.sampleEntropy(
        perDay, "user_id", "day", "v", r = 3000L)
    }),
    "q_cvar" -> ((s, dir) => {
      // 10% expected shortfall of each type's daily spend: the tail
      // MEAN past the VaR cut (k = ceil(0.1 n) worst days) — the
      // coherent risk number the quantile family doesn't give.
      val daily = table(s, dir, "events")
        .select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      graft.operators.TimeSeries.expectedShortfall(
        daily, "event_type", "day", "v", tailPpm = 100000L)
    }),
    "q_croston" -> ((s, dir) => {
      // Croston intermittent-demand forecast per part: TPC-H parts sell
      // on a handful of scattered ship-days — the exact regime where
      // level-only smoothing decays to zero between demands. Bounded
      // last-64-demands fold (map-side aggregate(), zero joins), exact
      // fixed-point EWMAs, Croston + SBA forecasts as the only doubles.
      val daily = table(s, dir, "lineitem")
        .select(col("l_partkey").cast("long").as("part"),
          datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
            .cast("long").as("day"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy(col("part"), col("day"))
        .agg(sum(col("qty")).cast("long").as("q"))
      graft.operators.TimeSeries.crostonInt(daily, "part", "day", "q")
    }),
    "q_perm_entropy" -> ((s, dir) => {
      // Bandt-Pompe permutation entropy (m=3) of each user's daily
      // spend series: ordinal-pattern complexity that separates
      // regular from noisy spenders where variance and lag-1 ACF
      // cannot. Integer ranks, exact micro-quantized entropy terms.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.permutationEntropy(
        perDay, "user_id", "day", "v")
    }),
    "q_spectral_entropy" -> ((s, dir) => {
      // Spectral entropy of each type's daily-dollar series over the
      // 32-day window from 2024-01-01 (missing days zero-pad): exact
      // integer-phase DFT power, micro-quantized entropy of the
      // normalized spectrum — narrowband/periodic vs broadband/noisy.
      val daily = table(s, dir, "events")
        .select(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01"))
            .cast("long").as("idx"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("idx"))
        .agg(expr("CAST(SUM(cents) AS BIGINT) div 100").as("y"))
      graft.operators.TimeSeries.spectralEntropy(
        daily, "event_type", "idx", "y", n = 32)
    }),
    "q_holt" -> ((s, dir) => {
      // Holt level+trend smoothing of per-user daily spend. Fixed-point
      // rational arithmetic with floor division -> the recursive oracle
      // replays the fold bit for bit (see TimeSeries.holt contract).
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.holt(perDay, "user_id", "day", "v")
    }),
    "q_overlap_join" -> ((s, dir) => {
      // Interval-overlap join (order activity windows × synthesized
      // campaign windows) via double-sided binning — the no-BNLJ,
      // no-broadcast-ceiling shape.
      val day = 86400000L
      val od = col("o_orderdate").cast("timestamp") // NTZ -> UTC session ts
      val a = table(s, dir, "orders").select(
        col("o_orderkey"),
        unix_millis(od).as("lo_a"),
        (unix_millis(od) + (pmod(col("o_orderkey"), lit(20L)) + 1L) * day).as("hi_a"))
      val epoch92 = unix_millis(to_timestamp(lit("1992-01-01")))
      val b = table(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("n_nationkey"),
        (epoch92 + col("n_nationkey").cast("long") * 60L * day).as("lo_b"),
        (epoch92 + col("n_nationkey").cast("long") * 60L * day + 90L * day).as("hi_b"))
      graft.operators.Temporal.overlapJoinBinned(a, b, binSize = 30L * day,
        "o_orderkey", "lo_a", "hi_a", "n_nationkey", "lo_b", "hi_b")
    }),
    "q_hampel" -> ((s, dir) => {
      // Hampel despiking of the per-user daily spend series (same series
      // as q_rolling_median): rolling-median/rolling-MAD repair in exact
      // 2×/4× fixed point — per-key bounded frames, no global state.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      graft.operators.TimeSeries.hampel(perDay, "user_id", "day", "v",
        windowRows = 7, k = 3)
    }),
    "q_theil_sen" -> ((s, dir) => {
      // Robust per-type spend trend: Theil–Sen lower-median slope over
      // daily totals in exact micro-cents/day — pairwise slopes explode
      // only within each type's 30-day grid, never across the raw stream.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.theilSen(daily, "event_type", "day_idx", "cents")
    }),
    "q_ohlc_bars" -> ((s, dir) => {
      // 6-hour OHLC bars per event type: open/close under the explicit
      // (ts, event_id) total order, one exchange for both windows + agg.
      val ev = table(s, dir, "events").select(col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.TimeSeries.ohlcBars(
        ev, "event_type", "ms", "event_id", "cents", barMs = 21600000L)
    }),
    "q_twap" -> ((s, dir) =>
      // Time-weighted average spend per (type, day): holding-time weights
      // from lead() under the (ts, event_id) total order, exact integer
      // weighted sums, calendar-bounded windows.
      graft.operators.TimeSeries.twap(
        table(s, dir, "events").select(col("event_type"),
          to_date(col("ts")).as("day"), unix_millis(col("ts")).as("ms"),
          col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "day", "ms", "event_id", "cents")),
    "q_mann_kendall" -> ((s, dir) => {
      // Nonparametric trend significance per type (the theil_sen
      // companion): exact integer S, tie-corrected variance, shared-SQL
      // continuity-corrected z — pairs bounded by the 30-day grid.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.mannKendall(
        daily, "event_type", "day_idx", "cents")
    }),
    "q_binary_segmentation" -> ((s, dir) => {
      // Depth-2 binary segmentation of each type's daily-cents series
      // (up to 3 ordered changepoints per group, minSeg=3) - the
      // multiple-changepoint extension q_changepoint's single split
      // can't express; identical micro SS score, shared with the
      // unrolled two-level oracle.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.binarySegmentation(
        daily, "event_type", "day_idx", "cents", depth = 2, minSeg = 3)
    }),
    "q_changepoint" -> ((s, dir) => {
      // Binary-segmentation step: the single best split of each type's
      // daily-total series by between-segment SS — locates what CUSUM
      // alarms on; one prefix-sum window per bounded group.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.changepoint(
        daily, "event_type", "day_idx", "cents")
    }),
    "q_ljung_box" -> ((s, dir) => {
      // White-noise gate on each type's daily-total series: Q over the
      // first 5 Pearson-pair autocorrelations vs χ²₅(0.95) — the check
      // before fitting any AR/seasonal model.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.ljungBox(daily, "event_type", "day", "v")
    }),
    "q_durbin_watson" -> ((s, dir) =>
      // First-order autocorrelation diagnostic of each type's daily
      // totals: d = Σ(Δe)²/Σe² on n-scaled exact-integer deviations —
      // the companion magnitude to q_runs_test's sign-based z.
      graft.operators.TimeSeries.durbinWatson(
        table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v")),
    "q_runs_test" -> ((s, dir) =>
      // Wald–Wolfowitz runs test on each type's daily-total change signs:
      // up/down/run counts as exact integers, z vs the null run count —
      // the clumpiness alarm next to q_mann_kendall's monotone trend.
      graft.operators.TimeSeries.runsTest(
        table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v")),
    "q_gumbel" -> ((s, dir) => {
      // Worst-case tail per event type: Gumbel fit over daily block
      // maxima of cents (method of moments) + the 100-day return level
      // — the capacity-planning threshold mean/std can't give.
      val ev = table(s, dir, "events").select(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.TimeSeries.gumbelFit(ev, "event_type", "day", "cents")
    }),
    "q_pacf" -> ((s, dir) => {
      // AR-order diagnostic on each type's daily-total series: partial
      // autocorrelations 1..5 via the unrolled Durbin-Levinson chain
      // over the rounded rho columns (pure arithmetic, engine-exact).
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.pacf(daily, "event_type", "day", "v")
    }),
    "q_pettitt" -> ((s, dir) => {
      // Nonparametric level-shift detection on each type's daily-total
      // series: exact integer U_t off the doubled-midrank identity,
      // K = max|U_t|, where, and the 2exp(-6K^2/(n^3+n^2)) tail.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.pettitt(daily, "event_type", "day", "v")
    }),
    "q_ccf" -> ((s, dir) => {
      // Do clicks LEAD purchases day-over-day? Cross-correlation at
      // lags -5..5 between the daily click and purchase cent totals —
      // exact moment assembly per lag, peak position = lead time.
      val cents = round(col("value") * 100, 0).cast("long")
      val daily = table(s, dir, "events")
        .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "click", cents).otherwise(0L))
            .as("click_cents"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L))
            .as("purch_cents"))
        .withColumn("k", lit("all"))
      graft.operators.TimeSeries.ccf(daily, "k", "day",
        "click_cents", "purch_cents", maxLag = 5)
    }),
    "q_hurst" -> ((s, dir) => {
      // Long-memory diagnostic per type on the HOURLY cent series:
      // R/S over dyadic blocks {8,16,32}, exact integer ranges,
      // H from the 3-point dyadic slope.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.hurst(hourly, "event_type", "h", "v")
    }),
    "q_rolling_corr" -> ((s, dir) => {
      // Are clicks and purchases STILL moving together? Trailing
      // 14-day correlation of the daily cent totals — exact window
      // moments, NULL under 5 periods.
      val cents = round(col("value") * 100, 0).cast("long")
      val daily = table(s, dir, "events")
        .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "click", cents).otherwise(0L))
            .as("xc"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L))
            .as("yc"))
        .withColumn("k", lit("all"))
      graft.operators.TimeSeries.rollingCorr(daily, "k", "day",
        "xc", "yc")
    }),
    "q_negbin" -> ((s, dir) =>
      // When q_burstiness says overdispersed: the negative-binomial
      // (r, p) you can actually threshold against, MoM on the dense
      // hourly grid.
      graft.operators.TimeSeries.negbinFit(
        table(s, dir, "events").select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h")),
        "event_type", "h")),
    "q_burstiness" -> ((s, dir) =>
      // Poisson-or-bursty per type over the DENSE hourly grid (empty
      // buckets enter through the algebra, not a spine join).
      graft.operators.TimeSeries.fanoFactor(
        table(s, dir, "events").select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h")),
        "event_type", "h")),
    "q_granger" -> ((s, dir) => {
      // Do yesterday's clicks improve today's purchase forecast beyond
      // purchases' own past? Lag-1 Granger F per parity cohort — one
      // moment row solves both nested fits closed-form.
      val daily = table(s, dir, "events")
        .groupBy(concat(lit("c"), pmod(col("user_id"), lit(2L)))
            .as("cohort"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("y"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("x"))
      graft.operators.TimeSeries.grangerLag1(
        daily, "cohort", "day", "y", "x")
    }),
    "q_forecast_skill" -> ((s, dir) =>
      // Is there weekly structure in each type's daily cents? Season-7
      // naive vs persistence on shared support, exact absolute errors.
      graft.operators.TimeSeries.naiveSkill(
        table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v")),
    "q_zero_inflation" -> ((s, dir) =>
      // Is each type's quiet time a zero SPIKE (on/off mixture) or
      // plain overdispersion? Van den Broek score chi2 over the dense
      // hourly grid — the sharper question after q_burstiness.
      graft.operators.TimeSeries.zeroInflation(
        table(s, dir, "events").select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("hour")),
        "event_type", "hour")),
    "q_turning_points" -> ((s, dir) => {
      // Is each event type's hourly spend pure noise? Turning-point
      // count vs the i.i.d. null over the 720-hour January series —
      // too few turns = persistence/trend, too many = alternation.
      // Hour index is RELATIVE to Jan 1 2024 (small exact integers).
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.turningPoints(
        hourly, "event_type", "h", "v")
    }),
    "q_cox_stuart" -> ((s, dir) => {
      // Did each event type's hourly spend drift across the month?
      // Cox-Stuart pairs hour i with hour i+ceil(n/2) and sign-tests —
      // the half-span pairing catches slow monotone drifts lag-1
      // tests miss.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.coxStuart(hourly, "event_type", "h", "v")
    }),
    "q_chow_test" -> ((s, dir) => {
      // Did the hourly-spend TREND break mid-month? Chow F on the
      // y ~ hour fit, break at hour 360 (Jan 16 00:00) — pooled vs
      // per-segment residuals per event type.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.chowTest(
        hourly, "event_type", "h", "v", breakBucket = 360L)
    }),
    "q_drawdown" -> ((s, dir) => {
      // Worst peak-to-trough drop in each event type's hourly spend —
      // exact integer drop + the (peak, trough, hour) triple that
      // realizes it, earliest trough on ties.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.drawdown(hourly, "event_type", "h", "v")
    }),
    "q_bollinger" -> ((s, dir) => {
      // 24-hour Bollinger envelope over hourly spend: breach flags are
      // EXACT decimal integer compares (no double sqrt can flip a
      // boolean across engines); only the mid is a double.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.bollinger(
        hourly, "event_type", "h", "v", nBars = 24, k = 2)
    }),
    "q_rsi" -> ((s, dir) => {
      // Cutler's 14-bar RSI over hourly spend per event type: exact
      // long gain/loss sums, one double division at the end.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.rsi(hourly, "event_type", "h", "v", 14)
    }),
    "q_stochastic" -> ((s, dir) => {
      // 14-bar stochastic oscillator: %K from rolling min/max, %D the
      // 3-bar mean of MICRO-QUANTIZED %K (sum of longs — a double sum
      // would be order-dependent across engines).
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.stochasticOsc(
        hourly, "event_type", "h", "v", 14)
    }),
    "q_vwap" -> ((s, dir) =>
      // Volume-weighted average unit price per (returnflag, ship
      // month): notional = extendedprice cents, volume = quantity —
      // the execution-benchmark twin of q_twap's time weighting.
      graft.operators.TimeSeries.vwap(
        table(s, dir, "lineitem").select(col("l_returnflag"),
          date_trunc("month", col("l_shipdate")).cast("date").as("m"),
          round(col("l_extendedprice") * 100, 0).cast("long")
            .as("notional_cents"),
          col("l_quantity").cast("long").as("qty")),
        "l_returnflag", "m", "notional_cents", "qty")),
    "q_atr" -> ((s, dir) => {
      // 8-bar average true range over q_ohlc_bars' 6-hour bars — the
      // gap-aware volatility gauge, composed directly on the bar
      // operator's output.
      val ev = table(s, dir, "events").select(col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.TimeSeries.atr(
        graft.operators.TimeSeries.ohlcBars(
          ev, "event_type", "ms", "event_id", "cents", barMs = 21600000L),
        "event_type", "bar_start_ms", nBars = 8)
    }),
    "q_kpss" -> ((s, dir) => {
      // Is hourly spend level-stationary? KPSS's null is STATIONARY —
      // the mirror of q_dickey_fuller; exact decimal bridge sums,
      // nano-quantized per-row terms.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.kpss(hourly, "event_type", "h", "v")
    }),
    "q_dickey_fuller" -> ((s, dir) => {
      // Does hourly spend mean-revert or random-walk? DF regression of
      // the hourly delta on the lagged level, t vs the -2.86
      // nonstandard critical value.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.dickeyFuller(hourly, "event_type", "h", "v")
    }),
    "q_page_hinkley" -> ((s, dir) => {
      // Page-Hinkley upward-drift detector on hourly spend per event
      // type: delta = $1 slack, lambda = $500 threshold (cents scale).
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.pageHinkley(
        hourly, "event_type", "h", "v", delta = 100L, lambda = 50000L)
    }),
    "q_forecast_accuracy" -> ((s, dir) => {
      // MAE/RMSE/sMAPE/MASE of the seasonal-naive (lag-24) forecast on
      // hourly spend, scaled by the lag-1 naive per Hyndman's MASE.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.forecastAccuracy(
        hourly, "event_type", "h", "v", fLag = 24, sLag = 1)
    }),
    "q_elasticity" -> ((s, dir) => {
      // Price elasticity of demand per brand: slope of ln(qty) on
      // ln(unit price) from MILLI-quantized logs (defined identically
      // in both engines; sums stay inside 2^53) — the log-log OLS
      // every pricing team runs first.
      val li = table(s, dir, "lineitem")
        .join(table(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          expr("CAST(round(1000 * ln(CAST(l_quantity AS DOUBLE)), 0)" +
            " AS BIGINT)").as("y"),
          expr("CAST(round(1000 * ln(round(l_extendedprice * 100, 0) / " +
            "CAST(l_quantity AS DOUBLE)), 0) AS BIGINT)").as("x"))
      graft.operators.TimeSeries.elasticity(li, "p_brand", "x", "y")
    }),
    "q_seasonal_anomaly" -> ((s, dir) => {
      // Decomposition-based anomaly screen: hours whose REMAINDER
      // (what's left after trend + hour-of-day cycle) deviates > 5 MAD
      // — catches spikes the raw-value MAD screen (q_anomaly_mad)
      // would excuse as "it's just a busy hour".
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      val d = graft.operators.TimeSeries.classicalDecompose(
          hourly, "event_type", "h", "v", period = 24)
        .select(col("event_type"), col("h"),
          expr("CAST(round(remainder * 1e6, 0) AS BIGINT)").as("r_micro"))
      graft.operators.TimeSeries.madOutliers(
          d, "event_type", "h", "r_micro")
        .withColumn("anomaly", expr("mad > 0 AND dev > 5 * mad"))
        .orderBy(col("dev").desc, col("event_type"), col("h"))
        .limit(20)
    }),
    "q_macd" -> ((s, dir) => {
      // Momentum turns in hourly spend: truncated-window EMA12-EMA26
      // with an EMA9 signal line and sign-flip crossover labels —
      // the ewma kernel's proven cross-engine fold, three spans.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.macd(hourly, "event_type", "h", "v")
    }),
    "q_seasonal_decompose" -> ((s, dir) => {
      // Classical additive decomposition of hourly spend: centered
      // 2x24 MA trend, hour-of-day seasonal (centered), remainder.
      // DOLLARS keep the micro-exact component sums double-safe.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.classicalDecompose(
        hourly, "event_type", "h", "v", period = 24)
    }),
    "q_seasonal_strength" -> ((s, dir) => {
      // Is the hour-of-day cycle or the trend worth modeling? Hyndman
      // variance-ratio strengths over the same decomposition.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.seasonalStrength(
        hourly, "event_type", "h", "v", period = 24)
    }),
    "q_matrix_profile" -> ((s, dir) => {
      // Exact matrix profile over the gap-filled HOURLY event-count
      // series (the time range, not the corpus, bounds the series at
      // ~720 points per 30-day month): 24 h windows, 12 h exclusion
      // zone — per window, the z-normed distance and start of its
      // nearest non-trivial neighbor (motif/discord discovery).
      val perHour = table(s, dir, "events")
        .select(expr("unix_millis(ts) div 3600000").as("hour"))
        .groupBy(col("hour")).agg(count(lit(1)).as("x"))
        .withColumn("k", lit(0))
      val filled = graft.operators.TimeSeries
        .fillBucketGaps(perHour, "k", "hour", "x")
      graft.operators.TimeSeries.matrixProfile(
        filled, "hour", "x", m = 24, excl = 12)
    }),
    "q_ar_forecast" -> ((s, dir) => {
      // Yule-Walker AR(2) on per-user gap-filled daily spend + a
      // 6-step mean-reverting forecast — the model-fitting step the
      // q_acf/q_pacf diagnostics motivate. Degenerate series (zero
      // variance) forecast NULL; users with < 3 days drop (no rho_2).
      val pd = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      val filled = graft.operators.TimeSeries
        .fillBucketGaps(pd, "user_id", "day", "v")
      graft.operators.TimeSeries.ar2Forecast(
        filled, "user_id", "day", "v", horizon = 6)
    }),
    "q_poisson_trend" -> ((s, dir) => {
      // Poisson IRLS on daily event counts vs day index (rebased to 0
      // so the micro-quantized weighted moments stay in int64): one
      // row per iteration pins the convergence trajectory, b is the
      // daily log-growth rate.
      val perDay = table(s, dir, "events")
        .select(expr("unix_millis(ts) div 86400000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
        .withColumn("x", col("day") - min(col("day")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      graft.operators.TimeSeries.poissonTrend(perDay, "x", "y", iters = 4)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_overlap_join" ->
      """WITH a AS (
        |  SELECT o_orderkey, epoch_ms(o_orderdate) AS lo_a,
        |    epoch_ms(o_orderdate) + (o_orderkey % 20 + 1) * 86400000 AS hi_a
        |  FROM orders),
        |b AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |    epoch_ms(TIMESTAMP '1992-01-01') + n_nationkey * 60 * CAST(86400000 AS BIGINT) AS lo_b,
        |    epoch_ms(TIMESTAMP '1992-01-01') + n_nationkey * 60 * CAST(86400000 AS BIGINT)
        |      + 90 * CAST(86400000 AS BIGINT) AS hi_b
        |  FROM nation)
        |SELECT o_orderkey, n_nationkey
        |FROM a JOIN b ON lo_a < hi_b AND lo_b < hi_a""".stripMargin,
    "q_gumbel" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |bm AS (SELECT event_type, day, MAX(x) AS m FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |    CAST(SUM(m) AS BIGINT) AS sm, CAST(SUM(m*m) AS BIGINT) AS sq
         |  FROM bm GROUP BY 1)
         |SELECT event_type, n_blocks, sm, sq,
         |  round(CAST(sm AS DOUBLE) / n_blocks, 6) AS mean_max,
         |  ${graft.operators.TimeSeries.gumbelBetaSql} AS beta,
         |  ${graft.operators.TimeSeries.gumbelMuSql} AS mu,
         |  ${graft.operators.TimeSeries.gumbelRl100Sql} AS return_level_100
         |FROM a""".stripMargin,
    "q_pacf" -> {
      val lagCtes = (1 to 5).map { k =>
        s"""p$k AS (SELECT event_type, v AS y,
           |    lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS x
           |  FROM pd),
           |m$k AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
           |    SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
           |    SUM(y*y) AS syy
           |  FROM p$k WHERE x IS NOT NULL GROUP BY 1),
           |r$k AS (SELECT event_type,
           |    round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
           |      THEN (n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
           |        CAST(n*syy - sy*sy AS DOUBLE)) END, 6) AS rho_$k
           |  FROM m$k)""".stripMargin
      }.mkString(",\n")
      val stepCtes = graft.operators.TimeSeries.pacfSteps.zipWithIndex
        .map { case ((name, sql), i) =>
          s"s${i + 1} AS (SELECT *, $sql AS $name FROM s$i)"
        }.mkString(",\n")
      val last = s"s${graft.operators.TimeSeries.pacfSteps.size}"
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_series
         |  FROM pd GROUP BY 1),
         |$lagCtes,
         |s0 AS (SELECT base.event_type, n_series, rho_1, rho_2, rho_3,
         |    rho_4, rho_5
         |  FROM base JOIN r1 USING (event_type) JOIN r2 USING (event_type)
         |  JOIN r3 USING (event_type) JOIN r4 USING (event_type)
         |  JOIN r5 USING (event_type)),
         |$stepCtes
         |SELECT event_type, n_series, round(phi11, 6) AS pacf_1,
         |  round(phi22, 6) AS pacf_2, round(phi33, 6) AS pacf_3,
         |  round(phi44, 6) AS pacf_4, round(phi55, 6) AS pacf_5
         |FROM $last""".stripMargin
    },
    "q_pettitt" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |pv AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM pd GROUP BY 1, 2),
         |rk AS (SELECT event_type, v,
         |    CAST(SUM(nv) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) * 2 - nv + 1 AS r2
         |  FROM pv),
         |j AS (SELECT pd.event_type, pd.day, rk.r2 FROM pd
         |  JOIN rk ON rk.event_type = pd.event_type AND rk.v = pd.v),
         |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM j GROUP BY 1),
         |cum AS (SELECT event_type, day,
         |    CAST(SUM(r2) OVER (PARTITION BY event_type ORDER BY day)
         |      AS BIGINT) AS cr2,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
         |      AS BIGINT) AS ti
         |  FROM j),
         |ut AS (SELECT cum.event_type, tot.n, cum.day, cum.ti,
         |    cr2 - ti * (n + 1) AS u_t
         |  FROM cum JOIN tot USING (event_type) WHERE ti < n),
         |sel AS (SELECT event_type, n, ABS(u_t) AS k_stat, day AS t_change,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY ABS(u_t) DESC, ti ASC) AS rn FROM ut),
         |f AS (SELECT event_type, n, CAST(k_stat AS BIGINT) AS k_stat,
         |    t_change FROM sel WHERE rn = 1)
         |SELECT event_type, n, k_stat, t_change,
         |  ${graft.operators.TimeSeries.pettittPSql} AS p,
         |  ${graft.operators.TimeSeries.pettittPSql} < 0.05 AS significant
         |FROM f""".stripMargin,
    "q_ccf" -> {
      val lagCtes = (-5 to 5).map { k =>
        val idx = k + 5
        val sh = if (k >= 0) s"lag(x0, $k)" else s"lead(x0, ${-k})"
        s"""c$idx AS (SELECT y, $sh OVER (ORDER BY day) AS x FROM pd),
           |m$idx AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           |    SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
           |  FROM c$idx WHERE x IS NOT NULL),
           |r$idx AS (SELECT 'all' AS k, CAST($k AS BIGINT) AS lag,
           |    CAST(n AS BIGINT) AS n,
           |    round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
           |      THEN (n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
           |        CAST(n*syy - sy*sy AS DOUBLE)) END, 6) AS ccf
           |  FROM m$idx)""".stripMargin
      }.mkString(",\n")
      val unions = (-5 to 5)
        .map(k => s"SELECT * FROM r${k + 5}").mkString("\nUNION ALL ")
      s"""WITH pd AS (SELECT epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS x0,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |$lagCtes
         |$unions""".stripMargin
    },
    "q_hurst" -> {
      val mCtes = graft.operators.TimeSeries.hurstBlockSizes.map { m =>
        s"""bl$m AS (SELECT event_type, (ti - 1) // $m AS block, h, x
           |  FROM idx),
           |z$m AS (SELECT event_type, block, x,
           |    $m * CAST(SUM(x) OVER (PARTITION BY event_type, block
           |      ORDER BY h) AS BIGINT)
           |      - CAST(ROW_NUMBER() OVER (PARTITION BY event_type, block
           |        ORDER BY h) AS BIGINT)
           |      * CAST(SUM(x) OVER (PARTITION BY event_type, block)
           |        AS BIGINT) AS zm,
           |    CAST(SUM(x) OVER (PARTITION BY event_type, block) AS BIGINT)
           |      AS sxb
           |  FROM bl$m),
           |g$m AS (SELECT event_type, block, COUNT(*) AS cnt,
           |    CAST(MAX(zm) AS BIGINT) AS zmax,
           |    CAST(MIN(zm) AS BIGINT) AS zmin,
           |    CAST(MAX(sxb) AS BIGINT) AS sx,
           |    CAST(SUM(x*x) AS BIGINT) AS sxx
           |  FROM z$m GROUP BY 1, 2),
           |f$m AS (SELECT event_type,
           |    ${graft.operators.TimeSeries.hurstRsMicroSql(m)} AS rs_micro
           |  FROM g$m WHERE cnt = $m),
           |a$m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb_$m,
           |    CAST(SUM(rs_micro) AS BIGINT) AS rsm_$m
           |  FROM f$m WHERE rs_micro IS NOT NULL GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, h, x,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS ti
         |  FROM pd),
         |$mCtes,
         |j AS (SELECT a8.event_type, nb_8, nb_16, nb_32,
         |    ${graft.operators.TimeSeries.hurstMeanRsSql(8)} AS rs_8,
         |    ${graft.operators.TimeSeries.hurstMeanRsSql(16)} AS rs_16,
         |    ${graft.operators.TimeSeries.hurstMeanRsSql(32)} AS rs_32
         |  FROM a8 JOIN a16 USING (event_type) JOIN a32 USING (event_type))
         |SELECT event_type, nb_8, nb_16, nb_32, rs_8, rs_16, rs_32,
         |  ${graft.operators.TimeSeries.hurstSql} AS hurst FROM j"""
        .stripMargin
    },
    "q_rolling_corr" ->
      s"""WITH pd AS (SELECT epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS xc,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS yc
         |  FROM events GROUP BY 1),
         |w AS (SELECT 'all' AS k, day,
         |    CAST(COUNT(*) OVER fr AS BIGINT) AS n,
         |    CAST(SUM(xc) OVER fr AS BIGINT) AS sx,
         |    CAST(SUM(yc) OVER fr AS BIGINT) AS sy,
         |    CAST(SUM(xc*yc) OVER fr AS BIGINT) AS sxy,
         |    CAST(SUM(xc*xc) OVER fr AS BIGINT) AS sxx,
         |    CAST(SUM(yc*yc) OVER fr AS BIGINT) AS syy
         |  FROM pd WINDOW fr AS (ORDER BY day
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT k, day, n,
         |  ${graft.operators.TimeSeries.rollingCorrSql(5)} AS corr
         |FROM w""".stripMargin,
    "q_negbin" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS b
         |  FROM events),
         |c AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type,
         |    CAST(MAX(b) - MIN(b) + 1 AS BIGINT) AS n_buckets,
         |    CAST(SUM(c) AS BIGINT) AS n_events,
         |    CAST(SUM(c*c) AS BIGINT) AS scc
         |  FROM c GROUP BY 1)
         |SELECT event_type, n_buckets, n_events, scc,
         |  round(CAST(n_events AS DOUBLE) / n_buckets, 6) AS mean_rate,
         |  ${graft.operators.TimeSeries.negbinRSql} AS nb_r,
         |  ${graft.operators.TimeSeries.negbinPSql} AS nb_p
         |FROM a""".stripMargin,
    "q_burstiness" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS b
         |  FROM events),
         |c AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type,
         |    CAST(MAX(b) - MIN(b) + 1 AS BIGINT) AS n_buckets,
         |    CAST(SUM(c) AS BIGINT) AS n_events,
         |    CAST(SUM(c*c) AS BIGINT) AS scc
         |  FROM c GROUP BY 1)
         |SELECT event_type, n_buckets, n_events, scc,
         |  ${graft.operators.TimeSeries.fanoSql} AS fano,
         |  ${graft.operators.TimeSeries.burstinessSql} AS burstiness
         |FROM a""".stripMargin,
    "q_dtw" -> dtwOracle,
    "q_sax" ->
      // PAA segment = ((rn-1)*8)//n (non-negative // ≡ div), letters via
      // TimeSeries.saxSymbolSql verbatim over exact BIGINT moments
      s"""WITH series AS (SELECT CAST(s_nationkey AS BIGINT) AS nation,
         |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
         |      AS m,
         |    CAST(SUM(l_quantity) AS BIGINT) AS qty
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2),
         |rows_ AS (SELECT nation, qty,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY m)
         |      AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS nn
         |  FROM series),
         |segd AS (SELECT nation, qty AS __y, nn,
         |    ((rn - 1) * 8) // nn AS __seg FROM rows_),
         |paa AS (SELECT nation, __seg, CAST(SUM(__y) AS BIGINT) AS __ps,
         |    CAST(COUNT(*) AS BIGINT) AS __pc FROM segd GROUP BY 1, 2),
         |stats AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS __n,
         |    CAST(SUM(__y) AS BIGINT) AS __s,
         |    CAST(SUM(__y * __y) AS BIGINT) AS __q FROM segd GROUP BY 1),
         |sym AS (SELECT nation, __seg, __n,
         |    ${graft.operators.TimeSeries.saxSymbolSql} AS __sym
         |  FROM paa JOIN stats USING (nation))
         |SELECT nation, MAX(__n) AS n,
         |  string_agg(__sym, '' ORDER BY __seg) AS sax_word
         |FROM sym GROUP BY 1""".stripMargin,
    "q_asof_join" -> asofBackwardOracle,
    // the custom-plan merge computes the identical relation
    "q_range_join" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
        |    ('t0', 0, 10000), ('t1', 10000, 20000), ('t2', 20000, 30000),
        |    ('t3', 30000, 40000), ('t4', 40000, 50000)),
        |v AS (SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events)
        |SELECT tier, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM v JOIN tiers ON cents >= lo AND cents < hi
        |GROUP BY tier""".stripMargin,
    "q_gap_fill" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day, COUNT(*) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1),
        |spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM s)
        |SELECT spine.user_id, spine.day, CAST(COALESCE(v, 0) AS BIGINT) AS v
        |FROM spine LEFT JOIN d USING (user_id, day)""".stripMargin,
    "q_interpolate" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |ext AS (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1 FROM pd GROUP BY 1),
        |spine AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS day FROM ext),
        |j AS (
        |  SELECT spine.user_id, spine.day, v
        |  FROM spine LEFT JOIN pd USING (user_id, day)),
        |w AS (
        |  SELECT user_id, day, v,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS pb,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nb
        |  FROM j
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |    ELSE pv + (nv - pv) * (day - pb) / CAST(nb - pb AS DOUBLE) END, 6) AS v,
        |  CAST(v IS NOT NULL AS INT) AS observed
        |FROM w""".stripMargin,
    "q_seasonal_dow" ->
      """WITH pd AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, day % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS sv
        |  FROM pd GROUP BY 1, 2)
        |SELECT pd.event_type, pd.day, pd.v,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS seasonal,
        |  round(CAST(pd.v AS DOUBLE) - CAST(sv AS DOUBLE) / n, 6) AS resid
        |FROM pd JOIN s
        |  ON s.event_type = pd.event_type AND s.dow = pd.day % 7""".stripMargin,
    "q_kalman_level" -> {
      val (qm, rm, p0) = (4000L, 100000L, 10000000L)
      val steps = (1 to 8).map { t =>
        val (pm, pp, y) = (s"m${t - 1}", s"pp$t", s"y${t - 1}")
        s"""s$t AS (SELECT *, ${graft.operators.TimeSeries
             .kalmanPUpdateSql(pp, rm)} AS p$t,
           |    ${graft.operators.TimeSeries
             .kalmanMUpdateSql(pm, pp, y, rm)} AS m$t
           |  FROM (SELECT *, p${t - 1} + $qm AS pp$t FROM s${t - 1}))"""
          .stripMargin
      }.mkString(",\n")
      val ys = (0 until 8).map(k =>
        s"COALESCE(MAX(CASE WHEN idx = $k THEN ym END), CAST(0 AS BIGINT)) AS y$k")
        .mkString(",\n    ")
      s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d
         |  FROM events),
         |d0 AS (SELECT MIN(d) AS d0 FROM ev),
         |daily AS (SELECT event_type,
         |    CAST(date_diff('day', d0, d) AS BIGINT) AS idx,
         |    CAST(COUNT(*) * 1000 AS BIGINT) AS ym
         |  FROM ev CROSS JOIN d0
         |  WHERE date_diff('day', d0, d) BETWEEN 0 AND 7 GROUP BY 1, 2),
         |wide AS (SELECT event_type,
         |    $ys
         |  FROM daily GROUP BY 1),
         |s0 AS (SELECT *, CAST(0 AS BIGINT) AS m0,
         |    CAST($p0 AS BIGINT) AS p0 FROM wide),
         |$steps
         |SELECT event_type, round(CAST(m8 AS DOUBLE) / 1000, 6) AS level,
         |  round(CAST(p8 AS DOUBLE) / 1000, 6) AS variance,
         |  round(CAST(pp8 AS DOUBLE) / (pp8 + $rm), 6) AS last_gain
         |FROM s8""".stripMargin
    },
    "q_ewma" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, day, v,
        |    list(CAST(v AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS vs
        |  FROM pd)
        |SELECT user_id, day, v,
        |  round(
        |    list_sum(list_transform(vs, (x, i) -> x * pow(0.7, len(vs) - i))) /
        |    ((1 - pow(0.7, len(vs))) / 0.3), 6) AS ewma
        |FROM w""".stripMargin,
    "q_rolling_median" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day, v,
        |  round(quantile_cont(CAST(v AS DOUBLE), 0.5) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_med
        |FROM pd""".stripMargin,
    "q_anomaly_mad" ->
      """WITH pm AS (
        |  SELECT event_type, epoch_ms(ts) // 60000 AS minute, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM pm GROUP BY 1),
        |d AS (
        |  SELECT pm.event_type, minute, n, med, ABS(n - med) AS rawdev
        |  FROM pm JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(rawdev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type, minute, n, round(med, 6) AS med,
        |  round(mad, 6) AS mad, round(rawdev, 6) AS dev
        |FROM d JOIN md USING (event_type)
        |ORDER BY rawdev DESC, d.event_type, minute LIMIT 20""".stripMargin,
    "q_ransac" ->
      s"""WITH pts AS MATERIALIZED (
         |  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
         |    CAST(l_quantity AS BIGINT) AS x,
         |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
         |  FROM lineitem),
         |sel AS MATERIALIZED (SELECT id, x, y,
         |    CAST(row_number() OVER (ORDER BY hh, id) AS BIGINT) AS rk
         |  FROM (SELECT id, x, y, CAST('0x' || substr(md5(
         |        'ransac:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT)
         |      AS hh FROM pts)
         |  QUALIFY rk <= 32),
         |cand AS MATERIALIZED (SELECT (a.rk + 1) // 2 AS cand,
         |    a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |  FROM sel a JOIN sel b
         |    ON b.rk = a.rk + 1 AND a.rk % 2 = 1 AND b.x != a.x),
         |inl AS MATERIALIZED (SELECT cand, x1, y1, x2, y2,
         |    CAST(COUNT(*) AS BIGINT) AS n_inliers
         |  FROM pts p CROSS JOIN cand c
         |  WHERE ${graft.operators.TimeSeries.ransacInlierSql(200000L)}
         |  GROUP BY 1, 2, 3, 4, 5),
         |win AS MATERIALIZED (SELECT * FROM inl
         |  ORDER BY n_inliers DESC, cand LIMIT 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pts),
         |fit AS (SELECT cand, x1, y1, x2, y2, n_inliers,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM pts, win
         |  WHERE ${graft.operators.TimeSeries.ransacInlierSql(200000L)}
         |  GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT cand, x1, y1, x2, y2, n_inliers, n_total,
         |  round(CAST(n_inliers AS DOUBLE) / n_total, 6) AS inlier_frac,
         |  ${graft.operators.TimeSeries.ransacSlopeSql} AS slope,
         |  ${graft.operators.TimeSeries.ransacInterceptSql} AS intercept
         |FROM fit, tot""".stripMargin,
    "q_trend_ols" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |x0 AS (
        |  SELECT user_id,
        |    day - MIN(day) OVER (PARTITION BY user_id) AS x, v AS y
        |  FROM pd),
        |m AS (
        |  SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM x0 GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    END, 6) AS slope,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (sy - sx * ((n * sxy - sx * sy) /
        |        CAST(n * sxx - sx * sx AS DOUBLE))) / CAST(n AS DOUBLE)
        |    END, 6) AS intercept,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE) *
        |         CAST(n * sxy - sx * sy AS DOUBLE) /
        |         (CAST(n * sxx - sx * sx AS DOUBLE) *
        |          CAST(n * syy - sy * sy AS DOUBLE))
        |    END, 6) AS r2
        |FROM m""".stripMargin,
    "q_acf" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, v AS y,
        |    lag(v, 1) OVER (PARTITION BY user_id ORDER BY day) AS x
        |  FROM pd),
        |m AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM p WHERE x IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (n * sxy - sx * sy) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE))
        |    END, 6) AS acf
        |FROM m""".stripMargin,
    "q_holt_winters" -> {
      import graft.operators.TimeSeries.floorDivSql
      val ys = (0 until 14).map(k =>
        s"COALESCE(MAX(CASE WHEN idx = $k THEN y END), CAST(0 AS BIGINT)) AS y$k")
        .mkString(",\n    ")
      val s1 = (0 until 7).map(k => s"y$k").mkString(" + ")
      val s2 = (7 until 14).map(k => s"y$k").mkString(" + ")
      val seas = (0 until 7).map(j => s"y$j - l6 AS sea$j").mkString(", ")
      val steps = (7 until 14).map { t =>
        val j = t - 7
        s"""st$t AS (SELECT *, ${floorDivSql(
             s"y$t - l$t + 3 * sea$j", 4)} AS su$j FROM (
           |  SELECT *, ${floorDivSql(
             s"l$t - l${t - 1} + 3 * b${t - 1}", 4)} AS b$t FROM (
           |    SELECT *, ${floorDivSql(
             s"y$t - sea$j + l${t - 1} + b${t - 1}", 2)} AS l$t
           |    FROM st${t - 1})))""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS d,
         |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events),
         |d0 AS (SELECT MIN(d) AS d0 FROM ev),
         |daily AS (SELECT event_type,
         |    CAST(date_diff('day', d0, d) AS BIGINT) AS idx,
         |    CAST(SUM(cents) AS BIGINT) AS y
         |  FROM ev CROSS JOIN d0
         |  WHERE date_diff('day', d0, d) BETWEEN 0 AND 13 GROUP BY 1, 2),
         |wide AS (SELECT event_type,
         |    $ys
         |  FROM daily GROUP BY 1),
         |st6 AS (SELECT *, $seas FROM (
         |  SELECT *, ${floorDivSql(s"($s2) - ($s1)", 49)} AS b6 FROM (
         |    SELECT *, ${floorDivSql(s1, 7)} AS l6 FROM wide))),
         |$steps
         |SELECT event_type, l13 AS level, b13 AS trend,
         |  l13 + 1 * b13 + su0 AS fc_1, l13 + 7 * b13 + su6 AS fc_7
         |FROM st13""".stripMargin
    },
    "q_sample_entropy" -> {
      import graft.operators.TimeSeries.sampEnSql
      s"""WITH pd AS (
         |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |t AS (SELECT user_id, day, v AS v1,
         |    LEAD(v, 1) OVER w AS v2, LEAD(v, 2) OVER w AS v3
         |  FROM pd WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         |g AS (SELECT user_id, v1, v2, v3,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS i
         |  FROM t WHERE v3 IS NOT NULL),
         |c AS (SELECT a.user_id,
         |    CAST(SUM(CASE WHEN abs(a.v1 - b.v1) <= 3000
         |      AND abs(a.v2 - b.v2) <= 3000 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS b_pairs,
         |    CAST(SUM(CASE WHEN abs(a.v1 - b.v1) <= 3000
         |      AND abs(a.v2 - b.v2) <= 3000
         |      AND abs(a.v3 - b.v3) <= 3000 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a_pairs
         |  FROM g a JOIN g b ON a.user_id = b.user_id AND a.i < b.i
         |  GROUP BY 1)
         |SELECT user_id, b_pairs, a_pairs,
         |  ${sampEnSql("a_pairs", "b_pairs")} AS sampen
         |FROM c""".stripMargin
    },
    "q_cvar" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, day, v,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY v DESC, day) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM daily),
        |k AS (SELECT *, GREATEST(CAST(1 AS BIGINT),
        |    (100000 * n + 999999) // 1000000) AS k_tail FROM r)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(k_tail) AS BIGINT) AS k_tail,
        |  CAST(MIN(v) AS BIGINT) AS var_floor,
        |  CAST(SUM(v) AS BIGINT) AS tail_sum,
        |  round(CAST(SUM(v) AS DOUBLE) / CAST(MAX(k_tail) AS DOUBLE), 6)
        |    AS es
        |FROM k WHERE rk <= k_tail GROUP BY 1""".stripMargin,
    "q_croston" -> {
      import graft.operators.TimeSeries.{crostonFcSql, crostonSbaSql}
      s"""WITH RECURSIVE d AS (
         |  SELECT CAST(l_partkey AS BIGINT) AS part,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS BIGINT)
         |      AS day,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem GROUP BY 1, 2),
         |dd AS (SELECT * FROM d WHERE q > 0),
         |cnt AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_demands
         |  FROM dd GROUP BY 1),
         |tl AS (SELECT part, day, q,
         |    row_number() OVER (PARTITION BY part ORDER BY day DESC) AS rd
         |  FROM dd),
         |t AS (SELECT part, day, q,
         |    row_number() OVER (PARTITION BY part ORDER BY day) AS rn
         |  FROM tl WHERE rd <= 64),
         |r AS (
         |  SELECT part, rn, day, q * 1000000 AS z,
         |    CAST(1000000 AS BIGINT) AS p
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.part, t.rn, t.day,
         |    CAST((3 * t.q * 1000000 + 7 * r.z) // 10 AS BIGINT),
         |    CAST((3 * (t.day - r.day) * 1000000 + 7 * r.p) // 10 AS BIGINT)
         |  FROM t JOIN r ON t.part = r.part AND t.rn = r.rn + 1),
         |fin AS (SELECT part, rn, z, p,
         |    row_number() OVER (PARTITION BY part ORDER BY rn DESC) AS rl
         |  FROM r)
         |SELECT f.part, c.n_demands, f.z AS z_fp, f.p AS p_fp,
         |  ${crostonFcSql("f.z", "f.p")} AS croston_fc,
         |  ${crostonSbaSql("f.z", "f.p", 3L, 10L)} AS sba_fc
         |FROM fin f JOIN cnt c USING (part) WHERE f.rl = 1""".stripMargin
    },
    "q_perm_entropy" -> {
      import graft.operators.TimeSeries.{permPatternSql, entropyTermMicroSql}
      s"""WITH pd AS (
         |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |t AS (SELECT user_id, v AS v1,
         |    LEAD(v, 1) OVER w AS v2, LEAD(v, 2) OVER w AS v3
         |  FROM pd WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         |g AS (SELECT user_id, ${permPatternSql("v1", "v2", "v3")} AS pat
         |  FROM t WHERE v3 IS NOT NULL),
         |c AS (SELECT user_id, pat, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM g GROUP BY 1, 2),
         |nn AS (SELECT user_id, pat, c,
         |    CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM c),
         |agg AS (SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_windows,
         |    CAST(COUNT(*) AS BIGINT) AS n_patterns,
         |    CAST(SUM(${entropyTermMicroSql("c", "n")}) AS BIGINT) AS h_micro
         |  FROM nn GROUP BY 1)
         |SELECT user_id, n_windows, n_patterns, h_micro,
         |  round(CAST(h_micro AS DOUBLE) / (1000000.0 * ln(6.0)), 6) AS h_norm
         |FROM agg""".stripMargin
    },
    "q_spectral_entropy" -> {
      import graft.operators.TimeSeries.{dftTermDeciSql, entropyTermMicroSql}
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS i,
         |    CAST(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
         |      // 100 AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |terms AS (SELECT d.event_type, d.i AS __i, d.y AS __y, kr.__k,
         |    CAST(32 AS BIGINT) AS __n
         |  FROM (SELECT * FROM daily WHERE i >= 0 AND i < 32) d
         |  CROSS JOIN (SELECT k AS __k FROM range(1, 17) t(k)) kr),
         |pk AS (SELECT event_type, __k,
         |    CAST(SUM(${dftTermDeciSql("cos")}) AS BIGINT) AS re,
         |    CAST(SUM(${dftTermDeciSql("sin")}) AS BIGINT) AS im
         |  FROM terms GROUP BY 1, 2),
         |pt AS (SELECT event_type, __k, re * re + im * im AS p,
         |    CAST(SUM(re * re + im * im) OVER (PARTITION BY event_type)
         |      AS BIGINT) AS tot
         |  FROM pk),
         |agg AS (SELECT event_type, CAST(MAX(tot) AS BIGINT) AS total_power,
         |    CAST(SUM(CASE WHEN p > 0
         |      THEN ${entropyTermMicroSql("p", "tot")}
         |      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h_micro
         |  FROM pt GROUP BY 1)
         |SELECT event_type, total_power, h_micro,
         |  round(CAST(h_micro AS DOUBLE) / (1000000.0 * ln(16.0)), 6)
         |    AS h_norm
         |FROM agg""".stripMargin
    },
    "q_holt" ->
      """WITH RECURSIVE pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |o AS (
        |  SELECT user_id, day, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM pd),
        |r AS (
        |  SELECT user_id, rn, day, v, v * 1000000 AS l, CAST(0 AS BIGINT) AS b
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.day, o.v,
        |    (3 * o.v * 1000000 + 7 * (r.l + r.b)) // 10,
        |    (((3 * o.v * 1000000 + 7 * (r.l + r.b)) // 10 - r.l) + 4 * r.b) // 5
        |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, day, v, CAST(l AS BIGINT) AS level_fp,
        |  CAST(b AS BIGINT) AS trend_fp, CAST(l + b AS BIGINT) AS forecast_fp
        |FROM r""".stripMargin,
    "q_hampel" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT user_id, day, v,
        |    CAST(quantile_cont(CAST(2*v AS DOUBLE), 0.5) OVER w AS BIGINT) AS med2,
        |    CAST(2 * mad(2*v) OVER w AS BIGINT) AS mad4
        |  FROM pd WINDOW w AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, day, v, med2, mad4,
        |  2*abs(2*v - med2) > 3*mad4 AS is_outlier,
        |  CAST(CASE WHEN 2*abs(2*v - med2) > 3*mad4 THEN med2 ELSE 2*v END
        |    AS BIGINT) AS repaired2
        |FROM h""".stripMargin,
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
        |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |pairs AS (SELECT a.g, a.x AS x1, b.x AS x2,
        |    CAST(ROUND(CAST((b.y - a.y) * 1000000 AS DOUBLE) / (b.x - a.x),
        |      0) AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x),
        |ranked AS (SELECT g, slope_micro,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY slope_micro, x1, x2) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n_pairs FROM pairs)
        |SELECT g AS event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  slope_micro AS sen_slope_micro
        |FROM ranked WHERE rn = (n_pairs + 1) // 2""".stripMargin,
    "q_ohlc_bars" -> ohlcOracleSql,
    "q_twap" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    epoch_ms(ts) AS ms, event_id,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
        |l AS (SELECT event_type, day, cents,
        |    LEAD(ms) OVER (PARTITION BY event_type, day
        |      ORDER BY ms, event_id) - ms AS w FROM e),
        |f AS (SELECT * FROM l WHERE w IS NOT NULL)
        |SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_holds,
        |  CAST(SUM(w) AS BIGINT) AS total_ms,
        |  CAST(SUM(w*cents) AS BIGINT) AS wsum,
        |  CASE WHEN SUM(w) > 0
        |    THEN round(CAST(SUM(w*cents) AS DOUBLE) / SUM(w), 6) END AS twap
        |FROM f GROUP BY 1, 2""".stripMargin,
    "q_mann_kendall" -> {
      val (v, z) = (graft.operators.TimeSeries.mkVarSql,
        graft.operators.TimeSeries.mkZSql)
      s"""WITH daily AS (SELECT event_type AS g,
         |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |s AS (SELECT a.g, CAST(SUM(CASE WHEN b.y > a.y THEN 1
         |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x GROUP BY 1),
         |tt AS (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS t
         |  FROM daily GROUP BY 1, 2),
         |ties AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_distinct_y,
         |    CAST(SUM(t) AS BIGINT) AS n,
         |    CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tie_term
         |  FROM tt GROUP BY 1)
         |SELECT s.g AS event_type, s_stat, n_distinct_y, n, tie_term,
         |  $v AS var_s, $z AS z, abs($z) > 1.959964 AS significant
         |FROM s JOIN ties USING (g)""".stripMargin
    },
    "q_binary_segmentation" -> {
      // one segmentation level as a CTE template over a labeled
      // (g, seg, x, y) frame: prefix sums per (g, seg), the minSeg
      // filter, the (score desc, x) argmax, then the relabel
      def level(src: String, lv: Int, bestOut: String, nextOut: String): String =
        s"""r_$lv AS (SELECT g, seg, x, y,
           |    CAST(SUM(y) OVER (PARTITION BY g, seg ORDER BY x)
           |      AS BIGINT) AS sl,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY g, seg ORDER BY x)
           |      AS BIGINT) AS nl,
           |    CAST(COUNT(*) OVER (PARTITION BY g, seg) AS BIGINT) AS n,
           |    CAST(SUM(y) OVER (PARTITION BY g, seg) AS BIGINT) AS s
           |  FROM $src),
           |sc_$lv AS (SELECT *,
           |    ${graft.operators.TimeSeries.binsegScoreSql} AS score_micro
           |  FROM r_$lv WHERE nl >= 3 AND n - nl >= 3),
           |$bestOut AS MATERIALIZED (SELECT g, seg, x AS split_after_x,
           |    score_micro, n, nl AS n_left
           |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY g, seg
           |      ORDER BY score_micro DESC, x) AS rn FROM sc_$lv)
           |  WHERE rn = 1),
           |$nextOut AS MATERIALIZED (SELECT l.g,
           |    l.seg * 2 + CASE WHEN b.split_after_x IS NOT NULL
           |      AND l.x > b.split_after_x THEN 1 ELSE 0 END AS seg,
           |    l.x, l.y
           |  FROM $src l LEFT JOIN $bestOut b
           |    ON b.g = l.g AND b.seg = l.seg)""".stripMargin
      s"""WITH daily AS (SELECT event_type AS g, CAST(0 AS BIGINT) AS seg,
         |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 3),
         |${level("daily", 0, "b0", "lab1")},
         |${level("lab1", 1, "b1", "lab2")}
         |SELECT g AS event_type, CAST(0 AS BIGINT) AS level, seg,
         |    split_after_x, score_micro, n, n_left FROM b0
         |UNION ALL
         |SELECT g AS event_type, CAST(1 AS BIGINT) AS level, seg,
         |    split_after_x, score_micro, n, n_left FROM b1""".stripMargin
    },
    "q_changepoint" -> changepointOracleSql,
    "q_ljung_box" -> {
      val lagCtes = (1 to 5).map { k =>
        s"""p$k AS (SELECT event_type, v AS y,
           |    lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS x
           |  FROM pd),
           |m$k AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
           |    SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
           |    SUM(y*y) AS syy
           |  FROM p$k WHERE x IS NOT NULL GROUP BY 1),
           |r$k AS (SELECT event_type,
           |    round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
           |      THEN (n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
           |        CAST(n*syy - sy*sy AS DOUBLE)) END, 6) AS rho_$k
           |  FROM m$k)""".stripMargin
      }.mkString(",\n")
      val q = graft.operators.TimeSeries.lbSql(5)
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_series
         |  FROM pd GROUP BY 1),
         |$lagCtes
         |SELECT base.event_type, n_series, rho_1, rho_2, rho_3, rho_4, rho_5,
         |  $q AS lb_stat, $q > 11.0705 AS significant
         |FROM base JOIN r1 USING (event_type) JOIN r2 USING (event_type)
         |  JOIN r3 USING (event_type) JOIN r4 USING (event_type)
         |  JOIN r5 USING (event_type)""".stripMargin
    },
    "q_durbin_watson" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(v) AS BIGINT) AS s FROM pd GROUP BY 1),
         |e AS (SELECT pd.event_type, day, n, n * v - s AS e
         |  FROM pd JOIN st USING (event_type)),
         |d AS (SELECT event_type, n, e,
         |    e - lag(e) OVER (PARTITION BY event_type ORDER BY day) AS de
         |  FROM e),
         |agg AS (SELECT event_type, MAX(n) AS n,
         |    SUM(CAST(e AS HUGEINT) * e) AS sse,
         |    SUM(CAST(de AS HUGEINT) * de) AS ssd
         |  FROM d GROUP BY 1)
         |SELECT event_type, n,
         |  CAST(sse AS VARCHAR) AS sse, CAST(ssd AS VARCHAR) AS ssd,
         |  ${graft.operators.TimeSeries.dwSql} AS dw
         |FROM agg""".stripMargin,
    "q_runs_test" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |d AS (SELECT event_type, day,
         |    v - lag(v) OVER (PARTITION BY event_type ORDER BY day) AS dd
         |  FROM pd),
         |sg AS (SELECT event_type, day, CAST(sign(dd) AS BIGINT) AS s
         |  FROM d WHERE dd IS NOT NULL AND dd <> 0),
         |rr AS (SELECT event_type, s,
         |    CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
         |      IS NULL OR lag(s) OVER (PARTITION BY event_type
         |      ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run
         |  FROM sg),
         |agg AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_down,
         |    CAST(SUM(new_run) AS BIGINT) AS n_runs
         |  FROM rr GROUP BY 1)
         |SELECT event_type, n_up, n_down, n_runs,
         |  ${graft.operators.TimeSeries.runsZSql} AS z
         |FROM agg""".stripMargin,
    "q_granger" -> {
      val solve = graft.operators.TimeSeries.grangerSolve.toMap
      s"""WITH d AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS cohort,
         |    epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |l AS (SELECT cohort, y, x,
         |    lag(y) OVER (PARTITION BY cohort ORDER BY day) AS yl,
         |    lag(x) OVER (PARTITION BY cohort ORDER BY day) AS xl
         |  FROM d),
         |m AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(yl) AS BIGINT) AS s1,
         |    CAST(SUM(xl) AS BIGINT) AS s2,
         |    CAST(SUM(yl*yl) AS BIGINT) AS s11,
         |    CAST(SUM(yl*xl) AS BIGINT) AS s12,
         |    CAST(SUM(xl*xl) AS BIGINT) AS s22,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(yl*y) AS BIGINT) AS s1y,
         |    CAST(SUM(xl*y) AS BIGINT) AS s2y,
         |    CAST(SUM(y*y) AS BIGINT) AS syy
         |  FROM l WHERE yl IS NOT NULL AND xl IS NOT NULL GROUP BY 1)
         |SELECT cohort, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
         |  ${solve("b_yl")} AS b_yl,
         |  ${solve("b_xl")} AS b_xl,
         |  ${solve("f_stat")} AS f_stat,
         |  ${solve("significant")} AS significant
         |FROM m""".stripMargin
    },
    "q_forecast_skill" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |l AS (SELECT event_type, v,
         |    lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
         |    lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS ls
         |  FROM pd),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(ABS(v - l1)) AS BIGINT) AS sae_naive,
         |    CAST(SUM(ABS(v - ls)) AS BIGINT) AS sae_season
         |  FROM l WHERE l1 IS NOT NULL AND ls IS NOT NULL GROUP BY 1)
         |SELECT event_type, n, sae_naive, sae_season,
         |  ${graft.operators.TimeSeries.naiveSkillSql} AS skill
         |FROM a""".stripMargin,
    "q_turning_points" ->
      s"""WITH hb AS (SELECT event_type,
         |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, v,
         |    lag(v) OVER (PARTITION BY event_type ORDER BY h) AS p,
         |    lead(v) OVER (PARTITION BY event_type ORDER BY h) AS f
         |  FROM hb),
         |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN p IS NOT NULL AND f IS NOT NULL
         |      AND (v - p) * (f - v) < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_turning
         |  FROM w GROUP BY 1)
         |SELECT event_type, n, n_turning,
         |  ${graft.operators.TimeSeries.turningZSql} AS z,
         |  abs(${graft.operators.TimeSeries.turningZSql}) > 1.959964
         |    AS significant
         |FROM m""".stripMargin,
    "q_cox_stuart" ->
      s"""WITH hb AS (SELECT event_type,
         |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |sq AS (SELECT event_type, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS nk
         |  FROM hb),
         |j AS (SELECT lo.event_type, lo.nk, lo.v AS v_lo, hi.v AS v_hi
         |  FROM (SELECT *, rn + (nk + 1) // 2 AS rn_pair FROM sq
         |    WHERE rn * 2 <= nk) lo
         |  JOIN sq hi ON hi.event_type = lo.event_type
         |    AND hi.rn = lo.rn_pair),
         |m AS (SELECT event_type, CAST(MAX(nk) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN v_hi > v_lo THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s_plus,
         |    CAST(SUM(CASE WHEN v_hi < v_lo THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s_minus
         |  FROM j GROUP BY 1)
         |SELECT event_type, n, s_plus, s_minus,
         |  ${graft.operators.TimeSeries.coxStuartZSql} AS z,
         |  CASE WHEN abs(${graft.operators.TimeSeries.coxStuartZSql})
         |      > 1.959964 THEN
         |    CASE WHEN ${graft.operators.TimeSeries.coxStuartZSql} > 0
         |      THEN 'increasing' ELSE 'decreasing' END
         |  ELSE 'none' END AS trend
         |FROM m""".stripMargin,
    "q_chow_test" ->
      s"""WITH hb AS (SELECT event_type,
         |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN h < 360 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN h ELSE 0 END) AS BIGINT)
         |      AS sx_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN v ELSE 0 END) AS BIGINT)
         |      AS sy_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN h*h ELSE 0 END) AS BIGINT)
         |      AS sxx_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN h*v ELSE 0 END) AS BIGINT)
         |      AS sxy_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN CAST(v AS DECIMAL(38,0))*v
         |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
         |      AS syy_1,
         |    CAST(SUM(CASE WHEN h >= 360 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN h ELSE 0 END) AS BIGINT)
         |      AS sx_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN v ELSE 0 END) AS BIGINT)
         |      AS sy_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN h*h ELSE 0 END) AS BIGINT)
         |      AS sxx_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN h*v ELSE 0 END) AS BIGINT)
         |      AS sxy_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN CAST(v AS DECIMAL(38,0))*v
         |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
         |      AS syy_2
         |  FROM hb GROUP BY 1)
         |SELECT event_type, n_1 AS n1, n_2 AS n2,
         |  ${graft.operators.TimeSeries.chowFSql} AS f_stat,
         |  ${graft.operators.TimeSeries.chowFSql} >
         |    CAST(2.995732 AS DOUBLE) AS significant
         |FROM m""".stripMargin,
    "q_zero_inflation" ->
      s"""WITH e AS (SELECT event_type,
         |    epoch_ms(ts) // 3600000 AS h FROM events),
         |c AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type,
         |    CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS n_buckets,
         |    CAST(COUNT(*) AS BIGINT) AS n_nonzero,
         |    CAST(SUM(c) AS BIGINT) AS n_events
         |  FROM c GROUP BY 1),
         |f AS (SELECT event_type, n_buckets,
         |    CAST(n_buckets - n_nonzero AS BIGINT) AS n_zero, n_events
         |  FROM a)
         |SELECT event_type, n_buckets, n_zero, n_events,
         |  ${graft.operators.TimeSeries.ziScoreSql} AS score_chi2,
         |  ${graft.operators.TimeSeries.ziScoreSql} > 3.841459
         |    AS significant
         |FROM f""".stripMargin,
    "q_drawdown" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    MAX(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM hb),
         |d AS (SELECT event_type, n, run_max - v AS dd, run_max, v, h,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY run_max - v DESC, h) AS rn FROM r),
         |m AS (SELECT event_type, n, CAST(dd AS BIGINT) AS max_dd,
         |    CAST(run_max AS BIGINT) AS peak_v, v AS trough_v,
         |    h AS trough_bucket
         |  FROM d WHERE rn = 1)
         |SELECT event_type, n, max_dd, peak_v, trough_v, trough_bucket,
         |  ${graft.operators.TimeSeries.ddFracSql} AS dd_frac
         |FROM m""".stripMargin,
    "q_bollinger" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) OVER (
         |      PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
         |      AS DECIMAL(38,0)) AS ss
         |  FROM hb)
         |SELECT event_type, h, v, round(CAST(s AS DOUBLE) / 24, 6) AS mid,
         |  ${graft.operators.TimeSeries.bollingerBreachSql(24, 2, hi = true)}
         |    AS breach_hi,
         |  ${graft.operators.TimeSeries.bollingerBreachSql(24, 2, hi = false)}
         |    AS breach_lo
         |FROM r WHERE rn >= 24""".stripMargin,
    "q_rsi" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    v - lag(v) OVER (PARTITION BY event_type ORDER BY h) AS d,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM hb),
         |f AS (SELECT * FROM r WHERE d IS NOT NULL),
         |g AS (SELECT event_type, h, v, rn,
         |    CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER (
         |      PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sg,
         |    CAST(SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER (
         |      PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sl
         |  FROM f)
         |SELECT event_type, h, v, sg, sl,
         |  ${graft.operators.TimeSeries.rsiSql} AS rsi
         |FROM g WHERE rn > 14""".stripMargin,
    "q_stochastic" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    MIN(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lo,
         |    MAX(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS hi
         |  FROM hb),
         |k AS (SELECT event_type, h, v,
         |    ${graft.operators.TimeSeries.stochKMicroSql} AS k_micro
         |  FROM r WHERE rn >= 14),
         |g AS (SELECT event_type, h, v, k_micro,
         |    CAST(COUNT(k_micro) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS d_n,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS f_n,
         |    CAST(SUM(k_micro) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS d_sum
         |  FROM k)
         |SELECT event_type, h, v,
         |  CASE WHEN k_micro IS NOT NULL THEN
         |    round(CAST(k_micro AS DOUBLE) / 1e6, 6) END AS pct_k,
         |  ${graft.operators.TimeSeries.stochDSql} AS pct_d
         |FROM g""".stripMargin,
    "q_vwap" ->
      s"""WITH t AS (SELECT l_returnflag,
         |    CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
         |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS notional_cents,
         |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
         |g AS (SELECT l_returnflag, m,
         |    CAST(COUNT(*) AS BIGINT) AS n_trades,
         |    CAST(SUM(q) AS BIGINT) AS qty,
         |    CAST(SUM(notional_cents) AS BIGINT) AS notional
         |  FROM t GROUP BY 1, 2)
         |SELECT l_returnflag, m, n_trades, qty, notional,
         |  ${graft.operators.TimeSeries.vwapSql} AS vwap
         |FROM g""".stripMargin,
    "q_atr" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) AS ms, event_id,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |b AS (SELECT event_type, (ms // 21600000) * 21600000
         |      AS bar_start_ms,
         |    (ms - 1700000000000) * 100000000 + event_id AS tkey, cents
         |  FROM e),
         |bars AS (SELECT event_type, bar_start_ms, MAX(cents) AS h,
         |    MIN(cents) AS l, arg_max(cents, tkey) AS c
         |  FROM b GROUP BY 1, 2),
         |lg AS (SELECT event_type, bar_start_ms, h, l, c,
         |    lag(c) OVER (PARTITION BY event_type ORDER BY bar_start_ms)
         |      AS __pc,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY bar_start_ms) AS rn
         |  FROM bars),
         |t AS (SELECT event_type, bar_start_ms, rn,
         |    CAST(${graft.operators.TimeSeries.trSql} AS BIGINT) AS tr
         |  FROM lg),
         |g AS (SELECT event_type, bar_start_ms, rn, tr,
         |    CAST(SUM(tr) OVER (PARTITION BY event_type ORDER BY bar_start_ms
         |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS tr_sum
         |  FROM t)
         |SELECT event_type, bar_start_ms, tr,
         |  round(CAST(tr_sum AS DOUBLE) / 8, 6) AS atr
         |FROM g WHERE rn >= 8""".stripMargin,
    "q_kpss" ->
      s"""WITH $hourlyDollarsCte,
         |w AS (SELECT event_type, v,
         |    CAST(COUNT(*) OVER wk AS BIGINT) AS n,
         |    CAST(SUM(v) OVER wk AS BIGINT) AS sv,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) OVER wk
         |      AS DECIMAL(38,0)) AS sxx,
         |    CAST(row_number() OVER wo AS BIGINT) AS t,
         |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS ps
         |  FROM hd WINDOW wk AS (PARTITION BY event_type),
         |    wo AS (PARTITION BY event_type ORDER BY h)),
         |t AS (SELECT event_type, n,
         |    ${graft.operators.TimeSeries.kpssTermNanoSql} AS term FROM w),
         |g AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(SUM(term) AS BIGINT) AS s_nano
         |  FROM t GROUP BY 1)
         |SELECT event_type, n, s_nano,
         |  ${graft.operators.TimeSeries.kpssEtaSql} AS eta,
         |  coalesce(${graft.operators.TimeSeries.kpssEtaSql} > 0.463, false)
         |    AS nonstationary
         |FROM g""".stripMargin,
    "q_dickey_fuller" ->
      s"""WITH $hourlyDollarsCte,
         |d AS (SELECT event_type, v,
         |    lag(v) OVER (PARTITION BY event_type ORDER BY h) AS x
         |  FROM hd),
         |f AS (SELECT event_type, x, v - x AS y FROM d
         |  WHERE x IS NOT NULL),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy
         |  FROM f GROUP BY 1)
         |SELECT event_type, m, sx, sy,
         |  ${graft.operators.TimeSeries.dfBetaSql} AS beta,
         |  ${graft.operators.TimeSeries.dfTSql} AS t_stat,
         |  coalesce(${graft.operators.TimeSeries.dfTSql} < -2.86, false)
         |    AS stationary,
         |  CAST(sxx AS VARCHAR) AS sxx, CAST(sxy AS VARCHAR) AS sxy,
         |  CAST(syy AS VARCHAR) AS syy
         |FROM g""".stripMargin,
    "q_page_hinkley" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS rn,
         |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS sv
         |  FROM hb),
         |t AS (SELECT event_type, h,
         |    ${graft.operators.TimeSeries.phTermMicroSql(100L)} AS term
         |  FROM r),
         |p AS (SELECT event_type, h,
         |    CAST(SUM(term) OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS ph
         |  FROM t),
         |gaps AS (SELECT event_type, h,
         |    ph - CAST(MIN(ph) OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS gap
         |  FROM p),
         |fl AS (SELECT event_type, h, gap,
         |    gap > CAST(50000 AS BIGINT) * 1000000 AS alarm FROM gaps)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  MAX(alarm) AS drift,
         |  CAST(MIN(CASE WHEN alarm THEN h END) AS BIGINT)
         |    AS first_alarm_bucket,
         |  round(CAST(MAX(gap) AS BIGINT) / 1e6, 6) AS max_gap
         |FROM fl GROUP BY 1""".stripMargin,
    "q_forecast_accuracy" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS rn,
         |    lag(v, 24) OVER (PARTITION BY event_type ORDER BY h) AS yf,
         |    lag(v, 1) OVER (PARTITION BY event_type ORDER BY h) AS ys
         |  FROM hb),
         |t AS (SELECT event_type, v, yf, ys,
         |    ${graft.operators.TimeSeries.smapeTermMicroSql} AS sm_term
         |  FROM r WHERE rn > 24),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(ABS(v - yf)) AS BIGINT) AS sae,
         |    CAST(SUM((v - yf) * (v - yf)) AS BIGINT) AS sse,
         |    CAST(SUM(ABS(v - ys)) AS BIGINT) AS sas,
         |    CAST(SUM(sm_term) AS BIGINT) AS sm_sum,
         |    CAST(COUNT(sm_term) AS BIGINT) AS sm_n
         |  FROM t GROUP BY 1)
         |SELECT event_type, n, sae, sse, sas, sm_sum, sm_n,
         |  round(CAST(sae AS DOUBLE) / n, 6) AS mae,
         |  round(sqrt(CAST(sse AS DOUBLE) / n), 6) AS rmse,
         |  ${graft.operators.TimeSeries.smapeSql} AS smape,
         |  ${graft.operators.TimeSeries.maseSql} AS mase
         |FROM g""".stripMargin,
    "q_elasticity" ->
      s"""WITH li AS (SELECT p_brand,
         |    CAST(round(1000 * ln(CAST(l_quantity AS DOUBLE)), 0)
         |      AS BIGINT) AS y,
         |    CAST(round(1000 * ln(CAST(ROUND(l_extendedprice*100, 0)
         |      AS BIGINT) / CAST(l_quantity AS DOUBLE)), 0) AS BIGINT) AS x
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |g AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy
         |  FROM li GROUP BY 1)
         |SELECT p_brand, m AS n,
         |  ${graft.operators.TimeSeries.dfBetaSql} AS slope,
         |  ${graft.operators.TimeSeries.elasticityR2Sql} AS r2
         |FROM g""".stripMargin,
    "q_seasonal_anomaly" ->
      s"""WITH $decomposeCtes,
         |rm AS (SELECT event_type, h,
         |    CAST(round(remainder * 1e6, 0) AS BIGINT) AS r_micro
         |  FROM dc),
         |m AS (SELECT event_type, quantile_cont(r_micro, 0.5) AS med
         |  FROM rm GROUP BY 1),
         |d AS (SELECT rm.event_type, h, r_micro, med,
         |    ABS(r_micro - med) AS rawdev
         |  FROM rm JOIN m USING (event_type)),
         |md AS (SELECT event_type, quantile_cont(rawdev, 0.5) AS mad
         |  FROM d GROUP BY 1)
         |SELECT d.event_type, h, r_micro, round(med, 6) AS med,
         |  round(mad, 6) AS mad, round(rawdev, 6) AS dev,
         |  (mad > 0 AND rawdev > 5 * mad) AS anomaly
         |FROM d JOIN md USING (event_type)
         |ORDER BY rawdev DESC, d.event_type, h LIMIT 20""".stripMargin,
    "q_macd" ->
      s"""WITH $hourlySpendCte,
         |w1 AS (SELECT event_type, h, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS rn,
         |    list(CAST(v AS DOUBLE)) OVER (PARTITION BY event_type
         |      ORDER BY h ROWS BETWEEN 59 PRECEDING AND CURRENT ROW) AS vs
         |  FROM hb),
         |m AS (SELECT event_type, h, v, rn,
         |    round(${graft.operators.TimeSeries.emaFoldDuckSql("vs",
              graft.operators.TimeSeries.emaAlpha(12))} -
         |      ${graft.operators.TimeSeries.emaFoldDuckSql("vs",
              graft.operators.TimeSeries.emaAlpha(26))}, 6) AS macd
         |  FROM w1),
         |m2 AS (SELECT event_type, h, v, rn, macd,
         |    list(macd) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 59 PRECEDING AND CURRENT ROW) AS ms
         |  FROM m),
         |sg AS (SELECT event_type, h, v, rn, macd,
         |    round(${graft.operators.TimeSeries.emaFoldDuckSql("ms",
              graft.operators.TimeSeries.emaAlpha(9))}, 6) AS signal
         |  FROM m2),
         |hh AS (SELECT event_type, h, v, rn, macd, signal,
         |    ${graft.operators.TimeSeries.macdHistSql} AS histogram
         |  FROM sg),
         |cc AS (SELECT *, lag(histogram) OVER (PARTITION BY event_type
         |    ORDER BY h) AS __ph FROM hh)
         |SELECT event_type, h, v, macd, signal, histogram,
         |  ${graft.operators.TimeSeries.macdCrossSql} AS crossover
         |FROM cc WHERE rn >= 26""".stripMargin,
    "q_seasonal_decompose" ->
      s"""WITH $decomposeCtes
         |SELECT event_type, h, v, phase, trend, seasonal, remainder
         |FROM dc""".stripMargin,
    "q_seasonal_strength" ->
      s"""WITH $decomposeCtes,
         |mi AS (SELECT event_type,
         |    CAST(round(remainder * 1e6, 0) AS BIGINT) AS r_mi,
         |    CAST(round(seasonal * 1e6, 0) AS BIGINT) +
         |      CAST(round(remainder * 1e6, 0) AS BIGINT) AS sr_mi,
         |    CAST(round(trend * 1e6, 0) AS BIGINT) +
         |      CAST(round(remainder * 1e6, 0) AS BIGINT) AS tr_mi
         |  FROM dc),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(r_mi) AS BIGINT) AS s_r,
         |    CAST(SUM(CAST(r_mi AS DECIMAL(38,0)) * r_mi)
         |      AS DECIMAL(38,0)) AS q_r,
         |    CAST(SUM(sr_mi) AS BIGINT) AS s_sr,
         |    CAST(SUM(CAST(sr_mi AS DECIMAL(38,0)) * sr_mi)
         |      AS DECIMAL(38,0)) AS q_sr,
         |    CAST(SUM(tr_mi) AS BIGINT) AS s_tr,
         |    CAST(SUM(CAST(tr_mi AS DECIMAL(38,0)) * tr_mi)
         |      AS DECIMAL(38,0)) AS q_tr
         |  FROM mi GROUP BY 1)
         |SELECT event_type, n,
         |  ${graft.operators.TimeSeries.strengthSql("sr")} AS f_seasonal,
         |  ${graft.operators.TimeSeries.strengthSql("tr")} AS f_trend
         |FROM g""".stripMargin,
    "q_matrix_profile" -> matrixProfileOracle,
    "q_ar_forecast" -> arForecastOracle,
    "q_poisson_trend" -> poissonTrendOracle,
  )
}
