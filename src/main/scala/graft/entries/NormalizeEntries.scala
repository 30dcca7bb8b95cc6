package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Normalize-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object NormalizeEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ab_test" -> ((s, dir) => {
      // A/B experiment readout: deterministic even/odd user split, Welch t
      // per event_type from exact integer moments — ONE conditional-sum
      // aggregate over the scan, no join, no window.
      val ev = table(s, dir, "events")
        .select(col("event_type"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("arm"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.welchTTest(ev, "event_type", "arm", "cents")
    }),
    "q_winsorize" -> ((s, dir) => {
      // Per-type outlier clipping at the exact interpolated [p10, p90] —
      // the normalization step before a metric can gate or weight rows.
      // One tiny per-group quantile agg broadcast back onto the unshuffled
      // scan (Normalize.winsorize): narrow map + broadcast join at 100 TB.
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.winsorize(ev, "event_type", "cents", 0.1, 0.9)
        .select(col("event_id"), col("event_type"), col("cents"), col("v_wins"))
    }),
    "q_zscore_norm" -> ((s, dir) => {
      // Per-source z-score of doc token counts from EXACT integer moments
      // (n, Σx, Σx²) — aggregation-order-independent, unlike a distributed
      // float mean/stddev. Same broadcast-stats-back shape as q_winsorize.
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Normalize.zscore(d, "source", "n_tokens")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("z"))
    }),
    "q_quantile_norm" -> ((s, dir) => {
      // EXACT quantile normalization: each event type's spend
      // distribution mapped onto the pooled distribution — two prefix-sum
      // CDFs + a binned range join for the position lookup (no BNLJ).
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.quantileNormalize(ev, "event_type", "cents")
    }),
    "q_impute" -> ((s, dir) =>
      // Median-imputation audit: nulls planted deterministically
      // (event_id % 97), filled with the per-type exact lower median via
      // the weighted-median prefix-sum kernel; summary row per type.
      graft.operators.Normalize.imputeMedianSummary(
        table(s, dir, "events").select(col("event_type"),
          when(pmod(col("event_id"), lit(97L)) === 0L, lit(null))
            .otherwise(round(col("value") * 100, 0).cast("long"))
            .as("cents")),
        "event_type", "cents")),
    "q_effect_size" -> ((s, dir) => {
      // HOW BIG is the parity-arm spend shift per event type, in SD
      // units: Cohen's d (pooled), Hedges' g (small-sample corrected),
      // Glass's delta (control SD) — the magnitude companion to
      // q_ab_test's t; exact moment row, shared-SQL chain.
      val ev = table(s, dir, "events").select(col("event_type"),
        (pmod(col("user_id"), lit(2L)) === 0L).as("arm"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.effectSize(ev, "event_type", "arm", "cents")
    }),
    "q_pairwise_welch" -> ((s, dir) =>
      // WHICH event types differ in mean cents (parametric post-hoc,
      // the Dunn twin): pairwise Welch t off the exact moment table,
      // A-S normal p, Bonferroni across the 10 pairs.
      Normalize.pairwiseWelch(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_jarque_bera" -> ((s, dir) =>
      // Is per-type cent value remotely normal? JB from exact raw
      // moments (DECIMAL x^3/x^4) — the gate before any ±2σ rule.
      Normalize.jarqueBera(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_bartlett" -> ((s, dir) =>
      // Do the five types share a variance (the ANOVA precondition)?
      // Bartlett B with the small-sample correction, per-group terms
      // milli/nano-quantized; compare with q_brown_forsythe's robust
      // answer.
      Normalize.bartlett(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_welch_anova" -> ((s, dir) => {
      // Do mean user-day spends differ across event types WITHOUT
      // assuming equal variances (which q_bartlett shows they don't
      // have)? Welch's F per day-of-week over per-(user, type) totals.
      val obs = table(s, dir, "events")
        .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
          col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      graft.operators.Normalize.welchAnova(
        obs, "dow", "event_type", "cents")
    }),
    "q_anderson_darling" -> ((s, dir) => {
      // Are hourly spends normal? AD weights the CDF distance by
      // 1/(F(1-F)) so tail departures q_jarque_bera smears show up.
      // DOLLARS, not cents: keeps Σx² exactly double-representable.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.Normalize.andersonDarling(hourly, "event_type", "v")
    }),
    "q_conover" -> ((s, dir) => {
      // Conover squared-ranks variance-homogeneity test across event
      // types — the rank-based sibling of q_bartlett/q_levene: median-
      // centered integer deviations, normalized micro-quantized squared
      // midranks, chi2(k-1) referral.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Normalize.conoverSquaredRanks(
        ev, "event_type", "cents")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_effect_size" ->
      s"""WITH e AS (SELECT event_type, user_id % 2 = 0 AS arm,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |m AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN arm THEN x ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(SUM(CASE WHEN arm THEN x*x ELSE 0 END) AS BIGINT) AS sq_a,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE x END) AS BIGINT) AS s_b,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE x*x END) AS BIGINT) AS sq_b
         |  FROM e GROUP BY 1)
         |SELECT event_type, n_a, s_a, sq_a, n_b, s_b, sq_b,
         |  ${graft.operators.Normalize.cohensDSql} AS cohens_d,
         |  ${graft.operators.Normalize.hedgesGSql} AS hedges_g,
         |  ${graft.operators.Normalize.glassDeltaSql} AS glass_delta
         |FROM m""".stripMargin,
    "q_pairwise_welch" -> {
      val t = graft.operators.Normalize.pwWelchTSql
      val p = graft.operators.Profiling.normalPSql(t)
      s"""WITH e AS (SELECT event_type AS grp,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x*x) AS BIGINT) AS sq
         |  FROM e GROUP BY 1 HAVING COUNT(*) > 1),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM g),
         |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
         |    a.n AS n_a, a.s AS s_a, a.sq AS sq_a,
         |    b.n AS n_b, b.s AS s_b, b.sq AS sq_b, k
         |  FROM g a JOIN g b ON a.grp < b.grp, kk)
         |SELECT grp_a, grp_b, n_a, n_b, $t AS t,
         |  round($p, 6) AS p_normal,
         |  round($p, 6) < 0.05 / (k * (k - 1) / 2) AS significant
         |FROM pairs""".stripMargin
    },
    "q_jarque_bera" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS s1,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS s3,
         |    CAST(SUM((CAST(x*x AS DECIMAL(38,0)) * x) * x)
         |      AS DECIMAL(38,0)) AS s4
         |  FROM e GROUP BY 1),
         |b AS (SELECT event_type, n, s1, s2, s3, s4,
         |    ${graft.operators.Normalize.jbSkewSql} AS skewness,
         |    ${graft.operators.Normalize.jbKurtSql} AS kurtosis_excess
         |  FROM a)
         |SELECT event_type, n, s1, CAST(s2 AS VARCHAR) AS s2,
         |  CAST(s3 AS VARCHAR) AS s3, CAST(s4 AS VARCHAR) AS s4,
         |  skewness, kurtosis_excess,
         |  ${graft.operators.Normalize.jbSql} AS jb,
         |  ${graft.operators.Normalize.jbSql} > 5.991465 AS significant
         |FROM b""".stripMargin,
    "q_bartlett" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |g0 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(x) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sqg
         |  FROM e GROUP BY 1),
         |g1 AS (SELECT *, ${graft.operators.Normalize.bartlettVarSql}
         |    AS var_g FROM g0 WHERE ng > 1),
         |g AS (SELECT * FROM g1 WHERE var_g > 0),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(${graft.operators.Normalize.bartlettPoolMilliSql})
         |      AS BIGINT) AS pool_milli,
         |    CAST(SUM(${graft.operators.Normalize.bartlettLnMilliSql})
         |      AS BIGINT) AS ln_milli,
         |    CAST(SUM(${graft.operators.Normalize.bartlettInvNanoSql})
         |      AS BIGINT) AS inv_nano FROM g)
         |SELECT k, n, pool_milli, ln_milli, inv_nano,
         |  ${graft.operators.Normalize.bartlettSql} AS bartlett_stat,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS chi2_crit,
         |  ${graft.operators.Normalize.bartlettSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_ab_test" ->
      // Welch t assembled from exact BIGINT moments; the double expression
      // mirrors Normalize.welchTTest term-for-term (variance =
      // (Σx² − Σx·mean) / (n−1) in DOUBLE — the integer n·Σx² form
      // overflows long at scale and DuckDB would widen to HUGEINT).
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c * c ELSE 0 END) AS BIGINT) AS sq_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE c END) AS BIGINT) AS s_b,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE c * c END) AS BIGINT) AS sq_b
        |  FROM (SELECT event_type, user_id,
        |          CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events)
        |  GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |  round(CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / n_a END, 6) AS mean_a,
        |  round(CASE WHEN n_b > 0 THEN CAST(s_b AS DOUBLE) / n_b END, 6) AS mean_b,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND
        |      (CAST(sq_a AS DOUBLE) - CAST(s_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)) / CAST(n_a - 1 AS DOUBLE) / n_a +
        |      (CAST(sq_b AS DOUBLE) - CAST(s_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)) / CAST(n_b - 1 AS DOUBLE) / n_b > 0
        |    THEN (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) /
        |      sqrt((CAST(sq_a AS DOUBLE) - CAST(s_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)) / CAST(n_a - 1 AS DOUBLE) / n_a +
        |           (CAST(sq_b AS DOUBLE) - CAST(s_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)) / CAST(n_b - 1 AS DOUBLE) / n_b)
        |  END, 6) AS t
        |FROM m""".stripMargin,
    // q_stream_psi_drift computes the same counts from a streamed current
    // sample and composes through the identical PSI assembly — one
    // formula, one shared oracle (psiDriftOracle val)
    "q_winsorize" ->
      """WITH c AS (
        |  SELECT event_id, event_type,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |q AS (
        |  SELECT event_type, quantile_cont(cents, 0.1) AS lo,
        |    quantile_cont(cents, 0.9) AS hi
        |  FROM c GROUP BY 1)
        |SELECT event_id, c.event_type, cents,
        |  round(least(greatest(CAST(cents AS DOUBLE), lo), hi), 6) AS v_wins
        |FROM c JOIN q ON q.event_type = c.event_type""".stripMargin,
    "q_zscore_norm" ->
      // Population variance from exact BIGINT moments; the double
      // expression tree mirrors Normalize.zscore term-for-term so both
      // engines run the identical IEEE sequence.
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_tokens) AS BIGINT) AS s,
        |    CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS sq
        |  FROM d GROUP BY 1)
        |SELECT doc_id, d.source, n_tokens,
        |  CASE WHEN CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
        |    THEN round((CAST(n_tokens AS DOUBLE) - CAST(s AS DOUBLE) / n) /
        |      sqrt(CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6)
        |  END AS z
        |FROM d JOIN m ON m.source = d.source""".stripMargin,
    "q_quantile_norm" ->
      """WITH e AS (SELECT event_type AS g,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |perg AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS nv FROM e GROUP BY 1, 2),
        |cg AS (SELECT g, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum FROM perg),
        |ng AS (SELECT g, CAST(SUM(nv) AS BIGINT) AS n_g FROM perg GROUP BY g),
        |perp AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nvp FROM e GROUP BY v),
        |cp AS (SELECT v, nvp, CAST(SUM(nvp) OVER (ORDER BY v) AS BIGINT) AS cump FROM perp),
        |np AS (SELECT CAST(SUM(nvp) AS BIGINT) AS n_pool FROM perp),
        |req AS (SELECT g, v, nv,
        |    greatest(((2*cum - nv + 1) * n_pool + 2*n_g - 1) // (2*n_g), 1) AS pos
        |  FROM cg JOIN ng USING (g), np)
        |SELECT req.g AS event_type, req.v, req.nv, CAST(pos AS BIGINT) AS pos,
        |  cp.v AS v_norm
        |FROM req JOIN cp ON pos - 1 >= cump - nvp AND pos - 1 < cump""".stripMargin,
    "q_impute" ->
      """WITH e AS (SELECT event_type, CASE WHEN event_id % 97 = 0 THEN NULL
        |    ELSE CAST(ROUND(value*100, 0) AS BIGINT) END AS cents
        |  FROM events),
        |per AS (SELECT event_type, cents AS v, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM e WHERE cents IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, v, w, CAST(SUM(w) OVER (
        |    PARTITION BY event_type ORDER BY v) AS BIGINT) AS cw FROM per),
        |tot AS (SELECT event_type, CAST(SUM(w) AS BIGINT) AS wt
        |  FROM per GROUP BY 1),
        |med AS (SELECT c.event_type, CAST(MIN(v) AS BIGINT) AS imputed_median
        |  FROM c JOIN tot USING (event_type) WHERE 2*cw >= wt GROUP BY 1),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_missing,
        |    CAST(SUM(COALESCE(cents, 0)) AS BIGINT) AS sum_present
        |  FROM e GROUP BY 1)
        |SELECT st.event_type, n, n_missing, sum_present, imputed_median,
        |  sum_present + n_missing * imputed_median AS sum_after
        |FROM st JOIN med USING (event_type)""".stripMargin,
    "q_welch_anova" ->
      s"""WITH obs AS (SELECT
         |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS x
         |  FROM events GROUP BY dayofweek(ts), event_type, user_id),
         |g0 AS (SELECT dow, event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(x) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS sqg
         |  FROM obs GROUP BY 1, 2),
         |g1 AS (SELECT *, ${graft.operators.Normalize.bartlettVarSql}
         |    AS var_g FROM g0 WHERE ng > 1),
         |g2 AS (SELECT * FROM g1 WHERE var_g > 0),
         |g AS (SELECT *, ${graft.operators.Normalize.waWNanoSql}
         |    AS w_nano FROM g2),
         |gw AS (SELECT *, ${graft.operators.Normalize.waWmMicroSql}
         |    AS wm_micro FROM g),
         |per AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(w_nano) AS BIGINT) AS w_sum_nano,
         |    CAST(SUM(wm_micro) AS BIGINT) AS wm_sum_micro
         |  FROM gw GROUP BY 1),
         |jn AS (SELECT gw.*, per.k, per.n, per.w_sum_nano,
         |    per.wm_sum_micro
         |  FROM gw JOIN per ON gw.dow = per.dow),
         |t AS (SELECT *, ${graft.operators.Normalize.waAMicroSql}
         |    AS a_micro, ${graft.operators.Normalize.waLNanoSql}
         |    AS l_nano FROM jn),
         |f AS (SELECT dow, CAST(MAX(k) AS BIGINT) AS k,
         |    CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(SUM(a_micro) AS BIGINT) AS a_sum_micro,
         |    CAST(SUM(l_nano) AS BIGINT) AS l_sum_nano
         |  FROM t GROUP BY 1)
         |SELECT dow, k, n, a_sum_micro, l_sum_nano,
         |  ${graft.operators.Normalize.waFSql} AS f_stat,
         |  CAST(k - 1 AS BIGINT) AS df1,
         |  ${graft.operators.Normalize.waDf2Sql} AS df2,
         |  ${graft.operators.Normalize.waFSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")} / (k - 1)
         |    AS significant
         |FROM f""".stripMargin,
    "q_anderson_darling" ->
      s"""WITH $hourlyDollarsCte,
         |w AS (SELECT event_type, v,
         |    CAST(COUNT(*) OVER wk AS BIGINT) AS n,
         |    CAST(SUM(v) OVER wk AS BIGINT) AS sx,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) OVER wk
         |      AS DECIMAL(38,0)) AS sxx,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS r
         |  FROM hd WINDOW wk AS (PARTITION BY event_type)),
         |t AS (SELECT event_type, n,
         |    ${graft.operators.Normalize.adTermSql} AS term FROM w),
         |g AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(SUM(term) AS BIGINT) AS s_micro
         |  FROM t GROUP BY 1),
         |a AS (SELECT event_type, n, s_micro,
         |    ${graft.operators.Normalize.adA2Sql} AS a2 FROM g)
         |SELECT event_type, n, s_micro, a2,
         |  ${graft.operators.Normalize.adAStarSql} AS a2_star,
         |  coalesce(${graft.operators.Normalize.adAStarSql} > 0.787, false)
         |    AS significant
         |FROM a""".stripMargin,
    "q_conover" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM per),
         |ma AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS m_lo
         |  FROM c WHERE cum >= (n + 1) // 2 GROUP BY 1),
         |mb AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS m_hi
         |  FROM c WHERE cum >= (n + 2) // 2 GROUP BY 1),
         |med AS (SELECT ma.event_type, m_lo + m_hi AS m2
         |  FROM ma JOIN mb USING (event_type)),
         |u AS (SELECT e.event_type, ABS(2 * e.v - m2) AS u
         |  FROM e JOIN med USING (event_type)),
         |pu AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS cnt_u
         |  FROM u GROUP BY 1),
         |rk AS (SELECT u, cnt_u,
         |    CAST(SUM(cnt_u) OVER (ORDER BY u) AS BIGINT) AS cum_cnt_u,
         |    CAST(SUM(cnt_u) OVER () AS BIGINT) AS nn FROM pu),
         |aa AS (SELECT u, cnt_u, nn,
         |    ${graft.operators.Normalize.conoverAMicroSql} AS a
         |  FROM (SELECT *, 2 * cum_cnt_u - cnt_u + 1 AS r2 FROM rk)),
         |pg AS (SELECT ug.event_type,
         |    CAST(SUM(ug.c_gu * aa.a) AS BIGINT) AS s_g,
         |    CAST(SUM(ug.c_gu) AS BIGINT) AS n_g
         |  FROM (SELECT event_type, u, CAST(COUNT(*) AS BIGINT) AS c_gu
         |      FROM u GROUP BY 1, 2) ug
         |    JOIN aa ON aa.u = ug.u
         |  GROUP BY 1),
         |pt AS (SELECT event_type, s_g, n_g,
         |    CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g, 0) AS BIGINT)
         |      AS term FROM pg),
         |tt AS (SELECT CAST(MAX(nn) AS BIGINT) AS n,
         |    CAST(SUM(cnt_u * a * a) AS BIGINT) AS sa2 FROM aa),
         |gg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(term) AS BIGINT) AS st,
         |    CAST(SUM(s_g) AS BIGINT) AS s_tot FROM pt)
         |SELECT n, k, st, s_tot, sa2,
         |  ${graft.operators.Normalize.conoverTSql} AS t_conover,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS chi2_crit,
         |  coalesce(${graft.operators.Normalize.conoverTSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}, false)
         |    AS significant
         |FROM gg, tt""".stripMargin,
  )
}
