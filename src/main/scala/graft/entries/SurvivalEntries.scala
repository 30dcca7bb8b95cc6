package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Survival-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object SurvivalEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cum_incidence" -> ((s, dir) => {
      // Aalen-Johansen competing-risks cumulative incidence: per user
      // the FIRST of error (cause 1) vs signup (cause 2) from first
      // activity, censored (0) at the last event when neither occurs;
      // CIFs per parity cohort — what 1-KM would overstate.
      val agg = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          col("event_type"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("event_type") === "error", col("ms"))).as("e_ms"),
          min(when(col("event_type") === "signup", col("ms"))).as("s_ms"))
      val subj = agg.select(
        concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
        expr("(coalesce(least(coalesce(e_ms, s_ms), " +
          "coalesce(s_ms, e_ms)), last_ms) - first_ms) div 3600000")
          .as("t_hours"),
        expr("CASE WHEN e_ms IS NULL AND s_ms IS NULL THEN 0 " +
          "WHEN s_ms IS NULL OR (e_ms IS NOT NULL AND e_ms <= s_ms) " +
          "THEN 1 ELSE 2 END").as("cause"))
      graft.operators.Survival.cumulativeIncidence(
        subj, "cohort", "t_hours", "cause")
    }),
    "q_kaplan_meier" -> ((s, dir) => {
      // Time-to-first-error per user (hours from first activity),
      // right-censored at the last observed event for error-free users;
      // KM curves per parity cohort — exact nano-log survival products.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.kaplanMeier(users, "cohort", "t_hours", "event")
    }),
    "q_logrank" -> ((s, dir) => {
      // Do the parity cohorts' time-to-error curves differ? Two-group
      // log-rank chi-square from exact risk sets + nano-quantized
      // per-time (O-E)/V terms.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select((pmod(col("user_id"), lit(2L)) === 0L).as("even_cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.logRank(users, "even_cohort", "t_hours", "event")
    }),
    "q_rmst" -> ((s, dir) => {
      // Expected error-free hours in the first 14 days per cohort:
      // area under the KM curve to tau=336 — micro-quantized step
      // rectangles over the rounded survival column.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.rmst(users, "cohort", "t_hours", "event", tau = 336L)
    }),
    "q_harrell_c" -> ((s, dir) => {
      // Does spend ORDER the error failures (survival-side AUC)?
      // Exact pair counts on the aggregated user table — the kendall
      // O(n^2)-on-units regime with the bounded guard.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"),
          sum(col("cents")).as("spend"))
        .select(col("user_id"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"), col("spend"))
      Survival.harrellC(users, "user_id", "t_hours", "event", "spend")
    }),
    "q_life_table" -> ((s, dir) => {
      // Actuarial daily life table for time-to-first-error per parity
      // cohort: half-censoring exposure in doubled integers, nano-log
      // survival products.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.lifeTable(users, "cohort", "t_hours", "event", width = 24L)
    }),
    "q_cox" -> ((s, dir) => {
      // Does spend change the error hazard? Cox PH on time-to-first-
      // error (censored at last activity), covariate = total spend:
      // 3 fixed Newton steps on micro-quantized risk-set sums.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"),
          sum(col("cents")).as("spend"))
        .select(
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"), col("spend"))
      Survival.coxPH(users, "t_hours", "event", "spend")
    }),
    "q_nelson_aalen" -> ((s, dir) => {
      // Cumulative hazard of first error per parity cohort — the
      // additive twin of q_kaplan_meier on the same subject table:
      // exact nano hazard increments + Breslow survival.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.nelsonAalen(users, "cohort", "t_hours", "event")
    }),
    "q_weibull_fit" -> ((s, dir) => {
      // Parametric Weibull summary of the q_kaplan_meier curves:
      // shape/scale per cohort from the probability-plot regression
      // over the interior KM steps (exact micro moments).
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.weibullFit(users, "cohort", "t_hours", "event")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_rmst" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT grp, t, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, t, d, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |s AS (SELECT grp, t, d, n_grp - cum_m + m AS n_at_risk FROM r),
         |f AS (SELECT grp, t, d, n_at_risk,
         |    ${graft.operators.Survival.kmLnNanoSql} AS ln_nano,
         |    ${graft.operators.Survival.kmZeroFlagSql} AS zf FROM s),
         |c AS (SELECT grp, t, d,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY t)
         |      AS BIGINT) AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_zf
         |  FROM f),
         |km AS (SELECT grp, t,
         |    ${graft.operators.Survival.kmSurvivalSql} AS survival
         |  FROM c WHERE d > 0),
         |st AS (SELECT grp, t, survival,
         |    lead(t) OVER (PARTITION BY grp ORDER BY t) AS next_t
         |  FROM km),
         |rect AS (SELECT grp, t,
         |    ${graft.operators.Survival.rmstRectMicroSql(336L)}
         |      AS rect_micro FROM st),
         |a AS (SELECT grp, CAST(MIN(t) AS BIGINT) AS t_first,
         |    CAST(COUNT(*) AS BIGINT) AS n_steps,
         |    CAST(SUM(rect_micro) AS BIGINT) AS steps_micro
         |  FROM rect GROUP BY 1)
         |SELECT grp, CAST(336 AS BIGINT) AS tau, n_steps,
         |  round(least(CAST(t_first AS DOUBLE), 336) +
         |    CAST(steps_micro AS DOUBLE) / 1000000, 6) AS rmst
         |FROM a""".stripMargin,
    "q_harrell_c" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms,
         |    CAST(SUM(cents) AS BIGINT) AS spend
         |  FROM u GROUP BY 1),
         |subj AS (SELECT user_id AS id,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev,
         |    spend AS sc FROM agg),
         |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS comparable,
         |    CAST(SUM(CASE WHEN a.sc > b.sc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS concordant,
         |    CAST(SUM(CASE WHEN a.sc = b.sc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tied_score
         |  FROM subj a JOIN subj b
         |    ON (a.t < b.t AND a.ev = 1)
         |    OR (a.t = b.t AND a.ev = 1 AND b.ev = 0))
         |SELECT comparable, concordant, tied_score,
         |  ${graft.operators.Survival.harrellCSql} AS c_index
         |FROM p""".stripMargin,
    "q_life_table" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    ((COALESCE(err_ms, last_ms) - first_ms) // 3600000) // 24
         |      AS iv,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT grp, iv, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, iv, d, c, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY iv) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |s AS (SELECT grp, iv, d, c, n_grp - cum_m + m AS n_enter FROM r),
         |f AS (SELECT grp, iv, d, c, n_enter,
         |    ${graft.operators.Survival.ltLnNanoSql} AS ln_nano,
         |    ${graft.operators.Survival.ltZeroFlagSql} AS zf FROM s),
         |cc AS (SELECT grp, iv, d, c, n_enter,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY iv)
         |      AS BIGINT) AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY iv) AS BIGINT)
         |      AS cum_zf
         |  FROM f)
         |SELECT grp, CAST(iv * 24 AS BIGINT) AS interval_start, n_enter,
         |  d, c, ${graft.operators.Survival.ltQSql} AS q,
         |  ${graft.operators.Survival.kmSurvivalSql} AS survival
         |FROM cc""".stripMargin,
    "q_cox" -> {
      import graft.operators.Survival.{coxTermSql, coxUNanoSql, coxINanoSql, coxStepSql, coxSdSql}
      val steps = (1 to 3).map { i =>
        s"""p$i AS (SELECT beta, t,
           |    CAST(SUM(${coxTermSql("w")}) AS BIGINT) AS w_m,
           |    CAST(SUM(${coxTermSql("w * z")}) AS BIGINT) AS wz_m,
           |    CAST(SUM(${coxTermSql("w * z * z")}) AS BIGINT) AS wzz_m,
           |    CAST(SUM(ev) AS BIGINT) AS d,
           |    CAST(SUM(${coxTermSql("ev * z")}) AS BIGINT) AS evz_m
           |  FROM z CROSS JOIN b${i - 1} GROUP BY beta, t),
           |s$i AS (SELECT beta, t, d, evz_m,
           |    CAST(SUM(w_m) OVER (ORDER BY t DESC) AS BIGINT) AS cum_w_m,
           |    CAST(SUM(wz_m) OVER (ORDER BY t DESC) AS BIGINT)
           |      AS cum_wz_m,
           |    CAST(SUM(wzz_m) OVER (ORDER BY t DESC) AS BIGINT)
           |      AS cum_wzz_m
           |  FROM p$i),
           |a$i AS (SELECT beta,
           |    CAST(SUM($coxUNanoSql) AS BIGINT) AS u_n,
           |    CAST(SUM($coxINanoSql) AS BIGINT) AS i_n
           |  FROM s$i WHERE d > 0 GROUP BY beta),
           |b$i AS (SELECT $coxStepSql AS beta FROM a$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH users AS (SELECT user_id, MIN(epoch_ms(ts)) AS first_ms,
         |    MAX(epoch_ms(ts)) AS last_ms,
         |    MIN(CASE WHEN event_type = 'error' THEN epoch_ms(ts) END)
         |      AS err_ms,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend
         |  FROM events GROUP BY 1),
         |subj AS (SELECT
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev,
         |    spend AS __s FROM users),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__s) AS BIGINT) AS ss,
         |    CAST(SUM(__s*__s) AS BIGINT) AS ssq FROM subj),
         |z0 AS (SELECT t, ev, ${graft.operators.Eval.plattZSql} AS z
         |  FROM subj, mm),
         |z AS MATERIALIZED (SELECT t, ev, z FROM z0 WHERE z IS NOT NULL),
         |b0 AS (SELECT CAST(0 AS DOUBLE) AS beta),
         |$steps,
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_fit,
         |    CAST(SUM(ev) AS BIGINT) AS events FROM z)
         |SELECT n_fit, events, round(beta, 6) AS beta_per_sd,
         |  CASE WHEN beta IS NOT NULL THEN round(EXP(beta), 6) END
         |    AS hazard_ratio_per_sd,
         |  CASE WHEN beta IS NOT NULL THEN
         |    round(EXP(beta / ($coxSdSql)), 6) END
         |    AS hazard_ratio_per_unit
         |FROM b3, tot, mm""".stripMargin
    },
    "q_cum_incidence" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms, event_type
         |  FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN event_type = 'error' THEN ms END) AS e_ms,
         |    MIN(CASE WHEN event_type = 'signup' THEN ms END) AS s_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    (COALESCE(LEAST(COALESCE(e_ms, s_ms), COALESCE(s_ms, e_ms)),
         |      last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN e_ms IS NULL AND s_ms IS NULL THEN 0
         |      WHEN s_ms IS NULL OR (e_ms IS NOT NULL AND e_ms <= s_ms)
         |      THEN 1 ELSE 2 END AS cause
         |  FROM agg),
         |per AS (SELECT grp, t,
         |    CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d1,
         |    CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d2,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, t, d1, d2, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |sx AS (SELECT grp, t, d1, d2, d1 + d2 AS d,
         |    n_grp - cum_m + m AS n_at_risk FROM r),
         |f AS (SELECT grp, t, d1, d2, n_at_risk,
         |    ${graft.operators.Survival.kmLnNanoSql} AS ln_nano,
         |    ${graft.operators.Survival.kmZeroFlagSql} AS zf FROM sx),
         |c AS (SELECT grp, t, d1, d2, n_at_risk, ln_nano, zf,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY t)
         |      AS BIGINT) AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_zf
         |  FROM f),
         |i AS (SELECT grp, t, d1, d2, n_at_risk,
         |    ${graft.operators.Survival.ajIncMicroSql("d1")}
         |      AS inc1_micro,
         |    ${graft.operators.Survival.ajIncMicroSql("d2")}
         |      AS inc2_micro
         |  FROM c)
         |SELECT grp, t, n_at_risk, d1, d2,
         |  round(CAST(SUM(inc1_micro) OVER (PARTITION BY grp ORDER BY t)
         |    AS DOUBLE) / 1e6, 6) AS cif1,
         |  round(CAST(SUM(inc2_micro) OVER (PARTITION BY grp ORDER BY t)
         |    AS DOUBLE) / 1e6, 6) AS cif2
         |FROM i QUALIFY d1 + d2 > 0""".stripMargin,
    "q_kaplan_meier" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT grp, t, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, t, d, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |s AS (SELECT grp, t, d, n_grp - cum_m + m AS n_at_risk FROM r),
         |f AS (SELECT grp, t, d, n_at_risk,
         |    ${graft.operators.Survival.kmLnNanoSql} AS ln_nano,
         |    ${graft.operators.Survival.kmZeroFlagSql} AS zf FROM s),
         |c AS (SELECT grp, t, d, n_at_risk,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_zf
         |  FROM f)
         |SELECT grp, t, n_at_risk, d,
         |  ${graft.operators.Survival.kmSurvivalSql} AS survival
         |FROM c WHERE d > 0""".stripMargin,
    "q_logrank" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g1,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(SUM(g1 * ev) AS BIGINT) AS d1,
         |    CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(g1) AS BIGINT) AS m1
         |  FROM subj GROUP BY 1),
         |r AS (SELECT t, d, d1, m, m1,
         |    CAST(SUM(m) OVER (ORDER BY t) AS BIGINT) AS cum_m,
         |    CAST(SUM(m1) OVER (ORDER BY t) AS BIGINT) AS cum_m1,
         |    CAST(SUM(m) OVER () AS BIGINT) AS n_tot,
         |    CAST(SUM(m1) OVER () AS BIGINT) AS n1_tot
         |  FROM per),
         |s AS (SELECT t, d, d1, n_tot - cum_m + m AS n_at_risk,
         |    n1_tot - cum_m1 + m1 AS n1_at_risk
         |  FROM r WHERE d > 0),
         |f AS (SELECT d, ${graft.operators.Survival.lrOmeNanoSql} AS ome_nano,
         |    ${graft.operators.Survival.lrVarNanoSql} AS v_nano FROM s),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
         |    CAST(SUM(d) AS BIGINT) AS events,
         |    CAST(SUM(ome_nano) AS BIGINT) AS ome_nano,
         |    CAST(SUM(v_nano) AS BIGINT) AS v_nano FROM f)
         |SELECT n_times, events, ome_nano, v_nano,
         |  ${graft.operators.Survival.lrChi2Sql} AS chi2,
         |  ${graft.operators.Survival.lrChi2Sql} > 3.841459 AS significant
         |FROM a""".stripMargin,
    "q_nelson_aalen" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT grp, t, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, t, d, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |s AS (SELECT grp, t, d, n_grp - cum_m + m AS n_at_risk FROM r),
         |f AS (SELECT grp, t, d, n_at_risk,
         |    ${graft.operators.Survival.naHazardNanoSql} AS h_nano
         |  FROM s),
         |c AS (SELECT grp, t, d, n_at_risk,
         |    CAST(SUM(h_nano) OVER (PARTITION BY grp ORDER BY t)
         |      AS BIGINT) AS cum_h_nano
         |  FROM f)
         |SELECT grp, t, n_at_risk, d,
         |  ${graft.operators.Survival.naCumHazardSql} AS cum_hazard,
         |  ${graft.operators.Survival.naBreslowSql} AS surv_breslow
         |FROM c WHERE d > 0""".stripMargin,
    "q_weibull_fit" -> weibullFitOracle,
  )
}
