package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Survival / time-to-event analysis over subject tables — "how long
  * until a user churns / errors / converts, and do cohorts differ?"
  * with right-censoring handled honestly (dropping censored subjects
  * biases every naive duration average).
  *
  * Scale shape: everything reduces the subject table to the per-
  * (group, time) step table in ONE aggregate, runs the cumulative
  * risk-set / log-survival prefix sums on that (∝ distinct times, not
  * subjects) via [[Eval.rangedCumsum]], and finishes in shared-SQL
  * double chains. The iterated product of survival factors is carried
  * as an EXACT BIGINT sum of nano-quantized logs — order-independent,
  * so bit-identical across partitionings and engines (the
  * markovStationary discipline; a raw double product would depend on
  * evaluation order).
  */
object Survival {

  /** Kaplan–Meier product-limit estimator per group: at each event
    * time, S ← S · (n−d)/n over the at-risk set n (censored subjects
    * leave the risk set after their time, exactly what the naive
    * per-group mean can't do). Emits one row per (group, event time)
    * with the risk set, deaths, and the running survival estimate.
    *
    * @param eventCol true = event observed at `timeCol`, false =
    *                 right-censored at `timeCol` (still in the risk
    *                 set up to and including that time).
    */
  def kaplanMeier(
      df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("string").as("grp"),
      col(timeCol).cast("long").as("t"),
      when(col(eventCol), 1L).otherwise(0L).as("ev"))
    val per = u.groupBy(col("grp"), col("t"))
      .agg(sum(col("ev")).cast("long").as("d"),
        count(lit(1)).cast("long").as("m"))
    val tot = broadcast(
      per.groupBy(col("grp")).agg(sum(col("m")).cast("long").as("n_grp")))
    val risk = Eval.rangedCumsum(per, Seq("grp"), "t", Seq("m"))
      .join(tot, Seq("grp"))
      .withColumn("n_at_risk",
        (col("n_grp") - col("cum_m") + col("m")).cast("long"))
      .withColumn("ln_nano", expr(kmLnNanoSql))
      .withColumn("zf", expr(kmZeroFlagSql))
    Eval.rangedCumsum(
      risk.select(col("grp"), col("t"), col("d"), col("n_at_risk"),
        col("ln_nano"), col("zf")),
      Seq("grp"), "t", Seq("ln_nano", "zf"))
      .filter(col("d") > 0L)
      .select(col("grp"), col("t"), col("n_at_risk"), col("d"),
        expr(kmSurvivalSql).as("survival"))
  }

  /** Nelson–Aalen cumulative hazard — the ESTIMATOR-SIDE companion to
    * [[kaplanMeier]] (KM multiplies survival factors; NA sums hazard
    * increments d/n, which is the better-behaved quantity to difference,
    * regress, or compare across cohorts): per event time,
    * H(t) = Σ_{s≤t} d_s/n_s with each increment nano-quantized so the
    * running sum is an exact BIGINT, plus the Breslow survival
    * exp(−H(t)). Identical plan shape to kaplanMeier — one per-(grp,t)
    * aggregate and two ranged prefix sums over the STEP table (∝
    * distinct event times, not subjects). */
  def nelsonAalen(
      df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("string").as("grp"),
      col(timeCol).cast("long").as("t"),
      when(col(eventCol), 1L).otherwise(0L).as("ev"))
    val per = u.groupBy(col("grp"), col("t"))
      .agg(sum(col("ev")).cast("long").as("d"),
        count(lit(1)).cast("long").as("m"))
    val tot = broadcast(
      per.groupBy(col("grp")).agg(sum(col("m")).cast("long").as("n_grp")))
    val risk = Eval.rangedCumsum(per, Seq("grp"), "t", Seq("m"))
      .join(tot, Seq("grp"))
      .withColumn("n_at_risk",
        (col("n_grp") - col("cum_m") + col("m")).cast("long"))
      .withColumn("h_nano", expr(naHazardNanoSql))
    Eval.rangedCumsum(
      risk.select(col("grp"), col("t"), col("d"), col("n_at_risk"),
        col("h_nano")),
      Seq("grp"), "t", Seq("h_nano"))
      .filter(col("d") > 0L)
      .select(col("grp"), col("t"), col("n_at_risk"), col("d"),
        expr(naCumHazardSql).as("cum_hazard"),
        expr(naBreslowSql).as("surv_breslow"))
  }

  /** Per-time hazard increment d/n in nano units over (d, n_at_risk) —
    * one deterministic double division on exact integers. Shared with
    * the oracle. */
  val naHazardNanoSql: String =
    "CAST(ROUND(CAST(d AS DOUBLE) / n_at_risk * 1000000000, 0) AS BIGINT)"

  /** H(t) off the exact nano sum. Shared with the oracle. */
  val naCumHazardSql: String =
    "ROUND(CAST(cum_h_nano AS DOUBLE) / 1000000000, 6)"

  /** Breslow survival exp(−H). Shared with the oracle. */
  val naBreslowSql: String =
    "ROUND(EXP(-CAST(cum_h_nano AS DOUBLE) / 1000000000), 6)"

  /** Per-time ln((n−d)/n) in nano units over (d, n_at_risk) — a
    * deterministic double op on exact integers, no sum inside; the
    * d = n (risk set extinguished) case routes through [[kmZeroFlagSql]]
    * instead of ln(0). Shared with the oracle. */
  val kmLnNanoSql: String =
    "CASE WHEN d = n_at_risk THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(ROUND(LN(CAST(n_at_risk - d AS DOUBLE) / n_at_risk) * " +
      "1000000000, 0) AS BIGINT) END"

  /** 1 when the step multiplies by zero (d = n), else 0. */
  val kmZeroFlagSql: String =
    "CAST(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END AS BIGINT)"

  /** Survival over (cum_ln_nano, cum_zf): exact zero once any factor
    * is zero, else exp of the exact nano-log sum. Shared with the
    * oracle. */
  val kmSurvivalSql: String =
    "CASE WHEN cum_zf > 0 THEN CAST(0 AS DOUBLE) ELSE " +
      "ROUND(EXP(CAST(cum_ln_nano AS DOUBLE) / 1000000000), 6) END"

  /** Weibull fit by probability-plot regression over the
    * [[kaplanMeier]] curve — the parametric summary a survival analysis
    * reports after the nonparametric look: ln(−ln S(t)) is linear in
    * ln t under a Weibull, so shape k = the OLS slope and scale
    * λ = exp(−a/k) from the intercept. Points use the INTERIOR of the
    * curve (t > 0, 0 < S < 1 — the boundary steps have no plot
    * coordinates by definition). Per-point plot coordinates are
    * micro-quantized from the round(6) KM survival (identical on both
    * engines), so the OLS moments are exact BIGINTs; the slope and
    * scale are shared double texts, and the common micro factor cancels
    * out of the slope. Degenerate curves yield NULL shape/scale (one
    * plot point: zero x-variance) or drop from the output entirely
    * (no interior step at all, e.g. S falls straight to 0) — both by
    * contract, spec-pinned.
    *
    * Scale shape: the kaplanMeier plan (one subject aggregate + two
    * ranged prefix sums over the step table) plus one group-keyed
    * moment aggregate — the fit costs one more pass over a table
    * sized by DISTINCT EVENT TIMES, not subjects. */
  def weibullFit(
      df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val km = kaplanMeier(df, groupCol, timeCol, eventCol)
      .filter(col("t") > 0L && col("survival") > 0.0 &&
        col("survival") < 1.0)
    km.select(col("grp"), expr(wbXmSql).as("xm"), expr(wbYmSql).as("ym"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("np"),
        sum(col("xm")).as("sx"), sum(col("ym")).as("sy"),
        sum(col("xm") * col("ym")).as("sxy"),
        sum(col("xm") * col("xm")).as("sxx"))
      .withColumn("shape", expr(wbShapeSql))
      .withColumn("scale", expr(wbScaleSql))
      .select(col("grp"), col("np"),
        round(col("shape"), 6).as("shape"),
        round(col("scale"), 6).as("scale"))
  }

  /** Micro ln t over the KM step row. Shared with the oracle. */
  val wbXmSql: String =
    "CAST(ROUND(LN(CAST(t AS DOUBLE)) * 1000000, 0) AS BIGINT)"

  /** Micro ln(−ln S) over the round(6) KM survival. Shared. */
  val wbYmSql: String =
    "CAST(ROUND(LN(-LN(survival)) * 1000000, 0) AS BIGINT)"

  /** Weibull shape = OLS slope over the micro moment row (the common
    * micro factor cancels); NULL on zero x-variance. Shared. */
  val wbShapeSql: String =
    "CASE WHEN CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0 " +
      "THEN (CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
      "(CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) END"

  /** Weibull scale = exp(−a/k), intercept a de-micro'd; NULL with the
    * shape. Shared. */
  val wbScaleSql: String =
    "CASE WHEN shape IS NOT NULL AND shape <> 0 THEN " +
      "exp(-(((CAST(sy AS DOUBLE) - shape * sx) / np) / 1000000) / shape) " +
      "END"

  /** Aalen–Johansen cumulative incidence for two COMPETING causes —
    * what 1−KM gets wrong when another event can preempt yours: the
    * probability of failing from cause j by time t is
    * CIF_j(t) = Σ_{s≤t} S(s⁻)·d_j(s)/n(s), with S the ALL-CAUSE KM.
    * Exactness follows the KM discipline end to end: S(s⁻) is the exp
    * of the EXCLUSIVE prefix of nano-quantized log factors (the
    * inclusive cum minus the row's own term — no second prefix pass),
    * each increment micro-quantizes through one IEEE chain, and the
    * CIFs are exact running long sums. `causeCol`: 0 = censored,
    * 1 and 2 the competing causes.
    *
    * Plan: one per-(grp, t) aggregate + two ranged prefix sums over
    * the step table (∝ distinct event times, not subjects). */
  def cumulativeIncidence(
      df: DataFrame, groupCol: String, timeCol: String,
      causeCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("string").as("grp"),
      col(timeCol).cast("long").as("t"),
      col(causeCol).cast("long").as("cause"))
    val per = u.groupBy(col("grp"), col("t"))
      .agg(sum(when(col("cause") === 1L, 1L).otherwise(0L))
        .cast("long").as("d1"),
        sum(when(col("cause") === 2L, 1L).otherwise(0L))
          .cast("long").as("d2"),
        count(lit(1)).cast("long").as("m"))
    val tot = broadcast(
      per.groupBy(col("grp")).agg(sum(col("m")).cast("long").as("n_grp")))
    val risk = Eval.rangedCumsum(per, Seq("grp"), "t", Seq("m"))
      .join(tot, Seq("grp"))
      .withColumn("n_at_risk",
        (col("n_grp") - col("cum_m") + col("m")).cast("long"))
      .withColumn("d", (col("d1") + col("d2")).cast("long"))
      .withColumn("ln_nano", expr(kmLnNanoSql))
      .withColumn("zf", expr(kmZeroFlagSql))
    val s = Eval.rangedCumsum(
      risk.select(col("grp"), col("t"), col("d1"), col("d2"),
        col("n_at_risk"), col("ln_nano"), col("zf")),
      Seq("grp"), "t", Seq("ln_nano", "zf"))
      .withColumn("inc1_micro", expr(ajIncMicroSql("d1")))
      .withColumn("inc2_micro", expr(ajIncMicroSql("d2")))
    Eval.rangedCumsum(
      s.select(col("grp"), col("t"), col("d1"), col("d2"),
        col("n_at_risk"), col("inc1_micro"), col("inc2_micro")),
      Seq("grp"), "t", Seq("inc1_micro", "inc2_micro"))
      .filter(col("d1") + col("d2") > 0L)
      .select(col("grp"), col("t"), col("n_at_risk"), col("d1"),
        col("d2"),
        expr("round(CAST(cum_inc1_micro AS DOUBLE) / 1e6, 6)")
          .as("cif1"),
        expr("round(CAST(cum_inc2_micro AS DOUBLE) / 1e6, 6)")
          .as("cif2"))
  }

  /** Micro-quantized AJ increment S(t⁻)·d_j/n over the inclusive
    * cum columns (exclusive prefix = cum minus the row's own term).
    * Shared with the oracle. */
  def ajIncMicroSql(dCol: String): String =
    "CAST(ROUND(1000000 * (CASE WHEN cum_zf - zf > 0 THEN 0.0 ELSE " +
      "EXP(CAST(cum_ln_nano - ln_nano AS DOUBLE) / 1000000000) END) * " +
      s"$dCol / n_at_risk, 0) AS BIGINT)"

  /** Two-group log-rank test — "do the two survival curves differ?"
    * without any distributional assumption: at each event time the
    * hypergeometric expectation E₁ = d·n₁/n and variance are computed
    * from the exact risk sets, the per-time (O−E) and V terms are
    * nano-quantized (order-independent exact sums), and
    * χ² = (ΣO−E)²/ΣV finishes in one shared-SQL row vs χ²₁(0.95).
    *
    * @param groupCol boolean: true = group 1. */
  def logRank(
      df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String): DataFrame = {
    val u = df.select(when(col(groupCol), 1L).otherwise(0L).as("g1"),
      col(timeCol).cast("long").as("t"),
      when(col(eventCol), 1L).otherwise(0L).as("ev"))
    val per = u.groupBy(col("t"))
      .agg(sum(col("ev")).cast("long").as("d"),
        sum(col("g1") * col("ev")).cast("long").as("d1"),
        count(lit(1)).cast("long").as("m"),
        sum(col("g1")).cast("long").as("m1"))
    val tot = broadcast(per.agg(sum(col("m")).cast("long").as("n_tot"),
      sum(col("m1")).cast("long").as("n1_tot")))
    Eval.rangedCumsum(per, Nil, "t", Seq("m", "m1"))
      .crossJoin(tot)
      .withColumn("n_at_risk",
        (col("n_tot") - col("cum_m") + col("m")).cast("long"))
      .withColumn("n1_at_risk",
        (col("n1_tot") - col("cum_m1") + col("m1")).cast("long"))
      .filter(col("d") > 0L)
      .withColumn("ome_nano", expr(lrOmeNanoSql))
      .withColumn("v_nano", expr(lrVarNanoSql))
      .agg(count(lit(1)).cast("long").as("n_times"),
        sum(col("d")).cast("long").as("events"),
        sum(col("ome_nano")).cast("long").as("ome_nano"),
        sum(col("v_nano")).cast("long").as("v_nano"))
      .withColumn("chi2", expr(lrChi2Sql))
      .withColumn("significant", expr(s"$lrChi2Sql > 3.841459"))
  }

  /** Per-time (O₁−E₁) in nano units over (d, d1, n_at_risk,
    * n1_at_risk) — deterministic, no inner sum. Shared with the
    * oracle. */
  val lrOmeNanoSql: String =
    "CAST(ROUND((CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * n1_at_risk / " +
      "n_at_risk) * 1000000000, 0) AS BIGINT)"

  /** Per-time hypergeometric variance in nano units; 0 when the risk
    * set is a single subject. Shared with the oracle. */
  val lrVarNanoSql: String =
    "CASE WHEN n_at_risk > 1 THEN " +
      "CAST(ROUND(CAST(d AS DOUBLE) * n1_at_risk / n_at_risk * " +
      "(1.0 - CAST(n1_at_risk AS DOUBLE) / n_at_risk) * " +
      "(CAST(n_at_risk - d AS DOUBLE) / (n_at_risk - 1)) * " +
      "1000000000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"

  /** Log-rank χ² over the exact nano sums; NULL when the variance
    * degenerates (one group empty past the first event time). */
  val lrChi2Sql: String =
    "CASE WHEN v_nano > 0 THEN " +
      "ROUND((CAST(ome_nano AS DOUBLE) / 1000000000) * " +
      "(CAST(ome_nano AS DOUBLE) / 1000000000) / " +
      "(CAST(v_nano AS DOUBLE) / 1000000000), 6) END"

  /** Restricted mean survival time per group — the AREA under the
    * [[kaplanMeier]] curve up to τ: "expected event-free time in the
    * first τ units", the single-number curve summary medians can't
    * give when >50% survive. Piecewise-constant integration over the
    * KM step table: the pre-first-event segment contributes
    * min(t₁, τ) at S = 1, each step S(tᵢ)·(min(tᵢ₊₁, τ) − min(tᵢ, τ))
    * with the last step running to τ. Per-step rectangles are
    * micro-quantized over the ROUNDED survival column (identical both
    * engines) and summed exactly; the step windows are per-group over
    * the event-time table — ∝ steps, not subjects. */
  def rmst(
      df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String, tau: Long): DataFrame = {
    require(tau > 0, s"tau must be > 0: $tau")
    import org.apache.spark.sql.expressions.Window
    val km = kaplanMeier(df, groupCol, timeCol, eventCol)
    val w = Window.partitionBy(col("grp")).orderBy(col("t"))
    val stepped = km
      .withColumn("next_t", lead(col("t"), 1).over(w))
      .withColumn("rect_micro", expr(rmstRectMicroSql(tau)))
    stepped.groupBy(col("grp"))
      .agg(min(col("t")).cast("long").as("t_first"),
        count(lit(1)).cast("long").as("n_steps"),
        sum(col("rect_micro")).cast("long").as("steps_micro"))
      .select(col("grp"), lit(tau).as("tau"), col("n_steps"),
        expr(s"round(least(CAST(t_first AS DOUBLE), $tau) + " +
          "CAST(steps_micro AS DOUBLE) / 1000000, 6)").as("rmst"))
  }

  /** Per-step S·Δt rectangle in micro units over (survival, t,
    * next_t) truncated at τ; the last step integrates to τ. Shared
    * with the oracle. */
  def rmstRectMicroSql(tau: Long): String =
    s"CAST(ROUND(survival * (least(CAST(COALESCE(next_t, $tau) " +
      s"AS DOUBLE), $tau) - least(CAST(t AS DOUBLE), $tau)) * 1000000," +
      " 0) AS BIGINT)"

  /** Harrell's concordance index — "does the risk score ORDER the
    * failures correctly?", the survival-side AUC: over comparable
    * pairs (the earlier subject's event observed), count score
    * agreement with half credit for score ties. EXACT integer pair
    * counts from one self-join — the [[Profiling.kendallTau]] O(n²)
    * regime: run it on aggregated units (users, cohorts), never raw
    * events; `requireBounded` fails fast past `maxRows` and points
    * here. */
  def harrellC(
      df: DataFrame, idCol: String, timeCol: String, eventCol: String,
      scoreCol: String, maxRows: Long = 100000L): DataFrame = {
    val u = df.select(col(idCol).as("id"),
        col(timeCol).cast("long").as("t"),
        when(col(eventCol), 1L).otherwise(0L).as("ev"),
        col(scoreCol).cast("long").as("sc"))
      .materialize
    val n = u.count()
    require(n <= maxRows,
      s"harrellC is O(n²) pairwise ($n rows > $maxRows): aggregate to " +
        "units first, or raise maxRows knowingly")
    // Canonical Harrell comparable set (lifelines/R survival): a's event
    // before b's time, PLUS tied-time pairs where a had the event and b
    // was censored at that same time (a's risk should still rank higher)
    u.as("a").join(u.as("b"),
        (col("a.t") < col("b.t") && col("a.ev") === 1L) ||
          (col("a.t") === col("b.t") && col("a.ev") === 1L &&
            col("b.ev") === 0L))
      .agg(count(lit(1)).cast("long").as("comparable"),
        sum(when(col("a.sc") > col("b.sc"), 1L).otherwise(0L))
          .cast("long").as("concordant"),
        sum(when(col("a.sc") === col("b.sc"), 1L).otherwise(0L))
          .cast("long").as("tied_score"))
      .withColumn("c_index", expr(harrellCSql))
  }

  /** C = (concordant + ties/2)/comparable; NULL with no comparable
    * pairs. Shared with the oracle. */
  val harrellCSql: String =
    "CASE WHEN comparable > 0 THEN " +
      "round((concordant + 0.5 * tied_score) / " +
      "CAST(comparable AS DOUBLE), 6) END"

  /** Actuarial life table per group — [[kaplanMeier]] binned into
    * fixed-width intervals with the classical half-censoring
    * adjustment: subjects censored inside an interval count as exposed
    * for half of it (n′ = n_enter − c/2), q = d/n′, and survival is
    * the running product of (1−q). The half-unit arithmetic runs in
    * DOUBLED integers (n2′ = 2·n_enter − c vs 2d — exact), the product
    * as the KM nano-log sum with the same exact-zero extinction flag.
    * Two ranged prefix sums on the interval table — ∝ intervals, not
    * subjects. */
  def lifeTable(
      df: DataFrame, groupCol: String, timeCol: String,
      eventCol: String, width: Long): DataFrame = {
    require(width >= 1, s"width must be >= 1: $width")
    val u = df.select(col(groupCol).cast("string").as("grp"),
      expr(s"CAST(`$timeCol` AS BIGINT) div $width").as("iv"),
      when(col(eventCol), 1L).otherwise(0L).as("ev"))
    val per = u.groupBy(col("grp"), col("iv"))
      .agg(sum(col("ev")).cast("long").as("d"),
        (count(lit(1)) - sum(col("ev"))).cast("long").as("c"),
        count(lit(1)).cast("long").as("m"))
    val tot = broadcast(
      per.groupBy(col("grp")).agg(sum(col("m")).cast("long").as("n_grp")))
    val risk = Eval.rangedCumsum(per, Seq("grp"), "iv", Seq("m"))
      .join(tot, Seq("grp"))
      .withColumn("n_enter",
        (col("n_grp") - col("cum_m") + col("m")).cast("long"))
      .withColumn("ln_nano", expr(ltLnNanoSql))
      .withColumn("zf", expr(ltZeroFlagSql))
    Eval.rangedCumsum(
      risk.select(col("grp"), col("iv"), col("d"), col("c"),
        col("n_enter"), col("ln_nano"), col("zf")),
      Seq("grp"), "iv", Seq("ln_nano", "zf"))
      .select(col("grp"), (col("iv") * width).as("interval_start"),
        col("n_enter"), col("d"), col("c"),
        expr(ltQSql).as("q"),
        expr(kmSurvivalSql).as("survival"))
  }

  /** Interval ln(1−q) in nano units over (d, c, n_enter) with the
    * doubled-integer actuarial exposure n2′ = 2n − c; extinction
    * (2d ≥ n2′) routes through [[ltZeroFlagSql]]. Shared with the
    * oracle. */
  val ltLnNanoSql: String =
    "CASE WHEN 2 * d >= 2 * n_enter - c THEN CAST(0 AS BIGINT) ELSE " +
      "CAST(ROUND(LN(CAST(2 * n_enter - c - 2 * d AS DOUBLE) / " +
      "(2 * n_enter - c)) * 1000000000, 0) AS BIGINT) END"

  val ltZeroFlagSql: String =
    "CAST(CASE WHEN 2 * d >= 2 * n_enter - c THEN 1 ELSE 0 END AS BIGINT)"

  /** Conditional death probability q = 2d/(2n−c), capped at 1. */
  val ltQSql: String =
    "CASE WHEN 2 * n_enter - c > 0 THEN " +
      "round(least(CAST(1 AS DOUBLE), " +
      "CAST(2 * d AS DOUBLE) / (2 * n_enter - c)), 6) END"

  /** Cox proportional-hazards fit, ONE covariate, Breslow ties —
    * "how much does covariate x change the hazard?" as a hazard ratio
    * e^β, the regression [[logRank]] can't give (log-rank only
    * compares two fixed groups). β takes `iters` FIXED Newton steps on
    * the partial-likelihood score: per step, per-subject e^{βz} terms
    * are micro-quantized and summed per distinct time, risk-set sums
    * S0/S1/S2 come off ONE descending-time prefix sum
    * ([[Eval.rangedCumsum]] on −t), and the per-event-time score/
    * information terms are nano-quantized — every sum exact and
    * order-independent, so the chain is engine-exact (the plattScale
    * recipe applied to survival). The covariate is standardized
    * internally (β is per-SD; the output also reports the raw-x
    * hazard ratio via sd). No convergence test by design. */
  def coxPH(
      df: DataFrame, timeCol: String, eventCol: String, xCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 6, s"iters in [1,6]: $iters")
    val s = col(xCol).cast("long")
    val mm = broadcast(df.agg(count(lit(1)).cast("long").as("n"),
      sum(s).cast("long").as("ss"), sum(s * s).cast("long").as("ssq")))
    val z = df.select(col(timeCol).cast("long").as("t"),
        when(col(eventCol), 1L).otherwise(0L).as("ev"), s.as("__s"))
      .crossJoin(mm)
      .withColumn("z", expr(Eval.plattZSql))
      .filter(col("z").isNotNull)
      .select(col("t"), col("ev"), col("z"))
      .materialize // scanned once per Newton step
    var beta = z.sparkSession.range(1).select(lit(0.0).as("beta"))
    (1 to iters).foreach { _ =>
      val perT = z.crossJoin(broadcast(beta))
        .withColumn("w_micro", expr(coxTermSql("w")))
        .withColumn("wz_micro", expr(coxTermSql("w * z")))
        .withColumn("wzz_micro", expr(coxTermSql("w * z * z")))
        .withColumn("evz_micro", expr(coxTermSql("ev * z")))
        .groupBy(col("beta"), col("t"))
        .agg(sum(col("w_micro")).cast("long").as("w_m"),
          sum(col("wz_micro")).cast("long").as("wz_m"),
          sum(col("wzz_micro")).cast("long").as("wzz_m"),
          sum(col("ev")).cast("long").as("d"),
          sum(col("evz_micro")).cast("long").as("evz_m"))
        .withColumn("negt", -col("t"))
      val suf = Eval.rangedCumsum(perT, Seq("beta"), "negt",
        Seq("w_m", "wz_m", "wzz_m"))
      val score = suf.filter(col("d") > 0L)
        .withColumn("u_nano", expr(coxUNanoSql))
        .withColumn("i_nano", expr(coxINanoSql))
        .groupBy(col("beta"))
        .agg(sum(col("u_nano")).cast("long").as("u_n"),
          sum(col("i_nano")).cast("long").as("i_n"))
      beta = score.select(expr(coxStepSql).as("beta"))
    }
    val tot = broadcast(z.agg(count(lit(1)).cast("long").as("n_fit"),
      sum(col("ev")).cast("long").as("events")))
    beta.crossJoin(tot).crossJoin(mm)
      .select(col("n_fit"), col("events"),
        round(col("beta"), 6).as("beta_per_sd"),
        expr("CASE WHEN beta IS NOT NULL THEN " +
          "round(EXP(beta), 6) END").as("hazard_ratio_per_sd"),
        expr("CASE WHEN beta IS NOT NULL THEN " +
          s"round(EXP(beta / ($coxSdSql)), 6) END")
          .as("hazard_ratio_per_unit"))
  }

  /** Raw-x sd off the (n, ss, ssq) moment row — the plattScale double
    * assembly. Shared with the oracle. */
  val coxSdSql: String =
    "sqrt((CAST(ssq AS DOUBLE) - CAST(ss AS DOUBLE) * " +
      "(CAST(ss AS DOUBLE) / n)) / (n - 1))"

  /** A per-subject Cox term in micro units: `e` may reference z, ev,
    * and w = e^{βz} (spliced). Shared with the oracle. */
  def coxTermSql(e: String): String = {
    // word-boundary splice: a bare .replace("w", …) would corrupt any
    // future term containing w inside an identifier (wz, pow, lower)
    val withW = e.replaceAll("\\bw\\b", "EXP(beta * z)")
    s"CAST(ROUND(($withW) * 1000000, 0) AS BIGINT)"
  }

  /** Per-event-time score term (Σ_events z) − d·S1/S0 in nano units
    * over (evz_m, d, cum_wz_m, cum_w_m); S0 > 0 always. Shared with
    * the oracle. */
  val coxUNanoSql: String =
    "CAST(ROUND((CAST(evz_m AS DOUBLE) / 1000000 - " +
      "d * (CAST(cum_wz_m AS DOUBLE) / cum_w_m)) * 1000000000, 0) " +
      "AS BIGINT)"

  /** Per-event-time information d·(S2/S0 − (S1/S0)²) in nano units. */
  val coxINanoSql: String =
    "CAST(ROUND(d * (CAST(cum_wzz_m AS DOUBLE) / cum_w_m - " +
      "(CAST(cum_wz_m AS DOUBLE) / cum_w_m) * " +
      "(CAST(cum_wz_m AS DOUBLE) / cum_w_m)) * 1000000000, 0) " +
      "AS BIGINT)"

  /** Newton update β' = β + U/I (nano scales cancel); NULL once the
    * information degenerates. Shared with the oracle. */
  val coxStepSql: String =
    "CASE WHEN i_n > 0 THEN " +
      "beta + CAST(u_n AS DOUBLE) / i_n END"
}
