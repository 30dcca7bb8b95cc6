package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
