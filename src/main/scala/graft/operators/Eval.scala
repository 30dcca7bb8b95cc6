package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Model-evaluation metrics over distributed predictions — the "score the
  * filter/classifier before trusting it on the corpus" step of a training
  * pipeline: ranking quality (ROC AUC), per-class precision/recall/F1,
  * inter-annotator agreement (Cohen's kappa), probability calibration,
  * plus the rank-statistic economics pair (Gini concentration, exact
  * weighted median).
  *
  * Every metric is computed from exact BIGINT counts assembled
  * distributively; the only doubles are single final divisions rounded to
  * 6 decimals, so a SQL oracle replays each value bit-for-bit. Rank-based
  * statistics (AUC, Gini, weighted median) never sort the data through one
  * partition: they aggregate to the distinct-value table first and run the
  * same ranged prefix sum as the token-budget operators
  * ([[rangedCumsum]]), so the only global window is over
  * n_partitions × n_groups offset rows.
  */
object Eval {

  /** Distributed cumulative sums over `(groupCols, orderCol)` order — the
    * shared kernel of every rank statistic here. `Window.partitionBy(g)
    * .orderBy(v)` is scale-safe only while single groups fit one task;
    * with few or no groups it serializes the table. This instead:
    * range-partitions on (group, order) — so each group's rows are
    * pid-ordered — computes local running sums per (pid, group), and
    * broadcasts per-(pid, group) totals back as offsets. The only global
    * windows run over the offset table (n_partitions × n_groups rows).
    *
    * Adds one INCLUSIVE running-sum column `cum_<c>` per entry of
    * `sumCols`. Rows must be unique per (groupCols, orderCol) — aggregate
    * to distinct order values first (that aggregation is also what bounds
    * the exchanged data by the value domain, not the row count).
    *
    * CORRECTNESS: the ranged frame is `localCheckpoint`ed — materialized
    * ONCE — before fan-out, because the running-sum branch and the offsets
    * branch would otherwise each instantiate their own copy of the range
    * exchange, and range-boundary SAMPLING is seeded per RDD instance: the
    * two copies can draw different partition bounds, making `__pid`
    * disagree between branches (offsets join against the wrong rows —
    * silently wrong cumsums). Exchange reuse sometimes deduplicates the
    * copies, but it is an optimization, not a guarantee (observed not
    * firing for this very shape). The bug is invisible on toy data — with
    * ≲100 rows per input partition the boundary sample is exhaustive, so
    * every copy computes identical bounds — and bites exactly when the
    * data outgrows the sample, i.e. at scale. Materializing once is also
    * cheaper: the pre-checkpoint subtree (scan → aggregate → range
    * exchange → sort) runs once instead of per branch. The trade is the
    * one Graph.scala already documents for its loop invariants: a lost
    * executor loses checkpoint blocks (no lineage replay). */
  def rangedCumsum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      sumCols: Seq[String]): DataFrame =
    rangedCumsumOrdered(df, groupCols, Seq(orderCol), sumCols)

  /** [[rangedCumsum]] over a multi-column total order (e.g. (ts, id) event
    * order for sequential tests). */
  def rangedCumsumOrdered(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      sumCols: Seq[String],
      keepPid: Boolean = false): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val gcols = groupCols.map(col)
    val ocols = orderCols.map(col)
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, gcols ++ ocols: _*)
      .sortWithinPartitions(gcols ++ ocols: _*)
      .withColumn("__pid", spark_partition_id())
      .materialize
    val wLocal = Window.partitionBy(col("__pid") +: gcols: _*)
      .orderBy(ocols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sumCols.foldLeft(ranged) { (d, c) =>
      d.withColumn(s"__l_$c", sum(col(c)).over(wLocal))
    }
    val wOff = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs0 = ranged.groupBy(col("__pid") +: gcols: _*)
      .agg(sum(col(sumCols.head)).as(s"__p_${sumCols.head}"),
        sumCols.tail.map(c => sum(col(c)).as(s"__p_$c")): _*)
    val offsets = sumCols.foldLeft(offs0) { (d, c) =>
      d.withColumn(s"__off_$c",
        coalesce(sum(col(s"__p_$c")).over(wOff), lit(0L)))
    }.select(col("__pid") +: gcols ++: sumCols.map(c => col(s"__off_$c")): _*)
    sumCols.foldLeft(
      local.join(broadcast(offsets), "__pid" +: groupCols)) { (d, c) =>
      d.withColumn(s"cum_$c", (col(s"__off_$c") + col(s"__l_$c")).cast("long"))
    }.drop((if (keepPid) Seq.empty[String] else Seq("__pid")) ++
      sumCols.flatMap(c => Seq(s"__l_$c", s"__off_$c")): _*)
  }

  /** Exact ROC AUC of an integer-domain score against a boolean label —
    * the Mann–Whitney formulation with midrank tie handling:
    * AUC·n⁺·n⁻ = Σ_v pos_v·(negBelow_v + neg_v/2). Kept integral as
    * `num = Σ_v pos_v·(2·negBelow_v + neg_v)` over `den = 2·n⁺·n⁻`.
    * One hash aggregate to the distinct-score table, one ranged prefix
    * sum ([[rangedCumsum]]), one total — nothing row-sized ever sorts
    * globally. Also emits the Mann–Whitney U (num/2 in AUC order), since
    * the two statistics are the same sum. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(scoreCol).cast("long").as("v"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("cp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).cast("long").as("cn"))
    val c = rangedCumsum(per, Nil, "v", Seq("cn"))
    // totals from the checkpointed frame — no second scan of the events
    val tot = broadcast(c.agg(
      sum(col("cp")).cast("long").as("n_pos"),
      sum(col("cn")).cast("long").as("n_neg")))
    c.crossJoin(tot)
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(sum(col("cp") * (lit(2L) * (col("cum_cn") - col("cn")) + col("cn")))
        .cast("long").as("num"))
      .select(col("n_pos"), col("n_neg"), col("num"),
        (lit(2L) * col("n_pos") * col("n_neg")).as("den"),
        round(col("num").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Platt scaling — fit p = σ(a·z + b) to (score, label) so a raw
    * ranking score becomes a PROBABILITY (the parametric companion to
    * [[isotonicCalibration]]'s monotone fit): z is the standardized
    * score (exact-moment mean/sd — raw cents would overflow exp), and
    * (a, b) take `iters` FIXED Newton steps from (0,0). Each step is
    * ONE aggregate whose per-row gradient/Hessian terms are
    * micro-quantized (order-independent exact sums — the only float
    * nondeterminism an iterated fit can leak), and the 2×2 solve is a
    * shared-SQL closed form on a 1-row frame; the oracle unrolls the
    * same steps. No convergence test by design (the [[pageRank]]
    * determinism recipe). Output includes the final log-loss in milli
    * units as the fit-quality check. */
  def plattScale(
      df: DataFrame, scoreCol: String, labelCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters in [1,8]: $iters")
    val s = col(scoreCol).cast("long")
    val mm = broadcast(df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(s).cast("long").as("ss"),
      sum(s * s).cast("long").as("ssq")))
    val z = df.select(s.as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
      .crossJoin(mm)
      .withColumn("z", expr(plattZSql))
      .filter(col("z").isNotNull)
      .select(col("z"), col("__y").as("y"))
      .materialize // scanned once per Newton step + log-loss
    var params = z.sparkSession.range(1)
      .select(lit(0.0).as("a"), lit(0.0).as("b"))
    (1 to iters).foreach { _ =>
      val m = z.crossJoin(broadcast(params))
        .withColumn("g1m", expr(plattTermSql("(p - y) * z")))
        .withColumn("g0m", expr(plattTermSql("(p - y)")))
        .withColumn("h11m", expr(plattTermSql("p * (1 - p) * z * z")))
        .withColumn("h01m", expr(plattTermSql("p * (1 - p) * z")))
        .withColumn("h00m", expr(plattTermSql("p * (1 - p)")))
        .groupBy(col("a"), col("b"))
        .agg(sum(col("g1m")).cast("long").as("g1m"),
          sum(col("g0m")).cast("long").as("g0m"),
          sum(col("h11m")).cast("long").as("h11m"),
          sum(col("h01m")).cast("long").as("h01m"),
          sum(col("h00m")).cast("long").as("h00m"))
      params = m.select(expr(plattStepASql).as("a"),
        expr(plattStepBSql).as("b"))
    }
    val ll = z.crossJoin(broadcast(params))
      .withColumn("llm", expr(plattTermSql(
        "-(y * LN(p) + (1 - y) * LN(1 - p))")))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_fit"),
        sum(col("llm")).cast("long").as("ll_micro"))
    ll.crossJoin(mm)
      .select(col("n"),
        expr("round(CAST(ss AS DOUBLE) / n, 6)").as("mean_s"),
        expr(s"round($plattSdSql, 6)").as("sd_s"),
        round(col("a"), 6).as("a"), round(col("b"), 6).as("b"),
        expr("round(CAST(ll_micro AS DOUBLE) / n_fit / 1000000, 6)")
          .as("logloss"))
  }

  /** Sample sd of the raw score off the exact moment row (welchTTest
    * double assembly). Shared with the oracle. */
  val plattSdSql: String =
    "sqrt((CAST(ssq AS DOUBLE) - CAST(ss AS DOUBLE) * " +
      "(CAST(ss AS DOUBLE) / n)) / (n - 1))"

  /** Standardized score over (__s, n, ss, ssq); NULL (row dropped) when
    * the score is constant. Shared with the oracle. */
  val plattZSql: String =
    s"CASE WHEN n > 1 AND $plattSdSql > 0 THEN " +
      s"(__s - CAST(ss AS DOUBLE) / n) / $plattSdSql END"

  /** A per-row Newton term in micro units: `e` may reference z, y, and
    * p = σ(a·z+b) (spliced in). Deterministic double ops — exp matches
    * libm-for-libm across the engines (FIXTURES.md). */
  def plattTermSql(e: String): String = {
    // word-boundary splice: a bare .replace("p", …) would corrupt any
    // future term containing p inside an identifier (pow, exp, p_hat)
    val withP = e.replaceAll("\\bp\\b", "(1.0 / (1.0 + EXP(-(a * z + b))))")
    s"CAST(ROUND(($withP) * 1000000, 0) AS BIGINT)"
  }

  /** Newton update a' = a − (h00·g1 − h01·g0)/det over the exact micro
    * sums (the 1e6 scales cancel in the ratios). Shared with the
    * oracle; NULL once the Hessian degenerates. */
  val plattStepASql: String =
    "CASE WHEN CAST(h11m AS DOUBLE) * h00m - CAST(h01m AS DOUBLE) * h01m" +
      " <> 0 THEN a - (CAST(h00m AS DOUBLE) * g1m - " +
      "CAST(h01m AS DOUBLE) * g0m) / " +
      "(CAST(h11m AS DOUBLE) * h00m - CAST(h01m AS DOUBLE) * h01m) END"

  val plattStepBSql: String =
    "CASE WHEN CAST(h11m AS DOUBLE) * h00m - CAST(h01m AS DOUBLE) * h01m" +
      " <> 0 THEN b - (CAST(h11m AS DOUBLE) * g0m - " +
      "CAST(h01m AS DOUBLE) * g1m) / " +
      "(CAST(h11m AS DOUBLE) * h00m - CAST(h01m AS DOUBLE) * h01m) END"

  /** Empirical-Bayes rate shrinkage — the CTR/conversion smoothing a
    * per-key dashboard needs: a 1/1 key is NOT a 100% performer. Fit
    * Beta(α, β) to the observed per-key rates by method of moments
    * (α = m̄·c, β = (1−m̄)·c, c = m̄(1−m̄)/var − 1), then report each
    * key's posterior mean (x+α)/(n+α+β) — extremes with little data
    * pull toward the prior, well-measured keys barely move. Per-key
    * rate moments are micro/nano-quantized (exact order-independent
    * sums); the prior is one broadcast row; the shrink is a narrow
    * map. NULL shrunk (and α, β) when the rate variance degenerates
    * or the moments leave the Beta family (var ≥ m̄(1−m̄)). */
  def ebShrink(
      df: DataFrame, keyCol: String, succCol: String,
      totCol: String): DataFrame = {
    val u = df.select(col(keyCol).as("__k"),
        col(succCol).cast("long").as("x"),
        col(totCol).cast("long").as("nt"))
      .filter(col("nt") > 0L)
      .materialize // read by the prior fit AND the shrink map
    val m = broadcast(u
      .withColumn("p_micro", expr(
        "CAST(ROUND(CAST(x AS DOUBLE) / nt * 1000000, 0) AS BIGINT)"))
      .withColumn("p2_nano", expr(
        "CAST(ROUND((CAST(x AS DOUBLE) / nt) * (CAST(x AS DOUBLE) / nt)" +
          " * 1000000000, 0) AS BIGINT)"))
      .agg(count(lit(1)).cast("long").as("kk"),
        sum(col("p_micro")).cast("long").as("sp_micro"),
        sum(col("p2_nano")).cast("long").as("sp2_nano")))
    u.crossJoin(m)
      .withColumn("alpha_raw", expr(ebAlphaSql))
      .withColumn("beta_raw", expr(ebBetaSql))
      .select(col("__k").as(keyCol), col("x"), col("nt").as("n"),
        expr("round(CAST(x AS DOUBLE) / nt, 6)").as("raw_rate"),
        round(col("alpha_raw"), 6).as("alpha"),
        round(col("beta_raw"), 6).as("beta"),
        expr(ebShrunkSql).as("shrunk_rate"))
  }

  private val ebM1Sql = "(CAST(sp_micro AS DOUBLE) / kk / 1000000)"
  private val ebVarSql =
    s"((CAST(sp2_nano AS DOUBLE) / kk / 1000000000) - $ebM1Sql * $ebM1Sql)"
  private val ebCSql = s"($ebM1Sql * (1 - $ebM1Sql) / $ebVarSql - 1)"

  /** Beta-prior α over the exact rate-moment row; NULL outside the
    * Beta-expressible region. Shared with the oracle. */
  val ebAlphaSql: String =
    s"CASE WHEN kk > 1 AND $ebVarSql > 0 AND $ebCSql > 0 THEN " +
      s"$ebM1Sql * $ebCSql END"

  val ebBetaSql: String =
    s"CASE WHEN kk > 1 AND $ebVarSql > 0 AND $ebCSql > 0 THEN " +
      s"(1 - $ebM1Sql) * $ebCSql END"

  /** Posterior mean over (x, nt, alpha_raw, beta_raw) — the UNROUNDED
    * prior params feed the shrink (rounded copies are display-only).
    * Shared with the oracle. */
  val ebShrunkSql: String =
    "CASE WHEN alpha_raw IS NOT NULL THEN " +
      "round((x + alpha_raw) / (nt + alpha_raw + beta_raw), 6) END"

  /** Exact trimmed mean per group — the robust location estimate
    * between median (drops 50%) and mean (drops nothing): discard the
    * lowest and highest `trimPct`% EXACTLY via the distinct-value
    * prefix-sum kernel — a tie block straddling a cut contributes
    * min(cum, n−k) − max(cum−nv, k) occurrences, all integer
    * arithmetic, so the result is partitioning- and engine-exact
    * (no approximate percentile anywhere). k = n·trimPct/100 rows off
    * each end. One distinct-value aggregate + one ranged cumsum + one
    * group aggregate. */
  def trimmedMean(
      df: DataFrame, groupCol: String, valCol: String,
      trimPct: Int = 5): DataFrame = {
    require(trimPct >= 0 && trimPct < 50, s"trimPct in [0,50): $trimPct")
    val per = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val c = rangedCumsum(per, Seq(groupCol), "v", Seq("nv"))
    val tot = broadcast(c.groupBy(col(groupCol))
      .agg(sum(col("nv")).cast("long").as("n")))
    c.join(tot, Seq(groupCol))
      .withColumn("k", expr(s"n * $trimPct div 100"))
      .withColumn("included", expr(
        "greatest(CAST(0 AS BIGINT), " +
          "least(cum_nv, n - k) - greatest(cum_nv - nv, k))"))
      .filter(col("included") > 0L)
      .groupBy(col(groupCol), col("n"), col("k"))
      .agg(sum(col("v") * col("included")).cast("long").as("s_kept"),
        sum(col("included")).cast("long").as("n_kept"))
      .withColumn("trimmed_mean",
        expr("round(CAST(s_kept AS DOUBLE) / n_kept, 6)"))
  }

  /** Precision–recall AUC (average precision) — the ranking metric
    * that stays honest under CLASS IMBALANCE where ROC [[auc]]
    * flatters (1% positives: ROC barely moves when false positives
    * double; precision halves): AP = Σ_v ΔR(v)·P(v) over descending
    * score thresholds, with ΔR = positives AT v / P and P(v) the
    * precision of "predict ≥ v". Every term is an exact rational off
    * the same distinct-score prefix-sum kernel as auc, micro-quantized
    * per threshold and summed exactly. */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(scoreCol).cast("long").as("v"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("cp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).cast("long").as("cn"))
    val c = rangedCumsum(per, Nil, "v", Seq("cp", "cn"))
    val tot = broadcast(c.agg(
      sum(col("cp")).cast("long").as("n_pos"),
      sum(col("cn")).cast("long").as("n_neg")))
    c.crossJoin(tot)
      .withColumn("dp", col("n_pos") - col("cum_cp") + col("cp"))
      .withColumn("dn", col("n_neg") - col("cum_cn") + col("cn"))
      .withColumn("term_micro", expr(prAucTermMicroSql))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(sum(col("term_micro")).cast("long").as("ap_micro"))
      .withColumn("pr_auc", expr(
        "CASE WHEN n_pos > 0 THEN " +
          "round(CAST(ap_micro AS DOUBLE) / 1000000, 6) END"))
  }

  /** Per-threshold ΔR·P term in micro units over (cp, dp, dn, n_pos) —
    * thresholds with no positives contribute 0 (cp = 0). Shared with
    * the oracle. */
  val prAucTermMicroSql: String =
    "CASE WHEN n_pos > 0 AND dp + dn > 0 THEN " +
      "CAST(ROUND((CAST(cp AS DOUBLE) / n_pos) * " +
      "(CAST(dp AS DOUBLE) / (dp + dn)) * 1000000, 0) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END"

  /** Youden-J optimal threshold — [[auc]] says HOW separable; this says
    * WHERE to cut: over every candidate threshold v ("positive if
    * score > v"), J(v) = TPR − FPR, maximized with smallest-v
    * tie-break. J·P·N = (P−cumP)·N − (N−cumN)·P stays an EXACT integer
    * off the same distinct-score prefix-sum kernel as auc, so the
    * argmax is engine- and partitioning-exact — no float ranking.
    * One row: threshold, tpr/fpr/j at the cut. */
  def youdenThreshold(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(scoreCol).cast("long").as("v"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("cp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).cast("long").as("cn"))
    val c = rangedCumsum(per, Nil, "v", Seq("cp", "cn"))
    val tot = broadcast(c.agg(
      sum(col("cp")).cast("long").as("n_pos"),
      sum(col("cn")).cast("long").as("n_neg")))
    c.crossJoin(tot)
      .select(col("v"), col("n_pos"), col("n_neg"),
        col("cum_cp"), col("cum_cn"),
        ((col("n_pos") - col("cum_cp")) * col("n_neg") -
          (col("n_neg") - col("cum_cn")) * col("n_pos")).as("j_num"))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(max(struct(col("j_num"), (-col("v")).as("negv"),
        col("cum_cp"), col("cum_cn"))).as("m"))
      .select(col("n_pos"), col("n_neg"),
        (-col("m.negv")).cast("long").as("threshold"),
        col("m.j_num").cast("long").as("j_num"),
        col("m.cum_cp").as("cum_cp"), col("m.cum_cn").as("cum_cn"))
      .withColumn("tpr", expr(
        "CASE WHEN n_pos > 0 THEN round(CAST(n_pos - cum_cp AS DOUBLE)" +
          " / n_pos, 6) END"))
      .withColumn("fpr", expr(
        "CASE WHEN n_neg > 0 THEN round(CAST(n_neg - cum_cn AS DOUBLE)" +
          " / n_neg, 6) END"))
      .withColumn("j", expr(
        "CASE WHEN n_pos > 0 AND n_neg > 0 THEN " +
          "round(CAST(j_num AS DOUBLE) / " +
          "(CAST(n_pos AS DOUBLE) * n_neg), 6) END"))
  }

  /** Brier score of the position-normalized score against the binary
    * label — the PER-ROW calibration loss next to [[ece]]'s binned
    * gap: mean (conf − y)², plus the skill score 1 − Brier/(p̄(1−p̄))
    * (positive = beats the base-rate forecast). conf maps the integer
    * score into [0,1] by observed span (the ece convention); per-row
    * terms micro-quantized, one aggregate + one broadcast min/max. */
  def brier(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    val mm = broadcast(df.agg(min(s).as("lo"), max(s).as("hi")))
    df.select(s.as("__s"), when(col(labelCol), 1L).otherwise(0L).as("y"))
      .crossJoin(mm)
      .withColumn("term_micro", expr(brierTermMicroSql))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        sum(col("term_micro")).cast("long").as("brier_micro"))
      .select(col("n"), col("n_pos"), col("brier_micro"),
        expr("round(CAST(brier_micro AS DOUBLE) / n / 1000000, 6)")
          .as("brier"),
        expr(brierSkillSql).as("brier_skill"))
  }

  /** Per-row (conf − y)² in micro units over (__s, y, lo, hi);
    * degenerate spans pin conf to 0. Shared with the oracle. */
  val brierTermMicroSql: String = {
    val conf = "(CASE WHEN hi > lo THEN " +
      "CAST(__s - lo AS DOUBLE) / (hi - lo) ELSE CAST(0 AS DOUBLE) END)"
    s"CAST(ROUND(($conf - y) * ($conf - y) * 1000000, 0) AS BIGINT)"
  }

  /** Skill vs the base-rate forecast over (n, n_pos, brier_micro);
    * NULL when the label is constant (no skill defined). */
  val brierSkillSql: String = {
    val p = "(CAST(n_pos AS DOUBLE) / n)"
    s"CASE WHEN n_pos > 0 AND n_pos < n THEN " +
      s"round(1 - (CAST(brier_micro AS DOUBLE) / n / 1000000) / " +
      s"($p * (1 - $p)), 6) END"
  }

  /** Rank-biased overlap of two top-k rankings — "do these two rankers
    * agree, weighted toward the top?" (Webber et al.): the truncated
    * RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·|A_d ∩ B_d|/d with p = 0.9 (the
    * residual mass beyond k is ignored — a documented LOWER bound, the
    * right read for comparing two top-k dashboards). Exactness: both
    * rankings are TakeOrdered top-k with (score desc, id) tie-breaks;
    * the depth-d agreement comes from each shared item's
    * max(rank_A, rank_B) via one k-row cumulative window; p^{d−1}
    * evaluates as exp((d−1)·ln p) — the portable libm pair, never
    * `pow` — and per-depth terms micro-quantize before the k-row sum.
    * Everything after the two top-k heaps is k-sized. */
  def rboTopK(
      df: DataFrame, idCol: String, scoreACol: String,
      scoreBCol: String, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    def ranks(scoreCol: String, name: String) = df
      .select(col(idCol).as("id"), col(scoreCol).cast("long").as("s"))
      .orderBy(col("s").desc, col("id"))
      .limit(k)
      // k rows — the global window ranks the already-TakeOrdered head
      .withColumn(name, row_number().over(
        Window.orderBy(col("s").desc, col("id"))).cast("long"))
      .select(col("id"), col(name))
    val joined = ranks(scoreACol, "ra").join(ranks(scoreBCol, "rb"), Seq("id"))
      .select(greatest(col("ra"), col("rb")).as("maxr"))
    val counts = joined.groupBy(col("maxr"))
      .agg(count(lit(1)).cast("long").as("c"))
    val spine = df.sparkSession.range(1, k + 1).toDF("d")
    spine.join(counts, col("maxr") === col("d"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      // k-row cumulative — single-partition window on k rows by design
      .withColumn("agree", sum(col("c")).over(
        Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("term_micro", expr(rboTermMicroSql))
      .agg(max(col("d")).cast("long").as("k"),
        max(col("agree")).cast("long").as("n_both"),
        sum(col("term_micro")).cast("long").as("rbo_micro"))
      .withColumn("rbo", expr(rboSql))
  }

  /** Exact rank-agreement metrics over the SHARED top-k items — the
    * unweighted companions to [[rboTopK]]'s top-weighted overlap:
    * Kendall tau = (concordant − discordant)/(m(m−1)/2) over the m
    * items both rankers place in their top k (ranks are distinct, so
    * no tie terms), and the Spearman footrule Σ|rank_A − rank_B|. Both
    * are EXACT integer counts off the m²-bounded pair self-join
    * (m ≤ k — the whole computation after the two top-k heaps is
    * k²-sized). */
  def rankAgreement(
      df: DataFrame, idCol: String, scoreACol: String,
      scoreBCol: String, k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1: $k")
    def ranks(scoreCol: String, name: String) = df
      .select(col(idCol).as("id"), col(scoreCol).cast("long").as("s"))
      .orderBy(col("s").desc, col("id"))
      .limit(k)
      .withColumn(name, row_number().over(
        Window.orderBy(col("s").desc, col("id"))).cast("long"))
      .select(col("id"), col(name))
    val shared = ranks(scoreACol, "ra").join(ranks(scoreBCol, "rb"), Seq("id"))
      .materialize // both sides of the m² pair join
    val pairs = shared.as("x").join(shared.as("y"),
        col("x.id") < col("y.id"))
      .select(((col("x.ra") - col("y.ra")) *
        (col("x.rb") - col("y.rb"))).as("prod"))
      .agg(sum(when(col("prod") > 0L, 1L).otherwise(0L)).cast("long")
          .as("n_con"),
        sum(when(col("prod") < 0L, 1L).otherwise(0L)).cast("long")
          .as("n_dis"))
    val foot = shared.agg(count(lit(1)).cast("long").as("m"),
      sum(abs(col("ra") - col("rb"))).cast("long").as("footrule"))
    pairs.crossJoin(broadcast(foot))
      .withColumn("k", lit(k.toLong))
      .withColumn("tau", expr(rankTauSql))
      .select(col("k"), col("m"), col("n_con"), col("n_dis"),
        col("footrule"), col("tau"))
  }

  /** τ over (n_con, n_dis, m); NULL below two shared items. Shared
    * with the oracle. */
  val rankTauSql: String =
    "CASE WHEN m > 1 THEN round(CAST(n_con - n_dis AS DOUBLE) / " +
      "(CAST(m AS DOUBLE) * (m - 1) / 2), 6) END"

  /** Per-depth (1−p)·p^{d−1}·agree/d in micro units, p = 0.9 via
    * exp/ln (portable libm; `pow` is not). Shared with the oracle. */
  val rboTermMicroSql: String =
    "CAST(ROUND(CAST(0.1 AS DOUBLE) * " +
      "exp((d - 1) * LN(CAST(0.9 AS DOUBLE))) * agree " +
      "/ d * 1000000, 0) AS BIGINT)"
  /** RBO@k off the exact micro sum. Shared with the oracle. */
  val rboSql: String =
    "round(CAST(rbo_micro AS DOUBLE) / 1000000, 6)"

  /** Spiegelhalter's Z — the UNBINNED calibration test next to
    * [[brier]] (loss magnitude) and [[ece]] (binned gap): under perfect
    * calibration E[(y−p)(1−2p)] = 0, so
    * Z = Σ(y−p)(1−2p) / √Σ(1−2p)²p(1−p) ~ N(0,1), sensitive to
    * miscalibration anywhere on the score range without choosing bins.
    * p is the same min-max confidence as brier's; per-row numerator and
    * variance terms micro-quantize so the sums are exact BIGINTs. One
    * min/max broadcast + one aggregate. */
  def spiegelhalterZ(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    val mm = broadcast(df.agg(min(s).as("lo"), max(s).as("hi")))
    df.select(s.as("__s"), when(col(labelCol), 1L).otherwise(0L).as("y"))
      .crossJoin(mm)
      .withColumn("num_micro", expr(spiegelNumMicroSql))
      .withColumn("den_micro", expr(spiegelDenMicroSql))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("num_micro")).cast("long").as("snum_micro"),
        sum(col("den_micro")).cast("long").as("sden_micro"))
      .withColumn("z", expr(spiegelZSql))
      .withColumn("significant", expr(s"abs($spiegelZSql) > 1.959964"))
  }

  // nullif divisor: subexpression elimination shares conf across the
  // numerator and variance terms, hoisting the division out of the
  // hi > lo guard (the riskDiff note in Profiling)
  private val spiegelConfSql: String =
    "(CASE WHEN hi > lo THEN " +
      "CAST(__s - lo AS DOUBLE) / nullif(hi - lo, 0) " +
      "ELSE CAST(0 AS DOUBLE) END)"
  /** Per-row (y−p)(1−2p) in micro units. Shared with the oracle. */
  val spiegelNumMicroSql: String =
    s"CAST(ROUND((y - $spiegelConfSql) * (1.0 - 2 * $spiegelConfSql) * " +
      "1000000, 0) AS BIGINT)"
  /** Per-row (1−2p)²p(1−p) in micro units. Shared with the oracle. */
  val spiegelDenMicroSql: String =
    s"CAST(ROUND((1.0 - 2 * $spiegelConfSql) * (1.0 - 2 * $spiegelConfSql)" +
      s" * $spiegelConfSql * (1.0 - $spiegelConfSql) * 1000000, 0) AS BIGINT)"
  /** Z over the exact micro sums; NULL when the variance degenerates
    * (every p at 0, ½, or 1). Shared with the oracle. */
  val spiegelZSql: String =
    "CASE WHEN sden_micro > 0 THEN " +
      "round((CAST(snum_micro AS DOUBLE) / 1000000) / " +
      "sqrt(CAST(sden_micro AS DOUBLE) / 1000000), 6) END"

  /** Hosmer–Lemeshow test — the BINNED calibration chi-square the
    * medical-stats world standardizes on: 10 fixed-width confidence
    * bins (fixed-width, not deciles — bin membership stays a pure
    * integer function of the score, so the oracle replays it with no
    * order-statistics machinery), per bin observed vs expected
    * positives, χ² = Σ (o−e)²·n/(e(n−e)) on the usable bins, df =
    * bins_used − 2. Degenerate bins (expected 0 or n — no information)
    * drop and are REPORTED in `bins_dropped`, not silently merged.
    * Expected sums micro-quantize per row; per-bin terms micro-quantize
    * before the cross-bin sum. */
  def hosmerLemeshow(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("long")
    val mm = broadcast(df.agg(min(s).as("lo"), max(s).as("hi")))
    df.select(s.as("__s"), when(col(labelCol), 1L).otherwise(0L).as("y"))
      .crossJoin(mm)
      .withColumn("bin", expr(
        "CASE WHEN hi > lo THEN least(CAST(9 AS BIGINT), " +
          "(__s - lo) * 10 div nullif(hi - lo, 0)) " +
          "ELSE CAST(0 AS BIGINT) END"))
      .withColumn("e_micro", expr(
        s"CAST(ROUND($spiegelConfSql * 1000000, 0) AS BIGINT)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("nb"),
        sum(col("y")).cast("long").as("o1"),
        sum(col("e_micro")).cast("long").as("e1_micro"))
      .withColumn("usable",
        col("e1_micro") > 0L && col("e1_micro") < col("nb") * 1000000L)
      .withColumn("term_micro", expr(hlTermMicroSql))
      .agg(
        sum(when(col("usable"), 1L).otherwise(0L)).cast("long")
          .as("bins_used"),
        sum(when(!col("usable"), 1L).otherwise(0L)).cast("long")
          .as("bins_dropped"),
        sum(when(col("usable"), col("term_micro")).otherwise(0L))
          .cast("long").as("hl_micro"))
      .withColumn("hl_chi2", expr(hlChi2Sql))
      .withColumn("df",
        greatest(col("bins_used") - 2L, lit(0L)).cast("long"))
      .withColumn("chi2_crit",
        expr(graft.operators.Profiling.chi2Crit95Sql("bins_used - 2")))
      .withColumn("significant", expr(
        s"$hlChi2Sql > ${graft.operators.Profiling.chi2Crit95Sql("bins_used - 2")}"))
  }

  /** Per-bin (o−e)²·n/(e(n−e)) in micro units over (nb, o1, e1_micro);
    * 0 for degenerate bins — the guard lives INSIDE the expression so
    * ANSI mode never sees a ROUND(∞) cast. Shared with the oracle. */
  val hlTermMicroSql: String = {
    val e = "(CAST(e1_micro AS DOUBLE) / 1000000)"
    "CASE WHEN e1_micro > 0 AND e1_micro < nb * 1000000 THEN " +
      s"CAST(ROUND((o1 - $e) * (o1 - $e) * nb / ($e * (nb - $e)) * " +
      "1000000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
  }
  /** HL χ² off the exact micro sum. Shared with the oracle. */
  val hlChi2Sql: String =
    "round(CAST(hl_micro AS DOUBLE) / 1000000, 6)"

  /** Expected calibration error over the [[calibrationBins]] table —
    * ONE number for "do the scores mean what they say": confidence is
    * the bin's mean score as a POSITION in the observed span (the
    * integer-score analogue of a probability), accuracy is the bin's
    * positive rate, ECE = Σ (n_b/N)·|acc_b − conf_b|. Per-bin terms
    * micro-quantized (deterministic double ops on exact integers), the
    * weighted sum exact. */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val s = col(scoreCol).cast("long")
    val mm = broadcast(df.agg(min(s).as("lo"), max(s).as("hi")))
    calibrationBins(df, scoreCol, labelCol, bins)
      .crossJoin(mm)
      .withColumn("term_micro", expr(eceTermMicroSql))
      .groupBy(col("lo"), col("hi"))
      .agg(sum(col("n")).cast("long").as("n_total"),
        count(lit(1)).cast("long").as("n_bins"),
        sum(col("term_micro")).cast("long").as("ece_micro"))
      .select(col("n_total"), col("n_bins"), col("ece_micro"),
        expr("round(CAST(ece_micro AS DOUBLE) / n_total / 1000000, 6)")
          .as("ece"))
  }

  /** Per-bin n_b·|acc−conf| in micro units over (n, n_pos, sum_score,
    * lo, hi) — conf = (mean_score − lo)/(hi − lo), degenerate single-
    * value spans score conf 0. Shared with the oracle. */
  val eceTermMicroSql: String =
    "CAST(ROUND(n * ABS(CAST(n_pos AS DOUBLE) / n - " +
      "(CASE WHEN hi > lo THEN " +
      "(CAST(sum_score AS DOUBLE) / n - lo) / (hi - lo) " +
      "ELSE CAST(0 AS DOUBLE) END)) * 1000000, 0) AS BIGINT)"

  /** Per-group Gini concentration coefficient of a non-negative
    * integer-domain value (cents): G = (2·Σ rank·x − (n+1)·Σx)/(n·Σx),
    * ties collapsed exactly (a tie block of equal x contributes
    * x·Σ positions regardless of within-tie order). Assembled from the
    * distinct-(group, value) table + [[rangedCumsum]]; numerator and
    * denominator emitted as exact BIGINTs beside the rounded ratio. */
  def gini(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val c = rangedCumsum(per, Seq(groupCol), "v", Seq("nv"))
    // Σ over the tie block positions: v·nv·(2·cumBefore + nv + 1) is 2·Σ rank·x
    c.groupBy(col(groupCol))
      .agg(
        sum(col("nv")).cast("long").as("n"),
        sum(col("v") * col("nv")).cast("long").as("sum_val"),
        sum(col("v") * col("nv") *
          (lit(2L) * (col("cum_nv") - col("nv")) + col("nv") + lit(1L)))
          .cast("long").as("twice_rank_sum"))
      .select(col(groupCol), col("n"), col("sum_val"),
        (col("twice_rank_sum") - (col("n") + 1) * col("sum_val")).as("num"),
        (col("n") * col("sum_val")).as("den"),
        round((col("twice_rank_sum") - (col("n") + 1) * col("sum_val"))
          .cast("double") / (col("n") * col("sum_val")), 6).as("gini"))
  }

  /** Atkinson inequality index (ε = 1) per group — the WELFARE-weighted
    * companion to [[gini]]: A = 1 − geomean(x)/mean(x) over positive
    * values, i.e. the share of total income society could discard and
    * be equally well off under log utility. ln terms nano-quantize per
    * element so the sum is an exact BIGINT; one map-side-combined
    * aggregate, no join, no sort (gini needs the rank prefix sum; this
    * doesn't). */
  def atkinson(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    df.filter(v > 0L)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(v).cast("long").as("sx"),
        sum(expr(s"CAST(ROUND(LN(CAST($valCol AS DOUBLE)) * 1000000000," +
          " 0) AS BIGINT)")).cast("long").as("sln_nano"))
      .withColumn("atkinson", expr(atkinsonSql))
  }

  /** A = 1 − exp(Σln/n)/(Σx/n) over (n, sx, sln_nano); NULL for an
    * empty group never reaches here (filter), n ≥ 1 always valid.
    * Shared with the oracle. */
  val atkinsonSql: String =
    "round(1.0 - exp(CAST(sln_nano AS DOUBLE) / 1000000000 / n) / " +
      "(CAST(sx AS DOUBLE) / n), 6)"

  /** Theil T inequality index per group — the DECOMPOSABLE member of
    * the trio with [[gini]] (rank-based) and [[atkinson]] (welfare):
    * T = (Σ x·ln x)/Σx − ln(Σx/n) over positive values, zero at
    * perfect equality, ln n at perfect concentration. x·ln x terms
    * quantize to MILLI units per element (cents-scale x·ln x ~ 4·10⁶ —
    * milli keeps the sum long-safe to ~10⁹ rows/group where nano would
    * cap near 10⁶), so the sum is exact; the rest is one shared double
    * chain. One map-side-combined aggregate. */
  def theilIndex(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val v = col(valCol).cast("long")
    df.filter(v > 0L)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(v).cast("long").as("sx"),
        sum(expr(s"CAST(ROUND($valCol * LN(CAST($valCol AS DOUBLE)) * " +
          "1000, 0) AS BIGINT)")).cast("long").as("sxlx_milli"))
      .withColumn("theil", expr(theilSql))
  }

  /** T over (n, sx, sxlx_milli); sx > 0 by the positive filter. Shared
    * with the oracle. */
  val theilSql: String =
    "round(CAST(sxlx_milli AS DOUBLE) / 1000 / sx - " +
      "LN(CAST(sx AS DOUBLE) / n), 6)"

  /** Exact per-group lower weighted median of an integer-domain value:
    * the smallest v whose inclusive cumulative weight reaches half the
    * group total (2·cumw ≥ W — integer compare, no ties to break). Same
    * distinct-value + ranged-prefix-sum shape as [[gini]]. */
  def weightedMedian(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      weightCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(sum(col(weightCol).cast("long")).cast("long").as("w"))
    val c = rangedCumsum(per, Seq(groupCol), "v", Seq("w"))
    val tot = broadcast(c.groupBy(col(groupCol))
      .agg(sum(col("w")).cast("long").as("w_total")))
    c.join(tot, Seq(groupCol))
      .filter(lit(2L) * col("cum_w") >= col("w_total"))
      .groupBy(col(groupCol), col("w_total"))
      .agg(min(col("v")).as("w_median"))
      .select(col(groupCol), col("w_total"), col("w_median"))
  }

  /** Exact per-group percentile rank (midrank convention) of every
    * DISTINCT value — the rank-normalization feature transform: value v
    * maps to (rank of its tie-block midpoint)/n = (2·cumBefore + n_v + 1)
    * / (2n), integer-exact until one final rounded division. Same
    * distinct-value + ranged-prefix-sum shape as [[gini]]; output is
    * value-domain-sized, joined back to rows by (group, value) when a
    * per-row column is needed. */
  def percentileRank(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val c = rangedCumsum(per, Seq(groupCol), "v", Seq("nv"))
    val tot = broadcast(c.groupBy(col(groupCol))
      .agg(sum(col("nv")).cast("long").as("n")))
    c.join(tot, Seq(groupCol))
      .select(col(groupCol), col("v"), col("nv"), col("n"),
        round((lit(2L) * col("cum_nv") - col("nv") + 1L).cast("double") /
          (lit(2L) * col("n")), 6).as("pct_rank"))
  }

  /** EXACT order statistics — many quantiles in ONE pass, no global sort:
    * value k at cumulative position ceil(f·n) is read off the
    * materialized-once prefix table with a tiny broadcast of position
    * marks (distinct-value rows scan once; `percentile()`-style exact
    * aggregates sort each group through one reducer instead). Fractions
    * are exact rationals (num, den) so positions are integer arithmetic —
    * pos = ⌈num·n/den⌉ = (num·n + den − 1) div den, floor-guarded to 1 —
    * and the SQL oracle replays them. */
  def orderStatistics(
      df: DataFrame, valCol: String,
      fractions: Seq[(Int, Int)]): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(fractions.forall { case (n, d) => n >= 0 && d > 0 && n <= d },
      s"fractions must be rationals in [0,1]: $fractions")
    val per = df.groupBy(col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val c = rangedCumsum(per, Nil, "v", Seq("nv"))
    val tot = broadcast(c.agg(sum(col("nv")).cast("long").as("n")))
    val fr = df.sparkSession.createDataFrame(fractions)
      .toDF("f_num", "f_den")
      .select(col("f_num").cast("long"), col("f_den").cast("long"))
    val marks = broadcast(fr.crossJoin(tot).selectExpr(
      "f_num", "f_den", "n",
      "greatest(CAST((f_num * n + f_den - 1) div f_den AS BIGINT), 1L) AS pos"))
    c.crossJoin(marks)
      .filter(col("cum_nv") >= col("pos") &&
        col("cum_nv") - col("nv") < col("pos"))
      .select(col("f_num"), col("f_den"), col("n"), col("pos"),
        col("v").as("value"))
  }

  /** Split-conformal prediction interval on the [[ols2]] fit — the
    * distribution-free uncertainty wrapper every large-scale predictor
    * needs: hash-split the data (the leakage-safe md5 split), fit on half
    * 0, take the ceil(0.9·n) order statistic of the ABSOLUTE residuals on
    * half 1 (micro-quantized, so the quantile is an exact integer
    * selection via the shared prefix-sum kernel), and report it with the
    * measured calibration coverage (≥ 0.9 by construction — emitted as a
    * sanity check, not a claim about future data).
    *
    * Scale shape: one Gram aggregate (fit), one broadcast of the 1-row
    * beta table, one distinct-residual prefix sum, one coverage
    * aggregate. The tagged input and the residual table are each
    * materialized ONCE before their two-branch fan-outs (the
    * [[rangedCumsum]] discipline). */
  def conformalOls2(
      df: DataFrame, idCol: String,
      yCol: String, x1Col: String, x2Col: String): DataFrame = {
    val tagged = df.withColumn("__half",
      pmod(graft.functions.TextFunctions.tokenHash60(
        concat(lit("cf:"), col(idCol).cast("string"))), lit(2L)))
      .materialize
    val train = tagged.filter(col("__half") === 0L)
    val calib = tagged.filter(col("__half") === 1L)
    val fit = broadcast(
      ols2(train, yCol, x1Col, x2Col)
        .select(col("n").as("n_train"), col("b0"), col("b1"), col("b2")))
    val resid = calib.crossJoin(fit)
      .withColumn("r_micro",
        round(abs(col(yCol).cast("double") -
          (col("b0") + col("b1") * col(x1Col).cast("double") +
            col("b2") * col(x2Col).cast("double"))) * 1e6, 0).cast("long"))
      .select(col("n_train"), col("r_micro"))
      .materialize
    val q = orderStatistics(resid.select(col("r_micro")), "r_micro", Seq((9, 10)))
      .select(col("n").as("n_calib"), col("pos"), col("value").as("q90_micro"))
    resid.crossJoin(broadcast(q))
      .groupBy(col("n_train"), col("n_calib"), col("pos"), col("q90_micro"))
      .agg(
        sum(when(col("r_micro") <= col("q90_micro"), 1L).otherwise(0L))
          .cast("long").as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered").cast("double") / col("n_calib"), 6))
  }

  /** Difference-in-differences — the experiment readout when treatment
    * wasn't randomized per-event: effect = (treated post − treated pre) −
    * (control post − control pre), cancelling both group-level baselines
    * and period-level shocks. The data collapses to FOUR (treat, post)
    * cells of exact integer (sum, count) in one map-side-combined
    * aggregate; the effect is one shared-SQL double expression over that
    * row. */
  def diffInDiff(
      df: DataFrame, treatCol: String, postCol: String, valCol: String): DataFrame = {
    def cell(t: Boolean, p: Boolean, agg: Column): Column =
      max(when(col(treatCol) === t && col(postCol) === p, agg))
    df.groupBy(col(treatCol).as("treat"), col(postCol).as("post"))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(col(valCol)).cast("long").as("__s"))
      .agg(
        cell(true, true, col("__s")).as("s_t1"), cell(true, true, col("__n")).as("n_t1"),
        cell(true, false, col("__s")).as("s_t0"), cell(true, false, col("__n")).as("n_t0"),
        cell(false, true, col("__s")).as("s_c1"), cell(false, true, col("__n")).as("n_c1"),
        cell(false, false, col("__s")).as("s_c0"), cell(false, false, col("__n")).as("n_c0"))
      .withColumn("dd_effect", expr(didSql))
  }

  /** The DiD effect over the 8-cell row, shared verbatim with the oracle. */
  val didSql: String =
    "round((CAST(s_t1 AS DOUBLE)/n_t1 - CAST(s_t0 AS DOUBLE)/n_t0) - " +
      "(CAST(s_c1 AS DOUBLE)/n_c1 - CAST(s_c0 AS DOUBLE)/n_c0), 6)"

  /** Lorenz curve — [[gini]]'s plottable companion: users ranked by
    * spend, cumulative population share vs cumulative spend share at each
    * decile boundary, in EXACT parts-per-million (integer `(cum·10⁶) DIV
    * total` — no float accumulation). Same distinct-value prefix-sum
    * kernel as gini: ties collapse first, the ranged cumsum assigns
    * positions, deciles are integer arithmetic on the cumulative counts,
    * and the final 10-row curve aggregates with one tiny window. */
  def lorenzCurve(df: DataFrame, valCol: String): DataFrame = {
    val per = df.groupBy(col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nu"),
        sum(col(valCol)).cast("long").as("sv"))
    val c = rangedCumsum(per, Nil, "v", Seq("nu", "sv"))
    val tot = broadcast(c.agg(
      sum(col("nu")).cast("long").as("n_users"),
      sum(col("sv")).cast("long").as("total_spend")))
    val dec = c.crossJoin(tot)
      .withColumn("decile", expr("((cum_nu - 1) * 10) DIV n_users"))
      .groupBy(col("decile"))
      .agg(sum(col("nu")).cast("long").as("n_users_in"),
        max(col("cum_nu")).as("cum_users"),
        max(col("cum_sv")).as("cum_spend"))
    dec.crossJoin(tot)
      .select(col("decile"), col("n_users_in"),
        expr("(cum_users * 1000000) DIV n_users").as("cum_user_ppm"),
        expr("(cum_spend * 1000000) DIV total_spend").as("cum_spend_ppm"))
  }

  /** Decile lift / gains table — the model-eval artifact next to
    * [[auc]]: units ranked by score DESCENDING, and per decile the
    * positive rate relative to the base rate (lift, exact micro units)
    * plus the cumulative share of all positives captured (gains, exact
    * ppm). What a targeting/quality-filter model is actually USED for —
    * "call the top 20%" — read straight off rows 0–1. Same
    * distinct-value prefix-sum kernel as [[lorenzCurve]] (negated score
    * orders descending); ties collapse before ranking so the table is
    * partitioning-independent. */
  def decileLift(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val per = df
      .groupBy((-col(scoreCol).cast("long")).as("v"))
      .agg(count(lit(1)).cast("long").as("nu"),
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("np"))
    val c = rangedCumsum(per, Nil, "v", Seq("nu", "np"))
    val tot = broadcast(c.agg(
      sum(col("nu")).cast("long").as("n_units"),
      sum(col("np")).cast("long").as("n_pos_total")))
    c.crossJoin(tot)
      .withColumn("decile", expr("((cum_nu - 1) * 10) DIV n_units"))
      .groupBy(col("decile"), col("n_units"), col("n_pos_total"))
      .agg(sum(col("nu")).cast("long").as("n"),
        sum(col("np")).cast("long").as("n_pos"),
        max(col("cum_np")).as("cum_pos"))
      .withColumn("lift_micro", expr(liftSql))
      .withColumn("cum_gain_ppm", expr("(cum_pos * 1000000) DIV n_pos_total"))
      .select(col("decile"), col("n"), col("n_pos"), col("lift_micro"),
        col("cum_gain_ppm"))
  }

  /** Per-decile lift over the counts row, shared with the oracle. */
  val liftSql: String =
    "CAST(ROUND(CAST(n_pos AS DOUBLE) / n / " +
      "(CAST(n_pos_total AS DOUBLE) / n_units) * 1000000, 0) AS BIGINT)"

  /** Distributed decision stump — one exact tree-split search, the
    * building block of tree ensembles at scale: every distinct feature
    * value is a candidate threshold, and the weighted Gini impurity of
    * the (≤ v, > v) split comes entirely from the distinct-value prefix
    * sums (cum units, cum positives) — ONE ranged cumsum scan evaluates
    * ALL thresholds, no per-candidate pass. Scores are micro-quantized
    * shared SQL; the argmin tie-breaks on the smaller threshold. Output
    * is one row: the best split with its left/right composition and the
    * impurity reduction. */
  def decisionStump(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(featureCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nu"),
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("np"))
    val c = rangedCumsum(per, Nil, "v", Seq("nu", "np"))
    val tot = broadcast(c.agg(
      sum(col("nu")).cast("long").as("n_total"),
      sum(col("np")).cast("long").as("p_total")))
    val scored = c.crossJoin(tot)
      .filter(col("cum_nu") < col("n_total")) // right side must be non-empty
      .withColumn("gini_split_micro", expr(giniSplitSql))
    val best = scored
      .sort(col("gini_split_micro"), col("v"))
      .limit(1)
    best.select(col("v").as("split_value"),
      col("cum_nu").as("n_left"), col("cum_np").as("pos_left"),
      (col("n_total") - col("cum_nu")).as("n_right"),
      (col("p_total") - col("cum_np")).as("pos_right"),
      col("n_total"), col("p_total"),
      expr(giniParentSql).as("gini_parent_micro"),
      col("gini_split_micro"),
      (expr(giniParentSql) - col("gini_split_micro")).as("gain_micro"))
  }

  /** Weight-of-Evidence / Information-Value binning — the credit-scoring
    * feature report: units deciled by the feature (the [[lorenzCurve]]
    * decile kernel), each bin scored WoE = ln((pos_share)/(neg_share))
    * and its IV contribution (pos% − neg%)·WoE, both in micro units via
    * shared SQL. Σ iv_micro ranks the feature's predictive power
    * (<0.02 useless, >0.3 strong — the standard scorecard bands). Bins
    * where a class is absent emit NULL WoE (both engines), the
    * standard "needs smoothing/merging" signal. */
  def woeBins(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(featureCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nu"),
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("np"))
    val c = rangedCumsum(per, Nil, "v", Seq("nu", "np"))
    val tot = broadcast(c.agg(
      sum(col("nu")).cast("long").as("n_units"),
      sum(col("np")).cast("long").as("p_total")))
    c.crossJoin(tot)
      .withColumn("decile", expr("((cum_nu - 1) * 10) DIV n_units"))
      .groupBy(col("decile"), col("n_units"), col("p_total"))
      .agg(sum(col("nu")).cast("long").as("n"),
        sum(col("np")).cast("long").as("pos"))
      .withColumn("neg", col("n") - col("pos"))
      .withColumn("woe_micro", expr(woeSql))
      .withColumn("iv_micro", expr(ivSql))
      .select(col("decile"), col("n"), col("pos"), col("neg"),
        col("woe_micro"), col("iv_micro"))
  }

  /** WoE and IV contribution over the bin row, shared SQL. NULL-yielding
    * zero cells are deliberate (see [[woeBins]]). */
  val woeSql: String = {
    val ps = "(CAST(pos AS DOUBLE) / p_total)"
    val ns = "(CAST(neg AS DOUBLE) / (n_units - p_total))"
    s"CASE WHEN pos > 0 AND neg > 0 THEN " +
      s"CAST(ROUND(ln($ps / $ns) * 1000000, 0) AS BIGINT) END"
  }
  val ivSql: String = {
    val ps = "(CAST(pos AS DOUBLE) / p_total)"
    val ns = "(CAST(neg AS DOUBLE) / (n_units - p_total))"
    s"CASE WHEN pos > 0 AND neg > 0 THEN " +
      s"CAST(ROUND(($ps - $ns) * ln($ps / $ns) * 1000000, 0) AS BIGINT) END"
  }

  /** Weighted post-split Gini over the prefix row, micro units. */
  val giniSplitSql: String = {
    val pl = "(CAST(cum_np AS DOUBLE) / cum_nu)"
    val pr = "(CAST(p_total - cum_np AS DOUBLE) / (n_total - cum_nu))"
    "CAST(ROUND((CAST(cum_nu AS DOUBLE) * (2.0 * " + pl + " * (1.0 - " + pl +
      ")) + CAST(n_total - cum_nu AS DOUBLE) * (2.0 * " + pr +
      " * (1.0 - " + pr + "))) / n_total * 1000000, 0) AS BIGINT)"
  }

  /** Parent-node Gini over (p_total, n_total), micro units. */
  val giniParentSql: String = {
    val p = "(CAST(p_total AS DOUBLE) / n_total)"
    s"CAST(ROUND(2.0 * $p * (1.0 - $p) * 1000000, 0) AS BIGINT)"
  }

  /** CUPED variance reduction — the experimentation-platform readout
    * that shrinks A/B noise with PRE-period data: θ = cov(pre, post)/
    * var(pre) from exact integer moments, and the adjusted effect
    * (ȳ_t − ȳ_c) − θ(x̄_t − x̄_c) removes the component of the raw
    * difference explained by pre-existing spend. ρ² (the fraction of
    * variance CUPED removes) is emitted alongside. Input is one row per
    * unit (treat flag, pre metric, post metric); everything collapses to
    * global + per-arm moment sums in one map-side-combined aggregate
    * pair, with the solve as shared SQL text. */
  def cuped(
      df: DataFrame, treatCol: String, preCol: String, postCol: String): DataFrame = {
    val g = df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col(preCol)).cast("long").as("sx"),
      sum(col(postCol)).cast("long").as("sy"),
      sum(col(preCol) * col(preCol)).cast("long").as("sxx"),
      sum(col(postCol) * col(postCol)).cast("long").as("syy"),
      sum(col(preCol) * col(postCol)).cast("long").as("sxy"))
    val arms = df.agg(
      sum(when(col(treatCol), 1L).otherwise(0L)).cast("long").as("n_t"),
      sum(when(col(treatCol), col(postCol))).cast("long").as("sy_t"),
      sum(when(col(treatCol), col(preCol))).cast("long").as("sx_t"),
      sum(when(!col(treatCol), 1L).otherwise(0L)).cast("long").as("n_c"),
      sum(when(!col(treatCol), col(postCol))).cast("long").as("sy_c"),
      sum(when(!col(treatCol), col(preCol))).cast("long").as("sx_c"))
    broadcast(g).crossJoin(arms)
      .withColumn("theta", expr(s"round($cupedThetaSql, 6)"))
      .withColumn("rho2", expr(cupedRho2Sql))
      .withColumn("raw_diff", expr(
        "round(CAST(sy_t AS DOUBLE)/n_t - CAST(sy_c AS DOUBLE)/n_c, 6)"))
      .withColumn("adj_diff", expr(
        "round((CAST(sy_t AS DOUBLE)/n_t - CAST(sy_c AS DOUBLE)/n_c) - " +
          s"$cupedThetaSql * (CAST(sx_t AS DOUBLE)/n_t - CAST(sx_c AS DOUBLE)/n_c), 6)"))
  }

  /** θ and ρ² over the moment row, shared verbatim with the oracle. */
  val cupedThetaSql: String =
    "((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) / " +
      "(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx))"
  val cupedRho2Sql: String =
    "round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) * " +
      "(CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) / " +
      "((CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx) * " +
      "(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)), 6)"

  /** Per-class confusion stats of a categorical prediction: TP/FP/FN as
    * exact counts plus precision/recall/F1 (0.0 where the denominator is
    * empty — a class never predicted has precision 0 by convention, not
    * NULL). One count aggregate builds the confusion cells; per-class
    * rows come from two tiny re-aggregations of those cells. */
  /** Two-feature OLS with intercept by NORMAL EQUATIONS — regression at
    * 100 TB is one Gram aggregate, not an iterative solver: the data
    * collapses to the 9 moment sums (n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy,
    * Σx₁y, Σx₂y, plus Σy² for R²) in a single map-side-combined pass,
    * and the 3×3 solve is closed-form Cramer arithmetic on that one row.
    * Inputs must be integer-valued columns (cents/counts) so the moment
    * sums are EXACT longs; the solve casts to double with the formula
    * written once as SQL text evaluated identically by Spark and the
    * DuckDB oracle. R² comes from the algebraic identity
    * SSE = Σy² − b₀Σy − b₁Σx₁y − b₂Σx₂y. */
  def ols2(df: DataFrame, yCol: String, x1Col: String, x2Col: String): DataFrame = {
    val sums = df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col(x1Col)).cast("long").as("s1"),
      sum(col(x2Col)).cast("long").as("s2"),
      sum(col(x1Col) * col(x1Col)).cast("long").as("s11"),
      sum(col(x1Col) * col(x2Col)).cast("long").as("s12"),
      sum(col(x2Col) * col(x2Col)).cast("long").as("s22"),
      sum(col(yCol)).cast("long").as("sy"),
      sum(col(x1Col) * col(yCol)).cast("long").as("s1y"),
      sum(col(x2Col) * col(yCol)).cast("long").as("s2y"),
      sum(col(yCol) * col(yCol)).cast("long").as("syy"))
    ols2Solve.foldLeft(sums) { case (d, (name, sql)) =>
      d.withColumn(name, expr(sql))
    }
  }

  /** The shared closed-form solve, as SQL text over the moment-sum row —
    * spliced verbatim into the DuckDB oracle so both engines execute the
    * identical double-arithmetic expression tree. */
  val ols2Solve: Seq[(String, String)] = {
    val (n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy) = (
      "CAST(n AS DOUBLE)", "CAST(s1 AS DOUBLE)", "CAST(s2 AS DOUBLE)",
      "CAST(s11 AS DOUBLE)", "CAST(s12 AS DOUBLE)", "CAST(s22 AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(s1y AS DOUBLE)", "CAST(s2y AS DOUBLE)",
      "CAST(syy AS DOUBLE)")
    val det =
      s"($n*($s11*$s22 - $s12*$s12) - $s1*($s1*$s22 - $s12*$s2) + $s2*($s1*$s12 - $s11*$s2))"
    val det0 =
      s"($sy*($s11*$s22 - $s12*$s12) - $s1*($s1y*$s22 - $s12*$s2y) + $s2*($s1y*$s12 - $s11*$s2y))"
    val det1 =
      s"($n*($s1y*$s22 - $s12*$s2y) - $sy*($s1*$s22 - $s12*$s2) + $s2*($s1*$s2y - $s1y*$s2))"
    val det2 =
      s"($n*($s11*$s2y - $s1y*$s12) - $s1*($s1*$s2y - $s1y*$s2) + $sy*($s1*$s12 - $s11*$s2))"
    val (b0, b1, b2) = (s"($det0/$det)", s"($det1/$det)", s"($det2/$det)")
    Seq(
      "b0" -> s"round($b0, 6)",
      "b1" -> s"round($b1, 6)",
      "b2" -> s"round($b2, 6)",
      "r2" -> (s"round(1.0 - ($syy - $b0*$sy - $b1*$s1y - $b2*$s2y) / " +
        s"($syy - $sy*$sy/$n), 6)"))
  }

  /** Ridge regularization path for the 2-feature regression: the
    * [[ols2]] normal equations with λ added to the SLOPE diagonal only
    * (X'X + λ·diag(0,1,1) — the intercept is never penalized, the
    * standard convention), solved closed-form at every λ in
    * `lambdas`. λ = 0 reproduces [[ols2]]'s coefficients exactly
    * (pinned by spec). Raw-unit penalties: λ is in the features' own
    * scale, so callers pick the grid for their units — the path shape,
    * not λ's absolute meaning, is the diagnostic.
    *
    * Determinism/scale shape: the NINE exact integer moments are ONE
    * Gram aggregate over the data — the λ grid then fans out over the
    * single moment row (a broadcast of |λ| rows), so the path costs
    * one pass regardless of grid size; the per-λ Cramer solve is the
    * shared double text ([[ridge2Solve]]), spliced verbatim into the
    * oracle. */
  def ridge2Path(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      lambdas: Seq[Long]): DataFrame = {
    require(lambdas.nonEmpty, "lambdas must be non-empty")
    require(lambdas.forall(_ >= 0L), s"lambdas must be >= 0: $lambdas")
    require(lambdas.distinct.size == lambdas.size,
      s"duplicate lambdas: $lambdas")
    val sums = df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col(x1Col)).cast("long").as("s1"),
      sum(col(x2Col)).cast("long").as("s2"),
      sum(col(x1Col) * col(x1Col)).cast("long").as("s11"),
      sum(col(x1Col) * col(x2Col)).cast("long").as("s12"),
      sum(col(x2Col) * col(x2Col)).cast("long").as("s22"),
      sum(col(yCol)).cast("long").as("sy"),
      sum(col(x1Col) * col(yCol)).cast("long").as("s1y"),
      sum(col(x2Col) * col(yCol)).cast("long").as("s2y"))
    val grid = sums.select(col("*"),
      explode(array(lambdas.map(l => lit(l)): _*)).as("lam"))
    ridge2Solve.foldLeft(grid) { case (d, (name, sql)) =>
      d.withColumn(name, expr(sql))
    }.select(col("lam").as("lambda"), col("b0"), col("b1"), col("b2"))
  }

  /** The ridge closed-form solve over the moment row + `lam` — the
    * [[ols2Solve]] Cramer text with (s11 + λ) and (s22 + λ) on the
    * slope diagonal (integer sums, so the penalized entries stay
    * exact). Shared verbatim with the oracle. */
  val ridge2Solve: Seq[(String, String)] = {
    val (n, s1, s2, s12, sy, s1y, s2y) = (
      "CAST(n AS DOUBLE)", "CAST(s1 AS DOUBLE)", "CAST(s2 AS DOUBLE)",
      "CAST(s12 AS DOUBLE)", "CAST(sy AS DOUBLE)", "CAST(s1y AS DOUBLE)",
      "CAST(s2y AS DOUBLE)")
    val a11 = "CAST(s11 + lam AS DOUBLE)"
    val a22 = "CAST(s22 + lam AS DOUBLE)"
    val det =
      s"($n*($a11*$a22 - $s12*$s12) - $s1*($s1*$a22 - $s12*$s2) + $s2*($s1*$s12 - $a11*$s2))"
    val det0 =
      s"($sy*($a11*$a22 - $s12*$s12) - $s1*($s1y*$a22 - $s12*$s2y) + $s2*($s1y*$s12 - $a11*$s2y))"
    val det1 =
      s"($n*($s1y*$a22 - $s12*$s2y) - $sy*($s1*$a22 - $s12*$s2) + $s2*($s1*$s2y - $s1y*$s2))"
    val det2 =
      s"($n*($a11*$s2y - $s1y*$s12) - $s1*($s1*$s2y - $s1y*$s2) + $sy*($s1*$s12 - $a11*$s2))"
    Seq(
      "b0" -> s"round($det0/$det, 6)",
      "b1" -> s"round($det1/$det, 6)",
      "b2" -> s"round($det2/$det, 6)")
  }

  /** Leave-one-out target encoding with additive smoothing — the
    * leakage-safe categorical feature a training pipeline derives from
    * the label: enc(row) = (Σ_cat y − y_row + m·prior) / (n_cat − 1 + m),
    * prior = the global label mean. Subtracting the row's OWN label from
    * its category sum is what keeps the feature out-of-sample (plain
    * category means leak the label and overfit rare categories); the
    * smoothing mass `m` pulls singleton categories toward the prior
    * (n_cat = 1 ⇒ enc = prior exactly).
    *
    * Determinism: category sums/counts are exact integers from ONE
    * category-partitioned window; the finish is shared double text
    * ([[targetEncodeSql]]). Scale shape: one window pass keyed by the
    * category + a 1-row broadcast of the global sums — no joins, no
    * per-category table, label cardinality never leaves its partition. */
  def targetEncodeLoo(
      df: DataFrame, catCol: String, labelCol: String,
      idCols: Seq[String], m: Long = 10L): DataFrame = {
    require(m >= 1L, s"smoothing mass m must be >= 1: $m")
    require(idCols.nonEmpty, "idCols must name the output row identity")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(catCol))
    val g = broadcast(df.agg(
      sum(col(labelCol).cast("long")).as("__sg"),
      count(lit(1)).as("__ng")))
    df.select(idCols.map(col) :+ col(catCol) :+
        col(labelCol).cast("long").as("__y"): _*)
      .withColumn("__sc", sum(col("__y")).over(w))
      .withColumn("__nc", count(lit(1)).over(w))
      .crossJoin(g)
      .withColumn("enc", expr(targetEncodeSql(m)))
      .select(idCols.map(col) ++
        Seq(col(catCol), col("__y").as("label"), col("enc")): _*)
  }

  /** The LOO-encode finish over (__y, __sc, __nc, __sg, __ng); shared
    * with the oracle. */
  def targetEncodeSql(m: Long): String =
    s"round((CAST(__sc - __y AS DOUBLE) + CAST($m AS DOUBLE) * " +
      s"(CAST(__sg AS DOUBLE) / __ng)) / CAST(__nc - 1 + $m AS DOUBLE), 6)"

  /** Two-feature logistic regression by IRLS with a FIXED iteration
    * count — the classification sibling of [[ols2]] (and the same
    * engine discipline as TimeSeries.poissonTrend): per round,
    * weight w = p(1−p) and working response z = η + (y−p)/w reduce the
    * Newton step to the WEIGHTED normal equations, whose nine moments
    * are micro-quantized per row (w·z = w·η + y − p, so no per-row
    * division feeds a float sum) and summed exactly; the 3×3 Cramer
    * solve is [[ols2Solve]]'s b0/b1/b2 text verbatim (the common 10⁶
    * factor cancels), so both engines replay identical coefficient
    * trajectories, one row per iteration.
    *
    * Per-iteration coefficients round(6) through the shared solve —
    * the fixpoint is pinned to that grid, which is also the output
    * precision. Quantization bound: per-row |x·(w·η + y − p)| ≲ 9·10¹²
    * at micro — keep features rescaled (totalprice in $k, not cents).
    * Degenerate labels (all 0 or all 1) make the init log-odds ±∞ by
    * contract — callers feed interior labels (the saturating-predicate
    * probe rule).
    *
    * Scale shape: one aggregate pass per iteration; params ride a
    * 1-row broadcast, materialized per round. */
  def logisticIrls2(
      df: DataFrame, yCol: String, x1Col: String, x2Col: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 8, s"iters must be in [1, 8]: $iters")
    val s = df.select(col(yCol).cast("long").as("y"),
        col(x1Col).cast("long").as("x1"), col(x2Col).cast("long").as("x2"))
      .materialize
    def micro(e: String) = expr(s"CAST(ROUND(($e) * 1000000, 0) AS BIGINT)")
    // params are a 1-ROW driver fold (the sanctioned inherently-
    // sequential pattern): every numeric step — init log-odds, moment
    // solve — still executes as the SHARED SQL text inside Spark, the
    // driver only carries the three solved doubles between rounds (a
    // per-round localCheckpoint of a 1-row frame measured ~2x slower)
    var cur = {
      val r = s.agg(count(lit(1)).cast("long").as("nr"),
          sum(col("y")).cast("long").as("syr"))
        .collect()(0)
      val (nr, syr) =
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      require(nr > 0L && syr > 0L && syr < nr,
        s"logistic IRLS needs an INTERIOR 0/1 label (got $syr positives " +
          s"of $nr rows) — the saturating-predicate probe rule")
      // the init log-odds still evaluates as Spark SQL over the exact
      // counts (engine parity with the oracle's i0 text)
      val b0 = s.sparkSession.sql(
        s"SELECT ln((CAST($syr AS DOUBLE) / $nr) / " +
          s"(1.0 - CAST($syr AS DOUBLE) / $nr)) AS b0")
        .collect()(0).getDouble(0)
      (b0, 0.0, 0.0)
    }
    val trail = (1 to iters).map { i =>
      val t = s
        .withColumn("b0", lit(cur._1)).withColumn("b1", lit(cur._2))
        .withColumn("b2", lit(cur._3))
        .withColumn("eta", expr("b0 + b1 * x1 + b2 * x2"))
        .withColumn("p", expr("1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))"))
        .withColumn("w", expr("p * (1.0 - p)"))
        .agg(
          sum(micro("w")).as("n"),
          sum(micro("w * x1")).as("s1"),
          sum(micro("w * x2")).as("s2"),
          sum(micro("w * x1 * x1")).as("s11"),
          sum(micro("w * x1 * x2")).as("s12"),
          sum(micro("w * x2 * x2")).as("s22"),
          sum(micro("w * eta + y - p")).as("sy"),
          sum(micro("x1 * (w * eta + y - p)")).as("s1y"),
          sum(micro("x2 * (w * eta + y - p)")).as("s2y"))
      val r = ols2Solve.take(3).foldLeft(t) { case (d, (name, sql)) =>
          d.withColumn(name, expr(sql))
        }
        .select(col("b0"), col("b1"), col("b2")).collect()(0)
      cur = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      (i.toLong, cur._1, cur._2, cur._3)
    }
    import s.sparkSession.implicits._
    trail.toDF("iter", "b0", "b1", "b2")
  }

  /** Inverse-propensity-weighted (Hájek) average treatment effect:
    * fit the propensity e(x) = P(t=1 | x1, x2) with [[logisticIrls2]],
    * clip it to [clip, 1−clip] (the standard overlap guard), and
    * contrast the self-normalized reweighted outcome means. Also emits
    * the naive mean difference so the output SHOWS what the
    * reweighting moved.
    *
    * Determinism: the fitted coefficients are round(6)-pinned by
    * construction; every reweighted term (y·t/ê etc.) is
    * MILLI-quantized per row and summed exactly (milli, not micro —
    * clipping at 0.01 inflates terms 100×, and the int64 budget must
    * survive outcome·10²·quantum·rows); the four-ratio finish is
    * shared text ([[ipwAteSql]]).
    *
    * Scale shape: the IRLS passes + ONE reweighting aggregate; the
    * coefficient row is a 1-row broadcast. */
  def ipwAte(
      df: DataFrame, tCol: String, yCol: String,
      x1Col: String, x2Col: String,
      iters: Int = 4, clip: Double = 0.01): DataFrame = {
    require(clip > 0.0 && clip < 0.5, s"clip must be in (0, 0.5): $clip")
    val s = df.select(col(tCol).cast("long").as("t"),
        col(yCol).cast("long").as("yo"),
        col(x1Col).cast("long").as("x1"), col(x2Col).cast("long").as("x2"))
      .materialize
    val fit = logisticIrls2(
      s.select(col("t").as("y"), col("x1"), col("x2")), "y", "x1", "x2",
      iters)
    val last = broadcast(fit.orderBy(col("iter").desc).limit(1)
      .select(col("b0"), col("b1"), col("b2")))
    def milli(e: String) = expr(s"CAST(ROUND(($e) * 1000, 0) AS BIGINT)")
    s.crossJoin(last)
      .withColumn("eh", expr(ipwEhSql(clip)))
      .agg(
        sum(col("t")).cast("long").as("n_treated"),
        sum(lit(1L) - col("t")).cast("long").as("n_control"),
        sum(milli("t * yo / eh")).as("ty"),
        sum(milli("t / eh")).as("tw"),
        sum(milli("(1 - t) * yo / (1.0 - eh)")).as("cy"),
        sum(milli("(1 - t) / (1.0 - eh)")).as("cw"),
        sum(col("t") * col("yo")).cast("long").as("sty"),
        sum((lit(1L) - col("t")) * col("yo")).cast("long").as("scy"))
      .select(col("n_treated"), col("n_control"),
        expr(ipwAteSql).as("ate_ipw"),
        expr(naiveDiffSql).as("diff_naive"))
  }

  /** Hájek contrast over the milli-quantized sums (the quantum
    * cancels); shared with the oracle. */
  val ipwAteSql: String =
    "round(CAST(ty AS DOUBLE) / tw - CAST(cy AS DOUBLE) / cw, 6)"

  /** Naive mean difference over the exact outcome sums; shared. */
  val naiveDiffSql: String =
    "round(CAST(sty AS DOUBLE) / n_treated - " +
      "CAST(scy AS DOUBLE) / n_control, 6)"

  /** Clipped propensity over (b0, b1, b2, x1, x2); every literal is an
    * explicit DOUBLE cast (dtype canary). Shared with the oracle. */
  def ipwEhSql(clip: Double): String =
    s"greatest(CAST($clip AS DOUBLE), least(CAST(${1 - clip} AS DOUBLE), " +
      "1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2)))))"

  /** Doubly-robust (AIPW) average treatment effect — consistent when
    * EITHER the propensity model OR the per-arm outcome regressions are
    * right: per row,
    * ψ = μ₁(x) − μ₀(x) + t(y−μ₁(x))/ê − (1−t)(y−μ₀(x))/(1−ê),
    * ATE = mean ψ. Propensity = [[logisticIrls2]] (clipped); outcome
    * models = [[ols2]] fit separately on each arm (their round(6)
    * coefficients are engine-identical by construction). ψ is
    * milli-quantized per row and summed exactly; the finish is shared
    * text ([[aipwAteSql]]). The naive difference rides along like
    * [[ipwAte]]'s.
    *
    * Scale shape: the IRLS passes + two one-aggregate OLS fits + ONE
    * scoring aggregate; all three coefficient rows are 1-row
    * broadcasts. */
  def aipwAte(
      df: DataFrame, tCol: String, yCol: String,
      x1Col: String, x2Col: String,
      iters: Int = 4, clip: Double = 0.01): DataFrame = {
    require(clip > 0.0 && clip < 0.5, s"clip must be in (0, 0.5): $clip")
    val s = df.select(col(tCol).cast("long").as("t"),
        col(yCol).cast("long").as("yo"),
        col(x1Col).cast("long").as("x1"), col(x2Col).cast("long").as("x2"))
      .materialize
    val fit = logisticIrls2(
      s.select(col("t").as("y"), col("x1"), col("x2")), "y", "x1", "x2",
      iters)
    val prop = broadcast(fit.orderBy(col("iter").desc).limit(1)
      .select(col("b0"), col("b1"), col("b2")))
    def arm(cond: org.apache.spark.sql.Column, px: String) =
      broadcast(ols2(s.filter(cond), "yo", "x1", "x2")
        .select(col("b0").as(s"${px}0"), col("b1").as(s"${px}1"),
          col("b2").as(s"${px}2")))
    val mu1 = arm(col("t") === 1L, "m1_")
    val mu0 = arm(col("t") === 0L, "m0_")
    def milli(e: String) = expr(s"CAST(ROUND(($e) * 1000, 0) AS BIGINT)")
    s.crossJoin(prop).crossJoin(mu1).crossJoin(mu0)
      .withColumn("eh", expr(ipwEhSql(clip)))
      .withColumn("m1", expr("m1_0 + m1_1 * x1 + m1_2 * x2"))
      .withColumn("m0", expr("m0_0 + m0_1 * x1 + m0_2 * x2"))
      .agg(
        sum(col("t")).cast("long").as("n_treated"),
        sum(lit(1L) - col("t")).cast("long").as("n_control"),
        count(lit(1)).cast("long").as("nn"),
        sum(milli("m1 - m0 + t * (yo - m1) / eh - " +
          "(1 - t) * (yo - m0) / (1.0 - eh)")).as("sa"),
        sum(col("t") * col("yo")).cast("long").as("sty"),
        sum((lit(1L) - col("t")) * col("yo")).cast("long").as("scy"))
      .select(col("n_treated"), col("n_control"),
        expr(aipwAteSql).as("ate_aipw"),
        expr(naiveDiffSql).as("diff_naive"))
  }

  /** AIPW mean over the milli sum (de-milli'd once); shared. */
  val aipwAteSql: String =
    "round(CAST(sa AS DOUBLE) / 1000 / nn, 6)"

  /** Coarsened-exact-matching ATT — the MATCHING estimator completing
    * the causal set ([[ipwAte]] reweights, [[aipwAte]] models, CEM
    * prunes): exact-match strata on the (already-discrete) covariate
    * pair, keep only strata holding BOTH arms, and average the
    * within-stratum mean differences weighted by each stratum's
    * TREATED count (Iacus–King–Porro with the identity coarsening —
    * callers bucket continuous covariates first). Also reports how
    * many treated rows fell in unmatched strata (the overlap
    * diagnostic matching is chosen for).
    *
    * Determinism: everything is exact integer sums until one shared
    * double finish per stratum, milli-quantized and re-summed exactly
    * ([[cemCellSql]]) — no model, no iteration. Scale shape: ONE
    * (x1, x2) stratum aggregate + one global fold; strata never leave
    * their partition. */
  def cemAtt(
      df: DataFrame, tCol: String, yCol: String,
      x1Col: String, x2Col: String): DataFrame = {
    val s = df.select(col(tCol).cast("long").as("t"),
      col(yCol).cast("long").as("yo"),
      col(x1Col).cast("long").as("x1"), col(x2Col).cast("long").as("x2"))
    val cells = s.groupBy(col("x1"), col("x2"))
      .agg(sum(col("t")).cast("long").as("nt"),
        sum(lit(1L) - col("t")).cast("long").as("nc"),
        sum(col("t") * col("yo")).cast("long").as("syt"),
        sum((lit(1L) - col("t")) * col("yo")).cast("long").as("syc"))
    cells.agg(
        count(when(col("nt") > 0 && col("nc") > 0, 1)).cast("long")
          .as("n_strata_matched"),
        sum(when(col("nt") > 0 && col("nc") > 0, col("nt"))
          .otherwise(0L)).cast("long").as("n_treated_matched"),
        sum(when(col("nt") > 0 && col("nc") === 0L, col("nt"))
          .otherwise(0L)).cast("long").as("n_treated_unmatched"),
        sum(expr(cemCellSql)).as("sw"))
      .select(col("n_strata_matched"), col("n_treated_matched"),
        col("n_treated_unmatched"),
        // NULL by contract when no stratum holds both arms (the
        // oracle carries the same CASE): 0/0 would be NaN in Spark
        // and engine-dependent in DuckDB
        expr("CASE WHEN n_treated_matched > 0 THEN " +
            "round(CAST(sw AS DOUBLE) / 1000 / n_treated_matched, 6) " +
            "ELSE NULL END")
          .as("att_cem"))
  }

  /** Per-stratum treated-weighted mean difference, milli-quantized
    * (zero when the stratum lacks either arm); shared with the
    * oracle. */
  val cemCellSql: String =
    "CASE WHEN nt > 0 AND nc > 0 THEN " +
      "CAST(ROUND(nt * (CAST(syt AS DOUBLE) / nt - " +
      "CAST(syc AS DOUBLE) / nc) * 1000, 0) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END"

  /** L2-boosted regression stumps (gradient boosting with depth-1
    * trees, learning rate ½, squared loss): per round, scan every
    * `features` threshold for the split maximizing S_L²/n_L + S_R²/n_R
    * over the current residuals (the SSE-reduction argmax — the
    * constant parent term drops out), shrink the leaf means by ½, and
    * subtract them from the residuals. The model is one row per round:
    * (round, feature, split_value, leaf_l, leaf_r) in MILLI label
    * units.
    *
    * Determinism: residuals live as exact milli-longs — each leaf is
    * ONE shared-text rounding of an exact-integer ratio
    * ([[boostLeafLSql]]), so the residual update is integer-exact and
    * every round's candidate scan starts from identical state on both
    * engines; the gain ordering is the shared double text
    * ([[boostGainSql]]) over exact sums with a (feature, value)
    * tie-break. The argmax row stays a 1-row broadcast — no driver
    * math.
    *
    * Scale shape per round: one distinct-value aggregate + ranged
    * prefix sum PER FEATURE (threshold scans never sort row-level
    * data), one global 1-row argmax, one narrow residual map —
    * O(rounds · features) passes, each aggregate map-side combined. */
  def boostedStumps(
      df: DataFrame, yCol: String, features: Seq[String],
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 6,
      s"rounds must be in [1, 6] (each is one scan + an unrolled " +
        s"oracle round): $rounds")
    require(features.nonEmpty && features.size <= 4,
      s"features must name 1..4 columns: $features")
    val featCols = features.map(f => col(f).cast("long").as(f))
    var cur = df
      .select(featCols :+ (col(yCol).cast("long") * 1000L).as("res"): _*)
      .materialize
    var model: DataFrame = null
    (1 to rounds).foreach { r =>
      val cands = features.map { f =>
        val per = cur.groupBy(col(f).as("v"))
          .agg(count(lit(1)).cast("long").as("nu"),
            sum(col("res")).cast("long").as("sres"))
        val c = rangedCumsum(per, Nil, "v", Seq("nu", "sres"))
        val tot = broadcast(c.agg(
          sum(col("nu")).cast("long").as("n_tot"),
          sum(col("sres")).cast("long").as("s_tot")))
        c.crossJoin(tot)
          .filter(col("cum_nu") < col("n_tot"))
          .select(lit(f).as("feature"), col("v"),
            expr(boostGainSql).as("gain"),
            expr(boostLeafLSql).as("leaf_l"),
            expr(boostLeafRSql).as("leaf_r"))
      }.reduce(_ unionByName _)
      val best = cands
        .sort(col("gain").desc, col("feature"), col("v"))
        .limit(1).materialize
      val row = best.select(lit(r.toLong).as("round"), col("feature"),
        col("v").as("split_value"), col("leaf_l"), col("leaf_r"))
      model = if (model == null) row else model.unionByName(row)
      val update = features.reverse.foldLeft("CAST(NULL AS BIGINT)") {
        (els, f) =>
          s"CASE WHEN feature = '$f' THEN " +
            s"(CASE WHEN $f <= v THEN res - leaf_l " +
            s"ELSE res - leaf_r END) ELSE $els END"
      }
      cur = cur.crossJoin(broadcast(best))
        .select(features.map(col) :+ expr(update).as("res"): _*)
        .materialize
    }
    model
  }

  /** Simpson's-paradox audit — does the aggregate association REVERSE
    * inside the strata? Compares the sign of the overall treated-vs-
    * control mean difference against every both-arm stratum's sign,
    * using the EXACT cross-multiplied integer form
    * sign(Σy_t·n_c − Σy_c·n_t) — no division, no rounding, so the
    * verdict is arithmetic, not float luck. Reports the both-arm
    * stratum count, how many agree / oppose / tie the aggregate sign,
    * the aggregate difference itself, and the full-reversal flag (every
    * both-arm stratum opposes a nonzero aggregate) — the "trust the
    * stratified number" alarm that motivates [[cemAtt]]/[[aipwAte]].
    *
    * Scale shape: ONE stratum aggregate + one global fold, the
    * [[cemAtt]] plan. */
  def simpsonCheck(
      df: DataFrame, tCol: String, yCol: String,
      stratumCol: String): DataFrame = {
    val s = df.select(col(tCol).cast("long").as("t"),
      col(yCol).cast("long").as("yo"), col(stratumCol).as("g"))
    val cells = s.groupBy(col("g"))
      .agg(sum(col("t")).cast("long").as("nt"),
        sum(lit(1L) - col("t")).cast("long").as("nc"),
        sum(col("t") * col("yo")).cast("long").as("syt"),
        sum((lit(1L) - col("t")) * col("yo")).cast("long").as("syc"))
    cells.agg(
        sum(col("nt")).cast("long").as("snt"),
        sum(col("nc")).cast("long").as("snc"),
        sum(col("syt")).cast("long").as("ssyt"),
        sum(col("syc")).cast("long").as("ssyc"),
        sum(when(col("nt") > 0 && col("nc") > 0, 1L).otherwise(0L))
          .cast("long").as("n_both"),
        sum(when(col("nt") > 0 && col("nc") > 0,
          signum(col("syt") * col("nc") - col("syc") * col("nt"))
            .cast("long")).otherwise(0L)).cast("long").as("sign_sum"),
        sum(when(col("nt") > 0 && col("nc") > 0 &&
            (col("syt") * col("nc") - col("syc") * col("nt")) === 0L, 1L)
          .otherwise(0L)).cast("long").as("n_tied"))
      .withColumn("overall_sign",
        expr("CAST(sign(ssyt * snc - ssyc * snt) AS BIGINT)"))
      .withColumn("n_opposite", expr(simpsonOppositeSql))
      .select(
        expr("round(CAST(ssyt AS DOUBLE) / snt - " +
          "CAST(ssyc AS DOUBLE) / snc, 6)").as("diff_overall"),
        col("n_both").as("n_strata"),
        (col("n_both") - col("n_tied") - col("n_opposite"))
          .as("n_agreeing"),
        col("n_opposite"), col("n_tied"),
        (col("overall_sign") =!= 0L &&
          col("n_opposite") === col("n_both") && col("n_both") > 0L)
          .as("full_reversal"))
  }

  /** Opposing-stratum count over (n_both, n_tied, sign_sum,
    * overall_sign): with a = agreeing, o = opposing,
    * a + o = n_both − n_tied and a − o = overall_sign·sign_sum. Shared
    * with the oracle. */
  val simpsonOppositeSql: String =
    "CAST(CASE WHEN overall_sign = 0 THEN 0 ELSE " +
      "((n_both - n_tied) - overall_sign * sign_sum) / 2 END AS BIGINT)"

  /** Split objective S_L²/n_L + S_R²/n_R over the prefix row — the
    * SSE-reduction argmax with the constant parent term dropped.
    * Shared with the oracle. */
  val boostGainSql: String =
    "CAST(cum_sres AS DOUBLE) * cum_sres / cum_nu + " +
      "CAST(s_tot - cum_sres AS DOUBLE) * (s_tot - cum_sres) / " +
      "(n_tot - cum_nu)"

  /** Left-leaf value: the shrunk (×½) left mean, one rounding back to
    * exact milli units. Shared with the oracle. */
  val boostLeafLSql: String =
    "CAST(ROUND(CAST(0.5 AS DOUBLE) * cum_sres / cum_nu, 0) AS BIGINT)"

  /** Right-leaf value, same shape. Shared with the oracle. */
  val boostLeafRSql: String =
    "CAST(ROUND(CAST(0.5 AS DOUBLE) * (s_tot - cum_sres) / " +
      "(n_tot - cum_nu), 0) AS BIGINT)"

  def confusionStats(
      df: DataFrame, predCol: String, actualCol: String): DataFrame = {
    // cells materialize ONCE (class²-sized) — both per-class branches
    // would otherwise re-scan the predictions
    val cells = df.groupBy(col(predCol).as("p"), col(actualCol).as("a"))
      .agg(count(lit(1)).cast("long").as("n"))
      .materialize
    val byPred = cells.groupBy(col("p").as("clazz"))
      .agg(sum(col("n")).cast("long").as("n_pred"),
        sum(when(col("p") === col("a"), col("n")).otherwise(0L))
          .cast("long").as("tp_p"))
    val byActual = cells.groupBy(col("a").as("clazz"))
      .agg(sum(col("n")).cast("long").as("n_actual"),
        sum(when(col("p") === col("a"), col("n")).otherwise(0L))
          .cast("long").as("tp_a"))
    val j = byPred.join(byActual, Seq("clazz"), "full")
      .select(col("clazz"),
        coalesce(col("tp_p"), col("tp_a"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) -
          coalesce(col("tp_p"), lit(0L))).as("fp"),
        (coalesce(col("n_actual"), lit(0L)) -
          coalesce(col("tp_a"), lit(0L))).as("fn"))
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0)).otherwise(round(num.cast("double") / den, 6))
    j.select(col("clazz"), col("tp"), col("fp"), col("fn"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall"),
      ratio(lit(2L) * col("tp"),
        lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }

  /** Cohen's kappa agreement between two categorical labelings, exact
    * rational form: κ = (N·Σdiag − Σ row_c·col_c) / (N² − Σ row_c·col_c).
    * The confusion cells aggregate once; marginals are tiny
    * re-aggregations joined on class (never a second data scan). */
  def cohensKappa(
      df: DataFrame, predCol: String, actualCol: String): DataFrame = {
    // cells materialize ONCE — three derived branches share them
    val cells = df.groupBy(col(predCol).as("p"), col(actualCol).as("a"))
      .agg(count(lit(1)).cast("long").as("n"))
      .materialize
    val byP = cells.groupBy(col("p").as("c")).agg(sum(col("n")).as("np"))
    val byA = cells.groupBy(col("a").as("c")).agg(sum(col("n")).as("na"))
    val sumRc = byP.join(byA, Seq("c"), "inner")
      .agg(sum(col("np") * col("na")).cast("long").as("sum_rc"))
    val tot = cells.agg(
      sum(col("n")).cast("long").as("n_items"),
      sum(when(col("p") === col("a"), col("n")).otherwise(0L))
        .cast("long").as("n_agree"))
    broadcast(tot).crossJoin(broadcast(sumRc))
      .select(col("n_items"), col("n_agree"), col("sum_rc"),
        (col("n_items") * col("n_agree") - col("sum_rc")).as("num"),
        (col("n_items") * col("n_items") - col("sum_rc")).as("den"),
        round((col("n_items") * col("n_agree") - col("sum_rc")).cast("double")
          / (col("n_items") * col("n_items") - col("sum_rc")), 6).as("kappa"))
  }

  /** Probability-calibration bins of an integer-domain score against a
    * boolean label: `bins` equal-width buckets over the observed
    * [min, max] score span (integer bucket arithmetic — exact), each with
    * its count, positive count, mean score and empirical positive rate.
    * A well-calibrated scorer has frac_pos tracking mean_score. One
    * min/max broadcast + one hash aggregate. */
  def calibrationBins(
      df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be > 0: $bins")
    val s = col(scoreCol).cast("long")
    val mm = broadcast(df.agg(min(s).as("__lo"), max(s).as("__hi")))
    df.crossJoin(mm)
      .select(
        // span+1 so the max lands in the last bin, all-BIGINT arithmetic
        ((s - col("__lo")) * bins / (col("__hi") - col("__lo") + 1L))
          .cast("long").as("bin"),
        s.as("__s"),
        when(col(labelCol), 1L).otherwise(0L).as("__pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__pos")).cast("long").as("n_pos"),
        sum(col("__s")).cast("long").as("sum_score"))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_score"),
        round(col("sum_score").cast("double") / col("n"), 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("frac_pos"))
  }

  /** Isotonic (monotone) calibration over score bins — the PAV fit via
    * the minimax identity f(i) = max_{j≤i} min_{k≥i} mean(y over bins
    * j..k): the calibration curve [[calibrationBins]] reports raw, made
    * MONOTONE, which is what "higher score ⇒ higher quality" consumers
    * (threshold pickers, budget allocators) actually need.
    *
    * Scale shape: the data-sized pass is the one binned aggregate
    * (identical to [[calibrationBins]]); the fit runs on the B-row bin
    * table (B = `bins`, a parameter, ≤ ~100) — the window + B³ pair/
    * anchor joins are bounded by construction, never data-sized. Every
    * windowed mean is an exact-integer ratio evaluated once in double
    * (identical both engines), min/max over those are exact — no
    * quantization needed anywhere. */
  def isotonicCalibration(
      df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0 && bins <= 128, s"bins in [1,128]: $bins")
    val b = calibrationBins(df, scoreCol, labelCol, bins)
      .select(col("bin"), col("n"), col("n_pos"), col("frac_pos"))
      .materialize // B rows; read by cum + final join
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.select(col("bin"),
      sum(col("n")).over(w).cast("long").as("cn"),
      sum(col("n_pos")).over(w).cast("long").as("cp"))
    // interval means over [j..k] from the prefix sums: exact ratios.
    // j enumerates 0 (full prefix) plus every bin boundary + 1.
    val ks = cum.select(col("bin").as("k"), col("cn").as("cnk"),
      col("cp").as("cpk"))
    val pairs = ks
      .select(col("k"), lit(0L).as("j"), col("cnk").as("nn"),
        col("cpk").as("np"))
      .unionByName(ks
        .join(cum.select(col("bin").as("jm1"), col("cn").as("cnj"),
          col("cp").as("cpj")), col("jm1") < col("k"))
        .select(col("k"), (col("jm1") + 1L).as("j"),
          (col("cnk") - col("cnj")).as("nn"),
          (col("cpk") - col("cpj")).as("np")))
      .filter(col("nn") > 0L)
      .withColumn("mean_jk",
        col("np").cast("double") / col("nn").cast("double"))
    val anchors = b.select(col("bin").as("i"))
    val fit = anchors
      .join(pairs, col("j") <= col("i") && col("i") <= col("k"))
      .groupBy(col("i"), col("j"))
      .agg(min(col("mean_jk")).as("inner_min"))
      .groupBy(col("i"))
      .agg(round(max(col("inner_min")), 6).as("fitted"))
    b.join(fit, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("n_pos"), col("frac_pos"),
        col("fitted"))
  }

  /** Ranked-retrieval quality per query — NDCG@k, reciprocal rank, and
    * AP@k from ONE pass over a (query, rank, graded-relevance) table: the
    * RAG / search-eval triple. Every fractional term is micro-quantized
    * PER ELEMENT (round(·10⁶) as BIGINT) so all sums are exact integers —
    * order-independent across partitions and engines; the only doubles
    * are one final division each (shared SQL). The ideal ordering for
    * IDCG breaks relevance ties by the ACTUAL rank (deterministic, and
    * ties don't change DCG anyway). AP@k divides by min(n_rel, k) — the
    * standard truncated-AP convention. Per-query windows only (bounded
    * candidate lists), one grouped aggregate; queries scale out freely. */
  def retrievalMetrics(
      df: DataFrame, queryCol: String, rankCol: String, relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy(col(queryCol))
    val base = df.select(col(queryCol),
        col(rankCol).cast("long").as("r"), col(relCol).cast("long").as("rel"))
      .withColumn("ideal_r",
        row_number().over(byQ.orderBy(col("rel").desc, col("r"))).cast("long"))
      .withColumn("hits_at_r",
        sum(when(col("rel") > 0, 1L).otherwise(0L))
          .over(byQ.orderBy(col("r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    base.groupBy(col(queryCol))
      .agg(
        count(lit(1)).cast("long").as("n_cand"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).cast("long").as("n_rel"),
        sum(when(col("r") <= k,
            round(col("rel") * 1000000.0 / log2(col("r") + 1), 0).cast("long"))
          .otherwise(0L)).cast("long").as("dcg_micro"),
        sum(when(col("ideal_r") <= k,
            round(col("rel") * 1000000.0 / log2(col("ideal_r") + 1), 0)
              .cast("long"))
          .otherwise(0L)).cast("long").as("idcg_micro"),
        max(when(col("rel") > 0,
            round(lit(1000000.0) / col("r"), 0).cast("long")))
          .as("rr_micro"),
        sum(when(col("rel") > 0 && col("r") <= k,
            round(col("hits_at_r") * 1000000.0 / col("r"), 0).cast("long"))
          .otherwise(0L)).cast("long").as("ap_sum_micro"))
      .withColumn("ndcg", expr(ndcgSql))
      .withColumn("ap", expr(apSql(k)))
  }

  /** NDCG over the micro DCG pair, shared with the oracle. */
  val ndcgSql: String =
    "CASE WHEN idcg_micro > 0 THEN " +
      "round(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6) END"

  /** Truncated AP@k over the micro precision sum, shared with the oracle. */
  def apSql(k: Int): String =
    "CASE WHEN n_rel > 0 THEN round(CAST(ap_sum_micro AS DOUBLE) / " +
      s"1000000.0 / least(n_rel, $k), 6) END"

  /** One-way ANOVA F over integer-valued observations (cents): per-group
    * exact (n, Σv, Σv²) longs collapse to one g-row table, and each
    * s²/n term assembles OVERFLOW-FREE via quotient/remainder splitting:
    * with q = s div n, r = s mod n, s²/n = q·s + r·s/n — so the largest
    * product ever formed is r·s < n·Σv (never s², which overflows long
    * already at ~2M cents-scale rows; the 20× ScaleSmoke caught exactly
    * that in the first cut). Each term carries an exact integer WHOLE
    * part and a milli-truncated FRACTION part (0–999); both engines
    * truncate identically on the non-negative operands required here
    * (Spark `div` / DuckDB `//` — the one dialect token, passed in).
    * SSB/SSW then assemble in DOUBLE from SMALL exact differences
    * (whole parts cancel to SS-sized numbers first), and F is the
    * single shared-SQL double chain. Bound: N·Σv < ~9·10¹⁸ — pre-
    * aggregate or partition finer beyond that. */
  def anovaF(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col(valCol).cast("long")).cast("long").as("sg"),
        sum(col(valCol).cast("long") * col(valCol).cast("long"))
          .cast("long").as("ssg"))
    per.select(col("ng"), col("sg"), col("ssg"),
        expr(sqOverNWhole("sg", "ng", "div")).cast("long").as("tg_whole"),
        expr(sqOverNFracMilli("sg", "ng", "div")).cast("long").as("tg_frac"))
      .agg(count(lit(1)).cast("long").as("g"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("sg")).cast("long").as("s"),
        sum(col("ssg")).cast("long").as("ss"),
        sum(col("tg_whole")).cast("long").as("t_whole"),
        sum(col("tg_frac")).cast("long").as("t_frac"))
      .withColumn("ssb", expr(anovaSsbSql("div")))
      .withColumn("ssw", expr(anovaSswSql))
      .withColumn("f_stat", expr(anovaFSql("div")))
  }

  /** Exact integer floor of x²/n without ever forming x²: q·x + (r·x
    * div n) with q = x div n, r = x mod n — largest product r·x < n·x. */
  def sqOverNWhole(x: String, n: String, idiv: String): String =
    s"((($x) $idiv ($n)) * ($x) + ((($x) % ($n)) * ($x)) $idiv ($n))"

  /** Milli-truncated fractional part of x²/n (0–999), same splitting. */
  def sqOverNFracMilli(x: String, n: String, idiv: String): String =
    s"(((((($x) % ($n)) * ($x)) % ($n)) * 1000) $idiv ($n))"

  /** SSB = Σ s_g²/n_g − S²/N as a DOUBLE assembled from exact small
    * integer differences (whole parts cancel first), shared SQL. */
  def anovaSsbSql(idiv: String): String =
    s"(CAST(t_whole - ${sqOverNWhole("s", "n", idiv)} AS DOUBLE) + " +
      s"CAST(t_frac - ${sqOverNFracMilli("s", "n", idiv)} AS DOUBLE) / 1000)"

  /** SSW = Σv² − Σ s_g²/n_g as a DOUBLE, same assembly, shared SQL. */
  val anovaSswSql: String =
    "(CAST(ss - t_whole AS DOUBLE) - CAST(t_frac AS DOUBLE) / 1000)"

  /** F from the SS doubles; NULL when a df is empty or SSW is 0. */
  def anovaFSql(idiv: String): String =
    s"CASE WHEN g > 1 AND n > g AND $anovaSswSql > 0 THEN " +
      s"round((${anovaSsbSql(idiv)} / (g - 1)) / " +
      s"($anovaSswSql / (n - g)), 6) END"

  /** η² over the (ssb, ssw) columns: variance explained by the group
    * factor; NULL on a zero total SS. Shared with the oracle. */
  val anovaEtaSqSql: String =
    "CASE WHEN ssb + ssw > 0 THEN round(ssb / (ssb + ssw), 6) END"

  /** ω² — the less-biased effect size (subtracts the chance-level
    * expectation): (SSB − (g−1)·MSW)/(SST + MSW); NULL when df or the
    * denominator degenerates. Shared with the oracle. */
  val anovaOmegaSqSql: String = {
    val msw = "(ssw / (n - g))"
    s"CASE WHEN n > g AND ssb + ssw + $msw > 0 THEN " +
      s"round((ssb - (g - 1) * $msw) / (ssb + ssw + $msw), 6) END"
  }

  /** Brown–Forsythe homogeneity-of-variance test — the robust Levene
    * variant: [[anovaF]] run on |v − group MEDIAN| (medians via the
    * [[weightedMedian]] lower-median prefix-sum kernel, no per-group
    * sort). The gate BEFORE trusting [[anovaF]]'s equal-variance
    * assumption, robust to the heavy tails that break the mean-based
    * Levene. Deviations are exact longs, so the whole composition stays
    * on the integer-moment discipline: one distinct-value prefix sum +
    * one broadcast join + the g-row ANOVA assembly. */
  def brownForsythe(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val u = df.select(col(groupCol).as("__g"), col(valCol).cast("long").as("__v"))
    val med = weightedMedian(u.withColumn("__w", lit(1L)), "__g", "__v", "__w")
      .select(col("__g"), col("w_median").as("__med"))
    val dev = u.join(broadcast(med), Seq("__g"))
      .select(col("__g"), abs(col("__v") - col("__med")).as("__z"))
    anovaF(dev, "__g", "__z")
  }

  /** Bradley–Terry preference strengths from pairwise outcomes — the
    * arena/RLHF ranking model: P(i beats j) = θ_i/(θ_i+θ_j), fit by the
    * standard MM iteration θ'_i = W_i / Σ_j n_ij/(θ_i+θ_j), re-normalized
    * each round so Σθ = 10⁹ (θ reads as preference share in ppb).
    *
    * Determinism: every step is INTEGER arithmetic — per-pair terms
    * n_ij·10¹² div (θ_i+θ_j), win totals, and the normalization are all
    * BIGINT div/sums, so the fixed-iteration fit is bit-identical across
    * partitionings and engines, and the oracle replays it as unrolled
    * CTEs. θ floors at 1 ppb (keeps denominators alive for zero-win
    * items); bounds: ≤ ~9·10⁶ games per PAIR and ≤ ~1.8·10⁷ per item
    * (the 10¹² scaling in long) — far above any aggregated arena table.
    *
    * Scale shape: raw games collapse to the (a, b, n_games) pair table
    * FIRST (one aggregate over the event stream — the only data-sized
    * pass); iterations run joins on the items×items-bounded pair table
    * with the k-row θ, each round materialized once (kCore discipline).
    * Requires a connected comparison graph for a meaningful full
    * ranking, as BT always does; disconnected components still converge
    * within themselves. */
  def bradleyTerry(
      games: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 10): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50]: $iters")
    val dir = games.select(col(winnerCol).cast("string").as("w"),
      col(loserCol).cast("string").as("l"))
    val np = dir
      .select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_games"))
      .materialize
    val wins = dir.groupBy(col("w").as("item"))
      .agg(count(lit(1)).cast("long").as("n_wins"))
    val items = np.select(col("a").as("item"))
      .unionByName(np.select(col("b").as("item"))).distinct()
      .join(wins, Seq("item"), "left")
      .withColumn("n_wins", coalesce(col("n_wins"), lit(0L)))
      .materialize
    val kDf = broadcast(items.agg(count(lit(1)).cast("long").as("__k")))
    var theta = items.crossJoin(kDf)
      .select(col("item"), expr("1000000000 div __k").cast("long").as("theta"))
      .materialize
    for (_ <- 1 to iters) {
      val terms = np
        .join(theta.select(col("item").as("a"), col("theta").as("ta")), Seq("a"))
        .join(theta.select(col("item").as("b"), col("theta").as("tb")), Seq("b"))
        .withColumn("term",
          expr("n_games * 1000000000000 div (ta + tb)").cast("long"))
      val d = terms.select(col("a").as("item"), col("term"))
        .unionByName(terms.select(col("b").as("item"), col("term")))
        .groupBy(col("item")).agg(sum(col("term")).cast("long").as("d"))
      val raw = items.join(d, Seq("item"))
        .select(col("item"),
          expr("CASE WHEN d > 0 THEN n_wins * 1000000000000 div d " +
            "ELSE 0 END").cast("long").as("raw"))
      val tot = broadcast(raw.agg(sum(col("raw")).cast("long").as("__t")))
      theta = raw.crossJoin(tot)
        .select(col("item"),
          expr("CASE WHEN __t > 0 THEN greatest(raw * 1000000000 div __t, 1) " +
            "ELSE 1 END").cast("long").as("theta"))
        .materialize
    }
    items.join(theta, Seq("item"))
      .select(col("item"), col("n_wins"), col("theta").as("bt_share_ppb"))
  }

  /** Stationary distribution of the empirical Markov chain over a
    * transition-pair table — "where does user behavior settle": counts
    * n_ij collapse to micro-quantized row-stochastic probabilities
    * p_ij = n_ij·10⁶ div n_i, and a fixed-iteration power method runs
    * x' = x·P in ppb units with an integer renormalization each round —
    * the [[bradleyTerry]] discipline, so the fit is bit-identical across
    * partitionings/engines and the oracle replays it as unrolled CTEs.
    *
    * States with no outgoing transition (absorbing tails) keep their
    * mass in place (implicit self-loop — the conventional fix that keeps
    * P stochastic). Convergence: geometric in the spectral gap; `iters`
    * = 12 covers any mixing chain a behavioral dataset produces (pin
    * higher for near-periodic chains). Scale shape: the data-sized pass
    * is ONE lag window per entity + one pair aggregate; iterations run
    * on the k²-bounded transition table. */
  def markovStationary(
      transitions: DataFrame, fromCol: String, toCol: String,
      iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50]: $iters")
    val pairs = transitions.select(col(fromCol).cast("string").as("src"),
        col(toCol).cast("string").as("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("long").as("n"))
      .materialize
    val states = pairs.select(col("src").as("state"))
      .unionByName(pairs.select(col("dst").as("state"))).distinct()
      .materialize
    val outTot = pairs.groupBy(col("src"))
      .agg(sum(col("n")).cast("long").as("n_out"))
    val p = pairs.join(outTot, Seq("src"))
      .select(col("src"), col("dst"),
        expr("n * 1000000 div n_out").cast("long").as("p_micro"))
      .materialize
    val kDf = broadcast(states.agg(count(lit(1)).cast("long").as("__k")))
    var x = states.crossJoin(kDf)
      .select(col("state"), expr("1000000000 div __k").cast("long").as("x"))
      .materialize
    for (_ <- 1 to iters) {
      val flow = p
        .join(x.select(col("state").as("src"), col("x").as("xs")), Seq("src"))
        .groupBy(col("dst").as("state"))
        .agg(sum(expr("xs * p_micro div 1000000")).cast("long").as("inflow"))
      // absorbing states (no outgoing row in p) keep their own mass;
      // every other state's carried mass is exactly its inflow
      val stepped = x
        .join(p.select(col("src").as("state")).distinct()
          .withColumn("__has_out", lit(true)), Seq("state"), "left")
        .join(flow, Seq("state"), "left")
        .select(col("state"),
          (when(col("__has_out").isNull, col("x")).otherwise(0L) +
            coalesce(col("inflow"), lit(0L))).as("raw"))
      val tot = broadcast(stepped.agg(sum(col("raw")).cast("long").as("__t")))
      x = stepped.crossJoin(tot)
        .select(col("state"),
          expr("CASE WHEN __t > 0 THEN raw * 1000000000 div __t " +
            "ELSE 0 END").cast("long").as("x"))
        .materialize
    }
    states.join(x, Seq("state"))
      .select(col("state"), col("x").as("stationary_ppb"))
  }

  /** Breusch–Pagan heteroskedasticity test on the simple OLS y ~ x —
    * "does the VARIANCE of the residuals grow with x?" The diagnostic
    * that tells you whether the fit's standard errors (and anything
    * downstream that trusts them) are lies: regress the SQUARED
    * residuals back on x and take LM = n·R². LM ~ χ²(1) under
    * homoskedasticity.
    *
    * Two passes: (1) exact-BIGINT moments of (x, y) → one broadcast
    * row; (2) per-row residual from the shared closed-form slope/
    * intercept (identical double tree both engines), residual² ROUNDED
    * to an exact integer g per row (unit scale — g ≈ cents², so Σg·g
    * runs DECIMAL per the durbinWatson bound), then the g ~ x moment
    * row assembles LM in one double step. No window, no join beyond
    * the 1-row broadcast. */
  def breuschPagan(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val mm = broadcast(df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(x).cast("long").as("sx"), sum(y).cast("long").as("sy"),
      sum(x * x).cast("long").as("sxx"),
      sum(x * y).cast("long").as("sxy")))
    df.select(x.as("__x"), y.as("__y"))
      .crossJoin(mm)
      .withColumn("g", expr(bpResid2Sql))
      .groupBy(col("n"), col("sx"), col("sxx"))
      // Σg must ACCUMULATE in decimal, not merely cast after: g ≈ e² is
      // ~10¹³-cents²-scale, so a long sum wraps near 10⁶ rows (caught
      // by the 20× smoke)
      .agg(sum(col("g").cast("decimal(38,0)")).cast("decimal(38,0)")
        .as("sg"),
        sum(col("g").cast("decimal(38,0)") * col("__x"))
          .cast("decimal(38,0)").as("sgx"),
        sum(col("g").cast("decimal(38,0)") * col("g"))
          .cast("decimal(38,0)").as("sgg"))
      .withColumn("lm", expr(bpLmSql))
      .withColumn("significant", expr(s"$bpLmSql > 3.841459"))
      .select(col("n"), col("lm"), col("significant"))
  }

  /** Squared OLS residual per row, rounded to an exact BIGINT (unit
    * scale), over (__x, __y, n, sx, sy, sxx, sxy). The slope/intercept
    * derive from the exact moment integers in one double chain —
    * identical in both engines; nullif on the shared variance divisor
    * (the riskDiff hoisting note). Shared with the oracle. */
  val bpResid2Sql: String = {
    val b = "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
      "nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0))"
    val a = s"((CAST(sy AS DOUBLE) - $b * sx) / n)"
    val e = s"(CAST(__y AS DOUBLE) - $a - $b * __x)"
    s"CAST(ROUND($e * $e, 0) AS BIGINT)"
  }

  /** LM = n·R² of g ~ x over the second moment row; NULL when x or g
    * is constant. Shared with the oracle. */
  val bpLmSql: String = {
    val num = "(CAST(n AS DOUBLE) * CAST(sgx AS DOUBLE) - " +
      "CAST(sx AS DOUBLE) * CAST(sg AS DOUBLE))"
    val dx = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    val dg = "(CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) - " +
      "CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))"
    s"CASE WHEN $dx > 0 AND $dg > 0 THEN " +
      s"round(n * ($num * $num) / ($dx * $dg), 6) END"
  }

  /** Cook's distance top-K on the simple OLS y ~ x — WHICH rows bend
    * the fit: Dᵢ = eᵢ²·hᵢ / (p·s²·(1−hᵢ)²) with leverage
    * hᵢ = 1/n + (xᵢ−x̄)²/Sxx, p = 2, s² = SSR/(n−2). The row-level
    * companion to [[breuschPagan]]'s global alarm — the rows a fit
    * audit actually deletes and refits.
    *
    * One exact-moment broadcast row (Σy² in DECIMAL, internal only),
    * then a narrow map computes D per row and TakeOrdered keeps K —
    * the mahalanobis2d discipline: never a global row_number window;
    * the k survivors rank through a window that only sees K rows. */
  def cooksDistance(
      df: DataFrame, idCol: String, xCol: String, yCol: String,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val mm = broadcast(df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(x).cast("long").as("sx"), sum(y).cast("long").as("sy"),
      sum(x * x).cast("long").as("sxx"),
      sum(x * y).cast("long").as("sxy"),
      sum((y * y).cast("decimal(38,0)")).as("syy")))
    val top = df.select(col(idCol).as("id"), x.as("__x"), y.as("__y"))
      .crossJoin(mm)
      .withColumn("d", expr(cooksDSql))
      .filter(col("d").isNotNull)
      .orderBy(col("d").desc, col("id"))
      .limit(topK)
    top
      .withColumn("rn", row_number().over(
        Window.orderBy(col("d").desc, col("id"))))
      .select(col("rn").cast("long").as("rnk"), col("id"),
        col("__x").as("x"), col("__y").as("y"), col("d"))
  }

  /** Dᵢ over (__x, __y, n, sx, sy, sxx, sxy, syy); NULL when n ≤ 2,
    * x is constant, or the fit is exact (s² = 0). All divisors carry
    * nullif (shared across the CASE and the downstream sort). Shared
    * with the oracle. */
  val cooksDSql: String = {
    val b = "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
      "nullif(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx, 0))"
    val a = s"((CAST(sy AS DOUBLE) - $b * sx) / n)"
    val e = s"(CAST(__y AS DOUBLE) - $a - $b * __x)"
    val sxxC = "(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      "(CAST(sx AS DOUBLE) / n))"
    val syyC = "(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * " +
      "(CAST(sy AS DOUBLE) / n))"
    val sxyC = "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      "(CAST(sy AS DOUBLE) / n))"
    val ssr = s"($syyC - $sxyC * ($sxyC / nullif($sxxC, 0)))"
    val s2 = s"($ssr / nullif(n - 2, 0))"
    val h = s"(1.0 / n + (CAST(__x AS DOUBLE) - " +
      s"CAST(sx AS DOUBLE) / n) * (CAST(__x AS DOUBLE) - " +
      s"CAST(sx AS DOUBLE) / n) / nullif($sxxC, 0))"
    s"CASE WHEN n > 2 AND $sxxC > 0 AND $s2 > 0 THEN " +
      s"round($e * $e * $h / (2 * $s2 * nullif((1 - $h) * (1 - $h), 0))" +
      ", 6) END"
  }

  /** DeLong confidence interval for the exact ROC AUC — [[auc]] plus
    * the standard error the DeLong covariance structure gives without
    * bootstrapping: per-positive placement values V = 2·negBelow +
    * negTied (exact integers 0..2n⁻) and the symmetric per-negative W;
    * var(AUC) = S₁₀/n⁺ + S₀₁/n⁻ from their sample variances. The
    * "is 0.71 actually better than 0.69?" answer every model-eval
    * dashboard needs next to the point estimate.
    *
    * Exactness: placements come off the SAME distinct-score prefix-sum
    * frame as [[auc]] (one ranged cumsum, nothing row-sized sorts);
    * ΣV and ΣV² accumulate exactly (squares in decimal, internal
    * only); one double chain assembles se and the ±1.96·se interval
    * from the ROUNDED auc/se columns. */
  def aucDeLongCi(
      df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val per = df.groupBy(col(scoreCol).cast("long").as("v"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("cp"),
        sum(when(col(labelCol), 0L).otherwise(1L)).cast("long").as("cn"))
    val c = rangedCumsum(per, Nil, "v", Seq("cn", "cp"))
    val tot = broadcast(c.agg(
      sum(col("cp")).cast("long").as("n_pos"),
      sum(col("cn")).cast("long").as("n_neg")))
    c.crossJoin(tot)
      .withColumn("vpos",
        lit(2L) * (col("cum_cn") - col("cn")) + col("cn"))
      .withColumn("wneg",
        lit(2L) * (col("n_pos") - col("cum_cp")) + col("cp"))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(sum(col("cp") * col("vpos")).cast("long").as("sv"),
        sum(col("cp").cast("decimal(38,0)") * col("vpos") * col("vpos"))
          .cast("decimal(38,0)").as("svv"),
        sum(col("cn") * col("wneg")).cast("long").as("sw"),
        sum(col("cn").cast("decimal(38,0)") * col("wneg") * col("wneg"))
          .cast("decimal(38,0)").as("sww"))
      .withColumn("auc", expr(aucPointSql))
      .withColumn("se", expr(aucSeSql))
      .withColumn("ci_lo", expr("round(auc - 1.959964 * se, 6)"))
      .withColumn("ci_hi", expr("round(auc + 1.959964 * se, 6)"))
      .select(col("n_pos"), col("n_neg"), col("sv"), col("sw"),
        col("auc"), col("se"), col("ci_lo"), col("ci_hi"))
  }

  /** AUC point estimate over (sv, n_pos, n_neg); NULL when either
    * class is empty (a single-class input has no ROC — an ungated
    * division would yield engine-dependent NULL/Inf). Shared with the
    * oracle. */
  val aucPointSql: String =
    "CASE WHEN n_pos > 0 AND n_neg > 0 THEN " +
      "round(CAST(sv AS DOUBLE) / (2.0 * CAST(n_neg AS DOUBLE) * n_pos)" +
      ", 6) END"

  /** DeLong se over (n_pos, n_neg, sv, svv, sw, sww); NULL when either
    * class has < 2 members. Shared with the oracle. */
  val aucSeSql: String = {
    val s10 = "((CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * " +
      "(CAST(sv AS DOUBLE) / n_pos)) / (n_pos - 1) / " +
      "(4.0 * CAST(n_neg AS DOUBLE) * n_neg))"
    val s01 = "((CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * " +
      "(CAST(sw AS DOUBLE) / n_neg)) / (n_neg - 1) / " +
      "(4.0 * CAST(n_pos AS DOUBLE) * n_pos))"
    "CASE WHEN n_pos > 1 AND n_neg > 1 THEN " +
      s"round(sqrt($s10 / n_pos + $s01 / n_neg), 6) END"
  }

  /** A/B experiment power analysis per key — the design-side companion
    * to the ab-test family: from each metric's observed variance,
    * (a) the per-arm sample size needed to detect a given absolute
    * lift δ at α = 0.05 two-sided / 80% power (n = 2(z_{α/2}+z_β)²σ²/δ²),
    * and (b) the minimum detectable effect at the CURRENT per-arm n
    * (δ_min = (z_{α/2}+z_β)·√(2σ²/n)). The z-sum constant 2.801585 =
    * 1.959964 + 0.841621 is spliced verbatim into both engines. Exact
    * moment sums (squares in decimal, internal only); one double
    * chain. One map-side-combined aggregate. */
  def powerAnalysis(
      df: DataFrame, keyCol: String, valCol: String,
      delta: Long): DataFrame = {
    require(delta > 0, s"delta must be positive: $delta")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(valCol).cast("long")).cast("long").as("sx"),
        sum(col(valCol).cast("long").cast("decimal(38,0)") *
          col(valCol).cast("long")).cast("decimal(38,0)").as("sxx"))
      .withColumn("variance", expr(powerVarSql))
      .withColumn("n_required", expr(powerNReqSql(delta)))
      .withColumn("mde", expr(powerMdeSql))
      .select(col(keyCol), col("n"), col("variance"),
        col("n_required"), col("mde"))
  }

  private val powerVarRawSql =
    "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      "(CAST(sx AS DOUBLE) / n)) / (n - 1))"

  /** Sample variance over the moment row; NULL below 2 rows. Shared
    * with the oracle. */
  val powerVarSql: String =
    s"CASE WHEN n > 1 THEN round($powerVarRawSql, 6) END"

  /** Per-arm n to detect δ at α=0.05 / 80% power. Shared with the
    * oracle. */
  def powerNReqSql(delta: Long): String =
    "CASE WHEN n > 1 THEN CAST(ceil(2 * 2.801585 * 2.801585 * " +
      s"$powerVarRawSql / ($delta.0 * $delta)) AS BIGINT) END"

  /** Minimum detectable effect at the current per-arm n. Shared with
    * the oracle. */
  val powerMdeSql: String =
    "CASE WHEN n > 1 THEN " +
      s"round(2.801585 * sqrt(2 * $powerVarRawSql / n), 6) END"

  /** [[powerAnalysis]] for BINARY metrics (conversion, retention,
    * click-through): per-arm n to detect an absolute lift of
    * deltaPpm/10⁶ in a proportion at α = 0.05 / 80% power,
    * n = 2(z_{α/2}+z_β)²·p(1−p)/δ², plus the MDE at the current n.
    * p comes exact from integer counts; δ² splices as the exact
    * rational (deltaPpm²/10¹²). One aggregate. */
  def powerProportion(
      df: DataFrame, keyCol: String, successCol: String,
      deltaPpm: Long): DataFrame = {
    require(deltaPpm > 0, s"deltaPpm must be positive: $deltaPpm")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(successCol), 1L).otherwise(0L)).cast("long").as("x"))
      .withColumn("p", expr("round(CAST(x AS DOUBLE) / n, 6)"))
      .withColumn("n_required", expr(powerPropNReqSql(deltaPpm)))
      .withColumn("mde", expr(powerPropMdeSql))
  }

  private val powerPropPqSql =
    "((CAST(x AS DOUBLE) / n) * (1 - CAST(x AS DOUBLE) / n))"

  /** Per-arm n for a proportion lift of deltaPpm/10⁶; NULL on a
    * degenerate (all-or-nothing) base rate. Shared with the oracle. */
  def powerPropNReqSql(deltaPpm: Long): String =
    s"CASE WHEN x > 0 AND x < n THEN " +
      s"CAST(ceil(2 * 2.801585 * 2.801585 * $powerPropPqSql / " +
      s"(($deltaPpm.0 * $deltaPpm) / 1e12)) AS BIGINT) END"

  /** MDE (absolute proportion lift) at the current per-arm n. Shared
    * with the oracle. */
  val powerPropMdeSql: String =
    "CASE WHEN x > 0 AND x < n THEN " +
      s"round(2.801585 * sqrt(2 * $powerPropPqSql / n), 6) END"

  /** Qini uplift curve at decile granularity + the Qini coefficient —
    * the standard uplift-model evaluation: rank units by score
    * descending, and at each depth compare cumulative treated
    * conversions against the control conversions scaled to the treated
    * exposure, q(t) = convT(t) − convC(t)·nT(t)/nC(t). The coefficient
    * is the area between the decile-interpolated curve and the random
    * diagonal to q(1). Cumulative counts ride the ranged prefix-sum
    * kernel over the (score desc, id) total order; each decile
    * boundary's q micro-quantizes through one IEEE chain, and the
    * trapezoid/coefficient algebra runs over the TEN boundary rows
    * (driver-scale — the one unpartitioned window is 10 rows by
    * construction). Deciles with no control units yield NULL q by
    * contract.
    *
    * `scoreCol` must be an INTEGRAL column (the micro-quantized-long
    * score contract shared by the ranked operators): a fractional
    * uplift score in (0, 1) would silently truncate to 0 under the
    * ranking cast and degenerate the order to the id tie-break, so a
    * non-integral type fails fast here — micro-quantize upstream
    * (e.g. `round(score * 1e6).cast("long")`) before calling. */
  def qiniDeciles(
      units: DataFrame, scoreCol: String, treatedCol: String,
      convCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val scoreType = units.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(scoreType),
      s"qiniDeciles ranks by an integral score (micro-quantize fractional " +
        s"model outputs upstream, e.g. round(score*1e6)::long); " +
        s"'$scoreCol' is $scoreType")
    val per = units.select(col(idCol).cast("long").as("uid"),
        (-col(scoreCol).cast("long")).as("__neg"),
        when(col(treatedCol), 1L).otherwise(0L).as("__t"),
        when(col(treatedCol) && col(convCol), 1L).otherwise(0L).as("__ct"),
        when(!col(treatedCol), 1L).otherwise(0L).as("__c"),
        when(!col(treatedCol) && col(convCol), 1L).otherwise(0L)
          .as("__cc"))
      .withColumn("__one", lit(1L))
    val c = graft.Materialize(rangedCumsumOrdered(per, Nil, Seq("__neg", "uid"),
      Seq("__one", "__t", "__ct", "__c", "__cc")))
    val tot = broadcast(c.agg(max(col("cum___one")).cast("long").as("n")))
    val dec = c.crossJoin(tot)
      .withColumn("decile",
        expr("(cum___one * 10 + n - 1) div n").cast("long"))
      .groupBy(col("decile"))
      .agg(max(col("cum___one")).cast("long").as("depth"),
        max(col("cum___t")).cast("long").as("n_t"),
        max(col("cum___ct")).cast("long").as("conv_t"),
        max(col("cum___c")).cast("long").as("n_c"),
        max(col("cum___cc")).cast("long").as("conv_c"))
      .withColumn("q_micro", expr(qiniQMicroSql))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("decile")) // 10 rows by construction
    dec
      .withColumn("q", expr(
        "CASE WHEN q_micro IS NOT NULL THEN " +
          "round(q_micro / 1e6, 6) END"))
      .withColumn("__prev", lag(col("q_micro"), 1, 0L).over(w))
      // exact long pair-sums; the single /2 happens in the final IEEE
      // chain. A NULL q (no controls yet) nulls its trapezoid and SQL
      // SUM skips it in both engines — the documented contract.
      .withColumn("__trap", (col("q_micro") + col("__prev")).cast("long"))
      .withColumn("qini_coef", expr(qiniCoefSql(10)))
      .drop("__prev", "__trap", "q_micro")
  }

  /** Micro-quantized q at a depth over cumulative (conv_t, conv_c,
    * n_t, n_c); NULL when no control units are in frame yet. Shared
    * with the oracle. */
  val qiniQMicroSql: String =
    "CASE WHEN n_c > 0 THEN CAST(round(1000000 * " +
      "(CAST(conv_t AS DOUBLE) - CAST(conv_c AS DOUBLE) * n_t / n_c)" +
      ", 0) AS BIGINT) END"

  /** Qini coefficient over the decile frame: mean trapezoid minus the
    * random-line area q_final/2, in q units. The windows span the ten
    * decile rows only. Shared with the oracle. */
  def qiniCoefSql(nBuckets: Int): String =
    s"round((CAST(SUM(__trap) OVER () AS DOUBLE) / 2 / $nBuckets - " +
      "CAST(LAST_VALUE(q_micro) OVER (ORDER BY decile ROWS BETWEEN " +
      "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) / 2) " +
      "/ 1e6, 6)"

  /** χ² feature scoring — the classical filter-method feature selector
    * over a presence table (e.g. [[TextAnalysis.featureHash]] output
    * joined to labels): per feature, the 2×2 independence χ² of
    * feature-presence vs a boolean label, from EXACT integer cell
    * counts (a = present∧label, b = present∧¬label; c/d from the
    * broadcast label totals). The statistic finishes as one IEEE
    * double chain — N(ad−bc)²/margins — deterministic cross-engine;
    * degenerate margins (a feature in every doc, or a single-class
    * corpus) yield NULL by contract. Rank by χ², keep the top
    * features, drop the rest before training. One hash aggregate +
    * a broadcast 1-row total. */
  def chi2FeatureScores(
      items: DataFrame, idCol: String, dimCol: String,
      labelCol: String): DataFrame = {
    val labels = items.select(col(idCol), col(labelCol)).distinct()
    val tot = broadcast(labels.agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(when(col(labelCol), 1L).otherwise(0L)).cast("long")
        .as("n_pos")))
    items.groupBy(col(dimCol))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).cast("long").as("a"),
        sum(when(col(labelCol), 0L).otherwise(1L)).cast("long").as("b"))
      .crossJoin(tot)
      .withColumn("c", (col("n_pos") - col("a")).cast("long"))
      .withColumn("d",
        (col("n_docs") - col("n_pos") - col("b")).cast("long"))
      .withColumn("chi2", expr(chi2x2Sql))
      .withColumn("significant",
        expr(s"coalesce($chi2x2Sql > 3.841459, false)"))
      .select(col(dimCol), col("a"), col("b"), col("c"), col("d"),
        col("chi2"), col("significant"))
  }

  /** 2×2 independence χ² over (a, b, c, d); NULL on any zero margin.
    * Shared with the oracle. */
  val chi2x2Sql: String = {
    val n = "(CAST(a AS DOUBLE) + b + c + d)"
    val det = "(CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c)"
    "CASE WHEN a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0 " +
      s"THEN round($n * $det * $det / ((CAST(a AS DOUBLE) + b) * " +
      "(CAST(c AS DOUBLE) + d) * (CAST(a AS DOUBLE) + c) * " +
      "(CAST(b AS DOUBLE) + d)), 6) END"
  }

  /** Herfindahl–Hirschman concentration index per market — the
    * antitrust-standard scalar [[gini]]'s rank curve summarizes
    * differently: HHI = Σ share², 1/n_firms (perfect split) → 1
    * (monopoly); reported with the dominant share. The supplier/
    * source-concentration check for any mix dashboard (DOJ thresholds
    * 0.15/0.25 quoted in points×10⁴).
    *
    * Exact: firm totals are integer sums; each share² is NANO-
    * quantized before the cross-firm sum. Two same-key aggregates on
    * one exchange (firm rollup, then market rollup). */
  def hhi(
      df: DataFrame, marketCol: String, firmCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firm = df.groupBy(col(marketCol), col(firmCol))
      .agg(sum(col(valCol).cast("long")).cast("long").as("c"))
      .withColumn("t", sum(col("c")).over(
        Window.partitionBy(col(marketCol))).cast("long"))
      .withColumn("term", expr(hhiTermNanoSql))
    firm.groupBy(col(marketCol))
      .agg(count(lit(1)).cast("long").as("n_firms"),
        max(col("t")).as("total"),
        sum(col("term")).cast("long").as("s_nano"),
        max(col("c")).cast("long").as("top_c"))
      .withColumn("hhi", expr(hhiSql))
      .withColumn("top_share", expr(
        "CASE WHEN total > 0 THEN " +
          "round(CAST(top_c AS DOUBLE) / total, 6) END"))
  }

  /** Nano-quantized share² over (c, t); NULL on an empty market
    * (zero total). Shared with the oracle. */
  val hhiTermNanoSql: String =
    "CASE WHEN t > 0 THEN " +
      "CAST(round(1000000000 * (CAST(c AS DOUBLE) / t) * " +
      "(CAST(c AS DOUBLE) / t), 0) AS BIGINT) END"

  /** HHI over (s_nano). Shared with the oracle. */
  val hhiSql: String =
    "CASE WHEN s_nano IS NOT NULL THEN " +
      "round(CAST(s_nano AS DOUBLE) / 1e9, 6) END"
}
