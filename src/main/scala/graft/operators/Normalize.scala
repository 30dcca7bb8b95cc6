package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Per-group feature normalization for training pipelines: winsorization
  * (outlier clipping at exact per-group quantiles) and z-score scaling from
  * exact integer moments. Quality scores, token counts, and engagement
  * metrics all need a normalization step before they can gate or weight
  * documents; both ops here are deterministic and engine-portable so the
  * DuckDB oracle replays them bit-for-bit.
  *
  * Scale shape (both ops): ONE per-group aggregate producing a tiny
  * (n_groups)-row stats table, broadcast back onto the unshuffled input —
  * the full table is never sorted or re-partitioned, so the normalization
  * is a narrow map over the original scan plus a broadcast hash join. At
  * 100 TB the stats table is still n_groups rows.
  */
object Normalize {

  /** Winsorize: clip `valCol` to the exact interpolated [`lo`, `hi`]
    * quantiles of its group. Exact `percentile` matches DuckDB's
    * `quantile_cont` (same linear interpolation — parity pinned by
    * q_percentile); it buffers each group's values on the agg side, so at
    * extreme group cardinality swap in `approx_percentile` and accept the
    * sketch error — the clip semantics and plan shape stay identical.
    * Output keeps the raw value and adds `v_wins` (double, round 6). */
  def winsorize(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      lo: Double = 0.1,
      hi: Double = 0.9): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1: $lo, $hi")
    val cuts = df
      .groupBy(col(keyCol))
      .agg(expr(s"percentile($valCol, array(${lo}D, ${hi}D))").as("c"))
      .select(col(keyCol),
        element_at(col("c"), 1).as("__lo"), element_at(col("c"), 2).as("__hi"))
    df.join(broadcast(cuts), keyCol)
      .withColumn("v_wins",
        round(least(greatest(col(valCol).cast("double"), col("__lo")), col("__hi")), 6))
      .drop("__lo", "__hi")
  }

  /** Welch's two-sample t statistic per group from EXACT integer moments —
    * the A/B experiment readout: split rows into two arms with any boolean
    * column (deterministic hash/modulo split upstream), aggregate
    * (n, Σx, Σx²) per arm in ONE conditional-sum pass, and assemble
    * mean/sample-variance/t in a single double step. Sample variance is
    * computed as (n·Σx² − (Σx)²) / (n·(n−1)) — integer numerator and
    * denominator stay EXACT BIGINTs, so both engines divide the identical
    * integers (the trendOls pattern). Arms with <2 rows or zero variance
    * in both arms yield null t. No p-value on purpose: erf/t-CDF libm
    * rounding differs across engines; the statistic is the portable part.
    *
    * Plan: one map-side-combined aggregate over the scan — no join, no
    * window; output is n_groups rows. */
  def welchTTest(
      df: DataFrame, keyCol: String, armCol: String, valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    def armAgg(arm: Boolean, f: org.apache.spark.sql.Column) =
      sum(when(col(armCol) === arm, f).otherwise(0L))
    val m = df.groupBy(col(keyCol)).agg(
      armAgg(true, lit(1L)).cast("long").as("n_a"),
      armAgg(true, x).cast("long").as("s_a"),
      armAgg(true, x * x).cast("long").as("sq_a"),
      armAgg(false, lit(1L)).cast("long").as("n_b"),
      armAgg(false, x).cast("long").as("s_b"),
      armAgg(false, x * x).cast("long").as("sq_b"))
    def mean(s: String, n: String) = col(s).cast("double") / col(n)
    // variance assembled as (Σx² − Σx·mean) / (n−1) in DOUBLE: the moments
    // stay exact BIGINTs, but the n·Σx² integer product of the textbook
    // form overflows long at ~10M rows/group (caught by the 100× smoke) —
    // and DuckDB would silently widen to HUGEINT, diverging from the
    // engine. The double expression tree is mirrored term-for-term in the
    // oracle, so parity holds at every scale.
    def variance(n: String, s: String, sq: String) =
      (col(sq).cast("double") -
        col(s).cast("double") * (col(s).cast("double") / col(n))) /
        (col(n) - 1L).cast("double")
    val se2 = variance("n_a", "s_a", "sq_a") / col("n_a") +
      variance("n_b", "s_b", "sq_b") / col("n_b")
    // NESTED whens, not one &&-condition: under ANSI mode the divisions in
    // se2 (by n·(n−1)) and in the means (by n) must not evaluate at all for
    // empty/singleton arms — CASE short-circuits branches, so the inner
    // guard only runs once both arms have ≥2 rows. An empty arm yields
    // null mean and null t rather than DIVIDE_BY_ZERO (fuzz-caught).
    m.select(col(keyCol), col("n_a"), col("n_b"),
      round(when(col("n_a") > 0L, mean("s_a", "n_a")), 6).as("mean_a"),
      round(when(col("n_b") > 0L, mean("s_b", "n_b")), 6).as("mean_b"),
      round(when(col("n_a") > 1L && col("n_b") > 1L,
        when(se2 > 0d, (mean("s_a", "n_a") - mean("s_b", "n_b")) / sqrt(se2))),
        6).as("t"))
  }

  /** Standardized effect sizes per key — the MAGNITUDE companion to
    * [[welchTTest]]'s yes/no: Cohen's d (pooled-SD units), Hedges' g
    * (d with the small-sample bias correction J = 1 − 3/(4N−9)), and
    * Glass's Δ (control-SD units, for when the treatment changes the
    * variance too). A t-statistic grows with √n even for a trivial
    * shift; these don't — they are what "is the effect big enough to
    * care?" actually asks. Same exact-BIGINT moment row + shared-SQL
    * double chain as welchTTest (one map-side-combined aggregate, no
    * join; `sq` stays exact to ~10⁹ cents²-scale rows per arm). */
  def effectSize(
      df: DataFrame, keyCol: String, armCol: String,
      valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    def armAgg(arm: Boolean, f: org.apache.spark.sql.Column) =
      sum(when(col(armCol) === arm, f).otherwise(0L))
    df.groupBy(col(keyCol)).agg(
        armAgg(true, lit(1L)).cast("long").as("n_a"),
        armAgg(true, x).cast("long").as("s_a"),
        armAgg(true, x * x).cast("long").as("sq_a"),
        armAgg(false, lit(1L)).cast("long").as("n_b"),
        armAgg(false, x).cast("long").as("s_b"),
        armAgg(false, x * x).cast("long").as("sq_b"))
      .withColumn("cohens_d", expr(cohensDSql))
      .withColumn("hedges_g", expr(hedgesGSql))
      .withColumn("glass_delta", expr(glassDeltaSql))
  }

  /** Sample variance of arm `p` from its exact moment columns, in the
    * overflow-safe double assembly [[welchTTest]] documents. */
  private def armVarSql(p: String): String =
    s"((CAST(sq_$p AS DOUBLE) - CAST(s_$p AS DOUBLE) * " +
      s"(CAST(s_$p AS DOUBLE) / n_$p)) / (n_$p - 1))"

  /** Pooled-SD Cohen's d over the two-arm moment row; NULL when either
    * arm has <2 rows or the pooled variance degenerates. Shared with
    * the oracle. */
  val cohensDSql: String = {
    val pooled = s"(((n_a - 1) * ${armVarSql("a")} + " +
      s"(n_b - 1) * ${armVarSql("b")}) / (n_a + n_b - 2))"
    "CASE WHEN n_a > 1 AND n_b > 1 AND " + pooled + " > 0 THEN " +
      "round((CAST(s_a AS DOUBLE)/n_a - CAST(s_b AS DOUBLE)/n_b) / " +
      s"sqrt($pooled), 6) END"
  }

  /** Hedges' g = J·d with J = 1 − 3/(4(n_a+n_b) − 9). */
  val hedgesGSql: String =
    s"round($cohensDSql * (1.0 - 3.0 / (4.0 * (n_a + n_b) - 9)), 6)"

  /** Glass's Δ — mean shift in CONTROL-arm SD units. */
  val glassDeltaSql: String =
    s"CASE WHEN n_b > 1 AND ${armVarSql("b")} > 0 THEN " +
      "round((CAST(s_a AS DOUBLE)/n_a - CAST(s_b AS DOUBLE)/n_b) / " +
      s"sqrt(${armVarSql("b")}), 6) END"

  /** Pairwise Welch post-hoc — WHICH groups differ after [[bartlett]]/
    * anova flag (the parametric twin of Dunn's test): every group pair
    * gets the unequal-variance t off the exact k-row moment table
    * (one tiny self-join, never a rescan), a two-sided p via the
    * shared A–S normal tail (documented large-n approximation of the
    * Welch t distribution), and Bonferroni significance across the
    * k(k−1)/2 comparisons. */
  def pairwiseWelch(
      df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    val g = df.groupBy(col(keyCol).cast("string").as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(x).cast("long").as("s"),
        sum(x * x).cast("long").as("sq"))
      .filter(col("n") > 1L)
      .materialize // both sides of the pair join
    val tot = broadcast(g.agg(count(lit(1)).cast("long").as("k")))
    g.as("a").join(broadcast(g.as("b")), col("a.grp") < col("b.grp"))
      .select(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"),
        col("a.n").as("n_a"), col("a.s").as("s_a"),
        col("a.sq").as("sq_a"), col("b.n").as("n_b"),
        col("b.s").as("s_b"), col("b.sq").as("sq_b"))
      .crossJoin(tot)
      .withColumn("t", expr(pwWelchTSql))
      .withColumn("p_normal", expr(
        s"round(${graft.operators.Profiling.normalPSql(pwWelchTSql)}, 6)"))
      .withColumn("significant", expr(
        s"round(${graft.operators.Profiling.normalPSql(pwWelchTSql)}, 6)" +
          " < 0.05 / (k * (k - 1) / 2)"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("t"), col("p_normal"), col("significant"))
  }

  /** Welch t over the pair moment row (overflow-safe variance
    * assembly); NULL when both variances vanish. Shared with the
    * oracle. */
  val pwWelchTSql: String = {
    def v(p: String) =
      s"((CAST(sq_$p AS DOUBLE) - CAST(s_$p AS DOUBLE) * " +
        s"(CAST(s_$p AS DOUBLE) / n_$p)) / (n_$p - 1))"
    val se2 = s"(${v("a")} / n_a + ${v("b")} / n_b)"
    s"CASE WHEN $se2 > 0 THEN " +
      "round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) / " +
      s"sqrt($se2), 6) END"
  }

  /** Jarque–Bera normality test per key — the gate before trusting any
    * ±2σ rule or t-interval on a metric: JB = n/6·(S² + K²/4) from the
    * skewness and excess kurtosis, assembled from EXACT raw moment
    * sums (Σx, Σx², and DECIMAL Σx³/Σx⁴ — cents⁴ leaves long at ~10³)
    * with one shared-SQL double chain; flagged against χ²₂(0.95).
    * One map-side-combined aggregate per key, no join. Heavy-tailed
    * spend/latency metrics light this up long before a histogram
    * would. */
  def jarqueBera(
      df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    df.groupBy(col(keyCol)).agg(
        count(lit(1)).cast("long").as("n"),
        sum(x).cast("long").as("s1"),
        sum((x * x).cast("decimal(38,0)")).as("s2"),
        sum((x * x).cast("decimal(38,0)") * x).as("s3"),
        sum(((x * x).cast("decimal(38,0)") * x) * x).as("s4"))
      .withColumn("skewness", expr(jbSkewSql))
      .withColumn("kurtosis_excess", expr(jbKurtSql))
      .withColumn("jb", expr(jbSql))
      .withColumn("significant", expr(s"$jbSql > 5.991465"))
      // exposed DECIMAL → STRING (r10 decimal contract; JB consumed the
      // exact decimals already — a DOUBLE cast of the >2^53 s4 differed
      // by 1 ulp between the engines)
      .withColumn("s2", col("s2").cast("string"))
      .withColumn("s3", col("s3").cast("string"))
      .withColumn("s4", col("s4").cast("string"))
  }

  private val jbMuSql = "(CAST(s1 AS DOUBLE) / n)"
  private val jbM2Sql =
    s"(CAST(s2 AS DOUBLE) / n - $jbMuSql * $jbMuSql)"
  private val jbM3Sql =
    s"(CAST(s3 AS DOUBLE) / n - 3 * $jbMuSql * (CAST(s2 AS DOUBLE) / n)" +
      s" + 2 * $jbMuSql * $jbMuSql * $jbMuSql)"
  private val jbM4Sql =
    s"(CAST(s4 AS DOUBLE) / n - 4 * $jbMuSql * (CAST(s3 AS DOUBLE) / n)" +
      s" + 6 * $jbMuSql * $jbMuSql * (CAST(s2 AS DOUBLE) / n)" +
      s" - 3 * $jbMuSql * $jbMuSql * $jbMuSql * $jbMuSql)"

  /** Skewness m₃/m₂^1.5 over the raw-moment row; NULL on zero
    * variance. Shared with the oracle. */
  val jbSkewSql: String =
    s"CASE WHEN n > 2 AND $jbM2Sql > 0 THEN " +
      s"round($jbM3Sql / ($jbM2Sql * sqrt($jbM2Sql)), 6) END"

  /** Excess kurtosis m₄/m₂² − 3 under the same guard. */
  val jbKurtSql: String =
    s"CASE WHEN n > 2 AND $jbM2Sql > 0 THEN " +
      s"round($jbM4Sql / ($jbM2Sql * $jbM2Sql) - 3, 6) END"

  /** JB over the ROUNDED skew/kurtosis columns (identical both
    * engines). */
  val jbSql: String =
    "CASE WHEN skewness IS NOT NULL THEN " +
      "round(CAST(n AS DOUBLE) / 6 * (skewness * skewness + " +
      "kurtosis_excess * kurtosis_excess / 4), 6) END"

  /** Bartlett's test for variance homogeneity across k groups — the
    * ANOVA precondition check ([[welchTTest]] exists because this
    * often FAILS): B = ((N−k)·ln Sp² − Σ(nᵢ−1)·ln sᵢ²) / C with the
    * standard small-sample correction C. Per-group variances come off
    * exact moment rows; the (nᵢ−1)·ln sᵢ² and 1/(nᵢ−1) terms and the
    * (nᵢ−1)·sᵢ² pooled contributions are milli/nano-quantized per
    * group (exact order-independent sums over the k-row group table);
    * df = k−1 flags through the shared lookup. Sensitive to
    * non-normality by construction — run [[jarqueBera]] first (the
    * robust alternative is brownForsythe). */
  def bartlett(
      df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    val g = df.groupBy(col(keyCol)).agg(
        count(lit(1)).cast("long").as("ng"),
        sum(x).cast("long").as("sg"),
        sum((x * x).cast("decimal(38,0)")).as("sqg"))
      .filter(col("ng") > 1L)
      .withColumn("var_g", expr(bartlettVarSql))
      .filter(col("var_g") > 0d)
    g.agg(count(lit(1)).cast("long").as("k"),
        sum(col("ng")).cast("long").as("n"),
        sum(expr(bartlettPoolMilliSql)).cast("long").as("pool_milli"),
        sum(expr(bartlettLnMilliSql)).cast("long").as("ln_milli"),
        sum(expr(bartlettInvNanoSql)).cast("long").as("inv_nano"))
      .withColumn("bartlett_stat", expr(bartlettSql))
      .withColumn("df", (col("k") - 1L).cast("long"))
      .withColumn("chi2_crit",
        expr(graft.operators.Profiling.chi2Crit95Sql("k - 1")))
      .withColumn("significant", expr(
        s"$bartlettSql > ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}"))
  }

  /** Sample variance off the per-group exact moment row (welchTTest
    * assembly). Shared with the oracle. */
  val bartlettVarSql: String =
    "((CAST(sqg AS DOUBLE) - CAST(sg AS DOUBLE) * " +
      "(CAST(sg AS DOUBLE) / ng)) / (ng - 1))"

  /** (nᵢ−1)·sᵢ² in milli units (micro would overflow long at cents²
    * scale), per group — no inner sum. Shared with the oracle. */
  val bartlettPoolMilliSql: String =
    s"CAST(ROUND((ng - 1) * $bartlettVarSql * 1000, 0) AS BIGINT)"

  /** (nᵢ−1)·ln sᵢ² in milli units. */
  val bartlettLnMilliSql: String =
    s"CAST(ROUND((ng - 1) * LN($bartlettVarSql) * 1000, 0) AS BIGINT)"

  /** 1/(nᵢ−1) in nano units. */
  val bartlettInvNanoSql: String =
    "CAST(ROUND(1000000000.0 / (ng - 1), 0) AS BIGINT)"

  /** B over (k, n, pool_milli, ln_milli, inv_nano); NULL for k < 2 or
    * a degenerate pool. Shared with the oracle. */
  val bartlettSql: String = {
    val sp2 = "(CAST(pool_milli AS DOUBLE) / 1000 / (n - k))"
    val c = "(1 + (CAST(inv_nano AS DOUBLE) / 1000000000 - " +
      "1.0 / (n - k)) / (3.0 * (k - 1)))"
    s"CASE WHEN k > 1 AND n > k AND $sp2 > 0 THEN " +
      s"round(((n - k) * LN($sp2) - CAST(ln_milli AS DOUBLE) / 1000) " +
      s"/ $c, 6) END"
  }

  /** Per-group z-score from EXACT integer moments: one agg computes
    * (n, sum, sumsq) as BIGINTs over an integer-valued column, then a
    * single double-arithmetic step derives population mean/std — the
    * acf/trendOls house pattern, which keeps the result independent of
    * aggregation order (a distributed float sum is not). Groups with zero
    * variance emit null z. */
  def zscore(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val m = df
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("__n"),
        sum(col(valCol)).cast("long").as("__s"),
        sum(col(valCol) * col(valCol)).cast("long").as("__sq"))
    val mean = col("__s").cast("double") / col("__n")
    val variance = col("__sq").cast("double") / col("__n") - mean * mean
    df.join(broadcast(m), keyCol)
      .withColumn("z",
        when(variance > 0d,
          round((col(valCol).cast("double") - mean) / sqrt(variance), 6)))
      .drop("__n", "__s", "__sq")
  }

  /** EXACT distributed quantile normalization — map every group's value
    * distribution onto the POOLED distribution (the bioinformatics
    * transform that makes batches comparable): value v in group g at
    * midrank percentile p is replaced by the pooled value at cumulative
    * position ⌈p·N⌉. Everything is integer arithmetic on distinct-value
    * tables: both CDFs come from the materialized-once ranged prefix sum
    * ([[Eval.rangedCumsum]]), the position lookup is the binned range
    * join ([[Temporal.rangeJoinBinned]] — position ∈ (cumBefore, cum]
    * half-open, never a BNLJ), and the SQL oracle replays the positions
    * exactly. Output is distinct-(group, value)-sized; join it back by
    * (group, value) for a per-row column.
    *
    * Bounds: positions multiply 2·n_g·N — fits BIGINT while
    * n_g·N < 4.6e18 (normalize per partition-of-corpus beyond that).
    * `binSize` trades bin-explode fan-out on the pooled side against
    * candidate-pair width (positions per bin). */
  def quantileNormalize(
      df: DataFrame, groupCol: String, valCol: String,
      binSize: Long = 64L): DataFrame = {
    val perG = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nv"))
    val cg = Eval.rangedCumsum(perG, Seq(groupCol), "v", Seq("nv"))
    val ng = broadcast(cg.groupBy(col(groupCol))
      .agg(sum(col("nv")).cast("long").as("n_g")))
    val perP = df.groupBy(col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("nvp"))
    val cp = Eval.rangedCumsum(perP, Nil, "v", Seq("nvp"))
    val npool = broadcast(cp.agg(sum(col("nvp")).cast("long").as("n_pool")))
    val req = cg.join(ng, Seq(groupCol)).crossJoin(npool)
      .withColumn("pos", greatest(lit(1L), expr(
        "CAST(((2*cum_nv - nv + 1) * n_pool + 2*n_g - 1) div (2*n_g) AS BIGINT)")))
      .withColumn("__pos0", col("pos") - 1L)
      .select(col(groupCol), col("v"), col("nv"), col("pos"), col("__pos0"))
    val ranges = cp.select(
      (col("cum_nvp") - col("nvp")).as("lo"), col("cum_nvp").as("hi"),
      col("v").as("v_norm"))
    Temporal.rangeJoinBinned(req, "__pos0", ranges, binSize)
      .select(col(groupCol), col("v"), col("nv"), col("pos"), col("v_norm"))
  }

  /** Median imputation audit — the repair step run before training on a
    * column with gaps: nulls are filled with the per-group exact LOWER
    * MEDIAN of the present values (the [[Eval.weightedMedian]] kernel at
    * weight 1 — a distinct-value prefix sum, never a per-group sort), and
    * the per-group summary reports how much was imputed and the totals
    * after repair. Summary-shaped output keeps the oracle row count
    * bounded; the row-level fill is `coalesce(v, median)` once this table
    * is broadcast back. */
  def imputeMedianSummary(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val med = Eval.weightedMedian(
      df.filter(col(valCol).isNotNull).withColumn("__one", lit(1L)),
      groupCol, valCol, "__one")
      .select(col(groupCol), col("w_median").as("imputed_median"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(valCol).isNull, 1L).otherwise(0L)).cast("long")
          .as("n_missing"),
        sum(coalesce(col(valCol), lit(0L))).cast("long").as("sum_present"))
      .join(med, Seq(groupCol))
      .withColumn("sum_after",
        col("sum_present") + col("n_missing") * col("imputed_median"))
  }

  /** Welch's heteroskedastic one-way ANOVA per key — the k-group
    * omnibus that does NOT assume equal variances: where the classic F
    * (q_anova) inflates its false-positive rate once group variances
    * differ (exactly what [[bartlett]] flags), Welch weights each group
    * by wⱼ = nⱼ/s²ⱼ and adjusts the denominator df. The parametric
    * complement to kruskalWallis on the same decision: "did the MEANS
    * move, given unequal spreads?".
    *
    * Groups with <2 rows or zero variance are EXCLUDED (wⱼ undefined);
    * k counts the survivors and k < 2 yields NULL. Per-group terms are
    * fixed-point-quantized before the cross-group sums (bartlett
    * discipline, order-independent): wⱼ at nano — fits while
    * Σ nⱼ/s²ⱼ < 9·10⁹, i.e. until a group is BOTH huge and
    * near-constant, which the zero-variance exclusion already borders —
    * wⱼmⱼ and wⱼ(mⱼ−m̄)² at micro. All downstream doubles derive from
    * the SAME quantized sums in both engines. Significance compares F
    * against chi²₉₅(k−1)/(k−1) — the df₂→∞ limit (documented
    * approximation; exact df₂ is exposed for re-judging).
    *
    * Plan: one (key, group)-hashed moment aggregate, one key-hashed
    * k-row aggregate, a broadcast-sized join back, one final key
    * aggregate — all post-shuffle frames are k-row-per-key tiny. */
  def welchAnova(
      df: DataFrame, keyCol: String, groupCol: String,
      valCol: String): DataFrame = {
    val x = col(valCol).cast("long")
    val g = df.groupBy(col(keyCol), col(groupCol)).agg(
        count(lit(1)).cast("long").as("ng"),
        sum(x).cast("long").as("sg"),
        sum((x * x).cast("decimal(38,0)")).as("sqg"))
      .filter(col("ng") > 1L)
      .withColumn("var_g", expr(bartlettVarSql))
      .filter(col("var_g") > 0d)
      .withColumn("w_nano", expr(waWNanoSql))
      .withColumn("wm_micro", expr(waWmMicroSql))
    val per = g.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("long").as("k"),
      sum(col("ng")).cast("long").as("n"),
      sum(col("w_nano")).cast("long").as("w_sum_nano"),
      sum(col("wm_micro")).cast("long").as("wm_sum_micro"))
    g.join(per, Seq(keyCol))
      .withColumn("a_micro", expr(waAMicroSql))
      .withColumn("l_nano", expr(waLNanoSql))
      .groupBy(col(keyCol))
      .agg(max(col("k")).cast("long").as("k"),
        max(col("n")).cast("long").as("n"),
        sum(col("a_micro")).cast("long").as("a_sum_micro"),
        sum(col("l_nano")).cast("long").as("l_sum_nano"))
      .withColumn("f_stat", expr(waFSql))
      .withColumn("df1", (col("k") - 1L).cast("long"))
      .withColumn("df2", expr(waDf2Sql))
      .withColumn("significant", expr(
        s"$waFSql > ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}" +
          " / (k - 1)"))
  }

  /** wⱼ = nⱼ/s²ⱼ in nano units off the per-group moment row (var_g
    * already guarded positive). Shared with the oracle. */
  val waWNanoSql: String =
    "CAST(ROUND(ng / var_g * 1000000000, 0) AS BIGINT)"

  /** wⱼ·mⱼ in micro units, with wⱼ re-derived FROM the quantized nano
    * value so every downstream double sees identical inputs. */
  val waWmMicroSql: String =
    "CAST(ROUND((CAST(w_nano AS DOUBLE) / 1000000000) * " +
      "(CAST(sg AS DOUBLE) / ng) * 1000000, 0) AS BIGINT)"

  /** wⱼ·(mⱼ−m̄w)² in micro units over the joined row (needs w_sum_nano,
    * wm_sum_micro); m̄w derives from the quantized sums. */
  val waAMicroSql: String = {
    val mbar = "(CAST(wm_sum_micro AS DOUBLE) / 1000000 / " +
      "nullif(CAST(w_sum_nano AS DOUBLE) / 1000000000, 0))"
    val dm = s"(CAST(sg AS DOUBLE) / ng - $mbar)"
    "CAST(ROUND((CAST(w_nano AS DOUBLE) / 1000000000) * " +
      s"$dm * $dm * 1000000, 0) AS BIGINT)"
  }

  /** (1 − wⱼ/W)²/(nⱼ−1) in nano units over the joined row. */
  val waLNanoSql: String = {
    val frac = "(1.0 - CAST(w_nano AS DOUBLE) / nullif(w_sum_nano, 0))"
    s"CAST(ROUND($frac * $frac / (ng - 1) * 1000000000, 0) AS BIGINT)"
  }

  /** Welch F over (k, a_sum_micro, l_sum_nano); NULL for k < 2.
    * Shared with the oracle. */
  val waFSql: String = {
    val a = "(CAST(a_sum_micro AS DOUBLE) / 1000000 / nullif(k - 1, 0))"
    val lam = "(CAST(l_sum_nano AS DOUBLE) / 1000000000)"
    s"CASE WHEN k > 1 THEN round($a / " +
      s"(1 + CAST(2*(k-2) AS DOUBLE) / nullif((k-1)*(k+1), 0) * $lam), " +
      "6) END"
  }

  /** Welch–Satterthwaite df₂ = (k²−1)/(3Λ); NULL for k < 2 or a zero
    * Λ (all weight in one group). */
  val waDf2Sql: String = {
    val lam = "(CAST(l_sum_nano AS DOUBLE) / 1000000000)"
    "CASE WHEN k > 1 AND l_sum_nano > 0 THEN " +
      s"round(CAST((k-1)*(k+1) AS DOUBLE) / (3 * $lam), 6) END"
  }

  /** Anderson–Darling normality test per key (case 4: mean and sd
    * estimated) — weights the CDF-distance by 1/(F(1−F)), so it sees
    * the TAILS [[jarqueBera]]'s moment ratios smear: A² = −n − (1/n)·
    * Σ(2i−1)[ln Φ(zᵢ) + ln(1−Φ(z_{n+1−i}))] over the value-ordered
    * sample, A*² = A²(1 + 0.75/n + 2.25/n²), reject at 5% when
    * A*² > 0.787 (Stephens). Φ through the shared erfc approximation
    * ([[Profiling.normalPSql]], |err| < 1.5e-7 — a test statistic, not
    * a quantile engine).
    *
    * Exactness: mean/sd assemble from Σx (long) and Σx² (decimal —
    * cents² escapes long at ~1e9-row keys); each row's two log terms
    * are MICRO-QUANTIZED longs before the coefficient multiply, so the
    * cross-row sum is exact and order-free (the welchAnova nano-term
    * discipline). Tied values are safe under any tie order: the
    * coefficient sum over a tied run is permutation-invariant. Feed
    * values in units keeping Σx² under ~2⁵³ (dollars, not cents, for
    * 100 TB spend series) so the one decimal→double cast is exact.
    *
    * Plan: per-key moments and ranks ride one key-hashed exchange (an
    * aggregate + a window on the same partitioning); per-key rows are
    * the caller's series granularity. */
  def andersonDarling(
      df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wKey = Window.partitionBy(col(keyCol))
    val wOrd = wKey.orderBy(col(valCol))
    df.select(col(keyCol), col(valCol).cast("long").as("v"))
      .withColumn("n", count(lit(1)).over(wKey).cast("long"))
      .withColumn("sx", sum(col("v")).over(wKey).cast("long"))
      .withColumn("sxx", sum(col("v").cast("decimal(38,0)") * col("v"))
        .over(wKey).cast("decimal(38,0)"))
      .withColumn("r", row_number().over(wOrd).cast("long"))
      .withColumn("term", expr(adTermSql))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"), sum(col("term")).cast("long").as("s_micro"))
      .withColumn("a2", expr(adA2Sql))
      .withColumn("a2_star", expr(adAStarSql))
      .withColumn("significant", expr(s"coalesce($adAStarSql > 0.787, false)"))
  }

  private val adMuSql = "(CAST(sx AS DOUBLE) / n)"
  private val adSdSql =
    s"sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * $adMuSql) / (n - 1))"
  private val adZSql = s"((CAST(v AS DOUBLE) - $adMuSql) / $adSdSql)"

  /** Per-row micro-quantized (2r−1)·lnΦ(z) + (2(n−r)+1)·ln(1−Φ(z));
    * NULL (dropping the key) on zero variance or n < 2. The erfc p is
    * floored at 1e-300 so extreme z never hits ln(0). Shared with the
    * oracle. */
  val adTermSql: String = {
    val p2 = Profiling.normalPSql(adZSql)
    val phi = s"(CASE WHEN $adZSql >= 0 THEN 1 - greatest($p2, 1e-300) / 2 " +
      s"ELSE greatest($p2, 1e-300) / 2 END)"
    "CASE WHEN n > 1 AND " +
      s"CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * $adMuSql > 0 THEN " +
      s"(2 * r - 1) * CAST(round(1000000 * ln($phi), 0) AS BIGINT) + " +
      s"(2 * (n - r) + 1) * " +
      s"CAST(round(1000000 * ln(1 - $phi), 0) AS BIGINT) END"
  }

  /** A² over (n, s_micro). Shared with the oracle. */
  val adA2Sql: String =
    "round(-CAST(n AS DOUBLE) - " +
      "CAST(s_micro AS DOUBLE) / n / 1000000, 6)"

  /** Stephens' small-sample adjusted A*² over the ROUNDED a2 column. */
  val adAStarSql: String =
    "round(a2 * (1 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)), 6)"

  /** Conover squared-ranks variance test — the RANK-based third member
    * of the variance-homogeneity family next to [[bartlett]] (normal
    * theory) and levene (mean deviations): deviations are ranked, the
    * ranks squared, and the between-group spread of the squared-rank
    * sums is referred to χ²(k−1). Robust to heavy tails where bartlett
    * over-rejects. Two deliberate exactness choices, both documented
    * contracts: (1) deviations center on the group MEDIAN held as the
    * exact integer 2·x − (m_lo + m_hi) (the Brown–Forsythe centering —
    * a double group mean could flip cross-engine tie order; the
    * integer median cannot); (2) squared midranks are NORMALIZED and
    * micro-quantized — a = round_half_up(10⁶·(2r)²/(2N)²) in integer
    * arithmetic (HUGEINT/decimal internally, exact in both engines) —
    * the statistic is scale-invariant, so normalizing keeps every
    * downstream sum long-exact at any N instead of overflowing at the
    * raw (2N)² scale. Group-sum squares and the correction term finish
    * as IEEE-deterministic double round(·, 0) longs, so the cross-group
    * sums are exact-integer, order-free.
    *
    * Plan: one value-domain frame + two order-stat picks (median), one
    * global distinct-deviation prefix sum (ranged kernel), two hash
    * aggregates — nothing row-sized sorts. */
  def conoverSquaredRanks(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val c = graft.Materialize(
      Profiling.valueCumFrame(df, groupCol, valCol))
    def os(k: String, nm: String) =
      c.filter(expr(s"cum_cnt >= $k")).groupBy(col(groupCol))
        .agg(min(col("v")).as(nm))
    val med = os("(n + 1) div 2", "m_lo")
      .join(os("(n + 2) div 2", "m_hi"), groupCol)
      .select(col(groupCol), (col("m_lo") + col("m_hi")).as("m2"))
    val u = df.select(col(groupCol), col(valCol).cast("long").as("x"))
      .join(broadcast(med), groupCol)
      .select(col(groupCol),
        abs(lit(2L) * col("x") - col("m2")).as("u"))
    val perU = u.groupBy(col("u"))
      .agg(count(lit(1)).cast("long").as("cnt_u"))
    // the global count joins in as a broadcast 1-row aggregate — a
    // sum-over-() window here would funnel the whole distinct-deviation
    // frame through ONE partition
    val nTot = broadcast(
      perU.agg(sum(col("cnt_u")).cast("long").as("nn")))
    val ranks = graft.Materialize(
      Eval.rangedCumsum(perU, Nil, "u", Seq("cnt_u"))
        .crossJoin(nTot)
        .withColumn("r2",
          lit(2L) * col("cum_cnt_u") - col("cnt_u") + lit(1L))
        .withColumn("a", expr(conoverAMicroSql).cast("long"))
        .select(col("u"), col("cnt_u"), col("nn"), col("a")))
    val perG = u.groupBy(col(groupCol), col("u"))
      .agg(count(lit(1)).cast("long").as("c_gu"))
      .join(ranks.select(col("u"), col("a")), "u")
      .groupBy(col(groupCol))
      .agg(sum(col("c_gu") * col("a")).cast("long").as("s_g"),
        sum(col("c_gu")).cast("long").as("n_g"))
      .withColumn("term",
        expr("CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g, 0) AS BIGINT)"))
    val tot = ranks.agg(
      max(col("nn")).cast("long").as("n"),
      sum(col("cnt_u") * col("a") * col("a")).cast("long").as("sa2"))
    perG.agg(
        count(lit(1)).cast("long").as("k"),
        sum(col("term")).cast("long").as("st"),
        sum(col("s_g")).cast("long").as("s_tot"))
      .crossJoin(broadcast(tot))
      .withColumn("t_conover", expr(conoverTSql))
      .withColumn("chi2_crit",
        expr(Profiling.chi2Crit95Sql("k - 1")))
      .withColumn("significant", expr(
        s"coalesce($conoverTSql > " +
          s"${Profiling.chi2Crit95Sql("k - 1")}, false)"))
      .select(col("n"), col("k"), col("st"), col("s_tot"), col("sa2"),
        col("t_conover"), col("chi2_crit"), col("significant"))
  }

  /** Micro-quantized normalized squared midrank over (r2 = 2·midrank,
    * nn = N): round(10⁶·(r2/2N)²). The quotient and square run in IEEE
    * doubles (both inputs exact longs < 2⁵³; ·/÷ match engines
    * libm-for-libm all session) and the half-away round pins the
    * result, so both engines compute the identical integer at any N —
    * the statistic is scale-invariant, so normalizing the ranks is
    * free and keeps every downstream sum long-exact. Shared with the
    * oracle. */
  val conoverAMicroSql: String =
    "CAST(round(1000000 * (CAST(r2 AS DOUBLE) / (2 * nn)) * " +
      "(CAST(r2 AS DOUBLE) / (2 * nn)), 0) AS BIGINT)"

  /** Conover T over (n, k, st, s_tot, sa2); NULL when the denominator
    * degenerates (all deviations tie). Shared with the oracle. */
  val conoverTSql: String = {
    val corr = "(CAST(s_tot AS DOUBLE) * s_tot / n)"
    val d2 = s"((CAST(sa2 AS DOUBLE) - $corr) / (n - 1))"
    s"CASE WHEN n > 1 AND $d2 > 0 THEN " +
      s"round((CAST(st AS DOUBLE) - $corr) / $d2, 6) END"
  }
}
