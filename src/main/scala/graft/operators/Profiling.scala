package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize
import graft.Materialize.MaterializeOps

/** Data-profiling / diagnostics operators — the "look before you shuffle"
  * step of a large-scale pipeline: column quality audits before training
  * ingestion, and join-key skew measurement before choosing a join
  * strategy (broadcast / salt / AQE skew split).
  */
object Profiling {

  /** Per-column profile: row count, null count, exact distinct count,
    * min/max (as strings, so one schema fits every column type).
    *
    * Plan shape: one aggregate PER COLUMN, unioned. Each aggregate's scan
    * prunes to exactly that column, so total IO ≈ one full-table read
    * spread over independent stages — versus the single-pass
    * multi-count-distinct alternative whose Expand node multiplies every
    * row by the number of profiled columns before the shuffle. Per-column
    * stages also let AQE size each distinct-aggregation independently
    * (a high-cardinality column gets more reduce partitions than a
    * 3-value flag column). */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    columns.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        // count-minus-count, not sum(isNull): sum over zero rows is NULL,
        // and the oracle's COUNT(*) - COUNT(col) shape is 0 there
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Join-key skew profile, grouped: for each `groupCol` value, how many
    * distinct `keyCol` keys exist, the heaviest key's row count, the mean,
    * and the max/mean skew ratio — the number that decides whether a join
    * on `keyCol` needs salting ([[Skew]]) or AQE skew-split. Two hash
    * aggregates, both with map-side partial aggregation; shuffle ∝ distinct
    * (group, key) pairs. */
  def keySkew(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_rows"),
        round(avg(col("c")), 6).as("avg_rows"),
        round(max(col("c")) / avg(col("c")), 6).as("skew_ratio"))

  /** Benford first-significant-digit profile per group — the classic
    * fabricated-data / unit-mix audit: for each group, the count and
    * observed share of each leading digit 1–9 of `valueCol` (zeros and
    * nulls ignored; sign ignored), next to the Benford expectation
    * log₁₀(1 + 1/d) and each digit's χ² contribution
    * `n_group·(obs − exp)²/exp`. Flag groups where Σ contrib exceeds the
    * χ²₈ critical value.
    *
    * The leading digit comes from STRING surgery (first char of the
    * absolute value's integer rendering), not log10 arithmetic — float
    * logs misclassify exact powers of 10 on some engines; substring never
    * does. Plan shape: one narrow map + two group-keyed aggregates (digit
    * histogram, then per-group totals joined back — AQE broadcasts the
    * group-cardinality side). */
  def benfordProfile(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val digit = substring(abs(col(valueCol)).cast("bigint").cast("string"), 1, 1)
      .cast("int")
    val hist = df
      .filter(col(valueCol).isNotNull && abs(col(valueCol)).cast("bigint") > 0)
      .select(col(groupCol), digit.as("digit"))
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = hist.groupBy(col(groupCol)).agg(sum(col("n")).as("n_group"))
    hist.join(totals, Seq(groupCol))
      .withColumn("obs", col("n") / col("n_group"))
      .withColumn("exp", log10(lit(1.0) + lit(1.0) / col("digit")))
      .select(col(groupCol), col("digit"), col("n"),
        round(col("obs"), 6).as("obs_freq"),
        round(col("exp"), 6).as("benford_freq"),
        round(col("n_group") * (col("obs") - col("exp")) * (col("obs") - col("exp"))
          / col("exp"), 6).as("chi2_contrib"))
  }

  /** Population Stability Index between a baseline and a current sample of
    * an integer-valued column — the drift monitor every production feature
    * pipeline runs: psi_contrib = (p_cur − p_base)·ln(p_cur/p_base) per
    * bucket; Σ < 0.1 is conventionally "no drift", > 0.25 "major drift".
    *
    * Buckets are the BASELINE's exact interpolated quantiles (the standard
    * choice: equal-population under no drift), assignment is "count of
    * edges strictly below x" so ties bind to the lower bucket identically
    * in both engines; probabilities use +0.5 additive smoothing so empty
    * buckets (duplicate edges, out-of-range current values) contribute a
    * finite, replayable term instead of ln(0).
    *
    * Plan shape: one baseline quantile agg broadcast to both sides, one
    * count agg per side, and a `buckets`-row spine join — the two samples
    * are each scanned ONCE and never shuffled beyond their bucket counts. */
  /** Baseline-quantile edges for [[psiDrift]] as a broadcast 1-row frame —
    * public so a STREAMING current sample can bucket against the same
    * edges (stream-static broadcast join) and feed [[psiFromCounts]]. */
  def psiEdges(base: DataFrame, valCol: String, buckets: Int = 10): DataFrame = {
    require(buckets > 1, s"buckets must be > 1: $buckets")
    val qs = (1 until buckets).map(i => s"${i.toDouble / buckets}D").mkString(", ")
    broadcast(base.agg(expr(s"percentile($valCol, array($qs))").as("__e")))
  }

  /** Bucket index against [[psiEdges]]' `__e` array: count of edges
    * strictly below x (ties bind to the lower bucket in both engines). */
  def psiBucket(valCol: String): org.apache.spark.sql.Column =
    size(filter(col("__e"), e => col(valCol).cast("double") > e)).cast("long")

  /** PSI assembly from per-bucket counts (`bucket`, `n_base`, `n_cur` —
    * missing buckets taken as 0 via the spine join in [[psiDrift]]). */
  def psiFromCounts(j: DataFrame, buckets: Int): DataFrame = {
    val tot = broadcast(j.agg(
      sum(col("n_base")).cast("long").as("__tb"),
      sum(col("n_cur")).cast("long").as("__tc")))
    val eps = lit(0.5 * buckets)
    val p = (col("n_base").cast("double") + 0.5) / (col("__tb").cast("double") + eps)
    val q = (col("n_cur").cast("double") + 0.5) / (col("__tc").cast("double") + eps)
    j.crossJoin(tot).select(col("bucket"), col("n_base"), col("n_cur"),
      round(p, 6).as("p_base"), round(q, 6).as("p_cur"),
      round((q - p) * log(q / p), 6).as("psi_contrib"))
  }

  /** Spine-join per-side bucket counts so every bucket row exists. */
  def psiCountsSpine(
      baseCounts: DataFrame, curCounts: DataFrame, buckets: Int): DataFrame = {
    val spine = baseCounts.sparkSession.range(buckets).select(col("id").as("bucket"))
    spine
      .join(baseCounts, Seq("bucket"), "left")
      .join(curCounts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  def psiDrift(
      base: DataFrame,
      current: DataFrame,
      valCol: String,
      buckets: Int = 10): DataFrame = {
    val edges = psiEdges(base, valCol, buckets)
    def bucketCounts(df: DataFrame, name: String) =
      df.crossJoin(edges)
        .select(psiBucket(valCol).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).cast("long").as(name))
    psiFromCounts(
      psiCountsSpine(bucketCounts(base, "n_base"), bucketCounts(current, "n_cur"),
        buckets),
      buckets)
  }

  /** Chi-square test of independence over a two-column contingency table —
    * "does the categorical distribution differ across arms/cohorts?", the
    * categorical companion to [[ksTest]]/[[psiDrift]]. One count aggregate
    * builds the contingency cells; row/column marginals come from two tiny
    * re-aggregations of those cells (never a second scan) broadcast back;
    * chi² per cell = (obs − exp)²/exp with exp = row·col/total assembled
    * from exact BIGINT counts in one double step. No p-value on purpose
    * (chi² CDF libm portability, same stance as welchTTest). */
  def chi2Independence(
      df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    // cells materialize ONCE — the marginal/total branches would
    // otherwise each re-scan the input (4 full scans for a tiny table)
    val cells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).cast("long").as("obs"))
      .materialize
    val rows = broadcast(cells.groupBy(col(rowCol))
      .agg(sum(col("obs")).cast("long").as("__nr")))
    val cols = broadcast(cells.groupBy(col(colCol))
      .agg(sum(col("obs")).cast("long").as("__nc")))
    val tot = broadcast(cells.agg(sum(col("obs")).cast("long").as("__n")))
    val exp = col("__nr").cast("double") * col("__nc") / col("__n")
    cells.join(rows, rowCol).join(cols, colCol).crossJoin(tot)
      .select(col(rowCol), col(colCol), col("obs"),
        round(exp, 6).as("expected"),
        round((col("obs").cast("double") - exp) * (col("obs").cast("double") - exp)
          / exp, 6).as("chi2_contrib"))
  }

  /** Fixed-point log-likelihood-ratio increments and Wald thresholds for
    * [[sprt]] — exposed so the SQL oracle interpolates the IDENTICAL
    * integer constants (micro-nats). */
  def sprtConstants(p0: Double, p1: Double, alpha: Double, beta: Double)
      : (Long, Long, Long, Long) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"p0/p1 must be distinct probabilities in (0,1): $p0, $p1")
    val s = 1000000.0
    (math.round(math.log(p1 / p0) * s),
      math.round(math.log((1 - p1) / (1 - p0)) * s),
      math.round(math.log((1 - beta) / alpha) * s),
      math.round(math.log(beta / (1 - alpha)) * s))
  }

  /** Wald's sequential probability ratio test over an event stream — the
    * "stop the A/B test as soon as it's decided" monitor: per group, walk
    * events in (orderCols) order accumulating the Bernoulli LLR, and stop
    * at the first crossing of the Wald bounds (accept H1 at
    * ln((1−β)/α), accept H0 at ln(β/(1−α))); groups that never cross
    * report `continue` with their final state.
    *
    * All arithmetic is integer-exact: increments and thresholds are
    * pre-rounded to micro-nats ([[sprtConstants]]), so the cumulative walk
    * is a BIGINT prefix sum — it runs on the materialized-once ranged
    * kernel ([[Eval.rangedCumsumOrdered]]), never a per-group
    * single-partition window, and the SQL oracle replays the walk
    * bit-for-bit. First crossing resolves with one min_by per group. */
  def sprt(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      outcomeCol: String,
      p0: Double, p1: Double,
      alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    val (incPos, incNeg, upper, lower) = sprtConstants(p0, p1, alpha, beta)
    val stepped = df.select(
      col(groupCol) +: orderCols.map(col) :+
        when(col(outcomeCol), incPos).otherwise(incNeg).as("__llr") :+
        lit(1L).as("__one"): _*)
    val c = Eval.rangedCumsumOrdered(stepped, Seq(groupCol), orderCols,
      Seq("__llr", "__one"))
    val firsts = c
      .filter(col("cum___llr") >= upper || col("cum___llr") <= lower)
      .groupBy(col(groupCol))
      .agg(min_by(
        struct(col("cum___one").as("n"), col("cum___llr").as("llr")),
        struct(orderCols.map(col): _*)).as("__f"))
      .select(col(groupCol), col("__f.n").as("__cn"), col("__f.llr").as("__cllr"))
    val tot = c.groupBy(col(groupCol)).agg(
      sum(col("__llr")).cast("long").as("__fllr"),
      count(lit(1)).cast("long").as("__nt"))
    tot.join(firsts, Seq(groupCol), "left")
      .select(col(groupCol),
        when(col("__cn").isNull, lit("continue"))
          .when(col("__cllr") >= upper, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        coalesce(col("__cn"), col("__nt")).as("n_obs"),
        coalesce(col("__cllr"), col("__fllr")).as("llr_micro"),
        lit(upper).as("upper_micro"), lit(lower).as("lower_micro"))
  }

  /** Mutual information between two categorical columns, emitted as exact
    * per-cell contributions (Σ = MI in nats) — the information-theoretic
    * companion to [[chi2Independence]] and the feature-selection scorer
    * ("how much does this feature tell me about the label?"). Same plan
    * shape as chi²: one contingency aggregate, marginals as tiny
    * re-aggregations joined back, one double expression per cell. The
    * count products are computed in DOUBLE (n_x·n_y overflows BIGINT at
    * petabyte row counts; doubles are exact to 2^53 and the final value
    * is rounded to 6 decimals anyway — the oracle mirrors the same
    * association). */
  def mutualInformation(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // contingency cells materialize ONCE (they are |X|·|Y|-sized — tiny):
    // the marginal/total branches would otherwise each re-scan the input
    val cells = df.groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).cast("long").as("obs"))
      .materialize
    val xs = broadcast(cells.groupBy(col(xCol))
      .agg(sum(col("obs")).cast("long").as("__nx")))
    val ys = broadcast(cells.groupBy(col(yCol))
      .agg(sum(col("obs")).cast("long").as("__ny")))
    val tot = broadcast(cells.agg(sum(col("obs")).cast("long").as("__n")))
    cells.join(xs, xCol).join(ys, yCol).crossJoin(tot)
      .select(col(xCol), col(yCol), col("obs"), col("__nx").as("n_x"),
        col("__ny").as("n_y"),
        round((col("obs").cast("double") / col("__n")) *
          log((col("obs").cast("double") * col("__n")) /
            (col("__nx").cast("double") * col("__ny"))), 6).as("mi_contrib"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic over an integer-valued
    * column: D = max over observed values of |F_a(v) − F_b(v)| — the
    * sharper drift test next to [[psiDrift]] (no bucketing, sensitive to
    * any CDF gap). Counts are exact integers; the CDFs are single double
    * divisions at the end, so the SQL oracle replays D bit-for-bit.
    *
    * Scale shape: PSI's cost model breaks down here because the CDF needs
    * a GLOBAL cumulative sum over distinct values — the naive window
    * serializes the table through one partition. This runs the shared
    * distributed prefix sum ([[Eval.rangedCumsum]]: range-partition
    * distinct values, materialize ONCE, local cumsum per partition,
    * per-partition totals broadcast back as offsets), then one
    * max-aggregate. Nothing bigger than the distinct-value table ever
    * shuffles, and that only once. */
  def ksTest(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    val u = a.select(col(valCol).cast("long").as("v"),
        lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionByName(b.select(col(valCol).cast("long").as("v"),
        lit(0L).as("__ca"), lit(1L).as("__cb")))
    val per = u.groupBy(col("v")).agg(
      sum(col("__ca")).cast("long").as("ca"), sum(col("__cb")).cast("long").as("cb"))
    // shared prefix-sum kernel: materialize-once ranged cumsum (see
    // Eval.rangedCumsum for why the checkpoint is load-bearing — the
    // pre-refactor twin of this code relied on exchange reuse to keep the
    // two branches' range bounds consistent, which is not guaranteed)
    val c = Eval.rangedCumsum(per, Nil, "v", Seq("ca", "cb"))
    // totals from the checkpointed frame — no second scan of the inputs
    val tot = broadcast(c.agg(
      sum(col("ca")).cast("long").as("n_a"), sum(col("cb")).cast("long").as("n_b")))
    c.crossJoin(tot)
      .select(col("n_a"), col("n_b"),
        abs(col("cum_ca").cast("double") / col("n_a") -
          col("cum_cb").cast("double") / col("n_b")).as("__diff"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(round(max(col("__diff")), 6).as("d"))
  }

  /** 1-D earth mover's (Wasserstein-1) distance between two samples —
    * the MAGNITUDE companion to [[ksTest]]: KS asks "do the
    * distributions differ?", EMD answers "by how much, in the metric's
    * own units" (∫|F_a − F_b| dv — robust to binning, sensitive to
    * location shifts KS saturates on). Same distinct-value prefix-sum
    * kernel; the inter-value gaps come from a per-partition `lead` plus
    * a partition-boundary stitch over the ≤#partitions first-value rows
    * (never a single-partition global sort). Per-gap rectangles are
    * micro-quantized — order-independent exact sums. */
  def emd1d(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = a.select(col(valCol).cast("long").as("v"),
        lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionByName(b.select(col(valCol).cast("long").as("v"),
        lit(0L).as("__ca"), lit(1L).as("__cb")))
    val per = u.groupBy(col("v")).agg(
      sum(col("__ca")).cast("long").as("ca"),
      sum(col("__cb")).cast("long").as("cb"))
    val c = Eval.rangedCumsumOrdered(per, Nil, Seq("v"), Seq("ca", "cb"),
      keepPid = true)
    val tot = broadcast(c.agg(
      sum(col("ca")).cast("long").as("n_a"),
      sum(col("cb")).cast("long").as("n_b")))
    // next distinct value: in-partition lead; the last row of each range
    // partition reads the NEXT non-empty partition's first value from a
    // tiny (#partitions-row) stitched table
    val firsts = c.groupBy(col("__pid")).agg(min(col("v")).as("__fv"))
      .withColumn("__next_fv",
        lead(col("__fv"), 1).over(Window.orderBy(col("__pid"))))
      .select(col("__pid"), col("__next_fv"))
    val wIn = Window.partitionBy(col("__pid")).orderBy(col("v"))
    c.join(broadcast(firsts), Seq("__pid"))
      .withColumn("next_v",
        coalesce(lead(col("v"), 1).over(wIn), col("__next_fv")))
      .filter(col("next_v").isNotNull)
      .crossJoin(tot)
      .withColumn("gap_micro", expr(emdGapMicroSql))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("gap_micro")).cast("long").as("emd_micro"))
      .withColumn("emd",
        expr("round(CAST(emd_micro AS DOUBLE) / 1000000, 6)"))
  }

  /** Per-gap |F_a − F_b|·(next_v − v) rectangle in micro units over
    * (cum_ca, cum_cb, n_a, n_b, v, next_v) — deterministic double ops
    * on exact integers, no inner sum. Shared with the oracle. */
  val emdGapMicroSql: String =
    "CAST(ROUND(ABS(CAST(cum_ca AS DOUBLE) / n_a - " +
      "CAST(cum_cb AS DOUBLE) / n_b) * (next_v - v) * 1000000, 0) " +
      "AS BIGINT)"

  /** Order-independent table fingerprint — the cross-engine / cross-copy
    * data-validation primitive: hash each row's canonical rendering
    * (`'|'`-joined string casts) with the 60-bit md5 kernel and aggregate
    * per group with commutative reducers (count, sum, min, max). Two
    * tables fingerprint-equal per group ⇒ byte-identical content with
    * overwhelming probability, checked WITHOUT moving either table — the
    * check a migration (engine A → engine B, region copy, format rewrite)
    * runs at 100 TB instead of a row-level diff. One scan, one
    * map-side-combined aggregate; caller picks `cols` with
    * render-portable types (integers/strings/dates — float rendering is
    * engine-specific, quantize first). The SUMMED hash is truncated to
    * 40 bits so the exact sum fits a long up to ~8·10⁶ rows per group
    * (fingerprint finer groups beyond that); min/max keep the full 60
    * bits. */
  def tableFingerprint(
      df: DataFrame, groupCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    // concat_ws SKIPS nulls, so without a sentinel (a, NULL, b) and
    // (a, b, NULL) render identically — a false "content equal" for a
    // validation primitive. The sentinel is part of the canonical
    // rendering contract (mirrored in the oracle's COALESCE).
    df.select(col(groupCol),
        graft.functions.TextFunctions.tokenHash60(
          concat_ws("|", cols.map(c =>
            coalesce(col(c).cast("string"), lit(nullSentinel))): _*)).as("h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(pmod(col("h"), lit(1099511627776L))).cast("long").as("hash_sum"),
        min(col("h")).as("hash_min"), max(col("h")).as("hash_max"))
  }

  /** The canonical NULL rendering inside [[tableFingerprint]] rows —
    * chosen to be unlikely in real cell values; the oracle SQL must
    * COALESCE with the same token. */
  val nullSentinel: String = "<NUL>"

  /** Spearman rank correlation — Pearson over MIDRANKS, the monotone-
    * association measure that (unlike [[kendallTau]]'s O(n²) pairs)
    * costs two distinct-value prefix sums + one moment aggregate:
    * each variable's values map to doubled midranks (2·rank stays an
    * exact integer through ties), and ρ is the shared-SQL Pearson over
    * the exact integer moment sums. Value-keyed joins throughout — the
    * vocabulary-join discipline, nothing sorts globally. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def ranked(c: String, out: String) = {
      val per = df.groupBy(col(c).cast("long").as("v"))
        .agg(count(lit(1)).cast("long").as("nv"))
      Eval.rangedCumsum(per, Nil, "v", Seq("nv"))
        .select(col("v").as(c),
          (col("cum_nv") * 2 - col("nv") + 1).as(out)) // 2·midrank
    }
    val u = df.select(col(xCol).cast("long").as(xCol),
      col(yCol).cast("long").as(yCol))
    val withRanks = u
      .join(ranked(xCol, "rx2"), Seq(xCol))
      .join(ranked(yCol, "ry2"), Seq(yCol))
    // second moments of doubled midranks grow ~4n³ — a LONG sum
    // overflows silently past ~1.3M rows, so the squared sums run in
    // DECIMAL(38,0) (exact to ~3·10¹² rows; each PRODUCT still fits a
    // long to ~1.5·10⁹ rows). sx/sy are ~n² — long is fine to ~3·10⁹.
    withRanks.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("rx2")).cast("long").as("sx"),
      sum(col("ry2")).cast("long").as("sy"),
      sum((col("rx2") * col("rx2")).cast("decimal(38,0)")).as("sxx"),
      sum((col("ry2") * col("ry2")).cast("decimal(38,0)")).as("syy"),
      sum((col("rx2") * col("ry2")).cast("decimal(38,0)")).as("sxy"))
      .withColumn("spearman_rho", expr(pearsonMomentsSql))
      // the statistic consumed the exact DECIMAL sums above; the EXPOSED
      // copies leave as STRING — raw DECIMAL in an output schema renders
      // engine-dependently under the driver's hasher, and DOUBLE casts of
      // >2^53 decimals differ by 1 ulp between the engines (the r10
      // jarque-bera lesson, BASELINE.md dtype clause); exact digits are
      // identical everywhere
      .withColumn("sxx", col("sxx").cast("string"))
      .withColumn("syy", col("syy").cast("string"))
      .withColumn("sxy", col("sxy").cast("string"))
  }

  /** Guarded Pearson over a moment-sum row, shared with the oracle. */
  val pearsonMomentsSql: String = {
    val (vx, vy) = ("(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)",
      "(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)")
    s"CASE WHEN $vx > 0 AND $vy > 0 THEN " +
      s"round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy) / " +
      s"sqrt($vx * $vy), 6) END"
  }

  /** Matthews correlation coefficient — the single-number binary-
    * classifier score that stays honest under class imbalance (accuracy
    * and F1 both don't): MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)
    * (TN+FN)) from the four exact confusion cells in ONE aggregate;
    * NULL when a marginal is empty (undefined by convention). */
  def mcc(df: DataFrame, predCol: String, labelCol: String): DataFrame =
    df.agg(
      sum(when(col(predCol) && col(labelCol), 1L).otherwise(0L))
        .cast("long").as("tp"),
      sum(when(col(predCol) && !col(labelCol), 1L).otherwise(0L))
        .cast("long").as("fp"),
      sum(when(!col(predCol) && !col(labelCol), 1L).otherwise(0L))
        .cast("long").as("tn"),
      sum(when(!col(predCol) && col(labelCol), 1L).otherwise(0L))
        .cast("long").as("fn"))
      .withColumn("mcc", expr(mccSql))

  /** MCC over the confusion row, shared with the oracle. The products
    * run in doubles (identical both engines) — exact-integer products of
    * four marginals would overflow long at ~10⁵ rows. */
  val mccSql: String = {
    val den = "(CAST(tp + fp AS DOUBLE) * (tp + fn) * (tn + fp) * (tn + fn))"
    s"CASE WHEN $den > 0 THEN " +
      s"round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) / " +
      s"sqrt($den), 6) END"
  }

  /** McNemar's test on PAIRED binary outcomes — "is model B actually
    * better than model A on the SAME examples?", the question accuracy
    * deltas can't answer (they ignore pairing). Only the DISCORDANT
    * cells matter: b = A right, B wrong; c = A wrong, B right; the
    * continuity-corrected χ² = (|b−c|−1)²/(b+c) vs χ²₁(0.95). One
    * aggregate over the paired table; the statistic's numerator is an
    * exact integer, one shared-SQL double division. NULL (no evidence
    * either way) when the models never disagree. */
  def mcnemar(df: DataFrame, okACol: String, okBCol: String): DataFrame =
    df.agg(
      sum(when(col(okACol) && !col(okBCol), 1L).otherwise(0L))
        .cast("long").as("b_only_a"),
      sum(when(!col(okACol) && col(okBCol), 1L).otherwise(0L))
        .cast("long").as("c_only_b"),
      sum(when(col(okACol) === col(okBCol), 1L).otherwise(0L))
        .cast("long").as("n_concordant"))
      .withColumn("chi2", expr(mcnemarSql))
      .withColumn("significant", expr(s"$mcnemarSql > 3.841459"))

  /** Continuity-corrected McNemar χ² over the discordant cells, shared
    * with the oracle; the squared term stays exact BIGINT. */
  val mcnemarSql: String =
    "CASE WHEN b_only_a + c_only_b > 0 THEN " +
      "round(CAST((abs(b_only_a - c_only_b) - 1) * " +
      "(abs(b_only_a - c_only_b) - 1) AS DOUBLE) / " +
      "(b_only_a + c_only_b), 6) END"

  /** Cochran–Armitage trend test — "does the outcome rate RISE with
    * dose?", the 1-df ordered alternative the omnibus chi-square wastes
    * power on: integer dose scores w, binary outcome; Z² = N·(N·Σwr −
    * R·Σwn)² / (R(N−R)(N·Σw²n − (Σwn)²)) vs χ²₁(0.95). One grouped
    * aggregate to the dose-level table, one total row; every sum and
    * every pre-square product is exact BIGINT (bounds: w·N < ~3·10⁹),
    * the squared term and final ratio are one shared-SQL double chain. */
  def cochranArmitage(
      df: DataFrame, doseCol: String, outcomeCol: String): DataFrame =
    df.select(col(doseCol).cast("long").as("w"),
        when(col(outcomeCol), 1L).otherwise(0L).as("y"))
      .groupBy(col("w"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("y")).cast("long").as("rg"))
      .agg(count(lit(1)).cast("long").as("g"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("rg")).cast("long").as("r"),
        sum(col("w") * col("ng")).cast("long").as("swn"),
        sum(col("w") * col("rg")).cast("long").as("swr"),
        sum(col("w") * col("w") * col("ng")).cast("long").as("sw2n"))
      .withColumn("chi2_trend", expr(caChi2Sql))
      .withColumn("significant", expr(s"$caChi2Sql > 3.841459"))

  /** Trend χ² over the moment row, shared with the oracle; NULL when the
    * outcome or the dose is constant (variance degenerates). */
  val caChi2Sql: String =
    "CASE WHEN r > 0 AND r < n AND n*sw2n - swn*swn > 0 THEN " +
      "round(CAST(n AS DOUBLE) * (CAST(n*swr - r*swn AS DOUBLE) * " +
      "CAST(n*swr - r*swn AS DOUBLE)) / " +
      "(CAST(r AS DOUBLE) * (n - r) * (n*sw2n - swn*swn)), 6) END"

  /** Mann–Whitney U — "is treatment's metric distribution shifted vs
    * control?" without ANY normality assumption (the t-test's blind
    * spot on heavy-tailed spend/latency metrics). Combined doubled
    * midranks off ONE prefix sum over the distinct-value table (the
    * [[spearman]] kernel), so the rank sums and 2·U₁ stay exact
    * integers through ties; the tie-corrected normal z and Cliff's δ
    * (the in-[−1,1] effect size: P(x>y) − P(x<y)) finish in one
    * shared-SQL double chain. Long-sum bound: Σr2 ≤ 2n² — exact to
    * ~2·10⁹ rows (documented, like [[spearman]]'s). */
  def mannWhitney(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val u = df.select(when(col(groupCol), 1L).otherwise(0L).as("grp"),
      col(valCol).cast("long").as("v"))
    val per = u.groupBy(col("v")).agg(count(lit(1)).cast("long").as("nv"))
    val ranks = Eval.rangedCumsum(per, Nil, "v", Seq("nv"))
      .select(col("v"), (col("cum_nv") * 2 - col("nv") + 1).as("r2"),
        (col("nv").cast("decimal(38,0)") * col("nv") * col("nv")
          - col("nv")).as("t3t_v"))
    // Σ(t³−t) over tie groups in DECIMAL — a 3M-row tie would overflow
    // a long cube; one broadcast row
    val tie = broadcast(ranks.agg(
      sum(col("t3t_v")).cast("decimal(38,0)").as("t3t")))
    u.join(ranks.select(col("v"), col("r2")), Seq("v"))
      .agg(
        sum(when(col("grp") === 1L, 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("grp") === 0L, 1L).otherwise(0L)).cast("long").as("n2"),
        sum(when(col("grp") === 1L, col("r2")).otherwise(0L))
          .cast("long").as("r1x2"))
      .crossJoin(tie)
      .withColumn("u1x2", (col("r1x2") - col("n1") * (col("n1") + 1))
        .cast("long"))
      .withColumn("z", expr(mwZSql))
      .withColumn("cliffs_delta", expr(cliffsDeltaSql))
      .withColumn("significant", expr(s"abs($mwZSql) > 1.959964"))
      // exposed DECIMAL → STRING (r10 decimal contract; z consumed the
      // exact decimal already)
      .select(col("n1"), col("n2"), col("u1x2"),
        col("t3t").cast("string").as("t3t"), col("z"),
        col("cliffs_delta"), col("significant"))
  }

  /** Tie-corrected Mann–Whitney variance ·4 (of 2·U) over the moment
    * row — shared between [[mwZSql]]'s guard and numerator scale. */
  private val mwVar4Sql: String =
    "((CAST(n1 AS DOUBLE) * n2 / 3) * ((n1 + n2 + 1) - " +
      "CAST(t3t AS DOUBLE) / " +
      "((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2 - 1))))"

  /** Normal z for 2·U₁ over (n1, n2, u1x2, t3t), shared with the
    * oracle; NULL when a group is empty or every value ties. */
  val mwZSql: String =
    s"CASE WHEN n1 > 0 AND n2 > 0 AND $mwVar4Sql > 0 THEN " +
      "round((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2) / " +
      s"sqrt($mwVar4Sql), 6) END"

  /** Cliff's δ = 2U₁/(n₁n₂) − 1 over the same row, shared with the
    * oracle (2U₁ = u1x2 keeps the half-tie counts exact). */
  val cliffsDeltaSql: String =
    "CASE WHEN n1 > 0 AND n2 > 0 THEN " +
      "round((CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2) / " +
      "(CAST(n1 AS DOUBLE) * n2), 6) END"

  /** Kruskal–Wallis H — the k-group rank ANOVA: does AT LEAST ONE
    * group's metric distribution differ? The omnibus companion to
    * [[mannWhitney]] on the same combined-midrank kernel. Per-group
    * rank sums stay exact longs; each group's R²/n term is
    * micro-quantized before the final sum (order-independent, the
    * [[cramersV]] discipline), tie correction divides by
    * 1 − Σ(t³−t)/(n³−n), and the critical value follows df = k−1
    * through [[chi2Crit95Sql]] — never a hardcoded quantile. */
  def kruskalWallis(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("string").as("grp"),
      col(valCol).cast("long").as("v"))
    val per = u.groupBy(col("v")).agg(count(lit(1)).cast("long").as("nv"))
    val ranks = Eval.rangedCumsum(per, Nil, "v", Seq("nv"))
      .select(col("v"), (col("cum_nv") * 2 - col("nv") + 1).as("r2"),
        (col("nv").cast("decimal(38,0)") * col("nv") * col("nv")
          - col("nv")).as("t3t_v"))
    val tie = broadcast(ranks.agg(
      sum(col("t3t_v")).cast("decimal(38,0)").as("t3t")))
    u.join(ranks.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("r2")).cast("long").as("rgx2"))
      .withColumn("s_micro", expr(kwCellMicroSql))
      .agg(count(lit(1)).cast("long").as("g"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("s_micro")).cast("decimal(38,0)").as("s_micro"))
      .crossJoin(tie)
      .withColumn("h", expr(kwHSql))
      .withColumn("df", (col("g") - 1).cast("long"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("g - 1")))
      .withColumn("significant",
        expr(s"$kwHSql > ${chi2Crit95Sql("g - 1")}"))
      // exposed DECIMAL → STRING (r10 decimal contract; H consumed the
      // exact decimals already)
      .withColumn("s_micro", col("s_micro").cast("string"))
      .withColumn("t3t", col("t3t").cast("string"))
  }

  /** Per-group H contribution (R_g²/n_g with R_g = rgx2/2) in micro
    * units — deterministic double ops on exact-integer inputs, no sum
    * inside, so the quantized value is engine-independent. */
  val kwCellMicroSql: String =
    "CAST(ROUND(CAST(rgx2 AS DOUBLE) * rgx2 / (4.0 * ng) * 1000000, 0) " +
      "AS DECIMAL(38,0))"

  /** Tie-corrected H over (n, s_micro, t3t), shared with the oracle;
    * NULL when n < 2 or every value ties (correction degenerates). */
  val kwHSql: String =
    "CASE WHEN n > 1 AND CAST(t3t AS DOUBLE) < " +
      "CAST(n AS DOUBLE) * n * n - n THEN " +
      "round(((12.0 / (CAST(n AS DOUBLE) * (n + 1))) * " +
      "(CAST(s_micro AS DOUBLE) / 1000000) - 3.0 * (n + 1)) / " +
      "(1 - CAST(t3t AS DOUBLE) / " +
      "(CAST(n AS DOUBLE) * n * n - n)), 6) END"

  /** χ²(df, 0.95) critical value as a CASE lookup over a df
    * expression — df 1..20 supported, NULL beyond (callers see a NULL
    * flag instead of a silently wrong quantile; the [[TimeSeries]]
    * ljungBox lesson). 11..20 landed in round 10 when the 20-source
    * documents table pushed kruskalWallis to df = 19 and its flag went
    * permanently NULL. Shared with the oracle. */
  def chi2Crit95Sql(dfExpr: String): String =
    s"CAST((CASE CAST(($dfExpr) AS BIGINT) " +
      "WHEN 1 THEN 3.841459 WHEN 2 THEN 5.991465 WHEN 3 THEN 7.814728 " +
      "WHEN 4 THEN 9.487729 WHEN 5 THEN 11.070498 WHEN 6 THEN 12.591587 " +
      "WHEN 7 THEN 14.067140 WHEN 8 THEN 15.507313 WHEN 9 THEN 16.918978 " +
      "WHEN 10 THEN 18.307038 WHEN 11 THEN 19.675138 " +
      "WHEN 12 THEN 21.026070 WHEN 13 THEN 22.362032 " +
      "WHEN 14 THEN 23.684791 WHEN 15 THEN 24.995790 " +
      "WHEN 16 THEN 26.296228 WHEN 17 THEN 27.587112 " +
      "WHEN 18 THEN 28.869299 WHEN 19 THEN 30.143527 " +
      "WHEN 20 THEN 31.410433 END) AS DOUBLE)"

  /** Cochran's Q — the k-treatment extension of [[mcnemar]]: "do ANY of
    * k classifiers/rules differ on the SAME items?" over paired binary
    * outcomes. Q = (k−1)·(k·ΣG_j² − N²)/(k·N − ΣL_i²) with G_j the
    * per-treatment success counts and L_i the per-item counts — every
    * term an EXACT integer from two tiny aggregates (treatment-keyed
    * and item-keyed) over one scan; df = k−1 flags through
    * [[chi2Crit95Sql]]. Expects exactly one row per (item, treatment).
    * NULL when every item is all-success/all-failure (denominator 0). */
  def cochranQ(
      df: DataFrame, itemCol: String, treatCol: String,
      okCol: String): DataFrame = {
    val u = df.select(col(itemCol).as("__i"), col(treatCol).as("__t"),
      when(col(okCol), 1L).otherwise(0L).as("__s"))
    val byTreat = u.groupBy(col("__t"))
      .agg(sum(col("__s")).cast("long").as("gj"))
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("gj")).cast("long").as("sum_g"),
        sum((col("gj") * col("gj")).cast("decimal(38,0)")).as("sum_g2"))
    val byItem = u.groupBy(col("__i"))
      .agg(sum(col("__s")).cast("long").as("li"))
      .agg(count(lit(1)).cast("long").as("n_items"),
        sum(col("li")).cast("long").as("sum_l"),
        sum(col("li") * col("li")).cast("long").as("sum_l2"))
    byTreat.crossJoin(broadcast(byItem))
      .withColumn("q", expr(cochranQSql))
      .withColumn("df", (col("k") - 1L).cast("long"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("k - 1")))
      .withColumn("significant",
        expr(s"$cochranQSql > ${chi2Crit95Sql("k - 1")}"))
      // exposed DECIMAL → STRING (r10 decimal contract; Q consumed the
      // exact decimal already)
      .withColumn("sum_g2", col("sum_g2").cast("string"))
  }

  /** Q over (k, sum_g, sum_g2, sum_l, sum_l2); the numerator's
    * k·ΣG² − N² runs in DOUBLE off the exact DECIMAL/BIGINT sums (the
    * welchTTest overflow note); NULL when the denominator degenerates
    * (all items uniform) or k < 2. Shared with the oracle. */
  val cochranQSql: String =
    "CASE WHEN k > 1 AND k * sum_l - sum_l2 > 0 THEN " +
      "round((k - 1) * (CAST(k AS DOUBLE) * CAST(sum_g2 AS DOUBLE) - " +
      "CAST(sum_g AS DOUBLE) * sum_g) / " +
      "(CAST(k AS DOUBLE) * sum_l - sum_l2), 6) END"

  /** Dunn's post-hoc test — WHICH groups differ after [[kruskalWallis]]
    * rejects: pairwise z on the SAME combined-midrank kernel,
    * z_ij = (R̄_i − R̄_j)/√(V·(1/n_i + 1/n_j)) with the tie-corrected
    * V = (N(N+1) − ΣT/(N−1))/12; two-sided p via the shared
    * Abramowitz–Stegun tail ([[normalPSql]]) and Bonferroni-adjusted
    * significance across the m = k(k−1)/2 comparisons (the FDR-free
    * conservative default; feed `p` to [[bhFdr]] for the FDR variant).
    * Per-group rank sums stay exact longs; the pair table is k²-bounded
    * (a broadcast self-join of the k-row group table). */
  def dunnTest(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("string").as("grp"),
      col(valCol).cast("long").as("v"))
    val per = u.groupBy(col("v")).agg(count(lit(1)).cast("long").as("nv"))
    val ranks = Eval.rangedCumsum(per, Nil, "v", Seq("nv"))
      .select(col("v"), (col("cum_nv") * 2 - col("nv") + 1).as("r2"),
        (col("nv").cast("decimal(38,0)") * col("nv") * col("nv")
          - col("nv")).as("t3t_v"))
    val tie = broadcast(ranks.agg(
      sum(col("t3t_v")).cast("decimal(38,0)").as("t3t")))
    val g = u.join(ranks.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("r2")).cast("long").as("rg2"))
      .materialize // k rows; both sides of the pair join
    val tot = broadcast(g.agg(sum(col("ng")).cast("long").as("n"),
      count(lit(1)).cast("long").as("k")))
    g.as("a").join(broadcast(g.as("b")),
        col("a.grp") < col("b.grp"))
      .select(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"),
        col("a.ng").as("n_a"), col("b.ng").as("n_b"),
        col("a.rg2").as("rg2_a"), col("b.rg2").as("rg2_b"))
      .crossJoin(tot).crossJoin(tie)
      .withColumn("z", expr(dunnZSql))
      .withColumn("p", expr(s"round(${normalPSql(dunnZSql)}, 6)"))
      .withColumn("significant", expr(
        s"round(${normalPSql(dunnZSql)}, 6) < 0.05 / (k * (k - 1) / 2)"))
      .select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
        col("z"), col("p"), col("significant"))
  }

  /** Dunn z over (rg2_a, n_a, rg2_b, n_b, n, t3t) — mean ranks off the
    * doubled sums, tie-corrected variance; NULL when the variance
    * degenerates (all values tied). Shared with the oracle. */
  val dunnZSql: String = {
    val v = "((CAST(n AS DOUBLE) * (n + 1) - " +
      "CAST(t3t AS DOUBLE) / (n - 1)) / 12.0)"
    s"CASE WHEN n > 1 AND $v > 0 THEN " +
      "round((CAST(rg2_a AS DOUBLE) / (2 * n_a) - " +
      "CAST(rg2_b AS DOUBLE) / (2 * n_b)) / " +
      s"sqrt($v * (1.0 / n_a + 1.0 / n_b)), 6) END"
  }

  /** 2-D Mahalanobis outliers — the MULTIVARIATE screen [[ecodOutliers]]'
    * per-dimension tails can't do: a point can be unremarkable on each
    * axis yet far off the correlation ridge (high spend + low activity).
    * d² = (Δ'Σ⁻¹Δ) from the EXACT moment row (population covariance,
    * closed-form 2×2 inverse — one shared-SQL chain), per-row distances
    * rounded to 6 before ranking so the top-k order is engine-exact
    * (id tie-break). One aggregate + one broadcast-back narrow map +
    * one top-k window. NULL-guarded on a singular covariance. */
  def mahalanobis2d(
      df: DataFrame, idCol: String, xCol: String, yCol: String,
      topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val mm = broadcast(df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(x).cast("long").as("sx"), sum(y).cast("long").as("sy"),
      sum((x * x).cast("decimal(38,0)")).as("sxx"),
      sum((y * y).cast("decimal(38,0)")).as("syy"),
      sum((x * y).cast("decimal(38,0)")).as("sxy")))
    // top-K via orderBy().limit() => TakeOrderedAndProject (per-partition
    // heaps + driver merge of K), never a global row_number window that
    // would funnel every row through one partition at 100× scale; the
    // k-row survivor set then ranks through a window that only ever sees
    // topK rows. Tie-break (d2 desc, id) preserved end-to-end.
    val top = df.select(col(idCol).as("id"), x.as("x"), y.as("y"))
      .crossJoin(mm)
      .withColumn("d2", expr(mahalanobis2Sql))
      .filter(col("d2").isNotNull)
      .orderBy(col("d2").desc, col("id"))
      .limit(topK)
    top
      .withColumn("rn", row_number().over(
        Window.orderBy(col("d2").desc, col("id"))))
      .select(col("rn").cast("long").as("rnk"), col("id"),
        col("x"), col("y"), col("d2"))
  }

  /** d² over (x, y, n, sx, sy, sxx, syy, sxy): population covariance
    * entries assembled in the overflow-safe double form, closed-form
    * inverse; NULL when the covariance is singular. Shared with the
    * oracle. */
  val mahalanobis2Sql: String = {
    val vxx = "(CAST(sxx AS DOUBLE) / n - " +
      "(CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
    val vyy = "(CAST(syy AS DOUBLE) / n - " +
      "(CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))"
    val vxy = "(CAST(sxy AS DOUBLE) / n - " +
      "(CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))"
    val det = s"($vxx * $vyy - $vxy * $vxy)"
    val dx = "(x - CAST(sx AS DOUBLE) / n)"
    val dy = "(y - CAST(sy AS DOUBLE) / n)"
    s"CASE WHEN $det > 0 THEN " +
      s"round(($vyy * $dx * $dx - 2 * $vxy * $dx * $dy + " +
      s"$vxx * $dy * $dy) / $det, 6) END"
  }

  /** Partial correlation r(x,y | z) — "does the x↔y association
    * survive controlling for z?" (spend↔purchases both scale with raw
    * activity; the partial strips that): the three pairwise Pearsons
    * come off ONE exact moment row, and r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)) is one shared-SQL chain over the ROUNDED
    * pairwise r's (identical both engines). One aggregate, no join. */
  def partialCorr(
      df: DataFrame, xCol: String, yCol: String, zCol: String): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val z = col(zCol).cast("long")
    df.agg(
        count(lit(1)).cast("long").as("n"),
        sum(x).cast("long").as("sx"), sum(y).cast("long").as("sy"),
        sum(z).cast("long").as("sz"),
        sum((x * x).cast("decimal(38,0)")).as("sxx"),
        sum((y * y).cast("decimal(38,0)")).as("syy"),
        sum((z * z).cast("decimal(38,0)")).as("szz"),
        sum((x * y).cast("decimal(38,0)")).as("sxy"),
        sum((x * z).cast("decimal(38,0)")).as("sxz"),
        sum((y * z).cast("decimal(38,0)")).as("syz"))
      .withColumn("r_xy", expr(rPairSql("x", "y")))
      .withColumn("r_xz", expr(rPairSql("x", "z")))
      .withColumn("r_yz", expr(rPairSql("y", "z")))
      .withColumn("r_xy_z", expr(partialCorrSql))
      .select(col("n"), col("r_xy"), col("r_xz"), col("r_yz"),
        col("r_xy_z"))
  }

  /** Pearson r of pair (a,b) over the 10-moment row (names s$a, s$b,
    * s$a$a, s$b$b, s$a$b with xy/xz/yz cross naming). Shared with the
    * oracle. */
  def rPairSql(a: String, b: String): String = {
    val (sa, sb) = (s"s$a", s"s$b")
    val (saa, sbb) = (s"s$a$a", s"s$b$b")
    val sab = s"s$a$b"
    val va = s"(CAST(n AS DOUBLE) * CAST($saa AS DOUBLE) - " +
      s"CAST($sa AS DOUBLE) * $sa)"
    val vb = s"(CAST(n AS DOUBLE) * CAST($sbb AS DOUBLE) - " +
      s"CAST($sb AS DOUBLE) * $sb)"
    s"CASE WHEN $va > 0 AND $vb > 0 THEN " +
      s"round((CAST(n AS DOUBLE) * CAST($sab AS DOUBLE) - " +
      s"CAST($sa AS DOUBLE) * $sb) / sqrt($va * $vb), 6) END"
  }

  /** Partial correlation over the ROUNDED pairwise r columns; NULL when
    * either control correlation is ±1 (denominator 0). */
  val partialCorrSql: String =
    "CASE WHEN (1 - r_xz * r_xz) * (1 - r_yz * r_yz) > 0 THEN " +
      "round((r_xy - r_xz * r_yz) / " +
      "sqrt((1 - r_xz * r_xz) * (1 - r_yz * r_yz)), 6) END"

  /** Friedman test — the k-treatment RANK analogue of [[cochranQ]] for
    * CONTINUOUS paired outcomes: "does any of k models/variants score
    * differently on the same items?" without normality. Within each
    * complete item the k values map to doubled midranks (exact ints);
    * with A4 = Σr2², B4n = ΣR2_j², C4 = n·k·(k+1)², the tie-robust
    * statistic is χ² = (k−1)·(B4n − n·C4)/(A4 − C4) — one exact-integer
    * ratio, a single double division at the end (reduces to the classic
    * 12/nk(k+1) form when tie-free). Items missing a treatment are
    * EXCLUDED (pairing is the point); df = k−1 flags through
    * [[chi2Crit95Sql]]; NULL when every item is internally tied.
    * Plan: one item-window rank pass (k-row partitions) + two tiny
    * aggregates. */
  def friedman(
      df: DataFrame, itemCol: String, treatCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = df.select(col(itemCol).as("__i"), col(treatCol).as("__t"),
      col(valCol).cast("long").as("__v"))
    val k1 = broadcast(u.agg(
      count_distinct(col("__t")).cast("long").as("k")))
    val complete = u
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy(col("__i"))))
      .crossJoin(k1)
      .filter(col("__cnt") === col("k"))
    val wLess = Window.partitionBy(col("__i")).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val ranked = complete
      .withColumn("__nless",
        coalesce(count(lit(1)).over(wLess), lit(0L)))
      .withColumn("__neq",
        count(lit(1)).over(Window.partitionBy(col("__i"), col("__v"))))
      .withColumn("r2", (col("__nless") * 2 + col("__neq") + 1).cast("long"))
    val byTreat = ranked.groupBy(col("k"), col("__t"))
      .agg(sum(col("r2")).cast("long").as("r2j"))
      .groupBy(col("k"))
      .agg(sum((col("r2j") * col("r2j")).cast("decimal(38,0)")).as("b4n"))
    val totals = ranked.groupBy(col("__i")).agg(lit(1L).as("__one"))
      .agg(count(lit(1)).cast("long").as("n_items"))
    val a4 = ranked.agg(
      sum((col("r2") * col("r2")).cast("decimal(38,0)")).as("a4"))
    byTreat.crossJoin(broadcast(totals)).crossJoin(broadcast(a4))
      .withColumn("chi2", expr(friedmanSql))
      .withColumn("df", (col("k") - 1L).cast("long"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("k - 1")))
      .withColumn("significant",
        expr(s"$friedmanSql > ${chi2Crit95Sql("k - 1")}"))
      // exposed DECIMAL → STRING (r10 decimal contract; χ² consumed the
      // exact decimals already)
      .withColumn("b4n", col("b4n").cast("string"))
      .withColumn("a4", col("a4").cast("string"))
  }

  /** Tie-robust Friedman χ² over (k, b4n, n_items, a4); C4 = n·k·(k+1)²
    * in exact arithmetic, one double division. Shared with the
    * oracle. */
  val friedmanSql: String = {
    val c4 = "(CAST(n_items AS DOUBLE) * k * (k + 1) * (k + 1))"
    s"CASE WHEN k > 1 AND CAST(a4 AS DOUBLE) > $c4 THEN " +
      s"round((k - 1) * (CAST(b4n AS DOUBLE) - n_items * $c4) / " +
      s"(CAST(a4 AS DOUBLE) - $c4), 6) END"
  }

  /** Cramér's V — the EFFECT SIZE the chi-square test
    * ([[chi2Independence]]) doesn't give: V = √(χ²/(n·(min(r,c)−1))) in
    * [0,1], comparable across table shapes and sample sizes (χ² itself
    * grows with n even for a fixed weak association). Per-cell χ²
    * contributions are micro-quantized before the sum
    * (order-independent), marginals come from two tiny re-aggregations
    * of the contingency cells, and the final V is one shared-SQL row. */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("long").as("obs"))
      .materialize // marginals + dims + cells all read it
    val rows = cells.groupBy(col("x")).agg(sum(col("obs")).cast("long").as("rx"))
    val cols = cells.groupBy(col("y")).agg(sum(col("obs")).cast("long").as("cy"))
    val n = broadcast(cells.agg(sum(col("obs")).cast("long").as("n"),
      count_distinct(col("x")).cast("long").as("n_x"),
      count_distinct(col("y")).cast("long").as("n_y")))
    // the FULL r×c grid — absent combinations are real zero cells whose
    // (0−e)²/e = e contributions the observed-cells join would drop
    rows.crossJoin(cols)
      .join(cells, Seq("x", "y"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .crossJoin(n)
      .withColumn("contrib_micro", expr(chi2CellMicroSql))
      .groupBy(col("n"), col("n_x"), col("n_y"))
      .agg(sum(col("contrib_micro")).cast("long").as("chi2_micro"))
      .withColumn("cramers_v", expr(cramersVSql))
  }

  /** Per-cell χ² contribution in micro units over (obs, rx, cy, n). */
  val chi2CellMicroSql: String = {
    val e = "(CAST(rx AS DOUBLE) * cy / n)"
    s"CAST(ROUND((obs - $e) * (obs - $e) / $e * 1000000, 0) AS BIGINT)"
  }

  /** V over the (chi2_micro, n, n_x, n_y) row, shared with the oracle. */
  val cramersVSql: String =
    "round(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000) / " +
      "(CAST(n AS DOUBLE) * (least(n_x, n_y) - 1))), 6)"

  /** Kendall rank correlation (τ-b) — the nonparametric association
    * between two metrics that ignores their scales entirely: over all
    * unit pairs, concordant minus discordant as an EXACT integer,
    * normalized by the tie-corrected pair counts
    * √((n₀−n_x)(n₀−n_y)). Robust to any monotone transform of either
    * metric (where Pearson is not). Pairwise O(n²) over the UNIT table —
    * the Theil–Sen regime: run it on aggregated units (users, days),
    * not raw events; ties resolve exactly through the integer counts. */
  def kendallTau(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val u = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    // tag rows with ANY unique id: every aggregate below is symmetric in
    // (a, b), so which member of an unordered pair gets the smaller id
    // cannot change the result — the id only ensures each pair counts once.
    // The ids MUST be identical on both sides of the self-join, and
    // monotonically_increasing_id is nondeterministic under re-evaluation
    // (spill, task retry, differing upstream partitioning per side) —
    // materialize ONCE so both join branches read the same tagged rows
    val idd = u.withColumn("__i", monotonically_increasing_id())
      .materialize
    val pp = idd.as("a").join(idd.as("b"), col("a.__i") < col("b.__i"))
      .select(
        (signum(col("b.x") - col("a.x")) *
          signum(col("b.y") - col("a.y"))).cast("long").as("cd"),
        when(col("a.x") === col("b.x"), 1L).otherwise(0L).as("tx"),
        when(col("a.y") === col("b.y"), 1L).otherwise(0L).as("ty"))
    pp.agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(when(col("cd") === 1L, 1L).otherwise(0L)).cast("long").as("concordant"),
      sum(when(col("cd") === -1L, 1L).otherwise(0L)).cast("long").as("discordant"),
      sum(col("tx")).cast("long").as("ties_x"),
      sum(col("ty")).cast("long").as("ties_y"))
      .withColumn("tau_b", expr(tauBSql))
  }

  /** τ-b over the pair-count row, shared with the oracle. NULL when a
    * variable is constant (every pair tied — τ undefined). */
  val tauBSql: String =
    "CASE WHEN n_pairs - ties_x > 0 AND n_pairs - ties_y > 0 THEN " +
      "round(CAST(concordant - discordant AS DOUBLE) / " +
      "sqrt(CAST(n_pairs - ties_x AS DOUBLE) * (n_pairs - ties_y)), 6) END"

  /** Goodman–Kruskal γ over the [[kendallTau]] pair-count row — the
    * ordinal association that IGNORES ties entirely: (C−D)/(C+D).
    * Shared with the oracle. */
  val gammaSql: String =
    "CASE WHEN concordant + discordant > 0 THEN " +
      "round(CAST(concordant - discordant AS DOUBLE) / " +
      "(concordant + discordant), 6) END"

  /** Somers' D_yx — (C−D) over the pairs NOT tied on x (y as the
    * response): the asymmetric ordinal effect size. */
  val somersDyxSql: String =
    "CASE WHEN n_pairs - ties_x > 0 THEN " +
      "round(CAST(concordant - discordant AS DOUBLE) / " +
      "(n_pairs - ties_x), 6) END"

  /** Somers' D_xy — the x-as-response twin. */
  val somersDxySql: String =
    "CASE WHEN n_pairs - ties_y > 0 THEN " +
      "round(CAST(concordant - discordant AS DOUBLE) / " +
      "(n_pairs - ties_y), 6) END"

  /** Linearly-weighted Cohen's κ for ORDINAL raters — a one-category
    * disagreement should not cost what a four-category miss costs
    * (plain kappa charges both the same): with w_ij = |i−j|,
    * κ_w = 1 − n·Σw·O / Σw·rᵢ·cⱼ — EVERY term an exact integer off
    * the full contingency grid (the [[cramersV]] zero-cell
    * discipline), one double division at the end. Categories must be
    * integer-coded. */
  def weightedKappa(
      df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).cast("long").as("i"),
        col(bCol).cast("long").as("j"))
      .agg(count(lit(1)).cast("long").as("obs"))
      .materialize
    val rows = cells.groupBy(col("i"))
      .agg(sum(col("obs")).cast("long").as("ri"))
    val colsM = cells.groupBy(col("j"))
      .agg(sum(col("obs")).cast("long").as("cj"))
    val n1 = broadcast(cells.agg(sum(col("obs")).cast("long").as("n")))
    rows.crossJoin(colsM)
      .join(cells, Seq("i", "j"), "left")
      .withColumn("obs", coalesce(col("obs"), lit(0L)))
      .withColumn("w", abs(col("i") - col("j")))
      .agg(sum(col("w") * col("obs")).cast("long").as("swo"),
        sum((col("w") * col("ri")).cast("decimal(38,0)") * col("cj"))
          .cast("decimal(38,0)").as("swe"))
      .crossJoin(n1)
      .withColumn("kappa_w", expr(weightedKappaSql))
      // exposed DECIMAL → STRING (r10 decimal contract; κ_w consumed the
      // exact decimal already)
      .withColumn("swe", col("swe").cast("string"))
  }

  /** κ_w over (n, swo, swe); NULL when the raters never spread
    * (Σw·E = 0). Shared with the oracle. */
  val weightedKappaSql: String =
    "CASE WHEN CAST(swe AS DOUBLE) > 0 THEN " +
      "round(1 - CAST(n AS DOUBLE) * swo / CAST(swe AS DOUBLE), 6) END"

  /** Sample-ratio-mismatch check — the first gate on any experiment
    * readout: if assignment were a fair coin, the arm counts follow
    * Binomial(n, ½); the 1-df chi-square against the 50/50 expectation
    * flags broken bucketing (bots filtered asymmetrically, logging loss,
    * redirect bugs) BEFORE anyone reads the metric deltas. One count
    * aggregate; the statistic is shared SQL over the two-cell row;
    * flag threshold 3.841459 = χ²₁(0.95). */
  def srmCheck(df: DataFrame, treatCol: String): DataFrame =
    df.agg(
      sum(when(col(treatCol), 1L).otherwise(0L)).cast("long").as("n_t"),
      sum(when(!col(treatCol), 1L).otherwise(0L)).cast("long").as("n_c"))
      .withColumn("chi2", expr(srmChi2Sql))
      .withColumn("srm", expr(s"$srmChi2Sql > 3.841459"))

  /** 1-df chi-square vs the 50/50 split, shared with the oracle. */
  val srmChi2Sql: String =
    "round(CAST((n_t - n_c) AS DOUBLE) * (n_t - n_c) / (n_t + n_c), 6)"

  /** Wilson score interval per group — the binomial-rate CI that stays
    * inside [0,1] and behaves at small n / extreme p (unlike the normal
    * approximation): exact (successes, n) counts, closed-form z=1.959964
    * interval as one shared SQL expression pair. The per-group row is the
    * rate dashboard primitive. */
  def wilsonCi(df: DataFrame, groupCol: String, successCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(successCol), 1L).otherwise(0L)).cast("long").as("s"))
      .withColumn("p_hat", expr("round(CAST(s AS DOUBLE) / n, 6)"))
      .withColumn("ci_lo", expr(wilsonSql("-")))
      .withColumn("ci_hi", expr(wilsonSql("+")))

  /** Wilson bound over the (s, n) row; `sign` picks the endpoint. */
  def wilsonSql(sign: String): String = {
    val z = "1.959964"
    val p = "(CAST(s AS DOUBLE) / n)"
    s"""round((($p + $z*$z/(2*n)) $sign $z * sqrt($p*(1 - $p)/n +
       | $z*$z/(4.0*n*n))) / (1 + $z*$z/n), 6)""".stripMargin.replace("\n", "")
  }

  /** ECOD-style outlier scoring — the modern parameterless detector
    * (Li et al., TKDE 2022 shape): per dimension, a point's tail
    * probability is min(F(x), 1−F(x)+P(X=x)) from the EXACT empirical
    * CDF, and its outlier score sums −ln(tail) across dimensions — no
    * distance metric, no clustering, no training. Extremes in ANY
    * dimension surface; the score is micro-quantized per dimension
    * before summing (order-independent), and the top-K cut is a
    * TakeOrdered under (score desc, id).
    *
    * Scale shape: per dimension, ONE distinct-value prefix sum (the
    * shared ranged-cumsum kernel) + one value-keyed join back — the
    * vocabulary-join discipline, never a broadcast of the value table;
    * dimensions chain as independent joins. */
  def ecodOutliers(
      df: DataFrame, idCol: String, dimCols: Seq[String],
      topK: Int): DataFrame = {
    require(dimCols.nonEmpty, "dimCols must be non-empty")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val scored = dimCols.zipWithIndex.foldLeft(
      df.select(col(idCol) +: dimCols.map(c => col(c).cast("long").as(c)): _*)) {
      case (acc, (c, i)) =>
        val per = acc.groupBy(col(c).as("v"))
          .agg(count(lit(1)).cast("long").as("nv"))
        val cum = Eval.rangedCumsum(per, Nil, "v", Seq("nv"))
        val tot = broadcast(cum.agg(sum(col("nv")).cast("long").as("n")))
        val tail = cum.crossJoin(tot)
          .select(col("v").as(c),
            expr(ecodCellSql).as(s"__sc$i"))
        acc.join(tail, Seq(c))
    }
    val top = scored
      .withColumn("score_micro",
        dimCols.indices.map(i => col(s"__sc$i")).reduce(_ + _))
      .sort(col("score_micro").desc, col(idCol))
      .limit(topK)
    dimCols.zipWithIndex.foldLeft(top) { case (d, (c, i)) =>
      d.withColumnRenamed(s"__sc$i", s"sc_$c")
    }
  }

  /** −ln(two-sided tail) in micro units over the (cum_nv, nv, n) row. */
  val ecodCellSql: String =
    "CAST(ROUND(-ln(least(CAST(cum_nv AS DOUBLE) / n, " +
      "CAST(n - cum_nv + nv AS DOUBLE) / n)) * 1000000, 0) AS BIGINT)"

  /** Two-sided normal p-value from a z statistic as SHARED SQL text —
    * erfc(|z|/√2) via the Abramowitz–Stegun 7.1.26 rational approximation
    * (max abs error 1.5e-7). The approximation — not libm's erfc — is the
    * CONTRACT: both engines evaluate this exact expression tree, so the
    * p-values are bit-identical even where the approximation differs from
    * the true tail in the 7th decimal. `z` is spliced as a SQL
    * subexpression. */
  def normalPSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    s"(((((1.061405429 * $t - 1.453152027) * $t + 1.421413741) * $t" +
      s" - 0.284496736) * $t + 0.254829592) * $t * exp(-($x * $x)))"
  }

  /** Benjamini–Hochberg FDR control — the multiple-testing gate for any
    * metrics dashboard running one test per segment: rank the m p-values,
    * find the largest k with p_(k) ≤ k·q/m, reject tests 1..k. The
    * ranking windows run over the TEST table (m rows — segments, not
    * events), so this composes after any per-segment statistic the engine
    * computes. Integer-safe: the threshold compare is `p·m ≤ rank·q`
    * with q in ppm, so no division enters the decision. */
  def bhFdr(
      df: DataFrame, keyCols: Seq[String], pCol: String,
      qPpm: Long = 100000L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.orderBy(col(pCol) +: keyCols.map(col): _*)
    val wAll = Window.partitionBy()
    val ranked = df
      .withColumn("p_rank", row_number().over(wOrd).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wAll).cast("long"))
      .withColumn("__pass",
        col(pCol) * col("m_tests") * lit(1000000.0) <=
          col("p_rank").cast("double") * qPpm)
    val kStar = ranked
      .agg(coalesce(max(when(col("__pass"), col("p_rank"))), lit(0L))
        .as("k_star"))
    ranked.crossJoin(broadcast(kStar))
      .withColumn("rejected", col("p_rank") <= col("k_star"))
      .drop("__pass")
  }

  /** Benjamini–Yekutieli FDR control — [[bhFdr]] hardened for
    * ARBITRARY dependence between the tests (BH's guarantee needs
    * positive dependence; correlated per-segment tests on overlapping
    * traffic violate it): the BH threshold divides by the harmonic
    * number H_m, i.e. reject tests 1..k* with k* the largest k where
    * p_(k) ≤ k·q/(m·H_m). H_m is held as the DEFINED quantity
    * Σ round(10⁶/i) — both engines compute the identical integer, so
    * the decision inequality (evaluated over exact-double products
    * < 2⁵³) can never split. Same m-row test-table contract as bhFdr:
    * the global windows run over segments, not events. */
  def byFdr(
      df: DataFrame, keyCols: Seq[String], pCol: String,
      qPpm: Long = 100000L): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.orderBy(col(pCol) +: keyCols.map(col): _*)
    val wAll = Window.partitionBy()
    val ranked = df
      .withColumn("p_rank", row_number().over(wOrd).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wAll).cast("long"))
      .withColumn("hm_micro",
        sum(expr("CAST(round(1000000.0 / p_rank, 0) AS BIGINT)"))
          .over(wAll).cast("long"))
      .withColumn("__pass",
        // p ≤ k·q/(m·H_m) ⟺ p·m·(hm_micro/10⁶)·10⁶ ≤ k·qPpm
        col(pCol) * col("m_tests") * col("hm_micro") <=
          col("p_rank").cast("double") * qPpm)
    val kStar = ranked
      .agg(coalesce(max(when(col("__pass"), col("p_rank"))), lit(0L))
        .as("k_star"))
    ranked.crossJoin(broadcast(kStar))
      .withColumn("rejected", col("p_rank") <= col("k_star"))
      .drop("__pass")
  }

  /** KMV set algebra — the payoff of the order-statistics sketch
    * ([[kmvDistinct]]): two audiences' distinct-sketches combine WITHOUT
    * rescanning either side. The k smallest hashes of A∪B are a uniform
    * sample of the union, so the fraction of them present in both sides
    * estimates Jaccard, and |A∩B| ≈ Ĵ·|A∪B| — the theta-sketch
    * intersection recipe. Emits estimates AND exact values side by side
    * (the exact path is distinct-hash joins — still never row data).
    * Deterministic md5 kernel throughout; one row out. */
  def kmvSetOps(
      a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    def hashes(df: DataFrame, c: String) = df.select(expr(
      s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      .as("h")).distinct()
    val ha = hashes(a, aCol).materialize
    val hb = hashes(b, bCol).materialize
    val u = ha.unionByName(hb).distinct().materialize
    val uk = u.sort(col("h")).limit(k)
      .join(ha.withColumn("ina", lit(1L)), Seq("h"), "left")
      .join(hb.withColumn("inb", lit(1L)), Seq("h"), "left")
    val sk = uk.agg(
      count(lit(1)).cast("long").as("n_k"), max(col("h")).as("h_k"),
      sum(when(col("ina") === 1L && col("inb") === 1L, 1L).otherwise(0L))
        .cast("long").as("j_common"))
    val exact = broadcast(u.agg(count(lit(1)).cast("long").as("exact_union")))
      .crossJoin(ha.join(hb, Seq("h"), "left_semi")
        .agg(count(lit(1)).cast("long").as("exact_intersection")))
    broadcast(sk).crossJoin(exact)
      .withColumn("est_union",
        when(col("n_k") === lit(k.toLong),
          round((col("n_k") - 1).cast("double") * lit(math.pow(2, 60)) /
            col("h_k").cast("double"), 6))
          .otherwise(col("n_k").cast("double")))
      .withColumn("est_jaccard",
        round(col("j_common").cast("double") / col("n_k"), 6))
      .withColumn("est_intersection",
        round(col("est_jaccard") * col("est_union"), 6))
  }

  /** K-anonymity audit: group rows by their quasi-identifier combination
    * and flag every group smaller than k — the re-identification risk
    * check run before releasing a training extract (a QI combination
    * shared by < k people singles someone out; `risk` = 1/n is the
    * standard prosecutor-model re-identification probability). One
    * map-side-combined aggregate over the QI key; no row data leaves the
    * executors. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(k >= 2, s"k must be >= 2: $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("anonymous", col("n") >= k)
      .withColumn("risk", round(lit(1.0) / col("n").cast("double"), 6))
  }

  /** L-diversity audit — [[kAnonymity]]'s stronger sibling: a QI group
    * can be large yet still leak if everyone in it shares the same
    * SENSITIVE value (homogeneity attack). Reports, per QI cell, the
    * population, the distinct sensitive-value count, the l-diversity flag
    * (distinct ≥ l), and the sensitive-value entropy in exact micro-nats
    * (per-cell contributions −p·ln p are micro-quantized BEFORE summing,
    * so the aggregate is an order-independent integer sum). Two chained
    * map-side-combined aggregates + one group-keyed join; nothing
    * row-level leaves the executors. */
  def lDiversity(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(l >= 2, s"l must be >= 2: $l")
    val qi = qiCols.map(col)
    val cells = df.groupBy(qi :+ col(sensitiveCol).as("__sv"): _*)
      .agg(count(lit(1)).cast("long").as("c"))
    val tot = cells.groupBy(qi: _*)
      .agg(sum(col("c")).cast("long").as("n"))
    cells.join(tot, qiCols)
      .withColumn("__ent_c", expr(entropyCellSql))
      .groupBy(qi :+ col("n"): _*)
      .agg(count(lit(1)).cast("long").as("distinct_sensitive"),
        sum(col("__ent_c")).cast("long").as("entropy_micro"))
      .withColumn("l_diverse", col("distinct_sensitive") >= l)
  }

  /** Per-cell entropy contribution over (c, n), shared with the oracle. */
  val entropyCellSql: String =
    "CAST(ROUND(-((CAST(c AS DOUBLE)/n) * ln(CAST(c AS DOUBLE)/n)) " +
      "* 1000000, 0) AS BIGINT)"

  /** T-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymity]] and [[lDiversity]]: a QI group can be large AND
    * diverse yet still leak if its sensitive-value DISTRIBUTION skews
    * from the table's (a salary band where "diverse" means
    * high/higher/highest). Per QI cell, the ordered-attribute earth
    * mover's distance to the global distribution:
    * EMD = Σ_v |F_cell(v) − F_global(v)| / (m−1) over the m ordered
    * sensitive buckets; flag cells with EMD > t.
    *
    * EXACT end to end: the per-bucket term is the integer
    * |cumC_cell·N − cumC_global·n_cell| (cross-multiplied cumulative
    * counts), summed as longs; ONE double division by n_cell·N·(m−1)
    * at the end. The value grid is (cells × m) rows with the m-row
    * distinct-value table broadcast — group counts shuffle once. */
  def tCloseness(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(qiCols.nonEmpty, "qiCols must be non-empty")
    require(t > 0 && t < 1, s"t must be in (0,1): $t")
    import org.apache.spark.sql.expressions.Window
    val qi = qiCols.map(col)
    val sv = col(sensitiveCol).cast("long")
    val cells = df.groupBy(qi :+ sv.as("v"): _*)
      .agg(count(lit(1)).cast("long").as("c"))
    val groups = cells.groupBy(qi: _*)
      .agg(sum(col("c")).cast("long").as("n_cell"))
    val wOrd = Window.orderBy(col("v"))
    val glob = df.groupBy(sv.as("v"))
      .agg(count(lit(1)).cast("long").as("cg"))
      .withColumn("cum_g", sum(col("cg")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .withColumn("n_tot", sum(col("cg")).over(
        Window.partitionBy()).cast("long"))
      .withColumn("m_vals", count(lit(1)).over(
        Window.partitionBy()).cast("long"))
      .select(col("v"), col("cum_g"), col("n_tot"), col("m_vals"))
    val wCell = Window.partitionBy(qi: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.crossJoin(broadcast(glob))
      .join(cells, qiCols :+ "v", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cum_c", sum(col("c")).over(wCell).cast("long"))
      .withColumn("num",
        abs(col("cum_c") * col("n_tot") - col("cum_g") * col("n_cell")))
      .groupBy(qi :+ col("n_cell") :+ col("n_tot") :+ col("m_vals"): _*)
      .agg(sum(col("num")).cast("long").as("s_num"))
      .withColumn("emd", expr(tCloseEmdSql))
      .withColumn("t_close", expr(s"coalesce($tCloseEmdSql <= $t, true)"))
      .drop("n_tot", "m_vals")
  }

  /** Ordered EMD over (s_num, n_cell, n_tot, m_vals); NULL (flagged
    * close) for a single-bucket table. Shared with the oracle. */
  val tCloseEmdSql: String =
    "CASE WHEN m_vals > 1 THEN " +
      "round(CAST(s_num AS DOUBLE) / " +
      "(CAST(n_cell AS DOUBLE) * n_tot * (m_vals - 1)), 6) END"

  /** Join-size estimation from count-min sketches — the planner-style
    * cardinality probe that never executes the join: |A ⋈ B| on a key
    * equals the inner product of the two frequency vectors, and the CM
    * inner product Σ_w cmA[w]·cmB[w] (min over the d hash rows)
    * overestimates it one-sidedly. Emits the exact size (computed from
    * per-key counts — still never materializing join output rows), the
    * CM estimate, and the one-sided-error flag checked in the output.
    * Same deterministic md5 hash family as
    * [[TextAnalysis.countMinEstimate]], so the SQL oracle rebuilds both
    * sketches identically. Sketch cells are d·w per side regardless of
    * table size; the exact side shuffles only per-key counts. */
  def cmJoinSizeEstimate(
      a: DataFrame, aKey: String,
      b: DataFrame, bKey: String,
      d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2: $d, $w")
    def cells(df: DataFrame, key: String, cntName: String) = df
      .select(col(key).cast("string").as("key"))
      .withColumn("r", explode(expr(s"sequence(0, ${d - 1})")))
      .select(col("r"),
        pmod(graft.functions.TextFunctions.tokenHash60(
          concat(lit("cm"), col("r"), lit(":"), col("key"))), lit(w.toLong))
          .as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).cast("long").as(cntName))
    val est = cells(a, aKey, "ca").join(cells(b, bKey, "cb"), Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("ca") * col("cb")).cast("long").as("ip"))
      .agg(min(col("ip")).as("cm_est"))
    val exact = a.select(col(aKey).cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).cast("long").as("na"))
      .join(b.select(col(bKey).cast("string").as("key"))
        .groupBy(col("key")).agg(count(lit(1)).cast("long").as("nb")), Seq("key"))
      .agg(sum(col("na") * col("nb")).cast("long").as("exact_size"))
    broadcast(est).crossJoin(exact)
      .select(col("exact_size"), col("cm_est"),
        (col("cm_est") >= col("exact_size")).as("is_over"))
  }

  /** K-minimum-values distinct sketch: hash every value with the shared
    * 60-bit md5 kernel, keep the k SMALLEST distinct hashes, and estimate
    * the cardinality as (k−1)·2^60 / h_k — the order-statistics dual of
    * HyperLogLog (q_approx_distinct) with two properties HLL lacks: the
    * estimator is unbiased with relative error ~1/√(k−2) at ANY scale, and
    * two KMV sketches intersect/union by merging their hash sets (set
    * arithmetic on sketches — the basis of theta-sketch distinct joins).
    * Deterministic: md5 has no seed, so the estimate is a pure function of
    * the value set and the SQL oracle replays it exactly.
    *
    * Scale shape: the distinct-hash reduction is the only shuffle (map-side
    * combined); the k-smallest step is `sort.limit(k)` = Spark's
    * TakeOrderedAndProject — per-partition top-k heaps, k rows to one
    * reducer, never a global sort. Output is ONE row. If the true
    * cardinality is ≤ k the sketch saw every hash and the exact count is
    * returned (est = n_seen, flagged `saturated = false`). */
  def kmvDistinct(df: DataFrame, colName: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2: $k")
    val h = df.select(expr(
      s"CAST(conv(substring(md5(CAST($colName AS STRING)), 1, 15), 16, 10) AS BIGINT)")
      .as("h")).distinct()
    val kmv = h.sort(col("h")).limit(k)
      .agg(count(lit(1)).cast("long").as("n_k"), max(col("h")).as("h_k"))
    val exact = h.agg(count(lit(1)).cast("long").as("exact_distinct"))
    broadcast(kmv).crossJoin(exact)
      .withColumn("saturated", col("n_k") === lit(k.toLong))
      .withColumn("est_distinct",
        when(col("saturated"),
          round((col("n_k") - 1).cast("double") * lit(math.pow(2, 60)) /
            col("h_k").cast("double"), 6))
          .otherwise(col("n_k").cast("double")))
      .withColumn("rel_err",
        round(abs(col("est_distinct") / col("exact_distinct").cast("double") - 1), 6))
  }

  /** Paired sign test — the assumption-free "did the metric move?" for
    * paired observations (same unit measured twice): counts units where
    * x > y vs x < y (ties drop, the canonical treatment) and tests the
    * win count against Binomial(m, ½) via the normal approximation
    * z = (2·n_pos − m)/√m. The weakest-assumption member of the paired
    * family next to [[mannWhitney]] (independent) and the signed-rank
    * test (paired, magnitude-aware). One conditional aggregate — exact
    * integers, one double chain shared with the oracle. */
  def signTest(df: DataFrame, xCol: String, yCol: String): DataFrame =
    df.select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .agg(
        sum(when(col("x") > col("y"), 1L).otherwise(0L)).cast("long")
          .as("n_pos"),
        sum(when(col("x") < col("y"), 1L).otherwise(0L)).cast("long")
          .as("n_neg"),
        sum(when(col("x") === col("y"), 1L).otherwise(0L)).cast("long")
          .as("n_tie"))
      .withColumn("m", (col("n_pos") + col("n_neg")).cast("long"))
      .withColumn("z", expr(signZSql))
      .withColumn("significant", expr(s"abs($signZSql) > 1.959964"))

  /** z over (n_pos, m); NULL when every pair tied. Shared with the
    * oracle. */
  val signZSql: String =
    "CASE WHEN m > 0 THEN round((2.0 * n_pos - m) / sqrt(CAST(m AS " +
      "DOUBLE)), 6) END"

  /** G-test of independence — the likelihood-ratio twin of
    * [[chi2Independence]], preferred when any cell is small relative to
    * the table (χ²'s quadratic form over-rejects there):
    * G = 2·Σ O·ln(O·N / (N_r·N_c)), df = (r−1)(c−1). Zero cells
    * contribute 0 and are simply never materialized. Per-cell ln terms
    * quantize to nano units so the cross-stratum sum is an exact BIGINT
    * (order-independent across engines; ln matches libm-for-libm —
    * FIXTURES.md); the term magnitude bounds Σ|term| < N·ln(N)·10⁹,
    * inside long range to ~10⁸ rows — beyond that, re-scale to micro.
    * Same plan shape as chi2Independence: cells materialize once,
    * marginals broadcast back. */
  def gTest(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).cast("long").as("obs"))
      .materialize
    val rows = broadcast(cells.groupBy(col(rowCol))
      .agg(sum(col("obs")).cast("long").as("nr")))
    val colsM = broadcast(cells.groupBy(col(colCol))
      .agg(sum(col("obs")).cast("long").as("nc")))
    val tot = broadcast(cells.agg(sum(col("obs")).cast("long").as("n")))
    cells.join(rows, rowCol).join(colsM, colCol).crossJoin(tot)
      .withColumn("term_micro", expr(gCellMicroSql))
      .agg(
        count_distinct(col(rowCol)).cast("long").as("r"),
        count_distinct(col(colCol)).cast("long").as("c"),
        max(col("n")).as("n"),
        sum(col("term_micro")).cast("long").as("g_micro"))
      .withColumn("g", expr(gSql))
      .withColumn("df", expr("CAST((r - 1) * (c - 1) AS BIGINT)"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("(r - 1) * (c - 1)")))
      .withColumn("significant",
        expr(s"$gSql > ${chi2Crit95Sql("(r - 1) * (c - 1)")}"))
  }

  /** Per-cell G contribution O·ln(O·N/(N_r·N_c)) in MICRO units over
    * (obs, nr, nc, n) — micro keeps Σ|term| ≤ N·ln(N)·10⁶ inside long
    * to ~4·10¹¹ rows (nano capped out near 10⁸). Shared with the
    * oracle. */
  val gCellMicroSql: String =
    "CAST(ROUND(obs * LN(CAST(obs AS DOUBLE) * n / " +
      "(CAST(nr AS DOUBLE) * nc)) * 1000000, 0) AS BIGINT)"

  /** G = 2·Σterms over the micro sum. The CAST keeps the chain DOUBLE —
    * a bare `2.0 * g_micro` parses as DECIMAL in both engines and would
    * expose DecimalType (the tripwire) and decimal rounding. Shared
    * with the oracle. */
  val gSql: String =
    "round(2.0 * CAST(g_micro AS DOUBLE) / 1000000, 6)"

  /** 2×2 risk readout — relative risk AND odds ratio with Wald 95% CIs,
    * the effect-size table every incident/exposure postmortem wants next
    * to the chi-square yes/no: cells a (exposed, outcome), b (exposed,
    * no outcome), c (unexposed, outcome), d (unexposed, no outcome);
    * RR = (a/(a+b))/(c/(c+d)), OR = ad/bc, CIs via
    * exp(ln(est) ± 1.96·SE) with the standard log-scale SEs. One
    * conditional aggregate; exact cells, shared double chains (ln/exp
    * are the portable libm pair); NULL estimates when a needed cell is
    * empty (no continuity fudge — the caller should see the degeneracy,
    * not a silently shifted estimate). */
  def riskRatio(
      df: DataFrame, exposedCol: String, outcomeCol: String): DataFrame =
    df.select(when(col(exposedCol), 1L).otherwise(0L).as("e"),
        when(col(outcomeCol), 1L).otherwise(0L).as("o"))
      .agg(
        sum(when(col("e") === 1L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("a"),
        sum(when(col("e") === 1L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("b"),
        sum(when(col("e") === 0L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("c"),
        sum(when(col("e") === 0L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("d"))
      .withColumn("risk_ratio", expr(rrSql))
      .withColumn("rr_lo", expr(rrCiSql("-")))
      .withColumn("rr_hi", expr(rrCiSql("+")))
      .withColumn("odds_ratio", expr(orSql))
      .withColumn("or_lo", expr(orCiSql("-")))
      .withColumn("or_hi", expr(orCiSql("+")))

  // nullif divisors for the same subexpression-elimination hazard the
  // riskDiff note documents (guards alone do not protect hoisted terms)
  private val rrEstSql: String =
    "((CAST(a AS DOUBLE) / nullif(a + b, 0)) / " +
      "(CAST(c AS DOUBLE) / nullif(c + d, 0)))"
  private val rrSeSql: String =
    "sqrt(1.0/nullif(a, 0) - 1.0/nullif(a + b, 0) + " +
      "1.0/nullif(c, 0) - 1.0/nullif(c + d, 0))"
  /** RR over the 2×2 row; NULL unless both risk denominators and both
    * numerators are positive. Shared with the oracle. */
  val rrSql: String =
    s"CASE WHEN a > 0 AND c > 0 THEN round($rrEstSql, 6) END"
  def rrCiSql(sign: String): String =
    s"CASE WHEN a > 0 AND c > 0 THEN round(exp(ln($rrEstSql) $sign " +
      s"1.959964 * $rrSeSql), 6) END"
  private val orEstSql: String =
    "(CAST(a AS DOUBLE) * d / nullif(CAST(b AS DOUBLE) * c, 0))"
  private val orSeSql: String =
    "sqrt(1.0/nullif(a, 0) + 1.0/nullif(b, 0) + 1.0/nullif(c, 0) + " +
      "1.0/nullif(d, 0))"
  /** OR over the 2×2 row; NULL when any cell is empty. Shared with the
    * oracle. */
  val orSql: String =
    "CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN " +
      s"round($orEstSql, 6) END"
  def orCiSql(sign: String): String =
    "CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN " +
      s"round(exp(ln($orEstSql) $sign 1.959964 * $orSeSql), 6) END"

  /** Risk difference with Wald CI — the ABSOLUTE-scale member of the
    * 2×2 readout ([[riskRatio]] gives the multiplicative RR/OR; policy
    * decisions need percentage points): RD = a/(a+b) − c/(c+d),
    * CI = RD ± 1.96·√(p₁(1−p₁)/n₁ + p₂(1−p₂)/n₂), z = RD/SE, and the
    * number-needed-to-treat 1/|RD|. Same single conditional aggregate
    * as riskRatio; NULL estimates when either margin is empty. */
  def riskDiff(
      df: DataFrame, exposedCol: String, outcomeCol: String): DataFrame =
    df.select(when(col(exposedCol), 1L).otherwise(0L).as("e"),
        when(col(outcomeCol), 1L).otherwise(0L).as("o"))
      .agg(
        sum(when(col("e") === 1L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("a"),
        sum(when(col("e") === 1L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("b"),
        sum(when(col("e") === 0L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("c"),
        sum(when(col("e") === 0L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("d"))
      .withColumn("risk_diff", expr(rdSql))
      .withColumn("rd_lo", expr(rdCiSql("-")))
      .withColumn("rd_hi", expr(rdCiSql("+")))
      .withColumn("z", expr(rdZSql))
      .withColumn("nnt", expr(nntSql))

  // divisors wrapped in nullif: Spark's subexpression elimination HOISTS
  // a division shared by several output columns out of its CASE guard,
  // so a zero margin throws DIVIDE_BY_ZERO under ANSI even though every
  // consumer guards it (caught by the 20x smoke at sf0.1 where every
  // user clears the clicker bar). NULL divisors propagate NULL instead,
  // and the outer guards still decide the output exactly as before.
  private val rdEstSql: String =
    "(CAST(a AS DOUBLE) / nullif(a + b, 0) - " +
      "CAST(c AS DOUBLE) / nullif(c + d, 0))"
  private val rdSeSql: String =
    "sqrt((CAST(a AS DOUBLE) / nullif(a + b, 0)) * " +
      "(1.0 - CAST(a AS DOUBLE) / nullif(a + b, 0)) / nullif(a + b, 0)" +
      " + (CAST(c AS DOUBLE) / nullif(c + d, 0)) * " +
      "(1.0 - CAST(c AS DOUBLE) / nullif(c + d, 0)) / nullif(c + d, 0))"
  private val rdGuardSql: String = "(a + b > 0 AND c + d > 0)"
  /** RD over the 2×2 row; NULL when either margin is empty. Shared
    * with the oracle. */
  val rdSql: String =
    s"CASE WHEN $rdGuardSql THEN round($rdEstSql, 6) END"
  def rdCiSql(sign: String): String =
    s"CASE WHEN $rdGuardSql THEN round($rdEstSql $sign 1.959964 * " +
      s"$rdSeSql, 6) END"
  /** z = RD/SE; NULL when the variance degenerates (both margins
    * pure). Shared with the oracle. */
  val rdZSql: String =
    s"CASE WHEN $rdGuardSql AND $rdSeSql > 0 THEN " +
      s"round($rdEstSql / $rdSeSql, 6) END"
  /** Number needed to treat 1/|RD|; NULL at RD = 0. */
  val nntSql: String =
    s"CASE WHEN $rdGuardSql AND abs($rdEstSql) > 0 THEN " +
      s"round(1.0 / abs($rdEstSql), 6) END"

  /** Cochran–Mantel–Haenszel — the STRATIFIED 2×2 test: "does exposure
    * associate with outcome AFTER controlling for the confounder?" Per
    * stratum k: cells (a,b,c,d,n); the CMH statistic
    * (Σa − ΣE_k)²/ΣV_k with E = (a+b)(a+c)/n and
    * V = (a+b)(c+d)(a+c)(b+d)/(n²(n−1)), plus the Mantel–Haenszel
    * pooled OR = Σ(a·d/n)/Σ(b·c/n) next to the CRUDE OR of the collapsed
    * table — `simpson_flip` flags when the two sit on opposite sides of
    * 1, the Simpson's-paradox alarm this operator exists to ring.
    * Per-stratum double terms quantize to nano units so the
    * cross-stratum sums are exact BIGINTs (order-independent; bounded to
    * ~10⁸ rows/stratum). Single-row strata drop (V's n−1 denominator),
    * identically in the oracle. One aggregate to the stratum table, one
    * to the statistic — stratum count bounds nothing. */
  def cmh(
      df: DataFrame, stratumCol: String, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val u = df.select(col(stratumCol).cast("string").as("s"),
      when(col(exposedCol), 1L).otherwise(0L).as("e"),
      when(col(outcomeCol), 1L).otherwise(0L).as("o"))
    u.groupBy(col("s"))
      .agg(
        sum(when(col("e") === 1L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("a"),
        sum(when(col("e") === 1L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("b"),
        sum(when(col("e") === 0L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("c"),
        sum(when(col("e") === 0L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("d"),
        count(lit(1)).cast("long").as("nk"))
      .filter(col("nk") > 1L)
      .withColumn("e_nano", expr(cmhENanoSql))
      .withColumn("v_nano", expr(cmhVNanoSql))
      .withColumn("adn_nano", expr(cmhAdNanoSql))
      .withColumn("bcn_nano", expr(cmhBcNanoSql))
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("a")).cast("long").as("sa"),
        sum(col("b")).cast("long").as("sb"),
        sum(col("c")).cast("long").as("sc"),
        sum(col("d")).cast("long").as("sd"),
        sum(col("e_nano")).cast("long").as("se_nano"),
        sum(col("v_nano")).cast("long").as("sv_nano"),
        sum(col("adn_nano")).cast("long").as("sadn_nano"),
        sum(col("bcn_nano")).cast("long").as("sbcn_nano"))
      .withColumn("chi2_mh", expr(cmhChi2Sql))
      .withColumn("significant", expr(s"$cmhChi2Sql > 3.841459"))
      .withColumn("or_mh", expr(cmhOrSql))
      .withColumn("or_crude", expr(cmhCrudeOrSql))
      .withColumn("simpson_flip", expr(cmhFlipSql))
  }

  /** Per-stratum expectation (a+b)(a+c)/n in nano units. Shared with
    * the oracle. */
  val cmhENanoSql: String =
    "CAST(ROUND(CAST(a + b AS DOUBLE) * (a + c) / nk * 1000000000, 0) " +
      "AS BIGINT)"
  /** Per-stratum hypergeometric variance in nano units. */
  val cmhVNanoSql: String =
    "CAST(ROUND(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d) / " +
      "(CAST(nk AS DOUBLE) * nk * (nk - 1)) * 1000000000, 0) AS BIGINT)"
  val cmhAdNanoSql: String =
    "CAST(ROUND(CAST(a AS DOUBLE) * d / nk * 1000000000, 0) AS BIGINT)"
  val cmhBcNanoSql: String =
    "CAST(ROUND(CAST(b AS DOUBLE) * c / nk * 1000000000, 0) AS BIGINT)"
  /** CMH χ² over the nano sums; NULL when the variance degenerates.
    * Shared with the oracle. */
  val cmhChi2Sql: String =
    "CASE WHEN sv_nano > 0 THEN round((CAST(sa AS DOUBLE) - " +
      "CAST(se_nano AS DOUBLE) / 1000000000) * (CAST(sa AS DOUBLE) - " +
      "CAST(se_nano AS DOUBLE) / 1000000000) / " +
      "(CAST(sv_nano AS DOUBLE) / 1000000000), 6) END"
  /** MH pooled OR (nano scales cancel); NULL when no discordant mass. */
  val cmhOrSql: String =
    "CASE WHEN sbcn_nano > 0 THEN round(CAST(sadn_nano AS DOUBLE) / " +
      "CAST(sbcn_nano AS DOUBLE), 6) END"
  /** Crude OR of the collapsed table. */
  val cmhCrudeOrSql: String =
    "CASE WHEN sb > 0 AND sc > 0 THEN round(CAST(sa AS DOUBLE) * sd / " +
      "(CAST(sb AS DOUBLE) * sc), 6) END"
  /** TRUE when pooled and crude ORs sit on opposite sides of 1 — the
    * Simpson's-paradox alarm; FALSE when both exist and agree, NULL
    * when either is undefined. */
  val cmhFlipSql: String =
    s"CASE WHEN $cmhOrSql IS NOT NULL AND $cmhCrudeOrSql IS NOT NULL " +
      s"THEN ($cmhOrSql - 1.0) * ($cmhCrudeOrSql - 1.0) < 0 END"

  /** Woolf test for odds-ratio HOMOGENEITY across strata — the
    * question [[cmh]] assumes away: is there ONE common OR to pool, or
    * does the effect differ by stratum (interaction)? χ² =
    * Σ w_k·(lnOR_k − lnOR_pooled)² with inverse-variance weights
    * w = 1/(1/a+1/b+1/c+1/d), df = k−1. Strata with ANY empty cell
    * carry an undefined lnOR — they DROP and are reported in
    * `k_dropped` (no 0.5 continuity fudge; the caller should see it).
    * Per-stratum w, w·lnOR, and w·lnOR² micro-quantize so the
    * cross-stratum sums are exact BIGINTs, and the χ² assembles as
    * Σw·lnOR² − (Σw·lnOR)²/Σw — one double chain off three exact
    * sums. */
  def woolf(
      df: DataFrame, stratumCol: String, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val u = df.select(col(stratumCol).cast("string").as("s"),
      when(col(exposedCol), 1L).otherwise(0L).as("e"),
      when(col(outcomeCol), 1L).otherwise(0L).as("o"))
    u.groupBy(col("s"))
      .agg(
        sum(when(col("e") === 1L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("a"),
        sum(when(col("e") === 1L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("b"),
        sum(when(col("e") === 0L && col("o") === 1L, 1L).otherwise(0L))
          .cast("long").as("c"),
        sum(when(col("e") === 0L && col("o") === 0L, 1L).otherwise(0L))
          .cast("long").as("d"))
      .withColumn("ok",
        col("a") > 0L && col("b") > 0L && col("c") > 0L && col("d") > 0L)
      .withColumn("w_micro", expr(woolfWMicroSql))
      .withColumn("wl_micro", expr(woolfWlMicroSql))
      .withColumn("wl2_micro", expr(woolfWl2MicroSql))
      .agg(
        sum(when(col("ok"), 1L).otherwise(0L)).cast("long").as("k_used"),
        sum(when(!col("ok"), 1L).otherwise(0L)).cast("long")
          .as("k_dropped"),
        sum(col("w_micro")).cast("long").as("sw_micro"),
        sum(col("wl_micro")).cast("long").as("swl_micro"),
        sum(col("wl2_micro")).cast("long").as("swl2_micro"))
      .withColumn("chi2", expr(woolfChi2Sql))
      .withColumn("df",
        greatest(col("k_used") - 1L, lit(0L)).cast("long"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("k_used - 1")))
      .withColumn("significant",
        expr(s"$woolfChi2Sql > ${chi2Crit95Sql("k_used - 1")}"))
  }

  // nullif divisors: the ok guard does not protect terms hoisted by
  // subexpression elimination (the riskDiff note)
  private val woolfWSql: String =
    "(1.0 / (1.0/nullif(a, 0) + 1.0/nullif(b, 0) + 1.0/nullif(c, 0) + " +
      "1.0/nullif(d, 0)))"
  private val woolfLnorSql: String =
    "LN(CAST(a AS DOUBLE) * d / nullif(CAST(b AS DOUBLE) * c, 0))"
  /** Per-stratum inverse-variance weight in micro units; 0 for dropped
    * strata — the guard lives inside so no 1/0 evaluates. Shared with
    * the oracle. */
  val woolfWMicroSql: String =
    "CASE WHEN ok THEN " +
      s"CAST(ROUND($woolfWSql * 1000000, 0) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END"
  val woolfWlMicroSql: String =
    "CASE WHEN ok THEN " +
      s"CAST(ROUND($woolfWSql * $woolfLnorSql * 1000000, 0) AS BIGINT) " +
      "ELSE CAST(0 AS BIGINT) END"
  val woolfWl2MicroSql: String =
    "CASE WHEN ok THEN " +
      s"CAST(ROUND($woolfWSql * $woolfLnorSql * $woolfLnorSql * " +
      "1000000, 0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
  /** χ² = Σwl² − (Σwl)²/Σw off the exact micro sums; NULL below two
    * usable strata or zero total weight. Shared with the oracle. */
  val woolfChi2Sql: String =
    "CASE WHEN k_used > 1 AND sw_micro > 0 THEN " +
      "round(CAST(swl2_micro AS DOUBLE) / 1000000 - " +
      "(CAST(swl_micro AS DOUBLE) / 1000000) * " +
      "(CAST(swl_micro AS DOUBLE) / 1000000) / " +
      "(CAST(sw_micro AS DOUBLE) / 1000000), 6) END"

  /** Wilcoxon signed-rank — the magnitude-aware paired test between
    * [[signTest]] (signs only) and the paired t (normality needed):
    * drop zero differences, rank |d| with DOUBLED midranks off the
    * prefix-sum kernel (the [[mannWhitney]] machinery — no O(n log n)
    * global sort), and test 2W⁺ = Σ r2 over positive d against its null
    * mean m(m+1)/2 with the tie-corrected variance
    * Var(2W⁺) = m(m+1)(2m+1)/6 − Σ(t³−t)/12. The tie cube runs in
    * DECIMAL (exposed as STRING per the r10 contract). One value-level
    * aggregate + one ranged cumsum + one final aggregate. */
  def wilcoxonSignedRank(
      df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val u0 = df.select(
        (col(xCol).cast("long") - col(yCol).cast("long")).as("d"))
      .filter(col("d") =!= 0L)
      .select(abs(col("d")).as("ad"), (col("d") > 0L).as("pos"))
    val per = u0.groupBy(col("ad")).agg(count(lit(1)).cast("long").as("nv"))
    val ranks = Eval.rangedCumsum(per, Nil, "ad", Seq("nv"))
      .select(col("ad"), (col("cum_nv") * 2 - col("nv") + 1).as("r2"),
        (col("nv").cast("decimal(38,0)") * col("nv") * col("nv")
          - col("nv")).as("t3t_v"))
    val tie = broadcast(ranks.agg(
      sum(col("t3t_v")).cast("decimal(38,0)").as("t3t")))
    u0.join(ranks.select(col("ad"), col("r2")), Seq("ad"))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(when(col("pos"), col("r2")).otherwise(0L)).cast("long")
          .as("wpos2"))
      .crossJoin(tie)
      .withColumn("z", expr(wsrZSql))
      .withColumn("significant", expr(s"abs($wsrZSql) > 1.959964"))
      .withColumn("t3t", col("t3t").cast("string"))
  }

  /** Tie-corrected variance of 2W⁺ over (m, t3t). */
  private val wsrVar4Sql: String =
    "(CAST(m AS DOUBLE) * (m + 1) * (2 * m + 1) / 6 - " +
      "CAST(t3t AS DOUBLE) / 12)"
  /** z for 2W⁺ over (m, wpos2, t3t); NULL when no non-zero pairs or the
    * variance degenerates (all |d| tied to one value with m = 1).
    * Shared with the oracle. */
  val wsrZSql: String =
    s"CASE WHEN m > 0 AND $wsrVar4Sql > 0 THEN " +
      "round((CAST(wpos2 AS DOUBLE) - CAST(m AS DOUBLE) * (m + 1) / 2) " +
      s"/ sqrt($wsrVar4Sql), 6) END"

  /** Page's trend test — [[friedman]]'s omnibus "any difference?"
    * sharpened to an ORDERED alternative ("treatment effect increases
    * along this order"): L = Σ_j c_j·R_j with c_j = 1..k the position of
    * treatment j in lexicographic label order and R_j the within-item
    * rank sums. Runs on the friedman midrank kernel (complete items
    * only, DOUBLED ranks → l2 = 2L stays an exact BIGINT) and tests
    * against the no-tie null E[2L] = n·k(k+1)²/2,
    * Var(2L) = n·k²(k+1)(k²−1)/36 — ties shrink the true variance
    * slightly, so the z is mildly conservative (documented deviation;
    * midranks keep L itself exact). The treatment order is the SORTED
    * LABEL order — encode the hypothesis in the labels ("1_low" <
    * "2_mid" < "3_high"). */
  def pageTrend(
      df: DataFrame, itemCol: String, treatCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = df.select(col(itemCol).as("__i"),
      col(treatCol).cast("string").as("__t"),
      col(valCol).cast("long").as("__v"))
    val k1 = broadcast(u.agg(
      count_distinct(col("__t")).cast("long").as("k")))
    val complete = u
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy(col("__i"))))
      .crossJoin(k1)
      .filter(col("__cnt") === col("k"))
    val wLess = Window.partitionBy(col("__i")).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val ranked = complete
      .withColumn("__nless",
        coalesce(count(lit(1)).over(wLess), lit(0L)))
      .withColumn("__neq",
        count(lit(1)).over(Window.partitionBy(col("__i"), col("__v"))))
      .withColumn("r2", (col("__nless") * 2 + col("__neq") + 1).cast("long"))
    // treatment order index c_j: row_number over the k-row distinct
    // treatment table (k-bounded; the single-partition window is fine)
    val order = ranked.select(col("__t")).distinct()
      .withColumn("cj", row_number().over(
        Window.orderBy(col("__t"))).cast("long"))
    val byTreat = ranked.groupBy(col("k"), col("__t"))
      .agg(sum(col("r2")).cast("long").as("r2j"))
      .join(broadcast(order), Seq("__t"))
      .groupBy(col("k"))
      .agg(sum(col("cj") * col("r2j")).cast("long").as("l2"))
    val totals = ranked.groupBy(col("__i")).agg(lit(1L).as("__one"))
      .agg(count(lit(1)).cast("long").as("n_items"))
    byTreat.crossJoin(broadcast(totals))
      .withColumn("z", expr(pageZSql))
      .withColumn("significant", expr(s"abs($pageZSql) > 1.959964"))
  }

  /** z for 2L over (k, l2, n_items); NULL below 2 treatments or with no
    * complete items. Shared with the oracle. */
  val pageZSql: String =
    "CASE WHEN k > 1 AND n_items > 0 THEN " +
      "round((CAST(l2 AS DOUBLE) - CAST(n_items AS DOUBLE) * k * " +
      "(k + 1) * (k + 1) / 2) / " +
      "sqrt(CAST(n_items AS DOUBLE) * k * k * (k + 1) * " +
      "(k * k - 1) / 36), 6) END"

  /** Two-sample Cramér–von Mises — the WHOLE-distribution companion to
    * [[mannWhitney]] (location-sensitive) and the KS test (max gap
    * only): T = n₁n₂/(n₁+n₂)² · Σ_pooled (F₁(v) − F₂(v))², integrating
    * the squared ECDF gap over every pooled observation, so tail and
    * shape differences the max misses accumulate. Exact arithmetic:
    * per distinct value, d = cum₁·n₂ − cum₂·n₁ (the gap scaled by
    * n₁n₂) and the numerator Σ (cnt₁+cnt₂)·d² runs in DECIMAL (d² alone
    * passes 2⁶³ once n₁n₂ > 3·10⁹), with
    * T = num / ((n₁+n₂)²·n₁·n₂). Value-domain aggregate + ONE ranged
    * prefix sum — nothing row-sized sorts. `significant` flags
    * T > 0.461249, the asymptotic two-sample 5% point (Anderson 1962).
    * The exposed numerator leaves as STRING (r10 decimal contract). */
  def cramerVonMises(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val u = df.select(when(col(groupCol), 1L).otherwise(0L).as("g"),
      col(valCol).cast("long").as("v"))
    val per = u.groupBy(col("v"))
      .agg(sum(col("g")).cast("long").as("c1"),
        sum(lit(1L) - col("g")).cast("long").as("c2"))
    val cum = Eval.rangedCumsum(per, Nil, "v", Seq("c1", "c2"))
    val tot = broadcast(per.agg(sum(col("c1")).cast("long").as("n1"),
      sum(col("c2")).cast("long").as("n2")))
    cum.crossJoin(tot)
      // the scaled gap forms in DECIMAL from the first product — cum·n
      // itself brushes 2⁶³ at ~3·10⁹ rows per sample
      .withColumn("d",
        col("cum_c1").cast("decimal(38,0)") * col("n2")
          - col("cum_c2").cast("decimal(38,0)") * col("n1"))
      .withColumn("term", (col("c1") + col("c2")).cast("decimal(38,0)")
        * col("d") * col("d"))
      .groupBy(col("n1"), col("n2"))
      .agg(sum(col("term")).cast("decimal(38,0)").as("num"))
      .withColumn("t", expr(cvmTSql))
      .withColumn("significant", expr(s"$cvmTSql > 0.461249"))
      .withColumn("num", col("num").cast("string"))
  }

  /** T over (n1, n2, num); NULL when either sample is empty. Shared
    * with the oracle. */
  val cvmTSql: String =
    "CASE WHEN n1 > 0 AND n2 > 0 THEN " +
      "round(CAST(num AS DOUBLE) / ((CAST(n1 AS DOUBLE) + n2) * " +
      "(CAST(n1 AS DOUBLE) + n2) * CAST(n1 AS DOUBLE) * n2), 6) END"

  /** Jonckheere–Terpstra — [[kruskalWallis]]'s omnibus sharpened to an
    * ORDERED alternative across k groups (the independent-samples twin
    * of [[pageTrend]]): J = Σ_{i<j} U_ij summed over group pairs in
    * sorted-label order, kept exact in DOUBLED units
    * (2J counts ties once, wins twice). Computed without O(n²) pairs:
    * per-(group, value) counts on the FULL value×group grid (zero-filled
    * so every group has a cumulative at every pooled value — a V·k
    * fan-out, k-bounded), one ranged prefix sum per group, then the
    * k²-bounded pair join on the value axis:
    * 2U_ij = Σ_v cnt_j(v)·(2·cum_i(v) − cnt_i(v)). The null uses the
    * NO-TIE moments E[2J] = (n² − Σn_g²)/2 and
    * Var(2J) = (n²(2n+3) − Σn_g²(2n_g+3))/18 — with heavy ties the z is
    * mildly conservative (documented; J itself stays exact). The J sum
    * and the cubic group moments run in DECIMAL and leave as STRING. */
  def jonckheere(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val u = df.select(col(groupCol).cast("string").as("g"),
      col(valCol).cast("long").as("v"))
    val per = u.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).cast("long").as("nv"))
      .materialize // feeds the grid left-join + both distincts
    val vals = per.select(col("v")).distinct()
    val groups = per.select(col("g")).distinct()
    val grid = vals.crossJoin(groups)
      .join(per, Seq("g", "v"), "left")
      .withColumn("nv", coalesce(col("nv"), lit(0L)))
    val cum = Eval.rangedCumsum(grid, Seq("g"), "v", Seq("nv"))
      .materialize // both sides of the ordered pair join
    val j2 = cum.as("x").join(cum.as("y"),
        col("x.v") === col("y.v") && col("x.g") < col("y.g"))
      .agg(sum(col("y.nv").cast("decimal(38,0)") *
        (col("x.cum_nv") * 2 - col("x.nv"))).cast("decimal(38,0)")
        .as("j2"))
    val sizes = per.groupBy(col("g"))
      .agg(sum(col("nv")).cast("long").as("ng"))
      .agg(count(lit(1)).cast("long").as("k"),
        sum(col("ng")).cast("long").as("n"),
        sum(col("ng").cast("decimal(38,0)") * col("ng"))
          .cast("decimal(38,0)").as("sg2"),
        sum(col("ng").cast("decimal(38,0)") * col("ng")
          * (col("ng") * 2 + 3)).cast("decimal(38,0)").as("sg23"))
    j2.crossJoin(broadcast(sizes))
      .withColumn("z", expr(jtZSql))
      .withColumn("significant", expr(s"abs($jtZSql) > 1.959964"))
      .withColumn("j2", col("j2").cast("string"))
      .withColumn("sg2", col("sg2").cast("string"))
      .withColumn("sg23", col("sg23").cast("string"))
  }

  /** Bowker symmetry test — the k×k extension of [[mcnemar]]: did the
    * category TRANSITIONS balance (as many i→j as j→i moves)? χ² =
    * Σ_{i<j} (n_ij − n_ji)²/(n_ij + n_ji) over the off-diagonal pairs
    * with any mass, df = m = #pairs with n_ij + n_ji > 0 (the
    * zero-mass pairs carry no information and, conventionally, no df).
    * Per-pair terms micro-quantize so the sum is exact; the pair table
    * is k²-bounded (cells materialize once, then a pair self-join of
    * the k² cell table). df ≤ 10 supported by the shared critical
    * table; beyond that the flag is NULL, never a wrong quantile. */
  def bowkerSymmetry(
      df: DataFrame, fromCol: String, toCol: String): DataFrame = {
    // each off-diagonal cell folds onto its canonical {lo, hi} pair with
    // a forward/reverse tag — one regroup, no self-join, no missing-cell
    // cases (an unpaired direction just leaves the other side at 0)
    df.groupBy(col(fromCol).cast("string").as("i"),
        col(toCol).cast("string").as("j"))
      .agg(count(lit(1)).cast("long").as("n"))
      .filter(col("i") =!= col("j"))
      .select(least(col("i"), col("j")).as("lo"),
        greatest(col("i"), col("j")).as("hi"),
        when(col("i") < col("j"), col("n")).otherwise(0L).as("fwd"),
        when(col("i") > col("j"), col("n")).otherwise(0L).as("rev"))
      .groupBy(col("lo"), col("hi"))
      .agg(sum(col("fwd")).cast("long").as("nij"),
        sum(col("rev")).cast("long").as("nji"))
      .withColumn("term_micro", expr(bowkerTermMicroSql))
      .agg(count(lit(1)).cast("long").as("m"),
        sum(col("term_micro")).cast("long").as("chi2_micro"))
      .withColumn("chi2", expr(bowkerChi2Sql))
      .withColumn("df", col("m"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("m")))
      .withColumn("significant",
        expr(s"$bowkerChi2Sql > ${chi2Crit95Sql("m")}"))
  }

  /** Per-pair (n_ij − n_ji)²/(n_ij + n_ji) in micro units; pairs reach
    * the sum only with positive mass. Shared with the oracle. */
  val bowkerTermMicroSql: String =
    "CAST(ROUND(CAST(nij - nji AS DOUBLE) * (nij - nji) / (nij + nji) " +
      "* 1000000, 0) AS BIGINT)"

  /** χ² off the exact micro sum. Shared with the oracle. */
  val bowkerChi2Sql: String =
    "round(CAST(chi2_micro AS DOUBLE) / 1000000, 6)"

  /** Cronbach's alpha — internal-consistency reliability of k "items"
    * measured on the same units (do the k signals hang together as one
    * scale?): α = k/(k−1)·(1 − Σσ²_item/σ²_total) with POPULATION
    * variances assembled from exact integer moments (Σv and DECIMAL Σv²
    * per item; total score T = Σ_items v per unit, Σt/Σt² likewise).
    * COMPLETE units only (a missing item would silently shrink an
    * item's variance — the friedman completeness rule). Per-item
    * variances nano-quantize before the k-row sum, so the chain is
    * order-independent. Two aggregates over the unit×item table + one
    * per-unit total pass. */
  def cronbachAlpha(
      df: DataFrame, unitCol: String, itemCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = df.select(col(unitCol).as("__u"),
      col(itemCol).cast("string").as("__i"),
      col(valCol).cast("long").as("__v"))
    val k1 = broadcast(u.agg(
      count_distinct(col("__i")).cast("long").as("k")))
    val complete = u
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy(col("__u"))))
      .crossJoin(k1)
      .filter(col("__cnt") === col("k"))
      .materialize // feeds the item moments + the unit totals
    val items = complete.groupBy(col("k"), col("__i"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__v")).cast("long").as("s"),
        sum(col("__v").cast("decimal(38,0)") * col("__v"))
          .cast("decimal(38,0)").as("sq"))
      .withColumn("var_milli", expr(cronbachItemVarMilliSql))
      .groupBy(col("k"))
      .agg(max(col("n")).as("n_units"),
        sum(col("var_milli")).cast("long").as("sum_var_milli"))
    val totals = complete.groupBy(col("__u"))
      .agg(sum(col("__v")).cast("long").as("t"))
      .agg(count(lit(1)).cast("long").as("nt"),
        sum(col("t")).cast("long").as("st"),
        sum(col("t").cast("decimal(38,0)") * col("t"))
          .cast("decimal(38,0)").as("stq"))
    items.crossJoin(broadcast(totals))
      .withColumn("alpha", expr(cronbachAlphaSql))
      .select(col("k"), col("n_units"), col("sum_var_milli"), col("alpha"))
  }

  /** Population item variance Σv²/n − (Σv/n)² in MILLI units over
    * (n, s, sq) — milli, not nano: a cents-scale item variance is ~10¹¹
    * and the 20× smoke caught the nano scaling at 2.7·10²⁰ past 2⁶³
    * (CAST_OVERFLOW under ANSI); milli holds to variance ~9·10¹⁵ with
    * ≤10⁻³ absolute quantization — ~10⁻¹⁴ relative at these magnitudes.
    * Shared with the oracle. */
  val cronbachItemVarMilliSql: String =
    "CAST(ROUND((CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * " +
      "(CAST(s AS DOUBLE) / n)) * 1000, 0) AS BIGINT)"

  /** α over (k, sum_var_milli, nt, st, stq); NULL for k < 2 or a
    * zero-variance total. Shared with the oracle. */
  val cronbachAlphaSql: String = {
    val vt = "(CAST(stq AS DOUBLE) / nt - (CAST(st AS DOUBLE) / nt) * " +
      "(CAST(st AS DOUBLE) / nt))"
    s"CASE WHEN k > 1 AND $vt > 0 THEN " +
      "round(CAST(k AS DOUBLE) / (k - 1) * (1.0 - " +
      s"CAST(sum_var_milli AS DOUBLE) / 1000 / $vt), 6) END"
  }

  /** Fleiss' kappa — chance-corrected agreement for n raters × N items
    * over c categories (the multi-rater generalization of
    * [[cohensKappa]]): per item P_i = (Σ_c n_ic² − n)/(n(n−1)),
    * P̄e = Σ_c p_c² from the category shares. COMPLETE items only
    * (every item must carry exactly n = #distinct raters ratings).
    * Integer kernels: Σ_items Σ_c n_ic² and Σ_c (col totals)² run in
    * DECIMAL (exposed as STRING), one double chain at the end. */
  def fleissKappa(
      df: DataFrame, itemCol: String, raterCol: String,
      catCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = df.select(col(itemCol).as("__i"), col(raterCol).as("__r"),
      col(catCol).cast("string").as("__c"))
    val n1 = broadcast(u.agg(
      count_distinct(col("__r")).cast("long").as("n_raters")))
    val complete = u
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy(col("__i"))))
      .crossJoin(n1)
      .filter(col("__cnt") === col("n_raters"))
      .materialize
    val cells = complete.groupBy(col("n_raters"), col("__i"), col("__c"))
      .agg(count(lit(1)).cast("long").as("nic"))
      .materialize // feeds the item sum + the category totals
    val perItem = cells.groupBy(col("n_raters"))
      .agg(count_distinct(col("__i")).cast("long").as("n_items"),
        sum(col("nic").cast("decimal(38,0)") * col("nic"))
          .cast("decimal(38,0)").as("s_nic2"))
    val perCat = cells.groupBy(col("__c"))
      .agg(sum(col("nic")).cast("long").as("colsum"))
      .agg(sum(col("colsum").cast("decimal(38,0)") * col("colsum"))
        .cast("decimal(38,0)").as("s_col2"))
    perItem.crossJoin(broadcast(perCat))
      .withColumn("kappa", expr(fleissKappaSql))
      .withColumn("s_nic2", col("s_nic2").cast("string"))
      .withColumn("s_col2", col("s_col2").cast("string"))
  }

  /** κ over (n_raters, n_items, s_nic2, s_col2):
    * P̄ = (Σn_ic² − Nn)/(Nn(n−1)), P̄e = Σcol²/(Nn)²; NULL when raters
    * never disagree by chance (P̄e = 1: all mass in one category) or
    * n < 2. Shared with the oracle. */
  val fleissKappaSql: String = {
    val pbar = "((CAST(s_nic2 AS DOUBLE) - CAST(n_items AS DOUBLE) * " +
      "n_raters) / (CAST(n_items AS DOUBLE) * n_raters * (n_raters - 1)))"
    val pe = "(CAST(s_col2 AS DOUBLE) / ((CAST(n_items AS DOUBLE) * " +
      "n_raters) * (CAST(n_items AS DOUBLE) * n_raters)))"
    s"CASE WHEN n_raters > 1 AND n_items > 0 AND $pe < 1 THEN " +
      s"round(($pbar - $pe) / (1.0 - $pe), 6) END"
  }

  /** Chi-square goodness-of-fit against the UNIFORM distribution over
    * the GLOBAL category set, per key — "is this key's traffic evenly
    * spread across hours/weekdays/shards?" (the per-key companion to
    * [[srmCheck]]'s 2-arm case): with k global categories and n rows
    * for the key, χ² = [Σ_observed (O·k − n)² + (k − k_obs)·n²]/(n·k) —
    * the zero-cell correction enters through the ALGEBRA (each absent
    * category contributes (0·k − n)²), so no grid join materializes
    * empty cells. The squared deviations run in DECIMAL (n·k products
    * pass 2⁶³ at ~10⁹ rows/key) and only the final division is a
    * double. One cell aggregate + one key aggregate + a 1-row category
    * count broadcast. */
  def gofUniform(
      df: DataFrame, keyCol: String, catCol: String): DataFrame = {
    val cells = df.groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).cast("long").as("o"))
      .materialize // feeds the key totals + the global k
    val kGlob = broadcast(cells.select(col(catCol)).distinct()
      .agg(count(lit(1)).cast("long").as("k")))
    val totals = cells.groupBy(col(keyCol))
      .agg(sum(col("o")).cast("long").as("n"))
    cells.join(totals, keyCol).crossJoin(kGlob)
      .withColumn("dev",
        col("o").cast("decimal(38,0)") * col("k") - col("n"))
      .groupBy(col(keyCol), col("k"), col("n"))
      .agg(count(lit(1)).cast("long").as("k_obs"),
        sum(col("dev") * col("dev")).cast("decimal(38,0)").as("sdev2"))
      .withColumn("chi2", expr(gofChi2Sql))
      .withColumn("df", (col("k") - 1L).cast("long"))
      .withColumn("chi2_crit", expr(chi2Crit95Sql("k - 1")))
      .withColumn("significant",
        expr(s"$gofChi2Sql > ${chi2Crit95Sql("k - 1")}"))
      .withColumn("sdev2", col("sdev2").cast("string"))
  }

  /** χ² over (sdev2, k, k_obs, n); NULL for a single category. Shared
    * with the oracle. */
  val gofChi2Sql: String =
    "CASE WHEN k > 1 AND n > 0 THEN " +
      "round((CAST(sdev2 AS DOUBLE) + CAST(k - k_obs AS DOUBLE) * n * n)" +
      " / (CAST(n AS DOUBLE) * k), 6) END"

  /** Decile shift function — WHERE two distributions differ, not just
    * whether ([[cramerVonMises]] says "different", this says "the gap
    * lives in the upper tail"): the nine decile quantiles of each
    * group side by side with their difference. Exact interpolated
    * `percentile` matches DuckDB's `quantile_cont` (the q_percentile
    * parity precedent); each group reduces map-side to one row, so the
    * operator is two aggregates + a 9-row join. */
  def shiftFunction(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val ps = (1 to 9).map(i => s"${i / 10.0}D").mkString(", ")
    def side(flag: Boolean, name: String) = df
      .filter(col(groupCol) === flag)
      .agg(expr(s"percentile($valCol, array($ps))").as("q"))
      .select(posexplode(col("q")).as(Seq("i", name)))
    side(flag = true, "q_a").join(side(flag = false, "q_b"), Seq("i"))
      .select(((col("i") + 1) * 10).cast("long").as("decile"),
        round(col("q_a"), 6).as("q_a"), round(col("q_b"), 6).as("q_b"),
        round(col("q_a") - col("q_b"), 6).as("shift"))
  }

  /** z for 2J over (j2, n, sg2, sg23); NULL below 2 groups or when the
    * variance degenerates. Shared with the oracle. */
  val jtZSql: String = {
    val var18 = "((CAST(n AS DOUBLE) * n * (2 * n + 3) - " +
      "CAST(sg23 AS DOUBLE)) / 18)"
    s"CASE WHEN k > 1 AND $var18 > 0 THEN " +
      "round((CAST(j2 AS DOUBLE) - (CAST(n AS DOUBLE) * n - " +
      s"CAST(sg2 AS DOUBLE)) / 2) / sqrt($var18), 6) END"
  }

  /** Hodges–Lehmann two-sample shift estimator — the ROBUST "how far
    * apart are these two distributions?" in the metric's own units:
    * the median of ALL pairwise differences aᵢ − bⱼ. Where mannWhitney
    * answers yes/no and its Cliff's δ answers in probability units, HL
    * answers in cents/ms/units — and unlike mean-difference it ignores
    * outliers on both sides. Even pair-counts average the two middle
    * order statistics exactly: hl_x2 = d(k₁)+d(k₂) stays an exact
    * BIGINT, hl divides once.
    *
    * Plan: the pair space materializes as DISTINCT differences with
    * counts (cross join → groupBy d), so memory is #distinct-diffs,
    * not nₐ·n_b; the order statistics select via the rangedCumsum
    * prefix-sum kernel — no global sort, no row_number over the pair
    * space. Callers pass PRE-AGGREGATED samples (per-entity rollups);
    * the cross join is the honest O(nₐ·n_b) of the estimator itself —
    * aggregate first, and keep the smaller side broadcastable. */
  def hodgesLehmann(
      a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    val per = a.select(col(valCol).cast("long").as("va"))
      .crossJoin(broadcast(b.select(col(valCol).cast("long").as("vb"))))
      .groupBy((col("va") - col("vb")).as("d"))
      .agg(count(lit(1)).cast("long").as("nd"))
    val c = Eval.rangedCumsum(per, Nil, "d", Seq("nd"))
      .materialize
    val tot = broadcast(c.agg(sum(col("nd")).cast("long").as("np")))
    def orderStat(kExpr: String, name: String) =
      c.crossJoin(tot)
        .filter(expr(s"cum_nd >= $kExpr"))
        .agg(min(col("d")).as(name))
    orderStat("(np + 1) div 2", "d_lo")
      .crossJoin(orderStat("(np + 2) div 2", "d_hi"))
      .crossJoin(tot)
      .select(col("np").as("n_pairs"),
        (col("d_lo") + col("d_hi")).cast("long").as("hl_x2"),
        expr("round(CAST(d_lo + d_hi AS DOUBLE) / 2, 6)").as("hl"))
  }

  /** Binned distribution distances between two samples — the full
    * "how different are these two histograms?" panel PSI/JSD don't
    * cover: total variation (½Σ|p−q|, the fraction of mass you'd move),
    * Bhattacharyya coefficient (Σ√(pq), 1 = identical support use) and
    * its distance −ln BC, Hellinger √(1−BC) (a PROPER metric, bounded
    * [0,1]), and the overlap coefficient Σmin(p,q). Equal-width bins
    * over the POOLED [lo, hi] span keep both sides comparable; per-bin
    * double terms are fixed-point-quantized at nano before the
    * cross-bin sums (order-independent, the bartlett discipline —
    * sqrt is IEEE-exact so per-bin doubles already match engines).
    *
    * Plan: one pooled-extent aggregate (broadcast 1 row), one
    * bin-hashed conditional-count aggregate, one nBins-row finish. */
  def distDistances(
      a: DataFrame, b: DataFrame, valCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val u = a.select(col(valCol).cast("long").as("v"),
        lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionByName(b.select(col(valCol).cast("long").as("v"),
        lit(0L).as("__ca"), lit(1L).as("__cb")))
    val ext = broadcast(u.agg(min(col("v")).as("lo"), max(col("v")).as("hi")))
    val bins = u.crossJoin(ext)
      .withColumn("bin", expr(
        s"CASE WHEN hi > lo THEN least(CAST(${nBins - 1} AS BIGINT), " +
          s"(v - lo) * $nBins div nullif(hi - lo, 0)) " +
          "ELSE CAST(0 AS BIGINT) END"))
      .groupBy(col("bin"))
      .agg(sum(col("__ca")).cast("long").as("ca"),
        sum(col("__cb")).cast("long").as("cb"))
    val tot = broadcast(bins.agg(
      sum(col("ca")).cast("long").as("n_a"),
      sum(col("cb")).cast("long").as("n_b")))
    bins.crossJoin(tot)
      .withColumn("tv_nano", expr(ddTvNanoSql))
      .withColumn("bc_nano", expr(ddBcNanoSql))
      .withColumn("ov_nano", expr(ddOvNanoSql))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).cast("long").as("n_bins"),
        sum(col("tv_nano")).cast("long").as("tv_sum"),
        sum(col("bc_nano")).cast("long").as("bc_sum"),
        sum(col("ov_nano")).cast("long").as("ov_sum"))
      .select(col("n_a"), col("n_b"), col("n_bins"),
        expr("round(CAST(tv_sum AS DOUBLE) / 1000000000 / 2, 6)")
          .as("total_variation"),
        expr("round(CAST(bc_sum AS DOUBLE) / 1000000000, 6)")
          .as("bhattacharyya_coef"),
        expr("CASE WHEN bc_sum > 0 THEN " +
          "round(-LN(CAST(bc_sum AS DOUBLE) / 1000000000), 6) END")
          .as("bhattacharyya_dist"),
        expr("round(sqrt(greatest(CAST(0 AS DOUBLE), " +
          "1 - CAST(bc_sum AS DOUBLE) / 1000000000)), 6)")
          .as("hellinger"),
        expr("round(CAST(ov_sum AS DOUBLE) / 1000000000, 6)")
          .as("overlap_coef"))
  }

  /** Per-bin |p−q| in nano units over (ca, cb, n_a, n_b). Shared with
    * the oracle. */
  val ddTvNanoSql: String =
    "CAST(ROUND(ABS(CAST(ca AS DOUBLE) / n_a - " +
      "CAST(cb AS DOUBLE) / n_b) * 1000000000, 0) AS BIGINT)"

  /** Per-bin √(p·q) in nano units (sqrt is IEEE-correctly-rounded —
    * engine-identical). */
  val ddBcNanoSql: String =
    "CAST(ROUND(sqrt((CAST(ca AS DOUBLE) / n_a) * " +
      "(CAST(cb AS DOUBLE) / n_b)) * 1000000000, 0) AS BIGINT)"

  /** Per-bin min(p, q) in nano units. */
  val ddOvNanoSql: String =
    "CAST(ROUND(least(CAST(ca AS DOUBLE) / n_a, " +
      "CAST(cb AS DOUBLE) / n_b) * 1000000000, 0) AS BIGINT)"

  /** One-sample exact-rational binomial proportion test per key — "is
    * this success share p₀?" with p₀ = num/den held as INTEGERS so the
    * null never picks up a float representation: z = (x − n·p₀ ∓ ½)/
    * √(n·p₀(1−p₀)) with the continuity correction toward the null
    * (|x − n·p₀| ≤ ½ pins z to exactly 0), two-sided normal p. The
    * workhorse behind SRM checks, coin-flip guardrails, and
    * [[poissonTwoRate]]'s conditional reduction. One map-side-combined
    * aggregate; the z/p chain is shared SQL over exact (n, x). */
  def binomialTest(
      df: DataFrame, keyCol: String, successCol: String,
      p0Num: Long, p0Den: Long): DataFrame = {
    require(p0Num > 0 && p0Num < p0Den,
      s"p0 must be strictly inside (0,1): $p0Num/$p0Den")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(successCol), 1L).otherwise(0L)).cast("long").as("x"))
      .withColumn("z",
        expr(binomialZSql(p0Num.toString, p0Den.toString)))
      .withColumn("p_normal", expr(s"round(${normalPSql("z")}, 6)"))
      .withColumn("significant", expr("abs(z) > 1.959964"))
  }

  /** Continuity-corrected proportion z over (n, x) for null num/den —
    * num/den may be literals OR column names (poissonTwoRate passes
    * exposure columns). Shared with the oracle. */
  def binomialZSql(num: String, den: String): String = {
    val p = s"(CAST($num AS DOUBLE) / ($den))"
    val d = s"(CAST(x AS DOUBLE) - CAST(n AS DOUBLE) * $p)"
    s"CASE WHEN n > 0 THEN " +
      s"round((CASE WHEN $d > 0.5 THEN $d - 0.5 " +
      s"WHEN $d < -0.5 THEN $d + 0.5 ELSE 0.0 END) / " +
      s"sqrt(CAST(n AS DOUBLE) * $p * (1 - $p)), 6) END"
  }

  /** Two-sample Poisson rate comparison per key via the CONDITIONAL
    * binomial reduction (the uniformly-most-powerful exact framing,
    * normal-approximated): given x_a events in exposure t_a and x_b in
    * t_b, under rate equality x_a | (x_a+x_b) ~ Bin(x_a+x_b,
    * t_a/(t_a+t_b)) — so the test IS [[binomialTest]]'s z with an
    * exact-rational null from the integer exposures. Reports both
    * per-exposure rates. Incident counts, error budgets, arrival-rate
    * drift — anywhere "did the rate change between two windows?" is
    * the question. One aggregate, shared-SQL z/p chain. */
  def poissonTwoRate(
      df: DataFrame, keyCol: String, inACol: String,
      tA: Long, tB: Long): DataFrame = {
    require(tA > 0 && tB > 0, s"exposures must be positive: $tA, $tB")
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(inACol), 1L).otherwise(0L)).cast("long").as("x"))
      .withColumn("rate_a", expr(s"round(CAST(x AS DOUBLE) / $tA, 6)"))
      .withColumn("rate_b",
        expr(s"round(CAST(n - x AS DOUBLE) / $tB, 6)"))
      .withColumn("z",
        expr(binomialZSql(tA.toString, (tA + tB).toString)))
      .withColumn("p_normal", expr(s"round(${normalPSql("z")}, 6)"))
      .withColumn("significant", expr("abs(z) > 1.959964"))
  }

  /** (group, v, cnt, cum_cnt, n): distinct-value counts with an
    * inclusive prefix sum and the group total — the order-statistics
    * frame [[tukeyFences]] and [[equiDepthHistogram]] share. Bounded by
    * the VALUE DOMAIN, not the row count; the prefix sum is the ranged
    * kernel (no global sort). */
  private[operators] def valueCumFrame(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val per = df.groupBy(col(groupCol), col(valCol).cast("long").as("v"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    Eval.rangedCumsum(per, Seq(groupCol), "v", Seq("cnt"))
      .withColumn("n",
        sum(col("cnt")).over(Window.partitionBy(col(groupCol)))
          .cast("long"))
  }

  /** Tukey fences outlier screen per group — the boxplot rule: values
    * outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR] are flagged. Quartiles are
    * EXACT lower order statistics (type-1: the ceil(n/4)-th and
    * ceil(3n/4)-th values), and the fence compare runs in QUARTERS —
    * 4v < 4·q1 − 6·(q3 − q1) — so no double ever decides membership.
    * The robust screen next to [[TimeSeries.madOutliers]] (MAD flags
    * per-point deviation from a rolling center; Tukey is the
    * distribution-shape rule auditors expect on static columns).
    *
    * Plan: one value-domain aggregate, one ranged prefix sum, two
    * broadcast order-stat picks, one counting re-scan. */
  def tukeyFences(
      df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val c = Materialize(valueCumFrame(df, groupCol, valCol))
    def orderStat(kExpr: String, name: String) =
      c.filter(expr(s"cum_cnt >= $kExpr"))
        .groupBy(col(groupCol))
        .agg(min(col("v")).as(name))
    val qs = orderStat("(n + 3) div 4", "q1")
      .join(orderStat("(3 * n + 3) div 4", "q3"), groupCol)
      .withColumn("lo4", lit(4L) * col("q1") - lit(6L) * (col("q3") - col("q1")))
      .withColumn("hi4", lit(4L) * col("q3") + lit(6L) * (col("q3") - col("q1")))
    c.join(broadcast(qs), groupCol)
      .groupBy(col(groupCol), col("q1"), col("q3"),
        col("lo4"), col("hi4"))
      .agg(max(col("n")).as("n"),
        sum(when(lit(4L) * col("v") < col("lo4"), col("cnt"))
          .otherwise(0L)).cast("long").as("n_low"),
        sum(when(lit(4L) * col("v") > col("hi4"), col("cnt"))
          .otherwise(0L)).cast("long").as("n_high"))
      .select(col(groupCol), col("n"), col("q1"), col("q3"),
        (col("q3") - col("q1")).as("iqr"),
        expr("round(CAST(lo4 AS DOUBLE) / 4, 6)").as("fence_lo"),
        expr("round(CAST(hi4 AS DOUBLE) / 4, 6)").as("fence_hi"),
        col("n_low"), col("n_high"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov test — the distribution-shift
    * detector the binned panel (distDistances) approximates: D = max
    * over values of |F̂_a − F̂_b|, computed as the EXACT integer
    * maximum of |cum_a·n_b − cum_b·n_a| over the distinct-value prefix
    * frame (no bins, no doubles in the decision path). Also reports
    * the LOCATION of the supremum (lowest value achieving it — where
    * the two CDFs diverge most, the first thing a drift inspection
    * asks) and the large-sample 5% verdict D > 1.358·√((n_a+n_b)/
    * (n_a·n_b)) as an exact-rational-vs-IEEE compare.
    *
    * Plan: one value-domain aggregate, one ranged prefix sum, a
    * broadcast max, one location pick. Long bound: cum·n products hold
    * to ~3·10⁹ rows per side. */
  def ksTwoSample(
      a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    val u = a.select(col(valCol).cast("long").as("v"),
        lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionByName(b.select(col(valCol).cast("long").as("v"),
        lit(0L).as("__ca"), lit(1L).as("__cb")))
      .groupBy(col("v"))
      .agg(sum(col("__ca")).cast("long").as("ca"),
        sum(col("__cb")).cast("long").as("cb"))
    val c = Materialize(
      Eval.rangedCumsum(u, Nil, "v", Seq("ca", "cb")))
    val tot = broadcast(c.agg(
      sum(col("ca")).cast("long").as("n_a"),
      sum(col("cb")).cast("long").as("n_b")))
    val withGap = c.crossJoin(tot)
      .withColumn("__gap",
        abs(col("cum_ca") * col("n_b") - col("cum_cb") * col("n_a")))
    val mx = broadcast(withGap.agg(max(col("__gap")).as("d_num")))
    withGap.crossJoin(mx)
      .filter(col("__gap") === col("d_num"))
      .groupBy(col("n_a"), col("n_b"), col("d_num"))
      .agg(min(col("v")).as("d_at"))
      .withColumn("d", expr(ksDSql))
      .withColumn("significant", expr(ksSigSql))
      .select(col("n_a"), col("n_b"), col("d_num"), col("d_at"),
        col("d"), col("significant"))
  }

  /** D over (d_num, n_a, n_b). Shared with the oracle. */
  val ksDSql: String =
    "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      "round(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b), 6) END"

  /** Large-sample 5% KS verdict. Shared with the oracle. */
  val ksSigSql: String =
    "coalesce(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b) > " +
      "1.358 * sqrt((CAST(n_a AS DOUBLE) + n_b) / " +
      "(CAST(n_a AS DOUBLE) * n_b)), false)"

  /** Hypergeometric enrichment test per group — the
    * over-representation analysis behind "is this tag enriched in this
    * cluster?": with N universe rows, K flagged overall, a group of
    * size n holding k flagged rows, score k against the
    * hypergeometric null (mean n·K/N, variance with the finite-
    * population correction (N−n)/(N−1)) via a continuity-corrected z —
    * the [[binomialTest]] discipline with the exact-population
    * variance. All cells are exact integers; one IEEE chain per group.
    * Also reports the enrichment ratio k·N/(n·K). Degenerate nulls
    * (K = 0, K = N, or n = N) yield NULL z by contract. */
  def enrichment(
      df: DataFrame, groupCol: String, flagCol: String): DataFrame = {
    val tot = broadcast(df.agg(
      count(lit(1)).cast("long").as("n_tot"),
      sum(when(col(flagCol), 1L).otherwise(0L)).cast("long").as("k_tot")))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col(flagCol), 1L).otherwise(0L)).cast("long").as("k"))
      .crossJoin(tot)
      .withColumn("expected", expr(
        "round(CAST(n AS DOUBLE) * k_tot / n_tot, 6)"))
      .withColumn("ratio", expr(enrichRatioSql))
      .withColumn("z", expr(enrichZSql))
      .withColumn("p_normal", expr(s"round(${normalPSql("z")}, 6)"))
      .withColumn("significant", expr("coalesce(abs(z) > 1.959964, false)"))
  }

  /** Enrichment ratio over (k, n, k_tot, n_tot); NULL on an empty
    * flag population. Shared with the oracle. */
  val enrichRatioSql: String =
    "CASE WHEN k_tot > 0 AND n > 0 THEN " +
      "round(CAST(k AS DOUBLE) * n_tot / (CAST(n AS DOUBLE) * k_tot)" +
      ", 6) END"

  /** Continuity-corrected hypergeometric z over (k, n, k_tot, n_tot);
    * NULL when the null degenerates. Shared with the oracle. */
  val enrichZSql: String = {
    val p = "(CAST(k_tot AS DOUBLE) / n_tot)"
    val d = s"(CAST(k AS DOUBLE) - CAST(n AS DOUBLE) * $p)"
    val v = s"(CAST(n AS DOUBLE) * $p * (1 - $p) * " +
      "(CAST(n_tot - n AS DOUBLE) / (n_tot - 1)))"
    "CASE WHEN k_tot > 0 AND k_tot < n_tot AND n < n_tot AND " +
      s"n_tot > 1 THEN round((CASE WHEN $d > 0.5 THEN $d - 0.5 " +
      s"WHEN $d < -0.5 THEN $d + 0.5 ELSE 0.0 END) / sqrt($v), 6) END"
  }

  /** Exact quantile panel per group — the type-1 (lower order
    * statistic) counterpart of approx_percentile, for when the number
    * must be exact and auditable: value at rank ceil(q·n) for each
    * requested quantile, off ONE shared value-domain prefix frame (the
    * [[tukeyFences]] kernel generalized to any q). Emits (group,
    * q_ppm, n, value) scalar rows. */
  def exactQuantiles(
      df: DataFrame, groupCol: String, valCol: String,
      qPpm: Seq[Long]): DataFrame = {
    require(qPpm.nonEmpty && qPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1e6] ppm: $qPpm")
    val c = Materialize(valueCumFrame(df, groupCol, valCol))
    qPpm.map { q =>
      c.filter(expr(s"cum_cnt >= ($q * n + 999999) div 1000000"))
        .groupBy(col(groupCol))
        .agg(max(col("n")).cast("long").as("n"),
          min(col("v")).as("value"))
        .withColumn("q_ppm", lit(q))
        .select(col(groupCol), col("q_ppm"), col("n"), col("value"))
    }.reduce(_ unionByName _)
  }

  /** Equi-depth histogram per group — the ANALYZE-statistics operator:
    * `nBuckets` buckets of ~equal row count, each distinct value
    * assigned whole to the bucket of its END rank (b = ceil(cum·B/n),
    * exact integers — values never split, so heavy values overfill
    * their bucket honestly instead of lying about boundaries). Emits
    * per (group, bucket) the value span and exact count — what an
    * optimizer or a drift monitor consumes.
    *
    * Plan: the shared value-domain prefix frame + one hash aggregate;
    * work bounded by distinct values, never a global sort. */
  def equiDepthHistogram(
      df: DataFrame, groupCol: String, valCol: String,
      nBuckets: Int = 8): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    valueCumFrame(df, groupCol, valCol)
      .withColumn("bucket",
        expr(s"(cum_cnt * $nBuckets + n - 1) div n").cast("long"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("cnt")).cast("long").as("cnt"),
        count(lit(1)).cast("long").as("n_distinct"))
  }

  /** Functional-dependency audit over candidate column pairs — the
    * schema-discovery profiling step ("is A a key for B, and how badly
    * does it leak?"): for each (determinant, dependent) candidate, the
    * determinant-value count, how many determinant values map to MORE
    * than one dependent value, the total violating EXTRA rows
    * (Σ_det (distinct_dep − 1) — the standard g3-style error mass),
    * and the holds verdict. Exact integer counts end to end; one
    * determinant-keyed aggregate per candidate (candidates are a
    * handful of audited pairs, not a cross product of the schema).
    *
    * NULL dependents COUNT as a distinct value (a determinant mapping
    * to {NULL, 'x'} is a real violation — the FD does not hold): the
    * distinct key is the collision-free pair (dep IS NULL, dep string)
    * — a struct is never NULL itself, so countDistinct sees every row
    * and nd >= 1 always. A sentinel coalesce would silently merge NULL
    * with a dependent whose string form equals the sentinel; the pair
    * key cannot collide. The oracle mirrors the same ROW key.
    *
    * Each candidate scans only its two columns (column pruning reaches
    * the parquet scan), so the audit costs |pairs| narrow passes. */
  def fdCheck(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "pairs must name at least one candidate")
    require(pairs.forall(p => p._1 != p._2),
      s"determinant = dependent is vacuous: $pairs")
    pairs.map { case (det, dep) =>
      df.select(col(det), col(dep))
        .groupBy(col(det).as("__d"))
        .agg(countDistinct(
            struct(col(dep).isNull.as("n"), col(dep).cast("string").as("v")))
          .cast("long").as("__nd"))
        .agg(
          count(lit(1)).cast("long").as("n_det_values"),
          sum(when(col("__nd") > 1L, 1L).otherwise(0L)).cast("long")
            .as("n_violating_det"),
          sum(col("__nd") - 1L).cast("long").as("n_extra_dep"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_det_values"), col("n_violating_det"), col("n_extra_dep"),
          (col("n_violating_det") === 0L).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Laplace-mechanism noisy counts — the ε-differential-privacy release
    * shape for publishing group counts about a sensitive corpus (the
    * privacy tier past [[kAnonymity]]/[[lDiversity]]/[[tCloseness]],
    * which audit rather than release): per group, true count n plus
    * Laplace(Δ/ε) noise, Δ = 1 (one row changes one count).
    *
    * The noise draw inverts the Laplace CDF at a uniform u derived from
    * md5 of the group key — a DETERMINISTIC, replayable noise source so
    * the engine and the oracle agree bit for bit and tests can pin
    * outputs. That determinism is the point here (pipeline plumbing +
    * exact mechanism shape) and the documented delta from production
    * DP: a public seed leaks everything, so a real release swaps
    * [[dpUniformSql]] for a CSPRNG draw per group — nothing else
    * changes. u ∈ (0,1) strictly (half-offset before the 2⁻³⁰ divide),
    * so the ln never sees 0; ln is the one transcendental (libm-stable
    * cross-engine), noise and the noisy count round at 6dp.
    *
    * Plan: ONE map-side-combined aggregate, then per-group scalar math
    * — no joins, partitions freely. */
  def dpNoisyCounts(
      df: DataFrame, dims: Seq[String],
      epsPpm: Long = 1000000L): DataFrame = {
    require(dims.nonEmpty, "dims must name at least one group column")
    require(epsPpm > 0, s"epsPpm must be positive: $epsPpm")
    val keyExpr = dims.map(d => s"CAST($d AS STRING)")
      .mkString("CONCAT_WS('|', ", ", ", ")")
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_true"))
      .withColumn("__h", expr(
        s"CAST(conv(substring(md5(CONCAT('dp:', $keyExpr)), 1, 15), " +
          "16, 10) AS BIGINT) % 1073741824"))
      .withColumn("__u", expr(dpUniformSql("__h")))
      .withColumn("noise", expr(dpLaplaceNoiseSql("__u", epsPpm)))
      .select(dims.map(col) ++ Seq(col("n_true"),
        expr(dpEpsilonSql(epsPpm)).as("epsilon"),
        expr("round(CAST(n_true AS DOUBLE) + noise, 6)")
          .as("noisy_count")): _*)
  }

  /** ε as an explicit DOUBLE (a bare decimal literal types as DECIMAL
    * in Spark — the dtype-canary contract bans Decimal in outputs);
    * shared with the oracle. */
  def dpEpsilonSql(epsPpm: Long): String =
    s"round(CAST($epsPpm AS DOUBLE) / CAST(1000000 AS DOUBLE), 6)"

  /** Strict-interior uniform from a 30-bit hash: (h + 0.5)/2³⁰ ∈ (0,1).
    * Shared with the oracle (the hash itself is engine-specific text;
    * everything from `h` on is this one shared formula). */
  def dpUniformSql(h: String): String =
    s"((CAST($h AS DOUBLE) + 0.5) / 1073741824.0)"

  /** Inverse-CDF Laplace(1/ε) draw at uniform `u`, ε = epsPpm/10⁶,
    * rounded 6dp; shared with the oracle. */
  def dpLaplaceNoiseSql(u: String, epsPpm: Long): String =
    s"round((CASE WHEN $u >= 0.5 THEN -1.0 ELSE 1.0 END) * " +
      s"(CAST(1000000 AS DOUBLE) / CAST($epsPpm AS DOUBLE)) * " +
      s"ln(1.0 - 2.0 * abs($u - 0.5)), 6)"

  /** Krippendorff's alpha (NOMINAL) — the inter-rater reliability
    * coefficient that, unlike [[fleissKappa]]/[[cohensKappa]], handles
    * MISSING ratings natively: units rated by any ≥ 2 of the raters
    * contribute, single-rating units drop out. alpha = 1 − D_o/D_e over
    * the coincidence matrix; expected disagreement uses the pooled
    * category marginals.
    *
    * EXACT ARITHMETIC: the per-unit coincidence contribution divides by
    * (m_u − 1), so all contributions are scaled by 2520 = lcm(1..9) and
    * every division is an exact integer (a loud `require` bounds raters
    * per unit at 10); marginals n_c and n are plain counts. alpha is
    * the single double step: 1 − (Ooff·(n−1)) / (2520·(n² − Σn_c²)),
    * round 6.
    *
    * Plan: one (unit, category) aggregate, one unit aggregate, one
    * category aggregate, one single-row combine — no joins beyond the
    * final 1×1, partitions by unit/category. */
  def krippendorffAlpha(
      ratings: DataFrame, unitCol: String, raterCol: String,
      valueCol: String): DataFrame = {
    val uc = ratings
      .groupBy(col(unitCol).as("__u"), col(valueCol).as("__c"))
      .agg(count(lit(1)).cast("long").as("__nuc"))
      .materialize // feeds the unit pass and the marginal pass
    val perUnit = uc
      .groupBy(col("__u"))
      .agg(sum(col("__nuc")).cast("long").as("__m"),
        sum(col("__nuc") * col("__nuc")).cast("long").as("__s2"))
      .filter(col("__m") >= 2L)
      .materialize // pairable units feed both aggregates below
    val unitAgg = perUnit
      .agg(
        count(lit(1)).cast("long").as("n_units"),
        sum(col("__m")).cast("long").as("n_values"),
        // 2520 = lcm(1..9): the per-unit division is exact for up to 10
        // raters; assert_true makes an 11th rater a LOUD failure inside
        // the same pass, before any rounded math could go wrong
        sum(expr(
          """CASE WHEN assert_true(__m <= 10,
            |  'krippendorffAlpha: a unit exceeds the exact-arithmetic
            | bound of 10 ratings') IS NULL
            |THEN (2520 div (__m - 1)) * (__m * __m - __s2) END"""
            .stripMargin.replaceAll("\n", " ")))
          .cast("long").as("d_o_scaled"))
    val catAgg = uc
      .join(perUnit.select(col("__u")), Seq("__u"))
      .groupBy(col("__c"))
      .agg(sum(col("__nuc")).cast("long").as("__nc"))
      .agg(count(lit(1)).cast("long").as("n_categories"),
        sum(col("__nc") * col("__nc")).cast("long").as("__snc2"))
    unitAgg.crossJoin(catAgg)
      .select(col("n_units"), col("n_values"), col("n_categories"),
        col("d_o_scaled"),
        expr("n_values * n_values - __snc2").as("d_e_raw"),
        expr(krippendorffAlphaSql).as("alpha"))
  }

  /** alpha = 1 − (D_o·(n−1))/(2520·D_e) — the one double step from
    * exact longs; shared with the oracle. */
  val krippendorffAlphaSql: String =
    "round(1.0 - (CAST(d_o_scaled AS DOUBLE) * " +
      "CAST(n_values - 1 AS DOUBLE)) / " +
      "(2520.0 * CAST(n_values * n_values - __snc2 AS DOUBLE)), 6)"
}
