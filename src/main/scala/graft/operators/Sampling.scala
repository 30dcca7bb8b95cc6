package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * `df.sample()` is seed-dependent AND partition-dependent — a repartition or
  * a task retry changes which rows are kept, which poisons train/test splits
  * and makes results unverifiable. Hashing a stable row id instead gives a
  * sample that is a pure function of the data: reproducible across engines
  * (the DuckDB oracle computes the identical buckets), across partitionings,
  * and across runs — the property a 100 TB train/val/test split actually
  * needs. Rows hash independently, so the filter pushes down and the
  * operator is a narrow map (no shuffle at all).
  */
object Sampling {

  /** Portable 60-bit hash bucket in [0, buckets): first 15 hex chars of
    * md5(id-as-string). Identical in DuckDB via
    * `CAST('0x'||substr(md5(CAST(id AS VARCHAR)),1,15) AS BIGINT) % buckets`.
    * 60 bits keeps the value positive and inside exact BIGINT range. */
  def hashBucket(id: Column, buckets: Int): Column =
    graft.functions.TextFunctions.tokenHash60(id.cast("string")) % buckets

  /** Keep ~`pct`% of rows, deterministically, by id hash. */
  def sampleByHash(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Stratified deterministic sampling: per-stratum keep percentages (e.g.
    * downsample the dominant language, keep all of a rare one) with the same
    * hash-bucket determinism as [[sampleByHash]]. The hash is salted with the
    * stratum value so strata draw independent samples rather than the same
    * id-prefix everywhere; strata not in `pcts` fall back to `defaultPct`.
    * Still a pure narrow map — the filter pushes down, no shuffle. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      pcts: Map[String, Int],
      defaultPct: Int = 0): DataFrame = {
    val b = graft.functions.TextFunctions.tokenHash60(
      concat(col(stratumCol).cast("string"), lit(":"), col(idCol).cast("string"))) % 100
    val pct = pcts.foldLeft(lit(defaultPct): Column) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(b < pct)
  }

  /** Importance sampling: keep each row with probability `weightMicro` /
    * 1e6, deterministically — the quality-weighted curation step (keep
    * high-quality documents with certainty, low-quality ones with
    * probability ∝ score). The weight arrives in exact integer micro-units
    * so the keep decision is integer-vs-integer in both engines (no
    * float-rounding divergence at the threshold); callers with a float
    * weight multiply by 1e6 and round upstream. Salted hash ("w:" prefix)
    * so the draw is independent of other hash-bucket samplers on the same
    * ids. Pure narrow map — pushes down, no shuffle. */
  def weightedSample(df: DataFrame, idCol: String, weightMicro: Column): DataFrame = {
    val b = graft.functions.TextFunctions.tokenHash60(
      concat(lit("w:"), col(idCol).cast("string"))) % 1000000L
    df.filter(b < weightMicro)
  }

  /** Sequence packing — the context-window batching step of LLM training:
    * documents pack into token-budget bins, deterministically. True
    * first-fit is sequentially dependent (un-parallelizable), so this is
    * the standard streaming approximation: bin = ⌊exclusive-prefix-tokens /
    * budget⌋ within a shard — a doc straddling a boundary overflows its bin
    * by at most one doc's tokens (document the tolerance, don't serialize
    * the cluster). Sharding by id hash keeps every window partition-local:
    * no global sort, each of the `shards` groups packs independently —
    * exactly how per-worker packing runs on a real cluster. Deterministic
    * (id order within shard), so the oracle replays bins bit-for-bit. */
  def packSequences(
      docs: DataFrame,
      budgetTokens: Long = 512L,
      shards: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens > 0 && shards > 0, s"bad packing params: $budgetTokens/$shards")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(
        col(idCol),
        size(graft.functions.TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"),
        pmod(col(idCol), lit(shards.toLong)).as("shard"))
      .withColumn("prev_tokens", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", (col("prev_tokens") / budgetTokens).cast("long"))
  }

  /** Domain-mixture resampling — the data-mixing step of LLM training:
    * downsample each domain so it contributes at most `targets(domain)` of
    * the ORIGINAL corpus size (domains under target keep everything; the
    * operator never upsamples). Per-domain keep rate =
    * min(1, target · N / c_domain), quantized to parts-per-million so the
    * rate arithmetic is exact-integer-comparable in the DuckDB oracle; the
    * keep decision hashes (domain:id) — the [[stratifiedSample]] salt — so
    * domains draw independent, partition-stable samples. Plan shape: one
    * domain-cardinality aggregate joined back on domain (AQE broadcasts it
    * when small — at 100 TB of web text domains are ~10⁷ hosts, still a
    * join, never a forced broadcast), one 1-row corpus count broadcast,
    * then a narrow filter. Domains absent from `targets` are dropped
    * (rate 0) — the explicit-allowlist contract of a curated mix. */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targets: Map[String, Double]): DataFrame =
    mixtureSample(df, idCol, domainCol,
      df.sparkSession.createDataFrame(targets.toSeq)
        .toDF(domainCol, "__target"))

  /** Targets as a DataFrame (domain, __target) — the scale form: a Map
    * baked into a when() chain builds one CASE branch per domain, which at
    * the ~10⁷-host scale this operator advertises is an analyzer-killing
    * 10⁷-deep expression tree. A join stays a join at any domain count
    * (AQE broadcasts it when small). */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      domainCol: String,
      targets: DataFrame): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__c"))
    val total = df.agg(count(lit(1)).cast("double").as("__n"))
    val target = coalesce(col("__target").cast("double"), lit(0.0))
    val ppm = floor(least(lit(1.0), target * col("__n") / col("__c")) * 1e6).cast("long")
    val b = graft.functions.TextFunctions.tokenHash60(
      concat(col(domainCol).cast("string"), lit(":"), col(idCol).cast("string"))) % 1000000L
    df.join(counts, Seq(domainCol))
      .join(targets, Seq(domainCol), "left")
      .crossJoin(broadcast(total))
      .withColumn("keep_ppm", ppm)
      .filter(b < col("keep_ppm"))
      .drop("__c", "__n", "__target")
  }

  /** Assign every row a stable train/val/test split label (80/10/10). */
  def trainValTestSplit(df: DataFrame, idCol: String): DataFrame = {
    val b = hashBucket(col(idCol), 100)
    df.withColumn(
      "split",
      when(b < 80, "train").when(b < 90, "val").otherwise("test"))
  }

  /** Leakage-safe train/val/test split: every near-duplicate CLUSTER lands
    * wholly in one split. [[trainValTestSplit]] hashes each doc's own id, so
    * two near-identical documents routinely straddle train and test — the
    * classic eval-contamination bug. Here the hash input is the cluster
    * representative `rep` (min reachable id over the near-dup `pairs` graph,
    * via [[Dedup.connectedComponents]]; unclustered docs represent
    * themselves), so split membership is constant within a component by
    * construction.
    *
    * Scale: the component table only contains docs that appear in a
    * near-dup pair — tiny relative to the corpus — so the left join is one
    * shuffle of that small side (AQE broadcasts it when it fits); the
    * corpus side stays a narrow map over whatever partitioning it arrives
    * with, same as [[trainValTestSplit]] plus the one join. */
  def leakageSafeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comp = Dedup.connectedComponents(pairs).withColumnRenamed("node", idCol)
    val withRep = docs
      .join(comp, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("component"), col(idCol)))
      .drop("component")
    val b = hashBucket(col("rep"), 100)
    withRep.withColumn(
      "split",
      when(b < 80, "train").when(b < 90, "val").otherwise("test"))
  }

  /** Histogram-equalizing sampler — flatten a bin distribution (length,
    * quality decile, perplexity bucket) by downsampling every bin to the
    * SMALLEST bin's volume: keep_ppm(bin) = floor(min_count·10⁶ /
    * count(bin)), membership by the stable 60-bit md5 of (bin, id). The
    * self-calibrating counterpart of [[mixtureSample]] (whose targets are
    * caller-supplied): rates come from the data's own histogram, so the
    * output is ~uniform across bins with no configuration. All math is
    * exact integers (ppm floors via `div`), so the oracle replays it.
    *
    * Scale: one count aggregate (rows = #bins, bounded by construction), a
    * 1-row min, a rate join the optimizer broadcasts when small — the
    * corpus itself is touched by one narrow filter. Same shape as
    * [[mixtureSample]]; no forced broadcast for the same reason. */
  def histogramEqualize(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val counts = df.groupBy(col(binCol)).agg(count(lit(1)).cast("long").as("__c"))
    val minc = counts.agg(min(col("__c")).as("__min"))
    val rates = counts.crossJoin(broadcast(minc))
      .select(col(binCol),
        expr("__min * 1000000L div __c").cast("long").as("keep_ppm"))
    val h = graft.functions.TextFunctions.tokenHash60(
      concat(col(binCol).cast("string"), lit(":"), col(idCol).cast("string"))) % 1000000L
    df.join(rates, Seq(binCol)).filter(h < col("keep_ppm"))
  }

  /** Deterministic token-budget corpus mixing — the "data mixing" step of a
    * training pipeline: given integer per-source weights and a total token
    * budget, admit each source's documents in a fixed pseudo-random order
    * (60-bit md5 of the doc id) until that source's share
    * `floor(totalBudget · w_s / Σw)` is reached. A doc is admitted iff the
    * tokens BEFORE it fit the share (so the boundary-crossing doc is kept —
    * budgets are floors, real corpora overshoot by < 1 doc). Unlike
    * [[mixtureSample]] (per-doc keep-probability, so realized token counts
    * drift with doc-length variance), this is an exact cumulative cutoff.
    *
    * Scale: the naive form is `sum(n_tokens) over (partition by source
    * order by h)` — ONE window partition per source, i.e. a whole source's
    * corpus through a single task at 100 TB. Instead, a distributed prefix
    * sum: range-partition by the admission order (source, h, id) — range,
    * not hash, so a hot source SPLITS across partitions and partition ids
    * ascend with key order; local cumsums run per (partition, source)
    * group, each bounded by one range-partition's rows; the per-(partition,
    * source) totals table (partitions × sources rows — tiny at any scale)
    * yields cross-partition offsets, broadcast back. The output is
    * boundary-invariant: offsets + local cumsums reproduce the global
    * prefix sum wherever the sampler drew the range bounds — PROVIDED both
    * consumers (window branch, totals branch) see the SAME bounds. That is
    * enforced structurally by materializing the ranged frame once
    * (`localCheckpoint` below): each consumer would otherwise instantiate
    * its own copy of the range exchange with independently-seeded boundary
    * sampling, and `spark_partition_id` would disagree between branches.
    * (Exchange reuse often deduplicates the copies, but it is an
    * optimization, not a guarantee.) The checkpoint also means the corpus
    * is scanned and shuffled once, not once per branch.
    *
    * `weights`: (sourceCol, weight) with integer weights; `totalBudget · w`
    * must fit a double exactly (< 2^53 — any real budget qualifies). */
  def tokenBudgetMix(
      docs: DataFrame,
      weights: DataFrame,
      totalBudget: Long,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    tokenBudgetOrdered(docs, weights, totalBudget,
      graft.functions.TextFunctions.tokenHash60(
        concat(lit("mix:"), col(idCol).cast("string"))),
      sourceCol, idCol, textCol)

  /** Quality-first budget selection: [[tokenBudgetMix]] with the admission
    * order chosen by the caller — pass a NUMERIC column ascending (e.g.
    * `-quality` for best-first) and each source's budget fills greedily
    * from that end. The DsDm/QuRating-shaped "select the best docs under a
    * token budget" step; same distributed-prefix-sum plan, same
    * boundary-invariance ((orderCol, id) is a total order). The column is
    * used as-is — fractional scores keep full precision (an integral cast
    * here would collapse `-quality` ∈ [-1, 0] onto one tie class). */
  def tokenBudgetSelect(
      docs: DataFrame,
      weights: DataFrame,
      totalBudget: Long,
      orderCol: Column,
      sourceCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    tokenBudgetOrdered(docs, weights, totalBudget, orderCol,
      sourceCol, idCol, textCol)

  private def tokenBudgetOrdered(
      docs: DataFrame,
      weights: DataFrame,
      totalBudget: Long,
      orderCol: Column,
      sourceCol: String,
      idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(
      col(idCol).cast("long").as(idCol), col(sourceCol),
      size(split(col(textCol), " ", -1)).cast("long").as("n_tokens"),
      orderCol.as("__h"))
    val denom = weights.agg(sum(col("weight")).cast("long").as("__denom"))
    val budgets = weights.crossJoin(broadcast(denom))
      .select(col(sourceCol),
        floor(lit(totalBudget).cast("double") * col("weight").cast("double") /
          col("__denom").cast("double")).as("__budget"))
    val p = docs.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = toks
      .repartitionByRange(p, col(sourceCol), col("__h"), col(idCol))
      .sortWithinPartitions(col(sourceCol), col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      // materialize ONCE before the window/offsets fan-out: each branch
      // would otherwise instantiate its own range exchange, whose boundary
      // SAMPLING is seeded per RDD instance — divergent bounds make __pid
      // disagree between branches and silently corrupt the prefix sum.
      // Exhaustive-sample toy runs can't show it; partial-sample (real)
      // scale can. Full rationale: Eval.rangedCumsum.
      .materialize
    val wLocal = Window.partitionBy(col("__pid"), col(sourceCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__cum_local", sum(col("n_tokens")).over(wLocal))
    val wOff = Window.partitionBy(col(sourceCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("__pid"), col(sourceCol))
      .agg(sum(col("n_tokens")).as("__ptok"))
      .withColumn("__off", coalesce(sum(col("__ptok")).over(wOff), lit(0L)))
      .select(col("__pid"), col(sourceCol), col("__off"))
    local
      .join(broadcast(offsets), Seq("__pid", sourceCol))
      .join(broadcast(budgets), Seq(sourceCol))
      .withColumn("cum_before", col("__off") + col("__cum_local") - col("n_tokens"))
      .filter(col("cum_before") < col("__budget"))
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("cum_before"))
  }

  /** Deterministic k-negative sampling for contrastive training: every
    * row gets `k` pseudo-random partners, uniform-ish, never itself,
    * reproducible across runs/partitionings/engines. Rows are placed on a
    * RING by md5 rank ([[Layout.globalRowNumber]] — the distributed rank,
    * no single-partition window); partner j of position p is position
    * `((p − 1 + off_j) mod n) + 1` with evenly spaced strides
    * `off_j = 1 + (j−1)·(n−1) div k ∈ [1, n−1]` — stride positions on a
    * hash-shuffled ring are pseudo-random pairings, and the arithmetic is
    * exactly replayable in SQL (vs. rand(): seed/partition-dependent).
    * Strides are distinct while k ≤ n−1 (no duplicate partners).
    *
    * Cost: one ranked exchange + one join keyed on position (k-fold
    * explode happens on the tiny (pos, id) projection, not the payload). */
  def negativeSample(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val ranked = Layout.globalRowNumber(
      df.select(col(idCol),
        md5(concat(lit("neg:"), col(idCol).cast("string"))).as("__h")),
      Seq("__h", idCol), "pos")
      .select(col(idCol), col("pos"))
    val n = broadcast(ranked.agg(count(lit(1)).cast("long").as("__n")))
    val anchors = ranked.crossJoin(n)
      .select(col(idCol).as("anchor_id"), col("pos"), col("__n"),
        explode(expr(s"sequence(1L, ${k}L)")).as("j"))
      .withColumn("__off",
        lit(1L) + (col("j") - 1L) * (col("__n") - 1L) / lit(k.toLong))
      .withColumn("__off", col("__off").cast("long"))
      .withColumn("partner_pos",
        pmod(col("pos") - 1L + col("__off"), col("__n")) + 1L)
    anchors.join(
        ranked.select(col("pos").as("partner_pos"), col(idCol).as("neg_id")),
        Seq("partner_pos"))
      .select(col("anchor_id"), col("j"), col("neg_id"))
  }

  /** Cumulative Poisson(1) CDF scaled to the 60-bit hash domain:
    * T_j = floor(P(X ≤ j)·2^60) for j = 0..7. A hash h drawn uniformly on
    * [0, 2^60) maps to the Poisson weight #{j : h ≥ T_j} — the inverse-CDF
    * lookup as eight integer compares. Truncation at 8 (P ≈ 1e-6) is part
    * of the estimator's definition, identically on both engines. */
  lazy val poissonThresholds: Seq[Long] = {
    val fact = (0 to 7).scanLeft(1.0)((a, i) => a * (i + 1)).take(8) // 0!..7!
    val cdf = fact.map(1.0 / _).scanLeft(0.0)(_ + _).tail.map(_ * math.exp(-1.0))
    cdf.map(f => (f * math.pow(2, 60)).toLong)
  }

  /** Weighted sampling WITHOUT replacement, exact size n — the
    * Efraimidis–Spirakis exponential-key trick: each row draws key =
    * ln(u)/w with u deterministic from the md5 kernel, and the n LARGEST
    * keys are a weighted-without-replacement sample (inclusion ∝ weight,
    * no sequential reservoir state — each key is independent, so the
    * "reservoir" distributes as a TakeOrdered top-n: per-partition heaps,
    * n rows to one reducer, never a global sort). Complements
    * [[weightedSample]] (Bernoulli by weight, random SIZE) when the
    * training mix needs an exact budget. Weights must be positive. */
  def weightedReservoir(
      df: DataFrame, idCol: String, weightCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    val u = (graft.functions.TextFunctions.tokenHash60(
      concat(lit("wr:"), col(idCol).cast("string"))).cast("double") + 1.0) /
      lit(math.pow(2, 60))
    df.withColumn("es_key", log(u) / col(weightCol).cast("double"))
      .sort(col("es_key").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col(weightCol), round(col("es_key") * 1e6, 0)
        .cast("long").as("es_key_micro"))
  }

  /** Poisson bootstrap confidence intervals — THE distributed bootstrap:
    * classical resampling needs n draws with a global view, but
    * Poisson(1) per-row weights are iid-independent of everything else,
    * so each replicate's weighted sum assembles in the same map-side
    * combine as a plain aggregate. Weights are deterministic (md5 of
    * (replicate, id) against [[poissonThresholds]]), so the whole CI is a
    * pure function of the data — reproducible across runs, partitionings,
    * and engines. Emits per group: row count, the full-sample mean, and
    * the [2nd smallest, 2nd largest] of the `b` replicate means (≈ 94%
    * coverage at b = 32).
    *
    * Scale shape: one ×b row multiply (narrow), one combine-heavy
    * aggregate to g×b cells, then windows over ≤ b rows per group —
    * nothing unbounded ever sorts. Replicates with zero total weight
    * (possible only on tiny groups) drop out before ranking, identically
    * in the SQL replay. */
  /** Effective sample size of a weighted sample per key — "how many
    * UNWEIGHTED rows is this weighted set worth?": ESS = (Σw)²/Σw²,
    * the Kish formula every importance-weighted mixture
    * ([[mixtureSample]], [[tokenBudgetMix]]) should report next to its
    * raw count — 1M rows at wildly skewed weights can carry the
    * information of 10k. Exact integer weight moments (DECIMAL Σw²),
    * one aggregate. */
  def effectiveSampleSize(
      df: DataFrame, keyCol: String, weightCol: String): DataFrame = {
    val w = col(weightCol).cast("long")
    df.filter(w > 0L)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(w).cast("long").as("sw"),
        sum((w * w).cast("decimal(38,0)")).as("sww"))
      .withColumn("ess", expr(essSql))
      .withColumn("ess_ratio", expr(
        s"round($essSql / n, 6)"))
      // exposed DECIMAL → STRING (r10 decimal contract; ESS consumed the
      // exact decimal already)
      .withColumn("sww", col("sww").cast("string"))
  }

  /** (Σw)²/Σw² over the exact moment row. Shared with the oracle. */
  val essSql: String =
    "round(CAST(sw AS DOUBLE) * sw / CAST(sww AS DOUBLE), 6)"

  /** Randomization (permutation-style) test for a mean difference —
    * the assumption-free p-value next to the t-test: re-assign arms by
    * a DETERMINISTIC per-replicate hash parity (the [[bootstrapCi]]
    * md5 discipline — reproducible across engines and partitionings),
    * recompute |Δmean| per replicate from exact integer sums, and
    * p = (#{|Δ_b| ≥ |Δ_obs|} + 1)/(B + 1). Arm sizes vary binomially
    * per replicate (a randomization test under exchangeability, not a
    * fixed-margin permutation — documented choice, same null).
    * Scale shape: one ×B row multiply into a combine-heavy aggregate
    * to B cells — the bootstrapCi plan. */
  def permTest(
      df: DataFrame, idCol: String, armCol: String, valCol: String,
      b: Int = 64): DataFrame = {
    require(b >= 8, s"b must be >= 8: $b")
    val v = col(valCol).cast("long")
    val base = broadcast(df.agg(
        sum(when(col(armCol), 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col(armCol), v).otherwise(0L)).cast("long").as("s_a"),
        sum(when(!col(armCol), 1L).otherwise(0L)).cast("long").as("n_b"),
        sum(when(!col(armCol), v).otherwise(0L)).cast("long").as("s_b"))
      .withColumn("obs_delta_micro", expr(permDeltaMicroSql))
      .select(col("n_a").as("obs_n_a"), col("n_b").as("obs_n_b"),
        col("obs_delta_micro")))
    val ra = expr(
      s"""pmod(CAST(conv(substring(md5(concat('perm', CAST(r AS STRING),
         |  ':', CAST($idCol AS STRING))), 1, 15), 16, 10) AS BIGINT), 2)
         |  = 0""".stripMargin)
    df.withColumn("r", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("ra", ra)
      .groupBy(col("r"))
      .agg(sum(when(col("ra"), 1L).otherwise(0L)).cast("long").as("n_a"),
        sum(when(col("ra"), v).otherwise(0L)).cast("long").as("s_a"),
        sum(when(!col("ra"), 1L).otherwise(0L)).cast("long").as("n_b"),
        sum(when(!col("ra"), v).otherwise(0L)).cast("long").as("s_b"))
      .withColumn("delta_micro", expr(permDeltaMicroSql))
      .filter(col("delta_micro").isNotNull)
      .crossJoin(base)
      .agg(count(lit(1)).cast("long").as("n_reps"),
        sum(when(col("delta_micro") >= col("obs_delta_micro"), 1L)
          .otherwise(0L)).cast("long").as("n_ge"),
        max(col("obs_n_a")).as("n_a"), max(col("obs_n_b")).as("n_b"),
        max(col("obs_delta_micro")).as("obs_delta_micro"))
      .withColumn("obs_delta", expr(
        "round(CAST(obs_delta_micro AS DOUBLE) / 1000000, 6)"))
      .withColumn("p", expr(permPSql))
      .withColumn("significant", expr(s"$permPSql < 0.05"))
      .select(col("n_a"), col("n_b"), col("n_reps"), col("n_ge"),
        col("obs_delta"), col("p"), col("significant"))
  }

  /** |mean_a − mean_b| in micro units over the four exact sums; NULL
    * when an arm is empty. Shared with the oracle. */
  val permDeltaMicroSql: String =
    "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      "CAST(ROUND(ABS(CAST(s_a AS DOUBLE) / n_a - " +
      "CAST(s_b AS DOUBLE) / n_b) * 1000000, 0) AS BIGINT) END"

  /** Add-one randomization p over (n_ge, n_reps). Shared with the
    * oracle. */
  val permPSql: String =
    "round(CAST(n_ge + 1 AS DOUBLE) / (n_reps + 1), 6)"

  def bootstrapCi(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valCol: String,
      b: Int = 32): DataFrame = {
    require(b >= 4, s"b must be >= 4: $b")
    import org.apache.spark.sql.expressions.Window
    val base = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        round(sum(col(valCol)).cast("double") /
          count(lit(1)).cast("double"), 6).as("point_est"))
    val h = expr(
      s"""CAST(conv(substring(md5(concat('bs', CAST(b AS STRING), ':',
         |  CAST($idCol AS STRING))), 1, 15), 16, 10) AS BIGINT)""".stripMargin)
    val w = poissonThresholds.map(t => when(h >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _)
    val reps = df
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("w", w)
      .groupBy(col(groupCol), col("b"))
      .agg(sum(col("w")).cast("long").as("wn"),
        sum(col("w") * col(valCol)).cast("long").as("ws"))
      .filter(col("wn") > 0)
      .withColumn("mean_b",
        round(col("ws").cast("double") / col("wn").cast("double"), 6))
    val wOrd = Window.partitionBy(col(groupCol))
      .orderBy(col("mean_b"), col("b"))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = reps
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_reps", count(lit(1)).over(wAll))
    val ci = ranked.groupBy(col(groupCol)).agg(
      max(when(col("rn") === 2, col("mean_b"))).as("ci_lo"),
      max(when(col("rn") === col("n_reps") - 1, col("mean_b"))).as("ci_hi"))
    base.join(ci, Seq(groupCol))
  }

  /** Chapman capture–recapture estimate of a distinct population from
    * two DETERMINISTIC hash captures — "how many distinct ids exist if
    * we can only afford to look at halves?": capture A keeps ids with
    * hash("capA:"+id) even, capture B with hash("capB:"+id) even
    * (independent md5 salts, the [[weightedSample]] discipline), and
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 from the overlap m. The exact distinct
    * count and the relative error ship IN-ROW (the kmvDistinct
    * pattern), so the estimator audits itself wherever the exact count
    * is still affordable. One distinct reduction + one conditional
    * aggregate; no seed, so the SQL oracle replays it bit-for-bit. */
  def captureRecapture(df: DataFrame, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).cast("string").as("id")).distinct()
    ids
      .select(
        (graft.functions.TextFunctions.tokenHash60(
          concat(lit("capA:"), col("id"))) % 2L === 0L).as("in_a"),
        (graft.functions.TextFunctions.tokenHash60(
          concat(lit("capB:"), col("id"))) % 2L === 0L).as("in_b"))
      .agg(count(lit(1)).cast("long").as("exact_distinct"),
        sum(when(col("in_a"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(col("in_b"), 1L).otherwise(0L)).cast("long").as("n2"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
          .cast("long").as("m"))
      .withColumn("est", expr(chapmanSql))
      .withColumn("rel_err", expr(
        s"CASE WHEN exact_distinct > 0 THEN round(abs($chapmanSql / " +
          "exact_distinct - 1), 6) END"))
  }

  /** Chapman N̂ over (n1, n2, m). Shared with the oracle. */
  val chapmanSql: String =
    "round((CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1) / " +
      "(CAST(m AS DOUBLE) + 1) - 1, 6)"

  /** Neyman (optimal) allocation for stratified sampling — the
    * design-side operator before any stratified draw: with a total
    * budget n, stratum h gets n_h ∝ N_h·s_h (population size × value
    * standard deviation), minimizing the estimator variance. Weights
    * are MICRO-QUANTIZED — w = round(10⁶·N_h·s_h) from exact integer
    * moments (squares in decimal internally), so the cross-stratum
    * weight total is an exact long and each allocation is one
    * exact integer arithmetic throughout. Strata with n < 2 or zero
    * variance carry weight 0 (no variance estimate → Neyman assigns
    * nothing; route them to a fixed floor upstream if they must be
    * sampled).
    *
    * Allocations sum EXACTLY to totalN (largest-remainder method):
    * each stratum takes the floor of its exact share
    * (totalN·w div Σw, decimal(38,0) numerator so no overflow), and
    * the ≤ #strata−1 leftover units go to the largest fractional
    * remainders, ties broken by stratum value — independent round()
    * per stratum can drift off the budget by several units with many
    * strata. The one unpartitioned window ranks STRATA (a design-side
    * table, small by definition), not data rows. */
  def neymanAllocation(
      df: DataFrame, stratumCol: String, valCol: String,
      totalN: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(totalN > 0, s"totalN must be positive: $totalN")
    val m = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).cast("long").as("n_pop"),
        sum(col(valCol).cast("long")).cast("long").as("sx"),
        sum(col(valCol).cast("long").cast("decimal(38,0)") *
          col(valCol).cast("long")).cast("decimal(38,0)").as("__sxx"))
      .withColumn("sd", expr(neymanSdSql))
      .withColumn("w_micro", expr(
        "CAST(round(1000000 * n_pop * coalesce(sd, 0), 0) AS BIGINT)"))
      .drop("__sxx")
    val tot = broadcast(
      m.agg(sum(col("w_micro")).cast("long").as("__wt")))
    val base = m.crossJoin(tot)
      .withColumn("__num",
        col("w_micro").cast("decimal(38,0)") * lit(totalN))
      .withColumn("__base", expr(
        "CASE WHEN __wt > 0 THEN __num div __wt " +
          "ELSE CAST(0 AS BIGINT) END"))
      .withColumn("__rem", expr(
        "CASE WHEN __wt > 0 THEN CAST(__num - " +
          "CAST(__base AS DECIMAL(38,0)) * __wt AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END"))
    val deficit = broadcast(base.agg(
      when(max(col("__wt")) > 0, lit(totalN) - sum(col("__base")))
        .otherwise(lit(0L)).cast("long").as("__def")))
    val rk = Window.orderBy(col("__rem").desc, col(stratumCol))
    base.crossJoin(deficit)
      .withColumn("__rk", row_number().over(rk).cast("long"))
      .withColumn("alloc",
        (col("__base") +
          when(col("__rk") <= col("__def"), 1L).otherwise(0L))
          .cast("long"))
      .drop("__wt", "__num", "__base", "__rem", "__def", "__rk")
  }

  /** Sample standard deviation over (n_pop, sx, __sxx); NULL when
    * n < 2 or the variance degenerates. Shared with the oracle. */
  val neymanSdSql: String = {
    val v = "((CAST(__sxx AS DOUBLE) - CAST(sx AS DOUBLE) * " +
      "(CAST(sx AS DOUBLE) / n_pop)) / (n_pop - 1))"
    s"CASE WHEN n_pop > 1 AND $v > 0 THEN round(sqrt($v), 6) END"
  }

  /** Greedy maximum-coverage selection — the SUBMODULAR curation step:
    * pick `k` documents maximizing the number of distinct n-grams
    * covered, one greedy argmax at a time (the classical (1 − 1/e)
    * guarantee). "Which k docs summarize the corpus's content?" — the
    * coverage-driven complement of diversity sampling's
    * embedding-space spread. Fully deterministic: marginal gains are
    * exact integer counts of UNCOVERED n-grams, argmax ties break on
    * the lowest doc_id, and a document whose n-grams are all covered
    * leaves the candidate pool (so selection stops early when nothing
    * gains — never a zero-gain pick). Because greedy gains are
    * disjoint sets, the running covered total is the prefix sum of
    * gains.
    *
    * Plan: the n-gram table materializes ONCE; each of the ≤ k steps
    * is one anti-join + one count aggregate + a 1-row argmax (the
    * driver reads one row per step — the same bounded scalar the
    * CC convergence count reads). At 100 TB: work per step is one
    * shuffle over surviving n-gram instances; k is a constant. */
  def greedyMaxCover(
      docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, n: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = docs.sparkSession
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val ex = graft.Materialize(
      Dedup.shingleSigTable(docs, idCol, textCol, n, numHashes = 0)
        .select(col(idCol).as("__id"), explode(col("__sh")).as("__g")))
    var covered = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("__g", ex.schema("__g").dataType))))
    val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var step = 1
    var done = false
    while (step <= k && !done) {
      val pick = ex.join(covered, Seq("__g"), "left_anti")
        .groupBy(col("__id"))
        .agg(count(lit(1)).cast("long").as("gain"))
        .orderBy(col("gain").desc, col("__id"))
        .limit(1).collect()
      pick.headOption match {
        case Some(r) =>
          val id = r.getLong(0)
          picks += ((step.toLong, id, r.getLong(1)))
          covered = graft.Materialize(
            covered.unionByName(
              ex.filter(col("__id") === id).select(col("__g")))
              .distinct())
          step += 1
        case None => done = true
      }
    }
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("step"))
    picks.toSeq.toDF("step", idCol, "gain")
      .withColumn("covered_total",
        sum(col("gain")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)).cast("long"))
  }
}
