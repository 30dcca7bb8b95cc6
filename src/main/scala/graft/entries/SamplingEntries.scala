package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Sampling-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object SamplingEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, dir) =>
      // Context-window packing: per-shard exclusive-prefix-sum bins
      // (overflow bounded by one doc — the parallel packing contract).
      Sampling.packSequences(table(s, dir, "documents"), budgetTokens = 512L, shards = 16)),
    "q_hash_sample" -> ((s, dir) =>
      // Deterministic ~5% sample by portable md5 bucket — reproducible
      // across engines/partitionings, unlike df.sample().
      graft.operators.Sampling
        .sampleByHash(
          table(s, dir, "events").select(col("event_id"), col("user_id"), col("event_type")),
          "event_id", pct = 5)
        .withColumn("hb", graft.operators.Sampling.hashBucket(col("event_id"), 100))),
    "q_stratified_sample" -> ((s, dir) =>
      // Per-language keep rates (downsample dominant strata, keep rare ones)
      // with stratum-salted hash buckets — deterministic, filter pushes down.
      graft.operators.Sampling.stratifiedSample(
        table(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        "doc_id", "lang",
        pcts = Map("en" -> 60, "fr" -> 30, "es" -> 15), defaultPct = 10)),
    "q_mixture_sample" -> ((s, dir) =>
      // Data-mixing: per-domain ppm-quantized keep rates toward target
      // corpus shares (src3 lands exactly at rate 1.0 — the cap boundary;
      // src4 over-caps; absent domains drop to 0).
      Sampling.mixtureSample(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 0.002, "src1" -> 0.01, "src2" -> 0.02,
          "src3" -> 0.05, "src4" -> 0.08))
        .select(col("doc_id"), col("source"), col("keep_ppm"))),
    "q_histogram_equalize" -> ((s, dir) =>
      // Flatten the document-length histogram (100-char bins): every bin
      // downsampled to the smallest bin's volume, ppm rates derived from
      // the data's own counts — exact integer math, oracle-replayable.
      Sampling.histogramEqualize(
        table(s, dir, "documents")
          .select(col("doc_id"), expr("n_chars div 100").as("len_bin")),
        "doc_id", "len_bin")
        .select(col("doc_id"), col("len_bin"), col("keep_ppm"))),
    "q_budget_select" -> ((s, dir) => {
      // Quality-first selection: same per-source budgets as
      // q_token_budget_mix but filled LONGEST-DOC-FIRST (-n_chars as the
      // quality proxy) instead of hash order — the greedy
      // select-best-under-budget curation step.
      val d = table(s, dir, "documents")
      val w = d.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      Sampling.tokenBudgetSelect(d, w, totalBudget = 10000L, orderCol = -col("n_chars"))
    }),
    "q_token_budget_mix" -> ((s, dir) => {
      // Exact token-budget mixing: per-source integer weights derived from
      // the source NAME (ascii of last char % 3 + 1 — sf-independent), 10k
      // total token budget, admission in md5(doc_id) order via the
      // distributed prefix sum (range partition + per-partition offsets).
      val d = table(s, dir, "documents")
      val w = d.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      Sampling.tokenBudgetMix(d, w, totalBudget = 10000L)
    }),
    "q_weighted_sample" -> ((s, dir) => {
      // Quality-weighted curation: keep probability = min(n_chars·1250,
      // 1e6) micro-units — exact integer weights end-to-end, so the
      // keep set is bit-stable across engines and partitionings.
      val docs = table(s, dir, "documents")
        .withColumn("w_micro", least(col("n_chars") * 1250L, lit(1000000L)))
      Sampling.weightedSample(docs, "doc_id", col("w_micro"))
        .select(col("doc_id"), col("n_chars"), col("w_micro"))
    }),
    "q_negative_sample" -> ((s, dir) =>
      // Contrastive-training negatives: 3 deterministic pseudo-random
      // partners per doc via evenly spaced strides on the md5-rank ring —
      // reproducible across runs/partitionings, never self.
      Sampling.negativeSample(table(s, dir, "documents"), "doc_id", k = 3)),
    "q_bootstrap_ci" -> ((s, dir) => {
      // Poisson-bootstrap 94% CI of mean order value per market segment —
      // 32 deterministic replicates assembled map-side (per-row md5
      // Poisson weights), CI = 2nd smallest / 2nd largest replicate mean.
      val o = table(s, dir, "orders")
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      Sampling.bootstrapCi(o, "c_mktsegment", "o_orderkey", "cents", b = 32)
    }),
    "q_weighted_reservoir" -> ((s, dir) =>
      // Exact-size weighted sample without replacement: 100 docs by
      // Efraimidis–Spirakis exponential keys over n_chars — per-partition
      // top-n heaps, no reservoir state, no global sort.
      Sampling.weightedReservoir(
        table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 100)),
    "q_ess" -> ((s, dir) =>
      // How many unweighted users is the spend-weighted sample worth
      // per type? Kish ESS from exact weight moments.
      Sampling.effectiveSampleSize(
        table(s, dir, "events").groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("w")),
        "event_type", "w")),
    "q_perm_test" -> ((s, dir) => {
      // Assumption-free p for the parity-arm spend difference: 64
      // deterministic hash re-randomizations, exact integer sums,
      // add-one p.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)) === 0L)
      Sampling.permTest(users, "user_id", "arm", "spend")
    }),
    "q_capture_recapture" -> ((s, dir) =>
      // Chapman estimate of the distinct-visitor population from two
      // deterministic hash captures, audited in-row against the exact
      // count — the two-sample cousin of q_kmv_distinct.
      Sampling.captureRecapture(table(s, dir, "events"), "user_id")),
    "q_neyman" -> ((s, dir) => {
      // Neyman allocation of a 1000-row sample budget across event
      // types by N_h * s_h of user-event spend (micro-quantized
      // weights, exact integer moments).
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Sampling.neymanAllocation(
        ev, "event_type", "cents", totalN = 1000L)
    }),
    "q_max_cover" -> ((s, dir) => {
      // Greedy maximum-coverage curation: the 5 documents that cover
      // the most distinct 3-gram shingles, one exact-integer argmax at
      // a time (disjoint gains -> covered_total is their prefix sum).
      graft.operators.Sampling.greedyMaxCover(
        table(s, dir, "documents"), "doc_id", "text", k = 5, n = 3)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_ess" ->
      s"""WITH u AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS w
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(w) AS BIGINT) AS sw,
         |    CAST(SUM(CAST(w AS DECIMAL(38,0)) * w) AS DECIMAL(38,0))
         |      AS sww
         |  FROM u WHERE w > 0 GROUP BY 1)
         |SELECT event_type, n, sw, CAST(sww AS VARCHAR) AS sww,
         |  ${graft.operators.Sampling.essSql} AS ess,
         |  round(${graft.operators.Sampling.essSql} / n, 6) AS ess_ratio
         |FROM a""".stripMargin,
    "q_perm_test" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    user_id % 2 = 0 AS arm
         |  FROM events GROUP BY user_id),
         |base AS (SELECT
         |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN arm THEN spend ELSE 0 END) AS BIGINT)
         |      AS s_a,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE spend END) AS BIGINT)
         |      AS s_b
         |  FROM u),
         |ob AS (SELECT n_a AS obs_n_a, n_b AS obs_n_b,
         |    ${graft.operators.Sampling.permDeltaMicroSql}
         |      AS obs_delta_micro FROM base),
         |tagged AS (SELECT u.user_id, u.spend, rr.r,
         |    (CAST('0x' || substr(md5('perm' || CAST(rr.r AS VARCHAR) ||
         |      ':' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2)
         |      = 0 AS ra
         |  FROM u CROSS JOIN (SELECT unnest(range(0, 64)) AS r) rr),
         |reps AS (SELECT r,
         |    CAST(SUM(CASE WHEN ra THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN ra THEN spend ELSE 0 END) AS BIGINT)
         |      AS s_a,
         |    CAST(SUM(CASE WHEN ra THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN ra THEN 0 ELSE spend END) AS BIGINT)
         |      AS s_b
         |  FROM tagged GROUP BY r),
         |rd AS (SELECT r,
         |    ${graft.operators.Sampling.permDeltaMicroSql} AS delta_micro
         |  FROM reps),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
         |    CAST(SUM(CASE WHEN delta_micro >= obs_delta_micro THEN 1
         |      ELSE 0 END) AS BIGINT) AS n_ge,
         |    CAST(MAX(obs_n_a) AS BIGINT) AS n_a,
         |    CAST(MAX(obs_n_b) AS BIGINT) AS n_b,
         |    CAST(MAX(obs_delta_micro) AS BIGINT) AS obs_delta_micro
         |  FROM rd, ob WHERE delta_micro IS NOT NULL)
         |SELECT n_a, n_b, n_reps, n_ge,
         |  round(CAST(obs_delta_micro AS DOUBLE) / 1000000, 6)
         |    AS obs_delta,
         |  ${graft.operators.Sampling.permPSql} AS p,
         |  ${graft.operators.Sampling.permPSql} < 0.05 AS significant
         |FROM agg""".stripMargin,
    "q_pack_sequences" ->
      """SELECT doc_id, n_tokens, shard,
        |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_tokens,
        |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
        |FROM (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |        doc_id % 16 AS shard FROM documents)""".stripMargin,
    "q_hash_sample" ->
      """SELECT event_id, user_id, event_type, hb FROM (
        |  SELECT event_id, user_id, event_type,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS hb
        |  FROM events)
        |WHERE hb < 5""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 <
        |  CASE WHEN lang = 'en' THEN 60 WHEN lang = 'fr' THEN 30
        |       WHEN lang = 'es' THEN 15 ELSE 10 END""".stripMargin,
    "q_mixture_sample" ->
      // CAST targets to DOUBLE (bare 0.002 is DECIMAL in DuckDB — different
      // rounding than Spark's double lit); op order (t*n)/c then *1e6 then
      // floor matches Sampling.mixtureSample bit-for-bit
      """WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS c FROM documents GROUP BY source),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        |r AS (SELECT source,
        |    CAST(floor(least(1.0, t * n / c) * 1e6) AS BIGINT) AS keep_ppm
        |  FROM (SELECT source, c,
        |      CASE source WHEN 'src0' THEN CAST(0.002 AS DOUBLE)
        |                  WHEN 'src1' THEN CAST(0.01 AS DOUBLE)
        |                  WHEN 'src2' THEN CAST(0.02 AS DOUBLE)
        |                  WHEN 'src3' THEN CAST(0.05 AS DOUBLE)
        |                  WHEN 'src4' THEN CAST(0.08 AS DOUBLE)
        |                  ELSE CAST(0.0 AS DOUBLE) END AS t
        |    FROM c) CROSS JOIN n)
        |SELECT d.doc_id, d.source, r.keep_ppm
        |FROM documents d JOIN r USING (source)
        |WHERE CAST('0x' || substr(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000 < r.keep_ppm""".stripMargin,
    "q_histogram_equalize" ->
      """WITH b AS (SELECT doc_id, n_chars // 100 AS len_bin FROM documents),
        |c AS (SELECT len_bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
        |m AS (SELECT min(c) AS mn FROM c),
        |r AS (SELECT len_bin, CAST(mn * 1000000 // c AS BIGINT) AS keep_ppm FROM c, m)
        |SELECT b.doc_id, b.len_bin, r.keep_ppm
        |FROM b JOIN r USING (len_bin)
        |WHERE CAST('0x' || substr(md5(CAST(b.len_bin AS VARCHAR) || ':' || CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000 < r.keep_ppm""".stripMargin,
    "q_budget_select" ->
      // Same CTEs as q_token_budget_mix with the cumsum ordered by
      // (-n_chars, doc_id) — longest-first greedy fill.
      """WITH w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
        |b AS (SELECT source, CAST(10000 * wt // denom AS BIGINT) AS budget FROM w, tot),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, -n_chars AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_before
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum_before < b.budget""".stripMargin,
    "q_token_budget_mix" ->
      // The oracle uses the NAIVE per-source window cumsum — an independent
      // formulation of the same prefix sum the distributed form computes;
      // `//` keeps the budget floor in integer math.
      """WITH w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
        |b AS (SELECT source, CAST(10000 * wt // denom AS BIGINT) AS budget FROM w, tot),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_before
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum_before < b.budget""".stripMargin,
    "q_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  CAST(least(n_chars * 1250, 1000000) AS BIGINT) AS w_micro
        |FROM documents
        |WHERE CAST('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000 < least(n_chars * 1250, 1000000)""".stripMargin,
    "q_negative_sample" ->
      """WITH r AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5('neg:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        |p AS (SELECT doc_id AS anchor_id, CAST(j AS BIGINT) AS j,
        |    ((pos - 1 + 1 + (j - 1) * (n - 1) // 3) % n) + 1 AS partner_pos
        |  FROM (SELECT doc_id, pos, n, unnest(range(1, 4)) AS j FROM r, n))
        |SELECT anchor_id, j, b.doc_id AS neg_id
        |FROM p JOIN r b ON b.pos = p.partner_pos""".stripMargin,
    "q_bootstrap_ci" -> {
      val wExpr = graft.operators.Sampling.poissonThresholds
        .map(t => s"CASE WHEN h >= ${t} THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH o AS (SELECT c_mktsegment AS g, o_orderkey AS id,
         |    CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS v
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |base AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS point_est
         |  FROM o GROUP BY g),
         |reps AS (SELECT g, b, v, CAST('0x' || substr(md5('bs' ||
         |      CAST(b AS VARCHAR) || ':' || CAST(id AS VARCHAR)), 1, 15)
         |    AS BIGINT) AS h
         |  FROM o, (SELECT unnest(range(0, 32)) AS b)),
         |wts AS (SELECT g, b, (${wExpr}) AS w, v FROM reps),
         |cells AS (SELECT g, b, CAST(SUM(w) AS BIGINT) AS wn,
         |    CAST(SUM(w*v) AS BIGINT) AS ws FROM wts GROUP BY g, b),
         |means AS (SELECT g, b,
         |    round(CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE), 6) AS mean_b
         |  FROM cells WHERE wn > 0),
         |ranked AS (SELECT g, mean_b,
         |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY mean_b, b) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n_reps FROM means),
         |ci AS (SELECT g, max(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
         |    max(CASE WHEN rn = n_reps - 1 THEN mean_b END) AS ci_hi
         |  FROM ranked GROUP BY g)
         |SELECT base.g AS c_mktsegment, n_rows, point_est, ci_lo, ci_hi
         |FROM base JOIN ci ON base.g = ci.g""".stripMargin
    },
    "q_weighted_reservoir" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |    ln((CAST('0x' || substr(md5('wr:' || CAST(doc_id AS VARCHAR)),
        |      1, 15) AS BIGINT) + 1.0) / power(2, 60)) / n_chars AS es_key
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(ROUND(es_key * 1000000, 0) AS BIGINT) AS es_key_micro
        |FROM k ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin,
    "q_capture_recapture" ->
      s"""WITH ids AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS id
         |  FROM events),
         |h AS (SELECT
         |    CAST('0x' || substr(md5('capA:' || id), 1, 15) AS BIGINT)
         |      % 2 = 0 AS in_a,
         |    CAST('0x' || substr(md5('capB:' || id), 1, 15) AS BIGINT)
         |      % 2 = 0 AS in_b
         |  FROM ids),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct,
         |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS m
         |  FROM h)
         |SELECT exact_distinct, n1, n2, m,
         |  ${graft.operators.Sampling.chapmanSql} AS est,
         |  CASE WHEN exact_distinct > 0 THEN
         |    round(abs(${graft.operators.Sampling.chapmanSql} /
         |      exact_distinct - 1), 6) END AS rel_err
         |FROM a""".stripMargin,
    "q_neyman" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pop,
         |    CAST(SUM(v) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
         |      AS __sxx
         |  FROM e GROUP BY 1),
         |w AS (SELECT event_type, n_pop, sx,
         |    ${graft.operators.Sampling.neymanSdSql} AS sd FROM m),
         |w2 AS (SELECT event_type, n_pop, sx, sd,
         |    CAST(round(1000000 * n_pop * coalesce(sd, 0), 0) AS BIGINT)
         |      AS w_micro FROM w),
         |tt AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wt FROM w2),
         |b AS (SELECT event_type, n_pop, sx, sd, w_micro, wt,
         |    CASE WHEN wt > 0 THEN CAST((CAST(1000 AS HUGEINT) *
         |      w_micro) // wt AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |      AS base,
         |    CASE WHEN wt > 0 THEN CAST((CAST(1000 AS HUGEINT) *
         |      w_micro) % wt AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |      AS rem
         |  FROM w2, tt),
         |d AS (SELECT CASE WHEN MAX(wt) > 0 THEN
         |    1000 - CAST(SUM(base) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS def FROM b),
         |r AS (SELECT *, row_number() OVER
         |    (ORDER BY rem DESC, event_type) AS rk FROM b)
         |SELECT event_type, n_pop, sx, sd, w_micro,
         |  CAST(base + CASE WHEN rk <= def THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc
         |FROM r, d""".stripMargin,
    "q_max_cover" -> maxCoverOracle,
  )
}
