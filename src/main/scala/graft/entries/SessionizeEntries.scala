package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Sessionize-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object SessionizeEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize_gap" -> ((s, dir) => {
      Sessionize
        .gapSessionize(table(s, dir, "events"))
        .select(
          col("event_id"),
          col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("session_id"),
          col("session_idx"),
          col("duration"))
    }),
    "q_sessionize_full" -> ((s, dir) => {
      // Full reference rule set (gap + 1499-event + 12 h cuts); the
      // sequential per-key machine is replayed by the recursive-CTE oracle
      // (fullSessionizeSql) — one state advance per recursion step.
      Sessionize
        .fullSessionize(table(s, dir, "events"))
        .select(
          col("tieBreak").as("event_id"),
          col("key").cast("long").as("user_id"),
          col("tsMillis").as("ts_ms"),
          col("sessionId").as("session_id"),
          col("sessionIdx").as("session_idx"),
          col("duration"))
    }),
    "q_session_duration" -> ((s, dir) => {
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      Sessionize.sessionDurationPerUser(sess)
    }),
    "q_loyal_visitors" -> ((s, dir) => {
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      Sessionize.loyalUsers(sess)
    }),
    "q_session_summary" -> ((s, dir) => {
      // Custom typed Aggregator (UDAF surface): one-pass per-session stats
      // over the gap-sessionized events, then a per-user rollup.
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      val stats = udaf(graft.functions.SessionStatsAggregator)
      sess
        .groupBy(col("user_id"), col("session_id"))
        .agg(stats(col("duration")).as("st"))
        .select(col("user_id"), col("session_id"),
          col("st.n_events").as("n_events"),
          col("st.max_duration").as("max_duration"),
          col("st.min_duration").as("min_duration"))
    }),
    "q_parse_elb" -> ((s, dir) => {
      // End-to-end reference-native path: synthesize ELB-style lines from the
      // events table (deterministic), push them through the tolerant parser,
      // emit (ip, ts_ms). The oracle recomputes the expectation from events
      // directly — if the parser mangles anything, hashes diverge.
      val lines = table(s, dir, "events").select(
        format_string(
          "%s elb u%d:%d 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1",
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("user_id"),
          col("event_id")).as("value"))
      ElbLogParser.parse(lines)
        .select(col("ip"), unix_millis(col("ts")).as("ts_ms"))
    }),

    // ---- Training-data pipeline extensions (SURVEY §2.8 / north star)
    "q_retention" -> ((s, dir) => {
      // Cohort retention triangle over the events table (first-active-day
      // cohorts, distinct actives per day offset 0..7).
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.cohortRetention(ev, maxOffsetDays = 7)
    }),
    "q_funnel" -> ((s, dir) => {
      // view -> click -> purchase funnel, first-touch ordered semantics;
      // -1 sentinels for unreached steps keep the schema oracle-stable.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize
        .funnel(ev, Seq("view", "click", "purchase"))
        .select(col("user_id"), col("t1"),
          coalesce(col("t2"), lit(-1L)).as("t2"),
          coalesce(col("t3"), lit(-1L)).as("t3"),
          col("stage"))
    }),
    "q_markov_transitions" -> ((s, dir) => {
      // First-order event-type transition matrix over per-user ordered
      // clickstreams — the post-sessionize navigation analytics the
      // reference's README motivates. (event_id tie-break pins equal-ts
      // neighbors; p row-normalizes per from_type.)
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.markovTransitions(ev)
    }),
    "q_session_entry_exit" -> ((s, dir) => {
      // Landing/exit-page analytics per session (README.md:42-50 family):
      // entry/exit event type, size, duration, bounce flag.
      val sess = graft.operators.Sessionize.gapSessionize(table(s, dir, "events"))
      graft.operators.Sessionize.sessionEntryExit(sess)
    }),
    "q_rfm" -> ((s, dir) => {
      // RFM quintile segmentation of visitors (recency/frequency/monetary,
      // 5 = best on every axis; user_id tie-break pins ntile determinism).
      graft.operators.Sessionize.rfm(table(s, dir, "events"))
    }),
    "q_seq_match" -> ((s, dir) => {
      // MATCH_RECOGNIZE-lite: per-user event stream as a char-coded string,
      // count non-overlapping 'view …(clicks/errors)… purchase' runs and
      // the first match position.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.sequenceMatch(ev,
        codes = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
          "signup" -> "s", "error" -> "e"),
        pattern = "v[ce]*p")
    }),
    "q_attribution" -> ((s, dir) => {
      // Last-touch attribution: each purchase credits the most recent
      // strictly-preceding view/click by the same user within 6 h, else
      // "(none)". Per-channel conversions and distinct converters.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.attributeLastTouch(ev,
        touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackMs = 21600000L)
    }),
    "q_sessionize_incremental" -> ((s, dir) => {
      // Incremental batch sessionization (the daily-increment pattern):
      // history split into three event-time-contiguous increments at exact
      // ts terciles, each sessionized locally and stitched through the
      // per-key state table. Shares q_sessionize_gap's oracle — the
      // stitched union must be row-identical to one full recompute.
      val ev = table(s, dir, "events")
      val cuts = ev
        .agg(expr("percentile(unix_millis(ts), array(0.33D, 0.66D))").as("c"))
        .select(element_at(col("c"), 1).cast("long").as("c1"),
          element_at(col("c"), 2).cast("long").as("c2"))
      def part(cond: Column): DataFrame =
        ev.crossJoin(broadcast(cuts)).filter(cond).drop("c1", "c2")
      val ms = unix_millis(col("ts"))
      val b1 = part(ms <= col("c1"))
      val b2 = part(ms > col("c1") && ms <= col("c2"))
      val b3 = part(ms > col("c2"))
      // localCheckpoint = the persisted state table a real daily job reads
      val (r1, s1) = Sessionize.incrementalGapSessionize(None, b1)
      val (r2, s2) = Sessionize.incrementalGapSessionize(Some(s1.materialize), b2)
      val (r3, _) = Sessionize.incrementalGapSessionize(Some(s2.materialize), b3)
      r1.unionByName(r2).unionByName(r3).select(
        col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("session_id"), col("session_idx"), col("duration"))
    }),
    "q_sessionize_full_incremental" -> ((s, dir) => {
      // Incremental FULL-RULE sessionization: the engine's own SessionState
      // is the carried state, injected into each increment's secondary sort
      // as a tag-0 row. Row-identical to one full recompute — shares the
      // recursive-CTE oracle with q_sessionize_full.
      val ev = table(s, dir, "events")
      val cuts = ev
        .agg(expr("percentile(unix_millis(ts), array(0.33D, 0.66D))").as("c"))
        .select(element_at(col("c"), 1).cast("long").as("c1"),
          element_at(col("c"), 2).cast("long").as("c2"))
      def part(cond: Column): DataFrame =
        ev.crossJoin(broadcast(cuts)).filter(cond).drop("c1", "c2")
      val ms = unix_millis(col("ts"))
      val (r1, s1) = Sessionize.incrementalFullSessionize(None, part(ms <= col("c1")))
      val (r2, s2) = Sessionize.incrementalFullSessionize(Some(s1), part(ms > col("c1") && ms <= col("c2")))
      val (r3, _) = Sessionize.incrementalFullSessionize(Some(s2), part(ms > col("c2")))
      r1.unionByName(r2).unionByName(r3).select(
        col("tieBreak").as("event_id"),
        col("key").cast("long").as("user_id"),
        col("tsMillis").as("ts_ms"),
        col("sessionId").as("session_id"),
        col("sessionIdx").as("session_idx"),
        col("duration"))
    }),
    "q_streaks" -> ((s, dir) =>
      // Gaps-and-islands: per-user consecutive-active-day streaks via the
      // day − row_number island invariant — distinct-day collapse first,
      // every window bounded by the calendar.
      graft.operators.Sessionize.streaks(
        table(s, dir, "events").select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("d")),
        "user_id", "d")),
    "q_conversion_lag" -> ((s, dir) => {
      // Funnel latency: exact quartiles + p99 of the view→click lag over
      // converting users — the funnel kernel feeding the one-pass order
      // statistics (no per-group sort anywhere).
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val lags = graft.operators.Sessionize
        .funnel(ev, Seq("view", "click", "purchase"))
        .filter(col("t2").isNotNull)
        .select((col("t2") - col("t1")).as("lag_ms"))
      Eval.orderStatistics(lags, "lag_ms", Seq((1, 4), (1, 2), (3, 4), (99, 100)))
    }),
    "q_cadence" -> ((s, dir) =>
      // Bot screen: per-user inter-event cadence — metronomic gaps
      // (cv < 0.1 over >= 5 gaps) flag automation; exact gap moments.
      Sessionize.cadenceProfile(table(s, dir, "events"), "user_id")),
    "q_time_to_convert" -> ((s, dir) => {
      // Touch->conversion latency distribution: per user ms from the
      // first non-purchase touch to the first purchase at-or-after it,
      // summarized as EXACT p25/p50/p90 per parity cohort.
      val ev = table(s, dir, "events").select(col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val lat = graft.operators.Sessionize.timeToConvert(ev,
          touchTypes = Seq("click", "error", "signup", "view"),
          convType = "purchase")
        .select(concat(lit("c"), pmod(col("user_id"), lit(2L)))
          .as("cohort"), col("latency_ms"))
      graft.operators.Profiling.exactQuantiles(lat, "cohort",
        "latency_ms", Seq(250000L, 500000L, 900000L))
    }),
    "q_shapley" -> ((s, dir) => {
      // Exact Shapley multi-touch attribution over the four non-
      // purchase channels: presence-based coalitions, 16 exact v(S)
      // values, integer factorial-weighted marginals; the efficient/
      // symmetric upgrade of q_attribution's last-touch credit.
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("event_type"))
      graft.operators.Sessionize.shapleyAttribution(ev,
        touchTypes = Seq("click", "error", "signup", "view"),
        convType = "purchase")
    }),
    "q_chain_entropy" -> ((s, dir) =>
      // Is the next click predictable from the current page? H(next |
      // current) vs the marginal H(current) over the per-user ordered
      // event-type chain — the one-row "is a sequence model worth it".
      graft.operators.Sessionize.chainEntropy(
        table(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts"))))),
    "q_viterbi" -> ((s, dir) => {
      // Most-likely engaged/idle latent path over each user's first 8
      // events under the fixed integer-score HMM — exact int64 DP
      // (ties prefer E), so path and score are engine-exact with no
      // floating normalization anywhere.
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.viterbiDecode(ev, steps = 8)
    }),
    "q_hitting_time" -> ((s, dir) => {
      // E[min(steps to first purchase, 8)] from each event type under
      // the observed first-order chain — micro-long recursion, oracle
      // unrolls the 8 rounds.
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.expectedHittingTime(
        ev, target = "purchase", horizon = 8)
    }),
    "q_removal_effect" -> ((s, dir) => {
      // Markov removal-effect attribution: which event types carry the
      // 8-step conversion probability? All removal scenarios run in
      // ONE recursion frame; micro-long arithmetic end to end.
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.removalEffect(
        ev, target = "purchase", horizon = 8)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_sessionize_gap" -> gapSessionizeSql,
    // incremental stitching must reproduce the full recompute exactly
    "q_sessionize_incremental" -> gapSessionizeSql,
    "q_sessionize_full" -> fullSessionizeSql,
    "q_sessionize_full_incremental" -> fullSessionizeSql,
    "q_session_duration" ->
      s"""SELECT user_id, CAST(SUM(max_d) AS BIGINT) AS total_duration FROM (
         |  SELECT user_id, session_id, MAX(duration) AS max_d
         |  FROM ($gapSessionizeSql) GROUP BY user_id, session_id
         |) GROUP BY user_id""".stripMargin,
    "q_loyal_visitors" ->
      s"""SELECT user_id, n_sessions FROM (
         |  SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions
         |  FROM ($gapSessionizeSql) GROUP BY user_id
         |) WHERE n_sessions > 1""".stripMargin,
    "q_session_summary" ->
      s"""SELECT user_id, session_id, COUNT(*) AS n_events,
         |  CAST(MAX(duration) AS BIGINT) AS max_duration,
         |  CAST(MIN(duration) AS BIGINT) AS min_duration
         |FROM ($gapSessionizeSql) GROUP BY user_id, session_id""".stripMargin,
    "q_parse_elb" ->
      """SELECT 'u' || CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS ip,
        |  epoch_ms(ts) AS ts_ms
        |FROM events""".stripMargin,
    // the DSv2 source must reproduce the parser exactly — same oracle
    "q_cadence" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id
         |  FROM events),
         |g AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id
         |    ORDER BY ms, event_id) AS gap FROM e),
         |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         |    CAST(SUM(gap) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS DECIMAL(38,0))
         |      AS sgg
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
         |SELECT user_id, n_gaps, sg, CAST(sgg AS VARCHAR) AS sgg,
         |  round(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap_ms,
         |  ${graft.operators.Sessionize.cadenceCvSql} AS cv,
         |  ${graft.operators.Sessionize.cadenceRegularSql} AS is_regular
         |FROM a""".stripMargin,
    "q_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT cohort_day, day - cohort_day AS offset,
        |  CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN c USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY cohort_day, day - cohort_day""".stripMargin,
    "q_funnel" -> funnelOracle,
    // single-batch stream == batch funnel (see the query's doc comment)
    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  round(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM m""".stripMargin,
    "q_session_entry_exit" ->
      """WITH s1 AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |              OR epoch_ms(ts) // 1000
        |                 - lag(epoch_ms(ts)) OVER w // 1000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |s2 AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM s1),
        |s3 AS (
        |  SELECT *, MIN(ms) OVER (PARTITION BY user_id, session_idx) AS first_ms
        |  FROM s2)
        |SELECT user_id,
        |  CAST(user_id AS VARCHAR) || '-' || CAST(first_ms AS VARCHAR) AS session_id,
        |  arg_min(event_type, CAST(ms AS HUGEINT) * 100000000 + event_id) AS entry_type,
        |  arg_max(event_type, CAST(ms AS HUGEINT) * 100000000 + event_id) AS exit_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(ms // 1000 - first_ms // 1000) AS BIGINT) AS duration,
        |  CAST(COUNT(*) = 1 AS INT) AS bounce
        |FROM s3
        |GROUP BY user_id, session_id""".stripMargin,
    "q_rfm" ->
      """WITH a AS (
        |  SELECT user_id, MAX(epoch_ms(ts) // 86400000) AS last_b,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS monetary
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT user_id, MAX(last_b) OVER () - last_b AS recency,
        |    frequency, monetary
        |  FROM a),
        |c AS (
        |  SELECT user_id, recency, frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency DESC, user_id) AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS INT) AS m_score
        |  FROM b)
        |SELECT user_id, recency, frequency, monetary, r_score, f_score,
        |  m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
        |    CAST(m_score AS VARCHAR) AS segment
        |FROM c""".stripMargin,
    "q_seq_match" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      WHEN 'error' THEN 'e' END AS c
        |  FROM events),
        |s AS (
        |  SELECT user_id, string_agg(c, '' ORDER BY ts_ms, event_id) AS seq
        |  FROM e WHERE c IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS BIGINT) AS n_match,
        |  CAST(CASE WHEN len(regexp_extract_all(seq, 'v[ce]*p')) > 0
        |    THEN strpos(seq, regexp_extract(seq, 'v[ce]*p'))
        |    ELSE 0 END AS BIGINT) AS first_pos
        |FROM s""".stripMargin,
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |w AS (
        |  SELECT user_id, ts_ms, event_type,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |      THEN struct_pack(ts := ts_ms, ch := event_type) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM e)
        |SELECT CASE WHEN lt IS NOT NULL AND ts_ms - lt.ts <= 21600000
        |    THEN lt.ch ELSE '(none)' END AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM w WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
        |  FROM events),
        |isl AS (SELECT user_id,
        |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
        |  FROM days),
        |g AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks, MAX(len) AS longest_streak
        |FROM g GROUP BY 1""".stripMargin,
    "q_conversion_lag" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_ms(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(epoch_ms(ts)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND epoch_ms(ts) >= s1.t1
        |  GROUP BY e.user_id),
        |lag AS (SELECT s2.t2 - s1.t1 AS v FROM s1 JOIN s2 USING (user_id)),
        |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv FROM lag GROUP BY v),
        |c AS (SELECT v, nv,
        |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum FROM per),
        |t AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM per),
        |fr AS (SELECT CAST(f_num AS BIGINT) AS f_num,
        |    CAST(f_den AS BIGINT) AS f_den
        |  FROM (VALUES (1, 4), (1, 2), (3, 4), (99, 100)) AS f(f_num, f_den)),
        |m AS (SELECT f_num, f_den, n,
        |    greatest((f_num * n + f_den - 1) // f_den, 1) AS pos FROM fr, t)
        |SELECT f_num, f_den, n, CAST(pos AS BIGINT) AS pos, v AS value
        |FROM c, m WHERE cum >= pos AND cum - nv < pos""".stripMargin,
    "q_time_to_convert" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
         |  FROM events),
         |ft AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
         |  WHERE event_type IN ('click', 'error', 'signup', 'view')
         |  GROUP BY 1),
         |lat AS (SELECT 'c' || CAST(e.user_id % 2 AS VARCHAR) AS cohort,
         |    CAST(MIN(e.ts_ms) - MAX(ft.t0) AS BIGINT) AS v
         |  FROM e JOIN ft ON ft.user_id = e.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts_ms >= ft.t0
         |  GROUP BY e.user_id, 1),
         |per AS (SELECT cohort, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM lat GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY cohort ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY cohort) AS BIGINT) AS n
         |  FROM per),
         |q AS (SELECT CAST(q AS BIGINT) AS q_ppm
         |  FROM (VALUES (250000), (500000), (900000)) t(q))
         |SELECT cohort, q_ppm, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(MIN(v) AS BIGINT) AS value
         |FROM c JOIN q ON cum >= (q_ppm * n + 999999) // 1000000
         |GROUP BY 1, 2""".stripMargin,
    "q_shapley" ->
      s"""WITH um AS (SELECT user_id, CAST(SUM(b) AS BIGINT) AS mask
         |  FROM (SELECT DISTINCT user_id,
         |      CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
         |        WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS b
         |    FROM events
         |    WHERE event_type IN ('click', 'error', 'signup', 'view'))
         |  GROUP BY 1),
         |cv AS (SELECT DISTINCT user_id FROM events
         |  WHERE event_type = 'purchase'),
         |sig AS (SELECT mask, CAST(SUM(CASE WHEN cv.user_id IS NOT NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
         |  FROM um LEFT JOIN cv USING (user_id) GROUP BY 1),
         |co AS (SELECT CAST(range AS BIGINT) AS s FROM range(0, 16)),
         |vs AS (SELECT co.s,
         |    CAST(COALESCE(SUM(sig.n_conv), 0) AS BIGINT) AS v
         |  FROM co LEFT JOIN sig ON (sig.mask & co.s) = sig.mask
         |  GROUP BY 1),
         |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
         |    ('signup', 4), ('view', 8)) AS t(channel, bit)),
         |pairs AS (SELECT ch.channel,
         |    ((a.s >> 0) & 1) + ((a.s >> 1) & 1) + ((a.s >> 2) & 1) +
         |      ((a.s >> 3) & 1) AS ps,
         |    a.v AS v_s, b.v AS v_si
         |  FROM ch JOIN vs a ON (a.s & ch.bit) = 0
         |  JOIN vs b ON b.s = (a.s | ch.bit))
         |SELECT channel,
         |  CAST(SUM((CASE ps WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
         |    ELSE 6 END) * (v_si - v_s)) AS BIGINT) AS phi_num,
         |  round(CAST(SUM((CASE ps WHEN 0 THEN 6 WHEN 1 THEN 2
         |    WHEN 2 THEN 2 ELSE 6 END) * (v_si - v_s)) AS DOUBLE) / 24,
         |    6) AS phi
         |FROM pairs GROUP BY 1""".stripMargin,
    "q_chain_entropy" ->
      s"""WITH s AS (SELECT user_id, event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY epoch_ms(ts), event_id) AS to_type
         |  FROM events),
         |cells AS (SELECT event_type AS from_type, to_type,
         |    CAST(COUNT(*) AS BIGINT) AS nij
         |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |cw AS (SELECT from_type, to_type, nij,
         |    CAST(SUM(nij) OVER (PARTITION BY from_type) AS BIGINT) AS ni
         |  FROM cells),
         |ct AS (SELECT nij,
         |    ${graft.operators.Sessionize.condTermMicroSql} AS t_cond
         |  FROM cw),
         |ca AS (SELECT CAST(SUM(nij) AS BIGINT) AS n_transitions,
         |    CAST(SUM(t_cond) AS BIGINT) AS s_cond_micro FROM ct),
         |mg AS (SELECT from_type, CAST(MAX(ni) AS BIGINT) AS ni
         |  FROM cw GROUP BY 1),
         |mt AS (SELECT ni,
         |    ${graft.operators.Sessionize.margTermMicroSql} AS t_marg
         |  FROM mg),
         |ma AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_states,
         |    CAST(SUM(t_marg) AS BIGINT) AS s_marg_micro FROM mt)
         |SELECT n_transitions, n_states,
         |  round(-CAST(s_cond_micro AS DOUBLE) / n_transitions / 1e6, 6)
         |    AS h_cond_bits,
         |  round(-CAST(s_marg_micro AS DOUBLE) / n_transitions / 1e6, 6)
         |    AS h_marginal_bits
         |FROM ca CROSS JOIN ma""".stripMargin,
    "q_viterbi" -> viterbiOracle,
    "q_hitting_time" -> hittingTimeOracle,
    "q_removal_effect" -> removalEffectOracle,
  )
}
