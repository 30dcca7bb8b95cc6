package graft.operators

import graft.model.{SessionConfig, SessionEvent, SessionState, SessionizedEvent}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Batch sessionization — two tiers (SURVEY.md §2.5 "Spark mapping"):
  *
  *  - [[gapSessionize]]: gap-only cuts as pure window functions. Fully
  *    declarative → Catalyst plans ONE hash-exchange on the key and a single
  *    per-partition sort; everything else (lag / running sum / running min)
  *    rides that sort. ANSI-SQL-expressible → DuckDB-oracle-matchable.
  *
  *  - [[fullSessionize]]: the reference's complete rule set (gap + max-size
  *    + max-duration cuts, `SessionizeGroupMapFunction.scala:19-83`) is
  *    inherently sequential per key, so it runs [[SessionEngine]] over
  *    key-sorted runs. We use the scalable secondary-sort pattern —
  *    `repartition(key).sortWithinPartitions(key, ts, tie)` + streaming
  *    `mapPartitions` — NOT `groupByKey.flatMapGroups`, which would
  *    materialize each key's events in executor memory. This holds at 100 TB:
  *    one shuffle, external sort, O(1) state per key, no per-group buffers.
  */
object Sessionize {

  /** Millis-floored-to-seconds subtraction, matching the reference's integer
    * math: `floor(ms/1000) - floor(firstMs/1000)` (SURVEY.md §7.1). */
  private def secondsBetween(endMs: Column, startMs: Column): Column =
    floor(endMs / 1000L) - floor(startMs / 1000L)

  /** Gap-only sessionizer over any keyed+timestamped DataFrame.
    *
    * Adds: `session_id` (= "<key>-<first event millis>"), `session_idx`
    * (1-based per key), `duration` (integer seconds since session start,
    * reference semantics README.md:36-55).
    *
    * Single shuffle: every window below shares `partitionBy(key)`, so
    * Catalyst plans one Exchange + one sort. The session-first timestamp is
    * computed with a running `last(_, ignoreNulls)` over the SAME window
    * instead of a second `partitionBy(key, session_idx)` shuffle.
    */
  def gapSessionize(
      df: DataFrame,
      key: String = "user_id",
      ts: String = "ts",
      tieBreak: String = "event_id",
      gapSec: Long = SessionConfig.DefaultGapSec): DataFrame =
    gapSessionizeInternal(df, key, ts, tieBreak, gapSec).drop("__ms", "__first_ms")

  /** Inter-event cadence profile per key — the BOT/AUTOMATION signal
    * humans don't leave: scripted traffic fires at metronomic intervals
    * (coefficient of variation of gaps ≈ 0), organic behavior is bursty
    * (cv ≥ 1). Per key: gap count, mean gap, and cv from EXACT gap
    * moments (gaps in ms; Σgap runs in BIGINT, Σgap² in DECIMAL(38,0) —
    * a key with ~1000 day-scale gaps pushes n·g² past 2⁶³, so a long
    * sum would wrap silently; the exposed copy leaves as STRING per the
    * r10 decimal contract), with the `is_regular` flag = cv < 0.1 over
    * ≥ 5 gaps — and an all-zero-gap burst (cv degenerates NULL via
    * sg = 0) counts as regular, not NULL: a perfectly metronomic replay
    * is the strongest bot signal of all. One key-window lag + one
    * aggregate riding the same exchange — the [[gapSessionize]] plan
    * shape. Run it keyed by user for account-level screening or by
    * session_id (compose with gapSessionize) for per-session flags. */
  def cadenceProfile(
      df: DataFrame, keyCol: String, tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.withColumn("__ms", unix_millis(col(tsCol)))
      .withColumn("__gap", col("__ms") - lag(col("__ms"), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_gaps"),
        sum(col("__gap")).cast("long").as("sg"),
        sum(col("__gap").cast("decimal(38,0)") * col("__gap"))
          .cast("decimal(38,0)").as("sgg"))
      .withColumn("mean_gap_ms",
        expr("round(CAST(sg AS DOUBLE) / n_gaps, 6)"))
      .withColumn("cv", expr(cadenceCvSql))
      .withColumn("is_regular", expr(cadenceRegularSql))
      // exposed DECIMAL → STRING (r10 decimal contract)
      .withColumn("sgg", col("sgg").cast("string"))
  }

  /** Population cv of gaps over (n_gaps, sg, sgg) — NULL for a single
    * gap or zero mean. Shared with the oracle. */
  val cadenceCvSql: String =
    "CASE WHEN n_gaps > 1 AND sg > 0 THEN " +
      "round(sqrt((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * " +
      "(CAST(sg AS DOUBLE) / n_gaps)) / n_gaps) / " +
      "(CAST(sg AS DOUBLE) / n_gaps), 6) END"

  /** Never-NULL regularity flag: the cv branch when it exists, else the
    * sg = 0 degenerate (all-zero gaps — a metronomic burst IS regular).
    * Shared with the oracle. */
  val cadenceRegularSql: String =
    s"(COALESCE($cadenceCvSql < 0.1, sg = 0) AND n_gaps >= 5)"

  /** [[gapSessionize]] body, keeping `__ms`/`__first_ms` — the columns the
    * incremental state handoff needs. */
  private def gapSessionizeInternal(
      df: DataFrame,
      key: String,
      ts: String,
      tieBreak: String,
      gapSec: Long): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val running = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ms = unix_millis(col(ts))
    // Gap compare in FLOORED SECONDS, exactly like SessionEngine (and the
    // reference, whose state holds event.ts/1000): raw-millis comparison
    // diverges from the state machine inside a ~1 s band around the cut.
    df.withColumn("__ms", ms)
      .withColumn("__prev_ms", lag(col("__ms"), 1).over(byKey))
      .withColumn(
        "__is_new",
        when(
          col("__prev_ms").isNull ||
            floor(col("__ms") / 1000L) - floor(col("__prev_ms") / 1000L) > gapSec,
          1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__is_new")).over(running))
      .withColumn(
        "__first_ms",
        last(when(col("__is_new") === 1L, col("__ms")), ignoreNulls = true).over(running))
      .withColumn("session_id", concat(col(key).cast("string"), lit("-"), col("__first_ms")))
      .withColumn("duration", secondsBetween(col("__ms"), col("__first_ms")))
      .drop("__prev_ms", "__is_new")
  }

  /** Incremental batch sessionization — the daily-increment pattern: each
    * time-contiguous batch is sessionized LOCALLY (one shuffle over just
    * the increment), then stitched to history through a tiny per-key state
    * table `(key, n_sessions, last_ms, open_first_ms)` instead of
    * reprocessing it — at 100 TB the increment is a day of data and the
    * state is one row per active key, which is what makes daily pipelines
    * affordable. A key's first batch event continues the open session iff
    * its floored-second gap from `last_ms` is ≤ `gapSec`; continuation
    * rewrites the first local session's id/first-ms/duration to the open
    * session's and shifts `session_idx` so numbering stays global. The
    * stitched output is row-identical to [[gapSessionize]] over the full
    * history (q_sessionize_incremental shares q_sessionize_gap's oracle;
    * IncrementalSessionizeSpec fuzzes random split points).
    *
    * Batches must be event-time-contiguous per key (split history on a
    * global timestamp boundary). Returns (sessionized batch, new state);
    * state for keys absent from the batch is carried forward unchanged. */
  def incrementalGapSessionize(
      state: Option[DataFrame],
      batch: DataFrame,
      key: String = "user_id",
      ts: String = "ts",
      tieBreak: String = "event_id",
      gapSec: Long = SessionConfig.DefaultGapSec): (DataFrame, DataFrame) = {
    val local = gapSessionizeInternal(batch, key, ts, tieBreak, gapSec)
    val st = state.getOrElse(
      batch.select(col(key)).limit(0)
        .withColumn("n_sessions", lit(0L))
        .withColumn("last_ms", lit(0L))
        .withColumn("open_first_ms", lit(0L)))
      .select(col(key), col("n_sessions").as("__st_n"),
        col("last_ms").as("__st_last"), col("open_first_ms").as("__st_open"))
    val keyW = Window.partitionBy(col(key))
    val continues = col("__st_last").isNotNull &&
      floor(min(col("__ms")).over(keyW) / 1000L) - floor(col("__st_last") / 1000L) <= gapSec
    val stitched = local.join(st, Seq(key), "left")
      .withColumn("__cont", continues)
      .withColumn("session_idx",
        col("session_idx") + coalesce(col("__st_n"), lit(0L)) -
          when(col("__cont"), 1L).otherwise(0L))
      .withColumn("__first_ms",
        when(col("__cont") && col("session_idx") === coalesce(col("__st_n"), lit(0L)),
          col("__st_open")).otherwise(col("__first_ms")))
      .withColumn("session_id", concat(col(key).cast("string"), lit("-"), col("__first_ms")))
      .withColumn("duration", secondsBetween(col("__ms"), col("__first_ms")))
      .drop("__st_n", "__st_last", "__st_open", "__cont")
    // last session per key has the max first-ms; plain maxes all the way
    val batchState = stitched.groupBy(col(key)).agg(
      max(col("session_idx")).as("n_sessions"),
      max(col("__ms")).as("last_ms"),
      max(col("__first_ms")).as("open_first_ms"))
    val carried = state.map(
      _.join(batch.select(col(key)).distinct(), Seq(key), "left_anti"))
    val newState = carried.fold(batchState)(batchState.unionByName(_))
    (stitched.drop("__ms", "__first_ms"), newState)
  }

  /** Full-rule sessionizer (gap + size + duration cuts) over the `events`
    * table shape. Output columns: event_id, user_id, ts_ms, session_id,
    * session_idx, duration.
    *
    * Scale notes: `repartition($key)` is the only shuffle;
    * `sortWithinPartitions` is Spark's external (spillable) sort, so a hot
    * key never has to fit in memory; the mapPartitions pass is a streaming
    * fold with O(1) state. Skewed keys cost sort time, not OOM.
    */
  def fullSessionize(
      df: DataFrame,
      key: String = "user_id",
      ts: String = "ts",
      tieBreak: String = "event_id",
      cfg: SessionConfig = SessionConfig.default): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(
        col(key).cast("string").as("key"),
        unix_millis(col(ts)).as("tsMillis"),
        col(tieBreak).cast("long").as("tieBreak"))
      .as[SessionEvent]
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsMillis"), col("tieBreak"))

    prepared
      .mapPartitions { it => sessionizeSortedRun(it, cfg) }
      .toDF()
  }

  /** Incremental FULL-RULE sessionization — [[incrementalGapSessionize]]'s
    * pattern applied to the reference's complete state machine (gap + size
    * + duration cuts): the carried state is the engine's own per-key
    * [[SessionState]] `(sessionId, sessionIdx, firstSec, lastSec,
    * eventCount)`, injected into the batch's secondary sort as a tag-0 row
    * that sorts BEFORE every event of its key, so the per-partition fold
    * seeds [[SessionEngine.run]] exactly where the previous increment
    * stopped. Each key's final state is emitted at the end of its sorted
    * run — including keys with no batch events, so carry-forward is
    * automatic, not a join. One shuffle per increment, O(1) fold state,
    * output row-identical to [[fullSessionize]] over the full history
    * (IncrementalSessionizeSpec fuzzes split points across all three cut
    * rules). Batches must be event-time-contiguous per key. */
  def incrementalFullSessionize(
      state: Option[DataFrame],
      batch: DataFrame,
      key: String = "user_id",
      ts: String = "ts",
      tieBreak: String = "event_id",
      cfg: SessionConfig = SessionConfig.default): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    import spark.implicits._
    val evRows = batch.select(
      col(key).cast("string").as("key"), lit(1).as("tag"),
      unix_millis(col(ts)).as("tsMillis"), col(tieBreak).cast("long").as("tieBreak"),
      lit("").as("sessionId"), lit(0L).as("sessionIdx"),
      lit(0L).as("firstSec"), lit(0L).as("lastSec"), lit(0).as("eventCount"))
    val stRows = state.getOrElse(emptyFullState(batch)).select(
      col("key"), lit(0).as("tag"), lit(Long.MinValue).as("tsMillis"), lit(0L).as("tieBreak"),
      col("sessionId"), col("sessionIdx"), col("firstSec"), col("lastSec"), col("eventCount"))
    val folded = evRows.unionByName(stRows)
      .as[CarrierRow]
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tag"), col("tsMillis"), col("tieBreak"))
      .mapPartitions(it => stitchRun(it, cfg))
      .toDF()
      // evaluate ONCE, then split into (events, state) — also what keeps
      // the plan flat when increments chain (the state a daily job persists)
      .materialize
    val out = folded.filter(col("kind") === 1)
      .select(col("key"), col("tsMillis"), col("tieBreak"),
        col("sessionId"), col("sessionIdx"), col("duration"))
    val newState = folded.filter(col("kind") === 0)
      .select(col("key"), col("sessionId"), col("sessionIdx"),
        col("firstSec"), col("lastSec"), col("eventCount"))
    (out, newState)
  }

  private def emptyFullState(batch: DataFrame): DataFrame =
    batch.sparkSession.range(0).select(
      col("id").cast("string").as("key"), col("id").cast("string").as("sessionId"),
      col("id").as("sessionIdx"), col("id").as("firstSec"), col("id").as("lastSec"),
      col("id").cast("int").as("eventCount"))

  /** Wide carrier row: tag 0 = carried state (sorts before its key's
    * events), tag 1 = event. Public: Catalyst's generated (de)serializers
    * live outside this package and cannot touch private classes. */
  final case class CarrierRow(
      key: String, tag: Int, tsMillis: Long, tieBreak: Long,
      sessionId: String, sessionIdx: Long, firstSec: Long, lastSec: Long, eventCount: Int)

  /** Fold output: kind 1 = sessionized event, kind 0 = a key's final state. */
  final case class StitchRow(
      kind: Int, key: String, tsMillis: Long, tieBreak: Long, sessionId: String,
      sessionIdx: Long, duration: Long, firstSec: Long, lastSec: Long, eventCount: Int)

  /** Seeded streaming fold over a key-sorted partition: a tag-0 row seeds
    * the engine state; each key's final state is appended when its sorted
    * run ends (lookahead via the buffered iterator). */
  private def stitchRun(it: Iterator[CarrierRow], cfg: SessionConfig): Iterator[StitchRow] = {
    val buffered = it.buffered
    var curKey: String = null
    var state: Option[SessionState] = None
    buffered.flatMap { r =>
      if (r.key != curKey) { curKey = r.key; state = None }
      val emitted: Seq[StitchRow] =
        if (r.tag == 0) {
          state = Some(SessionState(r.sessionId, r.sessionIdx, r.firstSec, r.lastSec, r.eventCount))
          Seq.empty
        } else {
          val (s, o) = SessionEngine.advance(state, SessionEvent(r.key, r.tsMillis, r.tieBreak), cfg)
          state = Some(s)
          Seq(StitchRow(1, o.key, o.tsMillis, o.tieBreak, o.sessionId, o.sessionIdx, o.duration, 0L, 0L, 0))
        }
      val keyEnds = !buffered.hasNext || buffered.head.key != r.key
      if (keyEnds && state.isDefined) {
        val s = state.get
        emitted :+ StitchRow(0, r.key, 0L, 0L, s.sessionId, s.sessionIdx, 0L,
          s.firstSec, s.lastSec, s.eventCount)
      } else emitted
    }
  }

  /** Streaming fold over a key-sorted partition: reset state at key change. */
  private[operators] def sessionizeSortedRun(
      it: Iterator[SessionEvent],
      cfg: SessionConfig): Iterator[SessionizedEvent] = {
    var currentKey: String = null
    var state: Option[SessionState] = None
    it.map { e =>
      if (e.key != currentKey) { currentKey = e.key; state = None }
      val (s, out) = SessionEngine.advance(state, e, cfg)
      state = Some(s)
      out
    }
  }

  /** README.md:42-50 OLAP query: total session time per visitor —
    * inner max(duration) per (key, session), outer sum per key. */
  def sessionDurationPerUser(sessionized: DataFrame, key: String = "user_id"): DataFrame =
    sessionized
      .groupBy(col(key), col("session_id"))
      .agg(max(col("duration")).as("max_d"))
      .groupBy(col(key))
      .agg(sum(col("max_d")).as("total_duration"))

  /** Loyal users: visitors with more than one session (README.md:8). */
  def loyalUsers(sessionized: DataFrame, key: String = "user_id"): DataFrame =
    sessionized
      .groupBy(col(key))
      .agg(countDistinct(col("session_id")).as("n_sessions"))
      .filter(col("n_sessions") > 1L)

  /** Cohort retention: users grouped by first-active day (their cohort),
    * counted distinct on each later activity-day offset — the standard
    * retention triangle. Two key-hashed aggregates and one key-hashed join
    * (co-partitioned, the cohort table is user-cardinality and stays
    * distributed — never broadcast by hint; AQE may choose to when small),
    * then one (cohort, offset)-keyed count-distinct whose cardinality is
    * days², not users. */
  def cohortRetention(
      events: DataFrame,
      maxOffsetDays: Int = 7,
      keyCol: String = "user_id",
      tsCol: String = "ts_ms"): DataFrame = {
    val dayMs = 86400000L
    // integer day bucket (div, not double-divide-then-cast — the cast
    // rounds in some engines; div truncates identically everywhere)
    val days = events.select(col(keyCol), expr(s"$tsCol div $dayMs").as("day"))
    val cohorts = days.groupBy(col(keyCol)).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, Seq(keyCol))
      .select(col(keyCol), col("cohort_day"), (col("day") - col("cohort_day")).as("offset"))
      .filter(col("offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-key ordered event
    * streams: for every observed `(from_type, to_type)` consecutive pair,
    * the transition count and the row-normalized probability
    * `p = n / Σ_to n(from, ·)` (each FROM row sums to 1 over the observed
    * transitions). Order within a key is `(tsCol, tieCol)` — the tie column
    * makes equal-timestamp neighbors deterministic under any partitioning.
    *
    * Shape: one key-partitioned window (lead) to form pairs, one
    * (from,to)-keyed aggregate, then a from-keyed window for the
    * normalizing sum — per-key sequences never leave their partition and
    * the transition matrix is |types|², tiny at any corpus scale. */
  def markovTransitions(
      events: DataFrame,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(typeCol).as("from_type"), col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round(col("n") / sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))), 6))
  }

  /** Expected clickstream steps to first reach `target` under the
    * first-order [[markovTransitions]] chain, TRUNCATED at `horizon` —
    * i.e. E[min(T_target, horizon)] per starting state, the actionable
    * "how far is a purchase from here" number (the truncation makes the
    * value finite and the unrolled-round replay exact; untruncated
    * hitting times need a linear solve). Recursion per round:
    * E_h(s) = 1 + Σ_{s'} P(s,s')·E_{h−1}(s'), E_h(target) = 0.
    *
    * Determinism: transition probabilities are exact-count ratios
    * evaluated as ONE double division; E lives as MICRO-LONGS with one
    * rounding per (s, s') term per round, so every round's table is
    * bit-identical across engines (the katz micro-long discipline).
    * States are the types with at least one OUTGOING transition; chain
    * mass toward never-from types (none in practice) is dropped by
    * contract.
    *
    * Scale shape: the transition matrix is |types|² (tiny at any corpus
    * scale, derived by ONE key-windowed pass + one aggregate); each
    * round is a matrix-sized join + aggregate, materialized so round k
    * never replays rounds 1..k−1. */
  def expectedHittingTime(
      events: DataFrame,
      target: String = "purchase",
      horizon: Int = 8,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    require(horizon >= 1 && horizon <= 32,
      s"horizon must be in [1, 32] (one unrolled round each): $horizon")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val tr = events
      .select(col(keyCol), col(typeCol).as("from_type"), col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rs", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))))
      .materialize
    val states = tr.select(col("from_type").as("state")).distinct()
      .materialize
    var e = states.select(col("state"), lit(0L).as("em"))
    (1 to horizon).foreach { _ =>
      val stepped = tr
        .join(e.withColumnRenamed("state", "to_type"), Seq("to_type"))
        .groupBy(col("from_type").as("state"))
        .agg(sum(expr(hittingTermSql)).as("s"))
      e = states.join(stepped, Seq("state"), "left")
        .select(col("state"),
          when(col("state") === target, lit(0L))
            .otherwise(lit(1000000L) + coalesce(col("s"), lit(0L)))
            .as("em"))
        .materialize
    }
    e.select(col("state"),
      round(col("em").cast("double") / 1e6, 6).as("exp_steps"))
  }

  /** One (s, s') recursion term over (n, rs, em) — exact-count ratio ×
    * micro expectation, rounded back to the micro grid. Shared with
    * the oracle. */
  val hittingTermSql: String =
    "CAST(ROUND((CAST(n AS DOUBLE) / rs) * em, 0) AS BIGINT)"

  /** One absorption-probability term over (n, rs, hit, em): the
    * exact-count ratio times (1 if the step lands on the target, else
    * the successor's micro probability), rounded to the micro grid.
    * Shared with the oracle. */
  val absorbTermSql: String =
    "CAST(ROUND((CAST(n AS DOUBLE) / rs) * " +
      "(CASE WHEN hit = 1 THEN 1000000 ELSE em END), 0) AS BIGINT)"

  /** Markov removal-effect attribution (Anderl et al. 2014, the
    * chain-based alternative to last-touch/Shapley): for every
    * non-target event type r, how much of the chain's `horizon`-step
    * conversion probability disappears if paths may no longer pass
    * through r? P_conv = Σ_s π(s)·A(s) with π the first-event
    * distribution and A(s) = P(reach `target` within `horizon` from s);
    * the removal scenario zeroes every step INTO r (the removed state
    * absorbs as a loss, denominators unchanged — the standard removal
    * model). Output per removed type: the base and removed conversion
    * probabilities and the normalized removal effect.
    *
    * Determinism: the [[expectedHittingTime]] micro-long recursion, one
    * rounding per (scenario, s, s') term per round
    * ([[absorbTermSql]]); the start mixture is one more micro-rounded
    * exact-count fold. Every scenario runs in the SAME frame (a
    * scenario column on the transition matrix), so the loop cost is
    * one |scenarios|·|types|²-row join per round — never a per-channel
    * re-run.
    *
    * Scale shape: one windowed pass for transitions + one for first
    * events; the recursion tables are (scenarios × types)-sized —
    * tiny at any corpus scale. */
  def removalEffect(
      events: DataFrame,
      target: String = "purchase",
      horizon: Int = 8,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    require(horizon >= 1 && horizon <= 32,
      s"horizon must be in [1, 32]: $horizon")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val base = events
      .select(col(keyCol), col(typeCol).as("from_type"), col(tsCol),
        col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .materialize
    val tr = base.filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rs", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("from_type"))))
    val states = tr.select(col("from_type").as("state")).distinct()
    // scenarios: the base chain plus one removal per non-target state
    val scen = states.filter(col("state") =!= target)
      .select(col("state").as("removed"))
      .union(states.sparkSession.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row("__none__")),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("removed",
            org.apache.spark.sql.types.StringType)))))
    val trx = tr.crossJoin(broadcast(scen))
      .filter(col("to_type") =!= col("removed") &&
        col("from_type") =!= col("removed"))
      .withColumn("hit", (col("to_type") === target).cast("int"))
      .materialize
    val sv = states.crossJoin(broadcast(scen))
      .filter(col("state") =!= col("removed")).materialize
    var e = sv.select(col("removed"), col("state"), lit(0L).as("em"))
    (1 to horizon).foreach { _ =>
      val stepped = trx
        .join(e.withColumnRenamed("state", "to_type"),
          Seq("removed", "to_type"), "left")
        // a target successor carries hit = 1 and no em row is needed;
        // the target's own em is 0 by construction
        .withColumn("em", coalesce(col("em"), lit(0L)))
        .groupBy(col("removed"), col("from_type").as("state"))
        .agg(sum(expr(absorbTermSql)).as("s"))
      e = sv.join(stepped, Seq("removed", "state"), "left")
        .select(col("removed"), col("state"),
          when(col("state") === target, lit(0L))
            .otherwise(coalesce(col("s"), lit(0L))).as("em"))
        .materialize
    }
    // first-event mixture (exact counts), folded per scenario
    val first = base.filter(col("__rn") === 1)
      .groupBy(col("from_type").as("state"))
      .agg(count(lit(1)).as("fn"))
      .withColumn("ft", sum(col("fn")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val pconv = e.join(broadcast(first), Seq("state"))
      .groupBy(col("removed"))
      .agg(sum(expr(
        "CAST(ROUND((CAST(fn AS DOUBLE) / ft) * em, 0) AS BIGINT)"))
        .as("pm"))
    val pbase = broadcast(pconv.filter(col("removed") === "__none__")
      .select(col("pm").as("pb")))
    pconv.filter(col("removed") =!= "__none__")
      .crossJoin(pbase)
      .select(col("removed").as("channel"),
        round(col("pb").cast("double") / 1e6, 6).as("p_base"),
        round(col("pm").cast("double") / 1e6, 6).as("p_removed"),
        round((col("pb") - col("pm")).cast("double") /
          greatest(col("pb"), lit(1L)), 6).as("removal_effect"))
  }

  /** MATCH_RECOGNIZE-lite: collapse each key's ordered event-type stream
    * to a one-char-per-event string (caller supplies the type→char code
    * map) and count NON-OVERLAPPING occurrences of a regex `pattern` over
    * it, plus the 1-based position of the first match (0 = none) and the
    * sequence length. Regex-over-codes is the classic log-mining encoding
    * (each char = one event) — contiguous patterns like `vcp`, gap-
    * tolerant ones like `v[^p]*p`, and anchors all work; both Spark and
    * ANSI regexp counters scan left-to-right non-overlapping, so counts
    * are engine-portable.
    *
    * Scale shape: one key-hashed aggregate; the per-key string is bounded
    * by that key's event count (same bound as any per-key sessionize
    * state). `sort_array(collect_list(struct(ts, tie, code)))` makes the
    * order deterministic under any partitioning; the regex runs once per
    * key, not per event.
    */
  def sequenceMatch(
      events: DataFrame,
      codes: Map[String, String],
      pattern: String,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    require(codes.values.forall(_.length == 1),
      s"codes must map each type to ONE char: $codes")
    require(codes.values.toSeq.distinct.size == codes.size,
      s"code chars must be distinct: $codes")
    val codeCol = codes.foldLeft(lit(null).cast("string")) {
      case (acc, (t, c)) => when(col(typeCol) === t, lit(c)).otherwise(acc)
    }
    events
      .select(col(keyCol), col(tsCol), col(tieCol), codeCol.as("__c"))
      .filter(col("__c").isNotNull)
      .groupBy(col(keyCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col(tsCol), col(tieCol), col("__c")))),
        x => x("__c")), "").as("seq"))
      .select(col(keyCol),
        length(col("seq")).cast("bigint").as("seq_len"),
        regexp_count(col("seq"), lit(pattern)).cast("bigint").as("n_match"),
        // regexp_instr returns the true 1-based match position (0 when no
        // match), so anchored patterns report the anchor site correctly —
        // unlike locate(regexp_extract(...)), which finds the first
        // occurrence of the matched TEXT. Passing the pattern as a Column
        // literal also avoids splicing caller regex into SQL text.
        regexp_instr(col("seq"), lit(pattern)).cast("bigint").as("first_pos"))
  }

  /** The fixed 2-state HMM behind [[viterbiDecode]]: latent intent
    * E (engaged) / I (idle) over the observed event-type alphabet.
    * All parameters are INTEGER log-scores in centi-nats (ln p × 100,
    * rounded) — model constants, not fitted values — so the whole DP
    * is exact int64 arithmetic: no floating normalization, no ulp
    * class, and the argmax tie-break (prefer E) is engine-exact. The
    * SQL twin [[viterbiSqlCtes]] interpolates the SAME maps. */
  val ViterbiInit: Map[String, Long] = Map("E" -> -36L, "I" -> -120L)
  val ViterbiTrans: Map[(String, String), Long] = Map(
    ("E", "E") -> -22L, ("E", "I") -> -161L,
    ("I", "E") -> -92L, ("I", "I") -> -51L)
  val ViterbiEmit: Map[(String, String), Long] = Map(
    ("E", "view") -> -69L, ("E", "click") -> -120L,
    ("E", "purchase") -> -230L, ("E", "signup") -> -300L,
    ("E", "error") -> -300L,
    ("I", "view") -> -92L, ("I", "click") -> -230L,
    ("I", "purchase") -> -461L, ("I", "signup") -> -161L,
    ("I", "error") -> -120L)
  /** Emission floor for observation types outside the alphabet — the
    * same for both states, so an unknown type dents the score without
    * steering the path. */
  val ViterbiUnk: Long = -700L

  /** Ordered emission alphabet (deterministic CASE generation). */
  private def viterbiObs: Seq[String] =
    ViterbiEmit.keys.map(_._2).toSeq.distinct.sorted

  /** Viterbi decode of the fixed 2-state HMM over each key's FIRST
    * `steps` events (stream order `(tsCol, tieCol)`): the most likely
    * latent engaged/idle path and its exact integer log-score — the
    * hidden-state refinement of [[markovTransitions]]' observed-state
    * matrix. Keys with fewer than `steps` events are excluded by
    * contract: the fixed unroll is the determinism device (both
    * engines replay the same `steps` DP columns; see
    * [[viterbiSqlCtes]] for the oracle's identical chain). Ties in
    * every max prefer state E, so the decoded path is total-ordered.
    *
    * Scale shape: one key-partitioned window (row_number, capped at
    * `steps` before the shuffle by the filter) + one pivot aggregate
    * → ONE row per key carrying `steps` observation columns; the DP
    * itself is per-row codegen'd column arithmetic — 2·steps int64
    * columns, no joins, no second shuffle, nothing keyed wider than
    * the session key. */
  def viterbiDecode(
      events: DataFrame,
      steps: Int = 8,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    require(steps >= 1 && steps <= 64,
      s"steps must be in [1, 64] (the unrolled-column budget): $steps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val firstN = events
      .select(col(keyCol), col(typeCol), col(tsCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= steps)
    val pivotAggs = (1 to steps).map(i =>
      max(when(col("__rn") === i, col(typeCol))).as(s"o$i"))
    val row = firstN.groupBy(col(keyCol))
      .agg(pivotAggs.head, pivotAggs.tail: _*)
      .filter(col(s"o$steps").isNotNull) // exactly-`steps` contract

    def emit(state: String, obs: org.apache.spark.sql.Column) =
      viterbiObs.foldLeft(lit(ViterbiUnk)) { (acc, o) =>
        when(obs === o, lit(ViterbiEmit((state, o)))).otherwise(acc)
      }

    // Forward DP as NAMED per-step columns (ve$t/vi$t/be$t/bi$t), never
    // nested Column trees: each step references the previous step 4×, so
    // an inlined expression would grow 4^steps nodes (measured 28 s at
    // sf0.1 for steps = 8 vs ~1 s columnar) — withColumn keeps one
    // projection per step and CollapseProject declines to re-inline
    // multiply-referenced non-trivial expressions.
    val d1 = row
      .withColumn("ve1", lit(ViterbiInit("E")) + emit("E", col("o1")))
      .withColumn("vi1", lit(ViterbiInit("I")) + emit("I", col("o1")))
    val fwd = (2 to steps).foldLeft(d1) { (d, t) =>
      val eToE = col(s"ve${t - 1}") + lit(ViterbiTrans(("E", "E")))
      val iToE = col(s"vi${t - 1}") + lit(ViterbiTrans(("I", "E")))
      val eToI = col(s"ve${t - 1}") + lit(ViterbiTrans(("E", "I")))
      val iToI = col(s"vi${t - 1}") + lit(ViterbiTrans(("I", "I")))
      d.withColumn(s"be$t", when(eToE >= iToE, lit("E")).otherwise(lit("I")))
        .withColumn(s"bi$t", when(eToI >= iToI, lit("E")).otherwise(lit("I")))
        .withColumn(s"ve$t", greatest(eToE, iToE) + emit("E", col(s"o$t")))
        .withColumn(s"vi$t", greatest(iToI, eToI) + emit("I", col(s"o$t")))
    }
    // backtrack: s$T from the final argmax, then s{t-1} = b{s_t}t —
    // same columnar discipline
    val bT = fwd.withColumn(s"s$steps",
      when(col(s"ve$steps") >= col(s"vi$steps"), lit("E"))
        .otherwise(lit("I")))
    val back = (steps - 1 to 1 by -1).foldLeft(bT) { (d, t) =>
      d.withColumn(s"s$t",
        when(col(s"s${t + 1}") === "E", col(s"be${t + 1}"))
          .otherwise(col(s"bi${t + 1}")))
    }
    back.select(col(keyCol),
      concat((1 to steps).map(t => col(s"s$t")): _*).as("path"),
      greatest(col(s"ve$steps"), col(s"vi$steps")).cast("long").as("score"))
  }

  /** Unrolled [[viterbiDecode]] oracle body: CTEs after a caller-
    * provided `p(k, o1..o{steps})` pivot (one row per key, exactly
    * `steps` observations). Interpolates the SAME integer score maps
    * as the Spark DP, one CTE per forward step and one per backtrack
    * step; ends with `SELECT k AS <keyAlias>, path, score FROM ...`
    * so the oracle's key column name matches the Spark output's. */
  def viterbiSqlCtes(steps: Int, keyAlias: String = "k"): String = {
    require(steps >= 2, s"steps must be >= 2: $steps")
    def emitSql(state: String, obsCol: String): String =
      viterbiObs.map(o =>
        s"WHEN '$o' THEN ${ViterbiEmit((state, o))}")
        .mkString(s"CASE $obsCol ", " ", s" ELSE $ViterbiUnk END")
    val d1 =
      s"""d1 AS (SELECT *,
         |  ${ViterbiInit("E")} + ${emitSql("E", "o1")} AS ve1,
         |  ${ViterbiInit("I")} + ${emitSql("I", "o1")} AS vi1
         |  FROM p)""".stripMargin
    val fwd = (2 to steps).map { t =>
      val p = t - 1
      s"""d$t AS (SELECT *,
         |  CASE WHEN ve$p + ${ViterbiTrans(("E", "E"))} >=
         |    vi$p + ${ViterbiTrans(("I", "E"))} THEN 'E' ELSE 'I' END
         |    AS be$t,
         |  CASE WHEN ve$p + ${ViterbiTrans(("E", "I"))} >=
         |    vi$p + ${ViterbiTrans(("I", "I"))} THEN 'E' ELSE 'I' END
         |    AS bi$t,
         |  greatest(ve$p + ${ViterbiTrans(("E", "E"))},
         |    vi$p + ${ViterbiTrans(("I", "E"))}) +
         |    ${emitSql("E", s"o$t")} AS ve$t,
         |  greatest(ve$p + ${ViterbiTrans(("E", "I"))},
         |    vi$p + ${ViterbiTrans(("I", "I"))}) +
         |    ${emitSql("I", s"o$t")} AS vi$t
         |  FROM d$p)""".stripMargin
    }.mkString(",\n")
    val bT =
      s"""b$steps AS (SELECT *,
         |  CASE WHEN ve$steps >= vi$steps THEN 'E' ELSE 'I' END AS s$steps
         |  FROM d$steps)""".stripMargin
    val back = (steps - 1 to 1 by -1).map { t =>
      val n = t + 1
      s"""b$t AS (SELECT *,
         |  CASE WHEN s$n = 'E' THEN be$n ELSE bi$n END AS s$t
         |  FROM b$n)""".stripMargin
    }.mkString(",\n")
    val path = (1 to steps).map(t => s"s$t").mkString(" || ")
    s"""$d1,
       |$fwd,
       |$bT,
       |$back
       |SELECT k AS $keyAlias, $path AS path,
       |  CAST(greatest(ve$steps, vi$steps) AS BIGINT) AS score
       |FROM b1""".stripMargin
  }

  /** Per-session entry/exit summary over [[gapSessionize]] (or any)
    * sessionized output: first and last event type in stream order,
    * event count, session duration, and the bounce flag (single-event
    * session) — the landing/exit-page analytics the reference's README
    * motivates downstream of sessionization.
    *
    * Plan shape: ONE (key, session) aggregate; entry/exit come from
    * min/max over a (ts, tie, type) struct (lexicographic struct order =
    * arg-min/arg-max by (ts, tie)), so no window pass and no second
    * shuffle — and the aggregate's key prefix matches the sessionizer's
    * key hash, so AQE plans it on the same exchange. */
  def sessionEntryExit(
      sessionized: DataFrame,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val ord = struct(unix_millis(col(tsCol)).as("m"), col(tieCol).as("t"),
      col(typeCol).as("ty"))
    sessionized
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(ord).as("__f"), max(ord).as("__l"),
        count(lit(1)).as("n_events"), max(col("duration")).as("duration"))
      .select(col(keyCol), col("session_id"),
        col("__f")("ty").as("entry_type"), col("__l")("ty").as("exit_type"),
        col("n_events"), col("duration"),
        (col("n_events") === 1L).cast("int").as("bounce"))
  }

  /** RFM (recency / frequency / monetary) quintile segmentation — the
    * standard visitor-value model downstream of clickstream analytics.
    * Per key: recency = max bucket observed anywhere − the key's last
    * bucket, frequency = event count, monetary = Σ `valueCol`; each metric
    * scores 1–5 by `ntile(5)` so 5 is always BEST (most recent, most
    * frequent, highest spend), with `keyCol` as the total-order tie-break
    * so scores are deterministic under any partitioning.
    *
    * Scale note: ntile needs a total order, so the three scoring windows
    * are single-partition — over the PER-KEY AGGREGATE (key-cardinality
    * rows, aggregated upstream of the sort), the same bounded-global-sort
    * contract as q_global_sort/q_listagg. For key cardinalities where one
    * partition is too much, swap ntile for approx-percentile cut-points
    * (scores stay 1–5, exact equal-count property relaxes). */
  def rfm(
      events: DataFrame,
      keyCol: String = "user_id",
      bucketExpr: String = "unix_millis(ts) div 86400000",
      valueExpr: String = "CAST(ROUND(value * 100, 0) AS BIGINT)"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = events
      .select(col(keyCol), expr(bucketExpr).as("__b"), expr(valueExpr).as("__v"))
      .groupBy(col(keyCol))
      .agg(max(col("__b")).as("__last"), count(lit(1)).as("frequency"),
        sum(col("__v")).as("monetary"))
      .withColumn("recency",
        max(col("__last")).over(Window.partitionBy()) - col("__last"))
      .drop("__last")
    val r = ntile(5).over(Window.orderBy(col("recency").desc, col(keyCol)))
    val f = ntile(5).over(Window.orderBy(col("frequency"), col(keyCol)))
    val m = ntile(5).over(Window.orderBy(col("monetary"), col(keyCol)))
    agg.select(col(keyCol), col("recency"), col("frequency"), col("monetary"),
        r.as("r_score"), f.as("f_score"), m.as("m_score"))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /** Last-touch attribution: credit each conversion event to the MOST
    * RECENT strictly-preceding touch event by the same key within
    * `lookbackMs`; conversions with no touch in the window attribute to
    * the literal channel `"(none)"`. Output is per-channel conversion
    * count and distinct converting keys. Ties at equal timestamps resolve
    * by `tieCol` (a touch at the conversion's exact ts with a smaller tie
    * id IS eligible — it precedes in stream order).
    *
    * Scale shape: one key-hashed ordered window over the filtered
    * touch∪conversion stream (running last-IGNORE-NULLS is O(1) state),
    * then one small channel-keyed aggregate. No self-join of conversions
    * against touches, no range join — the window IS the as-of lookup.
    */
  def attributeLastTouch(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      lookbackMs: Long,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"touch types must be non-empty and exclude the conversion: $touchTypes / $convType")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    events
      .filter(isTouch || col(typeCol) === convType)
      .withColumn("__lt",
        last(when(isTouch, struct(col(tsCol).as("ts"), col(typeCol).as("ch"))),
          ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .select(col(keyCol),
        when(col("__lt").isNotNull &&
            col(tsCol) - col("__lt")("ts") <= lookbackMs,
          col("__lt")("ch")).otherwise(lit("(none)")).as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        count_distinct(col(keyCol)).as("n_users"))
  }

  /** Time-to-convert — the latency companion of the attribution
    * family: per key, milliseconds from the FIRST touch (any touch
    * type) to the first conversion AT-OR-AFTER it. Keys with no touch,
    * no conversion, or whose conversions all precede the first touch
    * drop by contract (there is no defined latency). One aggregate;
    * the caller summarizes the latency distribution (e.g. with
    * [[Profiling.exactQuantiles]]). */
  def timeToConvert(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms"): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"touch types must exclude the conversion: $touchTypes / $convType")
    val isTouch = col(typeCol).isin(touchTypes.map(x => x: Any): _*)
    val firstTouch = events.filter(isTouch)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("__t0"))
    events.filter(col(typeCol) === convType)
      .select(col(keyCol), col(tsCol).as("__ct"))
      .join(firstTouch, Seq(keyCol))
      .filter(col("__ct") >= col("__t0"))
      .groupBy(col(keyCol))
      .agg((min(col("__ct")) - max(col("__t0"))).cast("long")
        .as("latency_ms"))
  }

  /** Exact Shapley multi-touch attribution — the game-theoretic upgrade
    * of [[attributeLastTouch]]: each channel's credit is its average
    * marginal contribution over ALL coalition orders, the one
    * attribution scheme that is efficient (credits sum to total
    * conversions), symmetric, and null-player-consistent. The
    * characteristic function is presence-based: v(S) = conversions
    * among users whose touched-channel set ⊆ S (coalition S fully
    * explains those journeys). Everything is EXACT: users collapse to
    * 2^k touched-set signatures (one aggregate), v over the 2^k
    * coalitions is a bounded containment join, and φ·k! is an integer
    * sum of factorial-weighted marginals — the only double is the
    * final /k! render. k ≤ 6 enforced (64 coalitions; the channel→bit
    * map and the |S|-weight table are driver-built bounded constants,
    * the critical-value-table class).
    *
    * Plan: one (user, channel) distinct + one mask aggregate + one
    * 2^k-row signature rollup; coalition algebra runs on broadcast
    * constant tables. Scale lives entirely in the first aggregate. */
  def shapleyAttribution(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      keyCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    val k = touchTypes.size
    require(k >= 1 && k <= 6,
      s"shapley needs 1..6 channels (2^k coalitions): $touchTypes")
    require(!touchTypes.contains(convType),
      s"conversion must not be a touch channel: $convType")
    val spark = events.sparkSession
    import spark.implicits._
    val chBit = touchTypes.sorted.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }
    val bits = broadcast(chBit.toDF(typeCol, "__bit"))
    // distinct (user, channel) first, so the bit sum IS the OR-mask;
    // converting users with NO touches are deliberately absent — their
    // empty signature is contained in EVERY coalition, adding the same
    // constant to every v(S), so phi is unchanged (route them to
    // attributeLastTouch's "(none)" bucket when the count matters)
    val userMask = events
      .filter(col(typeCol).isin(touchTypes.map(x => x: Any): _*))
      .select(col(keyCol), col(typeCol)).distinct()
      .join(bits, Seq(typeCol))
      .groupBy(col(keyCol))
      .agg(sum(col("__bit")).cast("long").as("mask"))
    val conv = events.filter(col(typeCol) === convType)
      .select(col(keyCol)).distinct().withColumn("__c", lit(1L))
    val sig = userMask.join(conv, Seq(keyCol), "left")
      .groupBy(col("mask"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(coalesce(col("__c"), lit(0L))).cast("long").as("n_conv"))
      .materialize
    val nCoal = 1 << k
    def pop(s: Int): Int = Integer.bitCount(s)
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val coalitions = broadcast(
      (0 until nCoal).map(s => (s.toLong, pop(s))).toDF("s", "ps"))
    val vS = coalitions.join(sig,
        (col("mask").bitwiseAND(col("s"))) === col("mask"), "left")
      .groupBy(col("s"), col("ps"))
      .agg(sum(coalesce(col("n_conv"), lit(0L))).cast("long").as("v"))
      .materialize
    val kFact = fact(k)
    val marginals = chBit.map { case (ch, bit) =>
      val wS = vS.filter((col("s").bitwiseAND(lit(bit))) === 0L)
        .select(col("s"), col("ps"), col("v").as("v_s"))
      val wSi = vS.filter(col("s").bitwiseAND(lit(bit)) === lit(bit))
        .select(col("s").bitwiseAND(lit(~bit)).as("s"),
          col("v").as("v_si"))
      val weights = broadcast((0 until k)
        .map(p => (p, fact(p) * fact(k - 1 - p))).toDF("ps", "w"))
      wS.join(wSi, "s").join(weights, "ps")
        .agg(sum(col("w") * (col("v_si") - col("v_s")))
          .cast("long").as("phi_num"))
        .withColumn("channel", lit(ch))
    }
    marginals.reduce(_ unionByName _)
      .withColumn("k_fact", lit(kFact))
      .withColumn("phi", expr(
        "round(CAST(phi_num AS DOUBLE) / k_fact, 6)"))
      .select(col("channel"), col("phi_num"), col("phi"))
  }

  /** Ordered funnel, first-touch semantics: per key, `t1` is the earliest
    * step-1 event, and each later `tK` is the earliest step-K event
    * AT-OR-AFTER `t(K-1)` — so a user counts for step K only if the steps
    * happened in order. `stage` is the furthest step reached; users who
    * never performed step 1 are absent (a funnel starts at its entry).
    *
    * Shape: one filtered aggregate per step, each keyed on `keyCol`, the
    * step tables chained with keyed joins — every exchange hashes the same
    * key, so the chain co-partitions and AQE reuses the layout. Step
    * tables shrink monotonically (each is a subset of the previous step's
    * completers), so per-step cost falls as the funnel narrows. No windows
    * over all events, no driver state. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    require(steps.distinct.size == steps.size, s"steps must be distinct: $steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    var tables = Vector(first)
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val k = i + 1
      val next = events.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol))
        .join(tables.last.select(col(keyCol), col(s"t$i")), Seq(keyCol))
        .filter(col(tsCol) >= col(s"t$i"))
        .groupBy(col(keyCol))
        .agg(min(col(tsCol)).as(s"t$k"))
      tables = tables :+ next
    }
    val joined = tables.zipWithIndex.drop(1).foldLeft(tables.head) {
      case (acc, (t, _)) => acc.join(t, Seq(keyCol), "left")
    }
    val stage = (2 to steps.size)
      .map(k => when(col(s"t$k").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    joined.withColumn("stage", stage)
  }

  /** Consecutive-activity streaks — the gaps-and-islands classic: per
    * user, collapse activity to distinct active days, tag each run of
    * CONSECUTIVE days with the `day − row_number` island invariant (an
    * arithmetic constant within a run, never a stateful scan), and report
    * days active, number of streaks, and the longest streak. All three
    * windows/aggregates share the per-user partitioning (bounded by the
    * calendar, not the event volume — the distinct collapse happens
    * first). */
  def streaks(
      df: DataFrame, keyCol: String, dayIdxCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = df.select(col(keyCol), col(dayIdxCol).cast("long").as("d"))
      .distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("d"))
    val islands = days
      .withColumn("island", col("d") - row_number().over(w))
      .groupBy(col(keyCol), col("island"))
      .agg(count(lit(1)).cast("long").as("len"))
    islands.groupBy(col(keyCol))
      .agg(sum(col("len")).cast("long").as("n_active_days"),
        count(lit(1)).cast("long").as("n_streaks"),
        max(col("len")).as("longest_streak"))
  }

  /** Conditional entropy of the first-order navigation chain —
    * H(next | current) in bits over [[markovTransitions]]' counts,
    * with the marginal H(current) alongside: how predictable the next
    * step is GIVEN where the user stands vs how spread the states are
    * at all. H_cond ≈ 0 = deterministic funnels; H_cond ≈ H_marginal
    * = navigation is memoryless noise and the transition matrix adds
    * nothing. The one-row summary that says whether sequence models
    * are worth running on this clickstream.
    *
    * Exact: each cell contributes n_ij·round(10⁶·log2(n_ij/n_i)) —
    * integer-times-rounded-log longs, order-free; marginals likewise
    * from the from-state rollup. The transition table is |types|²
    * rows, so everything after the pair count is a scalar job. */
  def chainEntropy(
      events: DataFrame,
      keyCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts_ms",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val cells = events
      .select(col(keyCol), col(typeCol).as("from_type"),
        col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).cast("long").as("nij"))
      .withColumn("ni", sum(col("nij")).over(
        Window.partitionBy(col("from_type"))).cast("long"))
      .withColumn("t_cond", expr(condTermMicroSql))
    val marg = cells.groupBy(col("from_type"))
      .agg(max(col("ni")).as("ni"))
      .withColumn("t_marg", expr(margTermMicroSql))
    val condAgg = cells.agg(
      sum(col("nij")).cast("long").as("n_transitions"),
      sum(col("t_cond")).cast("long").as("s_cond_micro"))
    val margAgg = marg.agg(
      count(lit(1)).cast("long").as("n_states"),
      sum(col("t_marg")).cast("long").as("s_marg_micro"))
    condAgg.crossJoin(margAgg)
      .withColumn("h_cond_bits", expr(
        "round(-CAST(s_cond_micro AS DOUBLE) / n_transitions / 1e6, 6)"))
      .withColumn("h_marginal_bits", expr(
        "round(-CAST(s_marg_micro AS DOUBLE) / n_transitions / 1e6, 6)"))
      .select(col("n_transitions"), col("n_states"),
        col("h_cond_bits"), col("h_marginal_bits"))
  }

  /** Per-cell n_ij·round(10⁶·log2(n_ij/n_i)). Shared with the
    * oracle. */
  val condTermMicroSql: String =
    "nij * CAST(round(1000000 * log2(CAST(nij AS DOUBLE) / ni), 0)" +
      " AS BIGINT)"

  /** Per-from-state marginal term n_i·round(10⁶·log2(n_i/N)) — N is
    * the summed marginal, spliced by the caller as a window/aggregate.
    * Here the grand total arrives via SUM OVER () in both engines. */
  val margTermMicroSql: String =
    "ni * CAST(round(1000000 * log2(CAST(ni AS DOUBLE) / " +
      "sum(ni) OVER ()), 0) AS BIGINT)"
}
