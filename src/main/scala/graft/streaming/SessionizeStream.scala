package graft.streaming

import graft.model.{SessionConfig, SessionEvent, SessionState, SessionizedEvent}
import graft.operators.SessionEngine
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming sessionization — the reference's realtime path
  * (`RealtimeSessionize.scala:92-176`) re-expressed as
  * `withWatermark → groupByKey → flatMapGroupsWithState`.
  *
  * Semantics per SURVEY.md §2.5:
  *  - watermark 60 s (reference `:131`) — in Spark it is LOAD-BEARING: it
  *    drives EventTimeTimeout state expiry (the reference needed an explicit
  *    RocksDB TTL for the same job, `SessionizeGroupMapFunction.scala:95-102`);
  *  - per-trigger events are sorted by (ts, tieBreak) before the state
  *    machine — Spark hands groups unordered (the reference implicitly relied
  *    on arrival order; we are deterministic instead);
  *  - state timeout at lastSeen + 12 h ≈ the reference's 12 h TTL with
  *    `NeverReturnExpired`;
  *  - cross-trigger disorder is absorbed by the engine's max(last, ts) guard,
  *    same as the reference `:73-77`.
  *
  * The SAME [[SessionEngine]] runs here and in batch — the property spec
  * proves chunked replay ≡ one-shot, which is exactly trigger-boundary
  * independence.
  */
object SessionizeStream {

  /** Streaming input row (TimestampType so watermarks work natively). */
  final case class StreamEvent(key: String, ts: java.sql.Timestamp, tieBreak: Long)

  /** Sessionize a streaming DataFrame with columns (key, ts, tieBreak).
    * Output mode must be Append. */
  def sessionize(
      events: DataFrame,
      cfg: SessionConfig = SessionConfig.default,
      watermarkDelay: String = "60 seconds"): Dataset[SessionizedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("tieBreak").cast("long").as("tieBreak"))
      .withWatermark("ts", watermarkDelay)
      .as[StreamEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionizedEvent](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (key, rows, state) =>
        advanceGroup(key, rows, state, cfg)
      }
  }

  /** [[sessionize]] seeded with MIGRATED per-key state — the redeploy
    * entry point of the state-migration story (the Spark analogue of
    * the reference's savepoint-uid remap,
    * `RealtimeSessionize.scala:101,121,135,143`): a deploy whose state
    * schema or operator topology changed cannot resume the old
    * checkpoint (`StateSchemaEvolutionSpec` pins the rejection), so it
    * drains the stopped checkpoint through
    * [[StateMigration.drainKeyedState]], maps rows to [[SessionState]],
    * and starts HERE at a fresh checkpoint — open sessions continue
    * with their original ids and running counts instead of being cut
    * at the deploy boundary (SessionizeMigrationSpec proves it end to
    * end, including the rollback path). Seeding is executor-parallel:
    * `initial` is a keyed Dataset, state-store-partitioned like any
    * other grouped input — nothing driver-sized. */
  def sessionizeWithInitialState(
      events: DataFrame,
      initial: org.apache.spark.sql.KeyValueGroupedDataset[String, SessionState],
      cfg: SessionConfig = SessionConfig.default,
      watermarkDelay: String = "60 seconds"): Dataset[SessionizedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("tieBreak").cast("long").as("tieBreak"))
      .withWatermark("ts", watermarkDelay)
      .as[StreamEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionizedEvent](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout,
        initial) { (key, rows, state) =>
        advanceGroup(key, rows, state, cfg)
      }
  }

  /** Per-trigger group transition — separated for direct unit testing. */
  private[streaming] def advanceGroup(
      key: String,
      rows: Iterator[StreamEvent],
      state: GroupState[SessionState],
      cfg: SessionConfig): Iterator[SessionizedEvent] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // Per-trigger buffer+sort: bounded by one trigger's data for one key.
      val sorted = rows
        .map(e => SessionEvent(key, e.ts.getTime, e.tieBreak))
        .toArray
        .sortBy(e => (e.tsMillis, e.tieBreak))
      val (out, newState) =
        SessionEngine.runWithFinalState(sorted.iterator, cfg, state.getOption)
      newState.foreach { s =>
        state.update(s)
        // TTL parity: expire state 12 h after the last seen event, gated on
        // the watermark (EventTimeTimeout fires once watermark passes it).
        state.setTimeoutTimestamp(s.lastSec * 1000L + cfg.maxDurationSec * 1000L)
      }
      out.iterator
    }
  }

  /** The events-table shape → streaming sessionize (file or rate source). */
  def sessionizeEvents(events: DataFrame, cfg: SessionConfig = SessionConfig.default): Dataset[SessionizedEvent] =
    sessionize(
      events.select(
        col("user_id").cast("string").as("key"),
        col("ts"),
        col("event_id").as("tieBreak")),
      cfg)
}
