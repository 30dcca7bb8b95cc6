package graft.model

/** Core record types for the sessionize engine.
  *
  * Mirrors the reference's data model (see SURVEY.md §1):
  *  - `Parsed` ~ reference `schema/Parsed.scala:3` (timestamp string, epoch
  *    millis, client token named `ip`).
  *  - `Sessionized` ~ reference `schema/Sessionized.scala:3`.
  *  - `SessionState` ~ reference `processes/sessionize/SessionState.scala:3-9`
  *    (timestamps held in *seconds*, matching the reference's integer math).
  *
  * Unlike the reference we keep a second, generic shape (`SessionEvent` /
  * `SessionizedEvent`) keyed by an opaque string so the same state machine
  * serves both the ELB-log replay path and the `events` parquet table
  * (`user_id` plays the `ip` role).
  */
final case class Parsed(timestamp: String, ts: Long, ip: String)

final case class Sessionized(
    ts: Long,
    timestamp: String,
    ip: String,
    sessionId: String,
    duration: Long)

/** Generic sessionize input: any keyed, timestamped record.
  * `tieBreak` makes ordering total (reference relies on arrival order, which
  * is nondeterministic; we sort by (tsMillis, tieBreak) — SURVEY.md §7.2). */
final case class SessionEvent(key: String, tsMillis: Long, tieBreak: Long)

final case class SessionizedEvent(
    key: String,
    tsMillis: Long,
    tieBreak: Long,
    sessionId: String,
    sessionIdx: Long,
    duration: Long)

/** Per-key session state — reference `SessionState.scala:3-9`.
  * `firstSec`/`lastSec` are epoch seconds (`event.ts / 1000`), matching
  * `SessionizeGroupMapFunction.scala:24-25`. */
final case class SessionState(
    sessionId: String,
    sessionIdx: Long,
    firstSec: Long,
    lastSec: Long,
    eventCount: Int)

/** Session-cut constants — reference `SessionizeGroupMapFunction.scala:113-115`. */
final case class SessionConfig(
    gapSec: Long = SessionConfig.DefaultGapSec,
    maxEvents: Int = SessionConfig.DefaultMaxEvents,
    maxDurationSec: Long = SessionConfig.DefaultMaxDurationSec)

object SessionConfig {
  /** SESSION_TIMEOUT_SEC = 30 * 60 (`SessionizeGroupMapFunction.scala:113`). */
  val DefaultGapSec: Long = 30L * 60L
  /** SESSION_MAX_SIZE = 1500, checked as `count + 1 >= 1500`, so a session
    * holds at most 1499 events (`SessionizeGroupMapFunction.scala:47,115`). */
  val DefaultMaxEvents: Int = 1500
  /** SESSION_MAX_DURATION = 12 * 60 * 60 (`SessionizeGroupMapFunction.scala:114`). */
  val DefaultMaxDurationSec: Long = 12L * 60L * 60L
  val default: SessionConfig = SessionConfig()
}
