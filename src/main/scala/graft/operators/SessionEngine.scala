package graft.operators

import graft.model.{SessionConfig, SessionEvent, SessionState, SessionizedEvent}

/** The pure per-key session state machine — the reference's entire "query
  * engine" (`processes/sessionize/SessionizeGroupMapFunction.scala:10-108`),
  * re-expressed as a side-effect-free fold so ONE implementation serves
  * batch (`flatMap` over a sorted run) and streaming
  * (`flatMapGroupsWithState`).
  *
  * Rule order is semantic and preserved exactly (SURVEY.md §2.5):
  * gap cut → size cut → duration cut → continue.
  *
  * Two documented divergences from the reference's literal code:
  *  1. The reference's gap check compares millis against seconds
  *     (`SessionizeGroupMapFunction.scala:35`), making every event open a new
  *     session. We implement the *documented* 30-minute-gap semantics
  *     (README.md:27 + both flowcharts), comparing in seconds.
  *  2. The reference can emit negative durations for out-of-order events
  *     earlier than the session's first event (`:83`); we clamp at 0.
  */
object SessionEngine {

  /** Advance state by one event; returns (new state, emitted record).
    * Timestamps are floored to seconds (`event.ts / 1000`) for all session
    * arithmetic, matching the reference's integer math
    * (`SessionizeGroupMapFunction.scala:24-25,79-83`). */
  def advance(
      state: Option[SessionState],
      e: SessionEvent,
      cfg: SessionConfig): (SessionState, SessionizedEvent) = {
    val sec = Math.floorDiv(e.tsMillis, 1000L)
    state match {
      case None =>
        fresh(e, sec, sessionIdx = 1L)
      case Some(s) if sec - s.lastSec > cfg.gapSec =>             // gap cut (:35-45)
        fresh(e, sec, s.sessionIdx + 1L)
      case Some(s) if s.eventCount + 1 >= cfg.maxEvents =>        // size cut (:47-57)
        fresh(e, sec, s.sessionIdx + 1L)
      case Some(s) if sec - s.firstSec > cfg.maxDurationSec =>    // duration cut (:59-68)
        fresh(e, sec, s.sessionIdx + 1L)
      case Some(s) =>                                             // continue (:73-83)
        val next = s.copy(
          lastSec = Math.max(s.lastSec, sec),
          eventCount = s.eventCount + 1)
        val duration = Math.max(0L, sec - s.firstSec)
        (next, SessionizedEvent(e.key, e.tsMillis, e.tieBreak, s.sessionId, s.sessionIdx, duration))
    }
  }

  /** New session: id = "<key>-<first event's millis>" (the reference uses the
    * raw timestamp *string* of the starting event,
    * `SessionizeGroupMapFunction.scala:107`; we use its epoch millis — still
    * a pure function of (key, starting event), and identical between the
    * window-function and state-machine implementations). */
  private def fresh(e: SessionEvent, sec: Long, sessionIdx: Long): (SessionState, SessionizedEvent) = {
    val id = s"${e.key}-${e.tsMillis}"
    val st = SessionState(id, sessionIdx, firstSec = sec, lastSec = sec, eventCount = 1)
    (st, SessionizedEvent(e.key, e.tsMillis, e.tieBreak, id, sessionIdx, 0L))
  }

  /** Run the machine over one key's events. Caller guarantees the iterator is
    * sorted by (tsMillis, tieBreak). Streams — O(1) memory. */
  def run(
      events: Iterator[SessionEvent],
      cfg: SessionConfig,
      initial: Option[SessionState] = None): Iterator[SessionizedEvent] = {
    var state: Option[SessionState] = initial
    events.map { e =>
      val (s, out) = advance(state, e, cfg)
      state = Some(s)
      out
    }
  }

  /** Like `run` but also exposes the final state (streaming needs it). */
  def runWithFinalState(
      events: Iterator[SessionEvent],
      cfg: SessionConfig,
      initial: Option[SessionState]): (Vector[SessionizedEvent], Option[SessionState]) = {
    var state: Option[SessionState] = initial
    val out = Vector.newBuilder[SessionizedEvent]
    events.foreach { e =>
      val (s, o) = advance(state, e, cfg)
      state = Some(s)
      out += o
    }
    (out.result(), state)
  }
}
