package graft

import graft.model.{SessionConfig, SessionEvent}
import graft.operators.SessionEngine
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the pure session state machine — one test per rule of the
  * reference's check order (SURVEY.md §2.5): gap → size → duration → continue. */
class SessionEngineSpec extends AnyFunSuite {
  private val cfg = SessionConfig.default
  private def ev(key: String, ms: Long, tie: Long = 0L) = SessionEvent(key, ms, tie)
  private def run(events: Seq[SessionEvent], c: SessionConfig = cfg) =
    SessionEngine.run(events.iterator, c).toVector

  test("first event opens a session with duration 0 and id key-<millis>") {
    val out = run(Seq(ev("u1", 1_000_000L)))
    assert(out.size == 1)
    assert(out.head.sessionId == "u1-1000000")
    assert(out.head.duration == 0L)
    assert(out.head.sessionIdx == 1L)
  }

  test("events within the 30-min gap stay in one session with running duration") {
    val base = 1_700_000_000_000L
    val out = run(Seq(ev("u", base), ev("u", base + 60_000L), ev("u", base + 120_500L)))
    assert(out.map(_.sessionId).distinct.size == 1)
    assert(out.map(_.duration) == Vector(0L, 60L, 120L)) // floor to seconds
  }

  test("gap > 30 min cuts a new session (documented semantics, not the millis-vs-seconds bug)") {
    val base = 1_700_000_000_000L
    val out = run(Seq(ev("u", base), ev("u", base + cfg.gapSec * 1000L + 1000L)))
    assert(out.map(_.sessionId).distinct.size == 2)
    assert(out(1).duration == 0L)
    assert(out(1).sessionIdx == 2L)
  }

  test("gap of exactly 30 min does NOT cut (reference uses strict >)") {
    val base = 1_700_000_000_000L
    val out = run(Seq(ev("u", base), ev("u", base + cfg.gapSec * 1000L)))
    assert(out.map(_.sessionId).distinct.size == 1)
  }

  test("size cut: session holds at most 1499 events (count+1 >= 1500)") {
    val base = 1_700_000_000_000L
    val events = (0 until 1600).map(i => ev("u", base + i * 1000L, i.toLong))
    val out = run(events)
    val bySession = out.groupBy(_.sessionId)
    assert(bySession.values.map(_.size).max == 1499)
    assert(out(1498).sessionId == out.head.sessionId)
    assert(out(1499).sessionId != out.head.sessionId)
    assert(out(1499).duration == 0L)
  }

  test("duration cut: span > 12 h opens a new session") {
    val base = 1_700_000_000_000L
    val within = cfg.maxDurationSec * 1000L          // exactly 12 h: no cut (strict >)
    val beyond = cfg.maxDurationSec * 1000L + 1000L
    // keep gaps < 30 min by stepping every 20 min
    val step = 20L * 60L * 1000L
    val n = (beyond / step).toInt + 1
    val events = (0 to n).map(i => ev("u", base + math.min(i * step, beyond), i.toLong))
    val out = run(events)
    assert(out.map(_.sessionId).distinct.size == 2)
    assert(out.last.duration == 0L)
    val atLimit = run(Seq(ev("u", base), ev("u", base + within)))
    // 12 h gap also exceeds the 30-min gap rule, so isolate: duration check
    // only fires when gap rule passed; here gap fires first — both cut.
    assert(atLimit.map(_.sessionId).distinct.size == 2)
  }

  test("out-of-order event earlier than session start clamps duration at 0") {
    val base = 1_700_000_000_000L
    val out = run(Seq(ev("u", base, 0), ev("u", base - 10_000L, 1)))
    assert(out(1).duration == 0L)
    assert(out(1).sessionId == out(0).sessionId)
  }

  test("keys are independent") {
    val base = 1_700_000_000_000L
    var stateA = Option.empty[graft.model.SessionState]
    var stateB = Option.empty[graft.model.SessionState]
    val (s1, o1) = SessionEngine.advance(stateA, ev("a", base), cfg); stateA = Some(s1)
    val (_, o2) = SessionEngine.advance(stateB, ev("b", base + 1000L), cfg)
    assert(o1.sessionId != o2.sessionId)
  }

  test("runWithFinalState resumes across chunks identically (streaming prefix stability)") {
    val base = 1_700_000_000_000L
    val events = (0 until 50).map(i => ev("u", base + i * 600_000L, i.toLong)) // 10-min steps
    val whole = run(events)
    val (firstHalf, st) = SessionEngine.runWithFinalState(events.take(25).iterator, cfg, None)
    val (secondHalf, _) = SessionEngine.runWithFinalState(events.drop(25).iterator, cfg, st)
    assert(firstHalf ++ secondHalf == whole)
  }
}
