package graft

import graft.model.{SessionConfig, SessionEvent}
import graft.operators.SessionEngine
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests over the pure state machine — invariants (a)-(e),(g) from
  * SURVEY.md §5. Runs on sorted event sequences (the engine's contract).
  * Uses raw ScalaCheck generators with fixed seeds (scalatestplus bridge is
  * not on the offline classpath) — 100 deterministic samples per property. */
class SessionPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 100).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 100).foreach { i =>
      for {
        a <- ga(Gen.Parameters.default, Seed(i.toLong))
        b <- gb(Gen.Parameters.default, Seed(i.toLong + 1000L))
      } body(a, b)
    }
  private val cfg = SessionConfig.default
  private val base = 1_700_000_000_000L

  /** Random per-user event timelines: mixture of small (in-session) and large
    * (cut-triggering) gaps, already sorted — the engine contract. */
  private val timelineGen: Gen[List[SessionEvent]] = for {
    n <- Gen.choose(1, 400)
    gaps <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(0L, 29L * 60L * 1000L),          // in-gap
      1 -> Gen.choose(1801L * 1000L, 3L * 3600L * 1000L), // gap cut
      1 -> Gen.choose(0L, 5L * 1000L)))                 // bursts (size-cut food)
  } yield {
    val ts = gaps.scanLeft(base)(_ + _).tail
    ts.zipWithIndex.map { case (ms, i) => SessionEvent("u", ms, i.toLong) }
  }

  test("invariants hold on random sorted timelines") {
    forAll(timelineGen) { events =>
      val out = SessionEngine.run(events.iterator, cfg).toVector
      assert(out.size == events.size)
      val bySession = out.groupBy(_.sessionId).values
      bySession.foreach { s =>
        val sorted = s.sortBy(e => (e.tsMillis, e.tieBreak))
        // (a) consecutive in-session gap <= 30 min on the sorted timeline
        sorted.sliding(2).foreach {
          case Vector(x, y) =>
            assert(y.tsMillis / 1000L - x.tsMillis / 1000L <= cfg.gapSec)
          case _ =>
        }
        // (b) session size bounded
        assert(s.size <= cfg.maxEvents - 1)
        // (c) session span bounded (span measured in engine seconds)
        val span = sorted.last.tsMillis / 1000L - sorted.head.tsMillis / 1000L
        assert(span <= cfg.maxDurationSec + cfg.gapSec) // last event may land past the limit before the NEXT cut
        // (d) session id derives from key + first event
        assert(s.forall(_.sessionId == s"u-${sorted.head.tsMillis}"))
        // (e) durations: non-negative, 0 at start, monotone on sorted events
        assert(sorted.head.duration == 0L)
        assert(sorted.forall(_.duration >= 0L))
        assert(sorted.map(_.duration) == sorted.map(_.duration).sorted)
      }
      // session indexes are 1..k contiguous
      val idxs = out.map(_.sessionIdx).distinct.sorted
      assert(idxs == (1L to idxs.size.toLong).toVector)
    }
  }

  test("(g) chunked streaming replay equals one-shot batch for any split") {
    forAll(timelineGen, Gen.choose(0, 400)) { (events, splitRaw) =>
      val whole = SessionEngine.run(events.iterator, cfg).toVector
      val split = math.min(splitRaw, events.size)
      val (h1, st) = SessionEngine.runWithFinalState(events.take(split).iterator, cfg, None)
      val (h2, _) = SessionEngine.runWithFinalState(events.drop(split).iterator, cfg, st)
      assert(h1 ++ h2 == whole)
    }
  }
}
