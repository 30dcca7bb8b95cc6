package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the stateful-stream counterpart of
  * `operators.Sessionize.funnel`, via `flatMapGroupsWithState` (the same
  * custom-state tier the full-rule sessionizer uses). Per user, the state
  * is the funnel's first-touch timestamps; each microbatch's events are
  * sorted by (ts, step) — step breaks the equal-time tie so an entry step
  * is visible to a same-timestamp later step, matching the batch
  * operator's at-or-after-inclusive semantics — and folded through the
  * chain. Emits the user's current funnel row whenever the batch advanced
  * it (update-mode changelog).
  *
  * Ordering caveat (documented, same as the other single-batch-determinism
  * streaming queries): within a batch the sort restores event-time order
  * exactly; ACROSS batches a late-arriving earlier entry event cannot
  * retract an already-latched later step — first-touch state is
  * monotone. With the whole file as one microbatch the result equals the
  * batch funnel, which is what the oracle checks.
  *
  * Scale: state per key is three longs (bounded, no event buffering —
  * unlike a generic pattern matcher the funnel chain needs only the
  * latched minima); one state store keyed by user, update-mode output. */
object StreamingFunnel {
  case class Ev(user_id: Long, step: Int, ts_ms: Long)
  case class FunnelState(t1: Long, t2: Long, t3: Long) // -1 = not reached
  case class Out(user_id: Long, t1: Long, t2: Long, t3: Long, stage: Long)

  def funnel3(events: Dataset[Ev]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (uid, it, state) =>
        val before = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
        var s = before
        it.toArray.sortBy(e => (e.ts_ms, e.step)).foreach { e =>
          e.step match {
            case 1 => if (s.t1 < 0 || e.ts_ms < s.t1) s = s.copy(t1 = e.ts_ms)
            case 2 => if (s.t2 < 0 && s.t1 >= 0 && e.ts_ms >= s.t1) s = s.copy(t2 = e.ts_ms)
            case _ => if (s.t3 < 0 && s.t2 >= 0 && e.ts_ms >= s.t2) s = s.copy(t3 = e.ts_ms)
          }
        }
        if (s == before) Iterator.empty
        else {
          state.update(s)
          val stage = 1L + (if (s.t2 >= 0) 1L else 0L) + (if (s.t3 >= 0) 1L else 0L)
          if (s.t1 >= 0) Iterator(Out(uid, s.t1, s.t2, s.t3, stage)) else Iterator.empty
        }
      }
  }
}
