package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming inter-event cadence — the stateful-stream counterpart of
  * `operators.Sessionize.cadenceProfile`, via `flatMapGroupsWithState`
  * (the custom-state tier the sessionizer / funnel / CUSUM share). Per
  * key the state is the exact gap moments plus the last event position —
  * five longs, no event buffering; each microbatch folds its events in
  * (ts, tie) order and emits ONE refreshed per-key moment row
  * (update-mode changelog). The cv / is_regular finish stays OUTSIDE the
  * stateful operator, applied as the same shared `cadenceCvSql` the
  * batch operator and the oracle use.
  *
  * Ordering caveat (documented, same as StreamingCusum): within a batch
  * the sort restores event order; across batches a late event's gap is
  * measured from the last SEEN event. With the whole file as one
  * microbatch the moments equal the batch operator's, which is what the
  * oracle checks.
  *
  * Scale: O(1) state per key (five longs), update-mode output — a
  * fleet-wide bot screen that never re-reads history. */
object StreamingCadence {
  case class Ev(key: Long, ts_ms: Long, tie: Long)
  case class St(nGaps: Long, sg: Long, sgg: Long, lastMs: Long,
      lastTie: Long, has: Boolean)
  case class Out(user_id: Long, n_gaps: Long, sg: Long, sgg: Long)

  def cadence(events: Dataset[Ev]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[St, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
        var s = state.getOption.getOrElse(St(0L, 0L, 0L, 0L, 0L, false))
        val evs = it.toArray.sortBy(e => (e.ts_ms, e.tie))
        evs.foreach { e =>
          s =
            if (s.has) {
              val g = e.ts_ms - s.lastMs
              // Long bound guard: g² overflows 2⁶³ for gaps > ~55 days,
              // and ~1000 day-scale gaps push the running Σg² past it
              // (the batch twin runs this sum in DECIMAL(38,0)). Keeping
              // per-key state a flat Long, saturate instead of wrapping:
              // a pinned Σg² yields a huge cv → is_regular = false, the
              // right read for a key with pathological gaps.
              val g2 = try Math.multiplyExact(g, g)
                catch { case _: ArithmeticException => Long.MaxValue }
              val sgg2 = try Math.addExact(s.sgg, g2)
                catch { case _: ArithmeticException => Long.MaxValue }
              St(s.nGaps + 1, s.sg + g, sgg2, e.ts_ms, e.tie, true)
            } else St(0L, 0L, 0L, e.ts_ms, e.tie, true)
        }
        if (evs.nonEmpty) {
          state.update(s)
          Iterator.single(Out(k, s.nGaps, s.sg, s.sgg))
        } else Iterator.empty
      }
  }
}
