package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sided CUSUM — the stateful-stream counterpart of
  * `operators.TimeSeries.cusum`, via `flatMapGroupsWithState` (the same
  * custom-state tier the full-rule sessionizer and streaming funnel use).
  * Per key the state is the two clamped cumulative sums (two longs, no
  * event buffering); each microbatch's events are sorted by (ts, tie) and
  * folded through the recurrence, emitting one annotated row per event
  * (update-mode changelog).
  *
  * Ordering caveat (documented, same as the other single-batch-determinism
  * streaming queries): within a batch the sort restores event-time order
  * exactly; ACROSS batches a late event folds at its arrival position —
  * the recurrence is order-sensitive by nature, so production use puts a
  * watermark-sized buffer upstream. With the whole file as one microbatch
  * the result equals the batch fold, which is what the oracle checks.
  *
  * Scale: O(1) state per key (two longs), one state store keyed by
  * `key`, update-mode output — the same state-volume-not-CPU sizing as
  * the sessionize tiers. All arithmetic BIGINT-exact, matching the batch
  * operator's fixed-point contract. */
object StreamingCusum {
  case class Ev(key: Long, ts_ms: Long, tie: Long, x: Long)
  case class CusumState(pos: Long, neg: Long)
  case class Out(key: Long, ts_ms: Long, tie: Long, x: Long,
      cusum_pos: Long, cusum_neg: Long, alarm: Int)

  def cusum(
      events: Dataset[Ev],
      target: Long,
      drift: Long,
      threshold: Long): Dataset[Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
        var s = state.getOption.getOrElse(CusumState(0L, 0L))
        val out = it.toArray.sortBy(e => (e.ts_ms, e.tie)).map { e =>
          val pos = math.max(0L, s.pos + e.x - target - drift)
          val neg = math.max(0L, s.neg + target - e.x - drift)
          s = CusumState(pos, neg)
          Out(k, e.ts_ms, e.tie, e.x, pos, neg,
            if (pos > threshold || neg > threshold) 1 else 0)
        }
        if (out.nonEmpty) state.update(s)
        out.iterator
      }
  }
}
