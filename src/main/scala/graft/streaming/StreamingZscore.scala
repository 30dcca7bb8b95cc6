package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key z-score anomaly screen — the stateful-stream tier
  * of the zscore/anomaly family: each event is judged against the
  * PRIOR state's mean/sd (so an outlier cannot dilute the baseline it
  * is measured against), then folded into the running moments. The
  * emitted row carries the EXACT prior moments (n, Σx, Σx²); the z and
  * the flag finish with shared SQL in the registry query, identical to
  * the window-replay oracle — the StreamingCadence split of
  * state-in-Scala / statistics-in-shared-SQL.
  *
  * Ordering caveat (same contract as the other single-batch-determinism
  * streaming tiers): within a microbatch the (ts, tie) sort restores
  * event-time order exactly; across batches a late event folds at its
  * arrival position. With the whole file as one batch the fold equals
  * the batch prefix windows, which is what the oracle checks.
  *
  * Scale: O(1) state per key (three longs), update-mode changelog.
  * Long bound: Σx² at cents scale (x ~ 10⁵) holds to ~9·10⁸ events per
  * key; like the cadence tier, the fold SATURATES instead of wrapping —
  * a pinned Σx² yields a huge sd → z ≈ 0, never a false alarm from
  * overflow (the batch-side twin would run the sum in DECIMAL). */
object StreamingZscore {
  case class Ev(key: Long, ts_ms: Long, tie: Long, x: Long)
  case class MomState(n: Long, sx: Long, sxx: Long)
  case class Out(key: Long, ts_ms: Long, tie: Long, x: Long,
      n_prior: Long, sx_prior: Long, sxx_prior: Long)

  /** Saturating add: pins at ±Long.MaxValue/MinValue (by the addend's
    * sign) instead of wrapping, so ALL moments honor the scaladoc's
    * saturation contract — a wrapped Σx would silently corrupt μ. */
  private def satAdd(a: Long, b: Long): Long =
    try Math.addExact(a, b)
    catch {
      case _: ArithmeticException =>
        if (b >= 0) Long.MaxValue else Long.MinValue
    }

  def zscore(events: Dataset[Ev]): Dataset[Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[MomState, Out](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (k, it, state) =>
        var s = state.getOption.getOrElse(MomState(0L, 0L, 0L))
        val out = it.toArray.sortBy(e => (e.ts_ms, e.tie)).map { e =>
          val o = Out(k, e.ts_ms, e.tie, e.x, s.n, s.sx, s.sxx)
          val x2 = try Math.multiplyExact(e.x, e.x)
            catch { case _: ArithmeticException => Long.MaxValue }
          s = MomState(satAdd(s.n, 1L), satAdd(s.sx, e.x),
            satAdd(s.sxx, x2))
          o
        }
        if (out.nonEmpty) state.update(s)
        out.iterator
      }
  }

  /** z of x against the PRIOR moments (n_prior, sx_prior, sxx_prior);
    * NULL during warm-up (< 5 prior events) or on a flat baseline.
    * Shared between the registry query and the window-replay oracle. */
  val zSql: String = {
    val mu = "(CAST(sx_prior AS DOUBLE) / n_prior)"
    val varP = s"((CAST(sxx_prior AS DOUBLE) - CAST(sx_prior AS DOUBLE) * $mu)" +
      " / n_prior)"
    s"CASE WHEN n_prior >= 5 AND $varP > 0 THEN " +
      s"round((CAST(x AS DOUBLE) - $mu) / sqrt($varP), 6) END"
  }
}
