package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: per-group session statistics in one pass.
  *
  * `Aggregator[IN, BUF, OUT]` is Spark's idiomatic custom-aggregate API —
  * partial aggregation (map-side combine) and codegen'd shuffle come free,
  * unlike a driver-side fold. Registered for SQL via `functions.udaf`. */
object SessionStatsAggregator extends Aggregator[Long, SessionStatsBuf, SessionStats] {
  override def zero: SessionStatsBuf = SessionStatsBuf(0L, 0L, Long.MaxValue)
  override def reduce(b: SessionStatsBuf, duration: Long): SessionStatsBuf =
    SessionStatsBuf(b.n + 1L, math.max(b.maxDuration, duration), math.min(b.minDuration, duration))
  override def merge(a: SessionStatsBuf, b: SessionStatsBuf): SessionStatsBuf =
    SessionStatsBuf(a.n + b.n, math.max(a.maxDuration, b.maxDuration), math.min(a.minDuration, b.minDuration))
  override def finish(b: SessionStatsBuf): SessionStats =
    SessionStats(b.n, b.maxDuration, if (b.n == 0L) 0L else b.minDuration)
  override def bufferEncoder: Encoder[SessionStatsBuf] = Encoders.product[SessionStatsBuf]
  override def outputEncoder: Encoder[SessionStats] = Encoders.product[SessionStats]
}

final case class SessionStatsBuf(n: Long, maxDuration: Long, minDuration: Long)
final case class SessionStats(n_events: Long, max_duration: Long, min_duration: Long)
