package graft.streaming

import graft.model.{SessionConfig, SessionEvent, SessionState, SessionizedEvent}
import graft.operators.SessionEngine
import graft.streaming.SessionizeStream.StreamEvent
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Spark 4 `transformWithState` tier of the streaming sessionizer — the
  * newer stateful-processing API (SPARK-40434), same [[SessionEngine]]
  * semantics as the portable `flatMapGroupsWithState` tier in
  * [[SessionizeStream]]. Two deltas vs the older API:
  *  - state is a typed handle (`ValueState[SessionState]`) obtained in
  *    `init`, not a per-call wrapper;
  *  - TTL is declarative (`TTLConfig`) — we keep the reference's 12 h
  *    lifetime (`SessionizeGroupMapFunction.scala:96`) in processing time,
  *    the closest analogue of Flink's `OnCreateAndWrite` TTL.
  */
class SessionizeProcessor(
    cfg: SessionConfig,
    // Derived on the DRIVER and shipped with the processor: deriving a
    // product encoder inside init() runs scala-reflect on several executor
    // threads at once, which deadlocks (observed: all tasks parked in init).
    stateEncoder: org.apache.spark.sql.Encoder[SessionState])
    extends StatefulProcessor[String, StreamEvent, SessionizedEvent] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    // TTL only in ProcessingTime mode; TimeMode.None means no timers (and no
    // perpetual timer microbatches — with a TTL the query never fully drains
    // under processAllAvailable).
    val ttl =
      if (timeMode == TimeMode.ProcessingTime())
        TTLConfig(java.time.Duration.ofSeconds(cfg.maxDurationSec))
      else TTLConfig.NONE
    state = getHandle.getValueState[SessionState]("session", stateEncoder, ttl)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[StreamEvent],
      timerValues: TimerValues): Iterator[SessionizedEvent] = {
    val sorted = rows
      .map(e => SessionEvent(key, e.ts.getTime, e.tieBreak))
      .toArray
      .sortBy(e => (e.tsMillis, e.tieBreak))
    val initial = Option(state.get())
    val (out, newState) = SessionEngine.runWithFinalState(sorted.iterator, cfg, initial)
    newState.foreach(state.update)
    out.iterator
  }
}

object SessionizeProcessor {
  /** transformWithState variant of [[SessionizeStream.sessionize]].
    * `timeMode = None` runs without timers/TTL (state retained until the
    * query ends — fine for replay); `ProcessingTime` adds the 12 h TTL. */
  def sessionize(
      events: org.apache.spark.sql.DataFrame,
      cfg: SessionConfig = SessionConfig.default,
      timeMode: TimeMode = TimeMode.None()): Dataset[SessionizedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    events
      .select(
        col("key").cast("string").as("key"),
        col("ts").cast("timestamp").as("ts"),
        col("tieBreak").cast("long").as("tieBreak"))
      .as[StreamEvent]
      .groupByKey(_.key)
      .transformWithState(
        new SessionizeProcessor(cfg, Encoders.product[SessionState]),
        timeMode,
        OutputMode.Append())
  }
}
