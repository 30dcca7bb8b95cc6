package graft

import graft.model.SessionConfig
import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkFunSuite {
  import spark.implicits._

  private def eventsDf(rows: Seq[(Long, Long, Long)]) = // (event_id, ms, user_id)
    rows.toDF("event_id", "ms", "user_id")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")

  test("gap sessionizer splits on >30min and numbers sessions per user") {
    val base = 1_700_000_000_000L
    val df = eventsDf(Seq(
      (1L, base, 7L),
      (2L, base + 60_000L, 7L),
      (3L, base + 60_000L + 1_801_000L, 7L), // 30min1s after prev -> new session
      (4L, base, 8L)))
    val out = Sessionize.gapSessionize(df).orderBy("user_id", "event_id")
      .select("event_id", "session_id", "session_idx", "duration").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, s"7-$base", 1L, 0L)))
    assert(out(1) == ((2L, s"7-$base", 1L, 60L)))
    assert(out(2)._3 == 2L && out(2)._4 == 0L)
    assert(out(3) == ((4L, s"8-$base", 1L, 0L)))
  }

  test("full sessionizer equals gap sessionizer when size/duration cuts are off the data") {
    val ev = SparkEntry.table(spark, sf0001, "events")
    val gap = Sessionize.gapSessionize(ev)
      .select(col("event_id"), col("session_id"), col("session_idx"), col("duration"))
    val full = Sessionize.fullSessionize(ev)
      .select(col("tieBreak").as("event_id"), col("sessionId").as("session_id"),
        col("sessionIdx").as("session_idx"), col("duration"))
    assert(gap.exceptAll(full).isEmpty && full.exceptAll(gap).isEmpty)
  }

  test("full sessionizer applies the size cut") {
    val base = 1_700_000_000_000L
    val df = eventsDf((0 until 10).map(i => (i.toLong, base + i * 1000L, 1L)))
    val out = Sessionize.fullSessionize(df, cfg = SessionConfig(maxEvents = 4))
      .select("sessionIdx").as[Long].collect()
    // sessions of at most 3 events (count+1 >= 4 cuts): 10 events -> 4 sessions
    assert(out.max == 4L)
  }

  test("full sessionizer applies the duration cut") {
    val base = 1_700_000_000_000L
    // 20-min steps stay under the gap; total span 100 min; cut at >30min span
    val df = eventsDf((0 until 6).map(i => (i.toLong, base + i * 1_200_000L, 1L)))
    val out = Sessionize.fullSessionize(df,
      cfg = SessionConfig(gapSec = 1800, maxEvents = 1500, maxDurationSec = 1800))
      .orderBy("tieBreak").select("sessionIdx", "duration").as[(Long, Long)].collect()
    assert(out.map(_._1).max > 1L)
    assert(out.forall(_._2 <= 1800L))
  }

  test("gap compare uses floored seconds in BOTH tiers (sub-second boundary alignment)") {
    // ms-diff 1800999 > 1800000 but floored-second diff is exactly 1800 (not >):
    // the reference's seconds-based state machine continues the session, and
    // the window tier must agree (it compared raw millis before the fix).
    val df = eventsDf(Seq((0L, 1000L, 1L), (1L, 1_801_999L, 1L)))
    val viaWindow = Sessionize.gapSessionize(df)
      .select("session_id").as[String].collect().distinct
    val viaEngine = Sessionize.fullSessionize(df)
      .select("sessionId").as[String].collect().distinct
    assert(viaWindow.length == 1)
    assert(viaEngine.length == 1)
    // and one ms later it cuts in both
    val df2 = eventsDf(Seq((0L, 1000L, 1L), (1L, 1_802_000L, 1L)))
    assert(Sessionize.gapSessionize(df2).select("session_id").as[String].collect().distinct.length == 2)
    assert(Sessionize.fullSessionize(df2).select("sessionId").as[String].collect().distinct.length == 2)
  }

  test("gap sessionizer is deterministic under repartitioning") {
    val ev = SparkEntry.table(spark, sf0001, "events")
    val a = Sessionize.gapSessionize(ev).select("event_id", "session_id", "duration")
    val b = Sessionize.gapSessionize(ev.repartition(13)).select("event_id", "session_id", "duration")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("README duration query and loyal users run on top of sessionized output") {
    val sess = Sessionize.gapSessionize(SparkEntry.table(spark, sf0001, "events"))
    val dur = Sessionize.sessionDurationPerUser(sess)
    assert(dur.count() == 15) // 15 users at sf0.001
    val loyal = Sessionize.loyalUsers(sess)
    assert(loyal.count() > 0 && loyal.count() <= 15)
  }
}
