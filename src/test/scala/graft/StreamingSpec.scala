package graft

import graft.model.SessionConfig
import graft.operators.Sessionize
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.StreamEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming micro-harness (SURVEY.md §5.5): MemoryStream through the real
  * flatMapGroupsWithState query. */
class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  private val base = 1_700_000_000_000L
  private def ev(key: String, offMs: Long, tie: Long) =
    StreamEvent(key, new java.sql.Timestamp(base + offMs), tie)

  private def runStream(batches: Seq[Seq[StreamEvent]]): Seq[(String, Long, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = SessionizeStream
      .sessionize(input.toDF())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table("sess_out")
        .select($"key", $"tsMillis", $"sessionId", $"duration")
        .as[(String, Long, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sess_out")
    }
  }

  test("single trigger sessionizes like batch") {
    val events = Seq(ev("u1", 0, 0), ev("u1", 60_000, 1), ev("u1", 2_000_000, 2), ev("u2", 0, 3))
    val got = runStream(Seq(events))
    assert(got.size == 4)
    val u1 = got.filter(_._1 == "u1")
    assert(u1.map(_._3).distinct.size == 2)       // gap cut at 2000s > 1800s
    assert(u1.map(_._4) == Seq(0L, 60L, 0L))
  }

  test("state persists across triggers: same session continues, gap still cuts") {
    val b1 = Seq(ev("u", 0, 0), ev("u", 100_000, 1))
    val b2 = Seq(ev("u", 200_000, 2),                  // continues session (gap 100s)
                 ev("u", 200_000 + 1_801_000, 3))      // gap cut inside trigger 2
    val got = runStream(Seq(b1, b2))
    assert(got.map(_._3).distinct.size == 2)
    assert(got.map(_._4) == Seq(0L, 100L, 200L, 0L))
    assert(got.take(3).map(_._3).distinct.size == 1)   // first three share a session
  }

  test("chunked streaming equals one-shot batch on real events data") {
    val events = SparkEntry.table(spark, sf0001, "events")
      .select(col("user_id").cast("string").as("key"), col("ts"), col("event_id").as("tieBreak"))
      .as[StreamEvent].collect().toSeq.sortBy(_.tieBreak)
    val (b1, b2) = events.splitAt(events.size / 2)
    val streamed = runStream(Seq(b1, b2))
    val batch = Sessionize.fullSessionize(SparkEntry.table(spark, sf0001, "events"))
      .select($"key", $"tsMillis", $"sessionId", $"duration")
      .as[(String, Long, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(streamed == batch)
  }

  // Runs in TimeMode.None: with ProcessingTime + TTL the query schedules
  // perpetual timer microbatches and processAllAvailable never drains
  // (observed: endless RocksDB commits; jstack showed tasks healthy inside
  // RocksDB.uploadSnapshot batch after batch).
  test("transformWithState tier matches flatMapGroupsWithState across triggers") {
    // transformWithState requires the RocksDB state store provider
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamEvent]
      val q = graft.streaming.SessionizeProcessor
        .sessionize(input.toDF())
        .writeStream.format("memory").queryName("sess_tws").outputMode("append").start()
      try {
        input.addData(Seq(ev("u", 0, 0), ev("u", 100_000, 1))); q.processAllAvailable()
        input.addData(Seq(ev("u", 200_000, 2), ev("u", 200_000 + 1_801_000, 3))); q.processAllAvailable()
        val got = spark.table("sess_tws")
          .select($"key", $"tsMillis", $"sessionId", $"duration")
          .as[(String, Long, String, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
        assert(got.map(_._4) == Seq(0L, 100L, 200L, 0L))
        assert(got.map(_._3).distinct.size == 2)
      } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS sess_tws") }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming with custom config applies size cut across triggers") {
    val b1 = (0 until 3).map(i => ev("u", i * 1000L, i.toLong))
    val b2 = (3 until 6).map(i => ev("u", i * 1000L, i.toLong))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = SessionizeStream
      .sessionize(input.toDF(), cfg = SessionConfig(maxEvents = 3))
      .writeStream.format("memory").queryName("sess_cut").outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val sessions = spark.table("sess_cut").select($"sessionId").as[String].collect()
      assert(sessions.distinct.length == 3) // 6 events / (max 2 per session)
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS sess_cut") }
  }
}
