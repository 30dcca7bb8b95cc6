package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming joins under trigger chunking: the stream-stream interval join
  * and streaming dedup must produce the same result set no matter how the
  * input is split into microbatches (watermarks only gate state eviction /
  * late drops; nothing here is late). */
class StreamingJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private val base = 1_700_000_000_000L

  // (event_id, user_id, ts_ms, event_type)
  private val events: Seq[(Long, Long, Long, String)] = Seq(
    (1L, 1L, 0L, "click"),
    (2L, 1L, 30 * 60_000L, "purchase"),      // matches click 1 (30 min)
    (3L, 1L, 200 * 60_000L, "purchase"),     // no click within 1 h
    (4L, 2L, 10 * 60_000L, "click"),
    (5L, 2L, 20 * 60_000L, "click"),
    (6L, 2L, 65 * 60_000L, "purchase"),      // matches clicks 4 (55 min) and 5 (45 min)
    (7L, 3L, 0L, "purchase"))                // user with no clicks at all
    .map { case (id, u, off, et) => (id, u, base + off, et) }

  private def joined(df: DataFrame): DataFrame = {
    val ev = df.withColumn("ts", timestamp_millis(col("ts_ms")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "60 seconds")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "60 seconds")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
  }

  private def runChunked(chunks: Seq[Seq[(Long, Long, Long, String)]]): Set[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val name = s"ssj_${System.nanoTime()}"
    val q = joined(input.toDF().toDF("event_id", "user_id", "ts_ms", "event_type"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      chunks.foreach { ch => input.addData(ch); q.processAllAvailable() }
      spark.table(name).as[(Long, Long)].collect().toSet
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("stream-stream interval join matches hand expectation and batch") {
    val expected = Set((2L, 1L), (6L, 4L), (6L, 5L))
    val batch = joined(events.toDF("event_id", "user_id", "ts_ms", "event_type"))
      .as[(Long, Long)].collect().toSet
    assert(batch === expected)
    assert(runChunked(Seq(events)) === expected)
  }

  test("stream-stream join result is invariant to trigger chunking") {
    // event-time order chunks (clicks arrive before their purchases)
    val sorted = events.sortBy(_._3)
    val oneShot = runChunked(Seq(sorted))
    val perEvent = runChunked(sorted.map(Seq(_)))
    val halves = runChunked(Seq(sorted.take(3), sorted.drop(3)))
    assert(oneShot === perEvent)
    assert(oneShot === halves)
  }

  test("left-outer interval join: null rows emit once the watermark closes the window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val name = s"ssloj_${System.nanoTime()}"
    val ev = input.toDF().toDF("event_id", "user_id", "ts_ms", "event_type")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "60 seconds")
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "60 seconds")
    val q = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "leftOuter")
      .select(col("p_id"), col("c_id"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(events.sortBy(_._3)); q.processAllAvailable()
      // both watermarks must pass the old purchases' windows before the
      // null-extended rows may emit: feed a far-future click AND purchase
      val far = base + 600 * 60_000L
      input.addData(Seq((9L, 5L, far, "click"), (8L, 5L, far + 5 * 60_000L, "purchase")))
      q.processAllAvailable()
      input.addData(Seq((10L, 6L, far + 120 * 60_000L, "click"),
        (11L, 6L, far + 121 * 60_000L, "purchase")))
      q.processAllAvailable()
      val got = spark.table(name).as[(Long, Option[Long])].collect().toSet
      // matched pairs + unmatched purchases 3 and 7 with null clicks
      // (8 matches 9; 11 matches 10; their own null-or-match status for the
      // final chunk's rows depends on the closing watermark, so assert the
      // CLOSED prefix exactly and the final pairs by membership)
      assert(got.contains((2L, Some(1L))) && got.contains((6L, Some(4L))) &&
        got.contains((6L, Some(5L))) && got.contains((8L, Some(9L))))
      assert(got.contains((3L, None)) && got.contains((7L, None)))
      assert(!got.contains((2L, None)) && !got.contains((6L, None)) && !got.contains((8L, None)))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("streaming dropDuplicates emits each key once across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val name = s"sdd_${System.nanoTime()}"
    val q = input.toDF().toDF("user_id").dropDuplicates("user_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(Seq(1L, 2L, 2L)); q.processAllAvailable()
      input.addData(Seq(2L, 3L, 1L)); q.processAllAvailable()
      val got = spark.table(name).as[Long].collect().toSeq
      assert(got.sorted === Seq(1L, 2L, 3L))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }
}
