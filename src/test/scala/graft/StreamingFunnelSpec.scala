package graft

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Multi-batch state handoff for the streaming funnel — the behavior the
  * single-batch oracle cannot see. */
class StreamingFunnelSpec extends SparkFunSuite {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Ev]]): Seq[Seq[(Long, Long, Long, Long, Long)]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"funnel_out_${System.nanoTime()}"
    val q = StreamingFunnel.funnel3(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.map { b =>
        val before = spark.table(name).count()
        input.addData(b); q.processAllAvailable()
        spark.table(name)
          .as[(Long, Long, Long, Long, Long)].collect().toSeq.drop(before.toInt)
      }
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("funnel advances across batches via state, emitting only on progress") {
    val out = runStream(Seq(
      Seq(Ev(1L, 2, 5L), Ev(1L, 1, 10L)),  // click before view: stage 1 only
      Seq(Ev(1L, 2, 12L)),                 // click after latched t1=10
      Seq(Ev(2L, 3, 1L)),                  // purchase with no view: silent
      Seq(Ev(1L, 3, 12L)),                 // purchase at t2 (inclusive)
      Seq(Ev(1L, 2, 99L))))                // later click: no change, no emit
    assert(out(0) === Seq((1L, 10L, -1L, -1L, 1L)))
    assert(out(1) === Seq((1L, 10L, 12L, -1L, 2L)))
    assert(out(2) === Seq.empty)
    assert(out(3) === Seq((1L, 10L, 12L, 12L, 3L)))
    assert(out(4) === Seq.empty)
  }

  test("first-touch state is monotone: a late earlier view lowers t1 but keeps latched steps") {
    val out = runStream(Seq(
      Seq(Ev(7L, 1, 10L), Ev(7L, 2, 11L)),
      Seq(Ev(7L, 1, 3L)))) // late-arriving earlier view: t1 drops, t2 stays
    assert(out(0) === Seq((7L, 10L, 11L, -1L, 2L)))
    assert(out(1) === Seq((7L, 3L, 11L, -1L, 2L)))
  }

  test("single batch equals the batch funnel operator") {
    val rows = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 1L), (2L, "view", 2L), (2L, "purchase", 5L),
      (3L, "view", 4L))
    val stepOf = Map("view" -> 1, "click" -> 2, "purchase" -> 3)
    val streamed = runStream(Seq(rows.map { case (u, t, ts) => Ev(u, stepOf(t), ts) }))
      .head.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val batch = graft.operators.Sessionize
      .funnel(rows.toDF("user_id", "event_type", "ts_ms"), Seq("view", "click", "purchase"))
      .na.fill(-1L, Seq("t2", "t3"))
      .select("user_id", "t1", "t2", "t3", "stage")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(streamed === batch)
  }
}
