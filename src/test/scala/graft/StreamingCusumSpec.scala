package graft

import graft.streaming.StreamingCusum
import graft.streaming.StreamingCusum.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Multi-batch state handoff for the streaming CUSUM — the behavior the
  * single-batch oracle cannot see. */
class StreamingCusumSpec extends SparkFunSuite {
  import spark.implicits._

  private def runStream(
      batches: Seq[Seq[Ev]],
      target: Long, drift: Long, threshold: Long)
      : Seq[Seq[(Long, Long, Long, Long, Long, Long, Int)]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"cusum_out_${System.nanoTime()}"
    val q = StreamingCusum.cusum(input.toDS(), target, drift, threshold)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.map { b =>
        val before = spark.table(name).count()
        input.addData(b); q.processAllAvailable()
        spark.table(name)
          .as[(Long, Long, Long, Long, Long, Long, Int)].collect().toSeq
          .drop(before.toInt)
      }
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("cusum state carries across batches; within-batch events fold in (ts, tie) order") {
    // target 0, drift 0, threshold 5
    val out = runStream(Seq(
      // batch 1 arrives out of order; sorted fold: x=4 -> pos 4; x=3 -> pos 7 alarm
      Seq(Ev(1L, 2L, 1L, 3L), Ev(1L, 1L, 1L, 4L)),
      // batch 2: pos continues from 7: x=-20 -> pos 0, neg 20 alarm
      Seq(Ev(1L, 3L, 1L, -20L)),
      // independent key: own state
      Seq(Ev(2L, 1L, 1L, 6L))),
      target = 0L, drift = 0L, threshold = 5L)
    assert(out(0) === Seq(
      (1L, 1L, 1L, 4L, 4L, 0L, 0), (1L, 2L, 1L, 3L, 7L, 0L, 1)))
    assert(out(1) === Seq((1L, 3L, 1L, -20L, 0L, 20L, 1)))
    assert(out(2) === Seq((2L, 1L, 1L, 6L, 6L, 0L, 1)))
  }

  test("single batch equals the batch cusum fold") {
    import org.scalacheck.{Gen, rng}
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L), Gen.choose(-8L, 8L)))
    val raw = gen(Gen.Parameters.default, rng.Seed(77L)).get
      .zipWithIndex.map { case ((k, ts, x), i) => Ev(k, ts, i.toLong, x) }
    val streamed = runStream(Seq(raw), target = 1L, drift = 1L, threshold = 4L)
      .head.map(o => (o._1, o._2, o._3) -> ((o._5, o._6, o._7))).toMap
    val expected = raw.groupBy(_.key).flatMap { case (k, es) =>
      var pos = 0L; var neg = 0L
      es.sortBy(e => (e.ts_ms, e.tie)).map { e =>
        pos = math.max(0L, pos + e.x - 1L - 1L)
        neg = math.max(0L, neg + 1L - e.x - 1L)
        (k, e.ts_ms, e.tie) -> ((pos, neg, if (pos > 4L || neg > 4L) 1 else 0))
      }
    }
    assert(streamed === expected)
  }
}
