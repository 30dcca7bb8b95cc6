package graft

import graft.streaming.StreamingCadence
import graft.streaming.StreamingCadence.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Multi-batch state handoff for the streaming cadence profile — the
  * cross-batch gap (last event of batch N to first of batch N+1) must be
  * measured, and per-key moments must match the batch fold. */
class StreamingCadenceSpec extends SparkFunSuite {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[Ev]])
      : Seq[Seq[(Long, Long, Long, Long)]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val name = s"cadence_out_${System.nanoTime()}"
    val q = StreamingCadence.cadence(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update")
      .start()
    try {
      batches.map { b =>
        val before = spark.table(name).count()
        input.addData(b); q.processAllAvailable()
        spark.table(name)
          .as[(Long, Long, Long, Long)].collect().toSeq
          .drop(before.toInt)
      }
    } finally {
      q.stop(); spark.sql(s"DROP TABLE IF EXISTS $name")
    }
  }

  test("gap moments accumulate across batches, including the seam gap") {
    val out = runStream(Seq(
      // batch 1 out of order: sorted gaps 10, 10 -> n=2 sg=20 sgg=200
      Seq(Ev(1L, 20L, 2L), Ev(1L, 0L, 0L), Ev(1L, 10L, 1L)),
      // batch 2: seam gap 30 (20 -> 50) plus in-batch gap 10
      Seq(Ev(1L, 50L, 3L), Ev(1L, 60L, 4L)),
      // independent key: first event emits the zero-moment row
      Seq(Ev(2L, 5L, 0L))))
    assert(out(0) === Seq((1L, 2L, 20L, 200L)))
    assert(out(1) === Seq((1L, 4L, 60L, 1200L)))
    assert(out(2) === Seq((2L, 0L, 0L, 0L)))
  }

  test("single batch equals the batch cadenceProfile moments") {
    import org.scalacheck.{Gen, rng}
    val gen = Gen.listOfN(80,
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 500L)))
    val raw = gen(Gen.Parameters.default, rng.Seed(42L)).get
      .zipWithIndex.map { case ((k, ts), i) => Ev(k, ts, i.toLong) }
    val streamed = runStream(Seq(raw)).head
      .map(o => o._1 -> ((o._2, o._3, o._4))).toMap
    val expected = raw.groupBy(_.key).map { case (k, es) =>
      val sorted = es.sortBy(e => (e.ts_ms, e.tie))
      val gaps = sorted.sliding(2).collect {
        case Seq(a, b) => b.ts_ms - a.ts_ms
      }.toSeq
      k -> ((gaps.size.toLong, gaps.sum, gaps.map(g => g * g).sum))
    }
    assert(streamed === expected)
  }
}
