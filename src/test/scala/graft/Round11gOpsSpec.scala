package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Round-11 wave 7: per-sample WAV decode + DFT dominant-frequency
  * sweep — the spectral feature finds the synthesized tone. */
class Round11gOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def media(specs: (Long, Int, Int)*) =
    specs.map { case (id, f, n) =>
      (id, Multimodal.synthesizeWavSaw(f, n))
    }.toDF("doc_id", "content")

  test("wavSamples: capped per-sample decode matches the synth formula") {
    val m = media((1L, 400, 300))
    val s = Multimodal.wavSamples(m, maxSamples = 100)
      .orderBy("i").collect()
    assert(s.length == 100 && s.forall(_.n == 100L))
    // sample(i) = ((i*400) % 8000) * 65536 / 8000 - 32768
    assert(s(0).amp == -32768L)
    assert(s(1).amp == (400L * 65536L / 8000L - 32768L))
  }

  test("enrichment: a flag-heavy group scores positive; degenerate nulls") {
    // 12 rows, 4 flagged; group a (4 rows) holds all 4 flags
    val df = (Seq.fill(4)(("a", true)) ++ Seq.fill(8)(("b", false)))
      .toDF("g", "f")
    val out = graft.operators.Profiling.enrichment(df, "g", "f")
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getAs[Long]("k") == 4L && a.getAs[Long]("n") == 4L)
    // expected = 4*4/12 = 1.333, ratio = 4*12/(4*4) = 3
    assert(a.getAs[Double]("expected") == 1.333333)
    assert(a.getAs[Double]("ratio") == 3.0)
    assert(a.getAs[Double]("z") > 0 && a.getAs[Boolean]("significant"))
    assert(out(1).getAs[Double]("z") < 0)
    // a universe with every row flagged has no null to test against
    val deg = Seq(("a", true), ("b", true)).toDF("g", "f")
    val d = graft.operators.Profiling.enrichment(deg, "g", "f").head()
    assert(d.isNullAt(d.fieldIndex("z")))
    assert(!d.getAs[Boolean]("significant"))
  }

  test("timeToConvert: first conversion at-or-after the first touch") {
    val ev = Seq(
      (1L, "click", 10L), (1L, "conv", 15L),            // latency 5
      (2L, "conv", 5L), (2L, "click", 10L), (2L, "conv", 30L), // 20
      (3L, "conv", 7L),                                 // no touch: drop
      (4L, "click", 9L))                                // no conv: drop
      .toDF("user_id", "event_type", "ts_ms")
    val out = graft.operators.Sessionize.timeToConvert(
      ev, touchTypes = Seq("click"), convType = "conv")
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("latency_ms"))).toSeq == Seq((1L, 5L), (2L, 20L)))
  }

  test("exactQuantiles: type-1 order statistics at any q") {
    val df = (1L to 10L).map(("k", _)).toDF("k", "v")
    val out = graft.operators.Profiling.exactQuantiles(
      df, "k", "v", Seq(250000L, 500000L, 900000L, 1000000L))
      .orderBy("q_ppm").collect()
    assert(out.map(r => (r.getAs[Long]("q_ppm"), r.getAs[Long]("value")))
      .toSeq == Seq((250000L, 3L), (500000L, 5L), (900000L, 9L),
        (1000000L, 10L)))
    assert(out.forall(_.getAs[Long]("n") == 10L))
  }

  test("bmpOtsu: hand-computed threshold on a 4-pixel ramp") {
    // pixels [0,1,2,3]: J(t=0)=12, J(t=1)=16, J(t=2)=12 -> threshold 1,
    // foreground (px > 1) fraction 0.5
    val m = Seq((1L, Multimodal.synthesizeBmp24(0L, 4, 1)))
      .toDF("doc_id", "content")
    val r = Multimodal.bmpOtsu(m).head()
    assert(r.getAs[Long]("n_px") == 4L)
    assert(r.getAs[Long]("threshold") == 1L)
    assert(r.getAs[Long]("j_num") == -8L)
    assert(r.getAs[Double]("fg_frac") == 0.5)
  }

  test("wavDominantFreq: the DFT peak lands on each doc's synth tone") {
    // k_peak = freq * n / rate exactly when the tone period divides n
    val m = media((1L, 400, 800), (2L, 100, 800), (3L, 1000, 800))
    val out = Multimodal.wavDominantFreq(m, maxBins = 110,
        maxSamples = 2048)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("k_peak"), r.getAs[Double]("freq_hz"))).toSeq ==
      Seq((1L, 40L, 400.0), (2L, 10L, 100.0), (3L, 100L, 1000.0)))
    // exact-decimal energy is exposed string-rendered, never NULL
    assert(out.forall(!_.isNullAt(out.head.fieldIndex("peak_energy_sq"))))
  }
}
