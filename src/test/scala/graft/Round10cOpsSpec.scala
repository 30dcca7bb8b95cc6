package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Round-10 continuation: the rolling-envelope family — max drawdown,
  * Bollinger breach flags (exact decimal compares), Cutler's RSI,
  * stochastic %K/%D (micro-quantized), VWAP, and ATR over OHLC bars.
  * Hand fixtures replay the shared-SQL chains; pinned doubles verified
  * by hand/python replication of the quantized arithmetic. */
class Round10cOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def series(vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "b", "v")

  test("drawdown: peak-to-trough with earliest-trough tie-break") {
    val r = TimeSeries.drawdown(
      series(Seq(10L, 20L, 15L, 5L, 18L, 8L)), "k", "b", "v").head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("max_dd") == 15L)
    assert(r.getAs[Long]("peak_v") == 20L)
    assert(r.getAs[Long]("trough_v") == 5L)
    assert(r.getAs[Long]("trough_bucket") == 3L)
    assert(r.getAs[Double]("dd_frac") == 0.75)
    val tie = TimeSeries.drawdown(
      series(Seq(10L, 5L, 10L, 5L)), "k", "b", "v").head()
    assert(tie.getAs[Long]("max_dd") == 5L)
    assert(tie.getAs[Long]("trough_bucket") == 1L) // earliest of the two
  }

  test("drawdown: non-positive peak yields null fraction") {
    val r = TimeSeries.drawdown(
      series(Seq(-5L, -10L)), "k", "b", "v").head()
    assert(r.getAs[Long]("max_dd") == 5L)
    assert(r.getAs[Long]("peak_v") == -5L)
    assert(r.isNullAt(r.fieldIndex("dd_frac")))
  }

  test("bollinger: flat window never breaches; spike breaches at k=1") {
    val out = TimeSeries.bollinger(
      series(Seq(10L, 10L, 10L, 10L, 100L)), "k", "b", "v",
      nBars = 3, k = 1).orderBy("b").collect()
    assert(out.length == 3) // warm-up rows dropped
    assert(out.forall(!_.getAs[Boolean]("breach_lo")))
    assert(!out(0).getAs[Boolean]("breach_hi")) // [10,10,10]
    assert(!out(1).getAs[Boolean]("breach_hi"))
    assert(out(2).getAs[Boolean]("breach_hi")) // 100 vs mean 40, sd 42.4
    assert(out(2).getAs[Double]("mid") == 40.0)
    // k=2 swallows a lone spike in a 3-bar window: 60 < 2·42.4
    val k2 = TimeSeries.bollinger(
      series(Seq(10L, 10L, 10L, 10L, 100L)), "k", "b", "v",
      nBars = 3, k = 2).orderBy("b").collect()
    assert(k2.forall(!_.getAs[Boolean]("breach_hi")))
  }

  test("rsi: pinned gain/loss windows, all-loss 0, flat null") {
    val out = TimeSeries.rsi(
      series(Seq(10L, 12L, 11L, 14L, 14L, 9L)), "k", "b", "v", nBars = 3)
      .orderBy("b").collect()
    assert(out.map(_.getAs[Long]("b")).toSeq == Seq(3L, 4L, 5L))
    assert(out(0).getAs[Double]("rsi") == 83.333333) // gains 5, losses 1
    assert(out(1).getAs[Double]("rsi") == 75.0)
    assert(out(2).getAs[Double]("rsi") == 37.5)
    val loss = TimeSeries.rsi(
      series(Seq(5L, 4L, 3L, 2L)), "k", "b", "v", nBars = 3).head()
    assert(loss.getAs[Double]("rsi") == 0.0)
    val flat = TimeSeries.rsi(
      series(Seq(5L, 5L, 5L, 5L)), "k", "b", "v", nBars = 3).head()
    assert(flat.isNullAt(flat.fieldIndex("rsi")))
  }

  test("stochasticOsc: pinned %K and micro-quantized %D") {
    val out = TimeSeries.stochasticOsc(
      series(Seq(10L, 20L, 5L, 15L, 10L, 25L)), "k", "b", "v", nBars = 3)
      .orderBy("b").collect()
    assert(out.map(_.getAs[Double]("pct_k")).toSeq ==
      Seq(0.0, 66.666667, 50.0, 100.0))
    assert(out(0).isNullAt(out(0).fieldIndex("pct_d"))) // <3 bars yet
    assert(out(1).isNullAt(out(1).fieldIndex("pct_d")))
    assert(out(2).getAs[Double]("pct_d") == 38.888889)
    assert(out(3).getAs[Double]("pct_d") == 72.222222)
  }

  test("stochasticOsc: flat range nulls %K, which drops from %D's mean") {
    val out = TimeSeries.stochasticOsc(
      series(Seq(10L, 20L, 5L, 5L, 5L, 30L)), "k", "b", "v", nBars = 3)
      .orderBy("b").collect()
    val r5 = out(2) // window [5,5,5]
    assert(r5.isNullAt(r5.fieldIndex("pct_k")))
    // warm-up rows (frame < 3) stay NULL...
    assert(out(0).isNullAt(out(0).fieldIndex("pct_d")))
    assert(out(1).isNullAt(out(1).fieldIndex("pct_d")))
    // ...then the NULL %K drops from the average of the remaining two:
    // frame (0, 0, NULL) -> 0; frame (0, NULL, 100) -> 50
    assert(out(2).getAs[Double]("pct_d") == 0.0)
    assert(out(3).getAs[Double]("pct_d") == 50.0)
    // an all-flat frame has no defined %K at all -> %D NULL
    val flat = TimeSeries.stochasticOsc(
      series(Seq(5L, 5L, 5L, 5L, 5L, 5L)), "k", "b", "v", nBars = 3)
      .orderBy("b").collect()
    assert(flat.forall(_.isNullAt(flat(0).fieldIndex("pct_d"))))
  }

  test("vwap: exact notional/qty division; zero quantity nulls") {
    val df = Seq(("k", 0L, 200L, 2L), ("k", 0L, 300L, 3L),
      ("k", 1L, 100L, 0L)).toDF("k", "b", "notional_in", "q")
    val out = TimeSeries.vwap(df, "k", "b", "notional_in", "q")
      .orderBy("b").collect()
    assert(out(0).getAs[Long]("n_trades") == 2L)
    assert(out(0).getAs[Long]("qty") == 5L)
    assert(out(0).getAs[Long]("notional") == 500L)
    assert(out(0).getAs[Double]("vwap") == 100.0)
    assert(out(1).isNullAt(out(1).fieldIndex("vwap")))
  }

  test("classicalDecompose: linear trend + exact period-4 cycle recovered") {
    // v_t = 10t + s(t%4), s = [0, 8, -4, -4]: the 2x4 MA recovers the
    // line exactly, phase means recover s, remainder is identically 0
    val s4 = Seq(0L, 8L, -4L, -4L)
    val vs = (0 until 12).map(t => 10L * t + s4(t % 4))
    val out = TimeSeries.classicalDecompose(
      series(vs), "k", "b", "v", period = 4).orderBy("b").collect()
    assert(out.map(_.getAs[Long]("b")).toSeq == (2L to 9L))
    assert(out.map(_.getAs[Double]("trend")).toSeq ==
      (2 to 9).map(_ * 10.0))
    assert(out.map(_.getAs[Double]("seasonal")).toSeq ==
      (2 to 9).map(t => s4(t % 4).toDouble))
    assert(out.forall(_.getAs[Double]("remainder") == 0.0))
  }

  test("seasonalStrength: exact cycle scores 1.0; noise scores low") {
    val s4 = Seq(0L, 8L, -4L, -4L)
    val clean = (0 until 12).map(t => 10L * t + s4(t % 4))
    val r = TimeSeries.seasonalStrength(
      series(clean), "k", "b", "v", period = 4).head()
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Double]("f_seasonal") == 1.0)
    assert(r.getAs[Double]("f_trend") == 1.0)
    // alternating noise, no period-4 structure beyond its own variance
    val noise = Seq(5L, -3L, 7L, -1L, 2L, 9L, -4L, 6L, 0L, 3L, -2L, 8L)
    val rn = TimeSeries.seasonalStrength(
      series(noise), "k", "b", "v", period = 4).head()
    val fs = rn.getAs[Double]("f_seasonal")
    assert(fs >= 0.0 && fs <= 1.0)
  }

  test("seasonal anomaly composition: a planted spike tops the remainder") {
    // trend + period-4 cycle + small period-3 noise (NOT absorbable by
    // the phase means) + one +500 spike at bucket 8
    val s4 = Seq(0L, 8L, -4L, -4L)
    val vs = (0 until 16).map(t =>
      10L * t + s4(t % 4) + (t % 3) + (if (t == 8) 500L else 0L))
    val d = TimeSeries.classicalDecompose(
        series(vs), "k", "b", "v", period = 4)
      .select(col("k"), col("b"),
        expr("CAST(round(remainder * 1e6, 0) AS BIGINT)").as("r_micro"))
    val out = TimeSeries.madOutliers(d, "k", "b", "r_micro")
      .withColumn("anomaly", expr("mad > 0 AND dev > 5 * mad"))
      .orderBy(col("dev").desc, col("b")).collect()
    assert(out.head.getAs[Long]("b") == 8L)
    assert(out.head.getAs[Boolean]("anomaly"))
    // the spike's MA bleed into neighbors stays below the 5-MAD gate...
    assert(out.count(_.getAs[Boolean]("anomaly")) <= 5)
  }

  test("atr: true range sees inter-bar gaps; pinned rolling means") {
    val bars = Seq(("k", 0L, 10L, 5L, 8L), ("k", 1L, 9L, 8L, 7L),
      ("k", 2L, 20L, 6L, 12L))
      .toDF("k", "bar", "high", "low", "close")
    val out = TimeSeries.atr(bars, "k", "bar", nBars = 2)
      .orderBy("bar").collect()
    // TR: 5 (first bar h-l), 1, 14 (gap |20-7|=13 < h-l 14)
    assert(out.map(_.getAs[Long]("tr")).toSeq == Seq(1L, 14L))
    assert(out(0).getAs[Double]("atr") == 3.0)
    assert(out(1).getAs[Double]("atr") == 7.5)
  }
}
