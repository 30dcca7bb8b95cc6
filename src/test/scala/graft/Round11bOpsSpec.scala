package graft

import graft.operators.{Normalize, Profiling, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-11 wave 2: Tukey fences (exact quartile boxplot rule),
  * equi-depth histogram (value-whole bucket assignment), Conover
  * squared-ranks variance test (median-centered, normalized
  * micro-quantized ranks), and the forecast-accuracy panel
  * (MAE/RMSE/sMAPE/MASE). Hand fixtures replay the exact integer
  * arithmetic; the conover statistic is pinned against a by-hand
  * replication of the quantized chain. */
class Round11bOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("tukeyFences: exact type-1 quartiles and quarter-scale fences") {
    // n=9, sorted 1..8 + 100: Q1 = 3rd = 3, Q3 = 7th = 7, IQR 4,
    // fences [-3, 13]; only the 100 breaches
    val df = ((1L to 8L) :+ 100L).map(("k", _)).toDF("k", "v")
    val r = Profiling.tukeyFences(df, "k", "v").head()
    assert(r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("q1") == 3L && r.getAs[Long]("q3") == 7L)
    assert(r.getAs[Long]("iqr") == 4L)
    assert(r.getAs[Double]("fence_lo") == -3.0)
    assert(r.getAs[Double]("fence_hi") == 13.0)
    assert(r.getAs[Long]("n_low") == 0L && r.getAs[Long]("n_high") == 1L)
  }

  test("equiDepthHistogram: end-rank buckets; heavy values overfill honestly") {
    val even = (1L to 8L).map(("k", _)).toDF("k", "v")
    val out = Profiling.equiDepthHistogram(even, "k", "v", nBuckets = 4)
      .orderBy("bucket").collect()
    assert(out.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo"),
      r.getAs[Long]("hi"), r.getAs[Long]("cnt"))).toSeq ==
      Seq((1L, 1L, 2L, 2L), (2L, 3L, 4L, 2L), (3L, 5L, 6L, 2L),
        (4L, 7L, 8L, 2L)))
    // a value holding 3 of 4 rows lands WHOLE in its end-rank bucket —
    // bucket 1 goes empty rather than the value lying about its span
    val heavy = Seq(1L, 1L, 1L, 2L).map(("k", _)).toDF("k", "v")
    val h = Profiling.equiDepthHistogram(heavy, "k", "v", nBuckets = 2)
      .orderBy("bucket").collect()
    assert(h.map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("cnt")))
      .toSeq == Seq((2L, 4L)))
  }

  test("conoverSquaredRanks: pinned quantized chain on a two-group fixture") {
    // A=[1,2,3] (m2=4, u=[2,0,2]), B=[10,20,30] (m2=40, u=[20,0,20]);
    // N=6, midrank pairs at u=0/2/20 -> a = 62500/340278/840278;
    // hand-replicated T = 1.341059 (see BASELINE r11 row)
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 20L), ("b", 30L)).toDF("g", "v")
    val r = Normalize.conoverSquaredRanks(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("s_tot") == 2486112L)
    assert(r.getAs[Long]("sa2") == 1651524969136L)
    assert(r.getAs[Long]("st") == 1196792146090L)
    assert(r.getAs[Double]("t_conover") == 1.341059)
    assert(!r.getAs[Boolean]("significant")) // 1.34 < chi2(1) = 3.84
  }

  test("conoverSquaredRanks: all-tied deviations yield NULL T, not a crash") {
    // both groups constant -> every u = 0 -> zero rank variance
    val df = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val r = Normalize.conoverSquaredRanks(df, "g", "v").head()
    assert(r.isNullAt(r.fieldIndex("t_conover")))
    assert(!r.getAs[Boolean]("significant"))
  }

  test("forecastAccuracy: pinned MAE/RMSE/sMAPE/MASE on a lag-2 fixture") {
    val df = Seq(10L, 20L, 30L, 60L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.forecastAccuracy(df, "k", "b", "v",
      fLag = 2, sLag = 1).head()
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("sae") == 60L && r.getAs[Long]("sas") == 40L)
    assert(r.getAs[Double]("mae") == 30.0)
    assert(r.getAs[Double]("rmse") == 31.622777) // sqrt(2000/2)
    assert(r.getAs[Double]("smape") == 1.0) // both terms exactly 2e/2y
    assert(r.getAs[Double]("mase") == 1.5)
  }

  test("forecastAccuracy: constant series -> MASE NULL (zero naive scale)") {
    val df = Seq.fill(6)(5L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.forecastAccuracy(df, "k", "b", "v",
      fLag = 2, sLag = 1).head()
    assert(r.getAs[Double]("mae") == 0.0)
    assert(r.isNullAt(r.fieldIndex("mase")))
    // |y|+|yhat| > 0 so sMAPE is defined and exactly 0
    assert(r.getAs[Double]("smape") == 0.0)
  }
}
