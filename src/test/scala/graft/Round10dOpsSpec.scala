package graft

import graft.operators.{Normalize, Profiling, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-10 continuation: exact-rational binomial proportion test, the
  * conditional-binomial Poisson two-rate test, Anderson–Darling
  * normality (micro-quantized tail-weighted log terms), KPSS level
  * stationarity (exact decimal bridge sums), and the Dickey–Fuller
  * unit-root regression. Pinned doubles replicate the shared-SQL
  * quantized chains in python. */
class Round10dOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def series(vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "b", "v")

  test("binomialTest: 8/10 vs 1/2 pinned z; |d|<=0.5 pins z to 0") {
    val df = (Seq.fill(8)(true) ++ Seq.fill(2)(false))
      .map(("k", _)).toDF("k", "s")
    val r = Profiling.binomialTest(df, "k", "s", 1L, 2L).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("x") == 8L)
    assert(r.getAs[Double]("z") == 1.581139)
    assert(r.getAs[Double]("p_normal") == 0.113846)
    assert(!r.getAs[Boolean]("significant"))
    val even = (Seq.fill(5)(true) ++ Seq.fill(5)(false))
      .map(("k", _)).toDF("k", "s")
    val r0 = Profiling.binomialTest(even, "k", "s", 1L, 2L).head()
    assert(r0.getAs[Double]("z") == 0.0)
    assert(r0.getAs[Double]("p_normal") == 1.0)
  }

  test("poissonTwoRate: 30 events/7d vs 40/24d — rate jump detected") {
    val df = (Seq.fill(30)(true) ++ Seq.fill(40)(false))
      .map(("k", _)).toDF("k", "a")
    val r = Profiling.poissonTwoRate(df, "k", "a", tA = 7L, tB = 24L).head()
    assert(r.getAs[Long]("n") == 70L && r.getAs[Long]("x") == 30L)
    assert(r.getAs[Double]("rate_a") == 4.285714)
    assert(r.getAs[Double]("rate_b") == 1.666667)
    assert(r.getAs[Double]("z") == 3.91448)
    assert(r.getAs[Double]("p_normal") == 9.1e-05)
    assert(r.getAs[Boolean]("significant"))
  }

  test("andersonDarling: uniform 1..10 mild, outlier flags, const null") {
    val u = Normalize.andersonDarling(
      (1L to 10L).map(("k", _)).toDF("k", "v"), "k", "v").head()
    assert(u.getAs[Long]("n") == 10L)
    assert(u.getAs[Long]("s_micro") == -101411078L)
    assert(u.getAs[Double]("a2") == 0.141108)
    assert(u.getAs[Double]("a2_star") == 0.154866)
    assert(!u.getAs[Boolean]("significant"))
    val o = Normalize.andersonDarling(
      ((1L to 9L) :+ 100L).map(("k", _)).toDF("k", "v"), "k", "v").head()
    assert(o.getAs[Double]("a2_star") == 2.852987)
    assert(o.getAs[Boolean]("significant"))
    val c = Normalize.andersonDarling(
      Seq.fill(5)(7L).map(("k", _)).toDF("k", "v"), "k", "v").head()
    assert(c.isNullAt(c.fieldIndex("a2")))
    assert(!c.getAs[Boolean]("significant"))
  }

  test("kpss: alternation stays stationary, a trend rejects") {
    val alt = TimeSeries.kpss(
      series(Seq(5L, 3L, 6L, 4L, 5L, 3L, 6L, 4L)), "k", "b", "v").head()
    assert(alt.getAs[Long]("s_nano") == 300000000L)
    assert(alt.getAs[Double]("eta") == 0.0375)
    assert(!alt.getAs[Boolean]("nonstationary"))
    val tr = TimeSeries.kpss(series((1L to 20L)), "k", "b", "v").head()
    assert(tr.getAs[Double]("eta") == 2.005)
    assert(tr.getAs[Boolean]("nonstationary"))
    val const = TimeSeries.kpss(
      series(Seq.fill(6)(4L)), "k", "b", "v").head()
    assert(const.isNullAt(const.fieldIndex("eta")))
    assert(!const.getAs[Boolean]("nonstationary"))
  }

  test("dickeyFuller: mean reversion rejects the unit root") {
    val r = TimeSeries.dickeyFuller(
      series(Seq(10L, 2L, 9L, 3L, 8L, 1L, 9L, 2L, 10L, 3L)),
      "k", "b", "v").head()
    assert(r.getAs[Long]("m") == 9L)
    assert(r.getAs[Double]("beta") == -1.9)
    assert(r.getAs[Double]("t_stat") == -17.112227)
    assert(r.getAs[Boolean]("stationary"))
    assert(r.getAs[String]("sxy") == "-270")
  }

  test("dickeyFuller: a perfect-fit walk yields null t, not stationary") {
    val r = TimeSeries.dickeyFuller(series((1L to 10L)), "k", "b", "v")
      .head()
    assert(r.getAs[Double]("beta") == 0.0) // constant drift, zero slope
    assert(r.isNullAt(r.fieldIndex("t_stat"))) // ssr = 0
    assert(!r.getAs[Boolean]("stationary"))
  }
}
