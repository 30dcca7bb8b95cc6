package graft

import graft.operators.{Eval, Sessionize, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-10 continuation: MACD (truncated-EMA momentum), Herfindahl
  * concentration, and navigation-chain conditional entropy. */
class Round10gOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def series(vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "b", "v")

  test("macd: a constant series is flat — zero lines, no crossovers") {
    val out = TimeSeries.macd(series(Seq.fill(40)(100L)),
      "k", "b", "v").orderBy("b").collect()
    assert(out.length == 15) // warm-up drops rn < 26
    assert(out.forall(_.getAs[Double]("macd") == 0.0))
    assert(out.forall(_.getAs[Double]("signal") == 0.0))
    assert(out.forall(_.getAs[Double]("histogram") == 0.0))
    assert(out.forall(_.isNullAt(out(0).fieldIndex("crossover"))))
  }

  test("macd: a level jump fires one bullish crossover at the jump") {
    val vs = Seq.fill(30)(100L) ++ Seq.fill(10)(200L)
    val out = TimeSeries.macd(series(vs), "k", "b", "v")
      .orderBy("b").collect()
    val crosses = out.filter(!_.isNullAt(out(0).fieldIndex("crossover")))
      .map(r => (r.getAs[Long]("b"), r.getAs[String]("crossover")))
    assert(crosses.head == (30L, "bullish"))
    assert(out.filter(_.getAs[Long]("b") >= 30L)
      .forall(_.getAs[Double]("macd") > 0.0))
  }

  test("hhi: pinned shares, monopoly 1.0, equal split 1/n") {
    val df = Seq(("m1", "f1", 50L), ("m1", "f2", 30L), ("m1", "f3", 20L),
      ("m2", "f1", 10L),
      ("m3", "f1", 5L), ("m3", "f2", 5L), ("m3", "f3", 5L), ("m3", "f4", 5L))
      .toDF("mkt", "firm", "v")
    val out = Eval.hhi(df, "mkt", "firm", "v").orderBy("mkt").collect()
    assert(out(0).getAs[Long]("n_firms") == 3L)
    assert(out(0).getAs[Double]("hhi") == 0.38)
    assert(out(0).getAs[Double]("top_share") == 0.5)
    assert(out(1).getAs[Double]("hhi") == 1.0)
    assert(out(2).getAs[Double]("hhi") == 0.25)
  }

  test("elasticity: exact log-log line recovers the slope, pinned r2") {
    val line = Seq(0L, 100L, 200L, 300L).map(x => ("b", x, 1000L - 2 * x))
      .toDF("k", "x", "y")
    val r = TimeSeries.elasticity(line, "k", "x", "y").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("slope") == -2.0)
    assert(r.getAs[Double]("r2") == 1.0)
    val noisy = Seq((0L, 0L), (1000L, 900L), (2000L, 2100L))
      .map { case (x, y) => ("b", x, y) }.toDF("k", "x", "y")
    val rn = TimeSeries.elasticity(noisy, "k", "x", "y").head()
    assert(rn.getAs[Double]("slope") == 1.05)
    assert(rn.getAs[Double]("r2") == 0.993243)
  }

  test("chainEntropy: deterministic chain has zero conditional entropy") {
    val ev = Seq("a", "b", "a", "b", "a").zipWithIndex
      .map { case (t, i) => (1L, t, i.toLong * 1000, i.toLong) }
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val r = Sessionize.chainEntropy(ev).head()
    assert(r.getAs[Long]("n_transitions") == 4L)
    assert(r.getAs[Long]("n_states") == 2L)
    assert(r.getAs[Double]("h_cond_bits") == 0.0)
    assert(r.getAs[Double]("h_marginal_bits") == 1.0)
  }

  test("chainEntropy: a fair branch costs one bit given the state") {
    val ev = Seq("a", "a", "b").zipWithIndex
      .map { case (t, i) => (1L, t, i.toLong * 1000, i.toLong) }
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val r = Sessionize.chainEntropy(ev).head()
    assert(r.getAs[Long]("n_transitions") == 2L)
    assert(r.getAs[Long]("n_states") == 1L) // only 'a' ever transitions
    assert(r.getAs[Double]("h_cond_bits") == 1.0)
    assert(r.getAs[Double]("h_marginal_bits") == 0.0)
  }
}
