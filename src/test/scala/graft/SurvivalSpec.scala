package graft

import graft.operators.Survival

/** Hand-computed Kaplan–Meier / log-rank fixtures: censoring shrinks the
  * risk set without producing a step, risk-set extinction hits exact 0,
  * and the log-rank χ² matches the textbook hypergeometric chain. */
class SurvivalSpec extends SparkFunSuite {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring between steps") {
    // times {1e, 2c, 3e, 4e, 5c}: steps at 1 (5/5→0.8), 3 (×2/3),
    // 4 (×1/2); censored times 2 and 5 shrink the risk set silently
    val df = Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, true),
      ("a", 4L, true), ("a", 5L, false)).toDF("grp", "t", "ev")
    val rows = Survival.kaplanMeier(df, "grp", "t", "ev")
      .orderBy("t").collect()
    assert(rows.map(_.getAs[Long]("t")).toSeq == Seq(1L, 3L, 4L))
    assert(rows.map(_.getAs[Long]("n_at_risk")).toSeq == Seq(5L, 3L, 2L))
    assert(rows.map(_.getAs[Long]("d")).toSeq == Seq(1L, 1L, 1L))
    assert(rows.map(_.getAs[Double]("survival")).toSeq ==
      Seq(0.8, 0.533333, 0.266667))
  }

  test("kaplanMeier: risk-set extinction pins survival to exact zero") {
    // group b: {1e, 2e, 2e} — at t=2 d=n=2, so S must be exactly 0.0
    // (the zero flag, not exp(ln 0))
    val df = Seq(("b", 1L, true), ("b", 2L, true), ("b", 2L, true))
      .toDF("grp", "t", "ev")
    val rows = Survival.kaplanMeier(df, "grp", "t", "ev")
      .orderBy("t").collect()
    assert(rows.map(_.getAs[Double]("survival")).toSeq ==
      Seq(0.666667, 0.0))
    // ties at one time collapse into a single step row
    assert(rows.map(_.getAs[Long]("d")).toSeq == Seq(1L, 2L))
  }

  test("kaplanMeier: groups are independent curves") {
    val df = Seq(("a", 1L, true), ("a", 2L, true),
      ("b", 1L, true), ("b", 1L, false)).toDF("grp", "t", "ev")
    val byGrp = Survival.kaplanMeier(df, "grp", "t", "ev")
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("t")) ->
        (r.getAs[Long]("n_at_risk"), r.getAs[Double]("survival"))).toMap
    assert(byGrp(("a", 1L)) == ((2L, 0.5)))
    assert(byGrp(("a", 2L)) == ((1L, 0.0)))
    // b: both subjects at t=1, one censored -> n=2, d=1, S=0.5
    assert(byGrp(("b", 1L)) == ((2L, 0.5)))
  }

  test("logRank: separated groups produce the hand chi-square") {
    // g1 {1,2,3} all events vs g0 {4,5,6} all events:
    // ΣO−E = 0.5+0.6+0.75 = 1.85, ΣV = 0.25+0.24+0.1875 = 0.6775,
    // χ² = 1.85²/0.6775 = 5.051661 > 3.84
    val df = Seq((true, 1L, true), (true, 2L, true), (true, 3L, true),
      (false, 4L, true), (false, 5L, true), (false, 6L, true))
      .toDF("g", "t", "ev")
    val r = Survival.logRank(df, "g", "t", "ev").head()
    assert(r.getAs[Long]("n_times") == 6L)
    assert(r.getAs[Long]("events") == 6L)
    assert(r.getAs[Double]("chi2") == 5.051661)
    assert(r.getAs[Boolean]("significant"))
  }

  test("logRank: identical curves give chi2 = 0, censoring respected") {
    val df = Seq((true, 1L, true), (true, 2L, true),
      (false, 1L, true), (false, 2L, true)).toDF("g", "t", "ev")
    val r = Survival.logRank(df, "g", "t", "ev").head()
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
    // all-censored input: no event times at all -> NULL chi2, count row
    val cens = Seq((true, 1L, false), (false, 2L, false))
      .toDF("g", "t", "ev")
    val rc = Survival.logRank(cens, "g", "t", "ev").head()
    assert(rc.getAs[Long]("n_times") == 0L)
    assert(rc.isNullAt(rc.fieldIndex("chi2")))
  }
}
