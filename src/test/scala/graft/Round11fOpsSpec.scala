package graft

import graft.operators.{Eval, Profiling}
import org.apache.spark.sql.functions._

/** Round-11 wave 6: exact two-sample KS and chi-squared feature
  * scoring. */
class Round11fOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("ksTwoSample: exact integer supremum, location, and verdict") {
    // A=[1,2,3,4], B=[3,4,5,6]: gap peaks at 8/16 = 0.5, first at v=2
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    val r = Profiling.ksTwoSample(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("d_num") == 8L)
    assert(r.getAs[Long]("d_at") == 2L) // lowest value achieving the max
    assert(r.getAs[Double]("d") == 0.5)
    assert(!r.getAs[Boolean]("significant")) // crit ~ 0.96 at n=4/4
  }

  test("ksTwoSample: identical samples give D = 0") {
    val a = Seq(1L, 2L, 3L).toDF("v")
    val r = Profiling.ksTwoSample(a, a, "v").head()
    assert(r.getAs[Long]("d_num") == 0L)
    assert(r.getAs[Double]("d") == 0.0)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("exactContainmentJoin: asymmetric — the snippet is found, not its host") {
    // doc 1's 3 grams all sit inside doc 2's 8 (containment 1.0, but
    // Jaccard only 3/8 — the pair exactJaccardJoin misses at 0.5);
    // the reverse direction (8 grams vs host of 3) stays below 0.8
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h i j"),
      (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.exactContainmentJoin(
      docs, thresholdPpm = 800000L).collect()
    assert(out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Double]("containment"))).toSeq == Seq((1L, 2L, 1.0)))
    assert(out.head.getAs[Long]("common") == 3L)
    // identical twins contain each other: BOTH directions emitted
    val twins = Seq((1L, "p q r s"), (2L, "p q r s"))
      .toDF("doc_id", "text")
    val t = graft.operators.Dedup.exactContainmentJoin(
      twins, thresholdPpm = 800000L)
      .orderBy("doc_a").collect()
    assert(t.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("cumulativeIncidence: hand-computed Aalen-Johansen, CIFs sum sanely") {
    // t=1 cause1, t=2 cause2, t=3 censored, t=4 cause1:
    // inc1(1) = 1/4 = .25; inc2(2) = .75/3 = .25; inc1(4) = .5*1 = .5
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 0L),
      ("g", 4L, 1L)).toDF("grp", "t", "cause")
    val out = graft.operators.Survival.cumulativeIncidence(
      df, "grp", "t", "cause").orderBy("t").collect()
    assert(out.map(r => (r.getAs[Long]("t"), r.getAs[Double]("cif1"),
      r.getAs[Double]("cif2"))).toSeq ==
      Seq((1L, 0.25, 0.0), (2L, 0.25, 0.25), (4L, 0.75, 0.25)))
    assert(out.map(_.getAs[Long]("n_at_risk")).toSeq == Seq(4L, 3L, 1L))
    // competing risks partition the failures: cif1 + cif2 <= 1 always
    assert(out.forall(r =>
      r.getAs[Double]("cif1") + r.getAs[Double]("cif2") <= 1.0))
  }

  test("qiniDeciles: pinned uplift curve, NULL-control decile, coefficient") {
    // ranked desc: (T,conv), (C,not), (T,not), (C,conv) — the first
    // decile has no controls yet (q NULL by contract); q then walks
    // 1.0, 1.0, 0.0 and the trapezoid coefficient is 0.15
    val u = Seq(
      (1L, 40L, true, true), (2L, 30L, false, false),
      (3L, 20L, true, false), (4L, 10L, false, true))
      .toDF("uid", "score", "treated", "converted")
    val out = Eval.qiniDeciles(u, "score", "treated", "converted", "uid")
      .orderBy("decile").collect()
    assert(out.map(_.getAs[Long]("decile")).toSeq == Seq(3L, 5L, 8L, 10L))
    assert(out(0).isNullAt(out(0).fieldIndex("q")))
    assert(out(1).getAs[Double]("q") == 1.0)
    assert(out(2).getAs[Double]("q") == 1.0)
    assert(out(3).getAs[Double]("q") == 0.0)
    assert(out.forall(_.getAs[Double]("qini_coef") == 0.15))
  }

  test("shapleyAttribution: asymmetric credit, efficiency, null player") {
    // u1 touched {A} and converted; u2 touched {B}, no conversion;
    // u3 touched {A,B} and converted. v: v({A})=1, v({B})=0, v(AB)=2.
    // phi_A = (1 + 2)/2 = 1.5, phi_B = (0 + 1)/2 = 0.5 — credits sum
    // to the 2 explained conversions (efficiency).
    val ev = Seq(
      (1L, "A"), (1L, "conv"),
      (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "conv"))
      .toDF("user_id", "event_type")
    val out = graft.operators.Sessionize.shapleyAttribution(
      ev, touchTypes = Seq("A", "B"), convType = "conv")
      .orderBy("channel").collect()
    assert(out.map(r => (r.getAs[String]("channel"),
      r.getAs[Double]("phi"))).toSeq == Seq(("A", 1.5), ("B", 0.5)))
    // a channel nobody touches is a null player: phi = 0
    val out3 = graft.operators.Sessionize.shapleyAttribution(
      ev, touchTypes = Seq("A", "B", "C"), convType = "conv")
      .orderBy("channel").collect()
    assert(out3.find(_.getAs[String]("channel") == "C").get
      .getAs[Double]("phi") == 0.0)
    assert(out3.map(_.getAs[Double]("phi")).sum == 2.0) // efficiency
  }

  test("chi2FeatureScores: pinned 2x2 and the zero-margin NULL guard") {
    // universe = 8 docs (all carry dim 9); dim 7 sits in docs 1-4:
    // a=3, b=1, c=1, d=3 -> chi2 = 8*(9-1)^2/256 = 2.0;
    // dim 9 is in EVERY doc -> c+d margin 0 -> NULL by contract
    val items = Seq(
      (1L, 7L, true), (2L, 7L, true), (3L, 7L, true), (4L, 7L, false),
      (1L, 9L, true), (2L, 9L, true), (3L, 9L, true), (4L, 9L, false),
      (5L, 9L, true), (6L, 9L, false), (7L, 9L, false), (8L, 9L, false))
      .toDF("doc_id", "dim", "is_en")
    val out = Eval.chi2FeatureScores(items, "doc_id", "dim", "is_en")
      .orderBy("dim").collect()
    val d7 = out(0)
    assert(d7.getAs[Long]("a") == 3L && d7.getAs[Long]("b") == 1L)
    assert(d7.getAs[Long]("c") == 1L && d7.getAs[Long]("d") == 3L)
    assert(d7.getAs[Double]("chi2") == 2.0)
    assert(!d7.getAs[Boolean]("significant")) // 2.0 < 3.84
    val d9 = out(1)
    assert(d9.isNullAt(d9.fieldIndex("chi2")))
    assert(!d9.getAs[Boolean]("significant"))
  }
}
