package graft

import graft.operators.{Eval, Normalize, Profiling, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-10 continuation: turning-points / Cox–Stuart randomness-and-
  * trend screens, the Chow structural-break F, Welch's heteroskedastic
  * ANOVA, Breusch–Pagan, Cook's distance, Hodges–Lehmann shift, and
  * the binned distribution-distance panel. Hand fixtures replicate the
  * shared-SQL chains (python-replayed quantization for the pinned
  * doubles). */
class Round10bOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("turningPoints: [1,3,2,4,1,5] has 4 turns, z pinned") {
    val df = Seq(1L, 3L, 2L, 4L, 1L, 5L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.turningPoints(df, "k", "b", "v").head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("n_turning") == 4L)
    assert(r.getAs[Double]("z") == 1.545335)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("turningPoints: monotone series has zero turns; n<=2 yields null z") {
    val mono = (1L to 10L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.turningPoints(mono, "k", "b", "v").head()
    assert(r.getAs[Long]("n_turning") == 0L)
    val tiny = Seq(("k", 0L, 1L), ("k", 1L, 2L)).toDF("k", "b", "v")
    val t = TimeSeries.turningPoints(tiny, "k", "b", "v").head()
    assert(t.isNullAt(t.fieldIndex("z")))
  }

  test("coxStuart: strictly increasing 1..10 — all 5 pairs up, z pinned") {
    val df = (1L to 10L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.coxStuart(df, "k", "b", "v").head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("s_plus") == 5L)
    assert(r.getAs[Long]("s_minus") == 0L)
    assert(r.getAs[Double]("z") == 2.236068) // 5/sqrt(5)
    assert(r.getAs[String]("trend") == "increasing")
  }

  test("coxStuart: odd length drops the middle; all-tie pairs null z") {
    // n=5 -> pairs (1,4),(2,5): offset ceil(5/2)=3, middle x3 unused
    val df = Seq(1L, 2L, 3L, 0L, 5L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.coxStuart(df, "k", "b", "v").head()
    assert(r.getAs[Long]("s_plus") + r.getAs[Long]("s_minus") == 2L)
    val ties = Seq(4L, 5L, 4L, 5L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val t = TimeSeries.coxStuart(ties, "k", "b", "v").head()
    assert(t.isNullAt(t.fieldIndex("z")))
    assert(t.getAs[String]("trend") == "none")
  }

  test("chowTest: slope break at x=6 — F pinned, perfect fits null") {
    val y1 = Seq(2L, 4L, 7L, 8L, 10L); val y2 = Seq(32L, 34L, 35L, 38L, 40L)
    val df = (y1 ++ y2).zipWithIndex
      .map { case (v, i) => ("k", (i + 1).toLong, v) }.toDF("k", "b", "v")
    val r = TimeSeries.chowTest(df, "k", "b", "v", breakBucket = 6L).head()
    assert(r.getAs[Long]("n1") == 5L && r.getAs[Long]("n2") == 5L)
    assert(r.getAs[Double]("f_stat") == 436.545455)
    assert(r.getAs[Boolean]("significant"))
    // both segments exactly linear -> SSR sum 0 -> null, never a crash
    val exact = (1L to 10L).map(i =>
      ("k", i, if (i < 6L) 2 * i else 2 * i + 20)).toDF("k", "b", "v")
    val e = TimeSeries.chowTest(exact, "k", "b", "v", 6L).head()
    assert(e.isNullAt(e.fieldIndex("f_stat")))
  }

  test("welchAnova: separated groups — pinned quantized F and df2") {
    val rows =
      Seq(10L, 20L, 30L, 40L).map(("a", _)) ++
        Seq(110L, 120L, 130L, 140L).map(("b", _)) ++
        Seq(50L, 60L, 75L, 85L).map(("c", _))
    val df = rows.map { case (g, v) => ("k", g, v) }.toDF("key", "g", "v")
    val r = Normalize.welchAnova(df, "key", "g", "v").head()
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("a_sum_micro") == 120692308L)
    assert(r.getAs[Long]("l_sum_nano") == 447403024L)
    assert(r.getAs[Double]("f_stat") == 54.275409)
    assert(r.getAs[Double]("df2") == 5.960323)
    assert(r.getAs[Boolean]("significant"))
  }

  test("welchAnova: zero-variance and singleton groups are excluded") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L), // ok
      ("b", 7L), ("b", 7L), // zero variance
      ("c", 9L), // singleton
      ("d", 4L), ("d", 6L)) // ok
    val df = rows.map { case (g, v) => ("k", g, v) }.toDF("key", "g", "v")
    val r = Normalize.welchAnova(df, "key", "g", "v").head()
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n") == 5L)
  }

  test("breuschPagan: fanning residuals flag, perfect fit stays null") {
    val het = (1L to 20L).zipWithIndex.map { case (x, i) =>
      (x, 10 * x + (if (i % 2 == 0) x else -x))
    }.toDF("x", "y")
    val r = Eval.breuschPagan(het, "x", "y").head()
    assert(r.getAs[Double]("lm") == 17.778496)
    assert(r.getAs[Boolean]("significant"))
    val perfect = (1L to 10L).map(x => (x, x)).toDF("x", "y")
    val p = Eval.breuschPagan(perfect, "x", "y").head()
    assert(p.isNullAt(p.fieldIndex("lm")))
  }

  test("cooksDistance: the off-line outlier dominates, ranks stable") {
    val pts = (1L to 9L).map(i => (i, i, i)) :+ ((10L, 10L, 100L))
    val out = Eval.cooksDistance(pts.toDF("id", "x", "y"),
      "id", "x", "y", topK = 3).collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("id") == 10L)
    assert(out(0).getAs[Double]("d") == 2.111111)
    assert(out(1).getAs[Long]("id") == 9L)
    assert(out(1).getAs[Double]("d") == 0.227541)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L))
  }

  test("hodgesLehmann: exact middle order statistics, even and odd") {
    val a = Seq(1L, 2L, 3L).toDF("v"); val b = Seq(0L).toDF("v")
    val r = Profiling.hodgesLehmann(a, b, "v").head()
    assert(r.getAs[Long]("n_pairs") == 3L)
    assert(r.getAs[Long]("hl_x2") == 4L) // median of {1,2,3} = 2
    assert(r.getAs[Double]("hl") == 2.0)
    val a2 = Seq(1L, 3L).toDF("v")
    val r2 = Profiling.hodgesLehmann(a2, b, "v").head()
    assert(r2.getAs[Long]("n_pairs") == 2L)
    assert(r2.getAs[Long]("hl_x2") == 4L) // (1+3)/2
    assert(r2.getAs[Double]("hl") == 2.0)
  }

  test("distDistances: identical samples score 0/1/0/1, disjoint 1/0/./0") {
    val a = Seq(1L, 2L, 3L, 10L).toDF("v")
    val same = Profiling.distDistances(a, a, "v").head()
    assert(same.getAs[Double]("total_variation") == 0.0)
    assert(same.getAs[Double]("bhattacharyya_coef") == 1.0)
    assert(same.getAs[Double]("hellinger") == 0.0)
    assert(same.getAs[Double]("overlap_coef") == 1.0)
    val lo = Seq(0L, 1L).toDF("v"); val hi = Seq(100L, 101L).toDF("v")
    val disj = Profiling.distDistances(lo, hi, "v").head()
    assert(disj.getAs[Double]("total_variation") == 1.0)
    assert(disj.getAs[Double]("bhattacharyya_coef") == 0.0)
    assert(disj.isNullAt(disj.fieldIndex("bhattacharyya_dist")))
    assert(disj.getAs[Double]("hellinger") == 1.0)
    assert(disj.getAs[Double]("overlap_coef") == 0.0)
  }
}
