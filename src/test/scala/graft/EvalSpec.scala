package graft

import graft.operators.Eval
import org.apache.spark.sql.functions._

/** Eval-metrics family: exact AUC (midrank ties, vs brute-force pair
  * counting), per-group Gini, weighted median, confusion stats, Cohen's
  * kappa, and calibration bins — all against hand-computed or brute-force
  * references on small frames.
  */
class EvalSpec extends SparkFunSuite {
  import spark.implicits._

  test("auc matches brute-force pair counting, midrank ties included") {
    // scores with ties across classes: pos {3, 5, 5}, neg {1, 3, 5, 7}
    val df = Seq((3L, true), (5L, true), (5L, true),
      (1L, false), (3L, false), (5L, false), (7L, false))
      .toDF("s", "y")
    val r = Eval.auc(df, "s", "y").head()
    // brute force: Σ over pos×neg of [1 if p>n, 0.5 if p=n]
    val pos = Seq(3L, 5L, 5L); val neg = Seq(1L, 3L, 5L, 7L)
    val wins2 = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(r.getAs[Long]("num") == wins2)
    assert(r.getAs[Long]("den") == 2L * 3 * 4)
    assert(r.getAs[Double]("auc") ==
      math.rint(wins2.toDouble / (2 * 3 * 4) * 1e6) / 1e6)
    // degenerate ranker: all scores equal -> AUC exactly 0.5
    val flat = Seq((7L, true), (7L, false), (7L, false), (7L, true))
      .toDF("s", "y")
    assert(Eval.auc(flat, "s", "y").head().getAs[Double]("auc") == 0.5)
  }

  test("auc fuzz: ranged prefix sum == single-window formula on random data") {
    val rnd = new scala.util.Random(4242)
    val rows = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextBoolean()))
    val df = rows.toDF("s", "y")
    val got = Eval.auc(df, "s", "y").head().getAs[Long]("num")
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val want = (for { p <- pos; n <- neg } yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(got == want)
  }

  test("gini: equal values give 0, known concentration hand-checks") {
    val eq = Seq(("a", 5L), ("a", 5L), ("a", 5L)).toDF("g", "v")
    assert(Eval.gini(eq, "g", "v").head().getAs[Double]("gini") == 0.0)
    // {1, 3} sorted: 2*(1*1 + 2*3) = 14; num = 14 - 3*4 = 2; den = 2*4 = 8
    val two = Seq(("a", 1L), ("a", 3L)).toDF("g", "v")
    val r = Eval.gini(two, "g", "v").head()
    assert(r.getAs[Long]("num") == 2L && r.getAs[Long]("den") == 8L)
    assert(r.getAs[Double]("gini") == 0.25)
    // ties collapse exactly: {2, 2, 4} -> 2*(1*2 + 2*2 + 3*4) = 36;
    // num = 36 - 4*8 = 4, den = 3*8 = 24
    val tied = Seq(("b", 2L), ("b", 2L), ("b", 4L)).toDF("g", "v")
    val t = Eval.gini(tied, "g", "v").head()
    assert(t.getAs[Long]("num") == 4L && t.getAs[Long]("den") == 24L)
  }

  test("weightedMedian: lower median at the 2·cumw >= W crossing, per group") {
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 98L), // weight mass at 3
      ("b", 10L, 2L), ("b", 20L, 2L)) // even split -> lower median 10
      .toDF("g", "v", "w")
    val got = Eval.weightedMedian(df, "g", "v", "w").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") == (100L, 3L))
    assert(got("b") == (4L, 10L))
  }

  test("confusionStats: per-class tp/fp/fn and 0.0 on empty denominators") {
    // pred vs actual: classes x, y, z; z never predicted, x never actual
    val df = Seq(("x", "y"), ("y", "y"), ("y", "z"), ("y", "z"))
      .toDF("p", "a")
    val m = Eval.confusionStats(df, "p", "a").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(m("x") == (0L, 1L, 0L, 0.0, 0.0, 0.0)) // never actual: recall den 0
    assert(m("y") == (1L, 2L, 1L, math.rint(1.0 / 3 * 1e6) / 1e6, 0.5, 0.4))
    assert(m("z") == (0L, 0L, 2L, 0.0, 0.0, 0.0)) // never predicted
  }

  test("cohensKappa: perfect agreement 1, hand-computed mixed case exact") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("p", "a")
    assert(Eval.cohensKappa(perfect, "p", "a").head().getAs[Double]("kappa") == 1.0)
    // classic 2x2: cells aa=20, ab=5, ba=10, bb=15 -> N=50, agree=35,
    // sum_rc = 25*30 + 25*20 = 1250; num = 50*35-1250 = 500; den = 2500-1250
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val r = Eval.cohensKappa(rows.toDF("p", "a"), "p", "a").head()
    assert(r.getAs[Long]("num") == 500L && r.getAs[Long]("den") == 1250L)
    assert(r.getAs[Double]("kappa") == 0.4)
  }

  test("calibrationBins: integer-exact equal-width binning over the span") {
    // span 0..19, 10 bins of width 2: s=0,1 -> bin 0; s=19 -> bin 9
    val df = (0L until 20L).map(s => (s, s >= 10L)).toDF("s", "y")
    val bins = Eval.calibrationBins(df, "s", "y").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bins.keySet == (0L until 10L).toSet)
    assert(bins(0L) == (2L, 0L) && bins(9L) == (2L, 2L) && bins(5L) == (2L, 2L))
  }

  test("rangedCumsum survives multi-partition groups (cumulative across pids)") {
    // 1000 distinct values in one group across 4 partitions: inclusive
    // cumsum of 1s must equal the 1..n ramp
    val df = spark.range(1000).select(lit("g").as("g"),
      col("id").as("v"), lit(1L).as("one"))
    val c = Eval.rangedCumsum(df.repartition(4), Seq("g"), "v", Seq("one"))
    val bad = c.filter(col("cum_one") =!= col("v") + 1L).count()
    assert(bad == 0L)
  }

  test("percentileRank: midrank convention, exact on hand data") {
    // group g values: 10, 20, 20, 40 -> pct ranks 1/8ths: 10->1.5/4=0.375?
    // midrank: v=10 (2*1-1+1)/8=0.25; v=20 (2*3-2+1)/8=0.625; v=40 (2*4-1+1)/8=1.0
    val df = Seq(("g", 10L), ("g", 20L), ("g", 20L), ("g", 40L)).toDF("k", "s")
    val got = Eval.percentileRank(df, "k", "s").collect()
      .map(r => r.getLong(1) -> r.getAs[Double]("pct_rank")).toMap
    assert(got == Map(10L -> 0.25, 20L -> 0.625, 40L -> 1.0))
  }

  test("mutualInformation: ln 2 for perfect 2-class dependence, 0 when independent") {
    import graft.operators.Profiling
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "w")
    val miDep = Profiling.mutualInformation(dep, "u", "w").collect()
      .map(_.getAs[Double]("mi_contrib")).sum
    assert(math.abs(miDep - math.log(2.0)) < 2e-6)
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "w")
    val miInd = Profiling.mutualInformation(ind, "u", "w").collect()
      .map(_.getAs[Double]("mi_contrib")).sum
    assert(miInd == 0.0)
  }

  test("cidrRollup: /20 mask splits the third octet, distinct IPs counted") {
    import graft.operators.Urls
    // 10.1.15.x and 10.1.16.x land in different /20s (16 = 0b00010000)
    val df = Seq("10.1.15.1", "10.1.15.1", "10.1.15.2", "10.1.16.9",
      "10.1.31.7", "10.1.32.7").toDF("ip")
    val got = Urls.cidrRollup(df, "ip", 20).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "10.1.0.0/20" -> (3L, 2L),   // 15.x rows
      "10.1.16.0/20" -> (2L, 2L),  // 16.9 and 31.7 share the /20
      "10.1.32.0/20" -> (1L, 1L)))
  }

  test("negativeSample: k partners each, never self, matches ring brute force") {
    import graft.operators.Sampling
    def h(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"neg:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val ids = (1L to 7L).toSeq
    val got = Sampling.negativeSample(ids.toDF("doc_id"), "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute-force ring: rank ids by (md5, id), stride partners
    val ring = ids.sortBy(i => (h(i), i))
    val n = ring.length
    val want = (for {
      (id, idx) <- ring.zipWithIndex; j <- 1 to 2
      off = 1 + (j - 1) * (n - 1) / 2
    } yield (id, j.toLong) -> ring((idx + off) % n)).toMap
    assert(got == want)
    assert(got.forall { case ((a, _), b) => a != b }) // never self
    assert(got.size == 14)
  }

  test("rangedCumsum branch consistency beyond the boundary-sample size") {
    // REGRESSION (r8): with > ~100 rows per input partition, range-boundary
    // sampling is no longer exhaustive, and before the materialize-once fix
    // the cumsum and offsets branches could draw DIFFERENT bounds (each
    // branch instantiated its own range exchange with its own sampling
    // seed), silently corrupting the prefix sum. 20k distinct values across
    // 4 partitions is far past the sample size; repeat 3× because each
    // evaluation used to re-draw bounds independently.
    val df = spark.range(20000).select(col("id").as("v"), lit(1L).as("one"))
      .repartition(4)
    (1 to 3).foreach { _ =>
      val c = Eval.rangedCumsum(df, Nil, "v", Seq("one"))
      assert(c.filter(col("cum_one") =!= col("v") + 1L).count() == 0L)
    }
  }
}
