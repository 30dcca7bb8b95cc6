package graft

import graft.operators.{Eval, Graph, Sessionize, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-13 continuation wave: eigenvector centrality (truncated power
  * iteration) and the fixed-HMM Viterbi decode — numeric pins on
  * hand-computable graphs/sequences, the exclusion contracts, and the
  * Spark-replay cross-check of the oracle's unrolled SQL chain. */
class Round13bOpsSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- eigenvectorCentrality ----------------------------------------

  test("eigenvectorCentrality: 4 rounds on triangle+pendant, by hand") {
    // triangle {1,2,3} with pendant 4-1; x0 = 1:
    //   it1 max-normalized x = (1, 2/3, 2/3, 1/3)
    //   it2 x = (1, 1, 1, 3/5)
    //   it3 x = (1, 10/13, 10/13, 5/13)
    //   it4 x = (1, 23/25, 23/25, 13/25)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.eigenvectorCentrality(e, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.92, 3L -> 0.92, 4L -> 0.52), got)
  }

  test("eigenvectorCentrality is orientation- and duplicate-invariant") {
    // reversed, duplicated, and self-loop-polluted input canonicalizes
    // to the same undirected graph, so scores must be identical
    val clean = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val dirty = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (4L, 1L),
      (2L, 2L)).toDF("src", "dst")
    val a = Graph.eigenvectorCentrality(clean, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Graph.eigenvectorCentrality(dirty, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
  }

  test("eigenvectorCentrality rejects iters < 1") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.eigenvectorCentrality(e, "src", "dst", iters = 0)
    }
  }

  // ---- viterbiDecode --------------------------------------------------

  private def ev(rows: (Long, Long, Long, String)*) =
    rows.toSeq.toDF("user_id", "ts_ms", "event_id", "event_type")

  test("viterbiDecode: 2-step DP by hand (engaged and idle paths)") {
    // user 1 (view, purchase): vE1 = -36-69 = -105, vI1 = -120-92 = -212;
    //   step 2 into E: max(-105-22, -212-92) = -127 via E → vE2 = -357;
    //   into I: max(-105-161, -212-51) = -263 via I → vI2 = -724;
    //   final E wins → path EE, score -357.
    // user 2 (error, error): vE1 = -336, vI1 = -240;
    //   into E: max(-358, -332) = -332 via I → vE2 = -632;
    //   into I: max(-497, -291) = -291 via I → vI2 = -411;
    //   final I wins, back-pointer I → path II, score -411.
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "purchase"),
      (2L, 10L, 3L, "error"), (2L, 20L, 4L, "error"))
    val got = Sessionize.viterbiDecode(df, steps = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> (("EE", -357L)),
      2L -> (("II", -411L))), got)
  }

  test("viterbiDecode excludes keys with fewer than `steps` events and " +
      "orders by (ts_ms, tie)") {
    val df = ev(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "purchase"),
      (3L, 10L, 5L, "view"), // only one event — excluded at steps = 2
      // user 4: same ts, tie decides (purchase first, then view)
      (4L, 10L, 1L, "purchase"), (4L, 10L, 2L, "view"))
    val got = Sessionize.viterbiDecode(df, steps = 2)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
    // purchase-then-view ≠ view-then-purchase: tie column really ordered
    val p4 = Sessionize.viterbiDecode(df, steps = 2)
      .filter(col("user_id") === 4L).collect().head
    // vE1 = -36-230 = -266, vI1 = -120-461 = -581;
    // into E: max(-288, -673) via E → vE2 = -288-69 = -357;
    // into I: max(-427, -632) via E → vI2 = -427-92 = -519 → EE, -357
    assert((p4.getString(1), p4.getLong(2)) == (("EE", -357L)))
  }

  test("viterbiDecode: unknown event types hit the shared floor, not " +
      "a crash, and steps is bounded") {
    val df = ev((1L, 10L, 1L, "zzz_unknown"), (1L, 20L, 2L, "view"))
    val r = Sessionize.viterbiDecode(df, steps = 2).collect().head
    // vE1 = -36-700, vI1 = -120-700: E leads by the same margin as the
    // known-type init, so the floor steered nothing
    assert(r.getString(1) == "EE")
    intercept[IllegalArgumentException] {
      Sessionize.viterbiDecode(df, steps = 0)
    }
    intercept[IllegalArgumentException] {
      Sessionize.viterbiDecode(df, steps = 65)
    }
  }

  test("viterbiSqlCtes replayed by Spark SQL matches viterbiDecode " +
      "(cross-engine chain check)") {
    // deterministic synthetic streams over the full alphabet
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = for (u <- 1L to 40L; t <- 1L to 8L) yield
      (u, t * 100L, t, types(((u * 7 + t * 3) % 5).toInt))
    val df = ev(rows: _*)
    val engine = Sessionize.viterbiDecode(df, steps = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    df.createOrReplaceTempView("viterbi_ev")
    val pivot = (1 to 8).map(i =>
      s"MAX(CASE WHEN rn = $i THEN event_type END) AS o$i")
      .mkString(",\n    ")
    val sql =
      s"""WITH o AS (SELECT user_id AS k, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts_ms, event_id) AS rn
         |  FROM viterbi_ev),
         |p AS (SELECT k, $pivot
         |  FROM o WHERE rn <= 8 GROUP BY k
         |  HAVING MAX(CASE WHEN rn = 8 THEN event_type END) IS NOT NULL),
         |${Sessionize.viterbiSqlCtes(8, keyAlias = "user_id")}"""
        .stripMargin
    val replay = spark.sql(sql)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    spark.catalog.dropTempView("viterbi_ev")
    assert(engine == replay)
    assert(engine.size == 40)
  }

  // ---- matrixProfile --------------------------------------------------

  /** Deterministic pseudo-noise series with an AFFINE motif pair planted
    * at starts 10 and 50 (y = 2x + 3 of the same pattern — z-norm
    * distance exactly 0). */
  private def motifSeries: Seq[(Long, Long)] = {
    val pattern = Seq(5L, 9L, 1L, 8L, 2L, 7L, 3L, 6L)
    (0L until 80L).map { t =>
      val x =
        if (t >= 10 && t < 18) pattern((t - 10).toInt)
        else if (t >= 50 && t < 58) 2L * pattern((t - 50).toInt) + 3L
        else (t * 37) % 11
      (t, x)
    }
  }

  test("matrixProfile finds the planted affine motif at distance 0") {
    val s = motifSeries.toDF("t", "x")
    val got = TimeSeries.matrixProfile(s, "t", "x", m = 8, excl = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(10L) == ((50L, 0.0)), got.get(10L).toString)
    assert(got(50L) == ((10L, 0.0)), got.get(50L).toString)
    // profile covers every window start, exclusion zone respected
    assert(got.size == 80 - 8 + 1)
    got.foreach { case (i, (j, d)) =>
      assert(math.abs(i - j) >= 4, s"trivial match survived: $i -> $j")
      assert(d >= 0.0)
    }
  }

  test("matrixProfile contract guards: gaps, length valve, zero variance") {
    val gapped = motifSeries.filterNot(_._1 == 40L).toDF("t", "x")
    val e1 = intercept[IllegalArgumentException] {
      TimeSeries.matrixProfile(gapped, "t", "x", m = 8, excl = 4)
    }
    assert(e1.getMessage.contains("gap-free"))
    val full = motifSeries.toDF("t", "x")
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.matrixProfile(full, "t", "x", m = 8, excl = 4, maxN = 10L)
    }
    assert(e2.getMessage.contains("maxN"))
    // constant series: every window is zero-variance -> empty profile
    val const = (0L until 40L).map(t => (t, 5L)).toDF("t", "x")
    assert(TimeSeries.matrixProfile(const, "t", "x", m = 8, excl = 4)
      .count() == 0L)
  }

  // ---- ar2Forecast ----------------------------------------------------

  test("ar2Forecast matches an independent Scala replay of the " +
      "Yule-Walker + recursion math") {
    val xs = Seq(10L, 12L, 9L, 11L, 10L, 13L, 8L, 12L, 10L, 11L)
    val df = xs.zipWithIndex.map { case (v, d) => (1L, d.toLong, v) }
      .toDF("k", "day", "v")
    val got = TimeSeries.ar2Forecast(df, "k", "day", "v", horizon = 3)
      .collect().map(r => r.getLong(4) -> r.getDouble(5)).toMap

    // independent replay: exact integer moments -> rho (rounded 6) ->
    // phi -> 3 recursion steps -> round 6
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rho(lag: Int): Double = {
      val pairs = xs.drop(lag).zip(xs.dropRight(lag)) // (y, x)
      val n = pairs.size.toLong
      val sy = pairs.map(_._1).sum; val sx = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._2 * p._2).sum
      val syy = pairs.map(p => p._1 * p._1).sum
      r6((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble))
    }
    val (rho1, rho2) = (rho(1), rho(2))
    val phi1 = (rho1 * (1.0 - rho2)) / (1.0 - rho1 * rho1)
    val phi2 = (rho2 - rho1 * rho1) / (1.0 - rho1 * rho1)
    val mu = xs.sum.toDouble / xs.size
    val f1 = mu + phi1 * (xs.last - mu) + phi2 * (xs(xs.size - 2) - mu)
    val f2 = mu + phi1 * (f1 - mu) + phi2 * (xs.last - mu)
    val f3 = mu + phi1 * (f2 - mu) + phi2 * (f1 - mu)
    assert(got == Map(1L -> r6(f1), 2L -> r6(f2), 3L -> r6(f3)),
      s"got $got expected ${Map(1 -> r6(f1), 2 -> r6(f2), 3 -> r6(f3))}")
  }

  test("ar2Forecast: degenerate rho forecasts NULL; short keys drop; " +
      "horizon bounded") {
    // perfectly alternating series: rho1 = -1 -> 1 - rho1^2 = 0 -> NULL
    val alt = (0L until 10L).map(d => (1L, d, if (d % 2 == 0) 10L else -10L))
    // two-bucket key: lag-2 pairs empty -> no rho2 row -> key drops
    val short = Seq((2L, 0L, 5L), (2L, 1L, 7L))
    val df = (alt ++ short).toDF("k", "day", "v")
    val out = TimeSeries.ar2Forecast(df, "k", "day", "v", horizon = 2)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.forall(_.isNullAt(5)), "degenerate rho must forecast NULL")
    intercept[IllegalArgumentException] {
      TimeSeries.ar2Forecast(df, "k", "day", "v", horizon = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.ar2Forecast(df, "k", "day", "v", horizon = 25)
    }
  }

  // ---- ridge2Path -----------------------------------------------------

  test("ridge2Path: lambda=0 reproduces ols2, larger lambdas shrink " +
      "the slopes") {
    val rows = (1L to 200L).map { i =>
      val x1 = i % 17; val x2 = (i * 3) % 11
      (5L + 2L * x1 - 3L * x2 + (i % 5) - 2L, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    val ols = Eval.ols2(df, "y", "x1", "x2").collect().head
    val path = Eval.ridge2Path(df, "y", "x1", "x2",
        Seq(0L, 1000L, 100000L)).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(path(0L) == ((ols.getAs[Double]("b0"), ols.getAs[Double]("b1"),
      ols.getAs[Double]("b2"))))
    // slope magnitudes shrink monotonically along the path
    val l2 = Seq(0L, 1000L, 100000L).map { l =>
      val (_, b1, b2) = path(l); b1 * b1 + b2 * b2
    }
    assert(l2 == l2.sorted.reverse, s"no shrinkage: $l2")
    intercept[IllegalArgumentException] {
      Eval.ridge2Path(df, "y", "x1", "x2", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Eval.ridge2Path(df, "y", "x1", "x2", Seq(-1L))
    }
    intercept[IllegalArgumentException] {
      Eval.ridge2Path(df, "y", "x1", "x2", Seq(1L, 1L))
    }
  }

  // ---- poissonTrend ---------------------------------------------------

  test("poissonTrend recovers an exact exponential trend (a=ln3, b=ln2)") {
    // y = 3 * 2^x is an exact Poisson-mean curve: the IRLS fixpoint is
    // a = ln 3, b = ln 2
    val df = (0L to 7L).map(x => (x, 3L * (1L << x))).toDF("x", "y")
    val out = TimeSeries.poissonTrend(df, "x", "y", iters = 8)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(out.keySet == (1L to 8L).toSet)
    val (a8, b8) = out(8L)
    assert(math.abs(a8 - math.log(3.0)) < 1e-4, s"a8=$a8")
    assert(math.abs(b8 - math.log(2.0)) < 1e-4, s"b8=$b8")
    // iteration trajectory is monotone toward the fixpoint in b
    val bs = (1 to 8).map(i => out(i.toLong)._2)
    assert(bs.zip(bs.tail).forall { case (p, n) =>
      math.abs(n - math.log(2.0)) <= math.abs(p - math.log(2.0)) + 1e-9
    }, s"b trajectory diverged: $bs")
    intercept[IllegalArgumentException] {
      TimeSeries.poissonTrend(df, "x", "y", iters = 0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.poissonTrend(df, "x", "y", iters = 9)
    }
  }

  // ---- extractiveChunks -----------------------------------------------

  test("extractiveChunks: typical = common-word chunk, novel = rare-word " +
      "chunk, ties to the smaller index") {
    // corpus counts: a=6, z=2 (T=8) -> ln p(a) ≈ -0.2877 > ln p(z)
    val docs = Seq(
      (1L, "a a a a"), // both chunks identical -> tie -> idx 0 twice
      (2L, "a a z z")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .extractiveChunks(docs, chunkTokens = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5)))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // micro-quantize exactly as the operator does, then average
    def lp(p: Double) = math.round(math.log(p) * 1e6)
    val lpa = r6(lp(0.75) / 1e6.toDouble)
    val lpz = r6(lp(0.25) / 1e6.toDouble)
    assert(got(1L) == ((2L, 0L, lpa, 0L, lpa)), got(1L).toString)
    assert(got(2L) == ((2L, 0L, lpa, 1L, lpz)), got(2L).toString)
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.extractiveChunks(docs, chunkTokens = 1)
    }
  }

  // ---- kmeansLloydExact -----------------------------------------------

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("kmeansLloydExact rounds=1 is exactly kmeansStep") {
    val emb = vecDf((1L to 12L).map(i =>
      i -> Seq.tabulate(4)(d => (((i * 7 + d * 3) % 9) - 4).toFloat / 4f)))
    val a = graft.operators.Similarity.kmeansStep(emb, nCentroids = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val b = graft.operators.Similarity
      .kmeansLloydExact(emb, nCentroids = 3, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(a == b)
  }

  test("kmeansLloydExact converges to the separated cluster means") {
    // two orthogonal clusters, one seed in each (ids 1 and 2): after 3
    // rounds each centroid is its cluster's exact fixed-point mean
    val a = Seq(1L -> Seq(1f, 0f), 3L -> Seq(0.75f, 0.25f),
      5L -> Seq(0.875f, 0.125f))
    val b = Seq(2L -> Seq(0f, 1f), 4L -> Seq(0.25f, 0.75f),
      6L -> Seq(0.125f, 0.875f))
    val got = graft.operators.Similarity
      .kmeansLloydExact(vecDf(a ++ b), nCentroids = 2, rounds = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2),
        r.getDouble(3)))).toMap
    // every dim row carries the full cell occupancy (3 each)
    assert(got.values.map(_._1).toSet == Set(3L))
    // cluster means are exactly representable: (1+.75+.875)/3, etc.
    def m(xs: Seq[Float]) = BigDecimal(
      xs.map(x => math.round(x.toDouble * 16777216d)).sum / 3.0 / 16777216d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 0L))._2 == m(Seq(1f, 0.75f, 0.875f)))
    assert(got((1L, 1L))._2 == m(Seq(0f, 0.25f, 0.125f)))
    assert(got((2L, 0L))._2 == m(Seq(0f, 0.25f, 0.125f)))
    assert(got((2L, 1L))._2 == m(Seq(1f, 0.75f, 0.875f)))
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.kmeansLloydExact(
        vecDf(a), nCentroids = 2, rounds = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.kmeansLloydExact(
        vecDf(a), nCentroids = 1, rounds = 2)
    }
  }

  // ---- targetEncodeLoo ------------------------------------------------

  test("targetEncodeLoo: leave-one-out means, singleton = prior") {
    val df = Seq(
      (1L, "A", 1), (2L, "A", 0), (3L, "A", 1), (4L, "B", 1))
      .toDF("id", "cat", "y")
    val got = Eval.targetEncodeLoo(df, "cat", "y", Seq("id"), m = 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // prior = 3/4; A rows: (2 - y + 0.75) / 3; B singleton: prior
    assert(got == Map(
      1L -> r6((2 - 1 + 0.75) / 3.0),
      2L -> r6((2 - 0 + 0.75) / 3.0),
      3L -> r6((2 - 1 + 0.75) / 3.0),
      4L -> 0.75), got.toString)
    intercept[IllegalArgumentException] {
      Eval.targetEncodeLoo(df, "cat", "y", Seq("id"), m = 0L)
    }
    intercept[IllegalArgumentException] {
      Eval.targetEncodeLoo(df, "cat", "y", Seq.empty)
    }
  }

  // ---- logisticIrls2 / ipwAte -----------------------------------------

  test("logisticIrls2 converges to the MLE (score equations ~ 0) with " +
      "the right slope sign") {
    // y depends positively on x1, x2 is orthogonal noise
    val rows = (1L to 120L).map { i =>
      val x1 = i % 7; val x2 = i % 3
      val y = if ((x1 * 13 + i * 5) % 23 < 3 + 2 * x1) 1 else 0
      (y, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    val fit = Eval.logisticIrls2(df, "y", "x1", "x2", iters = 6)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val (b0, b1, b2) = fit(6L)
    assert(b1 > 0.0, s"slope sign wrong: $b1")
    // converged: last two iterates agree to the round(6) grid's scale
    val (p0, p1, p2) = fit(5L)
    assert(math.abs(b0 - p0) < 1e-4 && math.abs(b1 - p1) < 1e-4 &&
      math.abs(b2 - p2) < 1e-4, s"not converged: ${fit(5L)} vs ${fit(6L)}")
    // score equations at the fit: sum(y - p) ~ 0 and sum(x1 (y - p)) ~ 0
    def p(x1: Long, x2: Long) =
      1.0 / (1.0 + math.exp(-(b0 + b1 * x1 + b2 * x2)))
    val s0 = rows.map { case (y, x1, x2) => y - p(x1, x2) }.sum
    val s1 = rows.map { case (y, x1, x2) => x1 * (y - p(x1, x2)) }.sum
    assert(math.abs(s0) < 0.01 && math.abs(s1) < 0.05,
      s"score equations violated: $s0 / $s1")
    intercept[IllegalArgumentException] {
      Eval.logisticIrls2(df, "y", "x1", "x2", iters = 0)
    }
  }

  test("ipwAte removes the confounder bias the naive difference keeps") {
    // x1 drives BOTH treatment (80/20) and outcome (10 vs 0); the true
    // treatment effect is 0. Naive diff = 6 exactly; IPW must collapse
    // toward 0.
    val rows =
      (1L to 8L).map(i => (1, 10L, 1L, i % 3)) ++ // x1=1 treated
        (1L to 2L).map(i => (0, 10L, 1L, i % 3)) ++ // x1=1 control
        (1L to 2L).map(i => (1, 0L, 0L, i % 3)) ++ // x1=0 treated
        (1L to 8L).map(i => (0, 0L, 0L, i % 3)) // x1=0 control
    val df = rows.toDF("t", "yo", "x1", "x2")
    val out = Eval.ipwAte(df, "t", "yo", "x1", "x2", iters = 6).collect().head
    assert(out.getLong(0) == 10L && out.getLong(1) == 10L)
    val (ate, naive) = (out.getDouble(2), out.getDouble(3))
    assert(naive == 6.0, s"naive=$naive")
    assert(math.abs(ate) < 1.0, s"IPW did not deconfound: ate=$ate")
    intercept[IllegalArgumentException] {
      Eval.ipwAte(df, "t", "yo", "x1", "x2", clip = 0.5)
    }
  }

  // ---- expectedHittingTime --------------------------------------------

  test("expectedHittingTime: two-state chain by hand (E_h = 2 - 2^(1-h) " +
      "on the micro grid)") {
    // one user, stream view view view purchase view purchase view:
    // view->view 2, view->purchase 2 (p = 0.5 each), purchase->view 2
    val types = Seq("view", "view", "view", "purchase", "view",
      "purchase", "view")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (1L, (i + 1) * 10L, i.toLong, t)
    }.toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Sessionize.expectedHittingTime(ev, "purchase", horizon = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("purchase") == 0.0)
    // exact micro-grid recursion: E8(view) = 1992188 micro
    assert(got("view") == 1.992188, got.toString)
    intercept[IllegalArgumentException] {
      Sessionize.expectedHittingTime(ev, "purchase", horizon = 0)
    }
  }

  // ---- weibullFit -------------------------------------------------------

  test("weibullFit recovers the shape of a quantile-sampled Weibull " +
      "and NULLs degenerate curves") {
    // deterministic quantile sample from Weibull(k=2, lambda=100),
    // uncensored: t_i = round(lambda * (-ln(1 - (i-0.5)/n))^(1/2))
    val n = 200
    val rows = (1 to n).map { i =>
      val u = (i - 0.5) / n
      val t = math.round(100.0 * math.sqrt(-math.log(1.0 - u)))
      ("w", t, true)
    }
    // degenerate cohort: every subject fails at the same time -> the
    // single step drops S straight to 0, leaving no interior plot
    // point, so the whole group is absent from the fit output
    val deg = (1 to 5).map(_ => ("d", 10L, true))
    val df = (rows ++ deg).toDF("grp", "t", "ev")
    val got = graft.operators.Survival.weibullFit(df, "grp", "t", "ev")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2))))).toMap
    val (np, shape) = got("w")
    assert(np > 100L)
    assert(shape.exists(k => math.abs(k - 2.0) < 0.2),
      s"shape off: $shape")
    assert(!got.contains("d"),
      "curve with no interior plot point must drop from the fit")
  }

  // ---- removalEffect ----------------------------------------------------

  test("removalEffect: channel shares of a two-path funnel by hand") {
    // 3 users convert via signup -> view -> purchase, 1 via
    // click -> purchase: removing view or signup kills 75% of the
    // conversion mass, removing click kills 25%
    val rows = (1L to 3L).flatMap { u =>
      Seq((u, 10L, 1L, "signup"), (u, 20L, 2L, "view"),
        (u, 30L, 3L, "purchase"))
    } ++ Seq((9L, 10L, 1L, "click"), (9L, 20L, 2L, "purchase"))
    val ev = rows.toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = Sessionize.removalEffect(ev, "purchase", horizon = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("signup", "view", "click"))
    assert(got("view") == ((1.0, 0.25, 0.75)), got("view").toString)
    assert(got("signup") == ((1.0, 0.25, 0.75)), got("signup").toString)
    assert(got("click") == ((1.0, 0.75, 0.25)), got("click").toString)
    intercept[IllegalArgumentException] {
      Sessionize.removalEffect(ev, "purchase", horizon = 0)
    }
  }

  // ---- aipwAte ------------------------------------------------------------

  test("aipwAte deconfounds like ipwAte and agrees with the outcome " +
      "models when they are exact") {
    // the ipwAte fixture: x1 drives treatment (80/20) and outcome
    // (10 vs 0); true effect 0, naive diff 6. The per-arm OLS fits are
    // EXACT here (outcome is a deterministic function of x1), so AIPW
    // collapses to ~0 regardless of propensity wobble.
    val rows =
      (1L to 8L).map(i => (1, 10L, 1L, i % 3)) ++
        (1L to 2L).map(i => (0, 10L, 1L, i % 3)) ++
        (1L to 2L).map(i => (1, 0L, 0L, i % 3)) ++
        (1L to 8L).map(i => (0, 0L, 0L, i % 3))
    val df = rows.toDF("t", "yo", "x1", "x2")
    val out = Eval.aipwAte(df, "t", "yo", "x1", "x2", iters = 6)
      .collect().head
    assert(out.getLong(0) == 10L && out.getLong(1) == 10L)
    val (ate, naive) = (out.getDouble(2), out.getDouble(3))
    assert(naive == 6.0)
    assert(math.abs(ate) < 0.01, s"AIPW with exact outcome models " +
      s"must be ~0: $ate")
    intercept[IllegalArgumentException] {
      Eval.aipwAte(df, "t", "yo", "x1", "x2", clip = 0.0)
    }
  }

  // ---- cemAtt -------------------------------------------------------------

  test("cemAtt: exact-stratum ATT by hand, unmatched treated reported") {
    // stratum (1,0): treated y={10,12}, control y={5} -> diff 6, nt=2
    // stratum (2,0): treated y={20},   control y={14,16} -> diff 5, nt=1
    // stratum (3,0): treated only -> unmatched (2 rows)
    // stratum (4,0): control only -> ignored
    val df = Seq(
      (1, 10L, 1L, 0L), (1, 12L, 1L, 0L), (0, 5L, 1L, 0L),
      (1, 20L, 2L, 0L), (0, 14L, 2L, 0L), (0, 16L, 2L, 0L),
      (1, 99L, 3L, 0L), (1, 98L, 3L, 0L),
      (0, 7L, 4L, 0L)).toDF("t", "yo", "x1", "x2")
    val r = Eval.cemAtt(df, "t", "yo", "x1", "x2").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 2L)))
    // ATT = (2*6 + 1*5) / 3 = 17/3
    assert(r.getDouble(3) == BigDecimal(17.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r.toString)
  }

  // ---- burrowsDelta -------------------------------------------------------

  test("burrowsDelta: mirrored two-source usage gives delta 2, " +
      "zero-variance words drop") {
    // A uses x twice / y once, B the mirror: z = ±1 for both words ->
    // Delta = mean(|1-(-1)|, |-1-1|) = 2. The word 'z' appears once in
    // each source with EQUAL totals -> zero across-source variance ->
    // excluded from the pair mean (n_words stays 2).
    val docs = Seq(
      (1L, "x x y z", "A"), (2L, "x y y z", "B"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.TextAnalysis.burrowsDelta(docs, k = 3)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getString(0), row.getString(1)) == (("A", "B")))
    assert(row.getLong(2) == 2L, s"n_words=${row.getLong(2)}")
    assert(row.getDouble(3) == 2.0, row.toString)
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.burrowsDelta(docs, k = 1)
    }
  }

  // ---- fdCheck -------------------------------------------------------------

  test("fdCheck: holds/violations per candidate by hand") {
    val df = Seq(
      (1L, "a", 10L), (1L, "a", 10L), (2L, "b", 10L), (3L, "b", 20L),
      (3L, "c", 20L)).toDF("k", "v", "g")
    val got = graft.operators.Profiling
      .fdCheck(df, Seq(("k", "v"), ("v", "k"), ("g", "v")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // k->v: k=3 maps to {b,c} -> 1 violating det, 1 extra
    assert(got(("k", "v")) == ((3L, 1L, 1L, false)))
    // v->k: a->{1}, b->{2,3}, c->{3} -> 1 violating det
    assert(got(("v", "k")) == ((3L, 1L, 1L, false)))
    // g->v: 10->{a,b} 20->{b,c} -> both violate
    assert(got(("g", "v")) == ((2L, 2L, 2L, false)))
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.fdCheck(df, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Profiling.fdCheck(df, Seq(("k", "k")))
    }
  }

  // ---- boostedStumps --------------------------------------------------------

  test("boostedStumps: three-round trajectory by hand, constant feature " +
      "contributes no candidates") {
    // y in {10, 10, 20, 20} on x1 = 1..4 (x2 constant -> no valid
    // split): every round splits at x1 <= 2 and halves the residual
    // means — leaves 5000/10000, then 2500/5000, then 1250/2500 milli
    val df = Seq((10L, 1L, 0L), (10L, 2L, 0L), (20L, 3L, 0L),
      (20L, 4L, 0L)).toDF("y", "x1", "x2")
    val got = Eval.boostedStumps(df, "y", Seq("x1", "x2"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      (1L, "x1", 2L, 5000L, 10000L),
      (2L, "x1", 2L, 2500L, 5000L),
      (3L, "x1", 2L, 1250L, 2500L)), got.toString)
    intercept[IllegalArgumentException] {
      Eval.boostedStumps(df, "y", Seq("x1", "x2"), rounds = 0)
    }
    intercept[IllegalArgumentException] {
      Eval.boostedStumps(df, "y", Seq.empty)
    }
  }

  // ---- simpsonCheck ----------------------------------------------------------

  test("simpsonCheck flags the textbook full reversal and counts " +
      "agreeing strata otherwise") {
    // classic reversal: treatment wins inside BOTH strata but loses in
    // aggregate (treated mass sits in the low-outcome stratum)
    val rev = Seq(
      // stratum A: treated 8x y=6, control 2x y=5  (t wins: 6 > 5)
      (1, 6L, "A"), (1, 6L, "A"), (1, 6L, "A"), (1, 6L, "A"),
      (1, 6L, "A"), (1, 6L, "A"), (1, 6L, "A"), (1, 6L, "A"),
      (0, 5L, "A"), (0, 5L, "A"),
      // stratum B: treated 2x y=20, control 8x y=18 (t wins: 20 > 18)
      (1, 20L, "B"), (1, 20L, "B"),
      (0, 18L, "B"), (0, 18L, "B"), (0, 18L, "B"), (0, 18L, "B"),
      (0, 18L, "B"), (0, 18L, "B"), (0, 18L, "B"), (0, 18L, "B"))
      .toDF("t", "yo", "g")
    val r = Eval.simpsonCheck(rev, "t", "yo", "g").collect().head
    // aggregate: treated mean (8*6+2*20)/10 = 8.8 < control
    // (2*5+8*18)/10 = 15.4 -> overall NEGATIVE, both strata POSITIVE
    assert(r.getDouble(0) == -6.6, r.toString)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((2L, 0L, 2L, 0L)))
    assert(r.getBoolean(5), "full reversal must flag")

    // consistent data: both strata agree with the aggregate
    val ok = Seq((1, 10L, "A"), (0, 5L, "A"), (1, 20L, "B"), (0, 15L, "B"))
      .toDF("t", "yo", "g")
    val r2 = Eval.simpsonCheck(ok, "t", "yo", "g").collect().head
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3)) == ((2L, 2L, 0L)))
    assert(!r2.getBoolean(5))
  }

  // ---- fourCliqueCounts ------------------------------------------------------

  test("fourCliqueCounts: K5 gives every vertex 4 K4s, pendant excluded") {
    val k5 = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val edges = (k5 :+ ((1L, 6L))).toDF("src", "dst")
    val got = Graph.fourCliqueCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 5L).map(_ -> 4L).toMap, got.toString)
    // hub valve: capping at deg <= 3 drops every K5 vertex (deg >= 4),
    // leaving no triangles at all
    assert(Graph.fourCliqueCounts(edges, "src", "dst", maxDeg = 3L)
      .count() == 0L)
  }

  // ---- empty-input pins ----------------------------------------------------

  test("round-13b operators return empty (or degenerate-safe) frames " +
      "on empty input, never a crash") {
    val emptyEv = Seq.empty[(Long, Long, Long, String)]
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    assert(Sessionize.viterbiDecode(emptyEv, steps = 4).count() == 0L)
    assert(Sessionize.expectedHittingTime(emptyEv, "purchase").count() == 0L)
    assert(Sessionize.removalEffect(emptyEv, "purchase").count() == 0L)

    val emptyEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graph.eigenvectorCentrality(emptyEdges, "src", "dst")
      .count() == 0L)
    assert(Graph.maximalIndependentSet(emptyEdges, "src", "dst")
      .count() == 0L)

    val emptySeries = Seq.empty[(Long, Long)].toDF("t", "x")
    // matrixProfile requires a non-degenerate window count — loud, not
    // silent
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.matrixProfile(
        emptySeries, "t", "x", m = 4, excl = 1)
    }
    val emptyKeyed = Seq.empty[(Long, Long, Long)].toDF("k", "day", "v")
    assert(graft.operators.TimeSeries
      .ar2Forecast(emptyKeyed, "k", "day", "v").count() == 0L)

    val emptyDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(graft.operators.TextAnalysis
      .extractiveChunks(emptyDocs).count() == 0L)
    assert(graft.operators.TextAnalysis
      .burrowsDelta(emptyDocs).count() == 0L)

    val emptyCausal = Seq.empty[(Int, Long, Long, Long)]
      .toDF("t", "yo", "x1", "x2")
    assert(Eval.cemAtt(emptyCausal, "t", "yo", "x1", "x2")
      .collect().head.getLong(0) == 0L) // 0 matched strata, NULL ATT
    assert(Eval.targetEncodeLoo(emptyCausal.withColumn("id", col("x1")),
      "x1", "t", Seq("id")).count() == 0L)
    assert(graft.operators.Eval.ridge2Path(
      emptyCausal, "yo", "x1", "x2", Seq(0L)).count() == 1L) // NULL betas

    // the IRLS fitters fail LOUDLY on empty / saturated inputs (a
    // silent null-fold would emit an all-NaN trajectory)
    val m1 = intercept[IllegalArgumentException] {
      Eval.logisticIrls2(emptyCausal.withColumnRenamed("t", "y"),
        "y", "x1", "x2")
    }
    assert(m1.getMessage.contains("INTERIOR"))
    val sat = Seq((1, 1L, 1L, 0L), (1, 2L, 2L, 0L))
      .toDF("y", "yo", "x1", "x2")
    assert(intercept[IllegalArgumentException] {
      Eval.logisticIrls2(sat, "y", "x1", "x2")
    }.getMessage.contains("INTERIOR"))
    val m2 = intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.poissonTrend(
        Seq.empty[(Long, Long)].toDF("x", "y"), "x", "y")
    }
    assert(m2.getMessage.contains("nonempty"))
  }
}
