package graft

import graft.operators.{Eval, Graph, Profiling, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-10 additions: paired sign test, G-test of independence, 2×2
  * risk/odds readout with Wald CIs, and Cochran–Mantel–Haenszel with the
  * Simpson's-paradox flag. Hand fixtures mirror the shared-SQL chains. */
class Round10OpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("signTest: wins/losses/ties counted, z = (2·pos − m)/√m") {
    val df = Seq((5L, 1L), (4L, 2L), (3L, 1L), (1L, 2L), (7L, 7L))
      .toDF("x", "y")
    val r = Profiling.signTest(df, "x", "y").head()
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("n_tie") == 1L)
    assert(r.getAs[Long]("m") == 4L)
    assert(r.getAs[Double]("z") == 1.0) // (6-4)/2
    assert(!r.getAs[Boolean]("significant"))
  }

  test("signTest: all ties degenerate to NULL z, never a crash") {
    val df = Seq((2L, 2L), (3L, 3L)).toDF("x", "y")
    val r = Profiling.signTest(df, "x", "y").head()
    assert(r.getAs[Long]("m") == 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("gTest: independent table gives G = 0; skewed matches hand value") {
    // perfectly independent 2×2 (all expected ratios 1 → ln 1 = 0)
    val ind = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r0", "c0")
    val g0 = Profiling.gTest(ind, "r0", "c0").head()
    assert(g0.getAs[Double]("g") == 0.0)
    assert(g0.getAs[Long]("df") == 1L)
    // skewed (8,2)/(2,8): replicate the nano quantization exactly
    val skew = (Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(8)(("b", "y")))
      .toDF("r0", "c0")
    val r = Profiling.gTest(skew, "r0", "c0").head()
    def term(obs: Long): Long =
      math.round(obs * math.log(obs * 20.0 / (10.0 * 10.0)) * 1e6)
    val gMicro = 2 * term(8) + 2 * term(2)
    assert(r.getAs[Long]("g_micro") == gMicro)
    assert(r.getAs[Double]("g") ==
      math.rint(2.0 * gMicro / 1e6 * 1e6) / 1e6)
    assert(r.getAs[Boolean]("significant") ==
      (r.getAs[Double]("g") > 3.841459))
  }

  test("riskRatio: hand 2×2 — RR 2, OR 2.111111, CI chains match libm") {
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(90)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(95)((false, false))
    val r = Profiling.riskRatio(rows.toDF("e0", "o0"), "e0", "o0").head()
    assert(r.getAs[Long]("a") == 10L && r.getAs[Long]("d") == 95L)
    assert(r.getAs[Double]("risk_ratio") == 2.0)
    assert(r.getAs[Double]("odds_ratio") ==
      math.rint(10.0 * 95 / (90.0 * 5) * 1e6) / 1e6)
    val seRr = math.sqrt(1.0 / 10 - 1.0 / 100 + 1.0 / 5 - 1.0 / 100)
    assert(r.getAs[Double]("rr_lo") ==
      math.rint(math.exp(math.log(2.0) - 1.959964 * seRr) * 1e6) / 1e6)
    assert(r.getAs[Double]("rr_hi") ==
      math.rint(math.exp(math.log(2.0) + 1.959964 * seRr) * 1e6) / 1e6)
  }

  test("riskRatio: empty cell gives NULL estimates, not a crash") {
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(5)((false, false))
    val r = Profiling.riskRatio(rows.toDF("e0", "o0"), "e0", "o0").head()
    assert(r.isNullAt(r.fieldIndex("risk_ratio")))
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
  }

  test("cmh: constructed Simpson's paradox — per-stratum ORs > 1, crude < 1, flip flagged") {
    // stratum X: exposed 8+/2−, unexposed 70+/30− (OR 1.714)
    // stratum Y: exposed 20+/80−, unexposed 1+/9− (OR 2.25)
    // collapsed: 28/82 vs 71/39 → crude OR 0.188 — direction reverses
    def block(s: String, e: Boolean, pos: Int, neg: Int) =
      Seq.fill(pos)((s, e, true)) ++ Seq.fill(neg)((s, e, false))
    val rows = block("X", e = true, 8, 2) ++ block("X", e = false, 70, 30) ++
      block("Y", e = true, 20, 80) ++ block("Y", e = false, 1, 9)
    val r = Profiling.cmh(rows.toDF("s0", "e0", "o0"), "s0", "e0", "o0")
      .head()
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("sa") == 28L && r.getAs[Long]("sd") == 39L)
    assert(r.getAs[Double]("or_mh") > 1.0, "pooled OR must keep the " +
      "within-stratum direction")
    assert(r.getAs[Double]("or_crude") < 1.0)
    assert(r.getAs[Boolean]("simpson_flip"))
    // pooled OR replays the nano-quantized term arithmetic exactly
    def nano(x: Double): Long = math.round(x * 1e9)
    val sadn = nano(8.0 * 30 / 110) + nano(20.0 * 9 / 110)
    val sbcn = nano(2.0 * 70 / 110) + nano(80.0 * 1 / 110)
    assert(r.getAs[Double]("or_mh") ==
      math.rint(sadn.toDouble / sbcn * 1e6) / 1e6)
  }

  test("wilcoxonSignedRank: hand ranks — zero diffs drop, ties midrank, 2W+ exact") {
    // pairs: d = +3, -1, +1, 0, +2 → nonzero |d| = {3,1,1,2}; midranks
    // of |d|: 1→1.5,1.5 (r2=3), 2→3 (r2=6), 3→4 (r2=8); 2W+ = r2(+3) +
    // r2(+1) + r2(+2) = 8 + 3 + 6 = 17; m=4, E[2W+]=10,
    // Var(2W+) = 4·5·9/6 − (2³−2)/12 = 30 − 0.5 = 29.5
    val df = Seq((4L, 1L), (1L, 2L), (3L, 2L), (5L, 5L), (9L, 7L))
      .toDF("x", "y")
    val r = Profiling.wilcoxonSignedRank(df, "x", "y").head()
    assert(r.getAs[Long]("m") == 4L)
    assert(r.getAs[Long]("wpos2") == 17L)
    assert(r.getAs[String]("t3t") == "6") // one tie pair: 2³−2
    assert(r.getAs[Double]("z") ==
      math.rint((17.0 - 10.0) / math.sqrt(29.5) * 1e6) / 1e6)
  }

  test("pageTrend: monotone items give the maximal L; reversed order flips the sign") {
    // 4 items × 3 treatments (labels sort a<b<c), values strictly
    // increasing along the label order in every item → within-item ranks
    // (1,2,3) doubled (2,4,6); R2j = (8,16,24); c=(1,2,3) → 2L = 112 =
    // the maximum n·k(k+1)(2k+1)/3... checked directly below
    val inc = for (i <- 1L to 4L; (t, v) <- Seq(("a", 1L), ("b", 2L), ("c", 3L)))
      yield (i, t, v * 10 + i)
    val r = Profiling.pageTrend(inc.toDF("item", "t", "v"), "item", "t", "v")
      .head()
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Long]("l2") == 2L * (1 * 4 + 2 * 8 + 3 * 12))
    // E[2L] = n·k(k+1)²/2 = 4·3·16/2 = 96; Var(2L) = 4·9·4·8/36 = 32
    assert(r.getAs[Double]("z") ==
      math.rint((112.0 - 96.0) / math.sqrt(32.0) * 1e6) / 1e6)
    assert(r.getAs[Boolean]("significant"))
    // reversing the value trend reverses z exactly
    val dec = inc.map { case (i, t, v) => (i, t, 1000L - v) }
    val r2 = Profiling.pageTrend(dec.toDF("item", "t", "v"), "item", "t", "v")
      .head()
    assert(r2.getAs[Double]("z") == -r.getAs[Double]("z"))
  }

  test("pageTrend: incomplete items drop before ranking") {
    val rows = Seq((1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 5L)) // item 2 incomplete
    val r = Profiling.pageTrend(rows.toDF("item", "t", "v"),
      "item", "t", "v").head()
    assert(r.getAs[Long]("n_items") == 1L)
  }

  test("linkPredictors: triangle+tail graph — all four scores hand-checked") {
    // 1-2, 2-3, 1-3 (triangle) + 3-4 (tail): non-adjacent pairs sharing
    // a neighbor are (1,4) and (2,4), both through center 3 (deg 3)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val rows = Graph.linkPredictors(edges, "src", "dst", topK = 10)
      .collect()
    assert(rows.length == 2)
    val r14 = rows.find(r => r.getAs[Long]("a") == 1L).get
    assert(r14.getAs[Long]("b") == 4L)
    assert(r14.getAs[Long]("n_common") == 1L)
    assert(r14.getAs[Long]("deg_a") == 2L && r14.getAs[Long]("deg_b") == 1L)
    assert(r14.getAs[Long]("ra_micro") == math.round(1e6 / 3)) // 1/deg(3)
    assert(r14.getAs[Long]("jaccard_micro") == 500000L) // 1/(2+1-1)
    assert(r14.getAs[Long]("pref_attach") == 2L)
    // deterministic order: equal RA ties break on (a, b)
    assert(rows.map(_.getAs[Long]("a")).toSeq == Seq(1L, 2L))
  }

  test("linkPredictors: maxCenterDeg cap removes hub-centered wedges but keeps exact endpoint degrees") {
    // star center 0 with spokes 1..5 (deg 5) + one 1-2 edge: capping at
    // 4 removes every wedge through the hub; only centers 1 and 2
    // (deg 2) pivot — wedges (0,2) via 1 and (0,1) via 2 are ADJACENT,
    // so nothing survives; uncapped, pairs like (1,3) appear via the hub
    val edges = ((1L to 5L).map(i => (0L, i)) :+ (1L, 2L)).toDF("src", "dst")
    val uncapped = Graph.linkPredictors(edges, "src", "dst", topK = 100)
    assert(uncapped.count() > 0)
    val capped = Graph.linkPredictors(edges, "src", "dst", topK = 100,
      maxCenterDeg = 4)
    assert(capped.count() == 0L)
  }

  test("cramerVonMises: identical samples give T = 0; disjoint shift hand-checked") {
    val same = (Seq(1L, 2L, 3L).map((true, _)) ++
      Seq(1L, 2L, 3L).map((false, _))).toDF("g0", "v")
    val r0 = Profiling.cramerVonMises(same, "g0", "v").head()
    assert(r0.getAs[Double]("t") == 0.0)
    assert(!r0.getAs[Boolean]("significant"))
    // {1,2,3} vs {11,12,13}: d = 3·cum1 − 3·cum2 over the 6 pooled
    // values = (3,6,9,6,3,0); num = 9+36+81+36+9 = 171;
    // T = 171/(6²·3·3) = 0.527778 — past the 0.461 asymptotic 5% point
    val shift = (Seq(1L, 2L, 3L).map((true, _)) ++
      Seq(11L, 12L, 13L).map((false, _))).toDF("g0", "v")
    val r = Profiling.cramerVonMises(shift, "g0", "v").head()
    assert(r.getAs[String]("num") == "171")
    assert(r.getAs[Double]("t") == math.rint(171.0 / 324 * 1e6) / 1e6)
    assert(r.getAs[Boolean]("significant"))
  }

  test("jonckheere: strictly increasing ordered groups — exact 2J and z") {
    // g1={1,2} < g2={3,4} < g3={5,6}: every cross-pair is a win →
    // 2J = 2·(4+4+4) = 24; E[2J] = (36−12)/2 = 12;
    // Var(2J) = (36·15 − 84)/18 = 25.333…
    val rows = Seq(("1_a", 1L), ("1_a", 2L), ("2_b", 3L), ("2_b", 4L),
      ("3_c", 5L), ("3_c", 6L))
    val r = Profiling.jonckheere(rows.toDF("g0", "v"), "g0", "v").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[String]("j2") == "24")
    assert(r.getAs[String]("sg2") == "12")
    assert(r.getAs[String]("sg23") == "84")
    assert(r.getAs[Double]("z") ==
      math.rint(12.0 / math.sqrt(456.0 / 18) * 1e6) / 1e6)
    assert(r.getAs[Boolean]("significant"))
  }

  test("jonckheere: ties count half — two identical groups give 2J = n1·n2") {
    // both groups {5,5}: every cross pair ties → U = ½·4 → 2J = 4
    val rows = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
    val r = Profiling.jonckheere(rows.toDF("g0", "v"), "g0", "v").head()
    assert(r.getAs[String]("j2") == "4")
  }

  test("grangerLag1: lagged-x-driven series flags, pure-AR noise does not, constant NULLs") {
    // causal: y_t = 3·x_{t-1} + (t mod 2) — x's past nearly determines y
    val causal = (0L until 24L).map { t =>
      val x = (t * 7) % 13
      val xl = ((t - 1) * 7) % 13
      ("k", t, if (t == 0) 0L else 3 * xl + (t % 2), x)
    }
    val rc = TimeSeries.grangerLag1(
      causal.toDF("key", "t", "y", "x"), "key", "t", "y", "x").head()
    assert(rc.getAs[Double]("f_stat") > 10.0, s"causal F=$rc")
    assert(rc.getAs[Boolean]("significant"))
    // independent: y is pure deterministic pseudo-noise, x another —
    // the x lag must not clear the 3.84 asymptotic bar
    val indep = (0L until 40L).map { t =>
      ("k", t, (t * 5) % 11, (t * 3) % 7)
    }
    val ri = TimeSeries.grangerLag1(
      indep.toDF("key", "t", "y", "x"), "key", "t", "y", "x").head()
    assert(!ri.getAs[Boolean]("significant"), s"indep F=$ri")
    // constant y: every SS degenerates → NULL F, never a divide error
    val const = (0L until 10L).map(t => ("k", t, 5L, t))
    val rn = TimeSeries.grangerLag1(
      const.toDF("key", "t", "y", "x"), "key", "t", "y", "x").head()
    assert(rn.isNullAt(rn.fieldIndex("f_stat")))
  }

  test("hillTail: exact nano ln sum; flat tail (all counts = xmin) gives NULL alpha") {
    // counts: a→4, b→2, c→2, d→1 (below xmin, excluded):
    // m=3, Σln = ln(2)+ln(1)+ln(1) = ln 2 → alpha = 1 + 3/ln 2
    val docs = Seq(("en", "a a a a b b c c d")).toDF("lang", "text")
    val r = TextAnalysis.hillTail(docs).head()
    assert(r.getAs[Long]("m_tail") == 3L)
    val sln = math.round(math.log(2.0) * 1e9)
    assert(r.getAs[Long]("sln_nano") == sln)
    assert(r.getAs[Double]("alpha") ==
      math.rint((1.0 + 3.0 / (sln / 1e9)) * 1e6) / 1e6)
    // flat tail: every surviving count exactly xmin
    val flat = Seq(("de", "x x y y z")).toDF("lang", "text")
    val rf = TextAnalysis.hillTail(flat).head()
    assert(rf.isNullAt(rf.fieldIndex("alpha")))
  }

  test("yulesK: hand counts — K = 1e4·(Σc² − N)/N²") {
    // counts 3,2,1 → N=6, Σc²=14 → K = 1e4·8/36
    val docs = Seq(("s0", "a a a b b c")).toDF("source", "text")
    val r = TextAnalysis.yulesK(docs).head()
    assert(r.getAs[Long]("n_tokens") == 6L && r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[String]("s2") == "14")
    assert(r.getAs[Double]("yules_k") ==
      math.rint(10000.0 * 8 / 36 * 1e6) / 1e6)
  }

  test("naiveSkill: perfectly periodic series scores skill 1; constant series NULLs") {
    // period-7 sawtooth over 21 days: season lag is exact (sae_season
    // = 0), lag-1 errors are not → skill = 1
    val rows = (0L until 21L).map(t => ("k", t, (t % 7) * 10))
    val r = TimeSeries.naiveSkill(rows.toDF("key", "t", "v"),
      "key", "t", "v").head()
    assert(r.getAs[Long]("n") == 14L)
    assert(r.getAs[Long]("sae_season") == 0L)
    assert(r.getAs[Double]("skill") == 1.0)
    val const = (0L until 21L).map(t => ("k", t, 5L))
    val rc = TimeSeries.naiveSkill(const.toDF("key", "t", "v"),
      "key", "t", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("skill")))
  }

  test("nelsonAalen: hand increments — censoring shrinks the risk set, H sums d/n") {
    // grp g: events at t=1 (2 of 4 at risk), censor at t=2, event at
    // t=3 (1 at risk) → H = 0.5 then 1.5; Breslow = exp(−H)
    val subj = Seq(("g", 1L, true), ("g", 1L, true), ("g", 2L, false),
      ("g", 3L, true)).toDF("grp", "t", "ev")
    val rows = graft.operators.Survival.nelsonAalen(subj, "grp", "t", "ev")
      .orderBy("t").collect()
    assert(rows.length == 2) // the censor-only time drops from output
    assert(rows(0).getAs[Long]("n_at_risk") == 4L &&
      rows(0).getAs[Long]("d") == 2L)
    assert(rows(0).getAs[Double]("cum_hazard") == 0.5)
    assert(rows(0).getAs[Double]("surv_breslow") ==
      math.rint(math.exp(-0.5) * 1e6) / 1e6)
    assert(rows(1).getAs[Double]("cum_hazard") == 1.5)
    assert(rows(1).getAs[Double]("surv_breslow") ==
      math.rint(math.exp(-1.5) * 1e6) / 1e6)
  }

  test("harmonicCentrality: path graph, 2 landmarks, hand scores and tie-break") {
    // path 1-2-3-4-5, landmarks = {1,2} (lowest ids), 3 hops:
    // v3: 1/2 + 1/1 = 1.5e6 micro; v1 = v2 = 1e6 (tie → id order);
    // v4: 1/3 + 1/2 = 833333; v5: 1/3 only
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val rows = Graph.harmonicCentrality(edges, "src", "dst",
      nLandmarks = 2, maxHops = 3, topK = 10).collect()
    assert(rows.map(_.getAs[Long]("v")).toSeq == Seq(3L, 1L, 2L, 4L, 5L))
    assert(rows(0).getAs[Long]("harmonic_micro") == 1500000L)
    assert(rows(0).getAs[Long]("n_reached") == 2L)
    assert(rows(3).getAs[Long]("harmonic_micro") ==
      math.round(1e6 / 3) + 500000L)
    assert(rows(4).getAs[Long]("harmonic_micro") == math.round(1e6 / 3))
  }

  test("gofUniform: uniform key scores 0, skewed key gets the zero-cell correction") {
    // global categories {a,b,c}; key u: 10/10/10 (chi2 0); key s:
    // 20/10/absent → sdev2 = (60−30)² = 900, zero-cell adds 1·30²,
    // chi2 = 1800/90 = 20
    val rows = Seq.fill(10)(("u", "a")) ++ Seq.fill(10)(("u", "b")) ++
      Seq.fill(10)(("u", "c")) ++ Seq.fill(20)(("s", "a")) ++
      Seq.fill(10)(("s", "b"))
    val got = Profiling.gofUniform(rows.toDF("key", "cat"), "key", "cat")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(got("u").getAs[Double]("chi2") == 0.0)
    assert(!got("u").getAs[Boolean]("significant"))
    val s = got("s")
    assert(s.getAs[Long]("k") == 3L && s.getAs[Long]("k_obs") == 2L)
    assert(s.getAs[String]("sdev2") == "900")
    assert(s.getAs[Double]("chi2") == 20.0)
    assert(s.getAs[Boolean]("significant"))
  }

  test("shiftFunction: 0..10 vs constant 5 — deciles interpolate exactly, shift = d/10 − 5") {
    val rows = (0L to 10L).map((true, _)) ++ Seq.fill(5)((false, 5L))
    val got = Profiling.shiftFunction(rows.toDF("g0", "v"), "g0", "v")
      .orderBy("decile").collect()
    assert(got.length == 9)
    for ((r, idx) <- got.zipWithIndex) {
      val d = idx + 1
      assert(r.getAs[Long]("decile") == d * 10L)
      assert(r.getAs[Double]("q_a") == d.toDouble) // p·(n−1) lands on ints
      assert(r.getAs[Double]("q_b") == 5.0)
      assert(r.getAs[Double]("shift") == d - 5.0)
    }
  }

  test("captureRecapture: exact count audited in-row, Chapman replays the cell formula") {
    val df = (1L to 500L).toDF("id")
    val r = graft.operators.Sampling.captureRecapture(df, "id").head()
    assert(r.getAs[Long]("exact_distinct") == 500L)
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"))
    assert(m <= math.min(n1, n2))
    assert(r.getAs[Double]("est") ==
      math.rint(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1) * 1e6) / 1e6)
    // the halves are ~250 each, so Chapman should land near 500
    assert(r.getAs[Double]("rel_err") < 0.25)
  }

  test("bowkerSymmetry: hand pairs — one-directional mass counts, diagonal ignored") {
    // transitions: a→b ×6, b→a ×2 (term (6−2)²/8 = 2), a→c ×3 with no
    // c→a (term 9/3 = 3), b→b ×10 (diagonal, ignored) → chi2 = 5, m = 2
    val rows = Seq.fill(6)(("a", "b")) ++ Seq.fill(2)(("b", "a")) ++
      Seq.fill(3)(("a", "c")) ++ Seq.fill(10)(("b", "b"))
    val r = Profiling.bowkerSymmetry(rows.toDF("f0", "t0"), "f0", "t0")
      .head()
    assert(r.getAs[Long]("m") == 2L)
    assert(r.getAs[Double]("chi2") == 5.0)
    assert(r.getAs[Long]("df") == 2L)
    assert(!r.getAs[Boolean]("significant")) // 5.0 < 5.991465
  }

  test("atkinson: equal values score 0; hand value on {1, e²}") {
    val eq = Seq(("g", 7L), ("g", 7L), ("g", 7L)).toDF("g0", "v")
    assert(Eval.atkinson(eq, "g0", "v").head().getAs[Double]("atkinson")
      == 0.0)
    // {1, 7}: geomean = √7, mean = 4 → A = 1 − √7/4, replayed through
    // the nano-quantized ln path exactly
    val two = Seq(("g", 1L), ("g", 7L)).toDF("g0", "v")
    val r = Eval.atkinson(two, "g0", "v").head()
    val slnNano = math.round(math.log(1.0) * 1e9) + math.round(math.log(7.0) * 1e9)
    assert(r.getAs[Long]("sln_nano") == slnNano)
    assert(r.getAs[Double]("atkinson") ==
      math.rint((1.0 - math.exp(slnNano / 1e9 / 2) / 4.0) * 1e6) / 1e6)
  }

  test("cronbachAlpha: duplicated item gives alpha 1; anti-correlated items go negative") {
    // two identical items per unit → Σσ_i² = 2σ², σ_T² = 4σ² →
    // α = 2·(1−½) = 1; values {0, 60} make the milli-quantized item
    // variance (900) exactly representable
    val dup = (1L to 2L).flatMap(u =>
      Seq((u, "i1", (u - 1) * 60), (u, "i2", (u - 1) * 60)))
    val r1 = Profiling.cronbachAlpha(dup.toDF("u", "item", "v"),
      "u", "item", "v").head()
    assert(r1.getAs[Long]("k") == 2L && r1.getAs[Long]("n_units") == 2L)
    assert(r1.getAs[Long]("sum_var_milli") == 2L * 900L * 1000L)
    assert(r1.getAs[Double]("alpha") == 1.0)
    // perfectly anti-correlated items: T constant → σ_T² = 0 → NULL
    val anti = (1L to 6L).flatMap(u =>
      Seq((u, "i1", u * 10), (u, "i2", 100 - u * 10)))
    val r2 = Profiling.cronbachAlpha(anti.toDF("u", "item", "v"),
      "u", "item", "v").head()
    assert(r2.isNullAt(r2.fieldIndex("alpha")))
  }

  test("fleissKappa: perfect agreement gives 1, fixed marginals worked example") {
    // 3 raters, 4 items, all agree per item (2 cats) → κ = 1
    val perfect = (1L to 4L).flatMap(i =>
      Seq("r1", "r2", "r3").map(r => (i, r, if (i <= 2) "a" else "b")))
    val r1 = Profiling.fleissKappa(perfect.toDF("item", "rater", "cat"),
      "item", "rater", "cat").head()
    assert(r1.getAs[Long]("n_raters") == 3L && r1.getAs[Long]("n_items") == 4L)
    assert(r1.getAs[Double]("kappa") == 1.0)
    // worked: 2 items, 2 raters; item1 split (a,b), item2 agree (a,a):
    // P̄ = ((2−2)/2 + (4−2)/2)/2 = 0.5; p_a = 3/4, p_b = 1/4,
    // Pe = 9/16 + 1/16 = 0.625 → κ = (0.5−0.625)/0.375 = −1/3
    val mixed = Seq((1L, "r1", "a"), (1L, "r2", "b"),
      (2L, "r1", "a"), (2L, "r2", "a"))
    val r2 = Profiling.fleissKappa(mixed.toDF("item", "rater", "cat"),
      "item", "rater", "cat").head()
    assert(r2.getAs[Double]("kappa") ==
      math.rint(-1.0 / 3 * 1e6) / 1e6)
  }

  test("fisherRatio: 1-dim two-label hand case — B/W = 25; zero-within NULLs") {
    // labels a:{0,2}, b:{10,12} in fixed-point f = 2^24: per-label
    // within = 2f² each → W = 4f²; means ±5f from the grand mean →
    // B = 100f²; fisher = 25
    val df = Seq((0, Array(0f)), (0, Array(2f)), (1, Array(10f)),
      (1, Array(12f))).toDF("label", "embedding")
    val r = graft.operators.Similarity.fisherRatio(df).head()
    assert(r.getAs[Long]("dim") == 1L && r.getAs[Long]("k_labels") == 2L)
    assert(r.getAs[Double]("fisher") == 25.0)
    // constant values per label → W = 0 → NULL, never a divide error
    val const = Seq((0, Array(1f)), (0, Array(1f)), (1, Array(5f)))
      .toDF("label", "embedding")
    val rc = graft.operators.Similarity.fisherRatio(const).head()
    assert(rc.isNullAt(rc.fieldIndex("fisher")))
  }

  test("zeroInflation: zeros from the grid algebra, score chain replays libm exp") {
    // buckets 1..10, events only at h=1 (x3) and h=10 (x1): B=10,
    // n_zero=8, lambda=0.4 — a zero spike the Poisson can't explain
    val rows = Seq(("k", 1L), ("k", 1L), ("k", 1L), ("k", 10L))
    val r = TimeSeries.zeroInflation(rows.toDF("key", "h"), "key", "h")
      .head()
    assert(r.getAs[Long]("n_buckets") == 10L)
    assert(r.getAs[Long]("n_zero") == 8L)
    val lam = 0.4; val p0 = math.exp(-lam)
    val den = 10 * p0 * (1 - p0) - 10 * lam * p0 * p0
    val expect = math.rint((8 - 10 * p0) * (8 - 10 * p0) / den * 1e6) / 1e6
    assert(r.getAs[Double]("score_chi2") == expect)
    assert(r.getAs[Boolean]("significant") == (expect > 3.841459))
  }

  test("spiegelhalterZ: hand three-point case — endpoint terms vanish, z = 2") {
    // scores {0,2,10} → conf {0, .2, 1}; only the interior point carries
    // numerator (1−.2)·.6 = .48 and variance .36·.2·.8 = .0576 →
    // z = .48/.24 = 2
    val df = Seq((0L, false), (2L, true), (10L, true)).toDF("s0", "y0")
    val r = Eval.spiegelhalterZ(df, "s0", "y0").head()
    assert(r.getAs[Long]("snum_micro") == 480000L)
    assert(r.getAs[Long]("sden_micro") == 57600L)
    assert(r.getAs[Double]("z") == 2.0)
    assert(r.getAs[Boolean]("significant"))
  }

  test("hosmerLemeshow: endpoint bins drop and are reported; terms replay the micro chain") {
    // scores 0..9, one row per bin; y = 1 iff s >= 5. conf = s/9; the
    // e=0 and e=1 bins are uninformative → bins_used 8, dropped 2
    val rows = (0L to 9L).map(s => (s, s >= 5L))
    val r = Eval.hosmerLemeshow(rows.toDF("s0", "y0"), "s0", "y0").head()
    assert(r.getAs[Long]("bins_used") == 8L)
    assert(r.getAs[Long]("bins_dropped") == 2L)
    val hl = (1L to 8L).map { s =>
      val e = math.round(s / 9.0 * 1e6) / 1e6
      val o = if (s >= 5) 1.0 else 0.0
      math.round((o - e) * (o - e) * 1 / (e * (1 - e)) * 1e6)
    }.sum
    assert(r.getAs[Long]("hl_micro") == hl)
    assert(r.getAs[Long]("df") == 6L)
    assert(r.getAs[Double]("chi2_crit") == 12.591587)
  }

  test("woolf: equal stratum ORs give chi2 ~ 0; inverted OR flags; empty cells drop") {
    def block(s: String, e: Boolean, pos: Int, neg: Int) =
      Seq.fill(pos)((s, e, true)) ++ Seq.fill(neg)((s, e, false))
    // both strata OR = 4 → homogeneous (chi2 only quantization residue)
    val homo = block("P", e = true, 4, 2) ++ block("P", e = false, 2, 4) ++
      block("Q", e = true, 8, 4) ++ block("Q", e = false, 4, 8)
    val rh = Profiling.woolf(homo.toDF("s0", "e0", "o0"), "s0", "e0", "o0")
      .head()
    assert(rh.getAs[Long]("k_used") == 2L)
    assert(math.abs(rh.getAs[Double]("chi2")) < 1e-4)
    assert(!rh.getAs[Boolean]("significant"))
    // stratum Q inverted: OR 4 vs 1/4 → heterogeneous (×3 cell counts
    // so the inverse-variance weights push chi2 past the 3.84 bar)
    val het = block("P", e = true, 12, 6) ++ block("P", e = false, 6, 12) ++
      block("Q", e = true, 12, 24) ++ block("Q", e = false, 24, 12)
    val rt = Profiling.woolf(het.toDF("s0", "e0", "o0"), "s0", "e0", "o0")
      .head()
    assert(rt.getAs[Double]("chi2") > 3.841459)
    assert(rt.getAs[Boolean]("significant"))
    // a zero-cell stratum drops and is reported
    val withEmpty = homo ++ block("R", e = true, 3, 0) ++
      block("R", e = false, 2, 2)
    val rd = Profiling.woolf(withEmpty.toDF("s0", "e0", "o0"),
      "s0", "e0", "o0").head()
    assert(rd.getAs[Long]("k_used") == 2L && rd.getAs[Long]("k_dropped") == 1L)
  }

  test("theilIndex: perfect equality scores 0; hand case replays the milli chain") {
    val eq = Seq(("g", 1L), ("g", 1L), ("g", 1L)).toDF("g0", "v")
    assert(Eval.theilIndex(eq, "g0", "v").head().getAs[Double]("theil")
      == 0.0)
    val two = Seq(("g", 1L), ("g", 7L)).toDF("g0", "v")
    val r = Eval.theilIndex(two, "g0", "v").head()
    val sxlx = math.round(1 * math.log(1.0) * 1000) +
      math.round(7 * math.log(7.0) * 1000)
    assert(r.getAs[Long]("sxlx_milli") == sxlx)
    assert(r.getAs[Double]("theil") ==
      math.rint((sxlx / 1000.0 / 8 - math.log(4.0)) * 1e6) / 1e6)
  }

  test("riskDiff: hand 2×2 — RD .05, z and CI replay the SE chain, NNT 20") {
    val rows = Seq.fill(10)((true, true)) ++ Seq.fill(90)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(95)((false, false))
    val r = Profiling.riskDiff(rows.toDF("e0", "o0"), "e0", "o0").head()
    assert(r.getAs[Double]("risk_diff") == 0.05)
    val se = math.sqrt(0.1 * 0.9 / 100 + 0.05 * 0.95 / 100)
    assert(r.getAs[Double]("z") == math.rint(0.05 / se * 1e6) / 1e6)
    assert(r.getAs[Double]("rd_lo") ==
      math.rint((0.05 - 1.959964 * se) * 1e6) / 1e6)
    assert(r.getAs[Double]("nnt") == 20.0)
  }

  test("rboTopK: identical rankings give 1 − p^k (truncated); reversal drops agreement") {
    def micro(d: Int, agree: Long): Long =
      math.round(0.1 * math.exp((d - 1) * math.log(0.9)) * agree / d * 1e6)
    val same = (1L to 5L).map(i => (i, 100 - i, 100 - i))
      .toDF("id", "sa", "sb")
    val r = Eval.rboTopK(same, "id", "sa", "sb", k = 5).head()
    assert(r.getAs[Long]("k") == 5L && r.getAs[Long]("n_both") == 5L)
    val exp1 = (1 to 5).map(d => micro(d, d.toLong)).sum
    assert(r.getAs[Long]("rbo_micro") == exp1)
    // ≈ 1 − 0.9⁵ = 0.40951 up to micro quantization
    assert(math.abs(r.getAs[Double]("rbo") - (1 - math.pow(0.9, 5))) < 1e-4)
    // fully reversed: maxr = max(i, 6−i) → agree = (0,0,1,3,5)
    val rev = (1L to 5L).map(i => (i, 100 - i, 100 + i)).toDF("id", "sa", "sb")
    val r2 = Eval.rboTopK(rev, "id", "sa", "sb", k = 5).head()
    val agrees = Seq(0L, 0L, 1L, 3L, 5L)
    val exp2 = (1 to 5).map(d => micro(d, agrees(d - 1))).sum
    assert(r2.getAs[Long]("rbo_micro") == exp2)
    assert(r2.getAs[Double]("rbo") < r.getAs[Double]("rbo"))
  }

  test("rankAgreement: identical rankings score tau 1 / footrule 0; reversal scores -1") {
    val same = (1L to 5L).map(i => (i, 100 - i, 100 - i))
      .toDF("id", "sa", "sb")
    val r = Eval.rankAgreement(same, "id", "sa", "sb", k = 5).head()
    assert(r.getAs[Long]("m") == 5L && r.getAs[Long]("n_dis") == 0L)
    assert(r.getAs[Double]("tau") == 1.0)
    assert(r.getAs[Long]("footrule") == 0L)
    val rev = (1L to 5L).map(i => (i, 100 - i, 100 + i)).toDF("id", "sa", "sb")
    val r2 = Eval.rankAgreement(rev, "id", "sa", "sb", k = 5).head()
    assert(r2.getAs[Double]("tau") == -1.0)
    // footrule of full reversal on 5 ranks: |1−5|+|2−4|+0+|4−2|+|5−1| = 12
    assert(r2.getAs[Long]("footrule") == 12L)
  }

  test("chi2Crit95Sql: extended to df 20 (the 20-source kruskal df=19 case); NULL beyond") {
    val row = spark.sql(
      s"SELECT ${Profiling.chi2Crit95Sql("19")} AS c19, " +
        s"${Profiling.chi2Crit95Sql("20")} AS c20, " +
        s"${Profiling.chi2Crit95Sql("21")} AS c21").head()
    assert(row.getAs[Double]("c19") == 30.143527)
    assert(row.getAs[Double]("c20") == 31.410433)
    assert(row.isNullAt(row.fieldIndex("c21")))
  }

  test("cmh: single-row strata drop; uniform-outcome strata keep V = 0 out of the denominator") {
    // one real stratum + one 1-row stratum (must be excluded: V needs n−1)
    def block(s: String, e: Boolean, pos: Int, neg: Int) =
      Seq.fill(pos)((s, e, true)) ++ Seq.fill(neg)((s, e, false))
    val rows = block("X", e = true, 3, 2) ++ block("X", e = false, 2, 3) ++
      Seq(("lone", true, true))
    val r = Profiling.cmh(rows.toDF("s0", "e0", "o0"), "s0", "e0", "o0")
      .head()
    assert(r.getAs[Long]("k") == 1L, "1-row stratum must drop")
    assert(r.getAs[Long]("sa") == 3L)
  }
}
