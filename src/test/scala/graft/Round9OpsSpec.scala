package graft

import graft.operators.{Eval, Graph, Profiling, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-9 hardening: lag-dependent Ljung–Box threshold, NULL-sentinel
  * fingerprints, overflow-proof Spearman moments, k-core round-budget
  * guard, kendallTau id determinism under adversarial partitioning. */
class Round9OpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("ljungBox: threshold follows maxLag df (3.84 at lag 1, not 11.07)") {
    // alternating ± series: rho_1 ≈ -1 → Q_1 ≈ n(n+2)/(n-1) ≈ n+3. With
    // n=12, Q ≈ 15.7 — wait, rho_1^2≈1 → Q≈n(n+2)/(n-1). Pick n so Q
    // lands BETWEEN chi2_1(0.95)=3.84 and chi2_5(0.95)=11.07: scale the
    // correlation down instead — a weakly lag-1-correlated series.
    // Deterministic fixture: y = (x%3) + small alternating bump.
    val rows = (0L until 40L).map(x =>
      ("g", x, (x % 3L) * 10L + (if (x % 2 == 0) 3L else 0L)))
    val got = TimeSeries.ljungBox(rows.toDF("g", "x", "y"),
      "g", "x", "y", maxLag = 1).head()
    val q = got.getAs[Double]("lb_stat")
    val sig = got.getAs[Boolean]("significant")
    // the flag must equal Q > chi2_1(0.95), NOT Q > 11.0705
    assert(sig == (q > 3.841459), s"Q=$q sig=$sig")
    // and the fixture is chosen to discriminate: the old hardcoded 11.0705
    // threshold would give the OPPOSITE answer if Q lands in (3.84, 11.07]
    if (q > 3.841459 && q <= 11.0705)
      assert(sig, "lag-1 Q in (3.84, 11.07] must flag under df=1")
    // unsupported lag fails loudly instead of using a wrong quantile
    intercept[IllegalArgumentException] {
      TimeSeries.ljungBox(rows.toDF("g", "x", "y"), "g", "x", "y",
        maxLag = 25)
    }
  }

  test("ljungBox: maxLag=1 on a strongly alternating series flags at df=1") {
    val alt = (0L until 30L).map(x =>
      ("a", x, if (x % 2 == 0) 100L else -100L))
    val got = TimeSeries.ljungBox(alt.toDF("g", "x", "y"),
      "g", "x", "y", maxLag = 1).head()
    assert(got.getAs[Boolean]("significant"))
    assert(got.getAs[Double]("lb_stat") > 3.841459)
  }

  test("tableFingerprint: NULL position matters (sentinel rendering)") {
    // (a, NULL, b) vs (a, b, NULL) — concat_ws alone would render both as
    // "a|b"; the sentinel keeps them distinct
    val t1 = Seq(("g", Some("a"), None: Option[String], Some("b")))
      .toDF("grp", "c1", "c2", "c3")
    val t2 = Seq(("g", Some("a"), Some("b"), None: Option[String]))
      .toDF("grp", "c1", "c2", "c3")
    val f1 = Profiling.tableFingerprint(t1, "grp", Seq("c1", "c2", "c3"))
      .head()
    val f2 = Profiling.tableFingerprint(t2, "grp", Seq("c1", "c2", "c3"))
      .head()
    assert(f1.getAs[Long]("hash_sum") != f2.getAs[Long]("hash_sum"),
      "NULL-position swap must change the fingerprint")
    // and a NULL cell differs from the literal sentinel string only by
    // convention — the contract documents '<NUL>' as reserved
    assert(Profiling.nullSentinel == "<NUL>")
  }

  test("spearman: exact at 2M rows where long second moments overflow") {
    // doubled midranks reach 2n-1 = 4M-1; sum of squares ≈ 4n³/3 ≈
    // 1.1e19 > Long.MaxValue (9.2e18) — the DECIMAL(38,0) moments keep
    // the Pearson finish exact where a silent long wrap would NULL it
    // (negative variance) or corrupt it
    val n = 2000000L
    val df = spark.range(n).select(col("id").as("x"), col("id").as("y"))
    val r = Profiling.spearman(df, "x", "y").head()
    assert(r.getAs[Long]("n") == n)
    // exposed moments leave as STRING (r10 decimal contract) — exact
    // digits, parsed back here to assert the >2^63 magnitude survived
    val sxx = new java.math.BigDecimal(r.getAs[String]("sxx"))
    assert(sxx.compareTo(
      java.math.BigDecimal.valueOf(Long.MaxValue)) > 0,
      s"fixture must exceed long range: sxx=$sxx")
    assert(r.getAs[Double]("spearman_rho") == 1.0)
  }

  test("kCore: exhausted round budget throws instead of truncating") {
    // a 14-vertex path at k=2 peels one vertex from each end per round —
    // needs 7 rounds to empty; 2 rounds leaves degree-1 vertices behind
    val path = (0L until 13L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.kCore(path, "src", "dst", k = 2, maxRounds = 2).count()
    }
    assert(ex.getMessage.contains("fixpoint"))
    // with budget, the path fully peels (no 2-core) — and an attached
    // triangle survives as the exact 2-core
    assert(Graph.kCore(path, "src", "dst", k = 2, maxRounds = 20)
      .count() == 0L)
    val withTri = path.union(
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (102L, 0L))
        .toDF("src", "dst"))
    val core = Graph.kCore(withTri, "src", "dst", k = 2, maxRounds = 20)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(core == Set(100L, 101L, 102L))
  }

  test("triangleCounts maxDeg: planted hub excluded, small triangles exact") {
    // a 60-spoke hub whose spokes form triangles with it, plus two
    // disjoint hub-free triangles; capping at maxDeg=10 removes every
    // hub-incident edge (and with it the spoke-pair edges' hub triangles)
    // while the small triangles keep their EXACT counts
    val hub = (1L to 60L).map(i => (0L, i)) ++
      (1L until 60L).map(i => (i, i + 1)) // spokes chained → hub triangles
    val small = Seq((100L, 101L), (101L, 102L), (100L, 102L),
      (200L, 201L), (201L, 202L), (200L, 202L))
    val edges = (hub ++ small).toDF("src", "dst")
    val exact = Graph.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_tri")).toMap
    assert(exact(0L) == 59L) // hub closes every chained spoke pair
    assert(exact(100L) == 1L && exact(202L) == 1L)
    val capped = Graph.triangleCounts(edges, "src", "dst", maxDeg = 10L)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_tri")).toMap
    assert(!capped.contains(0L), "hub must not survive the cap")
    // hub-free triangles are EXACT under the cap
    for (v <- Seq(100L, 101L, 102L, 200L, 201L, 202L))
      assert(capped(v) == 1L, s"vertex $v")
    // chained spokes lost their hub triangles (chain alone has none)
    assert(!capped.contains(30L))
  }

  test("adamicAdar maxCenterDeg: hub centers excluded, small centers exact") {
    // hub 0 connects to 40 leaves (every leaf pair gets a hub-center
    // wedge); a separate 3-star at 500 gives exact small-center scores
    val hub = (1L to 40L).map(i => (0L, i))
    val star = Seq((500L, 501L), (500L, 502L), (500L, 503L))
    val edges = (hub ++ star).toDF("src", "dst")
    val exact = Graph.adamicAdar(edges, "src", "dst", topK = 1000)
    assert(exact.count() == (40L * 39 / 2) + 3L)
    val capped = Graph.adamicAdar(edges, "src", "dst", topK = 1000,
      maxCenterDeg = 10L)
    val rows = capped.collect()
    assert(rows.length == 3, "only the 3-star's leaf pairs survive")
    // score = round(1e6/ln(3)) exactly, per pair
    val want = math.rint(1000000.0 / math.log(3.0)).toLong
    assert(rows.forall(_.getAs[Long]("aa_micro") == want))
  }

  test("nodeFeatures matches the standalone triangle kernel (shared subtree)") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 3L), (6L, 1L)).toDF("src", "dst")
    val feats = Graph.nodeFeatures(edges, "src", "dst")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          r.getAs[Long]("lcc_micro")))).toMap
    val tri = Graph.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_tri")).toMap
    for ((id, (_, nTri, _)) <- feats)
      assert(nTri == tri.getOrElse(id, 0L), s"id=$id")
    assert(feats(3L) == ((4L, 2L, 333333L))) // 2·2·1e6/(4·3)
    assert(feats(6L) == ((1L, 0L, 0L)))
  }

  test("retrievalMetrics: hand-checked NDCG/RR/AP on graded relevance") {
    import graft.operators.Eval
    // q1: perfect head — rel 2 then 1 at ranks 1,2 → everything maximal
    // q2: rel 2 at rank 2, rel 1 at rank 3 → hand-computed micro terms
    val rows = Seq(
      ("q1", 1L, 2L), ("q1", 2L, 1L), ("q1", 3L, 0L),
      ("q2", 1L, 0L), ("q2", 2L, 2L), ("q2", 3L, 1L), ("q2", 4L, 0L))
    val got = Eval.retrievalMetrics(rows.toDF("q", "rank", "rel"),
        "q", "rank", "rel", k = 10)
      .collect().map(r => r.getString(0) -> r).toMap
    val r1 = got("q1")
    assert(r1.getAs[Long]("n_rel") == 2L)
    assert(r1.getAs[Double]("ndcg") == 1.0)
    assert(r1.getAs[Long]("rr_micro") == 1000000L)
    assert(r1.getAs[Double]("ap") == 1.0)
    val r2 = got("q2")
    // dcg = round(2e6/log2(3)) + round(1e6/log2(4)) = 1261860 + 500000
    assert(r2.getAs[Long]("dcg_micro") == 1761860L)
    // ideal: rel2@1, rel1@2 → 2e6 + round(1e6/log2(3)) = 2630930
    assert(r2.getAs[Long]("idcg_micro") == 2630930L)
    assert(math.abs(r2.getAs[Double]("ndcg") - 1761860.0 / 2630930) < 1e-6)
    assert(r2.getAs[Long]("rr_micro") == 500000L) // first hit at rank 2
    // precision terms: round(1e6·1/2)=500000, round(1e6·2/3)=666667
    assert(r2.getAs[Long]("ap_sum_micro") == 1166667L)
  }

  test("anovaF: hand-checked two-group F, exact milli sums") {
    import graft.operators.Eval
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 5L), ("b", 6L), ("b", 7L))
    val r = Eval.anovaF(rows.toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Long]("g") == 2L && r.getAs[Long]("n") == 6L)
    // t = 36/3 + 324/3 = 12 + 108, both exact
    assert(r.getAs[Long]("t_whole") == 120L && r.getAs[Long]("t_frac") == 0L)
    assert(r.getAs[Double]("ssb") == 24.0)
    assert(r.getAs[Double]("ssw") == 4.0)
    assert(r.getAs[Double]("f_stat") == 24.0) // (24/1)/(4/4)
  }

  test("anovaF: no overflow at sums where sg*sg exceeds long range") {
    import graft.operators.Eval
    // two groups of 2M rows with values ~5e4: sg ≈ 1e11, sg² ≈ 1e22 —
    // the naive square overflows long 1000×; the q/r-split assembly
    // never forms it (largest product r·s < n·Σv). F ≈ huge (disjoint
    // means) — assert finiteness + the exact moment columns
    val df = spark.range(4000000L).select(
      (col("id") % 2L).cast("string").as("g"),
      (lit(50000L) + (col("id") % 2L) * 1000L + (col("id") % 7L)).as("v"))
    val r = Eval.anovaF(df, "g", "v").head()
    assert(r.getAs[Long]("n") == 4000000L)
    assert(r.getAs[Long]("s") > 2L * 100000000000L) // sg ≈ 1e11 per group
    val f = r.getAs[Double]("f_stat")
    assert(!f.isNaN && f > 1000.0, s"F=$f")
  }

  test("runsTest: hand-checked runs/z, ties dropped, one-sided NULL") {
    import graft.operators.TimeSeries
    // deltas: +,+,-,+,- → 3 up, 2 down, 4 runs;
    // z = (4 - (2·3·2/5 + 1)) / sqrt(12·(12-5)/(5²·4)) = 0.6/√0.84
    val s1 = Seq(1L, 2L, 3L, 2L, 3L, 2L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }
    // constant stretch in the middle: ties drop, same sign sequence
    val s2 = Seq(1L, 2L, 2L, 2L, 3L, 2L, 3L, 2L).zipWithIndex
      .map { case (v, i) => ("t", i.toLong, v) }
    // strictly increasing → no downs → z NULL
    val s3 = (0L until 6L).map(i => ("up", i, i * 2))
    val got = TimeSeries.runsTest((s1 ++ s2 ++ s3).toDF("k", "b", "v"),
        "k", "b", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    assert(k.getAs[Long]("n_up") == 3L && k.getAs[Long]("n_down") == 2L)
    assert(k.getAs[Long]("n_runs") == 4L)
    assert(math.abs(k.getAs[Double]("z") - 0.6 / math.sqrt(0.84)) < 1e-6)
    val t = got("t")
    assert(t.getAs[Long]("n_up") == 3L && t.getAs[Long]("n_down") == 2L,
      "equal consecutive values must drop, not break the sign sequence")
    assert(t.getAs[Long]("n_runs") == 4L)
    assert(got("up").getAs[Long]("n_down") == 0L)
    assert(got("up").isNullAt(got("up").fieldIndex("z")))
  }

  test("mcnemar: discordant cells only, continuity-corrected, NULL on agreement") {
    import graft.operators.Profiling
    val pairs = Seq.fill(5)((true, true)) ++ Seq.fill(8)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(3)((false, false))
    val r = Profiling.mcnemar(pairs.toDF("ok_a", "ok_b"), "ok_a", "ok_b")
      .head()
    assert(r.getAs[Long]("b_only_a") == 8L && r.getAs[Long]("c_only_b") == 2L)
    assert(r.getAs[Long]("n_concordant") == 8L)
    assert(r.getAs[Double]("chi2") == 2.5) // (|8-2|-1)^2 / 10
    assert(!r.getAs[Boolean]("significant"))
    val strong = Seq.fill(15)((true, false)) ++ Seq.fill(1)((false, true))
    val r2 = Profiling.mcnemar(strong.toDF("ok_a", "ok_b"), "ok_a", "ok_b")
      .head()
    assert(r2.getAs[Double]("chi2") == 10.5625) // 13^2/16
    assert(r2.getAs[Boolean]("significant"))
    val agree = Seq((true, true), (false, false))
    val r3 = Profiling.mcnemar(agree.toDF("ok_a", "ok_b"), "ok_a", "ok_b")
      .head()
    assert(r3.isNullAt(r3.fieldIndex("chi2")), "no disagreement -> NULL")
  }

  test("brownForsythe: equal spreads -> F 0, unequal spreads -> hand value") {
    import graft.operators.Eval
    // same |dev| profile in both groups → SSB = 0 exactly
    val same = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 11L), ("b", 12L), ("b", 13L))
    val r0 = Eval.brownForsythe(same.toDF("g", "v"), "g", "v").head()
    assert(r0.getAs[Double]("ssb") == 0.0)
    // a devs {1,0,1}, b devs {10,0,10}: t = 1+333/1000 + 133+333/1000,
    // SSB = 54 exactly (fractions cancel), SSW = 68 − 666/1000
    val diff = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 20L), ("b", 30L))
    val r = Eval.brownForsythe(diff.toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Long]("t_whole") == 134L && r.getAs[Long]("t_frac") == 666L)
    assert(r.getAs[Double]("ssb") == 54.0)
    assert(math.abs(r.getAs[Double]("ssw") - 67.334) < 1e-9)
    val expectedF = (54.0 / 1) / ((68.0 - 666.0 / 1000) / 4)
    assert(math.abs(r.getAs[Double]("f_stat") - expectedF) < 1e-6)
  }

  test("bradleyTerry: dominance orders, symmetry splits, bit-identical under repartition") {
    import graft.operators.Eval
    // A beats B 3-0, B beats C 3-0, A beats C 3-0 → θ_A > θ_B > θ_C
    val dom = (Seq.fill(3)(("A", "B")) ++ Seq.fill(3)(("B", "C")) ++
      Seq.fill(3)(("A", "C"))).toDF("w", "l")
    val t = Eval.bradleyTerry(dom, "w", "l", iters = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("bt_share_ppb")).toMap
    assert(t("A") > t("B") && t("B") > t("C"), t.toString)
    assert(math.abs(t.values.sum - 1000000000L) <= 3,
      s"shares must renormalize to ~1e9 ppb: ${t.values.sum}")
    // perfectly split head-to-head → equal shares (±1 ppb integer floor)
    val even = (Seq.fill(2)(("X", "Y")) ++ Seq.fill(2)(("Y", "X"))).toDF("w", "l")
    val e = Eval.bradleyTerry(even, "w", "l", iters = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("bt_share_ppb")).toMap
    assert(math.abs(e("X") - e("Y")) <= 1, e.toString)
    // integer arithmetic → the fit is BIT-identical under any partitioning
    val shuffled = Eval.bradleyTerry(dom.repartition(13, col("l")), "w", "l",
        iters = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("bt_share_ppb")).toMap
    assert(shuffled == t)
  }

  test("kTruss: cliques survive, bridges cut, unrolled SQL matches, budget throws") {
    // two K4 cliques joined by a bridge edge: the 4-truss is exactly the
    // two cliques (every clique edge on 2 triangles); the bridge (on 0)
    // and a pendant triangle (edges on 1) peel away
    val k4a = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val k4b = for { i <- 10L to 13L; j <- (i + 1) to 13L } yield (i, j)
    val extra = Seq((3L, 10L), (20L, 21L), (21L, 22L), (20L, 22L))
    val edges = (k4a ++ k4b ++ extra).toDF("src", "dst")
    val got = Graph.kTruss(edges, "src", "dst", k = 4)
    val kept = got.collect()
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toSet
    assert(kept == (k4a ++ k4b).toSet, kept.toString)
    assert(got.collect().forall(_.getAs[Long]("support") == 2L))
    // (the unrolled kTrussSql replay is validated by the DuckDB oracle on
    // q_ktruss — re-running it through Spark's CTE inliner here expands
    // 3^rounds references and is intentionally NOT done)
    // the same graph needs >1 round (round 1 cuts the weak edges, a
    // second pass must CONFIRM the fixpoint) — a 1-round budget throws
    // instead of returning an unconfirmed peel
    val ex = intercept[IllegalArgumentException] {
      Graph.kTruss(edges, "src", "dst", k = 4, maxRounds = 1).count()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }

  test("durbinWatson: hand values — trend 1.0, alternation 3.0, constant NULL") {
    import graft.operators.TimeSeries
    val rows =
      Seq(1L, 2L, 3L).zipWithIndex.map { case (v, i) => ("tr", i.toLong, v) } ++
      Seq(1L, 3L, 1L, 3L).zipWithIndex.map { case (v, i) => ("alt", i.toLong, v) } ++
      Seq(5L, 5L).zipWithIndex.map { case (v, i) => ("const", i.toLong, v) }
    val got = TimeSeries.durbinWatson(rows.toDF("k", "b", "v"), "k", "b", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    // tr: ñ = {-3,0,3}, sse=18, diffs {3,3} → ssd=18 → d=1.0
    assert(got("tr").getAs[Double]("dw") == 1.0)
    // alt: ñ = {-4,4,-4,4}, sse=64, diffs {8,-8,8} → ssd=192 → d=3.0
    assert(got("alt").getAs[Double]("dw") == 3.0)
    assert(got("const").isNullAt(got("const").fieldIndex("dw")))
  }

  test("markovStationary: hand chain 10/11, absorbing drain, bit-identical") {
    import graft.operators.Eval
    // A→A ×9, A→B ×1, B→A ×10 → P=[[.9,.1],[1,0]], π_A = 10/11
    val chain = (Seq.fill(9)(("A", "A")) ++ Seq(("A", "B")) ++
      Seq.fill(10)(("B", "A"))).toDF("f", "t")
    val pi = Eval.markovStationary(chain, "f", "t")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("stationary_ppb")).toMap
    assert(math.abs(pi("A") - 909090909L) <= 1000, pi.toString)
    assert(math.abs(pi.values.sum - 1000000000L) <= 3)
    // absorbing state C swallows all mass (implicit self-loop keeps it)
    val absorb = Seq(("A", "B"), ("B", "C")).toDF("f", "t")
    val pa = Eval.markovStationary(absorb, "f", "t")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("stationary_ppb")).toMap
    assert(pa("C") >= 999999990L, pa.toString)
    // integer arithmetic → identical under adversarial repartition
    val again = Eval.markovStationary(chain.repartition(7, col("t")), "f", "t")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("stationary_ppb")).toMap
    assert(again == pi)
  }

  test("cochranArmitage: hand chi2 12.8 on a rising dose-response, flat -> 0") {
    import graft.operators.Profiling
    def subjects(spec: Seq[(Long, Int, Int)]) = // (dose, positives, total)
      spec.flatMap { case (w, pos, tot) =>
        Seq.fill(pos)((w, true)) ++ Seq.fill(tot - pos)((w, false))
      }.toDF("dose", "y")
    val rising = subjects(Seq((0L, 1, 10), (1L, 5, 10), (2L, 9, 10)))
    val r = Profiling.cochranArmitage(rising, "dose", "y").head()
    // N=30 R=15 swn=30 swr=23 sw2n=50 → 30·240²/(15·15·600) = 12.8
    assert(r.getAs[Double]("chi2_trend") == 12.8)
    assert(r.getAs[Boolean]("significant"))
    val flat = subjects(Seq((0L, 5, 10), (1L, 5, 10), (2L, 5, 10)))
    val rf = Profiling.cochranArmitage(flat, "dose", "y").head()
    assert(rf.getAs[Double]("chi2_trend") == 0.0)
    assert(!rf.getAs[Boolean]("significant"))
  }

  test("kendallTau: stable under adversarial repartition/shuffle upstream") {
    // the id-tagged frame is materialized once, so both self-join sides
    // read identical ids even when the upstream partitioning is volatile
    val base = (1L to 40L).map(i => (i, (i * 7L) % 13L)).toDF("x", "y")
    val expected = Profiling.kendallTau(base, "x", "y").head()
    val shuffled = Profiling.kendallTau(
      base.repartition(17, col("y")).sortWithinPartitions(desc("x")),
      "x", "y").head()
    assert(expected.getAs[Double]("tau_b") ==
      shuffled.getAs[Double]("tau_b"))
    assert(expected.getAs[Long]("n_pairs") == 780L)
    assert(shuffled.getAs[Long]("n_pairs") == 780L)
  }

  test("mannWhitney: separated groups, exact 2U1, Cliff's delta, z") {
    // control {1,2,3} vs treatment {4,5,6}: every treatment value wins
    // -> U1 = n1*n2 = 9 (u1x2 = 18), delta = +1, z = 9/sqrt(21) ≈ 1.9640
    // (JUST over 1.959964 — the fixture discriminates the variance chain)
    val df = Seq((false, 1L), (false, 2L), (false, 3L),
      (true, 4L), (true, 5L), (true, 6L)).toDF("grp", "v")
    val r = Profiling.mannWhitney(df, "grp", "v").head()
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Long]("u1x2") == 18L)
    assert(r.getAs[Double]("cliffs_delta") == 1.0)
    assert(r.getAs[Double]("z") == math.rint(9.0 / math.sqrt(21.0) * 1e6) / 1e6)
    assert(r.getAs[Boolean]("significant"))
  }

  test("mannWhitney: ties give half-wins through exact doubled midranks") {
    // A={1,1} B={1,2}: U1(B) = 0.5+0.5+1+1 = 3 -> u1x2 = 6; tie group of
    // three 1s -> t3t = 27-3 = 24
    val df = Seq((false, 1L), (false, 1L), (true, 1L), (true, 2L))
      .toDF("grp", "v")
    val r = Profiling.mannWhitney(df, "grp", "v").head()
    assert(r.getAs[Long]("u1x2") == 6L)
    // t3t is STRING-exposed (r10 decimal contract); exact digits
    assert(r.getAs[String]("t3t") == "24")
  }

  test("kruskalWallis: hand H on separated tertiles, df-indexed critical") {
    // g1={1,2} g2={3,4} g3={5,6}: R={3,7,11}, S=89.5,
    // H = 12/42*89.5 - 21 = 4.571429 < chi2_2(0.95)=5.991465
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("grp", "v")
    val r = Profiling.kruskalWallis(df, "grp", "v").head()
    assert(r.getAs[Double]("h") == 4.571429)
    assert(r.getAs[Long]("df") == 2L)
    assert(r.getAs[Double]("chi2_crit") == 5.991465)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("kruskalWallis: all-ties degenerates to NULL, df>10 crit is NULL") {
    val ties = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L))
      .toDF("grp", "v")
    val rt = Profiling.kruskalWallis(ties, "grp", "v").head()
    assert(rt.isNullAt(rt.fieldIndex("h")), "all-equal values: H undefined")
    assert(rt.isNullAt(rt.fieldIndex("significant")))
    // 22 groups -> df=21 beyond the (r10-extended, df<=20) lookup: the
    // flag must be NULL, never a silently wrong quantile (the ljungBox
    // lesson); df=11 now resolves — see Round10OpsSpec's table test
    val wide = (0L until 44L).map(i => (s"g${i % 22}", i)).toDF("grp", "v")
    val rw = Profiling.kruskalWallis(wide, "grp", "v").head()
    assert(rw.getAs[Long]("df") == 21L)
    assert(rw.isNullAt(rw.fieldIndex("chi2_crit")))
    assert(rw.isNullAt(rw.fieldIndex("significant")))
    assert(!rw.isNullAt(rw.fieldIndex("h")), "H itself is still reported")
  }

  test("hits: one-iteration hand values on a bipartite hub/authority graph") {
    // h1->{a1,a2}, h2->a2: auth = indegree-of-hub-mass {1,2} -> max-norm
    // {0.5, 1}; hub = {0.5+1, 1} = {1.5, 1} -> {1, 0.66666667}
    val e = Seq((1L, 10L), (1L, 11L), (2L, 11L)).toDF("src", "dst")
    val m = Graph.hits(e, "src", "dst", iters = 1).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("auth"), r.getAs[Double]("hub"))).toMap
    assert(m(10L) == ((0.5, 0.0)))
    assert(m(11L) == ((1.0, 0.0)))
    assert(m(1L) == ((0.0, 1.0)))
    assert(m(2L) == ((0.0, 0.66666667)))
  }

  test("hits: 4 iterations converge toward the golden-ratio split") {
    val e = Seq((1L, 10L), (1L, 11L), (2L, 11L)).toDF("src", "dst")
    val m = Graph.hits(e, "src", "dst", iters = 4).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("auth"), r.getAs[Double]("hub"))).toMap
    // dominant hub/authority pinned at 1 by the max normalization
    assert(m(11L)._1 == 1.0 && m(1L)._2 == 1.0)
    assert(m(10L)._1 > 0.6 && m(10L)._1 < 0.63, s"a1=${m(10L)._1}")
    assert(m(2L)._2 > 0.61 && m(2L)._2 < 0.67, s"h2=${m(2L)._2}")
    // deterministic under adversarial partitioning (exact max-norm chain)
    val shuf = Graph.hits(e.repartition(7, col("dst")), "src", "dst",
      iters = 4).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("auth"), r.getAs[Double]("hub"))).toMap
    assert(shuf == m)
  }

  test("labelPropagation: two triangles with a bridge settle into two communities") {
    // triangles {1,2,3} and {4,5,6} + bridge 3-4; after 4 rounds the
    // hand-traced labels are {1,2,3}->1 and {4,5,6}->3
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val m = Graph.labelPropagation(e, "src", "dst", rounds = 4).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap
    assert(Seq(1L, 2L, 3L).forall(m(_) == 1L), s"left triangle: $m")
    assert(Seq(4L, 5L, 6L).forall(m(_) == 3L), s"right triangle: $m")
    // one-directional input is symmetrized: reversed edges, same result
    val rev = Graph.labelPropagation(
      e.select(col("dst").as("src"), col("src").as("dst")),
      "src", "dst", rounds = 4).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("community")).toMap
    assert(rev == m)
  }

  test("emd1d: hand Wasserstein-1, zero on identical samples") {
    // a={0,4}, b={2,6}: |F gaps| 0.5·2 + 0·2 + 0.5·2 = 2 (each point
    // shifts by 2)
    val a = Seq(0L, 4L).toDF("v")
    val b = Seq(2L, 6L).toDF("v")
    val r = Profiling.emd1d(a, b, "v").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("emd") == 2.0)
    val same = Profiling.emd1d(a, a, "v").head()
    assert(same.getAs[Double]("emd") == 0.0)
    // asymmetric sizes: a={0}, b={10,10} -> EMD = 10
    val r2 = Profiling.emd1d(Seq(0L).toDF("v"),
      Seq(10L, 10L).toDF("v"), "v").head()
    assert(r2.getAs[Double]("emd") == 10.0)
  }

  test("jsDivergence: ln 2 on disjoint vocab, 0 on identical corpora") {
    val disjoint = Seq((1L, "a", "x x"), (2L, "b", "y y"))
      .toDF("doc_id", "source", "text")
    val d = TextAnalysis.jsDivergence(disjoint).head()
    assert(d.getAs[String]("corpus_a") == "a")
    assert(d.getAs[String]("corpus_b") == "b")
    assert(d.getAs[Double]("jsd") == 0.693147, s"got ${d.getAs[Double]("jsd")}")
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("doc_id", "source", "text")
    assert(TextAnalysis.jsDivergence(same).head().getAs[Double]("jsd") == 0.0)
    // 3 corpora -> 3 unordered pairs
    val tri = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x y"))
      .toDF("doc_id", "source", "text")
    assert(TextAnalysis.jsDivergence(tri).count() == 3L)
  }

  test("isotonicCalibration: PAV pools the decreasing middle bins") {
    // scores 0..3 with bins=4 map bin = score; per-bin positive rates
    // [0.1, 0.3, 0.2, 0.4] -> isotonic fit [0.1, 0.25, 0.25, 0.4]
    val rows = Seq((0, 1), (1, 3), (2, 2), (3, 4)).flatMap {
      case (s, pos) => (0 until 10).map(i => (s.toLong, i < pos))
    }
    val r = Eval.isotonicCalibration(rows.toDF("s", "y"), "s", "y",
      bins = 4).orderBy("bin").collect()
    assert(r.map(_.getAs[Double]("frac_pos")).toSeq ==
      Seq(0.1, 0.3, 0.2, 0.4))
    assert(r.map(_.getAs[Double]("fitted")).toSeq ==
      Seq(0.1, 0.25, 0.25, 0.4))
    // already-monotone data is untouched
    val mono = Seq((0, 1), (1, 2), (2, 5), (3, 9)).flatMap {
      case (s, pos) => (0 until 10).map(i => (s.toLong, i < pos))
    }
    val rm = Eval.isotonicCalibration(mono.toDF("s", "y"), "s", "y",
      bins = 4).orderBy("bin").collect()
    assert(rm.map(_.getAs[Double]("fitted")).toSeq ==
      rm.map(_.getAs[Double]("frac_pos")).toSeq)
  }

  test("effectSize: hand d/g/delta on equal-variance arms") {
    import graft.operators.Normalize
    // a={10,12,14} (mean 12, var 4), b={8,10,12} (mean 10, var 4):
    // pooled var 4 -> d = 1; J = 1 - 3/15 = 0.8 -> g = 0.8; glass = 1
    val df = Seq(("k", true, 10L), ("k", true, 12L), ("k", true, 14L),
      ("k", false, 8L), ("k", false, 10L), ("k", false, 12L))
      .toDF("k", "arm", "v")
    val r = Normalize.effectSize(df, "k", "arm", "v").head()
    assert(r.getAs[Double]("cohens_d") == 1.0)
    assert(r.getAs[Double]("hedges_g") == 0.8)
    assert(r.getAs[Double]("glass_delta") == 1.0)
    // singleton arm -> NULL everywhere (guards, not DIVIDE_BY_ZERO)
    val tiny = Seq(("k", true, 5L), ("k", false, 1L), ("k", false, 3L))
      .toDF("k", "arm", "v")
    val rt = Normalize.effectSize(tiny, "k", "arm", "v").head()
    assert(rt.isNullAt(rt.fieldIndex("cohens_d")))
    assert(rt.isNullAt(rt.fieldIndex("hedges_g")))
    assert(!rt.isNullAt(rt.fieldIndex("glass_delta")),
      "control arm has 2 rows: Glass delta is still defined")
  }

  test("gumbelFit: method-of-moments params on hand block maxima") {
    // blocks max {10,20,30}: mean 20, s 10 -> beta = 10*sqrt(6)/pi,
    // mu = 20 - gamma*beta, rl100 = mu - beta*ln(-ln .99)
    val df = Seq(("k", 1L, 10L), ("k", 1L, 7L), ("k", 2L, 20L),
      ("k", 3L, 30L), ("k", 3L, 4L)).toDF("k", "day", "v")
    val r = TimeSeries.gumbelFit(df, "k", "day", "v").head()
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(r.getAs[Double]("mean_max") == 20.0)
    val beta = 10.0 * math.sqrt(6.0) / math.Pi
    val mu = 20.0 - 0.5772156649015329 * beta
    val rl = mu - beta * math.log(-math.log(0.99))
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-6)
    assert(math.abs(r.getAs[Double]("mu") - mu) < 1e-6)
    assert(math.abs(r.getAs[Double]("return_level_100") - rl) < 1e-6)
    // single block -> NULL fit
    val one = Seq(("k", 1L, 10L)).toDF("k", "day", "v")
    val ro = TimeSeries.gumbelFit(one, "k", "day", "v").head()
    assert(ro.isNullAt(ro.fieldIndex("beta")))
  }

  test("pacf: matches an independent Durbin-Levinson replay on the rhos") {
    // fixed pseudo-series with real autocorrelation structure
    val rows = (0L until 40L).map(t =>
      ("k", t, (t % 7L) * 100L + (t % 3L) * 31L))
    val df = rows.toDF("k", "day", "v")
    val rho = (1 to 5).map(k =>
      TimeSeries.autocorr(df, "k", "day", "v", k).head()
        .getAs[Double]("acf")).toArray
    // replay Durbin-Levinson in plain Scala on the same rounded rhos
    var phi = Array(rho(0))
    val exp = Array.newBuilder[Double]
    exp += rho(0)
    for (k <- 2 to 5) {
      val num = rho(k - 1) -
        (1 until k).map(j => phi(j - 1) * rho(k - 1 - j)).sum
      val den = 1.0 - (1 until k).map(j => phi(j - 1) * rho(j - 1)).sum
      val pkk = num / den
      phi = (1 until k).map(j => phi(j - 1) - pkk * phi(k - 1 - j)).toArray :+ pkk
      exp += pkk
    }
    val got = TimeSeries.pacf(df, "k", "day", "v").head()
    val expected = exp.result()
    (1 to 5).foreach { k =>
      assert(math.abs(got.getAs[Double](s"pacf_$k") - expected(k - 1)) < 2e-6,
        s"lag $k: got ${got.getAs[Double](s"pacf_$k")} want ${expected(k - 1)}")
    }
    // constant series: NULL rhos -> NULL pacf at every lag
    val const = (0L until 10L).map(t => ("c", t, 5L)).toDF("k", "day", "v")
    val rc = TimeSeries.pacf(const, "k", "day", "v").head()
    (1 to 5).foreach(k => assert(rc.isNullAt(rc.fieldIndex(s"pacf_$k"))))
  }

  test("pettitt: hand level shift K=9 at t=3, constant series p=1") {
    // {1,1,1,5,5,5}: U_t = cum(2r) - t*7 = {-3,-6,-9,-6,-3} -> K=9, t=3
    val df = (1L to 6L).map(t => ("k", t, if (t <= 3) 1L else 5L))
      .toDF("k", "day", "v")
    val r = TimeSeries.pettitt(df, "k", "day", "v").head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("k_stat") == 9L)
    assert(r.getAs[Long]("t_change") == 3L)
    val p = math.min(1.0, 2 * math.exp(-6.0 * 81 / (216.0 + 36.0)))
    assert(math.abs(r.getAs[Double]("p") - p) < 1e-6)
    assert(!r.getAs[Boolean]("significant"))
    // constant series: all U_t = 0 -> K=0, p clamps to 1, first t wins
    val const = (1L to 6L).map(t => ("k", t, 7L)).toDF("k", "day", "v")
    val rc = TimeSeries.pettitt(const, "k", "day", "v").head()
    assert(rc.getAs[Long]("k_stat") == 0L)
    assert(rc.getAs[Long]("t_change") == 1L)
    assert(rc.getAs[Double]("p") == 1.0)
    // a LONG clean shift is significant: 15+15 at distance
    val big = (1L to 30L).map(t => ("k", t, if (t <= 15) 1L else 9L))
      .toDF("k", "day", "v")
    val rb = TimeSeries.pettitt(big, "k", "day", "v").head()
    assert(rb.getAs[Boolean]("significant"))
    assert(rb.getAs[Long]("t_change") == 15L)
  }

  test("ccf: lag-shifted copy peaks at exactly that lag, both signs work") {
    // y_t = x_{t-2}: ccf at lag +2 (x leads y by 2) must be 1.0
    val xs = (0L until 30L).map(t => (t, (t % 7L) * 10L + (t % 3L)))
    val rows = xs.map { case (t, x) =>
      val y = if (t >= 2) xs((t - 2).toInt)._2 else 0L
      ("k", t, x, y)
    }.filter(_._2 >= 2)
    val df = rows.toDF("k", "day", "x", "y")
    val m = TimeSeries.ccf(df, "k", "day", "x", "y", maxLag = 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ccf")).toMap
    assert(m.size == 7, s"lags -3..3: $m")
    assert(m(2L) == 1.0, s"peak at +2: $m")
    assert(m(0L) < 1.0 && m(-2L) < 1.0)
    // pair counts shrink with |lag|
    val ns = TimeSeries.ccf(df, "k", "day", "x", "y", maxLag = 3).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n")).toMap
    assert(ns(3L) == ns(0L) - 3 && ns(-3L) == ns(0L) - 3)
  }

  test("cochranQ: textbook 3-rule table Q = 4.666667, uniform items NULL") {
    import graft.operators.Profiling
    // G = {4,3,1}, L = {2,2,1,3}: Q = 2*(3*26 - 64)/(24 - 18) = 14/3
    val rows = Seq(
      (1L, "a", true), (1L, "b", true), (1L, "c", false),
      (2L, "a", true), (2L, "b", true), (2L, "c", false),
      (3L, "a", true), (3L, "b", false), (3L, "c", false),
      (4L, "a", true), (4L, "b", true), (4L, "c", true))
      .toDF("item", "rule", "ok")
    val r = Profiling.cochranQ(rows, "item", "rule", "ok").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Double]("q") == 4.666667)
    assert(r.getAs[Long]("df") == 2L)
    assert(!r.getAs[Boolean]("significant"))
    // all-success items only: denominator k*N - sum(L^2) = 0 -> NULL
    val uni = Seq((1L, "a", true), (1L, "b", true),
      (2L, "a", true), (2L, "b", true)).toDF("item", "rule", "ok")
    val ru = Profiling.cochranQ(uni, "item", "rule", "ok").head()
    assert(ru.isNullAt(ru.fieldIndex("q")))
  }

  test("friedman: classic tie-free chi2 = 4, incomplete items excluded") {
    import graft.operators.Profiling
    // two items, both ranking a<b<c: R2 = {4,8,12}, A4=112, C4=96 ->
    // chi2 = 2*(224-192)/16 = 4.0 (matches 12/nk(k+1)*SumR^2 - 3n(k+1))
    val base = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "a", 5L), (2L, "b", 6L), (2L, "c", 7L))
    val r = Profiling.friedman(base.toDF("item", "t", "v"),
      "item", "t", "v").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Double]("chi2") == 4.0)
    assert(r.getAs[Long]("df") == 2L)
    assert(!r.getAs[Boolean]("significant"))
    // an item missing treatment c must be excluded, leaving chi2 as-is
    val withPartial = base ++ Seq((3L, "a", 99L), (3L, "b", 1L))
    val rp = Profiling.friedman(withPartial.toDF("item", "t", "v"),
      "item", "t", "v").head()
    assert(rp.getAs[Long]("n_items") == 2L)
    assert(rp.getAs[Double]("chi2") == 4.0)
    // every item internally tied -> A4 = C4 -> NULL
    val tied = Seq((1L, "a", 5L), (1L, "b", 5L), (1L, "c", 5L))
    val rt = Profiling.friedman(tied.toDF("item", "t", "v"),
      "item", "t", "v").head()
    assert(rt.isNullAt(rt.fieldIndex("chi2")))
  }

  test("hurst: ramp is persistent (H near 1), alternation gives H = 0") {
    // linear ramp: every m-block is 1..m shifted — replay R/S in Scala
    val ramp = (1L to 64L).map(t => ("r", t, t)).toDF("k", "t", "v")
    def rampRs(m: Int): Double = {
      val z = (1 to m).map(t => m * (t.toLong * (t + 1) / 2) -
        t.toLong * (m.toLong * (m + 1) / 2))
      val r = (z.max - z.min).toDouble
      val s2 = ((1 to m).map(t => t.toLong * t).sum.toDouble -
        (m.toLong * (m + 1) / 2).toDouble *
          ((m.toLong * (m + 1) / 2).toDouble / m)) / m
      math.rint(r / (m * math.sqrt(s2)) * 1e6) / 1e6
    }
    val r = TimeSeries.hurst(ramp, "k", "t", "v").head()
    assert(r.getAs[Long]("nb_8") == 8L && r.getAs[Long]("nb_32") == 2L)
    assert(math.abs(r.getAs[Double]("rs_8") - rampRs(8)) < 1e-6)
    assert(math.abs(r.getAs[Double]("rs_32") - rampRs(32)) < 1e-6)
    val h = (math.log(rampRs(32)) - math.log(rampRs(8))) /
      math.log(2.0) / 2
    assert(math.abs(r.getAs[Double]("hurst") - h) < 1e-5)
    assert(r.getAs[Double]("hurst") > 0.9, s"ramp H=${r.getAs[Double]("hurst")}")
    // strict alternation: R = S in every block -> R/S = 1 -> H = 0
    val alt = (1L to 64L).map(t => ("a", t, if (t % 2 == 0) 10L else 0L))
      .toDF("k", "t", "v")
    val ra = TimeSeries.hurst(alt, "k", "t", "v").head()
    assert(ra.getAs[Double]("rs_8") == 1.0)
    assert(ra.getAs[Double]("rs_32") == 1.0)
    assert(ra.getAs[Double]("hurst") == 0.0)
    // short series (< 32 points) have no 32-block: key drops out
    val short = (1L to 20L).map(t => ("s", t, t)).toDF("k", "t", "v")
    assert(TimeSeries.hurst(short, "k", "t", "v").count() == 0L)
  }

  test("cadenceProfile: metronomic gaps flag, bursty and sparse do not") {
    import graft.operators.Sessionize
    val rows =
      (0 until 7).map(i => (1L, i * 1000L, i.toLong)) ++ // exact 1s ticks
      Seq((2L, 0L), (2L, 100L), (2L, 10100L), (2L, 10300L), (2L, 30300L),
        (2L, 30400L)).zipWithIndex.map { case ((u, ms), i) => (u, ms, i.toLong) } ++
      (0 until 3).map(i => (3L, i * 500L, i.toLong)) // regular but < 5 gaps
    val df = rows.toDF("user_id", "ms", "event_id")
      .withColumn("ts", timestamp_millis(col("ms")))
    val m = Sessionize.cadenceProfile(df, "user_id").collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(m(1L).getAs[Double]("cv") == 0.0)
    assert(m(1L).getAs[Boolean]("is_regular"))
    assert(m(2L).getAs[Double]("cv") > 1.0)
    assert(!m(2L).getAs[Boolean]("is_regular"))
    assert(m(3L).getAs[Double]("cv") == 0.0)
    assert(!m(3L).getAs[Boolean]("is_regular"), "needs >= 5 gaps to flag")
  }

  test("diversityIndex: degenerate and uniform corpora hit exact bounds") {
    val docs = Seq((1L, "mono", "x x x x"), (2L, "uni", "a b c d"))
      .toDF("doc_id", "source", "text")
    val m = TextAnalysis.diversityIndex(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val mono = m("mono")
    assert(mono.getAs[Long]("vocab") == 1L)
    assert(mono.getAs[Double]("simpson") == 1.0)
    assert(mono.getAs[Double]("shannon_nats") == 0.0)
    assert(mono.isNullAt(mono.fieldIndex("evenness")))
    val uni = m("uni")
    assert(uni.getAs[Double]("simpson") == 0.0)
    assert(uni.isNullAt(uni.fieldIndex("inv_simpson")))
    assert(math.abs(uni.getAs[Double]("shannon_nats") - math.log(4)) < 1e-6)
    assert(uni.getAs[Double]("evenness") == 1.0)
  }

  test("fanoFactor: dense-grid zeros counted, regular=-1, bursty replay") {
    // one event per consecutive bucket: sigma = 0 -> F=0, B=-1
    val reg = (0L until 4L).map(b => ("r", b)).toDF("k", "b")
    val rr = TimeSeries.fanoFactor(reg, "k", "b").head()
    assert(rr.getAs[Long]("n_buckets") == 4L)
    assert(rr.getAs[Double]("fano") == 0.0)
    assert(rr.getAs[Double]("burstiness") == -1.0)
    // 4 events at bucket 0, 1 at bucket 4: B=5 (3 EMPTY buckets count)
    val bur = (Seq.fill(4)(("b", 0L)) :+ (("b", 4L))).toDF("k", "b")
    val rb = TimeSeries.fanoFactor(bur, "k", "b").head()
    assert(rb.getAs[Long]("n_buckets") == 5L)
    val mu = 1.0; val s2 = 17.0 / 5 - 1.0
    assert(math.abs(rb.getAs[Double]("fano") - s2 / mu) < 1e-6)
    assert(math.abs(rb.getAs[Double]("burstiness") -
      (math.sqrt(s2) - mu) / (math.sqrt(s2) + mu)) < 1e-6)
  }

  test("richClub: clique core with pendant spokes, empty clubs NULL") {
    // K4 on {1,2,3,4} (deg >= 3 each) + 2 spokes per core vertex
    // (core deg = 5, spokes deg = 1): at k=2 and k=4 the club is the K4
    // with phi = 1.0; at k=8 nobody qualifies -> 0 members, NULL phi
    val core = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val spokes = (1L to 4L).flatMap(v =>
      Seq((v, 100 + v * 10), (v, 101 + v * 10)))
    val e = (core ++ spokes).toDF("src", "dst")
    val m = Graph.richClub(e, "src", "dst").collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_k"), r.getAs[Long]("e_k"),
          Option(r.get(r.fieldIndex("phi"))))).toMap
    assert(m(2L) == ((4L, 6L, Some(1.0))))
    assert(m(4L) == ((4L, 6L, Some(1.0))))
    assert(m(8L) == ((0L, 0L, None)))
  }

  test("rakeKeyphrases: stopword islands, deg/freq scores, stable top-k") {
    // doc 1 phrases: "deep learning", "deep networks", "learning rate"
    // (every word deg/freq = 2 -> phrase score 4); doc 2 is one 3-word
    // phrase of singleton words (deg 3 each -> score 9, rank 1)
    val docs = Seq(
      (1L, "s", "deep learning of deep networks and the learning rate"),
      (2L, "s", "gradient descent optimizer"))
      .toDF("doc_id", "source", "text")
    val rows = TextAnalysis.rakeKeyphrases(docs).orderBy("rnk").collect()
    assert(rows.head.getAs[String]("phrase") == "gradient descent optimizer")
    assert(rows.head.getAs[Double]("score") == 9.0)
    assert(rows.head.getAs[Long]("n_words") == 3L)
    assert(rows.map(_.getAs[String]("phrase")).toSeq == Seq(
      "gradient descent optimizer", "deep learning", "deep networks",
      "learning rate"), "score desc then phrase asc")
    assert(rows.tail.forall(_.getAs[Double]("score") == 4.0))
    // repeated phrase counts occurrences, score unchanged
    val rep = docs.union(Seq((3L, "s", "deep learning and deep learning"))
      .toDF("doc_id", "source", "text"))
    val m = TextAnalysis.rakeKeyphrases(rep).collect()
      .map(r => r.getAs[String]("phrase") -> r.getAs[Long]("n_occ")).toMap
    assert(m("deep learning") == 3L)
  }

  test("youdenThreshold: perfect separation cuts at the boundary score") {
    // scores {1F, 2F, 3T, 4T}: 'positive if s > 2' gives TPR=1 FPR=0
    val df = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    val r = Eval.youdenThreshold(df, "s", "y").head()
    assert(r.getAs[Long]("threshold") == 2L)
    assert(r.getAs[Double]("tpr") == 1.0)
    assert(r.getAs[Double]("fpr") == 0.0)
    assert(r.getAs[Double]("j") == 1.0)
    // tie on J -> smallest threshold wins
    val tie = Seq((1L, false), (2L, true)).toDF("s", "y")
    assert(Eval.youdenThreshold(tie, "s", "y").head()
      .getAs[Long]("threshold") == 1L)
  }

  test("ece: perfectly position-calibrated bins score exactly 0") {
    // scores 0..9, bins=10 -> bin = score; n=9 rows per score with
    // n_pos = score: acc = s/9 = conf = (s-0)/(9-0) -> every term 0
    val rows = (0 until 10).flatMap(s =>
      (0 until 9).map(i => (s.toLong, i < s)))
    val r = Eval.ece(rows.toDF("s", "y"), "s", "y").head()
    assert(r.getAs[Long]("n_bins") == 10L)
    assert(r.getAs[Double]("ece") == 0.0)
    // constant score (degenerate span): conf pinned to 0, ece = pos rate
    val const = Seq((5L, true), (5L, true), (5L, false), (5L, false))
      .toDF("s", "y")
    assert(Eval.ece(const, "s", "y").head().getAs[Double]("ece") == 0.5)
  }

  test("plattScale: separable-ish data fits a rising sigmoid, beats chance") {
    // labels follow sign(score) with two flips — a should come out
    // clearly positive and the fit should beat the ln 2 chance floor
    val rows = Seq(
      (-30L, false), (-20L, false), (-10L, false), (-5L, true),
      (5L, false), (10L, true), (20L, true), (30L, true),
      (-25L, false), (25L, true), (-15L, false), (15L, true))
    val r = Eval.plattScale(rows.toDF("s", "y"), "s", "y").head()
    assert(r.getAs[Double]("a") > 0.5, s"a=${r.getAs[Double]("a")}")
    assert(r.getAs[Double]("logloss") < 0.693147,
      s"logloss=${r.getAs[Double]("logloss")}")
    // bit-identical under adversarial repartitioning (micro-quantized
    // Newton sums are order-independent)
    val shuf = Eval.plattScale(
      rows.toDF("s", "y").repartition(13, col("y")), "s", "y").head()
    assert(shuf.getAs[Double]("a") == r.getAs[Double]("a"))
    assert(shuf.getAs[Double]("b") == r.getAs[Double]("b"))
    assert(shuf.getAs[Double]("logloss") == r.getAs[Double]("logloss"))
    // constant score: no z rows -> empty fit (documented degenerate)
    val const = Seq((5L, true), (5L, false)).toDF("s", "y")
    assert(Eval.plattScale(const, "s", "y").count() == 0L)
  }

  test("mahalanobis2d: ridge-breaker tops the list, singular cov empty") {
    import graft.operators.Profiling
    // tight x=y ridge plus one off-ridge point: (10,0) must rank first
    // even though x=10 is within the marginal range of neither axis alone
    val df = Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 2L, 2L), (4L, 3L, 3L),
      (5L, 4L, 4L), (6L, 12L, 11L), (7L, 10L, 0L)).toDF("id", "x", "y")
    val rows = Profiling.mahalanobis2d(df, "id", "x", "y", topK = 3)
      .orderBy("rnk").collect()
    assert(rows.head.getAs[Long]("id") == 7L, rows.mkString(","))
    assert(rows.head.getAs[Double]("d2") >
      rows(1).getAs[Double]("d2"))
    // all points identical -> singular covariance -> empty result
    val flat = Seq((1L, 5L, 5L), (2L, 5L, 5L)).toDF("id", "x", "y")
    assert(Profiling.mahalanobis2d(flat, "id", "x", "y").count() == 0L)
  }

  test("partialCorr: common-cause correlation vanishes when controlled") {
    import graft.operators.Profiling
    // x = z + ax, y = z + ay with small independent wiggles: r_xy is
    // large through z; the partial strips it toward 0
    val rows = (0L until 60L).map { i =>
      val z = i * 10
      (z + (i * 7 % 13), z + (i * 11 % 17), z)
    }
    val r = Profiling.partialCorr(rows.toDF("x", "y", "z"), "x", "y", "z")
      .head()
    assert(r.getAs[Double]("r_xy") > 0.99)
    assert(math.abs(r.getAs[Double]("r_xy_z")) < 0.35,
      s"partial=${r.getAs[Double]("r_xy_z")}")
    // replay the shared formula on the rounded r's
    val (rxy, rxz, ryz) = (r.getAs[Double]("r_xy"),
      r.getAs[Double]("r_xz"), r.getAs[Double]("r_yz"))
    val exp = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(r.getAs[Double]("r_xy_z") - exp) < 1e-6)
  }

  test("trimmedMean: tie blocks split exactly at the cut positions") {
    // {0,0,0,1,2,3} with 20% trim: k=1, keep positions 2..5 ->
    // values (0,0,1,2) -> mean 0.75
    val df = Seq(("g", 0L), ("g", 0L), ("g", 0L), ("g", 1L), ("g", 2L),
      ("g", 3L)).toDF("grp", "v")
    val r = Eval.trimmedMean(df, "grp", "v", trimPct = 20).head()
    assert(r.getAs[String]("grp") == "g")
    assert(r.getAs[Long]("n_kept") == 4L)
    assert(r.getAs[Double]("trimmed_mean") == 0.75)
    // outlier clipped: mean of 1..9 after dropping 0 and 1000 (k=1)
    val out = ((0L to 9L) :+ 1000L).map(v => ("h", v)).toDF("grp", "v")
    val ro = Eval.trimmedMean(out, "grp", "v", trimPct = 10).head()
    assert(ro.getAs[Double]("trimmed_mean") == 5.0)
  }

  test("dunnTest: separated pair flags, overlapping pair does not") {
    import graft.operators.Profiling
    // a = 1..10, b = 101..110 (fully separated), c interleaves a
    val rows = (1L to 10L).map(v => ("a", v)) ++
      (101L to 110L).map(v => ("b", v)) ++
      (2L to 11L).map(v => ("c", v))
    val m = Profiling.dunnTest(rows.toDF("g", "v"), "g", "v").collect()
      .map(r => (r.getAs[String]("grp_a"), r.getAs[String]("grp_b")) -> r)
      .toMap
    assert(m.size == 3)
    val ab = m(("a", "b"))
    assert(ab.getAs[Double]("z") < 0 && ab.getAs[Boolean]("significant"),
      s"a<b strongly: z=${ab.getAs[Double]("z")} p=${ab.getAs[Double]("p")}")
    val ac = m(("a", "c"))
    assert(!ac.getAs[Boolean]("significant"),
      s"a~c overlap: p=${ac.getAs[Double]("p")}")
    assert(m(("b", "c")).getAs[Boolean]("significant"))
  }

  test("ebShrink: extremes pull toward the prior, thick keys move less") {
    // 20 keys at rate ~0.5 with n=50 anchor the prior; one 1/1 hero and
    // one 0/1 zero must shrink hard toward ~0.5
    val anchor = (1L to 20L).map(k => (k, 25L + k % 3 - 1, 50L))
    val rows = anchor ++ Seq((100L, 1L, 1L), (101L, 0L, 1L))
    val m = Eval.ebShrink(rows.toDF("k", "x", "n"), "k", "x", "n")
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    val hero = m(100L); val zero = m(101L)
    assert(hero.getAs[Double]("raw_rate") == 1.0)
    val hs = hero.getAs[Double]("shrunk_rate")
    val zs = zero.getAs[Double]("shrunk_rate")
    assert(hs < 0.7 && hs > 0.5, s"hero shrunk=$hs")
    assert(zs > 0.3 && zs < 0.5, s"zero shrunk=$zs")
    // an anchor key barely moves
    val a = m(1L)
    assert(math.abs(a.getAs[Double]("shrunk_rate") -
      a.getAs[Double]("raw_rate")) < 0.05)
    // identical rates everywhere -> zero variance -> NULL prior
    val flat = (1L to 5L).map(k => (k, 1L, 2L))
    val rf = Eval.ebShrink(flat.toDF("k", "x", "n"), "k", "x", "n").head()
    assert(rf.isNullAt(rf.fieldIndex("shrunk_rate")))
  }

  test("coxPH: planted covariate effect recovers a positive hazard ratio") {
    import graft.operators.Survival
    // high-x subjects fail early, low-x survive long (half censored):
    // beta per SD must come out clearly positive, HR > 1
    val rows = (1L to 20L).map { i =>
      val x = i * 10
      if (i > 10) (21L - i, true, x) // x=110..200 fail at t=1..10
      else (30L + i, i % 2 == 0, x)  // x=10..100 late, half censored
    }
    val df = rows.toDF("t", "ev", "x")
    val r = Survival.coxPH(df, "t", "ev", "x").head()
    assert(r.getAs[Long]("n_fit") == 20L)
    val b = r.getAs[Double]("beta_per_sd")
    assert(b > 0.5, s"beta=$b")
    assert(r.getAs[Double]("hazard_ratio_per_sd") > 1.6)
    // exact determinism under repartitioning (micro-quantized sums)
    val shuf = Survival.coxPH(df.repartition(11, col("x")), "t", "ev", "x")
      .head()
    assert(shuf.getAs[Double]("beta_per_sd") == b)
    // constant covariate -> no z rows -> empty fit
    val const = Seq((1L, true, 5L), (2L, false, 5L)).toDF("t", "ev", "x")
    assert(Survival.coxPH(const, "t", "ev", "x").count() == 0L)
  }

  test("negbinFit: hand MoM on the bursty grid, Poisson-or-less is NULL") {
    // 4 events at bucket 0, 1 at bucket 4: mu=1, var=2.4 ->
    // r = 1/1.4, p = 1/2.4
    val bur = (Seq.fill(4)(("b", 0L)) :+ (("b", 4L))).toDF("k", "b")
    val r = TimeSeries.negbinFit(bur, "k", "b").head()
    assert(math.abs(r.getAs[Double]("nb_r") - 1.0 / 1.4) < 1e-6)
    assert(math.abs(r.getAs[Double]("nb_p") - 1.0 / 2.4) < 1e-6)
    // one event per bucket: var=0 < mean -> NULL (not overdispersed)
    val reg = (0L until 4L).map(b => ("r", b)).toDF("k", "b")
    val rr = TimeSeries.negbinFit(reg, "k", "b").head()
    assert(rr.isNullAt(rr.fieldIndex("nb_r")))
    assert(rr.isNullAt(rr.fieldIndex("nb_p")))
  }

  test("lifeTable: half-censoring exposure and running survival by hand") {
    import graft.operators.Survival
    // width 2; subjects (t, ev): interval 0 {0T, 1C}, 1 {2T, 3T}, 2 {5C}
    // q0 = 2/9, q1 = 2/3, q2 = 0 -> S = 7/9, 7/27, 7/27
    val df = Seq(("a", 0L, true), ("a", 1L, false), ("a", 2L, true),
      ("a", 3L, true), ("a", 5L, false)).toDF("g", "t", "ev")
    val rows = Survival.lifeTable(df, "g", "t", "ev", width = 2L)
      .orderBy("interval_start").collect()
    assert(rows.map(_.getAs[Long]("interval_start")).toSeq ==
      Seq(0L, 2L, 4L))
    assert(rows.map(_.getAs[Long]("n_enter")).toSeq == Seq(5L, 3L, 1L))
    assert(rows.map(_.getAs[Double]("q")).toSeq ==
      Seq(0.222222, 0.666667, 0.0))
    assert(rows.map(_.getAs[Double]("survival")).toSeq ==
      Seq(0.777778, 0.259259, 0.259259))
    // full extinction pins survival to exact 0 (no half-censor rescue)
    val ext = Seq(("b", 0L, true), ("b", 0L, true)).toDF("g", "t", "ev")
    assert(Survival.lifeTable(ext, "g", "t", "ev", 2L).head()
      .getAs[Double]("survival") == 0.0)
  }

  test("permTest: separated arms measured, all-equal values give p = 1") {
    import graft.operators.Sampling
    val sep = Seq((1L, true, 100L), (2L, true, 100L), (3L, true, 100L),
      (4L, false, 0L), (5L, false, 0L), (6L, false, 0L))
      .toDF("id", "arm", "v")
    val r = Sampling.permTest(sep, "id", "arm", "v").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("obs_delta") == 100.0)
    assert(r.getAs[Double]("p") < 0.5, s"p=${r.getAs[Double]("p")}")
    // deterministic under repartitioning (hash arms, exact sums)
    val shuf = Sampling.permTest(sep.repartition(7, col("v")),
      "id", "arm", "v").head()
    assert(shuf.getAs[Double]("p") == r.getAs[Double]("p"))
    // identical values: every replicate ties the observed 0 -> p = 1
    val flat = (1L to 10L).map(i => (i, i % 2 == 0, 7L))
      .toDF("id", "arm", "v")
    val rf = Sampling.permTest(flat, "id", "arm", "v").head()
    assert(rf.getAs[Double]("obs_delta") == 0.0)
    assert(rf.getAs[Double]("p") == 1.0)
    assert(!rf.getAs[Boolean]("significant"))
  }

  test("jarqueBera: binomial passes, uniform fails on kurtosis") {
    import graft.operators.Normalize
    // binomial(10, .5) replicated by pmf counts: skew 0,
    // excess kurtosis (1-6pq)/(npq) = -0.2 -> JB = 1024/6*0.01 ≈ 1.7
    val binom = Seq(1, 10, 45, 120, 210, 252, 210, 120, 45, 10, 1)
      .zipWithIndex.flatMap { case (c, v) =>
        Seq.fill(c)(("b", v.toLong)) }
    val rb = Normalize.jarqueBera(binom.toDF("k", "v"), "k", "v").head()
    assert(math.abs(rb.getAs[Double]("skewness")) < 1e-3)
    assert(math.abs(rb.getAs[Double]("kurtosis_excess") + 0.2) < 1e-3)
    assert(!rb.getAs[Boolean]("significant"),
      s"jb=${rb.getAs[Double]("jb")}")
    // uniform 1..101: kurtosis -1.2 -> JB ≈ 101/6*0.36 ≈ 6.06 > 5.99
    val unif = (1L to 101L).map(v => ("u", v))
    val ru = Normalize.jarqueBera(unif.toDF("k", "v"), "k", "v").head()
    assert(math.abs(ru.getAs[Double]("skewness")) < 1e-3)
    assert(ru.getAs[Boolean]("significant"),
      s"jb=${ru.getAs[Double]("jb")}")
    // constant -> NULL
    val const = Seq(("c", 5L), ("c", 5L), ("c", 5L)).toDF("k", "v")
    val rc = Normalize.jarqueBera(const, "k", "v").head()
    assert(rc.isNullAt(rc.fieldIndex("jb")))
  }

  test("bartlett: equal variances pass, a 10x-sd group flags") {
    import graft.operators.Normalize
    def grp(name: String, scale: Long) =
      (1L to 40L).map(i => (name, 1000L + scale * ((i % 9) - 4)))
    val eq = (grp("a", 5L) ++ grp("b", 5L) ++ grp("c", 5L))
      .toDF("g", "v")
    val re = Normalize.bartlett(eq, "g", "v").head()
    assert(re.getAs[Long]("k") == 3L)
    assert(re.getAs[Double]("bartlett_stat") < 0.001,
      s"B=${re.getAs[Double]("bartlett_stat")}")
    assert(!re.getAs[Boolean]("significant"))
    val uneq = (grp("a", 5L) ++ grp("b", 50L) ++ grp("c", 5L))
      .toDF("g", "v")
    val ru = Normalize.bartlett(uneq, "g", "v").head()
    assert(ru.getAs[Boolean]("significant"),
      s"B=${ru.getAs[Double]("bartlett_stat")}")
    // a constant group contributes no variance term and is dropped
    val withConst = (grp("a", 5L) ++ grp("b", 5L) ++
      (1L to 10L).map(i => ("z", 7L))).toDF("g", "v")
    assert(Normalize.bartlett(withConst, "g", "v").head()
      .getAs[Long]("k") == 2L)
  }

  test("imageAHash: bits match a direct tile-vs-image-mean replay") {
    import graft.operators.Multimodal
    val docs = Seq((3L, 40L), (17L, 25L), (40L, 33L))
      .toDF("doc_id", "n_chars")
    val media = Multimodal.synthesizeBmpTable(docs)
    val tiles = Multimodal.bmpTileMeans(media, 8).toDF().collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tile_x"),
        r.getAs[Long]("tile_y"), r.getAs[Long]("n_px"),
        r.getAs[Long]("sum_px")))
    val expected = tiles.groupBy(_._1).map { case (id, ts) =>
      val sTot = ts.map(_._5).sum; val nTot = ts.map(_._4).sum
      val bits = ts.sortBy(t => (t._3, t._2)).zipWithIndex.map {
        case ((_, _, _, n, s), k) =>
          if (s * nTot > sTot * n) 1L << k else 0L
      }
      id -> ((ts.length.toLong, bits.sum))
    }
    val got = Multimodal.imageAHash(media, 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bits"), r.getAs[Long]("ahash")))).toMap
    assert(got == expected, s"got=$got expected=$expected")
    // dHash needs >= 2 tile columns (doc 3 is 4px wide and drops out);
    // aHash still fingerprints it — the two hashes are complementary
    val d = Multimodal.imageDHash(media, 8).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(d.subsetOf(got.keySet) && !d.contains(3L) &&
      got.keySet.contains(3L))
  }

  test("rmst: hand area under the textbook KM curve, tau truncation") {
    import graft.operators.Survival
    // KM fixture {1e,2c,3e,4e,5c}: S = 1 on [0,1), 0.8 on [1,3),
    // 0.533333 on [3,4), 0.266667 on [4,tau)
    val df = Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, true),
      ("a", 4L, true), ("a", 5L, false)).toDF("g", "t", "ev")
    val r = Survival.rmst(df, "g", "t", "ev", tau = 10L).head()
    // 1 + 0.8*2 + 0.533333*1 + 0.266667*6 = 4.733335
    assert(math.abs(r.getAs[Double]("rmst") - 4.733335) < 1e-6,
      s"rmst=${r.getAs[Double]("rmst")}")
    // tau inside the curve truncates: tau=3 -> 1 + 0.8*2 = 2.6
    val r3 = Survival.rmst(df, "g", "t", "ev", tau = 3L).head()
    assert(r3.getAs[Double]("rmst") == 2.6)
  }

  test("brier: perfect, inverted, and constant forecasts") {
    // scores 0/1 spanning conf {0,1}: perfect labels -> 0; inverted -> 1
    val perfect = Seq((0L, false), (1L, true), (0L, false), (1L, true))
      .toDF("s", "y")
    val rp = Eval.brier(perfect, "s", "y").head()
    assert(rp.getAs[Double]("brier") == 0.0)
    assert(rp.getAs[Double]("brier_skill") == 1.0)
    val inverted = Seq((0L, true), (1L, false)).toDF("s", "y")
    assert(Eval.brier(inverted, "s", "y").head()
      .getAs[Double]("brier") == 1.0)
    // constant label: skill undefined
    val const = Seq((0L, true), (1L, true)).toDF("s", "y")
    val rc = Eval.brier(const, "s", "y").head()
    assert(rc.isNullAt(rc.fieldIndex("brier_skill")))
  }

  test("harrellC: perfect risk ordering = 1, anti-ordering = 0, guard") {
    import graft.operators.Survival
    // higher score fails earlier, all events observed: every comparable
    // pair concordant
    val good = Seq((1L, 1L, true, 40L), (2L, 2L, true, 30L),
      (3L, 3L, true, 20L), (4L, 4L, true, 10L)).toDF("id", "t", "ev", "sc")
    val rg = Survival.harrellC(good, "id", "t", "ev", "sc").head()
    assert(rg.getAs[Long]("comparable") == 6L)
    assert(rg.getAs[Double]("c_index") == 1.0)
    val bad = Seq((1L, 1L, true, 10L), (2L, 2L, true, 20L),
      (3L, 3L, true, 30L)).toDF("id", "t", "ev", "sc")
    assert(Survival.harrellC(bad, "id", "t", "ev", "sc").head()
      .getAs[Double]("c_index") == 0.0)
    // censored-first pairs are NOT comparable
    val cens = Seq((1L, 1L, false, 40L), (2L, 2L, true, 30L),
      (3L, 3L, false, 20L)).toDF("id", "t", "ev", "sc")
    assert(Survival.harrellC(cens, "id", "t", "ev", "sc").head()
      .getAs[Long]("comparable") == 1L)
    // the O(n^2) guard fails fast
    intercept[IllegalArgumentException] {
      Survival.harrellC(good, "id", "t", "ev", "sc", maxRows = 2L)
    }
  }

  test("prAuc: perfect ranking = 1, reversed collapses to prevalence") {
    // scores rank positives strictly above negatives
    val perfect = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("s", "y")
    val rp = Eval.prAuc(perfect, "s", "y").head()
    assert(rp.getAs[Double]("pr_auc") == 1.0)
    // reversed: positives at the bottom -> AP = sum over positives of
    // k/(rank_k): thresholds 1,2 give P = 2/4, 1/3 with dR = 1/2 each
    val rev = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("s", "y")
    val rr = Eval.prAuc(rev, "s", "y").head()
    val exp = 0.5 * (2.0 / 4) + 0.5 * (1.0 / 3)
    assert(math.abs(rr.getAs[Double]("pr_auc") - exp) < 2e-6,
      s"ap=${rr.getAs[Double]("pr_auc")} want $exp")
    // no positives -> NULL
    val none = Seq((1L, false), (2L, false)).toDF("s", "y")
    val rn = Eval.prAuc(none, "s", "y").head()
    assert(rn.isNullAt(rn.fieldIndex("pr_auc")))
  }

  test("effectiveSampleSize: equal weights = n, one dominant weight -> 1") {
    import graft.operators.Sampling
    val eq = (1L to 8L).map(i => ("a", i, 5L)).toDF("k", "id", "w")
    val re = Sampling.effectiveSampleSize(eq, "k", "w").head()
    assert(re.getAs[Double]("ess") == 8.0)
    assert(re.getAs[Double]("ess_ratio") == 1.0)
    val skew = (Seq(("b", 0L, 1000000L)) ++
      (1L to 9L).map(i => ("b", i, 1L))).toDF("k", "id", "w")
    val rs = Sampling.effectiveSampleSize(skew, "k", "w").head()
    assert(rs.getAs[Double]("ess") < 1.001, s"ess=${rs.getAs[Double]("ess")}")
  }

  test("ordinal association: gamma/Somers on monotone and tied data") {
    import graft.operators.Profiling
    val mono = (1L to 12L).map(i => (i, i * 2)).toDF("x", "y")
    val r = Profiling.kendallTau(mono, "x", "y")
      .withColumn("gamma", expr(Profiling.gammaSql))
      .withColumn("somers_d_yx", expr(Profiling.somersDyxSql))
      .withColumn("somers_d_xy", expr(Profiling.somersDxySql)).head()
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("somers_d_yx") == 1.0)
    // y collapses to 2 levels: gamma ignores ties, Somers D_yx pays
    // for pairs tied on y? no — D_yx divides by pairs untied on X
    val tied = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("x", "y")
    val rt = Profiling.kendallTau(tied, "x", "y")
      .withColumn("gamma", expr(Profiling.gammaSql))
      .withColumn("somers_d_yx", expr(Profiling.somersDyxSql)).head()
    // pairs: C = 4 (cross-level), ties_y = 2, D = 0 -> gamma 1,
    // D_yx = 4/6
    assert(rt.getAs[Double]("gamma") == 1.0)
    assert(rt.getAs[Double]("somers_d_yx") == 0.666667)
  }

  test("weightedKappa: perfect = 1, maximal spread penalized by distance") {
    import graft.operators.Profiling
    val perfect = (0L to 3L).map(i => (i, i)).toDF("a", "b")
    assert(Profiling.weightedKappa(perfect, "a", "b").head()
      .getAs[Double]("kappa_w") == 1.0)
    // swo = 8 over swe = 20 with n=4 -> 1 - 32/20 = -0.6
    val off = Seq((0L, 3L), (3L, 0L), (1L, 2L), (2L, 1L)).toDF("a", "b")
    assert(Profiling.weightedKappa(off, "a", "b").head()
      .getAs[Double]("kappa_w") == -0.6)
    // both raters constant: swe = 0 -> NULL
    val const = Seq((1L, 1L), (1L, 1L)).toDF("a", "b")
    val rc = Profiling.weightedKappa(const, "a", "b").head()
    assert(rc.isNullAt(rc.fieldIndex("kappa_w")))
  }

  test("pairwiseWelch: shifted pair flags, identical pair does not") {
    import graft.operators.Normalize
    def grp(name: String, base: Long) =
      (1L to 40L).map(i => (name, base + (i % 9)))
    val df = (grp("a", 100L) ++ grp("b", 100L) ++ grp("c", 200L))
      .toDF("g", "v")
    val m = Normalize.pairwiseWelch(df, "g", "v").collect()
      .map(r => (r.getAs[String]("grp_a"), r.getAs[String]("grp_b")) -> r)
      .toMap
    assert(m.size == 3)
    assert(m(("a", "b")).getAs[Double]("t") == 0.0)
    assert(!m(("a", "b")).getAs[Boolean]("significant"))
    assert(m(("a", "c")).getAs[Double]("t") < -10)
    assert(m(("a", "c")).getAs[Boolean]("significant"))
    assert(m(("b", "c")).getAs[Boolean]("significant"))
  }

  test("rollingCorr: lockstep = 1 after warmup, anti = -1, NULL early") {
    val rows = (1L to 20L).map(t => ("k", t, t * 3 + (t % 4), 0L))
      .map { case (k, t, x, _) => (k, t, x, x * 2 + 7) } // y = 2x+7
    val df = rows.toDF("k", "t", "x", "y")
    val m = TimeSeries.rollingCorr(df, "k", "t", "x", "y",
      window = 7, minPeriods = 5).collect()
      .map(r => r.getAs[Long]("t") ->
        Option(r.get(r.fieldIndex("corr")))).toMap
    assert(m(1L).isEmpty && m(4L).isEmpty, "below minPeriods -> NULL")
    assert(m(5L) == Some(1.0) && m(20L) == Some(1.0))
    val anti = (1L to 20L).map(t => ("k", t, t * 3 + (t % 4)))
      .map { case (k, t, x) => (k, t, x, 1000 - 2 * x) }
      .toDF("k", "t", "x", "y")
    val ma = TimeSeries.rollingCorr(anti, "k", "t", "x", "y",
      window = 7, minPeriods = 5).collect()
      .map(r => r.getAs[Long]("t") ->
        Option(r.get(r.fieldIndex("corr")))).toMap
    assert(ma(10L) == Some(-1.0))
  }

  test("hapaxProfile: tail counts by hand") {
    // tokens: a a a b b c d -> vocab 4, hapax {c,d}=2, dis {b}=1
    val docs = Seq((1L, "s", "a a a b"), (2L, "s", "b c d"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.hapaxProfile(docs).head()
    assert(r.getAs[Long]("vocab") == 4L)
    assert(r.getAs[Long]("n_hapax") == 2L)
    assert(r.getAs[Long]("n_dis") == 1L)
    assert(r.getAs[Double]("hapax_ratio") == 0.5)
  }
}
