package graft

import graft.operators.{Dedup, Profiling}
import org.apache.spark.sql.functions._

/** Round-15 wave 1: the posting-list fan-out valve on the exact
  * prefix-filter joins (VERDICT-r14 next-round item 1) and the
  * collision-free FD-check distinct key (ADVICE-r14). */
class Round15OpsSpec extends SparkFunSuite {
  import spark.implicits._

  // 12 identical docs: every doc's prefix holds the SAME shingles, so
  // one posting list owns all 12 ids — C(12,2) candidate pairs from a
  // single token, the exact shape that went superlinear in the 100x
  // smoke when duplication scaled with corpus size.
  private def clones = (1L to 12L).map(i => (i, "a b c d e f"))
    .toDF("doc_id", "text")

  test("exactJaccardJoin: posting valve trips LOUDLY on mass duplication") {
    val e = intercept[IllegalStateException] {
      Dedup.exactJaccardJoin(clones, 500000L, maxPostingLen = 4L).collect()
    }
    assert(e.getMessage.contains("exactJaccardJoin"))
    assert(e.getMessage.contains("valve tripped"))
    assert(e.getMessage.contains("maxPostingLen=4"))
    assert(e.getMessage.contains("worst posting length 12"))
  }

  test("exactJaccardJoin: results are unchanged when the valve passes, " +
      "and maxPostingLen=0 disables it") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    // grams(1)={abc,bcd,cde}, grams(2)={abc,bcd,cdx}: J = 2/4 >= 0.5
    val expected = Seq((1L, 2L, 2L))
    def pairs(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("common"))).toSeq
    assert(pairs(Dedup.exactJaccardJoin(docs, 500000L)) == expected)
    // clones under a disabled valve: all C(12,2) pairs come back exact
    assert(Dedup.exactJaccardJoin(clones, 500000L, maxPostingLen = 0L)
      .count() == 66L)
  }

  test("prefixJaccardJoin: valve trips on the same clone corpus, passes " +
      "on a benign one with identical results") {
    val e = intercept[IllegalStateException] {
      Dedup.prefixJaccardJoin(clones, 0.5, maxPostingLen = 4L).collect()
    }
    assert(e.getMessage.contains("prefixJaccardJoin"))
    assert(e.getMessage.contains("valve tripped"))
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d x"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val out = Dedup.prefixJaccardJoin(docs, 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    assert(out == Seq((1L, 2L)))
  }

  test("exactContainmentJoin: valve bounds the PREFIX-RESTRICTED index — " +
      "a hot host-side token only trips when a probe prefix touches it") {
    // 12 hosts share shingle 'a_b_c'; the snippet's prefix hits it, so
    // the restricted index holds a 13-long posting list
    val docs = ((1L, "a b c") +:
      (2L to 13L).map(i => (i, s"a b c d$i e$i f$i g$i")))
      .toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.exactContainmentJoin(docs, 800000L, maxPostingLen = 4L).collect()
    }
    assert(e.getMessage.contains("exactContainmentJoin"))
    assert(e.getMessage.contains("valve tripped"))
    // the same corpus under the default valve: snippet found in every host
    assert(Dedup.exactContainmentJoin(docs, 800000L)
      .filter(col("doc_a") === 1L).count() == 12L)
  }

  test("crostonInt: hand-computed fixed-point fold, Croston and SBA " +
      "forecasts") {
    // demands (day, q): (1,10) (3,20) (7,10); alpha = 3/10, scale 1e6:
    // z: 10e6 -> (60+70)e6/10 = 13e6 -> (30+91)e6/10 = 12.1e6
    // p: 1e6 -> (3*2+7)e6/10 = 1.3e6 -> (3*4+9.1)e6/10 = 2.11e6
    val df = Seq((1L, 1L, 10L), (1L, 3L, 20L), (1L, 7L, 10L),
      (1L, 5L, 0L), (2L, 2L, 4L)) // zero-qty day must be ignored
      .toDF("part", "day", "q")
    val out = graft.operators.TimeSeries.crostonInt(df, "part", "day", "q")
      .orderBy("part").collect()
    val r = out(0)
    assert(r.getAs[Long]("n_demands") == 3L)
    assert(r.getAs[Long]("z_fp") == 12100000L)
    assert(r.getAs[Long]("p_fp") == 2110000L)
    assert(r.getAs[Double]("croston_fc") == 5.734597)
    assert(r.getAs[Double]("sba_fc") == 4.874408)
    // single-demand key: init state only, fc = q
    assert(out(1).getAs[Long]("n_demands") == 1L)
    assert(out(1).getAs[Double]("croston_fc") == 4.0)
  }

  test("crostonInt: maxDemands truncates the fold to the LAST demands") {
    val df = ((1L to 10L).map(d => (1L, d, d))).toDF("part", "day", "q")
    val full = graft.operators.TimeSeries.crostonInt(df, "part", "day", "q")
      .head()
    val tail3 = graft.operators.TimeSeries.crostonInt(
      df, "part", "day", "q", maxDemands = 3).head()
    assert(full.getAs[Long]("n_demands") == 10L)
    assert(tail3.getAs[Long]("n_demands") == 10L) // count is pre-truncation
    // tail-3 fold over days 8..10 (all gaps 1): init (8e6, 1e6) ->
    // (9): z=(27+56)e6/10=8.3e6 -> (10): z=(30+58.1)e6/10=8.81e6;
    // p stays at 1e6 (every interval is 1)
    assert(tail3.getAs[Long]("z_fp") == 8810000L)
    assert(tail3.getAs[Long]("p_fp") == 1000000L)
    assert(full.getAs[Long]("z_fp") != tail3.getAs[Long]("z_fp"))
  }

  test("permutationEntropy: ordinal patterns with stable tie-breaks; " +
      "monotone series has zero entropy, 2-cycle splits patterns") {
    // key 1: strictly increasing -> every window is pattern 012 -> H=0
    // key 2: 1,2,1,2,1,2 -> windows (1,2,1)=021? and (2,1,2)
    val rows = (1L to 6L).map(i => (1L, i, i * 10L)) ++
      (1L to 6L).map(i => (2L, i, if (i % 2 == 1) 10L else 20L))
    val out = graft.operators.TimeSeries.permutationEntropy(
      rows.toDF("k", "b", "v"), "k", "b", "v").orderBy("k").collect()
    assert(out(0).getAs[Long]("n_windows") == 4L)
    assert(out(0).getAs[Long]("n_patterns") == 1L)
    assert(out(0).getAs[Long]("h_micro") == 0L)
    assert(out(0).getAs[Double]("h_norm") == 0.0)
    // key 2: patterns alternate between two kinds, 2 each of 4 windows
    assert(out(1).getAs[Long]("n_patterns") == 2L)
    // H = -2*(1/2 ln 1/2) = ln 2 -> micro 693147; norm ln2/ln6 = 0.386853
    assert(out(1).getAs[Long]("h_micro") == 693148L) // 2 x round(346573.59)
    assert(out(1).getAs[Double]("h_norm") == 0.386853)
  }

  test("permutationEntropy: tied triple ranks by time position") {
    // (5,5,5): r1=0, r2=[5<5]+[5<5]+[5==5]=1, r3=0+0+1+1=2 -> pattern 012
    val df = Seq((1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L))
      .toDF("k", "b", "v")
    val out = graft.operators.TimeSeries.permutationEntropy(
      df, "k", "b", "v").head()
    assert(out.getAs[Long]("n_windows") == 1L && out.getAs[Long]("n_patterns") == 1L)
  }

  test("spectralEntropy: constant series has zero broadband power; a pure " +
      "2-cycle concentrates ALL power at the Nyquist bin (entropy 0)") {
    val const = (0L until 32L).map(i => (1L, i, 100L))
    val nyq = (0L until 32L).map(i => (2L, i, if (i % 2 == 0L) 200L else 0L))
    val out = graft.operators.TimeSeries.spectralEntropy(
      (const ++ nyq).toDF("k", "i", "y"), "k", "i", "y", n = 32)
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("total_power") == 0L)
    assert(out(0).getAs[Double]("h_norm") == 0.0)
    // 2-cycle: only k=16 survives (sum of (-1)^i * y), entropy exactly 0
    assert(out(1).getAs[Long]("total_power") > 0L)
    assert(out(1).getAs[Long]("h_micro") == 0L)
  }

  test("krippendorffAlpha: hand-computed nominal alpha; single-rating " +
      "units drop out") {
    // u1:{0,0} u2:{0,1} u3:{1,1} u4:{0 only, excluded}:
    // D_o = (2/6), D_e = 18/30 -> alpha = 1 - (1/3)/(3/5) = 0.444444
    val r = Seq((1L, "a", 0L), (1L, "b", 0L), (2L, "a", 0L), (2L, "b", 1L),
      (3L, "a", 1L), (3L, "b", 1L), (4L, "a", 0L))
      .toDF("unit", "rater", "v")
    val out = graft.operators.Profiling.krippendorffAlpha(
      r, "unit", "rater", "v").head()
    assert(out.getAs[Long]("n_units") == 3L)
    assert(out.getAs[Long]("n_values") == 6L)
    assert(out.getAs[Long]("n_categories") == 2L)
    assert(out.getAs[Long]("d_o_scaled") == 5040L)
    assert(out.getAs[Long]("d_e_raw") == 18L)
    assert(out.getAs[Double]("alpha") == 0.444444)
    // perfect agreement -> alpha = 1
    val perfect = Seq((1L, "a", 0L), (1L, "b", 0L), (2L, "a", 1L),
      (2L, "b", 1L)).toDF("unit", "rater", "v")
    assert(graft.operators.Profiling.krippendorffAlpha(
      perfect, "unit", "rater", "v").head().getAs[Double]("alpha") == 1.0)
  }

  test("dpNoisyCounts: deterministic seeded Laplace — replayable, " +
      "non-degenerate, DOUBLE-typed") {
    val df = Seq.tabulate(100)(i => (s"g${i % 4}", i))
      .toDF("g", "x")
    val a = graft.operators.Profiling.dpNoisyCounts(df, Seq("g"))
      .orderBy("g").collect()
    val b = graft.operators.Profiling.dpNoisyCounts(df, Seq("g"))
      .orderBy("g").collect()
    assert(a.toSeq == b.toSeq) // same seed, same release
    assert(a.forall(_.getAs[Double]("epsilon") == 1.0))
    // noise actually perturbs (md5-uniform is never exactly 0.5 here)
    assert(a.exists(r =>
      r.getAs[Double]("noisy_count") != r.getAs[Long]("n_true").toDouble))
    // Laplace(1) noise at these counts stays small but nonzero
    assert(a.forall(r => math.abs(r.getAs[Double]("noisy_count") -
      r.getAs[Long]("n_true")) < 25.0))
  }

  test("greedyMatching: a valid matching (each vertex at most once), " +
      "edges only, maximal on a small graph, deterministic") {
    // two triangles joined by a bridge
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val m = graft.operators.Graph.greedyMatching(e, "src", "dst", rounds = 8)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val touched = m.flatMap(p => Seq(p._1, p._2))
    assert(touched.distinct.length == touched.length) // vertex-disjoint
    val edgeSet = Set((1L,2L),(2L,3L),(1L,3L),(3L,4L),(4L,5L),(5L,6L),(4L,6L))
    assert(m.forall(p => edgeSet(p)))
    // maximality: no remaining edge with both endpoints unmatched
    val free = (1L to 6L).toSet -- touched.toSet
    assert(!edgeSet.exists(p => free(p._1) && free(p._2)))
    val m2 = graft.operators.Graph.greedyMatching(e, "src", "dst", rounds = 8)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    assert(m.sorted.toSeq == m2.sorted.toSeq)
  }

  test("sampleEntropy: identical templates give SampEn 0; out-of-tolerance " +
      "pairs are excluded exactly") {
    val flat = (1L to 5L).map(d => (1L, d, 50L)) // 3 windows, all equal
    val spiky = (1L to 5L).map(d => (2L, d, if (d % 2 == 1) 0L else 100L))
    val out = graft.operators.TimeSeries.sampleEntropy(
      (flat ++ spiky).toDF("k", "b", "v"), "k", "b", "v", r = 10L)
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("b_pairs") == 3L)
    assert(out(0).getAs[Long]("a_pairs") == 3L)
    assert(out(0).getAs[Double]("sampen") == 0.0)
    // spiky: windows (0,100,0),(100,0,100),(0,100,0) — only (1,3) match
    assert(out(1).getAs[Long]("b_pairs") == 1L)
    assert(out(1).getAs[Long]("a_pairs") == 1L)
    assert(out(1).getAs[Double]("sampen") == 0.0)
  }

  test("expectedShortfall: exact tail mean past the VaR cut") {
    val df = (1L to 10L).map(d => (1L, d, d * 10L)).toDF("k", "b", "v")
    val r = graft.operators.TimeSeries.expectedShortfall(
      df, "k", "b", "v", tailPpm = 200000L).head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("k_tail") == 2L)
    assert(r.getAs[Long]("var_floor") == 90L)
    assert(r.getAs[Long]("tail_sum") == 190L)
    assert(r.getAs[Double]("es") == 95.0)
  }

  test("diameterSweep: exact on a path graph") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r = graft.operators.Graph.diameterSweep(e, "src", "dst", maxHops = 8)
      .head()
    assert(r.getAs[Long]("start_id") == 5L) // farthest from vertex 1
    assert(r.getAs[Long]("far_id") == 1L)
    assert(r.getAs[Long]("eccentricity") == 4L)
    assert(r.getAs[Long]("n_reached") == 5L)
  }

  test("bmpSobelEnergy: constant-gradient ramp (no mod wrap) gives " +
      "|Gx|+|Gy| = 8+24 per interior pixel") {
    // v = (5 + x + 3y) % 251 over 4x4 never wraps: dx=2, dy=6 everywhere
    val media = Seq((5L,
      graft.operators.Multimodal.synthesizeBmp24(5L, 4, 4)))
      .toDF("doc_id", "content")
    val r = graft.operators.Multimodal.bmpSobelEnergy(media).head()
    assert(r.getAs[Long]("width") == 4L && r.getAs[Long]("height") == 4L)
    assert(r.getAs[Long]("n_interior") == 4L)
    assert(r.getAs[Long]("sobel_energy") == 128L)
    assert(r.getAs[Double]("mean_grad") == 32.0)
  }

  test("dbscanFromEdges: cores, components, deterministic border " +
      "assignment, and noise on a hand graph") {
    // triangle {1,2,3} (all core at minPts=3), 4 borders on 3,
    // pair {5,6} too sparse -> noise, 7 isolated -> noise
    val pts = (1L to 7L).toDF("vec_id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("a", "b")
    val out = graft.operators.Similarity.dbscanFromEdges(pts, edges, minPts = 3)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("n_neighbors"),
        r.getAs[String]("role"), r.getAs[Long]("cluster")))
    assert(out.toSeq == Seq(
      (1L, 3L, "core", 1L), (2L, 3L, "core", 1L), (3L, 4L, "core", 1L),
      (4L, 2L, "border", 1L), (5L, 2L, "noise", -1L),
      (6L, 2L, "noise", -1L), (7L, 1L, "noise", -1L)))
  }

  test("epsNeighborPairs: exact fixed-point distance cut") {
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.3f, 0.4f)), // d = 0.5
      (3L, Array(3.0f, 4.0f))) // d(1,3) = 5
      .toDF("vec_id", "embedding")
    val epsFp = math.round(0.6 * 16777216d) // eps = 0.6
    val pairs = graft.operators.Similarity.epsNeighborPairs(
      emb, epsFp * epsFp).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getAs[Long]("d2") > 0L)
  }

  test("lofScores: a far outlier scores >> 1, cluster members ~ 1") {
    val emb = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 1f)), (3L, Array(1f, 0f)),
      (4L, Array(10f, 10f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.lofScores(emb, k = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("lof"))
      .toMap
    assert(out(4L) > 5.0, s"outlier lof ${out(4L)}")
    Seq(1L, 2L, 3L).foreach(i =>
      assert(out(i) > 0.8 && out(i) < 1.3, s"inlier $i lof ${out(i)}"))
  }

  test("boruvkaForest: equals a driver-side Kruskal on the same md5 " +
      "weights (unique MST), spanning-forest edge count, acyclic") {
    // two components: an 8-node clique-ish blob and a 3-node triangle
    val blob = for { a <- 1L to 8L; b <- (a + 1) to 8L if (a + b) % 3 != 0 }
      yield (a, b)
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val edges = (blob ++ tri).toDF("src", "dst")
    val out = graft.operators.Graph.boruvkaForest(edges, "src", "dst")
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .toSet
    // reference: Kruskal over the identical (w, lo, hi) order
    val w = edges.select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi")).distinct()
      .withColumn("w", expr(graft.operators.Graph.mstWeightSql("lo", "hi")))
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    var parent = Map[Long, Long]().withDefault(identity)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); r }
    val kruskal = scala.collection.mutable.Set[(Long, Long)]()
    w.foreach { case (_, lo, hi) =>
      val (a, b) = (find(lo), find(hi))
      if (a != b) { parent = parent.updated(a, b); kruskal += ((lo, hi)) }
    }
    assert(out == kruskal.toSet)
    // spanning forest: (8-node comp -> 7 edges) + (triangle -> 2)
    assert(out.size == 9)
  }

  test("fdCheck: a dependent whose string form is the old U+0001 sentinel " +
      "no longer collides with NULL (collision-free struct key)") {
    val df = Seq(
      (1L, Some("")), (1L, None), // {chr(1), NULL}: a REAL violation
      (2L, Some("x")), (2L, Some("x")), // clean determinant
      (3L, None), (3L, None)) // all-NULL dependent: nd = 1, holds
      .toDF("det", "dep")
    val r = Profiling.fdCheck(df, Seq(("det", "dep"))).head()
    assert(r.getAs[Long]("n_det_values") == 3L)
    assert(r.getAs[Long]("n_violating_det") == 1L) // det=1 only
    assert(r.getAs[Long]("n_extra_dep") == 1L)
    assert(!r.getAs[Boolean]("holds"))
  }
}
