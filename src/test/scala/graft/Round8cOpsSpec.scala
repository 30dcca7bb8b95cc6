package graft

import graft.operators.{Layout, Profiling}
import org.apache.spark.sql.functions._

/** Round-8 session-3 operators: Z-order bucket stats, compaction planning,
  * KMV distinct sketch. */
class Round8cOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("zOrderStats: per-cell buckets degenerate to 1-cell rectangles") {
    // bucketBits = 2*bits → every bucket is exactly one grid cell
    val cells = Seq((0L, 0L), (0L, 0L), (1L, 0L), (3L, 3L))
      .toDF("ca", "cb")
    val got = Layout.zOrderStats(cells, col("ca"), col("cb"),
        bits = 2, bucketBits = 4)
      .collect()
      .map(r => r.getAs[Long]("zbucket") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("rect_cells")))).toMap
    // z(0,0)=0, z(1,0)=1, z(3,3)=15 at bits=2
    assert(got == Map(0L -> ((2L, 1L)), 1L -> ((1L, 1L)), 15L -> ((1L, 1L))))
  }

  test("zOrderStats: top-bit buckets cover the expected quadrant rectangles") {
    // bits=2 grid (4×4), bucketBits=2 → 4 buckets = the 2×2 quadrants of
    // the Z curve; fill the full grid so each bucket's rectangle is its
    // whole quadrant (4 cells)
    val all = for { a <- 0L until 4L; b <- 0L until 4L } yield (a, b)
    val got = Layout.zOrderStats(all.toDF("ca", "cb"), col("ca"), col("cb"),
        bits = 2, bucketBits = 2)
      .collect()
      .map(r => r.getAs[Long]("zbucket") ->
        ((r.getAs[Long]("n_rows"),
          r.getAs[Long]("min_a"), r.getAs[Long]("max_a"),
          r.getAs[Long]("min_b"), r.getAs[Long]("max_b"),
          r.getAs[Long]("rect_cells")))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    // quadrant 0 = low halves of both dims; quadrant 1 = high a, low b
    // (a's bits land at even positions, so bucket bit 0 is a's top bit)
    assert(got(0L) == ((4L, 0L, 1L, 0L, 1L, 4L)))
    assert(got(1L) == ((4L, 2L, 3L, 0L, 1L, 4L)))
    assert(got(2L) == ((4L, 0L, 1L, 2L, 3L, 4L)))
    assert(got(3L) == ((4L, 2L, 3L, 2L, 3L, 4L)))
  }

  test("compactionPlan: offset binning is per-partition, straddlers keep their bin") {
    val files = Seq(
      ("t1", 1, 600L), ("t1", 2, 600L), ("t1", 3, 600L), ("t1", 4, 600L),
      ("t2", 1, 2000L), ("t2", 2, 100L))
      .toDF("part", "ord", "bytes")
    val got = Layout.compactionPlan(files, "part", "ord", "bytes", 1000L)
      .collect()
      .map(r => (r.getAs[String]("part"), r.getAs[Int]("ord")) ->
        ((r.getAs[Long]("cum_before"), r.getAs[Long]("bin")))).toMap
    // t1: cum_before 0,600,1200,1800 → bins 0,0,1,1 (file 2 straddles the
    // 1000 boundary but is assigned by its offset — bins within one file
    // of target)
    assert(got(("t1", 1)) == ((0L, 0L)))
    assert(got(("t1", 2)) == ((600L, 0L)))
    assert(got(("t1", 3)) == ((1200L, 1L)))
    assert(got(("t1", 4)) == ((1800L, 1L)))
    // t2 restarts at 0 — binning never leaks across table partitions
    assert(got(("t2", 1)) == ((0L, 0L)))
    assert(got(("t2", 2)) == ((2000L, 2L)))
  }

  test("kmvDistinct: unsaturated sketch returns the exact count") {
    val df = (1L to 50L).map(i => i % 10).toDF("v") // 10 distinct
    val r = Profiling.kmvDistinct(df, "v", k = 256).head()
    assert(r.getAs[Long]("n_k") == 10L)
    assert(!r.getAs[Boolean]("saturated"))
    assert(r.getAs[Double]("est_distinct") == 10.0)
    assert(r.getAs[Long]("exact_distinct") == 10L)
    assert(r.getAs[Double]("rel_err") == 0.0)
  }

  test("kmvDistinct: saturated estimate matches the closed form and is near truth") {
    val df = (1L to 5000L).toDF("v")
    val r = Profiling.kmvDistinct(df, "v", k = 64).head()
    assert(r.getAs[Boolean]("saturated"))
    assert(r.getAs[Long]("exact_distinct") == 5000L)
    val est = r.getAs[Double]("est_distinct")
    // closed form from the reported kth hash
    val expected = math.rint(63.0 * math.pow(2, 60) /
      r.getAs[Long]("h_k").toDouble * 1e6) / 1e6
    assert(est == expected)
    // k=64 → σ ≈ 1/√62 ≈ 12.7%; allow 4σ
    assert(math.abs(est / 5000.0 - 1) < 0.51, s"est=$est")
  }

  test("kmvDistinct: estimate is invariant to duplication and partitioning") {
    val once = Profiling.kmvDistinct((1L to 3000L).toDF("v"), "v", 64).head()
    val dup = Profiling.kmvDistinct(
      ((1L to 3000L) ++ (1L to 3000L)).toDF("v").repartition(7), "v", 64).head()
    assert(once.getAs[Double]("est_distinct") == dup.getAs[Double]("est_distinct"))
    assert(once.getAs[Long]("h_k") == dup.getAs[Long]("h_k"))
  }

  test("kCore: pendant chain peels away in cascades, the clique survives") {
    import graft.operators.Graph
    // K4 clique (1-4) + chain 4-5-6-7: the 3-core is exactly the clique,
    // and reaching it takes multiple rounds (7 peels first, then 6, then 5)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val got = Graph.kCore(edges, "src", "dst", k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_deg")).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max degree → empty core
    assert(Graph.kCore(edges, "src", "dst", k = 5).count() == 0L)
  }

  test("kCoreSql unroll matches the engine's fixpoint on the same fixture") {
    import graft.operators.Graph
    // replay the oracle shape in Spark SQL (same semantics, no DuckDB
    // here): 4 unrolled rounds must equal the engine's converged result
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    edges.createOrReplaceTempView("e0_fixture")
    val sql = s"""WITH es AS (SELECT src, dst FROM e0_fixture
      UNION SELECT dst AS src, src AS dst FROM e0_fixture),
      ${Graph.kCoreSql(k = 3, rounds = 4).replace("AS MATERIALIZED", "AS")}"""
    val viaSql = spark.sql(sql).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("core_deg")).toMap
    val viaEngine = Graph.kCore(edges, "src", "dst", k = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_deg")).toMap
    assert(viaSql == viaEngine)
  }

  test("poissonThresholds encode the Poisson(1) CDF in 60-bit space") {
    import graft.operators.Sampling
    val t = Sampling.poissonThresholds
    assert(t.length == 8)
    assert(t.head == (math.exp(-1.0) * math.pow(2, 60)).toLong)
    assert(t == t.sorted)
    // CDF at j=7 is 0.99998975… — within ~1e-5 of 1
    assert(t.last > (0.99998 * math.pow(2, 60)).toLong)
  }

  test("bootstrapCi: deterministic across partitionings, CI brackets the point estimate") {
    import graft.operators.Sampling
    val df = (1L to 2000L).map(i => ("g", i, 100L + (i % 37))).toDF("g", "id", "v")
    val a = Sampling.bootstrapCi(df, "g", "id", "v", b = 32).head()
    val b2 = Sampling.bootstrapCi(df.repartition(11), "g", "id", "v", b = 32).head()
    assert(a.getAs[Double]("ci_lo") == b2.getAs[Double]("ci_lo"))
    assert(a.getAs[Double]("ci_hi") == b2.getAs[Double]("ci_hi"))
    assert(a.getAs[Long]("n_rows") == 2000L)
    val (lo, hi, pt) = (a.getAs[Double]("ci_lo"), a.getAs[Double]("ci_hi"),
      a.getAs[Double]("point_est"))
    assert(lo < hi && lo <= pt && pt <= hi, s"($lo, $pt, $hi)")
    // CI width for mean of ~uniform[100,136] at n=2000: σ/√n ≈ 0.24 →
    // the 94% interval must be tight around the mean, not degenerate
    assert(hi - lo < 2.0 && hi - lo > 0.05)
  }

  test("gramCovariance: exact on a known 2-D set, invariant to partitioning") {
    import graft.operators.Similarity
    // vectors (1,0),(0,1),(1,1),(0,0): E[x]=E[y]=.5, E[xy]=.25 → cov=0;
    // var(x)=var(y)=E[x²]−E[x]² = .5−.25 = .25
    val vs = Seq(Seq(1f, 0f), Seq(0f, 1f), Seq(1f, 1f), Seq(0f, 0f))
    val df = vs.map(Tuple1(_)).toDF("embedding").repartition(3)
    val got = Similarity.gramCovariance(df, "embedding", scaleBits = 12)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("s_ij"), r.getAs[Double]("cov")))).toMap
    assert(got.keySet == Set((0L, 0L), (0L, 1L), (1L, 1L)))
    val q2 = 4096L * 4096L
    assert(got((0L, 0L)) == ((4L, 2L * q2, 0.25)))
    assert(got((0L, 1L)) == ((4L, 1L * q2, 0.0)))
    assert(got((1L, 1L)) == ((4L, 2L * q2, 0.25)))
    // empty partitions (repartition 3 over 4 rows) changed nothing ^
  }

  test("kAnonymity flags exactly the small QI cells with 1/n risk") {
    import graft.operators.Profiling
    val df = (Seq.fill(12)(("NY", 1)) ++ Seq.fill(3)(("NY", 2)) ++
      Seq.fill(1)(("SF", 1))).toDF("city", "grp")
    val got = Profiling.kAnonymity(df, Seq("city", "grp"), k = 5L)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Boolean]("anonymous"), r.getAs[Double]("risk"))))
      .toMap
    assert(got(("NY", 1)) == ((12L, true, 0.083333)))
    assert(got(("NY", 2)) == ((3L, false, 0.333333)))
    assert(got(("SF", 1)) == ((1L, false, 1.0)))
  }

  test("cmJoinSizeEstimate: exact from per-key counts, CM always one-sided above") {
    import graft.operators.Profiling
    // a keys: 1,1,2,3 ; b keys: 1,2,2,9 → exact = 2*1 + 1*2 = 4
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(1L, 2L, 2L, 9L).toDF("k")
    val r = Profiling.cmJoinSizeEstimate(a, "k", b, "k").head()
    assert(r.getAs[Long]("exact_size") == 4L)
    assert(r.getAs[Boolean]("is_over"))
    assert(r.getAs[Long]("cm_est") >= 4L)
    // w=1024 with 4 keys → almost surely collision-free: est == exact + any
    // cross-collisions; with these fixed keys the estimate is deterministic
    val again = Profiling.cmJoinSizeEstimate(a.repartition(5), "k", b, "k").head()
    assert(again.getAs[Long]("cm_est") == r.getAs[Long]("cm_est"))
  }

  test("KmvSketchAggregator: distinct, capped, merge-order-invariant") {
    import graft.functions.KmvSketchAggregator
    val a = new KmvSketchAggregator(4)
    // duplicates collapse
    val b1 = Seq(9L, 3L, 9L, 7L, 3L).foldLeft(a.zero)(a.reduce)
    assert(b1 == Vector(3L, 7L, 9L))
    // cap keeps the 4 smallest
    val b2 = Seq(10L, 2L, 8L, 5L, 1L, 6L).foldLeft(a.zero)(a.reduce)
    assert(b2 == Vector(1L, 2L, 5L, 6L))
    // merge == union-then-cap, any order
    val x = Seq(4L, 8L, 15L).foldLeft(a.zero)(a.reduce)
    val y = Seq(16L, 23L, 42L, 3L).foldLeft(a.zero)(a.reduce)
    assert(a.merge(x, y) == a.merge(y, x))
    assert(a.merge(x, y) == Vector(3L, 4L, 8L, 15L))
    val out = a.finish(a.merge(x, y))
    assert(out.n_k == 4L && out.h_k == 15L)
    assert(a.finish(a.zero) == graft.functions.KmvSketch(0L, 0L))
  }

  test("KmvSketchAggregator under groupBy equals sort-limit per group") {
    import graft.functions.KmvSketchAggregator
    val kmv = udaf(new KmvSketchAggregator(8),
      org.apache.spark.sql.Encoders.scalaLong)
    val df = (1L to 500L).map(i => (s"g${i % 3}", i * 2654435761L % 100003L))
      .toDF("g", "h").repartition(7)
    val got = df.groupBy(col("g")).agg(kmv(col("h")).as("s"))
      .select(col("g"), col("s.n_k"), col("s.h_k"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = df.collect().groupBy(_.getString(0)).map { case (g, rows) =>
      val hs = rows.map(_.getLong(1)).distinct.sorted.take(8)
      g -> ((hs.length.toLong, hs.last))
    }
    assert(got == want)
  }

  test("gridClusters: two separated blobs form two clusters; sparse cells drop") {
    import graft.operators.Similarity
    // blob A: 5 points in cell (0,0); blob B: 4 points spanning adjacent
    // dense cells (10,10) and (11,10); one lone point at (20,20)
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    // cell-center coordinates: point (c+0.5)/32 lands in cell c
    val rows = Seq.fill(5)(v(0.5 / 32, 0.5 / 32)) ++
      Seq.fill(3)(v(10.5 / 32, 10.5 / 32)) ++
      Seq.fill(3)(v(11.5 / 32, 10.5 / 32)) ++
      Seq(v(20.5 / 32, 20.5 / 32))
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val got = Similarity.gridClusters(df, "embedding", scale = 32, minPts = 3L)
      .collect()
      .map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("cluster")))).toMap
    // lone (20,20) point is below minPts → absent
    assert(got.keySet == Set((0L, 0L), (10L, 10L), (11L, 10L)))
    assert(got((0L, 0L))._1 == 5L)
    // the two adjacent dense cells share one cluster = min cell id
    val idA = (10L + 1000L) * 1000000L + (10L + 1000L)
    assert(got((10L, 10L))._2 == idA && got((11L, 10L))._2 == idA)
    // blob A clusters alone under its own id
    assert(got((0L, 0L))._2 == (0L + 1000L) * 1000000L + 1000L)
  }

  test("tableFingerprint: partition-invariant, sensitive to a single cell change") {
    import graft.operators.Profiling
    val t1 = Seq(("g", 1L, "a"), ("g", 2L, "b"), ("h", 3L, "c"))
      .toDF("grp", "k", "s")
    val f1 = Profiling.tableFingerprint(t1, "grp", Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("hash_sum"),
          r.getAs[Long]("hash_min"), r.getAs[Long]("hash_max")))).toMap
    val f2 = Profiling.tableFingerprint(t1.repartition(5), "grp", Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("hash_sum"),
          r.getAs[Long]("hash_min"), r.getAs[Long]("hash_max")))).toMap
    assert(f1 == f2)
    val t2 = Seq(("g", 1L, "a"), ("g", 2L, "B"), ("h", 3L, "c"))
      .toDF("grp", "k", "s")
    val f3 = Profiling.tableFingerprint(t2, "grp", Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("hash_sum")).toMap
    assert(f3("g") != f1("g")._2) // changed cell flips the group checksum
    assert(f3("h") == f1("h")._2) // untouched group unchanged
  }

  test("ols2 recovers an exact plane with R^2 = 1") {
    import graft.operators.Eval
    val pts = for { x1 <- 0L to 4L; x2 <- 0L to 4L }
      yield (5L + 2L * x1 + 3L * x2, x1, x2)
    val r = Eval.ols2(pts.toDF("y", "x1", "x2"), "y", "x1", "x2").head()
    assert(r.getAs[Long]("n") == 25L)
    assert(r.getAs[Double]("b0") == 5.0)
    assert(r.getAs[Double]("b1") == 2.0)
    assert(r.getAs[Double]("b2") == 3.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("ols2 separates correlated effects noise-free OLS can't see marginally") {
    import graft.operators.Eval
    // y depends ONLY on x1, but x2 correlates with x1 — the 2-feature fit
    // must put the whole effect on b1 and zero on b2
    val pts = (0L until 40L).map { i =>
      val x1 = i % 10; val x2 = x1 * 2 + (i % 2) // collinear-ish + jitter
      (7L + 4L * x1, x1, x2)
    }
    val r = Eval.ols2(pts.toDF("y", "x1", "x2"), "y", "x1", "x2").head()
    assert(r.getAs[Double]("b1") == 4.0 && r.getAs[Double]("b2") == 0.0)
  }

  test("graphStats: a star is perfectly disassortative (r = -1)") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = Graph.graphStats(edges, "src", "dst").head()
    assert(r.getAs[Long]("n_vertices") == 4L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("max_deg") == 3L)
    assert(r.getAs[Double]("avg_deg") == 1.5)
    assert(r.getAs[Double]("assortativity") == -1.0)
  }

  test("knnEval: separable label clusters classify perfectly, ties break low") {
    import graft.operators.Similarity
    // two orthogonal clusters of 6; queries = ids 0..3 (two per cluster)
    val rows =
      (0L until 6L).map(i => (i * 2, Seq(1f, 0.001f * i), 7)) ++
        (0L until 6L).map(i => (i * 2 + 1, Seq(0.001f * i, 1f), 9))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnEval(df, nQueries = 4L, k = 3)
      .collect()
      .map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("pred_label"), r.getAs[Boolean]("correct")))).toMap
    assert(got.size == 4)
    assert(got(0L) == ((7L, true)) && got(2L) == ((7L, true)))
    assert(got(1L) == ((9L, true)) && got(3L) == ((9L, true)))
  }

  test("adamicAdar: non-adjacent pair with rare common neighbor outranks hub pair") {
    import graft.operators.Graph
    // path 1-2-3 plus hub 9 connected to 4,5,6,7: pair (1,3) shares the
    // degree-2 neighbor 2 (contrib 1e6/ln2); pairs via hub 9 (deg 4) get
    // 1e6/ln4 — half the score. adjacency excluded.
    val edges = Seq((1L, 2L), (2L, 3L),
      (9L, 4L), (9L, 5L), (9L, 6L), (9L, 7L)).toDF("src", "dst")
    val got = Graph.adamicAdar(edges, "src", "dst", topK = 10).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        ((r.getAs[Long]("aa_micro"), r.getAs[Long]("n_common"))))
    val top = got.head
    assert(top._1 == ((1L, 3L)))
    assert(top._2._1 == math.rint(1000000.0 / math.log(2.0)).toLong)
    // all hub-mediated pairs score 1e6/ln4, n_common = 1
    val hubScore = math.rint(1000000.0 / math.log(4.0)).toLong
    assert(got.tail.forall { case (_, (s, c)) => s == hubScore && c == 1L })
    assert(got.length == 1 + 6) // C(4,2) = 6 hub pairs
    // adjacent pairs never appear
    assert(!got.exists(_._1 == ((1L, 2L))))
  }

  test("conformalOls2: q90 residual covers >= 90% of calibration points") {
    import graft.operators.Eval
    // y = 3 + 2*x1 + x2 with a deterministic pseudo-noise term
    val rows = (0L until 400L).map { i =>
      val x1 = i % 20; val x2 = (i * 7) % 11
      val noise = (i * 2654435761L % 9L) - 4L // in [-4, 4]
      (i, 3L + 2L * x1 + x2 + noise, x1, x2)
    }
    val r = Eval.conformalOls2(rows.toDF("id", "y", "x1", "x2"),
      "id", "y", "x1", "x2").head()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_calib") == 400L)
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.9 && cov <= 1.0, s"coverage=$cov")
    // residual bound must reflect the noise scale (≤ ~4 units + fit error)
    assert(r.getAs[Long]("q90_micro") <= 6L * 1000000L)
  }

  test("weightedReservoir: exact size, heavy weights oversampled, deterministic") {
    import graft.operators.Sampling
    val df = (1L to 1000L).map(i =>
      (i, if (i <= 100L) 1000L else 1L)).toDF("id", "w")
    val got = Sampling.weightedReservoir(df, "id", "w", n = 50)
    val rows = got.collect()
    assert(rows.length == 50)
    // the 100 heavy ids (1000x weight) should dominate the sample
    val heavy = rows.count(_.getLong(0) <= 100L)
    assert(heavy > 40, s"heavy=$heavy")
    // partitioning must not change the selected set
    val again = Sampling.weightedReservoir(df.repartition(9), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(again == rows.map(_.getLong(0)).toSet)
  }

  test("diffInDiff cancels group baselines and period shocks exactly") {
    import graft.operators.Eval
    // control: 10 pre → 15 post (shock +5); treated: 20 pre → 33 post
    // (+5 shock, +8 effect)
    val rows =
      Seq.fill(4)((false, false, 10L)) ++ Seq.fill(5)((false, true, 15L)) ++
        Seq.fill(3)((true, false, 20L)) ++ Seq.fill(6)((true, true, 33L))
    val r = Eval.diffInDiff(rows.toDF("treat", "post", "v"),
      "treat", "post", "v").head()
    assert(r.getAs[Long]("n_t1") == 6L && r.getAs[Long]("n_c0") == 4L)
    assert(r.getAs[Double]("dd_effect") == 8.0)
  }

  test("lDiversity: homogeneous large group flagged, uniform entropy exact") {
    import graft.operators.Profiling
    val rows = Seq.fill(20)(("a", 1L)) ++ // large but homogeneous
      (Seq.fill(5)(("b", 1L)) ++ Seq.fill(5)(("b", 2L))) // uniform 2-value
    val got = Profiling.lDiversity(rows.toDF("qi", "sv"), Seq("qi"), "sv", l = 2L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("distinct_sensitive"),
          r.getAs[Long]("entropy_micro"), r.getAs[Boolean]("l_diverse")))).toMap
    assert(got("a") == ((20L, 1L, 0L, false))) // k-anonymous yet leaking
    val ln2micro = 2L * math.rint(0.5 * math.log(2.0) * 1e6).toLong
    assert(got("b") == ((10L, 2L, ln2micro, true)))
  }

  test("mmrRerank diversifies: the near-duplicate of pick 1 loses to the orthogonal hit") {
    import graft.operators.Similarity
    // q sits between the two axes; 1 and 3 are equally relevant but
    // orthogonal to each other; 2 is 1's near-twin with a relevance edge
    val q = Seq((100L, Seq(1f, 1f, 0f))).toDF("qid", "qvec")
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f)),
      (2L, Seq(0.999f, 0.05f, 0f)), // near-duplicate of 1, top relevance
      (3L, Seq(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(q, corpus, poolK = 3, selectK = 2)
      .collect().map(r => r.getAs[Long]("pick_order") -> r.getAs[Long]("vec_id"))
      .toMap
    assert(got(1L) == 2L) // relevance picks the twin first
    assert(got(2L) == 3L) // MMR then skips 1 (psim ≈ 1) for the orthogonal hit
  }

  test("ohlcBars: bucket boundaries and tie-broken open/close are exact") {
    import graft.operators.TimeSeries
    // bar width 100ms; two bars; bar 1 has a timestamp tie at ms=0
    val ev = Seq(
      ("k", 0L, 2L, 50L), ("k", 0L, 1L, 10L), // tie: event 1 wins open
      ("k", 99L, 3L, 5L), ("k", 100L, 4L, 70L), ("k", 150L, 5L, 60L))
      .toDF("k", "ms", "tie", "v")
    val got = TimeSeries.ohlcBars(ev, "k", "ms", "tie", "v", barMs = 100L)
      .collect()
      .map(r => r.getAs[Long]("bar_start_ms") ->
        ((r.getAs[Long]("open"), r.getAs[Long]("high"), r.getAs[Long]("low"),
          r.getAs[Long]("close"), r.getAs[Long]("n"), r.getAs[Long]("volume"))))
      .toMap
    assert(got(0L) == ((10L, 50L, 5L, 5L, 3L, 65L)))
    assert(got(100L) == ((70L, 70L, 60L, 60L, 2L, 130L)))
  }

  test("streaks: islands split on gaps, counts exact") {
    import graft.operators.Sessionize
    // user 1: days 1,2,3, 7,8, 20 → streaks 3,2,1; user 2: 5 alone;
    // duplicate activity on a day must not inflate anything
    val df = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
      (1L, 20L), (2L, 5L)).toDF("u", "d")
    val got = Sessionize.streaks(df, "u", "d").collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak")))).toMap
    assert(got(1L) == ((6L, 3L, 3L)))
    assert(got(2L) == ((1L, 1L, 1L)))
  }

  test("pcaPower recovers a planted principal direction and its variance") {
    import graft.operators.Similarity
    // rank-1 data along (0.6, 0.8): Cov = Var(t)·vvᵀ, Var(t) = 0.5
    val ts = Seq(-1f, -0.5f, 0f, 0.5f, 1f)
    val df = ts.map(t => Tuple1(Seq(0.6f * t, 0.8f * t))).toDF("embedding")
    val got = Similarity.pcaPower(df, "embedding", iters = 12).collect()
      .map(r => r.getAs[Long]("i") ->
        ((r.getAs[Long]("v_micro"), r.getAs[Double]("eigenvalue")))).toMap
    val (v0, ev) = got(0L)
    val (v1, _) = got(1L)
    // e0 start has positive overlap with v → converges to +(0.6, 0.8)
    assert(math.abs(v0 - 600000L) <= 200L, s"v0=$v0")
    assert(math.abs(v1 - 800000L) <= 200L, s"v1=$v1")
    assert(math.abs(ev - 0.5) < 0.001, s"ev=$ev")
  }

  test("kmvSetOps: disjoint and identical sets give exact boundary answers") {
    import graft.operators.Profiling
    val a = (1L to 40L).toDF("v")
    val b = (1L to 40L).toDF("v")
    val same = Profiling.kmvSetOps(a, "v", b, "v", k = 16).head()
    assert(same.getAs[Long]("exact_union") == 40L)
    assert(same.getAs[Long]("exact_intersection") == 40L)
    assert(same.getAs[Long]("j_common") == 16L) // every union-min hash in both
    assert(same.getAs[Double]("est_jaccard") == 1.0)
    val c = (101L to 140L).toDF("v")
    val disj = Profiling.kmvSetOps(a, "v", c, "v", k = 16).head()
    assert(disj.getAs[Long]("exact_intersection") == 0L)
    assert(disj.getAs[Long]("j_common") == 0L)
    assert(disj.getAs[Double]("est_jaccard") == 0.0)
    assert(disj.getAs[Double]("est_intersection") == 0.0)
  }

  test("twap: holding-time weights beat the naive mean on irregular samples") {
    import graft.operators.TimeSeries
    // value 100 holds 900ms, spike 1000 holds 100ms; last point drops
    val ev = Seq(("k", 1, 0L, 1L, 100L), ("k", 1, 900L, 2L, 1000L),
      ("k", 1, 1000L, 3L, 7L)).toDF("k", "b", "ms", "tie", "v")
    val r = TimeSeries.twap(ev, "k", "b", "ms", "tie", "v").head()
    assert(r.getAs[Long]("n_holds") == 2L)
    assert(r.getAs[Long]("total_ms") == 1000L)
    // (100*900 + 1000*100) / 1000 = 190 — vs naive mean 369
    assert(r.getAs[Double]("twap") == 190.0)
  }

  test("imputeMedianSummary fills nulls with the per-group lower median") {
    import graft.operators.Normalize
    val df = Seq(("g", Some(10L)), ("g", Some(20L)), ("g", Some(30L)),
      ("g", None), ("g", None), ("h", Some(5L)), ("h", None))
      .toDF("grp", "v")
    val got = Normalize.imputeMedianSummary(df, "grp", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_missing"),
          r.getAs[Long]("imputed_median"), r.getAs[Long]("sum_after")))).toMap
    assert(got("g") == ((5L, 2L, 20L, 100L)))
    assert(got("h") == ((2L, 1L, 5L, 10L)))
  }

  test("srmCheck: balanced split passes, a 60/40 break at n=1000 flags") {
    import graft.operators.Profiling
    val ok = Profiling.srmCheck(
      (1L to 1000L).map(i => Tuple1(i % 2 == 0)).toDF("t"), "t").head()
    assert(!ok.getAs[Boolean]("srm") && ok.getAs[Double]("chi2") == 0.0)
    val bad = Profiling.srmCheck(
      (Seq.fill(600)(true) ++ Seq.fill(400)(false)).map(Tuple1(_)).toDF("t"),
      "t").head()
    // chi2 = (600-400)²/1000 = 40 >> 3.84
    assert(bad.getAs[Double]("chi2") == 40.0 && bad.getAs[Boolean]("srm"))
  }

  test("cuped removes the pre-period-explained component exactly") {
    import graft.operators.Eval
    // post = pre + 5·treat with arms balanced in pre (cov(pre, treat)=0
    // → θ is exactly var/var = 1): hand-computed moments give
    // num = den = 400000, θ = 1, ρ² = 400000/400100
    val rows = Seq(
      (true, 100L, 105L), (true, 500L, 505L),
      (false, 200L, 200L), (false, 400L, 400L))
    val r = Eval.cuped(rows.toDF("treat", "pre", "post"),
      "treat", "pre", "post").head()
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("raw_diff") == 5.0)
    assert(r.getAs[Double]("adj_diff") == 5.0)
    assert(r.getAs[Double]("rho2") == math.rint(400000.0 / 400100.0 * 1e6) / 1e6)
  }

  test("wilsonCi brackets p_hat and respects [0,1] at the extremes") {
    import graft.operators.Profiling
    val df = (Seq.fill(90)(("g", true)) ++ Seq.fill(10)(("g", false)) ++
      Seq.fill(20)(("z", false))).toDF("grp", "s")
    val got = Profiling.wilsonCi(df, "grp", "s").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Double]("p_hat"), r.getAs[Double]("ci_lo"),
          r.getAs[Double]("ci_hi")))).toMap
    val (p, lo, hi) = got("g")
    assert(p == 0.9 && lo < p && p < hi && hi < 1.0)
    // known Wilson bounds for 90/100 at z=1.96: ≈ (0.825, 0.944)
    assert(math.abs(lo - 0.825) < 0.005 && math.abs(hi - 0.944) < 0.005)
    val (pz, loz, hiz) = got("z")
    assert(pz == 0.0 && loz == 0.0 && hiz > 0.0 && hiz < 0.3)
  }

  test("lorenzCurve: uniform spend gives the diagonal, one whale bends it") {
    import graft.operators.Eval
    val uniform = (1L to 100L).map(i => Tuple1(50L)).toDF("cents")
    val diag = Eval.lorenzCurve(uniform, "cents").collect()
    // all-tied spend collapses to ONE distinct value = one decile row
    assert(diag.length == 1)
    assert(diag.head.getAs[Long]("cum_user_ppm") == 1000000L)
    assert(diag.head.getAs[Long]("cum_spend_ppm") == 1000000L)
    // distinct small spends + one whale: bottom 90% owns a sliver
    val whale = ((1L to 99L).map(i => 10L + i) :+ 100000L)
      .map(Tuple1(_)).toDF("cents")
    val got = Eval.lorenzCurve(whale, "cents").collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("cum_user_ppm"), r.getAs[Long]("cum_spend_ppm")))).toMap
    assert(got(8L)._1 == 900000L)
    assert(got(8L)._2 < 100000L) // bottom 90% of users < 10% of spend
    assert(got(9L) == ((1000000L, 1000000L)))
  }

  test("skippingCompare: clustered layout prunes the A-range, scattered can't") {
    import graft.operators.Layout
    // cells on a diagonal: ca == cb — the Z layout's buckets cover small
    // squares (prunable); the linear-on-B layout also clusters A here, so
    // BOTH prune: use anti-diagonal noise for B to scatter instead
    val rows = for { a <- 0L until 256L; r <- 0 until 2 }
      yield (a, (a * 37 + r * 131) % 256) // B decorrelated from A
    val df = rows.toDF("ca", "cb")
    val got = Layout.skippingCompare(df, col("ca"), col("cb"), 64L, 79L)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_skipped"), r.getAs[Long]("rows_scanned")))).toMap
    val (zSkip, zScan) = got("zorder")
    val (lSkip, lScan) = got("linear_b")
    // Z-order buckets bound A-ranges → most prune; linear-on-B sees the
    // full A range in every bucket → nothing prunes
    assert(zSkip >= 40L, s"zorder skipped only $zSkip")
    assert(lSkip == 0L && lScan == 512L)
    assert(zScan < 100L, s"zorder scans $zScan rows")
  }

  test("mannKendall: monotone series significant, shuffled ties are not") {
    import graft.operators.TimeSeries
    val mono = (0L until 20L).map(x => ("up", x, 100L + 3L * x))
    val flat = (0L until 20L).map(x => ("fl", x, 100L + (x % 2))) // ties, no trend
    val got = TimeSeries.mannKendall((mono ++ flat).toDF("g", "x", "y"),
      "g", "x", "y").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("s_stat"), r.getAs[Boolean]("significant")))).toMap
    assert(got("up") == ((190L, true))) // all C(20,2) pairs increasing
    val (sFlat, sigFlat) = got("fl")
    assert(math.abs(sFlat) < 60L && !sigFlat)
  }

  test("modularity: planted two-community graph scores near 1/2, labels override works") {
    import graft.operators.Graph
    // two disjoint triangles: components partition → e_in covers all
    // edges; Q = 1 - 2·(1/2)² = 0.5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L)).toDF("src", "dst")
    val perC = Graph.modularity(edges, "src", "dst").collect()
    assert(perC.map(_.getAs[Long]("contrib_micro")).sum == 500000L)
    // a deliberately BAD partition (everything one label) scores 0
    val allOne = edges.select(col("src").as("node")).union(
      edges.select(col("dst").as("node"))).distinct()
      .withColumn("label", lit(0L))
    val bad = Graph.modularity(edges, "src", "dst", Some(allOne)).collect()
    assert(bad.map(_.getAs[Long]("contrib_micro")).sum == 0L)
  }

  test("normalPSql approximates the two-sided normal tail to 1e-6") {
    import graft.operators.Profiling
    val got = spark.sql(
      s"""SELECT ${Profiling.normalPSql("1.959964")} AS p196,
         |${Profiling.normalPSql("0.0")} AS p0,
         |${Profiling.normalPSql("-2.575829")} AS pneg""".stripMargin).head()
    assert(math.abs(got.getAs[Double]("p196") - 0.05) < 1e-5)
    assert(math.abs(got.getAs[Double]("p0") - 1.0) < 1e-6)
    assert(math.abs(got.getAs[Double]("pneg") - 0.01) < 1e-5) // symmetric
  }

  test("bhFdr: step-up threshold rejects exactly the BH prefix") {
    import graft.operators.Profiling
    // classic example (Benjamini–Hochberg 1995 shape): m=10, q=0.1 →
    // reject while p_(k) <= k/100
    val ps = Seq(0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
      0.212, 0.368)
    val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "p")
    val got = Profiling.bhFdr(df, Seq("id"), "p", qPpm = 100000L).collect()
      .map(r => r.getAs[Double]("p") -> r.getAs[Boolean]("rejected")).toMap
    // step-UP: k* = max k with p_(k) <= k/100 — p_(6)=0.06 <= 0.06 passes
    // (even though p_(3), p_(4) individually fail), p_(7)=0.074 > 0.07
    // → k* = 6; the six smallest reject INCLUDING the locally-failing ones
    assert(got(0.001) && got(0.008) && got(0.039) && got(0.041) &&
      got(0.042) && got(0.06))
    assert(!got(0.074) && !got(0.205) && !got(0.368))
    val ks = Profiling.bhFdr(df, Seq("id"), "p", 100000L)
      .head().getAs[Long]("k_star")
    assert(ks == 6L)
  }

  test("changepoint locates a planted level shift exactly") {
    import graft.operators.TimeSeries
    // flat 100 for x in 0..9, jumps to 200 for x in 10..19
    val rows = (0L until 20L).map(x => ("k", x, if (x < 10) 100L else 200L))
    val r = TimeSeries.changepoint(rows.toDF("g", "x", "y"), "g", "x", "y")
      .head()
    assert(r.getAs[Long]("split_after_x") == 9L)
    assert(r.getAs[Double]("mean_left") == 100.0)
    assert(r.getAs[Double]("mean_right") == 200.0)
    // between-segment SS at the true split: 10*10/20 * 100² = 50000
    assert(r.getAs[Long]("score_micro") == 50000L)
  }

  test("decileLift: a perfect score gives max lift on top, zero below") {
    import graft.operators.Eval
    // 100 units, top 20 scores are the 20 positives → decile 0-1 lift 5x
    val rows = (1L to 100L).map(i => (i, 101L - i, i <= 20L))
    val got = Eval.decileLift(rows.toDF("id", "score", "label")
        .select(col("score"), col("label")), "score", "label")
      .collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_pos"), r.getAs[Long]("lift_micro"),
          r.getAs[Long]("cum_gain_ppm")))).toMap
    assert(got(0L) == ((10L, 5000000L, 500000L)))
    assert(got(1L) == ((10L, 5000000L, 1000000L)))
    assert(got(2L)._1 == 0L && got(2L)._2 == 0L)
    assert(got(9L)._3 == 1000000L) // gains saturate at 100%
  }

  test("ecodOutliers: the planted extreme dominates; middle points score low") {
    import graft.operators.Profiling
    // 99 points in the bulk, one far right on dim a AND far left on dim b
    val rows = (1L to 99L).map(i => (i, 100L + (i % 10), 500L + (i % 7))) :+
      ((100L, 10000L, 1L))
    val got = Profiling.ecodOutliers(rows.toDF("id", "a", "b"),
      "id", Seq("a", "b"), topK = 3).collect()
    val top = got.head
    assert(top.getAs[Long]("id") == 100L)
    // both tails at 1/100 → score = 2·ln(100)·1e6
    val want = 2L * math.rint(math.log(100.0) * 1e6).toLong
    assert(top.getAs[Long]("score_micro") == want)
    assert(got.forall(_.getAs[Long]("score_micro") <= want))
  }

  test("nodeFeatures: triangle vertex gets lcc 1, bridge node gets 0") {
    import graft.operators.Graph
    // triangle 1-2-3 plus pendant 3-4: node 3 has deg 3, 1 triangle,
    // lcc = 2·1/(3·2) = 1/3; nodes 1,2 have lcc 1; node 4 deg 1 → 0
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.nodeFeatures(edges, "src", "dst").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          r.getAs[Long]("lcc_micro")))).toMap
    assert(got(1L) == ((2L, 1L, 1000000L)))
    assert(got(2L) == ((2L, 1L, 1000000L)))
    assert(got(3L) == ((3L, 1L, 333333L)))
    assert(got(4L) == ((1L, 0L, 0L)))
  }

  test("decisionStump finds the perfectly separating threshold with gain = parent") {
    import graft.operators.Eval
    // label = feature > 50, perfectly separable at v = 50
    val rows = (1L to 100L).map(i => (i, i > 50L))
    val r = Eval.decisionStump(rows.toDF("f", "y"), "f", "y").head()
    assert(r.getAs[Long]("split_value") == 50L)
    assert(r.getAs[Long]("n_left") == 50L && r.getAs[Long]("pos_left") == 0L)
    assert(r.getAs[Long]("n_right") == 50L && r.getAs[Long]("pos_right") == 50L)
    assert(r.getAs[Long]("gini_split_micro") == 0L)
    assert(r.getAs[Long]("gain_micro") == r.getAs[Long]("gini_parent_micro"))
    assert(r.getAs[Long]("gini_parent_micro") == 500000L) // 2·.5·.5
  }

  test("negativeSamplingTable: ranges tile exactly and flatten hot words") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a a a a a a a a a a a a a a a a b")).toDF("doc_id", "text")
    val got = TextAnalysis.negativeSamplingTable(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("w_micro"),
          r.getAs[Long]("range_start"), r.getAs[Long]("range_end"),
          r.getAs[Long]("w_total")))).toMap
    // a: 16^0.75 = 8 → weight ratio 8:1 instead of raw 16:1
    assert(got("a")._1 == 16L && got("a")._2 == 8000000L)
    assert(got("b")._2 == 1000000L)
    // ranges tile [0, total) with no gaps
    val (_, _, s1, e1, tot) = got("a")
    val (_, _, s2, e2, _) = got("b")
    assert(s1 == 0L && e1 == s2 && e2 == tot && tot == 9000000L)
  }

  test("woeBins: separable deciles give NULL-WoE extremes, mixed bins exact") {
    import graft.operators.Eval
    // 100 units: feature = rank; positives = top 25 → decile 0-6 pure
    // negative (NULL WoE), decile 7 mixed (5 pos / 5 neg), 8-9 pure pos
    val rows = (1L to 100L).map(i => (i, i > 75L))
    val got = Eval.woeBins(rows.toDF("f", "y"), "f", "y").collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("pos"), r.getAs[Long]("neg"),
          Option(r.getAs[Any]("woe_micro"))))).toMap
    assert(got(0L)._3.isEmpty && got(9L)._3.isEmpty) // pure bins flag NULL
    val (p7, n7, w7) = got(7L)
    assert(p7 == 5L && n7 == 5L)
    // WoE = ln((5/25)/(5/75)) = ln(3)
    assert(w7.get.asInstanceOf[Long] == math.rint(math.log(3.0) * 1e6).toLong)
  }

  test("ljungBox: strong alternating structure flags, shuffled noise doesn't") {
    import graft.operators.TimeSeries
    // alternating ±: rho_1 ≈ -1 → huge Q; the modular sequence has much
    // weaker (but nonzero) structure — assert the ordering, not a
    // white-noise claim the fixture can't honestly make
    val alt = (0L until 30L).map(x => ("alt", x, if (x % 2 == 0) 100L else -100L))
    val noise = (0L until 30L).map(x => ("ns", x, (x * 2654435761L % 97L) - 48L))
    val got = TimeSeries.ljungBox((alt ++ noise).toDF("g", "x", "y"),
      "g", "x", "y").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Double]("lb_stat"), r.getAs[Boolean]("significant"),
          r.getAs[Double]("rho_1")))).toMap
    val (qAlt, sigAlt, rho1Alt) = got("alt")
    assert(sigAlt && qAlt > 100.0, s"alt Q=$qAlt")
    assert(rho1Alt < -0.9)
    val (qNs, _, _) = got("ns")
    assert(qNs < qAlt / 4, s"noise Q=$qNs vs alt $qAlt")
  }

  test("kendallTau: perfect monotone = 1, reversal = -1, ties corrected") {
    import graft.operators.Profiling
    val up = (1L to 20L).map(i => (i, i * i)) // monotone, nonlinear
    val r1 = Profiling.kendallTau(up.toDF("x", "y"), "x", "y").head()
    assert(r1.getAs[Double]("tau_b") == 1.0)
    assert(r1.getAs[Long]("n_pairs") == 190L)
    val down = (1L to 20L).map(i => (i, -i))
    assert(Profiling.kendallTau(down.toDF("x", "y"), "x", "y")
      .head().getAs[Double]("tau_b") == -1.0)
    // y all tied → denominator uses tie correction, tau undefined-ish:
    // (C-D)=0 over sqrt((n0-tx)(n0-0-ty)) with ty=n0 → div by 0 → guard?
    val tied = (1L to 10L).map(i => (i, 7L))
    val rt = Profiling.kendallTau(tied.toDF("x", "y"), "x", "y").head()
    assert(rt.getAs[Long]("ties_y") == 45L && rt.getAs[Long]("concordant") == 0L)
  }

  test("cramersV: perfect association scores 1, independence scores 0") {
    import graft.operators.Profiling
    val perfect = Seq.fill(30)(("a", "p")) ++ Seq.fill(30)(("b", "q"))
    val r1 = Profiling.cramersV(perfect.toDF("x", "y"), "x", "y").head()
    assert(r1.getAs[Double]("cramers_v") == 1.0)
    val indep = (for { x <- Seq("a", "b"); y <- Seq("p", "q") }
      yield Seq.fill(15)((x, y))).flatten
    val r2 = Profiling.cramersV(indep.toDF("x", "y"), "x", "y").head()
    assert(r2.getAs[Double]("cramers_v") == 0.0)
  }

  test("spearman: monotone nonlinear = 1, reversal = -1, midranks handle ties") {
    import graft.operators.Profiling
    val up = (1L to 30L).map(i => (i, i * i * i))
    assert(Profiling.spearman(up.toDF("x", "y"), "x", "y")
      .head().getAs[Double]("spearman_rho") == 1.0)
    val down = (1L to 30L).map(i => (i, 1000L - i))
    assert(Profiling.spearman(down.toDF("x", "y"), "x", "y")
      .head().getAs[Double]("spearman_rho") == -1.0)
    // heavy ties in y must not break exactness (half the mass tied)
    val tied = (1L to 30L).map(i => (i, if (i <= 15) 1L else 2L))
    val rho = Profiling.spearman(tied.toDF("x", "y"), "x", "y")
      .head().getAs[Double]("spearman_rho")
    assert(rho > 0.8 && rho < 0.9, s"rho=$rho") // √(3/4) ≈ 0.866
  }

  test("mcc: perfect predictor 1, inverted -1, constant prediction NULL") {
    import graft.operators.Profiling
    val d = (1L to 40L).map(i => (i <= 10L, i <= 10L)) // imbalanced 25%
    assert(Profiling.mcc(d.toDF("p", "y"), "p", "y")
      .head().getAs[Double]("mcc") == 1.0)
    val inv = (1L to 40L).map(i => (i > 10L, i <= 10L))
    assert(Profiling.mcc(inv.toDF("p", "y"), "p", "y")
      .head().getAs[Double]("mcc") == -1.0)
    val const = (1L to 40L).map(i => (true, i <= 10L))
    assert(Profiling.mcc(const.toDF("p", "y"), "p", "y")
      .head().isNullAt(4)) // undefined marginal → NULL by convention
  }

  test("theilSen: exact slope on a clean line, robust to one outlier") {
    import graft.operators.TimeSeries
    val clean = (0L to 20L).map(x => ("a", x, 10L + 2L * x)).toDF("g", "x", "y")
    val r = TimeSeries.theilSen(clean, "g", "x", "y").head()
    assert(r.getAs[Long]("sen_slope_micro") == 2000000L)
    assert(r.getAs[Long]("n_pairs") == 210L)
    // poison one point: OLS would shift; the Sen slope stays exactly 2
    val dirty = clean.union(Seq(("a", 21L, 100000L)).toDF("g", "x", "y"))
    val r2 = TimeSeries.theilSen(dirty, "g", "x", "y").head()
    assert(r2.getAs[Long]("n_pairs") == 231L)
    assert(r2.getAs[Long]("sen_slope_micro") == 2000000L)
  }
}
