package graft

import graft.operators.{Normalize, Retrieval, Sessionize, Similarity, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-8 additions: per-group winsorization and z-score normalization,
  * the hash-stable k-means step, directional n-gram containment, and the
  * regexp_instr fix for anchored sequenceMatch patterns. */
class Round8OpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("winsorize clips to the exact per-group quantiles and keeps interior values") {
    // group g: values 0..10 -> p10 = 1.0, p90 = 9.0 (linear interpolation
    // on 11 points lands exactly on members)
    val df = (0L to 10L).map(v => ("g", v)).toDF("k", "v")
    val got = Normalize.winsorize(df, "k", "v", 0.1, 0.9)
      .select($"v", $"v_wins").as[(Long, Double)].collect().toMap
    assert(got(0L) == 1.0 && got(10L) == 9.0) // outliers clipped
    assert(got(1L) == 1.0 && got(9L) == 9.0)  // boundary members kept
    assert(got(5L) == 5.0)                    // interior untouched
    // groups are independent: a second group with its own spread
    val two = df.union(Seq(("h", 100L), ("h", 200L), ("h", 300L)).toDF("k", "v"))
    val h = Normalize.winsorize(two, "k", "v", 0.1, 0.9)
      .filter($"k" === "h").select($"v", $"v_wins").as[(Long, Double)].collect().toMap
    assert(h(100L) == 120.0 && h(300L) == 280.0 && h(200L) == 200.0)
  }

  test("zscore: weighted mean ~0, unit variance, zero-variance group emits null") {
    val df = Seq(("a", 2L), ("a", 4L), ("a", 6L), ("b", 5L), ("b", 5L))
      .toDF("k", "v")
    val z = Normalize.zscore(df, "k", "v")
    val a = z.filter($"k" === "a").select($"v", $"z").as[(Long, Double)].collect().toMap
    // mean 4, population std sqrt(8/3)
    val sd = math.sqrt(8.0 / 3.0)
    assert(math.abs(a(2L) - math.rint(-2 / sd * 1e6) / 1e6) < 1e-9)
    assert(a(4L) == 0.0)
    assert(math.abs(a(2L) + a(6L)) < 1e-9) // symmetry
    // zero variance -> null z (not NaN, not Infinity)
    val b = z.filter($"k" === "b").select($"z").collect()
    assert(b.forall(_.isNullAt(0)))
  }

  test("kmeansStep: every corpus vector lands in exactly one seed cell; counts conserve") {
    val vecs = (0L until 20L).map { i =>
      // two obvious clusters around (1,0) and (0,1)
      val base = if (i % 2 == 0) Array(1f, 0.1f * (i % 3)) else Array(0.1f * (i % 3), 1f)
      (i, base)
    }.toDF("vec_id", "embedding")
    val step = Similarity.kmeansStep(vecs, nCentroids = 2).collect()
    // cells are the two lowest ids (0, 1); dims 0 and 1 for each
    val cells = step.map(_.getAs[Long]("cell")).toSet
    assert(cells == Set(0L, 1L))
    // per-dim counts sum to the corpus size for each dim
    val byDim = step.groupBy(_.getAs[Long]("dim")).map { case (d, rows) =>
      d -> rows.map(_.getAs[Long]("n")).sum
    }
    assert(byDim.values.toSet == Set(20L))
    // the even ids (x-heavy) all join cell 0 (seed (1,0)); so cell 0's
    // dim-0 centroid must be near 1 and cell 1's near 0.1-scale
    val c0d0 = step.find(r => r.getAs[Long]("cell") == 0L && r.getAs[Long]("dim") == 0L).get
      .getAs[Double]("centroid")
    val c1d0 = step.find(r => r.getAs[Long]("cell") == 1L && r.getAs[Long]("dim") == 0L).get
      .getAs[Double]("centroid")
    assert(c0d0 > 0.9 && c1d0 < 0.2)
  }

  test("containment scores a quoted subset ~1 while jaccard stays low") {
    import graft.functions.TextFunctions.{containment, jaccard}
    val df = Seq(
      (Seq("a_b_c", "b_c_d"), Seq("a_b_c", "b_c_d", "x_y_z", "y_z_w", "z_w_v"))
    ).toDF("sa", "sb")
    val r = df.select(
      containment($"sa", $"sb").as("c_ab"),
      containment($"sb", $"sa").as("c_ba"),
      jaccard($"sa", $"sb").as("j")).head()
    assert(r.getAs[Double]("c_ab") == 1.0)   // all of A is inside B
    assert(r.getAs[Double]("c_ba") == 0.4)   // B mostly novel
    assert(r.getAs[Double]("j") == 0.4)      // union-dominated
  }

  test("seasonalByPhase: dow profile means and residuals, hand-computed") {
    // key k, period 3: buckets 0..5 with values 10,20,30,40,50,60
    // phase 0: {10, 40} -> 25; phase 1: {20, 50} -> 35; phase 2: {30, 60} -> 45
    val df = Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L), (4L, 50L), (5L, 60L))
      .map { case (b, v) => ("k", b, v) }.toDF("k", "bucket", "v")
    val got = TimeSeries.seasonalByPhase(df, "k", "bucket", "v", period = 3)
      .select($"bucket", $"seasonal", $"resid").as[(Long, Double, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0L) == ((25.0, -15.0)) && got(3L) == ((25.0, 15.0)))
    assert(got(1L) == ((35.0, -15.0)) && got(4L) == ((35.0, 15.0)))
    assert(got(2L) == ((45.0, -15.0)) && got(5L) == ((45.0, 15.0)))
    // residuals cancel within each phase by construction of the mean
    val sums = TimeSeries.seasonalByPhase(df, "k", "bucket", "v", period = 3)
      .groupBy(pmod($"bucket", lit(3L))).agg(sum($"resid").as("s"))
      .select($"s").as[Double].collect()
    assert(sums.forall(math.abs(_) < 1e-9))
  }

  test("welchTTest: equal arms give t=0; known asymmetry matches hand math; tiny arm nulls") {
    // arms identical -> t = 0
    val same = Seq(("e", true, 5L), ("e", true, 7L), ("e", false, 5L), ("e", false, 7L))
      .toDF("k", "arm", "v")
    val t0 = Normalize.welchTTest(same, "k", "arm", "v").select($"t").as[Double].head()
    assert(t0 == 0.0)
    // A = {1,2,3}, B = {4,5,6,7}: mA=2, mB=5.5, vA=1, vB=5/3
    // t = (2-5.5)/sqrt(1/3 + (5/3)/4) = -3.5/sqrt(0.75)
    val ab = (Seq(1L, 2L, 3L).map(("e", true, _)) ++ Seq(4L, 5L, 6L, 7L).map(("e", false, _)))
      .toDF("k", "arm", "v")
    val r = Normalize.welchTTest(ab, "k", "arm", "v").head()
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Double]("mean_a") == 2.0 && r.getAs[Double]("mean_b") == 5.75 - 0.25)
    val expected = math.rint(-3.5 / math.sqrt(0.75) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("t") - expected) < 1e-9)
    // an arm with one row -> null t (variance undefined)
    val tiny = Seq(("e", true, 1L), ("e", false, 4L), ("e", false, 5L)).toDF("k", "arm", "v")
    assert(Normalize.welchTTest(tiny, "k", "arm", "v").head().isNullAt(5))
  }

  test("rrfFuse: hand-computed two-list fusion with a single-list id") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id_a", "r_a")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("id_b", "r_b")
    val got = Retrieval.rrfFuse(Seq((a, "id_a", "r_a"), (b, "id_b", "r_b")), k0 = 60, topK = 10)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_lists"), r.getAs[Double]("rrf"), r.getAs[Long]("rank")))).toMap
    def rr(ranks: Seq[Long]) =
      math.rint(ranks.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    assert(got(10L)._2 == rr(Seq(1L, 2L)) && got(10L)._1 == 2L)
    assert(got(20L)._2 == rr(Seq(2L, 1L)))
    assert(got(30L) == ((1L, rr(Seq(3L)), 3L)) || got(30L)._1 == 1L) // single-list id survives
    // both-list ids outrank single-list ids here; ties impossible by id tie-break
    assert(got(10L)._3 <= 2L && got(20L)._3 <= 2L)
    assert(Set(got(30L)._3, got(40L)._3) == Set(3L, 4L))
  }

  test("wavFrameEnergy: exact integer frame energies, partial trailing frame, junk drops") {
    import graft.operators.Multimodal
    // freq=0 saw -> every sample is -32768: sumsq per full frame is exact
    val bytes = Multimodal.synthesizeWavSaw(freqHz = 0, nSamples = 450)
    val media = Seq((7L, bytes), (8L, "not a wav".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val got = Multimodal.wavFrameEnergy(media, frameLen = 200).collect()
      .map(f => f.frame -> ((f.n_samples, f.sumsq))).toMap
    val sq = 32768L * 32768L
    assert(got == Map(
      0L -> ((200L, 200L * sq)),
      1L -> ((200L, 200L * sq)),
      2L -> ((50L, 50L * sq)))) // trailing partial frame keeps true n
    // junk payload contributes no frames; the decode is tolerant, not null-poisoning
    assert(Multimodal.wavFrameEnergy(media, frameLen = 200)
      .filter($"doc_id" === 8L).isEmpty)
  }

  test("bmpTileMeans: tile sums match the pixel formula; edge tiles keep true n_px") {
    import graft.operators.Multimodal
    val media = Seq((5L, Multimodal.synthesizeBmp24(seed = 5L, width = 10, height = 10)),
      (6L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    val got = Multimodal.bmpTileMeans(media, tile = 8).collect()
      .map(t => (t.tile_x, t.tile_y) -> ((t.n_px, t.sum_px))).toMap
    def px(x: Int, y: Int): Long = (5L + x + 3L * y) % 251L
    def ref(xs: Range, ys: Range) =
      (for { x <- xs; y <- ys } yield px(x, y)).sum
    assert(got((0L, 0L)) == ((64L, ref(0 until 8, 0 until 8))))
    assert(got((1L, 0L)) == ((16L, ref(8 until 10, 0 until 8))))
    assert(got((0L, 1L)) == ((16L, ref(0 until 8, 8 until 10))))
    assert(got((1L, 1L)) == ((4L, ref(8 until 10, 8 until 10))))
    assert(got.size == 4)
    // junk payload drops; per-tile counts conserve the pixel grid
    assert(got.values.map(_._1).sum == 100L)
  }

  test("imageDHash: bits match a Scala tile reference; identical pixels give Hamming 0") {
    import graft.operators.Multimodal
    // seed near the 251 modulus so the gray ramp wraps inside the image
    // and both bit values occur
    val (seed, w, h) = (245L, 17, 9)
    val media = Seq(
      (1L, Multimodal.synthesizeBmp24(seed, w, h)),
      (2L, Multimodal.synthesizeBmp24(seed, w, h)), // identical pixels
      (3L, Multimodal.synthesizeBmp24(seed + 7, w, h)))
      .toDF("doc_id", "content")
    val got = Multimodal.imageDHash(media, tile = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bits"), r.getAs[Long]("dhash")))).toMap
    // independent reference: tile sums straight from the pixel formula
    def tileSum(tx: Int, ty: Int, s: Long): (Long, Long) = {
      val px = for {
        x <- (tx * 8) until math.min(w, tx * 8 + 8)
        y <- (ty * 8) until math.min(h, ty * 8 + 8)
      } yield (s + x + 3L * y) % 251L
      (px.size.toLong, px.sum)
    }
    def refHash(s: Long): (Long, Long) = {
      val bits = for {
        ty <- 0 until 2; tx <- 0 until 2 // pairs (0,1) and (1,2) per row
        pair = (tileSum(tx, ty, s), tileSum(tx + 1, ty, s))
      } yield if (pair._1._2 * pair._2._1 > pair._2._2 * pair._1._1) 1L else 0L
      (bits.size.toLong,
        bits.zipWithIndex.map { case (b, k) => b << k }.sum)
    }
    assert(got(1L) == refHash(seed))
    assert(got(1L) == got(2L)) // identical pixels -> identical fingerprint
    assert(got(1L)._2 != got(3L)._2) // shifted ramp flips at least one bit
    // both bit values occur for this wrapped ramp (not a degenerate hash)
    assert(got(1L)._2 != 0L && got(1L)._2 != (1L << got(1L)._1.toInt) - 1L)
  }

  test("mergeUpsert classifies keep/insert/update/delete and drops absent-key tombstones") {
    import graft.operators.Cdc
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("k", "v", "s")
    val changes = Seq(
      (2L, 21L, "b2", false), // update
      (4L, 40L, "d", false),  // insert
      (3L, 0L, "x", true),    // delete (values nulled)
      (9L, 0L, "x", true))    // tombstone for absent key -> emits nothing
      .toDF("k", "v", "s", "is_delete")
    val got = Cdc.mergeUpsert(base, changes, Seq("k"), Seq("v", "s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          Option(r.getString(3))))).toMap
    assert(got == Map(
      1L -> (("keep", Some(10L), Some("a"))),
      2L -> (("update", Some(21L), Some("b2"))),
      3L -> (("delete", None, None)),
      4L -> (("insert", Some(40L), Some("d")))))
    // resulting state = rows with op != delete
    assert(got.count(_._2._1 != "delete") == 3)
  }

  test("skyline2D finds the Pareto frontier with multiplicities; dominated ties drop") {
    import graft.operators.Skyline
    val pts = Seq(
      (1L, 5L), (1L, 5L),  // frontier (cheapest, recent) — multiplicity 2
      (2L, 9L),            // frontier (pricier but newer)
      (2L, 5L),            // dominated by (1,5)
      (3L, 9L),            // dominated by (2,9)
      (0L, 1L),            // frontier (cheapest overall)
      (5L, 10L))           // frontier (newest overall)
      .toDF("x", "y")
    val got = Skyline.skyline2D(pts, "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("n")).toMap
    assert(got == Map((0L, 1L) -> 1L, (1L, 5L) -> 2L, (2L, 9L) -> 1L, (5L, 10L) -> 1L))
  }

  test("WITH RECURSIVE walks the binary-tree hierarchy to the exact depth (Spark 4 surface)") {
    // parent = key div 2: key k sits at depth floor(log2(k))
    val got = SparkEntry.queries("q_recursive_cte")(spark, "/root/testdata/sf0.001")
      .select($"c_custkey", $"depth").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(2L) == 1L && got(3L) == 1L && got(4L) == 2L)
    got.foreach { case (k, d) =>
      assert(d == (63 - java.lang.Long.numberOfLeadingZeros(k)).toLong, s"key $k")
    }
    // every customer key except 0 is reachable (keys are 0-based; 0 is its
    // own div-2 parent and sits outside the rooted tree by design)
    val n = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert(got.size.toLong == n - 1 && !got.contains(0L))
  }

  test("psiDrift: identical samples give ~0 psi; a shifted sample concentrates mass") {
    import graft.operators.Profiling
    val base = (1L to 1000L).map(v => Tuple1(v)).toDF("v")
    val same = Profiling.psiDrift(base, base, "v").collect()
    assert(same.length == 10)
    // identical distributions: every contribution is exactly 0 (p == q)
    assert(same.forall(r => r.getAs[Double]("psi_contrib") == 0.0))
    assert(same.map(_.getAs[Long]("n_base")).sum == 1000L)
    // a hard right-shift: all current mass lands in the top bucket;
    // total PSI must scream (far above the 0.25 "major drift" bar)
    val shifted = (5000L to 5999L).map(v => Tuple1(v)).toDF("v")
    val drift = Profiling.psiDrift(base, shifted, "v").collect()
    assert(drift.map(_.getAs[Long]("n_cur")).sum == 1000L)
    assert(drift.filter(_.getAs[Long]("bucket") == 9L).head.getAs[Long]("n_cur") == 1000L)
    assert(drift.map(_.getAs[Double]("psi_contrib")).sum > 0.25)
  }

  test("chi2Independence: independent table gives 0; hand-computed 2x2 matches") {
    import graft.operators.Profiling
    // perfectly independent: P(row)·P(col) factorizes -> every contrib 0
    val ind = Seq.fill(4)(("x", "a")) ++ Seq.fill(4)(("x", "b")) ++
      Seq.fill(2)(("y", "a")) ++ Seq.fill(2)(("y", "b"))
    val zero = Profiling.chi2Independence(ind.toDF("r", "c"), "r", "c").collect()
    assert(zero.length == 4 && zero.forall(_.getAs[Double]("chi2_contrib") == 0.0))
    // classic 2x2: obs [[10, 20], [30, 40]]; exp row1 = 12/8 etc.
    val skew = Seq.fill(10)(("x", "a")) ++ Seq.fill(20)(("x", "b")) ++
      Seq.fill(30)(("y", "a")) ++ Seq.fill(40)(("y", "b"))
    val got = Profiling.chi2Independence(skew.toDF("r", "c"), "r", "c").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("obs"), r.getAs[Double]("expected"), r.getAs[Double]("chi2_contrib"))))
      .toMap
    // exp(x,a) = 30*40/100 = 12; contrib = (10-12)^2/12 = 0.333333
    assert(got(("x", "a")) == ((10L, 12.0, 0.333333)))
    assert(got(("y", "b")) == ((40L, 42.0, math.rint(4.0 / 42 * 1e6) / 1e6)))
    // total chi2 for this table is ~0.7936508
    val total = got.values.map(_._3).sum
    assert(math.abs(total - 0.793651) < 1e-5)
  }

  test("pmiCollocations: a planted collocation outranks independent fillers") {
    import graft.operators.TextAnalysis
    // "new york" always co-occurs (perfect association); filler tokens mix
    // independently across docs
    val docs = (0L until 40L).map { i =>
      val filler = Seq("the", "a", "of", "x", "y")(i.toInt % 5)
      (i, s"new york $filler the a of meeting")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.pmiCollocations(docs, minCount = 5L, k = 5).collect()
    val top = got.minBy(_.getAs[Long]("rn"))
    assert((top.getString(0), top.getString(1)) == (("new", "york")))
    assert(top.getAs[Long]("cab") == 40L)
    // PMI of the perfect pair: ln((40/Nb) / ((40/Nu)*(40/Nu))) with
    // Nu = 40·7 = 280 tokens, Nb = 40·6 = 240 bigrams
    val expected = math.rint(math.log((40.0 / 240) / ((40.0 / 280) * (40.0 / 280))) * 1e6) / 1e6
    assert(math.abs(top.getAs[Double]("pmi") - expected) < 1.1e-6)
  }

  test("keywordSpot: whole-token hits only, counts exact, misses emit nothing") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat on the cat mat"),
      (2L, "concatenate cats scattered"), // substrings must NOT fire
      (3L, "dog")).toDF("doc_id", "text")
    val got = TextAnalysis.keywordSpot(docs, Seq("cat", "dog", "bird")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, "cat") -> 2L, (3L, "dog") -> 1L))
  }

  test("sequenceMatch reports the true match position for anchored patterns") {
    // the ADVICE r7 counterexample: 'vp$' over 'vpxvp' must report 4, not 1
    val ev = Seq(
      (1L, "view", 1000L, 1L), (1L, "purchase", 2000L, 2L),
      (1L, "checkout", 3000L, 3L),
      (1L, "view", 4000L, 4L), (1L, "purchase", 5000L, 5L))
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val codes = Map("view" -> "v", "purchase" -> "p", "checkout" -> "x")
    val got = Sessionize.sequenceMatch(ev, codes, "vp$").head()
    assert(got.getAs[Long]("seq_len") == 5L)
    assert(got.getAs[Long]("n_match") == 1L)
    assert(got.getAs[Long]("first_pos") == 4L)
    // regex metacharacters in the pattern no longer splice into SQL text:
    // a pattern with a quote must not throw a parse error
    val quoted = Sessionize.sequenceMatch(ev, codes, "v'p").head()
    assert(quoted.getAs[Long]("n_match") == 0L && quoted.getAs[Long]("first_pos") == 0L)
  }
}
