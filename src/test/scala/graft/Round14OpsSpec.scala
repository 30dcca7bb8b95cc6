package graft

import org.apache.spark.sql.functions._

/** Round-14 operators: synchronous Louvain communities and the
  * map-side LCS fold. */
class Round14OpsSpec extends SparkFunSuite {

  import spark.implicits._

  test("louvainSync: two triangles joined by one bridge edge split " +
      "into their two natural communities") {
    // 1-2-3 triangle, 4-5-6 triangle, bridge 3-4
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val out = graft.operators.Graph.louvainSync(e, "src", "dst", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    // each triangle collapses to one community, the bridge does not merge them
    assert(Set(out(1L), out(2L), out(3L)).size === 1)
    assert(Set(out(4L), out(5L), out(6L)).size === 1)
    assert(out(1L) !== out(4L))
  }

  test("louvainSync matches a plain-Scala replay of the synchronous " +
      "gain update on random graphs") {
    val rnd = new scala.util.Random(14)
    for (trial <- 1 to 4) {
      val n = 12 + trial * 3
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n if rnd.nextDouble() < 0.22
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        val deg = sym.groupBy(_._1).map { case (v, l) => v -> l.size.toLong }
        val m2 = sym.size.toLong
        var comm: Map[Long, Long] = deg.keys.map(v => v -> v).toMap
        for (r <- 1 to 4) {
          val cur = comm
          val tot = cur.toSeq.groupBy(_._2)
            .map { case (c, vs) => c -> vs.map(v => deg(v._1)).sum }
          comm = deg.keys.map { v =>
            val evc = sym.filter(_._1 == v).groupBy(e => cur(e._2))
              .map { case (c, l) => c -> l.size.toLong }
            val cands = (evc.keySet + cur(v)).toSeq
            val best = cands.map { c =>
              val e = evc.getOrElse(c, 0L)
              val t = tot(c) - (if (c == cur(v)) deg(v) else 0L)
              (m2 * e - deg(v) * t, c)
            }.minBy { case (s, c) => (-s, c) }
            v -> (if (v % 2 == r % 2) best._2 else cur(v))
          }.toMap
        }
        val out = graft.operators.Graph
          .louvainSync(edges.toDF("src", "dst"), "src", "dst", rounds = 4)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(out === comm, s"trial $trial")
      }
    }
  }

  test("lcsTokenPairs: hand-checked cases incl. empty and disjoint") {
    val pairs = Seq(
      (0, "a b c d e", "a x b y e"), // lcs = a b e = 3
      (1, "q w", "z z z"),           // disjoint: 0
      (2, "same same", "same same"), // identical: 2
      (3, "", "a b")                 // empty side: 0, ratio vs max side
    ).toDF("i", "ta", "tb")
    val out = graft.operators.TextAnalysis.lcsTokenPairs(pairs, "ta", "tb")
      .orderBy("i").select("lcs", "na", "nb", "lcs_ratio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    assert(out(0) === ((3L, 5L, 5L, 0.6)))
    assert(out(1) === ((0L, 2L, 3L, 0.0)))
    assert(out(2) === ((2L, 2L, 2L, 1.0)))
    assert(out(3) === ((0L, 0L, 2L, 0.0)))
  }

  test("lcsTokenPairs matches a classic two-row DP on random token pairs") {
    val rnd = new scala.util.Random(41)
    def doc(): String =
      Seq.fill(1 + rnd.nextInt(30))(('a' + rnd.nextInt(4)).toChar.toString)
        .mkString(" ")
    val data = (0 until 40).map(i => (i, doc(), doc()))
    def lcsRef(a: Seq[String], b: Seq[String]): Long = {
      var prev = Array.fill(b.length + 1)(0L)
      for (i <- a.indices) {
        val cur = Array.fill(b.length + 1)(0L)
        for (j <- b.indices)
          cur(j + 1) = if (a(i) == b(j)) prev(j) + 1
            else math.max(cur(j), prev(j + 1))
        prev = cur
      }
      prev(b.length)
    }
    val expect = data.map { case (_, x, y) =>
      lcsRef(x.split(" ").filter(_.nonEmpty).take(24).toSeq,
        y.split(" ").filter(_.nonEmpty).take(24).toSeq)
    }
    val out = graft.operators.TextAnalysis
      .lcsTokenPairs(data.toDF("i", "ta", "tb"), "ta", "tb")
      .orderBy("i").select("lcs").collect().map(_.getLong(0)).toSeq
    assert(out === expect)
  }

  test("unigramSegment: a word made of one hot piece segments into it; " +
      "rare words fall back to singles; ties prefer fewer pieces") {
    // corpus: 'abab' dominates so piece 'ab' (and 'abab') are hot
    val docs = (Seq.fill(50)("abab abab") ++ Seq("zq")).toDF("text")
    val out = graft.operators.TextAnalysis
      .unigramSegment(docs, "text", vocabMulti = 8, topWords = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // abab: 100 occurrences, 4 chars; best segmentation is the single
    // piece 'abab' (highest-prob 4-gram) = 1 piece
    assert(out("abab") === ((100L, 4L, 1L)))
    // zq occurs once; 'zq' IS a candidate piece (top-8 multis over this
    // tiny corpus include it) so it segments as one piece; the real
    // assertion is the fewest-pieces tie-break and single fallback
    assert(out("zq")._3 <= 2L)
  }

  test("unigramSegment matches a plain-Scala Viterbi on random words") {
    val rnd = new scala.util.Random(7)
    def word(): String =
      Seq.fill(1 + rnd.nextInt(12))(('a' + rnd.nextInt(3)).toChar).mkString
    val docs = Seq.fill(60)(Seq.fill(3)(word()).mkString(" ")).toDF("text")
    val kMulti = 16
    // reference vocab + scores (mirrors the operator's definition)
    val toks = docs.collect().flatMap(_.getString(0).split(" "))
      .filter(_.nonEmpty).map(_.take(16)).toSeq
    val wc = toks.groupBy(identity).map { case (w, l) => w -> l.size.toLong }
    val pieceCnt = scala.collection.mutable.Map[String, Long]()
    for ((w, c) <- wc; i <- w.indices; l <- 1 to math.min(4, w.length - i))
      pieceCnt(w.substring(i, i + l)) =
        pieceCnt.getOrElse(w.substring(i, i + l), 0L) + c
    val singles = pieceCnt.filter(_._1.length == 1)
    val multis = pieceCnt.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(kMulti)
    val vocab = (singles.toSeq ++ multis).toMap
    val tot = vocab.values.sum
    val sc = vocab.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / tot) * 1e6) }
    def viterbi(w: String): (Long, Long) = {
      val dp = Array.fill(w.length + 1)(Long.MinValue)
      dp(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
        val piece = w.substring(i - l, i)
        if (dp(i - l) != Long.MinValue && sc.contains(piece)) {
          val v = dp(i - l) + 64L * sc(piece) - 1L
          if (v > dp(i)) dp(i) = v
        }
      }
      val t = 64L - (((dp(w.length) % 64) + 64) % 64)
      (t, (dp(w.length) + t) / 64)
    }
    val expect = wc.toSeq.sortBy { case (w, c) => (-c, w) }.take(10)
      .map { case (w, _) => w -> viterbi(w) }.toMap
    val out = graft.operators.TextAnalysis
      .unigramSegment(docs, "text", vocabMulti = kMulti, topWords = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), math.round(r.getDouble(4) * 1e6)))).toMap
    assert(out.keySet === expect.keySet)
    for ((w, (t, s)) <- expect)
      assert(out(w) === ((t, s)), s"word $w")
  }

  test("swAlignPairs: an embedded verbatim quote scores the local max " +
      "while global LCS stays diluted") {
    val quote = "to be or not to be"
    val pairs = Seq(
      (0, s"alpha beta $quote gamma delta", s"x y z $quote q r"),
      (1, "one two three", "four five six")
    ).toDF("i", "ta", "tb")
    val out = graft.operators.TextAnalysis.swAlignPairs(pairs, "ta", "tb")
      .orderBy("i").select("sw").collect().map(_.getLong(0))
    // 6-token exact quote: local score 12 (6 matches x 2); the quote's
    // internal repeat (to/be) can't beat the contiguous block
    assert(out(0) === 12L)
    assert(out(1) === 0L)
  }

  test("swAlignPairs matches a classic SW DP on random token pairs") {
    val rnd = new scala.util.Random(73)
    def doc(): String =
      Seq.fill(1 + rnd.nextInt(28))(('a' + rnd.nextInt(3)).toChar.toString)
        .mkString(" ")
    val data = (0 until 30).map(i => (i, doc(), doc()))
    def swRef(a: Seq[String], b: Seq[String]): Long = {
      var best = 0L
      var prev = Array.fill(b.length + 1)(0L)
      for (i <- a.indices) {
        val cur = Array.fill(b.length + 1)(0L)
        for (j <- b.indices) {
          val m = if (a(i) == b(j)) 2L else -1L
          cur(j + 1) = math.max(0L, math.max(prev(j) + m,
            math.max(prev(j + 1) - 1L, cur(j) - 1L)))
          best = math.max(best, cur(j + 1))
        }
        prev = cur
      }
      best
    }
    val expect = data.map { case (_, x, y) =>
      swRef(x.split(" ").filter(_.nonEmpty).take(24).toSeq,
        y.split(" ").filter(_.nonEmpty).take(24).toSeq)
    }
    val out = graft.operators.TextAnalysis
      .swAlignPairs(data.toDF("i", "ta", "tb"), "ta", "tb")
      .orderBy("i").select("sw").collect().map(_.getLong(0)).toSeq
    assert(out === expect)
  }

  test("kalmanLocalLevel: converges onto a constant series, variance " +
      "and gain shrink; matches a plain-Scala replay with identical " +
      "per-step quantization") {
    val (qm, rm, p0) = (4000L, 100000L, 10000000L)
    def replay(ys: Seq[Long]): (Long, Long, Double) = {
      var m = 0L; var p = p0; var ppLast = 0L
      for (y <- ys) {
        val pp = p + qm
        ppLast = pp
        m = m + math.round(pp.toDouble / (pp + rm) * (y - m))
        p = math.round(pp.toDouble * rm / (pp + rm))
      }
      (m, p, ppLast.toDouble / (ppLast + rm))
    }
    val seriesA = Seq.fill(8)(500000L)                  // constant 500.0
    val seriesB = Seq(100L, 900L, 200L, 800L, 300L, 700L, 400L, 600L)
      .map(_ * 1000L)                                   // noisy
    val df = (seriesA.zipWithIndex.map { case (y, i) => ("a", i.toLong, y) }
      ++ seriesB.zipWithIndex.map { case (y, i) => ("b", i.toLong, y) })
      .toDF("k", "idx", "ym")
    val out = graft.operators.TimeSeries
      .kalmanLocalLevel(df, "k", "idx", "ym", steps = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (ma, pa, ga) = replay(seriesA)
    assert(out("a")._1 === ma / 1000.0)
    assert(out("a")._2 === pa / 1000.0)
    assert(math.abs(out("a")._3 - ga) < 5e-7)
    // constant series: level locks onto 500 (gain ~1 on first step)
    assert(math.abs(out("a")._1 - 500.0) < 1.0)
    // steady-state variance far below the prior, gain well below 1
    assert(out("a")._2 < 100.0 && out("a")._3 < 0.5)
    val (mb, pb, _) = replay(seriesB)
    assert(out("b")._1 === mb / 1000.0)
    assert(out("b")._2 === pb / 1000.0)
    // both keys reach the same steady-state variance (P is y-free)
    assert(out("a")._2 === out("b")._2)
  }

  test("binarySegmentation: a two-jump series recovers BOTH jumps " +
      "(level 0 takes the bigger one), matching a brute-force argmax") {
    // 30|30|30|30  90|90|90|90  10|10|10|10  : jumps after x=3 and x=7
    val ys = Seq.fill(4)(30L) ++ Seq.fill(4)(90L) ++ Seq.fill(4)(10L)
    val df = ys.zipWithIndex.map { case (y, i) => ("k", i.toLong, y) }
      .toDF("g", "x", "y")
    val out = graft.operators.TimeSeries
      .binarySegmentation(df, "g", "x", "y", depth = 2, minSeg = 2)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // level 0: the 90->10 edge carries the larger between-segment SS
    assert(out((0L, 0L)) === 7L)
    // level 1 on the left segment [0..7] finds the 30->90 jump
    assert(out((1L, 0L)) === 3L)
    // level 1 on the right segment [8..11] is flat: accepted split (if
    // any) is noise-free zero score or absent; assert no spurious x
    assert(out.keySet.filter(_._1 == 1L).forall { k =>
      k._2 == 0L || out(k) >= 8L })
  }

  test("binarySegmentation level-0 equals changepoint on the same " +
      "series when minSeg permits every split") {
    val rnd = new scala.util.Random(99)
    val data = for (g <- Seq("a", "b"); i <- 0 until 20)
      yield (g, i.toLong, (rnd.nextInt(100) + 1).toLong)
    val df = data.toDF("g", "x", "y")
    val cp = graft.operators.TimeSeries.changepoint(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bs = graft.operators.TimeSeries
      .binarySegmentation(df, "g", "x", "y", depth = 1, minSeg = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(bs === cp)
  }

  test("holtWintersInt: replays a plain-Scala reference and tracks a " +
      "perfect weekly pattern with linear growth") {
    def fdiv(x: Long, d: Long): Long = Math.floorDiv(x, d)
    def replay(ys: Seq[Long]): (Long, Long, Long, Long) = {
      val s1 = ys.slice(0, 7).sum; val s2 = ys.slice(7, 14).sum
      var l = fdiv(s1, 7); var b = fdiv(s2 - s1, 49)
      val sea = Array.tabulate(7)(j => ys(j) - l)
      for (t <- 7 until 14) {
        val j = t - 7
        val lN = fdiv(ys(t) - sea(j) + l + b, 2)
        b = fdiv(lN - l + 3 * b, 4)
        sea(j) = fdiv(ys(t) - lN + 3 * sea(j), 4)
        l = lN
      }
      (l, b, l + b + sea(0), l + 7 * b + sea(6))
    }
    // weekly shape [100,200,300,400,500,600,700] + 10/day growth
    val shape = Seq(100L, 200L, 300L, 400L, 500L, 600L, 700L)
    val grow = (0 until 14).map(t => shape(t % 7) + 10L * t)
    // plus a noisy series to exercise negative floor divisions
    val noisy = Seq(500L, 20L, 900L, 40L, 700L, 60L, 300L,
      80L, 650L, 10L, 820L, 30L, 550L, 70L)
    val df = (grow.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
      ++ noisy.zipWithIndex.map { case (y, i) => ("n", i.toLong, y) })
      .toDF("k", "idx", "y")
    val out = graft.operators.TimeSeries
      .holtWintersInt(df, "k", "idx", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("g") === replay(grow))
    assert(out("n") === replay(noisy))
    // the growing series: positive trend (true +10/day; the dyadic
    // beta=1/4 over 7 steps converges part-way) and the h=1 forecast
    // inside a seasonal-amplitude band of the true next value 240
    val (_, bg, f1, _) = replay(grow)
    assert(bg >= 1L && bg <= 20L)
    assert(math.abs(f1 - 240L) <= 100L)
  }
}
