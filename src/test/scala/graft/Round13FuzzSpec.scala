package graft

import graft.operators.TextAnalysis

/** Round-13 cross-implementation fuzz: batched BPE training checked on
  * random small-alphabet corpora against an independent in-memory
  * implementation that shares no code with the seg-string engine —
  * symbol-LIST segmentations, explicit top-N ranking, the same
  * CHAINED greedy triple-disjoint selection (used-symbol set), and a
  * two-pointer greedy merge applied rank-first. Deterministic seeds. */
class Round13FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  /** Independent batched-BPE reference over symbol lists. */
  private def refBpeBatched(
      words: Seq[(String, Long)], rounds: Int, batchTopN: Int)
      : Seq[(Long, Long, String, String, String, Long)] = {
    var segs: Seq[(List[String], Long)] =
      words.map { case (w, wf) => (w.map(_.toString).toList, wf) }
    val out = Seq.newBuilder[(Long, Long, String, String, String, Long)]
    var step = 0L
    var done = false
    for (r <- 1 to rounds if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (seg, wf) =>
        seg.zip(seg.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + wf)
      }
      if (counts.isEmpty) done = true
      else {
        val ranked = counts.toSeq
          .sortBy { case ((l, rr), f) => (-f, l, rr) }.take(batchTopN)
        val used = scala.collection.mutable.Set.empty[String]
        val selected = ranked.collect {
          case ((l, rr), f)
              if Set(l, rr, l + rr).forall(!used.contains(_)) =>
            used ++= Set(l, rr, l + rr)
            (l, rr, f)
        }
        selected.foreach { case (l, rr, f) =>
          step += 1
          out += ((step, r.toLong, l, rr, l + rr, f))
          segs = segs.map { case (seg, wf) =>
            val b = List.newBuilder[String]
            var i = 0
            while (i < seg.length) {
              if (i < seg.length - 1 && seg(i) == l && seg(i + 1) == rr) {
                b += (l + rr); i += 2
              } else { b += seg(i); i += 1 }
            }
            (b.result(), wf)
          }
        }
      }
    }
    out.result()
  }

  test("kCenterGreedy matches an independent in-memory farthest-point " +
      "traversal on random embeddings") {
    import spark.implicits._
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def rnd6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ref(pts: Seq[(Long, Array[Float])], k: Int): Seq[(Long, Long)] = {
      val nrm = pts.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
      val byId = pts.toMap
      def dist(a: Long, b: Long): Double =
        1.0 - rnd6(dot(byId(a), byId(b)) / (nrm(a) * nrm(b)))
      val first = pts.map(_._1).min
      var dmin = pts.map { case (id, _) => id -> dist(id, first) }.toMap
      var sel = Vector(1L -> first)
      (2 to k).foreach { r =>
        val picked = (dmin -- sel.map(_._2))
          .toSeq.minBy { case (id, d) => (-d, id) }._1
        sel :+= (r.toLong -> picked)
        dmin = dmin.map { case (id, d) =>
          id -> math.min(d, dist(id, picked)) }
      }
      sel
    }
    (1 to 6).foreach { seed =>
      val r = new scala.util.Random(1700 + seed)
      val n = 20 + r.nextInt(30)
      val pts = (0L until n.toLong).map(i =>
        (i, Array.fill(6)(r.nextGaussian().toFloat)))
      val k = 3 + r.nextInt(5)
      val got = graft.operators.Similarity
        .kCenterGreedy(pts.toDF("vec_id", "embedding"), k)
        .orderBy("rank").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSeq
      assert(got == ref(pts, k), s"seed=$seed k=$k")
    }
  }

  test("dtwPaaDistances matches an independent in-memory DTW on random " +
      "non-negative series") {
    import spark.implicits._
    def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
      val m = a.length
      val dp = Array.fill(m, m)(Long.MaxValue / 4)
      for (i <- 0 until m; j <- 0 until m) {
        val c = math.abs(a(i) - b(j))
        dp(i)(j) =
          if (i == 0 && j == 0) c
          else c + Seq(
            if (i > 0) dp(i - 1)(j) else Long.MaxValue / 4,
            if (j > 0) dp(i)(j - 1) else Long.MaxValue / 4,
            if (i > 0 && j > 0) dp(i - 1)(j - 1) else Long.MaxValue / 4).min
      }
      dp(m - 1)(m - 1)
    }
    (1 to 6).foreach { seed =>
      val r = new scala.util.Random(1900 + seed)
      val segs = 3 + r.nextInt(4)
      val nKeys = 2 + r.nextInt(3)
      // per key: a series of length in [segs, 2*segs] of small
      // NON-NEGATIVE ints (keeps the PAA micro rounding identical to
      // math.round in the reference)
      val data = (0 until nKeys).flatMap { k =>
        val n = segs + r.nextInt(segs + 1)
        (0 until n).map(i => (s"k$k", i.toLong, r.nextInt(50).toLong))
      }
      // reference PAA: same ((rn-1)*segs) div n segment map + micro round
      val paa = data.groupBy(_._1).map { case (k, rows) =>
        val ys = rows.sortBy(_._2).map(_._3)
        val n = ys.length
        val segsOf = ys.zipWithIndex.groupBy { case (_, i) =>
          (i.toLong * segs) / n }
        k -> (0 until segs).map(s =>
          math.round(1e6 * segsOf(s.toLong).map(_._1).sum /
            segsOf(s.toLong).length))
      }
      val want = (for {
        (ka, pa) <- paa; (kb, pb) <- paa if ka < kb
      } yield (ka, kb) -> refDtw(pa, pb)).toMap
      val got = graft.operators.TimeSeries
        .dtwPaaDistances(data.toDF("k", "t", "y"), "k", "t", "y", segs)
        .collect()
        .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
      assert(got == want, s"seed=$seed segs=$segs")
    }
  }

  test("kneserNeyBigrams matches an independent in-memory KN on random " +
      "small-alphabet corpora") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val r = new scala.util.Random(2100 + seed)
      val docs = (1 to 2 + r.nextInt(3)).map { d =>
        (d.toLong, Seq.fill(8 + r.nextInt(20))(
          ('a' + r.nextInt(4)).toChar.toString).mkString(" "))
      }
      val got = graft.operators.TextAnalysis
        .kneserNeyBigrams(docs.toDF("doc_id", "text"), k = 1000,
          minCount = 1L)
        .collect()
        .map(x => (x.getString(0), x.getString(1)) ->
          (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5),
            x.getDouble(6))).toMap
      val bigrams = docs.flatMap { case (_, t) =>
        val ws = t.split(" ").toSeq; ws.zip(ws.tail) }
      val c = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nfw = c.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nbw = c.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nbig = c.size.toLong
      assert(got.keySet == c.keySet, s"seed=$seed")
      got.foreach { case ((w1, w2), (gc, gc1, gnfw, gnbw, p)) =>
        assert((gc, gc1, gnfw, gnbw) ==
          (c((w1, w2)), c1(w1), nfw(w1), nbw(w2)), s"seed=$seed ($w1,$w2)")
        val want = math.max(gc - 0.75, 0.0) / gc1 +
          0.75 * gnfw / gc1 * gnbw / nbig
        assert(math.abs(p - want) < 1e-6, s"seed=$seed ($w1,$w2)")
      }
    }
  }

  test("bpeTrainBatched matches the independent two-pointer batched BPE " +
      "on random corpora") {
    (1 to 10).foreach { seed =>
      val r = new scala.util.Random(1300 + seed)
      // tiny alphabet → heavy collisions, ties, and real batch conflicts
      val words = Seq.fill(5 + r.nextInt(12))(
        Seq.fill(2 + r.nextInt(5))(('a' + r.nextInt(3)).toChar).mkString)
      val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val batch = 1 + r.nextInt(4)
      val got = TextAnalysis
        .bpeTrainBatched(docs, rounds = 3, batchTopN = batch)
        .orderBy("step").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
          x.getString(3), x.getString(4), x.getLong(5))).toSeq
      val want = refBpeBatched(wf, rounds = 3, batchTopN = batch)
      assert(got == want, s"seed=$seed batch=$batch words=$words")
    }
  }
}
