package graft

import graft.operators.{Graph, Sampling, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-12 cross-implementation fuzz: iterated BPE training/apply
  * checked on RANDOM corpora against an independent in-memory BPE that
  * shares no code with the seg-string implementation (two-pointer
  * greedy merge over symbol lists vs replace() over wrapped strings),
  * and the largest-remainder allocation axioms. Deterministic seeds. */
class Round12FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** Independent reference BPE: symbol-LIST segmentations, pair counts
    * by zip(seg, seg.tail), argmax under (freq desc, l, r), and an
    * explicit two-pointer greedy left-to-right merge. */
  private def refBpe(words: Seq[(String, Long)], rounds: Int)
      : (Seq[(Long, String, String, String, Long)], Map[String, Long]) = {
    var segs: Seq[(List[String], Long)] =
      words.map { case (w, wf) => (w.map(_.toString).toList, wf) }
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
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
        val ((l, rr), f) = counts.toSeq
          .minBy { case ((l, rr), f) => (-f, l, rr) }
        step = r.toLong
        merges += ((step, l, rr, l + rr, f))
        segs = segs.map { case (seg, wf) =>
          val out = List.newBuilder[String]
          var i = 0
          while (i < seg.length) {
            if (i < seg.length - 1 && seg(i) == l && seg(i + 1) == rr) {
              out += (l + rr); i += 2
            } else { out += seg(i); i += 1 }
          }
          (out.result(), wf)
        }
      }
    }
    val hist = scala.collection.mutable.Map.empty[String, Long]
    segs.foreach { case (seg, wf) =>
      seg.foreach(t => hist(t) = hist.getOrElse(t, 0L) + wf)
    }
    (merges.result(), hist.toMap)
  }

  test("bpeTrain matches the independent two-pointer BPE on random corpora") {
    (1 to 8).foreach { seed =>
      val r = rng(100 + seed)
      // tiny alphabet forces heavy pair collisions, repeats, and ties
      val words = Seq.fill(4 + r.nextInt(10))(
        (2 + r.nextInt(5), ()) match {
          case (len, _) => Seq.fill(len)(('a' + r.nextInt(2)).toChar).mkString
        })
      val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.bpeTrain(docs, rounds = 3)
        .orderBy("step").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2),
          x.getString(3), x.getLong(4))).toSeq
      val (want, _) = refBpe(wf, rounds = 3)
      assert(got == want, s"seed=$seed words=$words")
    }
  }

  test("bpeApply matches the independent post-merge histogram") {
    (1 to 5).foreach { seed =>
      val r = rng(200 + seed)
      val words = Seq.fill(4 + r.nextInt(8))(
        Seq.fill(2 + r.nextInt(4))(('a' + r.nextInt(3)).toChar).mkString)
      val wf = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.bpeApply(docs, rounds = 2, k = 1000)
        .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      val (_, want) = refBpe(wf, rounds = 2)
      assert(got == want, s"seed=$seed words=$words")
    }
  }

  test("personalizedPageRank matches a direct in-memory quantized walk") {
    (1 to 8).foreach { seed =>
      val r = rng(400 + seed)
      val n = 5 + r.nextInt(8)
      val edges = (0 until 2 * n)
        .map(_ => (r.nextInt(n).toLong, r.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val seeds = verts.filter(_ => r.nextBoolean()) match {
          case Nil => Seq(verts.head)
          case s => s
        }
        val alpha = 0.85
        val got = Graph.personalizedPageRank(
            edges.toDF("src", "dst"), seeds.map(Tuple1(_)).toDF("id"),
            iters = 3, alpha = alpha)
          .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
        // independent reference: adjacency-map walk on the exact same
        // quantized recurrence (micro longs, trunc div, double round)
        val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val ns = seeds.size.toLong
        val r0 = verts.map(v =>
          v -> (if (seeds.contains(v)) 1000000L / ns else 0L)).toMap
        val base = verts.map(v => v -> (if (seeds.contains(v))
          math.round((1 - alpha) * (1000000L / ns)) else 0L)).toMap
        var x = r0
        for (_ <- 1 to 3) {
          val in = scala.collection.mutable.Map.empty[Long, BigInt]
          edges.foreach { case (u, v) =>
            in(v) = in.getOrElse(v, BigInt(0)) + (x(u) / odeg(u))
          }
          x = verts.map(v => v -> (base(v) +
            math.round(alpha * in.getOrElse(v, BigInt(0)).toDouble))).toMap
        }
        val want = verts.map(v =>
          v -> (math.round(x(v).toDouble / 1e6 * 1e6) / 1e6)).toMap
        assert(got == want, s"seed=$seed edges=$edges seeds=$seeds")
      }
    }
  }

  test("ransacLine: winner's inlier count matches brute force and beats " +
      "every other candidate") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    (1 to 6).foreach { seed =>
      val r = rng(500 + seed)
      val pts = (1L to (30L + r.nextInt(40)))
        .map(i => (i, r.nextInt(50).toLong, r.nextInt(2000).toLong))
      val eps = 50L + r.nextInt(300)
      val out = TimeSeries.ransacLine(
        pts.toDF("id", "x", "y"), "id", "x", "y",
        nCand = 8, epsilon = eps).collect()
      // replicate the seed ranking independently (MessageDigest md5)
      val sel = pts.sortBy(p => (h60(s"ransac:${p._1}"), p._1)).take(16)
      val cands = sel.grouped(2).toSeq.zipWithIndex.collect {
        case (Seq(a, b), i) if a._2 != b._2 =>
          (i + 1L, a._2, a._3, b._2, b._3)
      }
      def inliers(c: (Long, Long, Long, Long, Long)): Long =
        pts.count { case (_, x, y) =>
          ((BigInt(y) - c._3) * (c._4 - c._2) -
            (BigInt(x) - c._2) * (c._5 - c._3)).abs <=
            BigInt(eps) * (BigInt(c._4) - c._2).abs
        }.toLong
      if (cands.isEmpty) assert(out.isEmpty, s"seed=$seed")
      else {
        val row = out.head
        val winner = (row.getAs[Long]("cand"), row.getAs[Long]("x1"),
          row.getAs[Long]("y1"), row.getAs[Long]("x2"),
          row.getAs[Long]("y2"))
        val counts = cands.map(c => (c._1, inliers(c)))
        val best = counts.minBy { case (i, nn) => (-nn, i) }
        assert(winner._1 == best._1 &&
          row.getAs[Long]("n_inliers") == best._2,
          s"seed=$seed winner=$winner counts=$counts")
      }
    }
  }

  test("neymanAllocation: exact budget + within-one-of-ideal on random strata") {
    (1 to 8).foreach { seed =>
      val r = rng(300 + seed)
      val rows = (0 until 3 + r.nextInt(7)).flatMap { g =>
        Seq.fill(2 + r.nextInt(6))((s"g$g", r.nextInt(100).toLong))
      }
      val totalN = 10L + r.nextInt(1000)
      val out = Sampling.neymanAllocation(
          rows.toDF("g", "v"), "g", "v", totalN)
        .collect()
        .map(x => (x.getString(0), x.getAs[Long]("w_micro"),
          x.getAs[Long]("alloc")))
      val wt = out.map(_._2).sum
      if (wt > 0) {
        assert(out.map(_._3).sum == totalN, s"seed=$seed")
        out.foreach { case (g, w, a) =>
          val ideal = totalN.toDouble * w / wt
          assert(math.abs(a - ideal) < 1.0 + 1e-9,
            s"seed=$seed stratum=$g alloc=$a ideal=$ideal")
        }
      } else assert(out.map(_._3).sum == 0L, s"seed=$seed")
    }
  }
}
