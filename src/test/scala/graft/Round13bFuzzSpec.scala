package graft

import graft.operators.{Eval, Graph, Sessionize, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-13b cross-implementation fuzz: each new operator checked on
  * seeded random inputs against an independent in-memory reference
  * that shares no code with the engine — dense-vector power iteration,
  * a direct sequence-DP Viterbi, brute-force O(n²m) matrix profile,
  * dense-matrix hitting/absorption recursions, and plain Scala
  * group-folds for the encoding/matching estimators. Deterministic
  * seeds throughout (java.util.Random(seed)). */
class Round13bFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r8(x: Double) = BigDecimal(x)
    .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- eigenvectorCentrality vs dense power iteration -------------------

  test("fuzz: eigenvectorCentrality matches a dense in-memory power " +
      "iteration on random graphs") {
    (1 to 5).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val nV = 6 + rnd.nextInt(6)
      val edges = (for {
        a <- 0 until nV; b <- (a + 1) until nV
        if rnd.nextInt(100) < 40
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val verts = adj.keys.toSeq.sorted
        var x = verts.map(_ -> 1.0).toMap
        (1 to 4).foreach { _ =>
          x = verts.map(v => v -> adj(v).map(x).sum).toMap
        }
        val mx = x.values.max
        val expected = verts.map(v => v -> r8(x(v) / mx)).toMap
        val got = Graph.eigenvectorCentrality(
            edges.toDF("src", "dst"), "src", "dst", iters = 4)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got == expected, s"seed=$seed")
      }
    }
  }

  // ---- maximalIndependentSet properties -----------------------------------

  test("fuzz: maximalIndependentSet is independent, maximal, and " +
      "deterministic on random graphs") {
    (1 to 5).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val nV = 10 + rnd.nextInt(15)
      val edges = (for {
        a <- 0 until nV; b <- (a + 1) until nV
        if rnd.nextInt(100) < 25
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val mis = Graph.maximalIndependentSet(df, "src", "dst")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val ids = mis.map(_._1).toSet
        // independent: no edge inside the set
        edges.foreach { case (a, b) =>
          assert(!(ids(a) && ids(b)), s"seed=$seed: edge $a-$b inside MIS")
        }
        // maximal: every non-member vertex (of the edge-induced graph)
        // has a member neighbor
        val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        (verts -- ids).foreach { v =>
          assert(adj(v).exists(ids), s"seed=$seed: $v addable, not maximal")
        }
        // deterministic across runs, and the driver finisher replays
        // the distributed rounds bit-equal (all-distributed vs
        // all-driver vs the default hybrid)
        val allDist = Graph.maximalIndependentSet(df, "src", "dst",
            finishBelow = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val allDriver = Graph.maximalIndependentSet(df, "src", "dst",
            finishBelow = 1000000L)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(mis.toSet == allDist.toSet, s"seed=$seed: hybrid != dist")
        assert(mis.toSet == allDriver.toSet, s"seed=$seed: hybrid != driver")
        assert(mis.forall(_._2 >= 1L))
      }
    }
  }

  // ---- viterbiDecode vs a direct sequence DP -----------------------------

  test("fuzz: viterbiDecode matches a direct per-sequence DP on random " +
      "streams") {
    val types = Seq("view", "click", "purchase", "signup", "error")
    def refViterbi(obs: Seq[String]): (String, Long) = {
      import Sessionize.{ViterbiEmit, ViterbiInit, ViterbiTrans, ViterbiUnk}
      def em(s: String, o: String) = ViterbiEmit.getOrElse((s, o), ViterbiUnk)
      var vE = ViterbiInit("E") + em("E", obs.head)
      var vI = ViterbiInit("I") + em("I", obs.head)
      val backs = obs.tail.map { o =>
        val (eE, iE) = (vE + ViterbiTrans(("E", "E")), vI + ViterbiTrans(("I", "E")))
        val (eI, iI) = (vE + ViterbiTrans(("E", "I")), vI + ViterbiTrans(("I", "I")))
        val bE = if (eE >= iE) "E" else "I"
        val bI = if (eI >= iI) "E" else "I"
        vE = math.max(eE, iE) + em("E", o)
        vI = math.max(eI, iI) + em("I", o)
        (bE, bI)
      }
      var states = List(if (vE >= vI) "E" else "I")
      backs.reverse.foreach { case (bE, bI) =>
        states = (if (states.head == "E") bE else bI) :: states
      }
      (states.mkString, math.max(vE, vI))
    }
    (1 to 5).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val streams = (1L to 30L).map { u =>
        u -> Seq.fill(8)(types(rnd.nextInt(types.size)))
      }
      val rows = streams.flatMap { case (u, obs) =>
        obs.zipWithIndex.map { case (o, i) => (u, (i + 1) * 5L, i.toLong, o) }
      }
      val got = Sessionize.viterbiDecode(
          rows.toDF("user_id", "ts_ms", "event_id", "event_type"), steps = 8)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
        .toMap
      val expected = streams.map { case (u, obs) => u -> refViterbi(obs) }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  // ---- matrixProfile vs brute force --------------------------------------

  test("fuzz: matrixProfile matches brute-force z-norm distances on " +
      "random integer series") {
    val (m, excl) = (6, 3)
    (1 to 4).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val n = 40 + rnd.nextInt(20)
      val xs = Array.fill(n)(rnd.nextInt(50).toLong)
      def stats(i: Int) = {
        val w = xs.slice(i, i + m)
        (w.sum, w.map(v => v * v).sum)
      }
      def dist(i: Int, j: Int): Option[Double] = {
        val (sxi, sxxi) = stats(i); val (sxj, sxxj) = stats(j)
        val vi = m * sxxi - sxi * sxi; val vj = m * sxxj - sxj * sxj
        if (vi <= 0 || vj <= 0) None
        else {
          val q = (0 until m).map(t => xs(i + t) * xs(j + t)).sum
          val corr = (m.toDouble * q - sxi.toDouble * sxj) /
            (math.sqrt(vi.toDouble) * math.sqrt(vj.toDouble))
          Some(r6(math.sqrt(math.max(0.0, 2.0 * m * (1.0 - corr)))))
        }
      }
      val nw = n - m + 1
      val expected = (0 until nw).flatMap { i =>
        val cands = (0 until nw)
          .filter(j => math.abs(j - i) >= excl)
          .flatMap(j => dist(i, j).map(d => (d, j.toLong)))
        if (cands.isEmpty) None
        else {
          val (d, j) = cands.min
          Some(i.toLong -> ((j, d)))
        }
      }.toMap
      val got = TimeSeries.matrixProfile(
          xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }.toSeq
            .toDF("t", "x"),
          "t", "x", m = m, excl = excl)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  // ---- expectedHittingTime / removalEffect vs dense recursions -----------

  private def randStreams(seed: Int): Seq[(Long, Long, Long, String)] = {
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rnd = new java.util.Random(seed)
    (1L to 25L).flatMap { u =>
      val len = 4 + rnd.nextInt(6)
      (0 until len).map(i =>
        (u, (i + 1) * 7L, i.toLong, types(rnd.nextInt(types.size))))
    }
  }

  private def chainOf(rows: Seq[(Long, Long, Long, String)])
      : (Map[(String, String), Long], Map[String, Long]) = {
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, ev) =>
      val obs = ev.sortBy(e => (e._2, e._3)).map(_._4)
      obs.zip(obs.tail)
    }
    val n = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rs = n.toSeq.groupBy(_._1._1)
      .map { case (f, v) => f -> v.map(_._2).sum }
    (n, rs)
  }

  test("fuzz: expectedHittingTime matches a dense micro-grid recursion") {
    (1 to 5).foreach { seed =>
      val rows = randStreams(seed)
      val (n, rs) = chainOf(rows)
      val states = rs.keys.toSeq.sorted
      var em = states.map(_ -> 0L).toMap
      (1 to 8).foreach { _ =>
        em = states.map { s =>
          if (s == "purchase") s -> 0L
          else s -> (1000000L + states.flatMap { t =>
            n.get((s, t)).map(c =>
              math.round((c.toDouble / rs(s)) * em(t)))
          }.sum)
        }.toMap
      }
      val expected = states.map(s => s -> r6(em(s) / 1e6)).toMap
      val got = Sessionize.expectedHittingTime(
          rows.toDF("user_id", "ts_ms", "event_id", "event_type"),
          "purchase", horizon = 8)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("fuzz: removalEffect matches a dense absorption recursion per " +
      "scenario") {
    (1 to 5).foreach { seed =>
      val rows = randStreams(seed)
      val (n, rs) = chainOf(rows)
      val states = rs.keys.toSeq.sorted
      val firsts = rows.groupBy(_._1).toSeq
        .map { case (_, ev) => ev.minBy(e => (e._2, e._3))._4 }
      val fn = firsts.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
      val ft = fn.values.sum
      def pconv(removed: Option[String]): Long = {
        val alive = states.filterNot(removed.contains)
        var em = alive.map(_ -> 0L).toMap
        (1 to 8).foreach { _ =>
          em = alive.map { s =>
            if (s == "purchase") s -> 0L
            else s -> alive.flatMap { t =>
              n.get((s, t)).map { c =>
                val v = if (t == "purchase") 1000000L else em(t)
                math.round((c.toDouble / rs(s)) * v)
              }
            }.sum
          }.toMap
        }
        fn.toSeq.flatMap { case (s, f) =>
          em.get(s).map(e => math.round((f.toDouble / ft) * e))
        }.sum
      }
      val pb = pconv(None)
      val expected = states.filterNot(_ == "purchase").map { ch =>
        val pm = pconv(Some(ch))
        ch -> ((r6(pb / 1e6), r6(pm / 1e6),
          r6((pb - pm).toDouble / math.max(pb, 1L))))
      }.toMap
      val got = Sessionize.removalEffect(
          rows.toDF("user_id", "ts_ms", "event_id", "event_type"),
          "purchase", horizon = 8)
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  // ---- targetEncodeLoo / cemAtt vs plain folds ----------------------------

  test("fuzz: targetEncodeLoo and cemAtt match plain Scala group-folds") {
    (1 to 5).foreach { seed =>
      val rnd = new java.util.Random(seed)
      val rows = (1L to 80L).map { id =>
        (id, s"c${rnd.nextInt(5)}", rnd.nextInt(2), 1L + rnd.nextInt(3),
          rnd.nextInt(4).toLong, rnd.nextInt(20).toLong)
      } // (id, cat, y, x1, x2, yo)
      val m = 7L
      val df = rows.toDF("id", "cat", "y", "x1", "x2", "yo")
      // LOO encode
      val sg = rows.map(_._3.toLong).sum
      val prior = sg.toDouble / rows.size
      val byCat = rows.groupBy(_._2)
      val expEnc = rows.map { r =>
        val g = byCat(r._2)
        val sc = g.map(_._3.toLong).sum
        r._1 -> r6((sc - r._3 + m * prior) / (g.size - 1 + m).toDouble)
      }.toMap
      val gotEnc = Eval.targetEncodeLoo(df, "cat", "y", Seq("id"), m = m)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      assert(gotEnc == expEnc, s"seed=$seed (encode)")
      // CEM ATT on (x1, x2) strata, treatment y, outcome yo
      val cells = rows.groupBy(r => (r._4, r._5)).values.toSeq
      val matched = cells.filter(c =>
        c.exists(_._3 == 1) && c.exists(_._3 == 0))
      val nt = matched.map(_.count(_._3 == 1).toLong).sum
      // SQL ROUND is half-AWAY-FROM-ZERO; Scala math.round is half-up
      // (they disagree on negative .5s, and stratum diffs go negative)
      def roundAway(x: Double) =
        if (x >= 0) math.round(x) else -math.round(-x)
      val sw = matched.map { c =>
        val t = c.filter(_._3 == 1); val ct = c.filter(_._3 == 0)
        roundAway(t.size *
          (t.map(_._6).sum.toDouble / t.size -
            ct.map(_._6).sum.toDouble / ct.size) * 1000)
      }.sum
      val gotCem = Eval.cemAtt(df, "y", "yo", "x1", "x2").collect().head
      assert(gotCem.getLong(0) == matched.size.toLong, s"seed=$seed")
      assert(gotCem.getLong(1) == nt, s"seed=$seed")
      assert(gotCem.getDouble(3) == r6(sw.toDouble / 1000 / nt),
        s"seed=$seed (att)")
    }
  }
}
