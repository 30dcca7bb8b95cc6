package graft

import graft.operators.Graph

/** Fixed-iteration PageRank vs an in-memory reference on random digraphs. */
class GraphSpec extends SparkFunSuite {
  import spark.implicits._

  private def prRef(
      edges: Seq[(Long, Long)],
      iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = verts.size.toDouble
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toDouble }
    val in = e.groupBy(_._2)
    var pr = verts.map(v => v -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      pr = verts.map { v =>
        val mass = in.getOrElse(v, Seq.empty).map { case (s, _) => pr(s) / out(s) }.sum
        v -> ((1.0 - d) / n + d * mass)
      }.toMap
    }
    pr.map { case (v, p) =>
      v -> BigDecimal(p).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  private def randomEdges(seed: Long): Seq[(Long, Long)] = {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(8, 60)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
    } yield es.filter { case (a, b) => a != b }
    gen(Gen.Parameters.default, rng.Seed(seed)).get
  }

  test("pageRank property: equals in-memory reference incl. dangling and source-only nodes") {
    (1 to 8).foreach { sample =>
      val edges = randomEdges(sample.toLong)
      if (edges.nonEmpty) {
        val expected = prRef(edges, iters = 5)
        val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 5)
          .as[(Long, Double)].collect().toMap
        assert(got.keySet === expected.keySet, s"sample $sample vertex sets")
        got.foreach { case (v, p) =>
          assert(math.abs(p - expected(v)) <= 2e-8, s"sample $sample vertex $v: $p vs ${expected(v)}")
        }
      }
    }
  }

  test("pageRank mass: total rank <= 1 and equals 1 when no dangling nodes") {
    // a cycle has no dangling vertices: mass is conserved exactly
    val cycle = (0L to 9L).map(i => (i, (i + 1) % 10))
    val total = Graph.pageRank(cycle.toDF("src", "dst"), "src", "dst", iters = 5)
      .agg(org.apache.spark.sql.functions.sum("pagerank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-6)
    // dangling sink leaks mass: total strictly below 1
    val chain = Seq((1L, 2L), (2L, 3L))
    val leaked = Graph.pageRank(chain.toDF("src", "dst"), "src", "dst", iters = 5)
      .agg(org.apache.spark.sql.functions.sum("pagerank")).as[Double].head()
    assert(leaked < 1.0 - 1e-3)
  }

  test("bfsHops property: equals brute-force BFS distances, absent beyond maxHops") {
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val edges = randomEdges(sample.toLong + 20L)
      if (edges.nonEmpty) {
        val seeds = Seq(0L, 1L)
        val maxHops = 3
        // brute force: level-synchronous BFS over the directed edge list
        val adj = edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
        var dist = seeds.map(_ -> 0L).toMap
        (1 to maxHops).foreach { h =>
          val frontier = dist.collect { case (v, d) if d == h - 1 => v }
          frontier.flatMap(v => adj.getOrElse(v, Seq.empty)).foreach { n =>
            if (!dist.contains(n)) dist += n -> h.toLong
          }
        }
        val got = graft.operators.Graph.bfsHops(
            edges.toDF("src", "dst"), seeds.toDF("id"), maxHops)
          .as[(Long, Long)].collect().toMap
        assert(got === dist, s"sample $sample")
      }
    }
  }

  test("triangleCounts property: equals brute-force enumeration on random graphs") {
    (1 to 8).foreach { sample =>
      val edges = randomEdges(sample.toLong + 40L)
      if (edges.nonEmpty) {
        // brute force: canonical undirected edge set, enumerate a < b < c
        val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .filter { case (a, b) => a != b }.distinct.toSet
        val verts = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
        val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for {
          a <- verts; b <- verts if a < b && und((a, b))
          c <- verts if b < c && und((b, c)) && und((a, c))
        } { expected(a) += 1; expected(b) += 1; expected(c) += 1 }
        val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        assert(got === expected.toMap, s"sample $sample")
      }
    }
  }

  test("triangleCounts ignores self-loops, duplicates, and reversed duplicates") {
    // K4 with noise: every vertex sits on C(3,2) = 3 triangles
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val noisy = k4 ++ Seq((0L, 0L), (1L, 1L), (0L, 1L), (1L, 0L))
    val got = Graph.triangleCounts(noisy.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("pageRank rejects bad iteration count and damping") {
    val d = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(d, "src", "dst", iters = 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(d, "src", "dst", damping = 1.0) }
  }

  test("shortestPaths: hand graph — min over paths, parallel-edge min, round bound") {
    // 1 -> 2 (w 5), 1 -> 3 (w 1), 3 -> 2 (w 1): dist(2) = 2 via 3 after 2 rounds
    // parallel edge 1 -> 2 (w 9) must lose to w 5; vertex 4 unreachable (absent)
    val e = Seq((1L, 2L, 5L), (1L, 2L, 9L), (1L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val r1 = Graph.shortestPaths(e, seeds, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 === Map(1L -> 0L, 2L -> 5L, 3L -> 1L)) // one round: direct edges only
    val r2 = Graph.shortestPaths(e, seeds, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 0L, 2L -> 2L, 3L -> 1L))
  }

  test("shortestPaths property: equals brute-force bounded-hop Bellman-Ford") {
    import org.scalacheck.{Gen, rng}
    (1 to 6).foreach { sample =>
      val gen = for {
        n <- Gen.choose(5, 40)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 8L), Gen.choose(0L, 9L)))
      } yield rows.filter { case (a, b, _) => a != b }
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 800L)).get
      val rounds = 3
      // brute force: repeat relaxation over the min-reduced edge set
      val edges = raw.groupBy(r => (r._1, r._2)).map { case ((a, b), ws) => (a, b, ws.map(_._3).min) }
      var dist = Map(1L -> 0L)
      (1 to rounds).foreach { _ =>
        val relaxed = edges.flatMap { case (a, b, w) => dist.get(a).map(d => b -> (d + w)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (k, ds) => k -> ds.map(_._2).min }
      }
      val got = Graph.shortestPaths(raw.toDF("src", "dst", "w").repartition(5),
          Seq(1L).toDF("id"), rounds)
        .as[(Long, Long)].collect().toMap
      assert(got === dist, s"sample $sample")
    }
  }
}
