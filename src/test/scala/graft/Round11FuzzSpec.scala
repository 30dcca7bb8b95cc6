package graft

import graft.operators.{Graph, Profiling, Sampling, Sessionize}
import org.apache.spark.sql.functions._

/** Round-11 cross-implementation fuzz: the new order-statistics, graph,
  * and selection operators checked on RANDOM inputs against independent
  * Scala brute-force references (which share no code with the
  * DataFrame implementations) and against the operators' own axioms.
  * Deterministic seeds — the runs replay exactly. */
class Round11FuzzSpec extends SparkFunSuite {
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("exactQuantiles matches the sorted-array order statistic on random data") {
    (1 to 10).foreach { seed =>
      val r = rng(seed)
      val vs = Seq.fill(1 + r.nextInt(200))(r.nextInt(50).toLong)
      val qs = Seq(100000L, 250000L, 500000L, 750000L, 999999L)
      val out = Profiling.exactQuantiles(
          vs.map(("k", _)).toDF("k", "v"), "k", "v", qs)
        .collect().map(x => x.getAs[Long]("q_ppm") -> x.getAs[Long]("value"))
        .toMap
      val sorted = vs.sorted
      qs.foreach { q =>
        val k = ((q * vs.size + 999999L) / 1000000L).toInt
        assert(out(q) == sorted(k - 1),
          s"seed=$seed q=$q n=${vs.size}: ${out(q)} vs ${sorted(k - 1)}")
      }
    }
  }

  test("ksTwoSample matches the brute-force CDF supremum on random samples") {
    (1 to 10).foreach { seed =>
      val r = rng(seed)
      val a = Seq.fill(5 + r.nextInt(80))(r.nextInt(30).toLong)
      val b = Seq.fill(5 + r.nextInt(80))(r.nextInt(30).toLong)
      val row = Profiling.ksTwoSample(a.toDF("v"), b.toDF("v"), "v").head()
      val vals = (a ++ b).distinct.sorted
      val brute = vals.map { t =>
        math.abs(a.count(_ <= t).toLong * b.size -
          b.count(_ <= t).toLong * a.size)
      }.max
      assert(row.getAs[Long]("d_num") == brute, s"seed=$seed")
    }
  }

  test("tukeyFences outlier counts match a brute-force boxplot on random data") {
    (1 to 10).foreach { seed =>
      val r = rng(seed)
      val vs = Seq.fill(8 + r.nextInt(150))(r.nextInt(1000).toLong - 200L)
      val row = Profiling.tukeyFences(
        vs.map(("k", _)).toDF("k", "v"), "k", "v").head()
      val sorted = vs.sorted
      val q1 = sorted(((vs.size + 3) / 4) - 1)
      val q3 = sorted(((3 * vs.size + 3) / 4) - 1)
      val lo4 = 4 * q1 - 6 * (q3 - q1)
      val hi4 = 4 * q3 + 6 * (q3 - q1)
      assert(row.getAs[Long]("q1") == q1 && row.getAs[Long]("q3") == q3,
        s"seed=$seed")
      assert(row.getAs[Long]("n_low") == vs.count(4 * _ < lo4))
      assert(row.getAs[Long]("n_high") == vs.count(4 * _ > hi4))
    }
  }

  test("betweennessLandmarks tracks brute-force Brandes within quantization") {
    (1 to 6).foreach { seed =>
      val r = rng(seed)
      val nV = 6 + r.nextInt(6)
      val edges = (for {
        u <- 0 until nV; v <- (u + 1) until nV
        if r.nextDouble() < 0.35
      } yield (u.toLong, v.toLong)).distinct
      if (edges.nonEmpty) {
        val out = Graph.betweennessLandmarks(edges.toDF("src", "dst"),
            "src", "dst", nLandmarks = nV, maxHops = nV, topK = nV * 2)
          .collect()
          .map(x => x.getAs[Long]("v") -> x.getAs[Double]("betweenness"))
          .toMap
        // independent Brandes (adjacency lists, BFS per source, doubles)
        val adj = {
          val m = scala.collection.mutable.Map[Long, Set[Long]]()
            .withDefaultValue(Set.empty)
          edges.foreach { case (u, v) =>
            m(u) = m(u) + v; m(v) = m(v) + u }
          m
        }
        val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val lms = verts.take(nV)
        val ref = scala.collection.mutable.Map[Long, Double]()
          .withDefaultValue(0.0)
        lms.foreach { s =>
          val dist = scala.collection.mutable.Map(s -> 0)
          val sigma = scala.collection.mutable.Map(s -> 1.0)
            .withDefaultValue(0.0)
          val order = scala.collection.mutable.ArrayBuffer(s)
          var frontier: Set[Long] = Set(s)
          var d = 0
          while (frontier.nonEmpty) {
            d += 1
            // two-phase level BFS: collect sigma over ALL previous-level
            // parents before assigning, so multi-parent counts sum
            val newly = scala.collection.mutable.Map[Long, Double]()
            frontier.foreach { u =>
              adj(u).foreach { w =>
                if (!dist.contains(w))
                  newly(w) = newly.getOrElse(w, 0.0) + sigma(u)
              }
            }
            newly.keys.toSeq.sorted.foreach { w =>
              dist(w) = d; sigma(w) = newly(w); order += w
            }
            frontier = newly.keySet.toSet
          }
          val delta = scala.collection.mutable.Map[Long, Double]()
            .withDefaultValue(0.0)
          order.reverse.foreach { w =>
            adj(w).foreach { u =>
              if (dist.contains(u) && dist(u) == dist(w) - 1)
                delta(u) += sigma(u) / sigma(w) * (1 + delta(w))
            }
          }
          order.filter(_ != s).foreach(v => ref(v) += delta(v))
        }
        out.foreach { case (v, b) =>
          assert(math.abs(b - ref(v)) < 0.01,
            s"seed=$seed v=$v spark=$b ref=${ref(v)} edges=$edges")
        }
      }
    }
  }

  test("shapleyAttribution satisfies efficiency on random journeys") {
    (1 to 8).foreach { seed =>
      val r = rng(seed)
      val chans = Seq("A", "B", "C")
      val rows = (0 until 40).flatMap { u =>
        val touched = chans.filter(_ => r.nextDouble() < 0.5)
        val conv = r.nextDouble() < 0.4
        touched.map(c => (u.toLong, c)) ++
          (if (conv) Seq((u.toLong, "conv")) else Nil)
      }
      val explained = rows.groupBy(_._1).values.count(evs =>
        evs.exists(_._2 == "conv") && evs.exists(_._2 != "conv"))
      val out = Sessionize.shapleyAttribution(
        rows.toDF("user_id", "event_type"), chans, "conv").collect()
      // EXACT efficiency on the integer numerators: sum(phi*k!) must
      // equal explained-conversions * k! with zero tolerance (the
      // rounded phi column carries up to k*0.5e-6 rendering slack)
      val totalNum = out.map(_.getAs[Long]("phi_num")).sum
      assert(totalNum == explained * 6L,
        s"seed=$seed sum(phi_num)=$totalNum explained=$explained")
    }
  }

  test("greedyMaxCover: gains non-increasing, covered_total exact") {
    (1 to 6).foreach { seed =>
      val r = rng(seed)
      val docs = (0 until 20).map { i =>
        val words = Seq.fill(4 + r.nextInt(12))("w" + r.nextInt(30))
        (i.toLong, words.mkString(" "))
      }
      val out = Sampling.greedyMaxCover(
          docs.toDF("doc_id", "text"), k = 6, n = 3)
        .orderBy("step").collect()
      val gains = out.map(_.getAs[Long]("gain"))
      assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
        s"seed=$seed gains=${gains.toSeq}")
      // covered_total equals the recomputed distinct-gram union size
      val picked = out.map(_.getAs[Long]("doc_id")).toSet
      val grams = docs.filter(d => picked.contains(d._1))
        .flatMap(d => d._2.split(" ").sliding(3).map(_.mkString("_")))
        .toSet
      assert(out.last.getAs[Long]("covered_total") == grams.size,
        s"seed=$seed")
    }
  }
}
