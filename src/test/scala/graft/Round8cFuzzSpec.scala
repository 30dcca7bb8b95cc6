package graft

import graft.operators.{Graph, Similarity}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Cross-implementation fuzz for the session-3 kernels: each operator is
  * checked against an independent brute-force JVM reference on seeded
  * random inputs — the same discipline as CrossImplFuzzSpec. */
class Round8cFuzzSpec extends SparkFunSuite {
  import spark.implicits._

  test("kCore matches brute-force peeling on random sparse graphs") {
    val rnd = new Random(42)
    (1 to 5).foreach { trial =>
      val n = 30
      val edges = (0 until 60).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a)
      }.filter(e => e._1 != e._2).distinct
      val k = 2 + rnd.nextInt(2)
      // reference: iterative peeling on adjacency sets
      var adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .map { case (v, es) => v -> es.map(_._2).toSet }
      var changed = true
      while (changed) {
        val weak = adj.filter(_._2.size < k).keySet
        changed = weak.nonEmpty
        adj = (adj -- weak).map { case (v, ns) => v -> (ns -- weak) }
          .filter(_._2.nonEmpty)
      }
      val want = adj.map { case (v, ns) => v -> ns.size.toLong }
      val got = Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("core_deg")).toMap
      assert(got == want, s"trial $trial k=$k")
    }
  }

  test("KmvSketchAggregator estimate degrades gracefully, never crosses hashes") {
    import graft.functions.KmvSketchAggregator
    val rnd = new Random(7)
    val agg = new KmvSketchAggregator(32)
    (1 to 5).foreach { _ =>
      val hs = Seq.fill(500)(rnd.nextLong().abs % 1000000L)
      // random split into partial buffers, merged in random order ==
      // single-pass reduce
      val parts = hs.grouped(1 + rnd.nextInt(99)).toSeq
      val merged = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
        .foldLeft(agg.zero)(agg.merge)
      val direct = hs.foldLeft(agg.zero)(agg.reduce)
      assert(merged == direct)
      assert(direct == hs.distinct.sorted.take(32))
    }
  }

  test("mmrRerank equals a brute-force greedy reference on random pools") {
    val rnd = new Random(11)
    val dim = 4
    def vec() = Seq.fill(dim)((rnd.nextInt(200) - 100) / 100f)
    val corpus = (0L until 20L).map(i => (i, vec()))
      .map { case (i, v) => if (v.forall(_ == 0f)) (i, Seq(1f, 0f, 0f, 0f)) else (i, v) }
    val queries = Seq((100L, Seq(1f, 0.5f, -0.25f, 0f)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      math.rint(d / (na * nb) * 1e6) / 1e6
    }
    // reference greedy
    val rel = corpus.map { case (i, v) => i -> cos(queries.head._2, v) }.toMap
    val pool = rel.toSeq.sortBy { case (i, r) => (-r, i) }.take(10).map(_._1)
    val byId = corpus.toMap
    var selected = Vector(pool.minBy(i => (-rel(i), i)))
    (2 to 5).foreach { _ =>
      val cand = pool.filterNot(selected.contains)
      val pick = cand.minBy { c =>
        val maxsim = selected.map(s => cos(byId(c), byId(s))).max
        val score = math.rint((0.7 * rel(c) - 0.3 * maxsim) * 1e6) / 1e6
        (-score, c)
      }
      selected :+= pick
    }
    val got = Similarity.mmrRerank(
      queries.toDF("qid", "qvec"), corpus.toDF("vec_id", "embedding"),
      poolK = 10, selectK = 5)
      .collect().sortBy(_.getAs[Long]("pick_order")).map(_.getAs[Long]("vec_id"))
    assert(got.toVector == selected, s"got=${got.toVector} want=$selected")
  }

  test("gramCovariance matches a JVM accumulator on random float vectors") {
    val rnd = new Random(3)
    val d = 5
    val vs = Seq.fill(40)(Seq.fill(d)((rnd.nextInt(2000) - 1000) / 500f))
    val got = Similarity.gramCovariance(
      vs.map(Tuple1(_)).toDF("embedding").repartition(7), "embedding", 12)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r.getAs[Long]("s_ij"))
      .toMap
    // reference with the SAME quantization (BigDecimal HALF_UP = Spark round)
    def q(x: Float): Long =
      BigDecimal(x.toDouble * 4096.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = (for {
      i <- 0 until d; j <- i until d
    } yield (i.toLong, j.toLong) -> vs.map(v => q(v(i)) * q(v(j))).sum).toMap
    assert(got == want)
  }
}
