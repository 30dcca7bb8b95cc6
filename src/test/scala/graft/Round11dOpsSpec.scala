package graft

import graft.operators.{Graph, Sampling}
import org.apache.spark.sql.functions._

/** Round-11 wave 4: Katz centrality (micro-long damped path counts)
  * and greedy maximum-coverage selection (exact-integer submodular
  * argmax). */
class Round11dOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("katzCentrality: pinned damped path counts on a 3-node chain") {
    // 1 -> 2 -> 3, alpha = 0.5, 2 iters (micro-longs):
    // x1: node1 = 1, node2 = 1 + .5 = 1.5, node3 = 1 + .5 = 1.5
    // x2: node1 = 1, node2 = 1 + .5*1 = 1.5, node3 = 1 + .5*1.5 = 1.75
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.katzCentrality(e, "src", "dst", iters = 2, alpha = 0.5)
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Double]("katz")))
      .toSeq == Seq((1L, 1.0), (2L, 1.5), (3L, 1.75)))
  }

  test("katzCentrality: a hub's prestige sums its incoming ranks") {
    // 3 spokes -> hub, 1 iter, alpha 0.1: hub = 1 + .1*3 = 1.3
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val out = Graph.katzCentrality(e, "src", "dst", iters = 1, alpha = 0.1)
      .orderBy("id").collect()
    assert(out.last.getAs[Double]("katz") == 1.3)
    assert(out.init.forall(_.getAs[Double]("katz") == 1.0))
  }

  test("greedyMaxCover: picks by marginal gain, stops when nothing gains") {
    // doc 1 covers grams {abc,bcd,cde} (3), doc 2 covers {abc,bcd} (2),
    // doc 3 covers {xyz grams} (2): greedy = doc1(3), doc3(2);
    // doc 2 is then fully covered and leaves the pool -> 2 picks only
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d"),
      (3L, "x y z w"))
      .toDF("doc_id", "text")
    val out = Sampling.greedyMaxCover(docs, "doc_id", "text", k = 5, n = 3)
      .orderBy("step").collect()
    assert(out.map(r => (r.getAs[Long]("step"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("gain"), r.getAs[Long]("covered_total"))).toSeq ==
      Seq((1L, 1L, 3L, 3L), (2L, 3L, 2L, 5L)))
  }

  test("betweennessLandmarks: hand-computed Brandes on the 4-path") {
    // path 1-2-3-4, all 4 vertices as landmarks, full horizon:
    // deltas per landmark sum to betweenness 0/4/4/0 (v = lm excluded;
    // inner vertices carry all the pair dependencies)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.betweennessLandmarks(e, "src", "dst",
      nLandmarks = 4, maxHops = 3, topK = 10)
      .orderBy(col("v")).collect()
    assert(out.map(r => (r.getAs[Long]("v"),
      r.getAs[Double]("betweenness"))).toSeq ==
      Seq((1L, 0.0), (2L, 4.0), (3L, 4.0), (4L, 0.0)))
    assert(out.forall(_.getAs[Long]("n_landmarks") == 3L))
  }

  test("betweennessLandmarks: sigma multiplicity splits dependencies") {
    // diamond 1-2-4, 1-3-4 (two shortest 1->4 paths): from landmark 1,
    // sigma(4) = 2 and delta(2) = delta(3) = (1/2)(1+0) = 0.5
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.betweennessLandmarks(e, "src", "dst",
      nLandmarks = 1, maxHops = 2, topK = 10)
      .orderBy(col("v")).collect()
    assert(out.map(r => (r.getAs[Long]("v"),
      r.getAs[Double]("betweenness"))).toSeq ==
      Seq((2L, 0.5), (3L, 0.5), (4L, 0.0)))
  }

  test("greedyMaxCover: argmax ties break on the lowest doc_id") {
    val docs = Seq((7L, "a b c"), (4L, "x y z")).toDF("doc_id", "text")
    val out = Sampling.greedyMaxCover(docs, "doc_id", "text", k = 1, n = 3)
      .collect()
    assert(out.head.getAs[Long]("doc_id") == 4L)
  }
}
