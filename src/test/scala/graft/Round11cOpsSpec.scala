package graft

import graft.operators.{Similarity, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-11 wave 3: n-gram novelty (arrival-order diversity),
  * simplified centroid silhouette (cluster quality on the IVF
  * partition), and the Page–Hinkley drift detector. */
class Round11cOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("ngramNovelty: earliest doc owns a shared n-gram exactly once") {
    val docs = Seq(
      (1L, "a b c d"),        // grams: a_b_c, b_c_d — all novel
      (2L, "a b c e"),        // a_b_c seen; b_c_e novel
      (3L, "a b c d"))        // both grams seen
      .toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
      r.getAs[Long]("n_novel"), r.getAs[Double]("novelty"))).toSeq ==
      Seq((1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 2L, 0L, 0.0)))
  }

  test("ngramNovelty: too-short docs drop by contract") {
    val docs = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", 3)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
  }

  test("silhouetteCells: tight own-cluster scores high; a centroid scores 1") {
    // 4-dim unit-ish vectors: ids 0,1 are the (lowest-id) centroids.
    // id 2 sits almost ON centroid 0 -> s near 1; id 3 sits between.
    val e = Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1.0f, 0f, 0f)),
      (2L, Seq(0.999f, 0.04f, 0f, 0f)),
      (3L, Seq(0.8f, 0.6f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.silhouetteCells(e, nCentroids = 2)
      .orderBy("cell").collect()
    val c0 = out.find(_.getAs[Long]("cell") == 0L).get
    // centroid 0's own distance is 0 -> its s = 1; member 2 is ~1 too
    assert(c0.getAs[Long]("n") == 3L)
    assert(c0.getAs[Double]("s_mean") > 0.5)
    val c1 = out.find(_.getAs[Long]("cell") == 1L).get
    assert(c1.getAs[Long]("n") == 1L)
    assert(c1.getAs[Double]("s_mean") == 1.0) // the centroid itself
  }

  test("pageHinkley: a level shift alarms at the first post-shift bucket") {
    // flat 100 for 6 buckets, then 200: the running mean lags, so the
    // term jumps by ~+100 - delta per bucket after the shift
    val vs = Seq.fill(6)(100L) ++ Seq.fill(4)(200L)
    val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("k", "b", "v")
    val r = TimeSeries.pageHinkley(df, "k", "b", "v",
      delta = 10L, lambda = 120L).head()
    assert(r.getAs[Boolean]("drift"))
    // gap crosses 120 on the second post-shift bucket:
    // b=6 term ~ +85.7, b=7 term ~ +77.5 -> cumulative gap > 120 at b=7
    assert(r.getAs[Long]("first_alarm_bucket") == 7L)
    assert(r.getAs[Double]("max_gap") > 120.0)
    // a flat series never alarms (terms hover at -delta)
    val flat = Seq.fill(8)(100L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "b", "v")
    val rf = TimeSeries.pageHinkley(flat, "k", "b", "v",
      delta = 10L, lambda = 120L).head()
    assert(!rf.getAs[Boolean]("drift"))
    assert(rf.isNullAt(rf.fieldIndex("first_alarm_bucket")))
  }
}
