package graft

import graft.operators.{Multimodal, Profiling}
import org.apache.spark.sql.functions._

/** Round-10 continuation: voice-activity segmentation over the frame
  * energies (exact integer threshold + gaps-and-islands) and the
  * Benjamini–Yekutieli dependence-robust FDR variant. */
class Round10hOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("activitySegments: islands split on quiet frames, exact sums") {
    // threshold 10: active <=> sumsq > 100*n; n=4 per frame
    val frames = Seq((1L, 0L, 4L, 500L), (1L, 1L, 4L, 600L),
      (1L, 2L, 4L, 100L), (1L, 3L, 4L, 900L), (1L, 4L, 4L, 50L),
      (1L, 5L, 4L, 401L))
      .toDF("doc_id", "frame", "n_samples", "sumsq")
    val out = Multimodal.activitySegments(frames, thresholdAmp = 10L)
      .orderBy("start_frame").collect()
    assert(out.map(r => (r.getAs[Long]("start_frame"),
      r.getAs[Long]("end_frame"), r.getAs[Long]("n_frames"))).toSeq ==
      Seq((0L, 1L, 2L), (3L, 3L, 1L), (5L, 5L, 1L)))
    assert(out(0).getAs[Long]("sumsq") == 1100L)
    assert(out(0).getAs[Double]("rms") == 11.726039)
    assert(out(1).getAs[Double]("rms") == 15.0)
  }

  test("synthesizeWavGated: every third frame decodes to exact silence") {
    val media = Seq((7L, Multimodal.synthesizeWavGated(200, 600)))
      .toDF("doc_id", "content")
    val frames = Multimodal.wavFrameEnergy(media, frameLen = 200)
      .toDF().orderBy("frame").collect()
    assert(frames.length == 3)
    assert(frames(0).getAs[Long]("sumsq") == 0L) // gated frame 0
    assert(frames(1).getAs[Long]("sumsq") > 0L)
    val seg = Multimodal.activitySegments(
      Multimodal.wavFrameEnergy(media, frameLen = 200).toDF()).collect()
    assert(seg.map(r => (r.getAs[Long]("start_frame"),
      r.getAs[Long]("end_frame"))).toSeq == Seq((1L, 2L)))
  }

  test("pqEncode: nearest codeword per subspace, exact L2, low-code ties") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), // codeword 0 (lowest id)
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)), // codeword 1
      (3L, Seq(1.0f, 0.25f, 0.0f, 0.75f)),
      (4L, Seq(0.0f, 1.0f, 1.0f, 0.0f)), // exact copy of codeword 1
      (5L, Seq(0.5f, 0.5f, 0.5f, 0.5f))) // equidistant -> code 0
      .toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(emb, m = 2, k = 2)
      .orderBy("vec_id", "subspace").collect()
    def row(v: Long, s: Long) = out.find(r =>
      r.getAs[Long]("vec_id") == v && r.getAs[Long]("subspace") == s).get
    assert(row(1L, 0L).getAs[Long]("code") == 0L) // codewords self-assign
    assert(row(1L, 0L).getAs[Long]("dist2") == 0L)
    assert(row(2L, 1L).getAs[Long]("code") == 1L)
    assert(row(3L, 0L).getAs[Long]("code") == 0L)
    assert(row(3L, 0L).getAs[Long]("dist2") == 1048576L) // (0.25*4096)^2
    assert(row(3L, 1L).getAs[Long]("dist2") == 1048576L)
    assert(row(4L, 0L).getAs[Long]("code") == 1L)
    assert(row(4L, 0L).getAs[Long]("dist2") == 0L)
    assert(row(5L, 0L).getAs[Long]("code") == 0L) // tie -> lowest code
    assert(row(5L, 1L).getAs[Long]("code") == 0L)
  }

  test("pqAdcTopK: lookup-table sums rank by code distance, self excluded") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)), // codeword 0
      (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)), // codeword 1
      (3L, Seq(1.0f, 0.25f, 0.0f, 0.75f)), // codes (0,0)
      (4L, Seq(0.0f, 1.0f, 1.0f, 0.0f)), // codes (1,1)
      (5L, Seq(1.0f, 0.0f, 0.0f, 1.0f))) // codes (0,0)
      .toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopK(
      emb.filter(col("vec_id") === 3L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      emb, m = 2, k = 2, topK = 10).orderBy("rank").collect()
    // q3's table: d2(s,c0)=1048576, d2(s,c1)=26214400 per subspace
    assert(out.map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Long]("adc_dist2"))).toSeq == Seq(
      (1L, 2097152L), (5L, 2097152L), // code-(0,0) corpus, id tie-break
      (2L, 52428800L), (4L, 52428800L)))
  }

  test("l2TopK + pqRecall: codeword-only corpus is recalled perfectly") {
    import graft.operators.Similarity
    // every corpus vector IS a codeword (k = n) -> ADC distance equals
    // the exact L2, so recall@k must be 1.0
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)), (4L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") <= 2L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val bf = Similarity.l2TopK(q, emb, topK = 3).collect()
    assert(bf.count(_.getAs[Long]("qid") == 1L) == 3)
    // q1's nearest: all others at 2*4096^2, id order 2,3,4
    assert(bf.filter(_.getAs[Long]("qid") == 1L)
      .map(_.getAs[Long]("vec_id")).toSeq == Seq(2L, 3L, 4L))
    assert(bf.forall(_.getAs[Long]("dist2") == 2L * 4096 * 4096))
    val rec = Similarity.pqRecall(q, emb, m = 2, k = 4, topK = 3).collect()
    assert(rec.length == 2)
    assert(rec.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("aucDeLongCi: exact placements, pinned DeLong interval") {
    import graft.operators.Eval
    // pos {3, 5}, neg {1, 4}: AUC 3/4; placements V = {2,4}, W = {4,2}
    val df = Seq((3L, true), (5L, true), (1L, false), (4L, false))
      .toDF("score", "y")
    val r = Eval.aucDeLongCi(df, "score", "y").head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("sv") == 6L && r.getAs[Long]("sw") == 6L)
    assert(r.getAs[Double]("auc") == 0.75)
    assert(r.getAs[Double]("se") == 0.353553)
    assert(r.getAs[Double]("ci_lo") == 0.057049)
    assert(r.getAs[Double]("ci_hi") == 1.442951)
  }

  test("powerAnalysis: pinned n_required and MDE from exact moments") {
    import graft.operators.Eval
    val df = Seq(10L, 20L, 30L, 40L).map(("k", _)).toDF("k", "v")
    val r = Eval.powerAnalysis(df, "k", "v", delta = 10L).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("variance") == 166.666667)
    assert(r.getAs[Long]("n_required") == 27L)
    assert(r.getAs[Double]("mde") == 25.574855)
    val tiny = Seq(5L).map(("k", _)).toDF("k", "v")
    val t = Eval.powerAnalysis(tiny, "k", "v", delta = 10L).head()
    assert(t.isNullAt(t.fieldIndex("variance")))
    assert(t.isNullAt(t.fieldIndex("n_required")))
  }

  test("powerProportion: pinned n_required/MDE, degenerate rates null") {
    import graft.operators.Eval
    val users = (Seq.fill(3)(true) ++ Seq.fill(7)(false))
      .map(("k", _)).toDF("k", "c")
    val r = Eval.powerProportion(users, "k", "c", deltaPpm = 100000L)
      .head()
    assert(r.getAs[Long]("n") == 10L && r.getAs[Long]("x") == 3L)
    assert(r.getAs[Double]("p") == 0.3)
    assert(r.getAs[Long]("n_required") == 330L)
    assert(r.getAs[Double]("mde") == 0.574154)
    val all = Seq.fill(5)(true).map(("k", _)).toDF("k", "c")
    val a = Eval.powerProportion(all, "k", "c", deltaPpm = 100000L).head()
    assert(a.isNullAt(a.fieldIndex("n_required")))
  }

  test("tCloseness: exact ordered EMD against the global distribution") {
    // A: {0,0,0,1}, B: {1,1,1,1}; global {0:3, 1:5}, m=2
    // EMD(A) = |3*8-3*4| / (4*8*1) = 0.375; EMD(B) = |0-12|/32 = 0.375
    val rows = Seq(("A", 0L), ("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 1L), ("B", 1L), ("B", 1L), ("B", 1L))
      .toDF("grp", "v")
    val out = Profiling.tCloseness(rows, Seq("grp"), "v", t = 0.2)
      .orderBy("grp").collect()
    assert(out.map(_.getAs[Double]("emd")).toSeq == Seq(0.375, 0.375))
    assert(out.forall(!_.getAs[Boolean]("t_close"))) // both skew past 0.2
    val loose = Profiling.tCloseness(rows, Seq("grp"), "v", t = 0.4)
      .orderBy("grp").collect()
    assert(loose.forall(_.getAs[Boolean]("t_close")))
    // a group matching the global distribution exactly has EMD 0
    val bal = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))
      .toDF("grp", "v")
    val b = Profiling.tCloseness(bal, Seq("grp"), "v", t = 0.2).collect()
    assert(b.forall(_.getAs[Double]("emd") == 0.0))
  }

  test("byFdr: the harmonic penalty rejects fewer than BH") {
    val tests = Seq(("a", 0.001), ("b", 0.02), ("c", 0.04), ("d", 0.5))
      .toDF("seg", "p")
    val by = Profiling.byFdr(tests, Seq("seg"), "p", qPpm = 100000L)
      .orderBy("p_rank").collect()
    assert(by.head.getAs[Long]("hm_micro") == 2083333L) // 1e6*(1+1/2+1/3+1/4)
    assert(by.head.getAs[Long]("k_star") == 2L)
    assert(by.map(_.getAs[Boolean]("rejected")).toSeq ==
      Seq(true, true, false, false))
    // BH at the same q admits rank 3 (0.04 <= 3*0.025)
    val bh = Profiling.bhFdr(tests, Seq("seg"), "p", qPpm = 100000L)
      .orderBy("p_rank").collect()
    assert(bh.map(_.getAs[Boolean]("rejected")).toSeq ==
      Seq(true, true, true, false))
  }
}
