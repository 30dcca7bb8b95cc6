package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-10 continuation: the LLM-curation trio — DSIR unigram
  * importance weights (target-vs-corpus log ratios, micro-quantized
  * per token), linear-kernel MMD over embedding populations, and the
  * deterministic Rademacher random projection. Fixtures replicate the
  * shared-SQL chains by hand. */
class Round10eOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("dsirWeights: target-like docs score positive, off-target negative") {
    // target: d1 "a a b", d2 "a c"; source-only: d3 "b b c c"
    // ft: a=3 b=1 c=1 (nt=5); fs: a=b=c=3 (ns=9); v=3
    // rm(a)=round(1e6*ln(1.5))=405465, rm(b)=rm(c)=round(1e6*ln(0.75))=-287682
    val docs = Seq((1L, "a a b", true), (2L, "a c", true),
      (3L, "b b c c", false)).toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirWeights(docs, "tgt")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") == 3L)
    assert(out(0).getAs[Long]("s_micro") == 2 * 405465L - 287682L)
    assert(out(0).getAs[Double]("avg_log_ratio") == 0.174416)
    assert(out(1).getAs[Long]("s_micro") == 405465L - 287682L)
    assert(out(1).getAs[Double]("avg_log_ratio") > 0)
    assert(out(2).getAs[Long]("n_tokens") == 4L)
    assert(out(2).getAs[Long]("s_micro") == -4 * 287682L)
    assert(out(2).getAs[Double]("avg_log_ratio") == -0.287682)
  }

  test("mmdLinear: pinned mean gap; identical populations score 0") {
    val emb = Seq((0L, Seq(1.0f, 0.0f), true), (1L, Seq(0.0f, 1.0f), true),
      (2L, Seq(1.0f, 1.0f), false), (3L, Seq(1.0f, 1.0f), false))
      .toDF("vec_id", "embedding", "in_a")
    val r = Similarity.mmdLinear(emb, "in_a").head()
    assert(r.getAs[Long]("d") == 2L)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    // per dim: (0.5 - 1.0)^2 = 0.25 -> 2 dims -> 0.5
    assert(r.getAs[Long]("s_nano") == 500000000L)
    assert(r.getAs[Double]("mmd2") == 0.5)
    val same = Similarity.mmdLinear(
      Seq((0L, Seq(0.25f, -0.75f), true), (1L, Seq(0.25f, -0.75f), false))
        .toDF("vec_id", "embedding", "in_a"), "in_a").head()
    assert(same.getAs[Double]("mmd2") == 0.0)
  }

  test("mmdLinear: an empty side nulls the statistic") {
    val r = Similarity.mmdLinear(
      Seq((0L, Seq(1.0f, 2.0f), true)).toDF("vec_id", "embedding", "in_a"),
      "in_a").head()
    assert(r.isNullAt(r.fieldIndex("mmd2")))
  }

  test("randomProjection: pinned signs, exact integer sums") {
    val out = Similarity.randomProjection(
      Seq((7L, Seq(1.0f, -0.5f))).toDF("vec_id", "embedding"), k = 2)
      .orderBy("j").collect()
    assert(out.map(_.getAs[Long]("y_q")).toSeq == Seq(6144L, -6144L))
    assert(out.map(_.getAs[Double]("y")).toSeq == Seq(1.5, -1.5))
  }

  test("randomProjection: sign matrix is balanced and decorrelated") {
    def sgn(i: Int, j: Int): Int =
      if (((i + 1).toLong * (j + 7) * 2654435761L) % 101 < 50) 1 else -1
    val cols = (0 until 4).map(j => (0 until 64).map(sgn(_, j)))
    cols.foreach(c => assert(math.abs(c.sum) <= 6))
    for (a <- 0 until 4; b <- (a + 1) until 4)
      assert(math.abs(cols(a).zip(cols(b)).map { case (x, y) => x * y }
        .sum) <= 16, s"columns $a,$b correlate")
  }
}
