package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-11: Lloyd-trained PQ codebooks and the ADC+exact-rerank tier
  * (the measured-recall upgrade — BASELINE.md r11 sweep), plus the
  * pqQuantized dimensionality guard. Hand fixtures replay the exact
  * integer centroid arithmetic. */
class Round11OpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def emb(vs: (Long, Seq[Double])*) =
    vs.map { case (id, e) => (id, e.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")

  test("pqCodebookTrained: one Lloyd step moves the codeword to the " +
      "half-away-from-zero integer mean") {
    // subspace 0 (dims 0-1): seeds are vec0=(0,0) and vec1=(410,410)
    // after 1/4096 quantization; vec2/vec3 join vec1's cluster, so
    // code1's coordinate mean is (410+4096+3686)/3 = 2730.67 -> 2731.
    val e = emb(
      0L -> Seq(0.0, 0.0, 0.5, 0.5),
      1L -> Seq(0.1, 0.1, 0.5, 0.5),
      2L -> Seq(1.0, 1.0, 0.5, 0.5),
      3L -> Seq(0.9, 0.9, 0.5, 0.5))
    val cb = Similarity.pqCodebookTrained(e, m = 2, k = 2, iters = 1)
      .filter(col("subspace") === 0L).orderBy("code", "i").collect()
    assert(cb.map(r => (r.getAs[Long]("code"), r.getAs[Long]("i"),
      r.getAs[Long]("cq"))).toSeq ==
      Seq((0L, 0L, 0L), (0L, 1L, 0L), (1L, 0L, 2731L), (1L, 1L, 2731L)))
  }

  test("pqCodebookTrained: iters = 0 degrades to the lowest-id seed") {
    val e = emb(
      0L -> Seq(0.0, 0.0, 0.5, 0.5),
      1L -> Seq(0.1, 0.1, 0.5, 0.5),
      2L -> Seq(1.0, 1.0, 0.5, 0.5))
    // iters = 0: codewords are verbatim quantized subvectors of the
    // two lowest ids (vec0 all-zero; vec1 = 0.1*4096 -> 410 on dims
    // 0-1 and 0.5*4096 -> 2048 on dims 2-3)
    val trained = Similarity.pqCodebookTrained(e, m = 2, k = 2, iters = 0)
      .orderBy("code", "subspace", "i").collect().toSeq
      .map(r => (r.getAs[Long]("code"), r.getAs[Long]("subspace"),
        r.getAs[Long]("i"), r.getAs[Long]("cq")))
    assert(trained == Seq(
      (0L, 0L, 0L, 0L), (0L, 0L, 1L, 0L),
      (0L, 1L, 2L, 2048L), (0L, 1L, 3L, 2048L),
      (1L, 0L, 0L, 410L), (1L, 0L, 1L, 410L),
      (1L, 1L, 2L, 2048L), (1L, 1L, 3L, 2048L)))
  }

  test("pqCodebookTrained: an emptied cluster keeps its previous codeword") {
    // duplicate seeds: every vector ties to both codewords and the
    // (d2, code) tie-break sends ALL of them to code 0 -> code 1 gets
    // no members and must retain its seed coordinates, not NULL out.
    val e = emb(
      0L -> Seq(0.0, 0.0, 0.0, 0.0),
      1L -> Seq(0.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.5, 0.5, 0.5, 0.5))
    val cb = Similarity.pqCodebookTrained(e, m = 2, k = 2, iters = 1)
      .orderBy("code", "subspace", "i").collect()
    val byCode = cb.groupBy(_.getAs[Long]("code"))
    // code 0 absorbed everything: mean of (0, 0, 2048) = 682.67 -> 683
    assert(byCode(0L).forall(_.getAs[Long]("cq") == 683L))
    // code 1 emptied: previous (seed) codeword retained
    assert(byCode(1L).forall(_.getAs[Long]("cq") == 0L))
    assert(cb.forall(!_.isNullAt(cb.head.fieldIndex("cq"))))
  }

  test("pqAdcRerankTopK: rerank covering the corpus equals exact l2TopK") {
    val e = emb((0L to 9L).map(i =>
      i -> Seq(0.01 * i, 0.03 * ((i * 7) % 5), 0.05 * ((i * 3) % 4),
        0.02 * ((i * 11) % 7))): _*)
    val q = e.filter(col("vec_id") < 2L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val exact = Similarity.l2TopK(q, e, topK = 3)
      .select("qid", "vec_id", "dist2", "rank")
      .orderBy("qid", "rank").collect().toSeq
    val rer = Similarity.pqAdcRerankTopK(q, e, m = 2, k = 2, topK = 3,
        rerank = 9, trainIters = 1)
      .select("qid", "vec_id", "dist2", "rank")
      .orderBy("qid", "rank").collect().toSeq
    assert(rer == exact)
  }

  test("ivfTopK cellCap: salt-splitting a hot cell is output-invariant") {
    // adversarial blob: 12 of 16 vectors share one tight direction, so
    // one cell goes hot; cellCap = 3 forces multi-salt splitting there
    val e = emb((0L to 15L).map { i =>
      if (i % 4 == 0L) i -> Seq(0.9, 0.1 * i, 0.05, 0.02 * i)
      else i -> Seq(0.124 + 0.0001 * i, 0.124, 0.124, 0.124)
    }: _*)
    val q = e.filter(col("vec_id") < 3L)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.select(col("vec_id"), col("embedding"))
    def run(cap: Int) = Similarity.ivfTopK(q, corpus, k = 5,
        nCentroids = 4, nprobe = 2, cellsPerVec = 2, cellCap = cap)
      .orderBy("qid", "rank").collect().toSeq
    val uncapped = run(0)
    assert(uncapped.nonEmpty)
    assert(run(3) == uncapped)
    assert(run(1) == uncapped) // every cell multi-salted
  }

  test("pqQuantized guard: dims not divisible by m fails fast") {
    val e = emb(0L -> Seq(0.1, 0.2, 0.3, 0.4))
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqEncode(e, m = 3, k = 1).collect()
    }
    assert(ex.getMessage.contains("divisible"))
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.pqEncode(e, m = 8, k = 1).collect()
    }
    assert(ex2.getMessage.contains("dims=4"))
  }
}
