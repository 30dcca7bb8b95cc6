package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-11 wave 5: hashing-trick featurizer, vocabulary pruning
  * stats, and Neyman allocation. */
class Round11eOpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("featureHash: signed counts collide into hash(t) mod D; zeros drop") {
    val docs = Seq((1L, "x x x"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, "doc_id", "text", 64)
      .orderBy("doc_id", "dim").collect()
    // doc 1: |value| = 3 in x's dimension; sign is the hash sign
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.length == 1 && math.abs(d1.head.getAs[Long]("value")) == 3L)
    // doc 2: x and y in their own dims (or cancelled if they collide
    // with opposite signs — either way every emitted value is non-zero)
    assert(out.forall(_.getAs[Long]("value") != 0L))
    // same token -> same dim across docs
    val dimX = d1.head.getAs[Long]("dim")
    assert(out.filter(_.getAs[Long]("doc_id") == 2L)
      .exists(_.getAs[Long]("dim") == dimX))
  }

  test("vocabStats: rank/coverage off the (tf desc, token) order; flags") {
    // tf: a=4, b=2, c=1, d=1 (total 8); head at 50% coverage = {a}
    val docs = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabStats(docs, "doc_id", "text",
      minDf = 2L, coveragePpm = 500000L)
      .orderBy("rank").collect()
    assert(out.map(r => (r.getAs[String]("token"), r.getAs[Long]("tf"),
      r.getAs[Long]("df"), r.getAs[Long]("rank"))).toSeq ==
      Seq(("a", 4L, 2L, 1L), ("b", 2L, 2L, 2L),
        ("c", 1L, 1L, 3L), ("d", 1L, 1L, 4L)))
    assert(out.map(_.getAs[Double]("cum_share")).toSeq ==
      Seq(0.5, 0.75, 0.875, 1.0))
    assert(out.map(_.getAs[Boolean]("is_head")).toSeq ==
      Seq(true, false, false, false))
    assert(out.map(_.getAs[Boolean]("is_rare")).toSeq ==
      Seq(false, false, true, true))
  }

  test("neymanAllocation: budget splits by N_h * s_h; degenerate strata get 0") {
    // stratum a: n=4, sd 2 -> w = 8e6; stratum b: n=2, sd 0 (constant)
    // -> w 0; stratum c: n=1 -> no variance estimate -> w 0
    val df = Seq(("a", 1L), ("a", 5L), ("a", 1L), ("a", 5L),
      ("b", 7L), ("b", 7L), ("c", 9L)).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", totalN = 100L)
      .orderBy("g").collect()
    val a = out(0)
    assert(a.getAs[Long]("n_pop") == 4L)
    // sample sd of (1,5,1,5) = sqrt(16/3) = 2.309401
    assert(a.getAs[Double]("sd") == 2.309401)
    assert(a.getAs[Long]("w_micro") == 9237604L)
    assert(a.getAs[Long]("alloc") == 100L) // only stratum with weight
    assert(out(1).getAs[Long]("alloc") == 0L)
    assert(out(2).getAs[Long]("alloc") == 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("sd")))
  }
}
