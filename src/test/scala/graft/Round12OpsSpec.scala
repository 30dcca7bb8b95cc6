package graft

import graft.operators.{Eval, Graph, Sampling, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-12: iterated BPE training (greedy merge semantics pinned by a
  * hand-derived fixture), largest-remainder Neyman allocation, and the
  * qiniDeciles integral-score guard. */
class Round12OpsSpec extends SparkFunSuite {
  import spark.implicits._

  test("bpeTrain: merge sequence, greedy left-to-right, tie-breaks") {
    // vocab: aaab x2, aaa x1, cab x1. Hand-derived rounds:
    //  1: (a,a) 6 (beats (a,b) 3) -> aaa segments GREEDILY to [aa,a],
    //     aaab to [aa,a,b] (left-to-right, no rescan of merged output)
    //  2: (a,b) 3 ties (aa,a) 3 -> l asc tie-break picks "a" < "aa"
    //  3: (aa,ab) 2   4: (aa,a) 1 ties (c,ab) 1 -> "aa" < "c"
    //  5: (c,ab) 1
    val docs = Seq((1L, "aaab aaab"), (2L, "aaa cab"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, rounds = 5)
      .orderBy("step")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L),
      (4L, "aa", "a", "aaa", 1L),
      (5L, "c", "ab", "cab", 1L)))
  }

  test("bpeTrain: stops early when no pairs remain") {
    // one 2-char word: round 1 merges it to a single symbol, rounds
    // 2+ have no adjacent pairs -> exactly one output row
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, rounds = 4).collect()
    assert(out.length == 1)
    assert(out(0).getString(3) == "ab" && out(0).getLong(4) == 2L)
  }

  test("bpeApply: the mid-training segmentation is the tokenization") {
    // after 2 of the 5 fixture merges ((a,a) then (a,b)):
    // aaab -> [aa, ab] x2, aaa -> [aa, a], cab -> [c, ab]
    val docs = Seq((1L, "aaab aaab"), (2L, "aaa cab"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeApply(docs, rounds = 2, k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("aa", 3L, 1L), ("ab", 3L, 2L), ("a", 1L, 3L), ("c", 1L, 4L)))
  }

  test("bpeFertility: per-source tokens/word and chars/token after merges") {
    // post-2-round segs: aaab=[aa,ab] (2 tok, 4 ch), aaa=[aa,a] (2, 3),
    // cab=[c,ab] (2, 3). x: aaab x2 -> tpw 4/2=2.0, cpt 8/4=2.0;
    // y: aaa+cab -> tpw 4/2=2.0, cpt 6/4=1.5
    val docs = Seq((1L, "x", "aaab aaab"), (2L, "y", "aaa cab"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.bpeFertility(docs, "source", rounds = 2)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("tokens_per_word"),
        r.getAs[Double]("chars_per_token")))
    assert(out.toSeq == Seq(
      ("x", 2L, 4L, 2.0, 2.0), ("y", 2L, 4L, 2.0, 1.5)))
  }

  test("neymanAllocation: allocations sum exactly to totalN (largest remainder)") {
    // three equal-weight strata, totalN = 100: 100/3 rounds to 33.33..
    // per stratum; floors are 33 and the single leftover unit goes to
    // the largest remainder (all tie -> lowest stratum value "a")
    val rows = Seq("a", "b", "c").flatMap { g =>
      Seq((g, 1L), (g, 5L), (g, 1L), (g, 5L))
    }
    val out = Sampling.neymanAllocation(rows.toDF("g", "v"), "g", "v",
        totalN = 100L)
      .orderBy("g").collect()
    val allocs = out.map(_.getAs[Long]("alloc")).toSeq
    assert(allocs.sum == 100L)
    assert(allocs == Seq(34L, 33L, 33L))
  }

  test("neymanAllocation: all-degenerate strata allocate nothing") {
    // zero-variance strata carry weight 0 -> no allocation at all
    // (the deficit must be 0, not totalN)
    val df = Seq(("a", 7L), ("a", 7L), ("b", 9L)).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", totalN = 50L)
      .collect()
    assert(out.map(_.getAs[Long]("alloc")).sum == 0L)
  }

  test("personalizedPageRank: hand-derived micro-long walk with restart") {
    // a->b, a->c, b->c; seed {a}, alpha 0.5, 2 rounds:
    //  x0: a=1e6. base(a)=round(0.5*1e6)=500000; odeg a=2, b=1
    //  r1: in b=500000 (1e6 div 2), c=500000; a=500000, b=250000, c=250000
    //  r2: in b=250000, c=250000+250000; a=500000, b=125000, c=250000
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val out = Graph.personalizedPageRank(e, seeds, iters = 2, alpha = 0.5)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 0.5), (2L, 0.125), (3L, 0.25)))
  }

  test("personalizedPageRank: seeds outside the graph are ignored; " +
      "restart mass splits across seeds") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L, 99L).map(Tuple1(_)).toDF("id")
    // ns = 2 (99 is not a vertex): x0 a=b=500000, base=round(.5*5e5)=250000
    // r1: in(b) = 500000 div 1 = 500000 -> a=250000, b=250000+250000
    val out = Graph.personalizedPageRank(e, seeds, iters = 1, alpha = 0.5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 0.25), (2L, 0.5)))
  }

  test("textRank: hub word dominates; hand-derived one-round scores") {
    // "a b a c a d": symmetric co-occurrence a<->{b,c,d}; ns=4,
    // r0=250000, base=round(.15*250000)=37500, odeg a=3, others 1.
    // round 1: in(a)=3*250000, in(x)=250000 div 3=83333 ->
    // a=37500+round(.85*750000)=675000; x=37500+round(.85*83333)=108333
    val docs = Seq((1L, "a b a c a d")).toDF("doc_id", "text")
    val out = TextAnalysis.textRank(docs, k = 4, iters = 1)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("a") == 0.675)
    assert(out("b") == 0.108333 && out("c") == 0.108333 &&
      out("d") == 0.108333)
  }

  test("ransacLine: recovers a planted line exactly where OLS is dragged") {
    // 40 points exactly on y = 3x + 10, 15 far-off outliers. At eps=0
    // only exact collinearity votes, so any candidate seeded from two
    // line points collects all 40 inliers and the OLS refit over them
    // returns slope 3, intercept 10 exactly; plain OLS over the full
    // set is dragged far off the line by the outliers.
    val line = (1L to 40L).map(x => (x, x, 3L * x + 10L))
    val outliers = (41L to 55L).map(i => (i, i - 40L, 10000L + 137L * i))
    val df = (line ++ outliers).toDF("id", "x", "y")
    val fit = TimeSeries.ransacLine(df, "id", "x", "y",
      nCand = 8, epsilon = 0L).head()
    assert(fit.getAs[Long]("n_inliers") == 40L)
    assert(fit.getAs[Long]("n_total") == 55L)
    assert(fit.getAs[Double]("slope") == 3.0)
    assert(fit.getAs[Double]("intercept") == 10.0)
    val ols = TimeSeries.trendOls(
      df.withColumn("k", lit(1L)), "k", "x", "y").head()
    assert(math.abs(ols.getAs[Double]("slope") - 3.0) > 10.0)
  }

  test("ransacLine: zero x-variance in the winner's inliers yields null fit") {
    // all points share x -> no candidate has dx != 0 -> empty output
    val df = Seq((1L, 5L, 1L), (2L, 5L, 2L), (3L, 5L, 3L))
      .toDF("id", "x", "y")
    assert(TimeSeries.ransacLine(df, "id", "x", "y", nCand = 4,
      epsilon = 10L).collect().isEmpty)
  }

  test("qiniDeciles: non-integral score column fails fast") {
    val u = Seq((1L, 0.9, true, true), (2L, 0.1, false, false))
      .toDF("uid", "score", "treated", "converted")
    val e = intercept[IllegalArgumentException] {
      Eval.qiniDeciles(u, "score", "treated", "converted", "uid")
    }
    assert(e.getMessage.contains("integral"))
  }
}
