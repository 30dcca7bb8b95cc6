package graft

import graft.operators.{Profiling, TextAnalysis}
import org.apache.spark.sql.functions._

/** SPRT sequential testing, count-min sketching, and Good–Turing
  * smoothing — checked against in-JVM brute-force walks/replays. */
class SeqTestSketchSpec extends SparkFunSuite {
  import spark.implicits._

  test("sprt: stops at the first Wald crossing, brute-force replay agrees") {
    val (incPos, incNeg, upper, lower) =
      Profiling.sprtConstants(0.2, 0.8, 0.05, 0.05)
    // all-successes arm crosses upper fast; all-failures arm crosses lower
    val rows =
      (1 to 10).map(i => ("win", i.toLong, i.toLong, true)) ++
        (1 to 10).map(i => ("lose", i.toLong, i.toLong, false)) ++
        (1 to 3).map(i => ("short", i.toLong, i.toLong, i % 2 == 0))
    val got = Profiling.sprt(rows.toDF("arm", "ms", "event_id", "y"),
      "arm", Seq("ms", "event_id"), "y", p0 = 0.2, p1 = 0.8)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // brute force per arm
    def walk(ys: Seq[Boolean]): (String, Long, Long) = {
      var cum = 0L
      for ((y, i) <- ys.zipWithIndex) {
        cum += (if (y) incPos else incNeg)
        if (cum >= upper) return ("accept_h1", i + 1L, cum)
        if (cum <= lower) return ("accept_h0", i + 1L, cum)
      }
      ("continue", ys.size.toLong, cum)
    }
    assert(got("win") == walk(Seq.fill(10)(true)))
    assert(got("lose") == walk(Seq.fill(10)(false)))
    assert(got("short") == walk(Seq(false, true, false)))
    assert(got("win")._1 == "accept_h1" && got("lose")._1 == "accept_h0")
    assert(got("short")._1 == "continue")
  }

  test("countMin: estimates dominate exact counts; exact column is right") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b x")).toDF("doc_id", "text")
    val got = TextAnalysis.countMinEstimate(docs,
      probes = Seq("a", "b", "c", "nope"), d = 4, w = 64)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got("a")._1 == 4L && got("b")._1 == 3L && got("c")._1 == 1L)
    assert(got("nope")._1 == 0L)
    assert(got.values.forall(_._3), "CM estimate must never undercount")
  }

  test("orderStatistics: exact ceil-position quantiles, ties collapse") {
    import graft.operators.Eval
    val df = (1L to 10L).toDF("v")
    val got = Eval.orderStatistics(df, "v",
      Seq((1, 4), (1, 2), (3, 4), (99, 100))).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got((1L, 4L)) == (3L, 3L))   // ceil(2.5) = 3rd -> 3
    assert(got((1L, 2L)) == (5L, 5L))   // 5th -> 5
    assert(got((3L, 4L)) == (8L, 8L))   // ceil(7.5) = 8th -> 8
    assert(got((99L, 100L)) == (10L, 10L))
    val tied = Seq(1L, 1L, 1L, 9L).toDF("v")
    val t = Eval.orderStatistics(tied, "v", Seq((1, 2))).head()
    assert(t.getLong(3) == 2L && t.getLong(4) == 1L) // pos 2 inside the tie block
  }

  test("logTemplates: rare tokens wildcard, position order preserved") {
    import graft.operators.TextAnalysis
    val lines = Seq((1L, "a x1 b"), (2L, "a x2 b"), (3L, "a x3 b"),
      (4L, "b a")).toDF("id", "line")
    val got = TextAnalysis.logTemplates(lines, "id", "line", minDf = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a <*> b") == 3L)
    assert(got("b a") == 1L) // order matters; a/b frequent so kept verbatim
    assert(got.size == 2)
  }

  test("quantileNormalize: both groups land on the pooled distribution") {
    import graft.operators.Normalize
    // a={1,2}, b={10,20}; pooled={1,2,10,20}; midrank p=.5 -> pos 2 -> 2,
    // p=1 -> pos 4 -> 20: both groups normalize to {2, 20}
    val df = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L)).toDF("g", "v")
    val got = Normalize.quantileNormalize(df, "g", "v", binSize = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(got == Map(("a", 1L) -> 2L, ("a", 2L) -> 20L,
      ("b", 10L) -> 2L, ("b", 20L) -> 20L))
  }

  test("rendezvousAssign: consistent — removing a shard only moves its ids") {
    import graft.operators.Layout
    val ids = (1L to 200L).toDF("id")
    val with8 = Layout.rendezvousAssign(ids, "id", 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val with7 = Layout.rendezvousAssign(ids, "id", 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(with8.values.toSet.size >= 6, "assignments should spread")
    // THE rendezvous property: ids not on the removed shard 7 stay put
    val stayers = with8.filter(_._2 != 7L)
    assert(stayers.forall { case (id, s) => with7(id) == s })
    assert(with8.values.exists(_ == 7L)) // and some ids did move
  }

  test("goodTuring: adjacency is exact r+1, absent next bucket gives 0") {
    // freqs: a:3, b:1, c:1, d:2 -> N_1=2, N_2=1, N_3=1
    val docs = Seq((1L, "a a a b c d d")).toDF("doc_id", "text")
    val got = TextAnalysis.goodTuring(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (2L, 1.0)) // 2*N_2/N_1 = 2*1/2
    assert(got(2L) == (1L, 3.0)) // 3*N_3/N_2 = 3*1/1
    assert(got(3L) == (1L, 0.0)) // N_4 absent
  }
}
