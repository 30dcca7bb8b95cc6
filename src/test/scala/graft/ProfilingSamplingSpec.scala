package graft

import graft.operators.{Profiling, Sampling}
import org.apache.spark.sql.functions._

/** Round-6 continuation batch 2: profiling, weighted sampling, HLL merge
  * rollup, minhash-estimate accuracy. */
class ProfilingSamplingSpec extends SparkFunSuite {
  import spark.implicits._

  // ---- Profiling.profile

  test("profile: nulls, distinct, min/max per column") {
    val df = Seq(
      (1L, Some("b")),
      (2L, None),
      (3L, Some("a")),
      (3L, Some("a"))).toDF("id", "s")
    val got = Profiling.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(got == Set(
      ("id", 4L, 0L, 3L, "1", "3"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  // ---- Profiling.keySkew

  test("keySkew: max/avg ratio per group") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), ("a", 2L), // key 1 has 3 rows, key 2 has 1
      ("b", 9L)).toDF("g", "k")
    val got = Profiling.keySkew(df, "g", "k")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got == Set(("a", 2L, 3L, 2.0, 1.5), ("b", 1L, 1L, 1.0, 1.0)))
  }

  // ---- Sampling.weightedSample

  test("weightedSample: micro-weight 0 keeps nothing, 1e6 keeps everything") {
    val df = (0L until 200L).toDF("id")
    assert(Sampling.weightedSample(df, "id", lit(0L)).count() == 0L)
    assert(Sampling.weightedSample(df, "id", lit(1000000L)).count() == 200L)
  }

  test("weightedSample: keep rate tracks the weight and is partition-invariant") {
    val df = (0L until 2000L).toDF("id").withColumn("w", lit(250000L))
    val kept = Sampling.weightedSample(df, "id", col("w"))
    val n = kept.count()
    assert(n > 400 && n < 600, s"~500 of 2000 expected, got $n") // hash-uniformity
    val keptRepart = Sampling.weightedSample(df.repartition(17), "id", col("w"))
    assert(keptRepart.select("id").as[Long].collect().toSet ==
      kept.select("id").as[Long].collect().toSet)
  }

  // ---- HLL sketch merge (q_hll_merge is rows-only; this pins accuracy)

  test("hll merge rollup estimate is within 5% of exact distinct") {
    // the query now carries the bound itself: est_ok = |approx − exact| ≤
    // max(1, 5% · exact), computed Spark-side and pinned to 1 by the
    // DuckDB oracle; here we assert it holds and exact matches this recompute
    val dir = "/root/testdata/sf0.01"
    val ev = SparkEntry.table(spark, dir, "events")
    val rows = SparkEntry.queries("q_hll_merge")(spark, dir)
      .select("event_type", "exact_users", "est_ok").as[(String, Long, Int)].collect()
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
      .as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (k, ex, ok) =>
      assert(ex == exact(k), s"$k: exact col $ex vs recompute ${exact(k)}")
      assert(ok == 1, s"$k: estimate out of 5% bound")
    }
  }

  test("hll union of disjoint day sketches ~ union distinct, not sum") {
    // same users on two days: union estimate must NOT double-count
    val df = (0L until 500L).flatMap(u => Seq((u, "2024-01-01"), (u, "2024-01-02")))
      .toDF("user_id", "day")
    val est = df.groupBy("day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("e"))
      .as[Long].head()
    assert(math.abs(est - 500L) < 25, s"union estimate $est should be ~500, not ~1000")
  }

  // ---- minhash estimate vs exact (query-level sanity at sf0.001)

  test("q_minhash_estimate: estimates correlate with exact jaccard") {
    val r = SparkEntry.queries("q_minhash_estimate")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double)].collect()
    assert(r.nonEmpty)
    // identical docs estimate 1, fully-disjoint docs estimate 0; the mean
    // absolute error of a 16-hash sketch on [0,1] jaccard stays well under
    // 0.35 on any non-adversarial corpus
    val mae = r.map { case (_, _, ex, es) => math.abs(ex - es) }.sum / r.length
    assert(mae < 0.35, s"MAE $mae")
  }

  // ---- Sampling.leakageSafeSplit

  test("leakageSafeSplit: near-dup pairs never straddle splits; singletons keep the naive split") {
    import graft.operators.Dedup
    // 40 exact-duplicate pairs (ids i and i+1000, per-pair-unique tokens so
    // clusters don't merge) + 40 singleton docs with fully distinct tokens.
    val dup = (0L until 40L).flatMap { i =>
      val t = (0 until 8).map(j => s"p${i}t$j").mkString(" ")
      Seq((i, t), (i + 1000L, t))
    }
    val solo = (0L until 40L).map(i => (i + 5000L, (0 until 8).map(j => s"s${i}t$j").mkString(" ")))
    val docs = (dup ++ solo).toDF("doc_id", "text")
    val pairs = Dedup.nearDupMinhash(docs, threshold = 0.5).select("doc_a", "doc_b")
    val ps = pairs.as[(Long, Long)].collect()
    assert(ps.length === 40, s"expected the 40 planted pairs, got ${ps.length}")

    val byId = Sampling.leakageSafeSplit(docs, pairs.toDF())
      .select("doc_id", "rep", "split").as[(Long, Long, String)].collect()
      .map { case (id, rep, s) => id -> ((rep, s)) }.toMap
    ps.foreach { case (a, b) =>
      assert(byId(a)._2 === byId(b)._2, s"near-dup pair ($a,$b) split apart")
    }

    val naive = Sampling.trainValTestSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val clustered = ps.flatMap(p => Seq(p._1, p._2)).toSet
    byId.foreach { case (id, (rep, s)) =>
      if (!clustered.contains(id)) {
        assert(rep === id, s"singleton $id must represent itself")
        assert(s === naive(id), s"singleton $id must keep its naive split")
      }
    }
    // non-vacuous: the naive doc-id hash DOES separate at least one planted
    // pair (the contamination this operator exists to prevent)
    assert(ps.exists { case (a, b) => naive(a) != naive(b) },
      "test corpus too lucky: every pair already naive-agreed; widen it")
  }
}
