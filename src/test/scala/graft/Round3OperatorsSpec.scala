package graft

import graft.operators.{Dedup, Temporal}
import org.apache.spark.sql.functions._

/** Round-3 hardening: bounded MinHash band buckets (giant-duplicate-cluster
  * OOM guard), global-sort plan shape, range-join degenerate-range guard,
  * and the k=0 null-signature contract. */
class Round3OperatorsSpec extends SparkFunSuite {
  import spark.implicits._

  /** A corpus with one giant duplicate cluster (`copies`× the same long
    * text) plus unrelated distinct docs. Texts are ≥ 3 tokens so every doc
    * shingles. */
  private def clusterCorpus(copies: Int, distinct: Int) = {
    val dup = (0 until copies).map(i =>
      (i.toLong, "the same duplicated text body repeated verbatim across the cluster"))
    val uniq = (0 until distinct).map(i =>
      (100000L + i, s"unique document number $i speaking about topic $i in its own words ${i * 31}"))
    (dup ++ uniq).toDF("doc_id", "text")
  }

  test("nearDupMinhash: giant cluster degrades to star pairs, stays connected, no quadratic blowup") {
    // 10k copies: all-pairs would be ~50M shingle-carrying pairs (OOM food);
    // the bounded path caps every aggregation buffer at maxBucketSize and
    // emits 9 999 star pairs instead.
    val n = 10000
    val docs = clusterCorpus(n, distinct = 20)
    val got = Dedup
      .nearDupMinhash(docs, threshold = 0.5, maxBucketSize = 64)
      .collect()
    // star expansion: anchor (min id 0) paired with every other member once —
    // O(n) pairs, not n*(n-1)/2 ≈ 4.5M
    assert(got.length === n - 1)
    assert(got.forall(r => r.getLong(0) == 0L), "every pair anchored at min id")
    assert(got.map(_.getLong(1)).toSet === (1L until n.toLong).toSet,
      "every cluster member reachable from the anchor (connectivity preserved)")
    assert(got.forall(_.getDouble(2) == 1.0), "identical texts verify at jaccard 1.0")
  }

  test("nearDupMinhash: results identical with and without the cap when no bucket exceeds it") {
    val docs = clusterCorpus(copies = 8, distinct = 30)
    val capped = Dedup.nearDupMinhash(docs, 0.5, maxBucketSize = 64)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val wide = Dedup.nearDupMinhash(docs, 0.5, maxBucketSize = 1 << 20)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(capped === wide)
    // 8-copy cluster is below the cap -> full clique, 8*7/2 pairs
    assert(capped.count(r => r.getLong(0) < 100000L && r.getLong(1) < 100000L) === 28)
  }

  test("minhashCandidates: star path emits anchor pairs for oversized buckets") {
    val docs = clusterCorpus(copies = 200, distinct = 10)
    val got = Dedup.minhashCandidates(docs, maxBucketSize = 50)
      .as[(Long, Long)].collect().toSet
    assert(got === (1L until 200L).map(i => (0L, i)).toSet)
  }

  test("boundedBucketPairs plan: band shuffle is shared via ReusedExchange, collect_list only behind the cap filter") {
    val docs = clusterCorpus(copies = 8, distinct = 8)
    val df = Dedup.nearDupMinhash(docs, 0.5, maxBucketSize = 64)
    df.collect() // AQE finalizes exchange reuse only at execution
    val plan = df.queryExecution.executedPlan.toString
    // the small/big branches must reuse ONE shuffled band table — a second
    // kernel run would double the dominant cost at scale
    assert(plan.contains("ReusedExchange"), s"expected ReusedExchange in:\n$plan")
  }

  test("connectedComponents: chains, separate clusters, bidirectional edges") {
    val edges = Seq(
      // chain 1-2-3-4 (diameter 3: needs multiple propagation rounds)
      (2L, 1L), (2L, 3L), (4L, 3L),
      // separate clique {10, 11, 12}
      (10L, 11L), (11L, 12L), (10L, 12L),
      // isolated pair
      (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long chain converges within maxIters and is partition-invariant") {
    // pointer jumping halves distance-to-root each round: 40 links needs
    // ~log2(40)+1 ≈ 6 rounds, well inside the default maxIters = 20
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain.repartition(7)).as[(Long, Long)].collect()
    assert(got.length === 41)
    assert(got.forall(_._2 == 0L))
  }

  test("connectedComponents property: equals brute-force union-find on random graphs") {
    import org.scalacheck.{Gen, rng}
    (1 to 10).foreach { sample =>
      val gen = for {
        n <- Gen.choose(2, 80)
        edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
      } yield edges.filter(e => e._1 != e._2)
      val edges = gen(Gen.Parameters.default, rng.Seed(sample.toLong)).get
      if (edges.nonEmpty) {
        // brute force: path-compressed union-find, then min id per root
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) => parent(find(a)) = find(b) }
        val minOfRoot = parent.keys.toSeq.groupBy(find).map { case (r, ns) => r -> ns.min }
        val expected = parent.keys.map(n => n -> minOfRoot(find(n))).toMap
        val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got === expected, s"sample $sample (${edges.size} edges)")
      }
    }
  }

  test("testdata band buckets stay far below the cap (oracle models the uncapped expansion)") {
    // The DuckDB oracle for q_dedup_minhash/q_dedup_components is the
    // UNCAPPED all-pairs clique; parity holds only while no band bucket in
    // the verify corpus approaches DefaultMaxBucketSize. Assert the margin
    // here so a corpus change fails THIS test, not the oracle hash compare.
    import graft.functions.TextFunctions._
    val docs = SparkEntry.table(spark, "/root/testdata/sf0.01", "documents")
    val maxBucket = Dedup.shingleSigTable(docs, "doc_id", "text", 3, 16)
      .filter(col("__sig").isNotNull)
      .select(posexplode(bandKeys(col("__sig"), 4, 4)).as(Seq("band_idx", "band_key")))
      .groupBy(col("band_idx"), col("band_key")).count()
      .agg(max(col("count"))).as[Long].head()
    assert(maxBucket * 4 <= Dedup.DefaultMaxBucketSize,
      s"largest band bucket $maxBucket is within 4x of the cap ${Dedup.DefaultMaxBucketSize}: " +
        "oracle (uncapped clique) and Spark (star degradation) would diverge soon")
  }

  test("rangeJoinBinned ignores degenerate and inverted ranges") {
    val facts = Seq((1L, 5L), (2L, 15L), (3L, 25L)).toDF("id", "v")
    val ranges = Seq(
      ("ok", 0L, 10L),
      ("empty", 20L, 20L),     // lo == hi: half-open empty
      ("inverted", 1000L, 0L)) // hi < lo: would explode 100 descending bins
      .toDF("tier", "lo", "hi")
    val got = Temporal.rangeJoinBinned(facts, "v", ranges, binSize = 10L)
      .select("id", "tier").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "ok")))
  }

  test("shingleSigTable returns null signature for numHashes = 0") {
    val docs = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val row = Dedup.shingleSigTable(docs, "doc_id", "text", 3, numHashes = 0).collect().head
    assert(row.isNullAt(row.fieldIndex("__sig")),
      "k=0 must yield a NULL signature, never an empty one")
  }

  test("q_global_sort plans a range-partitioned sort with ordered partitions") {
    val df = SparkEntry.queries("q_global_sort")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), s"expected range partitioning in:\n$plan")
    // cross-partition global order: per-partition [min,max] spans must not overlap
    val spans = df.select("odate_ms", "o_orderkey").rdd
      .mapPartitionsWithIndex { (i, it) =>
        val keys = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (keys.isEmpty) Iterator.empty
        else Iterator((i, keys.min, keys.max, keys == keys.sorted))
      }.collect().sortBy(_._1)
    assert(spans.forall(_._4), "each partition internally sorted")
    assert(spans.sliding(2).forall {
      case Array(a, b) => Ordering[(Long, Long)].lteq(a._3, b._2)
      case _ => true
    }, "partition spans must be disjoint and ascending")
  }

  // -- asofJoin property test (round-2 queued item) -------------------------

  /** Random (event_id, key, t) tables with heavy time ties across few keys —
    * the regime where the (time, side, tie) ordering rules actually bite.
    * Raw ScalaCheck with fixed seeds (no scalatestplus on the offline
    * classpath); few samples because every sample is a full Spark job. */
  private def randomTable(seed: Long, idBase: Long): Seq[(Long, Long, Long)] = {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (idBase + i, k, t) }
    gen(Gen.Parameters.default, rng.Seed(seed)).get
  }

  test("asofJoin property: equals brute-force latest-at-or-before under ties, any partitioning") {
    (1 to 12).foreach { sample =>
      val rightRows = randomTable(sample.toLong, idBase = 1000L)
      val leftRows = randomTable(sample.toLong + 500L, idBase = 9000L)
      val left = leftRows.toDF("event_id", "user_id", "t")
      val right = rightRows.toDF("event_id", "user_id", "t")
      val expected = leftRows.map { case (id, k, t) =>
        val cands = rightRows.filter(r => r._2 == k && r._3 <= t)
        // inclusive at-or-before; among time ties the largest tie-break wins
        id -> (if (cands.isEmpty) None else Some(cands.maxBy(r => (r._3, r._1))._1))
      }.toMap
      def got(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
        Temporal.asofJoin(l, r, "user_id", "t", "event_id", payload = Seq("event_id"))
          .select($"event_id", $"asof_event_id")
          .as[(Long, Option[Long])].collect().toMap
      assert(got(left, right) === expected, s"sample $sample")
      if (sample <= 3) // partition invariance, spot-checked (each run is a job)
        assert(got(left.repartition(7), right.repartition(3)) === expected,
          s"sample $sample repartitioned")
    }
  }

  test("q_window_range trailing sum matches a brute-force per-row filter") {
    val df = SparkEntry.queries("q_window_range")(spark, sf0001)
      .select("o_custkey", "o_orderkey", "day", "trailing_cents")
      .as[(Long, Long, Long, Long)].collect()
    val orders = SparkEntry.table(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000").as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .as[(Long, Long, Long, Long)].collect()
    val byCust = orders.groupBy(_._1)
    val expected = orders.map { case (c, k, d, _) =>
      (c, k) -> byCust(c).filter(o => o._3 >= d - 29 && o._3 <= d).map(_._4).sum
    }.toMap
    assert(df.length === orders.length)
    df.foreach { case (c, k, _, t) => assert(t === expected((c, k)), s"cust $c order $k") }
  }
}
