package graft.tools

import graft.operators.{Dedup, Eval, Normalize, Profiling, Sampling, Sessionize, Similarity, Temporal, TextAnalysis, TimeSeries, Urls}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Scale-stress smoke: multiply the sf0.1 tables in-memory (disjoint key
  * spaces so semantics stay per-key) and run the heavy operators. Not a
  * correctness gate (the driver's testdata stays the only query input) —
  * this exists to measure how the operators behave at 10-20× local data:
  * shuffle sizes, spill, stragglers. Linear wall-clock growth here is the
  * local proxy for "holds on a 1000-executor cluster".
  *
  * usage: runMain graft.tools.ScaleSmoke [multiplier] [labelSubstr,...]
  * (second arg filters ops by label substring — dev iteration on new ops)
  */
object ScaleSmoke {
  private var only: Option[Seq[String]] = None
  private var session: Option[SparkSession] = None

  def time[A](label: String)(f: => A): Unit =
    if (only.forall(_.exists(label.contains))) {
      val t0 = System.nanoTime()
      // reliable mode (GRAFT_CHECKPOINT_MODE): per-row durable-checkpoint
      // scope, so the 20x pass measures AND reclaims checkpoint disk
      session match {
        case Some(s)
            if s.conf.get("graft.checkpoint.mode", "local") == "reliable" =>
          graft.Materialize.reliableScope(s)(f)
        case _ => f
      }
      println(f"[scale] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

  /** Union `mult` shifted copies: keys offset so each copy is a disjoint
    * population (per-key row counts preserved — sessionize state size per
    * key stays realistic, total volume scales). */
  private def multiply(df: DataFrame, keyCol: String, mult: Int, keySpan: Long): DataFrame =
    (0 until mult)
      .map(i => df.withColumn(keyCol, col(keyCol) + lit(i * keySpan)))
      .reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 20
    only = if (args.length > 1) Some(args(1).split(",").toSeq) else None
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("GRAFT_CHECKPOINT_MODE")
      .foreach(m => spark.conf.set("graft.checkpoint.mode", m))
    session = Some(spark)

    val events = multiply(graft.SparkEntry.table(spark, dir, "events"), "user_id", mult, 1_000_000L)
    val docs = multiply(
      graft.SparkEntry.table(spark, dir, "documents"), "doc_id", math.max(1, mult / 5), 1_000_000L)
    val emb = multiply(
      graft.SparkEntry.table(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
      "vec_id", math.max(1, mult / 5), 1_000_000L)

    println(s"[scale] events=${events.count()} docs=${docs.count()} embeddings=${emb.count()}")
    def drain(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    time(s"gapSessionize x$mult")(drain(Sessionize.gapSessionize(events)))
    time(s"fullSessionize x$mult")(drain(Sessionize.fullSessionize(events)))
    time(s"sessionDuration+loyal x$mult") {
      val s = Sessionize.gapSessionize(events)
      drain(Sessionize.sessionDurationPerUser(s)); drain(Sessionize.loyalUsers(s))
    }
    time(s"minhash nearDup x${math.max(1, mult / 5)}")(drain(Dedup.nearDupMinhash(docs, 0.5)))
    time(s"simhash x${math.max(1, mult / 5)}")(drain(Dedup.simhash(docs)))
    time(s"nearDupCosineBlocked x${math.max(1, mult / 5)}")(
      drain(Similarity.nearDupCosineBlocked(emb, 0.4, nCentroids = 32)))
    time(s"asofJoin x$mult") {
      val ev = events.withColumn("ts_ms", unix_millis(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      drain(Temporal.asofJoin(p, c, "user_id", "ts_ms", "event_id", Seq("event_id")))
    }
    time(s"trainValTestSplit x$mult")(
      drain(Sampling.trainValTestSplit(events, "event_id")
        .groupBy(col("split")).agg(count(lit(1)))))
    time(s"dedup pairs+components+apply x${math.max(1, mult / 5)}")(
      drain(Dedup.dedupNearMinhash(docs, 0.5)))
    time(s"srp nearDup x${math.max(1, mult / 5)} (default 4-bit bands)")(
      drain(Similarity.nearDupCosineSrp(emb, 0.4)))
    // the documented scale knob: band bits grow with n so bucket sizes stay
    // ~n/2^bits — candidate pairs (quadratic per bucket) stop growing
    time(s"srp nearDup x${math.max(1, mult / 5)} (48 planes, 6-bit bands)")(
      drain(Similarity.nearDupCosineSrp(emb, 0.4, planes = 48, bands = 8)))
    time(s"srp nearDup multiProbe x${math.max(1, mult / 5)}")(
      drain(Similarity.nearDupCosineSrpMultiProbe(emb, 0.4)))
    time(s"quantizeInt8 x${math.max(1, mult / 5)}")(drain(Similarity.quantizeInt8(emb)))
    time(s"chunkDocuments x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.chunkDocuments(docs)))
    // round-5/6 text-pipeline ops: all should scale ~linearly (repetition/
    // entropy/tfidf shuffle ∝ distinct keys; pii is a narrow map;
    // decontaminate's broadcast side is fixed -> sublinear)
    time(s"repetitionStats x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.repetitionStats(docs)))
    time(s"charEntropy x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.charEntropy(docs)))
    time(s"redactPii x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.redactPii(docs)))
    time(s"tfidfTopK x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.tfidfTopK(docs)))
    time(s"repeatedSpans x${math.max(1, mult / 5)}")(
      drain(Dedup.repeatedSpans(docs, window = 8)))
    time(s"decontaminate x${math.max(1, mult / 5)}")(
      drain(Dedup.decontaminate(
        docs.filter(col("doc_id") % 20L =!= 0L),
        docs.filter(col("doc_id") % 20L === 0L), n = 4)))
    time(s"dedupKeepBest x${math.max(1, mult / 5)}")(
      drain(Dedup.dedupNearMinhashKeepBest(docs, 0.5, scoreCol = "n_chars")))
    time(s"labelCentroids x${math.max(1, mult / 5)}")(
      drain(Similarity.labelCentroids(
        multiply(graft.SparkEntry.table(spark, dir, "embeddings"), "vec_id",
          math.max(1, mult / 5), 1_000_000L))))
    time(s"cdcChunk x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.cdcChunk(docs)))
    time(s"bigramLogProb x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.bigramLogProb(docs)))
    time(s"zipfSlope x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.zipfSlope(docs)))
    time(s"normalizedExact x${math.max(1, mult / 5)}")(
      drain(Dedup.normalizedExact(docs)))
    time(s"mixtureSample x${math.max(1, mult / 5)}")(
      drain(Sampling.mixtureSample(
        docs.select(col("doc_id"), (col("doc_id") % 37L).cast("string").as("source")),
        "doc_id", "source",
        (0 until 20).map(i => i.toString -> 0.01).toMap)))
    time(s"bloomSemiJoin x$mult") {
      val ev = events.select(col("event_id"), col("user_id"))
      val hot = events.filter(col("event_type") === "error")
        .select(col("user_id")).distinct()
      drain(graft.operators.RuntimeFilter.bloomSemiJoin(
        ev, "user_id", hot, "user_id", expectedItems = 1000000L))
    }
    time(s"bmp synth+decode x${math.max(1, mult / 5)}")(
      drain(graft.operators.Multimodal.decodeBmp24(
        graft.operators.Multimodal.synthesizeBmpTable(docs)).toDF()))
    time(s"snapshotDiff x$mult") {
      val cents = round(col("o_totalprice") * lit(100), 0).cast("long")
      val orders = multiply(
        graft.SparkEntry.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice")), "o_orderkey", mult, 10_000_000L)
        .select(col("o_orderkey").as("k"), cents.as("cents"))
      drain(graft.operators.Cdc.snapshotDiff(
        orders.filter(col("k") % 11 =!= 0L), orders.filter(col("k") % 13 =!= 0L),
        Seq("k"), Seq("cents")))
    }
    time(s"semDedup x${math.max(1, mult / 5)} (nCentroids scaled)")(
      // SemDeDup's scale recipe: nCentroids grows with the corpus so cells
      // stay bounded and the in-cell quadratic term stays flat
      drain(Similarity.semDedup(emb, 0.35, nCentroids = 32)))
    time(s"hashedLinearScore x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.hashedLinearScore(docs)))
    time(s"urls normalize+dedup x$mult") {
      val urls = events.select(col("event_id"),
        format_string("https://www.h%d.example.com/%s/%d?utm_source=x&b=%d&a=1",
          pmod(col("user_id"), lit(5000L)), col("event_type"),
          pmod(col("event_id"), lit(50L)), pmod(col("event_id"), lit(3L))).as("url"))
      drain(graft.operators.Urls.dedupByUrl(urls, "url", "event_id"))
    }
    time(s"incrementalGapSessionize x$mult (3 increments)") {
      val ms = unix_millis(col("ts"))
      val cuts = events.agg(
        expr("percentile(unix_millis(ts), array(0.33D, 0.66D))").as("c"))
        .select(element_at(col("c"), 1).cast("long").as("c1"),
          element_at(col("c"), 2).cast("long").as("c2"))
      def part(cond: org.apache.spark.sql.Column) =
        events.crossJoin(broadcast(cuts)).filter(cond).drop("c1", "c2")
      val (r1, s1) = Sessionize.incrementalGapSessionize(None, part(ms <= col("c1")))
      val (r2, s2) = Sessionize.incrementalGapSessionize(
        Some(s1.materialize), part(ms > col("c1") && ms <= col("c2")))
      val (r3, _) = Sessionize.incrementalGapSessionize(
        Some(s2.materialize), part(ms > col("c2")))
      drain(r1.unionByName(r2).unionByName(r3))
    }
    time("boundedBucketPairs 50k-copy cluster (star path)") {
      // adversarial: one duplicate cluster far past the cap — must stay
      // O(n) and memory-bounded, not n^2/2 pairs in one buffer
      val giant = spark.range(50000)
        .select(col("id").as("doc_id"),
          lit("the same duplicated text body repeated verbatim across the giant cluster").as("text"))
      drain(Dedup.nearDupMinhash(giant, 0.5))
    }
    // round-6 continuation ops: temporal variants share asofJoin's
    // one-shuffle shape; bm25/prefix-Jaccard/pageRank are the new
    // multi-stage ops whose scaling claims need pinning
    time(s"asofJoinMerge (custom exec) x$mult") {
      val ev = events.withColumn("ts_ms", unix_millis(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      drain(Temporal.asofJoinMerge(p, c, "user_id", "ts_ms", "event_id", Seq("event_id")))
    }
    time(s"asofJoinForward+Nearest x$mult") {
      val ev = events.withColumn("ts_ms", unix_millis(col("ts")))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      drain(Temporal.asofJoinForward(p, c, "user_id", "ts_ms", "event_id", Seq("event_id")))
      drain(Temporal.asofJoinNearest(p, c, "user_id", "ts_ms", "event_id", Seq("event_id")))
    }
    time(s"overlapJoinBinned x$mult (fixed b side)") {
      val day = 86400000L
      val od = unix_millis(col("o_orderdate").cast("timestamp"))
      val a = multiply(
        graft.SparkEntry.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")), "o_orderkey", mult, 10_000_000L)
        .select(col("o_orderkey"), od.as("lo_a"),
          (od + (pmod(col("o_orderkey"), lit(20L)) + 1L) * day).as("hi_a"))
      val epoch92 = unix_millis(to_timestamp(lit("1992-01-01")))
      val b = graft.SparkEntry.table(spark, dir, "nation").select(
        col("n_nationkey").cast("long").as("n_nationkey"),
        (epoch92 + col("n_nationkey").cast("long") * 60L * day).as("lo_b"),
        (epoch92 + col("n_nationkey").cast("long") * 60L * day + 90L * day).as("hi_b"))
      drain(Temporal.overlapJoinBinned(a, b, 30L * day,
        "o_orderkey", "lo_a", "hi_a", "n_nationkey", "lo_b", "hi_b"))
    }
    time(s"bm25TopK x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.bm25TopK(
        docs, Seq("join", "vector", "spark"), k = 10)))
    time(s"prefixJaccardJoin x${math.max(1, mult / 5)}")(
      drain(Dedup.prefixJaccardJoin(docs, threshold = 0.3)))
    time(s"pageRank x$mult (disjoint graph copies)") {
      val e0 = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.SparkEntry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10_000_000L).as("dst"))
      val edges = (0 until mult).map { i =>
        e0.select((col("src") + lit(i * 20_000_000L)).as("src"),
          (col("dst") + lit(i * 20_000_000L)).as("dst"))
      }.reduce(_ unionByName _)
      drain(graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5))
    }
    // round-7 continuation ops: all single-shuffle-per-stage shapes whose
    // scaling claims need pinning (corpusOverlap/boilerplateProfile shuffle
    // ∝ exploded shingles; tokenBudgetMix ∝ one range exchange)
    time(s"corpusOverlap x${math.max(1, mult / 5)}")(
      drain(Dedup.corpusOverlap(docs)))
    time(s"corpusOverlap sampled(16) x${math.max(1, mult / 5)}")(
      drain(Dedup.corpusOverlap(docs, sampleMod = 16)))
    // within-run strategy A/B (the only reliable comparison on this host's
    // 1.3-2x window seesaw): 20 and 60 corpora, both pair-expansion paths
    val docs60 = docs.withColumn("source",
      concat(lit("s"), pmod(col("doc_id"), lit(60L)).cast("string")))
    // two rounds: round 1 absorbs JVM/codegen warm-up, read round 2
    for (r <- 1 to 2) {
      time(s"corpusOverlap AB$r k20 pairwise")(
        drain(Dedup.corpusOverlap(docs, strategy = "pairwise")))
      time(s"corpusOverlap AB$r k20 bitmask")(
        drain(Dedup.corpusOverlap(docs, strategy = "bitmask")))
      time(s"corpusOverlap AB$r k60 pairwise")(
        drain(Dedup.corpusOverlap(docs60, strategy = "pairwise")))
      time(s"corpusOverlap AB$r k60 bitmask")(
        drain(Dedup.corpusOverlap(docs60, strategy = "bitmask")))
    }
    time(s"boilerplateProfile x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.boilerplateProfile(docs, dfThreshold = 10L)))
    time(s"tokenBudgetMix x${math.max(1, mult / 5)}") {
      val w = docs.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      drain(Sampling.tokenBudgetMix(docs, w, totalBudget = 500000L))
    }
    // round-7 session-5 ops. The sorted-run folds (cusum/holt) and window
    // sweeps (intervals, ewma, rollingMedian, attribution) are one
    // key-hashed exchange each -> must scale linearly; marketBasket and
    // the graph ops are the quadratic-per-block shapes whose bounds
    // (basket size, brand block, degree orientation) do the scaling work.
    val perDay = events
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
      .groupBy(col("user_id"), col("day")).agg(sum(col("cents")).as("v"))
    time(s"cusum x$mult") {
      val wt = perDay.withColumn("x2", col("v") * 2)
        .withColumn("t2", expr(
          "CAST(percentile(v, 0.5) OVER (PARTITION BY user_id) * 2 AS BIGINT)"))
      drain(graft.operators.TimeSeries.cusum(wt, "user_id", "day", "x2", "t2", 100L, 1000L))
    }
    time(s"holt x$mult")(
      drain(graft.operators.TimeSeries.holt(perDay, "user_id", "day", "v")))
    time(s"ewma+rollingMedian x$mult") {
      drain(graft.operators.TimeSeries.ewma(perDay, "user_id", "day", "v"))
      drain(graft.operators.TimeSeries.rollingMedian(perDay, "user_id", "day", "v"))
    }
    time(s"intervalCoverage x$mult") {
      val iv = events.select(col("user_id"), unix_millis(col("ts")).as("s"),
        (unix_millis(col("ts")) + lit(300000L)).as("e"))
      drain(graft.operators.Intervals.coverage(iv, "user_id", "s", "e"))
    }
    time(s"sequenceMatch+attribution x$mult") {
      val ev = events.withColumn("ts_ms", unix_millis(col("ts")))
      drain(Sessionize.sequenceMatch(ev,
        Map("view" -> "v", "click" -> "c", "purchase" -> "p",
          "signup" -> "s", "error" -> "e"), "v[ce]*p"))
      drain(Sessionize.attributeLastTouch(ev, Seq("view", "click"), "purchase", 21600000L))
    }
    time(s"marketBasket x$mult (baskets stay bounded)") {
      val li = multiply(
        graft.SparkEntry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", mult, 10_000_000L)
      drain(graft.operators.Cooccur.marketBasket(li, "l_orderkey", "l_partkey", minCount = 3L))
    }
    time(s"jaroWinkler fuzzy join x$mult (blocks stay bounded)") {
      // disjoint brand spaces per copy: block SIZE is constant, block
      // COUNT scales -> total compares scale linearly with copies
      import graft.functions.expressions.JaroWinklerSim.jaroWinkler
      val part0 = graft.SparkEntry.table(spark, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
      val p = (0 until mult).map { i =>
        part0.select((col("p_partkey") + lit(i * 1_000_000L)).as("p_partkey"),
          col("p_name"), concat(col("p_brand"), lit(s"#$i")).as("p_brand"))
      }.reduce(_ unionByName _)
      val probe = p.repartition(spark.sparkContext.defaultParallelism)
      drain(probe.as("a").join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .withColumn("sim", round(jaroWinkler(col("a.p_name"), col("b.p_name")), 6))
        .filter(col("sim") >= 0.75)
        .select(col("a.p_partkey"), col("b.p_partkey"), col("sim")))
    }
    time(s"shortestPaths x$mult (disjoint graph copies)") {
      val e0 = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long").as("od"))
        .join(graft.SparkEntry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long").as("sd")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10_000_000L).as("dst"),
          (col("sd") - col("od")).as("w"))
      val copies = (0 until mult).map { i =>
        e0.select((col("src") + lit(i * 20_000_000L)).as("src"),
          (col("dst") + lit(i * 20_000_000L)).as("dst"), col("w"))
      }.reduce(_ unionByName _)
      val und = copies.unionByName(
        copies.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      import spark.implicits._
      val seeds = (0 until mult).flatMap(i => (1L to 4L).map(_ + i * 20_000_000L))
        .toDF("id")
      drain(graft.operators.Graph.shortestPaths(und, seeds, rounds = 4))
    }
    // round-8 ops: winsorize/zscore are broadcast-stats-back narrow maps
    // (linear, no main-table shuffle); kmeansStep is one broadcast
    // assignment + one (cell, dim) agg (linear per iteration); containment
    // shares q_ngram_jaccard's adjacent-id equi-join shape
    time(s"winsorize x$mult")(
      drain(graft.operators.Normalize.winsorize(
        events.select(col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents", 0.1, 0.9)))
    time(s"zscore x${math.max(1, mult / 5)}")(
      drain(graft.operators.Normalize.zscore(
        docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "source", "n_tokens")))
    time(s"kmeansStep x${math.max(1, mult / 5)} (nCentroids scaled)")(
      drain(Similarity.kmeansStep(emb, nCentroids = 32)))
    time(s"seasonalByPhase x$mult") {
      val pd = events
        .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      drain(graft.operators.TimeSeries.seasonalByPhase(pd, "event_type", "day", "v"))
    }
    time(s"welchTTest x$mult")(
      drain(graft.operators.Normalize.welchTTest(
        events.select(col("event_type"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("arm"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "arm", "cents")))
    time(s"wavFrameEnergy x${math.max(1, mult / 5)}") {
      import spark.implicits._
      val media = docs.select(col("doc_id"), col("n_chars"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, graft.operators.Multimodal.synthesizeWavSaw(
            freqHz = (100 + id % 400).toInt, nSamples = (500 + nc % 500).toInt))
        }).toDF("doc_id", "content")
      drain(graft.operators.Multimodal.wavFrameEnergy(media).toDF())
    }
    time(s"imageDHash+nearDupHamming x${math.max(1, mult / 5)}") {
      val h = graft.operators.Multimodal.imageDHash(
        graft.operators.Multimodal.synthesizeBmpTable(docs))
      drain(graft.operators.Dedup.nearDupHamming(h, groupCol = Some("n_bits")))
    }
    time(s"rrfFusion x${math.max(1, mult / 5)}") {
      val text = graft.operators.TextAnalysis.bm25TopK(
        docs, Seq("join", "vector", "spark"), k = 50)
      val q0 = emb.filter(col("vec_id") === 0L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val vec = Similarity.bruteForceTopK(q0, emb, k = 50)
      drain(graft.operators.Retrieval.rrfFuse(
        Seq((text, "doc_id", "rn"), (vec, "vec_id", "rank"))))
    }
    time(s"mergeUpsert x$mult") {
      val cents = round(col("o_totalprice") * lit(100), 0).cast("long")
      val orders = multiply(
        graft.SparkEntry.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus")),
        "o_orderkey", mult, 10_000_000L)
        .select(col("o_orderkey"), cents.as("cents"), col("o_orderstatus"))
      val base = orders.filter(col("o_orderkey") % 11L =!= 0L)
      val changes = orders.filter(col("o_orderkey") % 13L === 0L)
        .select(col("o_orderkey"), (col("cents") + 1L).as("cents"),
          lower(col("o_orderstatus")).as("o_orderstatus"),
          (col("o_orderkey") % 17L === 0L).as("is_delete"))
      drain(graft.operators.Cdc.mergeUpsert(base, changes,
        Seq("o_orderkey"), Seq("cents", "o_orderstatus")))
    }
    time(s"skyline2D x$mult") {
      val o = multiply(
        graft.SparkEntry.table(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
        "o_orderkey", mult, 10_000_000L)
        .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long").as("d"))
      drain(graft.operators.Skyline.skyline2D(o, "cents", "d"))
    }
    time(s"globalRowNumber x$mult") {
      val d = events.select(col("event_id"),
        md5(concat(lit("shuf:"), col("event_id").cast("string"))).as("h"))
      drain(graft.operators.Layout.globalRowNumber(d, Seq("h", "event_id")))
    }
    time(s"pmiCollocations x${math.max(1, mult / 5)}")(
      drain(graft.operators.TextAnalysis.pmiCollocations(docs)))
    time(s"ngramContainment x${math.max(1, mult / 5)}") {
      val sh = Dedup.shingleSigTable(docs, "doc_id", "text", 3, numHashes = 0)
      val a = sh.select(col("doc_id").as("doc_a"), col("__sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("__sh").as("sh_b"))
      drain(a.join(b, col("doc_b") === col("doc_a") + 1L)
        .select(col("doc_a"), col("doc_b"),
          graft.functions.TextFunctions.containment(col("sh_a"), col("sh_b")).as("c_ab")))
    }
    // ---- round-8 late batch: eval metrics, rank stats, text sketches
    time(s"aucCalibration x$mult") {
      val ev = events.select(round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      drain(Eval.auc(ev, "cents", "is_pos"))
      drain(Eval.calibrationBins(ev, "cents", "is_pos"))
    }
    time(s"giniPctRankWMedian x$mult (distinct-value-sized)") {
      val ev = events.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        (pmod(col("user_id"), lit(49L)) + 1L).as("w"))
      drain(Eval.gini(ev, "event_type", "cents"))
      drain(Eval.percentileRank(ev, "event_type", "cents"))
      drain(Eval.weightedMedian(ev, "event_type", "cents", "w"))
    }
    time(s"hampel x$mult") {
      val perDay = events.select(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("day"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      drain(TimeSeries.hampel(perDay, "user_id", "day", "v"))
    }
    time(s"readability+bpePairs x${math.max(1, mult / 5)}") {
      drain(TextAnalysis.readability(docs))
      drain(TextAnalysis.bpePairs(docs))
    }
    time(s"minimizerSketch x${math.max(1, mult / 5)}")(
      drain(TextAnalysis.minimizerSketch(docs)))
    time(s"negativeSample x${math.max(1, mult / 5)}")(
      drain(Sampling.negativeSample(docs.select(col("doc_id")), "doc_id", 3)))
    time(s"mutualInfo x$mult") {
      drain(Profiling.mutualInformation(events.select(col("event_type"),
        concat(lit("arm_"), pmod(col("user_id"), lit(2L))).as("arm")),
        "event_type", "arm"))
    }
    time(s"cidrRollup x$mult") {
      val ips = events.select(concat_ws(".",
        lit(10), pmod(col("user_id"), lit(256L)),
        pmod(expr("user_id div 256"), lit(256L)),
        pmod(col("event_id"), lit(256L))).as("ip"))
      drain(Urls.cidrRollup(ips, "ip", 20))
    }
    time(s"fuzzyNameJoin x$mult (domain stays bounded)") {
      val names = events.select(concat_ws(" ",
        concat(lit("adj"), pmod(col("user_id"), lit(40L))),
        concat(lit("noun"), pmod(col("event_id"), lit(8L)))).as("name"))
      drain(Dedup.fuzzyNameJoin(names, "name",
        n => element_at(split(n, " "), -1), maxDist = 3))
    }
    time(s"quantileNormalize x$mult") {
      val ev = events.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(graft.operators.Normalize.quantileNormalize(ev, "event_type",
        "cents", binSize = 256L))
    }
    time(s"sprt x$mult") {
      val ev = events.select(
        concat(lit("arm_"), pmod(col("user_id"), lit(2L))).as("arm"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        (col("event_type") === "purchase").as("y"))
      drain(Profiling.sprt(ev, "arm", Seq("ms", "event_id"), "y", 0.15, 0.25))
    }
    time(s"orderStats+logTemplates x$mult") {
      drain(Eval.orderStatistics(events.select(
        round(col("value") * 100, 0).cast("long").as("cents")), "cents",
        Seq((1, 4), (1, 2), (3, 4), (99, 100))))
      val lines = events.select(col("event_id"), concat_ws(" ",
        col("ts").cast("string"), lit("elb"),
        concat(lit("u"), col("user_id"), lit(":"), col("event_id")),
        lit("10.0.0.1:80 GET http://x/y HTTP/1.1")).as("line"))
      drain(TextAnalysis.logTemplates(lines, "event_id", "line", minDf = 1000L))
    }
    time(s"countMin+goodTuring+rendezvous x${math.max(1, mult / 5)}") {
      drain(TextAnalysis.countMinEstimate(docs,
        Seq("the", "spark", "data", "window", "zzz")))
      drain(TextAnalysis.goodTuring(docs))
      drain(graft.operators.Layout.rendezvousAssign(
        docs.select(col("doc_id")), "doc_id", 8))
    }
    time(s"ksTestPrefixSum x$mult") {
      val ev = events.select(pmod(col("user_id"), lit(2L)).as("par"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(Profiling.ksTest(
        ev.filter(col("par") === 0L).select(col("cents")),
        ev.filter(col("par") =!= 0L).select(col("cents")), "cents"))
    }
    // events with DISJOINT event ids per copy — the id-keyed ops below
    // (bootstrap weights, kmv hashes) need unique ids to scale honestly
    val eventsUid = multiply(
      graft.SparkEntry.table(spark, dir, "events"), "event_id", mult, 100_000_000L)
    time(s"zorderStats+compactionPlan x$mult") {
      val cells = eventsUid.select(
        pmod(col("user_id"), lit(256L)).as("ca"),
        pmod(round(col("value") * 100, 0).cast("long"), lit(256L)).as("cb"))
      drain(graft.operators.Layout.zOrderStats(cells, col("ca"), col("cb"), 8, 6))
      val files = eventsUid.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(length(col("props"))).cast("long").as("n_bytes"))
      drain(graft.operators.Layout.compactionPlan(
        files, "event_type", "day", "n_bytes", 2048L))
    }
    time(s"kmvDistinct+kAnonymity x$mult") {
      drain(Profiling.kmvDistinct(eventsUid, "event_id", 256))
      drain(Profiling.kAnonymity(
        eventsUid.select(col("event_type"), pmod(col("user_id"), lit(64L)).as("ub")),
        Seq("event_type", "ub"), 10L))
    }
    time(s"bootstrapCi x$mult (32 replicates map-side)") {
      drain(Sampling.bootstrapCi(
        eventsUid.select(col("event_type"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "event_id", "cents", 32))
    }
    time(s"theilSen x$mult (grid stays 5x30)") {
      val daily = eventsUid.groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("x"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      drain(TimeSeries.theilSen(daily, "event_type", "x", "y"))
    }
    time(s"cmJoinSizeEst x$mult (cells stay 4x1024)") {
      val a = eventsUid.filter(pmod(col("event_id"), lit(2L)) === 0L)
      val b = eventsUid.filter(pmod(col("event_id"), lit(2L)) === 1L)
      drain(Profiling.cmJoinSizeEstimate(a, "user_id", b, "user_id"))
    }
    time(s"gramCovariance x${math.max(1, mult / 5)} (shuffle P*d^2)")(
      drain(Similarity.gramCovariance(emb)))
    time(s"gridCluster+knnEval x${math.max(1, mult / 5)}") {
      drain(Similarity.gridClusters(emb))
      val labeled = graft.SparkEntry.table(spark, dir, "embeddings")
      drain(Similarity.knnEval(
        multiply(labeled, "vec_id", math.max(1, mult / 5), 1_000_000L),
        nQueries = 50L, k = 10))
    }
    time(s"tableFingerprint+kAnonymity x$mult") {
      drain(Profiling.tableFingerprint(
        eventsUid.select(col("event_type"), col("event_id"), col("user_id"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", Seq("event_id", "user_id", "cents")))
    }
    time(s"ols2+conformal x$mult (one Gram pass each +resid)") {
      val ev = eventsUid.select(col("event_id").as("id"),
        round(col("value") * 100, 0).cast("long").as("y"),
        pmod(col("user_id"), lit(97L)).as("x1"),
        pmod(col("event_id"), lit(31L)).as("x2"))
      drain(graft.operators.Eval.ols2(ev, "y", "x1", "x2"))
      drain(graft.operators.Eval.conformalOls2(ev, "id", "y", "x1", "x2"))
    }
    time(s"weightedReservoir+kmvStream-agg x$mult") {
      drain(Sampling.weightedReservoir(
        eventsUid.select(col("event_id"), (pmod(col("event_id"), lit(1000L)) + 1L).as("w")),
        "event_id", "w", 100))
    }
    time(s"graphStats+adamicAdar x${math.max(1, mult / 5)} (disjoint copies)") {
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2).select(col("src"), col("dst"))
        .materialize
      drain(graft.operators.Graph.graphStats(e, "src", "dst"))
      drain(graft.operators.Graph.adamicAdar(e, "src", "dst", 20))
      drain(graft.operators.Graph.linkPredictors(e, "src", "dst", 20))
      drain(graft.operators.Graph.harmonicCentrality(e, "src", "dst"))
    }
    time(s"did+lDiversity+impute x$mult") {
      drain(graft.operators.Eval.diffInDiff(
        eventsUid.select((pmod(col("user_id"), lit(2L)) === 1L).as("treat"),
          (dayofmonth(col("ts")) >= 16).as("post"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "treat", "post", "cents"))
      drain(Profiling.lDiversity(
        eventsUid.select(col("event_type"),
          pmod(col("user_id"), lit(64L)).as("ub"),
          pmod(col("event_id"), lit(7L)).as("sv")),
        Seq("event_type", "ub"), "sv", 2L))
      drain(graft.operators.Normalize.imputeMedianSummary(
        eventsUid.select(col("event_type"),
          when(pmod(col("event_id"), lit(97L)) === 0L, lit(null))
            .otherwise(round(col("value") * 100, 0).cast("long")).as("cents")),
        "event_type", "cents"))
    }
    time(s"twap+ohlc+streaks x$mult") {
      val ev = eventsUid.select(col("event_type"), to_date(col("ts")).as("day"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(TimeSeries.twap(ev, "event_type", "day", "ms", "event_id", "cents"))
      drain(TimeSeries.ohlcBars(ev, "event_type", "ms", "event_id", "cents", 21600000L))
      drain(Sessionize.streaks(eventsUid.select(col("user_id"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("d")),
        "user_id", "d"))
    }
    time(s"kmvSetOps x$mult") {
      drain(Profiling.kmvSetOps(
        eventsUid.filter(col("event_type") === "click"), "user_id",
        eventsUid.filter(col("event_type") === "purchase"), "user_id", 64))
    }
    time(s"mmr+pcaPower x${math.max(1, mult / 5)}") {
      drain(Similarity.mmrRerank(
        emb.filter(col("vec_id") < 8L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        emb, poolK = 10, selectK = 5))
      drain(Similarity.pcaPower(emb))
    }
    time(s"experiment-suite x$mult (srm+cuped+wilson+bhFdr)") {
      drain(Profiling.srmCheck(
        eventsUid.select((pmod(col("user_id"), lit(2L)) === 1L).as("t")), "t"))
      val pu = eventsUid.groupBy(col("user_id"))
        .agg(coalesce(sum(when(dayofmonth(col("ts")) < 16,
          round(col("value") * 100, 0).cast("long"))), lit(0L)).as("pre"),
          coalesce(sum(when(dayofmonth(col("ts")) >= 16,
            round(col("value") * 100, 0).cast("long"))), lit(0L)).as("post"))
        .withColumn("treat", pmod(col("user_id"), lit(2L)) === 1L)
      drain(graft.operators.Eval.cuped(pu, "treat", "pre", "post"))
      drain(Profiling.wilsonCi(
        eventsUid.select(col("event_type"), (col("value") > 100).as("s")),
        "event_type", "s"))
      val tests = eventsUid.groupBy(col("user_id"))
        .agg(sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
          .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2"))
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      drain(Profiling.bhFdr(tests, Seq("user_id"), "p"))
    }
    time(s"lorenz+mannKendall+skipping x$mult") {
      drain(graft.operators.Eval.lorenzCurve(
        eventsUid.groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents")),
        "cents"))
      val daily = eventsUid.groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("x"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      drain(TimeSeries.mannKendall(daily, "event_type", "x", "y"))
      val cells = eventsUid.select(pmod(col("user_id"), lit(256L)).as("ca"),
        pmod(round(col("value") * 100, 0).cast("long"), lit(256L)).as("cb"))
      drain(graft.operators.Layout.skippingCompare(
        cells, col("ca"), col("cb"), 64L, 79L))
    }
    time(s"r9-stats anova+bf+runs+mcnemar x$mult") {
      val cents = eventsUid.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(graft.operators.Eval.anovaF(cents, "event_type", "cents"))
      drain(graft.operators.Eval.brownForsythe(cents, "event_type", "cents"))
      val daily = eventsUid.groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      drain(TimeSeries.runsTest(daily, "event_type", "day", "v"))
      drain(TimeSeries.durbinWatson(daily, "event_type", "day", "v"))
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("np"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("nc"))
        .withColumn("ok_a", (col("spend") > 330000L) === (col("np") >= 15L))
        .withColumn("ok_b", (col("nc") >= 20L) === (col("np") >= 15L))
      drain(Profiling.mcnemar(users, "ok_a", "ok_b"))
      drain(Profiling.cochranArmitage(
        users.select(
          when(col("nc") >= 25L, 2L).when(col("nc") >= 18L, 1L)
            .otherwise(0L).as("dose"),
          (col("np") >= 15L).as("heavy")),
        "dose", "heavy"))
    }
    time(s"rank tests mannWhitney+kruskalWallis x$mult") {
      // both ride the spearman midrank kernel: one distinct-value prefix
      // sum + one value-keyed join-back + one/two tiny aggregates — the
      // shuffle is ∝ distinct values, not rows
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "error", 1L).otherwise(0L)) > 0L)
            .as("had_error"))
      drain(Profiling.mannWhitney(users, "had_error", "spend"))
      drain(Profiling.kruskalWallis(
        eventsUid.select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents"))
    }
    time(s"mahalanobis+partialCorr+trimmedMean x$mult") {
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("y"),
          count(lit(1)).cast("long").as("z"))
        .materialize
      drain(Profiling.mahalanobis2d(users, "user_id", "x", "z"))
      drain(Profiling.partialCorr(users, "x", "y", "z"))
      drain(Eval.trimmedMean(
        eventsUid.select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents"))
    }
    time(s"rake+platt+youden+ece x$mult/(÷5 docs)") {
      drain(TextAnalysis.rakeKeyphrases(docs))
      val scored = eventsUid.select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
        .materialize
      drain(Eval.plattScale(scored, "cents", "is_pos"))
      drain(Eval.youdenThreshold(scored, "cents", "is_pos"))
      drain(Eval.ece(scored, "cents", "is_pos"))
    }
    time(s"cadence+diversity+fano x$mult/(÷5 docs)") {
      drain(Sessionize.cadenceProfile(eventsUid, "user_id"))
      drain(TextAnalysis.diversityIndex(docs))
      drain(TimeSeries.fanoFactor(
        eventsUid.select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h")), "event_type", "h"))
    }
    time(s"friedman+hurst x$mult") {
      drain(Profiling.friedman(
        eventsUid.groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents")),
        "user_id", "event_type", "cents"))
      drain(TimeSeries.hurst(
        eventsUid.groupBy(col("event_type"),
            expr("unix_millis(ts) div 3600000").as("h"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "h", "v"))
    }
    time(s"ccf+cochranQ x$mult") {
      val cents = round(col("value") * 100, 0).cast("long")
      val daily = eventsUid
        .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "click", cents).otherwise(0L))
            .as("xc"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L))
            .as("yc"))
        .withColumn("k", lit("all"))
      drain(TimeSeries.ccf(daily, "k", "day", "xc", "yc"))
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(cents).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("np"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("nc"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("nv"))
        .withColumn("heavy", col("np") >= 15L)
        .selectExpr("user_id",
          "stack(3, 'a', (spend > 330000) = heavy, " +
            "'b', (nc >= 20) = heavy, 'c', (nv >= 20) = heavy) AS (rule, ok)")
      drain(Profiling.cochranQ(users, "user_id", "rule", "ok"))
    }
    time(s"pacf+pettitt x$mult (daily series per type)") {
      val daily = eventsUid.groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
        .materialize
      drain(TimeSeries.pacf(daily, "event_type", "day", "v"))
      drain(TimeSeries.pettitt(daily, "event_type", "day", "v"))
    }
    time(s"effectSize+gumbel x$mult (one agg chain each)") {
      drain(graft.operators.Normalize.effectSize(
        eventsUid.select(col("event_type"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("arm"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "arm", "cents"))
      drain(TimeSeries.gumbelFit(
        eventsUid.select(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "day", "cents"))
    }
    time(s"emd1d+isotonic x$mult") {
      // emd rides the ks prefix-sum kernel (∝ distinct values);
      // isotonic's data-sized pass is the one binned aggregate — the
      // B^3 fit is constant-size
      val spend = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("even", pmod(col("user_id"), lit(2L)) === 0L)
        .materialize
      drain(Profiling.emd1d(
        spend.filter(col("even")).select(col("spend")),
        spend.filter(!col("even")).select(col("spend")), "spend"))
      drain(Eval.isotonicCalibration(
        eventsUid.select(round(col("value") * 100, 0).cast("long").as("c"),
          (col("event_type") === "purchase").as("y")), "c", "y"))
    }
    time(s"jsDivergence x${math.max(1, mult / 5)} (pairwise k sources)")(
      drain(TextAnalysis.jsDivergence(docs)))
    time(s"prAuc+ess+hapax+rmst x$mult/(÷5 docs)") {
      val scored = eventsUid.select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      drain(Eval.prAuc(scored, "cents", "is_pos"))
      drain(Sampling.effectiveSampleSize(
        eventsUid.groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("w")),
        "event_type", "w"))
      drain(TextAnalysis.hapaxProfile(docs))
      val subj = eventsUid
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(concat(lit("c"), pmod(col("user_id"), lit(2L))).as("g"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t"),
          col("err_ms").isNotNull.as("ev"))
      drain(graft.operators.Survival.rmst(subj, "g", "t", "ev", 336L))
    }
    time(s"ordinalAssoc+kappa+mood+kfold x$mult") {
      // the four round-9 final-wave bookkeeping/association ops: all
      // reduce events -> per-user aggregate (one shuffle) -> k-bounded
      // moment rows, so growth should track the user aggregate only
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"))
        .materialize
      drain(Profiling.kendallTau(users, "spend", "n_purch")
        .withColumn("gamma", expr(Profiling.gammaSql)))
      drain(Profiling.weightedKappa(
        users.select(
          when(col("spend") >= 360000L, 3L).when(col("spend") >= 330000L, 2L)
            .when(col("spend") >= 300000L, 1L).otherwise(0L).as("tier_a"),
          when(col("n_click") >= 25L, 3L).when(col("n_click") >= 20L, 2L)
            .when(col("n_click") >= 15L, 1L).otherwise(0L).as("tier_b")),
        "tier_a", "tier_b"))
      val cents = eventsUid.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val med = broadcast(cents.agg(expr("percentile(cents, 0.5)").as("med")))
      drain(Profiling.chi2Independence(
        cents.crossJoin(med).select(col("event_type"),
          when(col("cents") > col("med"), "above")
            .otherwise("at_or_below").as("side")),
        "event_type", "side"))
      drain(users.withColumn("fold", expr(
          "pmod(CAST(conv(substring(md5(concat('fold:', " +
            "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT), 5)"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("n_purch") >= 15L, 1L).otherwise(0L)).cast("long")
            .as("n_pos")))
    }
    time(s"sign+wsr+gtest+rr+cmh+page x$mult") {
      // round-10 wave: paired tests ride one user aggregate + the
      // value-domain prefix sum; g/rr/cmh are cell-table reductions;
      // page shares the friedman per-item rank windows
      val paired = eventsUid
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          col("event_type"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("y"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("had_error"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"),
          sum(col("cents")).cast("long").as("spend"))
        .materialize
      drain(Profiling.signTest(paired, "x", "y"))
      drain(Profiling.wilcoxonSignedRank(paired, "x", "y"))
      drain(Profiling.gTest(docs, "lang", "source"))
      drain(Profiling.riskRatio(paired, "had_error", "heavy"))
      drain(Profiling.cmh(
        paired.withColumn("tier",
          when(col("spend") >= 360000L, "high")
            .when(col("spend") >= 300000L, "mid").otherwise("low")),
        "tier", "had_error", "heavy"))
      drain(Profiling.pageTrend(
        eventsUid.groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "user_id", "event_type", "v"))
    }
    time(s"cvm+jonckheere+granger x$mult") {
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("had_error"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
        .materialize
      drain(Profiling.cramerVonMises(users, "had_error", "spend"))
      drain(Profiling.jonckheere(
        users.withColumn("tier",
          when(col("n_purch") >= 20L, "3_high")
            .when(col("n_purch") >= 12L, "2_mid").otherwise("1_low")),
        "tier", "spend"))
      drain(graft.operators.TimeSeries.grangerLag1(
        eventsUid.groupBy(
            concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).cast("long").as("y"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .cast("long").as("x")),
        "cohort", "day", "y", "x"))
      drain(TextAnalysis.hillTail(docs))
      drain(TextAnalysis.yulesK(docs))
      drain(graft.operators.TimeSeries.naiveSkill(
        eventsUid.groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v"))
      drain(Profiling.gofUniform(
        eventsUid.select(col("event_type"),
          expr("(unix_millis(ts) div 86400000) % 7").as("dow")),
        "event_type", "dow"))
      drain(Profiling.shiftFunction(
        eventsUid.groupBy(col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
            (sum(when(col("event_type") === "error", 1L).otherwise(0L))
              > 0L).as("had_error")),
        "had_error", "spend"))
      drain(Sampling.captureRecapture(eventsUid, "user_id"))
    }
    time(s"bowker+atkinson+cronbach+fleiss x$mult") {
      val perType = eventsUid.groupBy(col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        .materialize
      drain(graft.operators.Eval.atkinson(perType, "event_type", "cents"))
      drain(Profiling.cronbachAlpha(
        perType.select(col("user_id"), col("event_type"),
          col("cents").as("v")), "user_id", "event_type", "v"))
      val users = eventsUid
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          col("event_type"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("y"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("n_view"),
          sum(col("cents")).cast("long").as("spend"))
        .materialize
      drain(Profiling.bowkerSymmetry(
        users.select(
          when(col("x") >= 180000L, "h").when(col("x") >= 150000L, "m")
            .otherwise("l").as("te"),
          when(col("y") >= 180000L, "h").when(col("y") >= 150000L, "m")
            .otherwise("l").as("to")), "te", "to"))
      def tier(c: org.apache.spark.sql.Column, t3: Long, t2: Long, t1: Long) =
        when(c >= t3, 3L).when(c >= t2, 2L).when(c >= t1, 1L).otherwise(0L)
      val long = users.select(col("user_id"), lit("r_spend").as("rater"),
          tier(col("spend"), 360000L, 330000L, 300000L).as("cat"))
        .unionByName(users.select(col("user_id"), lit("r_click").as("rater"),
          tier(col("n_click"), 25L, 20L, 15L).as("cat")))
        .unionByName(users.select(col("user_id"), lit("r_view").as("rater"),
          tier(col("n_view"), 25L, 20L, 15L).as("cat")))
      drain(Profiling.fleissKappa(long, "user_id", "rater", "cat"))
      // synthetic 8-way labels: the multiplied emb view drops the label
      // column; timing only needs the (dim, label) aggregate shape
      drain(graft.operators.Similarity.fisherRatio(
        emb.withColumn("label", pmod(col("vec_id"), lit(8L)))))
      drain(graft.operators.TimeSeries.zeroInflation(
        eventsUid.select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("hour")),
        "event_type", "hour"))
      val scored = eventsUid.select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      drain(graft.operators.Eval.spiegelhalterZ(scored, "cents", "is_pos"))
      drain(graft.operators.Eval.hosmerLemeshow(scored, "cents", "is_pos"))
      drain(graft.operators.Eval.theilIndex(perType, "event_type", "cents"))
      // parity exposure: count thresholds drift with sf (every sf0.1
      // user clears 14 clicks, emptying a margin — the nullif lesson)
      drain(Profiling.riskDiff(
        users.select((pmod(col("user_id"), lit(2L)) === 0L).as("e0"),
          (col("spend") >= 330000L).as("o0")), "e0", "o0"))
      val ranked = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("sa"),
          count(lit(1)).cast("long").as("sb"))
        .materialize
      drain(graft.operators.Eval.rboTopK(ranked, "user_id", "sa", "sb",
        k = 100))
      drain(graft.operators.Eval.rankAgreement(ranked, "user_id", "sa",
        "sb", k = 100))
      drain(Profiling.woolf(
        users.select(
          when(col("spend") >= 360000L, "high")
            .when(col("spend") >= 300000L, "mid").otherwise("l")
            .as("tier"),
          (col("n_click") >= 14L).as("e0"),
          (col("spend") >= 330000L).as("o0")),
        "tier", "e0", "o0"))
    }
    time(s"lifeTable+permTest+tpch+jb+bartlett x$mult") {
      val users = eventsUid
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"),
          sum(col("cents")).as("spend"))
        .materialize
      drain(graft.operators.Survival.lifeTable(
        users.select(concat(lit("c"), pmod(col("user_id"), lit(2L)))
            .as("g"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t"),
          col("err_ms").isNotNull.as("ev")), "g", "t", "ev", 24L))
      drain(Sampling.permTest(
        users.withColumn("arm", pmod(col("user_id"), lit(2L)) === 0L),
        "user_id", "arm", "spend"))
      val cents = eventsUid.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(graft.operators.Normalize.jarqueBera(
        cents, "event_type", "cents"))
      drain(graft.operators.Normalize.bartlett(
        cents, "event_type", "cents"))
    }
    time(s"imageAHash x${math.max(1, mult / 5)}")(
      drain(graft.operators.Multimodal.imageAHash(
        graft.operators.Multimodal.synthesizeBmpTable(docs))))
    time(s"survival coxPH+dunn+ebShrink+negbin x$mult") {
      val users = eventsUid
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"),
          sum(col("cents")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("np"),
          count(lit(1)).cast("long").as("ne"))
        .materialize
      drain(graft.operators.Survival.coxPH(
        users.select(
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t"),
          col("err_ms").isNotNull.as("ev"), col("spend")),
        "t", "ev", "spend"))
      drain(Profiling.dunnTest(
        eventsUid.select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents"))
      drain(Eval.ebShrink(users, "user_id", "np", "ne"))
      drain(TimeSeries.negbinFit(
        eventsUid.select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h")), "event_type", "h"))
    }
    time(s"survival kaplanMeier+logRank x$mult") {
      // subject table reduces to per-(grp,t) steps in one aggregate; the
      // two prefix sums run on the step table (∝ distinct hours, not
      // subjects) — growth tracks the user-level aggregate only
      val users = eventsUid
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(col("user_id"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000").as("t"),
          col("err_ms").isNotNull.as("ev"))
        .materialize
      drain(graft.operators.Survival.kaplanMeier(
        users.withColumn("grp",
          concat(lit("c"), pmod(col("user_id"), lit(2L)))), "grp", "t", "ev"))
      drain(graft.operators.Survival.logRank(
        users.withColumn("g", pmod(col("user_id"), lit(2L)) === 0L),
        "g", "t", "ev"))
      drain(graft.operators.Survival.nelsonAalen(
        users.withColumn("grp",
          concat(lit("c"), pmod(col("user_id"), lit(2L)))), "grp", "t", "ev"))
    }
    time(s"markovStationary x$mult (event-type chain, 12 iters)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("unix_millis(ts)"), col("event_id"))
      val trans = eventsUid
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      drain(graft.operators.Eval.markovStationary(
        trans, "event_type", "next_type", iters = 12))
    }
    time(s"bradleyTerry x$mult (pairwise spend games, 10 iters)") {
      // the data-sized pass is the games derivation + the ONE pair-table
      // aggregate; the 10 MM iterations run on the k²-bounded pair table
      val spend = eventsUid.groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      val games = spend.as("x").join(spend.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .filter(col("x.cents") =!= col("y.cents"))
        .select(
          when(col("x.cents") > col("y.cents"), col("x.event_type"))
            .otherwise(col("y.event_type")).as("w"),
          when(col("x.cents") > col("y.cents"), col("y.event_type"))
            .otherwise(col("x.event_type")).as("l"))
      drain(graft.operators.Eval.bradleyTerry(games, "w", "l", iters = 10))
    }
    time(s"retrievalMetrics x$mult (users as queries)") {
      // each user's event types ranked by spend — bounded candidate lists
      // per query, queries scale with the multiplier
      val cand = eventsUid.groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          count(lit(1)).cast("long").as("cnt"))
      val ranked = cand.withColumn("rank",
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id"))
              .orderBy(col("spend").desc, col("event_type"))).cast("long"))
        .withColumn("rel",
          when(col("cnt") >= 6L, 2L).when(col("cnt") >= 4L, 1L).otherwise(0L))
      drain(graft.operators.Eval.retrievalMetrics(
        ranked, "user_id", "rank", "rel", k = 3))
    }
    time(s"modularity x${math.max(1, mult / 5)} (CC to fixpoint)") {
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2).select(col("src"), col("dst"))
      drain(graft.operators.Graph.modularity(e, "src", "dst"))
    }
    time(s"mleval-suite x$mult (stump+woe+lift+changepoint+lag)") {
      val users = eventsUid.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
        .materialize
      drain(graft.operators.Eval.decisionStump(users, "spend", "heavy"))
      drain(graft.operators.Eval.woeBins(users, "spend", "heavy"))
      drain(graft.operators.Eval.decileLift(users, "spend", "heavy"))
      val daily = eventsUid.groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("x"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      drain(TimeSeries.changepoint(daily, "event_type", "x", "y"))
      val ev = eventsUid.withColumn("ts_ms", unix_millis(col("ts")))
      val lags = Sessionize.funnel(ev, Seq("view", "click", "purchase"))
        .filter(col("t2").isNotNull)
        .select((col("t2") - col("t1")).as("lag_ms"))
      drain(graft.operators.Eval.orderStatistics(lags, "lag_ms",
        Seq((1, 4), (1, 2), (3, 4), (99, 100))))
    }
    time(s"ecod+negSampling x$mult/(÷5 docs)") {
      drain(Profiling.ecodOutliers(
        eventsUid.select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          expr("unix_millis(ts) % 86400000L").as("msd")),
        "event_id", Seq("cents", "msd"), 20))
      drain(TextAnalysis.negativeSamplingTable(docs))
    }
    time(s"graphFeatures x${math.max(1, mult / 5)} (disjoint copies)") {
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2).select(col("src"), col("dst"))
      drain(graft.operators.Graph.nodeFeatures(e, "src", "dst"))
    }
    // hub-cap valve: a power-law hub makes the wedge kernels' Σ deg²
    // superlinear; with maxDeg/maxCenterDeg the hub is excluded BEFORE the
    // self-joins, so wall-clock must stay ~flat as the planted hub grows
    // 5× (the uncapped adamicAdar on the 500k-spoke hub would enumerate
    // 1.25·10¹¹ wedge pairs — that row is intentionally absent)
    for (spokes <- Seq(100000L, 500000L)) {
      time(s"hubCap wedge kernels (hub=${spokes / 1000}k spokes, cap=64)") {
        val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey"))
        val base = li0.as("a").join(li0.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
          .filter(col("n_ord") >= 2)
          .select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"))
        val hub = spark.range(spokes)
          .select(lit(-1L).as("src"), (col("id") + 1_000_000_000L).as("dst"))
        val e = base.unionByName(hub)
        drain(graft.operators.Graph.triangleCounts(e, "src", "dst",
          maxDeg = 64L))
        drain(graft.operators.Graph.adamicAdar(e, "src", "dst", 20,
          maxCenterDeg = 64L))
        // the q_local_clustering_capped valve: full-graph degrees,
        // capped triangle kernel — must stay flat like the rows above
        drain(graft.operators.Graph.localClustering(e, "src", "dst",
          topK = 20, maxDeg = 64L))
      }
    }
    time(s"hits+labelProp x$mult (disjoint graph copies)") {
      // hits rides the pageRank edge shapes (2 joins+aggs/iter);
      // labelProp's per-round count table is edge-bounded — both must
      // scale with the multiplied edge count, not worse
      val e0 = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.SparkEntry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10_000_000L).as("dst"))
      val edges = (0 until mult).map { i =>
        e0.select((col("src") + lit(i * 20_000_000L)).as("src"),
          (col("dst") + lit(i * 20_000_000L)).as("dst"))
      }.reduce(_ unionByName _)
      drain(graft.operators.Graph.hits(edges, "src", "dst", iters = 4))
      drain(graft.operators.Graph.labelPropagation(
        edges, "src", "dst", rounds = 4))
    }
    time(s"kTruss x${math.max(1, mult / 5)} (disjoint copies, k=4)") {
      // disjoint copies of the sampled co-purchase graph: edge count
      // multiplies while the per-copy peel depth stays fixed, so growth
      // tracks the per-round triangle enumeration (O(m^1.5) worst case)
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_partkey") % 10 < 3)
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
      drain(graft.operators.Graph.kTruss(e, "src", "dst", 4))
    }
    time(s"kCore x${math.max(1, mult / 5)} (disjoint copies)") {
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2).select(col("src"), col("dst"))
      drain(graft.operators.Graph.kCore(e, "src", "dst", 3))
    }
    time(s"r10b stats wave x$mult (turning/cox/chow/welch/dist)") {
      // hourly series aggregates the multiplied events down to 720
      // buckets x 5 types — the three series tests and the binned
      // distances must track the SCAN, not the series length
      val hourly = events.groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
        .materialize
      drain(TimeSeries.turningPoints(hourly, "event_type", "h", "v"))
      drain(TimeSeries.coxStuart(hourly, "event_type", "h", "v"))
      drain(TimeSeries.chowTest(hourly, "event_type", "h", "v", 360L))
      val obs = events.groupBy(dayofweek(col("ts")).cast("long").as("dow"),
          col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      drain(Normalize.welchAnova(obs, "dow", "event_type", "cents"))
      val vals = events.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("c"))
      drain(Profiling.distDistances(
        vals.filter(col("event_type") === "click"),
        vals.filter(col("event_type") === "purchase"), "c"))
    }
    time(s"r10b regression diagnostics x${math.max(1, mult / 5)} (bp/cooks)") {
      // repeated-copy union: the fit moments change but the SCAN and
      // per-row residual map are what must stay linear
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("p"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("id"))
      val li = (0 until math.max(1, mult / 5))
        .map(_ => li0).reduce(_ unionByName _)
      drain(Eval.breuschPagan(li, "q", "p"))
      drain(Eval.cooksDistance(li, "id", "q", "p", topK = 20))
    }
    time(s"r10b hodgesLehmann x$mult (user-level arms, honest O(n*m))") {
      // per-user rollups at mult x 1500 users -> the pair space is the
      // estimator's own quadratic; distinct-diff grouping bounds memory
      val users = events.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      drain(Profiling.hodgesLehmann(
        users.filter(pmod(col("user_id"), lit(2L)) === 0L),
        users.filter(pmod(col("user_id"), lit(2L)) === 1L), "cents"))
    }
    time(s"r10c rolling envelope x$mult (dd/boll/rsi/stoch/atr)") {
      // the rolling family runs over the 720-bucket hourly rollup —
      // the SCAN and groupBy must stay linear, the windows are
      // calendar-bounded by construction
      val hourly = events.groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
        .materialize
      drain(TimeSeries.drawdown(hourly, "event_type", "h", "v"))
      drain(TimeSeries.bollinger(hourly, "event_type", "h", "v", 24, 2))
      drain(TimeSeries.rsi(hourly, "event_type", "h", "v", 14))
      drain(TimeSeries.stochasticOsc(hourly, "event_type", "h", "v", 14))
      val ev = events.select(col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(TimeSeries.atr(TimeSeries.ohlcBars(
        ev, "event_type", "ms", "event_id", "cents", 21600000L),
        "event_type", "bar_start_ms", 8))
      drain(TimeSeries.macd(hourly, "event_type", "h", "v"))
      drain(graft.operators.Eval.hhi(
        events.select(col("event_type"), col("user_id"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "user_id", "cents"))
      drain(graft.operators.Sessionize.chainEntropy(
        events.withColumn("ts_ms", unix_millis(col("ts")))))
    }
    time(s"r10c stationarity+rates x$mult (kpss/df/ad/binom/poisson)") {
      val dollars = events.groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
        .materialize
      drain(TimeSeries.kpss(dollars, "event_type", "h", "v"))
      drain(TimeSeries.dickeyFuller(dollars, "event_type", "h", "v"))
      drain(TimeSeries.classicalDecompose(dollars, "event_type", "h", "v"))
      drain(TimeSeries.seasonalStrength(dollars, "event_type", "h", "v"))
      drain(Normalize.andersonDarling(dollars, "event_type", "v"))
      drain(Profiling.binomialTest(
        events.withColumn("s", pmod(col("user_id"), lit(2L)) === 0L),
        "event_type", "s", 1L, 2L))
      drain(Profiling.poissonTwoRate(
        events.withColumn("a", dayofmonth(col("ts")) <= 7),
        "event_type", "a", 7L, 24L))
      drain(TimeSeries.vwap(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_returnflag"),
            date_trunc("month", col("l_shipdate")).cast("date").as("m"),
            round(col("l_extendedprice") * 100, 0).cast("long").as("nc"),
            col("l_quantity").cast("long").as("q")),
        "l_returnflag", "m", "nc", "q"))
    }
    time(s"r10c localClustering x${math.max(1, mult / 5)} (disjoint copies)") {
      // same disjoint-copy co-purchase graph as the kTruss row: degree
      // agg + the shared triangle kernel, one checkpointed edge frame
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_partkey") % 10 < 3)
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
      drain(graft.operators.Graph.localClustering(e, "src", "dst", 20))
    }
    time(s"r10c wavActivity+byFdr x${math.max(1, mult / 5)}/x$mult") {
      // gated-wav decode fans docs to frames (bounded per doc); byFdr's
      // global windows run over the USER test table, not events
      import spark.implicits._
      val media = docs.select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, graft.operators.Multimodal.synthesizeWavGated(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        }).toDF("doc_id", "content")
      drain(graft.operators.Multimodal.activitySegments(
        graft.operators.Multimodal.wavFrameEnergy(media, 200).toDF()))
      val perUser = events.groupBy(col("user_id"))
        .agg(sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2"))
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      drain(Profiling.byFdr(perUser, Seq("user_id"), "p"))
    }
    time(s"r10c curation trio x${math.max(1, mult / 5)} (dsir/mmd/rp)") {
      // dsir: the token window scales with vocab x docs; mmd/rp with
      // vectors x dims — all shuffle-bounded, no broadcasts
      drain(TextAnalysis.dsirWeights(
        docs.withColumn("is_en", col("lang") === "en"), "is_en"))
      drain(Similarity.mmdLinear(
        emb.withColumn("a", pmod(col("vec_id"), lit(2L)) === 0L), "a"))
      drain(Similarity.randomProjection(emb, k = 4))
      drain(Similarity.pqEncode(emb, m = 4, k = 16))
    }
    time(s"r11 order-stat family x$mult (tukey/equidepth/conover/ks)") {
      val ev = events.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      drain(Profiling.tukeyFences(ev, "event_type", "cents"))
      drain(Profiling.equiDepthHistogram(ev, "event_type", "cents", 8))
      drain(Normalize.conoverSquaredRanks(ev, "event_type", "cents"))
      drain(Profiling.ksTwoSample(
        ev.filter(col("event_type") === "purchase").select(col("cents")),
        ev.filter(col("event_type") === "click").select(col("cents")),
        "cents"))
    }
    time(s"r11 series family x$mult (forecastAcc/pageHinkley/neyman)") {
      val hourly = events
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      drain(TimeSeries.forecastAccuracy(hourly, "event_type", "h", "v"))
      drain(TimeSeries.pageHinkley(hourly, "event_type", "h", "v",
        delta = 100L, lambda = 50000L))
      drain(Sampling.neymanAllocation(events.select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents", totalN = 1000L))
    }
    time(s"r11 text family x${math.max(1, mult / 5)} " +
        "(novelty/featureHash/vocab/chi2/maxCover)") {
      drain(TextAnalysis.ngramNovelty(docs))
      val fh = TextAnalysis.featureHash(docs)
      drain(fh)
      drain(TextAnalysis.vocabStats(docs))
      drain(Eval.chi2FeatureScores(
        fh.select(col("doc_id"), col("dim"))
          .join(docs.select(col("doc_id"),
            (col("lang") === "en").as("is_en")), "doc_id"),
        "doc_id", "dim", "is_en"))
      drain(Sampling.greedyMaxCover(docs, k = 3))
    }
    time(s"r11 graph family x${math.max(1, mult / 5)} (katz/betweenness)") {
      // disjoint doc-similarity-ish graph copies, same recipe as
      // hits+labelProp: offset key spaces keep per-copy structure
      val edges = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.SparkEntry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      val m = math.max(1, mult / 5)
      val big = (0 until m).map(i => edges
          .select((col("src") + lit(i * 100000000L)).as("src"),
            (col("dst") + lit(i * 100000000L)).as("dst")))
        .reduce(_ unionByName _)
      drain(graft.operators.Graph.katzCentrality(big, "src", "dst"))
      drain(graft.operators.Graph.betweennessLandmarks(big, "src", "dst"))
    }
    time(s"r11b attribution+uplift+survival x$mult (shapley/qini/aj)") {
      val ev = events.select(col("user_id"), col("event_type"))
      drain(Sessionize.shapleyAttribution(ev,
        touchTypes = Seq("click", "error", "signup", "view"),
        convType = "purchase"))
      val u = events.groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .select(col("user_id"), col("spend"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("treated"),
          (col("np") >= 12L).as("converted"))
      drain(Eval.qiniDeciles(u, "spend", "treated", "converted",
        "user_id"))
      val agg = events
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          col("event_type"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("event_type") === "error", col("ms"))).as("e_ms"),
          min(when(col("event_type") === "signup", col("ms")))
            .as("s_ms"))
      val subj = agg.select(
        concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
        expr("(coalesce(least(coalesce(e_ms, s_ms), " +
          "coalesce(s_ms, e_ms)), last_ms) - first_ms) div 3600000")
          .as("t_hours"),
        expr("CASE WHEN e_ms IS NULL AND s_ms IS NULL THEN 0 " +
          "WHEN s_ms IS NULL OR (e_ms IS NOT NULL AND e_ms <= s_ms) " +
          "THEN 1 ELSE 2 END").as("cause"))
      drain(graft.operators.Survival.cumulativeIncidence(
        subj, "cohort", "t_hours", "cause"))
    }
    time(s"r11b containment join x${math.max(1, mult / 5)} (perturbed copies)") {
      // the plain multiply() copies are EXACT duplicates, so the TRUE
      // containment pair set grows quadratically in the copy count —
      // measured 37.9 s at x4 -> 564.6 s at x20, all of it honest
      // output (380 directed pairs per source doc at 20 copies). That
      // measures the dataset, not the operator: a real pipeline runs
      // exact-dup removal first. Copies perturbed by SUFFIXING every
      // token with a copy tag keep the shingle-df structure identical
      // within each copy (same difficulty) while sharing NO shingle
      // across copies — measuring the operator's own scaling. (A first
      // attempt INSERTED a tag token between every pair; that created
      // bigram-df-heavy shingles and inflated the index join 12x —
      // perturbations must preserve the df profile.)
      val m = math.max(1, mult / 5)
      val perturbed = (0 until m).map(k =>
          graft.SparkEntry.table(spark, dir, "documents")
            .select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
              regexp_replace(col("text"), "(\\S+)", s"$$1c$k").as("text")))
        .reduce(_ unionByName _)
      drain(Dedup.exactContainmentJoin(perturbed, thresholdPpm = 800000L))
    }
    time(s"r11b media features x${math.max(1, mult / 5)} (otsu/spectrum)") {
      drain(graft.operators.Multimodal.bmpOtsu(
        graft.operators.Multimodal.synthesizeBmpTable(docs)))
      import spark.implicits._
      val media = docs.filter(col("doc_id") % 1000L < 8L)
        .select(col("doc_id"), col("n_chars"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, graft.operators.Multimodal.synthesizeWavSaw(
            (100 + id % 400).toInt, (500 + nc % 500).toInt))
        }).toDF("doc_id", "content")
      drain(graft.operators.Multimodal.wavDominantFreq(media))
    }
    time(s"r11 ivf adversarial cell skew x${math.max(1, mult / 5)}") {
      // The 100-TB IVF risk is a HOT CELL — the exact analogue of the
      // LSH bucket caps: an adversarially clustered cloud (90% of
      // vectors collapsed into one tight blob) under the lowest-id
      // centroid convention lands the blob in ~1 cell, so every probe
      // touching it scans ~the whole corpus. The fix is not a cap
      // (dropping candidates from a top-k index silently loses recall;
      // a dedup bucket can degrade, a search index cannot) but TRAINED
      // centroids: k-means allocates centroids proportional to
      // density, splitting the blob across many cells. This row
      // measures both: max/mean cell occupancy untrained vs trained,
      // and the ivfTopK probe cost against the clustered cloud.
      val clustered = emb.withColumn("embedding",
        when(pmod(col("vec_id"), lit(10L)) =!= 0L,
          expr("transform(embedding, x -> CAST(0.124 + 0.02 * x" +
            " AS FLOAT))"))
          .otherwise(col("embedding")))
        .materialize
      def skew(cells: DataFrame, label: String): Unit = {
        val s = cells.groupBy(col("cell"))
          .agg(count(lit(1)).cast("long").as("n"))
          .agg(max(col("n")).as("mx"),
            avg(col("n")).as("mean"), count(lit(1)).as("n_cells"))
          .head()
        println(f"[scale]   $label%-42s max=${s.getLong(0)}%d " +
          f"mean=${s.getDouble(1)}%.1f cells=${s.getLong(2)}%d")
      }
      skew(Similarity.assignCells(clustered, nCentroids = 16,
        topCells = 2), "untrained lowest-id centroids (topCells=2)")
      skew(Similarity.assignCellsTo(clustered,
          Similarity.kmeansCentroids(clustered, 16, iters = 2),
          topCells = 2),
        "k-means 2-iter centroids (topCells=2)")
      val q = clustered.filter(col("vec_id") < 8L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      drain(Similarity.ivfTopK(q, clustered, k = 10, nCentroids = 16,
        nprobe = 2, trainIters = 0, cellsPerVec = 2))
      drain(Similarity.ivfTopK(q, clustered, k = 10, nCentroids = 16,
        nprobe = 2, trainIters = 2, cellsPerVec = 2))
      // the valve: same candidate set, hot cell spread across salts
      drain(Similarity.ivfTopK(q, clustered, k = 10, nCentroids = 16,
        nprobe = 2, trainIters = 0, cellsPerVec = 2, cellCap = 500))
    }
    time(s"r12 bpe train+apply+fertility x${math.max(1, mult / 5)}") {
      // one corpus-sized histogram pass, then vocabulary-sized rounds:
      // the suffix perturbation keeps copies' vocabularies DISJOINT so
      // the vocab (and per-round work) grows with the multiplier — the
      // honest worst case for a multiplied corpus
      val d2 = docs.select(col("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("x"), pmod(col("doc_id"), lit(977)))))
          .as("text"))
      drain(TextAnalysis.bpeTrain(d2, rounds = 5))
      drain(TextAnalysis.bpeApply(d2, rounds = 5, k = 30))
      drain(TextAnalysis.bpeFertility(
        d2.withColumn("source", pmod(col("doc_id"), lit(20L))), "source",
        rounds = 5))
    }
    time(s"r13 bpeTrainBatched 50r x64 x${math.max(1, mult / 5)}") {
      // the SCALE trainer (verdict r12 #4, the literal rounds=50 row):
      // chained greedy selection over a 64-candidate window merges
      // ~10 disjoint pairs per round on this corpus (508 merges /
      // 19.9 s at 20× when pinned), so per-MERGE wall-time ≈ 0.04 s —
      // ~1/35 of sequential bpeTrain's — read this row's secs/merges
      // against "r12 bpe train" above (≈ its secs/5). A wide window
      // costs nothing extra per round: one limit-N collect either way.
      val d2 = docs.select(col("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("x"), pmod(col("doc_id"), lit(977)))))
          .as("text"))
      val m = TextAnalysis.bpeTrainBatched(d2, rounds = 50, batchTopN = 64)
      val nMerges = m.count()
      println(s"[scale]   batched merges completed: $nMerges")
      drain(m)
    }
    time(s"r12 textRank x${math.max(1, mult / 5)}") {
      // tokenize is corpus-sized; the walk is vocabulary-graph-sized
      drain(TextAnalysis.textRank(docs, k = 20))
    }
    time(s"r13 kneserNey x${math.max(1, mult / 5)}") {
      // one corpus-sized bigram explode, then bigram-vocab-sized aggs;
      // the suffix perturbation grows the bigram vocabulary honestly
      val d2 = docs.select(col("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          t => concat(t, lit("x"), pmod(col("doc_id"), lit(977)))))
          .as("text"))
      drain(TextAnalysis.kneserNeyBigrams(d2, k = 25, minCount = 5L))
    }
    time(s"r13 hardNegatives x${math.max(1, mult / 5)}") {
      // corpus tokenized once for 3 queries; candidate sets bounded by
      // docs matching >=1 contentful term
      drain(graft.operators.Retrieval.hardNegativesBm25(docs,
        queries = Seq(
          (1L, Seq("join", "vector", "spark"), 0L),
          (2L, Seq("window", "stream", "merge"), 1L),
          (3L, Seq("filter", "scan", "column"), 2L)), k = 5))
    }
    time(s"r13 saxWords x$mult (disjoint supplier copies)") {
      // per-key window + two key-hashed aggs — must scale with rows,
      // never with key-pair count
      val li = graft.SparkEntry.table(spark, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("sk"),
          expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)").as("m"),
          col("l_quantity").cast("long").as("q"))
      val copies = (0 until mult).map(i =>
        li.select((col("sk") + lit(i * 1_000_000L)).as("sk"), col("m"), col("q")))
        .reduce(_ unionByName _)
      val series = copies.groupBy(col("sk").as("nation"), col("m"))
        .agg(sum(col("q")).cast("long").as("qty"))
      drain(TimeSeries.saxWords(series, "nation", "m", "qty", segments = 8))
    }
    time(s"r13 dtwPaa x$mult (series length, fixed 25 keys)") {
      // series LENGTH is the cheap axis (one PAA pass); the pair grid
      // stays 25 nations -> 300 pairs regardless of mult. Months are
      // shifted per copy so the series genuinely lengthens.
      val li0 = graft.SparkEntry.table(spark, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
      val sup = graft.SparkEntry.table(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val base = li0.join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").cast("long").as("nation"),
          expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)").as("m"),
          col("l_quantity").cast("long").as("q"))
      val longSeries = (0 until mult).map(i =>
        base.select(col("nation"), (col("m") + lit(i * 3000L)).as("m"), col("q")))
        .reduce(_ unionByName _)
        .groupBy(col("nation"), col("m"))
        .agg(sum(col("q")).cast("long").as("qty"))
      drain(TimeSeries.dtwPaaDistances(longSeries, "nation", "m", "qty",
        segments = 8))
    }
    time(s"r13 kCenterGreedy k=6 x${math.max(1, mult / 5)}") {
      // O(n*k) distance evals, one 1-row broadcast + argmax per round —
      // wall-time must grow with n, never n^2
      drain(Similarity.kCenterGreedy(emb, k = 6))
    }
    time(s"r12 ppr x$mult (disjoint graph copies)") {
      // restart-walk cost per round is one edge join + one agg — must
      // scale with the multiplied edge count like hits/labelProp
      val e0 = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(graft.SparkEntry.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10_000_000L).as("dst"))
      val edges = (0 until mult).map { i =>
        e0.select((col("src") + lit(i * 20_000_000L)).as("src"),
          (col("dst") + lit(i * 20_000_000L)).as("dst"))
      }.reduce(_ unionByName _)
      val sym = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("id"))
        .filter(pmod(col("id"), lit(20_000_000L)) <= 40L)
      drain(graft.operators.Graph.personalizedPageRank(
        sym, seeds, iters = 4))
    }
    time(s"r12 ransac x$mult (shifted point copies)") {
      // candidate count is FIXED (16), so cost = points x candidates
      // must grow linearly with the multiplied point set
      val p0 = spark.read.parquet(s"$dir/lineitem.parquet").select(
        (col("l_orderkey").cast("long") * 10L +
          col("l_linenumber").cast("long")).as("lid"),
        col("l_quantity").cast("long").as("qty"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
          .as("cents"))
      val pts = (0 until mult).map { i =>
        p0.select((col("lid") + lit(i * 100_000_000L)).as("lid"),
          col("qty"), col("cents"))
      }.reduce(_ unionByName _)
      drain(graft.operators.TimeSeries.ransacLine(
        pts, "lid", "qty", "cents", nCand = 16, epsilon = 200000L))
    }
    time(s"r13b eigenCentrality x${math.max(1, mult / 5)} (graph copies)") {
      // one join + one agg per round, no mid-loop actions — must scale
      // with the multiplied edge count like ppr/katz
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val li = (0 until math.max(1, mult / 5)).map { i =>
        li0.select((col("ok") + lit(i * 100_000_000L)).as("ok"),
          (col("pk") + lit(i * 10_000_000L)).as("pk"))
      }.reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      drain(graft.operators.Graph.eigenvectorCentrality(
        e, "src", "dst", iters = 4))
    }
    time(s"r13b viterbi+ar2+poisson x$mult (disjoint user copies)") {
      // viterbi: one capped window + pivot, per-row DP; ar2: two lag
      // aggregates + last-two pivot; poisson: 4 tiny aggregates — all
      // must grow linearly with the multiplied event volume
      val ev = events.withColumn("ts_ms", unix_millis(col("ts")))
      drain(Sessionize.viterbiDecode(ev, steps = 8))
      val pd = events.select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day")).agg(sum(col("cents")).as("v"))
      drain(TimeSeries.ar2Forecast(
        TimeSeries.fillBucketGaps(pd, "user_id", "day", "v"),
        "user_id", "day", "v", horizon = 6))
      val perDay = events
        .select(expr("unix_millis(ts) div 86400000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
        .withColumn("x", col("day") - min(col("day")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      drain(TimeSeries.poissonTrend(perDay, "x", "y", iters = 4))
    }
    time(s"r13b matrixProfile n=${720 * math.max(1, mult / 5)} " +
        "(extended series)") {
      // the exact profile is O(n^2) BY DEFINITION — this measures the
      // in-valve growth on a longer synthetic series (the corpus side,
      // bucketing events into the series, is one groupBy at any scale)
      val n = 720L * math.max(1, mult / 5)
      val syn = spark.range(n).select(col("id").as("t"),
        (pmod(col("id") * 37L, lit(97L)) + pmod(col("id"), lit(24L))).as("x"))
      drain(TimeSeries.matrixProfile(syn, "t", "x", m = 24, excl = 12))
    }
    time(s"r13b ridge2Path x$mult (lineitem copies)") {
      // one Gram aggregate however long the path — the lambda fan-out
      // rides a 1-row broadcast
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      val li = (0 until mult).map(_ => li0).reduce(_ unionByName _)
      drain(Eval.ridge2Path(li, "y", "x1", "x2",
        Seq(0L, 1000000L, 100000000L)))
    }
    time(s"r13b causal family x$mult (logistic/ipw/aipw/cem)") {
      // every estimator is k tiny aggregates (or one stratum aggregate)
      // over the scaled frame — wall-time must grow with rows, never
      // with the lambda/iteration counts
      val nli = graft.SparkEntry.table(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o0 = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
        .drop("o_orderkey")
      val o = (0 until mult).map(_ => o0).reduce(_ unionByName _)
      drain(Eval.logisticIrls2(
        o.select(col("t").as("y"), col("x1"), col("x2")),
        "y", "x1", "x2", iters = 4))
      drain(Eval.ipwAte(o, "t", "yo", "x1", "x2", iters = 4))
      drain(Eval.aipwAte(o, "t", "yo", "x1", "x2", iters = 4))
      drain(Eval.cemAtt(o, "t", "yo", "x1", "x2"))
    }
    time(s"r13b journey values x$mult (hitting/removal, disjoint users)") {
      // the recursion tables stay |types|-sized whatever the corpus;
      // only the two windowed passes scale with rows
      val ev = events.withColumn("ts_ms", unix_millis(col("ts")))
      drain(Sessionize.expectedHittingTime(ev, "purchase", horizon = 8))
      drain(Sessionize.removalEffect(ev, "purchase", horizon = 8))
    }
    time(s"r13b encode+extract+weibull+lloyd x$mult/" +
        s"x${math.max(1, mult / 5)}") {
      val o0 = graft.SparkEntry.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          (col("o_orderstatus") === "F").cast("int").as("ret"))
      val o = (0 until mult).map(_ => o0).reduce(_ unionByName _)
      drain(Eval.targetEncodeLoo(o, "o_orderpriority", "ret",
        Seq("o_orderkey"), m = 10L))
      drain(TextAnalysis.extractiveChunks(docs, chunkTokens = 10))
      val subj = events
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      drain(graft.operators.Survival.weibullFit(
        subj, "cohort", "t_hours", "event"))
      drain(Similarity.kmeansLloydExact(emb, nCentroids = 8, rounds = 3))
    }
    time(s"r13b mis+k4 x${math.max(1, mult / 5)} (disjoint graph copies)") {
      // MIS rounds are frontier-sized; K4 work is O(#triangles * deg) —
      // disjoint copies must scale both linearly
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("pk"))
        .filter(pmod(col("pk"), lit(2)) === 0)
      val li = (0 until math.max(1, mult / 5)).map { i =>
        li0.select((col("ok") + lit(i * 100_000_000L)).as("ok"),
          (col("pk") + lit(i * 10_000_000L)).as("pk"))
      }.reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
        .materialize
      drain(graft.operators.Graph.maximalIndependentSet(e, "src", "dst"))
      drain(graft.operators.Graph.fourCliqueCounts(e, "src", "dst"))
    }
    time(s"r13b boosted+burrows+fd x$mult/x${math.max(1, mult / 5)}") {
      // boosting scans distinct values (bounded), burrows windows are
      // vocabulary-keyed, fd candidates are fixed — all row-linear
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      val li = (0 until mult).map(_ => li0).reduce(_ unionByName _)
      drain(Eval.boostedStumps(li, "y", Seq("x1", "x2"), rounds = 3))
      drain(TextAnalysis.burrowsDelta(docs, k = 30))
      val o0 = spark.read.parquet(s"$dir/orders.parquet")
      val o = (0 until mult).map(_ => o0).reduce(_ unionByName _)
      drain(Profiling.fdCheck(o, Seq(
        ("o_orderkey", "o_custkey"), ("o_custkey", "o_orderstatus"))))
    }
    time(s"r14 louvain+lcs+unigram x${math.max(1, mult / 5)}") {
      // louvain rounds are edge-keyed aggregates (disjoint copies must
      // scale linearly); lcs/unigram DPs are map-side folds whose only
      // scale axis is ROW COUNT — doc multiplication is the honest test
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("pk"))
      val li = (0 until math.max(1, mult / 5)).map { i =>
        li0.select((col("ok") + lit(i * 100_000_000L)).as("ok"),
          (col("pk") + lit(i * 10_000_000L)).as("pk"))
      }.reduce(_ unionByName _)
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
        .agg(count_distinct(col("a.ok")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      drain(graft.operators.Graph.louvainSync(e, "src", "dst"))
      val pairs = docs
        .select(col("doc_id").as("doc_a"), col("text").as("ta"))
        .join(docs.select((col("doc_id") - 1).as("doc_a"),
          col("text").as("tb")), Seq("doc_a"))
      drain(TextAnalysis.lcsTokenPairs(pairs, "ta", "tb"))
      drain(TextAnalysis.swAlignPairs(pairs, "ta", "tb"))
      drain(TextAnalysis.unigramSegment(docs, "text", topWords = 200))
    }
    time(s"r15 matching+diameter x${math.max(1, mult / 5)}") {
      // graph family: both inherit the co-purchase edge build; matching
      // is O(rounds * edges) handshakes, diameter two frontier BFS runs
      val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val li = (0 until math.max(1, mult / 5)).map(i =>
        li0.select((col("l_orderkey") + lit(i * 10_000_000L)).as("l_orderkey"),
          (col("l_partkey") + lit(i * 1_000_000L)).as("l_partkey")))
        .reduce(_ unionByName _)
      // matching/diameter run on the sparse repeat graph (the query
      // shape); Boruvka spans the full dense graph
      val rep = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2).select(col("src"), col("dst"))
      drain(graft.operators.Graph.greedyMatching(rep, "src", "dst", rounds = 8))
      drain(graft.operators.Graph.diameterSweep(rep, "src", "dst", maxHops = 12))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      // Boruvka: contracted-graph components keep per-round work
      // geometric; 12-round cap, converges in ~6 on this graph
      drain(graft.operators.Graph.boruvkaForest(e, "src", "dst", rounds = 12))
    }
    locally {
      // key-local kernels: SampEn's pair join and the entropy terms are
      // bounded per key (30-day series), croston folds a <=64 tail —
      // all three should scale with KEY count, i.e. row-linear
      lazy val perDay = events
        .groupBy(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
        .materialize
      time(s"r15 sampen x$mult")(
        drain(TimeSeries.sampleEntropy(perDay, "user_id", "day", "v", r = 3000L)))
      time(s"r15 permentropy x$mult")(
        drain(TimeSeries.permutationEntropy(perDay, "user_id", "day", "v")))
      time(s"r15 croston x$mult") {
        val li0 = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_partkey"), col("l_shipdate"), col("l_quantity"))
        val li = (0 until mult).map(i =>
          li0.select((col("l_partkey") + lit(i * 1_000_000L)).as("part"),
            col("l_shipdate"), col("l_quantity")))
          .reduce(_ unionByName _)
        val daily = li
          .select(col("part"),
            datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
              .cast("long").as("day"),
            col("l_quantity").cast("long").as("qty"))
          .groupBy(col("part"), col("day"))
          .agg(sum(col("qty")).cast("long").as("q"))
        drain(TimeSeries.crostonInt(daily, "part", "day", "q"))
      }
    }
    time(s"r14 binseg+kalman x$mult") {
      // both are window/pivot passes over per-key series — row-linear
      val daily = events
        .groupBy(col("event_type"), col("user_id"),
          dayofmonth(col("ts")).cast("long").as("idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      drain(TimeSeries.binarySegmentation(
        daily.withColumn("g",
          concat(col("event_type"), lit("_"), pmod(col("user_id"), lit(64L)))),
        "g", "idx", "cents", depth = 2, minSeg = 3))
      drain(TimeSeries.kalmanLocalLevel(
        daily.select(col("user_id").as("k"), (col("idx") - 1).as("idx"),
          (col("cents") * 10).as("ym")),
        "k", "idx", "ym", steps = 8))
    }
    spark.stop()
  }
}
