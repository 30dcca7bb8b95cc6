package graft

import graft.operators.{Dedup, RuntimeFilter, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-6 additions: normalized dedup, bigram LM scoring, Zipf slope,
  * domain-mixture sampling, explicit bloom-prefiltered semi join. */
class Round6OpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  private def md5hexRef(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60Ref(s: String): Long =
    java.lang.Long.parseLong(md5hexRef(s).substring(0, 15), 16)

  // ---- normalizedExact

  test("normalizedExact: case/punct/whitespace variants collapse onto the lowest id") {
    val df = docsOf(
      0L -> "Hello, World!",
      1L -> "hello world",
      2L -> "  HELLO   WORLD  ",
      3L -> "a different document")
    val r = Dedup.normalizedExact(df).orderBy("doc_id")
      .select("doc_id", "n_group").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 3L), (3L, 1L)))
  }

  test("normalizeText: strips to [a-z0-9 ], collapses runs, trims") {
    val r = Seq(Tuple1("  A--B  c1,d!  "))
      .toDF("t").select(Dedup.normalizeText(col("t"))).as[String].head()
    assert(r == "ab c1d")
  }

  test("normalizedExact equals an in-memory reference on 20 random corpora") {
    val rng = new scala.util.Random(11)
    val alphabet = "aB !?-x9Z.,"
    (1 to 20).foreach { _ =>
      val docs = (0L until (2 + rng.nextInt(8)).toLong).map { id =>
        id -> Seq.fill(1 + rng.nextInt(20))(alphabet(rng.nextInt(alphabet.length))).mkString
      }
      def norm(s: String) =
        s.toLowerCase.replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim
      val exp = docs.groupBy { case (_, t) => md5hexRef(norm(t)) }.map {
        case (h, members) => (members.map(_._1).min, h, members.size.toLong)
      }.toSet
      val got = Dedup.normalizedExact(docs.toDF("doc_id", "text"))
        .as[(Long, String, Long)].collect().toSet
      assert(got == exp, s"mismatch on corpus: $docs")
    }
  }

  test("mixtureSample equals an in-memory reference on 10 random corpora") {
    val rng = new scala.util.Random(13)
    (1 to 10).foreach { _ =>
      val nDomains = 1 + rng.nextInt(4)
      val rows = (0L until (20 + rng.nextInt(200)).toLong)
        .map(i => (i, s"d${rng.nextInt(nDomains)}"))
      val targets = (0 until nDomains)
        .map(d => s"d$d" -> (rng.nextInt(4) * 0.05)).toMap
      val n = rows.size.toDouble
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
      val ppm = counts.map { case (dom, c) =>
        dom -> math.floor(math.min(1.0, targets.getOrElse(dom, 0.0) * n / c) * 1e6).toLong
      }
      val exp = rows.filter { case (id, dom) =>
        hash60Ref(s"$dom:$id") % 1000000L < ppm(dom)
      }.map { case (id, dom) => (id, dom, ppm(dom)) }.toSet
      val got = Sampling.mixtureSample(
        rows.toDF("doc_id", "source"), "doc_id", "source", targets)
        .select("doc_id", "source", "keep_ppm")
        .as[(Long, String, Long)].collect().toSet
      assert(got == exp, s"mismatch: targets=$targets counts=$counts")
    }
  }

  // ---- bigramLogProb

  test("bigramLogProb: hand-checked conditional probabilities") {
    // corpus bigrams: a_b x2 (doc0, doc1), a_c x1 (doc1)
    // c1(a)=3, so P(b|a)=2/3, P(c|a)=1/3
    val df = docsOf(0L -> "a b", 1L -> "a c a b", 2L -> "solo")
    val r = TextAnalysis.bigramLogProb(df).orderBy("doc_id")
      .as[(Long, Long, Double)].collect()
    // doc0: 1 bigram a_b -> -log2(2/3)
    assert(r(0)._1 == 0L && r(0)._2 == 1L)
    assert(math.abs(r(0)._3 - (-math.log(2.0 / 3.0) / math.log(2.0))) < 1e-5)
    // doc1: a_c, c_a, a_b; c(c_a)=1, c1(c)=1 -> P=1 contributes 0;
    // avg = (log2(3) + 0 + log2(3/2)) / 3
    val expected = ((math.log(3.0) + math.log(1.5)) / math.log(2.0)) / 3.0
    assert(r(1)._1 == 1L && r(1)._2 == 3L)
    assert(math.abs(r(1)._3 - expected) < 1e-5)
    // doc2 has no bigrams -> absent
    assert(r.length == 2)
  }

  test("bigramLogProb: the dominant transition scores near zero, a rare one high") {
    // corpus: the->cat 40x vs the->dog 1x; a doc made of the common
    // transition is predictable (score ~0), the rare transition costs
    // -log2(1/41) ~ 5.4 bits
    val common = Seq.fill(40)("the cat").mkString(" ")
    val r = TextAnalysis.bigramLogProb(docsOf(0L -> common, 1L -> "the dog"))
      .orderBy("doc_id").select("avg_neg_logprob").as[Double].collect()
    assert(r(0) < 0.1, s"dominant-transition doc scored ${r(0)}")
    assert(r(1) > 5.0, s"rare-transition doc scored ${r(1)}")
  }

  // ---- zipfSlope

  test("zipfSlope: an exact power law fits slope -1") {
    // row_number ranks are consecutive 1..4, so pick freq = 240/rank
    // (exact integers 240,120,80,60): log2(freq) = log2(240) - log2(rank)
    // -> least-squares slope exactly -1
    val words = (1 to 4).flatMap(r => Seq.fill(240 / r)(s"w$r"))
    val df = Seq((0L, words.mkString(" "), "en")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.zipfSlope(df).as[(String, Long, Double)].head()
    assert(r._1 == "en" && r._2 == 4L)
    assert(math.abs(r._3 - (-1.0)) < 2e-6, s"slope ${r._3}")
  }

  // ---- mixtureSample

  test("mixtureSample: rates hit targets, under-target domains keep everything") {
    val df = (0L until 1000L).map(i => (i, if (i < 800) "web" else "code"))
      .toDF("doc_id", "source")
    // web: 800 rows, target 20% of 1000 -> rate 250000 ppm
    // code: 200 rows, target 50% of 1000 -> rate capped at 1.0
    val out = Sampling.mixtureSample(df, "doc_id", "source",
      Map("web" -> 0.2, "code" -> 0.5))
    val ppm = out.select("source", "keep_ppm").distinct().as[(String, Long)]
      .collect().toMap
    assert(ppm == Map("web" -> 250000L, "code" -> 1000000L))
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("code") == 200L, "under-cap domain must keep every row")
    // hash-uniform: web keeps ~200 of 800 (25%); wide tolerance, no flake
    assert(counts("web") > 120L && counts("web") < 280L, counts.toString)
  }

  test("mixtureSample: absent domains drop; result is partition-stable") {
    val df = (0L until 100L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val out = Sampling.mixtureSample(df, "doc_id", "source", Map("src0" -> 0.1))
    assert(out.select("source").distinct().as[String].collect().toSeq == Seq("src0"))
    val a = out.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.mixtureSample(df.repartition(7), "doc_id", "source", Map("src0" -> 0.1))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, "sample must not depend on partitioning")
  }

  // ---- dedupNearMinhashKeepBest

  test("dedupNearMinhashKeepBest: the highest-score cluster member wins; singletons survive") {
    // identical texts -> jaccard 1 -> the LSH family cannot miss the pairs;
    // the SCORE column (not derived from text here) decides the winner
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq(
      (1L, near, 10L),
      (2L, near, 99L),
      (3L, near, 12L),
      (9L, "a completely unrelated singleton document body here", 51L))
      .toDF("doc_id", "text", "n_chars")
    val kept = graft.operators.Dedup
      .dedupNearMinhashKeepBest(df, threshold = 0.5, scoreCol = "n_chars")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 9L), "doc 2 has the max score")
    // control: the min-id variant keeps doc 1 instead — the policies differ
    val minId = graft.operators.Dedup.dedupNearMinhash(df, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(minId == Seq(1L, 9L))
  }

  // ---- labelCentroids

  test("labelCentroids: exact fixed-point means, partition-order independent") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f), 0),
      (2L, Array(0.0f, 0.25f), 0),
      (3L, Array(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity.labelCentroids(df)
      .orderBy("label", "dim")
      .select("label", "dim", "n", "centroid")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(r == Seq((0, 0L, 2L, 0.5), (0, 1L, 2L, -0.125),
      (1, 0L, 1L, 0.5), (1, 1L, 1L, 0.5)))
    val shuffled = graft.operators.Similarity.labelCentroids(df.repartition(5))
      .orderBy("label", "dim").select("centroid").as[Double].collect().toSeq
    assert(shuffled == r.map(_._4), "mean must not depend on partial-sum order")
  }

  // ---- cdcChunk

  test("cdcChunk: chunks partition the document and reassemble to the original text") {
    val text = (1 to 200).map(i => s"tok${i * 7 % 131}").mkString(" ")
    val chunks = TextAnalysis.cdcChunk(docsOf(0L -> text), window = 4, divisor = 8)
      .orderBy("chunk_idx")
      .select("start_tok", "end_tok", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    // contiguous, non-overlapping cover starting at 0
    assert(chunks.head._1 == 0L)
    chunks.sliding(2).foreach { case Array(a, b) => assert(a._2 == b._1); case _ => }
    assert(chunks.last._2 == 200L)
    assert(chunks.forall(c => c._3 == c._2 - c._1))
    assert(chunks.map(_._4).mkString(" ") == text)
    assert(chunks.length > 5, s"divisor 8 over 200 tokens should cut >5 chunks, got ${chunks.length}")
  }

  test("cdcChunk: a prefix insertion only disturbs chunks before the first content boundary") {
    val base = (1 to 300).map(i => s"w${i * 13 % 251}").mkString(" ")
    val edited = "inserted tokens here " + base
    val out = TextAnalysis.cdcChunk(
      docsOf(0L -> base, 1L -> edited), window = 4, divisor = 8)
    val a = out.filter(col("doc_id") === 0L).select("chunk_idx", "chunk_md5")
      .as[(Long, String)].collect().sortBy(_._1)
    val b = out.filter(col("doc_id") === 1L).select("chunk_md5").as[String].collect().toSet
    // every chunk of the base doc except the FIRST must re-align and dedup
    // against the edited doc — the content-defined property (fixed-window
    // chunking would share nothing after a 3-token prefix shift)
    val missing = a.drop(1).filterNot(c => b.contains(c._2))
    assert(missing.isEmpty, s"chunks lost after realignment: ${missing.mkString(",")}")
  }

  test("cdcChunk plan: ONE tokenization, ONE shuffle (group-by reuses the window's doc_id partitioning)") {
    val out = TextAnalysis.cdcChunk(docsOf(0L -> "a b c d e f g h i j", 1L -> "k l m n o p"))
    out.collect() // AQE: final plan exists only after execution
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    val generates = "Generate".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 explode (one tokenization), got $generates:\n$plan")
  }

  test("bigramLogProb plan: ONE tokenization — successor via element_at, no doc-ordered window shuffle") {
    val out = TextAnalysis.bigramLogProb(docsOf(0L -> "a b a c", 1L -> "x y"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val generates = "Generate".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 explode, got $generates:\n$plan")
    // shuffles: (doc,w1,w2) aggregate + the two vocabulary windows + final
    // doc aggregate = 4 hash exchanges is the ceiling; the lead()-window
    // form had 5 (an extra doc-ordered sort exchange before the aggregate)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 4, s"expected <=4 shuffles, got $exchanges:\n$plan")
  }

  test("cdcChunk equals an in-memory reference on 25 random corpora") {
    // tiny vocab + divisor 8 -> boundaries land everywhere, incl. edge
    // cases (boundary at the second-to-last eligible pos, 1-token docs)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
    val rng = new scala.util.Random(7)
    val w = 4
    val d = 8
    (1 to 25).foreach { _ =>
      val docs = (0L until (1 + rng.nextInt(4)).toLong).map { id =>
        id -> Seq.fill(1 + rng.nextInt(40))(s"t${rng.nextInt(6)}").mkString(" ")
      }
      val exp = docs.flatMap { case (id, text) =>
        val tl = text.split(" ", -1)
        val boundary = tl.indices.map(p =>
          p >= w - 1 && p < tl.length - 1 &&
            h60(tl.slice(p - w + 1, p + 1).mkString(" ")) % d == 0)
        var idx = 0L
        val chunkOf = tl.indices.map { p =>
          if (p > 0 && boundary(p - 1)) idx += 1
          idx
        }
        chunkOf.zipWithIndex.groupBy(_._1).toSeq.map { case (ci, ps) =>
          val pos = ps.map(_._2)
          val ct = pos.sorted.map(tl).mkString(" ")
          (id, ci, pos.min.toLong, pos.max.toLong + 1L, pos.size.toLong, ct, md5hex(ct))
        }
      }.toSet
      val got = TextAnalysis.cdcChunk(docs.toDF("doc_id", "text"), window = w, divisor = d)
        .as[(Long, Long, Long, Long, Long, String, String)].collect().toSet
      assert(got == exp, s"cdc mismatch on: $docs")
    }
  }

  // ---- bloomSemiJoin

  test("bloomSemiJoin equals the plain semi join (false positives removed)") {
    val big = (0L until 5000L).map(i => (i, i % 97)).toDF("k", "payload")
    val small = Seq(3L, 14L, 159L, 2653L, 4999L).toDF("sk")
    val got = RuntimeFilter.bloomSemiJoin(big, "k", small, "sk", expectedItems = 10L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 14L, 159L, 2653L, 4999L))
  }

  test("bloomSemiJoin: bloom predicate is a codegen'd literal, no UDF in the plan") {
    // spark.range, not a local Seq: ConvertToLocalRelation folds filters
    // over LocalRelation at optimize time, which would hide the predicate
    val big = spark.range(100).select(col("id").as("k"), col("id").as("v"))
    val small = spark.range(1, 3).select(col("id").as("sk"))
    val plan = RuntimeFilter.bloomSemiJoin(big, "k", small, "sk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"expected bloom_might_contain in:\n$plan")
    assert(!plan.toLowerCase.contains("batchevalpython") && !plan.contains("UDF"),
      s"bloom pass must not be a UDF:\n$plan")
  }

  test("bloomSemiJoin: plan strings stay small — the bloom bytes never render") {
    val big = spark.range(1000).select(col("id").as("k"), col("id").as("v"))
    val small = spark.range(500).select(col("id").as("sk"))
    // a 1M-item bloom is ~1.2 MB; with the bytes as a Literal child this
    // explain string was multi-GB (OOM'd an 8g driver via AQE's
    // per-update explainString) — as an expression field it stays tiny
    val df = RuntimeFilter.bloomSemiJoin(big, "k", small, "sk", expectedItems = 1000000L)
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExtendedMode)
    assert(s.length < 100000, s"explain string blew up: ${s.length} chars")
    assert(df.count() == 500)
  }

  test("bloomSemiJoin refuses mismatched key types (xxhash64 is not cast-stable)") {
    // int vs bigint keys: the bloom would be built from hashLong values and
    // probed with hashInt values — every probe a FALSE NEGATIVE, silently
    // dropping all matches before the semi join. Must throw, not mis-answer.
    val big = spark.range(10).select(col("id").cast("int").as("k"))
    val small = spark.range(5).select(col("id").as("sk"))
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomSemiJoin(big, "k", small, "sk")
    }
    assert(e.getMessage.contains("cast-stable"), e.getMessage)
  }

  test("bloomSemiJoin: undersized bloom (high fpp) stays exact") {
    val big = (0L until 2000L).map(i => (i, i)).toDF("k", "v")
    val keys = (0L until 2000L by 3L)
    val small = keys.toDF("sk")
    // expectedItems 10 for ~667 keys -> fpp ~1; exactness must survive
    val got = RuntimeFilter.bloomSemiJoin(big, "k", small, "sk", expectedItems = 10L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == keys.toSeq)
  }
}
