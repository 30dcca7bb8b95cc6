package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-5 pipeline-operator additions: repetition signals, PII redaction,
  * TF-IDF top-k, benchmark decontamination. */
class TextPipelineSpec extends SparkFunSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- repetitionStats

  test("repetitionStats: hand-checked counts, ratios, and verdicts") {
    val df = docsOf(
      0L -> "a a a b", // top a=3/4, bigrams {a_a, a_b} of 3 -> dup 1/3
      1L -> "w x y z w x", // top 2/6, bigrams {w_x, x_y, y_z, z_w} of 5 -> dup 1/5
      2L -> "solo") // 1 token: dup ratio defined as 0
    val r = TextAnalysis.repetitionStats(df)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "top_token_freq", "top_token_ratio", "dup_bigram_ratio", "verdict")
      .as[(Long, Long, Long, Double, Double, String)]
      .collect()
    assert(r(0) == ((0L, 4L, 3L, 0.75, 0.333333, "top_token")))
    assert(r(1) == ((1L, 6L, 2L, 0.333333, 0.2, "top_token")))
    assert(r(2) == ((2L, 1L, 1L, 1.0, 0.0, "top_token")))
  }

  test("repetitionStats: a diverse document passes, a copy-paste loop flags dup_bigrams") {
    val diverse = (1 to 50).map(i => s"tok$i").mkString(" ")
    val looped = Seq.fill(20)("copy paste block body").flatMap(_.split(" ")).mkString(" ")
    val r = TextAnalysis.repetitionStats(docsOf(0L -> diverse, 1L -> looped))
      .orderBy("doc_id").select("verdict").as[String].collect()
    assert(r(0) == "ok")
    // every token appears 20x of 80 -> top ratio 0.25 -> trips top_token first
    assert(r(1) == "top_token")
    // with the top-token rule out of reach (8 distinct tokens, each 10/80 =
    // 0.125), the bigram rule must catch the loop: 8 distinct bigrams of 79
    val loopedLong = Seq.fill(10)("one two three four five six seven eight")
      .mkString(" ")
    val r2 = TextAnalysis.repetitionStats(docsOf(2L -> loopedLong))
      .select("top_token_ratio", "dup_bigram_ratio", "verdict")
      .as[(Double, Double, String)].head()
    assert(r2._1 <= 0.2 && r2._2 > 0.5 && r2._3 == "dup_bigrams", r2.toString)
  }

  test("repetitionStats plan: ONE tokenization, ONE shuffle (all windows share the doc_id exchange)") {
    val out = TextAnalysis.repetitionStats(docsOf(0L -> "a b a c", 1L -> "x y x y"))
    out.collect() // AQE: final plan exists only after execution
    // toString appends the pre-AQE "Initial Plan" — count the final one only
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
    val generates = "Generate".r.findAllIn(plan).size
    assert(generates == 1, s"expected 1 explode (one tokenization), got $generates:\n$plan")
  }

  // ---- redactPii

  test("redactPii: counts before rewrite, placeholders after, clean text untouched") {
    val df = docsOf(
      0L -> "mail me at bob.smith@corp.example.com or call 555-123-4567 now",
      1L -> "server 192.168.1.254 and 10.0.0.1 responded",
      2L -> "no pii here just words",
      3L -> "two mails a@b.co c.d@e.fg one ip 8.8.8.8")
    val r = TextAnalysis.redactPii(df)
      .orderBy("doc_id")
      .select("n_email", "n_ip", "n_phone", "redacted")
      .as[(Long, Long, Long, String)]
      .collect()
    assert(r(0) == ((1L, 0L, 1L, "mail me at <EMAIL> or call <PHONE> now")))
    assert(r(1) == ((0L, 2L, 0L, "server <IP> and <IP> responded")))
    assert(r(2) == ((0L, 0L, 0L, "no pii here just words")))
    assert(r(3) == ((2L, 1L, 0L, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("redactPii: an IP is not half-eaten by the email pass and digits in words survive") {
    val r = TextAnalysis.redactPii(docsOf(
      0L -> "v2.0.1.3 build 12345 at 1.2.3.4"))
      .select("n_email", "n_ip", "redacted").as[(Long, Long, String)].head()
    // v2.0.1.3 has a non-digit run -> not an IP; 12345 bare number untouched
    assert(r == ((0L, 1L, "v2.0.1.3 build 12345 at <IP>")))
  }

  // ---- tfidfTopK

  test("tfidfTopK: hand-checked scores, corpus-wide terms score zero, ties break on term") {
    // "shared" in all 3 docs -> idf ln(1) = 0; "rare" only in doc 0
    val df = docsOf(
      0L -> "rare shared shared",
      1L -> "shared common",
      2L -> "common shared shared")
    val r = TextAnalysis.tfidfTopK(df, k = 3)
      .orderBy("doc_id", "rn")
      .select("doc_id", "term", "tf", "df", "tfidf", "rn")
      .as[(Long, String, Long, Long, Double, Long)]
      .collect()
    val ln3 = BigDecimal(math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln15 = BigDecimal(math.log(1.5)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.filter(_._1 == 0L).map(x => (x._2, x._5, x._6)).toSeq ==
      Seq(("rare", ln3, 1L), ("shared", 0.0, 2L)))
    // doc 1: common (ln 1.5) beats shared (0); both k-capped at 2 terms
    assert(r.filter(_._1 == 1L).map(x => (x._2, x._5)).toSeq ==
      Seq(("common", ln15), ("shared", 0.0)))
    // doc 2: common 1*ln1.5 vs shared 0 -> common first
    assert(r.filter(_._1 == 2L).map(_._2).toSeq == Seq("common", "shared"))
    // df values: shared in 3 docs, common in 2, rare in 1
    assert(r.find(_._2 == "shared").get._4 == 3L)
    assert(r.find(_._2 == "common").get._4 == 2L)
    assert(r.find(_._2 == "rare").get._4 == 1L)
  }

  test("tfidfTopK: k caps rows per doc and equal scores order by term ascending") {
    // zeta/alpha both appear once in doc 0 only -> identical tfidf; term
    // ascending must put alpha first
    val df = docsOf(0L -> "zeta alpha fill", 1L -> "fill", 2L -> "fill")
    val r = TextAnalysis.tfidfTopK(df, k = 2)
      .filter($"doc_id" === 0L).orderBy("rn")
      .select("term").as[String].collect()
    assert(r.toSeq == Seq("alpha", "zeta"))
  }

  test("tfidfTopK plan: document frequency is a window, never a broadcast join") {
    // the df table is vocabulary-sized (10^8-10^9 terms at 100 TB) — a
    // forced broadcast hint would override Spark's size gate and OOM the
    // driver at scale. The plan must compute df as a window over tf: no
    // hash/merge join anywhere; the only broadcast is the 1-row corpus
    // count feeding the nested-loop cross join.
    val out = TextAnalysis.tfidfTopK(docsOf(0L -> "a b c", 1L -> "b c d"), k = 2)
    out.collect() // AQE: the final executed plan exists only after execution
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffledHashJoin"), plan)
  }

  // ---- repeatedSpans

  test("repeatedSpans: cross-doc windows mark, overlapping windows merge, unique text silent") {
    val boiler = "one two three four five six seven eight nine ten" // 10 tokens
    val r = Dedup.repeatedSpans(
      docsOf(
        0L -> s"alpha beta $boiler gamma delta",   // boiler at tokens 2..11
        1L -> s"$boiler epsilon zeta eta theta iota kappa", // boiler at 0..9
        2L -> "completely unrelated words with no duplication at all here"),
      window = 8)
      .orderBy("doc_id")
      .select("doc_id", "span_idx", "start_tok", "end_tok", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect()
    // 10-token boiler -> 3 windows of 8 (offsets 0,1,2 within it), one span
    assert(r.toSeq == Seq((0L, 1L, 2L, 12L, 3L), (1L, 1L, 0L, 10L, 3L)))
  }

  test("repeatedSpans: two marked windows sharing no tokens stay separate spans") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8" // 8 tokens, exactly one window
    val b = "x1 x2 x3 x4 x5 x6 x7 x8"
    // doc 0: a ... filler(8) ... b ; docs 1/2 repeat a / b respectively
    val r = Dedup.repeatedSpans(
      docsOf(
        0L -> s"$a f1 f2 f3 f4 f5 f6 f7 f8 $b",
        1L -> s"$a tail1 tail2 tail3 tail4 tail5 tail6 tail7 tail8",
        2L -> s"head1 head2 head3 head4 head5 head6 head7 head8 $b"),
      window = 8)
      .filter($"doc_id" === 0L).orderBy("span_idx")
      .select("span_idx", "start_tok", "end_tok", "n_windows")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 0L, 8L, 1L), (2L, 16L, 24L, 1L)))
  }

  test("removeRepeatedSpans: covered tokens scrubbed, order kept, full coverage yields ''") {
    val boiler = "one two three four five six seven eight nine ten"
    val r = Dedup.removeRepeatedSpans(
      docsOf(
        0L -> s"alpha beta $boiler gamma delta", // span tokens 2..11
        1L -> boiler,                            // fully covered -> ''
        2L -> "totally unique words in this little document right here"),
      window = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "n_removed", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(r(0) == ((0L, 14L, 4L, 10L, "alpha beta gamma delta")))
    assert(r(1) == ((1L, 10L, 0L, 10L, "")))
    assert(r(2) == ((2L, 9L, 9L, 0L, "totally unique words in this little document right here")))
  }

  // ---- unigramLogProb

  test("unigramLogProb: hand-checked corpus-frequency scores") {
    // corpus: a:2 b:2 c:1 of 5 total
    val r = TextAnalysis.unigramLogProb(docsOf(0L -> "a a b", 1L -> "b c"))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "avg_neg_logprob")
      .as[(Long, Long, Double)].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: -(2·log2(2/5) + 1·log2(2/5))/3 = -log2(0.4)
    assert(r(0) == ((0L, 3L, r6(-math.log(0.4) / math.log(2)))))
    // doc 1: -(log2(2/5) + log2(1/5))/2
    assert(r(1) == ((1L, 2L,
      r6(-(math.log(0.4) + math.log(0.2)) / (2 * math.log(2))))))
    // rare-token spam scores strictly higher than common prose
    val common = Seq.fill(30)("the of and").mkString(" ")
    val spam = "zzqx wvvk pqrst uuuw"
    val s = TextAnalysis.unigramLogProb(docsOf(0L -> common, 1L -> spam))
      .orderBy("doc_id").select("avg_neg_logprob").as[Double].collect()
    assert(s(1) > s(0), s.mkString(","))
  }

  // ---- dedupChunksWithinDoc

  test("dedupChunksWithinDoc: window-aligned repeats collapse to first occurrence, order kept") {
    val r = TextAnalysis.dedupChunksWithinDoc(
      docsOf(
        0L -> "a b c a b c d", // [a b c][a b c][d] -> drop the repeat
        1L -> "x y z w v u"),  // no repeats
      chunkSize = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_kept", "n_dropped", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(r(0) == ((0L, 3L, 2L, 1L, "a b c d")))
    assert(r(1) == ((1L, 2L, 2L, 0L, "x y z w v u")))
    // unaligned repeat is NOT caught (documented fixed-window trade-off)
    val r2 = TextAnalysis.dedupChunksWithinDoc(
      docsOf(2L -> "p a b c a b c"), chunkSize = 3)
      .select("n_dropped").as[Long].head()
    assert(r2 == 0L)
  }

  test("repeatedSpans + removeRepeatedSpans equal an in-memory reference on 25 random corpora") {
    // tiny vocab forces abundant natural cross-doc repeats at every length
    val rng = new scala.util.Random(42)
    val w = 4
    (1 to 25).foreach { _ =>
      val vocabSize = 2 + rng.nextInt(4)
      val docs = (0L until (2 + rng.nextInt(5)).toLong).map { id =>
        id -> Seq.fill(1 + rng.nextInt(30))(s"w${rng.nextInt(vocabSize)}").mkString(" ")
      }
      // reference: brute-force window sets + per-doc overlap merge
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1) }.toMap
      val wins = toks.toSeq.flatMap { case (id, tl) =>
        (0 to tl.length - w).map(p => (id, p, tl.slice(p, p + w).mkString(" ")))
      }
      val multiDoc = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
      val marked = wins.filter(x => multiDoc(x._3)).groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
      val expSpans = marked.toSeq.flatMap { case (id, ps) =>
        val spans = ps.foldLeft(List.empty[(Int, Int, Int)]) { // (start, lastPos, nWin)
          case (acc, p) if acc.nonEmpty && p - acc.head._2 < w =>
            (acc.head._1, p, acc.head._3 + 1) :: acc.tail
          case (acc, p) => (p, p, 1) :: acc
        }.reverse
        spans.zipWithIndex.map { case ((s, last, n), i) =>
          (id, (i + 1).toLong, s.toLong, (last + w).toLong, n.toLong)
        }
      }.toSet
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.repeatedSpans(df, window = w)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expSpans, s"spans mismatch on corpus: $docs")
      // scrub: positions covered by any span removed, order preserved
      val covered = expSpans.groupBy(_._1).view.mapValues(ss =>
        ss.flatMap(s => s._3 until s._4).toSet).toMap
      val expClean = docs.map { case (id, _) =>
        val tl = toks(id); val cov = covered.getOrElse(id, Set.empty)
        val kept = tl.zipWithIndex.collect { case (t, p) if !cov(p.toLong) => t }
        (id, tl.length.toLong, kept.length.toLong, (tl.length - kept.length).toLong,
          kept.mkString(" "))
      }.toSet
      val gotClean = Dedup.removeRepeatedSpans(df, window = w)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(gotClean == expClean, s"scrub mismatch on corpus: $docs")
    }
  }

  // ---- packSequences / diversitySample

  test("packSequences: id-ordered prefix bins per shard, overflow bounded by one doc") {
    import graft.operators.Sampling
    // one shard; docs of 3/4/5/6 tokens, budget 8:
    // prev: 0,3,7,12 -> bins 0,0,0,1 (doc 2 straddles: bin 0 holds 12)
    val df = Seq(
      (0L, "a b c"), (1L, "a b c d"), (2L, "a b c d e"), (3L, "a b c d e f"))
      .toDF("doc_id", "text")
    val r = Sampling.packSequences(df, budgetTokens = 8L, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "prev_tokens", "bin")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 3L, 0L, 0L), (1L, 4L, 3L, 0L), (2L, 5L, 7L, 0L), (3L, 6L, 12L, 1L)))
    // per-bin token totals overflow the budget by LESS than one max doc
    val tot = r.groupBy(_._4).map { case (_, xs) => xs.map(_._2).sum }
    assert(tot.forall(_ < 8L + 6L))
    // sharding: every doc appears exactly once regardless of shard count
    val sharded = Sampling.packSequences(df, budgetTokens = 8L, shards = 3)
    assert(sharded.count() == 4L && sharded.select("doc_id").distinct().count() == 4L)
  }

  test("diversitySample: dense cells capped at perCell, every vector ranked at most once") {
    val emb = SparkEntry.table(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val r = graft.operators.Similarity.diversitySample(emb, perCell = 3)
      .select("vec_id", "cell", "rk").as[(Long, Long, Long)].collect()
    assert(r.map(_._1).distinct.length == r.length)    // no vector twice
    assert(r.groupBy(_._2).forall(_._2.length <= 3))   // cap holds
    assert(r.forall(_._3 >= 1L) && r.forall(_._3 <= 3L))
  }

  // ---- decontaminate

  test("decontaminate: exact overlap counts, clean docs absent, short docs safe") {
    val train = docsOf(
      0L -> "the quick brown fox jumps over the lazy dog", // shares 2 distinct 4-grams
      1L -> "completely different words entirely here now",
      2L -> "tiny doc", // < n tokens: no shingles, never flags
      3L -> "quick brown fox jumps") // exactly one 4-gram, shared
    val test = docsOf(
      100L -> "the quick brown fox jumps elsewhere") // 4-grams: the_quick_brown_fox, quick_brown_fox_jumps, brown_fox_jumps_elsewhere
    val r = Dedup.decontaminate(train, test, n = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 2L, 3L -> 1L))
  }

  test("decontaminate: non-long ids take the columnar path, type preserved") {
    // the fused kernel casts ids to long (would null UUIDs) — string ids
    // must route through the Exchange-materialized columnar fallback
    val train = Seq(("u-aa", "the quick brown fox jumps"), ("u-bb", "nothing shared here at all"))
      .toDF("doc_id", "text")
    val test = Seq(("t-1", "the quick brown fox elsewhere")).toDF("doc_id", "text")
    val r = Dedup.decontaminate(train, test, n = 4).as[(String, Long)].collect().toMap
    assert(r == Map("u-aa" -> 1L))
  }

  test("decontaminate: count is per distinct shingle even when the train doc repeats it") {
    val train = docsOf(0L -> "a b c d x a b c d") // a_b_c_d appears twice, distinct once
    val test = docsOf(1L -> "a b c d")
    val r = Dedup.decontaminate(train, test, n = 4).as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L))
  }
}
