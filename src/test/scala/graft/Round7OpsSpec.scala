package graft

import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Round-7 additions: cross-corpus shingle overlap/containment,
  * corpus-wide boilerplate/novelty profiling, token-budget corpus mixing. */
class Round7OpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  private def md5hexRef(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60Ref(s: String): Long =
    java.lang.Long.parseLong(md5hexRef(s).substring(0, 15), 16)

  private def shinglesRef(text: String, n: Int): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString("_")).toSet
  }

  test("corpusOverlap: hand-computed two-corpus pair") {
    val df = docsOf(
      (0L, "A", "a b c d"), // shingles: a_b_c, b_c_d
      (1L, "B", "b c d e")) // shingles: b_c_d, c_d_e
    val r = Dedup.corpusOverlap(df, corpusCol = "source").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("corpus_a") == "A")
    assert(row.getAs[String]("corpus_b") == "B")
    assert(row.getAs[Long]("inter") == 1L)
    assert(row.getAs[Long]("vocab_a") == 2L)
    assert(row.getAs[Long]("vocab_b") == 2L)
    assert(row.getAs[Double]("containment_a") == 0.5)
    assert(row.getAs[Double]("containment_b") == 0.5)
    assert(row.getAs[Double]("jaccard") == 0.333333)
  }

  test("corpusOverlap: zero-overlap pairs are absent; short docs contribute nothing") {
    val df = docsOf(
      (0L, "A", "a b c"),
      (1L, "B", "x y z"),
      (2L, "C", "a b")) // < 3 tokens: no shingles, corpus C has no vocabulary
    val r = Dedup.corpusOverlap(df, corpusCol = "source").collect()
    assert(r.isEmpty)
  }

  test("corpusOverlap: null corpus labels are ignored end-to-end") {
    val df = Seq(
      (0L, Some("A"), "a b c d"),
      (1L, Some("B"), "b c d e"),
      (2L, None, "a b c d e f")) // unlabeled: no vocabulary, no pair
      .toDF("doc_id", "source", "text")
    val r = Dedup.corpusOverlap(df, corpusCol = "source").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("vocab_a") == 2L && r.head.getAs[Long]("vocab_b") == 2L)
    assert(r.head.getAs[Long]("inter") == 1L)
  }

  test("corpusOverlap matches an in-memory reference on random multi-corpus data") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d", "e", "f", "g")
    val rows = (0 until 120).map { i =>
      val src = s"src${i % 4}"
      val len = 2 + rnd.nextInt(10)
      (i.toLong, src, Vector.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val expected = {
      val vocab = rows.groupBy(_._2).view
        .mapValues(_.flatMap(r => shinglesRef(r._3, 3)).toSet).toMap
      for {
        a <- vocab.keys.toSeq; b <- vocab.keys.toSeq if a < b
        inter = (vocab(a) & vocab(b)).size if inter > 0
      } yield (a, b, inter.toLong, vocab(a).size.toLong, vocab(b).size.toLong)
    }.sortBy(t => (t._1, t._2))
    val got = Dedup.corpusOverlap(docsOf(rows: _*), corpusCol = "source")
      .orderBy("corpus_a", "corpus_b")
      .select("corpus_a", "corpus_b", "inter", "vocab_a", "vocab_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // cross-strategy equivalence: the bitmask rollup is row-identical
    val viaMask = Dedup.corpusOverlap(docsOf(rows: _*), corpusCol = "source",
        strategy = "bitmask")
      .orderBy("corpus_a", "corpus_b")
      .select("corpus_a", "corpus_b", "inter", "vocab_a", "vocab_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(viaMask == expected)
  }

  test("corpusOverlap sampled tier equals the reference restricted to the hash-kept universe") {
    val rnd = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rows = (0 until 150).map { i =>
      val src = s"src${i % 3}"
      val len = 3 + rnd.nextInt(12)
      (i.toLong, src, Vector.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val mod = 2
    val vocab = rows.groupBy(_._2).view
      .mapValues(_.flatMap(r => shinglesRef(r._3, 3)).toSet
        .filter(sh => hash60Ref(sh) % mod == 0)).toMap
    val expected = (for {
      a <- vocab.keys.toSeq; b <- vocab.keys.toSeq if a < b
      inter = (vocab(a) & vocab(b)).size if inter > 0
    } yield (a, b, inter.toLong, vocab(a).size.toLong, vocab(b).size.toLong))
      .sortBy(t => (t._1, t._2))
    val got = Dedup.corpusOverlap(docsOf(rows: _*), corpusCol = "source", sampleMod = mod)
      .orderBy("corpus_a", "corpus_b")
      .select("corpus_a", "corpus_b", "inter", "vocab_a", "vocab_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the sample is deterministic: a second invocation is bit-identical
    val again = Dedup.corpusOverlap(docsOf(rows: _*), corpusCol = "source", sampleMod = mod)
      .orderBy("corpus_a", "corpus_b")
      .select("corpus_a", "corpus_b", "inter", "vocab_a", "vocab_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("corpusOverlap: pairwise fallback (k > 62) agrees with the reference") {
    // 70 corpora forces the array-explode path (mask exceeds one long)
    val rnd = new scala.util.Random(43)
    val words = Vector("a", "b", "c", "d")
    val rows = (0 until 140).map { i =>
      (i.toLong, s"c%02d".format(i % 70),
        Vector.fill(3 + rnd.nextInt(5))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val vocab = rows.groupBy(_._2).view
      .mapValues(_.flatMap(r => shinglesRef(r._3, 3)).toSet).toMap
    val expected = (for {
      a <- vocab.keys.toSeq; b <- vocab.keys.toSeq if a < b
      inter = (vocab(a) & vocab(b)).size if inter > 0
    } yield (a, b, inter.toLong)).sortBy(t => (t._1, t._2))
    val got = Dedup.corpusOverlap(rows.toDF("doc_id", "source", "text"), corpusCol = "source")
      .orderBy("corpus_a", "corpus_b")
      .select("corpus_a", "corpus_b", "inter")
      .as[(String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  // ---- boilerplateProfile

  test("boilerplateProfile: hand-computed df/first-seen on three docs") {
    val df = Seq(
      (0L, "a b c d"), // a_b_c (df2, first 0), b_c_d (df3, first 0)
      (1L, "b c d e"), // b_c_d, c_d_e (df1, first 1)
      (2L, "a b c d"), // a_b_c, b_c_d — introduces nothing
      (3L, "x")) // shingle-less
      .toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateProfile(df, dfThreshold = 3L)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_novel", "n_common")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 2L, 2L, 1L), (1L, 2L, 1L, 1L), (2L, 2L, 0L, 1L), (3L, 0L, 0L, 0L)))
  }

  test("boilerplateProfile matches an in-memory reference on random docs") {
    val rnd = new scala.util.Random(13)
    val words = Vector("a", "b", "c", "d", "e")
    val rows = (0 until 80).map { i =>
      val len = 1 + rnd.nextInt(9)
      (i.toLong, Vector.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val thr = 5L
    val perDoc = rows.map { case (id, t) => id -> shinglesRef(t, 3) }.toMap
    val dfreq = perDoc.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val firstSeen = perDoc.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = rows.map { case (id, _) =>
      val ss = perDoc(id)
      (id, ss.size.toLong,
        ss.count(s => firstSeen(s) == id).toLong,
        ss.count(s => dfreq(s) >= thr).toLong)
    }.sortBy(_._1)
    val got = TextAnalysis.boilerplateProfile(rows.toDF("doc_id", "text"), dfThreshold = thr)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_novel", "n_common")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("vocabGrowth matches an in-memory first-seen reference") {
    val rnd = new scala.util.Random(41)
    val words = Vector("a", "b", "c", "d", "e", "f")
    val rows = (0 until 100).map { i =>
      (i.toLong, Vector.fill(3 + rnd.nextInt(8))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val firstSeen = rows.flatMap { case (id, t) => shinglesRef(t, 3).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = firstSeen.values.groupBy(_ / 10).view
      .mapValues(_.size.toLong).toMap.toSeq.sortBy(_._1)
    val got = TextAnalysis.vocabGrowth(rows.toDF("doc_id", "text"), bucketSize = 10)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // saturation: total novelty equals total distinct vocabulary
    assert(got.map(_._2).sum == firstSeen.size.toLong)
  }

  // ---- tokenBudgetMix

  private def mixRef(
      rows: Seq[(Long, String, String)],
      weights: Map[String, Long],
      budget: Long): Seq[(Long, String, Long, Long)] = {
    val denom = weights.values.sum
    rows.groupBy(_._2).toSeq.flatMap { case (src, docs) =>
      val share = budget * weights(src) / denom
      var cum = 0L
      docs.map { case (id, _, t) =>
        (id, src, t.split(" ", -1).length.toLong, hash60Ref(s"mix:$id"))
      }.sortBy(r => (r._4, r._1)).flatMap { case (id, s, n, _) =>
        val before = cum; cum += n
        if (before < share) Some((id, s, n, before)) else None
      }
    }.sortBy(_._1)
  }

  test("tokenBudgetMix equals the naive per-source cumsum reference") {
    val rnd = new scala.util.Random(17)
    val words = Vector("a", "b", "c", "d", "e")
    val rows = (0 until 200).map { i =>
      val src = s"s${i % 5}"
      val len = 1 + rnd.nextInt(20)
      (i.toLong, src, Vector.fill(len)(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val wm = Map("s0" -> 1L, "s1" -> 2L, "s2" -> 3L, "s3" -> 1L, "s4" -> 2L)
    val w = wm.toSeq.toDF("source", "weight")
    val budget = 800L
    val got = Sampling.tokenBudgetMix(rows.toDF("doc_id", "source", "text"), w, budget)
      .orderBy("doc_id")
      .select("doc_id", "source", "n_tokens", "cum_before")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == mixRef(rows, wm, budget))
    // realized token counts land within one doc of each source's share
    val denom = wm.values.sum
    got.groupBy(_._2).foreach { case (src, admitted) =>
      val share = budget * wm(src) / denom
      val toks = admitted.map(_._3).sum
      val maxDoc = admitted.map(_._3).max
      assert(toks >= math.min(share,
        rows.filter(_._2 == src).map(_._3.split(" ", -1).length.toLong).sum))
      assert(toks < share + maxDoc)
    }
  }

  test("histogramEqualize equals an exact in-memory replay and flattens the histogram") {
    val rnd = new scala.util.Random(29)
    // skewed bins: bin b gets ~ (b+1)^2 * 15 rows
    val rows = (0 until 4).flatMap { b =>
      (0 until (b + 1) * (b + 1) * 15).map(_ => (rnd.nextLong().abs % 1000000L, b.toLong))
    }.distinct.zipWithIndex.map { case ((_, b), i) => (i.toLong, b) }
    val df = rows.toDF("doc_id", "bin")
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val minC = counts.values.min
    val expected = rows.filter { case (id, b) =>
      val ppm = minC * 1000000L / counts(b)
      hash60Ref(s"$b:$id") % 1000000L < ppm
    }.sortBy(_._1)
    val got = Sampling.histogramEqualize(df, "doc_id", "bin")
      .orderBy("doc_id").select("doc_id", "bin")
      .as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // flattening: every bin's admitted count within 5x binomial sd of minC
    val admitted = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    counts.keys.foreach { b =>
      val sd = math.sqrt(minC.toDouble) * 5 + 1
      assert(math.abs(admitted.getOrElse(b, 0L) - minC) <= sd,
        s"bin $b admitted ${admitted.getOrElse(b, 0L)} vs target $minC")
    }
  }

  test("tokenBudgetSelect fills longest-first: matches the greedy reference") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 120).map { i =>
      (i.toLong, s"s${i % 3}",
        Vector.fill(1 + rnd.nextInt(25))("w").mkString(" "))
    }
    val wm = Map("s0" -> 1L, "s1" -> 1L, "s2" -> 2L)
    val budget = 600L
    val denom = wm.values.sum
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val share = budget * wm(src) / denom
      var cum = 0L
      ds.map { case (id, s, t) => (id, s, t.split(" ", -1).length.toLong) }
        .sortBy { case (id, _, n) => (-n, id) }
        .flatMap { case (id, s, n) =>
          val before = cum; cum += n
          if (before < share) Some((id, s, n, before)) else None
        }
    }.sortBy(_._1)
    val got = Sampling.tokenBudgetSelect(
      rows.toDF("doc_id", "source", "text"),
      wm.toSeq.toDF("source", "weight"), budget,
      orderCol = -org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ", -1)))
      .orderBy("doc_id")
      .select("doc_id", "source", "n_tokens", "cum_before")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("multi-probe SRP: superset of exact-band candidates, recall strictly closer to exact tier") {
    val rnd = new scala.util.Random(37)
    // clustered vectors so near-dups exist: 30 seeds, 3 jittered copies each
    val dims = 16
    val rows = (0 until 30).flatMap { s =>
      val base = Array.fill(dims)(rnd.nextGaussian().toFloat)
      (0 until 3).map { j =>
        val v = base.map(x => x + 0.35f * rnd.nextGaussian().toFloat)
        ((s * 3 + j).toLong, v.toSeq)
      }
    }
    val df = rows.toDF("vec_id", "embedding")
    val thr = 0.6
    def pairSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val exact = {
      // in-memory exact reference over all pairs
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      (for {
        (ia, va) <- rows; (ib, vb) <- rows if ia < ib && cos(va, vb) >= thr
      } yield (ia, ib)).toSet
    }
    val single = pairSet(graft.operators.Similarity.nearDupCosineSrp(df, thr))
    val multi = pairSet(graft.operators.Similarity.nearDupCosineSrpMultiProbe(df, thr))
    assert(single.subsetOf(multi), "multi-probe must be a superset of exact-band")
    assert(single.subsetOf(exact) && multi.subsetOf(exact),
      "verification means no false positives in either tier")
    assert(multi.size >= single.size)
    info(s"recall: single=${single.size}/${exact.size} multi=${multi.size}/${exact.size}")
  }

  test("tokenBudgetSelect keeps fractional order-column precision") {
    // two docs, budget fits one: the better (more negative) fractional
    // score must win — an integral cast would collapse both to tie class 0
    // and admit doc 0 by id instead
    val df = Seq(
      (0L, "s", "w w w w", 0.1),
      (1L, "s", "w w w w", 0.9))
      .toDF("doc_id", "source", "text", "score")
    val w = Seq(("s", 1L)).toDF("source", "weight")
    val got = Sampling.tokenBudgetSelect(df, w, totalBudget = 4L,
      orderCol = -org.apache.spark.sql.functions.col("score"))
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("tokenBudgetMix is invariant to the shuffle-partition count") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 150).map { i =>
      (i.toLong, s"s${i % 3}",
        Vector.fill(1 + rnd.nextInt(15))("w").mkString(" "))
    }
    val w = Seq(("s0", 1L), ("s1", 2L), ("s2", 1L)).toDF("source", "weight")
    def run(): Seq[(Long, String, Long, Long)] =
      Sampling.tokenBudgetMix(rows.toDF("doc_id", "source", "text"), w, 500L)
        .orderBy("doc_id")
        .select("doc_id", "source", "n_tokens", "cum_before")
        .as[(Long, String, Long, Long)].collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val base = run()
    try {
      for (p <- Seq("1", "7", "64")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        assert(run() == base, s"differs at shuffle.partitions=$p")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("naiveBayesScore matches an in-memory closed-form reference and separates a planted vocabulary") {
    val rnd = new scala.util.Random(23)
    val aVocab = Vector("alpha", "apex", "amber", "atlas")
    val bVocab = Vector("beta", "bison", "bramble", "basalt")
    val shared = Vector("the", "of", "and", "with")
    def doc(vocab: Vector[String]): String =
      Vector.fill(8 + rnd.nextInt(8))(
        if (rnd.nextBoolean()) vocab(rnd.nextInt(vocab.size))
        else shared(rnd.nextInt(shared.size))).mkString(" ")
    val rows = (0 until 60).map { i =>
      val pos = i % 2 == 0
      (i.toLong, if (pos) 1 else 0, doc(if (pos) aVocab else bVocab))
    }
    val df = rows.toDF("doc_id", "y", "text")
    val got = TextAnalysis.naiveBayesScore(df,
        org.apache.spark.sql.functions.col("y") === 1)
      .orderBy("doc_id")
      .select("doc_id", "label", "n_tokens", "log_odds", "pred", "correct")
      .as[(Long, Int, Long, Double, Int, Int)].collect()

    // closed-form reference: Laplace-smoothed multinomial NB on raw counts
    val toks = rows.map { case (id, y, t) => (id, y, t.split(" ", -1).toSeq) }
    val counts = scala.collection.mutable.Map.empty[(Int, String), Long]
    toks.foreach { case (_, y, ts) => ts.foreach(t => counts((y, t)) = counts.getOrElse((y, t), 0L) + 1L) }
    val v = toks.flatMap(_._3).distinct.size.toDouble
    val t1 = counts.collect { case ((1, _), c) => c }.sum.toDouble
    val t0 = counts.collect { case ((0, _), c) => c }.sum.toDouble
    val n1 = rows.count(_._2 == 1).toDouble
    val n0 = rows.size - n1
    val expected = toks.map { case (id, y, ts) =>
      val lo = ts.map { t =>
        math.log((counts.getOrElse((1, t), 0L) + 1.0) / (t1 + v)) -
          math.log((counts.getOrElse((0, t), 0L) + 1.0) / (t0 + v))
      }.sum + math.log(n1 / n0)
      (id, y, ts.size.toLong, lo)
    }.sortBy(_._1)

    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((id, label, n, lo, pred, correct), (eid, ey, en, elo)) =>
      assert(id == eid && label == ey && n == en)
      assert(math.abs(lo - elo) < 1e-6, s"doc $id: $lo vs $elo")
      assert(pred == (if (lo > 0) 1 else 0))
      assert(correct == (if (pred == label) 1 else 0))
    }
    // planted two-vocabulary corpus: NB must separate it perfectly
    assert(got.forall(_._6 == 1), "expected 100% in-sample accuracy on the planted vocabulary")
  }
}
