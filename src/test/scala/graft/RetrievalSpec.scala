package graft

import graft.operators.{Dedup, TextAnalysis}

/** BM25 retrieval + exact prefix-filtered Jaccard join, each checked
  * against an in-memory brute-force reference on tie-heavy random corpora. */
class RetrievalSpec extends SparkFunSuite {
  import spark.implicits._

  private val vocab = Vector("spark", "join", "hash", "scan", "merge", "row", "batch", "agg")

  /** Random docs over a tiny vocab; every third doc is a lightly mutated
    * copy of its predecessor so near-dup pairs actually occur. */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    import org.scalacheck.{Gen, rng}
    val gen = for {
      n <- Gen.choose(6, 25)
      docs <- Gen.listOfN(n, Gen.choose(4, 30).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
    } yield docs
    val texts = gen(Gen.Parameters.default, rng.Seed(seed)).get
    texts.zipWithIndex.map { case (t, i) =>
      val text =
        if (i % 3 == 2) { // mutate previous doc: swap one token
          val prev = texts(i - 1).split(" ", -1)
          prev.updated(prev.length / 2, vocab((i + seed.toInt) % vocab.size)).mkString(" ")
        } else t
      (i.toLong, text)
    }
  }

  // ---- BM25 ---------------------------------------------------------------

  private def bm25Ref(
      docs: Seq[(Long, String)],
      q: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): Map[Long, (Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = q.map(t => t -> toks.values.count(_.contains(t))).toMap
    docs.flatMap { case (id, _) =>
      val tl = toks(id)
      val matched = q.filter(t => tl.contains(t))
      if (matched.isEmpty) None
      else {
        val score = matched.map { t =>
          val tf = tl.count(_ == t).toDouble
          val idf = math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          // same association order as the Column expression in bm25TopK
          idf * (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * tl.size / avgdl)))
        }.sum
        Some(id -> (matched.size.toLong,
          BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toMap
  }

  test("bm25TopK property: scores and ranking equal brute-force reference") {
    (1 to 6).foreach { sample =>
      val docs = corpus(sample.toLong)
      val q = Seq("spark", "merge")
      val ref = bm25Ref(docs, q)
      val expectedTop = ref.toSeq
        .sortBy { case (id, (_, score)) => (-score, id) }
        .take(5)
        .zipWithIndex
        .map { case ((id, (m, score)), i) => (id, m, score, i + 1L) }
      val got = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"), q, k = 5)
        .select($"doc_id", $"n_matched", $"score", $"rn")
        .as[(Long, Long, Double, Long)].collect().toSeq.sortBy(_._4)
      assert(got === expectedTop, s"sample $sample")
    }
  }

  test("bm25TopK is partition-invariant") {
    val docs = corpus(99L)
    val q = Seq("join", "agg")
    val base = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"), q, k = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    val rep = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text").repartition(7), q, k = 4)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(base === rep)
  }

  test("bm25TopK rejects empty or duplicate query terms") {
    val d = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { TextAnalysis.bm25TopK(d, Seq.empty) }
    intercept[IllegalArgumentException] { TextAnalysis.bm25TopK(d, Seq("a", "a")) }
  }

  // ---- prefixJaccardJoin --------------------------------------------------

  private def jacRef(
      docs: Seq[(Long, String)],
      t: Double,
      n: Int = 3): Set[(Long, Long, Long, Long, Long, Double)] = {
    val sets = docs.map { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      id -> (if (toks.size < n) Set.empty[String]
             else toks.sliding(n).map(_.mkString("_")).toSet)
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa intersect sb).size
      jac = i.toDouble / (sa.size + sb.size - i)
      if i > 0 && jac >= t
    } yield (a, b, i.toLong, sa.size.toLong, sb.size.toLong,
      BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  test("prefixJaccardJoin property: equals naive all-pairs join (exact, no lost pairs)") {
    (1 to 8).foreach { sample =>
      val docs = corpus(sample.toLong + 50L)
      val expected = jacRef(docs, 0.3)
      val got = Dedup.prefixJaccardJoin(docs.toDF("doc_id", "text"), threshold = 0.3)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("prefixJaccardJoin property holds at the q_prefix_jaccard config (4-grams, t=0.5)") {
    (1 to 6).foreach { sample =>
      val docs = corpus(sample.toLong + 200L)
      val expected = jacRef(docs, 0.5, n = 4)
      val got = Dedup.prefixJaccardJoin(docs.toDF("doc_id", "text"),
          threshold = 0.5, shingleN = 4)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("prefixJaccardJoin: docs shorter than the shingle width never pair") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d"), (4L, "a b c d"))
    val got = Dedup.prefixJaccardJoin(docs.toDF("doc_id", "text"), threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 4L)))
  }

  test("prefixJaccardJoin finds the planted sf0.001 near-dups both tiers agree on") {
    val exact = Dedup.prefixJaccardJoin(
        SparkEntry.table(spark, sf0001, "documents"), threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.nearDupMinhash(
        SparkEntry.table(spark, sf0001, "documents"), threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // MinHash is a recall<=1 approximation of the exact join: every pair it
    // admits at this threshold must be in the exact result
    assert(approx.subsetOf(exact), s"minhash-only pairs: ${approx.diff(exact)}")
    assert(exact.nonEmpty)
  }
}
